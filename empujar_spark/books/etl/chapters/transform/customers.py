"""TRANSFORM: customers chapter (reference books/etl/chapters/transform/
users.js:9-34): totalPurchases (correlated count) + totalSpentCents
(3-way join + group + sum), re-expressed as one relational upsert."""

from pyspark.sql import functions as F


def chapter_loader(book):
    chapter = book.add_chapter(300, "transform-customers")
    warehouse = book.destination

    def transform_customers():
        cust = warehouse.read("customer")
        orders = warehouse.read("orders")
        li = warehouse.read("lineitem")
        counts = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("__n"))
        spent = (
            orders.join(li, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_custkey")
            .agg(
                F.round(
                    F.sum(
                        F.col("l_extendedprice").cast("decimal(18,6)")
                        * (
                            F.lit(1).cast("decimal(18,6)")
                            - F.col("l_discount").cast("decimal(18,6)")
                        )
                    ),
                    4,
                )
                .cast("double")
                .alias("__spent")
            )
        )
        updated = (
            cust.drop("total_orders", "total_spent")
            .join(counts, cust.c_custkey == counts.o_custkey, "left")
            .drop("o_custkey")
            .join(spent, cust.c_custkey == spent.o_custkey, "left")
            .drop("o_custkey")
            .withColumn(
                "total_orders", F.coalesce(F.col("__n"), F.lit(0)).cast("double")
            )
            .withColumn("total_spent", F.coalesce(F.col("__spent"), F.lit(0.0)))
            .drop("__n", "__spent")
        )
        warehouse.insert_data("customer", updated, merge_key="c_custkey")

    chapter.add_page("customers", transform_customers)
