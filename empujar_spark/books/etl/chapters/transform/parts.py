"""TRANSFORM: parts chapter (reference books/etl/chapters/transform/
products.js:9-33): timesPurchased + totalMadeCents analogues on
part/lineitem, as one relational upsert."""

from pyspark.sql import functions as F


def chapter_loader(book):
    chapter = book.add_chapter(300, "transform-parts")
    warehouse = book.destination

    def transform_parts():
        part = warehouse.read("part")
        li = warehouse.read("lineitem")
        per_part = li.groupBy("l_partkey").agg(
            F.count(F.lit(1)).alias("__n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("__rev"),
        )
        updated = (
            part.drop("times_ordered", "total_revenue")
            .join(per_part, part.p_partkey == per_part.l_partkey, "left")
            .drop("l_partkey")
            .withColumn(
                "times_ordered", F.coalesce(F.col("__n"), F.lit(0)).cast("double")
            )
            .withColumn("total_revenue", F.coalesce(F.col("__rev"), F.lit(0.0)))
            .drop("__n", "__rev")
        )
        warehouse.insert_data("part", updated, merge_key="p_partkey")

    chapter.add_page("parts", transform_parts)
