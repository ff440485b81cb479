"""The ETL book, ported (reference: books/etl/book.js + chapters/*).

Reference flow (3 chapters):
1. extract+load (priority 100, threads 5 — extract.js:6): for each source
   table, read the destination's MAX(updatedAt) watermark, extract source
   rows past it, upsert into the destination (extract.js:14-30).
2. transform/addColumns (priority 200): ensure derived columns exist
   (addColumns.js:16-32).
3. transform users/products (priority 300): correlated-count and
   join+group+sum updates pushed as SQL (users.js:9-34, products.js:9-33).

This port maps users/purchases/products → customer/orders(+lineitem)/part
on the driver's TPC-H-ish testdata, computing:
  customer.total_orders      (users.totalPurchases analogue)
  customer.total_spent       (users.totalSpentCents analogue)
  part.times_ordered         (products.timesPurchased analogue)
  part.total_revenue         (products.totalMadeCents analogue)
State events land in the `empujar` audit table (book.js:13-15).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from empujar_spark.book import Book
from empujar_spark.catalog import Warehouse
from empujar_spark.plans.corpus import load

# (table, watermark column, merge key). lineitem has NO unique key in the
# synthetic data ((l_orderkey, l_linenumber) repeats) — the reference's
# decision matrix treats PK-less tables as append-only (mysql.js:560-565
# full-merge path), so it loads with merge_key=None: plain append with a
# strictly-greater watermark for rerun idempotence.
EXTRACT_TABLES = [
    ("customer", None, "c_custkey"),
    ("orders", "o_orderdate", "o_orderkey"),
    ("lineitem", "l_shipdate", None),
    ("part", None, "p_partkey"),
]


def build_etl_book(
    spark: SparkSession, source_dir: str, warehouse: Warehouse, threads: int = 5
) -> Book:
    book = Book(spark=spark, name="etl", log_state_events=False)
    book.add_connection("destination", warehouse)

    # ---- chapter 100: extract+load (extract.js) -------------------------
    extract = book.add_chapter(100, "extract+load", threads=threads)

    def extract_table(table: str, wm_col: str | None, key):
        def page():
            src = load(spark, source_dir, table)
            if wm_col is not None:
                wm = warehouse.get_max(table, wm_col)
                if wm is not None:
                    # upsert absorbs `>=` boundary re-extraction (the
                    # reference's extract.js:18-21 contract); append-mode
                    # tables need strict `>` for idempotence
                    op = ">=" if key is not None else ">"
                    src = src.filter(F.col(wm_col) >= F.lit(wm) if op == ">=" else F.col(wm_col) > F.lit(wm))
            if book.get_all_limit:  # --getAllLimit testing cap (book.js:74)
                src = src.limit(book.get_all_limit)
            warehouse.insert_data(
                table, src, merge_on_duplicates=key is not None, merge_key=key
            )

        return page

    # loaders may add pages dynamically (chapter.js:82-85): discover the
    # table list in a loader, then register one page per table
    def discover():
        for table, wm_col, key in EXTRACT_TABLES:
            extract.add_page(table, extract_table(table, wm_col, key))

    extract.add_loader("discover-tables", discover)

    # ---- chapter 200: ensure derived columns (addColumns.js) ------------
    add_cols = book.add_chapter(200, "transform-addColumns")

    def ensure_columns():
        for table, col in [
            ("customer", "total_orders"),
            ("customer", "total_spent"),
            ("part", "times_ordered"),
            ("part", "total_revenue"),
        ]:
            if col not in warehouse.column_types(table):
                warehouse.add_column(table, col, [0.0])

    add_cols.add_page("addColumns", ensure_columns)

    # ---- chapter 300: transforms (users.js / products.js) ---------------
    transform = book.add_chapter(300, "transform", threads=2)

    def transform_customers():
        """users.js:9-34: totalPurchases (correlated count) +
        totalSpentCents (3-way join + group + sum), as one upsert."""
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
            .withColumn("total_orders", F.coalesce(F.col("__n"), F.lit(0)).cast("double"))
            .withColumn("total_spent", F.coalesce(F.col("__spent"), F.lit(0.0)))
            .drop("__n", "__spent")
        )
        warehouse.insert_data("customer", updated, merge_key="c_custkey")

    def transform_parts():
        """products.js:9-33 analogue on part/lineitem."""
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
            .withColumn("times_ordered", F.coalesce(F.col("__n"), F.lit(0)).cast("double"))
            .withColumn("total_revenue", F.coalesce(F.col("__rev"), F.lit(0.0)))
            .drop("__n", "__rev")
        )
        warehouse.insert_data("part", updated, merge_key="p_partkey")

    transform.add_page("customers", transform_customers)
    transform.add_page("parts", transform_parts)

    return book


def run_etl(
    spark: SparkSession, source_dir: str, warehouse_dir: str, threads: int = 5
) -> Warehouse:
    """Build + run the book, flush the audit table, return the warehouse."""
    wh = Warehouse(spark, warehouse_dir, primary_key="id")
    book = build_etl_book(spark, source_dir, wh, threads)
    book.run()
    book.flush_audit(wh)  # book.js:13-15: state events → empujar table
    return wh


def main(argv: list[str] | None = None) -> None:
    """CLI parity with the reference's book scripts (books/etl/book.js:7:
    `--logLevel debug`, `--chapters 100`, `--getAllLimit N`)."""
    import argparse

    from empujar_spark.session import get_spark

    p = argparse.ArgumentParser(description="Run the ETL book")
    p.add_argument("--source", default="/root/testdata/sf0.001")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--chapters", default=None,
                   help='priority filter: "100,300" or "100-300"')
    p.add_argument("--getAllLimit", type=int, default=None, dest="get_all_limit")
    p.add_argument("--threads", type=int, default=5)
    p.add_argument("--logLevel", default="INFO")
    args = p.parse_args(argv)

    import logging

    logging.basicConfig(level=getattr(logging, args.logLevel.upper(), logging.INFO))
    spark = get_spark("etl-book")
    wh = Warehouse(spark, args.warehouse, primary_key="id")
    book = build_etl_book(spark, args.source, wh, threads=args.threads)
    book.chapter_filter = __import__("empujar_spark.book", fromlist=["x"])._parse_chapter_filter(args.chapters)
    book.get_all_limit = args.get_all_limit
    book.log_state_events = True
    book.run()
    book.flush_audit(wh)
    for t in wh.show_tables():
        print(f"{t}: {wh.table_size(t)} rows")


if __name__ == "__main__":
    main()
