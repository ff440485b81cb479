"""The ETL book, ported (reference: books/etl/book.js + chapters/*).

Reference flow (the chapter files under ``chapters/`` mirror the
reference's directory layout one-for-one and are discovered by
``Book.load_chapters``, the glob-and-call-every-export contract of
lib/book.js:194-204):

1. chapters/extract_load/extract.py (priority 100, threads 5 —
   extract.js:6): for each source table, read the destination's
   MAX(updatedAt) watermark, extract source rows past it, upsert into the
   destination (extract.js:14-30).
2. chapters/transform/add_columns.py (priority 200): ensure derived
   columns exist (addColumns.js:16-32).
3. chapters/transform/customers.py + parts.py (both priority 300,
   mirroring users.js/products.js sharing priority 3): correlated-count
   and join+group+sum updates as relational upserts (users.js:9-34,
   products.js:9-33).

This port maps users/purchases/products → customer/orders(+lineitem)/part
on the driver's TPC-H-ish testdata, computing:
  customer.total_orders      (users.totalPurchases analogue)
  customer.total_spent       (users.totalSpentCents analogue)
  part.times_ordered         (products.timesPurchased analogue)
  part.total_revenue         (products.totalMadeCents analogue)
State events land in the `empujar` audit table (book.js:13-15).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from empujar_spark.book import Book
from empujar_spark.catalog import Warehouse

CHAPTER_FILES = os.path.join(os.path.dirname(__file__), "chapters", "**", "*.py")


def build_etl_book(
    spark: SparkSession, source_dir: str, warehouse: Warehouse, threads: int = 5
) -> Book:
    """Assemble the book exactly as the reference's book.js does: register
    connections, then ``load_chapters`` discovers and invokes every
    ``chapter_loader`` under chapters/ (book.js:26)."""
    book = Book(spark=spark, name="etl", log_state_events=False)
    book.add_connection("destination", warehouse)
    book.source_dir = source_dir
    book.etl_threads = threads
    book.load_chapters(CHAPTER_FILES)
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
    from empujar_spark.book import _parse_chapter_filter

    book.chapter_filter = _parse_chapter_filter(args.chapters)
    book.get_all_limit = args.get_all_limit
    book.log_state_events = True
    book.run()
    book.flush_audit(wh)
    for t in wh.show_tables():
        print(f"{t}: {wh.table_size(t)} rows")


if __name__ == "__main__":
    main()
