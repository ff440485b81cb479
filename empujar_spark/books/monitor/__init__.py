"""The MONITOR book: drift surveillance as a pipeline — the reference's
orchestration model (book → chapters → pages, lib/book.js /
lib/chapter.js) driving the drift-operator family the way a production
deployment runs it nightly: snapshot → report → alert.

Chapters (discovered by ``Book.load_chapters``, the same
glob-and-call-every-export contract as books/etl and books/pretrain):

1. chapters/snapshot/splits.py (priority 100): persist the REFERENCE
   feature snapshot (even event_id — in production, the training-time
   freeze) and the CURRENT arrivals (odd event_id) into the warehouse;
   reruns upsert idempotently on event_id, the extract.js watermark
   discipline applied to monitoring inputs.
2. chapters/report/drift.py    (priority 200): one drift_report call
   (operators/profile.py) over the STORED snapshots — total PSI per
   numeric feature via the single-scan multi-feature pass, chi-square
   per categorical feature, max per-quantile location shift — upserted
   into ``drift_report`` keyed by check:feature. Plus (r16) a
   meta-only ``schema_audit`` page: the two snapshot metas diffed
   through the §1.2 lattice (added/removed/re-typed columns — the
   shape regressions the distributional checks can't see), REPLACED
   each run so a resolved drift reads green again.
3. chapters/alert/gate.py      (priority 300): the alarm — THIS run's
   report rows gate against thresholds (psi > 0.25 the classic retrain
   alarm; chi2 > the K−1-dof critical value; optional quantile
   tolerance) and ANY breach raises, fail-fasting the book (the
   reference's error contract) so a drifted model never silently keeps
   serving. Thresholds override via ``book.drift_thresholds``; an
   opt-in ``book.sliced_thresholds`` additionally gates the per-segment
   report with population-aware per-slice bars (chapters/alert/gate.py).

Every chapter reads from / writes to the destination Warehouse, so the
report history accumulates across runs and the stored reference stays
frozen until a retrain re-snapshots it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from empujar_spark.book import Book
from empujar_spark.catalog import Warehouse

CHAPTER_FILES = os.path.join(os.path.dirname(__file__), "chapters", "**", "*.py")

NUMERIC_COLS = ["user_id", "value"]
CATEGORICAL_COLS = ["event_type"]


def build_monitor_book(
    spark: SparkSession, source_dir: str, warehouse: Warehouse
) -> Book:
    book = Book(spark=spark, name="monitor", log_state_events=False)
    book.add_connection("destination", warehouse)
    book.source_dir = source_dir
    book.load_chapters(CHAPTER_FILES)
    return book


def run_monitor(
    spark: SparkSession, source_dir: str, warehouse_dir: str,
    thresholds: dict | None = None,
    sliced_thresholds: dict | None = None,
    cardinality_cols: list | None = None,
    schema_strict: bool = False,
) -> Warehouse:
    """Build + run the book, flush the audit table, return the warehouse."""
    wh = Warehouse(spark, warehouse_dir, primary_key="event_id")
    book = build_monitor_book(spark, source_dir, wh)
    if thresholds is not None:
        book.drift_thresholds = thresholds
    if sliced_thresholds is not None:
        book.sliced_thresholds = sliced_thresholds
    if cardinality_cols is not None:
        book.cardinality_cols = cardinality_cols
    if schema_strict:
        book.schema_strict = True
    book.run()
    book.flush_audit(wh)
    return wh


def main(argv: list[str] | None = None) -> None:
    import argparse

    from empujar_spark.session import get_spark

    p = argparse.ArgumentParser(description="Run the drift-monitor book")
    p.add_argument("--source", default="/root/testdata/sf0.001")
    p.add_argument("--warehouse", required=True)
    args = p.parse_args(argv)
    spark = get_spark("monitor-book")
    wh = run_monitor(spark, args.source, args.warehouse)
    for r in wh.read("drift_report").collect():
        print(f"{r.check_name}:{r.feature} = {r.stat}")


if __name__ == "__main__":
    main()
