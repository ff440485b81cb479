"""The MONITOR book end-to-end: snapshot → drift report → alert gate
(books/monitor) — the drift-operator family driven through the
reference's book/chapter orchestration."""

import tempfile

import pytest
from pyspark.sql import functions as F

from empujar_spark.books.monitor import run_monitor

SF = "/root/testdata/sf0.001"


def test_monitor_book_publishes_report_matching_direct_call(spark):
    """The stored report equals a direct drift_report over the same
    splits (store/read-back parity), the no-drift testdata passes the
    alert gate, and a rerun is idempotent (merge on signal)."""
    from empujar_spark.operators import profile as P

    tmp = tempfile.mkdtemp(prefix="t-monitor-")
    wh = run_monitor(spark, SF, tmp)
    assert set(wh.show_tables()) >= {
        "events_reference", "events_current", "drift_report", "empujar"
    }
    stored = {
        (r.check_name, r.feature): r.stat
        for r in wh.read("drift_report").collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    direct = {
        (r.check_name, r.feature): r.stat
        for r in P.drift_report(
            ev.filter(F.col("event_id") % 2 == 0),
            ev.filter(F.col("event_id") % 2 == 1),
            numeric_cols=["user_id", "value"],
            categorical_cols=["event_type"],
        ).collect()
    }
    assert stored == direct
    # rerun: snapshots upsert the same rows, the report re-merges the
    # same signals — nothing doubles
    wh2 = run_monitor(spark, SF, tmp)
    again = {
        (r.check_name, r.feature): r.stat
        for r in wh2.read("drift_report").collect()
    }
    assert again == stored
    n_ref = wh2.table_size("events_reference")
    assert n_ref == ev.filter(F.col("event_id") % 2 == 0).count()


def test_monitor_book_alert_gate_fail_fasts_on_breach(spark):
    """A threshold the current split breaches must raise out of
    book.run() — the reference's fail-fast error contract — and the
    report must still have been persisted (alarm AFTER publish, so the
    operator on call has the evidence)."""
    from empujar_spark.catalog import Warehouse

    tmp = tempfile.mkdtemp(prefix="t-monitor-breach-")
    # the sf0.001 even/odd value split moves its p99 by ~19.9 — a 0.5
    # tolerance on quantile_max_shift must alarm
    with pytest.raises(Exception, match="drift alarm"):
        run_monitor(
            spark, SF, tmp, thresholds={"quantile_max_shift": 0.5}
        )
    wh = Warehouse(spark, tmp, primary_key="event_id")
    assert wh.table_size("drift_report") > 0


def test_monitor_book_alert_gate_ignores_stale_signals(spark):
    """ADVICE r13: the report table accumulates signals by upsert and
    never deletes — a breach-level signal from a since-removed monitored
    feature must NOT keep raising the alarm. Pre-seed the warehouse with
    a stale breaching row for a feature outside the monitored set; the
    run must pass its gate."""
    from empujar_spark.catalog import Warehouse

    tmp = tempfile.mkdtemp(prefix="t-monitor-stale-")
    wh = Warehouse(spark, tmp, primary_key="event_id")
    stale = spark.createDataFrame(
        [("psi:retired_feature", "psi", "retired_feature", 99.0)],
        "signal string, check_name string, feature string, stat double",
    )
    wh.insert_data("drift_report", stale, merge_key="signal")
    # no-drift testdata + default thresholds: only the stale row could
    # alarm, and the gate must scope to this run's monitored features
    wh2 = run_monitor(spark, SF, tmp)
    stored = {r.signal for r in wh2.read("drift_report").collect()}
    assert "psi:retired_feature" in stored  # history retained...
    # ...but the run completed without the stale signal raising


def test_monitor_book_publishes_sliced_report(spark):
    """The report chapter's second page persists the per-segment
    companion: stored drift_report_sliced equals a direct
    drift_report_sliced call over the same splits on the same shard
    axis, and the aggregate gate is unaffected by its presence."""
    from empujar_spark.operators import profile as P

    tmp = tempfile.mkdtemp(prefix="t-monitor-sliced-")
    wh = run_monitor(spark, SF, tmp)
    assert "drift_report_sliced" in set(wh.show_tables())
    stored = {
        (r.check_name, r.feature, r.slice): r.stat
        for r in wh.read("drift_report_sliced").collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "shard", F.col("user_id") % 4
    )
    direct = {
        (r.check_name, r.feature, r.slice): r.stat
        for r in P.drift_report_sliced(
            ev.filter(F.col("event_id") % 2 == 0),
            ev.filter(F.col("event_id") % 2 == 1),
            ["user_id", "value"],
            ["event_type"],
            "shard",
        ).collect()
    }
    assert stored == direct
    # rerun idempotent: signals re-merge, nothing doubles
    wh2 = run_monitor(spark, SF, tmp)
    again = {
        (r.check_name, r.feature, r.slice): r.stat
        for r in wh2.read("drift_report_sliced").collect()
    }
    assert again == stored
