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


def _write_segment_drift_source(spark, src_dir):
    """Synthetic events where the AGGREGATE category mix is IDENTICAL
    between splits but two shards' mixes invert against each other —
    the compensating-segments failure the sliced report exists for.
    Shard 2 is a tiny (10 rows/side) fully-inverted slice that must be
    population-skipped by the sliced gate."""
    rows = []
    eid = [0]

    def block(user_id, parity, n_click, n_view):
        for k in range(n_click + n_view):
            e = eid[0] * 2 + parity
            eid[0] += 1
            rows.append((
                e, user_id,
                "click" if k < n_click else "view",
                float(k % 100), "{}",
            ))

    block(0, 0, 400, 100)   # ref shard 0: click-heavy
    block(1, 0, 100, 400)   # ref shard 1: view-heavy
    block(0, 1, 100, 400)   # cur shard 0: inverted...
    block(1, 1, 400, 100)   # cur shard 1: ...compensated exactly
    block(2, 0, 10, 0)      # tiny shard, fully inverted: below
    block(2, 1, 0, 10)      # min_slice_rows, must not gate
    # write via pyarrow with an explicit timestamp[us] ts: the corpus
    # loader branches on the parquet footer's physical ts type and
    # Spark's own writer emits a unit the loader would misroute
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            [(r[0] + 1_600_000_000) * 1_000_000 for r in rows],
            pa.timestamp("us"),
        ),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array([r[4] for r in rows], pa.string()),
    })
    pq.write_table(table, f"{src_dir}/events.parquet")


def test_monitor_book_sliced_gate_catches_segment_local_drift(spark):
    """VERDICT r14 item 7: a compensating per-segment mix inversion that
    the AGGREGATE gate reads straight through (aggregate chi2 = 0 by
    construction) must raise once the book opts into
    ``sliced_thresholds`` — and the tiny inverted shard below
    min_slice_rows must be population-skipped, not paged on."""
    src = tempfile.mkdtemp(prefix="t-monitor-seg-src-")
    _write_segment_drift_source(spark, src)

    # aggregate gate (default thresholds) reads clean: identical
    # aggregate mixes, identical value distributions
    wh = run_monitor(spark, src, tempfile.mkdtemp(prefix="t-monitor-agg-"))
    agg = {
        r.check_name: r.stat
        for r in wh.read("drift_report").collect()
        if r.feature == "event_type"
    }
    # the two big shards cancel exactly; only the 20-row tiny shard
    # leaks a trace into the aggregate — nowhere near the 18.47 alarm
    assert agg["chi2"] < 1.0

    # sliced gate: both big shards breach, the tiny shard is skipped
    with pytest.raises(Exception, match="drift alarm") as exc:
        run_monitor(
            spark, src, tempfile.mkdtemp(prefix="t-monitor-sliced-gate-"),
            sliced_thresholds={"psi": 0.25, "chi2": 18.47},
        )
    msg = str(exc.value)
    assert "chi2:event_type:0" in msg
    assert "chi2:event_type:1" in msg
    assert "chi2:event_type:2" not in msg  # population-skipped
    assert "psi:" not in msg  # values did not move anywhere


def test_monitor_book_cardinality_check_catches_key_collapse(spark):
    """Opt-in cardinality check (r15): current-side value quantized to
    floor(v/2)*2 — a ~3x distinct-count collapse that barely moves the
    value histogram (every value shifts <2 against frozen PSI bins ~33
    wide, so the distributional gates stay quiet) and leaves event_type
    untouched. The default gate passes; a book that opts into
    cardinality_cols with a |ln ratio| > ln 2 threshold must alarm on
    value and only value."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    src = tempfile.mkdtemp(prefix="t-monitor-card-src-")
    t = pq.read_table("/root/testdata/sf0.001/events.parquet")
    odd = pc.equal(pc.bit_wise_and(t["event_id"], 1), 1)
    collapsed = pc.multiply(pc.floor(pc.divide(t["value"], 2)), 2)
    t = t.set_column(
        t.schema.get_field_index("value"),
        "value",
        pc.cast(pc.if_else(odd, collapsed, t["value"]), pa.float64()),
    )
    # the corpus loader branches on the ts footer type; normalize to us
    idx = t.schema.get_field_index("ts")
    t = t.set_column(idx, "ts", pc.cast(t["ts"], pa.timestamp("us")))
    pq.write_table(t, f"{src}/events.parquet")

    # default run: no cardinality opt-in, distributional gates read clean
    wh = run_monitor(spark, src, tempfile.mkdtemp(prefix="t-monitor-card1-"))
    stored = {r.check_name for r in wh.read("drift_report").collect()}
    assert "cardinality" not in stored  # off by default

    with pytest.raises(Exception, match="drift alarm") as exc:
        run_monitor(
            spark, src, tempfile.mkdtemp(prefix="t-monitor-card2-"),
            thresholds={"cardinality": 0.693},
            cardinality_cols=["value", "event_type"],
        )
    msg = str(exc.value)
    assert "cardinality:value" in msg
    assert "cardinality:event_type" not in msg


def test_monitor_book_schema_audit_flags_retype(spark):
    """SCHEMA drift page (r16): the nightly report also diffs the two
    stored snapshot METAS through the type lattice — on the clean
    testdata the audit is empty (identical shapes), and a planted
    retype on the current snapshot (value re-written stringly-typed)
    surfaces as a 'changed' row while the distributional pages stay
    blind to it."""
    tmp = tempfile.mkdtemp(prefix="t-monitor-schema-")
    wh = run_monitor(spark, SF, tmp)
    assert "schema_audit" in set(wh.show_tables())
    assert wh.table_size("schema_audit") == 0  # same shape = green

    # plant the stringly-typed feed regression: replace events_current
    # with a value-as-varchar copy — the warehouse's evolution machinery
    # PROMOTES the stored column through the lattice (float ∨ varchar =
    # text, the safe sink), and the audit reports exactly that retype
    cur = wh.read("events_current").withColumn(
        "value", F.col("value").cast("string")
    )
    wh.replace_table("events_current", cur)
    diff = {
        (r["column"], r.status): (r.old_type, r.new_type)
        for r in wh.schema_diff(
            "events_reference", "events_current"
        ).collect()
    }
    assert diff == {("value", "changed"): ("float", "text")}


def test_monitor_book_schema_audit_clears_when_drift_resolves(spark):
    """The audit is REPLACED each run, not upserted (r16 code-review):
    a drift that has been resolved must leave an EMPTY audit on the
    next run — an upsert can never delete the stale red row, so a
    healthy schema would read red forever."""
    from empujar_spark.books.monitor import build_monitor_book
    from empujar_spark.catalog import Warehouse

    tmp = tempfile.mkdtemp(prefix="t-monitor-schema-clear-")
    wh = run_monitor(spark, SF, tmp)

    # plant a retype directly in the CURRENT snapshot table, then
    # re-run the book: snapshot re-upserts don't undo the promotion
    # (text is above float in the lattice), so the audit goes red
    wh.replace_table(
        "events_current",
        wh.read("events_current").withColumn(
            "value", F.col("value").cast("string")
        ),
    )
    book = build_monitor_book(spark, SF, wh)
    book.run()
    red = {
        r.feature: r.status for r in wh.read("schema_audit").collect()
    }
    assert red == {"value": "changed"}

    # resolve: drop the corrupted snapshot and re-run the book — the
    # snapshot chapter rebuilds events_current from source with the
    # correct types (a replace alone can't narrow: widening is one-way
    # in the lattice, so drop-and-rebuild is the real remediation path)
    wh2 = Warehouse(spark, tmp, primary_key="event_id")
    wh2.drop_table("events_current")
    book2 = build_monitor_book(spark, SF, wh2)
    book2.run()
    assert wh2.table_size("schema_audit") == 0, "stale audit row survived"


def test_monitor_book_schema_strict_gate_fail_fasts_on_retype(spark):
    """schema_strict opt-in (r16): a planted snapshot retype must raise
    out of book.run() with the schema breach named; the same corrupted
    warehouse passes when the flag is off (audit-only default), and a
    clean warehouse passes with the flag on."""
    from empujar_spark.books.monitor import build_monitor_book
    from empujar_spark.catalog import Warehouse

    tmp = tempfile.mkdtemp(prefix="t-monitor-strict-")
    # clean run with the flag on: no schema diff, gate stays green
    wh = run_monitor(spark, SF, tmp, schema_strict=True)
    assert wh.table_size("schema_audit") == 0

    # corrupt the current snapshot (float -> text promotion)
    wh.replace_table(
        "events_current",
        wh.read("events_current").withColumn(
            "value", F.col("value").cast("string")
        ),
    )
    # audit-only default: the book reruns green, audit records the diff
    book = build_monitor_book(spark, SF, wh)
    book.run()
    assert wh.table_size("schema_audit") == 1

    # strict: the same state fail-fasts with the breach named
    wh2 = Warehouse(spark, tmp, primary_key="event_id")
    strict = build_monitor_book(spark, SF, wh2)
    strict.schema_strict = True
    with pytest.raises(Exception, match="schema:value changed"):
        strict.run()
