"""Binned range join: equivalence with the naive inequality join,
exactly-once matching across bin boundaries, equi-join physical plan."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from empujar_spark.operators.ranges import range_join


@pytest.fixture(scope="module")
def toy(spark):
    base = dt.datetime(2024, 1, 1)
    pts = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=7 * i)) for i in range(200)],
        "pid long, ts timestamp",
    )
    # intervals of 10..190 min: many span multiple 1h bins
    iv = spark.createDataFrame(
        [
            (
                j,
                base + dt.timedelta(minutes=11 * j),
                base + dt.timedelta(minutes=11 * j + 10 + (j % 10) * 20),
            )
            for j in range(60)
        ],
        "iid long, ts_start timestamp, ts_end timestamp",
    )
    return pts, iv


def _naive(pts, iv):
    return pts.join(
        iv,
        (pts.ts >= iv.ts_start) & (pts.ts <= iv.ts_end),
    ).select("pid", "iid")


def test_range_join_matches_naive(toy):
    pts, iv = toy
    got = {
        (r.pid, r.iid)
        for r in range_join(
            pts, iv, "ts", "ts_start", "ts_end", bin_width_seconds=3600
        )
        .select("pid", "iid")
        .collect()
    }
    exp = {(r.pid, r.iid) for r in _naive(pts, iv).collect()}
    assert got == exp and len(got) > 0


def test_range_join_exactly_once(toy):
    """A pair that overlaps several bins must still be emitted once."""
    pts, iv = toy
    out = range_join(pts, iv, "ts", "ts_start", "ts_end", bin_width_seconds=600)
    dups = (
        out.groupBy("pid", "iid").count().filter(F.col("count") > 1).count()
    )
    assert dups == 0


def test_range_join_left_keeps_unmatched(toy):
    pts, iv = toy
    out = range_join(pts, iv, "ts", "ts_start", "ts_end", how="left")
    assert out.filter(F.col("iid").isNull()).count() > 0
    assert out.select("pid").distinct().count() == 200


def test_range_join_plan_is_equi(toy):
    """Even with NO by-key the bin column gives the join an equi component
    — never a nested-loop/cartesian plan."""
    pts, iv = toy
    out = range_join(pts, iv, "ts", "ts_start", "ts_end")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_overlap_join_exact_once(spark):
    """Crafted intervals: overlap across several shared bins emits ONCE;
    exact-touch boundaries count as overlap (closed intervals); disjoint
    pairs are absent — all verified against a brute-force cross check."""
    from empujar_spark.operators.ranges import interval_overlap_join

    A = [(1, 0.0, 2500.0), (2, 3000.0, 3100.0), (3, 5000.0, 5000.0)]
    B = [(10, 100.0, 2400.0),   # shares bins 0..4 with id 1 → once
         (11, 2500.0, 2600.0),  # touches id 1 exactly at 2500
         (12, 4000.0, 4999.0),  # disjoint from everything
         (13, 5000.0, 6000.0)]  # touches id 3's degenerate interval
    a = spark.createDataFrame(A, ["id", "s", "e"])
    b = spark.createDataFrame(B, ["id", "s", "e"])
    got = {
        (r["id_a"], r["id_b"])
        for r in interval_overlap_join(a, b, "s", "e", bin_width=500.0).collect()
    }
    expected = {
        (ia, ib)
        for ia, sa, ea in A
        for ib, sb, eb in B
        if sa <= eb and sb <= ea
    }
    assert got == expected
    assert (1, 10) in got and (1, 11) in got and (3, 13) in got


def test_asof_forward_and_tolerance(spark):
    """Forward direction picks the NEXT right row; tolerance NULLs
    matches beyond the bound while keeping the left row."""
    import datetime as dt

    from empujar_spark.operators.asof import asof_join
    from pyspark.sql import functions as F

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 1, T(10)), (2, 1, T(25)), (3, 2, T(5))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(1, T(12), 100.0), (1, T(30), 200.0), (2, T(50), 300.0)],
        ["user_id", "ts", "value"],
    )
    fwd = {
        r.event_id: r.value_asof
        for r in asof_join(
            left, right, on="ts", by="user_id", value_cols=["value"],
            direction="forward",
        ).collect()
    }
    assert fwd == {1: 100.0, 2: 200.0, 3: 300.0}
    tol = {
        r.event_id: r.value_asof
        for r in asof_join(
            left, right, on="ts", by="user_id", value_cols=["value"],
            direction="forward", tolerance=10,
        ).collect()
    }
    # event 3's next purchase is 45s away -> NULLed by tolerance=10
    assert tol == {1: 100.0, 2: 200.0, 3: None}
    back = {
        r.event_id: r.value_asof
        for r in asof_join(
            left, right, on="ts", by="user_id", value_cols=["value"],
            tolerance=10,
        ).collect()
    }
    # backward: event1 has no prior purchase; event2's prior is 13s away
    assert back == {1: None, 2: None, 3: None}


def test_asof_null_value_in_nearest_row_stays_null(spark):
    """The match is the whole nearest right row (pandas merge_asof): a
    NULL value column in that row must come back NULL — not an older
    row's value smuggled in by an independent per-column carry — and
    with tolerance the gate timestamp is that same row's."""
    import datetime as dt

    from empujar_spark.operators.asof import asof_join

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, 1, T(20))], ["event_id", "user_id", "ts"]
    )
    # older row (ts=2) has a value; NEAREST row (ts=19) has NULL value
    right = spark.createDataFrame(
        [(1, T(2), 111.0), (1, T(19), None)],
        "user_id int, ts timestamp, value double",
    )
    no_tol = asof_join(
        left, right, on="ts", by="user_id", value_cols=["value"]
    ).collect()[0]
    assert no_tol.value_asof is None  # nearest row's NULL, not 111.0

    # tolerance=5: nearest row (1s away) is in bound but NULL-valued;
    # the out-of-bound older row's 111.0 must NOT leak through the gate
    tol = asof_join(
        left, right, on="ts", by="user_id", value_cols=["value"],
        tolerance=5,
    ).collect()[0]
    assert tol.value_asof is None


def test_gapfill_ffill_semantics(spark):
    """Hand-built timeline: gaps appear with n=0 and carry the prior
    value; the grid spans first..last hour per key only."""
    import datetime as dt

    from empujar_spark.operators.timeseries import gapfill_ffill

    H = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    rows = [
        (1, 1, H(0, 30), 10.0),
        (2, 1, H(0, 45), 20.0),   # last of hour 0
        (3, 1, H(3, 10), 30.0),   # hours 1-2 are gaps
        (4, 2, H(5, 0), 99.0),    # single-hour key
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    got = {
        (r.user_id, r.bucket.hour): (r.n, r.last_value_ffill)
        for r in gapfill_ffill(df).collect()
    }
    assert got == {
        (1, 0): (2, 20.0),
        (1, 1): (0, 20.0),
        (1, 2): (0, 20.0),
        (1, 3): (1, 30.0),
        (2, 5): (1, 99.0),
    }


def test_gapfill_step_granularities(spark):
    """step maps to the matching date_trunc unit: minute/day/week grids
    are calendar-aligned and gap rows appear at that granularity."""
    import datetime as dt

    import pytest

    from empujar_spark.operators.timeseries import gapfill_ffill

    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 0, 20), 1.0),
        (2, 1, dt.datetime(2024, 1, 1, 0, 3, 5), 2.0),   # minutes 1-2 gap
        (3, 1, dt.datetime(2024, 1, 15, 0, 0), 3.0),     # days/weeks later
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])

    by_min = gapfill_ffill(df.filter("event_id <= 2"), step="1 minute").collect()
    assert [(r.bucket.minute, r.n) for r in sorted(by_min, key=lambda r: r.bucket)] \
        == [(0, 1), (1, 0), (2, 0), (3, 1)]

    by_day = gapfill_ffill(df, step="1 day").collect()
    assert len(by_day) == 15  # Jan 1 .. Jan 15 inclusive
    assert sum(r.n for r in by_day) == 3
    assert all(r.last_value_ffill is not None for r in by_day)

    by_week = gapfill_ffill(df, step="1 week").collect()
    # Mondays: Jan 1, 8, 15 — three calendar-aligned weekly buckets
    assert sorted(r.bucket.day for r in by_week) == [1, 8, 15]
    assert all(r.bucket.weekday() == 0 for r in by_week)

    with pytest.raises(ValueError):
        gapfill_ffill(df, step="15 minute")
    with pytest.raises(ValueError):
        gapfill_ffill(df, step="1 fortnight")
