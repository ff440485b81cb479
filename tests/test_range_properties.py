"""Property-based tests (hypothesis): the binned range join must equal a
pure-Python nested-loop ground truth for ANY point/interval layout and bin
width, and md5 hash sampling must select the identical subset regardless
of partition layout."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from empujar_spark.operators.profile import hash_sample
from empujar_spark.operators.ranges import range_join

BASE = dt.datetime(2024, 1, 1)

offsets = st.integers(min_value=0, max_value=72 * 3600)  # seconds in 3 days
intervals = st.tuples(offsets, st.integers(min_value=0, max_value=8 * 3600))


@settings(max_examples=6, deadline=None)
@given(
    pts=st.lists(offsets, min_size=0, max_size=30, unique=True),
    ivs=st.lists(intervals, min_size=0, max_size=15),
    bin_w=st.sampled_from([60, 3600, 86400]),
)
def test_range_join_equals_ground_truth(spark, pts, ivs, bin_w):
    pts_rows = [(i, BASE + dt.timedelta(seconds=s)) for i, s in enumerate(pts)]
    iv_rows = [
        (
            j,
            BASE + dt.timedelta(seconds=s),
            BASE + dt.timedelta(seconds=s + length),
        )
        for j, (s, length) in enumerate(ivs)
    ]
    left = spark.createDataFrame(pts_rows, "pid long, ts timestamp") if pts_rows else \
        spark.createDataFrame([], "pid long, ts timestamp")
    right = spark.createDataFrame(
        iv_rows, "iid long, ts_start timestamp, ts_end timestamp"
    ) if iv_rows else spark.createDataFrame(
        [], "iid long, ts_start timestamp, ts_end timestamp"
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(
            left, right, "ts", "ts_start", "ts_end", bin_width_seconds=bin_w
        ).collect()
    }
    expected = {
        (pid, iid)
        for pid, ts in pts_rows
        for iid, ts0, ts1 in iv_rows
        if ts0 <= ts <= ts1
    }
    assert got == expected


@settings(max_examples=6, deadline=None)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1,
                 max_size=60, unique=True),
    rate=st.sampled_from([0, 100, 500, 1000]),
    parts=st.sampled_from([1, 3, 7]),
)
def test_hash_sample_partition_invariant(spark, ids, rate, parts):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    a = {r.doc_id for r in hash_sample(df, rate).collect()}
    b = {r.doc_id for r in hash_sample(df.repartition(parts), rate).collect()}
    assert a == b
    if rate == 0:
        assert a == set()
    if rate == 1000:
        assert a == set(ids)
