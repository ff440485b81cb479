"""Property-based oracle for the as-of join: pandas ``merge_asof`` is the
reference semantics (whole-row nearest match, tolerance gates the match,
NULL value columns carried as-is) — any key/timestamp/NULL layout must
agree in both directions, with and without tolerance."""

import datetime as dt

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from empujar_spark.operators.asof import asof_join

BASE = dt.datetime(2024, 1, 1)

# distinct per-key timestamps (the operator's documented uniqueness
# precondition for the right side); values may be NULL to exercise the
# whole-row carry
secs = st.integers(min_value=0, max_value=6 * 3600)
keys = st.integers(min_value=0, max_value=2)


@st.composite
def frames(draw):
    left = draw(
        st.lists(st.tuples(keys, secs), min_size=1, max_size=20, unique=True)
    )
    right = draw(
        st.lists(
            st.tuples(keys, secs, st.one_of(st.none(), st.integers(0, 99))),
            min_size=0,
            max_size=20,
            unique_by=lambda t: (t[0], t[1]),
        )
    )
    return left, right


def _ref(left, right, direction, tolerance):
    lf = pd.DataFrame(
        [(i, k, BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        columns=["event_id", "k", "ts"],
    ).sort_values("ts", kind="mergesort")
    rf = pd.DataFrame(
        [(k, BASE + dt.timedelta(seconds=s), v) for k, s, v in right],
        columns=["k", "ts", "v"],
    ).sort_values("ts", kind="mergesort")
    rf["ts"] = pd.to_datetime(rf["ts"])  # empty frame → object dtype otherwise
    rf["k"] = rf["k"].astype("int64")
    rf["v"] = rf["v"].astype("float64")
    out = pd.merge_asof(
        lf,
        rf,
        on="ts",
        by="k",
        direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
    )
    return {
        int(r.event_id): (None if pd.isna(r.v) else float(r.v))
        for r in out.itertuples()
    }


@settings(max_examples=8, deadline=None)
@given(
    data=frames(),
    direction=st.sampled_from(["backward", "forward"]),
    tolerance=st.sampled_from([None, 0, 1800, 7200]),
)
def test_asof_join_equals_pandas_merge_asof(spark, data, direction, tolerance):
    left, right = data
    lf = spark.createDataFrame(
        [(i, k, BASE + dt.timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        "event_id int, k int, ts timestamp",
    )
    rf = spark.createDataFrame(
        [
            (k, BASE + dt.timedelta(seconds=s), None if v is None else float(v))
            for k, s, v in right
        ],
        "k int, ts timestamp, v double",
    )
    got = {
        r.event_id: r.v_asof
        for r in asof_join(
            lf, rf, on="ts", by="k", value_cols=["v"],
            direction=direction,
            tolerance=None if tolerance is None else float(tolerance),
        ).collect()
    }
    expect = _ref(left, right, direction, tolerance)
    assert got == expect
