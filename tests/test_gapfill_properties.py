"""Property-based oracle for gap-fill: pandas resample().ffill() over the
same per-key spans must agree with gapfill_ffill for any event layout, at
every supported step granularity."""

import datetime as dt

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from empujar_spark.operators.timeseries import gapfill_ffill

BASE = dt.datetime(2024, 1, 1)

FREQ = {"1 minute": "min", "1 hour": "h", "1 day": "D", "1 week": "W-MON"}

events = st.lists(
    st.tuples(
        st.integers(0, 1),                       # key
        st.integers(0, 21 * 24 * 3600),          # seconds across 3 weeks
        st.integers(0, 9),                       # value
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: (t[0], t[1]),
)


def _ref(rows, step):
    """Pandas ground truth: per key, bucket to the step, count + last
    value per bucket (ties by event_id = insertion order here — rows are
    unique per (key, ts) so ties cannot occur), reindex to the dense
    bucket range, forward-fill the last value."""
    df = pd.DataFrame(
        [
            (i, k, BASE + dt.timedelta(seconds=s), float(v))
            for i, (k, s, v) in enumerate(rows)
        ],
        columns=["event_id", "k", "ts", "v"],
    )
    out = {}
    unit = FREQ[step]
    for k, g in df.groupby("k"):
        # date_trunc('week') is Monday-START; pandas Period weeks are
        # named by their END day, so Monday-start == 'W-SUN' (a 'W-MON'
        # period ENDS Monday, i.e. starts Tuesday — off by one day)
        period = {"min": "min", "h": "h", "D": "D", "W-MON": "W-SUN"}[unit]
        bucket = g["ts"].dt.to_period(period).dt.start_time
        gb = g.assign(bucket=bucket).sort_values(["ts", "event_id"])
        per = gb.groupby("bucket").agg(n=("v", "size"), last=("v", "last"))
        idx = pd.date_range(per.index.min(), per.index.max(),
                            freq={"min": "min", "h": "h", "D": "D",
                                  "W-MON": "7D"}[unit])
        dense = per.reindex(idx)
        dense["n"] = dense["n"].fillna(0).astype(int)
        dense["last"] = dense["last"].ffill()
        for b, r in dense.iterrows():
            out[(k, b.to_pydatetime())] = (int(r["n"]), float(r["last"]))
    return out


@settings(max_examples=6, deadline=None)
@given(rows=events, step=st.sampled_from(list(FREQ)))
def test_gapfill_equals_pandas_resample_ffill(spark, rows, step):
    df = spark.createDataFrame(
        [
            (i, k, BASE + dt.timedelta(seconds=s), float(v))
            for i, (k, s, v) in enumerate(rows)
        ],
        "event_id int, user_id int, ts timestamp, value double",
    )
    got = {
        (r.user_id, r.bucket): (r.n, r.last_value_ffill)
        for r in gapfill_ffill(df, step=step).collect()
    }
    assert got == _ref(rows, step)
