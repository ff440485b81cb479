"""Corpus correctness: every queries() entry vs its DuckDB oracle at
sf0.001 (the driver does the same at sf0.01 — this is the local gate).

Comparison mimics the driver contract: row count + column names + exact
value match after sorting columns by name and rows by all columns."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from empujar_spark.plans.corpus import CORPUS, TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and df[c].map(lambda v: isinstance(v, (int,)), na_action="ignore").all():
            df[c] = df[c].astype("int64")
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


SQL_QUERIES = sorted(n for n, q in CORPUS.items() if q.sql is not None)
ROWS_ONLY = sorted(n for n, q in CORPUS.items() if q.sql is None)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(spark, oracle, name):
    query = CORPUS[name]
    got = normalize(query.fn(spark, SF_DIR).toPandas())
    exp = normalize(oracle.execute(query.sql).df())
    assert list(got.columns) == list(exp.columns), (
        f"columns differ: {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"row counts differ: {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = CORPUS[name].fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


def test_events_loader_schema_guard(spark, tmp_path):
    """A testdata format change on events.ts must fail LOUDLY at load
    (a silent unit misread once collapsed a month of events into ~43
    minutes and broke 21 corpus entries)."""
    import shutil

    import pytest as _pytest

    from empujar_spark.plans.corpus import load

    sf = str(tmp_path)
    # string-typed ts: not a timestamp of any unit → loud failure. (The
    # footer-based loader is stricter than its predecessor: a raw int64
    # ts also fails now instead of being ASSUMED to be nanos.)
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "click", 1.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    with _pytest.raises(TypeError, match="events.ts stored as"):
        load(spark, sf, "events")

    # both supported generations load to a timestamp column. Spark can't
    # write TIMESTAMP(NANOS), so the nanos generation is produced the way
    # the original testdata was — through pyarrow.
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(f"{sf}/events.parquet")
    nanos_tbl = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([1_704_067_200_000_000_000], pa.timestamp("ns")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["click"], pa.string()),
            "value": pa.array([1.0], pa.float64()),
            "props": pa.array(["{}"], pa.string()),
        }
    )
    pq.write_table(
        nanos_tbl, f"{sf}/events.parquet", version="2.6",
        coerce_timestamps=None, store_schema=False,
    )
    nanos_df = load(spark, sf, "events")
    assert dict(nanos_df.dtypes)["ts"] == "timestamp"
    got = nanos_df.collect()[0].ts
    assert (got.year, got.month, got.day) == (2024, 1, 1)
    assert dict(load(spark, "/root/testdata/sf0.001", "events").dtypes)[
        "ts"
    ] == "timestamp"


def test_admission_entry_reruns_are_isolated(spark):
    """The streaming_bloom_admission entry clones a session-built
    pristine warehouse per run (the stream appends to history and
    re-commits the bitmap, so a shared warehouse would drift): two
    consecutive invocations must return the identical admitted-key set,
    and the pristine directory must be byte-stable across them — the
    invariant the clone exists to guarantee."""
    import os

    from empujar_spark.plans.corpus import _admission_pristine

    fn = CORPUS["streaming_bloom_admission"].fn
    first = sorted(r[0] for r in fn(spark, SF_DIR).collect())
    pristine = _admission_pristine(spark, SF_DIR)

    def snapshot(d):
        out = []
        for root, _dirs, files in os.walk(d):
            for f in sorted(files):
                p = os.path.join(root, f)
                out.append((os.path.relpath(p, d), os.path.getsize(p),
                            os.path.getmtime(p)))
        return sorted(out)

    before = snapshot(pristine)
    second = sorted(r[0] for r in fn(spark, SF_DIR).collect())
    assert first == second and first  # same admissions, and some exist
    assert snapshot(pristine) == before  # pristine never mutated


def test_leakage_safe_split_co_assigns_duplicate_groups(spark):
    """leakage_safe_split (r16): every member of a content group gets
    the SAME split; the id-keyed stratified_split demonstrably straddles
    groups on the same fixture (the failure mode the operator closes);
    and over many groups the permille proportions hold roughly."""
    from pyspark.sql import functions as F

    from empujar_spark.operators.profile import (
        leakage_safe_split,
        stratified_split,
    )
    from empujar_spark.operators.text import fingerprint

    # 300 distinct contents, each filed under 4 different doc_ids
    docs = spark.range(1200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("content number "), (F.col("id") % 300).cast("string"))
        .alias("text"),
    )
    fp = fingerprint(docs)
    safe = leakage_safe_split(fp, "fingerprint")
    per_group = (
        safe.groupBy("fingerprint")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(F.max("n_splits"))
        .collect()[0][0]
    )
    assert per_group == 1, "a duplicate group straddles splits"

    # the id-keyed split scatters those same groups across splits
    naive = stratified_split(fp.join(docs, "doc_id"), "doc_id")
    straddlers = (
        naive.groupBy("fingerprint")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert straddlers > 0

    # proportions: ~10/10/80 over 300 group draws (binomial, wide bars)
    shares = {
        r.split: r.n
        for r in safe.select("fingerprint", "split").distinct()
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert shares.get("train", 0) > 200
    assert 10 <= shares.get("test", 0) + shares.get("val", 0) <= 100
