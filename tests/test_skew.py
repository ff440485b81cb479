"""Salting helpers: results identical to unsalted plans."""

from pyspark.sql import functions as F

from empujar_spark.operators.skew import salted_agg, salted_count, salted_join
from empujar_spark.plans.corpus import load

SF = "/root/testdata/sf0.001"


def test_salted_count_matches_plain(spark):
    li = load(spark, SF, "lineitem")
    got = {r["l_orderkey"]: r["n"] for r in salted_count(li, "l_orderkey").collect()}
    exp = {
        r["l_orderkey"]: r["n"]
        for r in li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == exp


def test_salted_agg_matches_plain(spark):
    li = load(spark, SF, "lineitem")
    got = {r["l_returnflag"]: r["total"] for r in salted_agg(li, "l_returnflag", "l_quantity").collect()}
    exp = {
        r["l_returnflag"]: r["t"]
        for r in li.groupBy("l_returnflag")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("t"))
        .collect()
    }
    assert got == exp


def test_salted_join_matches_plain(spark):
    o = load(spark, SF, "orders").select(F.col("o_custkey").alias("k"), "o_orderkey")
    c = load(spark, SF, "customer").select(F.col("c_custkey").alias("k"), "c_name")
    got = salted_join(o, c, "k").count()
    exp = o.join(c, "k").count()
    assert got == exp


def test_salted_distinct_count_matches_plain(spark):
    from empujar_spark.operators.skew import salted_distinct_count

    li = load(spark, SF, "lineitem")
    got = {
        r["l_returnflag"]: r["n_distinct"]
        for r in salted_distinct_count(
            li, "l_returnflag", "l_partkey"
        ).collect()
    }
    exp = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    assert got == exp and len(got) > 1


def test_salted_distinct_count_null_vals(spark):
    from empujar_spark.operators.skew import salted_distinct_count

    rows = [("a", 1), ("a", 1), ("a", 2), ("b", None), ("b", 3)]
    df = spark.createDataFrame(rows, "key string, val int")
    got = {r.key: r.n_distinct for r in
           salted_distinct_count(df, "key", "val").collect()}
    assert got == {"a": 2, "b": 1}  # NULL val not counted, like COUNT(DISTINCT)


def test_zipf_generator_is_skewed_and_bounded(spark):
    import sys as _sys

    _sys.path.insert(0, "/root/repo/scripts")
    from stress_skew import zipf_df

    df = zipf_df(spark, 50_000, 1_000, 1.2)
    counts = {r.key: r["count"] for r in df.groupBy("key").count().collect()}
    assert min(counts) >= 1 and max(counts.keys()) <= 1_000
    hot = max(counts.values()) / 50_000
    assert hot > 0.05, f"hot-key share {hot} — generator not skewed"
    uni = zipf_df(spark, 50_000, 1_000, 0)
    ucounts = [r["count"] for r in uni.groupBy("key").count().collect()]
    assert max(ucounts) / 50_000 < 0.01  # uniform control really is flat


def test_zipf_generator_rejects_degenerate_exponent(spark):
    import sys as _sys

    import pytest as _pytest

    _sys.path.insert(0, "/root/repo/scripts")
    from stress_skew import zipf_df

    with _pytest.raises(ValueError, match="s > 1"):
        zipf_df(spark, 100, 10, 0.9)


def test_zipf_hot_key_share_monotone_in_s(spark):
    """VERDICT r10: the old unbounded inverse CDF folded its tail onto
    key n_keys, making the CLAMP key the hottest at s=1.05 (56% of rows)
    and hot-key share non-monotone in s. The bounded-Pareto form samples
    1..n_keys exactly: key 1 is the unique mode and the hot share rises
    with s, so the published skew curves are self-describing again."""
    import sys as _sys

    _sys.path.insert(0, "/root/repo/scripts")
    from stress_skew import zipf_df

    shares = []
    for s in (1.05, 1.2, 1.5):
        df = zipf_df(spark, 200_000, 100_000, s)
        top = (df.groupBy("key").count()
               .orderBy(F.col("count").desc()).limit(1).collect()[0])
        assert top["key"] == 1, f"s={s}: mode is {top['key']}, not key 1"
        shares.append(top["count"] / 200_000)
    assert shares == sorted(shares), f"hot share non-monotone: {shares}"
