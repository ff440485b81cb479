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
