"""Skewed-key stress harness: Zipfian data, salted vs unsalted curves.

100× data is never uniform — this harness measures the repo's skew
machinery on data where skew is REAL, which the per-round uniform
testdata cannot exercise:

- **aggregation**: plain ``groupBy().sum()`` vs ``skew.salted_agg`` and
  plain ``count_distinct`` vs ``skew.salted_distinct_count`` across a
  skew sweep. Expectation stated up front: simple sum/count partials
  collapse a hot key map-side (one partial row per task), so salting
  should NOT win there — the honest result is "salting is overhead for
  algebraic aggregates; it pays for distinct-style aggregates whose
  partials cannot collapse".
- **join**: a Zipf-keyed fact against a non-broadcastable dimension —
  unsalted with AQE skew-split on, unsalted with it off (the raw
  sort-merge funnel), and ``skew.salted_join``. The crossover the
  VERDICT asked for lives here: at s=0 salting is pure replication
  overhead; as s grows the unsalted hot partition serializes.
- **join_prune**: raw sort-merge vs ``sketch.bloom_pruned_join`` on a
  uniform fact against a non-broadcastable dim filtered to a fraction
  phi of the key space — the explicit-runtime-filter crossover: probe
  overhead at high phi, saved fact exchange at low phi.
- **heavy hitters**: the truncation certificate on data where it is
  non-trivial — per-partition distinct keys ≫ capacity, so the bound is
  > 0 and the certificate must still pass (checked, not just timed).
- **minhash banding**: a growing near-identical cluster makes one band
  bucket hot; candidate cost is Σ(bucket²). Uncapped vs
  ``max_bucket``-capped curves show the quadratic-vs-flat split.

Usage:  python scripts/stress_skew.py [--out STRESS_SKEW.json]
                                      [--sweep 0,1.05,1.2,1.5]
Writes one JSON object; values are wall-clock seconds (min of --runs).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from empujar_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def zipf_df(
    spark: SparkSession,
    n_rows: int,
    n_keys: int,
    s: float,
    seed: int = 0,
    n_parts: int = 32,
) -> DataFrame:
    """Rows with ``key`` ~ a BOUNDED power law on 1..n_keys (the Zipf
    shape, s > 1), generated entirely JVM-side via the exact inverse CDF
    of the continuous bounded analogue: X on [1, n_keys+1) with density
    ∝ x^-s, key = floor(X) — key k carries mass ∝ ∫ₖ^{k+1} x^-s dx,
    strictly decreasing in k. Exact bounded sampling, so NO truncation
    fold: the earlier unbounded inverse CDF clamped its tail onto key
    ``n_keys``, which at s=1.05 silently made the clamp key the hottest
    (56% of all rows) and hot-key share NON-monotone in s — this form
    keeps key 1 the unique mode and hot-key share monotone increasing
    in s, so salted-vs-unsalted crossover curves read cleanly.
    ``s == 0`` gives the uniform control. ``val`` is the unique row id,
    so per-key distinct counts are the key's row count (worst case for
    distinct aggregation). No Python in the generate path."""
    if 0 < s <= 1:
        # s = 1 is the inverse-CDF singularity (1/(1-s) blows up) and
        # 0 < s < 1 is a sub-Zipf skew the sweeps don't model; keep the
        # domain honest instead of silently producing near-uniform data.
        raise ValueError(f"zipf_df needs s > 1 (or 0 for uniform); got {s}")
    df = spark.range(n_rows).repartition(n_parts)
    if s <= 0:
        key = (F.floor(F.rand(seed) * n_keys) + 1).cast("long")
    else:
        # bounded-Pareto inverse CDF on [1, L+1): H = (L+1)^(1-s),
        # X = (1 - u·(1 - H))^(1/(1-s)); u<1 keeps X < L+1, the least()
        # only guards the floating-point boundary
        H = float((n_keys + 1) ** (1.0 - s))
        x = F.pow(
            F.lit(1.0) - F.rand(seed) * F.lit(1.0 - H),
            F.lit(1.0 / (1.0 - s)),
        )
        key = F.least(F.floor(x), F.lit(n_keys)).cast("long")
    return df.select(
        key.alias("key"),
        F.col("id").alias("val"),
        (F.col("id") % 97).cast("double").alias("amount"),
    )


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS_SKEW.json"))
    ap.add_argument("--sweep", default="0,1.05,1.2,1.5",
                    help="zipf exponents; 0 = uniform control")
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--join-rows", type=int, default=10_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--only", default="",
                    help="comma list of sections (agg,join,join_prune,"
                    "join_prune_keys,heavy_hitters,minhash,fuzzy_cap); "
                    "results MERGE into an existing --out capture")
    ap.add_argument("--hot-clusters", default="200,800,3200",
                    help="minhash hot-cluster sizes")
    args = ap.parse_args()
    sweep = [float(x) for x in args.sweep.split(",")]
    only = {x for x in args.only.split(",") if x}

    def wanted(section: str) -> bool:
        return not only or section in only

    spark = get_spark("stress-skew")
    from empujar_spark.operators import dedup as D
    from empujar_spark.operators import sketch as K
    from empujar_spark.operators import skew as SK

    noop(zipf_df(spark, 100_000, 1_000, 1.2))  # warmup

    # Per-SECTION capture config (ADVICE r11): a merged --only re-capture
    # previously overwrote the top-level runs/sweep while other sections
    # kept data captured under the old config — the file stopped
    # describing itself. Every section now records the config it was
    # captured under; the top-level fields describe the LAST capture only.
    cap = {"runs": args.runs, "sweep": sweep, "rows": args.rows,
           "join_rows": args.join_rows, "keys": args.keys}
    out: dict = {"rows": args.rows, "join_rows": args.join_rows,
                 "keys": args.keys, "runs": args.runs, "sweep": sweep}
    if only and os.path.isfile(args.out):
        with open(args.out) as fh:
            out = {**json.load(fh), **out}

    # ---- hot-key share per s (documents the generator, cheap) ----
    shares = {}
    for s in sweep:
        df = zipf_df(spark, 1_000_000, args.keys, s)
        top = (df.groupBy("key").count()
               .orderBy(F.col("count").desc()).limit(1).collect()[0])
        shares[str(s)] = round(top["count"] / 1_000_000, 4)
    out.setdefault("hot_key_share", {}).update(shares)

    # ---------------- aggregation sweep ----------------
    agg = out.get("agg", {}) if wanted("agg") else {}
    for key in ("sum_plain", "sum_salted", "distinct_plain", "distinct_salted"):
        agg.setdefault(key, {})
    for s in sweep if wanted("agg") else []:
        df = zipf_df(spark, args.rows, args.keys, s)
        agg["sum_plain"][str(s)] = timed(lambda: noop(
            df.groupBy("key").agg(F.sum("amount").alias("total"))), args.runs)
        agg["sum_salted"][str(s)] = timed(lambda: noop(
            SK.salted_agg(df, "key", "amount")), args.runs)
        agg["distinct_plain"][str(s)] = timed(lambda: noop(
            df.groupBy("key").agg(
                F.count_distinct("val").alias("n_distinct"))), args.runs)
        agg["distinct_salted"][str(s)] = timed(lambda: noop(
            SK.salted_distinct_count(df, "key", "val")), args.runs)
        print(f"agg s={s}: " + " ".join(
            f"{k}={v[str(s)]}s" for k, v in agg.items()), file=sys.stderr)
    if wanted("agg"):
        agg["_capture"] = cap
        out["agg"] = agg

    # ---------------- join sweep ----------------
    # dim too big to broadcast at 100 TB — model that by disabling the
    # local broadcast threshold for these measurements only.
    dim = spark.range(1, args.keys + 1).select(
        F.col("id").alias("key"),
        F.sha1(F.col("id").cast("string")).alias("dim_payload"),
    )
    join = out.get("join", {}) if wanted("join") else {}
    for key in ("unsalted_aqe_skewsplit", "unsalted_no_skewsplit", "salted"):
        join.setdefault(key, {})
    bcast0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    skew0 = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for s in sweep if wanted("join") else []:
            fact = zipf_df(spark, args.join_rows, args.keys, s)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
            join["unsalted_aqe_skewsplit"][str(s)] = timed(
                lambda: noop(fact.join(dim, "key")), args.runs)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
            join["unsalted_no_skewsplit"][str(s)] = timed(
                lambda: noop(fact.join(dim, "key")), args.runs)
            join["salted"][str(s)] = timed(
                lambda: noop(SK.salted_join(fact, dim, "key")), args.runs)
            print(f"join s={s}: " + " ".join(
                f"{k}={v[str(s)]}s" for k, v in join.items()), file=sys.stderr)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast0)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew0)
    if wanted("join"):
        join["_capture"] = cap
        out["join"] = join

    # ---------------- pruned join: selectivity sweep ----------------
    # The runtime-filter A/B behind sketch.bloom_pruned_join: a UNIFORM
    # wide fact (skew is not the subject; a ~80-byte payload makes the
    # exchange the cost center, and it is MATERIALIZED to parquet and
    # read once untimed so every curve starts page-cache-warm — a
    # computed fact hides the exchange behind generation cost) joined
    # to a non-broadcastable dim filtered to a fraction phi of the key
    # space, broadcast threshold disabled. Three plans:
    #   raw    — plain join: the whole fact rides the exchange;
    #   semi   — JVM prune: broadcast the dim's KEY SET, left-semi
    #            before the join (whole-stage codegen, no Python);
    #   bloom  — sketch.bloom_pruned_join: the Arrow bitmap probe, the
    #            regime where even the key set cannot broadcast.
    # Honest local reading (this box's shuffle is memory-speed, so the
    # exchange being saved is cheap to begin with): semi wins in the
    # mid-selectivity band (phi=0.1: 1.30s vs raw 1.65s), LOSES at
    # phi=0.5 (half the fact survives anyway, and the 50k-key broadcast
    # plus the extra join stage cost more than the pruned half saves),
    # and is a wash below phi=0.01 where the raw job is already under a
    # second. bloom's Arrow probe (~30M rows/s) never pays here — its
    # regime needs a network/disk exchange AND a key set too big to
    # broadcast. The capture is the evidence for the operator
    # docstring's probe-picking rule, crossovers measured at both ends.
    jp = out.get("join_prune", {}) if wanted("join_prune") else {}
    for key in ("raw", "semi", "bloom"):
        jp.setdefault(key, {})
    if wanted("join_prune"):
        import tempfile

        bcast0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            fact_dir = tempfile.mkdtemp(prefix="stress-prune-fact-")
            (zipf_df(spark, args.join_rows, args.keys, 0)
             .withColumn("payload", F.concat(
                 F.sha1(F.col("val").cast("string")),
                 F.sha1((F.col("val") + 1).cast("string"))))
             .write.mode("overwrite").parquet(fact_dir))
            fact_u = spark.read.parquet(fact_dir)
            noop(fact_u)  # untimed: fill the page cache
            for phi in (0.5, 0.1, 0.01, 0.001):
                n_dim = max(1, int(args.keys * phi))
                dimf = dim.filter(F.col("key") <= n_dim)
                jp["raw"][str(phi)] = timed(
                    lambda: noop(fact_u.join(dimf, "key")), args.runs)
                jp["semi"][str(phi)] = timed(
                    lambda: noop(
                        fact_u.join(
                            F.broadcast(dimf.select("key").distinct()),
                            "key", "left_semi",
                        ).join(dimf, "key")),
                    args.runs)
                jp["bloom"][str(phi)] = timed(
                    lambda: noop(K.bloom_pruned_join(
                        fact_u, dimf, "key", expected_items=n_dim)),
                    args.runs)
                print(f"join_prune phi={phi}: "
                      f"raw={jp['raw'][str(phi)]}s "
                      f"semi={jp['semi'][str(phi)]}s "
                      f"bloom={jp['bloom'][str(phi)]}s", file=sys.stderr)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast0)
        jp["_capture"] = cap
        out["join_prune"] = jp

    # ------------- pruned join: dim-KEY-COUNT octave sweep -------------
    # VERDICT r11 #4: the phi sweep above varies SELECTIVITY at one
    # key-set size, but pruned_join's semi↔bloom dispatcher crosses over
    # on KEY COUNT — the broadcast key set grows 8B+overhead per key
    # while the bitmap stays ~1.2 bits-MB per million keys. This sweep
    # holds selectivity fixed (fact keys uniform over [1, 10·N]; dim =
    # keys [1..N], so 10% of fact rows match at every octave) and
    # octaves N through 1M/4M/16M, measuring the same three plans. The
    # _SEMI_PRUNE_MAX_KEYS constant in operators/sketch.py cites this
    # curve instead of a bytes-of-longs extrapolation.
    jpk = out.get("join_prune_keys", {}) if wanted("join_prune_keys") else {}
    for leg in ("raw", "semi", "bloom"):
        jpk.setdefault(leg, {})
    if wanted("join_prune_keys"):
        import tempfile

        bcast0 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            for n_dim in (1_000_000, 4_000_000, 16_000_000):
                fact_dir = tempfile.mkdtemp(prefix="stress-prune-keys-")
                (zipf_df(spark, args.join_rows, 10 * n_dim, 0)
                 .withColumn("payload", F.concat(
                     F.sha1(F.col("val").cast("string")),
                     F.sha1((F.col("val") + 1).cast("string"))))
                 .write.mode("overwrite").parquet(fact_dir))
                fact_u = spark.read.parquet(fact_dir)
                noop(fact_u)  # untimed: fill the page cache
                dimk = spark.range(1, n_dim + 1).select(
                    F.col("id").alias("key"),
                    F.sha1(F.col("id").cast("string")).alias("dim_payload"),
                )
                jpk["raw"][str(n_dim)] = timed(
                    lambda: noop(fact_u.join(dimk, "key")), args.runs)
                jpk["semi"][str(n_dim)] = timed(
                    lambda: noop(
                        fact_u.join(
                            F.broadcast(dimk.select("key").distinct()),
                            "key", "left_semi",
                        ).join(dimk, "key")),
                    args.runs)
                jpk["bloom"][str(n_dim)] = timed(
                    lambda: noop(K.bloom_pruned_join(
                        fact_u, dimk, "key", expected_items=n_dim)),
                    args.runs)
                print(f"join_prune_keys n_dim={n_dim}: "
                      f"raw={jpk['raw'][str(n_dim)]}s "
                      f"semi={jpk['semi'][str(n_dim)]}s "
                      f"bloom={jpk['bloom'][str(n_dim)]}s", file=sys.stderr)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast0)
        jpk["_capture"] = cap
        out["join_prune_keys"] = jpk

    # ---------------- heavy-hitters certificate, non-trivial bound ----
    hh = out.get("heavy_hitters", {}) if wanted("heavy_hitters") else {}
    if wanted("heavy_hitters"):
        # warm the Arrow python workers the summarize kernel runs on —
        # without this the first sweep point carries worker spin-up
        # (observed 8s vs 2.8s for later points) and the curve misreads
        K.heavy_hitters_certified(
            zipf_df(spark, 100_000, 10_000, 1.2), "key", k=5, capacity=512
        )[0].collect()
    for s in [x for x in sweep if x > 0] if wanted("heavy_hitters") else []:
        df = zipf_df(spark, 5_000_000, 200_000, s)
        t0 = time.monotonic()
        got, stats = K.heavy_hitters_certified(df, "key", k=10, capacity=4096)
        got_rows = [tuple(r) for r in got.collect()]
        secs = round(time.monotonic() - t0, 2)
        want = [tuple(r) for r in
                df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
                .orderBy(F.col("cnt").desc(), F.col("key").asc())
                .limit(10).collect()]
        hh[str(s)] = {**stats, "secs": secs, "matches_exact": got_rows == want}
        print(f"heavy_hitters s={s}: {hh[str(s)]}", file=sys.stderr)
    if wanted("heavy_hitters"):
        hh["_capture"] = cap
        out["heavy_hitters"] = hh

    # ---------------- minhash banding under a hot bucket ----------------
    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base_id = docs0.agg(F.max("doc_id")).collect()[0][0] + 1
    seed_text = docs0.orderBy("doc_id").select("text").head()[0]
    mb = out.get("minhash_hot_band", {}) if wanted("minhash") else {}
    for key in ("uncapped", "capped_50"):
        mb.setdefault(key, {})
    clusters = [int(x) for x in args.hot_clusters.split(",")]
    for c in clusters if wanted("minhash") else []:
        # c IDENTICAL docs: one hot band bucket of size c on top of the
        # sf corpus background — candidate volume grows as c² per band
        hot = spark.range(c).select(
            (F.col("id") + base_id).alias("doc_id"),
            F.lit(seed_text).alias("text"),
        )
        docs = docs0.select("doc_id", "text").unionByName(hot)
        mb["uncapped"][str(c)] = timed(lambda: noop(
            D.minhash_lsh_pairs(docs)), args.runs)
        mb["capped_50"][str(c)] = timed(lambda: noop(
            D.minhash_lsh_pairs(docs, max_bucket=50)), args.runs)
        # no silent caps: record what the cap SACRIFICES (candidate pairs
        # dropped with the hot buckets) next to what it saves
        mb.setdefault("pairs_uncapped", {})[str(c)] = (
            D.minhash_lsh_pairs(docs).count()
        )
        mb.setdefault("pairs_capped_50", {})[str(c)] = (
            D.minhash_lsh_pairs(docs, max_bucket=50).count()
        )
        print(f"minhash hot_cluster={c}: uncapped={mb['uncapped'][str(c)]}s "
              f"capped={mb['capped_50'][str(c)]}s pairs "
              f"{mb['pairs_uncapped'][str(c)]}→{mb['pairs_capped_50'][str(c)]}",
              file=sys.stderr)
    if wanted("minhash"):
        mb["_capture"] = {**cap, "hot_clusters": clusters}
        out["minhash_hot_band"] = mb

    # -------------- fuzzy_join under a hot (stop-)shingle --------------
    # VERDICT r15 item 2: a shingle shared by c docs PER SIDE emits c²
    # pair rows inside the cross-table shingle join (exact mode) or the
    # candidate re-score (lsh mode); max_shingle_freq drops it before
    # set sizes. Fixture: c synthetic docs per side all opening with the
    # same 10-token phrase (8 hot shingles, union-df = 2c) but unique
    # tails, on top of the sf corpus background — so uncapped cost bends
    # as c² while the capped curve tracks the corpus scan.
    fz = out.get("fuzzy_hot_shingle", {}) if wanted("fuzzy_cap") else {}
    for key in ("uncapped", "capped_50"):
        fz.setdefault(key, {})
    hot_phrase = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    fuzz_clusters = [int(x) for x in args.hot_clusters.split(",")]
    for c in fuzz_clusters if wanted("fuzzy_cap") else []:
        hot_l = spark.range(c).select(
            (F.col("id") + base_id).alias("doc_id"),
            F.concat(F.lit(hot_phrase + " left tail token "),
                     F.col("id").cast("string")).alias("text"),
        )
        hot_r = spark.range(c).select(
            (F.col("id") + base_id).alias("doc_id"),
            F.concat(F.lit(hot_phrase + " right tail token "),
                     F.col("id").cast("string")).alias("text"),
        )
        left = docs0.select("doc_id", "text").unionByName(hot_l)
        right = docs0.select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" vX")).alias("text"),
        ).unionByName(hot_r.select(
            (F.col("doc_id") + 100_000_000).alias("doc_id"), "text"
        ))
        fz["uncapped"][str(c)] = timed(lambda: noop(
            D.fuzzy_join(left, right, threshold=0.3)), args.runs)
        fz["capped_50"][str(c)] = timed(lambda: noop(
            D.fuzzy_join(left, right, threshold=0.3,
                         max_shingle_freq=50)), args.runs)
        # no silent caps: record the links the cap sacrifices
        fz.setdefault("pairs_uncapped", {})[str(c)] = (
            D.fuzzy_join(left, right, threshold=0.3).count()
        )
        fz.setdefault("pairs_capped_50", {})[str(c)] = (
            D.fuzzy_join(left, right, threshold=0.3,
                         max_shingle_freq=50).count()
        )
        print(f"fuzzy hot_shingle c={c}: uncapped={fz['uncapped'][str(c)]}s "
              f"capped={fz['capped_50'][str(c)]}s pairs "
              f"{fz['pairs_uncapped'][str(c)]}→{fz['pairs_capped_50'][str(c)]}",
              file=sys.stderr)
    if wanted("fuzzy_cap"):
        fz["_capture"] = {**cap, "hot_clusters": fuzz_clusters}
        out["fuzzy_hot_shingle"] = fz

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
