"""Sketch operators: Bloom prefilter dedup and certified heavy hitters.

Both sketches must never change an ANSWER — only the physical route —
so every test here is an exact-equality check against the plain plan.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from empujar_spark.operators import sketch as K


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


class TestBloom:
    def test_no_false_negatives(self, spark):
        rng = random.Random(7)
        keys = [f"k{rng.randrange(10_000)}" for _ in range(2_000)]
        df = _keys_df(spark, keys)
        bloom, m, k = K.build_bloom(df, "key", expected_items=2_000, fpp=0.01)
        flagged = K.with_bloom_flag(df, "key", bloom, m, k)
        assert flagged.filter(~F.col("__maybe_seen")).count() == 0

    def test_fpp_in_range(self, spark):
        build = _keys_df(spark, [f"in{i}" for i in range(5_000)])
        probe = _keys_df(spark, [f"out{i}" for i in range(5_000)])
        bloom, m, k = K.build_bloom(build, "key", expected_items=5_000, fpp=0.01)
        fp = (
            K.with_bloom_flag(probe, "key", bloom, m, k)
            .filter(F.col("__maybe_seen"))
            .count()
        )
        # 1% nominal; allow generous slack, but an order-of-magnitude
        # blowout means the bit math is wrong
        assert fp / 5_000 < 0.05

    def test_ingest_dedup_equals_anti_join(self, spark):
        rng = random.Random(13)
        # dup-heavy: 300 distinct contents across 1 500 rows, split 1:4
        rows = [(i, f"c{rng.randrange(300)}") for i in range(1_500)]
        df = spark.createDataFrame(rows, "id long, key string")
        hist = df.filter(F.col("id") % 5 != 0)
        batch = df.filter(F.col("id") % 5 == 0)
        got = K.bloom_ingest_dedup(hist, batch, "key").select("id", "key")
        want = batch.join(
            hist.select("key").distinct(), "key", "left_anti"
        ).select("id", "key")
        assert {tuple(r) for r in got.collect()} == {
            tuple(r) for r in want.collect()
        }

    def test_params_monotone_and_capped(self):
        m1, _ = K.bloom_params(1_000, 0.01)
        m2, _ = K.bloom_params(10_000, 0.01)
        assert m2 > m1 and m1 % 64 == 0
        m_cap, _ = K.bloom_params(10**12, 0.01)
        assert m_cap == K._MAX_BITS


class TestHeavyHitters:
    def _exact(self, df, key, k):
        return [
            tuple(r)
            for r in df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col(key).asc())
            .limit(k)
            .collect()
        ]

    @pytest.mark.parametrize("capacity", [4, 64, 10_000])
    def test_matches_exact_on_zipf(self, spark, capacity):
        rng = random.Random(42)
        # Zipf-ish: key j with weight 1/(j+1)
        pop = [j for j in range(200) for _ in range(200 // (j + 1))]
        rows = [(rng.choice(pop),) for _ in range(5_000)]
        df = spark.createDataFrame(rows, "key long").repartition(8)
        got = [tuple(r) for r in K.heavy_hitters(df, "key", k=10, capacity=capacity).collect()]
        assert got == self._exact(df, "key", 10)

    def test_nulls_excluded_and_ties_deterministic(self, spark):
        rows = [(v,) for v in [1, 1, 2, 2, 3, None, None, None]]
        df = spark.createDataFrame(rows, "key int")
        got = [tuple(r) for r in K.heavy_hitters(df, "key", k=2, capacity=10).collect()]
        assert got == [(1, 2), (2, 2)]

    def test_fewer_keys_than_k(self, spark):
        df = spark.createDataFrame([(1,), (1,), (2,)], "key int")
        got = [tuple(r) for r in K.heavy_hitters(df, "key", k=10, capacity=10).collect()]
        assert got == [(1, 2), (2, 1)]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestBlockedFuzzyPairs:
    def test_equals_bruteforce_within_blocks(self, spark):
        from empujar_spark.operators.dedup import blocked_fuzzy_pairs

        rng = random.Random(5)
        words = ["cat", "car", "cart", "dog", "dig", "dug", "bolt", "bold"]
        names = list({
            f"{rng.choice(words)} {rng.choice(words)}" for _ in range(40)
        })
        # duplicate rows: operator must dedupe to distinct names first
        rows = [(n,) for n in names for _ in range(3)]
        df = spark.createDataFrame(rows, "p_name string")
        got = {
            tuple(r)
            for r in blocked_fuzzy_pairs(df, "p_name", max_dist=2).collect()
        }
        want = set()
        for a in names:
            for b in names:
                if a < b and a.split(" ")[0] == b.split(" ")[0]:
                    d = _lev(a, b)
                    if d <= 2:
                        want.add((a, b, d))
        assert got == want and len(want) > 0


class TestBloomArtifact:
    def test_roundtrip_and_union_incremental(self, spark, tmp_path):
        df1 = _keys_df(spark, [f"a{i}" for i in range(800)])
        df2 = _keys_df(spark, [f"b{i}" for i in range(800)])
        both = _keys_df(spark, [f"a{i}" for i in range(800)]
                        + [f"b{i}" for i in range(800)])
        # SAME (m, k) for all three: size for the union
        m, k = K.bloom_params(1600, 0.01)
        import numpy as np

        def fixed_build(df):
            # build with pinned params by calling the kernel path directly
            bits, mm, kk = K.build_bloom(df, "key", expected_items=1600)
            assert (mm, kk) == (m, k)
            return bits

        b1, b2, ball = fixed_build(df1), fixed_build(df2), fixed_build(both)
        assert K.bloom_union(b1, b2) == ball  # OR == bloom of the union

        path = str(tmp_path / "bloom")
        K.bloom_to_df(spark, ball, m, k).write.parquet(path)
        bits, m2, k2 = K.bloom_from_df(spark.read.parquet(path))
        assert (bits, m2, k2) == (ball, m, k)

        # served artifact gives the exact anti-join result
        got = K.bloom_ingest_dedup(
            both, _keys_df(spark, ["a1", "zz", "b5", "yy"]), "key",
            bloom=(bits, m2, k2),
        )
        assert sorted(r.key for r in got.collect()) == ["yy", "zz"]

    def test_union_rejects_mismatched_sizes(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            K.bloom_union(b"\x00" * 8, b"\x00" * 16)

    def test_caller_supplied_block_expression(self, spark):
        from pyspark.sql import functions as F

        from empujar_spark.operators.dedup import blocked_fuzzy_pairs

        df = spark.createDataFrame(
            [("cat one",), ("car one",), ("dog one",)], "p_name string"
        )
        # block written over the CALLER's column name, per the docstring
        got = {
            (r.name_a, r.name_b)
            for r in blocked_fuzzy_pairs(
                df, "p_name", max_dist=2,
                block=F.substring(F.col("p_name"), 1, 2),
            ).collect()
        }
        assert got == {("car one", "cat one")}


class TestBloomTreeMerge:
    def test_driver_rows_shrink_to_tree_fanin(self, spark):
        """The hierarchical OR stage must bound what the driver collects
        at ~sqrt(P) bitmap rows, and the merged bitmap must be
        bit-identical to a single-partition reference build."""
        import math

        import numpy as np

        df = _keys_df(spark, [f"k{i}" for i in range(4_000)]).repartition(64)
        m, k = K.bloom_params(4_000, 0.01)
        hashed = df.select(*K._hash_cols("key"))
        rows = K._bloom_bitmap_rows(hashed, m, k)
        assert rows.count() <= math.isqrt(64)

        merged = np.zeros(m // 8, dtype=np.uint8)
        for r in rows.collect():
            merged |= np.frombuffer(r["bits"], dtype=np.uint8)
        ref_bits, mm, kk = K.build_bloom(
            df.coalesce(1), "key", expected_items=4_000
        )
        assert (mm, kk) == (m, k)
        assert merged.tobytes() == ref_bits

    def test_few_partitions_skip_tree_stage(self, spark):
        """Below the threshold the extra shuffle is pure overhead — the
        per-partition rows go straight to the driver."""
        df = _keys_df(spark, [f"k{i}" for i in range(100)]).repartition(2)
        m, k = K.bloom_params(100, 0.01)
        rows = K._bloom_bitmap_rows(df.select(*K._hash_cols("key")), m, k)
        assert rows.count() <= 2

    def test_ingest_dedup_registers_no_sql_cache(self, spark):
        """bloom_ingest_dedup must not pin a relation in the session
        CacheManager (a per-batch ingest loop would leak one cached plan
        per batch); localCheckpoint blocks are RDD-owned and
        cleaner-managed instead."""
        spark.catalog.clearCache()
        hist = _keys_df(spark, [f"h{i}" for i in range(200)])
        batch = _keys_df(spark, [f"h{i}" for i in range(50)] + ["x1", "x2"])
        got = K.bloom_ingest_dedup(hist, batch, "key").collect()
        assert sorted(r.key for r in got) == ["x1", "x2"]
        assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


class TestHeavyHittersCertificate:
    def test_nonzero_slack_certified_on_skewed_keys(self, spark):
        """The case the uniform corpus can't produce: per-partition
        distinct keys exceed capacity (bound > 0) AND a genuinely heavy
        head — the certificate must pass with non-zero slack and the
        answer must equal the exact plan."""
        rows = [(0,)] * 1_000 + [(j,) for j in range(1, 501) for _ in range(2)]
        df = spark.createDataFrame(rows, "key int").repartition(8)
        got, stats = K.heavy_hitters_certified(df, "key", k=1, capacity=50)
        assert stats["slack"] > 0, "bound degenerated — test data too small"
        assert stats["certified"] and not stats["fallback"]
        assert [tuple(r) for r in got.collect()] == [(0, 1_000)]

    def test_failed_certificate_falls_back_exact(self, spark):
        """No heavy tail at this capacity: certificate must fail and the
        fallback must still return the exact answer."""
        rows = [(j,) for j in range(200) for _ in range(3)]
        df = spark.createDataFrame(rows, "key int").repartition(8)
        got, stats = K.heavy_hitters_certified(df, "key", k=10, capacity=4)
        assert stats["fallback"] and not stats["certified"]
        want = [
            tuple(r)
            for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("key").asc()).limit(10)
            .collect()
        ]
        assert [tuple(r) for r in got.collect()] == want


class TestMinhashBucketCap:
    def test_cap_drops_only_hot_bucket_pairs(self, spark):
        from empujar_spark.operators.dedup import minhash_lsh_pairs

        base = [(i, f"alpha beta gamma delta {i} epsilon zeta") for i in range(30)]
        hot = [(100 + i, "same same same same same same") for i in range(20)]
        df = spark.createDataFrame(base + hot, "doc_id long, text string")
        uncapped = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(df).collect()}
        capped = {(r.id_a, r.id_b)
                  for r in minhash_lsh_pairs(df, max_bucket=10).collect()}
        assert capped <= uncapped
        hot_pairs = {(a, b) for a, b in uncapped if a >= 100 and b >= 100}
        assert len(hot_pairs) == 20 * 19 // 2  # identical docs all pair up
        assert not (capped & hot_pairs)  # the hot bucket was dropped
        # a generous cap is a no-op
        assert {(r.id_a, r.id_b)
                for r in minhash_lsh_pairs(df, max_bucket=10_000).collect()
                } == uncapped


class TestBloomRegistryFold:
    def test_fold_equals_from_scratch_and_clears_stale(self, spark, tmp_path):
        """Steady-state maintenance: fold a batch into the REGISTERED
        artifact — the folded bitmap must be bit-identical to a
        from-scratch build over history ∪ batch (bloom_union exactness,
        now through the registry path), serving must stay the exact
        anti-join, and provenance must come back fresh without a
        rebuild."""
        from empujar_spark.catalog import Warehouse
        from empujar_spark.indexes import IndexRegistry

        wh = Warehouse(spark, str(tmp_path), primary_key="key")
        reg = IndexRegistry(wh)
        hist = _keys_df(spark, [f"h{i}" for i in range(900)])
        batch = _keys_df(spark, [f"b{i}" for i in range(300)])
        both = _keys_df(spark, [f"h{i}" for i in range(900)]
                        + [f"b{i}" for i in range(300)])

        wh.insert_data("keys", hist)
        m, k = K.bloom_params(1_200, 0.01)  # size for the union up front
        bits0 = K.build_bloom_with_params(hist, "key", m, k)
        reg.register("bl", "bloom",
                     {"bitmap": K.bloom_to_df(spark, bits0, m, k)},
                     source_table="keys")

        wh.insert_data("keys", batch)  # source advances
        assert reg.is_stale("bl")
        folded, m2, k2 = K.bloom_fold_into_registry(reg, "bl", batch, "key")
        assert (m2, k2) == (m, k) and not reg.is_stale("bl")

        want = K.build_bloom_with_params(both, "key", m, k)
        assert folded == want  # OR ≡ bloom of the union, bit-exact
        stored = K.bloom_from_df(reg.read("bl")["bitmap"])
        assert stored == (want, m, k)

        # served artifact still yields the exact anti-join result
        probe = _keys_df(spark, ["h5", "b7", "fresh1", "fresh2"])
        got = K.bloom_ingest_dedup(both, probe, "key", bloom=stored)
        assert sorted(r.key for r in got.collect()) == ["fresh1", "fresh2"]


class TestDriverSideFold:
    def test_fold_hashes_bit_identical_to_distributed_build(self, spark):
        """fold_hashes_into_bloom over collected xxhash64 pairs must be
        bit-identical to build_bloom_with_params over the same keys —
        the invariant that lets the streaming admission gate fold each
        batch's admitted sliver driver-side (zero extra Spark jobs)
        while later batches keep probing with the JVM-built bitmap."""
        from pyspark.sql import functions as F

        from empujar_spark.operators import sketch as K

        base = _keys_df(spark, [f"h{i}" for i in range(500)])
        sliver = _keys_df(spark, [f"s{i}" for i in range(120)])
        both = _keys_df(spark, [f"h{i}" for i in range(500)]
                        + [f"s{i}" for i in range(120)])
        m, k = K.bloom_params(1_000, 0.01)
        bits = K.build_bloom_with_params(base, "key", m, k)
        rows = sliver.select(
            F.xxhash64("key").alias("__h1"),
            F.xxhash64("key", F.lit("empujar-bloom-2")).alias("__h2"),
        ).collect()
        folded = K.fold_hashes_into_bloom(
            bits, [r["__h1"] for r in rows], [r["__h2"] for r in rows], m, k
        )
        assert folded == K.build_bloom_with_params(both, "key", m, k)
        # empty sliver is the identity
        assert K.fold_hashes_into_bloom(bits, [], [], m, k) == bits


class TestBloomPrunedJoin:
    def test_row_identical_to_plain_join(self, spark):
        """The bloom prune drops only rows the join would drop anyway
        (no false negatives), and false positives die in the real join
        — result must be row-identical to the plain inner join."""
        from pyspark.sql import functions as F

        from empujar_spark.operators import sketch as K

        fact = spark.range(5_000).select(
            (F.col("id") % 500).alias("key"), F.col("id").alias("val")
        )
        dim = spark.range(40).select(
            (F.col("id") * 13).alias("key"),
            F.concat(F.lit("d"), F.col("id")).alias("attr"),
        )
        got = K.bloom_pruned_join(fact, dim, "key")
        want = fact.join(dim, "key", "inner")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_left_semi_and_stored_artifact(self, spark):
        from pyspark.sql import functions as F

        from empujar_spark.operators import sketch as K

        fact = spark.range(2_000).select(
            (F.col("id") % 100).alias("key"), F.col("id").alias("val")
        )
        dim = spark.range(7).select((F.col("id") * 11).alias("k2"))
        art = K.build_bloom(dim, "k2", expected_items=7)
        got = K.bloom_pruned_join(
            fact, dim, "key", dim_key="k2", how="left_semi", bloom=art
        )
        want = fact.join(
            dim.select(F.col("k2").alias("key")), "key", "left_semi"
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_outer_joins_rejected(self, spark):
        import pytest

        from empujar_spark.operators import sketch as K

        fact = spark.range(10).withColumnRenamed("id", "key")
        dim = spark.range(3).withColumnRenamed("id", "key")
        with pytest.raises(ValueError, match="matching fact rows"):
            K.bloom_pruned_join(fact, dim, "key", how="left")


class TestPrunedJoinDispatch:
    def test_semi_strategy_row_identical(self, spark):
        from pyspark.sql import functions as F

        from empujar_spark.operators import sketch as K

        fact = spark.range(3_000).select(
            (F.col("id") % 400).alias("key"), F.col("id").alias("val")
        )
        dim = spark.range(30).select(
            (F.col("id") * 7).alias("key"),
            F.concat(F.lit("d"), F.col("id")).alias("attr"),
        )
        got = K.pruned_join(fact, dim, "key", strategy="semi")
        want = fact.join(dim, "key", "inner")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )
        # the semi probe is a broadcast join below the real join
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan

    def test_auto_picks_semi_for_small_key_sets_and_bloom_past_cap(
        self, spark, monkeypatch
    ):
        from pyspark.sql import functions as F

        from empujar_spark.operators import sketch as K

        fact = spark.range(2_000).select(
            (F.col("id") % 100).alias("key"), F.col("id").alias("val")
        )
        dim = spark.range(20).select((F.col("id") * 5).alias("key"))
        want = sorted(map(tuple, fact.join(dim, "key").collect()))

        # small key set -> semi (no might_contain udf in the plan)
        got = K.pruned_join(fact, dim, "key", expected_items=20)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" not in plan
        assert sorted(map(tuple, got.collect())) == want

        # past the cap -> bloom (the Arrow probe appears)
        monkeypatch.setattr(K, "_SEMI_PRUNE_MAX_KEYS", 5)
        got2 = K.pruned_join(fact, dim, "key", expected_items=20)
        plan2 = got2._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan2
        assert sorted(map(tuple, got2.collect())) == want

        # a stored artifact forces the bloom leg regardless of size
        art = K.build_bloom(dim, "key", expected_items=20)
        got3 = K.pruned_join(fact, dim, "key", bloom=art)
        assert "might_contain" in (
            got3._jdf.queryExecution().executedPlan().toString()
        )
        assert sorted(map(tuple, got3.collect())) == want

    def test_auto_uses_warehouse_meta_without_a_count_job(
        self, spark, monkeypatch, tmp_path
    ):
        """VERDICT r11 #5: for a warehouse-read dim, auto mode takes its
        size signal from the write-time footer count riding the frame
        (``_empujar_n_rows``) instead of paying a distinct().count()
        job — count() is poisoned during dispatch to prove no job runs."""
        from pyspark.sql import DataFrame, functions as F

        from empujar_spark.catalog import Warehouse
        from empujar_spark.operators import sketch as K

        wh = Warehouse(spark, str(tmp_path / "wh"), primary_key="key")
        dim_src = spark.range(20).select(
            (F.col("id") * 5).alias("key"),
            F.concat(F.lit("d"), F.col("id")).alias("attr"),
        )
        wh.insert_data("dim", dim_src, merge_key="key")
        dim = wh.read("dim")
        assert getattr(dim, "_empujar_n_rows", None) == 20
        fact = spark.range(2_000).select(
            (F.col("id") % 100).alias("key"), F.col("id").alias("val")
        )
        want = sorted(map(tuple, fact.join(dim, "key").collect()))

        def boom(self):
            raise AssertionError(
                "auto dispatch paid a count job despite warehouse meta"
            )

        monkeypatch.setattr(DataFrame, "count", boom)
        got = K.pruned_join(fact, dim, "key")  # auto, no expected_items
        plan = got._jdf.queryExecution().executedPlan().toString()
        monkeypatch.undo()
        assert "might_contain" not in plan  # 20 keys -> semi
        assert sorted(map(tuple, got.collect())) == want

        # past the cap the same metadata flips the choice to bloom,
        # still without a count job
        monkeypatch.setattr(K, "_SEMI_PRUNE_MAX_KEYS", 5)
        monkeypatch.setattr(DataFrame, "count", boom)
        got2 = K.pruned_join(fact, dim, "key")
        plan2 = got2._jdf.queryExecution().executedPlan().toString()
        monkeypatch.undo()
        assert "might_contain" in plan2
        assert sorted(map(tuple, got2.collect())) == want

        # a transformed dim drops the hint — exactly when the estimate
        # stops describing the frame — and the fallback count returns
        filtered = dim.filter(F.col("key") < 50)
        assert getattr(filtered, "_empujar_n_rows", None) is None


def test_approx_stats_sketch_partials_pinned(spark):
    """VERDICT r14 item 5 (sketch half): the production sketch entry is
    rows-only by construction (HLL/KLL estimates are engine-specific),
    so pin its merge behavior here instead — (a) the deterministic
    sub-aggregates (n_rows, avg_price) equal the exact values bit for
    bit, (b) the HLL distinct estimate lands within its configured 5%
    rsd (x3 = the standard HLL tail bound) of the exact count and the
    KLL median within 5% of the exact median, and (c) a rerun of the
    same plan reproduces the sketch outputs exactly — merge partials
    are deterministic for a fixed partitioning, which is what makes
    the entry's bench timings comparable across rounds."""
    from pyspark.sql import functions as F

    from empujar_spark.plans.corpus import CORPUS

    sf = "/root/testdata/sf0.001"
    fn = CORPUS["approx_stats_sketch"].fn
    got = {r.l_returnflag: r for r in fn(spark, sf).collect()}
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)"))
                .cast("double") / F.count(F.lit(1))
            ).alias("avg_price"),
            F.countDistinct("l_partkey").alias("parts"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, e in exact.items():
        g = got[flag]
        assert g.n_rows == e.n
        assert g.avg_price == e.avg_price
        assert abs(g.approx_parts - e.parts) <= 0.15 * e.parts
        assert abs(g.approx_median - e.median) <= 0.05 * e.median
    again = {r.l_returnflag: r for r in fn(spark, sf).collect()}
    for flag, g in got.items():
        assert tuple(g) == tuple(again[flag])
