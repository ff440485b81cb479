"""Index registry: per-kind round trips, provenance, staleness flags.

The registry's contract: every stored index kind (bm25/ivf/pq/bloom/
minhash bands) round-trips through named component tables; provenance
records the source's data version (warehouse source) or listing
fingerprint (external parquet); a source-version flip raises the stale
flag while the index KEEPS SERVING; vacuum never breaks either.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from empujar_spark.catalog import Warehouse
from empujar_spark.indexes import IndexRegistry

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def reg(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"), primary_key="doc_id")
    return IndexRegistry(wh)


def _docs(spark, n=60):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < n)
    )


class TestRoundTrips:
    def test_bm25_round_trip_serves_identically(self, spark, reg):
        from empujar_spark.operators import text as X

        docs = _docs(spark)
        idx = X.bm25_build_index(docs)
        reg.register(
            "bm25_docs", "bm25", idx,
            source_path=f"{SF}/documents.parquet",
            params={"k1": 1.2, "b": 0.75},
        )
        stored = reg.read("bm25_docs")
        assert set(stored) == {"postings", "dfreq", "doclen", "stats"}
        q = {"q1": ["the", "quick", "data"]}
        want = {tuple(r) for r in
                X.bm25_search_indexed(idx, q, top_n=5).collect()}
        got = {tuple(r) for r in
               X.bm25_search_indexed(stored, q, top_n=5).collect()}
        assert got == want and len(got) > 0

    def test_ivf_round_trip_with_partitioned_assignments(self, spark, reg):
        from empujar_spark.operators import similarity as S

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        idx = S.ivf_build_index(emb, n_centroids=8)
        reg.register(
            "ivf_emb", "ivf", idx,
            source_path=f"{SF}/embeddings.parquet",
            partition_cols={"assignments": ["cid"]},
        )
        stored = reg.read("ivf_emb")
        queries = emb.filter(F.col("vec_id") < 5)
        want = {tuple(r) for r in
                S.ivf_search_indexed(idx, queries, k=3, nprobe=8).collect()}
        got = {tuple(r) for r in
                S.ivf_search_indexed(stored, queries, k=3, nprobe=8).collect()}
        assert got == want and len(got) > 0
        # hive layout really is partitioned on cid
        meta = reg.wh._load_meta("__idx_ivf_emb__g1__assignments")
        assert meta["partition_cols"] == ["cid"]

    def test_pq_round_trip(self, spark, reg):
        from empujar_spark.operators import similarity as S

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        idx = S.pq_build_index(emb, m=8, ks=16)
        reg.register("pq_emb", "pq", idx,
                     source_path=f"{SF}/embeddings.parquet")
        stored = reg.read("pq_emb")
        assert stored["codes"].count() == idx["codes"].count()

        def rows(df):  # codebook centroids are array columns — unhashable
            return sorted(
                tuple(tuple(x) if isinstance(x, list) else x for x in r)
                for r in df.collect()
            )

        assert rows(stored["codebooks"]) == rows(idx["codebooks"])

    def test_bloom_round_trip(self, spark, reg):
        from empujar_spark.operators import sketch as K
        from empujar_spark.operators import text as X

        fp = X.fingerprint(_docs(spark))
        bits, m, k = K.build_bloom(fp, "fingerprint", expected_items=60)
        reg.register(
            "bloom_docs", "bloom",
            {"bitmap": K.bloom_to_df(spark, bits, m, k)},
            source_path=f"{SF}/documents.parquet",
        )
        got = K.bloom_from_df(reg.read("bloom_docs")["bitmap"])
        assert got == (bits, m, k)

    def test_minhash_band_history_round_trip(self, spark, reg):
        from empujar_spark.operators import dedup as D

        docs = _docs(spark)
        hist = D.band_history_table(docs)
        reg.register("bands_docs", "minhash_bands", {"bands": hist},
                     source_path=f"{SF}/documents.parquet")
        stored = reg.read("bands_docs")["bands"]
        assert {tuple(r) for r in stored.collect()} == {
            tuple(r) for r in hist.collect()
        }


class TestProvenance:
    def test_source_version_flip_sets_stale_index_still_serves(self, spark, reg):
        wh = reg.wh
        wh.insert_data("documents", _docs(spark, 40))
        from empujar_spark.operators import text as X

        idx = X.bm25_build_index(wh.read("documents"))
        reg.register("bm25_live", "bm25", idx, source_table="documents")
        assert not reg.is_stale("bm25_live")
        built_v = reg.describe("bm25_live")["built_from"]["version"]

        # source advances: version flip -> stale, but serving unbroken
        wh.insert_data("documents", _docs(spark, 60))
        st = reg.staleness("bm25_live")
        assert st["stale"] and f"v{built_v}" in st["reason"]
        assert reg.read("bm25_live")["postings"].count() > 0

        # vacuum prunes old source versions; the flag and the index survive
        wh.vacuum()
        assert reg.is_stale("bm25_live")
        assert reg.read("bm25_live")["postings"].count() > 0

        # rebuild clears the flag
        reg.register("bm25_live", "bm25",
                     X.bm25_build_index(wh.read("documents")),
                     source_table="documents")
        assert not reg.is_stale("bm25_live")

    def test_external_path_fingerprint(self, spark, reg, tmp_path):
        src = str(tmp_path / "src")
        _docs(spark, 20).write.parquet(src)
        reg.register("ext", "custom",
                     {"t": spark.read.parquet(src)}, source_path=src)
        assert not reg.is_stale("ext")
        _docs(spark, 30).write.mode("overwrite").parquet(src)
        st = reg.staleness("ext")
        assert st["stale"] and st["reason"] == "source files changed"

    def test_missing_source_reports_not_raises(self, spark, reg, tmp_path):
        src = str(tmp_path / "gone")
        _docs(spark, 10).write.parquet(src)
        reg.register("doomed", "custom",
                     {"t": spark.read.parquet(src)}, source_path=src)
        import shutil

        shutil.rmtree(src)
        st = reg.staleness("doomed")
        assert st["stale"] and "missing" in st["reason"]


class TestLifecycle:
    def test_reregister_replaces_not_merges(self, spark, reg):
        a = spark.createDataFrame([(1, "a")], "doc_id long, v string")
        b = spark.createDataFrame([(2, "b")], "doc_id long, v string")
        reg.register("r", "custom", {"t": a},
                     source_path=f"{SF}/documents.parquet")
        reg.register("r", "custom", {"t": b},
                     source_path=f"{SF}/documents.parquet")
        rows = reg.read("r")["t"].collect()
        assert [(r.doc_id, r.v) for r in rows] == [(2, "b")]

    def test_drop_removes_tables_and_entry(self, spark, reg):
        reg.register(
            "gone", "custom",
            {"t": spark.createDataFrame([(1,)], "doc_id long")},
            source_path=f"{SF}/documents.parquet",
        )
        assert "gone" in reg.list_indexes()
        reg.drop("gone")
        assert "gone" not in reg.list_indexes()
        assert not reg.wh.table_exists("__idx_gone__g1__t")
        with pytest.raises(KeyError):
            reg.read("gone")

    def test_register_validates_inputs(self, spark, reg):
        t = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError, match="kind"):
            reg.register("x", "nope", {"t": t}, source_path=SF)
        with pytest.raises(ValueError, match="exactly one"):
            reg.register("x", "custom", {"t": t})
        with pytest.raises(ValueError, match="exactly one"):
            reg.register("x", "custom", {"t": t},
                         source_table="a", source_path="b")


class TestClusteredComponents:
    def test_bm25_term_filter_reaches_clustered_scan(self, spark, reg):
        """The serving contract at 100 TB: postings registered with
        cluster_by=['term'] + the literal In(term,...) filter in
        bm25_search_indexed means the parquet scan PRUNES — the pushed
        filter must appear in the physical plan, and results must stay
        bit-identical to the unclustered index."""
        from empujar_spark.operators import text as X

        docs = _docs(spark, 80)
        idx = X.bm25_build_index(docs)
        reg.register(
            "bm25_clustered", "bm25", idx,
            source_path=f"{SF}/documents.parquet",
            cluster_by={"postings": ["term"]}, cluster_files=8,
        )
        stored = reg.read("bm25_clustered")
        q = {"q1": ["the", "data", "quick"]}
        plan = stored["postings"].filter(
            F.col("term").isin(["the", "data", "quick"])
        )._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [In(term" in plan, plan[:800]
        want = {tuple(r) for r in
                X.bm25_search_indexed(idx, q, top_n=5).collect()}
        got = {tuple(r) for r in
               X.bm25_search_indexed(stored, q, top_n=5).collect()}
        assert got == want and len(got) > 0

    def test_search_falls_back_to_semi_join_on_huge_term_sets(self, spark, reg):
        from empujar_spark.operators import text as X

        docs = _docs(spark, 40)
        idx = X.bm25_build_index(docs)
        # >1024 terms: the literal-In plan would bloat; results must
        # still match the small-query path for the terms that exist
        big = {"q1": [f"zz{i}" for i in range(1100)] + ["the"]}
        small = {"q1": ["the"]}
        got = {tuple(r) for r in X.bm25_search_indexed(idx, big, top_n=5).collect()}
        want = {tuple(r) for r in X.bm25_search_indexed(idx, small, top_n=5).collect()}
        assert got == want and len(got) > 0


def test_ivf_stored_probe_prunes_partitions_dynamically(spark, reg):
    """The cid-hive-partitioned assignments scan must carry a dynamic
    partition-pruning expression: the probe's broadcast join on cid lets
    Spark skip every inverted-list directory outside the probed lists at
    runtime — the physical property the registry's partition_cols layout
    exists for. If a read-path change (e.g. _conform casts) ever breaks
    DPP injection, serving degrades to full-index scans silently; this
    pins the plan."""
    from empujar_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    idx = S.ivf_build_index(emb, n_centroids=8)
    reg.register("ivf_dpp", "ivf", idx,
                 source_path=f"{SF}/embeddings.parquet",
                 partition_cols={"assignments": ["cid"]})
    stored = reg.read("ivf_dpp")
    res = S.ivf_search_indexed(stored, emb.filter(F.col("vec_id") < 5),
                               k=3, nprobe=4)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), plan[:800]


class TestGenerationAtomicity:
    def test_failed_rebuild_leaves_old_generation_fully_live(self, spark, reg):
        """register() must be ATOMIC across components: a rebuild whose
        second component write dies mid-flight leaves the manifest — and
        therefore read() — pointing at the old generation for EVERY
        component (a mixed new-postings/old-dfreq index must be
        impossible)."""
        a1 = spark.createDataFrame([(1, "a1")], "doc_id long, v string")
        b1 = spark.createDataFrame([(1, "b1")], "doc_id long, v string")
        reg.register("atomic", "custom", {"a": a1, "b": b1},
                     source_path=f"{SF}/documents.parquet")

        a2 = spark.createDataFrame([(2, "a2")], "doc_id long, v string")
        boom = spark.createDataFrame([(2,)], "doc_id long").withColumn(
            "v", F.raise_error(F.lit("boom")).cast("string")
        )
        with pytest.raises(Exception):
            reg.register("atomic", "custom", {"a": a2, "b": boom},
                         source_path=f"{SF}/documents.parquet")

        got = {c: [(r.doc_id, r.v) for r in df.collect()]
               for c, df in reg.read("atomic").items()}
        assert got == {"a": [(1, "a1")], "b": [(1, "b1")]}
        assert reg.describe("atomic").get("generation", 1) == 1

        # a subsequent successful rebuild supersedes cleanly and prunes
        b2 = spark.createDataFrame([(2, "b2")], "doc_id long, v string")
        reg.register("atomic", "custom", {"a": a2, "b": b2},
                     source_path=f"{SF}/documents.parquet")
        got = {c: [(r.doc_id, r.v) for r in df.collect()]
               for c, df in reg.read("atomic").items()}
        assert got == {"a": [(2, "a2")], "b": [(2, "b2")]}

    def test_predecessor_generation_retained_one_flip(self, spark, reg):
        """The immediately superseded generation stays on disk one flip
        (in-flight reader grace, like keep_old_versions); the one before
        it is pruned."""
        for i in (1, 2, 3):
            reg.register(
                "gens", "custom",
                {"t": spark.createDataFrame([(i,)], "doc_id long")},
                source_path=f"{SF}/documents.parquet",
            )
        assert reg.describe("gens")["generation"] == 3
        assert reg.wh.table_exists("__idx_gens__g2__t")   # grace copy
        assert not reg.wh.table_exists("__idx_gens__g1__t")  # pruned
        assert [r.doc_id for r in reg.read("gens")["t"].collect()] == [3]


class TestEnsureFresh:
    def test_builds_only_when_missing_or_stale(self, spark, reg):
        wh = reg.wh
        wh.insert_data("documents", _docs(spark, 30))
        calls = []

        def build():
            calls.append(1)
            return {"t": wh.read("documents").select("doc_id")}

        # missing -> build
        assert reg.ensure_fresh("ef", "custom", build,
                                source_table="documents") is True
        # fresh -> no build
        assert reg.ensure_fresh("ef", "custom", build,
                                source_table="documents") is False
        assert len(calls) == 1
        # source moves -> stale -> rebuild, flag cleared
        wh.insert_data("documents", _docs(spark, 50))
        assert reg.ensure_fresh("ef", "custom", build,
                                source_table="documents") is True
        assert len(calls) == 2 and not reg.is_stale("ef")
        assert reg.read("ef")["t"].count() == 50


def test_incremental_maintenance_refresh_provenance(spark, reg):
    """The incremental-maintenance path: fold a batch INTO the current
    generation's component table (no rebuild), then refresh_provenance
    clears the stale flag — the bloom_union / band-history contract."""
    wh = reg.wh
    wh.insert_data("documents", _docs(spark, 30))
    reg.register(
        "inc", "minhash_bands",
        {"bands": wh.read("documents").select("doc_id")},
        source_table="documents",
    )
    # source advances -> stale
    wh.insert_data("documents", _docs(spark, 50))
    assert reg.is_stale("inc")

    # maintainer folds just the delta into the CURRENT generation table
    tbl = reg.component_table("inc", "bands")
    delta = wh.read("documents").select("doc_id").filter(
        F.col("doc_id") >= 30
    )
    wh.insert_data(tbl, delta, merge_key="doc_id")
    entry = reg.refresh_provenance("inc")
    assert not reg.is_stale("inc")
    assert entry["built_from"]["version"] == wh.table_versions("documents")[-1]
    assert reg.read("inc")["bands"].count() == 50

    with pytest.raises(KeyError, match="no component"):
        reg.component_table("inc", "nope")
