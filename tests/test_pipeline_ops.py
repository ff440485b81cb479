"""Property tests for the training-data pipeline operators added in round
2: stratified split, benchmark decontamination, rolling-hash (0-mod-p)
fingerprints, numeric histogram."""

import pytest
from pyspark.sql import functions as F

from empujar_spark.operators import profile as P
from empujar_spark.operators import text as X

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_stratified_split_stable_and_proportional(docs):
    out = P.stratified_split(docs, val_permille=100, test_permille=100)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == docs.count()
    # md5 buckets ⇒ roughly proportional (generous bounds at 500 docs)
    assert counts["train"] > 0.7 * total
    assert 0.03 * total < counts.get("val", 0) < 0.2 * total
    # assignment is a pure function of the id: identical across reruns
    # and unchanged when the corpus shrinks (docs keep their split)
    again = P.stratified_split(docs, val_permille=100, test_permille=100)
    assert (
        out.select("doc_id", "split").exceptAll(
            again.select("doc_id", "split")
        ).count() == 0
    )
    subset = P.stratified_split(
        docs.filter(F.col("doc_id") < 100), val_permille=100, test_permille=100
    )
    merged = subset.select("doc_id", F.col("split").alias("s2")).join(
        out.select("doc_id", "split"), "doc_id"
    )
    assert merged.filter(F.col("split") != F.col("s2")).count() == 0


def test_benchmark_contamination_flags_benchmark_itself(docs):
    """A doc IS its own 5-grams: every benchmark doc long enough to have
    a 5-gram must be flagged; output covers the whole corpus."""
    bench = docs.filter(F.col("doc_id") < 10)
    out = X.benchmark_contamination(docs, bench, k=5)
    assert out.count() == docs.count()
    long_bench_ids = {
        r["doc_id"]
        for r in bench.select(
            "doc_id", F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("nt")
        ).collect()
        if r["nt"] >= 5
    }
    flagged = {
        r["doc_id"]
        for r in out.filter(F.col("is_contaminated") == 1).collect()
    }
    assert long_bench_ids <= flagged


def test_modp_fingerprints_shared_passage_shares_fingerprints(spark):
    """The winnowing property: a passage shared between two docs selects
    the SAME fingerprints in both, regardless of position/surroundings."""
    passage = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, "PREFIX padding text " + passage),
            (2, passage + " totally different suffix content here"),
            (3, "unrelated words that share no eight gram at all xyz"),
        ],
        ["doc_id", "text"],
    )
    fps = X.modp_fingerprints(df, k=8, p=4)
    by_doc = {
        i: {r["fp"] for r in fps.filter(F.col("doc_id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2], "shared passage must share fingerprints"
    assert not (by_doc[1] & by_doc[2] & by_doc[3])


def test_modp_fingerprints_short_text_empty(spark):
    df = spark.createDataFrame([(1, "short")], ["doc_id", "text"])
    assert X.modp_fingerprints(df, k=8, p=2).count() == 0


def test_numeric_histogram_partitions_all_rows(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    h = P.numeric_histogram(orders, "o_totalprice", n_bins=10)
    rows = h.collect()
    assert sum(r["n"] for r in rows) == orders.filter(
        F.col("o_totalprice").isNotNull()
    ).count()
    assert {r["bin"] for r in rows} <= set(range(10))
    # bins tile [min, max] in order with equal width
    lo = min(r["lo"] for r in rows)
    hi = max(r["hi"] for r in rows)
    stats = orders.agg(
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    ).first()
    assert lo == pytest.approx(stats["lo"])
    assert hi == pytest.approx(stats["hi"])


def test_grouped_linear_trend_matches_numpy(spark):
    """The decimal-exact slope must agree with a float least-squares fit
    to ~1e-6, and be identical across repartitionings (float accumulation
    would not be)."""
    import numpy as np

    from empujar_spark.plans.corpus import load

    ev = load(spark, SF, "events")
    origin = 1704067200 // 3600
    x = F.floor(F.col("ts").cast("double") / 3600).cast("bigint") - F.lit(origin)
    out = {r["event_type"]: (r["slope"], r["intercept"]) for r in
           P.grouped_linear_trend(ev, ["event_type"], x, F.col("value")).collect()}
    rows = ev.select(
        "event_type", x.alias("x"), F.col("value").alias("y")
    ).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["x"], r["y"]))
    for et, pts in by_type.items():
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts], dtype=float)
        slope, intercept = np.polyfit(xs, ys, 1)
        assert out[et][0] == pytest.approx(slope, abs=1e-4), et
        assert out[et][1] == pytest.approx(intercept, abs=1e-2), et
    # partitioning invariance: exact decimal sums ⇒ bit-identical output
    re = P.grouped_linear_trend(
        ev.repartition(7), ["event_type"], x, F.col("value")
    )
    assert {r["event_type"]: (r["slope"], r["intercept"])
            for r in re.collect()} == out


def test_chunk_documents_windows_and_remainder(spark):
    # 10 tokens, chunk_size=4, stride=3 → candidate starts 1,4,7,10; the
    # window at 10 is a strict suffix of [t7..t10] (adds no new token)
    # and is dropped: [t1..t4], [t4..t7], [t7..t10]
    text = " ".join(f"t{i}" for i in range(1, 11))
    df = spark.createDataFrame(
        [(1, text), (2, "  "), (3, None)], "doc_id int, text string"
    )
    out = X.chunk_documents(df, chunk_size=4, stride=3).collect()
    rows = {r["chunk_id"]: r for r in out}
    assert [r["doc_id"] for r in out] == [1, 1, 1]  # blank/NULL emit none
    assert rows[0]["chunk_text"] == "t1 t2 t3 t4"
    assert rows[1]["chunk_text"] == "t4 t5 t6 t7"
    assert rows[2]["chunk_text"] == "t7 t8 t9 t10"

    # 11 tokens: the window at 10 adds t11 → kept as the short remainder
    text11 = " ".join(f"t{i}" for i in range(1, 12))
    out11 = X.chunk_documents(
        spark.createDataFrame([(1, text11)], "doc_id int, text string"),
        chunk_size=4, stride=3,
    ).collect()
    last = max(out11, key=lambda r: r["chunk_id"])
    assert last["chunk_text"] == "t10 t11"
    assert last["n_chunk_tokens"] == 2


def test_chunk_documents_overlap_covers_every_token(docs):
    # every source token position lands in >= 1 chunk: total chunk tokens
    # >= total doc tokens, and per-doc max chunk end == doc token count
    out = X.chunk_documents(docs, chunk_size=64, stride=48)
    per_doc = out.groupBy("doc_id").agg(
        F.max(F.col("chunk_id") * 48 + F.col("n_chunk_tokens")).alias("covered")
    )
    toks = docs.filter(F.coalesce(F.trim("text"), F.lit("")) != "").select(
        "doc_id", X.token_count(F.col("text")).cast("bigint").alias("n")
    )
    bad = per_doc.join(toks, "doc_id").filter(F.col("covered") != F.col("n"))
    assert bad.count() == 0


def test_vocab_prune_drops_rare_preserves_order(spark):
    df = spark.createDataFrame(
        [(1, "a b rare1 a b"), (2, "b a b rare2"), (3, "")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in X.vocab_prune(df, min_df=2).collect()}
    assert out[1]["pruned_text"] == "a b a b"          # order kept, rare1 gone
    assert (out[1]["n_tokens"], out[1]["n_kept"]) == (5, 4)
    assert out[2]["pruned_text"] == "b a b"
    assert (out[3]["n_tokens"], out[3]["n_kept"]) == (0, 0)
    assert out[3]["pruned_text"] == ""


def test_segment_dedup_first_occurrence_wins(spark):
    """A span repeated across docs survives only in the earliest
    (doc_id, seg_idx) position; clean_text is rebuilt in order from the
    survivors, and blank/NULL docs are dropped by contract."""
    from empujar_spark.operators.dedup import segment_dedup

    rows = [
        (1, "a b c d e f"),        # segs: "a b c", "d e f"
        (2, "a b c x y z"),        # "a b c" is a dup of doc 1 seg 0
        (3, "x y z"),              # dup of doc 2 seg 1
        (4, ""),                   # blank: dropped
        (5, None),                 # NULL: dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r.doc_id: r for r in segment_dedup(df, seg_tokens=3).collect()
    }
    assert set(got) == {1, 2, 3}
    assert (got[1].n_segs, got[1].n_kept) == (2, 2)
    assert got[1].clean_text == "a b c d e f"
    assert (got[2].n_segs, got[2].n_kept) == (2, 1)
    assert got[2].clean_text == "x y z"
    assert (got[3].n_segs, got[3].n_kept) == (1, 0)
    assert got[3].clean_text == ""


def test_segment_dedup_remainder_segment_distinct(spark):
    """A trailing short segment is its own span — it does not collide
    with a full-width span sharing the same prefix."""
    from empujar_spark.operators.dedup import segment_dedup

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c")], ["doc_id", "text"]
    )
    got = {
        r.doc_id: r for r in segment_dedup(df, seg_tokens=3).collect()
    }
    # doc 1: ["a b c", "d"]; doc 2: ["a b c"] (dup of doc 1 seg 0)
    assert (got[1].n_segs, got[1].n_kept) == (2, 2)
    assert (got[2].n_segs, got[2].n_kept) == (1, 0)


def test_winsorized_stats_clips_outliers(spark):
    """A planted outlier clamps to the p95 boundary and is counted; the
    winsorized mean sits far below the raw mean."""
    from empujar_spark.operators.profile import winsorized_stats

    vals = [float(i) for i in range(1, 100)] + [10_000.0]
    df = spark.createDataFrame(
        [("a", v) for v in vals], ["grp", "value"]
    )
    r = {row.grp: row for row in winsorized_stats(df, "grp", "value").collect()}
    assert r["a"].n == 100
    assert r["a"].n_clipped > 0
    raw_mean = sum(vals) / len(vals)
    assert r["a"].winsorized_mean < raw_mean / 2


def test_quality_median_filter_keeps_upper_half_per_source(spark):
    """Each source keeps its own >= median scorers: a doc that would fail
    a global cut survives inside a weak source, and vice versa."""
    from empujar_spark.operators.curation import quality_median_filter
    from pyspark.sql import functions as F

    rows = [
        (1, "clean", 0.9), (2, "clean", 0.8), (3, "clean", 0.7),
        (4, "noisy", 0.3), (5, "noisy", 0.2), (6, "noisy", 0.1),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "s"])
    kept = {
        r.doc_id
        for r in quality_median_filter(df, F.col("s")).collect()
    }
    # medians: clean 0.8, noisy 0.2 — survivors are per-source top halves
    assert kept == {1, 2, 4, 5}


def test_bigram_doc_score_exact_small_case(spark):
    """Hand-checked bigram frequencies: repeated pairs score high,
    one-token docs are absent."""
    from empujar_spark.operators.text import bigram_doc_score

    rows = [(1, "a b a b"), (2, "a b"), (3, "x")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in bigram_doc_score(df).collect()}
    assert set(got) == {1, 2}
    # corpus bigram freqs: "a b" ×3 (doc1 twice, doc2 once), "b a" ×1
    assert (got[1].n_bigrams, got[1].sum_freq) == (3, 7)  # 3+1+3
    assert (got[2].n_bigrams, got[2].sum_freq) == (1, 3)
    assert abs(got[1].mean_bigram_freq - 7 / 3) < 1e-12


def test_bm25_ranks_term_rich_docs_first(spark):
    """A document saturated with the query term outranks one mentioning
    it once; documents without the term never appear; rarer terms weigh
    more via idf."""
    from empujar_spark.operators.text import bm25_search

    rows = [
        (1, "cat cat cat cat"),
        (2, "cat dog bird fish"),
        (3, "dog bird fish mouse"),
        (4, "rare dog bird fish"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_search(df, {"q1": ["cat"], "q2": ["rare"]}, top_n=10)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, []).append((r.rnk, r.doc_id, r.score))
    q1 = sorted(got["q1"])
    assert [d for _, d, _ in q1] == [1, 2]      # doc 3,4 lack 'cat'
    assert q1[0][2] > q1[1][2]                   # saturation ranks 1 first
    assert [d for _, d, _ in sorted(got["q2"])] == [4]


def test_bm25_duplicate_doc_id_no_join_fanout(spark):
    """A repeated doc_id (re-ingested batch before dedup) must not fan
    out the tf⋈doclen join: doclen stays one row per doc_id with the
    COMBINED token count — same contract as the exploded-count spelling
    and the SQL oracle's GROUP BY doc_id."""
    from empujar_spark.operators.text import bm25_search

    dup = spark.createDataFrame(
        [(1, "cat cat"), (1, "cat filler filler filler"), (2, "cat dog")],
        ["doc_id", "text"],
    )
    out = bm25_search(dup, {"q": ["cat"]}, top_n=10).collect()
    rows = {(r.doc_id, r.score) for r in out if r.query_id == "q"}
    assert len(rows) == 2  # one fused row per doc_id, no duplicates

    # oracle semantics by hand: N = raw row count (3), doc 1's length and
    # tf are the COMBINED counts across its rows (dl=6, tf=3), avgdl is
    # over per-doc totals ((6+2)/2 = 4). A doclen without the groupBy
    # would emit doc 1 twice and double its summed score.
    import math

    idf = round(math.log(1 + (3 - 2 + 0.5) / (2 + 0.5)), 6)

    def score(tf, dl):
        sat = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 4.0))
        return round(round(idf * sat, 6), 4)

    assert rows == {(1, score(3, 6)), (2, score(1, 2))}


def test_histogram_constant_column_one_bin(spark):
    """lo == hi (constant column) must yield a one-bin histogram, not an
    ANSI DIVIDE_BY_ZERO (session default spark.sql.ansi.enabled=true)."""
    from empujar_spark.operators.profile import numeric_histogram

    df = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "x double")
    rows = numeric_histogram(df, "x", n_bins=10).collect()
    assert len(rows) == 1
    assert rows[0].bin == 0 and rows[0].n == 3


def test_linear_trend_singleton_group_null_slope(spark):
    """n==1 or constant-x groups have a zero denominator: slope comes
    back NULL, the job does not abort."""
    from pyspark.sql import functions as F

    from empujar_spark.operators.profile import grouped_linear_trend

    df = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 2, 1.0), ("b", 3, 2.0), ("c", 4, 5.0),
         ("c", 4, 9.0)],
        "g string, x int, y double",
    )
    out = {
        r.g: r.slope
        for r in grouped_linear_trend(
            df, ["g"], F.col("x"), F.col("y")
        ).collect()
    }
    assert out["a"] is None          # singleton
    assert out["c"] is None          # constant x
    assert abs(out["b"] - 1.0) < 1e-9  # well-defined slope intact


def test_bm25_indexed_equals_from_scratch(spark):
    """The prebuilt-index path returns bit-identical rows to the
    from-scratch path on real data (shared _bm25_score expression
    tree), and the index's postings/df cover the full vocabulary (the
    from-scratch tf table only ever holds query terms)."""
    from empujar_spark.operators import text as X

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = {"q1": ["table", "scan"], "q2": ["spark", "join", "join"]}
    direct = X.bm25_search(docs, queries, top_n=5).collect()
    idx = X.bm25_build_index(docs)
    indexed = X.bm25_search_indexed(idx, queries, top_n=5).collect()
    key = lambda r: (r.query_id, r.rnk)
    assert sorted(map(tuple, direct), key=lambda t: (t[0], t[3])) == sorted(
        map(tuple, indexed), key=lambda t: (t[0], t[3])
    )
    assert direct  # non-trivial result
    # index is full-vocabulary: strictly more terms than any query set
    assert idx["dfreq"].count() > 2


def test_bm25_index_survives_warehouse_roundtrip(spark, tmp_path):
    """The index IS persistable state: write the four tables through a
    Warehouse, read them back, query — identical rows to querying the
    freshly-built index (the serving deployment shape)."""
    from empujar_spark.catalog import Warehouse
    from empujar_spark.operators import text as X

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = {"q1": ["table", "scan"], "q2": ["spark", "join"]}
    idx = X.bm25_build_index(docs)
    fresh = X.bm25_search_indexed(idx, queries).collect()

    wh = Warehouse(spark, str(tmp_path), primary_key="doc_id")
    # each index table carries its own natural key — the warehouse
    # upsert-dedups on merge_key, so the default doc_id pk would
    # collapse the multi-row-per-doc postings table
    wh.insert_data("bm25_postings", idx["postings"], merge_key=["term", "doc_id"])
    wh.insert_data("bm25_dfreq", idx["dfreq"], merge_key="term")
    wh.insert_data("bm25_doclen", idx["doclen"], merge_key="doc_id")
    wh.insert_data("bm25_stats", idx["stats"], merge_key="__N")
    stored = {
        "postings": wh.read("bm25_postings"),
        "dfreq": wh.read("bm25_dfreq"),
        "doclen": wh.read("bm25_doclen"),
        "stats": wh.read("bm25_stats"),
    }
    replayed = X.bm25_search_indexed(stored, queries).collect()
    key = lambda t: (t[0], t[3])
    assert sorted(map(tuple, fresh), key=key) == sorted(map(tuple, replayed), key=key)


def _py_winnow(text: str, k: int, w: int) -> set[int]:
    """Reference winnowing (value-set form): md5-48bit hash of every
    normalized char k-gram, min per window of w, distinct."""
    import hashlib
    import re

    nt = re.sub(r"\s+", " ", text.strip().lower())
    if len(nt) < k:
        return set()
    hs = [
        int(hashlib.md5(nt[i:i + k].encode()).hexdigest()[:12], 16)
        for i in range(len(nt) - k + 1)
    ]
    return {min(hs[i - w + 1:i + 1]) for i in range(w - 1, len(hs))}


def test_winnowing_matches_python_reference(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "a b c d e f g h i j k l m n o p q r s t"),
        (3, "aaaaaaaaaaaaaaaaaaaa"),  # constant grams → one fingerprint
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {
        i: {r["fp"] for r in rows}
        for i, rows in (
            (i, X.winnowing_fingerprints(df, k=8, w=4)
                .filter(F.col("doc_id") == i).collect())
            for i, _ in texts
        )
    }
    for i, t in texts:
        assert got[i] == _py_winnow(t, 8, 4), f"doc {i}"


def test_winnowing_density_vs_modp_gap(spark):
    """The property winnowing buys over 0-mod-p: EVERY stretch of w+k-1
    chars yields a fingerprint, so a long doc can never go unsampled —
    whereas 0-mod-p's fixed-rate sample can leave a doc with zero
    fingerprints when no gram hash happens to be ≡0 (mod p)."""
    import hashlib
    import re

    # find a text whose 8-gram hashes are all ≢0 mod 64 (common at p=64)
    base = "zq xv jk wp fh tb"
    for salt in range(200):
        t = f"{base} {salt:04d} mn rs"
        nt = re.sub(r"\s+", " ", t.strip().lower())
        hs = [
            int(hashlib.md5(nt[i:i + 8].encode()).hexdigest()[:12], 16)
            for i in range(len(nt) - 7)
        ]
        if len(hs) >= 4 and all(h % 64 for h in hs):
            break
    else:
        pytest.skip("no modp-empty text found")
    df = spark.createDataFrame([(1, t)], ["doc_id", "text"])
    assert X.modp_fingerprints(df, k=8, p=64).count() == 0
    assert X.winnowing_fingerprints(df, k=8, w=4).count() >= 1


def test_winnowing_shared_passage_shares_fingerprints(spark):
    passage = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, "PREFIX padding text " + passage),
            (2, passage + " totally different suffix content here"),
            (3, "unrelated words that share no eight gram at all xyz"),
        ],
        ["doc_id", "text"],
    )
    fps = X.winnowing_fingerprints(df, k=8, w=4)
    by_doc = {
        i: {r["fp"] for r in fps.filter(F.col("doc_id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2], "shared passage must share fingerprints"
    assert not (by_doc[1] & by_doc[2] & by_doc[3])


def test_winnowing_no_full_window_empty(spark):
    # 9 normalized chars → 2 grams at k=8 < w=4 windows → nothing
    df = spark.createDataFrame(
        [(1, "short"), (2, "nine ch x")], ["doc_id", "text"]
    )
    assert X.winnowing_fingerprints(df, k=8, w=4).count() == 0


def test_population_stability_detects_shift_and_freezes_bins(spark):
    """A shifted current distribution yields a large total PSI; an
    identical one yields ~0. Binning is frozen on the reference: current
    values outside the reference range clamp into the edge bins instead
    of re-binning (which would hide the shift being measured)."""
    ref = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(1000)], ["id", "v"]
    )
    same = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(1000)], ["id", "v"]
    )
    shifted = spark.createDataFrame(
        [(i, 500.0 + float(i % 10)) for i in range(1000)], ["id", "v"]
    )
    psi_same = sum(
        r.psi_term for r in P.population_stability(ref, same, "v").collect()
    )
    rows_shift = P.population_stability(ref, shifted, "v").collect()
    psi_shift = sum(r.psi_term for r in rows_shift)
    assert abs(psi_same) < 1e-6
    assert psi_shift > 0.25, psi_shift
    # every out-of-range current value clamped into the TOP bin
    top = {r.bin: r.n_cur for r in rows_shift}
    assert top[9] == 1000 and sum(top.values()) == 1000


def test_population_stability_constant_reference_single_bin(spark):
    ref = spark.createDataFrame([(i, 5.0) for i in range(10)], ["id", "v"])
    cur = spark.createDataFrame([(i, 7.0) for i in range(10)], ["id", "v"])
    rows = P.population_stability(ref, cur, "v", n_bins=10).collect()
    by_bin = {r.bin: (r.n_ref, r.n_cur) for r in rows}
    assert by_bin[0] == (10, 10)
    assert all(by_bin[b] == (0, 0) for b in range(1, 10))


def test_population_stability_multi_equals_per_column(spark):
    """The single-scan multi-feature PSI must reproduce the per-column
    operator feature-for-feature, bit for bit — same frozen-reference
    bins, same Laplace smoothing (totals partitioned by feature), same
    1e-6 quantization."""
    ref = spark.createDataFrame(
        [(i, float(i % 100), float(i % 7)) for i in range(500)],
        ["id", "a", "b"],
    )
    cur = spark.createDataFrame(
        [(i, 50.0 + float(i % 10), float(i % 5)) for i in range(400)],
        ["id", "a", "b"],
    )
    multi = P.population_stability_multi(ref, cur, ["a", "b"]).collect()
    assert len(multi) == 20
    for c in ("a", "b"):
        single = {
            r.bin: (r.n_ref, r.n_cur, r.p_ref, r.q_cur, r.psi_term)
            for r in P.population_stability(ref, cur, c).collect()
        }
        got = {
            r.bin: (r.n_ref, r.n_cur, r.p_ref, r.q_cur, r.psi_term)
            for r in multi if r.feature == c
        }
        assert got == single, c


def test_population_stability_multi_null_and_constant_features(spark):
    """NULL values drop per feature independently; a constant reference
    feature degenerates to bin 0 without poisoning its neighbors."""
    ref = spark.createDataFrame(
        [(i, 5.0, float(i)) for i in range(10)], ["id", "c", "d"]
    )
    cur = spark.createDataFrame(
        [(0, 7.0, None), (1, 7.0, 4.0)],
        "id bigint, c double, d double",
    )
    rows = P.population_stability_multi(ref, cur, ["c", "d"]).collect()
    by = {(r.feature, r.bin): (r.n_ref, r.n_cur) for r in rows}
    assert by[("c", 0)] == (10, 2)
    assert all(by[("c", b)] == (0, 0) for b in range(1, 10))
    # d: NULL current row dropped, 4.0 lands in bin 4 of [0, 9]
    assert sum(n_cur for (f, _), (_, n_cur) in by.items() if f == "d") == 1
    assert by[("d", 4)][1] == 1


def test_population_stability_multi_drops_all_null_reference_feature(spark):
    """A feature whose REFERENCE column is entirely NULL has no binning
    range: it is dropped from the report (the sliced variant's
    documented rule and the SQL oracle's behavior — ADVICE r13), while
    its healthy neighbors report normally."""
    ref = spark.createDataFrame(
        [(i, None, float(i)) for i in range(10)],
        "id bigint, dead double, live double",
    )
    cur = spark.createDataFrame(
        [(0, 1.0, 3.0)], "id bigint, dead double, live double"
    )
    rows = P.population_stability_multi(ref, cur, ["dead", "live"]).collect()
    feats = {r.feature for r in rows}
    assert feats == {"live"}
    assert sum(1 for r in rows if r.feature == "live") == 10


def test_chi_square_drift_detects_category_shift(spark):
    """An identical current split yields tiny terms; a shifted one a
    large statistic; categories NEW in current (absent from reference)
    surface with n_ref=0 and a finite smoothed expectation."""
    ref = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(400)], ["id", "c"]
    )
    same = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(400)], ["id", "c"]
    )
    shifted = spark.createDataFrame(
        [(i, "a" if i % 10 else "z") for i in range(400)], ["id", "c"]
    )
    stat_same = sum(
        r.chi2_term for r in P.chi_square_drift(ref, same, "c").collect()
    )
    rows = P.chi_square_drift(ref, shifted, "c").collect()
    stat_shift = sum(r.chi2_term for r in rows)
    assert stat_same < 3.0  # smoothing keeps it near zero, not exactly 0
    assert stat_shift > 50.0, stat_shift
    z = {r.category: r for r in rows}["z"]
    assert z.n_ref == 0 and z.n_cur == 40 and z.e_cur > 0
    # a category that VANISHED from current still contributes
    assert {r.category for r in rows} == {"a", "b", "z"}


def test_token_js_divergence_bounds(spark):
    """JSD is ~0 for identical corpora and approaches ln 2 for disjoint
    vocabularies (Laplace smoothing keeps it strictly inside)."""
    import math

    a = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(50)], ["doc_id", "text"]
    )
    b = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(50)], ["doc_id", "text"]
    )
    c = spark.createDataFrame(
        [(i, "zeta eta theta") for i in range(50)], ["doc_id", "text"]
    )
    same = X.token_js_divergence(a, b).collect()[0]
    assert same.v_union == 3
    assert abs(same.jsd) < 1e-6
    disj = X.token_js_divergence(a, c).collect()[0]
    assert disj.v_union == 6
    assert 0.5 < disj.jsd < math.log(2.0) + 1e-9
    # one row out, totals carried
    assert same.n_ref_tokens == 150 and same.n_cur_tokens == 150


def test_importance_resample_weights_and_determinism(spark):
    """High-score rows must be sampled far more often than low-score
    ones; the draw is deterministic (rerun-identical) and NULL scores
    are excluded."""
    from empujar_spark.operators import curation as C

    rows = [(i, 5.0 if i < 60 else 0.0) for i in range(1000)]
    rows.append((9999, None))
    df = spark.createDataFrame(rows, "doc_id bigint, score double")
    got = C.importance_resample(df, k=50, score_col="score").collect()
    assert len(got) == 50
    ids = {r.doc_id for r in got}
    assert 9999 not in ids
    # exp(5)/exp(0) ≈ 148:1 odds — the 60 hot docs dominate the draw
    hot = sum(1 for i in ids if i < 60)
    assert hot >= 40, hot
    again = {r.doc_id for r in
             C.importance_resample(df, k=50, score_col="score").collect()}
    assert again == ids


def test_quantile_drift_sees_shift_psi_cannot_size(spark):
    """A +10 location shift must surface as delta ≈ 10 at every
    quantile; identical sides yield zero deltas."""
    ref = spark.createDataFrame(
        [(i, float(i % 100)) for i in range(1000)], ["id", "v"]
    )
    shifted = spark.createDataFrame(
        [(i, float(i % 100) + 10.0) for i in range(1000)], ["id", "v"]
    )
    rows = {r.q: r for r in P.quantile_drift(ref, shifted, "v").collect()}
    assert set(rows) == {0.25, 0.5, 0.75, 0.99}
    for r in rows.values():
        assert r.delta == pytest.approx(10.0, abs=1e-6), r
    same = P.quantile_drift(ref, ref, "v").collect()
    assert all(r.delta == 0.0 for r in same)


def test_drift_report_composes_all_legs(spark):
    """One call = one (check_name, feature, stat) row per monitored
    signal, each equal to the standalone operator's aggregate."""
    ref = spark.createDataFrame(
        [(i, float(i % 100), "a" if i % 2 else "b") for i in range(400)],
        ["id", "v", "c"],
    )
    cur = spark.createDataFrame(
        [(i, float(i % 100) + 10.0, "a" if i % 10 else "z")
         for i in range(400)],
        ["id", "v", "c"],
    )
    rows = {(r.check_name, r.feature): r.stat
            for r in P.drift_report(ref, cur, ["v"], ["c"]).collect()}
    assert set(rows) == {
        ("psi", "v"), ("chi2", "c"), ("quantile_max_shift", "v")
    }
    psi_direct = round(sum(
        r.psi_term for r in P.population_stability(ref, cur, "v").collect()
    ), 6)
    assert rows[("psi", "v")] == pytest.approx(psi_direct, abs=2e-6)
    chi_direct = round(sum(
        r.chi2_term for r in P.chi_square_drift(ref, cur, "c").collect()
    ), 6)
    assert rows[("chi2", "c")] == pytest.approx(chi_direct, abs=2e-6)
    # +10 shift → max quantile move ≈ 10
    assert rows[("quantile_max_shift", "v")] == pytest.approx(10.0, abs=1e-6)


def test_token_js_divergence_symmetric(spark):
    """JSD is symmetric by construction: swapping ref and cur must give
    the identical statistic (with totals transposed)."""
    a = spark.createDataFrame(
        [(i, "alpha beta gamma shared") for i in range(30)],
        ["doc_id", "text"],
    )
    b = spark.createDataFrame(
        [(i, "zeta eta shared shared") for i in range(40)],
        ["doc_id", "text"],
    )
    ab = X.token_js_divergence(a, b).collect()[0]
    ba = X.token_js_divergence(b, a).collect()[0]
    assert ab.jsd == ba.jsd
    assert (ab.n_ref_tokens, ab.n_cur_tokens) == (
        ba.n_cur_tokens, ba.n_ref_tokens
    )
    assert ab.v_union == ba.v_union


def test_importance_resample_k_laws(spark):
    """k ≥ n returns every scored row; k = 0 returns none; output rows
    carry the input columns plus resample_key."""
    from empujar_spark.operators import curation as C

    df = spark.createDataFrame(
        [(i, 1.0) for i in range(7)], "doc_id bigint, score double"
    )
    allr = C.importance_resample(df, k=100, score_col="score")
    assert allr.count() == 7
    assert allr.columns == ["doc_id", "score", "resample_key"]
    assert C.importance_resample(df, k=0, score_col="score").count() == 0


def test_chi_square_drift_multi_equals_per_column(spark):
    ref = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", str(i % 3)) for i in range(300)],
        ["id", "c1", "c2"],
    )
    cur = spark.createDataFrame(
        [(i, "a" if i % 10 else "z", str(i % 4)) for i in range(200)],
        ["id", "c1", "c2"],
    )
    multi = P.chi_square_drift_multi(ref, cur, ["c1", "c2"]).collect()
    for c in ("c1", "c2"):
        single = {
            r.category: (r.n_ref, r.n_cur, r.e_cur, r.chi2_term)
            for r in P.chi_square_drift(ref, cur, c).collect()
        }
        got = {
            r.category: (r.n_ref, r.n_cur, r.e_cur, r.chi2_term)
            for r in multi if r.feature == c
        }
        assert got == single, c


def test_quantile_drift_multi_equals_per_column(spark):
    ref = spark.createDataFrame(
        [(i, float(i % 100), float(i % 7)) for i in range(500)],
        ["id", "a", "b"],
    )
    cur = spark.createDataFrame(
        [(i, 50.0 + float(i % 10), 2.0 * (i % 7)) for i in range(400)],
        ["id", "a", "b"],
    )
    multi = P.quantile_drift_multi(ref, cur, ["a", "b"]).collect()
    assert len(multi) == 8
    for c in ("a", "b"):
        single = {
            r.q: (r.v_ref, r.v_cur, r.delta)
            for r in P.quantile_drift(ref, cur, c).collect()
        }
        got = {
            r.q: (r.v_ref, r.v_cur, r.delta)
            for r in multi if r.feature == c
        }
        assert got == single, c


def test_psi_sliced_equals_per_slice_single(spark):
    """Per-slice PSI must equal population_stability run on that slice's
    rows alone, and a shift hidden inside ONE slice must surface there
    while the clean slice stays near zero."""
    rows = [(i, "s1", float(i % 100)) for i in range(500)]
    rows += [(1000 + i, "s2", float(i % 50)) for i in range(400)]
    ref = spark.createDataFrame(rows, ["id", "seg", "v"])
    # s1 unchanged; s2 shifted far right
    rows_c = [(i, "s1", float(i % 100)) for i in range(500)]
    rows_c += [(1000 + i, "s2", 500.0 + float(i % 5)) for i in range(400)]
    cur = spark.createDataFrame(rows_c, ["id", "seg", "v"])
    sliced = P.population_stability_sliced(ref, cur, "v", "seg").collect()
    for s in ("s1", "s2"):
        single = {
            r.bin: (r.n_ref, r.n_cur, r.p_ref, r.q_cur, r.psi_term)
            for r in P.population_stability(
                ref.filter(F.col("seg") == s),
                cur.filter(F.col("seg") == s),
                "v",
            ).collect()
        }
        got = {
            r.bin: (r.n_ref, r.n_cur, r.p_ref, r.q_cur, r.psi_term)
            for r in sliced if r.slice == s
        }
        assert got == single, s
    psi = {}
    for r in sliced:
        psi[r.slice] = psi.get(r.slice, 0.0) + r.psi_term
    assert abs(psi["s1"]) < 1e-5
    assert psi["s2"] > 0.25, psi


def test_chi2_sliced_equals_per_slice_single_and_catches_hidden_flip(spark):
    """Per-slice chi-square must equal chi_square_drift on that slice's
    rows alone, and a category mix that INVERTS inside one slice while
    the aggregate stays balanced must alarm in that slice (and stay
    near zero in the clean one) — the failure mode sliced evaluation
    exists to close."""
    # ref: both slices 100 A / 100 B. cur: s1 flips to 160 A / 40 B,
    # s2 flips to 40 A / 160 B — the AGGREGATE stays 200/200 (clean).
    ref_rows = [(i, s, c) for i in range(100)
                for s in ("s1", "s2") for c in ("A", "B")]
    cur_rows = [(i, "s1", "A") for i in range(160)]
    cur_rows += [(i, "s1", "B") for i in range(40)]
    cur_rows += [(i, "s2", "A") for i in range(40)]
    cur_rows += [(i, "s2", "B") for i in range(160)]
    ref = spark.createDataFrame(ref_rows, ["id", "seg", "c"])
    cur = spark.createDataFrame(cur_rows, ["id", "seg", "c"])
    # the aggregate (unsliced) statistic reads clean
    agg = sum(r.chi2_term
              for r in P.chi_square_drift(ref, cur, "c").collect())
    assert agg < 0.1, agg
    sliced = P.chi_square_drift_sliced(ref, cur, "c", "seg").collect()
    for s in ("s1", "s2"):
        single = {
            r.category: (r.n_ref, r.n_cur, r.e_cur, r.chi2_term)
            for r in P.chi_square_drift(
                ref.filter(F.col("seg") == s),
                cur.filter(F.col("seg") == s),
                "c",
            ).collect()
        }
        got = {
            r.category: (r.n_ref, r.n_cur, r.e_cur, r.chi2_term)
            for r in sliced if r.slice == s
        }
        assert got == single, s
    stat = {}
    for r in sliced:
        stat[r.slice] = stat.get(r.slice, 0.0) + r.chi2_term
    # dof=1 critical value at 0.001 is 10.83 — both flipped slices alarm
    assert stat["s1"] > 10.83 and stat["s2"] > 10.83, stat


def test_chi2_sliced_keeps_one_sided_slices(spark):
    """Unlike sliced PSI (which needs a frozen numeric range), a slice
    present on only one side still surfaces with finite smoothed terms —
    a brand-new segment IS the drift signal."""
    ref = spark.createDataFrame([(1, "a", "X"), (2, "a", "Y")],
                                ["id", "seg", "c"])
    cur = spark.createDataFrame([(3, "a", "X"), (4, "NEW", "Z")],
                                ["id", "seg", "c"])
    out = P.chi_square_drift_sliced(ref, cur, "c", "seg").collect()
    assert {r.slice for r in out} == {"a", "NEW"}
    new = [r for r in out if r.slice == "NEW"]
    assert all(r.chi2_term is not None and r.e_cur > 0 for r in new)


def test_quantile_drift_sliced_equals_per_slice_and_catches_cancellation(spark):
    """Per-slice quantile deltas must equal quantile_drift on that
    slice's rows alone, and opposite-direction location moves in two
    slices — which CANCEL in the whole-table quantile deltas — must
    each surface in their slice."""
    ref_rows = [(i, "s1", float(i % 100)) for i in range(400)]
    ref_rows += [(i, "s2", float(i % 100)) for i in range(400)]
    # s1 shifts +50, s2 shifts −50: aggregate median barely moves
    cur_rows = [(i, "s1", 50.0 + float(i % 100)) for i in range(400)]
    cur_rows += [(i, "s2", -50.0 + float(i % 100)) for i in range(400)]
    ref = spark.createDataFrame(ref_rows, ["id", "seg", "v"])
    cur = spark.createDataFrame(cur_rows, ["id", "seg", "v"])
    agg = {r.q: r.delta for r in P.quantile_drift(ref, cur, "v").collect()}
    assert abs(agg[0.5]) < 1.0, agg  # the cancellation
    sliced = P.quantile_drift_sliced(ref, cur, "v", "seg").collect()
    for s in ("s1", "s2"):
        single = {
            r.q: (r.v_ref, r.v_cur, r.delta)
            for r in P.quantile_drift(
                ref.filter(F.col("seg") == s),
                cur.filter(F.col("seg") == s),
                "v",
            ).collect()
        }
        got = {r.q: (r.v_ref, r.v_cur, r.delta)
               for r in sliced if r.slice == s}
        assert got == single, s
    med = {r.slice: r.delta for r in sliced if r.q == 0.5}
    assert med["s1"] == 50.0 and med["s2"] == -50.0, med


def test_quantile_drift_sliced_drops_one_sided_slices(spark):
    ref = spark.createDataFrame([(1, "a", 1.0), (2, "a", 2.0)],
                                ["id", "seg", "v"])
    cur = spark.createDataFrame([(3, "a", 1.5), (4, "NEW", 9.0)],
                                ["id", "seg", "v"])
    out = P.quantile_drift_sliced(ref, cur, "v", "seg").collect()
    assert {r.slice for r in out} == {"a"}


def test_embedding_moment_drift_laws(spark):
    """The diagonal-Fréchet term must equal the hand-computed
    (μΔ)² + (σ_ref − σ_cur)² per dimension, be ≥ 0, vanish on identical
    distributions, and catch a pure mean shift the variance legs miss."""
    import statistics as st

    a = [[1.0, 10.0], [2.0, 20.0], [3.0, 30.0]]
    b = [[6.0, 10.0], [7.0, 20.0], [8.0, 30.0]]  # dim0 shifted +5
    ref = spark.createDataFrame([(i, v) for i, v in enumerate(a)],
                                "vec_id bigint, embedding array<double>")
    cur = spark.createDataFrame([(i, v) for i, v in enumerate(b)],
                                "vec_id bigint, embedding array<double>")
    out = {r.dim: r for r in P.embedding_moment_drift(ref, cur).collect()}
    for d in (0, 1):
        xs_r = [v[d] for v in a]
        xs_c = [v[d] for v in b]
        mu_d = round(st.fmean(xs_r), 6) - round(st.fmean(xs_c), 6)
        sd = (round(st.pvariance(xs_r), 6) ** 0.5
              - round(st.pvariance(xs_c), 6) ** 0.5)
        assert out[d].fid_term == pytest.approx(mu_d * mu_d + sd * sd,
                                                abs=2e-6), d
        assert out[d].fid_term >= 0
    assert out[0].fid_term == pytest.approx(25.0, abs=1e-5)  # the shift
    assert out[1].fid_term == pytest.approx(0.0, abs=1e-5)  # untouched
    # identical distributions → zero everywhere
    same = P.embedding_moment_drift(ref, ref).collect()
    assert all(r.fid_term == 0.0 for r in same)


def test_new_drift_ops_repartition_invariant(spark):
    """The r14 drift additions must be partitioning-invariant (the
    resample-invariance law r13 pinned for the family): integer counts
    (chi2_sliced), exact interpolated percentiles (quantile sliced) and
    1e-6-quantized moments (embedding moment drift) may not move when
    the same input arrives in 1 vs 13 shuffled partitions."""
    import random

    rng = random.Random(7)
    rows = [(i, str(rng.randint(0, 3)), rng.uniform(0, 100),
             [rng.uniform(-1, 1) for _ in range(4)])
            for i in range(600)]
    df = spark.createDataFrame(
        rows, "id bigint, seg string, v double, emb array<double>"
    )
    ref, cur = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")

    def run(r, c):
        a = sorted(map(tuple, P.chi_square_drift_sliced(
            r, c, "seg", "seg").collect()))
        b = sorted(map(tuple, P.quantile_drift_sliced(
            r, c, "v", "seg").collect()))
        d = sorted(map(tuple, P.embedding_moment_drift(
            r, c, "emb").collect()))
        return a, b, d

    one = run(ref.coalesce(1), cur.coalesce(1))
    many = run(ref.repartition(13), cur.repartition(13))
    assert one == many


def test_psi_sliced_drops_slices_absent_from_reference(spark):
    ref = spark.createDataFrame([(1, "a", 1.0), (2, "a", 2.0)],
                                ["id", "seg", "v"])
    cur = spark.createDataFrame([(3, "a", 1.5), (4, "NEW", 9.0)],
                                ["id", "seg", "v"])
    out = P.population_stability_sliced(ref, cur, "v", "seg").collect()
    assert {r.slice for r in out} == {"a"}


def test_drift_terms_nonnegative_and_jsd_bounds(spark):
    """Family laws: every PSI term (p−q)·ln(p/q) and chi² term are ≥ 0
    by construction, and JSD(a,a) = 0."""
    import random

    rng = random.Random(13)
    ref = spark.createDataFrame(
        [(i, rng.uniform(0, 50), str(rng.randint(0, 4)))
         for i in range(300)], ["id", "v", "c"]
    )
    cur = spark.createDataFrame(
        [(i, rng.uniform(10, 80), str(rng.randint(0, 6)))
         for i in range(250)], ["id", "v", "c"]
    )
    assert all(
        r.psi_term >= 0
        for r in P.population_stability(ref, cur, "v").collect()
    )
    assert all(
        r.chi2_term >= 0
        for r in P.chi_square_drift(ref, cur, "c").collect()
    )
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(20)],
        ["doc_id", "text"],
    )
    assert X.token_js_divergence(docs, docs).collect()[0].jsd == 0.0


def test_importance_resample_invariant_under_repartition(spark):
    """The Gumbel draw is a pure per-row expression + top-k: the selected
    set must not depend on partition layout (the df.sample failure mode
    the md5 noise exists to avoid)."""
    from empujar_spark.operators import curation as C

    df = spark.createDataFrame(
        [(i, float(i % 13)) for i in range(300)],
        "doc_id bigint, score double",
    )
    base = {r.doc_id for r in
            C.importance_resample(df, k=40, score_col="score").collect()}
    for n in (1, 7, 32):
        again = {
            r.doc_id
            for r in C.importance_resample(
                df.repartition(n), k=40, score_col="score"
            ).collect()
        }
        assert again == base, n


def test_psi_sliced_constant_slice_single_bin(spark):
    """A slice whose reference value is constant degenerates to bin 0
    (the numeric_histogram rule) without poisoning other slices."""
    ref = spark.createDataFrame(
        [(i, "flat", 5.0) for i in range(10)]
        + [(100 + i, "wide", float(i)) for i in range(10)],
        ["id", "seg", "v"],
    )
    cur = spark.createDataFrame(
        [(i, "flat", 7.0) for i in range(4)]
        + [(100 + i, "wide", 4.5) for i in range(3)],
        ["id", "seg", "v"],
    )
    rows = P.population_stability_sliced(ref, cur, "v", "seg").collect()
    by = {(r.slice, r.bin): (r.n_ref, r.n_cur) for r in rows}
    assert by[("flat", 0)] == (10, 4)
    assert all(by[("flat", b)] == (0, 0) for b in range(1, 10))
    # 4.5 / (9/10) floats to 5.000…001 → bin 5 (engine-exact either way;
    # the oracle computes the identical IEEE division)
    assert by[("wide", 5)][1] == 3


def test_token_js_divergence_one_empty_side(spark):
    """An empty current corpus still yields a finite figure (smoothing
    keeps q > 0 for every reference token)."""
    import math

    # NON-uniform reference: a uniform one is indistinguishable from
    # the empty side's uniform smoothing and JSD is legitimately 0
    a = spark.createDataFrame(
        [(i, "alpha alpha alpha beta gamma") for i in range(10)],
        ["doc_id", "text"],
    )
    b = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    r = X.token_js_divergence(a, b).collect()[0]
    assert r.n_cur_tokens == 0 and r.v_union == 3
    assert 0.0 < r.jsd < math.log(2.0) + 1e-9


def test_drift_report_sliced_composes_component_stats(spark):
    """Each (check_name, slice) stat in the sliced report must equal the
    corresponding component operator's per-slice reduction — the same
    composition contract drift_report pins for the aggregate legs."""
    import random

    rng = random.Random(29)
    rows = [(i, str(rng.randint(0, 2)), str(rng.randint(0, 4)),
             rng.uniform(0, 100)) for i in range(800)]
    df = spark.createDataFrame(rows, "id bigint, seg string, c string, v double")
    ref, cur = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")
    rep = {(r.check_name, r.feature, r.slice): r.stat
           for r in P.drift_report_sliced(
               ref, cur, ["v"], ["c"], "seg").collect()}
    psi = {}
    for r in P.population_stability_sliced(ref, cur, "v", "seg").collect():
        psi[r.slice] = round(psi.get(r.slice, 0.0) + r.psi_term, 9)
    chi = {}
    for r in P.chi_square_drift_sliced(ref, cur, "c", "seg").collect():
        chi[r.slice] = round(chi.get(r.slice, 0.0) + r.chi2_term, 9)
    qmx = {}
    for r in P.quantile_drift_sliced(ref, cur, "v", "seg").collect():
        qmx[r.slice] = max(qmx.get(r.slice, 0.0), abs(r.delta))
    for s, v in psi.items():
        assert rep[("psi", "v", s)] == pytest.approx(v, abs=2e-6), s
    for s, v in chi.items():
        assert rep[("chi2", "c", s)] == pytest.approx(v, abs=2e-6), s
    for s, v in qmx.items():
        assert rep[("quantile_max_shift", "v", s)] == pytest.approx(
            v, abs=2e-6), s


def test_quantile_drift_approx_path_agrees_with_exact(spark):
    """The unbounded-scale path (approx_percentile sketch, r14) must
    agree with the exact default within the rank-error bound on real
    data — the claim the exact operator's docstring makes concrete."""
    from empujar_spark.plans.corpus import load

    ev = load(spark, SF, "events")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    exact = {r.q: r for r in P.quantile_drift(ref, cur, "value").collect()}
    approx = {
        r.q: r
        for r in P.quantile_drift(
            ref, cur, "value", approx_accuracy=10_000
        ).collect()
    }
    assert set(exact) == set(approx)
    spread = (
        ev.agg(
            (F.max("value") - F.min("value")).cast("double")
        ).first()[0]
    )
    for q, e in exact.items():
        a = approx[q]
        # rank error 1e-4 of ~n rows -> value error well under 1% of
        # the spread on this distribution
        assert abs(a.v_ref - e.v_ref) <= 0.01 * spread, q
        assert abs(a.v_cur - e.v_cur) <= 0.01 * spread, q
        assert abs(a.delta - e.delta) <= 0.02 * spread, q


def test_psi_sliced_multi_equals_per_feature_sliced(spark):
    """Every (feature, slice) block of the multi×sliced pass must equal
    population_stability_sliced on that feature alone — closing the
    equality chain multi×sliced → sliced → single-column."""
    import random

    rng = random.Random(41)
    rows = [(i, str(rng.randint(0, 2)), rng.uniform(0, 100),
             rng.uniform(-5, 5)) for i in range(700)]
    df = spark.createDataFrame(rows, "id bigint, seg string, a double, b double")
    ref, cur = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")
    multi = P.population_stability_sliced_multi(ref, cur, ["a", "b"], "seg")
    got = {
        (r.feature, r.slice, r.bin):
            (r.n_ref, r.n_cur, r.p_ref, r.q_cur, r.psi_term)
        for r in multi.collect()
    }
    for c in ("a", "b"):
        single = {
            (c, r.slice, r.bin):
                (r.n_ref, r.n_cur, r.p_ref, r.q_cur, r.psi_term)
            for r in P.population_stability_sliced(
                ref, cur, c, "seg"
            ).collect()
        }
        sub = {k: v for k, v in got.items() if k[0] == c}
        assert sub == single, c


def test_chi2_and_quantile_sliced_multi_equal_per_feature(spark):
    """The multi×sliced chi-square and quantile forms must equal their
    single-feature sliced operators per feature — the same equality
    chain psi_sliced_multi pins for PSI."""
    import random

    rng = random.Random(53)
    rows = [(i, str(rng.randint(0, 2)), str(rng.randint(0, 4)),
             str(rng.randint(0, 1)), rng.uniform(0, 100),
             rng.uniform(-5, 5)) for i in range(700)]
    df = spark.createDataFrame(
        rows, "id bigint, seg string, c1 string, c2 string, a double, b double"
    )
    ref, cur = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")
    chi_m = {
        (r.feature, r.slice, r.category):
            (r.n_ref, r.n_cur, r.e_cur, r.chi2_term)
        for r in P.chi_square_drift_sliced_multi(
            ref, cur, ["c1", "c2"], "seg"
        ).collect()
    }
    for c in ("c1", "c2"):
        single = {
            (c, r.slice, r.category): (r.n_ref, r.n_cur, r.e_cur, r.chi2_term)
            for r in P.chi_square_drift_sliced(ref, cur, c, "seg").collect()
        }
        assert {k: v for k, v in chi_m.items() if k[0] == c} == single, c
    qd_m = {
        (r.feature, r.slice, r.q): (r.v_ref, r.v_cur, r.delta)
        for r in P.quantile_drift_sliced_multi(
            ref, cur, ["a", "b"], "seg"
        ).collect()
    }
    for c in ("a", "b"):
        single = {
            (c, r.slice, r.q): (r.v_ref, r.v_cur, r.delta)
            for r in P.quantile_drift_sliced(ref, cur, c, "seg").collect()
        }
        assert {k: v for k, v in qd_m.items() if k[0] == c} == single, c


def test_quantile_sliced_multi_drops_all_null_feature_slice_leg(spark):
    """A feature entirely NULL within one slice must drop just that
    (feature, slice) leg — matching the single-feature operator, whose
    per-feature prep drops the slice."""
    ref = spark.createDataFrame(
        [(1, "s1", None, 1.0), (2, "s1", None, 2.0),
         (3, "s2", 5.0, 3.0), (4, "s2", 6.0, 4.0)],
        "id bigint, seg string, a double, b double",
    )
    cur = spark.createDataFrame(
        [(5, "s1", 1.0, 1.5), (6, "s2", 5.5, 3.5)],
        "id bigint, seg string, a double, b double",
    )
    out = P.quantile_drift_sliced_multi(ref, cur, ["a", "b"], "seg")
    keys = {(r.feature, r.slice) for r in out.collect()}
    assert ("a", "s1") not in keys          # all-NULL ref leg dropped
    assert {("a", "s2"), ("b", "s1"), ("b", "s2")} <= keys


def test_cardinality_drift_exact_and_sketch(spark):
    """cardinality_drift (r15): exact form matches hand-computed distinct
    counts including a one-sided feature (ref-NULL column -> 0 on the
    ref side with a NULL ratio), and the hll_sketch_agg production form
    lands within the lgK=12 tolerance (~5% = 3x rsd) of exact on every
    feature, deterministically across reruns."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import profile as P

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    got = {
        r.feature: r
        for r in P.cardinality_drift(
            ref, cur, ["user_id", "event_type"]
        ).collect()
    }
    for feat in ["user_id", "event_type"]:
        assert got[feat].n_ref_distinct == (
            ref.select(feat).distinct().count()
        )
        assert got[feat].n_cur_distinct == (
            cur.select(feat).distinct().count()
        )
        assert got[feat].ratio == round(
            got[feat].n_cur_distinct / got[feat].n_ref_distinct, 6
        )
    # one-sided feature: NULL on the ref side everywhere -> 0 distinct,
    # NULL ratio — the new-feature onboarding case
    ref2 = ref.withColumn("newcol", F.lit(None).cast("string"))
    cur2 = cur.withColumn("newcol", F.concat(F.lit("v"), F.col("user_id")))
    one = {
        r.feature: r
        for r in P.cardinality_drift(ref2, cur2, ["newcol"]).collect()
    }
    assert one["newcol"].n_ref_distinct == 0
    assert one["newcol"].n_cur_distinct > 0
    assert one["newcol"].ratio is None

    sk = {
        r.feature: r
        for r in P.cardinality_drift(
            ref, cur, ["user_id", "event_type"], exact=False
        ).collect()
    }
    for feat, e in got.items():
        g = sk[feat]
        assert abs(g.n_ref_distinct - e.n_ref_distinct) <= max(
            2, 0.05 * e.n_ref_distinct
        )
        assert abs(g.n_cur_distinct - e.n_cur_distinct) <= max(
            2, 0.05 * e.n_cur_distinct
        )
    again = {
        r.feature: tuple(r)
        for r in P.cardinality_drift(
            ref, cur, ["user_id", "event_type"], exact=False
        ).collect()
    }
    assert {f: tuple(r) for f, r in sk.items()} == again


def test_cardinality_drift_sliced_matches_per_slice_aggregate(spark):
    """Per-(feature, slice) results are bit-identical to the aggregate
    cardinality_drift run on that slice's rows alone (the sliced-family
    pinning rule), and a compensating re-key — one shard collapses its
    key space while another mints the same number of new values — moves
    the sliced ratios while the aggregate distinct count stays put."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import profile as P

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ref = ev.filter(F.col("event_id") % 2 == 0).withColumn(
        "shard", F.col("user_id") % 2
    )
    cur = ev.filter(F.col("event_id") % 2 == 1).withColumn(
        "shard", F.col("user_id") % 2
    )
    sliced = {
        (r.feature, r.slice): (r.n_ref_distinct, r.n_cur_distinct, r.ratio)
        for r in P.cardinality_drift_sliced(
            ref, cur, ["value"], "shard"
        ).collect()
    }
    for s in ("0", "1"):
        agg = {
            r.feature: (r.n_ref_distinct, r.n_cur_distinct, r.ratio)
            for r in P.cardinality_drift(
                ref.filter(F.col("shard").cast("string") == s),
                cur.filter(F.col("shard").cast("string") == s),
                ["value"],
            ).collect()
        }
        assert sliced[("value", s)] == agg["value"]

    # compensating re-key: shard-0 current values collapse to even ints
    # (~halved distinct), shard 1 keeps its own — aggregate reads the
    # union and barely moves, the sliced check sees shard 0 halve
    cur2 = cur.withColumn(
        "value",
        F.when(
            F.col("shard") == 0,
            (F.floor(F.col("value") / 2) * 2).cast("double"),
        ).otherwise(F.col("value")),
    )
    before = {
        (r.feature, r.slice): r.ratio
        for r in P.cardinality_drift_sliced(
            ref, cur, ["value"], "shard"
        ).collect()
    }
    after = {
        (r.feature, r.slice): r.ratio
        for r in P.cardinality_drift_sliced(
            ref, cur2, ["value"], "shard"
        ).collect()
    }
    assert after[("value", "0")] < 0.7 * before[("value", "0")]
    assert after[("value", "1")] == before[("value", "1")]


def test_normalize_text_nfc_controls_and_whitespace(spark):
    """normalize_text (r16): decomposed sequences compose (NFC), Cc/Cf
    characters strip to spaces, whitespace collapses, pure-ASCII text
    passes through unchanged (the JVM fast path), NULL stays NULL, and
    the pass is idempotent (normalizing a normalized column is a
    no-op)."""
    rows = [
        (1, "Cafe\u0301 au lait"),          # decomposed -> composed
        (2, "ab\u0001\u200bc"),             # control + ZWSP -> spaced
        (3, "  plain   ascii\ttext "),       # collapse + trim only
        (4, "caf\u00e9"),                    # already composed: unchanged
        (5, None),
        (6, "\ufeffbom lead"),               # BOM is Cf -> stripped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.text_norm for r in X.normalize_text(df).collect()
    }
    assert got[1] == "Caf\u00e9 au lait" and len(got[1]) == 12
    assert got[2] == "ab c"  # both specials -> spaces, then collapse
    assert got[3] == "plain ascii text"
    assert got[4] == "caf\u00e9"
    assert got[5] is None
    assert got[6] == "bom lead"
    # idempotence: run the pass again over its own output
    again = {
        r.doc_id: r.norm2
        for r in X.normalize_text(
            X.normalize_text(df).select(
                "doc_id", F.col("text_norm").alias("text")
            ),
            out_col="norm2",
        ).collect()
    }
    assert again == got
