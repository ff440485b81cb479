"""Unit/property tests for corpus-curation operators (curation.py):
repetition signals, PII redaction, sequence packing, mixture sampling."""

import pytest
from pyspark.sql import functions as F

from empujar_spark.operators import curation as C

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_repetition_signals_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),  # 9 tok / 3 distinct; 7 grams, 3 distinct
            (2, "w1 w2 w3 w4 w5"),     # all unique
            (3, "a b"),                # shorter than k: no grams
            (4, ""),                   # empty
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in C.repetition_signals(df).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 9 and r1["n_grams"] == 7
    assert r1["type_token_ratio"] == pytest.approx(3 / 9, abs=1e-4)
    assert r1["frac_dup_ngrams"] == pytest.approx(1 - 3 / 7, abs=1e-4)
    # modal gram "a b c" occurs 3×, covers 3*3/9 of the tokens
    assert r1["top_gram_frac"] == pytest.approx(1.0)
    r2 = out[2]
    assert r2["frac_dup_ngrams"] == 0.0 and r2["type_token_ratio"] == 1.0
    assert out[3]["n_grams"] == 0 and out[3]["n_tokens"] == 2
    r4 = out[4]
    assert r4["n_tokens"] == 0 and r4["type_token_ratio"] == 0.0
    assert r4["frac_dup_ngrams"] == 0.0 and r4["top_gram_frac"] == 0.0


def test_repetition_signals_fraction_capped_and_null_text(spark):
    """Overlapping modal-gram occurrences must not push top_gram_frac
    past 1.0 ('a a a a', k=3: modal count 2 × 3 > 4 tokens), and NULL
    text behaves like blank text instead of NULLing every stat (which
    would silently vanish from both sides of any threshold filter)."""
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, None)], "doc_id int, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in C.repetition_signals(df).collect()}
    assert out[1]["top_gram_frac"] == pytest.approx(1.0)  # capped, not 1.5
    r2 = out[2]
    assert r2["n_tokens"] == 0 and r2["type_token_ratio"] == 0.0
    assert r2["frac_dup_ngrams"] == 0.0 and r2["top_gram_frac"] == 0.0


def test_redact_pii_counts_and_placeholders(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.co and c.d+x@e-f.org call +14155550042 ip 10.0.3.7"),
            (2, "nothing here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in C.redact_pii(df).collect()}
    r1 = out[1]
    assert (r1["n_emails"], r1["n_phones"], r1["n_ips"]) == (2, 1, 1)
    assert r1["clean_text"] == "mail <EMAIL> and <EMAIL> call <PHONE> ip <IP>"
    r2 = out[2]
    assert (r2["n_emails"], r2["n_phones"], r2["n_ips"]) == (0, 0, 0)
    assert r2["clean_text"] == "nothing here"


def test_pack_sequences_offsets_exact(docs):
    budget, shards = 256, 8
    rows = C.pack_sequences(docs, budget=budget, n_shards=shards).collect()
    by_shard: dict = {}
    for r in rows:
        assert 0 <= r["seq_offset"] < budget
        assert 0 <= r["shard"] < shards
        by_shard.setdefault(r["shard"], []).append(r)
    # replay each shard's packing serially and compare exactly
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rs:
            assert r["seq_id"] == cum // budget, (shard, r)
            assert r["seq_offset"] == cum % budget, (shard, r)
            cum += r["n_tokens"]
    # partitioning invariance
    again = C.pack_sequences(
        docs.repartition(7), budget=budget, n_shards=shards
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_mixture_sample_deterministic_and_weighted(docs):
    w = {"src0": 1.0, "src1": 0.5}
    kept = C.mixture_sample(docs, w).select("doc_id", "source").collect()
    srcs = {r["source"] for r in kept}
    assert srcs <= {"src0", "src1"}  # absent domains dropped entirely
    # weight 1.0 keeps every doc of that domain
    n_src0_all = docs.filter(F.col("source") == "src0").count()
    assert sum(1 for r in kept if r["source"] == "src0") == n_src0_all
    # deterministic across reruns
    again = C.mixture_sample(docs, w).select("doc_id", "source").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, kept))
    # weight 0.5 keeps a nontrivial strict subset
    n_src1_all = docs.filter(F.col("source") == "src1").count()
    n_src1_kept = sum(1 for r in kept if r["source"] == "src1")
    assert 0 < n_src1_kept < n_src1_all


def test_simhash_dup_pairs_matches_bruteforce(spark, docs):
    """Banded Hamming-LSH must find EXACTLY the brute-force pairs within
    the pigeonhole-guaranteed radius (hamming <= bands-1)."""
    from empujar_spark.operators import dedup as D

    sub = docs.limit(200)
    max_h = 3  # bands=4 ⇒ exact recall up to 3
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_dup_pairs(sub, bands=4, max_hamming=max_h).collect()
    }
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash(sub).collect()}
    ids = sorted(sigs)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin(sigs[a] ^ sigs[b]).count("1")
            if h <= max_h:
                expected[(a, b)] = h
    assert got == expected


def test_grouped_topk_partition_invariant_with_ties(spark):
    """Bounded top-k must equal the window answer under adversarial
    partitioning, including exact value ties broken by id."""
    from empujar_spark.operators.topk import grouped_topk

    rows = [(g, i, float(v)) for g in ("a", "b")
            for i, v in enumerate([5, 5, 5, 3, 3, 9, 1, 9, 9, 2])]
    df = spark.createDataFrame(rows, ["g", "id", "v"])
    expected = {
        ("a", 5, 9.0, 1), ("a", 7, 9.0, 2), ("a", 8, 9.0, 3),
        ("b", 5, 9.0, 1), ("b", 7, 9.0, 2), ("b", 8, 9.0, 3),
    }
    for parts in (1, 3, 20):
        got = {tuple(r) for r in
               grouped_topk(df.repartition(parts), ["g"], "v", "id", k=3).collect()}
        assert got == expected, parts
    # ascending variant
    asc = {tuple(r) for r in
           grouped_topk(df, ["g"], "v", "id", k=2, ascending=True).collect()}
    assert asc == {("a", 6, 1.0, 1), ("a", 9, 2.0, 2),
                   ("b", 6, 1.0, 1), ("b", 9, 2.0, 2)}


def test_grouped_topk_nan_and_null_id_hazards(spark):
    """NaN order values and NULL ids must not break head-k losslessness.

    Spark's total order puts NaN GREATEST (desc ⇒ NaN ranks first) while
    pandas treats NaN as missing — a batch head-k that trusted pandas
    would cut the NaN row. grouped_topk routes such rows around the
    prefilter; the result must equal the plain-window answer under any
    partitioning."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from empujar_spark.operators.topk import grouped_topk

    nan = float("nan")
    rows = [
        ("a", 1, 5.0), ("a", 2, 7.0), ("a", 3, nan), ("a", 4, 6.0),
        ("a", None, 7.0),          # null id tied on value with id=2
        ("b", 6, 1.0), ("b", 7, None), ("b", 8, 2.0), ("b", 9, 3.0),
    ]
    schema = T.StructType([
        T.StructField("g", T.StringType()),
        T.StructField("id", T.IntegerType()),
        T.StructField("v", T.DoubleType()),
    ])
    df = spark.createDataFrame(rows, schema)

    def reference(sdf, ascending, k):
        order = (F.col("v").asc_nulls_first() if ascending
                 else F.col("v").desc_nulls_last())
        w = Window.partitionBy("g").orderBy(order, F.col("id").asc())
        return (sdf.withColumn("rnk", F.row_number().over(w))
                .filter(F.col("rnk") <= k).select("g", "id", "v", "rnk"))

    def key(r):
        v = r["v"]
        v = "nan" if v is not None and v != v else v
        return (r["g"], r["id"], v, r["rnk"])

    for ascending in (False, True):
        expected = {key(r) for r in reference(df, ascending, 2).collect()}
        for parts in (1, 4):
            got = {key(r) for r in
                   grouped_topk(df.repartition(parts), ["g"], "v", "id",
                                k=2, ascending=ascending).collect()}
            assert got == expected, (ascending, parts)
    # sanity: descending ranks the NaN row #1 in group a (Spark semantics)
    top = {(r["g"], r["rnk"]): r["id"]
           for r in grouped_topk(df, ["g"], "v", "id", k=1).collect()}
    assert top[("a", 1)] == 3


def test_temperature_mixture_flattens_skew(spark):
    """α=0.3 temperature rebalancing: a 10× bigger source must get a
    proportionally LOWER keep rate (flattening), tiny sources clamp at
    1.0 (kept whole), and rates match the closed form."""
    from empujar_spark.operators.curation import temperature_mixture

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id int, source string")
    out = temperature_mixture(df, alpha=0.3, target_frac=0.5).toPandas()

    n_big, n_small, alpha, tf = 100.0, 10.0, 0.3, 0.5
    W = n_big**alpha + n_small**alpha
    N = n_big + n_small
    p_big = min(1.0, tf * N / W * n_big**alpha / n_big)
    p_small = min(1.0, tf * N / W * n_small**alpha / n_small)
    assert p_small == 1.0 and p_big < 0.5

    got = {s: g for s, g in out.groupby("source")}
    # tiny source kept whole, at rate exactly 1.0
    assert len(got["small"]) == 10
    assert (got["small"]["keep_rate"] == 1.0).all()
    # big source downsampled near its closed-form rate
    assert abs(got["big"]["keep_rate"].iloc[0] - round(p_big, 6)) < 1e-6
    frac_big = len(got["big"]) / n_big
    assert 0.15 < frac_big < 0.6, frac_big
    # deterministic across reruns
    again = temperature_mixture(df, alpha=0.3, target_frac=0.5).toPandas()
    assert sorted(again["doc_id"]) == sorted(out["doc_id"])


def test_grouped_topk_float_group_null_vs_nan_distinct(spark):
    """Spark treats NULL and NaN group keys as DISTINCT groups; the
    pandas prefilter maps both to NaN and would merge them — those rows
    must route around the prefilter so each group keeps its own top-k."""
    from empujar_spark.operators.topk import grouped_topk

    df = spark.createDataFrame(
        [(None, 1, 10.0), (float("nan"), 2, 5.0), (1.0, 3, 7.0)],
        "g double, id int, v double",
    )
    out = grouped_topk(df, ["g"], "v", "id", k=1)
    rows = out.collect()
    assert len(rows) == 3  # one winner per distinct group: NULL, NaN, 1.0
    by_id = {r.id: r.rnk for r in rows}
    assert by_id == {1: 1, 2: 1, 3: 1}


def test_shard_assignments_deterministic_and_balanced(spark):
    from pyspark.sql import functions as F

    from empujar_spark.operators.curation import shard_assignments

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = shard_assignments(df, n_shards=8, seed="s1")
    b = shard_assignments(df.repartition(13), n_shards=8, seed="s1")
    # partitioning-independent: identical layout either way
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    rows = a.collect()
    # every row placed exactly once; positions are 1..|shard| per shard
    assert len(rows) == 500
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed re-deals the order
    c = shard_assignments(df, n_shards=8, seed="s2")
    assert sorted(map(tuple, a.collect())) != sorted(map(tuple, c.collect()))


def test_dsir_importance_separates_target_vocabulary(spark):
    """Docs written in the target subset's vocabulary must outscore docs
    in the off-target vocabulary, and the score is a pure function of
    the data (rerun-identical)."""
    tgt_words = "alpha beta gamma delta epsilon"
    raw_words = "zeta eta theta iota kappa"
    rows = [(i, tgt_words, True) for i in range(10)]
    rows += [(i + 10, raw_words, False) for i in range(10)]
    # two held-out docs, one per vocabulary, NOT in the target subset
    rows += [(100, tgt_words, False), (101, raw_words, False)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_tgt"])
    out = C.dsir_importance(df, F.col("is_tgt"), id_col="doc_id")
    scores = {r["doc_id"]: r["lr_score"] for r in out.collect()}
    assert scores[100] > scores[101], scores
    assert scores[100] > 0 > scores[101]
    ntok = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    assert ntok[100] == 5
    again = {
        r["doc_id"]: r["lr_score"]
        for r in C.dsir_importance(df, F.col("is_tgt")).collect()
    }
    assert again == scores


def test_dsir_importance_blank_and_null_text_drop_out(spark):
    df = spark.createDataFrame(
        [(1, "some words here", True), (2, "", False), (3, None, False)],
        ["doc_id", "text", "is_tgt"],
    )
    out = C.dsir_importance(df, F.col("is_tgt"))
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1}


def test_dsir_bigram_features_see_transitions(spark):
    """n_max=2 adds hashed bigram features (the paper's setup): a doc
    with the target's exact word PAIRS must outscore a shuffled doc with
    the identical unigram bag — invisible to the unigram score, which
    ties them. Feature counts: n tokens + (n-1) bigrams."""
    tgt = "alpha beta gamma delta"
    shuffled = "delta beta alpha gamma"  # same bag, different pairs
    rows = [(i, tgt, True) for i in range(10)]
    rows += [(100, tgt, False), (101, shuffled, False)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_tgt"])
    uni = {
        r["doc_id"]: r["lr_score"]
        for r in C.dsir_importance(df, F.col("is_tgt"), n_max=1).collect()
    }
    assert uni[100] == uni[101]
    out = C.dsir_importance(df, F.col("is_tgt"), n_max=2)
    bi = {r["doc_id"]: (r["n_tokens"], r["lr_score"]) for r in out.collect()}
    assert bi[100][0] == 4 + 3
    assert bi[100][1] > bi[101][1], bi


def test_dsir_bigram_short_docs_survive(spark):
    """0/1-token docs must not trip slice's length guard: a 1-token doc
    scores on its single unigram; blank/null drop out as at n_max=1."""
    df = spark.createDataFrame(
        [(1, "word", True), (2, "", False), (3, None, False),
         (4, "two tokens", True)],
        ["doc_id", "text", "is_tgt"],
    )
    out = C.dsir_importance(df, F.col("is_tgt"), n_max=2)
    got = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
    assert got == {1: 1, 4: 3}


def test_dsir_n_max_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        C.dsir_importance(None, None, n_max=3)


def test_importance_resample_grouped_quota_and_weights(spark):
    """Each group fills its own quota (short groups keep everything),
    high-score rows dominate within a group, and the per-group draw
    equals the global operator restricted to that group's rows."""
    rows = [(i, "a", 5.0 if i < 30 else 0.0) for i in range(500)]
    rows += [(1000 + i, "b", 1.0) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, src string, score double")
    got = C.importance_resample_grouped(
        df, k=25, group_col="src", score_col="score"
    ).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.src, set()).add(r.doc_id)
    assert len(by_src["a"]) == 25
    assert by_src["b"] == {1000, 1001, 1002}  # short group keeps all
    hot = sum(1 for i in by_src["a"] if i < 30)
    assert hot >= 20, hot
    # stratum draw ≡ global draw over that stratum (same key, same k)
    only_a = C.importance_resample(
        df.filter(F.col("src") == "a"), k=25,
        score_col="score",
    ).collect()
    assert {r.doc_id for r in only_a} == by_src["a"]


def test_ngram_contamination_planted_hits(spark):
    """Planted contamination must be caught exactly: a training doc
    embedding a benchmark 8-gram flags with the right positional hit
    count, a clean doc reports its gram count with zero hits, a doc
    shorter than the window reports (0, 0, 0.0, false), and case/
    whitespace differences do not defeat the normalized match."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark's first 8-gram verbatim, mid-doc,
            # with different CASE and extra whitespace
            (1, "intro words THE  Quick Brown fox jumps over the lazy trailing tail"),
            # clean: same vocabulary, different order
            (2, "dog lazy the over jumps fox brown quick the tonight again padding"),
            # too short for an 8-gram window
            (3, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.ngram_contamination(docs, bench, n=8).collect()}
    d1 = out[1]  # 12 tokens -> 5 gram positions; exactly one matches
    assert (d1.n_grams, d1.n_hits, d1.contaminated) == (5, 1, True)
    assert d1.hit_rate == pytest.approx(0.2, abs=1e-6)
    d2 = out[2]  # 12 tokens -> 5 positions, no benchmark 8-gram
    assert (d2.n_grams, d2.n_hits, d2.contaminated) == (5, 0, False)
    assert out[3].n_grams == 0 and out[3].contaminated is False


def test_ngram_contamination_counts_positions_not_distinct_grams(spark):
    """A doc repeating one leaked benchmark gram at two positions counts
    BOTH (hit_rate weights by contaminated span, the excision-size
    signal), while the broadcast eval set is distinct so eval-side
    duplicates cannot double-count."""
    gram = "a b c d e f g h"
    bench = spark.createDataFrame(
        [(9, gram), (10, gram)], ["doc_id", "text"]  # duplicated eval doc
    )
    docs = spark.createDataFrame(
        [(1, f"{gram} x {gram}")], ["doc_id", "text"]
    )
    r = C.ngram_contamination(docs, bench, n=8).collect()[0]
    # 17 tokens -> 10 positions; the leaked gram appears at positions 1 and 10
    assert (r.n_grams, r.n_hits, r.contaminated) == (10, 2, True)


def test_ngram_contamination_self_scan_is_total(spark):
    """Scanning a corpus against ITSELF as the eval set must flag every
    document long enough to carry a gram with hit_rate exactly 1.0 —
    the identity law that pins the gram normalization is consistent
    between the two sides."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(50)
    )
    out = C.ngram_contamination(docs, docs, n=8).collect()
    assert out
    for r in out:
        if r.n_grams > 0:
            assert (r.n_hits, r.hit_rate, r.contaminated) == (
                r.n_grams, 1.0, True
            ), r
        else:
            assert not r.contaminated


def test_blocklist_filter_token_exact_semantics(spark):
    """blocklist_filter (r16): token-EXACT matching (substrings never
    trip the list), occurrence counting, case/whitespace normalization,
    blank and NULL text unflagged."""
    from empujar_spark.operators.curation import blocklist_filter

    rows = [
        (1, "a perfectly classy sentence"),   # 'ass' inside words: clean
        (2, "this is Bad and bad again"),     # 2 hits, case-folded
        (3, "  bad  "),                       # ragged whitespace
        (4, ""),
        (5, None),
        (6, "nothing wrong here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_blocked, r.blocked)
        for r in blocklist_filter(df, ["bad", "ass"]).collect()
    }
    assert got[1] == (0, False)
    assert got[2] == (2, True)
    assert got[3] == (1, True)
    assert got[4] == (0, False)
    assert got[5] == (0, False)
    assert got[6] == (0, False)


def test_perplexity_buckets_partition_and_order(spark):
    """perplexity_buckets (r16): the three buckets partition the corpus,
    and bucket membership is monotone in the score (every head score >=
    every middle score >= every tail score)."""
    from pyspark.sql import functions as F

    from empujar_spark.operators.curation import perplexity_buckets

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    out = perplexity_buckets(docs).select(
        "doc_id", "mean_token_freq", "bucket"
    ).collect()
    assert len(out) == docs.count()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.mean_token_freq)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert min(by_bucket["head"]) >= max(by_bucket["middle"])
    assert min(by_bucket["middle"]) >= max(by_bucket["tail"])


def test_token_budget_sample_semantics_and_partition_independence(spark):
    """token_budget_sample (r16): admitted docs are exactly the hash-
    order prefix whose predecessor total leaves room (last admitted doc
    may overshoot); the subset is identical under any input
    partitioning; and growing the budget only EXTENDS the prefix."""
    from pyspark.sql import functions as F

    from empujar_spark.operators.curation import token_budget_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = token_budget_sample(docs, budget=3000).collect()
    assert out, "nonempty whenever budget > 0"
    rows = sorted(out, key=lambda r: r.cum_tokens)
    # running-total consistency and the admission rule
    prev = 0
    for r in rows:
        assert r.cum_tokens == prev + r.n_tokens
        assert prev < 3000  # predecessor total left room
        prev = r.cum_tokens
    # everything except possibly the last stays under budget
    assert all(r.cum_tokens < 3000 for r in rows[:-1])

    base = sorted((r.doc_id, r.cum_tokens) for r in out)
    for layout in (docs.repartition(3, "lang"), docs.orderBy("text"),
                   docs.coalesce(1)):
        again = sorted(
            (r.doc_id, r.cum_tokens)
            for r in token_budget_sample(layout, budget=3000).collect()
        )
        assert again == base, "subset depends on partition layout"

    bigger = {r.doc_id for r in token_budget_sample(docs, budget=6000).collect()}
    assert {d for d, _ in base} < bigger, "budget growth must extend the prefix"


def test_token_budget_sample_null_text_and_bucket_invariance(spark):
    """r16 review fixes: NULL text counts 0 tokens (neither poisons its
    bucket total nor vanishes from the output), and the admitted subset
    is INVARIANT to n_buckets — the bucket decomposition is plumbing,
    not semantics (this also pins the hex-prefix width formula: an
    over- or under-wide prefix would still decompose correctly, but a
    mismatch between offsets and bucket keys would break the prefix
    sum instantly)."""
    from empujar_spark.operators.curation import token_budget_sample

    rows = [(i, f"tok {'w ' * (i % 7)}") for i in range(40)]
    rows += [(100, None), (101, ""), (102, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.n_tokens for r in
           token_budget_sample(df, budget=10_000).collect()}
    # budget exceeds the corpus: every doc admitted, zero-token docs too
    assert set(out) == {i for i, _ in rows}
    assert out[100] == 0 and out[101] == 0 and out[102] == 0

    base = sorted(
        (r.doc_id, r.cum_tokens)
        for r in token_budget_sample(df, budget=60).collect()
    )
    assert base
    for nb in (1, 16, 64, 4096):
        again = sorted(
            (r.doc_id, r.cum_tokens)
            for r in token_budget_sample(df, budget=60, n_buckets=nb).collect()
        )
        assert again == base, f"subset depends on n_buckets={nb}"
