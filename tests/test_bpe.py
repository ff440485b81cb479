"""BPE merge induction (operators/text.py bpe_train): golden against a
pure-Python reference implementation of Sennrich-style BPE, plus the
greedy-fold merge semantics and scale-shape plan properties."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from empujar_spark.operators import text as X


def _ref_bpe(texts, n_merges):
    """Reference BPE: char symbols, merge most-frequent adjacent pair,
    ties (-freq, left, right); greedy left-to-right application."""
    wf = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            if w:
                wf[w] += 1
    state = {tuple(w): f for w, f in wf.items()}

    def merge_word(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return tuple(out)

    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for syms, f in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, a, b, a + b, f))
        nxt = {}
        for syms, fr in state.items():
            nxt[merge_word(syms, a, b)] = nxt.get(merge_word(syms, a, b), 0) + fr
        state = nxt
    return merges


TEXTS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "wider wider new new",
]


@pytest.mark.parametrize("local_max_words", [500_000, 0])
def test_bpe_train_matches_reference(spark, local_max_words):
    """Both the driver-local fast path (default) and the distributed
    loop (local_max_words=0) match the pure-Python reference."""
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    got = [
        (r.rank, r.left, r.right, r.merged, r.pair_freq)
        for r in X.bpe_train(df, n_merges=8, local_max_words=local_max_words)
        .orderBy("rank")
        .collect()
    ]
    assert got == _ref_bpe(TEXTS, 8)


def test_bpe_local_equals_distributed(spark):
    """The local fast path and the distributed loop produce identical
    merge tables on real data — same argmax tie-break, same greedy
    overlap semantics — and a 1-word threshold falls back to the
    distributed loop rather than truncating the collected table."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").limit(80)
    local = X.bpe_train(docs, n_merges=6).collect()
    dist = X.bpe_train(docs, n_merges=6, local_max_words=0).collect()
    assert [tuple(r) for r in local] == [tuple(r) for r in dist]
    fallback = X.bpe_train(docs, n_merges=6, local_max_words=1).collect()
    assert [tuple(r) for r in fallback] == [tuple(r) for r in dist]


def test_bpe_greedy_overlap_semantics(spark):
    """Merging (a,a) over 'aaa' yields [aa, a] — greedy left-to-right,
    the reference BPE behavior (not [a, aa], not [aa, aa])."""
    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    out = df.select(X._merge_pair_expr("syms", "a", "a").alias("m")).collect()
    assert out[0].m == ["aa", "a"]


def test_bpe_train_on_documents_deterministic(spark):
    """Same merges regardless of input partitioning (argmax tie-break is
    total, fold is per-row) — and it drains gracefully: n_merges larger
    than the pair table returns the exhausted prefix."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").limit(60)
    # local_max_words=0 pins the DISTRIBUTED loop — the path whose
    # partition-invariance this test exists to cover.
    a = X.bpe_train(docs.coalesce(1), n_merges=5, local_max_words=0).collect()
    b = X.bpe_train(docs.repartition(7), n_merges=5, local_max_words=0).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 5

    tiny = spark.createDataFrame([("ab ab",)], ["text"])
    for lmw in (500_000, 0):
        drained = X.bpe_train(tiny, n_merges=50, local_max_words=lmw).collect()
        # 'ab' has one pair; after merging (a,b) no pairs remain
        assert [tuple(r)[:4] for r in drained] == [(0, "a", "b", "ab")]


def test_pair_counts_shuffle_carries_pairs_not_corpus(spark):
    """Plan shape: pair_counts is explode → partial agg → exchange →
    final agg (map-side combine before the shuffle), no join."""
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    pc = X.pair_counts(X.word_freqs(df))
    plan = pc._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # word shuffle + pair shuffle
    assert "Join" not in plan
    assert "HashAggregate" in plan


def test_bpe_encode_matches_reference(spark):
    """Encoding with trained merges equals the reference encoder: per
    word, apply merges greedily in rank order; words never merge across
    whitespace."""
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    merges = [
        (r.left, r.right)
        for r in X.bpe_train(df, n_merges=6).orderBy("rank").collect()
    ]

    def ref_encode(text):
        out = []
        for w in text.strip().lower().split():
            syms = list(w)
            for a, b in merges:
                nxt, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        nxt.append(a + b)
                        i += 2
                    else:
                        nxt.append(syms[i])
                        i += 1
                syms = nxt
            out.extend(syms)
        return out

    got = {
        r.text: r.bpe_tokens
        for r in X.bpe_encode(df, merges).select("text", "bpe_tokens").collect()
    }
    for t in TEXTS:
        assert got[t] == ref_encode(t), t


def test_bpe_encode_plan_has_no_shuffle_or_python(spark):
    """The encoder is chained JVM folds: no Exchange, no Python workers
    in the plan — scan-local at any scale."""
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    enc = X.bpe_encode(df, [("l", "o"), ("lo", "w")])
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "MapInPandas" not in plan


def test_bpe_encode_never_merges_across_word_boundary(spark):
    """Whitespace is a hard BPE boundary: a merge pair whose halves end
    one word and start the next must NOT fuse ('xa by' + merge (a,b)
    stays [x, a, b, y] — a flattened-stream encoder would emit 'ab')."""
    df = spark.createDataFrame([("xa by",)], ["text"])
    out = X.bpe_encode(df, [("a", "b")]).collect()[0].bpe_tokens
    assert out == ["x", "a", "b", "y"]
    # and the same pair DOES merge inside one word
    df2 = spark.createDataFrame([("xab y",)], ["text"])
    out2 = X.bpe_encode(df2, [("a", "b")]).collect()[0].bpe_tokens
    assert out2 == ["x", "ab", "y"]


def test_bpe_merges_sql_oracle_matches_reference_on_overlap_corpus():
    """The unrolled-CTE DuckDB twin of bpe_train (corpus._bpe_merges_sql,
    r14 — the oracle the driver gate runs) must reproduce the greedy
    left-to-right overlap semantics, which its gaps-and-islands parity
    encodes: runs of consecutive match positions (possible only when
    left == right) keep even offsets. Exercised on a corpus dominated by
    same-char runs — 'aaaaa' must merge as [aa, aa, a], never
    [aa, a, aa] (what a naive string-replace twin would produce)."""
    import duckdb

    from empujar_spark.plans.corpus import _bpe_merges_sql

    texts = [
        "aaaaa aaaaa aaaaa aaa",
        "aaaa baab baab",
        "ababab ababab",
        "aa aa aa aa",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?)", [(t,) for t in texts])
    for k in (1, 3, 6):
        got = [tuple(r) for r in con.execute(_bpe_merges_sql(k)).fetchall()]
        assert got == _ref_bpe(texts, k), f"k={k}: {got}"
