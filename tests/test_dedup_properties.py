"""Property-based tests (hypothesis) for the span-dedup and graph
operators: segment_dedup must be a lossless partition of every document
into spans (reconstruction + conservation invariants hold for ANY corpus),
and pagerank must conserve probability mass on ANY symmetric graph."""

from hypothesis import given, settings
from hypothesis import strategies as st

words = st.sampled_from(["a", "b", "c", "d", "tok", "xyz"])
texts = st.lists(words, min_size=0, max_size=24).map(" ".join)


@settings(max_examples=6, deadline=None)
@given(docs=st.lists(texts, min_size=1, max_size=12))
def test_segment_dedup_invariants(spark, docs):
    """For ANY corpus: (1) every non-blank doc appears exactly once with
    n_segs = ceil(n_tokens/5); (2) 0 <= n_kept <= n_segs; (3) a doc's
    clean_text is a subsequence of its original segments in order; (4)
    each distinct span is kept exactly once corpus-wide."""
    from empujar_spark.operators.dedup import segment_dedup

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in segment_dedup(df, seg_tokens=5).collect()}

    def segs_of(t):
        toks = t.split()
        return [" ".join(toks[i : i + 5]) for i in range(0, len(toks), 5)]

    expected_ids = {i for i, t in enumerate(docs) if t.strip()}
    assert set(out) == expected_ids
    kept_total = {}
    for i in sorted(expected_ids):
        segs = segs_of(docs[i])
        r = out[i]
        assert r.n_segs == len(segs)
        assert 0 <= r.n_kept <= r.n_segs
        # first-occurrence-wins in (doc_id, seg_idx) order:
        expect_clean = []
        for s in segs:
            if s not in kept_total:
                kept_total[s] = (i,)
                expect_clean.append(s)
        assert r.clean_text == " ".join(expect_clean), (i, docs[i])
        assert r.n_kept == len(expect_clean)


graph_edges = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=16,
)


@settings(max_examples=6, deadline=None)
@given(pairs=graph_edges)
def test_pagerank_mass_conservation(spark, pairs):
    """On ANY symmetrized edge set, ranks are positive and sum to 1
    (within rounding dust) — the stochastic-matrix invariant."""
    from empujar_spark.operators.graph import pagerank

    sym = list({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    e = spark.createDataFrame(sym, ["src", "dst"])
    ranks = [r.rank for r in pagerank(e, iters=3).collect()]
    assert all(r > 0 for r in ranks)
    assert abs(sum(ranks) - 1.0) < 1e-6


def test_containment_detects_subset_duplication_jaccard_misses(spark):
    """The defining case: a short doc fully quoted inside a 10x-longer
    one — containment C(short→long) = 1.0 while symmetric Jaccard is
    diluted below any dedup threshold; only the passing DIRECTION is
    emitted, and a near-identical pair emits both directions."""
    from empujar_spark.operators import dedup as D

    short = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(20))
    long = f"{filler} {short} {filler.replace('w', 'z')}"
    df = spark.createDataFrame(
        [(1, short), (2, long), (3, "unrelated text entirely " * 3)],
        "doc_id long, text string",
    )
    rows = D.containment_pairs(df, k=3, threshold=0.8).collect()
    assert [(r.contained_id, r.container_id, r.containment) for r in rows] == [
        (1, 2, 1.0)
    ]
    # symmetric Jaccard on the same pair sits far below the threshold
    jac = D.ngram_jaccard_pairs(df, k=3, threshold=0.0).collect()
    j12 = [r.jaccard for r in jac if (r.id_a, r.id_b) == (1, 2)]
    assert j12 and j12[0] < 0.1

    twins = spark.createDataFrame(
        [(1, short), (2, short + " omega")], "doc_id long, text string"
    )
    both = sorted(
        (r.contained_id, r.container_id)
        for r in D.containment_pairs(twins, k=3, threshold=0.8).collect()
    )
    assert both == [(1, 2), (2, 1)]


@settings(max_examples=5, deadline=None)
@given(docs=st.lists(texts.filter(lambda t: len(t.split()) >= 3),
                     min_size=2, max_size=8))
def test_containment_dominates_jaccard_and_is_bounded(spark, docs):
    """For ANY corpus: every emitted containment is in (0, 1], and for
    each ordered pair containment(A→B) ≥ their symmetric Jaccard (the
    union is never smaller than |S(A)|)."""
    from empujar_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    cont = {
        (r.contained_id, r.container_id): r.containment
        for r in D.containment_pairs(df, k=3, threshold=0.0).collect()
    }
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(df, k=3, threshold=0.0).collect()
    }
    for (a, b), c in cont.items():
        assert 0.0 < c <= 1.0
        j = jac.get((a, b), jac.get((b, a)))
        assert j is not None and c >= j - 1e-9
    # and every Jaccard-visible pair surfaces in at least one direction
    for (a, b), j in jac.items():
        assert (a, b) in cont or (b, a) in cont


def test_containment_incremental_prebuilt_history_not_reshingled(spark, tmp_path):
    """Steady-state ingest shape: with a PREBUILT history_shingle_table
    read from parquet, the plan shingles only the new batch — exactly
    one Generate (explode) node — and produces the same rows as the
    derive-from-scratch path."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    scratch = D.containment_incremental_pairs(new, hist, threshold=0.3)

    hist_path = str(tmp_path / "hist_shingles")
    D.history_shingle_table(hist).write.parquet(hist_path)
    stored = spark.read.parquet(hist_path)
    served = D.containment_incremental_pairs(
        new, history_shingles=stored, threshold=0.3
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1, (
        "prebuilt-history path must shingle only the new batch"
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, scratch.collect())
    )
    assert served.count() > 0


def test_containment_incremental_detects_subset_ingest(spark):
    """A new doc that is a strict subset of a stored doc crosses
    c_new_in_hist; a new doc that contains a stored doc crosses
    c_hist_in_new; unrelated docs emit nothing."""
    from empujar_spark.operators import dedup as D

    hist = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three"),
            (3, "totally unrelated content lives here quietly"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),  # subset of 1
            (11, "zero one two three four five six"),  # contains 2
            (12, "nothing in common at all"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.new_id, r.hist_id): r
        for r in D.containment_incremental_pairs(new, hist, threshold=0.9).collect()
    }
    assert set(rows) == {(10, 1), (11, 2)}
    assert rows[(10, 1)].c_new_in_hist == 1.0  # every new shingle stored
    assert rows[(11, 2)].c_hist_in_new == 1.0  # stored doc fully contained
    assert rows[(10, 1)].c_hist_in_new < 0.9
    assert rows[(11, 2)].c_new_in_hist < 0.9


def test_minhash_incremental_prebuilt_bands_not_rehashed(spark, tmp_path):
    """Steady-state LSH ingest: with a PREBUILT band_history_table read
    from parquet, the plan shingles/hashes only the new batch — the
    history side is a plain scan (its Generate/explode nodes vanish) —
    and rows equal the derive-from-scratch path."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    hist = docs.filter(F.col("doc_id") % 5 != 0)
    scratch = D.minhash_incremental_pairs(new, hist)
    n_scratch = scratch._jdf.queryExecution().executedPlan().toString().count("Generate")

    path = str(tmp_path / "hist_bands")
    D.band_history_table(hist).write.parquet(path)
    served = D.minhash_incremental_pairs(
        new, history_bands=spark.read.parquet(path)
    )
    n_served = served._jdf.queryExecution().executedPlan().toString().count("Generate")
    assert n_served == n_scratch // 2, (
        "prebuilt-band path must hash only the new batch"
    )
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, scratch.collect())
    )
    assert served.count() > 0


def test_semantic_dedup_equals_unionfind_over_brute_pairs(spark):
    import random

    from pyspark.sql import functions as F

    from empujar_spark.operators import dedup as D

    rng = random.Random(11)
    # planted clusters: 12 anchors, each with 0-3 tiny perturbations,
    # plus lone vectors — perturbed copies land above the threshold
    rows, vid = [], 0
    anchors = []
    for _ in range(12):
        v = [rng.gauss(0, 1) for _ in range(16)]
        anchors.append(v)
        rows.append((vid, v)); vid += 1
        for _ in range(rng.randrange(4)):
            rows.append((vid, [x + rng.gauss(0, 0.01) for x in v])); vid += 1
    for _ in range(10):
        rows.append((vid, [rng.gauss(0, 1) for _ in range(16)])); vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {
        (r.vec_id, r.cluster_id, r.is_kept)
        for r in D.semantic_dedup(df, threshold=0.95, n_centroids=4).collect()
    }

    # reference: brute pairs + union-find
    pairs = D.embedding_dup_pairs(
        df, threshold=0.95, method="exact", force=True
    ).collect()
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for p in pairs:
        a, b = find(p.id_a), find(p.id_b)
        if a != b:
            parent[max(a, b)] = min(a, b)
    want = set()
    roots = {i: find(i) for i, _ in rows}
    for i, _ in rows:
        want.add((i, roots[i], int(roots[i] == i)))
    assert got == want
    assert len({c for _, c, _ in got}) < len(rows)  # clustering happened


def test_connected_components_pointer_jump_round_count(spark):
    """A 256-node path is the worst case for plain min-label propagation
    (255 rounds — the label walks one hop per round); pointer jumping
    must converge in O(log n) rounds AND still produce the exact
    single-component answer."""
    import math

    from pyspark.sql import functions as F

    from empujar_spark.operators import dedup as D

    n = 256
    pairs = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: (r.cluster_id, r.is_kept)
           for r in D.connected_components(
               pairs, ids, small_graph_edges=0).collect()}
    assert len(out) == n
    assert all(c == 0 for c, _ in out.values())
    assert out[0] == (0, 1) and sum(k for _, k in out.values()) == 1
    assert D.last_cc_rounds <= 2 * int(math.log2(n)) + 4, (
        f"{D.last_cc_rounds} rounds on a {n}-path — pointer jump regressed"
    )


def test_connected_components_random_graph_matches_union_find(spark):
    """Exactness under the jump on an adversarial mix of shapes: random
    edges + long paths + singletons, verified against a driver-side
    union-find."""
    import random

    from pyspark.sql import functions as F

    from empujar_spark.operators import dedup as D

    rng = random.Random(11)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges += [(i, i + 1) for i in range(300, 340)]  # a 40-path
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    want = {v: min(u for u in range(n) if find(u) == find(v)) for v in range(n)}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    # force the DISTRIBUTED loop — its exactness is this test's subject
    got = {r.doc_id: r.cluster_id
           for r in D.connected_components(
               pairs, ids, small_graph_edges=0).collect()}
    assert got == want
    # the small-graph driver fast path (the default at this edge count)
    # must label identically — same union-by-min semantics
    fast = {r.doc_id: r.cluster_id
            for r in D.connected_components(pairs, ids).collect()}
    assert fast == want
    assert D.last_cc_rounds == 0  # the loop never ran


@settings(max_examples=6, deadline=None)
@given(docs=st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=8
))
def test_winnowing_equals_python_reference_any_text(spark, docs):
    """For ANY text (including runs of spaces, short strings, repeated
    grams): the operator's fingerprint set per doc equals the reference
    value-set winnowing computed in plain Python."""
    import hashlib
    import re

    from pyspark.sql import functions as F

    from empujar_spark.operators.text import winnowing_fingerprints

    k, w = 4, 3

    def py_winnow(text):
        nt = re.sub(r"\s+", " ", text.strip().lower())
        if len(nt) < k:
            return set()
        hs = [
            int(hashlib.md5(nt[i:i + k].encode()).hexdigest()[:12], 16)
            for i in range(len(nt) - k + 1)
        ]
        return {min(hs[i - w + 1:i + 1]) for i in range(w - 1, len(hs))}

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    got: dict = {i: set() for i in range(len(docs))}
    for r in winnowing_fingerprints(df, k=k, w=w).collect():
        got[r.doc_id].add(r.fp)
    for i, t in enumerate(docs):
        assert got[i] == py_winnow(t), f"doc {i}: {t!r}"


def test_fuzzy_join_lsh_twin_recall_and_exactness_of_scores(spark):
    """fuzzy_join (r15): the LSH-banded production twin's survivors are
    a SUBSET of the exact form with IDENTICAL scores (candidates are
    exactly re-scored, so divergence is only missed candidates), and
    recall on this fixture is >= 0.8; the exact form links every v2 doc
    whose Jaccard-to-origin clears the threshold back to its origin."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import dedup as D

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") % 3 == 0)
    v2 = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" v2extra")).alias("text"),
    )
    exact = {
        (r.left_id, r.right_id): r.jaccard
        for r in D.fuzzy_join(docs, v2, threshold=0.5).collect()
    }
    assert exact, "fixture produced no links"
    # origin links present for every pair that cleared the threshold
    origins = {k for k in exact if k[1] - 1000000 == k[0]}
    assert origins
    lsh = {
        (r.left_id, r.right_id): r.jaccard
        for r in D.fuzzy_join(
            docs, v2, threshold=0.5, method="lsh"
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    assert len(lsh) >= 0.8 * len(exact), (len(lsh), len(exact))


@settings(max_examples=5, deadline=None)
@given(
    left=st.lists(texts, min_size=1, max_size=6),
    right=st.lists(texts, min_size=1, max_size=6),
)
def test_fuzzy_join_matches_python_jaccard(spark, left, right):
    """For ANY two small corpora, fuzzy_join(method='exact') emits
    exactly the cross-table pairs whose word-3-gram shingle-set Jaccard
    (with the short-doc whole-text fallback) clears the threshold, with
    the correct 6dp score."""
    from empujar_spark.operators.dedup import fuzzy_join

    def shingles(t):
        toks = t.strip().lower().split()
        if not toks or not t.strip():
            return set()
        if len(toks) < 3:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    l = spark.createDataFrame(list(enumerate(left)), ["doc_id", "text"])
    r = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(right)], ["doc_id", "text"]
    )
    got = {
        (x.left_id, x.right_id): x.jaccard
        for x in fuzzy_join(l, r, threshold=0.4).collect()
    }
    expected = {}
    for i, lt in enumerate(left):
        for j, rt in enumerate(right):
            a, b = shingles(lt), shingles(rt)
            if not a or not b:
                continue
            jac = round(len(a & b) / len(a | b), 6)
            if jac >= 0.4 and len(a & b) > 0:
                expected[(i, 100 + j)] = jac
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(
    docs=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8",
                categories=(
                    "Lu", "Ll", "Nd", "Zs", "Zl", "Zp", "Cc", "Cf",
                    "Mn", "Po",
                ),
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_normalize_text_matches_python_reference(spark, docs):
    """For ANY unicode corpus (letters, digits, spaces, controls,
    format chars, combining marks, punctuation): normalize_text equals
    the pure-Python reference — unicodedata NFC, Cc/Cf -> space,
    whitespace collapse, trim. Pins the JVM fast-path/Python-lane split
    and the Java-vs-RE2 category-class equivalence the oracle relies
    on."""
    import re
    import unicodedata

    from empujar_spark.operators.text import normalize_text

    def ref(t):
        t = unicodedata.normalize("NFC", t)
        t = "".join(
            " "
            if unicodedata.category(c) in ("Cc", "Cf", "Zs", "Zl", "Zp")
            else c
            for c in t
        )
        return re.sub(r"\s+", " ", t).strip()

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r.doc_id: r.text_norm for r in normalize_text(df).collect()
    }
    assert got == {i: ref(t) for i, t in enumerate(docs)}


def test_fuzzy_join_best_resolves_one_match_per_left(spark):
    """fuzzy_join_best (r16): at most one row per left_id, and each
    kept row is the argmax of the full pair table under
    (jaccard desc, n_shared desc, right_id asc) — verified against
    fuzzy_join's own output on a fixture with competing candidates."""
    from pyspark.sql import functions as F

    from empujar_spark.operators import dedup as D

    left = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")],
        ["doc_id", "text"],
    )
    right = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon zeta"),       # exact copy
            (11, "alpha beta gamma delta epsilon zeta extra"), # near copy
            (12, "alpha beta gamma delta other tail words"),   # weaker
        ],
        ["doc_id", "text"],
    )
    pairs = {
        (r.left_id, r.right_id): (r.jaccard, r.n_shared)
        for r in D.fuzzy_join(left, right, threshold=0.1).collect()
    }
    assert len(pairs) >= 2, "fixture must produce competing candidates"
    best = D.fuzzy_join_best(left, right, threshold=0.1).collect()
    assert len(best) == 1
    assert best[0].right_id == 10  # the exact copy wins

    # invariant on real data: one row per left, and each equals the
    # pair-table argmax under the documented order
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") % 4 == 0)
    v2 = docs.select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    all_pairs = D.fuzzy_join(docs, v2, threshold=0.3).collect()
    resolved = D.fuzzy_join_best(docs, v2, threshold=0.3).collect()
    lefts = [r.left_id for r in resolved]
    assert len(lefts) == len(set(lefts))
    expect = {}
    for r in all_pairs:
        key = (-r.jaccard, -r.n_shared, r.right_id)
        if r.left_id not in expect or key < expect[r.left_id][0]:
            expect[r.left_id] = (key, r.right_id)
    assert {r.left_id: r.right_id for r in resolved} == {
        l: rid for l, (_, rid) in expect.items()
    }
