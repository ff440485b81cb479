"""IVF index properties: exact when probing every list, useful recall when
probing a fraction, equi-join (never cartesian) physical plan."""

import pytest
from pyspark.sql import functions as F

from empujar_spark.operators import similarity as S

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _pairs(rows):
    return {(r.query_id, r.neighbor_id) for r in rows}


def test_ivf_full_probe_equals_exact(emb):
    """nprobe == n_centroids ⇒ every inverted list is scanned ⇒ IVF must
    reproduce the brute-force result bit-for-bit."""
    queries = emb.filter(F.col("vec_id") < 10)
    exact = S.cosine_topk(emb, queries, k=5).collect()
    full = S.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=8).collect()
    assert {(r.query_id, r.neighbor_id, r.rnk, r.cosine) for r in exact} == {
        (r.query_id, r.neighbor_id, r.rnk, r.cosine) for r in full
    }


def test_ivf_partial_probe_recall(emb):
    """Half the lists probed keeps recall well above the probed fraction
    (the whole point of the index) and is deterministic across runs."""
    queries = emb.filter(F.col("vec_id") < 25)
    exact = _pairs(S.cosine_topk(emb, queries, k=5).collect())
    run1 = S.ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=8).collect()
    run2 = S.ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=8).collect()
    assert _pairs(run1) == _pairs(run2)
    recall = len(exact & _pairs(run1)) / len(exact)
    assert recall >= 0.6, f"recall@5 {recall} too low for nprobe=8/16"


def test_ivf_plan_is_equi_join(emb):
    """The probe is an equi-join on centroid id — a broadcast hash join,
    never a cartesian product over the corpus."""
    queries = emb.filter(F.col("vec_id") < 5)
    df = S.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dup_pairs_ivf_full_probe_equals_exact(emb):
    """embedding_dup_pairs at nprobe == n_centroids must reproduce the
    brute-force pair set exactly (complete candidate generation)."""
    from empujar_spark.operators import dedup as D

    ivf = sorted(map(tuple, D.embedding_dup_pairs(
        emb, threshold=0.3, method="ivf", n_centroids=8).collect()))
    exact = sorted(map(tuple, D.embedding_dup_pairs(
        emb, threshold=0.3, method="exact").collect()))
    assert ivf == exact and len(exact) > 0


def test_dup_pairs_partial_probe_subset_no_false_positives(emb):
    """Approximate mode (nprobe < n_centroids) may miss pairs but must
    never invent one: the result is a subset of the exact pair set with
    identical cosines."""
    from empujar_spark.operators import dedup as D

    exact = {(r.id_a, r.id_b): r.cosine for r in D.embedding_dup_pairs(
        emb, threshold=0.3, method="exact").collect()}
    approx = {(r.id_a, r.id_b): r.cosine for r in D.embedding_dup_pairs(
        emb, threshold=0.3, method="ivf", n_centroids=8, nprobe=2).collect()}
    assert set(approx) <= set(exact)
    assert all(exact[k] == v for k, v in approx.items())
