"""Unit tests for the iterative graph operators (operators/graph.py)."""

from pyspark.sql import functions as F

from empujar_spark.operators.graph import pagerank


def _edges(spark, pairs):
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, ["src", "dst"])


def test_pagerank_star_graph_center_dominates(spark):
    """On a star (0 — each of 1..4), the center collects the mass; the
    leaves tie exactly (deterministic rounding ⇒ bit-equal ranks)."""
    pr = {
        r.node: r.rank
        for r in pagerank(_edges(spark, [(0, i) for i in range(1, 5)])).collect()
    }
    assert pr[0] > pr[1]
    assert len({pr[i] for i in range(1, 5)}) == 1
    assert abs(sum(pr.values()) - 1.0) < 1e-6  # stochastic: mass conserved


def test_pagerank_ring_is_uniform(spark):
    """On a 5-ring every node is symmetric: uniform 1/5 fixpoint from
    the first iteration onward."""
    ring = [(i, (i + 1) % 5) for i in range(5)]
    pr = {r.node: r.rank for r in pagerank(_edges(spark, ring)).collect()}
    assert all(abs(v - 0.2) < 1e-9 for v in pr.values()), pr


def test_pagerank_dangling_nodes_counted_and_mass_conserved(spark):
    """A plain directed edge list with a sink: the sink must appear in
    the output (node set is src ∪ dst, not just srcs), its incoming mass
    must not vanish (rank sum stays 1), and ranks must match the
    textbook power iteration with uniform dangling-mass redistribution."""
    # A→B, A→C, B→C; C is dangling (no out-edges)
    e = spark.createDataFrame([(0, 1), (0, 2), (1, 2)], ["src", "dst"])
    got = {r.node: r.rank for r in pagerank(e, iters=5).collect()}
    assert set(got) == {0, 1, 2}

    # reference power iteration, same per-iteration rounding contract
    d, n = 0.85, 3
    r = {0: 1 / n, 1: 1 / n, 2: 1 / n}
    for _ in range(5):
        dm = r[2]  # dangling mass = sink's rank
        contrib = {0: 0.0, 1: r[0] / 2, 2: r[0] / 2 + r[1]}
        r = {
            v: round((1 - d) / n + d * (contrib[v] + dm / n), 9)
            for v in r
        }
    assert got == r
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_pagerank_edge_join_is_broadcast_no_sort_merge(spark):
    """The per-iteration rank join carries an explicit broadcast hint:
    the step's physical plan must use broadcast joins only (no
    SortMergeJoin — the edge list is never shuffled for a join; the only
    shuffles left are the irreducible hash(dst)/hash(node) aggregation
    exchanges). Audited on the iteration step itself, since the driver
    loop's localCheckpoint collapses the final plan to a scan."""
    from empujar_spark.operators.graph import _pagerank_step

    e = _edges(spark, [(i, (i * 3) % 11) for i in range(1, 11)])
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    ew = e.join(F.broadcast(deg), "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    pr = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    step = _pagerank_step(ew, nodes, None, pr, n, 0.85, 9)
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # no edge-side Exchange feeding a join: every Exchange in the step
    # is an aggregation exchange (partial/final hash aggregate), never a
    # join-input repartition of the edge list
    assert "ShuffledHashJoin" not in plan


def test_pagerank_deterministic_across_partitionings(spark):
    """Identical ranks regardless of input partitioning — the per-
    iteration rounding contract."""
    pairs = [(i, (i * 7) % 23) for i in range(1, 23)]
    e = _edges(spark, [(a, b) for a, b in pairs if a != b])
    one = {(r.node, r.rank) for r in pagerank(e.coalesce(1)).collect()}
    many = {(r.node, r.rank) for r in pagerank(e.repartition(13)).collect()}
    assert one == many


def test_copurchase_triangles_counts_k4_once_each(spark):
    """Ordered-edge triangle counting on a known graph: K4 has exactly
    4 triangles, each counted once (hand-check of the a<b<c closure)."""
    # Build a fake lineitem where one order contains parts 1-4 twice
    # (support >= 2 needs each pair in >= 2 orders).
    rows = [(o, p) for o in (1, 2) for p in (10, 20, 30, 40)]
    df = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    from pyspark.sql import functions as F

    b = df.distinct()
    a = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    c = b.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    pairs = (
        a.join(c, "k").filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2).select("pa", "pb")
    )
    p1 = pairs.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    p2 = pairs.select(F.col("pa").alias("b2"), F.col("pb").alias("c2"))
    p3 = pairs.select(F.col("pa").alias("a3"), F.col("pb").alias("c3"))
    n = (
        p1.join(p2, p1.b == p2.b2)
        .join(p3, (p1.a == p3.a3) & (p2.c2 == p3.c3))
        .count()
    )
    assert n == 4  # C(4,3) triangles in K4
