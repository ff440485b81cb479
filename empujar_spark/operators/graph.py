"""Iterative graph operators over edge DataFrames.

``pagerank``: power-iteration PageRank on a directed edge list — the
iterative-algorithm pattern (driver loop over DataFrame steps with
localCheckpoint lineage cuts) shared with dedup.near_dup_clusters, on an
explicit graph. Undirected graphs: pass both edge directions.

Determinism: every iteration rounds ranks to ``round_scale`` decimals, so
the per-node contribution sums (double adds in partition order) stay far
inside the rounding boundary and the result is identical on any engine /
partitioning — the same stabilization the cosine and quantile operators
use. The DuckDB twin unrolls the same iterations as chained CTEs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    round_scale: int = 9,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over (src → dst) edges. The node set is src ∪ dst, so
    dangling nodes (dst-only, no out-edges) are first-class: their rank
    mass redistributes uniformly each iteration (the standard
    dangling-mass term), keeping the rank sum at 1. For symmetrized
    undirected graphs the dangling set is empty and the term is exactly
    0 — results are unchanged from the no-dangling formulation.

    Output: (node, rank) — ranks rounded to ``round_scale``.

    Scale shape for 100 TB: per iteration ONE hash equi-join of the edge
    list with the current (|V|-row) rank vector and one groupBy(dst) with
    map-side partial sums. The rank vector is orders of magnitude smaller
    than the edges, so it carries an EXPLICIT ``F.broadcast`` hint — the
    edge list never shuffles for the join regardless of size statistics
    (the only per-iteration Exchange is the contribution aggregation on
    hash(dst), which is the irreducible PageRank shuffle; plan-asserted
    in tests/test_plans.py). Above ~10^8 nodes, where a rank broadcast no
    longer fits, swap the hint for a one-time ``repartition(src)`` of the
    edges and rank vector — the co-partitioning then reuses across
    iterations. The dangling mass is a ONE-ROW aggregate attached via
    broadcast nested-loop (a documented scalar-broadcast exception to the
    no-cartesian rule). localCheckpoint cuts the growing lineage
    (iterative plans otherwise re-derive every prior step).
    """
    # Materialize the (possibly expensive) edge derivation ONCE: the
    # loop below reuses ew every iteration, and without a lineage cut
    # Spark re-derives the full upstream plan (joins/aggregations that
    # BUILT the edge list) per iteration — measured 3.5× slower on the
    # co-purchase graph. At cluster scale swap localCheckpoint for
    # .persist(MEMORY_AND_DISK) or a reliable checkpoint dir; the
    # iteration-invariant inputs (ew, deg, nodes, dangling set) are the
    # things to pin, the rank vector is rebuilt each pass.
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg")).localCheckpoint()
    # The dangling SET is static (only its rank mass changes), so find it
    # once; symmetrized graphs have none, and then every iteration skips
    # the mass aggregate entirely — zero overhead vs the no-sink formula.
    # Nodes = srcs ∪ dst-only: deg already holds the distinct srcs, so
    # only the dst column pays a distinct shuffle (|E| rows once), and
    # the two legs are disjoint by construction — no final distinct.
    # ew and the dangling set both depend only on (e, deg) and are
    # INDEPENDENT eager jobs, each underfilling the cluster — submit
    # them from two driver threads so the second back-fills the first's
    # idle slots (guide §2.6, the dedup_quality overlap). Same frames,
    # same checkpoints, overlapped wall-clock.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    def _ew() -> DataFrame:
        return e.join(F.broadcast(deg), "src").localCheckpoint()

    def _dangling() -> DataFrame:
        return (
            e.select(F.col("dst").alias("node"))
            .distinct()
            .join(F.broadcast(deg), F.col("node") == deg.src, "left_anti")
            .localCheckpoint()
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        # inheritable_thread_target (ADVICE r16): under pinned-thread
        # mode a plain pool thread drops the caller's job group /
        # scheduler pool / job tags, so a user's cancelJobGroup would
        # silently miss these two jobs
        sess = edges.sparkSession
        ew_f = pool.submit(inheritable_thread_target(sess)(_ew))
        dang_f = pool.submit(inheritable_thread_target(sess)(_dangling))
        ew, dangling_nodes = ew_f.result(), dang_f.result()
    has_dangling = bool(dangling_nodes.head(1))
    nodes = (
        deg.select(F.col("src").alias("node"))
        .unionByName(dangling_nodes)
        .localCheckpoint()
    )
    n = nodes.count()
    pr = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        pr = _pagerank_step(
            ew,
            nodes,
            dangling_nodes if has_dangling else None,
            pr,
            n,
            damping,
            round_scale,
        ).localCheckpoint(eager=False)
    return pr


def _pagerank_step(
    ew: DataFrame,
    nodes: DataFrame,
    dangling_nodes: DataFrame | None,
    pr: DataFrame,
    n: int,
    damping: float,
    round_scale: int,
) -> DataFrame:
    """One power iteration — split out so its physical plan can be
    audited directly (the localCheckpoint in the driver loop otherwise
    collapses the returned plan to a checkpoint scan). ``dangling_nodes``
    is None when the graph has no sinks (the common symmetrized case)."""
    contribs = (
        ew.join(F.broadcast(pr), ew.src == pr.node)
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__c"))
    )
    mass = F.coalesce(F.col("__c"), F.lit(0.0))
    out = nodes.join(F.broadcast(contribs), "node", "left")
    if dangling_nodes is not None:
        # rank mass sitting on the (static) sink set, spread uniformly —
        # a one-row aggregate attached via broadcast nested-loop
        dm = (
            pr.join(F.broadcast(dangling_nodes), "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        out = out.join(F.broadcast(dm))
        mass = mass + F.col("__dm") / F.lit(float(n))
    return out.select(
        "node",
        F.round(
            F.lit((1.0 - damping) / n) + F.lit(damping) * mass,
            round_scale,
        ).alias("rank"),
    )


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Market-basket co-occurrence pairs with min support (the frequent-
    itemset k=2 pass). Output: (item_a, item_b, n_baskets) with
    item_a < item_b.

    The candidate join is keyed on the basket id — pair fan-out is
    bounded by basket size² per BASKET (small and data-independent),
    never a global cross join; the support threshold then collapses the
    pair stream in a map-side-combinable count. Single source of truth
    for the co-purchase corpus entries, the triangle/pagerank graph
    build, and the stress harness — one definition, four consumers.
    """
    b = df.select(basket_col, item_col).distinct()
    a = b.select(F.col(basket_col).alias("k"), F.col(item_col).alias("item_a"))
    c = b.select(F.col(basket_col).alias("k"), F.col(item_col).alias("item_b"))
    return (
        a.join(c, "k")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_support)
    )


def basket_edges(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Symmetrized (src, dst) edge list from basket_pairs — the graph
    the co-purchase pagerank runs on (both directions of every pair).
    Symmetrization explodes a two-struct array per pair rather than
    unioning two projections: a union would re-run the whole basket
    self-join + support aggregate once per branch (Spark shares no
    subplans across a union)."""
    pairs = basket_pairs(df, basket_col, item_col, min_support)
    return pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("item_a").alias("src"), F.col("item_b").alias("dst")
                ),
                F.struct(
                    F.col("item_b").alias("src"), F.col("item_a").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
