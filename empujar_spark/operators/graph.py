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
    """PageRank over (src → dst) edges; every src must have ≥1 out-edge
    (true by construction for symmetrized undirected graphs — no
    dangling-mass term needed, and the rank sum stays 1).

    Output: (node, rank) — ranks rounded to ``round_scale``.

    Scale shape for 100 TB: per iteration ONE hash equi-join of the edge
    list with the current (|V|-row) rank vector and one groupBy(dst) with
    map-side partial sums; the rank vector is orders of magnitude smaller
    than the edges, so at scale it broadcasts and the edge list NEVER
    shuffles across iterations. localCheckpoint cuts the growing lineage
    (iterative plans otherwise re-derive every prior step).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__deg"))
    ew = e.join(deg, "src")
    nodes = deg.select(F.col("src").alias("node"))
    n = nodes.count()
    base = F.lit((1.0 - damping) / n)
    pr = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        contribs = (
            ew.join(pr, ew.src == pr.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("__deg")).alias("__c"))
        )
        pr = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.round(
                    base + F.lit(damping) * F.coalesce(F.col("__c"), F.lit(0.0)),
                    round_scale,
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return pr
