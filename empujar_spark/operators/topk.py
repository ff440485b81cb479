"""Bounded-shuffle exact top-k per group.

The standard window formulation (row_number over partitionBy(group)
orderBy(value)) shuffles and sorts EVERY input row — at 100 TB the sort
exchange is the whole cost even though only k × |groups| rows survive.
Spark's public aggregate surface has no bounded-state top-k accumulator
(collect_list partials carry the full list through the exchange), so the
pre-shuffle truncation is exactly the case the task reserves for an
Arrow-batched kernel: a ``mapInPandas`` head-k per batch prunes the input
to ≤ batches × |groups| × k rows with zero shuffle, and the exact window
then runs on that sliver.

Lossless by construction: if row r is in group g's GLOBAL top k, then
fewer than k rows of g beat it anywhere — in particular inside r's own
Arrow batch — so r survives the batch cut; the final window re-ranks the
survivors exactly.

Determinism contract: total order (value desc/asc, id asc) — identical to
the ANSI row_number twin in plans/corpus.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    id_col: str,
    k: int = 3,
    ascending: bool = False,
) -> DataFrame:
    """Exact top-k rows per group, ties broken by ``id_col`` ascending.

    Output: group_cols + id_col + order_col + rnk (1-based). The plan is
    MapInPandas (per-batch head-k, no shuffle) → one tiny window; the
    exchange moves only the per-batch heads (plan-asserted in
    test_plans: the Window's input is the pruned kernel output).
    """
    cols = [*group_cols, id_col, order_col]
    src = df.select(*cols)
    schema = src.schema
    asc_flags = [True] * len(group_cols) + [ascending, True]
    # NULL alignment with the Spark window below (and its ANSI twin):
    # Spark orders nulls FIRST on ascending and LAST on descending — pandas
    # sorts NaN last unconditionally, so pin na_position to the Spark rule
    # or an ascending null-valued row that should rank 1 gets pruned by the
    # batch head-k. Likewise pandas groupby drops NaN keys by default,
    # which would silently delete whole null-keyed groups pre-window.
    na_position = "first" if ascending else "last"

    def head_k(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                pdf.sort_values(by=[*group_cols, order_col, id_col],
                                ascending=asc_flags, kind="mergesort",
                                na_position=na_position)
                .groupby(list(group_cols), sort=False, dropna=False)
                .head(k)
            )

    # Losslessness hazards: pandas float64 cannot tell Spark NULL from
    # Spark NaN, and the two sort DIFFERENTLY in Spark (NaN is GREATEST —
    # desc puts NaN first but nulls last; asc puts nulls first but NaN
    # last). A NaN-valued row the window would rank #1 could therefore be
    # cut by the batch head-k; a NULL id breaks the pandas tie-break the
    # same way. Route those rows AROUND the prefilter straight into the
    # exact window — they are rare in real data, so the bounded-shuffle
    # property is preserved (a pathological all-NaN input degrades
    # gracefully to the plain window plan, still exact).
    order_f = src.schema[order_col].dataType.typeName() in ("double", "float")
    hazard = F.col(id_col).isNull() | F.col(order_col).isNull()
    if order_f:
        hazard = hazard | F.isnan(F.col(order_col))
    # Float GROUP keys have the same NULL/NaN blindness: pandas maps both
    # to NaN, so groupby(dropna=False) MERGES two Spark-distinct groups
    # and head(k) is taken over the merged rows — a rightful top-k row of
    # the NaN group can be pruned. Route those rows around the prefilter
    # too (non-float group NULLs are safe: no NaN twin exists to collide
    # with, the pandas NaN group IS the NULL group).
    for gc in group_cols:
        if src.schema[gc].dataType.typeName() in ("double", "float"):
            hazard = hazard | F.col(gc).isNull() | F.isnan(F.col(gc))
    pruned = (
        src.filter(~hazard)
        .mapInPandas(head_k, schema)
        .unionByName(src.filter(hazard))
    )
    order = (
        F.col(order_col).asc_nulls_first()
        if ascending
        else F.col(order_col).desc_nulls_last()
    )
    w = Window.partitionBy(*group_cols).orderBy(order, F.col(id_col).asc())
    return (
        pruned.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(*group_cols, id_col, order_col, "rnk")
    )
