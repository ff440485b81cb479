"""Scale/extension operators beyond the reference's surface (BASELINE.json
north star): dedup, similarity search, text analysis, multimodal columns,
as-of and range joins, skew mitigation, profiling/sampling.

Each operator is a DataFrame→DataFrame function, deterministic, JVM-side
(built-in pyspark.sql.functions) unless genuinely impossible, and designed
so the same computation is expressible as ANSI SQL for the DuckDB oracle.
"""

from empujar_spark.operators import (  # noqa: F401
    asof,
    classifier,
    curation,
    dedup,
    graph,
    multimodal,
    profile,
    quality,
    ranges,
    similarity,
    sketch,
    skew,
    text,
    timeseries,
    topk,
)

__all__ = [
    "asof",
    "classifier",
    "curation",
    "dedup",
    "graph",
    "multimodal",
    "profile",
    "quality",
    "ranges",
    "similarity",
    "sketch",
    "skew",
    "text",
    "timeseries",
    "topk",
]
