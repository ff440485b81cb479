"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Hash-spread rows across the cluster before CPU-bound per-row work
    (single-file parquet input = one partition = one core). One shared
    definition — text/multimodal/curation all import this, so a future
    refinement (e.g. skipping the repartition when the input is already
    wide) lands everywhere at once."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)
