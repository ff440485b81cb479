"""Shared operator utilities."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

# Per-partition byte budget for CPU-bound per-row work: finer than the
# scan default (128 MB) because tokenize/decode kernels cost far more
# per byte than a columnar scan. Session-overridable for cluster tuning.
SPREAD_TARGET_CONF = "spark.empujar.spread.targetBytes"
_DEFAULT_TARGET_BYTES = 8 * 1024 * 1024
_DEFAULT_MAX_PARTITION_BYTES = 128 * 1024 * 1024

# Per-partition budget for HEAVY kernels (multi-pass regex batteries,
# per-character md5 folds, binary hex/simhash) — these cost ~µs/byte, so
# even a sub-MB input is worth fanning out: r16 sweep at sf0.1 measured
# text_quality 1.01s->0.64s, winnowing 3.76s->1.84s, binary_near_dup
# 8.2s->3.4s with the spread vs without, while split/size tokenize sites
# measured the OPPOSITE (bm25 1.23s->1.55s). Call sites pass this for
# kernels in the heavy class; the natural-width guard still skips the
# shuffle once the source splits wider than the cluster.
HEAVY_KERNEL_BYTES = 32 * 1024

_UNITS = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}


def _parse_bytes(s: str) -> int:
    """Parse Spark byte-conf spellings: '134217728b', '128MB', '8m'."""
    s = s.strip().lower()
    if s.endswith("b"):
        s = s[:-1]
    if s and s[-1] in _UNITS:
        return int(float(s[:-1]) * _UNITS[s[-1]])
    return int(s)


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Optimizer size estimate for df (file-size totals for parquet
    scans) — a driver-side stats visit, never a Spark job."""
    try:
        j = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return j if isinstance(j, int) else int(j.toString())
    except Exception:
        return None


def spread(df: DataFrame, target_bytes: int | None = None) -> DataFrame:
    """Spread rows across cores before CPU-bound per-row work — but only
    in the regime where the exchange buys parallelism. Width derives from
    the optimizer's size estimate, so the policy is scale-adaptive rather
    than tuned to one deployment:

    - input smaller than one per-core slice -> the shuffle costs more
      than the single-core work it parallelizes: skip (measured 2.4x on
      sf0.1 tokenize branches, r16);
    - input already wide at the scan (the 100 TB regime: the source
      splits into >= the desired slices by row group) -> repartitioning
      the full corpus is a pure extra shuffle: skip;
    - in between (one fat file, idle cores) -> round-robin repartition
      to the size-derived width, capped at cluster parallelism.

    One shared definition — text/multimodal/curation all import this, so
    the policy lands everywhere at once. If the size estimate is
    unavailable, falls back to the unconditional defaultParallelism
    repartition (the pre-r16 behavior).
    """
    sess = df.sparkSession
    par = sess.sparkContext.defaultParallelism
    size = _plan_size_bytes(df)
    if size is None or size <= 0:
        return df.repartition(par)
    if target_bytes is None:
        try:
            target_bytes = _parse_bytes(
                sess.conf.get(SPREAD_TARGET_CONF, str(_DEFAULT_TARGET_BYTES))
            )
        except Exception:
            target_bytes = _DEFAULT_TARGET_BYTES
    desired = min(par, math.ceil(size / target_bytes))
    if desired <= 1:
        return df
    try:
        max_pb = _parse_bytes(sess.conf.get("spark.sql.files.maxPartitionBytes"))
    except Exception:
        max_pb = _DEFAULT_MAX_PARTITION_BYTES
    natural = max(1, math.ceil(size / max_pb))
    if natural >= desired:
        return df
    return df.repartition(desired)
