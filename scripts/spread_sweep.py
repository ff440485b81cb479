#!/usr/bin/env python
"""Sweep spread() width policies for an entry: skip vs repartition(k).

Forces the policy by monkeypatching empujar_spark.operators.common.spread
before corpus construction, so every import alias sees it. Prints the warm
median per policy. Use on a QUIET box.

Usage: python scripts/spread_sweep.py [--runs 4] [--widths 0,4,32] name ...
  width 0 = skip (no repartition); any k = unconditional repartition(k).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from empujar_spark import operators  # noqa: E402
from empujar_spark.operators import common  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--widths", default="0,4,32")
    args = ap.parse_args()

    widths = [int(w) for w in args.widths.split(",")]

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    from empujar_spark.session import get_spark

    spark = get_spark("spread_sweep")
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()

    from empujar_spark.plans.corpus import CORPUS

    # every operator module imported spread by value (as _spread) — patch
    # each module's binding
    import empujar_spark.operators.text as T
    import empujar_spark.operators.multimodal as M
    import empujar_spark.operators.curation as Cu

    mods = [T, M, Cu]

    def set_policy(width: int) -> None:
        if width == 0:
            fn = lambda df, target_bytes=None: df  # noqa: E731
        else:
            fn = lambda df, target_bytes=None: df.repartition(width)  # noqa: E731,B023
        common.spread = fn
        for m in mods:
            m._spread = fn

    for name in args.names:
        for w in widths:
            set_policy(w)
            spark.sparkContext.setJobDescription(f"{name} w={w}")
            ts = []
            for _ in range(args.runs):
                t0 = time.monotonic()
                CORPUS[name].fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(round(time.monotonic() - t0, 3))
            warm = ts[1:] if len(ts) > 1 else ts
            print(
                f"{name} w={w}: warm_median={statistics.median(warm):.3f} all={ts}",
                flush=True,
            )


if __name__ == "__main__":
    main()
