#!/usr/bin/env python
"""Time corpus entries in a FRESH session: N runs each, prints all samples
and the median of the warm tail (runs 2..N). Use one invocation per code
variant so JIT/GC state never leaks across variants.

Usage: python scripts/ab_time.py [--runs 5] [--conf k=v ...] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from empujar_spark.session import get_spark  # noqa: E402
from empujar_spark.plans.corpus import CORPUS  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    extra = dict(kv.split("=", 1) for kv in args.conf)
    spark = get_spark("ab_time", extra_conf=extra or None)
    # session warmup: pay one-off JVM/codegen/footer costs off the clock
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1).collect()
    for name in args.names:
        spark.sparkContext.setJobDescription(name)
        ts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            CORPUS[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.monotonic() - t0, 3))
        warm = ts[1:] if len(ts) > 1 else ts
        print(
            f"{name}: warm_median={statistics.median(warm):.3f} all={ts}",
            flush=True,
        )


if __name__ == "__main__":
    main()
