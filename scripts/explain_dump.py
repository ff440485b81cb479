#!/usr/bin/env python
"""Dump .explain('formatted') for corpus entries to plans/<tag>/<name>_<suffix>.txt.

Usage: python scripts/explain_dump.py --tag r16 --suffix before name1 name2 ...
       python scripts/explain_dump.py --tag r16 --suffix before --time name1

--time additionally measures the entry with the noop sink (3 runs, prints
each) so plan shape and cost are captured together. The Spark session uses
the same settings as bench.py (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from empujar_spark.session import get_spark  # noqa: E402
from empujar_spark.plans.corpus import CORPUS  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("explain_dump")
    for name in args.names:
        q = CORPUS[name]
        df = q.fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")
        if args.time:
            spark.sparkContext.setJobDescription(f"{name} ({args.suffix})")
            ts = []
            for _ in range(args.runs):
                # fn() INSIDE the timer — bench.py times construction +
                # materialization together, and entries with eager work
                # (iterative graph loops, streaming drains) do most of
                # their work in fn()
                t0 = time.monotonic()
                q.fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            print(f"  {name}: {ts}")


if __name__ == "__main__":
    main()
