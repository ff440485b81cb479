"""k×dim crossover for the k-means assignment map: codegen'd
literal-matrix expression vs the Arrow matmul kernel.

The expression path (`kmeans_assign(..., arrow=False)`) embeds the k×dim
centroid matrix as array literals — bit-exact vs the SQL oracle and
whole-stage-codegen'd, but its analysis/codegen cost grows with the
LITERAL SIZE, paid once per query on the driver. The Arrow path ships
the matrix to Python workers once and runs one BLAS matmul per batch —
flat setup, slightly higher per-batch overhead. Somewhere in k×dim the
curves cross; this harness measures where, on a replicated sf0.1
embeddings table (dim 64), sweeping k over octaves at a fixed row count.

Usage: python scripts/measure_kmeans_crossover.py [--factor 16]
       [--ks 8,32,128,512,1024] [--runs 3] [--out STRESS_KMEANS.json]

The measured crossover feeds `_ARROW_ASSIGN_MIN_KXDIM` in
operators/similarity.py (the pruned_join pattern: dispatcher constants
cite their capture).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from empujar_spark.session import get_spark
from scripts.stress import replicate, noop

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def centroid_matrix(k: int, dim: int) -> list[list[float]]:
    """Deterministic k×dim matrix spread across the embedding range."""
    return [
        [round(0.07 * ((i * 31 + j * 17) % 29) - 1.0, 4) for j in range(dim)]
        for i in range(k)
    ]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--factor", type=int, default=16)
    ap.add_argument("--ks", default="8,32,128,512,1024")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "STRESS_KMEANS.json"))
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("kmeans-crossover")
    from empujar_spark.operators import similarity as S

    emb = replicate(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        "vec_id", args.factor,
    ).select("vec_id", F.col("embedding").cast("array<double>").alias(
        "embedding")).localCheckpoint(eager=True)
    n_rows = emb.count()
    dim = len(emb.select("embedding").first()[0])

    # warmup: one pass per path pays JVM codegen / Python worker spawn
    warm = centroid_matrix(4, dim)
    noop(S.kmeans_assign(emb, warm, arrow=False))
    noop(S.kmeans_assign(emb, warm, arrow=True))

    out = {"n_rows": n_rows, "dim": dim, "factor": args.factor,
           "runs": args.runs, "expr": {}, "arrow": {}}
    for k in ks:
        C = centroid_matrix(k, dim)
        for name, arrow in (("expr", False), ("arrow", True)):
            ts = []
            for _ in range(args.runs):
                t0 = time.monotonic()
                noop(S.kmeans_assign(emb, C, arrow=arrow))
                ts.append(round(time.monotonic() - t0, 3))
            out[name][str(k)] = min(ts)
            print(f"k={k:5d} kxdim={k * dim:7d} {name:5s} "
                  f"min={min(ts):7.3f}s samples={ts}", flush=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"wrote": args.out}))


if __name__ == "__main__":
    main()
