"""Micro-bench: interpreted-HOF sequential cosine vs Arrow-batched numpy
matmul refine (round-4 VERDICT #5 done-criterion: numpy >= 3x at 64-dim x
1e5 candidate pairs).  Ratio measured within ONE session so host noise
cancels; fresh JVM per invocation.

Usage: python tools/bench_cosine_path.py [n_pairs] [dim]
Prints one JSON line {"hof_sec":..., "numpy_sec":..., "speedup":...}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from eoreader_spark.operators import similarity
from eoreader_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("cosine_path_bench", cpus=8, shuffle_partitions=8)
    pairs = spark.range(n, numPartitions=8).selectExpr(
        "id",
        f"transform(sequence(1, {dim}), j -> cast((id * 31 + j * 7) % 97 as double) / 97.0) as qvec",
        f"transform(sequence(1, {dim}), j -> cast((id * 17 + j * 13) % 89 as double) / 89.0) as embedding",
    ).persist()
    pairs.count()

    def run(exact: bool) -> tuple[float, float]:
        col = similarity._cosine_col("qvec", "embedding", exact)
        t0 = time.perf_counter()
        pairs.select(F.sum(col)).collect()
        cold = time.perf_counter() - t0  # the fresh-executor cost (HOF
        # lambdas run in the HotSpot INTERPRETER until C2 warms — the
        # cliff every new executor pays at cluster scale)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            pairs.select(F.sum(col)).collect()
            ts.append(time.perf_counter() - t0)
        return cold, min(ts)

    hof_cold, hof_warm = run(exact=True)
    np_cold, np_warm = run(exact=False)
    print(json.dumps({
        "n_pairs": n, "dim": dim,
        "hof_cold_sec": round(hof_cold, 3), "hof_warm_sec": round(hof_warm, 3),
        "numpy_cold_sec": round(np_cold, 3), "numpy_warm_sec": round(np_warm, 3),
        "cold_speedup": round(hof_cold / np_cold, 2),
        "warm_speedup": round(hof_warm / np_warm, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
