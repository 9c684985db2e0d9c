"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...,
   "images_per_sec": ..., "tiles_per_sec": ...}

Two workloads:
  1. driver-testdata queries (the oracle-checked set, heavier subset)
  2. the engine's own spatial pipeline on synthetic images scaled to sf:
     datagen -> decode+index kernels -> tile<->AOI assignment (the
     BASELINE.json headline: images/sec and join rows/sec)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod  # noqa: E402
from eoreader_spark import datagen  # noqa: E402
from eoreader_spark.operators import assign, stencil  # noqa: E402
from eoreader_spark.session import get_spark  # noqa: E402
from eoreader_spark.sources import pyscan  # noqa: E402

def _control_task(seed: int) -> float:
    """One unit of the no-Spark hardware gauge: a fixed pure-numpy pixel
    workload (gradient + blend passes on a 1024^2 raster)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    a = rng.randint(0, 256, (1024, 1024)).astype(np.float64)
    s = 0.0
    for _ in range(8):
        s += float(np.abs(np.diff(a, axis=0)).sum() + np.abs(np.diff(a, axis=1)).sum())
        a = a * 0.99 + np.roll(a, 1, axis=0) * 0.01
    return s


def native_control(n_tasks: int = 32, nproc: int = 8) -> float:
    """Same-session native control (round-7 VERDICT #7, the round-6 method
    made standard): a deterministic multiprocessing workload with NO Spark
    in the loop.  Engine seconds are judged against this number's drift —
    a slow box slows both; a plan regression slows only the engine.  The
    quiet-box reference is ~2.0 s (recorded in BENCH.md round 7); divide
    engine times by (control_sec / reference) to host-adjust."""
    import multiprocessing as mp

    t0 = time.perf_counter()
    with mp.get_context("spawn").Pool(nproc) as pool:
        pool.map(_control_task, range(n_tasks))
    return time.perf_counter() - t0


BENCH_QUERIES = [
    "pricing_summary",
    "join_revenue",
    "cell_assign",
    "pip_window",
    "knn",
    "topk_window",
    "tumbling_window",
    "token_count",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    n_images = int(os.environ.get("SPARK_GRAFT_N_IMAGES", str(max(200, int(20000 * sf)))))

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    # warm the JVM and the Python UDF workers: per-cluster fixed costs, not
    # query throughput (same rule as tools/bench_scaling.py)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(cpus * 8, numPartitions=cpus * 4).mapInPandas(
        lambda it: (p for p in it), schema="id long"
    ).count()
    # warm the parquet reader / codegen paths on a tiny table (JIT, not data)
    spark.read.parquet(f"{sf_dir}/region.parquet").groupBy("r_name").count().collect()

    control_pre = native_control()

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # each query runs twice: the FIRST time (cold: plan codegen/JIT +
    # python-worker spin-up for that plan family — a per-cluster fixed
    # cost) feeds `queries`/`value`, keeping round-over-round continuity
    # with BENCH_r01-r06; the SECOND (steady-state throughput, what a
    # long-running cluster actually pays per query) feeds `queries_warm`
    # (round-7 addition, published alongside the same-session control)
    warm: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        n = len(qs[name](spark, sf_dir).collect())
        timings[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        len(qs[name](spark, sf_dir).collect())
        warm[name] = round(time.perf_counter() - t0, 3)
        assert n >= 0

    # --- synthetic spatial pipeline (the headline workload) ---
    # production shape: images land in a table first (Iceberg analog), the
    # decode+index stage reads its own splits data-locally (sources/pyscan)
    workdir = tempfile.mkdtemp(prefix="eoreader_spark_bench_")
    try:
        t0 = time.perf_counter()
        datagen.gen_images(spark, n_images, partitions=max(32, n_images // 256)).write.mode(
            "overwrite"
        ).parquet(f"{workdir}/images.parquet")
        n_img = n_images
        timings["gen_write_images"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        stats = pyscan.index_stats_scan(
            spark, f"{workdir}/images.parquet", ["NDVI", "NDWI", "EVI"]
        ).count()
        t_index = time.perf_counter() - t0
        timings["index_stats"] = round(t_index, 3)

        t0 = time.perf_counter()
        tiles = datagen.gen_tiles(spark, n_images).persist()
        n_tiles = tiles.count()
        aoi = datagen.gen_aoi(spark, n_images)
        n_assign = assign.assign_tiles(tiles, aoi).count()
        t_assign = time.perf_counter() - t0
        timings["tile_assign"] = round(t_assign, 3)
        tiles.unpersist()

        # stencil stage (round-2 strips-only halo redesign): slope over DEM
        # tiles materialized to parquet first (the at-rest shape)
        n_dem_imgs = max(50, n_images // 8)
        datagen.gen_dem(spark, n_dem_imgs).write.mode("overwrite").parquet(
            f"{workdir}/dem.parquet"
        )
        dem = spark.read.parquet(f"{workdir}/dem.parquet").withColumnRenamed("z", "px")
        t0 = time.perf_counter()
        n_dem = stencil.slope(dem).count()
        t_stencil = time.perf_counter() - t0
        timings["dem_slope"] = round(t_stencil, 3)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    control_post = native_control()
    control = round(min(control_pre, control_post), 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_images": n_img,
        "n_tiles": n_tiles,
        "n_assignments": n_assign,
        "n_index_rows": stats,
        "images_per_sec": round(n_img / t_index, 1),
        "tiles_per_sec": round(n_tiles / t_assign, 1),
        "stencil_tiles_per_sec": round(n_dem / t_stencil, 1),
        "cpus": cpus,
        "queries_warm": warm,
        "control_sec": control,
        "control_pre_post": [round(control_pre, 3), round(control_post, 3)],
        "knn_control_ratio": round(timings["knn"] / control, 3),
        "knn_warm_sec": warm["knn"],
        "knn_warm_control_ratio": round(warm["knn"] / control, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
