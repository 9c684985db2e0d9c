"""End-to-end headline pipeline wired through the lineage/checkpoint layer.

This is the SURVEY §7 M5 integration: every stage of the production job
(ingest images -> tile grid -> AOI assignment -> index stats) commits
per-partition lineage rows, so a killed `spark-submit` resumes from the last
committed partition of the last incomplete stage (north_rule).  Each stage
reads its upstream from the checkpoint root — stages are independently
restartable and independently scalable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eoreader_spark import datagen
from eoreader_spark.lineage import LineageStore
from eoreader_spark.operators import assign
from eoreader_spark.sources import pyscan

N_BUCKETS = 32
PARENT_RES = 3
# assignment rows concentrate where AOIs are (hot spots): key their lineage
# partitions at a finer parent so no partition balloons (measured: res 3
# put 220M rows in 7 partitions at 200k images)
ASSIGN_PARENT_RES = 5


def _bucket(col: str):
    return F.pmod(F.xxhash64(col), F.lit(N_BUCKETS))


def run_pipeline(
    spark: SparkSession,
    root: str,
    n_images: int,
    index_names: list[str] | None = None,
    die_after: str | None = None,
) -> dict:
    """Run (or RESUME) the full pipeline under ``root``; returns per-stage
    resume metrics.  Safe to re-invoke after a kill at any point.
    ``die_after`` ('images'|'tiles'|'assign') is the deterministic kill-point
    hook: raise SystemExit(1) after that stage commits — used by the
    spark-submit kill/resume tests."""
    store = LineageStore(spark, root)
    index_names = index_names or ["NDVI", "NDWI"]
    out = {}

    def _maybe_die(stage: str) -> None:
        if die_after == stage:
            print(f"DIE_AFTER {stage}", flush=True)
            raise SystemExit(1)

    images = datagen.gen_images(spark, n_images).withColumn("bucket", _bucket("image_id"))
    out["images"] = store.run_stage("images", images, "bucket", payload_col="bytes")
    _maybe_die("images")

    tiles = datagen.gen_tiles(spark, n_images).withColumn(
        "cell_parent", datagen.parent_cell_udf(PARENT_RES)(F.col("cell_r7"))
    )
    out["tiles"] = store.run_stage("tiles", tiles, "cell_parent")
    _maybe_die("tiles")

    aoi = datagen.gen_aoi(spark, n_images)
    assigned = assign.assign_tiles(store.read_stage("tiles"), aoi).withColumn(
        "cell_parent", datagen.parent_cell_udf(ASSIGN_PARENT_RES)(F.col("cell_r7"))
    )
    out["assign"] = store.run_stage("assign", assigned, "cell_parent")
    _maybe_die("assign")

    stats = pyscan.index_stats_scan(spark, f"{root}/images", index_names).withColumn(
        "bucket", _bucket("image_id")
    )
    out["index"] = store.run_stage("index_stats", stats, "bucket")
    return out


def pipeline_outputs(spark: SparkSession, root: str) -> dict[str, DataFrame]:
    store = LineageStore(spark, root)
    return {
        "images": store.read_stage("images"),
        "tiles": store.read_stage("tiles"),
        "assign": store.read_stage("assign"),
        "index_stats": store.read_stage("index_stats"),
        "metrics": store.metrics(),
    }
