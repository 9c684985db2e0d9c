"""spark-submit entry point for the headline pipeline (north_rule: "run via
spark-submit --py-files ... resumable from checkpoint").

Usage:
    zip -r eoreader_spark.zip eoreader_spark
    spark-submit --master local[32] --py-files eoreader_spark.zip \
        tools/submit_pipeline.py --root /data/ck --n-images 48000

Re-running the same command after a kill resumes from the last committed
partition (see eoreader_spark/lineage.py).  ``--die-after STAGE`` is the
deterministic kill-point hook used by tests to simulate a mid-run crash
between a stage's commit and the next stage.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True, help="checkpoint/output root")
    ap.add_argument("--n-images", type=int, default=1000)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    ap.add_argument("--die-after", choices=["images", "tiles", "assign"], default=None,
                    help="test hook: exit(1) after this stage commits")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("eoreader_spark_pipeline")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from eoreader_spark import datagen, pipelines
    from eoreader_spark.lineage import LineageStore
    from eoreader_spark.operators import assign
    from eoreader_spark.sources import pyscan

    store = LineageStore(spark, args.root)
    out: dict[str, dict] = {}

    images = datagen.gen_images(spark, args.n_images).withColumn(
        "bucket", pipelines._bucket("image_id")
    )
    out["images"] = store.run_stage("images", images, "bucket", payload_col="bytes")
    if args.die_after == "images":
        print("DIE_AFTER images", flush=True)
        return 1

    tiles = datagen.gen_tiles(spark, args.n_images).withColumn(
        "cell_parent", datagen.parent_cell_udf(pipelines.PARENT_RES)(F.col("cell_r7"))
    )
    out["tiles"] = store.run_stage("tiles", tiles, "cell_parent")
    if args.die_after == "tiles":
        print("DIE_AFTER tiles", flush=True)
        return 1

    aoi = datagen.gen_aoi(spark, args.n_images)
    assigned = assign.assign_tiles(store.read_stage("tiles"), aoi).withColumn(
        "cell_parent", datagen.parent_cell_udf(pipelines.ASSIGN_PARENT_RES)(F.col("cell_r7"))
    )
    out["assign"] = store.run_stage("assign", assigned, "cell_parent")
    if args.die_after == "assign":
        print("DIE_AFTER assign", flush=True)
        return 1

    stats = pyscan.index_stats_scan(spark, f"{args.root}/images", ["NDVI", "NDWI"]).withColumn(
        "bucket", pipelines._bucket("image_id")
    )
    out["index"] = store.run_stage("index_stats", stats, "bucket")

    print("PIPELINE_RESULT " + json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
