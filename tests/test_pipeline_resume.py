"""Full-pipeline kill/resume: the north_rule's 'killed spark-submit run
resumes without recomputing completed cells', end to end."""

import shutil

from pyspark.sql import functions as F

from eoreader_spark import pipelines
from eoreader_spark.lineage import LineageStore

N = 30


def test_pipeline_runs_and_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "ck")
    m1 = pipelines.run_pipeline(spark, root, N)
    assert all(not v["skipped"] for v in m1.values())
    outs = pipelines.pipeline_outputs(spark, root)
    n_assign = outs["assign"].count()
    n_index = outs["index_stats"].count()
    assert outs["images"].count() == N and n_index == N * 2
    stage_metrics = {r.stage: r for r in outs["metrics"].collect()}
    assert set(stage_metrics) == {"images", "tiles", "assign", "index_stats"}
    assert stage_metrics["images"].bytes > 0  # payload bytes tracked

    # full re-run: everything committed -> every stage skips
    m2 = pipelines.run_pipeline(spark, root, N)
    assert all(v["skipped"] for v in m2.values())
    assert pipelines.pipeline_outputs(spark, root)["assign"].count() == n_assign


def test_pipeline_resume_after_mid_kill(spark, tmp_path):
    """Simulate a kill mid-pipeline: later stages' lineage missing + one
    tiles partition uncommitted; resume recomputes ONLY the gaps."""
    root = str(tmp_path / "ck")
    pipelines.run_pipeline(spark, root, N)
    want = {
        tuple(r)
        for r in pipelines.pipeline_outputs(spark, root)["assign"]
        .select("aoi_id", "image_id", "tile_x", "tile_y")
        .collect()
    }

    store = LineageStore(spark, root)
    lin = store.lineage()
    keep = lin.filter(
        ~(
            ((F.col("stage") == "tiles") & (F.col("part_key") == lin.filter("stage='tiles'").first().part_key))
            | (F.col("stage") == "assign")
            | (F.col("stage") == "index_stats")
        )
    ).toPandas()
    shutil.rmtree(f"{root}/_lineage")
    spark.createDataFrame(keep).write.mode("overwrite").parquet(f"{root}/_lineage")

    m = pipelines.run_pipeline(spark, root, N)
    assert m["images"]["skipped"]  # fully committed stage untouched
    assert m["tiles"]["keys_committed"] == 1  # only the lost partition
    assert not m["assign"]["skipped"] and not m["index"]["skipped"]

    got = {
        tuple(r)
        for r in pipelines.pipeline_outputs(spark, root)["assign"]
        .select("aoi_id", "image_id", "tile_x", "tile_y")
        .collect()
    }
    assert got == want  # resumed output identical to the uninterrupted run
