import shutil

from pyspark.sql import functions as F

from eoreader_spark import datagen
from eoreader_spark.lineage import LineageStore


def _scenes(spark, n=40):
    return datagen.gen_scenes(spark, n).withColumn(
        "bucket", F.pmod(F.xxhash64("image_id"), F.lit(8))
    )


def test_stage_commit_and_skip(spark, tmp_path):
    store = LineageStore(spark, str(tmp_path / "ck"))
    df = _scenes(spark)
    r1 = store.run_stage("scenes", df, "bucket")
    assert r1["rows_written"] == 40 and not r1["skipped"]
    assert store.read_stage("scenes").count() == 40
    # second run: everything committed -> full skip, no recompute
    r2 = store.run_stage("scenes", df, "bucket")
    assert r2["skipped"] and r2["rows_written"] == 0
    m = {r.stage: r for r in store.metrics().collect()}
    assert m["scenes"].rows == 40 and m["scenes"].n_partitions == 8


def test_resume_after_partial_run(spark, tmp_path):
    """Kill simulation: first run covers half the keys; resumed run computes
    ONLY the remaining keys (north_rule: resume without recomputing)."""
    store = LineageStore(spark, str(tmp_path / "ck"))
    df = _scenes(spark)
    half = df.filter(F.col("bucket") < 4)
    store.run_stage("scenes", half, "bucket")
    assert store.completed_keys("scenes").count() == 4

    pending = store.pending(df, "scenes", "bucket")
    assert pending.select("bucket").distinct().count() == 4
    assert pending.filter(F.col("bucket") < 4).count() == 0

    r = store.run_stage("scenes", df, "bucket")
    assert r["keys_committed"] == 4  # only the uncommitted half ran
    assert store.read_stage("scenes").count() == 40


def test_uncommitted_partial_data_is_overwritten(spark, tmp_path):
    """Kill between data write and lineage commit: key reruns idempotently
    (dynamic partition overwrite)."""
    root = str(tmp_path / "ck")
    store = LineageStore(spark, root)
    df = _scenes(spark)
    store.run_stage("scenes", df, "bucket")
    # simulate: lineage row lost for bucket 2 (commit never happened)
    lin = store.lineage().filter(F.col("part_key") != 2).toPandas()
    shutil.rmtree(f"{root}/_lineage")
    spark.createDataFrame(lin).write.mode("overwrite").parquet(f"{root}/_lineage")

    r = store.run_stage("scenes", df, "bucket")
    assert r["keys_committed"] == 1 and r["rows_written"] == df.filter(F.col("bucket") == 2).count()
    # no duplication: partition was overwritten, not appended
    assert store.read_stage("scenes").count() == 40
