"""Structured Streaming layer.

The reference is strictly batch, one product at a time (README.md:15-16) —
SURVEY §2.9 records "no streaming operators".  What it DOES have is
incremental memoization/resume (S11): each expensive stage persists its
artifact and later runs skip it.  Here that becomes the streaming ingest
path the north_rule asks for: scene/image feeds arrive continuously, are
windowed + aggregated with watermarked event time, and every micro-batch
commits per-partition lineage rows through foreachBatch — the same
LineageStore used by batch stages, so batch and streaming share one
resume/metrics story.

All ops are standard Structured Streaming primitives: readStream (file
source), withWatermark + window() aggregation, applyInPandasWithState for
the custom stateful operator (per-scene ingest sessionization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eoreader_spark.lineage import LineageStore

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def read_events_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of event rows (scene-feed analog)."""
    return spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)


def windowed_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + sums with late-data handling."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_windowed_to_lineage(
    spark: SparkSession,
    input_dir: str,
    checkpoint_root: str,
    window: str = "1 hour",
) -> dict:
    """availableNow pipeline: stream -> windowed agg -> foreachBatch sink that
    appends results AND lineage rows (stage='stream_windows', key = hour
    bucket) atomically per micro-batch.  Returns sink metrics."""
    store = LineageStore(spark, checkpoint_root)
    agg = windowed_counts(read_events_stream(spark, input_dir), window=window)
    metrics = {"batches": 0, "rows": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df.withColumn(
            "bucket", (F.unix_timestamp("window_start") / 3600).cast("long")
        )
        # complete-mode re-emits CORRECTED totals for already-seen windows, so
        # the sink must upsert (overwrite + re-commit lineage), never skip
        # committed buckets — run_stage's anti-join would freeze stale counts
        r = store.upsert_stage("stream_windows", out, "bucket")
        metrics["batches"] += 1
        metrics["rows"] += r["rows_written"]

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", f"{checkpoint_root}/_stream_ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return metrics


def sessionize(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful operator: per-user session windows with a gap timeout
    (applyInPandasWithState) — the X-family extension point under streaming.

    Emits one row per closed session (user_id, session_start, session_end,
    n_events).  Sessions close when the watermark passes start+gap since the
    last event (timeout-based), the standard sessionization pattern.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000

    def fn(key, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        (user_id,) = key

        def row(start, end, n):
            return {
                "user_id": user_id,
                "session_start": pd.Timestamp(start, unit="ms"),
                "session_end": pd.Timestamp(end, unit="ms"),
                "n_events": n,
            }

        cols = ["user_id", "session_start", "session_end", "n_events"]
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame([row(start, end, n)], columns=cols)
            return

        ts_list = []
        for pdf in pdfs:
            ts_list.append(pd.to_datetime(pdf["ts"]).astype("int64") // 1_000_000)  # ms
        ts = np.sort(np.concatenate(ts_list))
        # split into gap-separated segments WITHIN the batch (availableNow may
        # deliver hours of data in one micro-batch)
        cut = np.nonzero(np.diff(ts) > gap_ms)[0]
        seg_bounds = np.concatenate([[0], cut + 1, [len(ts)]])
        segs = [
            (int(ts[a]), int(ts[b - 1]), int(b - a))
            for a, b in zip(seg_bounds[:-1], seg_bounds[1:])
        ]
        closed = []
        if state.exists:
            s0, e0, n0 = state.get
            if segs and segs[0][0] - e0 <= gap_ms:
                s, e, n = segs[0]
                segs[0] = (min(s0, s), max(e0, e), n0 + n)
            else:
                closed.append(row(s0, e0, n0))
        closed.extend(row(*seg) for seg in segs[:-1])
        last = segs[-1]
        state.update(last)
        state.setTimeoutTimestamp(last[1] + gap_ms)
        yield pd.DataFrame(closed, columns=cols)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType="user_id long, session_start timestamp, session_end timestamp, n_events long",
            stateStructType="s long, e long, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string,"
    " caption string, phash long"
)


def read_images_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of image rows (the continuously-arriving scene
    feed of the north_star; same authoritative input shape as batch)."""
    return spark.readStream.schema(IMAGES_SCHEMA).parquet(input_dir)


def streaming_index_stats(images: DataFrame, index_names: list[str]) -> DataFrame:
    """Decode + spectral indices on a STREAM of images — the identical
    mapInPandas kernel the batch path uses (functions/indices.index_stats),
    applied to an unbounded source.  Stateless per-row transform: no
    watermark needed; downstream windowed aggs or the lineage sink handle
    time semantics."""
    from eoreader_spark.functions import indices

    return indices.index_stats(images, index_names)


def run_image_index_to_lineage(
    spark: SparkSession,
    input_dir: str,
    store_root: str,
    index_names: list[str] | None = None,
) -> dict:
    """Streaming raster pipeline: images stream -> decode+index kernels ->
    per-micro-batch upsert + lineage rows (stage='stream_index', part_key =
    micro-batch id) through the SAME LineageStore as the batch stages — one
    resume/metrics story for both execution modes."""
    store = LineageStore(spark, store_root)
    stats = streaming_index_stats(
        read_images_stream(spark, input_dir), index_names or ["NDVI", "NDWI"]
    )
    metrics = {"batches": 0, "rows": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_df.withColumn("bucket", F.lit(int(batch_id)).cast("long"))
        r = store.upsert_stage("stream_index", out, "bucket")
        metrics["batches"] += 1
        metrics["rows"] += r["rows_written"]

    q = (
        stats.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{store_root}/_stream_index_ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return metrics


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: drop re-deliveries of the same key within the
    watermark horizon (`dropDuplicatesWithinWatermark` — state for a key is
    held only until the watermark passes it, so state size is bounded by
    arrival rate x horizon, never by total stream length; a plain
    dropDuplicates on an unbounded stream would grow state forever).  The
    training-pipeline analog of operators/dedup.exact_dedup for continuous
    scene/document feeds — duplicate feed deliveries (re-published scenes,
    at-least-once sources) collapse to one row."""
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_dedup_to_lineage(
    spark: SparkSession,
    input_dir: str,
    root: str,
    keys: list[str] | None = None,
) -> dict:
    """Deduped stream -> partitioned sink with per-batch lineage commits
    (same store as every batch stage)."""
    store = LineageStore(spark, root)
    deduped = dedup_stream(read_events_stream(spark, input_dir), keys=keys)
    n_batches = [0]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # partition key = micro-batch id: a retried batch dynamically
        # OVERWRITES its own partition (idempotent, the standard
        # exactly-once foreachBatch recipe) and can never clobber rows
        # another batch appended
        out = batch_df.withColumn("batch_key", F.lit(batch_id).cast("long"))
        if out.isEmpty():
            return
        store.upsert_stage("stream_dedup", out, "batch_key")
        n_batches[0] += 1

    q = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{root}/_stream_ck_dedup")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {"batches": n_batches[0]}
