"""Block-cooperative stencil (round-4 scale design): Morton BxB tile blocks
own their interior halos as array slices; only block-boundary strips shuffle.
Outputs must be BIT-IDENTICAL to the per-tile halo path — same float32
inputs, same kernels, purely a different execution partitioning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from eoreader_spark import datagen
from eoreader_spark.operators import stencil


def _collect(df, cols=("px",)):
    return {
        (r.image_id, r.tile_x, r.tile_y): tuple(tuple(r[c]) for c in cols)
        for r in df.collect()
    }


def test_morton_key_values(spark):
    rows = spark.range(1).selectExpr("0 as z").select(
        stencil.morton_key(F.lit(0), F.lit(0)).alias("a"),
        stencil.morton_key(F.lit(1), F.lit(0)).alias("b"),
        stencil.morton_key(F.lit(0), F.lit(1)).alias("c"),
        stencil.morton_key(F.lit(3), F.lit(5)).alias("d"),
        stencil.morton_key(F.lit(255), F.lit(255)).alias("e"),
    ).first()
    assert (rows.a, rows.b, rows.c) == (0, 1, 2)
    # interleave(3=0b011, 5=0b101) = 0b100111 = 39
    assert rows.d == 39
    assert rows.e == 65535


def test_blocked_slope_matches_per_tile(spark):
    """Multi-block DEM (block=2 over a 4x4-tile grid exercises interior,
    edge and corner block crossings): bit-identical to the per-tile path."""
    t = 16
    rng = np.random.RandomState(11)
    rows = []
    for ty in range(4):
        for tx in range(4):
            px = rng.randint(0, 1000, size=t * t).astype(np.float32)
            rows.append(("i0", tx, ty, px.tolist()))
    dem = spark.createDataFrame(rows, "image_id string, tile_x int, tile_y int, px array<float>")
    a = _collect(stencil.slope(dem, tile=t))
    b = _collect(stencil.slope(dem, tile=t, block=2))
    assert a == b


def test_blocked_partial_blocks_and_missing_tiles(spark):
    """Image edges mid-block + a hole in the tile grid: missing tiles stay
    NaN in the mosaic, matching per-tile border semantics exactly."""
    t = 16
    rng = np.random.RandomState(13)
    rows = [
        ("i0", tx, ty, rng.randint(0, 255, size=t * t).astype(np.float32).tolist())
        for ty in range(3) for tx in range(5)
        if (tx, ty) != (2, 1)  # hole
    ]
    dem = spark.createDataFrame(rows, "image_id string, tile_x int, tile_y int, px array<float>")
    a = _collect(stencil.slope(dem, tile=t))
    b = _collect(stencil.slope(dem, tile=t, block=2))
    assert a == b


def test_blocked_refined_lee_halo3(spark):
    """Width-3 halo through the blocked path: corner blocks carry 3x3
    pixels, block-boundary windows span up to four blocks."""
    t = 16
    rng = np.random.RandomState(17)
    rows = [
        ("i0", tx, ty, rng.randint(0, 255, size=t * t).astype(np.float32).tolist())
        for ty in range(4) for tx in range(4)
    ]
    df = spark.createDataFrame(rows, "image_id string, tile_x int, tile_y int, px array<float>")
    k = stencil.refined_lee_kernel_factory(4.0)
    a = _collect(stencil.apply_stencil(df, k, tile=t, halo=3))
    b = _collect(stencil.apply_stencil_blocked(df, {"px": ("px", k)}, tile=t, block=2, halo=3))
    assert a == b


def test_blocked_multi_band_fused(spark):
    """Two bands + two kernels share one block pass, equal to two per-tile
    runs."""
    dem = datagen.gen_dem(spark, 2).withColumnRenamed("z", "px")
    two = dem.withColumn("px2", F.expr("transform(px, v -> v * cast(2 as float))"))
    fused = stencil.apply_stencil_blocked(
        two,
        {"o1": ("px", stencil.slope_kernel), "o2": ("px2", stencil.lee_kernel_factory())},
        block=2,
    )
    s1 = stencil.slope(dem)
    s2 = stencil.despeckle(
        two.select("image_id", "tile_x", "tile_y", F.col("px2").alias("px")),
        method="lee",
    )
    f = _collect(fused, ("o1", "o2"))
    a = _collect(s1)
    b = _collect(s2)
    assert {k: v[0] for k, v in f.items()} == {k: v[0] for k, v in a.items()}
    assert {k: v[1] for k, v in f.items()} == {k: v[0] for k, v in b.items()}


def test_blocked_partition_invariance(spark):
    t = 16
    rng = np.random.RandomState(19)
    rows = [
        ("i0", tx, ty, rng.randint(0, 255, size=t * t).astype(np.float32).tolist())
        for ty in range(4) for tx in range(4)
    ]
    df = spark.createDataFrame(rows, "image_id string, tile_x int, tile_y int, px array<float>")
    a = _collect(stencil.slope(df.repartition(1), tile=t, block=2))
    b = _collect(stencil.slope(df.repartition(5), tile=t, block=2))
    assert a == b


def test_blocked_reuses_prepartitioned_exchange(spark):
    """block_cols + repartition on the block key: the groupBy exchange is
    elided (no extra shuffle over the pre-partitioned centers)."""
    dem = datagen.gen_dem(spark, 2).withColumnRenamed("z", "px")
    pre = stencil.block_cols(dem, 4).repartition("image_id", "_bx", "_by")
    out = stencil.apply_stencil_blocked(pre, {"px": ("px", stencil.slope_kernel)}, block=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the cogroup's centers side must NOT get an ENSURE_REQUIREMENTS
    # exchange on top of the caller's repartition: total exchanges = the
    # caller's 2 REPARTITION_BY_COL (centers + the strips' source reuse)
    # plus at most one for the small strips side
    assert "FlatMapCoGroupsInPandas" in plan
    n_ensure = plan.count("ENSURE_REQUIREMENTS")
    assert n_ensure <= 1, plan


def test_blocked_refined_lee_with_holes(spark):
    """Width-3 halo + missing tiles mid-block: NaN mosaic holes must match
    the per-tile path's NaN-pad semantics under the 7x7 window too."""
    t = 16
    rng = np.random.RandomState(23)
    rows = [
        ("i0", tx, ty, rng.randint(0, 255, size=t * t).astype(np.float32).tolist())
        for ty in range(4) for tx in range(4)
        if (tx, ty) not in ((1, 1), (2, 3))
    ]
    df = spark.createDataFrame(rows, "image_id string, tile_x int, tile_y int, px array<float>")
    k = stencil.refined_lee_kernel_factory(4.0)
    a = _collect(stencil.apply_stencil(df, k, tile=t, halo=3))
    b = _collect(stencil.apply_stencil_blocked(df, {"px": ("px", k)}, tile=t, block=2, halo=3))
    assert a == b


def test_blocked_negative_tile_coords(spark):
    """Grids whose origin gives negative tile coordinates (e.g. tiles west
    of a UTM false-easting anchor): Spark's % takes the dividend's sign, so
    the block-edge prefilter must use pmod or block-crossing strips from
    tiles like tile_x=-1 silently vanish and halos come out NaN (round-4
    ADVICE). Bit-identical to the per-tile path is the invariant."""
    t = 16
    rng = np.random.RandomState(17)
    rows = []
    for ty in range(-3, 2):
        for tx in range(-3, 2):
            px = rng.randint(0, 1000, size=t * t).astype(np.float32)
            rows.append(("i0", tx, ty, px.tolist()))
    dem = spark.createDataFrame(
        rows, "image_id string, tile_x int, tile_y int, px array<float>"
    )
    a = _collect(stencil.slope(dem, tile=t))
    b = _collect(stencil.slope(dem, tile=t, block=2))
    assert a == b
    # a crossing at the negative-side block edge actually produced pixels
    interior = np.asarray(b[("i0", -1, -1)][0]).reshape(t, t)
    assert not np.isnan(interior).any()
