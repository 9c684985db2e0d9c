import contextlib
import io

import numpy as np
from pyspark.sql import functions as F

from eoreader_spark import cells, datagen
from eoreader_spark.sources import metadata


def test_partitioned_layout_prunes(spark, tmp_path):
    """North_rule layout: parent-cell partitioning -> Catalyst partition
    pruning (PartitionFilters in the scan, fewer files read)."""
    out = str(tmp_path / "tiles_part")
    datagen.write_tiles_partitioned(spark, out, n_images=80, parent_res=3)
    df = spark.read.parquet(out)
    # pick a real parent value
    some = df.select("cell_parent").first().cell_parent
    q = df.filter(F.col("cell_parent") == some)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert f"isnotnull(cell_parent" in plan or "cell_parent" in plan.split("PartitionFilters")[1][:200]
    # pruned read touches only that partition's rows
    full = df.count()
    part = q.count()
    assert 0 < part < full
    # parent derivation is consistent with cells.parent
    r = df.select("cell_r7", "cell_parent").first()
    assert cells.parent(np.array([r.cell_r7]), 3)[0] == r.cell_parent


def test_xml_metadata_pairs(spark):
    xml = """<root xmlns:n1="http://x">
      <n1:General_Info>
        <PRODUCT_TYPE>L2A</PRODUCT_TYPE>
        <Quantif value="10000"/>
      </n1:General_Info>
    </root>"""
    pairs = dict(metadata.xml_to_pairs(xml))
    assert pairs["/root/General_Info/PRODUCT_TYPE"] == "L2A"
    assert pairs["/root/General_Info/Quantif@value"] == "10000"

    df = spark.createDataFrame([("img1", xml)], "image_id string, mtd_xml string")
    rows = {(r.image_id, r.path): r.value for r in metadata.read_mtd_column(df).collect()}
    assert rows[("img1", "/root/General_Info/PRODUCT_TYPE")] == "L2A"


def test_loader_gain_bias(spark):
    from eoreader_spark.plans import loader

    images = datagen.gen_images(spark, 3)
    plain = loader.ImageEngine(images)
    gained = loader.ImageEngine(images, gains={"RED": (2.0, 0.1)})
    a = plain.load(["RED"], clean="raw").orderBy("image_id", "tile_x", "tile_y").first()
    b = gained.load(["RED"], clean="raw").orderBy("image_id", "tile_x", "tile_y").first()
    pa = np.asarray(a.px_RED, dtype=np.float64)
    pb = np.asarray(b.px_RED, dtype=np.float64)
    assert np.allclose(pb, np.clip(pa * 2.0 + 0.1, 0, None), atol=1e-6)


def test_bucketed_dem_stencil_no_center_exchange(spark, tmp_path):
    """The 100TB stencil claim end-to-end: a DEM tile table bucketed at rest
    on the tile key feeds slope(partitioned=True) with NO exchange on the
    centers subtree — only the strips move."""
    import contextlib
    import io

    from eoreader_spark import datagen
    from eoreader_spark.operators import stencil

    spark.sql("DROP TABLE IF EXISTS dem_bucketed")
    (
        datagen.gen_dem(spark, 6)
        .withColumnRenamed("z", "px")
        .write.bucketBy(4, "image_id", "tile_x", "tile_y")
        .sortBy("image_id", "tile_x", "tile_y")
        .mode("overwrite")
        .saveAsTable("dem_bucketed")
    )
    try:
        dem = spark.table("dem_bucketed")
        out = stencil.slope(dem, partitioned=True)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("extended")
        plan = buf.getvalue()
        physical = plan.split("== Physical Plan ==")[-1]
        # the centers scan feeds the join DIRECTLY — no repartition, no
        # exchange on the full-payload side; the only data movement is the
        # strips' aggregation/broadcast
        assert "REPARTITION_BY_COL" not in physical, physical
        lines = physical.splitlines()
        join_i = next(i for i, ln in enumerate(lines) if "Join" in ln)
        left = lines[join_i + 1].strip().lstrip(":+- ")
        assert left.startswith("FileScan parquet"), physical
        # and it still computes correctly
        import numpy as np

        r = out.filter(
            "image_id = 'img000000000000' and tile_x = 0 and tile_y = 0"
        ).first()
        t = datagen.TILE
        yy, xx = np.mgrid[0:t, 0:t]
        z = 100.0 * np.sin(xx / 5.0) + 2.0 * yy
        pad = np.full((t + 2, t + 2), np.nan, dtype=np.float32)
        pad[1:-1, 1:-1] = z.astype(np.float32)
        want = stencil.slope_kernel(pad)
        assert np.allclose(np.asarray(r.px).reshape(t, t), want, atol=1e-3)
    finally:
        spark.sql("DROP TABLE IF EXISTS dem_bucketed")
