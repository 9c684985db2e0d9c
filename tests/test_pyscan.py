import numpy as np

from eoreader_spark import datagen
from eoreader_spark.functions import indices
from eoreader_spark.sources import pyscan

N = 24


def test_pyscan_matches_arrow_bridge_path(spark, tmp_path):
    """The data-local scan must produce exactly the same stats as the
    Arrow-bridge index_stats (same kernels, different transport)."""
    out = str(tmp_path / "images.parquet")
    images = datagen.gen_images(spark, N)
    images.write.mode("overwrite").parquet(out)

    names = ["NDVI", "NDWI"]
    via_scan = {
        (r.image_id, r.index_name): (r["mean"], r["min"], r["max"])
        for r in pyscan.index_stats_scan(spark, out, names).collect()
    }
    via_bridge = {
        (r.image_id, r.index_name): (r["mean"], r["min"], r["max"])
        for r in indices.index_stats(spark.read.parquet(out), names).collect()
    }
    assert via_scan.keys() == via_bridge.keys()
    assert len(via_scan) == N * len(names)
    for k in via_scan:
        assert np.allclose(via_scan[k], via_bridge[k], rtol=0, atol=0), k


def test_parquet_splits_row_groups(spark, tmp_path):
    out = str(tmp_path / "t.parquet")
    spark.range(1000).repartition(4).write.mode("overwrite").parquet(out)
    splits = pyscan.parquet_splits(out)
    assert len(splits) >= 4
    total = 0
    import pyarrow.parquet as pq

    for f, rg0, rg1 in splits:
        total += sum(
            pq.ParquetFile(f).metadata.row_group(i).num_rows for i in range(rg0, rg1)
        )
    assert total == 1000
