"""eoreader_spark — a PySpark-native spatial-join + tiling + raster-kernel engine.

A from-scratch re-expression of the query/data-processing capabilities of
sertit/eoreader (reference at /root/reference, cited per-module by file:line)
as an idiomatic PySpark DataFrame engine over tables of image + caption rows:

- ``codecs``       : deterministic image encode/decode (raw8 / PNG / fake-lossy)
- ``cells``        : integer-math hierarchical spatial cell index (H3 analog)
- ``spatial.pip``  : batched ray-casting point-in-polygon over numpy arrays
- ``datagen``      : seeded synthetic images/scenes/footprints/aoi/tiles tables
- ``operators``    : tile<->AOI assignment, footprint aggs, kNN, collocation,
                     stencils, dedup, similarity search, text analysis
- ``functions``    : spectral-index registry + radiometric scalar kernels
- ``lineage``      : per-partition checkpoint/lineage table + resume anti-join

Everything executes through pyspark.sql DataFrames and vectorized
pandas/Arrow UDFs — no per-row Python, no RDDs.
"""

__version__ = "0.1.0"
