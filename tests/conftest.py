from __future__ import annotations

import pytest

from eoreader_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("eoreader_spark_tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def synth(spark, tmp_path_factory):
    """Small synthetic table set (60 images), materialized once."""
    from eoreader_spark import datagen

    out = str(tmp_path_factory.mktemp("synth"))
    datagen.write_all(spark, out, n_images=60)
    return out
