from __future__ import annotations

import os

import pytest

from eoreader_spark.session import get_spark


def pytest_configure(config):
    # `-m property` (the nightly lane) runs the Hypothesis sweeps at full
    # example counts; the default gate runs them at reduced counts.  Must
    # happen before test modules import (@settings evaluates at import).
    if "property" in (config.getoption("-m") or ""):
        os.environ.setdefault("EOREADER_PROPERTY_FULL", "1")


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
