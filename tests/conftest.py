import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "spark: needs a JVM SparkSession (auto-applied to every test that "
        'uses the session-scoped spark fixture); `-m "not spark"` is the '
        "fast no-JVM lane (codec/varint/golden/projector/BPE kernels)",
    )


def pytest_collection_modifyitems(config, items):
    # exact by construction: no test builds its own session (grep-pinned
    # by test_no_jvm_lane_is_exact below), so fixture usage IS JVM usage
    for item in items:
        if "spark" in getattr(item, "fixturenames", ()):
            item.add_marker(pytest.mark.spark)


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("compress-otel-collector-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
