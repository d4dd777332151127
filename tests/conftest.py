import pytest

from go_muse_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        cpus=4, app="go-muse-spark-tests", shuffle_partitions=4, driver_mem="8g"
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    """Driver-provided parquet fixtures (smallest scale factor)."""
    return "/root/testdata/sf0.001"
