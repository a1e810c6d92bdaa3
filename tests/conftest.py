import pytest

from neleval_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="neleval_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        driver_memory="4g",
    )
    yield s
