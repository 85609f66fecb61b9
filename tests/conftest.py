import pytest

from omniparser_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="omniparser_spark_tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
