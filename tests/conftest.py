import pytest

from denrl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cpus=8, app_name="denrl_tests", shuffle_partitions=8)
    yield s
