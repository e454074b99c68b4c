import pytest

from scalpel_ts_spark.sources.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("scalpel-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
