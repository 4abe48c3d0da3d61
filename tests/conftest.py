import pytest


@pytest.fixture(scope="session")
def spark():
    from pyontutils_spark.session import get_spark
    s = get_spark("pyontutils_spark_tests", cores=4, shuffle_partitions=4,
                  driver_memory="4g")
    yield s
    s.stop()
