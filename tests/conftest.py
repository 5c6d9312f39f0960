import pytest


@pytest.fixture(scope="session")
def spark():
    from rs_trafilatura_spark.session import get_spark

    s = get_spark(parallelism=8, driver_memory="8g")
    yield s
    s.stop()
