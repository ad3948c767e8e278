import pytest


@pytest.fixture(scope="session")
def spark():
    from deepex_spark.session import build_session

    s = build_session(app_name="deepex-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
