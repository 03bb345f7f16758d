import pytest

from gdp_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def rows(df, *cols):
    """Collect to a sorted list of tuples (order-insensitive compare)."""
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())
