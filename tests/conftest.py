import pytest

from riko_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="riko_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def rows(df):
    """Row dicts, order-preserving."""
    return [r.asDict(recursive=True) for r in df.collect()]


def bag(df):
    """Order-insensitive multiset of row tuples."""
    return sorted(tuple(sorted(r.asDict().items())) for r in df.collect())
