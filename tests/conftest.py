import pytest

from sparksearch.session import get_spark
from sparksearch.fixtures import mock_items, mock_items_index_schema
from sparksearch.index import build_index


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sparksearch-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def mock_index(spark):
    docs = mock_items(spark).cache()
    return build_index(docs, mock_items_index_schema())
