import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from delta_rs_spark.session import get_spark

    s = get_spark("tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture
def tmp_table(tmp_path):
    return str(tmp_path / "table")


@pytest.fixture
def sample_df(spark):
    """5-row business table (FIXTURES.md §1.2 / reference conftest.py:305-323)."""
    return spark.createDataFrame(
        [
            ("1", 0, 0, False),
            ("2", 1, 1, False),
            ("3", 2, 2, False),
            ("4", 3, 3, False),
            ("5", 4, 4, False),
        ],
        "id string, price long, sold int, deleted boolean",
    )


@pytest.fixture(scope="session")
def lineitem(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
