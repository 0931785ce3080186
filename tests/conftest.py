from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mkgmap_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="mkgmap_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def fixture_dir(tmp_path_factory):
    from mkgmap_spark.fixtures import write_fixture_tables

    d = tmp_path_factory.mktemp("fixtures")
    write_fixture_tables(str(d), n_docs=2000, seed=42)
    return str(d)


@pytest.fixture(scope="session")
def documents_df(spark, fixture_dir):
    return spark.read.parquet(os.path.join(fixture_dir, "documents_spans.parquet"))
