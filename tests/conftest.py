from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from semantic_entity_matching_spark.session import get_session  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_session(
        master="local[4]",
        app_name="sem-spark-tests",
        shuffle_partitions=4,
    )
    yield spark
    spark.stop()
