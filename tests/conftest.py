"""Shared fixtures: one SparkSession per test session, sf0.001 corpus."""

from __future__ import annotations

import pytest

from graphiti_spark.datagen import ensure_corpus
from graphiti_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="graphiti_spark_tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir() -> str:
    return ensure_corpus(0.001)
