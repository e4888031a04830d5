"""Shared fixtures: one local SparkSession per test session, plus the pinned
golden table/oracle (FIXTURES.md: N=2000, seed=1337) computed once."""

from __future__ import annotations

import pytest

from dedup_spark.config import DEFAULT_CONFIG
from dedup_spark.oracle_ref import compute_golden
from dedup_spark.sources.gen_images import DEFAULT_SEED, gen_local

GOLDEN_N = 2000


@pytest.fixture(scope="session")
def spark():
    from dedup_spark.session import get_spark

    s = get_spark(app="dedup_spark_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def golden_table():
    return gen_local(GOLDEN_N, DEFAULT_SEED)


@pytest.fixture(scope="session")
def golden(golden_table):
    return compute_golden(golden_table, DEFAULT_CONFIG)


@pytest.fixture(scope="session")
def pipeline_outputs(spark, tmp_path_factory):
    """Run the full pipeline once on the golden table; yield the store root."""
    from dedup_spark.plans.pipeline import run_pipeline
    from dedup_spark.sources.gen_images import gen_images

    root = str(tmp_path_factory.mktemp("store"))
    images = gen_images(spark, GOLDEN_N, DEFAULT_SEED)
    run = run_pipeline(spark, images, root, run_id="golden")
    return root, run
