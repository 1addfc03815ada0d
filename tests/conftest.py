"""Shared Spark fixture for the test suite.

Session-scoped local[4] with small shuffle partitioning for speed; mirrors the
reference's backend-parametrized fixtures by instead exercising multiple
input partition counts inside individual tests (SURVEY.md §5).
"""

from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")

from temporalscope_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="temporalscope-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return TESTDATA


def make_ts_df(spark, n=10, k=2, time_numeric=True, seed=100, id_col=False, n_ids=1):
    """Deterministic analogue of the reference's generate_synthetic_time_series
    (synthetic_data_generator.py:164-289): `time`, `target`, `feature_1..k`.
    """
    from temporalscope_spark.datasets.synthetic import generate_synthetic_time_series

    return generate_synthetic_time_series(
        spark,
        num_samples=n,
        num_features=k,
        time_col_numeric=time_numeric,
        random_seed=seed,
        num_ids=n_ids if id_col else 0,
    )
