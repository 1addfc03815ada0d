"""Demo dataset loader — source S1.

Reference: DatasetLoader (/root/reference/src/temporalscope/datasets/
datasets.py:47-148) loads the statsmodels ``macrodata`` table (203 quarterly
rows, 1959Q1–2009Q3) and builds a quarterly ``ds`` timestamp column.
statsmodels isn't in this environment, so the loader synthesizes a
deterministic macrodata-SHAPED stand-in (same schema: ``ds`` quarterly
timestamp, ``realgdp`` target, 12 macro columns) — FIXTURES.md F6 — and
equally loads any of the driver-provided parquet tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MACRO_COLUMNS = [
    "realgdp", "realcons", "realinv", "realgovt", "realdpi", "cpi",
    "m1", "tbilrate", "unemp", "pop", "infl", "realint",
]

_VALID = ("macrodata",)


class DatasetLoader:
    """Mirrors the reference API: ``DatasetLoader('macrodata').load_data()``."""

    def __init__(self, dataset_name: str = "macrodata"):
        if dataset_name not in _VALID:
            raise ValueError(
                f"Dataset '{dataset_name}' is not supported. Available datasets: {list(_VALID)}"
            )
        self.dataset_name = dataset_name

    def load_data(self, spark: SparkSession) -> DataFrame:
        return load_macrodata(spark)


def load_macrodata(spark: SparkSession, num_quarters: int = 203) -> DataFrame:
    """Deterministic macrodata-shaped table: quarterly ``ds`` from 1959-01-01
    plus smooth trend+seasonal series per macro column (hash-seeded)."""
    df = spark.range(num_quarters).withColumnRenamed("id", "_q")
    q = F.col("_q")
    ds = F.add_months(F.lit("1959-01-01").cast("date"), (q * 3).cast("int")).cast("timestamp")
    cols = [ds.alias("ds")]
    for i, name in enumerate(MACRO_COLUMNS):
        base = 100.0 * (i + 1)
        trend = q.cast("double") * (0.5 + 0.1 * i)
        season = F.sin(q.cast("double") * (0.7 + 0.05 * i)) * (5.0 + i)
        noise = (F.pmod(F.xxhash64(q, F.lit(name)), F.lit(1000)).cast("double") / 1000.0 - 0.5)
        cols.append((F.lit(base) + trend + season + noise).alias(name))
    return df.select(*cols)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet table loader for the driver-provided star schema."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
