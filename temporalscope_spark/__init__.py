"""temporalscope_spark — a PySpark-native point-in-time feature-engineering engine.

A from-scratch reimplementation of the *capabilities* of
philip-ndikum/TemporalScope (reference snapshot at /root/reference) on idiomatic
PySpark: validated temporal tables, leakage-safe target shifting (lag/lead),
sliding-window partitioning into train/test/val slices, padding, gap-based
sessionization, as-of joins / backfill, dataset-quality validation, plus the
large-scale training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB corpus pipeline needs.

Design rules (see SURVEY.md §7):
- DataFrame/SQL only; everything lazy until an action; no RDDs.
- Built-in ``pyspark.sql.functions`` first; Arrow-vectorized pandas UDFs only
  where expressions can't express the semantics; never per-row Python.
- Explicit partitioning policy: ``repartitionByRange`` + salting for skew;
  broadcast for small dimensions; fused multi-aggregate validation jobs.
"""

from temporalscope_spark.frame import TemporalFrame
from temporalscope_spark.exceptions import (
    TemporalFrameError,
    TimeColumnError,
    ModeValidationError,
    DataFrameValidationError,
)

__version__ = "0.1.0"

__all__ = [
    "TemporalFrame",
    "TemporalFrameError",
    "TimeColumnError",
    "ModeValidationError",
    "DataFrameValidationError",
]
