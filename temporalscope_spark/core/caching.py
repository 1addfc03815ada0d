"""Cache-handle bookkeeping for operators that persist intermediates.

Several operators persist a branch-point table (MEMORY_AND_DISK) because
the returned lazy plan consumes it more than once — e.g. ``ppl_buckets``
persists the scored table that feeds both the quantile aggregate and the
labeling projection. The persisted blocks must outlive the function (the
caller has not materialized the plan yet), so the operator cannot
unpersist before returning. These helpers make that lifetime explicit
and releasable:

  out = hold(result_df, cached_a, cached_b)   # inside the operator
  ...
  release(out)                                # caller, after terminal action

``release`` unpersists every handle attached by ``hold`` (blocking=False);
it is a no-op on DataFrames without handles, so callers can apply it
unconditionally. Long-lived sessions that ignore handles can still fall
back to ``spark.catalog.clearCache()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_ts_cached_handles"


def hold(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach persisted upstream handles to ``out`` so the caller can
    release them once the result has been materialized."""
    held = list(getattr(out, _ATTR, ())) + list(cached)
    setattr(out, _ATTR, held)
    return out


def held_handles(df: DataFrame) -> list[DataFrame]:
    """The persisted upstream DataFrames attached to ``df`` (may be empty)."""
    return list(getattr(df, _ATTR, ()))


def release(df: DataFrame) -> None:
    """Unpersist every cache handle attached to ``df`` (no-op without any).

    Call after the terminal action on ``df``; re-evaluating ``df``
    afterwards recomputes the released intermediates from source.
    """
    for c in getattr(df, _ATTR, ()):
        c.unpersist()
    setattr(df, _ATTR, [])
