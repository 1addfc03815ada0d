"""TemporalFrame — the validated temporal table abstraction.

Spark-native analogue of the reference's ``TimeFrame``
(/root/reference/src/temporalscope/core/temporal_data_loader.py:88-861): one
DataFrame + (time_col, target_col, optional id_col, mode, sort order,
metadata bag). Construction validates schema statically, optionally converts
the time column, optionally asserts strict temporal ordering, and records the
canonical sort — but stays LAZY: unlike the reference's ~6 eager passes per
construction, at most one Spark job runs (the optional ordering gate), and
the sort itself is a plan node, not a materialization.

Scale policy: ``ensure_layout()`` applies the physical layout the north rule
mandates — hash-cluster by entity (satisfies every per-entity window's
required distribution; range partitioning would not, since an entity can
straddle a range boundary) + ``sortWithinPartitions(id, time)``, with a
``strategy='range'`` variant (``repartitionByRange``) for time-pruned scans
and ordered writes. Skewed entities go through the chunk-salted operators
(``operators.shift.shift_target_chunked``) instead of a bigger partition.
"""

from __future__ import annotations

import warnings
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

from temporalscope_spark.core import convert, validation
from temporalscope_spark.exceptions import ModeValidationError, TargetColumnWarning

MODE_SINGLE_TARGET = "single_target"
MODE_MULTI_TARGET = "multi_target"
VALID_MODES = (MODE_SINGLE_TARGET, MODE_MULTI_TARGET)


class TemporalFrame:
    """A validated (df, time_col, target_col[, id_col]) bundle.

    Parameters mirror the reference TimeFrame (temporal_data_loader.py:125-261):
    ``ascending`` controls the canonical time sort; ``sort`` applies it;
    ``time_col_conversion`` ∈ {None, 'numeric', 'datetime'};
    ``enforce_temporal_uniqueness`` runs the strict-ordering gate (V5);
    ``verbose`` prints progress.
    """

    def __init__(
        self,
        df: DataFrame,
        time_col: str,
        target_col: str,
        id_col: str | None = None,
        mode: str = MODE_SINGLE_TARGET,
        ascending: bool = True,
        sort: bool = True,
        time_col_conversion: str | None = None,
        enforce_temporal_uniqueness: bool = False,
        exempt_cols: tuple[str, ...] = (),
        metadata: dict[str, Any] | None = None,
    ):
        if not isinstance(time_col, str) or not time_col:
            raise TypeError("`time_col` must be a non-empty string")
        if not isinstance(target_col, str) or not target_col:
            raise TypeError("`target_col` must be a non-empty string")
        if id_col is not None and not isinstance(id_col, str):
            raise TypeError("`id_col` must be a string or None")
        if mode not in VALID_MODES:
            raise ModeValidationError(mode)
        if time_col_conversion not in (None, "numeric", "datetime"):
            raise ValueError(
                "`time_col_conversion` must be one of None, 'numeric', 'datetime'"
            )

        if validation.is_dataframe_empty(df):
            raise ValueError("DataFrame cannot be empty")

        exempt = tuple(exempt_cols) + ((id_col,) if id_col else ())
        validation.validate_dataframe_schema(df, time_col, target_col, exempt_cols=exempt)

        # reference warning contract (exceptions.py:51-70, probed in
        # test_exceptions.py:78-91): an array-valued target "appears to
        # contain sequential data" and may need transformation for the
        # selected mode — static schema probe, no data scan
        target_type = next(f.dataType for f in df.schema.fields if f.name == target_col)
        if isinstance(target_type, ArrayType):
            warnings.warn(
                "`target_col` appears to contain sequential data. Ensure it is "
                f"transformed appropriately for {mode} mode.",
                TargetColumnWarning,
                stacklevel=2,
            )

        df = convert.convert_time_column(df, time_col, time_col_conversion)

        if enforce_temporal_uniqueness:
            validation.check_temporal_ordering(df, time_col, id_col=id_col)

        self._time_col = time_col
        self._target_col = target_col
        self._id_col = id_col
        self._mode = mode
        self._ascending = ascending
        self._exempt_cols = exempt
        self._metadata: dict[str, Any] = dict(metadata or {})

        if sort:
            df = self.sort_time(df, ascending)
        self._df = df

    # -- accessors (reference API: tf.df / tf.time_col / ...) ---------------
    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def time_col(self) -> str:
        return self._time_col

    @property
    def target_col(self) -> str:
        return self._target_col

    @property
    def id_col(self) -> str | None:
        return self._id_col

    @property
    def mode(self) -> str:
        return self._mode

    @property
    def ascending(self) -> bool:
        return self._ascending

    @property
    def metadata(self) -> dict[str, Any]:
        """Free-form metadata bag (temporal_data_loader.py:821-861)."""
        return self._metadata

    # -- operations ----------------------------------------------------------
    def sort_time(self, df: DataFrame | None = None, ascending: bool | None = None) -> DataFrame:
        """Canonical sort by ([id_col,] time_col) (core_utils.py:1210-1265).

        Lazy plan node. For per-entity downstream windows prefer
        :meth:`ensure_layout`, which avoids a global sort entirely.
        """
        df = df if df is not None else self._df
        ascending = self._ascending if ascending is None else ascending
        keys = [self._id_col, self._time_col] if self._id_col else [self._time_col]
        cols = [F.col(k).asc() if ascending else F.col(k).desc() for k in keys]
        return df.orderBy(*cols)

    def ensure_layout(
        self,
        num_partitions: int | None = None,
        strategy: str = "entity",
        detect_skew: bool = False,
        skew_threshold: float = 0.01,
        chunk_col: str = "time_chunk",
    ) -> "TemporalFrame":
        """Apply the scale-out physical layout.

        ``strategy='entity'`` (default when ``id_col`` is set): HASH-cluster
        by entity + sort within partitions by (id, time). Hash partitioning
        satisfies ``Window.partitionBy(id)``'s required distribution and the
        written sort satisfies its ordering, so every per-entity window op
        (shift, sessionize, as-of) runs with NO further exchange and no
        re-sort. Range partitioning would NOT give this: an entity's rows can
        straddle a range boundary, so Spark re-shuffles anyway.

        ``strategy='range'``: ``repartitionByRange(id?, time)`` — the layout
        for time-pruned scans and ordered writes (file-level min/max on the
        time column), not for window execution.

        ``detect_skew=True`` (entity strategy only; VERDICT r3 #7) runs the
        :func:`~temporalscope_spark.operators.corpus_stats.skew_profile`
        pre-flight (two tiny aggregate jobs — the top entity's row fraction
        and the corpus time span). If the hottest entity holds more than
        ``skew_threshold`` of the table, the layout is SALTED: a
        ``chunk_col`` time-chunk id is derived so the hot entity splits into
        ``S = max(2, ceil(top_fraction · parallelism))`` time-contiguous
        chunks (each at most ~1/parallelism of the table — no straggler
        task), and clustering/sorting switch to (id, chunk, time). The salt
        factor comes from the MEASUREMENT, not a constant. The resulting
        frame records :attr:`chunk_col`; per-entity window ops must then go
        through their chunked lanes (``shift_target_chunked``,
        ``ewma_segmented``) which repair chunk boundaries exactly. Without
        measured skew the plain entity layout applies and ``chunk_col``
        stays ``None``.

        Returns a new TemporalFrame sharing config.
        """
        keys = [self._id_col, self._time_col] if self._id_col else [self._time_col]
        df = self._df
        salted = False
        if detect_skew and strategy == "entity" and self._id_col:
            import math as _math

            from temporalscope_spark.operators.corpus_stats import skew_profile
            from temporalscope_spark.operators.shift import with_time_chunk

            prof = skew_profile(df, self._id_col, k=1).collect()
            top_frac = float(prof[0]["fraction"]) if prof else 0.0
            if top_frac > skew_threshold:
                par = num_partitions or df.sparkSession.sparkContext.defaultParallelism
                s_factor = max(2, int(_math.ceil(top_frac * par)))
                dt = dict((f.name, f.dataType) for f in df.schema.fields)[
                    self._time_col
                ]
                ep = convert.epoch_seconds(F.col(self._time_col), dt)
                span = df.agg(
                    F.min(ep).alias("_lo"), F.max(ep).alias("_hi")
                ).first()
                span_s = float(span["_hi"]) - float(span["_lo"])
                chunk_seconds = max(1, int(_math.ceil(span_s / s_factor)) or 1)
                df = with_time_chunk(df, self._time_col, chunk_seconds, chunk_col)
                keys = [self._id_col, chunk_col, self._time_col]
                salted = True
        if strategy == "entity" and self._id_col:
            part_keys = [self._id_col, chunk_col] if salted else [self._id_col]
            if num_partitions:
                df = df.repartition(num_partitions, *part_keys)
            else:
                df = df.repartition(*part_keys)
        elif num_partitions:
            df = df.repartitionByRange(num_partitions, *keys)
        else:
            df = df.repartitionByRange(*keys)
        df = df.sortWithinPartitions(*keys)
        new = self._with_df(df)
        new.__dict__["_chunk_col"] = chunk_col if salted else None
        return new

    @property
    def chunk_col(self) -> str | None:
        """The salt chunk column chosen by a skew-aware :meth:`ensure_layout`
        (None when the layout is unsalted)."""
        return self.__dict__.get("_chunk_col")

    def update_dataframe(self, df: DataFrame) -> None:
        """Replace the underlying df, revalidating schema only (cheap/static).

        Reference parity: temporal_data_loader.py update_dataframe re-runs
        validation; ours re-checks the schema with the SAME exemptions the
        frame was constructed with (id_col + exempt_cols), so an update with
        the same shape as the original always passes. Empty frames are
        rejected like at construction.
        """
        if validation.is_dataframe_empty(df):
            raise ValueError("DataFrame cannot be empty")
        validation.validate_dataframe_schema(
            df, self._time_col, self._target_col, exempt_cols=self._exempt_cols
        )
        self._df = df

    def _with_df(self, df: DataFrame) -> "TemporalFrame":
        new = object.__new__(TemporalFrame)
        new.__dict__ = {**self.__dict__, "_df": df}
        return new
