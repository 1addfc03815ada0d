"""SlidingWindowPartitioner — operator W3/W4, the engine's core.

Reference spec (fully commented-out in the snapshot — specification recovered
from docstrings): /root/reference/src/temporalscope/partition/single_target/
static/sliding_window.py:193-470 and partition/base_protocol.py:88-180.

Semantics reproduced exactly:
  * ``setup``: validate percentages (fill-in + 1e-6 sum check), derive
    ``window_size``/``num_partitions`` (utils math, partition_utils.py),
    cardinality gates, default ``stride = window_size``;
  * ``fit``: positional windows ``[i, i+window_size)`` for
    ``i in range(0, total_rows - window_size + 1, stride)`` over the
    time-sorted row order; per-window ``(start_time, end_time)`` = time
    values at the window's first/last row; the window's TIME RANGE splits
    linearly: train ``[s, s + (e-s)·train_pct)``, test ``[that, e)``, val
    ``[e, e + (e-s)·val_pct)`` (sliding_window.py:384-395);
  * ``transform``: lazily yields ``{train, test, validation}`` half-open
    range-filtered frames (:429-445); ``partitions`` property materializes
    the list (:447-470);
  * fit-before-transform protocol errors preserved.

Spark-first physics (NOT in the reference):
  * ``fit`` never collects the time column — it pulls only the ~2·P boundary
    order statistics via the two-pass range-partition row-number plan
    (plans/rownum.py), then persists a tiny bounds manifest (driver-side +
    optional checkpoint store, see checkpoint.py);
  * ``transform`` filters are pure range predicates on the time column —
    partition-prunable when the table is stored partitioned/sorted by time;
  * ``with_bucket_labels`` emits ALL buckets+splits in ONE pass (bucket id
    from the row number, split label from the time ranges) for bulk
    materialization — P range filters would re-scan the table P times.
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.frame import TemporalFrame
from temporalscope_spark.operators import partition_utils as pu
from temporalscope_spark.plans.rownum import order_statistics

_EPOCH = _dt.datetime(1970, 1, 1)


def _to_num(v):
    """Time value → float for linear range math (timestamps → epoch seconds)."""
    if isinstance(v, _dt.datetime):
        return (v - _EPOCH.replace(tzinfo=v.tzinfo)).total_seconds()
    if isinstance(v, _dt.date):
        return (_dt.datetime(v.year, v.month, v.day) - _EPOCH).total_seconds()
    return float(v)


def _from_num(x, like):
    """Inverse of _to_num, matching the type of ``like``."""
    if isinstance(like, _dt.datetime):
        out = _EPOCH + _dt.timedelta(seconds=x)
        return out.replace(tzinfo=like.tzinfo) if like.tzinfo else out
    if isinstance(like, _dt.date):
        return _EPOCH + _dt.timedelta(seconds=x)
    if isinstance(like, int) and float(x).is_integer():
        return x  # keep float semantics of the reference's numpy arithmetic
    return x


class SlidingWindowPartitioner:
    """Partition a TemporalFrame into sliding train/test/val windows.

    Lifecycle (base_protocol.py): ``setup()`` → ``fit()`` → ``transform()``
    (lazy iterator) or ``fit_transform()``; ``partitions`` caches the list.
    """

    def __init__(
        self,
        tf: TemporalFrame,
        num_partitions: Optional[int] = None,
        window_size: Optional[int] = None,
        stride: Optional[int] = None,
        train_pct: float = 0.7,
        test_pct: Optional[float] = None,
        val_pct: Optional[float] = None,
        truncate: bool = True,
        precision: float = 1e-6,
        verbose: bool = False,
    ):
        self.tf = tf
        self.num_partitions = num_partitions
        self.window_size = window_size
        self.stride = stride
        self.train_pct = train_pct
        self.test_pct = test_pct
        self.val_pct = val_pct
        self.truncate = truncate
        self.precision = precision
        self.verbose = verbose
        self.metadata: Optional[dict] = None
        self.partition_scheme: Optional[str] = None
        self._total_rows: Optional[int] = None

    # ------------------------------------------------------------------ setup
    def setup(self, total_rows: Optional[int] = None) -> None:
        """Validate config against the dataset; derive scheme/stride."""
        self.train_pct, self.test_pct, self.val_pct = pu.validate_percentages(
            self.train_pct, self.test_pct, self.val_pct, self.precision
        )
        if total_rows is None:
            total_rows = self.tf.df.count()
        self._total_rows = total_rows
        self.partition_scheme, self.num_partitions, self.window_size = (
            pu.determine_partition_scheme(
                self.num_partitions, self.window_size, total_rows, self.stride
            )
        )
        pu.validate_cardinality(self.num_partitions, self.window_size, total_rows)
        self.stride = self.stride or self.window_size
        if self.stride <= 0:
            raise ValueError("`stride` must be a positive integer.")
        if self.verbose:
            pu.print_config(
                {
                    "total_rows": total_rows,
                    "num_partitions": self.num_partitions,
                    "window_size": self.window_size,
                    "stride": self.stride,
                    "train_pct": self.train_pct,
                    "test_pct": self.test_pct,
                    "val_pct": self.val_pct,
                }
            )
        self.metadata = None

    # -------------------------------------------------------------------- fit
    def fit(self, df: Optional[DataFrame] = None) -> "SlidingWindowPartitioner":
        """Compute per-window time bounds; store as the bounds manifest.

        Only the boundary order statistics (2 per window) leave the cluster.
        """
        df = df if df is not None else self.tf.df
        if self.metadata is None and self._total_rows is None:
            self.setup()
        if self.window_size is None:
            self.setup()
        total_rows = self._total_rows
        window_size, stride = self.window_size, self.stride or self.window_size
        if total_rows < window_size:
            raise ValueError(
                f"Total rows ({total_rows}) are insufficient for the requested partitions."
            )

        time_col = self.tf.time_col
        starts = list(range(0, total_rows - window_size + 1, stride))
        positions = sorted({i + 1 for i in starts} | {i + window_size for i in starts})
        stats = order_statistics(df, [time_col], positions)

        partitions = []
        for i in starts:
            s_val = stats[i + 1][0]
            e_val = stats[i + window_size][0]
            s, e = _to_num(s_val), _to_num(e_val)
            span = e - s
            train_hi = s + span * self.train_pct
            entry = {
                "train": (s_val, _from_num(train_hi, s_val)),
                "test": (_from_num(train_hi, s_val), e_val),
                "validation": None
                if not self.val_pct
                else (e_val, _from_num(e + span * self.val_pct, e_val)),
            }
            partitions.append(entry)

        self.metadata = {
            "partitions": partitions,
            "window_size": window_size,
            "stride": stride,
            "total_rows": total_rows,
        }
        if self.verbose:
            print(
                f"Fit complete with {len(partitions)} partitions, "
                f"window size {window_size}, stride {stride}."
            )
        return self

    # -------------------------------------------------------------- transform
    def transform(
        self, df: Optional[DataFrame] = None
    ) -> Iterator[dict[str, Optional[DataFrame]]]:
        """Lazily yield {train, test, validation} range-filtered frames.

        Each filter is a half-open time-range predicate ``[lo, hi)`` —
        partition-prunable and pushdown-eligible at the scan.
        """
        if self.metadata is None:
            raise RuntimeError("Call `fit` before `transform`.")
        df = df if df is not None else self.tf.df
        t = F.col(self.tf.time_col)
        for part in self.metadata["partitions"]:
            out: dict[str, Optional[DataFrame]] = {}
            for split in ("train", "test"):
                lo, hi = part[split]
                out[split] = df.filter((t >= F.lit(lo)) & (t < F.lit(hi)))
            if part["validation"] is None:
                out["validation"] = None
            else:
                lo, hi = part["validation"]
                out["validation"] = df.filter((t >= F.lit(lo)) & (t < F.lit(hi)))
            yield out

    def fit_transform(
        self, df: Optional[DataFrame] = None
    ) -> Iterator[dict[str, Optional[DataFrame]]]:
        self.fit(df)
        return self.transform(df)

    @property
    def partitions(self) -> list[dict[str, Optional[DataFrame]]]:
        if self.metadata is None:
            raise RuntimeError("Call `fit` before accessing `partitions`.")
        return list(self.transform(self.tf.df))

    # ------------------------------------------------------------- bulk path
    def with_bucket_labels(self, df: Optional[DataFrame] = None) -> DataFrame:
        """ONE-pass alternative to P range filters: emit every row tagged with
        ``bucket`` (window index) and ``split`` ∈ {train, test, validation}.

        Non-overlapping case (stride == window_size) only — each row belongs
        to at most one window, so bucket = (rn-1) // stride. Overlapping
        windows duplicate rows by construction; use :meth:`transform` there.
        """
        if self.metadata is None:
            raise RuntimeError("Call `fit` before `with_bucket_labels`.")
        if self.metadata["stride"] != self.metadata["window_size"]:
            raise ValueError("with_bucket_labels requires stride == window_size")
        df = df if df is not None else self.tf.df
        time_col = self.tf.time_col
        n_buckets = len(self.metadata["partitions"])

        # Bucket membership from the FITTED window-end time values — fit
        # already paid for the boundary order statistics, so labeling needs
        # no second global row numbering (no quantile probe, no count pass,
        # no window shuffle): bucket = #window-ends strictly below t, a
        # narrow map against a tiny literal array. Identical to positional
        # bucketing whenever boundary time values are unique (the V5
        # temporal-uniqueness gate guarantees it), and consistent with
        # ``transform``'s value-range semantics by construction.
        from temporalscope_spark.plans.rownum import _numeric_order_expr

        ends = [ _to_num(part["test"][1]) for part in self.metadata["partitions"] ]
        t_num = _numeric_order_expr(df, time_col)
        ends_arr = F.array(*[F.lit(float(x)) for x in ends])
        bucket = F.aggregate(
            ends_arr, F.lit(0), lambda acc, e: acc + (t_num > e).cast("int")
        )
        out = df.withColumn("bucket", bucket).filter(F.col("bucket") < n_buckets)

        # split label from the fitted time ranges, via a broadcast bounds table
        rows = []
        for b, part in enumerate(self.metadata["partitions"]):
            rows.append(
                (
                    b,
                    part["train"][0],
                    part["train"][1],
                    part["test"][1],
                    part["validation"][1] if part["validation"] else None,
                )
            )
        spark = out.sparkSession
        from pyspark.sql import types as T

        t_type = dict((f.name, f.dataType) for f in df.schema.fields)[time_col]
        # linear-split boundaries may be fractional even for integer time cols
        b_type = t_type if isinstance(t_type, (T.TimestampType, T.TimestampNTZType, T.DateType)) else T.DoubleType()
        schema = T.StructType(
            [T.StructField("bucket", T.IntegerType())]
            + [T.StructField(n, b_type, True) for n in ("_lo", "_train_hi", "_test_hi", "_val_hi")]
        )
        bounds = spark.createDataFrame(rows, schema)
        t = F.col(time_col)
        out = out.join(F.broadcast(bounds), "bucket")
        split = (
            F.when((t >= F.col("_lo")) & (t < F.col("_train_hi")), F.lit("train"))
            .when((t >= F.col("_train_hi")) & (t < F.col("_test_hi")), F.lit("test"))
            .when(
                F.col("_val_hi").isNotNull()
                & (t >= F.col("_test_hi"))
                & (t < F.col("_val_hi")),
                F.lit("validation"),
            )
            .otherwise(F.lit(None))
        )
        return (
            out.withColumn("split", split)
            .filter(F.col("split").isNotNull())
            .drop("_lo", "_train_hi", "_test_hi", "_val_hi")
        )
