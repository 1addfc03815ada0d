"""Distribution-drift diagnostics between two temporal slices of a corpus.

Training-data pipelines re-ingest sources continuously; before a new slice
is mixed in, the standard pre-flight is a drift check of its feature
distributions against the reference slice the model/filters were tuned on
(population stability index for binned shift magnitude, two-sample
Kolmogorov–Smirnov for a binning-free supremum test). Both are classical
statistics (PSI: credit-scoring monitoring practice, see e.g. Yurdakul 2018
"Statistical properties of the population stability index"; KS: standard
two-sample test) — the engineering content here is the distributed plan:

* PSI is two aggregations (exact-percentile edges over the reference slice,
  then one fused per-bin count pass) — nothing wider than ``bins`` rows
  ever leaves the executors.
* KS needs a GLOBAL cumulative over the pooled distinct values; a naive
  ``Window.orderBy(v)`` collapses to one task, so the plan reuses the
  quantile-bucket two-phase cumulative (:func:`plans.rownum.with_global_cumsum`)
  — per-bucket parallel scans plus a driver prefix-sum of one partial per
  bucket. No single-partition window at any input size.

Determinism contract: PSI bin edges are quantized to 1e-6 BEFORE the bin
comparison (Spark ``percentile`` and DuckDB ``quantile_cont`` agree
structurally, but an unrounded edge that exactly equals a data value could
flip that value's bin on the last ulp); shares and terms are rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError

_EPS = 1e-6


def _split_flag(df: DataFrame, time_col: str, split) -> F.Column:
    dt = dict((f.name, f.dataType) for f in df.schema.fields)[time_col]
    return F.col(time_col) < F.lit(split).cast(dt)


def psi_drift(
    df: DataFrame,
    value_col: str,
    time_col: str,
    split,
    bins: int = 10,
    approx: bool = False,
) -> DataFrame:
    """Population stability index of ``value_col`` across a time split.

    Rows with ``time_col < split`` form the REFERENCE slice; the rest are
    CURRENT. Bin edges are the reference slice's ``i/bins`` percentiles
    (interior edges only, so the outer bins are open-ended and every value
    lands somewhere); each slice's bin shares are floored at 1e-6 and the
    per-bin term is ``(p - q) * ln(p / q)``. ``PSI = Σ terms`` — the usual
    reading: <0.1 stable, 0.1–0.25 moderate shift, >0.25 action.

    ``approx=False`` (oracle lane): EXACT ``percentile`` edges (executor
    buffers the reference value list — fine to ~10⁸ rows, not the 100 TB
    path). ``approx=True`` (scale lane): ``percentile_approx`` sketch edges
    — constant memory, map-side-combinable; bin boundaries may move within
    the sketch's rank-error sliver, PSI is designed to be robust to exactly
    that.

    Plan shape: one edge aggregate over the reference slice (1 row to the
    driver -> edges as plan literals), then ONE fused conditional-count
    aggregate over the full table keyed by bin, left-joined onto a
    ``sequence``-generated bin spine so empty bins report zero, crossed with
    the 1-row totals. Duplicate edges (heavy ties) skip a bin index; the
    skipped bin is 0/0 on both sides and its term is exactly 0.

    Output: one row per bin —
    ``(bin, lo, hi, n_ref, n_cur, ref_share, cur_share, psi_term, psi_total)``
    with ``lo``/``hi`` the quantized edges (null on the open ends).
    """
    if bins < 2:
        raise DataFrameValidationError("bins must be >= 2")
    if value_col not in df.columns or time_col not in df.columns:
        raise DataFrameValidationError(
            f"psi_drift: missing column {value_col!r} or {time_col!r}"
        )
    is_ref = _split_flag(df, time_col, split)
    pfn = F.percentile_approx if approx else F.percentile
    probs = F.array(*[F.lit(i / bins) for i in range(1, bins)])
    edge_row = (
        df.filter(is_ref & F.col(value_col).isNotNull())
        .agg(pfn(value_col, probs).alias("_e"))
        .collect()[0]["_e"]
    )
    if edge_row is None:
        raise DataFrameValidationError(
            "psi_drift: reference slice (time_col < split) has no non-null values"
        )
    edges = [round(float(e), 6) for e in edge_row]

    earr = F.array(*[F.lit(e) for e in edges])
    v = F.col(value_col).cast("double")
    bin_ix = F.aggregate(
        earr, F.lit(1), lambda acc, e: acc + (v > e).cast("int")
    )
    counts = (
        df.filter(F.col(value_col).isNotNull())
        .select(bin_ix.alias("bin"), is_ref.alias("_ref"))
        .groupBy("bin")
        .agg(
            F.sum(F.col("_ref").cast("long")).alias("n_ref"),
            F.sum((~F.col("_ref")).cast("long")).alias("n_cur"),
        )
    )
    spine = (
        df.sparkSession.range(1)
        .select(F.explode(F.sequence(F.lit(1), F.lit(bins))).alias("bin"))
    )
    lo_map = F.create_map(
        *[F.lit(x) for i, e in enumerate(edges) for x in (i + 2, e)]
    )
    hi_map = F.create_map(
        *[F.lit(x) for i, e in enumerate(edges) for x in (i + 1, e)]
    )
    filled = (
        spine.join(counts, "bin", "left")
        .select(
            "bin",
            F.element_at(lo_map, F.col("bin")).alias("lo"),
            F.element_at(hi_map, F.col("bin")).alias("hi"),
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    totals = filled.agg(
        F.sum("n_ref").cast("double").alias("_tr"),
        F.sum("n_cur").cast("double").alias("_tc"),
    )
    p = F.greatest(F.col("n_ref") / F.col("_tr"), F.lit(_EPS))
    q = F.greatest(F.col("n_cur") / F.col("_tc"), F.lit(_EPS))
    termed = filled.join(F.broadcast(totals)).select(
        "bin",
        "lo",
        "hi",
        "n_ref",
        "n_cur",
        F.round(p, 6).alias("ref_share"),
        F.round(q, 6).alias("cur_share"),
        ((p - q) * F.log(p / q)).alias("_term"),
    )
    total = termed.agg(F.sum("_term").alias("_psi"))
    return termed.join(F.broadcast(total)).select(
        "bin",
        "lo",
        "hi",
        "n_ref",
        "n_cur",
        "ref_share",
        "cur_share",
        F.round("_term", 6).alias("psi_term"),
        F.round("_psi", 6).alias("psi_total"),
    )


def ks_drift(
    df: DataFrame,
    value_col: str,
    time_col: str,
    split,
    num_buckets: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic across a time split.

    ``D = sup_v |F_ref(v) - F_cur(v)|`` evaluated at every pooled distinct
    value (where the supremum of two step ECDFs is attained; ties are
    handled exactly because both ECDFs jump at the shared value).

    Plan shape: one groupBy collapses the corpus to
    ``(value, n_ref, n_cur)`` distinct rows; the global running counts come
    from the quantile-bucket two-phase cumulative
    (:func:`plans.rownum.with_global_cumsum` — per-bucket parallel window
    scans + a driver prefix-sum over one partial row per bucket), then one
    max-aggregate. No single-partition window for any input size; the
    driver holds ``2 × num_buckets`` longs.

    Output: one row ``(ks_stat, n_ref, n_cur)`` (ks rounded to 6).
    """
    if value_col not in df.columns or time_col not in df.columns:
        raise DataFrameValidationError(
            f"ks_drift: missing column {value_col!r} or {time_col!r}"
        )
    from temporalscope_spark.plans.rownum import with_global_cumsum

    is_ref = _split_flag(df, time_col, split)
    per_value = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col).cast("double").alias("v"), is_ref.alias("_ref"))
        .groupBy("v")
        .agg(
            F.sum(F.col("_ref").cast("long")).alias("n_ref"),
            F.sum((~F.col("_ref")).cast("long")).alias("n_cur"),
        )
    )
    per_value = per_value.persist()
    try:
        totals = per_value.agg(
            F.sum("n_ref").cast("double").alias("_tr"),
            F.sum("n_cur").cast("double").alias("_tc"),
        )
        cum = with_global_cumsum(
            per_value, ["v"], ["n_ref", "n_cur"], num_buckets=num_buckets
        )
        out = (
            cum.join(F.broadcast(totals))
            .agg(
                F.round(
                    F.max(
                        F.abs(
                            F.col("n_ref_cum").cast("double") / F.col("_tr")
                            - F.col("n_cur_cum").cast("double") / F.col("_tc")
                        )
                    ),
                    6,
                ).alias("ks_stat"),
                F.max("_tr").cast("long").alias("n_ref"),
                F.max("_tc").cast("long").alias("n_cur"),
            )
        )
        from temporalscope_spark.core.caching import hold

        return hold(out, per_value)
    except Exception:
        per_value.unpersist()
        raise
