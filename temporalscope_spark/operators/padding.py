"""Padding operators — W5.

Reference: mean_fill_pad (/root/reference/src/temporalscope/partition/
single_target/padding/functional.py:90-198). Contract reproduced:
  * any null/NaN anywhere → ValueError "Cannot process data containing null
    values" (:121-123);
  * padding ∉ {pre, post} → "padding must be 'pre' or 'post'" (:127);
  * target_len <= current_len → "target_len ({t}) must be greater than
    current length ({c})" (:143-144);
  * appends/prepends ``target_len - current_len`` rows of per-column means;
    pre/post row order is reified through an explicit ``_order`` rank column
    (Spark rows are unordered — SURVEY.md §7 risk note).

Scale fixes vs the reference: its one-aggregation-pass-per-column mean loop
(:147-158) fuses into a single ``agg``; the null gate shares that same job.

Per-entity variants for the canonical table:
  * :func:`pad_token_arrays` — pad each row's ``tokens`` to fixed length with
    a pad id (pure expressions: ``array_repeat`` + ``concat``, zero Python);
  * :func:`pad_groups_mean_fill` — bring every entity's row count up to
    ``target_len`` with mean rows, expression-only (no applyInPandas): a
    per-entity deficit join × ``sequence`` explode builds the pad rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _null_or_nan(f: T.StructField) -> F.Column:
    c = F.col(f.name)
    if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
        return c.isNull() | F.isnan(c)
    return c.isNull()


def mean_fill_pad(
    df: DataFrame,
    target_len: int,
    padding: str = "post",
    order_col: str = "_order",
) -> DataFrame:
    """Global-frame parity op: pad to ``target_len`` rows with column means.

    Returns the padded frame with an ``order_col`` (0-based) reifying the
    reference's row order (pad rows before the data for 'pre', after for
    'post'). All validation + means = ONE Spark job.
    """
    if padding not in {"pre", "post"}:
        raise ValueError("padding must be 'pre' or 'post'")

    fields = df.schema.fields
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    for f in fields:
        aggs.append(F.sum(_null_or_nan(f).cast("long")).alias(f"_nulls_{f.name}"))
        aggs.append(F.avg(F.col(f.name).cast("double")).alias(f"_mean_{f.name}"))
    stats = df.agg(*aggs).collect()[0]

    if any(stats[f"_nulls_{f.name}"] for f in fields):
        raise ValueError("Cannot process data containing null values")
    current_len = stats["_cnt"]
    if target_len <= current_len:
        raise ValueError(
            f"target_len ({target_len}) must be greater than current length ({current_len})"
        )

    pad_count = target_len - current_len
    spark = df.sparkSession
    # means come back as doubles; cast each to the source column type
    mean_cols = [
        F.lit(stats[f"_mean_{f.name}"]).cast(f.dataType).alias(f.name) for f in fields
    ]
    pad_df = spark.range(pad_count).select(*mean_cols, F.col("id").alias("_k"))

    if padding == "pre":
        pad = pad_df.select(*[f.name for f in fields], F.col("_k").alias(order_col))
        data = df.select("*", (F.monotonically_increasing_id() + 0).alias("_m"))
        # stable data order after the pad block
        from pyspark.sql.window import Window

        data = data.withColumn(
            order_col, F.row_number().over(Window.orderBy("_m")) - 1 + F.lit(pad_count)
        ).drop("_m")
        return pad.unionByName(data)
    else:
        from pyspark.sql.window import Window

        data = df.select("*", F.monotonically_increasing_id().alias("_m"))
        data = data.withColumn(order_col, F.row_number().over(Window.orderBy("_m")) - 1).drop("_m")
        pad = pad_df.select(
            *[f.name for f in fields], (F.col("_k") + F.lit(current_len)).alias(order_col)
        )
        return data.unionByName(pad)


def pad_token_arrays(
    df: DataFrame,
    target_len: int,
    tokens_col: str = "tokens",
    n_tok_col: str | None = "n_tok",
    pad_id: int = 0,
    truncate: bool = True,
) -> DataFrame:
    """Pad (and optionally truncate) each row's token array to ``target_len``.

    Pure JVM expressions — ``concat(tokens, array_repeat(pad_id, deficit))``
    then ``slice`` — whole-stage-codegen friendly, no shuffle, no Python.
    """
    c = F.col(tokens_col)
    deficit = F.greatest(F.lit(0), F.lit(target_len) - F.size(c))
    padded = F.concat(c, F.array_repeat(F.lit(pad_id).cast("int"), deficit))
    if truncate:
        padded = F.slice(padded, 1, target_len)
    out = df.withColumn(tokens_col, padded)
    if n_tok_col and n_tok_col in df.columns:
        out = out.withColumn(n_tok_col, F.size(F.col(tokens_col)).cast("int"))
    return out


def pad_groups_mean_fill(
    df: DataFrame,
    id_col: str,
    target_len: int,
    numeric_cols: list[str] | None = None,
) -> DataFrame:
    """Per-entity mean-fill: every entity ends with exactly ``target_len`` rows
    (entities already at/over target are left untouched).

    Expression-only distributed plan: one groupBy computes per-entity count +
    means; ``sequence(1, deficit)`` exploded builds the pad rows; unionByName
    appends them. No applyInPandas, no driver loop — scales with entities.
    """
    if numeric_cols is None:
        numeric_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.NumericType) and f.name != id_col
        ]
    aggs = [F.count(F.lit(1)).alias("_cnt")] + [
        F.avg(c).alias(f"_mean_{c}") for c in numeric_cols
    ]
    stats = df.groupBy(id_col).agg(*aggs)
    deficits = stats.filter(F.col("_cnt") < target_len).withColumn(
        "_deficit", (F.lit(target_len) - F.col("_cnt")).cast("int")
    )
    pad = deficits.select(
        id_col,
        F.explode(F.sequence(F.lit(1), F.col("_deficit"))).alias("_pad_i"),
        *[F.col(f"_mean_{c}").alias(c) for c in numeric_cols],
    ).drop("_pad_i")
    # align schemas: pad rows carry nulls for any non-numeric extra columns
    for f in df.schema.fields:
        if f.name not in pad.columns:
            pad = pad.withColumn(f.name, F.lit(None).cast(f.dataType))
    for c in numeric_cols:
        dt = dict((f.name, f.dataType) for f in df.schema.fields)[c]
        pad = pad.withColumn(c, F.col(c).cast(dt))
    return df.unionByName(pad.select(df.columns))
