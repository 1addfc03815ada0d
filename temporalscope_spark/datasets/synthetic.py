"""Deterministic synthetic data generators — sources S2 + the F3 canonical table.

Reference: generate_synthetic_time_series
(/root/reference/src/temporalscope/datasets/synthetic_data_generator.py:164-289):
`time` (datetime daily from 2023-01-01, or float arange), `target` +
`feature_i` ~ U(0,1), optional null/NaN injection into feature columns only
(nulls take precedence; at least one affected row when enabled; :46-123).

Spark-first: NO driver-side materialization — ``spark.range(n)`` plus
hash-derived uniforms (xxhash64 → [0,1)), fully deterministic in the seed and
row index regardless of partitioning (unlike ``F.rand(seed)``, whose stream
depends on partition layout). Scales to any n as a parallel relation.

Also generates the engine's canonical tokenized-sequence table
(BASELINE.json input_hint / FIXTURES.md F3): (doc_id string, event_time
timestamp, seq_idx int, tokens array<int32>, n_tok int, source string) with a
deliberately skewed head entity to exercise salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_SEED = 100  # reference synthetic_data_generator.py:43
TOKEN_VOCAB = 50257


def _u01(seed: int, tag: str, *cols) -> F.Column:
    """Deterministic uniform in [0,1) from xxhash64 of (seed, tag, cols)."""
    h = F.xxhash64(F.lit(seed), F.lit(tag), *cols)
    return (F.pmod(h, F.lit(2**52)).cast("double") / F.lit(float(2**52)))


def generate_synthetic_time_series(
    spark: SparkSession,
    num_samples: int = 100,
    num_features: int = 3,
    with_nulls: bool = False,
    with_nans: bool = False,
    null_percentage: float = 0.05,
    nan_percentage: float = 0.05,
    time_col_numeric: bool = False,
    drop_time: bool = False,
    random_seed: int = DEFAULT_SEED,
    num_ids: int = 0,
) -> DataFrame:
    """S2 on Spark. ``num_ids > 0`` adds an ``id`` entity column (F2 shape)."""
    # parameter contract (reference synthetic_data_generator.py:219-233,
    # message-identical so the ported error tests match on regex)
    if num_samples < 0 or num_features < 0:
        raise ValueError("`num_samples` and `num_features` must be non-negative")
    if not 0.0 <= null_percentage <= 1.0:
        raise ValueError("null_percentage must be between 0.0 and 1.0")
    if not 0.0 <= nan_percentage <= 1.0:
        raise ValueError("nan_percentage must be between 0.0 and 1.0")

    df = spark.range(num_samples).withColumnRenamed("id", "_idx")

    cols = []
    if not drop_time:
        if time_col_numeric:
            time_expr = F.col("_idx").cast("double")
        else:
            time_expr = F.timestamp_seconds(
                F.unix_timestamp(F.lit("2023-01-01 00:00:00")) + F.col("_idx") * 86400
            )
        cols.append(time_expr.alias("time"))
    if num_ids > 0:
        cols.append(F.concat(F.lit("id_"), F.pmod(F.col("_idx"), F.lit(num_ids))).alias("id"))
    cols.append(_u01(random_seed, "target", F.col("_idx")).alias("target"))

    for i in range(1, num_features + 1):
        feat = _u01(random_seed, f"feature_{i}", F.col("_idx"))
        if with_nulls or with_nans:
            # row 0 always affected so the contract "at least one affected row"
            # holds at any sample size (reference :46-123)
            u = _u01(random_seed, f"inject_{i}", F.col("_idx"))
            is_null = (u < null_percentage) | (F.col("_idx") == 0)
            is_nan = u < (null_percentage + nan_percentage)
            if with_nulls and with_nans:
                feat = (
                    F.when(is_null, F.lit(None).cast("double"))
                    .when(is_nan, F.lit(float("nan")))
                    .otherwise(feat)
                )
            elif with_nulls:
                feat = F.when(is_null, F.lit(None).cast("double")).otherwise(feat)
            else:
                feat = F.when(is_null | is_nan, F.lit(float("nan"))).otherwise(feat)
        cols.append(feat.alias(f"feature_{i}"))

    return df.select(*cols)


def generate_tokenized_sequences(
    spark: SparkSession,
    num_rows: int = 10_000,
    num_docs: int = 100,
    max_tokens: int = 64,
    skew_head_pct: float = 0.05,
    random_seed: int = 42,
) -> DataFrame:
    """F3: the canonical pre-tokenized training-sequence table.

    tokens[j] = xxhash64(seed, doc_id, seq_idx, j) % 50257 — reproducible
    without RNG state, so per-row token-array equality is checkable anywhere.
    ~``skew_head_pct`` of all rows land on one hot doc to exercise skew
    handling. ``event_time`` strictly increases within each doc with a
    per-doc step (mixed frequency), so the strict-ordering gate passes.
    """
    df = spark.range(num_rows).withColumnRenamed("id", "_idx")

    head_bucket = int(1 / skew_head_pct) if skew_head_pct > 0 else 0
    if head_bucket:
        doc_id = F.when(
            F.pmod(F.xxhash64(F.lit(random_seed), F.lit("skew"), F.col("_idx")), F.lit(head_bucket))
            == 0,
            F.lit("doc_head"),
        ).otherwise(
            F.format_string("doc_%08d", F.pmod(F.col("_idx"), F.lit(num_docs)).cast("int"))
        )
    else:
        doc_id = F.format_string("doc_%08d", F.pmod(F.col("_idx"), F.lit(num_docs)).cast("int"))
    df = df.withColumn("doc_id", doc_id)

    # per-doc sequence position (generator-only window; fine at fixture scale,
    # and still a standard per-entity shuffle at large n)
    w = Window.partitionBy("doc_id").orderBy("_idx")
    df = df.withColumn("seq_idx", (F.row_number().over(w) - 1).cast("int"))

    step_minutes = 1 + F.pmod(F.xxhash64(F.lit(random_seed), F.lit("step"), F.col("doc_id")), F.lit(7))
    event_time = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2023-01-01 00:00:00")) + F.col("seq_idx") * step_minutes * 60
    )

    length = (
        1 + F.pmod(F.xxhash64(F.lit(random_seed), F.lit("len"), F.col("doc_id"), F.col("seq_idx")), F.lit(max_tokens))
    ).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda j: F.pmod(
            F.xxhash64(F.lit(random_seed), F.lit("tok"), F.col("doc_id"), F.col("seq_idx"), j),
            F.lit(TOKEN_VOCAB),
        ).cast("int"),
    )
    source = F.element_at(
        F.array(F.lit("web"), F.lit("code"), F.lit("books"), F.lit("wiki")),
        (F.pmod(F.xxhash64(F.lit(random_seed), F.lit("src"), F.col("doc_id")), F.lit(4)) + 1).cast("int"),
    )

    return df.select(
        "doc_id",
        event_time.alias("event_time"),
        "seq_idx",
        tokens.alias("tokens"),
        F.size(tokens).cast("int").alias("n_tok"),
        source.alias("source"),
    )


def generate_documents(
    spark: SparkSession,
    num_docs: int = 100_000,
    words_per_doc: int = 25,
    random_seed: int = 42,
) -> DataFrame:
    """F4: deterministic text corpus for dedup/similarity benchmarks.

    ``text`` = ``words_per_doc`` hash-derived words. ~2% of docs are EXACT
    duplicates of their predecessor and ~2% are near-duplicates (one word
    swapped), so exact/minhash/simhash dedup does real pair work. Pure
    expressions (xxhash64 + format_string) — reproducible at any scale with
    no RNG state, generation is embarrassingly parallel.
    """
    df = spark.range(num_docs).withColumnRenamed("id", "doc_id")
    r = F.pmod(F.xxhash64(F.lit(random_seed), F.lit("dup"), F.col("doc_id")), F.lit(100))
    # dup/near flags only on ODD ids: a flagged doc's predecessor (even) is
    # then never itself flagged, so every dup really duplicates its
    # predecessor's ACTUAL text (no unresolved dup-of-dup chains); doubled
    # thresholds keep the overall rates at ~2% exact / ~2% near
    odd = F.pmod(F.col("doc_id"), F.lit(2)) == 1
    is_dup = (r < 4) & odd
    is_near = (r >= 4) & (r < 8) & odd
    src = F.when(is_dup | is_near, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(int(words_per_doc) - 1)),
        lambda j: F.format_string(
            "w%06d",
            F.pmod(F.xxhash64(F.lit(random_seed), F.lit("w"), src, j), F.lit(50_000)).cast("int"),
        ),
    )
    # near-dup: swap the first word for a doc-unique one (high Jaccard kept)
    near_word = F.format_string(
        "n%06d",
        F.pmod(F.xxhash64(F.lit(random_seed), F.lit("nw"), F.col("doc_id")), F.lit(50_000)).cast("int"),
    )
    words = F.when(is_near, F.concat(F.array(near_word), F.slice(words, 2, int(words_per_doc)))).otherwise(words)
    return df.select("doc_id", F.array_join(words, " ").alias("text"))
