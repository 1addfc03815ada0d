"""Sequence packing over the canonical tokenized table
(doc_id, event_time/seq_idx, tokens array<int32>, n_tok).

The standard LLM training-data transformations the engine's payload exists
for (BASELINE.json input_hint):

  * ``pack_concat_chunks`` — GPT-style packing: concatenate each entity's
    token arrays in sequence order and re-chunk into fixed-length blocks of
    exactly ``block_tokens``; the trailing remainder is dropped (or padded).
    Expression-only: per-row running token offsets from one window cumsum,
    then ``posexplode`` + re-group by block id. Deterministic, so per-row
    token-array EQUALITY is oracle-checkable.
  * ``pack_greedy`` — whole-sequence packing: fill each bin with consecutive
    sequences while the total stays ≤ ``bin_tokens`` (sequences never split;
    over-long sequences get their own bin). The capacity-reset recurrence is
    not expressible as a prefix sum, but it is a row-local fold over the
    entity's sequence list, so it runs as one grouped ``collect_list`` +
    ``aggregate`` — all JVM expressions, no Python boundary.

Scale notes: concat-chunk explodes to one row per TOKEN between the cumsum
and the re-group — exact but heavy (64x row inflation at n_tok=64); at
10^12 tokens run it per pre-clustered partition via ``pack_greedy``-style
kernels instead. The greedy packer shuffles each entity once (same hash
partitioning every other per-entity operator uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.exceptions import DataFrameValidationError


def pack_concat_chunks(
    df: DataFrame,
    block_tokens: int,
    id_col: str = "doc_id",
    order_col: str = "seq_idx",
    tokens_col: str = "tokens",
    drop_remainder: bool = True,
    pad_id: int = 0,
) -> DataFrame:
    """Concat-and-chunk packing per entity.

    Output: (id, block_id, tokens array<int> of length ``block_tokens``,
    n_filled) — ``n_filled < block_tokens`` only on a kept remainder block
    (``drop_remainder=False``, padded with ``pad_id``).
    """
    if block_tokens <= 0:
        raise DataFrameValidationError("block_tokens must be > 0")

    w = Window.partitionBy(id_col).orderBy(order_col)
    # running offset of this row's first token within the entity's stream
    base = df.withColumn(
        "_off0",
        F.coalesce(
            F.sum(F.size(F.col(tokens_col))).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).cast("long"),
    )
    tok = base.select(
        F.col(id_col),
        F.col("_off0"),
        F.posexplode(F.col(tokens_col)).alias("_pos", "_tok"),
    ).select(
        id_col,
        ((F.col("_off0") + F.col("_pos")) / block_tokens).cast("long").alias("block_id"),
        (F.col("_off0") + F.col("_pos")).alias("_gpos"),
        "_tok",
    )
    packed = (
        tok.groupBy(id_col, "block_id")
        .agg(
            F.array_sort(F.collect_list(F.struct(F.col("_gpos"), F.col("_tok")))).alias("_st"),
        )
        .select(
            id_col,
            "block_id",
            F.transform("_st", lambda s: s["_tok"]).alias("tokens"),
            F.size("_st").alias("n_filled"),
        )
    )
    if drop_remainder:
        return packed.filter(F.col("n_filled") == block_tokens)
    pad = F.array_repeat(F.lit(pad_id).cast("int"), block_tokens - F.col("n_filled"))
    return packed.withColumn(
        "tokens",
        F.when(F.col("n_filled") < block_tokens, F.concat(F.col("tokens"), pad)).otherwise(
            F.col("tokens")
        ),
    )


def pack_greedy(
    df: DataFrame,
    bin_tokens: int,
    id_col: str = "doc_id",
    order_col: str = "seq_idx",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Greedy whole-sequence packing per entity (sequences never split).

    Walk the entity's sequences in ``order_col`` order; start a new bin
    whenever adding the next sequence would exceed ``bin_tokens`` (a sequence
    longer than ``bin_tokens`` occupies a bin alone). Output one row per bin:
    (id, bin_id, tokens concatenated, n_seqs, n_tok).

    The capacity-reset recurrence is not a prefix sum, but it IS a
    row-local fold over the entity's (bounded, in-row) sequence list: one
    grouped ``collect_list`` + one ``aggregate`` building the bin array
    directly + one ``posexplode`` — the token payload never crosses the
    JVM↔Python boundary (the previous implementation was an
    ``applyInPandas`` kernel that shipped every token array through Arrow
    both ways; the fold keeps the same per-entity memory profile and
    drops the Python workers from the plan entirely).
    """
    if bin_tokens <= 0:
        raise DataFrameValidationError("bin_tokens must be > 0")

    empty_toks = F.array().cast("array<int>")
    bin_t = "struct<toks:array<int>,n_seqs:int,n_tok:int>"
    acc0 = F.array().cast(f"array<{bin_t}>")

    def step(acc, s):
        # NULL token arrays — treat as empty (mirrors pack_concat_chunks,
        # where posexplode silently skips NULL arrays)
        toks = F.coalesce(s["t"].cast("array<int>"), empty_toks)
        ln = F.size(toks)
        last = F.element_at(acc, -1)
        fresh = (F.size(acc) == 0) | (
            (last["n_tok"] > 0) & (last["n_tok"] + ln > bin_tokens)
        )
        opened = F.concat(
            acc,
            F.array(
                F.struct(
                    toks.alias("toks"),
                    F.lit(1).alias("n_seqs"),
                    ln.alias("n_tok"),
                )
            ),
        )
        grown = F.concat(
            F.slice(acc, 1, F.size(acc) - 1),
            F.array(
                F.struct(
                    F.concat(last["toks"], toks).alias("toks"),
                    (last["n_seqs"] + 1).alias("n_seqs"),
                    (last["n_tok"] + ln).alias("n_tok"),
                )
            ),
        )
        return F.when(fresh, opened).otherwise(grown)

    bins = F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col(order_col).alias("o"),
                                             F.col(tokens_col).alias("t")))),
        acc0,
        step,
    )
    return (
        df.select(id_col, order_col, tokens_col)
        .groupBy(id_col)
        .agg(bins.alias("_bins"))
        .select(F.col(id_col), F.posexplode("_bins").alias("_p", "_b"))
        .select(
            id_col,
            F.col("_p").cast("long").alias("bin_id"),
            F.col("_b.toks").alias("tokens"),
            F.col("_b.n_seqs").alias("n_seqs"),
            F.col("_b.n_tok").alias("n_tok"),
        )
    )


def training_windows(
    df: DataFrame,
    ctx_len: int,
    stride: int = 1,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Next-token-prediction example builder: slide a ``ctx_len``-token
    context over each row's token array and pair it with the following
    token as the target.

    Output: one row per window — (id, ``win_id`` 0-based, ``context``
    array of exactly ``ctx_len`` tokens, ``target`` the next token).
    Window ``w`` starts at token index ``w * stride`` (0-based); rows with
    ``size(tokens) <= ctx_len`` emit nothing (no partial contexts — a
    partial-context lane is what padding + :func:`pack_concat_chunks`
    are for).

    Plan shape at scale: pure per-row expressions (``sequence`` over the
    window starts, ``transform`` + ``slice`` + ``element_at``) followed by
    one ``explode`` — a single narrow map stage, ZERO shuffles, so it
    pipelines into whatever partitioning the source already has and scales
    embarrassingly at any corpus size. Row inflation is
    ``~(n_tok - ctx_len) / stride`` per sequence; at 10^12-sequence scale
    pick ``stride >= ctx_len`` (non-overlapping) unless the training
    recipe demands overlap — the plan is identical either way.
    """
    if ctx_len <= 0:
        raise DataFrameValidationError("ctx_len must be > 0")
    if stride <= 0:
        raise DataFrameValidationError("stride must be > 0")

    toks = F.col(tokens_col)
    # last valid 0-based window index: (L - ctx_len - 1) // stride
    last_w = F.floor((F.size(toks) - F.lit(ctx_len + 1)) / F.lit(stride)).cast("int")
    wins = F.when(
        F.size(toks) > F.lit(ctx_len),
        F.transform(
            F.sequence(F.lit(0), last_w),
            lambda w: F.struct(
                w.cast("long").alias("win_id"),
                F.slice(toks, w * F.lit(stride) + F.lit(1), ctx_len).alias("context"),
                F.element_at(toks, (w * F.lit(stride) + F.lit(ctx_len + 1)).cast("int")).alias(
                    "target"
                ),
            ),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(wins).alias("_w"))
        .select(
            id_col,
            F.col("_w.win_id").alias("win_id"),
            F.col("_w.context").alias("context"),
            F.col("_w.target").alias("target"),
        )
    )


def length_bucket_batches(
    df: DataFrame,
    length_col: str,
    batch_size: int,
    id_col: str = "doc_id",
    batch_col: str = "batch_id",
) -> DataFrame:
    """Length-bucketed batch assignment for padded training (the
    "sortish" batching every SFT/seq2seq loader uses, cf. fairseq /
    torchtext BucketIterator): order sequences by (length, id), cut the
    order into fixed-size batches — every batch holds near-equal lengths,
    so padding waste ``1 − Σlen/(batch·max_len)`` collapses versus random
    batching.

    The global order comes from the quantile-bucket two-phase row number
    (``plans/rownum.with_global_row_number`` — no single-partition window
    or global sort at any size); the id suffix makes the assignment a
    pure function of the input set. Output: the input rows +
    ``batch_col`` (0-based). Downstream shuffles should key on the batch
    id — batches are contiguous length ranges by construction.
    """
    from temporalscope_spark.plans.rownum import with_global_row_number

    if batch_size < 1:
        raise DataFrameValidationError("length_bucket_batches: batch_size must be >= 1")
    for c in (length_col, id_col):
        if c not in df.columns:
            raise DataFrameValidationError(
                f"length_bucket_batches: missing column {c!r}"
            )
    ranked = with_global_row_number(
        df, [length_col, id_col], rn_col="_rn", materialize_input=True
    )
    return ranked.withColumn(
        batch_col, ((F.col("_rn") - 1) / F.lit(int(batch_size))).cast("long")
    ).drop("_rn")


def batch_padding_stats(
    df: DataFrame,
    length_col: str,
    batch_col: str = "batch_id",
) -> DataFrame:
    """Per-batch padding report for a batch assignment: (batch, n,
    max_len, sum_len, pad_waste) where ``pad_waste = 1 − sum/(n·max)`` —
    the fraction of a padded batch tensor that is padding. ONE
    map-side-combinable aggregation keyed on the batch id."""
    for c in (length_col, batch_col):
        if c not in df.columns:
            raise DataFrameValidationError(f"batch_padding_stats: missing column {c!r}")
    g = df.groupBy(batch_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.col(length_col).cast("long")).alias("max_len"),
        F.sum(F.col(length_col).cast("long")).alias("sum_len"),
    )
    waste = F.lit(1.0) - F.col("sum_len").cast("double") / (
        F.col("n").cast("double") * F.col("max_len").cast("double")
    )
    return g.withColumn(
        "pad_waste",
        F.when(F.col("max_len") > 0, F.round(waste, 6) + F.lit(0.0)).otherwise(
            F.lit(0.0)
        ),
    )


def chat_pack(
    df: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_id",
    role_col: str = "role",
    tokens_col: str = "tokens",
    loss_roles: tuple[str, ...] = ("assistant",),
    header_fmt: str = "<|{role}|>",
) -> DataFrame:
    """SFT chat-template assembly with loss masks: one row per
    conversation — ``(conv, n_turns, tokens, loss_mask)`` where ``tokens``
    is every turn's header sentinel + turn tokens in ``order_col`` order
    (cast to string) and ``loss_mask`` is the parallel 0/1 array marking
    the positions that participate in the loss: 1 exactly on the TOKEN
    positions of turns whose role is in ``loss_roles`` (headers are always
    0 — the standard "train on assistant turns only" instruction-tuning
    convention).

    Plan shape at scale: ONE shuffle (the conversation groupBy); each
    group collects its own turns into a struct array (bounded by the
    conversation length — the same per-entity bound every window operator
    here lives under), ``array_sort`` pins the order (ties on
    ``order_col`` break by role then tokens, deterministically), and the
    token/mask assembly is per-row ``transform``/``flatten`` expressions.
    No window, no explode, no Python.
    """
    if not loss_roles:
        raise DataFrameValidationError("loss_roles must be non-empty")
    if "{role}" not in header_fmt:
        raise DataFrameValidationError("header_fmt must contain {role}")
    pre, post = header_fmt.split("{role}", 1)
    turns = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(order_col).alias("o"),
                F.col(role_col).cast("string").alias("r"),
                F.transform(F.col(tokens_col), lambda t: t.cast("string")).alias(
                    "w"
                ),
            )
        )
    )
    grouped = df.groupBy(F.col(conv_col)).agg(turns.alias("_turns"))

    def header(r):
        return F.concat(F.lit(pre), r, F.lit(post))

    loss_arr = F.array(*[F.lit(x) for x in loss_roles])
    toks = F.flatten(
        F.transform(
            F.col("_turns"),
            lambda t: F.concat(F.array(header(t["r"])), t["w"]),
        )
    )
    mask = F.flatten(
        F.transform(
            F.col("_turns"),
            lambda t: F.concat(
                F.array(F.lit(0)),
                F.transform(
                    t["w"],
                    lambda _: F.when(
                        F.array_contains(loss_arr, t["r"]), F.lit(1)
                    ).otherwise(F.lit(0)),
                ),
            ),
        )
    )
    return grouped.select(
        F.col(conv_col),
        F.size("_turns").alias("n_turns"),
        toks.alias("tokens"),
        mask.alias("loss_mask"),
    )
