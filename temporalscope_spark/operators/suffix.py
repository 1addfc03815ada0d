"""Distributed generalized suffix array + exact repeated-substring mining.

The EXACT lane of duplicate-text analysis: Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better") find repeated spans with a
suffix array; the engine's :mod:`dedup` module ships the positional-n-gram
approximation (fixed span length), this module ships the real thing —
every maximal repeat up to a cap, at character granularity, with no length
grid. Construction is prefix doubling (Manber & Myers 1990), the standard
DISTRIBUTED suffix-array recipe (Flick & Aluru 2015, "Parallel distributed
memory construction of suffix and LCP arrays" — their algorithm is exactly
a sequence of sort/rank/shift rounds, which in Spark become two-phase
global ranks and equi-joins; no Python in the hot path, no single-partition
window anywhere).

Shape per doubling round (log₂(cap) rounds total):

  1. ``R_{k+1}`` key = (rank of ``pos``, rank of ``pos + 2^k``): the shift
     lookup is a self EQUI-join on ``(doc, pos)`` — never a sort;
  2. new DENSE rank = two-phase global row number over the DISTINCT key
     pairs (:func:`plans.rownum.with_global_row_number`), joined back;
  3. ``localCheckpoint`` truncates the growing lineage (the BPE-round
     idiom).

A suffix ending before ``pos + 2^k`` takes sentinel rank 0 (< every real
rank), giving the standard "a proper prefix sorts before its extensions"
order — the same order ``ORDER BY suffix_string`` yields, which is what
lets a DuckDB oracle replay the whole construction as one window function.

Ranks are computed over suffixes TRUNCATED at ``cap`` characters (default
64): equal final ranks mean the first ``cap`` characters agree. That cap
is what bounds the round count at any corpus size; repeats longer than the
cap report ``cap``.

LCP between rank-adjacent suffixes uses the per-round rank tables
(Farach-style descent): from ``k = K−1`` down to 0, if both suffixes carry
the same ``R_k`` rank at their current offsets, they share ``2^k`` more
characters — ≤ ``2·log`` equi-joins of the (n−1)-row adjacency table, no
character comparison at all. Determinism: adjacency is ordered by
(rank, doc, pos), so equal-prefix runs have a pinned internal order and
every reported LCP is engine-exact.

At 100 TB this is char-granular (≈ corpus bytes × log(cap) shuffled ints);
run it on the suspect slice a cheaper screen (MinHash / n-gram) flags, not
the raw corpus — the same budget advice Lee et al. give for ExactSubstr.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.corpus_stats import _norm_words  # noqa: F401
from temporalscope_spark.plans.rownum import with_global_row_number

_NORM_EXPR = "trim(regexp_replace(lower({c}), '\\\\s+', ' '))"


def _norm_text(text_col: str) -> F.Column:
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def _positions(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos 1-based, first-char codepoint) for every character of the
    normalized text; empty docs contribute nothing."""
    base = df.select(
        F.col(id_col).alias("_doc"), _norm_text(text_col).alias("_txt")
    ).filter(F.length("_txt") >= 1)
    return base.select(
        "_doc",
        F.explode(F.sequence(F.lit(1), F.length("_txt"))).alias("_pos"),
        "_txt",
    ).select(
        "_doc",
        F.col("_pos").cast("int").alias("_pos"),
        F.ascii(F.substring(F.col("_txt"), F.col("_pos"), 1)).cast("long").alias("_r"),
    )


def _doubling_rounds(pos_df: DataFrame, cap: int) -> list[DataFrame]:
    """Rank tables ``R_0 .. R_K``: ``R_k`` ranks suffixes by their first
    ``2^k`` characters (dense, 1-based; codepoints double as R_0's ranks —
    any strictly monotone key works). Each table is localCheckpoint-ed:
    the descent phase re-reads all of them."""
    rounds = [pos_df.localCheckpoint()]
    h = 1
    while h < cap:
        cur = rounds[-1]
        shifted = cur.select(
            "_doc", (F.col("_pos") - h).alias("_pos"), F.col("_r").alias("_r2")
        )
        pairs = cur.join(shifted, ["_doc", "_pos"], "left").select(
            "_doc", "_pos", "_r", F.coalesce("_r2", F.lit(0)).alias("_r2")
        )
        distinct = pairs.select("_r", "_r2").distinct()
        ranked = with_global_row_number(distinct, ["_r", "_r2"], "_nr").select(
            "_r", "_r2", F.col("_nr").alias("_nr")
        )
        nxt = pairs.join(ranked, ["_r", "_r2"]).select(
            "_doc", "_pos", F.col("_nr").alias("_r")
        )
        rounds.append(nxt.localCheckpoint())
        h *= 2
    return rounds


def suffix_ranks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    cap: int = 64,
) -> DataFrame:
    """Generalized suffix array over the normalized corpus, truncated at
    ``cap`` characters: one row per character position,
    ``(id, pos, srank)`` where ``srank`` is the DENSE lexicographic rank
    of the suffix's first ``cap`` characters (ties = suffixes agreeing on
    all ``cap``; a suffix shorter than ``cap`` sorts before its
    extensions). ``cap`` must be a power of two.
    """
    if cap < 2 or (cap & (cap - 1)) != 0:
        raise DataFrameValidationError("cap must be a power of two >= 2")
    pos_df = _positions(df, text_col, id_col)
    final = _doubling_rounds(pos_df, cap)[-1]
    # final _r values are dense ranks of distinct 2^K-prefixes already
    return final.select(
        F.col("_doc").alias(id_col),
        F.col("_pos").alias("pos"),
        F.col("_r").alias("srank"),
    )


def repeated_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 10,
    top_k: int = 20,
    cap: int = 64,
) -> DataFrame:
    """Top-``top_k`` longest EXACTLY-repeated substrings in the corpus
    (length capped at ``cap``): ``(substring, length, n_occurrences)``,
    ranked by (length desc, substring asc).

    A substring repeats iff two suffixes share a prefix of its length, and
    every repeat is witnessed by a RANK-ADJACENT suffix pair — so the scan
    is: order positions by (srank, id, pos) via the two-phase global row
    number, join each row to its successor, compute the pair's LCP by rank
    descent (no character compares), keep pairs with LCP ≥ ``min_len``,
    cut the actual substring from the document text, and count occurrences
    with one corpus pass per DISTINCT winning length (≤ ``top_k`` bounded
    probe lengths, never a quadratic pass).
    """
    if min_len < 1 or min_len > cap:
        raise DataFrameValidationError("min_len must be in [1, cap]")
    if top_k < 1:
        raise DataFrameValidationError("top_k must be >= 1")
    pos_df = _positions(df, text_col, id_col)
    rounds = _doubling_rounds(pos_df, cap)
    final = rounds[-1]

    ordered = with_global_row_number(final, ["_r", "_doc", "_pos"], "_rn")
    left = ordered.select(
        F.col("_doc").alias("_da"),
        F.col("_pos").alias("_pa"),
        F.col("_r").alias("_ra"),
        "_rn",
    )
    right = ordered.select(
        F.col("_doc").alias("_db"),
        F.col("_pos").alias("_pb"),
        F.col("_r").alias("_rb"),
        (F.col("_rn") - 1).alias("_rn"),
    )
    pairs = left.join(right, "_rn").drop("_rn")

    # equal final rank => first `cap` chars agree => LCP = cap (capped)
    capped = pairs.filter(F.col("_ra") == F.col("_rb")).select(
        "_da", "_pa", F.lit(cap).alias("_lcp")
    )
    live = pairs.filter(F.col("_ra") != F.col("_rb")).select(
        "_da", "_pa", "_db", "_pb", F.lit(0).alias("_lcp")
    )
    # Farach descent over the stored round tables: R_k agreement at the
    # current offsets extends the common prefix by 2^k
    h = cap // 2
    k = len(rounds) - 2
    while k >= 0:
        rk = rounds[k]
        a = rk.select(
            F.col("_doc").alias("_da"),
            F.col("_pos").alias("_qa"),
            F.col("_r").alias("_rka"),
        )
        b = rk.select(
            F.col("_doc").alias("_db"),
            F.col("_pos").alias("_qb"),
            F.col("_r").alias("_rkb"),
        )
        live = (
            live.withColumn("_qa", F.col("_pa") + F.col("_lcp"))
            .withColumn("_qb", F.col("_pb") + F.col("_lcp"))
            .join(a, ["_da", "_qa"], "left")
            .join(b, ["_db", "_qb"], "left")
            .withColumn(
                "_lcp",
                F.col("_lcp")
                + F.when(
                    F.col("_rka").isNotNull()
                    & (F.col("_rka") == F.col("_rkb")),
                    F.lit(h),
                ).otherwise(F.lit(0)),
            )
            .drop("_qa", "_qb", "_rka", "_rkb")
            .localCheckpoint()
        )
        h //= 2
        k -= 1

    witnesses = capped.unionByName(
        live.select("_da", "_pa", "_lcp")
    ).filter(F.col("_lcp") >= min_len)

    texts = df.select(
        F.col(id_col).alias("_da"), _norm_text(text_col).alias("_txt")
    )
    cands = (
        witnesses.join(texts, "_da")
        .select(
            F.substring(F.col("_txt"), F.col("_pa"), F.col("_lcp")).alias(
                "substring"
            )
        )
        # a cap-rank tie between two IDENTICAL short suffixes claims
        # lcp=cap; the cut clamps at the suffix end, so the honest length
        # is the cut's length (equal strings have equal lengths — the pair
        # agrees)
        .select("substring", F.length("substring").alias("length"))
        .filter(F.col("length") >= min_len)  # clamping can shrink below it
        .distinct()
        .orderBy(F.col("length").desc(), "substring")
        .limit(top_k)
    )
    cand_rows = cands.collect()  # <= top_k rows
    if not cand_rows:
        spark = df.sparkSession
        return spark.createDataFrame(
            [], "substring string, length int, n_occurrences long"
        )
    lens = sorted({r["length"] for r in cand_rows})
    spark = df.sparkSession
    cand_df = spark.createDataFrame(
        [(r["substring"], r["length"]) for r in cand_rows],
        "substring string, length int",
    )
    # occurrence counting: one narrow probe per DISTINCT winning length
    # (<= top_k literals), equi-joined against the candidate table; probes
    # regenerate (pos, cut) straight from the text column — no join, and
    # the full document string never survives past the fused projection
    probe_s = (
        texts.select(
            "_txt",
            F.explode(F.sequence(F.lit(1), F.length("_txt"))).alias("_pos"),
        )
        .select(
            "_txt",
            F.col("_pos").cast("int").alias("_pos"),
            F.explode(F.array(*[F.lit(int(x)) for x in lens])).alias("length"),
        )
        .select(
            F.substring(F.col("_txt"), F.col("_pos"), F.col("length")).alias(
                "substring"
            ),
            "length",
        )
    )
    return (
        probe_s.join(F.broadcast(cand_df), ["substring", "length"])
        .groupBy("substring", "length")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
