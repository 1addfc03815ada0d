"""Distributed generalized suffix array + exact repeated-substring mining.

The EXACT lane of duplicate-text analysis: Lee et al. 2022 ("Deduplicating
Training Data Makes Language Models Better") find repeated spans with a
suffix array; the engine's :mod:`dedup` module ships the positional-n-gram
approximation (fixed span length), this module ships the real thing —
every maximal repeat up to a cap, at character granularity, with no length
grid.

TWO construction lanes, split on the cap (``_DIRECT_CAP``):

- **Direct lane (cap ≤ 128, the default queries).** The suffix order of
  cap-truncated suffixes IS the string order of the literal cap-char
  cuts, so the rank (and rank adjacency) is computed in ONE pass: bucket
  every ``(doc, pos, substr(text, pos, cap))`` row by the cut's 2-char
  prefix (a monotone coarsening of the order), then a per-bucket
  ``dense_rank`` / ``lead`` window. One shuffle of ~cap-byte keys and at
  most one bounded driver collect replace ``log2(cap/8)`` sequential
  doubling rounds that each shuffle the same row count — strictly fewer
  bytes AND fewer barriers at every corpus size while the key stays
  cache-line sized.
- **Doubling lane (cap > 128).** Prefix doubling (Manber & Myers 1990),
  the standard DISTRIBUTED suffix-array recipe (Flick & Aluru 2015,
  "Parallel distributed memory construction of suffix and LCP arrays" —
  their algorithm is exactly a sequence of rank/shift rounds, which in
  Spark become bucketed dense ranks and per-document ``lead`` windows;
  no Python in the hot path, no single-partition window anywhere). Wide
  caps make the direct key itself the payload; the doubling rounds keep
  every shuffle at ~16 bytes/row.

Shape per doubling round (``log2(cap / w0)`` rounds total):

  1. ``R_{2w}`` key = (rank at ``pos``, rank at ``pos + w``): positions
     are DENSE 1..len(doc), so the shift lookup is ``lead(_r, w)`` over a
     per-document window — one narrow exchange keyed on the doc id, never
     a self-join and never a sort wider than one document;
  2. new DENSE rank, computed IN PLACE by :func:`_bucketed_dense_rank`:
     arithmetic buckets on the (already dense, already near-uniform)
     previous rank, one tiny per-bucket ``countDistinct`` aggregate for
     the offset prefix-sum, then ``dense_rank() + offset`` per bucket —
     parallel across buckets, no global window, no distinct + join-back;
  3. lineage truncation per round (the BPE-round idiom): when the round
     tables themselves are materialized (the LCP-descent lane) the pair
     table stays lazy — one materialization per round, not two;
     otherwise the pair table is the per-round ``localCheckpoint``;
  4. EARLY EXIT: if the distinct-rank count did not grow, no rank class
     split — and a class that survives one doubling unsplit can never
     split again (its members agree pairwise on both halves of every
     wider prefix, inductively). The remaining rounds are skipped and the
     final table already carries the cap-width ranks.

Both entry points start at ``w0 = min(8, cap)`` — the initial rank keys
on the first ``w0`` CHARACTERS directly (string order equals the
sentinel-pair order: a proper prefix compares before its extensions),
replacing the first ``log2(w0)`` doubling rounds with one bucketed rank
over short strings. :func:`repeated_substrings`' LCP descent decomposes
over the stored widths ≥ ``w0`` and finishes the remaining < ``w0``
characters with one in-row comparison of the normalized text (rank
equality at width w IS string equality of the clamped w-char cuts, so
the direct comparison matches the table semantics exactly).

A suffix ending before ``pos + w`` takes sentinel rank 0 (< every real
rank), giving the standard "a proper prefix sorts before its extensions"
order — the same order ``ORDER BY suffix_string`` yields, which is what
lets a DuckDB oracle replay the whole construction as one window function.

Ranks are computed over suffixes TRUNCATED at ``cap`` characters (default
64): equal final ranks mean the first ``cap`` characters agree. That cap
is what bounds the round count at any corpus size; repeats longer than the
cap report ``cap``.

LCP between rank-adjacent suffixes uses the per-round rank tables
(Farach-style descent): from the widest non-final table down to width 1,
if both suffixes carry the same rank at their current offsets, they share
that many more characters — ≤ ``2·log`` equi-joins of the (n−1)-row
adjacency table, no character comparison at all. Determinism: adjacency
is ordered by (rank, doc, pos), so equal-prefix runs have a pinned
internal order and every reported LCP is engine-exact. Early exit is
sound here too: pairs whose FINAL ranks tie are emitted with LCP = cap
directly (stabilized classes stay equal through cap), and live pairs'
LCP is < the stabilized width, which the remaining tables fully resolve.

At 100 TB this is char-granular (≈ corpus bytes × log(cap) shuffled ints);
run it on the suspect slice a cheaper screen (MinHash / n-gram) flags, not
the raw corpus — the same budget advice Lee et al. give for ExactSubstr.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.plans.rownum import with_global_row_number

_NORM_EXPR = "trim(regexp_replace(lower({c}), '\\\\s+', ' '))"


def _norm_text(text_col: str) -> F.Column:
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def _shuffle_partitions(df: DataFrame) -> int:
    return max(
        int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")), 1
    )


def _n_buckets(df: DataFrame) -> int:
    # 4x the shuffle-partition count: rank classes are not perfectly
    # uniform (duplicate text concentrates rows on shared ranks), and
    # finer buckets let the scheduler smooth the stragglers; the offset
    # collect stays a bounded ≤4B-row driver scalar
    return 4 * _shuffle_partitions(df)


def _char_positions(
    df: DataFrame, text_col: str, id_col: str, w0: int
) -> DataFrame:
    """One row per character of the normalized text:
    ``(_doc, _pos 1-based, _key = the suffix's first w0 characters)``;
    empty documents contribute nothing. Short suffixes keep their short
    remainder — string comparison already sorts a proper prefix before
    every extension, matching the sentinel-rank order of the doubling
    rounds."""
    from temporalscope_spark.operators.dedup import _parallelize_before_explode

    # the explode inflates one doc row into len(doc) char rows and its
    # output partitioning mirrors the input's — spread a coarse (single-
    # file) scan across the task slots BEFORE the fan-out (no-op at scale)
    base = _parallelize_before_explode(
        df.select(
            F.col(id_col).alias("_doc"), _norm_text(text_col).alias("_txt")
        ).filter(F.length("_txt") >= 1)
    )
    return base.select(
        "_doc",
        F.explode(F.sequence(F.lit(1), F.length("_txt"))).alias("_pos"),
        "_txt",
    ).select(
        "_doc",
        F.col("_pos").cast("int").alias("_pos"),
        F.substring(F.col("_txt"), F.col("_pos"), w0).alias("_key"),
    )


def _bucketed_dense_rank(
    df: DataFrame,
    order_cols: list[str],
    bucket: F.Column,
    out: str,
) -> tuple[DataFrame, int]:
    """Exact global DENSE rank of ``order_cols`` computed in place (ties
    share a rank; no distinct + join-back), returned with the total
    distinct count.

    ``bucket`` must be a MONOTONE coarsening of the order (rows in a
    lower bucket order before every row of a higher bucket, and ties on
    the full key never straddle buckets). One tiny aggregate collects the
    ≤B per-bucket distinct counts for the offset prefix-sum (B = shuffle
    partitions — bounded driver state), then ``dense_rank() + offset``
    runs per bucket in parallel. Bucket balance is the caller's contract:
    both call sites key on a previous DENSE rank (near-uniform by
    construction), so arithmetic buckets need no quantile probe; a
    pathological single-value skew degrades one task, never correctness.
    """
    bucketed = df.withColumn("_bk", bucket.cast("int"))
    counts = {
        r["_bk"]: r["_n"]
        for r in bucketed.groupBy("_bk")
        .agg(F.countDistinct(*order_cols).alias("_n"))
        .collect()
    }
    offsets, acc = {}, 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    if offsets:
        omap = F.create_map(
            *[x for k, v in offsets.items() for x in (F.lit(k), F.lit(v))]
        )
        off = F.coalesce(F.element_at(omap, F.col("_bk")), F.lit(0))
    else:  # empty input: any constant keeps the expression well-typed
        off = F.lit(0)
    w = Window.partitionBy("_bk").orderBy(*order_cols)
    ranked = bucketed.withColumn(
        out, (F.dense_rank().over(w) + off).cast("long")
    ).drop("_bk")
    return ranked, acc


# Below this cap the suffix order is computed DIRECTLY: one bucketed
# dense rank / per-bucket adjacency window over the literal cap-char
# suffix cuts. One shuffle of ~cap-byte keys strictly beats the doubling
# lane's log2(cap/8) sequential rounds (each a ~16-byte/row lead-window
# shuffle PLUS a rank shuffle plus a driver collect) — at every corpus
# size, since both move O(n_chars) rows and direct does it once. Above
# the cap the per-row key width dominates the row and prefix doubling's
# narrow ranks win; 128 keeps the direct key within a cache line or two.
_DIRECT_CAP = 128


def _prefix_bucket_dense_rank(
    df: DataFrame, key_col: str, out: str, bucket_chars: int = 2
) -> DataFrame:
    """Exact global DENSE rank of the string ``key_col`` computed in
    place. The bucket is the key's first ``bucket_chars`` characters —
    prefix truncation is a monotone coarsening of the string order and
    equal keys share a bucket, so the :func:`_bucketed_dense_rank`
    offset argument holds verbatim: one bounded per-bucket
    ``countDistinct`` collect (≤ alphabet^bucket_chars rows), then
    ``dense_rank() + offset`` per bucket in parallel. Spark compares
    strings by UTF-8 bytes, which preserves codepoint order, so the
    Python ``sorted()`` over the collected bucket prefixes agrees with
    the executor-side ordering."""
    bucketed = df.withColumn(
        "_bk", F.substring(F.col(key_col), 1, bucket_chars)
    )
    counts = {
        r["_bk"]: r["_n"]
        for r in bucketed.groupBy("_bk")
        .agg(F.countDistinct(key_col).alias("_n"))
        .collect()
    }
    offsets, acc = {}, 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    if offsets:
        omap = F.create_map(
            *[x for k, v in offsets.items() for x in (F.lit(k), F.lit(v))]
        )
        off = F.coalesce(F.element_at(omap, F.col("_bk")), F.lit(0))
    else:  # empty input
        off = F.lit(0)
    w = Window.partitionBy("_bk").orderBy(key_col)
    return bucketed.withColumn(
        out, (F.dense_rank().over(w) + off).cast("long")
    ).drop("_bk")


def _rank_rounds(
    df: DataFrame,
    text_col: str,
    id_col: str,
    cap: int,
    w0: int,
    materialize: bool,
) -> list[tuple[int, DataFrame]]:
    """``[(width, rank table), ...]``: each table is ``(_doc, _pos, _r)``
    with ``_r`` the dense rank of the suffix's first ``width`` characters.
    ``materialize=True`` localCheckpoints every round table — required
    when the LCP descent re-reads all of them; ``False`` leaves each
    round's rank window lazy on top of its checkpointed pair table (the
    final consumer evaluates it once). The list may stop early (see
    module docstring): a table whose doubling splits nothing already
    carries the cap-width ranks."""
    b = _n_buckets(df)
    pos = _char_positions(df, text_col, id_col, w0).localCheckpoint()
    # alphabet probe: the first-character map buckets the initial string
    # rank arithmetically (dense 1..A literals, no quantile job); the
    # alphabet is tiny and bounded, a legitimate driver scalar
    alphabet = sorted(
        r["_c"]
        for r in pos.select(F.substring("_key", 1, 1).alias("_c"))
        .distinct()
        .collect()
    )
    if not alphabet:  # no non-empty documents
        empty = pos.select("_doc", "_pos", F.lit(0).cast("long").alias("_r"))
        return [(min(w0, cap), empty)]
    amap = F.create_map(
        *[
            x
            for ch, i in zip(alphabet, range(1, len(alphabet) + 1))
            for x in (F.lit(ch), F.lit(i))
        ]
    )
    a = len(alphabet)
    b0 = F.floor(
        F.element_at(amap, F.substring("_key", 1, 1)) * b / F.lit(a + 1)
    )
    ranked0, m = _bucketed_dense_rank(pos, ["_key"], b0, "_r")
    cur = ranked0.select("_doc", "_pos", "_r")
    width = w0
    rounds = [(width, cur.localCheckpoint() if materialize else cur)]
    if materialize:
        cur = rounds[-1][1]
    doc_w = Window.partitionBy("_doc").orderBy("_pos")
    while width < cap:
        # positions are dense 1..len(doc): the rank at pos+width is
        # lead(width) rows ahead — sentinel 0 past the end. With
        # materialize=True the round table itself is checkpointed just
        # below, so the pair table stays lazy (the lead window is
        # recomputed once by the countDistinct collect and once by the
        # checkpoint job — one fewer materialization per round); without
        # round materialization the pair checkpoint is what truncates
        # the growing lineage.
        pairs = cur.select(
            "_doc",
            "_pos",
            "_r",
            F.coalesce(F.lead("_r", width).over(doc_w), F.lit(0)).alias(
                "_r2"
            ),
        )
        if not materialize:
            pairs = pairs.localCheckpoint()
        prev_m = m
        bexpr = F.floor(F.col("_r") * b / F.lit(m + 1))
        ranked, m = _bucketed_dense_rank(pairs, ["_r", "_r2"], bexpr, "_nr")
        cur = ranked.select(
            "_doc", "_pos", F.col("_nr").alias("_r")
        )
        width *= 2
        rounds.append((width, cur.localCheckpoint() if materialize else cur))
        if materialize:
            cur = rounds[-1][1]
        if m == prev_m:  # no class split: ranks are final through cap
            break
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
    if cap <= _DIRECT_CAP:
        # direct lane: the final rank IS the dense rank of the literal
        # cap-char cut — one bucketed rank, zero doubling rounds
        pos = _char_positions(df, text_col, id_col, cap)
        final = _prefix_bucket_dense_rank(pos, "_key", "_r")
    else:
        # only the final table is consumed: start at an 8-char key and
        # skip per-round materialization of intermediate tables
        final = _rank_rounds(
            df, text_col, id_col, cap, w0=min(8, cap), materialize=False
        )[-1][1]
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
    texts = df.select(
        F.col(id_col).alias("_da"), _norm_text(text_col).alias("_txt")
    )
    if cap <= _DIRECT_CAP:
        subs = _direct_repeat_candidates(df, text_col, id_col, min_len, cap)
    else:
        subs = _descent_repeat_candidates(
            df, text_col, id_col, min_len, cap, texts
        )
    cands = (
        subs
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


def _direct_repeat_candidates(
    df: DataFrame, text_col: str, id_col: str, min_len: int, cap: int
) -> DataFrame:
    """Repeat-substring candidates (one ``substring`` column, one row per
    witnessing rank-adjacent suffix pair) computed DIRECTLY on the
    cap-char suffix cuts — no doubling rounds, no global row number, no
    driver collect.

    Adjacency: rows sharing a repeat of length ≥ ``min_len`` share their
    first ``min(2, min_len)`` characters, so they sit in one bucket of
    the prefix coarsening and a per-bucket ``lead`` window over
    ``(_key, _doc, _pos)`` yields every witnessing pair; a cross-bucket
    adjacent pair disagrees inside the bucket prefix, so its LCP is
    < ``min_len`` and it can never contribute a candidate. LCP is the
    key pair's common prefix: ``cap`` when the cuts tie (same convention
    as equal final ranks), else a single in-row comparison fold seeded
    at ``min_len`` after an equality prefilter on the first ``min_len``
    characters."""
    bw = min(2, min_len)
    pos = _char_positions(df, text_col, id_col, cap)
    w = Window.partitionBy("_bk").orderBy("_key", "_doc", "_pos")
    paired = (
        pos.withColumn("_bk", F.substring("_key", 1, bw))
        .select(
            F.col("_key").alias("_ka"),
            F.lead("_key").over(w).alias("_kb"),
        )
        .filter(F.col("_kb").isNotNull())
    )
    capped_c = paired.filter(F.col("_ka") == F.col("_kb")).select(
        F.col("_ka").alias("substring")
    )
    live = paired.filter(
        (F.col("_ka") != F.col("_kb"))
        & (
            F.substring("_ka", 1, min_len)
            == F.substring("_kb", 1, min_len)
        )
    )

    def _ext_step(acc, i):
        ca = F.col("_ka").substr(i, F.lit(1))
        cb = F.col("_kb").substr(i, F.lit(1))
        return F.when(
            (acc == i - 1) & (ca == cb) & (ca != F.lit("")), acc + F.lit(1)
        ).otherwise(acc)

    lcp = (
        F.aggregate(
            F.sequence(F.lit(min_len + 1), F.lit(cap)),
            F.lit(min_len),
            _ext_step,
        )
        if min_len < cap
        else F.lit(min_len)
    )
    live_c = live.select(
        F.col("_ka").substr(F.lit(1), lcp).alias("substring")
    )
    return capped_c.unionByName(live_c)


def _descent_repeat_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_len: int,
    cap: int,
    texts: DataFrame,
) -> DataFrame:
    """Doubling-lane candidates for ``cap > _DIRECT_CAP``: prefix-doubled
    rank tables, global rank adjacency, Farach descent over the stored
    widths, final < w0 characters by one in-row comparison."""
    # start at an 8-char key like suffix_ranks (3 fewer doubling rounds);
    # the descent decomposes each LCP over the stored widths ≥ w0 and
    # finishes the final < w0 characters with ONE in-row comparison —
    # same exact LCP, half the sequential round jobs
    w0 = min(8, cap)
    rounds = _rank_rounds(
        df, text_col, id_col, cap, w0=w0, materialize=True
    )
    final = rounds[-1][1]

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

    # equal final rank => first `cap` chars agree => LCP = cap (capped);
    # sound under early exit too — stabilized classes stay equal to cap
    capped = pairs.filter(F.col("_ra") == F.col("_rb")).select(
        "_da", "_pa", F.lit(cap).alias("_lcp")
    )
    live = pairs.filter(F.col("_ra") != F.col("_rb")).select(
        "_da", "_pa", "_db", "_pb", F.lit(0).alias("_lcp")
    )
    # Farach descent over the stored round tables (widest non-final
    # first): R_w agreement at the current offsets extends the common
    # prefix by w. Live pairs disagree at the final width, so their LCP
    # is below it and the remaining widths decompose it exactly.
    for w_width, rk in reversed(rounds[:-1]):
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
                    F.lit(w_width),
                ).otherwise(F.lit(0)),
            )
            .drop("_qa", "_qb", "_rka", "_rkb")
            .localCheckpoint()
        )

    rem = w0 - 1
    if rem > 0:
        # finish the LCP below the narrowest table width with one in-row
        # character comparison: agreement through every stored width
        # leaves a remainder < w0, and only pairs that can still reach
        # ``min_len`` need it — the rest are sub-threshold whatever their
        # exact LCP, so they drop here instead of at the filter below.
        # (Rank equality at width w IS string equality of the clamped
        # w-char cuts, so comparing the normalized text directly matches
        # the table semantics; a live pair can never exhaust both
        # suffixes equal — that pair would tie on the final rank.)
        live = live.filter(F.col("_lcp") >= min_len - rem)
        ta = texts.select("_da", F.col("_txt").alias("_xa"))
        tb = texts.select(
            F.col("_da").alias("_db"), F.col("_txt").alias("_xb")
        )

        def _cmp_step(acc, i):
            ca = F.col("_xa").substr(
                F.col("_pa") + F.col("_lcp") + i - 1, F.lit(1)
            )
            cb = F.col("_xb").substr(
                F.col("_pb") + F.col("_lcp") + i - 1, F.lit(1)
            )
            return F.when(
                (acc == i - 1) & (ca == cb) & (ca != F.lit("")),
                acc + F.lit(1),
            ).otherwise(acc)

        fin = F.aggregate(
            F.sequence(F.lit(1), F.lit(rem)), F.lit(0), _cmp_step
        )
        live = (
            live.join(ta, "_da")
            .join(tb, "_db")
            .withColumn("_lcp", F.col("_lcp") + fin)
            .drop("_xa", "_xb")
        )

    witnesses = capped.unionByName(
        live.select("_da", "_pa", "_lcp")
    ).filter(F.col("_lcp") >= min_len)
    return witnesses.join(texts, "_da").select(
        F.substring(F.col("_txt"), F.col("_pa"), F.col("_lcp")).alias(
            "substring"
        )
    )
