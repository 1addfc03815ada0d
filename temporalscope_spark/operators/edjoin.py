"""Edit-distance similarity join (ED-Join family): all pairs of rows
whose strings are within a Levenshtein threshold, WITHOUT the n² scan.

The classic fuzzy-match primitive for entity resolution over titles /
names / URLs and for typo-class near-dup detection where shingle
Jaccard is too coarse. Candidate generation follows the q-gram prefix
filter of the string-similarity-join literature (Gravano et al. 2001
count filter; Chaudhuri, Ganti & Kaushik 2006 prefix filter; Xiao et
al. 2008 ED-Join), verification is Spark's built-in banded
``levenshtein(l, r, threshold)``.

Completeness argument (why the output EQUALS the brute-force join):

* One edit operation destroys at most ``q`` of a string's positional
  q-gram occurrences, so ``ed(s,t) <= d`` implies the gram MULTISETS
  differ by at most ``q*d`` occurrences per side.
* Number the k-th occurrence of gram ``g`` as token ``(g, k)`` — this
  lifts multisets to sets (removing an occurrence removes the
  highest-k token), so ``|T(s) \\ T(t)| <= q*d`` as SETS.
* Order all tokens by the total order (global gram frequency, gram,
  k) — rarest first, identical for every string. By the prefix-filter
  lemma, two sets that differ by at most ``q*d`` elements per side
  must share a token within their first ``q*d + 1`` tokens — PROVIDED
  each string has at least ``q*d + 1`` gram occurrences, i.e.
  ``len >= q*(d+1)``.
* Strings shorter than ``q*(d+1)`` take the SHORT LANE: each emits
  join keys ``len .. len+d`` against every string keyed by its own
  length (``ed <= d`` forces ``|Δlen| <= d``), so every short-short
  and short-long pair is still generated. Short strings are a bounded
  length class, so this lane's fan-out is ``d+1`` keys per row — an
  equi-join, never a cartesian.

Scale notes (100 TB): the token table is ~L rows per string; the two
row_number windows shuffle on (id) — the same key, one exchange reused;
the frequency join is a plain equi-join on gram (AQE skew-split
handles hot grams); the prefix keeps only the ``q*d + 1`` RAREST
tokens per string, so candidate buckets are rare-gram-sized; exact
verification runs only on candidates with the banded (O(d·L)) distance.
No stage is quadratic in the corpus.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from temporalscope_spark.core.caching import hold
from temporalscope_spark.exceptions import DataFrameValidationError


def edit_distance_pairs(
    df: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    max_dist: int = 2,
    q: int = 3,
) -> DataFrame:
    """All pairs ``(id_a < id_b, dist)`` with ``levenshtein <= max_dist``.

    Exact (not approximate): candidate generation is COMPLETE for the
    threshold, verification is exact, so the result equals the
    brute-force all-pairs join. NULL strings are dropped; identical
    strings (dist 0) are included, self-pairs are not.
    """
    if max_dist < 0:
        raise DataFrameValidationError("edit_distance_pairs: max_dist must be >= 0")
    if q < 2:
        raise DataFrameValidationError("edit_distance_pairs: q must be >= 2")
    missing = [c for c in (id_col, text_col) if c not in df.columns]
    if missing:
        raise DataFrameValidationError(
            f"edit_distance_pairs: missing columns {missing}"
        )
    d = int(max_dist)
    min_long = q * (d + 1)  # len at which the prefix filter is complete

    base = (
        df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_s"))
        .filter(F.col("_s").isNotNull())
        .withColumn("_len", F.length("_s"))
    )

    # ---- long lane: (gram, occurrence) prefix-filter equi-join --------
    long_side = base.filter(F.col("_len") >= min_long)
    grams = long_side.select(
        "_id",
        "_len",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("_len") - (q - 1)),
                lambda i: F.substring(F.col("_s"), i, q),
            )
        ).alias("_pos", "_g"),
    )
    toks = grams.withColumn(
        "_k", F.row_number().over(Window.partitionBy("_id", "_g").orderBy("_pos"))
    )
    freq = toks.groupBy("_g").agg(F.count(F.lit(1)).alias("_f"))
    # the prefix table feeds BOTH sides of the candidate self-join —
    # persist it or the explode + two windows run twice (hold/release
    # contract: caller releases after the terminal action)
    pref = (
        toks.join(freq, "_g")
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("_id").orderBy("_f", "_g", "_k")
            ),
        )
        .filter(F.col("_r") <= q * d + 1)
        .select("_id", "_len", "_g", "_k")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pa, pb = pref.alias("a"), pref.alias("b")
    long_cand = (
        pa.join(
            pb,
            (F.col("a._g") == F.col("b._g"))
            & (F.col("a._k") == F.col("b._k"))
            & (F.col("a._id") < F.col("b._id"))
            & (F.abs(F.col("a._len") - F.col("b._len")) <= d),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )

    # ---- short lane: length-band equi-join over the bounded class ----
    short = base.filter(F.col("_len") < min_long)
    shortish = base.filter(F.col("_len") < min_long + d)
    keys = short.select(
        F.col("_id").alias("_sid"),
        F.explode(
            F.sequence(F.col("_len"), F.col("_len") + d)
        ).alias("_tlen"),
    )
    short_cand = (
        keys.join(
            shortish.select(F.col("_id").alias("_tid"), F.col("_len").alias("_tlen")),
            "_tlen",
        )
        .filter(F.col("_sid") != F.col("_tid"))
        .select(
            F.least("_sid", "_tid").alias("id_a"),
            F.greatest("_sid", "_tid").alias("id_b"),
        )
        .distinct()
    )

    cand = long_cand.unionByName(short_cand).distinct()

    # ---- exact verification on candidates only ------------------------
    sa = base.select(F.col("_id").alias("id_a"), F.col("_s").alias("_sa"))
    sb = base.select(F.col("_id").alias("id_b"), F.col("_s").alias("_sb"))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", F.levenshtein("_sa", "_sb", d).cast("long"))
        .filter(F.col("dist") >= 0)  # banded levenshtein returns -1 above d
        .select("id_a", "id_b", "dist")
    )
    return hold(verified, pref)
