"""Regex-family PII detection and redaction for training corpora.

The term-list lane (`text.redact_terms`) handles known blocklists; this
module handles the SHAPE-based PII classes every pretraining pipeline
scrubs before the tokenizer sees the text — emails, IPv4 addresses,
phone numbers (see e.g. the C4 and Gopher data cards, which both report
regex PII filtering as a preprocessing stage).

Design constraints:

- **Expression-only**: `regexp_extract_all` / `regexp_replace` are JVM
  built-ins inside whole-stage codegen — zero Python, narrow plan (no
  shuffle), so the pass costs one projection over the corpus regardless
  of scale.
- **Dialect-portable patterns**: every default pattern restricts itself
  to the regex intersection of Java `java.util.regex` (Spark) and RE2
  (DuckDB/Go): ASCII character classes, bounded quantifiers, ``\\d``,
  ``\\b`` word boundaries. No backreferences, no lookaround — those
  diverge across engines and are banned here so the DuckDB oracle can
  run the *same* pattern strings and match byte-for-byte.
- **Deterministic multi-pattern order**: patterns apply in sorted-name
  order, and per-step match counts are taken on the *current* (already
  partially redacted) text, so the (text, counts) output is a pure
  function of the input string — engine- and partition-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError

# Dialect-portable defaults (Java regex ∩ RE2 — see module docstring).
# Keys double as output column suffixes (n_<key>) and redaction tokens
# ([<KEY>]); keep them lowercase identifiers.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def _check(patterns: dict[str, str] | None) -> dict[str, str]:
    pats = PII_PATTERNS if patterns is None else patterns
    if not pats:
        raise DataFrameValidationError("patterns must be a non-empty mapping")
    for name in pats:
        if not name.isidentifier():
            raise DataFrameValidationError(
                f"pattern name {name!r} must be a lowercase identifier "
                "(it becomes a column suffix and redaction token)"
            )
    return dict(sorted(pats.items()))


def pii_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document PII hit counts, one column per pattern family.

    Output: ``(id, n_<name> per pattern sorted by name, n_pii)`` — each
    count is ``size(regexp_extract_all(text, pattern))`` on the RAW
    text (families count independently; an email's digits may also
    count as a phone if the patterns overlap — the scan reports what
    each family alone would flag). One narrow projection, no shuffle;
    the downstream gate (`filter(n_pii == 0)` or route-to-redaction)
    stays a plain predicate Catalyst can push into the scan.
    """
    pats = _check(patterns)
    if text_col not in df.columns or id_col not in df.columns:
        raise DataFrameValidationError(f"need columns {text_col!r}, {id_col!r}")
    t = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(t, F.lit(p), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, p in pats.items()
    ]
    out = df.select(F.col(id_col), *counts)
    total = sum((F.col(f"n_{name}") for name in pats), F.lit(0).cast("long"))
    return out.withColumn("n_pii", total.cast("long"))


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Replace every PII match with its family token (``[EMAIL]`` …).

    Patterns apply sequentially in sorted-name order; each step counts
    its matches on the text AS REDACTED SO FAR (so a digit run consumed
    by the email step is not double-counted by the phone step — the
    reported ``n_redacted`` equals the number of replacement tokens in
    the output). Expression-only: k chained ``regexp_replace`` calls in
    one codegen'd projection.

    Output: ``(id, redacted_text, n_redacted)``.
    """
    pats = _check(patterns)
    if text_col not in df.columns or id_col not in df.columns:
        raise DataFrameValidationError(f"need columns {text_col!r}, {id_col!r}")
    cur = F.col(text_col)
    n_redacted = F.lit(0).cast("long")
    for name, p in pats.items():
        n_redacted = n_redacted + F.size(
            F.regexp_extract_all(cur, F.lit(p), F.lit(0))
        ).cast("long")
        cur = F.regexp_replace(cur, F.lit(p), F.lit(f"[{name.upper()}]"))
    return df.select(
        F.col(id_col),
        cur.alias("redacted_text"),
        n_redacted.alias("n_redacted"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns (Sweeney
    2002): every row must share its quasi-identifier combination with at
    least ``k − 1`` others, or the combination re-identifies. The
    pre-release privacy gate on any metadata table shipped next to a
    training corpus.

    ONE map-side-combinable groupBy over the quasi-identifier tuple.
    Output: one row per violating combination (the quasi columns,
    group_size, deficit = k − size), ordered nowhere — empty output
    means the table IS k-anonymous at this k. NULL is treated as a
    value (two NULL zips match — the standard audit convention).
    """
    if k < 2:
        raise DataFrameValidationError("k_anonymity: k must be >= 2")
    if not quasi_cols:
        raise DataFrameValidationError("k_anonymity: quasi_cols must be non-empty")
    missing = [c for c in quasi_cols if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"k_anonymity: missing columns {missing}")
    g = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("group_size"))
    return g.filter(F.col("group_size") < k).withColumn(
        "deficit", (F.lit(int(k)) - F.col("group_size")).cast("long")
    ).withColumn("group_size", F.col("group_size").cast("long"))


def l_diversity(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al. 2007): every
    quasi-identifier equivalence class must contain at least ``l``
    DISTINCT values of the sensitive attribute, or the class leaks the
    sensitive value even when it is k-anonymous (the homogeneity
    attack). The companion gate to :func:`k_anonymity` on any metadata
    table released next to a training corpus.

    ONE aggregation over the quasi tuple; ``countDistinct`` plans as a
    two-stage partial-distinct aggregate (expand + map-side combine),
    so no per-group state ever exceeds the distinct-sensitive count.
    Output: one row per VIOLATING class (quasi columns, group_size,
    n_sensitive, deficit = l − n_sensitive); empty output means the
    table is distinct-l-diverse at this l. NULL sensitive values count
    as one value (count_distinct skips NULLs; a NULL-only class shows
    n_sensitive = 0 and always violates for l ≥ 1).
    """
    if l < 2:
        raise DataFrameValidationError("l_diversity: l must be >= 2")
    if not quasi_cols:
        raise DataFrameValidationError("l_diversity: quasi_cols must be non-empty")
    missing = [c for c in [*quasi_cols, sensitive_col] if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"l_diversity: missing columns {missing}")
    if sensitive_col in quasi_cols:
        raise DataFrameValidationError(
            "l_diversity: sensitive_col must not be a quasi column"
        )
    g = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("group_size"),
        F.count_distinct(F.col(sensitive_col)).cast("long").alias("n_sensitive"),
    )
    return g.filter(F.col("n_sensitive") < l).withColumn(
        "deficit", (F.lit(int(l)) - F.col("n_sensitive")).cast("long")
    )


def t_closeness(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian 2007): every
    quasi-identifier equivalence class must keep the distribution of the
    sensitive attribute within distance ``t`` of the table-wide
    distribution, or the class leaks by *skewness* even when it is
    k-anonymous and l-diverse (the third gate of the classic privacy
    trio; see :func:`k_anonymity`, :func:`l_diversity`).

    For a categorical sensitive attribute with the unit ground distance
    the earth-mover distance reduces to total variation:
    ``TVD(g) = ½ Σ_v |p_g(v) − p(v)|``, where the sum runs over ALL
    sensitive values — including the ones absent from the class, each
    contributing its full global mass ``p(v)``.

    Plan: ONE (quasi, sensitive) aggregation (map-side-combinable) plus
    two bounded side aggregates — the C-row global value distribution
    (broadcast) and the per-class totals — then one per-class fold. The
    absent-value mass never requires a join against the missing
    combinations: ``Σ_{v∉g} p(v) = 1 − Σ_{v∈g} p(v)``, so the fold over
    the PRESENT (class, value) rows is complete.

    Determinism: the distance is computed in INTEGER arithmetic —
    ``TVD = (Σ_v |c_gv·N − c_v·n_g| + n_g·(N − Σ_{v∈g} c_v)) / (2·n_g·N)``
    — so every partial sum is an exact long and the single final
    division is bit-identical across engines and partitionings (no
    float-accumulation order sensitivity). NULL sensitive values are
    treated as a value of their own (groupBy semantics), matching the
    NULL convention of :func:`k_anonymity`.

    Output: one row per VIOLATING class — the quasi columns,
    ``group_size``, ``tvd`` (rounded to 6) and ``excess = tvd − t``
    (rounded to 6); empty output means the table is t-close at this t.
    """
    if not (0.0 < t < 1.0):
        raise DataFrameValidationError("t_closeness: t must be in (0, 1)")
    if not quasi_cols:
        raise DataFrameValidationError("t_closeness: quasi_cols must be non-empty")
    missing = [c for c in [*quasi_cols, sensitive_col] if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"t_closeness: missing columns {missing}")
    if sensitive_col in quasi_cols:
        raise DataFrameValidationError(
            "t_closeness: sensitive_col must not be a quasi column"
        )
    base = df.select(*quasi_cols, F.col(sensitive_col).alias("_v"))
    # (class, value) counts — the only data-sized aggregation
    gv = base.groupBy(*quasi_cols, "_v").agg(
        F.count(F.lit(1)).cast("long").alias("_cgv")
    )
    # global value distribution: C rows, broadcastable at any scale
    vtab = base.groupBy("_v").agg(F.count(F.lit(1)).cast("long").alias("_cv"))
    n_total = base.count()
    if n_total == 0:
        raise DataFrameValidationError("t_closeness: input has no rows")
    # null-safe join key: a plain equi-join on `_v` would DROP the NULL
    # sensitive value (NULL never equals NULL), silently shrinking every
    # class that contains one — eqNullSafe keeps the documented
    # NULL-is-a-value semantics
    vt = vtab.withColumnRenamed("_v", "_v2")
    joined = gv.join(
        F.broadcast(vt), F.col("_v").eqNullSafe(F.col("_v2"))
    ).drop("_v2")
    per_class = joined.groupBy(*quasi_cols).agg(
        F.sum("_cgv").cast("long").alias("group_size"),
        # Σ_v∈g |c_gv·N − c_v·n_g| needs n_g, which is itself Σ c_gv —
        # two-pass shape folded into one: carry Σc_gv, Σc_v and the
        # cross terms, finish in the projection below. n_g multiplies
        # every |·| term, so compute the abs-sum with n_g factored via a
        # second aggregation over the same shuffled data: instead, join
        # the class totals back (C_class rows, broadcast).
        F.sum("_cv").cast("long").alias("_sum_cv_present"),
        F.collect_list(F.struct("_cgv", "_cv")).alias("_pairs"),
    )
    # per-class pair list is bounded by the sensitive cardinality C (the
    # broadcastable side table), so the fold below is O(C) per class —
    # never corpus-sized state
    n_lit = F.lit(int(n_total))
    ng = F.col("group_size")
    abs_sum = F.aggregate(
        "_pairs",
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.abs(p["_cgv"] * n_lit - p["_cv"] * ng).cast("long"),
    )
    tvd_num = abs_sum + ng * (n_lit - F.col("_sum_cv_present"))
    tvd = tvd_num.cast("double") / (F.lit(2.0) * ng.cast("double") * n_lit.cast("double"))
    out = per_class.select(
        *quasi_cols,
        "group_size",
        F.round(tvd, 6).alias("tvd"),
        F.round(tvd - F.lit(float(t)), 6).alias("excess"),
    )
    return out.filter(F.col("tvd") > F.lit(float(t)))
