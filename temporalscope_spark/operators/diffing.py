"""Table diffing and functional-dependency validation — the governance
tier's "what changed / what must hold" pair (the Datafold-style data
diff and the classic FD profile of Papenbrock et al. 2015, reduced to
checking declared dependencies at scale).

Both are single-shuffle designs: ``table_diff`` is ONE full-outer join
on the key (each side pre-projected to key + compared columns) with all
per-column comparison counts collected in ONE aggregation of the joined
table; ``fd_violations`` is ONE groupBy(lhs) counting distinct rhs per
determinant group — a dependency holds iff no group has two rhs values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError


def table_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols,
    compare_cols=None,
) -> DataFrame:
    """Key-based diff summary between two versions of a table: one row
    per compared column plus a ``__rows__`` row.

    Output columns: ``(column, n_left, n_right, n_added, n_removed,
    n_changed, n_unchanged)`` — added/removed count keys present on one
    side only (same value for every column row; the ``__rows__`` row
    carries the row-level view), changed/unchanged count matched keys
    whose value differs/agrees (NULL-safe: NULL == NULL is unchanged,
    NULL vs non-NULL is changed).

    Plan shape: each side projects to key + compared columns (column
    pruning reaches the scan), ONE full-outer join on the key, ONE
    aggregation computing every per-column count — the table is touched
    once per side regardless of how many columns are compared. Duplicate
    keys raise (a diff without key uniqueness is ill-defined); the check
    rides the same aggregation via count vs distinct-count of keys.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise DataFrameValidationError("table_diff: key_cols must be non-empty")
    cols = list(compare_cols) if compare_cols is not None else [
        c for c in left.columns if c in set(right.columns) and c not in keys
    ]
    if not cols:
        raise DataFrameValidationError("table_diff: no columns to compare")
    for side, df in (("left", left), ("right", right)):
        missing = [c for c in [*keys, *cols] if c not in df.columns]
        if missing:
            raise DataFrameValidationError(
                f"table_diff: {side} side missing columns {missing}"
            )
    lsel = left.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.lit(1).alias("_inl"),
        *[F.col(c).alias(f"_l_{c}") for c in cols],
    )
    rsel = right.select(
        *[F.col(k).alias(f"_k{i}") for i, k in enumerate(keys)],
        F.lit(1).alias("_inr"),
        *[F.col(c).alias(f"_r_{c}") for c in cols],
    )
    j = lsel.join(rsel, [f"_k{i}" for i in range(len(keys))], "full_outer")
    inl = F.col("_inl").isNotNull()
    inr = F.col("_inr").isNotNull()
    both = inl & inr
    aggs = [
        F.sum(inl.cast("long")).alias("_nl"),
        F.sum(inr.cast("long")).alias("_nr"),
        F.sum((inl & ~inr).cast("long")).alias("_rem"),
        F.sum((~inl & inr).cast("long")).alias("_add"),
        F.sum(both.cast("long")).alias("_match"),
    ]
    for c in cols:
        same = F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}"))
        aggs.append(F.sum((both & same).cast("long")).alias(f"_eq_{c}"))
    one = j.agg(*aggs)
    # key-uniqueness guard: joined rows == per-side key-distinct rows
    nl_distinct = left.select(*keys).distinct().count()
    nr_distinct = right.select(*keys).distinct().count()
    row = one.first()
    if row["_nl"] != nl_distinct or row["_nr"] != nr_distinct:
        raise DataFrameValidationError(
            "table_diff: key is not unique on one side "
            f"(left {row['_nl']} joined vs {nl_distinct} distinct, "
            f"right {row['_nr']} vs {nr_distinct})"
        )
    spark = left.sparkSession
    out_rows = [
        (
            "__rows__",
            int(row["_nl"]),
            int(row["_nr"]),
            int(row["_add"]),
            int(row["_rem"]),
            None,
            None,
        )
    ]
    for c in cols:
        eq = int(row[f"_eq_{c}"])
        out_rows.append(
            (
                c,
                int(row["_nl"]),
                int(row["_nr"]),
                int(row["_add"]),
                int(row["_rem"]),
                int(row["_match"]) - eq,
                eq,
            )
        )
    return spark.createDataFrame(
        out_rows,
        "column string, n_left long, n_right long, n_added long, "
        "n_removed long, n_changed long, n_unchanged long",
    )


def fd_violations(
    df: DataFrame,
    lhs_cols,
    rhs_col: str,
    max_examples: int = 0,
) -> DataFrame:
    """Check the functional dependency ``lhs → rhs``: every determinant
    group must carry exactly one rhs value (NULL is a value).

    Returns one summary row ``(n_groups, n_violating_groups, n_rows,
    n_violating_rows, holds)``; with ``max_examples > 0`` the violating
    determinant groups themselves (up to that many, ordered by group
    size desc then keys) are returned INSTEAD, as
    ``(lhs..., n_rhs_values, n_rows)``.

    Plan shape: ONE groupBy(lhs) with ``count(distinct rhs)`` — Spark
    plans this as the standard two-phase expand/aggregate; the summary
    fold is over the bounded group table. The example lane is a filter +
    ``TakeOrderedAndProject`` top-k on the same group table.
    """
    keys = [lhs_cols] if isinstance(lhs_cols, str) else list(lhs_cols)
    if not keys:
        raise DataFrameValidationError("fd_violations: lhs_cols must be non-empty")
    missing = [c for c in [*keys, rhs_col] if c not in df.columns]
    if missing:
        raise DataFrameValidationError(f"fd_violations: missing columns {missing}")
    rhs = F.coalesce(F.col(rhs_col).cast("string"), F.lit("\x00__null__"))
    groups = df.groupBy(*keys).agg(
        F.countDistinct(rhs).alias("n_rhs_values"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    if max_examples > 0:
        bad = groups.filter(F.col("n_rhs_values") > 1)
        return bad.orderBy(F.desc("n_rows"), *keys).limit(int(max_examples))
    viol = F.col("n_rhs_values") > 1
    out = groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(viol.cast("long")).alias("n_violating_groups"),
        F.sum("n_rows").alias("n_rows"),
        F.sum(F.when(viol, F.col("n_rows")).otherwise(F.lit(0))).alias(
            "n_violating_rows"
        ),
    )
    return out.select(
        "n_groups",
        "n_violating_groups",
        "n_rows",
        "n_violating_rows",
        (F.col("n_violating_groups") == 0).alias("holds"),
    )
