"""As-of join — match each left row to the most recent right row at or
before it (per key). Spark has no native ASOF JOIN (DuckDB/Pandas do), so
this is the documented composition: tag both sides, union, one window pass
with ``last(..., ignorenulls=True)`` over (key, time) order, keep left rows.

Why this shape at scale: the naive formulation — join on key with
``l.ts >= r.ts`` then argmax per left row — materializes O(|L|·|R|/keys)
pairs before reducing; the union+window form shuffles each row ONCE (by
key) and resolves the match in a single ordered scan per key partition.
The per-key partition is the skew caveat (same as every windowed op here):
a hot key serializes onto one task, so keys must be real entities (users,
devices), not constants.

The reference has no temporal operator; this generalizes its
take-most-recent-per-group file rule (newest plan output wins,
tbdedup/planner/output.py:26-78) to event time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    time_col: str,
    right_cols: list[str],
    suffix: str = "_r",
    tolerance_s: float | None = None,
) -> DataFrame:
    """For every ``left`` row: the ``right`` row with the greatest
    ``time_col`` <= left's ``time_col`` within the same ``by`` key
    (backward as-of). Left rows with no prior right row keep nulls.

    ``right_cols``: right-side payload columns to carry (appended with
    ``suffix``; the right ``time_col`` is carried as ``{time_col}{suffix}``).
    ``tolerance_s``: optional max allowed gap in seconds — matches older
    than it are nulled (pandas ``merge_asof`` semantics).

    Ties: two right rows at the identical timestamp resolve to the one
    later in (time, *right_cols) order — deterministic; pre-aggregate the
    right side if a different tie rule is needed.

    The carried right columns travel as ONE struct and the window takes
    ``last(struct, ignorenulls=True)`` — the match is row-atomic: a right row
    whose payload column is NULL carries that NULL (DuckDB/pandas ASOF
    semantics), instead of stitching ts from the newest right row with a
    value resolved independently from an older one (ADVICE r3).
    """
    from pyspark.sql import types as T

    carry = [time_col] + [c for c in right_cols if c != time_col]
    rc_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in carry])
    l_tag = left.withColumn("_is_l", F.lit(1)).withColumn(
        "__rc", F.lit(None).cast(rc_type)
    )
    r_tag = right.select(
        F.col(by),
        F.col(time_col),
        F.lit(0).alias("_is_l"),
        F.struct(*[F.col(c).alias(c) for c in carry]).alias("__rc"),
    )
    # left rows gain the right payload; right rows gain nulls for the left
    # columns they lack — align by name
    for c in l_tag.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(l_tag.schema[c].dataType))
    u = l_tag.unionByName(r_tag.select(*l_tag.columns))

    # right rows sort BEFORE left rows at the same timestamp (_is_l 0 < 1),
    # so an equal-time right row is eligible — the >= contract; struct
    # comparison is field-lexicographic, so the tie rule matches the
    # documented (time, *right_cols) order
    w = (
        Window.partitionBy(by)
        .orderBy(time_col, "_is_l", "__rc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.select(
        "*", F.last("__rc", ignorenulls=True).over(w).alias("__m")
    ).filter(F.col("_is_l") == 1)

    if tolerance_s is not None:
        # microsecond-precision gap: unix_timestamp truncates to whole
        # seconds (a 60.4s gap would pass tolerance_s=60 — ADVICE r3)
        in_tol = (
            F.unix_micros(F.col(time_col).cast("timestamp"))
            - F.unix_micros(F.col(f"__m.{time_col}").cast("timestamp"))
        ) <= int(float(tolerance_s) * 1_000_000)
        matched = matched.withColumn("__m", F.when(in_tol, F.col("__m")))

    keep = [c for c in left.columns]
    out = matched.select(
        *keep,
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in carry],
    )
    return out
