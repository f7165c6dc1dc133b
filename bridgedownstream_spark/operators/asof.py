"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB and Pandas do); the naive
emulations are a non-equi join (explodes into a range scan per row) or a
broadcast (caps the right side). The scale-canonical plan is the **union
trick**: tag both sides, union them, sort each key's timeline once, and
carry the latest right-side values forward with ``last(..., ignorenulls)``
over a running window. No join node exists in the plan at all —

    left ∪ right → ONE shuffle on key → per-key sort → narrow filter

so both sides may be arbitrarily large, the state is one row of carried
values per partition during the sort-based window scan, and skewed keys
are handled by the same AQE machinery as any single shuffle. Tie-break:
a right row AT the left timestamp matches (``<=`` semantics, DuckDB
``ASOF JOIN ... ON l.ts >= r.ts``), implemented by ordering right rows
before left rows at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    prefix: str = "asof_",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join. Output = every ``left`` row + ``{prefix}{c}`` for
    each right ``value_cols`` entry (NULL when no right row precedes).

    ``value_cols`` must not collide with left column names after
    prefixing; the timestamp columns may differ in name but must share a
    comparable type.

    ``tiebreak_cols`` (right-side column names) orders right rows that
    share a timestamp — the LAST row in that order wins. Resolving ties
    inside the window ordering instead of pre-deduping the right side
    keeps the whole operator at ONE exchange (a groupBy dedup would add
    its own shuffle, and the union destroys co-partitioning anyway).
    Without it, the winner among same-timestamp right rows is
    partition-order-dependent.
    """
    out_vals = [f"{prefix}{c}" for c in value_cols]
    clash = set(out_vals) & set(left.columns)
    if clash:
        raise ValueError(f"prefixed right columns collide with left: {sorted(clash)}")
    missing = set(tiebreak_cols or []) - set(value_cols)
    if missing:
        raise ValueError(f"tiebreak_cols must be in value_cols: {sorted(missing)}")

    from pyspark.sql import types as T

    # The carried payload is ONE struct holding the whole right row's
    # value columns — never the columns independently. Per-column
    # last(ignorenulls) would skip a NULL in one column while taking the
    # sibling columns from a NEWER right row, emitting a mixed
    # "frankenstein" row no right record ever contained; the struct is
    # non-null whenever a right row exists (even with all-NULL members),
    # so ignorenulls carries exactly the latest right ROW.
    vals_type = T.StructType([
        T.StructField(c, right.schema[c].dataType) for c in value_cols
    ])
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(vals_type).alias("__vals"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in key_cols else F.col(c)
          for c in lcols],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__vals"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right (side=0) sorts before left (side=1) at equal __ts → <= matches;
    # tiebreaks only reorder right rows within one (__ts, __side) group
    # (the struct is NULL on left rows, whose mutual order is irrelevant)
    order = [F.col("__ts"), F.col("__side")] + [
        F.col("__vals").getField(c) for c in (tiebreak_cols or [])
    ]
    w = (
        W.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        F.last("__vals", ignorenulls=True).over(w).alias("__vals"),
    )
    return carried.where(F.col("__side") == 1).select(
        *lcols,
        *[F.col("__vals").getField(c).alias(v)
          for c, v in zip(value_cols, out_vals)],
    )
