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
in any engine; callers pre-aggregate the right side to unique (key, ts).
``asof_join(validate=True)`` enforces that contract with one extra
aggregation (off by default — it costs a pass over the right side).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_micros(c: Column) -> Column:
    """Exact microsecond epoch for TIMESTAMP or TIMESTAMP_NTZ (the NTZ →
    LTZ cast is identity under the engine's fixed UTC session timezone,
    matching DuckDB's epoch() interpretation of naive timestamps)."""
    return F.unix_micros(c.cast("timestamp_ltz"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_prefix: str = "right_",
    validate: bool = False,
) -> DataFrame:
    """Left rows + latest right payload with right.ts <= left.ts per key.

    Right payload columns (everything except keys+ts) come back as
    ``{right_prefix}{col}``, plus ``{right_prefix}{ts_col}`` (the matched
    timestamp); all NULL when no right row precedes the left row.

    ``validate=True`` raises ValueError if the right side has duplicate
    (key, ts) rows — the contract that makes the matched payload
    deterministic — at the cost of one aggregation over the right side."""
    payload = [c for c in right.columns if c not in (*key_cols, ts_col)]
    if validate:
        dup = (
            right.groupBy(*key_cols, ts_col)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            r = dup[0]
            raise ValueError(
                "asof_join right side has duplicate (key, ts) rows, e.g. "
                f"{tuple(r[c] for c in key_cols)} @ {r[ts_col]} x{r['count']}; "
                "pre-aggregate the right side to unique (key, ts)"
            )
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


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    max_gap_seconds: float = 600,
    right_prefix: str = "right_",
) -> DataFrame:
    """All (left, right) pairs per key with |l.ts − r.ts| ≤ gap.

    A naive theta join on the time predicate is a per-key cross product
    — the classic range-join blowup. The scalable encoding buckets time
    by the gap width and turns the range predicate into an EQUI join:
    each right row is replicated into its bucket and both neighbors, the
    join runs on (key, bucket), and the exact |Δts| filter prunes the
    band. Any qualifying pair differs by at most one bucket, and each
    pair meets on exactly ONE replica (the left row's bucket), so no
    dedup pass is needed. Cost: 3× right replication + one hash join —
    instead of a cross product.

    Buckets and the verify filter both run on the exact microsecond
    epoch, with the gap rounded ONCE to integer microseconds
    (``round(max_gap_seconds * 1e6)``). Fractional gaps (0.5 s) are
    therefore exact rather than silently truncating to 0 in the verify
    gate, and the ±1-bucket completeness argument is airtight for any
    positive gap: |Δ_micros| ≤ gap_micros ⇒ the bucket indices differ by
    at most 1."""
    gap_micros = round(max_gap_seconds * 1_000_000)
    if gap_micros <= 0:
        raise ValueError(f"max_gap_seconds must be positive, got {max_gap_seconds}")
    gap_us = F.lit(gap_micros)
    payload = [c for c in right.columns if c not in (*key_cols, ts_col)]
    l = left.withColumn("_b", F.floor(_epoch_micros(F.col(ts_col)) / gap_us))
    r_bucket = F.floor(_epoch_micros(F.col(ts_col)) / gap_us)
    r = right.select(
        *key_cols,
        F.col(ts_col).alias(f"{right_prefix}{ts_col}"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in payload],
        F.explode(
            F.array(r_bucket - 1, r_bucket, r_bucket + 1)
        ).alias("_b"),
    )
    return (
        l.join(r, [*key_cols, "_b"])
        .filter(
            F.abs(
                _epoch_micros(F.col(ts_col))
                - _epoch_micros(F.col(f"{right_prefix}{ts_col}"))
            )
            <= gap_us
        )
        .drop("_b")
    )


def time_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    grains: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """(grain, bucket_start, n_events, total_value): hierarchical time
    rollup where each coarser grain re-aggregates the next FINER
    aggregate (sum of sums, sum of counts) — the hypertable
    continuous-aggregate pattern. The raw table is scanned once, for the
    finest grain; every coarser level reads rows(finer) ≪ rows(raw), so
    a day rollup over 100 TB of events costs one pass plus two
    aggregations of already-tiny tables."""
    finest = grains[0]
    level = (
        events.groupBy(F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(14,2)")).alias("_tv"),
        )
    )
    out = level.select(
        F.lit(finest).alias("grain"),
        "bucket_start",
        "n_events",
        F.col("_tv").cast("double").alias("total_value"),
    )
    for grain in grains[1:]:
        level = (
            level.groupBy(F.date_trunc(grain, F.col("bucket_start")).alias("bucket_start"))
            .agg(F.sum("n_events").alias("n_events"), F.sum("_tv").alias("_tv"))
        )
        out = out.unionByName(
            level.select(
                F.lit(grain).alias("grain"),
                "bucket_start",
                "n_events",
                F.col("_tv").cast("double").alias("total_value"),
            )
        )
    return out


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
