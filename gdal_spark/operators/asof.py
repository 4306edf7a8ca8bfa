"""As-of (temporal) join — the training-pipeline operator the reference
lacks (task brief: "an operator Spark lacks (e.g., as-of join)"; SURVEY
§2.3 lists range/as-of as the one uncovered join family).

asof_join(left, right): for every left row, the single most recent right
row of the same key with right.ts <= left.ts (backward direction,
inclusive) — pandas.merge_asof / DuckDB ASOF JOIN semantics, which is
also the exact oracle.

Spark-first shape: the classic union trick — tag both sides, union, ONE
shuffle (partitionBy key, orderBy (ts, side, seq)), then
last(right_value, ignorenulls=True) over the unbounded-preceding window
carries the latest right row forward onto each left row.  No join at
all, no per-key driver work; cost = one sort-shuffle of |L|+|R| rows.
Hot keys skew exactly like any keyed window — AQE + salting on the key
apply unchanged.  Ties: right rows at equal ts resolve to the largest
`seq_col` (deduped BEFORE the union so every engine agrees); a right
row at exactly left.ts matches (inclusive >=).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch_seconds(c: F.Column) -> F.Column:
    """Timestamp (LTZ or NTZ — parquet reads NTZ) -> epoch seconds as
    double; sessions run UTC so the NTZ->LTZ cast is deterministic."""
    return F.unix_micros(c.cast("timestamp_ltz")) / F.lit(1e6)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    seq_col: str | None = None,
    tolerance_seconds: float | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join.  Returns every left row plus
    `prefix`-named right value columns (null when no right row at or
    before the left timestamp, or outside `tolerance_seconds`)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    r = right
    if seq_col is not None:
        # deterministic tie rule at equal timestamps: keep max seq
        w_dedup = Window.partitionBy(on, right_ts).orderBy(F.col(seq_col).desc())
        r = (
            r.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(r.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
        F.lit(None).cast("timestamp").alias("_rt"),
    )
    r_tagged = r.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.col(right_ts).cast("timestamp").alias("_rt"),
    )
    u = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at the same timestamp -> inclusive
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
        for c in value_cols
    ]
    carried_rt = F.last("_rt", ignorenulls=True).over(w).alias("_match_t")
    out = (
        u.select("*", *carried, carried_rt)
        .filter(F.col("_side") == 1)
        .drop("_k", "_t", "_side", "_rt", *[f"_rv_{c}" for c in value_cols])
    )
    if tolerance_seconds is not None:
        stale = (
            _epoch_seconds(F.col(left_ts)) - _epoch_seconds(F.col("_match_t"))
            > float(tolerance_seconds)
        )
        out = out.select(
            *lcols,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(f"{prefix}{c}"))
                .alias(f"{prefix}{c}")
                for c in value_cols
            ],
        )
        return out
    return out.drop("_match_t")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Interval (range) join: every (point, interval) pair of the same
    key with start <= point_ts <= end — the other half of the range/
    as-of family.

    Scale shape (no inequality cross product): intervals explode to the
    epoch-time buckets they span (`bucket_seconds` wide); each point
    lives in exactly ONE bucket, so a plain (key, bucket) equi-join
    yields each candidate pair exactly once (no post-dedup), and the
    exact BETWEEN refine runs JVM-side on the joined rows.  Bucket width
    trades explode fan-out (long intervals -> many buckets) against
    candidate precision, exactly like the PIP cell grid; skewed keys
    fall to AQE skew-join handling.  how='left' keeps unmatched points
    with null interval columns (unmatched = by a unique per-row id, so
    NULLs in point payload columns can't double-emit a matched row)."""
    icols = [c for c in intervals.columns if c not in (on,)]
    b0 = F.floor(_epoch_seconds(F.col(start_col)) / bucket_seconds).cast("long")
    b1 = F.floor(_epoch_seconds(F.col(end_col)) / bucket_seconds).cast("long")
    iv = intervals.withColumn("_b", F.explode(F.sequence(b0, b1)))
    pt = points.withColumn(
        "_b",
        F.floor(_epoch_seconds(F.col(point_ts)) / bucket_seconds).cast("long"),
    )
    if how == "left":
        pt = pt.withColumn("_pid", F.monotonically_increasing_id())
    joined = pt.join(iv, [on, "_b"], "inner").filter(
        (F.col(point_ts) >= F.col(start_col))
        & (F.col(point_ts) <= F.col(end_col))
    )
    if how == "inner":
        return joined.drop("_b")
    if how != "left":
        raise ValueError(f"how must be inner or left, got {how!r}")
    matched = joined.drop("_b")
    missing = pt.drop("_b").join(
        matched.select("_pid").distinct(), "_pid", "left_anti"
    )
    for c in icols:
        missing = missing.withColumn(c, F.lit(None).cast(intervals.schema[c].dataType))
    return matched.unionByName(missing).drop("_pid")
