"""Distributed per-group top-k without a single-task-per-group sort.

The naive `Window.partitionBy(group).orderBy(order)` + row_number plan
shuffles EVERY candidate of a group into one task which then sorts the
whole group — for kNN/ANN re-ranks the group is a query id and the task
ends up sorting the query's entire candidate set (the whole corpus for a
brute-force scan). This module replaces it with the standard two-phase
reduction:

  stage 1 — salted partial top-k: candidates hash into `salt_parts`
  sub-keys per group; each (group, salt) cell keeps only its k best via
  array_sort(collect_list(struct(order..., payload...)))[1..k]. The
  shuffle spreads each group over salt_parts tasks and no task ever
  holds more than its cell's candidates.

  stage 2 — final merge: at most salt_parts * k pre-sorted rows per
  group flow into a tiny agg that sorts and slices again.

Everything is JVM-side (collect_list/array_sort/slice are codegen'd
aggregates); ranks come from posexplode. Order columns must be placed
first in the struct (array_sort on structs compares fields left to
right, ascending) — callers negate columns for descending order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def topk_per_group(
    cand: DataFrame,
    group_cols: list[str],
    order_cols: list[Column | str],
    payload_cols: list[str],
    k: int,
    salt_col: Column | None = None,
    salt_parts: int = 64,
) -> DataFrame:
    """Return top-k rows per group: group_cols + payload_cols + rank.

    order_cols: ascending sort keys (negate for descending). salt_col
    defaults to a hash of the first payload column.
    """
    o_named = [
        (c if isinstance(c, Column) else F.col(c)).alias(f"_o{i}")
        for i, c in enumerate(order_cols)
    ]
    pay = [F.col(p).alias(p) for p in payload_cols]
    if salt_col is None:
        salt_col = F.pmod(F.xxhash64(payload_cols[0]), F.lit(salt_parts))
    s = cand.select(
        *group_cols,
        salt_col.alias("_salt"),
        F.struct(*o_named, *pay).alias("_o"),
    )
    part = s.groupBy(*group_cols, "_salt").agg(
        F.slice(F.array_sort(F.collect_list("_o")), 1, k).alias("_top")
    )
    fin = part.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("_top"))), 1, k).alias("_top")
    )
    out = fin.select(
        *group_cols, F.posexplode("_top").alias("_pos", "_o")
    )
    return out.select(
        *group_cols,
        *[F.col(f"_o.{p}").alias(p) for p in payload_cols],
        (F.col("_pos") + 1).cast("int").alias("rank"),
    )
