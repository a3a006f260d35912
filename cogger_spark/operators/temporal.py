"""Temporal operators: the point-in-time (as-of) join.

The as-of join — "for each left row, the latest right row at or before its
timestamp, per key" — is the classic operator Spark's join zoo lacks (kdb's
`aj`, Pandas `merge_asof`, DuckDB/QuestDB `ASOF JOIN`). Expressed here as a
composition of existing DataFrame ops (the union-and-fill-down form), per
the engine's custom-operator policy: built-ins first, Pandas kernels only
when semantics demand them.

Shape: union the tagged sides, sort within each key partition by
(ts, side) — right rows BEFORE left rows at equal timestamps so `>=`
semantics match DuckDB ASOF — and fill the right payload forward with
last(ignorenulls) over an unbounded-preceding running frame. One shuffle
keyed on the join key, window state bounded per key — the same cost as any
per-key sessionization, and the standard distributed as-of formulation.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              ts: str = "ts", payload: tuple[str, ...] = ("event_id", "value"),
              suffix: str = "_prior") -> DataFrame:
    """For each left row: the right row with the greatest `ts` <= the left
    row's `ts`, matched on `on` (ASOF LEFT JOIN — unmatched left rows keep
    null payloads). The right side must be unique per (on, ts) — with
    duplicates the winner is undefined, exactly like DuckDB ASOF.

    Returns all left columns plus each payload column as <name><suffix>.
    """
    l = left.withColumn("_side", F.lit(1))
    # a NULL-ts right row can never be "at or before" anything (DuckDB ASOF:
    # l.ts >= NULL is never true) — but in the fill-down union nulls sort
    # FIRST and would propagate to every left row (r5 self-review); drop
    # them. Null-ts LEFT rows sort to the head and correctly get no match.
    # The payload rides in ONE struct so every filled column comes from the
    # SAME right row — per-column last(ignorenulls) would stitch a NULL
    # field of the matched row together with an older row's value
    # (r5 self-review #2). The struct is built on the right side only, so
    # left rows carry a NULL struct (not a struct of nulls) after the
    # unionByName backfill and are transparent to the fill.
    r = (right.filter(F.col(ts).isNotNull())
         .select(on, ts, F.struct(*payload).alias("_pay"))
         .withColumn("_side", F.lit(0)))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(on).orderBy(ts, "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("_pay", F.last("_pay", ignorenulls=True).over(w))
    return (u.filter(F.col("_side") == 1)
            .select(*left.columns,
                    *[F.col(f"_pay.{c}").alias(f"{c}{suffix}")
                      for c in payload]))
