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
    r = right.filter(F.col(ts).isNotNull()).select(
        on, ts, *[F.col(c).alias(f"{c}{suffix}") for c in payload]) \
        .withColumn("_side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(on).orderBy(ts, "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in payload:
        u = u.withColumn(f"{c}{suffix}",
                         F.last(f"{c}{suffix}", ignorenulls=True).over(w))
    return (u.filter(F.col("_side") == 1).drop("_side")
            .select(*left.columns, *[f"{c}{suffix}" for c in payload]))
