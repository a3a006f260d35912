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
              suffix: str = "_prior", direction: str = "backward",
              tolerance=None) -> DataFrame:
    """For each left row: the matching right row per `direction`, matched
    on `on` (ASOF LEFT JOIN — unmatched left rows keep null payloads):

    * "backward" (default): greatest right `ts` <= the left row's `ts`
      (DuckDB ASOF / pandas merge_asof default);
    * "forward": smallest right `ts` >= the left row's `ts`.

    `tolerance` (a pyspark Column interval or SQL interval string, e.g.
    ``F.expr("INTERVAL 10 MINUTES")`` or ``"INTERVAL 10 MINUTES"``) bounds
    the match like pandas merge_asof: a right row further than that from
    the left timestamp yields NO match. The right side must be unique per
    (on, ts) — with duplicates the winner is undefined, exactly like
    DuckDB ASOF.

    Returns all left columns plus each payload column as <name><suffix>.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if "_ts" in payload:
        raise ValueError(
            "payload column '_ts' collides with the matched-timestamp "
            "field the join carries for the tolerance cut — rename it")
    for c in ("_side", "_pay"):
        if c in left.columns:
            # a pre-existing _side/_pay on the left would silently shadow
            # the union/fill bookkeeping (the left's own _pay survives the
            # backfill) instead of failing loudly — mirror the _ts guard.
            raise ValueError(
                f"left column '{c}' is reserved by asof_join — rename it")
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
    # unionByName backfill and are transparent to the fill. The matched
    # right timestamp rides as _pay._ts for the tolerance cut.
    r = (right.filter(F.col(ts).isNotNull())
         .select(on, ts,
                 F.struct(F.col(ts).alias("_ts"), *payload).alias("_pay"))
         .withColumn("_side", F.lit(0)))
    u = l.unionByName(r, allowMissingColumns=True)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal ts -> >= matches
        w = Window.partitionBy(on).orderBy(F.col(ts).asc(), F.col("_side"))
    else:
        # descending ts: the fill-down carries the SMALLEST right ts that
        # is still >= the left ts; null left ts sorts LAST (desc) and sees
        # only... nothing? no — nulls sort first in asc, LAST in desc, so
        # a null-ts left row would inherit the final fill. Exclude it
        # explicitly below via the null guard on the left ts.
        w = Window.partitionBy(on).orderBy(F.col(ts).desc(), F.col("_side"))
    u = u.withColumn("_pay", F.last("_pay", ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    matched = F.col("_pay").isNotNull() & F.col(ts).isNotNull()
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        gap = (F.col(ts) - F.col("_pay._ts") if direction == "backward"
               else F.col("_pay._ts") - F.col(ts))
        matched = matched & (gap <= tol)
    pay = F.when(matched, F.col("_pay"))
    return (u.filter(F.col("_side") == 1)
            .select(*left.columns,
                    *[pay.getField(c).alias(f"{c}{suffix}")
                      for c in payload]))
