"""Bucketed tables: co-located joins without a shuffle.

At the 10^12-row design point the tiles table is joined repeatedly on
image_id (assembly, mask merge, metrics). Persisting both sides bucketed by
the join key means Catalyst plans a SortMergeJoin with NO Exchange on either
side — the shuffle is paid once at write time and amortized over every later
join (asserted in tests by scanning the plan for Exchange nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 16,
                   sort: bool = True) -> None:
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previous session may have left the managed location behind (the
    # in-memory catalog forgets tables on restart, the filesystem doesn't)
    import shutil
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = wh.removeprefix("file:") + "/" + table
    shutil.rmtree(loc, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), key, how)
