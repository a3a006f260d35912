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


def materialize_tiles(images: DataFrame, table: str = "tiles_bucketed",
                      buckets: int = 64, tile: int = 512,
                      compression: str = "deflate") -> None:
    """Persist the tiles relation bucketed (and sorted) by image_id: the
    pixel stage runs ONCE, the bucket shuffle is paid once at write time, and
    every later per-image operation — COG assembly (groupBy image_id),
    mask/metadata joins, repeated spatial-join feeds — reads pre-clustered
    buckets and plans with NO Exchange on the tiles side (asserted in
    tests). This is the pay-the-shuffle-once pattern for workloads that
    query the same tile relation many times without re-decoding pixels."""
    from ..operators.tiling import tile_images
    write_bucketed(tile_images(images, tile=tile, compression=compression),
                   table, "image_id", buckets=buckets)
