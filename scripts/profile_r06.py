#!/usr/bin/env python
"""Round-6 profiling harness (guide 1.1/1.4/1.5): isolate the expensive
bench queries with the noop sink and stage-level decomposition. Not part of
the frozen bench contract — numbers feed OPTIMIZATION_r06.md only."""
import os
import sys
import time

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

from cogger_spark.session import get_spark


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, reps=2):
    best = None
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:45s} {best:7.3f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return best


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("r06-profile", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.1"

    import pyspark.sql.functions as F

    def small_splits(on=True):
        if on:
            spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
            spark.conf.set("spark.sql.files.openCostInBytes", "0")
        else:
            spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
            spark.conf.set("spark.sql.files.openCostInBytes", "4194304")

    if which in ("all", "giga"):
        from cogger_spark.operators.strips import (
            strips_level0, next_level_strips, strips_to_tiles,
            tile_images_strips)
        from cogger_spark.operators.tiling import (
            assemble_cog_parts, cog_pipeline_parts)
        small_splits(True)
        giga = spark.read.parquet("/tmp/cogger_bench_giga/giga.parquet")
        # warm
        timed(spark, "giga: warm full pipeline", lambda: noop(
            cog_pipeline_parts(giga, tile=512)), reps=1)
        timed(spark, "giga: full cog_pipeline_parts", lambda: noop(
            cog_pipeline_parts(giga, tile=512)))
        timed(spark, "giga: strips_level0 only", lambda: noop(
            strips_level0(giga, tile=512)))
        slots = spark.sparkContext.defaultParallelism

        def l0_ckpt():
            return (strips_level0(giga, tile=512)
                    .repartition(4 * slots, "image_id", "strip_id")
                    .localCheckpoint(eager=True))
        timed(spark, "giga: level0 +repart+ckpt", l0_ckpt)
        l0 = l0_ckpt()
        timed(spark, "giga: next_level_strips(1)", lambda: noop(
            next_level_strips(l0, 1, tile=512)))
        timed(spark, "giga: strips_to_tiles(l0 only)", lambda: noop(
            strips_to_tiles(l0, tile=512)))

        def full_tiles():
            return tile_images_strips(giga, tile=512).localCheckpoint(eager=True)
        t = timed(spark, "giga: tile_images_strips+ckpt", full_tiles)
        tiles = full_tiles()
        timed(spark, "giga: assemble_cog_parts(tiles)", lambda: noop(
            assemble_cog_parts(tiles, tile=512)))
        small_splits(False)

    if which in ("all", "rewrite"):
        from cogger_spark.operators.tiling import rewrite_tiffs
        from cogger_spark.sources.tiffdir import read_tiff_dir
        small_splits(True)
        tiffs = read_tiff_dir(spark, "/tmp/cogger_bench_480/tiffs_raw")
        timed(spark, "rewrite: warm", lambda: noop(rewrite_tiffs(tiffs)), reps=1)
        timed(spark, "rewrite: full (noop)", lambda: noop(rewrite_tiffs(tiffs)))
        timed(spark, "rewrite: agg in_bytes (bench shape)", lambda:
              rewrite_tiffs(tiffs).agg({"in_bytes": "sum"}).collect())
        # scan only: binaryFile read + length (forces content read? no — length
        # is metadata; use xxhash over content to force the read w/o python)
        timed(spark, "rewrite: JVM scan+crc only", lambda:
              tiffs.select(F.crc32("bytes")).agg({"*": "count"}).collect())
        # scan + ship to python, trivial kernel
        import pandas as pd

        def passthrough(batches):
            for pdf in batches:
                yield pd.DataFrame({"n": [sum(len(b) for b in pdf["bytes"])]})
        timed(spark, "rewrite: scan+arrow-to-python only", lambda:
              tiffs.select("image_id", "bytes").mapInPandas(
                  passthrough, "n long").agg({"n": "sum"}).collect())
        small_splits(False)

    if which in ("all", "queries"):
        from cogger_spark import queries as Q
        for name in ("knn_adaptive", "minhash_lsh_dedup", "simhash_pairs",
                     "ann_cosine_topk", "ann_pq_topk", "ngram_jaccard_pairs",
                     "zonal_pixel_stats", "knn_join", "pip_join",
                     "zonal_stats", "tile_manifest"):
            fn = Q.ALL_QUERIES[name]
            timed(spark, f"q: {name} (warm)", lambda fn=fn: fn(
                spark, sf_dir).count(), reps=1)
            timed(spark, f"q: {name}", lambda fn=fn: fn(spark, sf_dir).count())

    spark.stop()


if __name__ == "__main__":
    main()
