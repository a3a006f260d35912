#!/usr/bin/env python
"""Capture .explain('formatted') output for round-6 plan evidence
(plans/r06/<query>_{before,after}.txt)."""
import os
import sys

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

from cogger_spark.session import get_spark

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")
SF = "/root/testdata/sf0.1"


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("r06-plans", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from cogger_spark import queries as Q

    names = ["knn_adaptive", "knn_join", "minhash_lsh_dedup", "simhash_pairs",
             "ann_cosine_topk", "ann_pq_topk", "ngram_jaccard_pairs",
             "zonal_pixel_stats", "pip_join", "zonal_stats",
             "tile_pixel_sums", "dup_clusters", "embed_neardup",
             "ann_lsh_topk", "ann_ivf_topk", "ann_ivf_pq_topk",
             "embed_dup_clusters"]
    for name in names:
        try:
            df = Q.ALL_QUERIES[name](spark, SF)
            with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
                f.write(formatted(df))
            print("ok", name)
        except Exception as e:  # pragma: no cover
            print("FAIL", name, e)

    # operator-level plans not in the query registry
    from cogger_spark.operators.strips import next_level_strips, strips_level0
    from cogger_spark.operators.tiling import rewrite_tiffs
    from cogger_spark.sources.tiffdir import read_tiff_dir
    import pyspark.sql.functions as F

    giga = spark.read.parquet("/tmp/cogger_bench_giga/giga.parquet")
    slots = spark.sparkContext.defaultParallelism
    l0 = (strips_level0(giga, tile=512)
          .repartition(4 * slots, "image_id", "strip_id")
          .localCheckpoint(eager=True))
    with open(os.path.join(OUT, f"giga_next_level_{SUFFIX}.txt"), "w") as f:
        f.write(formatted(next_level_strips(l0, 1, tile=512)))
    print("ok giga_next_level")

    # capture under the bench's split sizing (1m) so the plan shows the
    # partitioning arm the bench actually executes
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    tiffs = read_tiff_dir(spark, "/tmp/cogger_bench_480/tiffs_raw")
    rw = rewrite_tiffs(tiffs).agg(F.sum("in_bytes"))
    with open(os.path.join(OUT, f"cog_rewrite_{SUFFIX}.txt"), "w") as f:
        f.write(formatted(rw))
    spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    spark.conf.set("spark.sql.files.openCostInBytes", "4194304")
    print("ok cog_rewrite")
    spark.stop()


if __name__ == "__main__":
    main()
