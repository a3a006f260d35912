"""Spark-side query registry: one callable per implemented operator.

Each function takes (spark, sf_dir) and returns a DataFrame whose columns
(names AND types) match the corresponding oracle in oracles.py exactly —
integral columns cast to long because the DuckDB mirrors emit BIGINT.

Image/point/zone queries run over the committed fixtures (same parquet the
oracles read); document/embedding queries use sf_dir tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .fixtures import FIXTURE_DIR, ensure_test_fixtures
from .operators import spatial
from .operators.tiling import tile_images, with_data_offsets, with_tile_order


def _images(spark: SparkSession) -> DataFrame:
    ensure_test_fixtures()
    return spark.read.parquet(str(FIXTURE_DIR / "images_test.parquet"))


def _points(spark: SparkSession) -> DataFrame:
    ensure_test_fixtures()
    return spark.read.parquet(str(FIXTURE_DIR / "points_test.parquet"))


def _zones(spark: SparkSession) -> DataFrame:
    ensure_test_fixtures()
    return spark.read.parquet(str(FIXTURE_DIR / "zones_test.parquet"))


def _longs(df: DataFrame, *cols: str) -> DataFrame:
    for c in cols:
        df = df.withColumn(c, F.col(c).cast("long"))
    return df


# --- tiling / ordering / offsets ------------------------------------------

def q_tile_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = spatial.tile_manifest(_images(spark), tile=512, level=None)
    return _longs(m, "level", "ty", "tx", "lw", "lh", "ntx", "nty", "px_w", "px_h")


def q_tile_offsets_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real pixel work (decode → pyramid → cut, compression='raw') checked
    against the closed-form SQL manifest: byte counts, the deterministic tile
    order (W1), and the prefix-sum data offsets (A1)."""
    imgs = _images(spark).filter(F.col("fmt") == "raw")
    tiles = with_data_offsets(with_tile_order(
        tile_images(imgs, tile=512, compression="raw")), ghost=True)
    out = tiles.select("image_id", "level", "plane", "ty", "tx",
                       "byte_count", "tile_rank", "data_offset")
    return _longs(out, "level", "plane", "ty", "tx", "byte_count",
                  "tile_rank", "data_offset")


# --- spatial joins ----------------------------------------------------------

def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiles = spatial.tile_manifest(_images(spark), tile=512, level=0)
    out = spatial.pip_join(_points(spark), tiles)
    return _longs(out, "level", "ty", "tx")


def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiles = spatial.tile_manifest(_images(spark), tile=512, level=0)
    out = spatial.knn_join(_points(spark), tiles, k=5, ring=2)
    out = out.withColumn("dist2", F.round("dist2", 12))
    return _longs(out, "level", "ty", "tx", "rank")


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    tiles = spatial.tile_manifest(_images(spark), tile=512, level=0)
    return spatial.zonal_stats(_zones(spark), tiles)


def q_phash_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial.phash_canonical(_images(spark))


def q_dedup_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial.dedup_images(_images(spark)).select(
        "image_id", "w", "h", "fmt", "phash")


SPATIAL_QUERIES = {
    "tile_manifest": q_tile_manifest,
    "tile_offsets_raw": q_tile_offsets_raw,
    "pip_join": q_pip_join,
    "knn_join": q_knn_join,
    "zonal_stats": q_zonal_stats,
    "phash_canonical": q_phash_canonical,
    "dedup_images": q_dedup_images,
}


def w_knn(spark: SparkSession, sf_dir: str) -> DataFrame:  # pragma: no cover
    return q_knn_join(spark, sf_dir)
