"""Spark queries vs DuckDB oracles — the same comparison the driver runs:
row count, column names, and order-insensitive values."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from cogger_spark import oracles, queries


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


def compare(spark_df, sql: str, float_tol: float = 0.0):
    got = _normalize(spark_df.toPandas())
    want = _normalize(duckdb.sql(sql).df())
    assert list(got.columns) == list(want.columns), \
        f"columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            if float_tol == 0.0:
                assert np.array_equal(g.to_numpy(), w.to_numpy()), f"col {c} differs"
            else:
                assert np.allclose(g.to_numpy(), w.to_numpy(), atol=float_tol,
                                   rtol=0), f"col {c} differs"
        else:
            assert g.astype(object).tolist() == w.astype(object).tolist(), \
                f"col {c} differs"


CASES = [
    ("tile_manifest", oracles.TILE_MANIFEST),
    ("tile_pixel_sums", oracles.TILE_PIXEL_SUMS),
    ("pip_join", oracles.PIP_JOIN),
    ("knn_join", oracles.KNN_JOIN),
    ("knn_adaptive", oracles.KNN_ADAPTIVE),
    ("zonal_stats", oracles.ZONAL_STATS),
    ("zonal_pixel_stats", oracles.ZONAL_PIXEL_STATS),
    ("phash_canonical", oracles.PHASH_CANONICAL),
    ("caption_token_stats", oracles.CAPTION_TOKEN_STATS),
    ("point_grid_counts", oracles.POINT_GRID_COUNTS),
    ("dedup_images", oracles.DEDUP_IMAGES),
]


@pytest.mark.parametrize("name,sql", CASES, ids=[c[0] for c in CASES])
def test_query_matches_oracle(spark, name, sql):
    compare(queries.SPATIAL_QUERIES[name](spark, "/root/testdata/sf0.01"), sql)


def test_tile_offsets_raw_matches_oracle(spark):
    # real pixel work on the Spark side vs closed-form SQL
    compare(queries.q_tile_offsets_raw(spark, "/root/testdata/sf0.01"),
            oracles.TILE_OFFSETS_RAW)


def test_tile_pixel_stats_match_numpy(spark, fixture_dir):
    """Per-tile pixel stats from the Spark kernel equal direct NumPy over the
    regenerated fixture pixels."""
    import numpy as np
    from cogger_spark import fixtures
    from cogger_spark.fixtures import FIXTURE_DIR
    from cogger_spark.operators.spatial import tile_pixel_stats
    images = spark.read.parquet(str(FIXTURE_DIR / "images_test.parquet")) \
        .filter("image_id in ('img_00000000','img_00000003','img_00000005')")
    got = {(r.image_id, r.ty, r.tx): (r.px_count, r.px_sum, r.px_min, r.px_max)
           for r in tile_pixel_stats(images, tile=512).collect()}
    for i in (0, 3, 5):
        w, h = fixtures.image_dims(i)
        px = fixtures.make_pixels(i, w, h, fixtures.n_bands(i),
                                  fixtures.has_mask(i))[:, :, :fixtures.n_bands(i)]
        for ty in range(-(-h // 512)):
            for tx in range(-(-w // 512)):
                b = px[ty * 512:(ty + 1) * 512, tx * 512:(tx + 1) * 512]
                k = (f"img_{i:08d}", ty, tx)
                assert got[k] == (b.size, int(b.sum(dtype=np.int64)),
                                  int(b.min()), int(b.max())), k


def test_zonal_pixel_stats_consistent(spark, fixture_dir):
    from cogger_spark.fixtures import FIXTURE_DIR
    from cogger_spark.operators.spatial import zonal_pixel_stats
    images = spark.read.parquet(str(FIXTURE_DIR / "images_test.parquet"))
    zones = spark.read.parquet(str(FIXTURE_DIR / "zones_test.parquet"))
    rows = zonal_pixel_stats(zones, images).collect()
    assert rows
    for r in rows:
        assert r.value_count > 0
        assert 0 <= r.value_min <= r.value_max <= 255
        assert abs(r.value_mean - r.value_sum / r.value_count) < 1e-6


def test_sql_api_over_engine_views(spark, fixture_dir):
    """The engine's relations compose with plain spark.sql (same Catalyst
    plans either way)."""
    from cogger_spark.fixtures import FIXTURE_DIR
    from cogger_spark.operators.spatial import tile_manifest
    images = spark.read.parquet(str(FIXTURE_DIR / "images_test.parquet"))
    tile_manifest(images, level=None).createOrReplaceTempView("tiles_v")
    spark.read.parquet(str(FIXTURE_DIR / "points_test.parquet")) \
        .createOrReplaceTempView("points_v")
    out = spark.sql("""
        SELECT t.image_id, COUNT(*) AS n_points
        FROM points_v p JOIN tiles_v t
          ON p.lon >= t.lon_min AND p.lon < t.lon_max
         AND p.lat >= t.lat_min AND p.lat < t.lat_max
        WHERE t.level = 0
        GROUP BY t.image_id ORDER BY n_points DESC LIMIT 5
    """).collect()
    assert out and out[0].n_points >= out[-1].n_points


def test_distance_join_lat_cell_coverage(spark):
    """Regression (r5 self-review, verified counter-example): the grid's
    LATITUDE cell is half the longitude cell, so sizing the resolution on
    the lon cell alone let in-range pairs sit two lat-cells apart — outside
    the 1-ring — and vanish. This exact pair (0.0495 deg apart at
    radius 0.05) must be found."""
    from cogger_spark.operators.spatial import distance_join
    pts = spark.createDataFrame(
        [(1, 10.0, 0.0430, "a"), (2, 10.0, 0.0925, "b"),
         (3, 120.0, 50.0, "c")],
        "point_id long, lon double, lat double, label string")
    got = {(r.point_a, r.point_b) for r in
           distance_join(pts, radius_deg=0.05).collect()}
    assert (1, 2) in got
    assert not any(3 in pair for pair in got)
