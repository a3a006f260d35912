"""DuckDB oracle SQL for the engine's queries.

Each string is ANSI SQL runnable by DuckDB 1.0 and mirrors the corresponding
Spark query *operation for operation* (same arithmetic shape, same join/
containment conventions) so row counts, schemas, and values match exactly.
The image/point/zone fixtures live at committed absolute paths (single
parquet files, generated bit-stably by fixtures.py) so both engines read the
same bytes; TPC-H-ish/documents/embeddings queries reference the driver's
pre-registered views.
"""

from __future__ import annotations

from .fixtures import FIXTURE_DIR

IMAGES = f"read_parquet('{FIXTURE_DIR}/images_test.parquet')"
POINTS = f"read_parquet('{FIXTURE_DIR}/points_test.parquet')"
ZONES = f"read_parquet('{FIXTURE_DIR}/zones_test.parquet')"

# ---------------------------------------------------------------------------
# shared CTE: the tile manifest in closed form (mirror of
# operators/spatial.py::tile_manifest — anchor arithmetic from functions/geo.py)
# ---------------------------------------------------------------------------

_MANIFEST_CTE = f"""
img AS (
  SELECT image_id, w, h, CAST(substr(image_id, 5, 8) AS BIGINT) AS img_idx
  FROM {IMAGES}
),
anchored AS (
  SELECT *,
    -175.0 + ((img_idx * 7919) % 3400) / 10.0  AS lon0,
    -85.0  + ((img_idx * 104729) % 1650) / 10.0 AS lat0,
    CAST(LEAST(
      GREATEST(0, CEIL(LOG2(w / 512.0)), CEIL(LOG2(h / 512.0))),
      GREATEST(0, CEIL(LOG2(LEAST(w, h) / 2.0)))
    ) AS INT) + 1 AS n_levels
  FROM img
),
levels AS (
  SELECT image_id, w, h, lon0, lat0, n_levels,
         UNNEST(generate_series(0, n_levels - 1)) AS level
  FROM anchored
),
ldims AS (
  SELECT *,
    CAST(CEIL(w / POW(2.0, level)) AS INT) AS lw,
    CAST(CEIL(h / POW(2.0, level)) AS INT) AS lh
  FROM levels
),
lgrid AS (
  SELECT *,
    CAST(CEIL(lw / 512.0) AS INT) AS ntx,
    CAST(CEIL(lh / 512.0) AS INT) AS nty
  FROM ldims
),
tys AS (
  SELECT *, UNNEST(generate_series(0, nty - 1)) AS ty FROM lgrid
),
txs AS (
  SELECT *, UNNEST(generate_series(0, ntx - 1)) AS tx FROM tys
),
manifest AS (
  SELECT image_id, level, ty, tx, lw, lh, ntx, nty,
    LEAST(512, lw - tx * 512) AS px_w,
    LEAST(512, lh - ty * 512) AS px_h,
    lon0 + tx * 512 * (0.001 * POW(2.0, level)) AS lon_min,
    lat0 + ty * 512 * (0.001 * POW(2.0, level)) AS lat_min,
    lon0 + (tx * 512 + LEAST(512, lw - tx * 512)) * (0.001 * POW(2.0, level)) AS lon_max,
    lat0 + (ty * 512 + LEAST(512, lh - ty * 512)) * (0.001 * POW(2.0, level)) AS lat_max
  FROM txs
)
"""

TILE_MANIFEST = f"""
WITH {_MANIFEST_CTE}
SELECT image_id, CAST(level AS BIGINT) AS level, CAST(ty AS BIGINT) AS ty,
       CAST(tx AS BIGINT) AS tx, CAST(lw AS BIGINT) AS lw, CAST(lh AS BIGINT) AS lh,
       CAST(ntx AS BIGINT) AS ntx, CAST(nty AS BIGINT) AS nty,
       CAST(px_w AS BIGINT) AS px_w, CAST(px_h AS BIGINT) AS px_h,
       lon_min, lat_min, lon_max, lat_max
FROM manifest
"""

TILE_OFFSETS_RAW = f"""
WITH {_MANIFEST_CTE},
rawimg AS (
  SELECT image_id, octet_length(bytes) // (w * h) AS planes_total
  FROM {IMAGES} WHERE fmt = 'raw'
),
planes AS (
  SELECT image_id,
    CASE WHEN planes_total IN (2, 5) THEN planes_total - 1 ELSE planes_total END AS planes,
    CASE WHEN planes_total IN (2, 5) THEN 1 ELSE 0 END AS has_mask
  FROM rawimg
),
tileplanes AS (
  SELECT m.image_id, m.level, m.ty, m.tx,
    UNNEST(generate_series(0, p.has_mask)) AS plane,
    p.planes
  FROM manifest m JOIN planes p ON m.image_id = p.image_id
),
sized AS (
  SELECT image_id, level, plane, ty, tx,
    CASE WHEN plane = 0 THEN 262144 * planes ELSE 262144 END AS byte_count
  FROM tileplanes
)
SELECT image_id, CAST(level AS BIGINT) AS level, CAST(plane AS BIGINT) AS plane,
  CAST(ty AS BIGINT) AS ty, CAST(tx AS BIGINT) AS tx,
  CAST(byte_count AS BIGINT) AS byte_count,
  CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS tile_rank,
  CAST(COALESCE(SUM(byte_count + 8) OVER
    (PARTITION BY image_id ORDER BY level DESC, ty, tx, plane
     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS data_offset
FROM sized
WINDOW w AS (PARTITION BY image_id ORDER BY level DESC, ty, tx, plane)
"""

PIP_JOIN = f"""
WITH {_MANIFEST_CTE}
SELECT p.point_id, p.label, t.image_id, CAST(t.level AS BIGINT) AS level,
       CAST(t.ty AS BIGINT) AS ty, CAST(t.tx AS BIGINT) AS tx, p.lon, p.lat
FROM {POINTS} p
JOIN manifest t
  ON p.lon >= t.lon_min AND p.lon < t.lon_max
 AND p.lat >= t.lat_min AND p.lat < t.lat_max
WHERE t.level = 0
"""

# bounded-radius kNN: candidates = tiles whose res-10 cell range intersects
# the point cell's Chebyshev-2 ring (grid arithmetic mirrors cells.grid_xy)
KNN_JOIN = f"""
WITH {_MANIFEST_CTE},
t0 AS (
  SELECT *,
    LEAST(GREATEST(CAST(FLOOR((lon_min + 180.0) / 360.0 * 1024) AS BIGINT), 0), 1023) AS x0,
    LEAST(GREATEST(CAST(FLOOR((lon_max + 180.0) / 360.0 * 1024) AS BIGINT), 0), 1023) AS x1,
    LEAST(GREATEST(CAST(FLOOR((lat_min + 90.0) / 180.0 * 1024) AS BIGINT), 0), 1023) AS y0,
    LEAST(GREATEST(CAST(FLOOR((lat_max + 90.0) / 180.0 * 1024) AS BIGINT), 0), 1023) AS y1
  FROM manifest WHERE level = 0
),
pts AS (
  SELECT *,
    LEAST(GREATEST(CAST(FLOOR((lon + 180.0) / 360.0 * 1024) AS BIGINT), 0), 1023) AS px,
    LEAST(GREATEST(CAST(FLOOR((lat + 90.0) / 180.0 * 1024) AS BIGINT), 0), 1023) AS py
  FROM {POINTS}
),
cand AS (
  SELECT p.point_id, t.image_id, t.level, t.ty, t.tx,
    (p.lon - (t.lon_min + t.lon_max) / 2.0) * (p.lon - (t.lon_min + t.lon_max) / 2.0)
    + (p.lat - (t.lat_min + t.lat_max) / 2.0) * (p.lat - (t.lat_min + t.lat_max) / 2.0)
      AS dist2
  FROM pts p JOIN t0 t
    ON t.x0 - 2 <= p.px AND p.px <= t.x1 + 2
   AND t.y0 - 2 <= p.py AND p.py <= t.y1 + 2
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER
    (PARTITION BY point_id ORDER BY dist2, image_id, ty, tx) AS rank
  FROM cand
)
SELECT point_id, image_id, CAST(level AS BIGINT) AS level, CAST(ty AS BIGINT) AS ty,
       CAST(tx AS BIGINT) AS tx, ROUND(dist2, 12) AS dist2,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""

ZONAL_STATS = f"""
WITH {_MANIFEST_CTE}
SELECT z.zone_id,
  CAST(COUNT(*) AS BIGINT) AS n_tiles,
  CAST(COUNT(DISTINCT t.image_id) AS BIGINT) AS n_images,
  CAST(SUM(CAST(t.px_w AS BIGINT) * t.px_h) AS BIGINT) AS px_sum
FROM {ZONES} z
JOIN manifest t
  ON t.lon_min < z.lon_max AND t.lon_max > z.lon_min
 AND t.lat_min < z.lat_max AND t.lat_max > z.lat_min
WHERE t.level = 0
GROUP BY z.zone_id
"""

PHASH_CANONICAL = f"""
SELECT phash, MIN(image_id) AS canonical_image_id, CAST(COUNT(*) AS BIGINT) AS dup_count
FROM {IMAGES}
GROUP BY phash
"""

DEDUP_IMAGES = f"""
SELECT image_id, w, h, fmt, phash FROM (
  SELECT image_id, w, h, fmt, phash,
    ROW_NUMBER() OVER (PARTITION BY phash ORDER BY image_id) AS rn
  FROM {IMAGES}
) WHERE rn = 1
"""
