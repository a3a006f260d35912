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
    ("pip_join", oracles.PIP_JOIN),
    ("knn_join", oracles.KNN_JOIN),
    ("zonal_stats", oracles.ZONAL_STATS),
    ("phash_canonical", oracles.PHASH_CANONICAL),
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
