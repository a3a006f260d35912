"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship query over /root/testdata/sf0.001 parquet.
queries()         — every implemented operator from SURVEY.md §2 as
                    (spark, sf_dir) -> DataFrame callables.
oracle_sql()      — matching DuckDB SQL for the oracle-checkable subset
                    (LSH-bucketed paths and binary COG assembly are
                    non-SQL-expressible → rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the training-data curation pass over the sf0.001 documents
    table — quality scoring ⋈ token stats ⋈ fingerprints ⋈ repeated-passage
    contamination, with exact-dedup canonical flags. (The COG tiling
    flagship runs in queries()['cog_assembly_summary'] and the pytest suite;
    this entry point exercises the document side end-to-end on the
    driver-provided tables.)"""
    from cogger_spark.operators.dedup import duplicated_span_ratio, exact_dedup
    from cogger_spark.operators.text import fingerprint, quality_score, token_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = quality_score(docs)
    t = token_stats(docs)
    fp = fingerprint(docs)
    contam = duplicated_span_ratio(docs).select("doc_id", "dup_ratio")
    canon = exact_dedup(docs).select("doc_id").withColumn(
        "is_canonical", F.lit(True))
    return (q.join(t, "doc_id").join(fp, "doc_id")
            .join(contam, "doc_id", "left")
            .join(canon, "doc_id", "left")
            .withColumn("dup_ratio", F.coalesce("dup_ratio", F.lit(0.0)))
            .withColumn("is_canonical", F.coalesce("is_canonical", F.lit(False)))
            .select("doc_id", "lang", "quality", "stop_ratio", "n_tokens",
                    "n_distinct_tokens", "avg_token_len", "md5_fp",
                    "rolling_fp", "dup_ratio", "is_canonical"))


def _q_cog_assembly_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full COG pipeline (decode → pyramid → tiles → per-image blobs) over
    the committed image fixtures, reconciled against the closed-form manifest
    oracle: the ASSEMBLED outputs' tile/level counts must equal the SQL
    expectation (A3/A4). Byte-level exactness of the blobs themselves is
    pinned by the golden-fixture pytest suite (not SQL-expressible)."""
    from cogger_spark.fixtures import FIXTURE_DIR, ensure_test_fixtures
    from cogger_spark.operators.tiling import cog_pipeline
    ensure_test_fixtures()
    images = spark.read.parquet(str(FIXTURE_DIR / "images_test.parquet"))
    cogs = cog_pipeline(images, tile=512)
    return cogs.select("image_id", F.col("n_tiles").cast("long").alias("n_tiles"),
                       F.col("n_levels").cast("long").alias("n_levels"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cogger_spark.queries import ALL_QUERIES
    out = dict(ALL_QUERIES)
    out["cog_assembly_summary"] = _q_cog_assembly_summary
    return out


def oracle_sql() -> dict[str, str]:
    from cogger_spark import oracles as o
    return {
        # tiling / ordering / offsets (fixture-backed, fixed absolute paths)
        "tile_manifest": o.TILE_MANIFEST,
        "dataset_stats": o.DATASET_STATS,
        "point_grid_counts": o.POINT_GRID_COUNTS,
        "points_within_radius": o.DISTANCE_JOIN,
        "tile_offsets_raw": o.TILE_OFFSETS_RAW,
        # planar (PlanarConfiguration=2) production: per-band tiles,
        # plane-extended W1 order key, ghost-free prefix sums
        "tile_offsets_planar": o.TILE_OFFSETS_PLANAR,
        "tile_pixel_sums": o.TILE_PIXEL_SUMS,
        # the same stats forced through the oversized-image strip route —
        # strip decomposition must be invisible in the numbers
        "tile_pixel_sums_strips": o.TILE_PIXEL_SUMS,
        # spatial joins
        "pip_join": o.PIP_JOIN,
        "knn_join": o.KNN_JOIN,
        "knn_adaptive": o.KNN_ADAPTIVE,
        "zonal_stats": o.ZONAL_STATS,
        # pixel-level zonal stats: zone pairing x closed-form decoded-pixel
        # stats (sum/count/min/max/mean over the zone's overlapping tiles)
        "zonal_pixel_stats": o.ZONAL_PIXEL_STATS,
        "phash_canonical": o.PHASH_CANONICAL,
        # the documents token kernel over image captions (multimodal text)
        "caption_token_stats": o.CAPTION_TOKEN_STATS,
        "dedup_images": o.DEDUP_IMAGES,
        # documents / embeddings (driver-registered views)
        "doc_token_stats": o.DOC_TOKEN_STATS,
        "doc_token_bpe": o.DOC_TOKEN_BPE,
        "doc_quality": o.DOC_QUALITY,
        "doc_langid": o.DOC_LANGID,
        "doc_fingerprint": o.DOC_FINGERPRINT,
        "vocab_counts": o.VOCAB_COUNTS,
        "bigram_counts": o.BIGRAM_COUNTS,
        "exact_dedup_docs": o.EXACT_DEDUP_DOCS,
        "ngram_jaccard_pairs": o.NGRAM_JACCARD_PAIRS,
        # repeated-passage detection: corpus-duplicated 5-grams + per-doc
        # contamination ratio (linear explode + hash agg, no pairwise work)
        "duplicate_ngrams": o.DUPLICATE_NGRAMS,
        "tfidf_top_terms": o.TFIDF_TOP_TERMS,
        "unigram_commonness": o.UNIGRAM_COMMONNESS,
        "benchmark_contamination": o.BENCHMARK_CONTAMINATION,
        # deterministic (hash-thresholded) data mixing + boundary-agnostic
        # causal-LM sequence packing (global token cumsum)
        "stratified_sample": o.STRATIFIED_SAMPLE,
        "pack_sequences": o.PACK_SEQUENCES,
        "dup_span_ratio": o.DUP_SPAN_RATIO,
        "dup_clusters": o.DUP_CLUSTERS,
        "embed_neardup": o.EMBED_NEARDUP,
        "embed_dup_clusters": o.EMBED_DUP_CLUSTERS,
        "ann_cosine_topk": o.ANN_COSINE_TOPK,
        # PQ/ADC ANN: exact re-rank + recall-1.0 shortlist at these params
        # means the output equals the exact top-k — checked against it
        "ann_pq_topk": o.ANN_COSINE_TOPK,
        # IVF at nprobe=n_lists probes every list (candidates = full corpus),
        # and IVF+PQ additionally keeps every candidate through the exact
        # re-rank (rerank > corpus) — both outputs EQUAL the exact top-k, so
        # the brute-force oracle is an exact check for these registrations
        "ann_ivf_topk": o.ANN_COSINE_TOPK,
        "ann_ivf_pq_topk": o.ANN_COSINE_TOPK,
        # BPE training: 12 merge rounds unrolled as chained materialized CTEs
        "bpe_merges": o.BPE_MERGES,
        # generic relational
        "pricing_summary": o.PRICING_SUMMARY,
        "orders_topk_per_customer": o.ORDERS_TOPK_PER_CUSTOMER,
        "nation_revenue": o.NATION_REVENUE,
        "events_by_type": o.EVENTS_BY_TYPE,
        "events_sessionize": o.EVENTS_SESSIONIZE,
        # as-of join vs DuckDB's NATIVE ASOF LEFT JOIN
        "events_asof_purchase": o.EVENTS_ASOF_PURCHASE,
        # forward as-of + tolerance vs the defining LATERAL subquery form
        "events_asof_next": o.EVENTS_ASOF_NEXT,
        "events_hourly_rollup": o.EVENTS_HOURLY_ROLLUP,
        "events_value_median": o.EVENTS_VALUE_MEDIAN,
        # LSH paths, checked against exact closures: the minhash oracle is
        # the unblocked all-pairs Jaccard >= t (recall AND precision == 1);
        # the simhash oracle recomputes signatures in SQL (md5-based token
        # hash) and takes the full hamming<=3 closure (pigeonhole blocking
        # is lossless at this distance)
        "minhash_lsh_dedup": o.MINHASH_LSH_DEDUP,
        "simhash_pairs": o.SIMHASH_PAIRS,
        # assembled COG tile/level counts vs the closed-form manifest
        "cog_assembly_summary": o.COG_ASSEMBLY_SUMMARY,
        # LSH at exhaustive probe width (probe = all 2^N_PLANES buckets)
        # yields candidates = corpus, so the exact re-rank equals the exact
        # top-k and the brute-force oracle applies (same trick as IVF/IVF+PQ);
        # the approximate configuration's recall is pinned in pytest.
        "ann_lsh_topk": o.ANN_COSINE_TOPK,
    }
