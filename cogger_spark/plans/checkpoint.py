"""Per-partition checkpointing, lineage, and metrics (BASELINE.json:14).

The job plans work as hash buckets of image_id. Each bucket is one atomic
unit: its COG outputs land under out_dir/bucket=K/ and a completion row is
appended to the checkpoint table only after the bucket's write finishes.
Resume = planned ⟂ completed anti-join — re-running a half-finished job
processes exactly the missing buckets and the final output equals an
uninterrupted run (asserted in tests).

At cluster scale each bucket holds many images (buckets ~ O(10^3-10^4) at
10^12 rows); one Spark action per bucket keeps the checkpoint granularity
while each action is still a fully parallel job over its images.
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def with_bucket(images: DataFrame, n_buckets: int) -> DataFrame:
    """Deterministic work partitioning: bucket = pmod(xxhash64(image_id), n)."""
    return images.withColumn(
        "bucket", F.pmod(F.xxhash64("image_id"), F.lit(n_buckets)).cast("int"))


def plan_buckets(n_buckets: int) -> list[int]:
    return list(range(n_buckets))


def completed_buckets(ckpt_dir: str | pathlib.Path) -> list[int]:
    p = pathlib.Path(ckpt_dir)
    if not p.exists():
        return []
    out = []
    for f in sorted(p.glob("bucket_*.json")):
        rec = json.loads(f.read_text())
        if rec.get("status") == "done":
            out.append(int(rec["bucket"]))
    return out


def remaining_buckets(n_buckets: int, ckpt_dir) -> list[int]:
    done = set(completed_buckets(ckpt_dir))
    return [b for b in plan_buckets(n_buckets) if b not in done]


def _append_checkpoint(ckpt_dir, record: dict) -> None:
    p = pathlib.Path(ckpt_dir)
    p.mkdir(parents=True, exist_ok=True)
    tmp = p / f".bucket_{record['bucket']:05d}.tmp"
    tmp.write_text(json.dumps(record))
    tmp.rename(p / f"bucket_{record['bucket']:05d}.json")  # atomic publish


def run_checkpointed(spark: SparkSession, images: DataFrame, out_dir: str,
                     ckpt_dir: str, n_buckets: int,
                     job: Callable[[DataFrame], DataFrame],
                     stop_after: int | None = None) -> list[dict]:
    """Run `job` bucket-by-bucket with resume. `job` maps an images slice to
    an output DataFrame with an image_id column. Returns lineage records.

    stop_after simulates a crash after k buckets (tests only)."""
    bucketed = with_bucket(images, n_buckets)
    lineage = []
    todo = remaining_buckets(n_buckets, ckpt_dir)
    for i, b in enumerate(todo):
        if stop_after is not None and i >= stop_after:
            break
        t0 = time.time()
        part = bucketed.filter(F.col("bucket") == b).drop("bucket")
        out = job(part)
        path = f"{out_dir}/bucket={b}"
        out.write.mode("overwrite").parquet(path)
        n_out = spark.read.parquet(path).count()
        rec = {
            "bucket": b,
            "status": "done",
            "output_rows": n_out,
            "output_path": path,
            "wall_sec": round(time.time() - t0, 3),
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        _append_checkpoint(ckpt_dir, rec)
        lineage.append(rec)
    return lineage


def resume_delta(planned: DataFrame, completed: DataFrame,
                 key: str = "bucket") -> DataFrame:
    """planned ⟂ completed as a DataFrame anti-join — the declarative resume
    set (set-op role of SURVEY.md §2.6) used when the plan/progress tables
    live in Spark rather than on the driver."""
    return planned.join(completed, key, "left_anti")


def lineage_table(spark: SparkSession, ckpt_dir) -> DataFrame:
    """The checkpoint records as a queryable DataFrame (lineage table)."""
    p = pathlib.Path(ckpt_dir)
    rows = [json.loads(f.read_text()) for f in sorted(p.glob("bucket_*.json"))]
    if not rows:
        return spark.createDataFrame(
            [], "bucket int, status string, output_rows long, output_path string, "
                "wall_sec double, finished_at string")
    return spark.createDataFrame(rows)


def metrics_table(spark: SparkSession, ckpt_dir) -> DataFrame:
    """Aggregated job metrics from lineage (A7): buckets done, rows, wall."""
    lin = lineage_table(spark, ckpt_dir)
    return lin.agg(
        F.count(F.lit(1)).alias("buckets_done"),
        F.sum("output_rows").alias("rows_out"),
        F.round(F.sum("wall_sec"), 3).alias("wall_sec_total"),
        F.round(F.max("wall_sec"), 3).alias("wall_sec_max_bucket"))
