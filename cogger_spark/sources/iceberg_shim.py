"""Iceberg-semantics shim over partitioned Parquet (S8).

No iceberg-spark runtime jar exists in this environment (SURVEY.md §7), so
the engine ships a thin table layer with the Iceberg behaviors the north rule
actually relies on, over plain partitioned parquet:

* hidden partitioning: bucket(image_id) % N + the low-cardinality `fmt`
  column (FIXTURES.md) — readers filter on data columns and partition
  pruning happens underneath;
* snapshot isolation + time travel: every append writes a new snapshot JSON
  listing its files; reads pin a snapshot (default: latest) and only read
  its files;
* metadata tables: snapshots / files (row counts per partition);
* row-level ops: upsert = copy-on-write MERGE at FILE granularity (only the
  bucket partitions holding affected keys are rewritten; all other files
  carry into the new snapshot untouched) with `removed` file lists folded
  by readers in sequence order;
* incremental scans: rows added strictly between two snapshots.

The public API (write_table / append / read_table / snapshots) is the seam:
swap the implementation for real Iceberg catalog calls when the runtime jar
is present — call sites don't change.
"""

from __future__ import annotations

import json
import pathlib
import time
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

META = "_shim_metadata"


def _meta_dir(path) -> pathlib.Path:
    return pathlib.Path(path) / META


def _snapshot_files(path, snapshot_id: str | None):
    md = _meta_dir(path)
    snaps = sorted(md.glob("snap_*.json"))
    if not snaps:
        raise FileNotFoundError(f"no snapshots under {path}")
    chain = [json.loads(s.read_text()) for s in snaps]
    if snapshot_id is None:
        chosen = chain
    else:
        chosen = []
        for rec in chain:
            chosen.append(rec)
            if rec["snapshot_id"] == snapshot_id:
                break
        else:
            raise KeyError(f"snapshot {snapshot_id} not found")
    files: list[str] = []
    for rec in chosen:
        # fold removals in sequence order (row-level ops replace files)
        removed = set(rec.get("removed", []))
        if removed:
            files = [f for f in files if f not in removed]
        files.extend(rec["files"])
    return files, chain


def write_table(df: DataFrame, path: str, n_buckets: int = 16,
                partition_cols=("fmt",)) -> str:
    """Create the table: partition by (fmt, bucket(image_id)%N), snapshot 0."""
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)
    return append(df, path, n_buckets=n_buckets, partition_cols=partition_cols,
                  overwrite=True)


def append(df: DataFrame, path: str, n_buckets: int = 16,
           partition_cols=("fmt",), overwrite: bool = False) -> str:
    snap_id = uuid.uuid4().hex[:12]
    data_dir = pathlib.Path(path) / f"data_{snap_id}"
    out = df.withColumn(
        "p_bucket", F.pmod(F.xxhash64("image_id"), F.lit(n_buckets)).cast("int"))
    (out.write.mode("overwrite")
        .partitionBy(*partition_cols, "p_bucket")
        .parquet(str(data_dir)))
    files = [str(p.relative_to(path)) for p in data_dir.rglob("*.parquet")]
    md = _meta_dir(path)
    if overwrite and md.exists():
        for f in md.glob("snap_*.json"):
            f.unlink()
    md.mkdir(parents=True, exist_ok=True)
    seq = len(list(md.glob("snap_*.json")))
    rec = {
        "snapshot_id": snap_id,
        "sequence": seq,
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "operation": "overwrite" if overwrite else "append",
        "files": files,
        "partition_spec": list(partition_cols) + [f"bucket(image_id)%{n_buckets}"],
        # schema evolution record: the columns this snapshot's writer saw
        # (add-column appends show up here; older snapshots keep theirs)
        "schema": [[f.name, f.dataType.simpleString()] for f in df.schema],
    }
    (md / f"snap_{seq:05d}_{snap_id}.json").write_text(json.dumps(rec))
    return snap_id


def read_table(spark: SparkSession, path: str,
               snapshot_id: str | None = None) -> DataFrame:
    """Read a snapshot (default latest). Filters on fmt / p_bucket prune
    partitions; `bucket_for` computes the bucket of an image_id so point
    lookups can prune to one directory."""
    files, _ = _snapshot_files(path, snapshot_id)
    by_root: dict[str, list[str]] = {}
    for f in files:
        root = f.split("/", 1)[0]  # data_<snapshot> dir
        by_root.setdefault(root, []).append(f"{path}/{f}")
    df = None
    # insertion order == chain (chronological) order: evolved columns land
    # after the original schema, deterministically
    for root, group in by_root.items():
        part = (spark.read
                .option("basePath", f"{path}/{root}")
                .parquet(*group))
        # schema evolution: columns added by later appends are null-backfilled
        # for rows written before the column existed (Iceberg add-column)
        df = part if df is None else df.unionByName(part,
                                                    allowMissingColumns=True)
    return df


def bucket_for(image_id_col, n_buckets: int = 16):
    return F.pmod(F.xxhash64(image_id_col), F.lit(n_buckets)).cast("int")


def snapshots(spark: SparkSession, path: str) -> DataFrame:
    _, chain = _snapshot_files(path, None)
    rows = [{k: v for k, v in rec.items() if k != "files"} | {"n_files": len(rec["files"])}
            for rec in chain]
    return spark.createDataFrame(rows)


def files_table(spark: SparkSession, path: str) -> DataFrame:
    files, _ = _snapshot_files(path, None)
    rows = [{"file": f} for f in files]
    return spark.createDataFrame(rows)


def _write_snapshot(path, files: list[str], operation: str,
                    partition_spec: list, removed: list[str] | None = None,
                    snap_id: str | None = None,
                    schema: list | None = None) -> str:
    import time as _time
    snap_id = snap_id or uuid.uuid4().hex[:12]
    md = _meta_dir(path)
    md.mkdir(parents=True, exist_ok=True)
    seq = len(list(md.glob("snap_*.json")))
    rec = {
        "snapshot_id": snap_id,
        "sequence": seq,
        "timestamp": _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()),
        "operation": operation,
        "files": files,
        "removed": removed or [],
        "partition_spec": partition_spec,
        "schema": schema or [],
    }
    (md / f"snap_{seq:05d}_{snap_id}.json").write_text(json.dumps(rec))
    return snap_id


def upsert(spark: SparkSession, df: DataFrame, path: str,
           n_buckets: int = 16, partition_cols=("fmt",),
           key: str = "image_id") -> str:
    """Row-level MERGE (matched → replace, unmatched → insert) with
    Iceberg's copy-on-write FILE granularity: only the bucket partitions
    that can contain an affected key are rewritten — every other data file
    is carried into the new snapshot untouched (its bytes are never read or
    moved). Readers pinned to earlier snapshots keep seeing the old rows
    (snapshot isolation); the new snapshot lists the rewritten buckets'
    files as removed + their replacements as added."""
    cur_files, _ = _snapshot_files(path, None)
    buckets = {r[0] for r in
               df.select(bucket_for(F.col(key), n_buckets)).distinct().collect()}
    affected = [f for f in cur_files
                if any(f"/p_bucket={b}/" in f"/{f}" for b in buckets)]
    kept = None
    if affected:
        by_root: dict[str, list[str]] = {}
        for f in affected:
            by_root.setdefault(f.split("/", 1)[0], []).append(f"{path}/{f}")
        for root, group in sorted(by_root.items()):
            part = (spark.read.option("basePath", f"{path}/{root}")
                    .parquet(*group))
            kept = part if kept is None else kept.unionByName(part)
        kept = kept.join(df.select(F.col(key)), key, "left_anti") \
                   .drop("p_bucket")
    merged = df if kept is None else kept.unionByName(
        df, allowMissingColumns=True)
    snap_id = uuid.uuid4().hex[:12]
    data_dir = pathlib.Path(path) / f"data_{snap_id}"
    out = merged.withColumn("p_bucket", bucket_for(F.col(key), n_buckets))
    (out.write.mode("overwrite")
        .partitionBy(*partition_cols, "p_bucket")
        .parquet(str(data_dir)))
    new_files = [str(p.relative_to(path)) for p in data_dir.rglob("*.parquet")]
    return _write_snapshot(
        path, new_files, "overwrite",
        list(partition_cols) + [f"bucket({key})%{n_buckets}"],
        removed=affected, snap_id=snap_id,
        schema=[[f.name, f.dataType.simpleString()] for f in merged.schema])


def expire_snapshots(path: str, keep_last: int = 1) -> dict:
    """Iceberg table maintenance: drop all but the newest `keep_last`
    snapshots' METADATA and delete data files no longer referenced by any
    surviving snapshot (expireSnapshots + the orphan sweep). Time travel to
    expired snapshots stops working — that is the point (bounded metadata +
    storage). The surviving snapshots' effective file lists are preserved
    exactly: the oldest survivor is rewritten as an 'overwrite' snapshot
    carrying its fold-down (files minus later removals are NOT collapsed —
    removals only fold at read time, so later survivors stay correct).
    Returns {"expired": n_snapshots, "deleted_files": n_files}."""
    md = _meta_dir(path)
    snaps = sorted(md.glob("snap_*.json"))
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if len(snaps) <= keep_last:
        return {"expired": 0, "deleted_files": 0}
    cut = len(snaps) - keep_last
    chain = [json.loads(s.read_text()) for s in snaps]
    # effective file list AT the oldest survivor (removals folded)
    base_files: list[str] = []
    for rec in chain[:cut + 1]:
        removed = set(rec.get("removed", []))
        if removed:
            base_files = [f for f in base_files if f not in removed]
        base_files.extend(rec["files"])
    # files referenced by ANY survivor = base ∪ later additions
    referenced = set(base_files)
    for rec in chain[cut + 1:]:
        referenced.update(rec["files"])
    # every file any expired-or-survivor snapshot ever added
    all_files = {f for rec in chain for f in rec["files"]}
    orphans = sorted(all_files - referenced)
    root = pathlib.Path(path)
    deleted = 0
    for f in orphans:
        p = root / f
        if p.exists():
            p.unlink()
            deleted += 1
        # sweep now-empty partition/data dirs up to (not incl.) the table root
        parent = p.parent
        while parent != root and parent.exists() and not any(parent.iterdir()):
            parent.rmdir()
            parent = parent.parent
    # rewrite the oldest survivor with its folded file list, drop the rest
    survivor = chain[cut]
    survivor = {**survivor, "files": base_files, "removed": [],
                "operation": "overwrite"}
    for s in snaps[:cut]:
        s.unlink()
    snaps[cut].write_text(json.dumps(survivor))
    return {"expired": cut, "deleted_files": deleted}


def compact_data_files(spark: SparkSession, path: str, n_buckets: int = 16,
                       partition_cols=("fmt",), key: str = "image_id") -> str:
    """Iceberg rewrite_data_files (bin-pack compaction): after many small
    appends the snapshot chain references many tiny parquet files; rewrite
    the CURRENT effective rows into one fresh partitioned layout and commit
    it as a new overwrite snapshot that removes every prior file. Readers
    pinned to earlier snapshots still see the old files (run
    expire_snapshots afterwards to reclaim them); the latest-read rows are
    identical before and after (asserted in tests)."""
    cur_files, _ = _snapshot_files(path, None)
    df = read_table(spark, path).drop("p_bucket")
    snap_id = uuid.uuid4().hex[:12]
    data_dir = pathlib.Path(path) / f"data_{snap_id}"
    out = df.withColumn("p_bucket", bucket_for(F.col(key), n_buckets))
    # the bin-pack itself: route each hive partition's rows to one task so
    # the writer emits ONE file per (partition_cols, bucket), not one per
    # input split that happens to hold some of its rows
    (out.repartition(*partition_cols, "p_bucket")
        .write.mode("overwrite")
        .partitionBy(*partition_cols, "p_bucket")
        .parquet(str(data_dir)))
    new_files = [str(p.relative_to(path)) for p in data_dir.rglob("*.parquet")]
    return _write_snapshot(
        path, new_files, "replace",
        list(partition_cols) + [f"bucket({key})%{n_buckets}"],
        removed=list(cur_files), snap_id=snap_id,
        schema=[[f.name, f.dataType.simpleString()] for f in df.schema])


def incremental_read(spark: SparkSession, path: str, from_snapshot: str,
                     to_snapshot: str | None = None) -> DataFrame:
    """Iceberg incremental scan: the rows ADDED strictly after
    `from_snapshot` up to `to_snapshot` (default: latest) — the feed a
    downstream incremental job consumes instead of rescanning the table.
    Only append/overwrite-added files in that snapshot range are read.
    Copy-on-write caveat (same as real Iceberg COW incremental scans): an
    upsert's rewritten-bucket files count as added, so unchanged rows that
    shared a bucket with a correction reappear in the feed."""
    _, chain = _snapshot_files(path, None)
    ids = [rec["snapshot_id"] for rec in chain]
    if from_snapshot not in ids:
        raise KeyError(f"snapshot {from_snapshot} not found")
    if to_snapshot is not None and to_snapshot not in ids:
        raise KeyError(f"snapshot {to_snapshot} not found")
    start = ids.index(from_snapshot) + 1
    end = len(chain) if to_snapshot is None else ids.index(to_snapshot) + 1
    files = [f for rec in chain[start:end] for f in rec["files"]]
    if not files:
        # "nothing added since from_snapshot" is a normal polling state —
        # return an empty frame with the range-end snapshot's schema, not an
        # error (ADVICE r3)
        return read_table(spark, path, snapshot_id=to_snapshot).limit(0)
    by_root: dict[str, list[str]] = {}
    for f in files:
        by_root.setdefault(f.split("/", 1)[0], []).append(f"{path}/{f}")
    df = None
    for root, group in by_root.items():  # chronological (chain) order
        part = (spark.read.option("basePath", f"{path}/{root}")
                .parquet(*group))
        df = part if df is None else df.unionByName(part,
                                                    allowMissingColumns=True)
    return df
