"""Iceberg-semantics shim over partitioned Parquet (S8).

No iceberg-spark runtime jar exists in this environment (SURVEY.md §7), so
the engine ships a thin table layer with the Iceberg behaviors the north rule
actually relies on, over plain partitioned parquet:

* hidden partitioning: bucket(image_id) % N + the low-cardinality `fmt`
  column (FIXTURES.md) — readers filter on data columns and partition
  pruning happens underneath;
* snapshot isolation + time travel: every append writes a new snapshot JSON
  listing its files; reads pin a snapshot (default: latest) and only read
  its files — by id (snapshot_id=) or by commit time (as_of=, the
  FOR SYSTEM_TIME AS OF form; see snapshot_as_of);
* metadata tables: snapshots / files (row counts per partition);
* row-level ops: upsert + predicate MERGE INTO (merge_into), copy-on-write
  at FILE granularity — the target scan is pruned by bucket (under each
  file's OWN snapshot spec) AND by manifest key-range bounds; all other
  files carry into the new snapshot untouched, with `removed` file lists
  folded by readers in sequence order; key-duplicated sources are rejected
  (Iceberg's 'multiple source rows matched');
* scan planning: partition-value pruning (hive path segments evaluated
  exactly) + file-level column min/max recorded at commit
  (plan_files / read_table(filters=...) data skipping);
* row-level DELETE: delete_where(filters) — COW rewrite of only the files
  whose partition values / column bounds admit a matching row;
* rollback: rollback_to(snapshot_id) — history-preserving restore commit;
* evolution: add-column schema evolution (null backfill) and metadata-only
  partition-spec evolution (evolve_partition_spec);
* maintenance: crash-safe snapshot expiry + orphan reclaim, bin-pack
  compaction;
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



def _next_seq(md: pathlib.Path) -> int:
    """Next snapshot sequence: max existing + 1 parsed from FILENAMES, never
    a count — expire_snapshots deletes early snapshots, and a count-derived
    sequence would REUSE a number below the survivor's, sorting the new
    snapshot before it in the chain and folding removals in the wrong order
    (resurrecting replaced rows — caught by round-5 self-review)."""
    seqs = [int(f.name.split("_")[1]) for f in md.glob("snap_*.json")]
    return max(seqs, default=-1) + 1

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


def _collect_file_stats(path, files: list[str]) -> dict:
    """Per-file column bounds for the snapshot manifest — real Iceberg's
    lower_bounds/upper_bounds (manifest entry fields 125/128): for every
    scalar (numeric/string/bool/date-ish) top-level column, [min, max] read
    from the parquet FOOTER of each newly written file. Driver-side by
    design: this is the writer's commit path (Iceberg writers report file
    stats in their DataFile metadata at commit), it reads O(files) footers
    — never data pages — and a snapshot commit adds a bounded number of
    files. Binary/nested columns are skipped, exactly like Iceberg's
    default `write.metadata.metrics` for large types."""
    import pyarrow.parquet as pq
    stats: dict[str, dict] = {}
    for f in files:
        md = pq.ParquetFile(str(pathlib.Path(path) / f)).metadata
        bounds: dict[str, list] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if "." in name:          # nested leaf — skip, like Iceberg
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                lo, hi = st.min, st.max
                # only JSON-native bounds may enter the snapshot manifest
                # (json.dumps in the commit path): DATE/TIMESTAMP footer
                # stats surface as datetime objects from pyarrow and would
                # fail EVERY commit on such a table. Skipping is the
                # conservative choice — no bounds means the file is always
                # kept — same as binary columns (metrics=none).
                if not (isinstance(lo, (bool, int, float, str))
                        and isinstance(hi, (bool, int, float, str))):
                    continue
                if name in bounds:
                    bounds[name] = [min(bounds[name][0], lo),
                                    max(bounds[name][1], hi)]
                else:
                    bounds[name] = [lo, hi]
        stats[f] = {k: [v[0], v[1]] for k, v in bounds.items()}
    return stats


def _maybe_satisfies(op: str, value, lo, hi) -> bool:
    """Can a file whose column spans [lo, hi] contain a row passing
    `col <op> value`? Conservative: unknown ops/bounds keep the file."""
    try:
        if op in ("=", "=="):
            return lo <= value <= hi
        if op == "<":
            return lo < value
        if op == "<=":
            return lo <= value
        if op == ">":
            return hi > value
        if op == ">=":
            return hi >= value
        if op == "in":
            return any(lo <= v <= hi for v in value)
    except TypeError:
        return True
    return True


def _coerce_partition_value(s: str, like):
    """Parse a hive path value ('fmt=raw' -> 'raw') into the filter value's
    type so partition pruning compares like with like."""
    if isinstance(like, bool):
        return s.lower() == "true"
    if isinstance(like, int):
        return int(s)
    if isinstance(like, float):
        return float(s)
    return s


def plan_files(path: str, snapshot_id: str | None = None,
               filters=None) -> tuple[list[str], list[str]]:
    """Scan planning with the two manifest-level prunes real Iceberg runs:

    * PARTITION pruning: a filter on a partition column (hive `k=v` path
      segments — fmt, p_bucket) is evaluated EXACTLY against each file's
      partition value (partition columns live in the path, not the parquet
      footer, so stats can't see them);
    * file-level column-stats data skipping (manifest-entry bounds): a file
      is skipped when some filter's column has recorded [min,max] bounds
      that PROVE no row can match.

    `filters` is a conjunction of (column, op, value) triples, op in
    {==, <, <=, >, >=, in}. Returns (kept_files, skipped_files); files from
    pre-stats snapshots (or with un-stat'ed, non-partition columns) are
    always kept. Pure metadata — no parquet data is touched."""
    files, chain = _snapshot_files(path, snapshot_id)
    stats: dict[str, dict] = {}
    for rec in chain:
        stats.update(rec.get("file_stats", {}))
    if not filters:
        return files, []
    kept, skipped = [], []
    for f in files:
        parts = dict(seg.split("=", 1) for seg in f.split("/")
                     if "=" in seg and not seg.endswith(".parquet"))
        fb = stats.get(f, {})
        ok = True
        for col, op, value in filters:
            if col in parts:
                try:
                    like = value[0] if op == "in" and value else value
                    v = _coerce_partition_value(parts[col], like)
                except (ValueError, IndexError):
                    continue  # unparseable: keep the file (conservative)
                # a partition value is a point: bounds [v, v] make
                # _maybe_satisfies an exact predicate evaluation
                if not _maybe_satisfies(op, value, v, v):
                    ok = False
                    break
                continue
            b = fb.get(col)
            if b is not None and not _maybe_satisfies(op, value, b[0], b[1]):
                ok = False
                break
        (kept if ok else skipped).append(f)
    return kept, skipped


def write_table(df: DataFrame, path: str, n_buckets: int = 16,
                partition_cols=("fmt",)) -> str:
    """Create the table: partition by (fmt, bucket(image_id)%N), snapshot 0."""
    pathlib.Path(path).mkdir(parents=True, exist_ok=True)
    return append(df, path, n_buckets=n_buckets, partition_cols=partition_cols,
                  overwrite=True)


def append(df: DataFrame, path: str, n_buckets: int | None = None,
           partition_cols=None, overwrite: bool = False) -> str:
    """Append a snapshot. Layout arguments default to the table's CURRENT
    partition_spec (so appends after evolve_partition_spec pick up the new
    layout automatically); on table creation they default to
    (16, ("fmt",))."""
    if n_buckets is None or partition_cols is None:
        try:
            spec_b, spec_cols, _ = _table_spec(path)
        except (FileNotFoundError, OSError):
            spec_b, spec_cols = 16, ("fmt",)
        if n_buckets is None:
            n_buckets = spec_b
        if partition_cols is None:
            partition_cols = spec_cols
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
    seq = _next_seq(md)
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
        # per-file column bounds for scan planning (Iceberg manifest
        # lower/upper_bounds) — see plan_files
        "file_stats": _collect_file_stats(path, files),
    }
    (md / f"snap_{seq:05d}_{snap_id}.json").write_text(json.dumps(rec))
    return snap_id


def _residual_filter(df: DataFrame, filters) -> DataFrame:
    """Apply the filter conjunction to the frame — pruning is a scan-plan
    optimization, never a semantic change: read_table(filters=...) returns
    exactly the rows a full read + filter would."""
    for col, op, value in filters:
        c = F.col(col)
        if op == "in":
            df = df.filter(c.isin(*value))
        else:
            df = df.filter({"==": c == value, "=": c == value,
                            "<": c < value, "<=": c <= value,
                            ">": c > value, ">=": c >= value}[op])
    return df


def snapshot_as_of(path: str, ts: str) -> str:
    """Iceberg `FOR SYSTEM_TIME AS OF` resolution: the id of the LAST
    snapshot committed at or before `ts` (ISO-8601 UTC, e.g.
    '2024-01-01T12:00:00Z'). Commit timestamps are second-resolution, so
    among same-second commits the highest sequence wins (the chain order).
    Raises KeyError when the table has no snapshot that old — including
    when that history has been expired (real Iceberg: time travel below
    the oldest retained snapshot fails)."""
    _, chain = _snapshot_files(path, None)
    eligible = [r for r in chain if r["timestamp"] <= ts]
    if not eligible:
        raise KeyError(
            f"no snapshot at or before {ts} (oldest retained: "
            f"{chain[0]['timestamp']})")
    return max(eligible, key=lambda r: r["sequence"])["snapshot_id"]


def read_table(spark: SparkSession, path: str,
               snapshot_id: str | None = None,
               filters=None, as_of: str | None = None) -> DataFrame:
    """Read a snapshot (default latest). Filters on fmt / p_bucket prune
    partitions; `bucket_for` computes the bucket of an image_id so point
    lookups can prune to one directory. `filters` — a conjunction of
    (column, op, value) triples — additionally skips whole FILES whose
    manifest-recorded column bounds exclude the predicate (Iceberg
    column-stats data skipping, see plan_files), then applies the same
    predicate to the surviving rows, so results are identical to an
    unpruned read + filter. `as_of` time-travels by commit timestamp
    (FOR SYSTEM_TIME AS OF) instead of id — mutually exclusive with
    snapshot_id."""
    if as_of is not None:
        if snapshot_id is not None:
            raise ValueError("pass snapshot_id or as_of, not both")
        snapshot_id = snapshot_as_of(path, as_of)
    if filters:
        files, _ = plan_files(path, snapshot_id, filters)
        if not files:
            # every file proven irrelevant: empty frame, table schema
            return _residual_filter(
                read_table(spark, path, snapshot_id).limit(0), filters)
    else:
        files, _ = _snapshot_files(path, snapshot_id)
    df = _read_files_union(spark, path, files)
    if df is None:
        # a snapshot with NO data files (e.g. a delete that removed every
        # row) is an empty table, not an error: rebuild the frame from the
        # latest schema recorded at or before the pinned snapshot
        # (model-based test catch, r5)
        df = _empty_table_frame(spark, path, snapshot_id)
    return _residual_filter(df, filters) if filters else df


def _empty_table_frame(spark: SparkSession, path: str,
                       snapshot_id: str | None) -> DataFrame:
    _, chain = _snapshot_files(path, None)
    if snapshot_id is not None:
        prefix = []
        for rec in chain:
            prefix.append(rec)
            if rec["snapshot_id"] == snapshot_id:
                break
        chain = prefix
    for rec in reversed(chain):
        if rec.get("schema"):
            cols = list(rec["schema"])
            if not any(n == "p_bucket" for n, _ in cols):
                cols.append(["p_bucket", "int"])  # hive partition column,
                # present on every non-empty read — keep schemas congruent
            ddl = ", ".join(f"`{n}` {t}" for n, t in cols)
            return spark.createDataFrame([], ddl)
    raise ValueError(
        f"table at {path} has no data files and no recorded schema")


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
    seq = _next_seq(md)
    rec = {
        "snapshot_id": snap_id,
        "sequence": seq,
        "timestamp": _time.strftime("%Y-%m-%dT%H:%M:%SZ", _time.gmtime()),
        "operation": operation,
        "files": files,
        "removed": removed or [],
        "partition_spec": partition_spec,
        "schema": schema or [],
        "file_stats": _collect_file_stats(path, files),
    }
    (md / f"snap_{seq:05d}_{snap_id}.json").write_text(json.dumps(rec))
    return snap_id


def upsert(spark: SparkSession, df: DataFrame, path: str,
           n_buckets: int | None = None, partition_cols=None,
           key: str = "image_id") -> str:
    """Row-level MERGE (matched → replace, unmatched → insert) with
    Iceberg's copy-on-write FILE granularity: only the bucket partitions
    that can contain an affected key are rewritten — every other data file
    is carried into the new snapshot untouched (its bytes are never read or
    moved). Readers pinned to earlier snapshots keep seeing the old rows
    (snapshot isolation); the new snapshot lists the rewritten buckets'
    files as removed + their replacements as added. Layout defaults come
    from the table's current partition_spec; affected files are judged
    under the spec of the snapshot that wrote them (spec evolution)."""
    cur_files, chain = _snapshot_files(path, None)
    spec_b, spec_cols, _sk = _table_spec(path)
    if n_buckets is None:
        n_buckets = spec_b
    if partition_cols is None:
        partition_cols = spec_cols
    affected = _affected_files(df, key, cur_files, chain, n_buckets)
    kept = _read_files_union(spark, path, affected)
    if kept is not None:
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


def _parse_spec(spec: list) -> tuple[int, tuple[str, ...], str]:
    """(n_buckets, partition_cols, bucket_key) from a recorded spec list."""
    n_buckets, key, cols = 16, "image_id", []
    for entry in spec:
        if entry.startswith("bucket(") and "%" in entry:
            key = entry[len("bucket("):entry.index(")")]
            n_buckets = int(entry.rsplit("%", 1)[1])
        else:
            cols.append(entry)
    return n_buckets, tuple(cols), key


def _table_spec(path) -> tuple[int, tuple[str, ...], str]:
    """The CURRENT spec: parsed from the latest snapshot's partition_spec —
    the table, not the caller, owns its layout (a caller-supplied modulus
    that disagrees with the written p_bucket dirs would silently mis-prune
    the copy-on-write file set)."""
    _, chain = _snapshot_files(path, None)
    return _parse_spec(chain[-1]["partition_spec"])


def evolve_partition_spec(path: str, n_buckets: int | None = None,
                          partition_cols=None,
                          key: str = "image_id") -> str:
    """Iceberg partition-spec evolution (updateSpec): a METADATA-ONLY
    commit — no data moves. Existing files keep the layout of the snapshot
    that wrote them; writes after this commit use the new spec; and the
    copy-on-write ops (upsert / merge_into) prune each file under ITS OWN
    snapshot's spec, so a table whose bucket count changed mid-history
    stays exactly correct. Omitted arguments carry the current value."""
    cur_b, cur_cols, cur_key = _table_spec(path)
    nb = n_buckets if n_buckets is not None else cur_b
    pc = tuple(partition_cols) if partition_cols is not None else cur_cols
    return _write_snapshot(path, [], "replace-spec",
                           list(pc) + [f"bucket({key})%{nb}"])


def _raise_dup(source: DataFrame, key: str) -> None:
    dup = (source.groupBy(key).count()
           .filter(F.col("count") > 1).limit(1).collect())
    bad = dup[0][0] if dup else "<unknown>"
    raise ValueError(
        f"source has multiple rows for {key}={bad!r}; MERGE/upsert "
        f"requires key-unique sources (Iceberg: 'multiple source rows "
        f"matched')")


def _check_dup_keys(source: DataFrame, key: str) -> None:
    """Narrow key-uniqueness check (one count-vs-countDistinct agg) for
    paths that don't need _affected_files' full bucket/range planning."""
    row = source.agg(F.count(key).alias("n"),
                     F.countDistinct(key).alias("nd")).collect()[0]
    if row["n"] != row["nd"]:
        _raise_dup(source, key)


def _read_files_union(spark: SparkSession, path: str,
                      files: list) -> DataFrame | None:
    """Read a file list grouped per data root (so each root's basePath
    recovers its hive partition columns), null-backfilling across schema
    evolution — the one read path shared by read_table, incremental_read,
    and the COW ops."""
    by_root: dict[str, list[str]] = {}
    for f in files:  # dict preserves FIRST-SEEN (chronological fold) order
        by_root.setdefault(f.split("/", 1)[0], []).append(f"{path}/{f}")
    df = None
    # chronological union keeps column order deterministic: evolved columns
    # land AFTER the original schema (uuid-sorted roots would let whichever
    # snapshot id sorts first supply the base schema — r5 self-review)
    for root, group in by_root.items():
        part = (spark.read.option("basePath", f"{path}/{root}")
                .parquet(*group))
        df = part if df is None else df.unionByName(
            part, allowMissingColumns=True)
    return df


def _affected_files(source: DataFrame, key: str, cur_files: list,
                    chain: list, n_buckets_latest: int) -> list:
    """Files that can hold a source key — the COW scan plan. Two prunes,
    both exactly how real Iceberg plans a MERGE target scan:

    * bucket pruning, with each file judged under the spec of the snapshot
      that WROTE it (partition-spec evolution means one table can mix
      moduli): the source's bucket set is computed once per distinct
      modulus, and a file matches when its /p_bucket=<b>/ value is in the
      set for its own modulus;
    * key-range pruning from the manifest's per-file column bounds: a file
      whose recorded [min,max] for the key column cannot overlap the
      source's key range is carried untouched even inside a matching
      bucket. Uses only the source's min/max (one tiny agg) so the check
      stays O(1) however large the source is.

    Unknown roots / missing stats are kept (conservative).

    ONE driver job computes everything the plan needs — per-modulus bucket
    sets (collect_set is bounded by the modulus), the key range, and the
    key-uniqueness check (count vs countDistinct) — instead of 3+ separate
    scans of the source per merge (r5 self-review; matters per micro-batch
    in stream_upsert_table). Key-duplicated sources raise Iceberg's
    'multiple source rows matched' contract error."""
    spec_of_root = {f"data_{rec['snapshot_id']}":
                    _parse_spec(rec["partition_spec"])[0] for rec in chain}
    moduli = sorted(set(spec_of_root.values()) | {n_buckets_latest})
    # F.count(key) counts NON-NULL keys only, matching countDistinct's
    # null handling — a single null-key source row is NOT a duplicate
    # (null never equi-matches; Iceberg MERGE inserts it)
    row = source.agg(
        F.count(key).alias("n"), F.countDistinct(key).alias("nd"),
        F.min(key).alias("lo"), F.max(key).alias("hi"),
        *[F.collect_set(bucket_for(F.col(key), m)).alias(f"b{m}")
          for m in moduli]).collect()[0]
    if row["n"] != row["nd"]:
        _raise_dup(source, key)
    buckets_by_mod = {m: set(row[f"b{m}"]) for m in moduli}
    src_lo, src_hi = row["lo"], row["hi"]
    stats: dict[str, dict] = {}
    for rec in chain:
        stats.update(rec.get("file_stats", {}))
    out = []
    for f in cur_files:
        root = f.split("/", 1)[0]
        mod = spec_of_root.get(root)
        if mod is None:
            out.append(f)
            continue
        seg = [p for p in f.split("/") if p.startswith("p_bucket=")]
        if not seg:
            out.append(f)
            continue
        b = int(seg[0].split("=", 1)[1])
        if b not in buckets_by_mod[mod]:
            continue
        bounds = stats.get(f, {}).get(key)
        if (bounds is not None and src_lo is not None
                and (bounds[1] < src_lo or bounds[0] > src_hi)):
            continue  # key range proves no source row can live here
        out.append(f)
    return out


def merge_into(spark: SparkSession, source: DataFrame, path: str,
               on: str = "image_id", matched_condition: str | None = None,
               when_matched: str = "update", when_not_matched: str = "insert",
               when_not_matched_by_source: str = "ignore",
               n_buckets: int | None = None, partition_cols=None) -> str:
    """Row-level MERGE INTO (Iceberg MERGE semantics, VERDICT r4 #5) on top
    of the shim's copy-on-write file granularity:

        MERGE INTO target t USING source s ON t.<on> = s.<on>
        WHEN MATCHED [AND <matched_condition>]
             THEN UPDATE SET * | DELETE
        WHEN NOT MATCHED THEN INSERT *            (or do nothing)

    * `on` must be the table's bucketing key (image_id by default) so the
      merge only rewrites the bucket partitions that can hold a source key —
      every other data file carries into the new snapshot untouched, exactly
      like upsert (and like real Iceberg COW, which rewrites only files
      containing matched rows).
    * `matched_condition` is a SQL predicate over aliases `t` and `s`
      (e.g. ``"s.w > t.w"``): matched rows FAILING it are left untouched —
      this is what plain upsert cannot express.
    * `when_matched`: "update" replaces every source-supplied column on the
      matched row (UPDATE SET *; target-only columns are kept), "delete"
      drops the row.
    * `when_not_matched`: "insert" appends unmatched source rows, "ignore"
      drops them.
    * `when_not_matched_by_source`: "delete" removes TARGET rows with no
      source match (the Iceberg/Delta third clause — the full-sync shape:
      source becomes the table); "ignore" (default) keeps them. The clause
      inspects every target row, so file-granularity pruning is off for
      such merges — ALL current files rewrite, exactly like real COW MERGE
      with this clause (its target scan cannot prune either).
    * Source rows must be unique on `on` — enforced up front with the same
      error real Iceberg gives ('multiple source rows matched').

    Schema evolution composes: a source carrying new columns null-backfills
    them for untouched rows, and affected buckets spanning pre-/post-
    evolution snapshots read with allowMissingColumns like read_table.
    Earlier snapshots keep the pre-merge rows (snapshot isolation)."""
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete: {when_matched}")
    if when_not_matched not in ("insert", "ignore"):
        raise ValueError(
            f"when_not_matched must be insert|ignore: {when_not_matched}")
    if when_not_matched_by_source not in ("delete", "ignore"):
        raise ValueError(f"when_not_matched_by_source must be delete|ignore: "
                         f"{when_not_matched_by_source}")
    spec_buckets, spec_cols, _ = _table_spec(path)
    if n_buckets is None:
        n_buckets = spec_buckets
    if partition_cols is None:
        partition_cols = spec_cols
    cur_files, chain = _snapshot_files(path, None)
    if when_not_matched_by_source == "delete":
        # the clause must SEE every target row — no bucket/key-range prune;
        # only the (narrow) dup-key contract check runs over the source
        _check_dup_keys(source, on)
        affected = list(cur_files)
    else:
        affected = _affected_files(source, on, cur_files, chain, n_buckets)
    tgt = _read_files_union(spark, path, affected)
    if tgt is not None:
        tgt = tgt.drop("p_bucket")

    if tgt is None:
        survivors = (source if when_not_matched == "insert"
                     else source.limit(0))
    else:
        src = source.withColumn("_s_match", F.lit(1))
        j = tgt.alias("t").join(src.alias("s"),
                                F.col(f"t.{on}") == F.col(f"s.{on}"), "left")
        fired = F.col("s._s_match").isNotNull()
        if matched_condition:
            fired = fired & F.expr(matched_condition)
        drop_unmatched_tgt = when_not_matched_by_source == "delete"
        if when_matched == "delete":
            # NULL matched_condition (e.g. "s.w > t.w" with NULL w) must
            # KEEP the row: SQL MERGE only fires a clause whose condition
            # is TRUE, and ~NULL is NULL which filter() drops. Coalesce
            # mirrors the update path's when/otherwise semantics.
            survivors = j.filter(~F.coalesce(fired, F.lit(False)))
            if drop_unmatched_tgt:
                survivors = survivors.filter(
                    F.col("s._s_match").isNotNull())
            survivors = survivors.select("t.*")
        else:
            scols = set(source.columns)
            cols = [F.when(fired, F.col(f"s.{c}")).otherwise(
                        F.col(f"t.{c}")).alias(c) if c in scols
                    else F.col(f"t.{c}").alias(c) for c in tgt.columns]
            # source-only columns (schema evolution via MERGE)
            cols += [F.when(fired, F.col(f"s.{c}")).alias(c)
                     for c in source.columns if c not in tgt.columns]
            jj = (j.filter(F.col("s._s_match").isNotNull())
                  if drop_unmatched_tgt else j)
            survivors = jj.select(*cols)
        if when_not_matched == "insert":
            inserts = source.join(tgt.select(on), on, "left_anti")
            survivors = survivors.unionByName(inserts,
                                              allowMissingColumns=True)

    snap_id = uuid.uuid4().hex[:12]
    data_dir = pathlib.Path(path) / f"data_{snap_id}"
    out = survivors.withColumn("p_bucket", bucket_for(F.col(on), n_buckets))
    (out.write.mode("overwrite")
        .partitionBy(*partition_cols, "p_bucket")
        .parquet(str(data_dir)))
    new_files = [str(p.relative_to(path)) for p in data_dir.rglob("*.parquet")]
    return _write_snapshot(
        path, new_files, "merge",
        list(partition_cols) + [f"bucket({on})%{n_buckets}"],
        removed=affected, snap_id=snap_id,
        schema=[[f.name, f.dataType.simpleString()] for f in survivors.schema])


def delete_where(spark: SparkSession, path: str, filters,
                 n_buckets: int | None = None, partition_cols=None) -> str:
    """Iceberg `DELETE FROM t WHERE ...` with copy-on-write semantics: only
    files whose manifest-recorded column bounds ADMIT a matching row are
    rewritten (the same plan_files data skipping as a filtered read); every
    bounds-excluded file carries into the new snapshot untouched — exactly
    how real COW DELETE rewrites only files containing deleted rows.

    `filters` uses the read_table convention: a conjunction of
    (column, op, value) triples, op in {==, <, <=, >, >=, in}. Rows where
    the predicate evaluates NULL are KEPT (SQL DELETE removes only rows
    where the predicate is TRUE). A delete the stats prove can touch no
    file is a metadata no-op: the current snapshot id is returned and no
    commit is written. Earlier snapshots keep the deleted rows (snapshot
    isolation / time travel)."""
    if not filters:
        raise ValueError(
            "delete_where requires a filter conjunction (a full-table "
            "delete should be an explicit overwrite, not a default)")
    spec_buckets, spec_cols, spec_key = _table_spec(path)
    if n_buckets is None:
        n_buckets = spec_buckets
    if partition_cols is None:
        partition_cols = spec_cols
    maybe, _skipped = plan_files(path, None, filters)
    if not maybe:
        _, chain = _snapshot_files(path, None)
        return chain[-1]["snapshot_id"]
    tgt = _read_files_union(spark, path, maybe).drop("p_bucket")
    match = F.lit(True)
    for col, op, value in filters:
        c = F.col(col)
        cond = c.isin(*value) if op == "in" else \
            {"==": c == value, "=": c == value, "<": c < value,
             "<=": c <= value, ">": c > value, ">=": c >= value}[op]
        match = match & cond
    # NULL predicate keeps the row: only TRUE deletes
    survivors = tgt.filter(~F.coalesce(match, F.lit(False)))
    snap_id = uuid.uuid4().hex[:12]
    data_dir = pathlib.Path(path) / f"data_{snap_id}"
    out = survivors.withColumn("p_bucket",
                               bucket_for(F.col(spec_key), n_buckets))
    (out.write.mode("overwrite")
        .partitionBy(*partition_cols, "p_bucket")
        .parquet(str(data_dir)))
    new_files = [str(p.relative_to(path)) for p in data_dir.rglob("*.parquet")]
    return _write_snapshot(
        path, new_files, "delete",
        list(partition_cols) + [f"bucket({spec_key})%{n_buckets}"],
        removed=maybe, snap_id=snap_id,
        schema=[[f.name, f.dataType.simpleString()] for f in survivors.schema])


def rollback_to(path: str, snapshot_id: str) -> str:
    """Iceberg rollback_to_snapshot: a NEW commit whose effective file list
    is exactly the table state at `snapshot_id`. History is preserved — the
    rolled-back-over snapshots stay time-travelable until expire_snapshots
    reclaims them, matching Iceberg's rollback (which moves the current
    pointer by appending to the metadata log, never by erasing it).
    Partition spec and schema revert to the target snapshot's state, so
    subsequent writes use the restored layout. Raises KeyError when the
    target snapshot has been expired. Metadata-only: no data moves."""
    restored, _ = _snapshot_files(path, snapshot_id)
    cur_files, chain = _snapshot_files(path, None)
    prefix = []
    for rec in chain:
        prefix.append(rec)
        if rec["snapshot_id"] == snapshot_id:
            break
    return _write_snapshot(
        path, restored, "rollback",
        prefix[-1]["partition_spec"],
        removed=cur_files,
        schema=prefix[-1].get("schema", []))


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
    # Crash-safe commit order (ADVICE r4): metadata first, data last.
    # 1. Rewrite the oldest survivor ATOMICALLY (tmp + os.replace) with its
    #    folded file list. Its `removed` lists every file the expired
    #    snapshots added, so the chain folds to the same state whether or
    #    not the expired snapshot JSONs still exist — a crash between steps
    #    1 and 2 leaves a fully consistent table.
    import os
    prior_added = sorted({f for rec in chain[:cut] for f in rec["files"]})
    survivor = {**chain[cut], "files": base_files, "removed": prior_added,
                "operation": "overwrite"}
    tmp = snaps[cut].with_suffix(".json.tmp")
    tmp.write_text(json.dumps(survivor))
    os.replace(tmp, snaps[cut])
    # 2. Drop expired snapshot metadata.
    for s in snaps[:cut]:
        s.unlink()
    # 3. Delete unreferenced data files LAST — a crash here only leaks
    #    orphans (reclaimable, never corrupting), exactly Iceberg's
    #    expire-then-orphan-sweep contract.
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
    return _read_files_union(spark, path, files)
