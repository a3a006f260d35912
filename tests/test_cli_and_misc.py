"""Split sink (S6), validation predicates (P4), dataset stats (A5),
resume anti-join, and a real spark-submit --py-files run (S7)."""

import pathlib
import subprocess
import sys
import zipfile

import duckdb
import pyspark.sql.functions as F
import pytest

from cogger_spark import oracles, queries
from tests.test_spatial_oracle import compare


def test_split_sink_equals_joined_cog(spark, smoke_images):
    from cogger_spark.operators.tiling import assemble_cogs, tile_images
    images = spark.read.parquet(smoke_images).limit(6)
    tiles = tile_images(images, tile=512)
    joined = {r.image_id: bytes(r.cog)
              for r in assemble_cogs(tiles, tile=512).collect()}
    split = {r.image_id: (bytes(r.header), bytes(r.data))
             for r in assemble_cogs(tile_images(images, tile=512), tile=512,
                                    split=True).collect()}
    assert set(joined) == set(split)
    for iid, (hdr, data) in split.items():
        assert hdr + data == joined[iid]
        assert hdr[:2] == b"II"


def test_validate_images_split(spark, smoke_images):
    from cogger_spark.operators.validate import validate_images
    good = spark.read.parquet(smoke_images)
    bad = spark.createDataFrame(
        [("bad_dim", b"\x00", -1, 4, "raw", "c", 0),
         ("bad_fmt", b"\x00", 1, 1, "bmp", "c", 0),
         ("bad_size", b"\x00\x00\x00", 2, 1, "raw", "c", 0),
         ("bad_caption", b"\x00\x00", 2, 1, "raw", "", 0),
         # NULL payload must be quarantined, not fall through the
         # three-valued raw-size predicate into the valid set
         ("bad_null_bytes", None, 2, 1, "raw", "c", 0),
         ("bad_empty_bytes", b"", 2, 1, "deflate", "c", 0)],
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long")
    valid, rejects = validate_images(good.unionByName(bad))
    assert valid.count() == good.count()
    got = {r.image_id: r.reject_reason for r in rejects.collect()}
    assert got == {"bad_dim": "nonpositive dims", "bad_fmt": "unknown fmt",
                   "bad_size": "bad raw payload size",
                   "bad_caption": "missing caption",
                   "bad_null_bytes": "missing payload",
                   "bad_empty_bytes": "missing payload"}


def test_resume_delta_anti_join(spark):
    from cogger_spark.plans.checkpoint import resume_delta
    planned = spark.range(10).withColumnRenamed("id", "bucket")
    completed = spark.range(4).withColumnRenamed("id", "bucket")
    left = sorted(r.bucket for r in resume_delta(planned, completed).collect())
    assert left == [4, 5, 6, 7, 8, 9]


def test_dataset_stats_matches_oracle(spark, fixture_dir):
    compare(queries.SPATIAL_QUERIES["dataset_stats"](spark, "/root/testdata/sf0.01"),
            oracles.DATASET_STATS)


@pytest.mark.slow
def test_spark_submit_py_files(tmp_path, smoke_images):
    """The north rule's deployment shape: package the engine, run the CLI
    under spark-submit --py-files, verify the manifest output."""
    repo = pathlib.Path(__file__).resolve().parent.parent
    zpath = tmp_path / "cogger_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for f in (repo / "cogger_spark").rglob("*.py"):
            z.write(f, f.relative_to(repo))
    out = tmp_path / "manifest_out"
    spark_submit = pathlib.Path(sys.executable).parent / "spark-submit"
    if not spark_submit.exists():
        import pyspark
        spark_submit = pathlib.Path(pyspark.__file__).parent / "bin" / "spark-submit"
    proc = subprocess.run(
        [str(spark_submit), "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", str(zpath),
         str(repo / "cogger_spark" / "cli.py"),
         "manifest", "--images", smoke_images, "--out", str(out)],
        capture_output=True, text=True, timeout=600,
        env={"PYSPARK_PYTHON": sys.executable,
             "PYSPARK_DRIVER_PYTHON": sys.executable,
             "PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAVA_HOME": __import__("os").environ.get("JAVA_HOME", "")})
    assert proc.returncode == 0, proc.stderr[-3000:]
    files = list(out.glob("*.parquet"))
    assert files, proc.stdout
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchall()[0][0]
    assert n > 50


def test_write_cogs_file_sink(spark, smoke_images, tmp_path):
    import hashlib
    import pathlib
    from cogger_spark.operators.tiling import cog_pipeline, write_cogs
    from cogger_spark.tiff import parse_tiff
    images = spark.read.parquet(smoke_images).limit(5)
    cogs = cog_pipeline(images, tile=512)
    out = tmp_path / "cogs"
    write_cogs(cogs, str(out))
    blobs = {r.image_id: bytes(r.cog) for r in cogs.collect()}
    files = sorted(pathlib.Path(out).glob("*.tif"))
    assert len(files) == 5
    for f in files:
        iid = f.stem
        data = f.read_bytes()
        assert hashlib.md5(data).hexdigest() == \
            hashlib.md5(blobs[iid]).hexdigest()
        assert parse_tiff(data).ifds  # well-formed TIFF


def test_rewrite_tiffs_idempotent_on_own_cogs(spark, smoke_images):
    """rewrite(engine COG) == engine COG byte-for-byte: the byte-reshuffle
    operator is a fixed point on already-COG inputs (same tree, same order,
    same tags), and it round-trips the reference fixtures too."""
    from cogger_spark.operators.tiling import cog_pipeline, rewrite_tiffs
    images = spark.read.parquet(smoke_images).limit(8)
    cogs = {r.image_id: bytes(r.cog)
            for r in cog_pipeline(images, tile=512).collect()}
    tiffs = spark.createDataFrame(
        [(k, v) for k, v in cogs.items()], "image_id string, bytes binary")
    redone = {r.image_id: bytes(r.cog) for r in rewrite_tiffs(tiffs).collect()}
    assert redone == cogs


def test_rewrite_tiff_sets_matches_reference_goldens(spark):
    """The reference's multi-file golden cases THROUGH the Spark operator:
    md5(engine output) == committed cog_ext_*.tif."""
    import hashlib
    import pathlib
    from cogger_spark.operators.tiling import rewrite_tiff_sets, rewrite_tiffs
    td = pathlib.Path("/root/reference/testdata")
    rows = []
    for i, name in enumerate(["exttest.tif", "exttest.tif.ovr"]):
        rows.append(("ext_ovr", i, (td / name).read_bytes()))
    for i, name in enumerate(["exttest.tif", "exttest.tif.2", "exttest.tif.4"]):
        rows.append(("ext_multi", i, (td / name).read_bytes()))
    df = spark.createDataFrame(rows, "image_id string, part_id int, bytes binary")
    got = {r.image_id: hashlib.md5(bytes(r.cog)).hexdigest()
           for r in rewrite_tiff_sets(df).collect()}
    want = {
        "ext_ovr": hashlib.md5((td / "cog_ext_ovr.tif").read_bytes()).hexdigest(),
        "ext_multi": hashlib.md5((td / "cog_ext_multi.tif").read_bytes()).hexdigest(),
    }
    assert got == want

    # single-file goldens through the single-blob Spark operator too
    singles = [(n, (td / n).read_bytes())
               for n in ("gray.tif", "rgbmask.tif", "band4.tif")]
    sdf = spark.createDataFrame(singles, "image_id string, bytes binary")
    got1 = {r.image_id: hashlib.md5(bytes(r.cog)).hexdigest()
            for r in rewrite_tiffs(sdf).collect()}
    for name, _ in singles:
        expected = hashlib.md5((td / f"cog_{name}").read_bytes()).hexdigest()
        assert got1[name] == expected, name


def test_cli_convert_checkpointed(spark, smoke_images, tmp_path):
    """CLI convert: per-bucket checkpointed COG job; rerun is a no-op (all
    buckets already complete)."""
    from cogger_spark import cli
    out = str(tmp_path / "cog_out")
    ck = str(tmp_path / "cog_ck")
    rc = cli.main(["convert", "--images", smoke_images, "--out", out,
                   "--buckets", "4", "--ckpt", ck])
    assert rc == 0
    got = spark.read.parquet(out + "/bucket=*")
    # parts output: every image has a header part 0 plus >=1 data chunk
    assert got.select("image_id").distinct().count() == 50
    assert got.filter("part_idx = 0").count() == 50
    assert got.count() >= 100
    # second run: nothing left to do
    from cogger_spark.plans.checkpoint import remaining_buckets
    assert remaining_buckets(4, ck) == []


def test_cli_rewrite_files_golden(spark, tmp_path):
    """CLI rewrite over a directory of .tif files reproduces the committed
    golden COGs byte-for-byte — the reference CLI's own job, distributed."""
    import hashlib
    import pathlib
    import shutil
    from cogger_spark import cli
    src = pathlib.Path("/root/reference/testdata")
    in_dir = tmp_path / "tifs"
    in_dir.mkdir()
    names = ["rgb.tif", "gray.tif", "band4mask.tif"]
    for n in names:
        shutil.copy(src / n, in_dir / n)
    out = tmp_path / "cogs"
    rc = cli.main(["rewrite", "--in-dir", str(in_dir), "--out", str(out)])
    assert rc == 0
    for n in names:
        got = (out / n).read_bytes()
        want = (src / f"cog_{n}").read_bytes()
        assert hashlib.md5(got).hexdigest() == hashlib.md5(want).hexdigest(), n


def test_cli_rewrite_multifile_golden(spark, tmp_path):
    """--multifile groups main + external overview parts per image
    (loader.go multi-reader) before rewriting."""
    import hashlib
    import pathlib
    import shutil
    from cogger_spark import cli
    src = pathlib.Path("/root/reference/testdata")
    in_dir = tmp_path / "tifs_multi"
    in_dir.mkdir()
    for n in ("exttest.tif", "exttest.tif.2", "exttest.tif.4"):
        shutil.copy(src / n, in_dir / n)
    out = tmp_path / "cogs_multi"
    rc = cli.main(["rewrite", "--in-dir", str(in_dir), "--out", str(out),
                   "--multifile"])
    assert rc == 0
    got = (out / "exttest.tif").read_bytes()
    want = (src / "cog_ext_multi.tif").read_bytes()
    assert hashlib.md5(got).hexdigest() == hashlib.md5(want).hexdigest()


def test_cli_rewrite_one_matches_reference_golden(tmp_path):
    """`rewrite-one` — the reference CLI's exact single-invocation UX
    (positional main.tif [+ overview.tifs], --output) — must reproduce the
    reference golden bytes, including a multi-file external-overview set."""
    import hashlib
    import pathlib
    from cogger_spark import cli
    ref = pathlib.Path("/root/reference/testdata")
    # single-file case (cogger_test.go TestCases)
    out1 = tmp_path / "single.tif"
    rc = cli.main(["rewrite-one", str(ref / "rgb.tif"),
                   "--output", str(out1)])
    assert rc == 0
    golden1 = hashlib.md5((ref / "cog_rgb.tif").read_bytes()).hexdigest()
    assert hashlib.md5(out1.read_bytes()).hexdigest() == golden1
    # multi-file main + external overviews (cogger_test.go TestMultiFiles)
    out2 = tmp_path / "multi.tif"
    rc = cli.main(["rewrite-one", str(ref / "exttest.tif"),
                   str(ref / "exttest.tif.2"), str(ref / "exttest.tif.4"),
                   "--output", str(out2)])
    assert rc == 0
    golden2 = hashlib.md5(
        (ref / "cog_ext_multi.tif").read_bytes()).hexdigest()
    assert hashlib.md5(out2.read_bytes()).hexdigest() == golden2
