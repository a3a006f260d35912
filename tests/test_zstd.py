"""Pure-Python zstd decoder validation, two independent ways:

1. round-trips against libzstd (zstd-jni, shipped inside Spark's JVM) across
   compression levels, sizes, and data shapes — exercising raw/RLE blocks,
   1- and 4-stream Huffman literals, direct and FSE-compressed weights,
   predefined/compressed/RLE/repeat sequence tables, and repeat offsets;
2. the reference fixture's ZSTD tiles (rgbmaskline.tif, compression 50000):
   every tile must decode to its exact raw size, mask tiles to all-0xFF, and
   each overview level to the 2x relationship with its parent.
"""

import pathlib
import zlib

import numpy as np
import pytest

from cogger_spark.tiff.zstd import zstd_decompress

TESTDATA = pathlib.Path("/root/reference/testdata")


@pytest.fixture(scope="module")
def jzstd(spark):
    return spark._jvm.com.github.luben.zstd.Zstd


def _cases():
    rng = np.random.RandomState(7)
    text = (b"the quick brown fox jumps over the lazy dog. " * 200)
    return [
        b"",
        b"a",
        b"abc" * 5,
        bytes(1000),                                   # RLE-ish
        text,                                          # repetitive text
        rng.bytes(100_000),                            # incompressible
        zlib.compress(text),                           # high-entropy small
        (b"0123456789abcdef" * 64 + rng.bytes(64)) * 40,  # mixed
        np.arange(65536, dtype=np.uint16).tobytes(),   # structured
        text[:100] + bytes(5000) + text[:100],         # long matches
    ]


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_roundtrip_against_libzstd(jzstd, level):
    for i, payload in enumerate(_cases()):
        comp = bytes(jzstd.compress(payload, level))
        got = zstd_decompress(comp)
        assert got == payload, f"case {i} level {level}: {len(got)} bytes"


def test_fixture_zstd_tiles_decode():
    from cogger_spark.tiff import assemble_ifd_tree, parse_tiff
    tf = parse_tiff((TESTDATA / "rgbmaskline.tif").read_bytes())
    main = assemble_ifd_tree(tf.ifds)
    assert main.compression == 50000
    frames = [main] + main.overviews
    decoded = {}
    for lvl, ifd in enumerate(frames):
        tw, th = ifd.tile_width, ifd.tile_height
        spp = ifd.samples_per_pixel
        full = np.zeros((ifd.image_height, ifd.image_width, spp), np.uint8)
        for ty in range(ifd.n_tiles_y()):
            for tx in range(ifd.n_tiles_x()):
                raw = zstd_decompress(ifd.load_tile(ifd.tile_idx(tx, ty, 0)))
                assert len(raw) == tw * th * spp, (lvl, tx, ty)
                block = np.frombuffer(raw, np.uint8).reshape(th, tw, spp)
                h = min(th, ifd.image_height - ty * th)
                w = min(tw, ifd.image_width - tx * tw)
                full[ty * th:ty * th + h, tx * tw:tx * tw + w] = block[:h, :w]
        decoded[lvl] = full
        if ifd.mask is not None:
            m = ifd.mask
            raw = zstd_decompress(m.load_tile(0))
            rowbytes = (m.tile_width + 7) // 8
            valid = np.frombuffer(raw, np.uint8)[: rowbytes * m.tile_height]
            assert set(valid[: (m.image_width + 7) // 8].tolist()) == {0xFF}
    # overviews halve the width (height is 1) with NEAREST resampling:
    # child pixel x equals parent pixel 2x, exactly — a strong cross-level
    # consistency check on the decoded pixels (any FSE/Huffman/sequence bug
    # would scramble at least one level differently from its parent)
    for lvl in range(1, len(frames)):
        parent, child = decoded[lvl - 1], decoded[lvl]
        cw = child.shape[1]
        assert np.array_equal(child[0], parent[0, : 2 * cw : 2]), lvl
    # the deepest levels sample only x % 4 == 0 positions, whose fixture
    # value is v * (i % 4) = 0 — all-zero by construction
    assert decoded[len(frames) - 1].max() == 0


def test_decode_tile_dispatches_zstd():
    from cogger_spark.tiff import assemble_ifd_tree, parse_tiff
    from cogger_spark.tiff.lzw import decode_tile
    tf = parse_tiff((TESTDATA / "rgbmaskline.tif").read_bytes())
    main = assemble_ifd_tree(tf.ifds)
    raw = decode_tile(main.load_tile(0), main.compression, main.predictor,
                      main.tile_width, main.tile_height,
                      main.samples_per_pixel)
    assert len(raw) == (main.tile_width * main.tile_height
                        * main.samples_per_pixel)


def test_property_roundtrip_random_structured(jzstd):
    """Property-style sweep: many deterministic pseudo-random payload shapes
    (mixed runs, random segments, repeated motifs, varied lengths incl. odd
    sizes) x levels — every libzstd-compressed frame must decode exactly."""
    rng = np.random.RandomState(20260816)
    for trial in range(40):
        n_seg = rng.randint(1, 6)
        segs = []
        for _ in range(n_seg):
            kind = rng.randint(4)
            ln = int(rng.randint(0, 5000))
            if kind == 0:
                segs.append(bytes([rng.randint(256)]) * ln)        # run
            elif kind == 1:
                segs.append(rng.bytes(ln))                         # noise
            elif kind == 2:
                motif = rng.bytes(rng.randint(1, 32))
                segs.append((motif * (ln // max(1, len(motif)) + 1))[:ln])
            else:
                segs.append(bytes(range(256)) * (ln // 256 + 1))   # ramp
        payload = b"".join(segs)
        level = int(rng.choice([1, 3, 6, 12, 19, 22]))
        comp = bytes(jzstd.compress(payload, level))
        assert zstd_decompress(comp) == payload, (trial, level, len(payload))


def test_corrupt_payload_parity_with_reference(spark):
    """Corruption behavior parity with the reference decoder (zstd-jni).
    A checksum-less zstd frame cannot detect every bit flip — most flips
    yield a structurally valid stream the REFERENCE decoder also accepts
    (returning different bytes). The contract after the ADVICE r2 overrun
    fix: the pure-Python decoder is (a) NEVER more permissive than the
    reference — any flip zstd-jni rejects, we must reject (overrun /
    inexact-consumption cases previously zero-filled to garbage), and
    (b) byte-identical to the reference whenever both accept."""
    import numpy as np
    from cogger_spark.tiff.zstd import zstd_decompress
    jzstd = spark._jvm.com.github.luben.zstd.Zstd
    payload = (b"the quick brown fox jumps over the lazy dog " * 200
               + bytes(range(256)) * 20)
    comp = bytearray(bytes(jzstd.compress(payload, 9)))
    rng = np.random.RandomState(7)
    jni_rejected = divergent = more_permissive = 0
    for _ in range(60):
        i = int(rng.randint(12, len(comp)))
        bit = 1 << int(rng.randint(8))
        comp[i] ^= bit
        b = bytes(comp)
        try:
            ref = bytes(jzstd.decompress(b, len(payload) * 2))
            ref_ok = True
        except Exception:  # noqa: BLE001 (py4j wraps ZstdException)
            ref_ok = False
        try:
            got = zstd_decompress(b)
            got_ok = True
        except (ValueError, IndexError, OverflowError):
            got_ok = False
        if not ref_ok:
            jni_rejected += 1
            if got_ok:
                more_permissive += 1
        elif got_ok and got != ref:
            divergent += 1
        comp[i] ^= bit
    assert more_permissive == 0, (jni_rejected, more_permissive)
    assert divergent == 0, divergent
    assert jni_rejected > 0  # the sample does exercise the reject path
