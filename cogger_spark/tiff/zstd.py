"""Pure-Python Zstandard decoder (RFC 8878) for TIFF compression 50000.

The reference's own fixtures (rgbmaskline.tif / cog_rgbmaskline.tif) carry
ZSTD-compressed tiles; the byte-transparent rewrite path never decodes them,
but consumer-side operators (fetch_tiles / extract_thumbnails / the golden
pixel tests) need the pixels. This sandbox has no zstd library (stdlib gains
one only in 3.14, `zstandard` is not installed), so this module implements
frame decoding from the spec: FSE (tANS) normalized-count parsing and table
construction, Huffman-coded literals (1- and 4-stream, direct and
FSE-compressed weights), the three interleaved sequence state machines with
predefined/RLE/compressed/repeat modes, repeat-offset history, and overlap-
safe match copies.

Decompression only — the engine never needs to *produce* zstd (parity with
the reference, which emits whatever the input tiles carry). If a real zstd
binding is importable it is preferred automatically (decompress() dispatch).

Scope: standard single frames (the only thing libzstd/GDAL tile codecs
emit) — dictionaries and skippable frames are rejected loudly.

Validated two ways in tests/test_zstd.py: round-trips against zstd-jni
(shipped inside Spark's JVM) across levels/sizes/patterns, and decoding the
reference fixture's zstd tiles (mask tiles all-0xFF, image planes matching
the overview pyramid relationships).
"""

from __future__ import annotations

ZSTD_MAGIC = 0xFD2FB528

# ---------------------------------------------------------------------------
# bit readers
# ---------------------------------------------------------------------------


class _ForwardBits:
    """LSB-first forward bit reader (FSE table descriptions)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        got = 0
        while got < n:
            if self.byte >= len(self.data):
                raise ValueError("zstd: FSE header overruns input")
            take = min(8 - self.bit, n - got)
            chunk = (self.data[self.byte] >> self.bit) & ((1 << take) - 1)
            out |= chunk << got
            got += take
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return out

    def peek(self, n: int) -> int:
        byte, bit = self.byte, self.bit
        try:
            return self.read(n)
        finally:
            self.byte, self.bit = byte, bit

    def consumed_bytes(self) -> int:
        return self.byte + (1 if self.bit else 0)


class _BackwardBits:
    """Backward bitstream (FSE/Huffman payload): bits were written LSB-first;
    reading starts from the sentinel (highest set bit of the last byte) and
    proceeds toward the first byte, each read returning its bits MSB-first
    in write order."""

    def __init__(self, data: bytes):
        if not data or data[-1] == 0:
            raise ValueError("zstd: corrupt backward bitstream (no sentinel)")
        self.value = int.from_bytes(data, "little")
        self.bits = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    @property
    def remaining(self) -> int:
        return self.bits

    def read(self, n: int) -> int:
        """Read n bits. Reading past the stream start is corruption per the
        spec (RFC 8878 §4.1: a valid stream is consumed exactly), so it
        raises rather than zero-filling to garbage."""
        if n == 0:
            return 0
        self.bits -= n
        if self.bits >= 0:
            return (self.value >> self.bits) & ((1 << n) - 1)
        raise ValueError("zstd: corrupt bitstream (read past stream start)")

    def peek(self, n: int) -> int:
        if n == 0:
            return 0
        if self.bits >= n:
            return (self.value >> (self.bits - n)) & ((1 << n) - 1)
        return (self.value & ((1 << self.bits) - 1)) << (n - self.bits)


# ---------------------------------------------------------------------------
# FSE
# ---------------------------------------------------------------------------


def fse_read_ncount(bits: _ForwardBits, max_symbol: int):
    """Parse normalized counts (FSE_readNCount): returns (counts, accuracy)."""
    accuracy = bits.read(4) + 5
    if accuracy > 9:
        raise ValueError(f"zstd: FSE accuracy {accuracy} too large")
    remaining = (1 << accuracy) + 1
    threshold = 1 << accuracy
    nb_bits = accuracy + 1
    counts: list[int] = []
    prev_zero = False
    while remaining > 1 and len(counts) <= max_symbol:
        if prev_zero:
            rep = bits.read(2)
            counts.extend([0] * rep)
            if rep == 3:
                continue
            prev_zero = False
            continue
        maxv = (2 * threshold - 1) - remaining
        val = bits.peek(nb_bits)
        if (val & (threshold - 1)) < maxv:
            val &= threshold - 1
            bits.read(nb_bits - 1)
        else:
            val &= 2 * threshold - 1
            if val >= threshold:
                val -= maxv
            bits.read(nb_bits)
        count = val - 1  # -1 encodes "probability less than 1"
        remaining -= -count if count < 0 else count
        counts.append(count)
        prev_zero = count == 0
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd: corrupt FSE normalized counts")
    return counts, accuracy


def fse_build_dtable(counts: list[int], accuracy: int):
    """FSE decoding table: per-state (symbol, nb_bits, new_state_base)."""
    size = 1 << accuracy
    symbols = [0] * size
    high = size - 1
    for s, c in enumerate(counts):
        if c == -1:
            symbols[high] = s
            high -= 1
    step = (size >> 1) + (size >> 3) + 3
    pos = 0
    for s, c in enumerate(counts):
        if c <= 0:
            continue
        for _ in range(c):
            symbols[pos] = s
            pos = (pos + step) & (size - 1)
            while pos > high:
                pos = (pos + step) & (size - 1)
    if pos != 0:
        raise ValueError("zstd: FSE table construction failed")
    nxt = [1 if c == -1 else c for c in counts]
    table = []
    for state in range(size):
        s = symbols[state]
        x = nxt[s]
        nxt[s] += 1
        nb = accuracy - (x.bit_length() - 1)
        table.append((s, nb, (x << nb) - size))
    return table


def _fse_decode_interleaved(table, accuracy: int, stream: _BackwardBits,
                            max_out: int = 999):
    """Two alternating FSE states until the stream is exhausted (the Huffman
    weights encoding, RFC 8878 §4.2.1.1)."""
    out = []
    s1 = stream.read(accuracy)
    s2 = stream.read(accuracy)
    while len(out) < max_out:
        sym, nb, base = table[s1]
        out.append(sym)
        if stream.remaining < nb:
            out.append(table[s2][0])
            break
        s1 = base + stream.read(nb)
        sym, nb, base = table[s2]
        out.append(sym)
        if stream.remaining < nb:
            out.append(table[s1][0])
            break
        s2 = base + stream.read(nb)
    return out


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _huf_table_from_weights(weights: list[int]):
    """Canonical Huffman decode table from explicit weights (last implicit).
    Returns (table, max_bits) — table[v] = (symbol, code_len) for the
    max_bits-bit prefix v."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: empty Huffman weights")
    p2 = 1 << (total - 1).bit_length()
    if p2 < total:
        p2 <<= 1
    rest = p2 - total
    if rest & (rest - 1):
        raise ValueError("zstd: non-canonical Huffman weights")
    last_w = rest.bit_length()  # log2(rest) + 1
    weights = weights + [last_w]
    max_bits = p2.bit_length() - 1
    table = [(0, 0)] * (1 << max_bits)
    pos = 0
    for w in range(1, max_bits + 1):
        span = 1 << (w - 1)
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            length = max_bits + 1 - w
            for i in range(span):
                table[pos + i] = (sym, length)
            pos += span
    if pos != len(table):
        raise ValueError("zstd: Huffman table not filled")
    return table, max_bits


def huf_read_table(data: bytes, pos: int):
    """Parse a Huffman tree description; returns (table, max_bits, new_pos)."""
    hbyte = data[pos]
    pos += 1
    if hbyte >= 128:  # direct representation: 4-bit weights
        n = hbyte - 127
        nbytes = (n + 1) // 2
        raw = data[pos:pos + nbytes]
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        pos += nbytes
    else:  # FSE-compressed weights
        comp = data[pos:pos + hbyte]
        pos += hbyte
        fwd = _ForwardBits(comp)
        counts, acc = fse_read_ncount(fwd, 255)
        table = fse_build_dtable(counts, acc)
        stream = _BackwardBits(comp[fwd.consumed_bytes():])
        weights = _fse_decode_interleaved(table, acc, stream, max_out=255)
    return (*_huf_table_from_weights(weights), pos)


def _huf_decode_stream(data: bytes, table, max_bits: int, n_out: int) -> bytes:
    stream = _BackwardBits(data)
    out = bytearray(n_out)
    for i in range(n_out):
        sym, length = table[stream.peek(max_bits)]
        stream.read(length)
        out[i] = sym
    # a valid stream is exactly consumed after the declared symbol count
    # (the reference decoder's BIT_endOfDStream check) — leftovers mean the
    # payload didn't encode what the header declared
    if stream.remaining != 0:
        raise ValueError("zstd: corrupt Huffman stream "
                         f"({stream.remaining} bits left after {n_out} symbols)")
    return bytes(out)


# ---------------------------------------------------------------------------
# sequences: predefined distributions + code tables (RFC 8878 §3.1.1.3.2)
# ---------------------------------------------------------------------------

LL_DEFAULTS = ([4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
                2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
                -1, -1, -1, -1], 6)
ML_DEFAULTS = ([1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
                -1, -1, -1, -1, -1], 6)
OF_DEFAULTS = ([1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
                1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1], 5)

LL_BASE = list(range(16)) + [16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128,
                             256, 512, 1024, 2048, 4096, 8192, 16384, 32768,
                             65536]
LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13,
                      14, 15, 16]
ML_BASE = list(range(3, 35)) + [35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99,
                                131, 259, 515, 1027, 2051, 4099, 8195, 16387,
                                32771, 65539]
ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12,
                      13, 14, 15, 16]

_MAX_SYMBOL = {"ll": 35, "of": 31, "ml": 52}
_DEFAULTS = {"ll": LL_DEFAULTS, "of": OF_DEFAULTS, "ml": ML_DEFAULTS}


def _seq_table(kind: str, mode: int, data: bytes, pos: int, prev):
    """One sequence-code table per the 2-bit compression mode. Returns
    ((table, accuracy), new_pos)."""
    if mode == 0:  # predefined
        counts, acc = _DEFAULTS[kind]
        return (fse_build_dtable(counts, acc), acc), pos
    if mode == 1:  # RLE: one byte, every state yields this symbol, 0 bits
        sym = data[pos]
        return ([(sym, 0, 0)], 0), pos + 1
    if mode == 2:  # FSE-compressed description
        fwd = _ForwardBits(data, pos)
        counts, acc = fse_read_ncount(fwd, _MAX_SYMBOL[kind])
        return (fse_build_dtable(counts, acc), acc), fwd.consumed_bytes()
    if prev is None:
        raise ValueError(f"zstd: repeat mode for {kind} with no previous table")
    return prev, pos


# ---------------------------------------------------------------------------
# block + frame decoding
# ---------------------------------------------------------------------------


class _FrameState:
    """Cross-block state within one frame: repeat offsets, last Huffman
    table, last FSE tables (repeat modes)."""

    def __init__(self):
        self.rep = [1, 4, 8]
        self.huf = None          # (table, max_bits)
        self.seq_tables = {"ll": None, "of": None, "ml": None}


def _decode_literals(data: bytes, pos: int, st: _FrameState):
    b0 = data[pos]
    ltype = b0 & 3
    size_fmt = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if size_fmt in (0, 2):
            regen = b0 >> 3
            pos += 1
        elif size_fmt == 1:
            regen = (b0 >> 4) | (data[pos + 1] << 4)
            pos += 2
        else:
            regen = (b0 >> 4) | (data[pos + 1] << 4) | (data[pos + 2] << 12)
            pos += 3
        if ltype == 0:
            return data[pos:pos + regen], pos + regen
        return bytes([data[pos]]) * regen, pos + 1
    # Compressed (2) / Treeless (3)
    if size_fmt == 0:
        hdr = int.from_bytes(data[pos:pos + 3], "little")
        regen = (hdr >> 4) & 0x3FF
        comp = (hdr >> 14) & 0x3FF
        pos += 3
        streams = 1
    elif size_fmt == 1:
        hdr = int.from_bytes(data[pos:pos + 3], "little")
        regen = (hdr >> 4) & 0x3FF
        comp = (hdr >> 14) & 0x3FF
        pos += 3
        streams = 4
    elif size_fmt == 2:
        hdr = int.from_bytes(data[pos:pos + 4], "little")
        regen = (hdr >> 4) & 0x3FFF
        comp = (hdr >> 18) & 0x3FFF
        pos += 4
        streams = 4
    else:
        hdr = int.from_bytes(data[pos:pos + 5], "little")
        regen = (hdr >> 4) & 0x3FFFF
        comp = (hdr >> 22) & 0x3FFFF
        pos += 5
        streams = 4
    section = data[pos:pos + comp]
    pos += comp
    spos = 0
    if ltype == 2:
        table, max_bits, spos = huf_read_table(section, 0)
        st.huf = (table, max_bits)
    elif st.huf is None:
        raise ValueError("zstd: treeless literals with no previous table")
    table, max_bits = st.huf
    if streams == 1:
        lit = _huf_decode_stream(section[spos:], table, max_bits, regen)
    else:
        s1 = int.from_bytes(section[spos:spos + 2], "little")
        s2 = int.from_bytes(section[spos + 2:spos + 4], "little")
        s3 = int.from_bytes(section[spos + 4:spos + 6], "little")
        spos += 6
        n123 = (regen + 3) // 4
        sizes = [s1, s2, s3, len(section) - spos - s1 - s2 - s3]
        outs = [n123, n123, n123, regen - 3 * n123]
        lit = b""
        for sz, n in zip(sizes, outs):
            lit += _huf_decode_stream(section[spos:spos + sz], table,
                                      max_bits, n)
            spos += sz
    if len(lit) != regen:
        raise ValueError("zstd: literals length mismatch")
    return lit, pos


def _decode_sequences(data: bytes, pos: int, end: int, st: _FrameState):
    """Returns list of (literal_length, match_length, offset_value)."""
    b0 = data[pos]
    pos += 1
    if b0 == 0:
        return [], pos
    if b0 < 128:
        nseq = b0
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) + data[pos]
        pos += 1
    else:
        nseq = int.from_bytes(data[pos:pos + 2], "little") + 0x7F00
        pos += 2
    modes = data[pos]
    pos += 1
    (ll_t, pos) = _seq_table("ll", (modes >> 6) & 3, data, pos,
                             st.seq_tables["ll"])
    (of_t, pos) = _seq_table("of", (modes >> 4) & 3, data, pos,
                             st.seq_tables["of"])
    (ml_t, pos) = _seq_table("ml", (modes >> 2) & 3, data, pos,
                             st.seq_tables["ml"])
    st.seq_tables.update(ll=ll_t, of=of_t, ml=ml_t)
    stream = _BackwardBits(data[pos:end])
    ll_state = stream.read(ll_t[1])
    of_state = stream.read(of_t[1])
    ml_state = stream.read(ml_t[1])
    seqs = []
    for i in range(nseq):
        of_code = of_t[0][of_state][0]
        offset_value = (1 << of_code) + stream.read(of_code)
        ml_code = ml_t[0][ml_state][0]
        ml = ML_BASE[ml_code] + stream.read(ML_BITS[ml_code])
        ll_code = ll_t[0][ll_state][0]
        ll = LL_BASE[ll_code] + stream.read(LL_BITS[ll_code])
        seqs.append((ll, ml, offset_value))
        if i + 1 < nseq:  # update order: LL, ML, OF
            _, nb, base = ll_t[0][ll_state]
            ll_state = base + stream.read(nb)
            _, nb, base = ml_t[0][ml_state]
            ml_state = base + stream.read(nb)
            _, nb, base = of_t[0][of_state]
            of_state = base + stream.read(nb)
    return seqs, end


def _execute(seqs, literals: bytes, out: bytearray, st: _FrameState):
    lit_pos = 0
    for ll, ml, ov in seqs:
        if ll:
            out += literals[lit_pos:lit_pos + ll]
            lit_pos += ll
        if ov > 3:
            offset = ov - 3
            st.rep = [offset, st.rep[0], st.rep[1]]
        else:
            idx = ov - 1 if ll != 0 else ov
            if idx == 0:
                offset = st.rep[0]
            elif idx == 1:
                offset = st.rep[1]
                st.rep = [offset, st.rep[0], st.rep[2]]
            elif idx == 2:
                offset = st.rep[2]
                st.rep = [offset, st.rep[0], st.rep[1]]
            else:  # ll == 0 and ov == 3
                offset = st.rep[0] - 1
                if offset == 0:
                    raise ValueError("zstd: zero repeat offset")
                st.rep = [offset, st.rep[0], st.rep[1]]
        if offset > len(out):
            raise ValueError("zstd: offset beyond window")
        if ml:
            start = len(out) - offset
            if offset >= ml:
                out += out[start:start + ml]
            else:  # overlapping copy
                for i in range(ml):
                    out.append(out[start + i])
    out += literals[lit_pos:]


def _decode_frame(data: bytes, pos: int) -> tuple[bytearray, int]:
    magic = int.from_bytes(data[pos:pos + 4], "little")
    if magic != ZSTD_MAGIC:
        raise ValueError(f"zstd: bad magic {magic:#x}")
    pos += 4
    fhd = data[pos]
    pos += 1
    single = (fhd >> 5) & 1
    checksum = (fhd >> 2) & 1
    did_flag = fhd & 3
    fcs_flag = fhd >> 6
    if not single:
        pos += 1  # window descriptor (we keep the whole output in memory)
    pos += (0, 1, 2, 4)[did_flag]
    if did_flag:
        raise ValueError("zstd: dictionaries not supported")
    if fcs_flag == 0:
        pos += 1 if single else 0
    elif fcs_flag == 1:
        pos += 2
    elif fcs_flag == 2:
        pos += 4
    else:
        pos += 8
    st = _FrameState()
    out = bytearray()
    while True:
        if pos + 3 > len(data):
            raise ValueError("zstd: truncated input (missing block header)")
        hdr = int.from_bytes(data[pos:pos + 3], "little")
        pos += 3
        last = hdr & 1
        btype = (hdr >> 1) & 3
        bsize = hdr >> 3
        if btype == 0:  # raw
            out += data[pos:pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:  # compressed
            block_end = pos + bsize
            literals, pos = _decode_literals(data, pos, st)
            seqs, pos = _decode_sequences(data, pos, block_end, st)
            _execute(seqs, literals, out, st)
            pos = block_end
        else:
            raise ValueError("zstd: reserved block type")
        if last:
            break
    if checksum:
        pos += 4  # xxh64 low bytes — not verified
    return out, pos


def zstd_decompress(data: bytes) -> bytes:
    """Decode all frames in `data` (tile payloads are one frame)."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        frame, pos = _decode_frame(data, pos)
        out += frame
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """zstd decode, preferring a native binding when one exists."""
    try:
        import zstandard  # noqa: F401
        return zstandard.ZstdDecompressor().decompress(data)
    except ImportError:
        pass
    try:
        from compression import zstd as _z  # Python 3.14+
        return _z.decompress(data)
    except ImportError:
        pass
    return zstd_decompress(data)
