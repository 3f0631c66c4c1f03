"""DEFLATE/zlib entropy decoder — RFC 1951 + RFC 1950 from the spec.

The general-purpose entropy rung of the multimodal codec ladder: every
PNG rung so far (stored -> filtered -> Adam7) handed its IDAT stream to
stdlib ``zlib.decompress``; this module removes that boundary by
implementing the inflate side from the two RFCs in pure stdlib —

 - RFC 1951 DEFLATE: LSB-first bit stream, all three block types
   (BTYPE 0 stored with LEN/NLEN check, BTYPE 1 fixed-Huffman,
   BTYPE 2 dynamic-Huffman with the 19-symbol code-length alphabet and
   its 16/17/18 repeat codes), canonical Huffman decoding, the full
   length (257..285) / distance (0..29) extra-bit tables, and
   overlapping LZ77 back-references;
 - RFC 1950 zlib wrapper: CMF/FLG header check (FCHECK mod-31,
   method 8, FDICT rejected) and the trailing Adler-32 verified
   against a from-spec implementation.

The matching encoder keeps using stdlib ``zlib.compressobj`` (public
API) but drives it so every produced stream provably contains ALL
THREE block types: a default-strategy segment (dynamic), a
Z_SYNC_FLUSH (an empty stored block), and a Z_FIXED-strategy tail
(fixed codes) — so one corpus decode exercises the whole spec, and
tests can cross-check this decoder bit-for-bit against stdlib zlib in
both directions.

Reference parity note: the reference repo
(benseddikismail/matrix-multiplication-map-reduce-gcp) contains no codec
code at all — this module exists because the commissioned engine
treats multimodal blobs as first-class columns; the decode rides the
same Arrow-batched mapInPandas seam as every other ladder rung
(multimodal/blobs.py).

Scale posture: per-row CPU work with zero shuffle — the 100 TB shape
is a map-only stage whose parallelism is the number of input splits;
nothing here collects or broadcasts payload bytes.
"""

from __future__ import annotations

import struct
import sys

# Spark Python workers do not have this package on sys.path; closures
# that capture these codec functions must ship them BY VALUE (same
# opt-in as multimodal/blobs.py and multimodal/gif.py).
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

_ADLER_MOD = 65521
# Largest n with n*(n+1)/2 * 255 + (n+1)*(MOD-1) < 2**63 would allow far
# bigger chunks; 5552 is the classic largest block keeping 32-bit sums
# safe and is plenty for the int64 math below.
_ADLER_CHUNK = 5552

# RFC 1951 3.2.5: length codes 257..285 -> (extra bits, base length).
_LEN_EXTRA = (
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0,
)
_LEN_BASE = (
    3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
    35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258,
)
# Distance codes 0..29 -> (extra bits, base distance).
_DIST_EXTRA = (
    0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6,
    7, 7, 8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13,
)
_DIST_BASE = (
    1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193,
    257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097, 6145,
    8193, 12289, 16385, 24577,
)
# RFC 1951 3.2.7: order in which code-length-code lengths are stored.
_CLC_ORDER = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)

_MAX_BITS = 15


def adler32_spec(data: bytes) -> int:
    """Adler-32 per RFC 1950 section 8, vectorized in chunk blocks.

    For a chunk c appended after state (a0, b0):
      a1 = a0 + sum(c)
      b1 = b0 + len(c)*a0 + sum((len(c)-i) * c[i])   (i 0-based)
    all mod 65521.  Cross-checked against stdlib zlib.adler32 in tests.
    """
    import numpy as np

    a, b = 1, 0
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    for off in range(0, arr.size, _ADLER_CHUNK):
        c = arr[off : off + _ADLER_CHUNK]
        m = c.size
        weights = np.arange(m, 0, -1, dtype=np.int64)
        b = (b + m * a + int((weights * c).sum())) % _ADLER_MOD
        a = (a + int(c.sum())) % _ADLER_MOD
    return (b << 16) | a


class _Bits:
    """LSB-first bit reader over a bytes object (RFC 1951 3.1.1)."""

    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0

    def read(self, n: int) -> int:
        # Word-at-a-time refill (r13): up to 8 bytes per step via
        # int.from_bytes("little" — LSB-first stream order) instead of
        # one byte per Python iteration. Same bits, same positions.
        buf, cnt = self.buf, self.cnt
        if cnt < n:
            data, pos = self.data, self.pos
            while cnt < n:
                chunk = data[pos : pos + 8]
                if not chunk:
                    raise ValueError("truncated deflate stream")
                buf |= int.from_bytes(chunk, "little") << cnt
                pos += len(chunk)
                cnt += 8 * len(chunk)
            self.pos = pos
        self.buf = buf >> n
        self.cnt = cnt - n
        return buf & ((1 << n) - 1)

    def align(self) -> None:
        """Drop the partial byte (stored-block boundary, 3.2.4)."""
        drop = self.cnt % 8
        self.buf >>= drop
        self.cnt -= drop

    def byte_pos(self) -> int:
        """Position of the next unread byte (only valid when aligned)."""
        return self.pos - self.cnt // 8


_LUT_BITS = 9  # fixed lit codes are 7-9 bits; one peek resolves most symbols


class _Huffman:
    """Canonical Huffman table: decode by walking code lengths 1..15.

    counts[l] = number of codes of length l; symbols lists the coded
    symbols sorted by (length, symbol) — the canonical order (3.2.2).
    A 2**_LUT_BITS direct-lookup table (LSB-first bit-reversed codes,
    all suffix paddings filled in) resolves codes of length <=
    _LUT_BITS in a single list index; longer codes fall back to the
    canonical bit walk.
    """

    __slots__ = ("counts", "symbols", "lut")

    def __init__(self, lengths) -> None:
        counts = [0] * (_MAX_BITS + 1)
        for ln in lengths:
            counts[ln] += 1
        counts[0] = 0
        # Reject over-subscribed codes (more codes than the tree holds);
        # incomplete codes are tolerated and fail at decode time if hit.
        left = 1
        for ln in range(1, _MAX_BITS + 1):
            left = (left << 1) - counts[ln]
            if left < 0:
                raise ValueError("over-subscribed Huffman code lengths")
        offs = [0] * (_MAX_BITS + 2)
        for ln in range(1, _MAX_BITS + 1):
            offs[ln + 1] = offs[ln] + counts[ln]
        symbols = [0] * offs[_MAX_BITS + 1]
        for sym, ln in enumerate(lengths):
            if ln:
                symbols[offs[ln]] = sym
                offs[ln] += 1
        self.counts = counts
        self.symbols = symbols
        # Canonical code assignment (3.2.2) for the direct LUT.
        lut: list = [None] * (1 << _LUT_BITS)
        code = 0
        next_code = [0] * (_MAX_BITS + 2)
        for ln in range(1, _MAX_BITS + 1):
            code = (code + counts[ln - 1]) << 1
            next_code[ln] = code
        by_len: dict[int, int] = {}
        for sym, ln in enumerate(lengths):
            if not ln:
                continue
            c = next_code[ln]
            next_code[ln] += 1
            if ln <= _LUT_BITS:
                # reverse to the stream's LSB-first order, pad suffixes
                rev = 0
                cc = c
                for _ in range(ln):
                    rev = (rev << 1) | (cc & 1)
                    cc >>= 1
                for pad in range(1 << (_LUT_BITS - ln)):
                    lut[rev | (pad << ln)] = (sym, ln)
        self.lut = lut

    def decode(self, bits: _Bits) -> int:
        # Fast path: peek _LUT_BITS bits (zero-padded near stream end)
        # and resolve the symbol with one table index. Word-at-a-time
        # refill (r13), same bits as the old per-byte loop.
        if bits.cnt < _LUT_BITS and bits.pos < len(bits.data):
            chunk = bits.data[bits.pos : bits.pos + 8]
            bits.buf |= int.from_bytes(chunk, "little") << bits.cnt
            bits.pos += len(chunk)
            bits.cnt += 8 * len(chunk)
        entry = self.lut[bits.buf & ((1 << _LUT_BITS) - 1)]
        if entry is not None and entry[1] <= bits.cnt:
            bits.buf >>= entry[1]
            bits.cnt -= entry[1]
            return entry[0]
        code = first = index = 0
        counts = self.counts
        for ln in range(1, _MAX_BITS + 1):
            code |= bits.read(1)
            count = counts[ln]
            if code - first < count:
                return self.symbols[index + code - first]
            index += count
            first = (first + count) << 1
            code <<= 1
        raise ValueError("invalid Huffman code in deflate stream")


def _fixed_tables():
    lit_lengths = [8] * 144 + [9] * 112 + [7] * 24 + [8] * 8
    return _Huffman(lit_lengths), _Huffman([5] * 30)


_FIXED_LIT, _FIXED_DIST = _fixed_tables()


def _dynamic_tables(bits: _Bits):
    """Read the BTYPE=2 table header (RFC 1951 3.2.7)."""
    hlit = bits.read(5) + 257
    hdist = bits.read(5) + 1
    hclen = bits.read(4) + 4
    if hlit > 286 or hdist > 30:
        raise ValueError("dynamic header: too many lit/dist codes")
    clc_lengths = [0] * 19
    for i in range(hclen):
        clc_lengths[_CLC_ORDER[i]] = bits.read(3)
    clc = _Huffman(clc_lengths)
    lengths: list[int] = []
    total = hlit + hdist
    while len(lengths) < total:
        sym = clc.decode(bits)
        if sym < 16:
            lengths.append(sym)
        elif sym == 16:
            if not lengths:
                raise ValueError("repeat code 16 with no previous length")
            lengths.extend([lengths[-1]] * (3 + bits.read(2)))
        elif sym == 17:
            lengths.extend([0] * (3 + bits.read(3)))
        else:  # 18
            lengths.extend([0] * (11 + bits.read(7)))
    if len(lengths) != total:
        raise ValueError("code-length repeats overflow the table")
    if lengths[256] == 0:
        raise ValueError("dynamic block has no end-of-block code")
    return _Huffman(lengths[:hlit]), _Huffman(lengths[hlit:])


def inflate_raw(data: bytes, pos: int = 0):
    """Inflate a raw RFC 1951 stream starting at byte offset ``pos``.

    Returns (payload, btypes, end_pos) where btypes is the BTYPE of
    every block in stream order and end_pos is the byte offset just
    past the final block (the stream is byte-aligned there).
    """
    bits = _Bits(data, pos)
    out = bytearray()
    btypes: list[int] = []
    while True:
        bfinal = bits.read(1)
        btype = bits.read(2)
        btypes.append(btype)
        if btype == 0:
            bits.align()
            ln = bits.read(16)
            nlen = bits.read(16)
            if ln != (~nlen & 0xFFFF):
                raise ValueError("stored block LEN/NLEN mismatch")
            start = bits.byte_pos()
            if start + ln > len(data):
                raise ValueError("truncated stored block")
            out += data[start : start + ln]
            bits = _Bits(data, start + ln)
        elif btype in (1, 2):
            if btype == 1:
                lit, dist = _FIXED_LIT, _FIXED_DIST
            else:
                lit, dist = _dynamic_tables(bits)
            while True:
                sym = lit.decode(bits)
                if sym < 256:
                    out.append(sym)
                elif sym == 256:
                    break
                else:
                    if sym > 285:
                        raise ValueError(f"invalid length symbol {sym}")
                    idx = sym - 257
                    length = _LEN_BASE[idx] + bits.read(_LEN_EXTRA[idx])
                    dsym = dist.decode(bits)
                    if dsym > 29:
                        raise ValueError(f"invalid distance symbol {dsym}")
                    d = _DIST_BASE[dsym] + bits.read(_DIST_EXTRA[dsym])
                    if d > len(out):
                        raise ValueError("distance back-reference before start")
                    # Overlapping copies replicate the trailing window
                    # d bytes at a time (RFC 1951 3.2.3 note).
                    while length > 0:
                        take = min(length, d)
                        out += out[-d : len(out) - d + take]
                        length -= take
        else:
            raise ValueError("reserved BTYPE=3 block")
        if bfinal:
            break
    bits.align()
    return bytes(out), btypes, bits.byte_pos()


def zlib_inflate(data: bytes):
    """Decode an RFC 1950 zlib stream; verify header + Adler-32.

    Returns (payload, btypes).
    """
    if len(data) < 6:
        raise ValueError("zlib stream shorter than header + checksum")
    cmf, flg = data[0], data[1]
    if cmf & 0x0F != 8:
        raise ValueError("unsupported zlib compression method")
    if ((cmf << 8) | flg) % 31 != 0:
        raise ValueError("bad zlib header FCHECK")
    if flg & 0x20:
        raise ValueError("preset dictionary (FDICT) unsupported")
    payload, btypes, end = inflate_raw(data, 2)
    if end + 4 > len(data):
        raise ValueError("truncated Adler-32 trailer")
    (stored,) = struct.unpack(">I", data[end : end + 4])
    actual = adler32_spec(payload)
    if stored != actual:
        raise ValueError(
            f"Adler-32 mismatch: stored {stored:#010x}, computed {actual:#010x}"
        )
    return payload, btypes


def zlib_multiblock_compress(payload: bytes, fixed_tail: int = 96) -> bytes:
    """Compress with stdlib zlib into a stream holding ALL THREE
    RFC 1951 block types: a Z_HUFFMAN_ONLY head (literal-only coding,
    where any skewed byte distribution makes the dynamic table beat
    the fixed 8/9-bit literals), a Z_SYNC_FLUSH boundary (an empty
    stored block), and a Z_FIXED-strategy final tail (fixed Huffman
    codes with LZ77 matching). Tests pin the per-blob block-type mix
    corpus-wide."""
    import zlib

    cut = max(0, len(payload) - fixed_tail)
    head = zlib.compressobj(6, zlib.DEFLATED, -15, 9, zlib.Z_HUFFMAN_ONLY)
    part1 = head.compress(payload[:cut]) + head.flush(zlib.Z_SYNC_FLUSH)
    tail = zlib.compressobj(6, zlib.DEFLATED, -15, 9, zlib.Z_FIXED)
    part2 = tail.compress(payload[cut:]) + tail.flush(zlib.Z_FINISH)
    cmf = 0x78  # method 8, 32K window
    flg = (31 - (cmf << 8) % 31) % 31  # FLEVEL 0, FDICT 0, valid FCHECK
    stream = (
        bytes((cmf, flg))
        + part1
        + part2
        + struct.pack(">I", zlib.adler32(payload) & 0xFFFFFFFF)
    )
    # The multimodal_deflate_decode oracle hardcodes has_all_btypes
    # TRUE, which holds only if zlib's internal choices (dynamic must
    # beat fixed under Z_HUFFMAN_ONLY; the payload must exceed the
    # fixed tail) really produced all three BTYPEs. Enforce the
    # contract HERE so corpus drift or a differently-tuned zlib build
    # (e.g. zlib-ng) fails loudly at encode time instead of as a
    # driver-red oracle hash mismatch (ADVICE r10).
    decoded, btypes = zlib_inflate(stream)
    if decoded != payload or set(btypes) != {0, 1, 2}:
        raise ValueError(
            f"zlib_multiblock_compress contract violated: btypes="
            f"{sorted(set(btypes))} (need {{0,1,2}}), len={len(payload)}"
        )
    return stream
