"""FLAC codec (native-FLAC subset) — the PREDICTIVE lossless-audio
rung of the codec ladder, from the spec (RFC 9639), pure stdlib.

Where the ADPCM rung is lossy sample-by-sample adaptation and the
DEFLATE rung is generic byte-stream entropy coding, FLAC is the
domain-structured shape modern lossless audio uses: per-frame FIXED
linear predictors (orders 0-2 here, chosen per frame by residual
cost) whose residuals are entropy-coded with ADAPTIVE Rice codes
(per-partition parameter, brute-force-optimal here, escape-to-raw
supported), wrapped in the real container framing —

 - "fLaC" marker + STREAMINFO metadata block (block sizes, sample
   rate, channels, bits-per-sample, total samples, and the spec's
   MD5 of the unencoded little-endian PCM, verified on decode),
 - frame headers: 14-bit sync, blocking strategy, coded block-size /
   sample-rate bits, UTF-8-style coded frame number, CRC-8,
 - subframes: CONSTANT / VERBATIM / FIXED with warm-up samples,
 - residual coding method 0 (4-bit Rice parameters, partition order,
   zigzag mapping, unary quotients), parameter 15 = escaped raw bits,
 - frame footer CRC-16 (poly 0x8005) over the whole frame.

Everything is bit-exact and content-checked: FLAC is lossless, so the
registry oracle recomputes the decoded sample stream (and its sums)
from the generation rule in SQL, and the decoder independently
verifies CRC-8, CRC-16, and the STREAMINFO MD5.

Reference parity note: the reference repo
(benseddikismail/matrix-multiplication-map-reduce-gcp) contains no codec
code; this rung exists for the commissioned multimodal pipeline and
rides the same Arrow-batched mapInPandas seam as the other rungs
(multimodal/blobs.py).

Scale posture: per-row CPU work, zero shuffle — a map-only stage at
any corpus size; nothing collects or broadcasts samples. The Rice
loops are scalar per sample (the unary scan is inherently
sequential), the predictor/parameter SELECTION is vectorized numpy.
"""

from __future__ import annotations

import hashlib
import struct
import sys

# Spark Python workers do not have this package on sys.path; ship the
# codec by value (same opt-in as blobs.py / jpeg.py / gif.py).
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

BLOCK_SIZE = 1024  # fixed encoding block size (frames except the tail)
MAX_FIXED_ORDER = 2
RICE_ESCAPE = 15  # 4-bit parameter 0b1111 -> 5-bit raw bitwidth follows


def _crc_table(poly: int, width: int):
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return tuple(table)


_CRC8_TABLE = _crc_table(0x07, 8)  # x^8 + x^2 + x + 1
_CRC16_TABLE = _crc_table(0x8005, 16)  # x^16 + x^15 + x^2 + 1


def crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC16_TABLE[((crc >> 8) ^ b) & 0xFF] ^ ((crc << 8) & 0xFFFF)
    return crc


class _BitWriter:
    """MSB-first bit packer (FLAC bit order)."""

    __slots__ = ("out", "buf", "cnt")

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, value: int, nbits: int) -> None:
        self.buf = (self.buf << nbits) | (value & ((1 << nbits) - 1))
        self.cnt += nbits
        while self.cnt >= 8:
            self.cnt -= 8
            self.out.append((self.buf >> self.cnt) & 0xFF)
        self.buf &= (1 << self.cnt) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then a one bit

    def align(self) -> None:
        if self.cnt:
            self.write(0, 8 - self.cnt)

    def getvalue(self) -> bytes:
        assert self.cnt == 0, "unaligned frame"
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader."""

    __slots__ = ("data", "pos", "buf", "cnt")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0

    def read(self, nbits: int) -> int:
        # Word-at-a-time refill (r13): up to 8 bytes per step via
        # int.from_bytes instead of one byte per Python iteration;
        # consumed high bits are masked at refill, not per read. Same
        # bit windows from the same positions (pinned bit-identical in
        # tests/test_multimodal.py).
        cnt = self.cnt
        if cnt < nbits:
            buf = self.buf & ((1 << cnt) - 1)
            data, pos = self.data, self.pos
            while cnt < nbits:
                chunk = data[pos : pos + 8]
                if not chunk:
                    raise ValueError("truncated FLAC stream")
                k = len(chunk)
                buf = (buf << (8 * k)) | int.from_bytes(chunk, "big")
                pos += k
                cnt += 8 * k
            self.buf, self.pos = buf, pos
        cnt -= nbits
        self.cnt = cnt
        return (self.buf >> cnt) & ((1 << nbits) - 1)

    def read_unary(self) -> int:
        # Peek-based zero count (r13): resolve a whole buffered window
        # per step instead of one read(1) call per bit. Raises exactly
        # where the sequential loop did: truncation when the zeros run
        # exhausts the data, runaway past 2^20 zeros.
        q = 0
        while True:
            cnt = self.cnt
            window = self.buf & ((1 << cnt) - 1)
            if window:
                z = cnt - window.bit_length()
                self.cnt = cnt - z - 1
                q += z
                if q > 1 << 20:
                    raise ValueError(
                        "runaway unary code in FLAC residual"
                    )
                return q
            q += cnt
            self.cnt = 0
            self.buf = 0
            if q > 1 << 20:
                raise ValueError("runaway unary code in FLAC residual")
            chunk = self.data[self.pos : self.pos + 8]
            if not chunk:
                raise ValueError("truncated FLAC stream")
            self.buf = int.from_bytes(chunk, "big")
            self.cnt = 8 * len(chunk)
            self.pos += len(chunk)

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def align(self) -> None:
        # Drop only the partial byte (r13): the word-at-a-time reader
        # buffers multiple WHOLE bytes ahead, which must survive an
        # align — the old buf=cnt=0 form was equivalent only while the
        # byte-at-a-time reader kept cnt < 8. Stale bits above cnt are
        # masked at extraction/refill.
        self.cnt -= self.cnt % 8

    def byte_pos(self) -> int:
        return self.pos - self.cnt // 8


def _utf8_code(value: int) -> bytes:
    """FLAC's UTF-8-style coded number (frame number here)."""
    if value < 0x80:
        return bytes((value,))
    out = []
    nbytes = 2
    while value >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead | (value >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((value >> shift) & 0x3F))
    return bytes(out)


def _utf8_decode(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("invalid FLAC coded number")
    value = b0 & (mask - 1)
    for _ in range(nbytes - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("invalid FLAC coded number continuation")
        value = (value << 6) | (b & 0x3F)
    return value


def _fixed_residual(x, order: int):
    import numpy as np

    r = np.asarray(x, dtype=np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _rice_cost(u, k: int) -> int:
    import numpy as np

    return int(np.sum(u >> k)) + u.size * (k + 1)


def _encode_subframe(bw: _BitWriter, block, bps: int) -> None:
    """CONSTANT if flat, else best FIXED order 0-2 with the exact
    cheapest Rice parameter (escape to raw when that wins)."""
    import numpy as np

    x = np.asarray(block, dtype=np.int64)
    if np.all(x == x[0]):
        bw.write(0, 1)
        bw.write(0b000000, 6)  # CONSTANT
        bw.write(0, 1)
        bw.write(int(x[0]), bps)
        return
    best = None
    for order in range(MAX_FIXED_ORDER + 1):
        if x.size <= order:
            continue
        res = _fixed_residual(x, order)
        u = (np.abs(res) << 1) - (res < 0)  # zigzag
        costs = [(_rice_cost(u, k), k) for k in range(RICE_ESCAPE)]
        raw_w = int(max(1, (int(u.max()).bit_length() + 1 if res.size else 1)))
        costs.append((4 + 5 + res.size * raw_w, RICE_ESCAPE))
        cost, k = min(costs)
        total = order * bps + cost
        if best is None or total < best[0]:
            best = (total, order, k, res, u, raw_w)
    _, order, k, res, u, raw_w = best
    bw.write(0, 1)
    bw.write(0b001000 | order, 6)  # FIXED, order
    bw.write(0, 1)  # no wasted bits
    for warm in x[:order]:
        bw.write(int(warm), bps)
    bw.write(0b00, 2)  # residual method: 4-bit Rice
    bw.write(0, 4)  # partition order 0: one partition
    if k == RICE_ESCAPE:
        bw.write(RICE_ESCAPE, 4)
        bw.write(raw_w, 5)
        for v in res:
            bw.write(int(v), raw_w)
    else:
        bw.write(k, 4)
        for uv in u:
            uv = int(uv)
            bw.write_unary(uv >> k)
            if k:
                bw.write(uv, k)


def _decode_subframe(br: _BitReader, blocksize: int, bps: int):
    if br.read(1):
        raise ValueError("subframe padding bit set")
    stype = br.read(6)
    if br.read(1):
        raise ValueError("wasted bits unsupported in this subset")
    if stype == 0b000000:  # CONSTANT
        v = br.read_signed(bps)
        return [v] * blocksize
    if stype == 0b000001:  # VERBATIM
        return [br.read_signed(bps) for _ in range(blocksize)]
    if not 0b001000 <= stype <= 0b001000 + 4:
        raise ValueError(f"unsupported FLAC subframe type {stype:#08b}")
    order = stype & 0x07
    if order > MAX_FIXED_ORDER:
        raise ValueError(f"fixed order {order} outside encoder subset")
    warm = [br.read_signed(bps) for _ in range(order)]
    if br.read(2) != 0b00:
        raise ValueError("unsupported residual coding method")
    part_order = br.read(4)
    n_res = blocksize - order
    res: list[int] = []
    n_parts = 1 << part_order
    for p in range(n_parts):
        count = (blocksize >> part_order) - (order if p == 0 else 0)
        k = br.read(4)
        if k == RICE_ESCAPE:
            raw_w = br.read(5)
            for _ in range(count):
                res.append(_signed(br.read(raw_w), raw_w))
        else:
            for _ in range(count):
                q = br.read_unary()
                u = (q << k) | (br.read(k) if k else 0)
                res.append((u >> 1) ^ -(u & 1))  # un-zigzag
    if len(res) != n_res:
        raise ValueError("residual count mismatch")
    out = list(warm)
    if order == 0:
        out = res
    elif order == 1:
        acc = out[-1]
        for r in res:
            acc += r
            out.append(acc)
    else:  # order 2
        for r in res:
            out.append(r + 2 * out[-1] - out[-2])
    return out


def _signed(v: int, nbits: int) -> int:
    return v - (1 << nbits) if nbits and v >> (nbits - 1) else v


def _encode_frame(frame_no: int, block, sample_rate: int, bps: int) -> bytes:
    bw = _BitWriter()
    bw.write(0b11111111111110, 14)  # sync
    bw.write(0, 1)  # reserved
    bw.write(0, 1)  # fixed blocking strategy
    bw.write(0b0111, 4)  # block size: explicit 16-bit at header end
    bw.write(0b0000, 4)  # sample rate: from STREAMINFO
    bw.write(0b0000, 4)  # channel assignment: mono
    bw.write(0b100, 3)  # sample size: 16 bits
    bw.write(0, 1)  # reserved
    header = bw.out  # 4 bytes so far, byte-aligned
    assert bw.cnt == 0
    header += _utf8_code(frame_no)
    header += struct.pack(">H", len(block) - 1)
    bw.out = header
    bw.write(crc8(bytes(header)), 8)
    _encode_subframe(bw, block, bps)
    bw.align()
    bw.write(crc16(bytes(bw.out)), 16)
    return bw.getvalue()


def flac_encode(sample_rate: int, samples) -> bytes:
    """Encode 16-bit mono PCM into a native-FLAC-subset stream."""
    samples = [int(s) for s in samples]
    n = len(samples)
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    md5 = hashlib.md5(pcm).digest()
    frames = []
    frame_no = 0
    for off in range(0, n, BLOCK_SIZE):
        frames.append(
            _encode_frame(
                frame_no, samples[off : off + BLOCK_SIZE], sample_rate, 16
            )
        )
        frame_no += 1
    streaminfo = _BitWriter()
    sizes = [len(f) for f in frames] or [0]
    # RFC 9639: min/max block size EXCLUDE the (possibly short) last
    # block — every non-last block here is exactly BLOCK_SIZE. For an
    # input shorter than one block the ONLY frame is the short one, so
    # the fields carry its size, floored at the spec minimum of 16
    # (ADVICE r10 — the unconditional BLOCK_SIZE was spec-inaccurate
    # for sub-block inputs; ladder blobs are always >= 1401 samples).
    blk = BLOCK_SIZE if n >= BLOCK_SIZE else max(16, n)
    streaminfo.write(blk, 16)
    streaminfo.write(blk, 16)
    streaminfo.write(min(sizes), 24)
    streaminfo.write(max(sizes), 24)
    streaminfo.write(sample_rate, 20)
    streaminfo.write(0, 3)  # channels - 1
    streaminfo.write(15, 5)  # bps - 1
    streaminfo.write(n, 36)
    body = streaminfo.getvalue() + md5
    assert len(body) == 34
    header = bytes((0x80,)) + struct.pack(">I", len(body))[1:]  # last, type 0
    return b"fLaC" + header + body + b"".join(frames)


def flac_decode(data: bytes):
    """Decode a native-FLAC-subset stream.

    Returns (sample_rate, n_samples, n_frames, samples). Verifies the
    marker, STREAMINFO geometry, every frame's CRC-8 and CRC-16, frame
    numbering, and the STREAMINFO MD5 of the decoded PCM.
    """
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream: bad marker")
    pos = 4
    sample_rate = total = None
    md5 = b""
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        (ln,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        if btype == 0:
            br = _BitReader(body)
            br.read(16)
            br.read(16)
            br.read(24)
            br.read(24)
            sample_rate = br.read(20)
            if br.read(3) != 0:
                raise ValueError("only mono supported in this subset")
            if br.read(5) != 15:
                raise ValueError("only 16-bit supported in this subset")
            total = br.read(36)
            md5 = body[18:34]
        if last:
            break
    if sample_rate is None:
        raise ValueError("missing STREAMINFO")
    samples: list[int] = []
    n_frames = 0
    while pos < len(data):
        frame_start = pos
        br = _BitReader(data, pos)
        if br.read(14) != 0b11111111111110:
            raise ValueError("bad frame sync code")
        br.read(1)
        if br.read(1):
            raise ValueError("variable blocking strategy unsupported")
        bs_code = br.read(4)
        sr_code = br.read(4)
        if br.read(4) != 0:
            raise ValueError("only mono supported in this subset")
        if br.read(3) != 0b100:
            raise ValueError("only 16-bit supported in this subset")
        br.read(1)
        frame_no = _utf8_decode(br)
        if frame_no != n_frames:
            raise ValueError(
                f"frame number {frame_no} out of order (expected {n_frames})"
            )
        if bs_code == 0b0110:
            blocksize = br.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = br.read(16) + 1
        elif bs_code == 0b0001:
            blocksize = 192
        elif 0b0010 <= bs_code <= 0b0101:
            blocksize = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            blocksize = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved block size code")
        if sr_code not in (0,):
            raise ValueError("only STREAMINFO sample rate supported")
        header_end = br.byte_pos()
        if crc8(data[frame_start:header_end]) != br.read(8):
            raise ValueError("frame header CRC-8 mismatch")
        block = _decode_subframe(br, blocksize, 16)
        br.align()
        body_end = br.byte_pos()
        stored_crc = br.read(16)
        if crc16(data[frame_start:body_end]) != stored_crc:
            raise ValueError("frame CRC-16 mismatch")
        samples.extend(block)
        n_frames += 1
        pos = br.byte_pos()
    if total is not None and len(samples) != total:
        raise ValueError(
            f"decoded {len(samples)} samples, STREAMINFO promised {total}"
        )
    pcm = b"".join(struct.pack("<h", s) for s in samples)
    if hashlib.md5(pcm).digest() != md5:
        raise ValueError("STREAMINFO MD5 mismatch on decoded PCM")
    return sample_rate, len(samples), n_frames, samples
