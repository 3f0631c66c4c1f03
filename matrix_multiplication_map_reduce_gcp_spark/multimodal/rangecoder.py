"""Context-adaptive binary arithmetic coder — the ADAPTIVE-ENTROPY
rung of the multimodal codec ladder, pure stdlib.

Every prior entropy rung uses static or semi-static codes (Huffman
tables, Rice parameters, LZW dictionaries). This rung implements the
remaining entropy-coding technology class — the arithmetic/range
coding that backs CABAC in H.264/HEVC and the coder family formalized
by Witten, Neal & Cleary (CACM 1987, "Arithmetic coding for data
compression"): a binary arithmetic coder with carry-free E1/E2/E3
interval rescaling at 32-bit precision, driven by a CONTEXT-ADAPTIVE
probability model — 255 bit-tree contexts (one per byte-prefix node,
CABAC's context-model idea at order 0), each an adaptive 0/1 counter
pair that halves at a rescale bound so the model tracks local
statistics. Integer-only arithmetic ⇒ bit-reproducible across
machines.

The container is this repo's own minimal frame (there is no public
interchange format for a bare coder): magic ``RC01``, big-endian
payload length, the code bytes, and a trailing from-spec Adler-32
(multimodal/inflate.py) of the DECODED payload verified after
decoding — so a mis-scaled interval or a stale context state is a
hard decode error, not silent corruption.

Test posture note (vs the GIF rung's hand-pinned code stream): an
arithmetic coder has no external byte-stream conformance target, and
a symmetric encoder/decoder bug cannot corrupt a round-trip — so the
tests pin what IS falsifiable: lossless round-trips across content
classes, genuine adaptive compression (skewed content must beat 8
bits/byte; constant content must collapse), model-state determinism
(two encodes of the same payload are byte-identical), and corruption
rejection via the checksum.

Reference parity note: the reference repo
(benseddikismail/matrix-multiplication-map-reduce-gcp) contains no codec
code; this rung exists for the commissioned multimodal pipeline and
rides the same Arrow-batched mapInPandas seam as the other rungs.

Scale posture: per-row CPU work, zero shuffle — a map-only stage at
any corpus size; nothing collects or broadcasts payload bytes.
"""

from __future__ import annotations

import struct
import sys

from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

from .inflate import adler32_spec  # noqa: E402  (from-spec Adler-32)

_BITS = 32
_TOP = 1 << _BITS
_HALF = _TOP >> 1
_QUARTER = _TOP >> 2
_MASK = _TOP - 1
_RESCALE = 1 << 16  # halve context counts at this total
MAGIC = b"RC01"


class _Model:
    """255 adaptive bit-tree contexts: ctx 1 is the byte root, each
    decision walks ctx -> 2*ctx + bit; counts start at (1, 1) and
    halve (floor, min 1) at the rescale bound."""

    __slots__ = ("c0", "c1")

    def __init__(self) -> None:
        self.c0 = [1] * 256
        self.c1 = [1] * 256

    def update(self, ctx: int, bit: int) -> None:
        if bit:
            self.c1[ctx] += 1
        else:
            self.c0[ctx] += 1
        if self.c0[ctx] + self.c1[ctx] >= _RESCALE:
            self.c0[ctx] = max(1, self.c0[ctx] >> 1)
            self.c1[ctx] = max(1, self.c1[ctx] >> 1)


class _Encoder:
    __slots__ = ("low", "high", "pending", "out", "buf", "cnt")

    def __init__(self) -> None:
        self.low = 0
        self.high = _MASK
        self.pending = 0
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def _emit(self, bit: int) -> None:
        self.buf = (self.buf << 1) | bit
        self.cnt += 1
        if self.cnt == 8:
            self.out.append(self.buf)
            self.buf = 0
            self.cnt = 0

    def _emit_with_pending(self, bit: int) -> None:
        self._emit(bit)
        while self.pending:
            self._emit(bit ^ 1)
            self.pending -= 1

    def encode(self, bit: int, c0: int, c1: int) -> None:
        span = self.high - self.low + 1
        mid = self.low + (span * c0) // (c0 + c1) - 1
        if bit:
            self.low = mid + 1
        else:
            self.high = mid
        while True:
            if self.high < _HALF:
                self._emit_with_pending(0)
            elif self.low >= _HALF:
                self._emit_with_pending(1)
                self.low -= _HALF
                self.high -= _HALF
            elif self.low >= _QUARTER and self.high < 3 * _QUARTER:
                self.pending += 1
                self.low -= _QUARTER
                self.high -= _QUARTER
            else:
                break
            self.low <<= 1
            self.high = (self.high << 1) | 1

    def finish(self) -> bytes:
        # Disambiguate the final interval (WNC: one quarter bit).
        self.pending += 1
        self._emit_with_pending(0 if self.low < _QUARTER else 1)
        while self.cnt:
            self._emit(0)
        return bytes(self.out)


class _Decoder:
    __slots__ = ("data", "pos", "low", "high", "value")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.low = 0
        self.high = _MASK
        self.value = 0
        for _ in range(_BITS):
            self.value = (self.value << 1) | self._bit()

    def _bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            return 0  # the coder's implicit trailing zeros
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def decode(self, c0: int, c1: int) -> int:
        span = self.high - self.low + 1
        mid = self.low + (span * c0) // (c0 + c1) - 1
        if self.value > mid:
            bit = 1
            self.low = mid + 1
        else:
            bit = 0
            self.high = mid
        while True:
            if self.high < _HALF:
                pass
            elif self.low >= _HALF:
                self.low -= _HALF
                self.high -= _HALF
                self.value -= _HALF
            elif self.low >= _QUARTER and self.high < 3 * _QUARTER:
                self.low -= _QUARTER
                self.high -= _QUARTER
                self.value -= _QUARTER
            else:
                break
            self.low <<= 1
            self.high = (self.high << 1) | 1
            self.value = (self.value << 1) | self._bit()
        return bit


def rc_encode(payload: bytes) -> bytes:
    """Encode payload into the RC01 frame (adaptive contexts reset per
    frame, so encoding is a pure function of the payload).

    r13: the coder/model/emitter are inlined as loop locals — the
    per-BIT encode()/update()/_emit() method calls were most of this
    function's wall — and the output bits collect in a list packed
    once with np.packbits (MSB-first, zero-padded: exactly _Encoder's
    byte assembly + finish padding). Bit streams are identical to the
    class-based reference (pinned by tests/test_bitio_r13.py and
    roundtrip-verified over the sf0.1 corpus)."""
    import numpy as np

    c0 = [1] * 256
    c1 = [1] * 256
    low = 0
    high = _MASK
    pending = 0
    bits_out: list = []
    ap = bits_out.append
    ext = bits_out.extend
    half, quarter, q3 = _HALF, _QUARTER, 3 * _QUARTER
    for byte in payload:
        ctx = 1
        for k in range(7, -1, -1):
            bit = (byte >> k) & 1
            nc0 = c0[ctx]
            nc1 = c1[ctx]
            span = high - low + 1
            mid = low + (span * nc0) // (nc0 + nc1) - 1
            if bit:
                low = mid + 1
                nc1 += 1
            else:
                high = mid
                nc0 += 1
            if nc0 + nc1 >= _RESCALE:
                nc0 = max(1, nc0 >> 1)
                nc1 = max(1, nc1 >> 1)
            c0[ctx] = nc0
            c1[ctx] = nc1
            while True:
                if high < half:
                    ap(0)
                    if pending:
                        ext([1] * pending)
                        pending = 0
                elif low >= half:
                    ap(1)
                    if pending:
                        ext([0] * pending)
                        pending = 0
                    low -= half
                    high -= half
                elif low >= quarter and high < q3:
                    pending += 1
                    low -= quarter
                    high -= quarter
                else:
                    break
                low <<= 1
                high = (high << 1) | 1
            ctx = (ctx << 1) | bit
    # Disambiguate the final interval (WNC: one quarter bit).
    pending += 1
    if low < quarter:
        ap(0)
        ext([1] * pending)
    else:
        ap(1)
        ext([0] * pending)
    code = np.packbits(np.array(bits_out, dtype=np.uint8)).tobytes()
    return (
        MAGIC
        + struct.pack(">I", len(payload))
        + code
        + struct.pack(">I", adler32_spec(payload))
    )


def rc_encode_ref(payload: bytes) -> bytes:
    """Class-based sequential reference (the r12 form): kept for the
    bit-identity pin in tests/test_bitio_r13.py."""
    model = _Model()
    enc = _Encoder()
    c0, c1 = model.c0, model.c1
    for byte in payload:
        ctx = 1
        for k in range(7, -1, -1):
            bit = (byte >> k) & 1
            enc.encode(bit, c0[ctx], c1[ctx])
            model.update(ctx, bit)
            ctx = (ctx << 1) | bit
    code = enc.finish()
    return (
        MAGIC
        + struct.pack(">I", len(payload))
        + code
        + struct.pack(">I", adler32_spec(payload))
    )


def rc_decode(data: bytes) -> bytes:
    """Decode an RC01 frame; verifies magic, length, and the trailing
    Adler-32 of the decoded payload."""
    if data[:4] != MAGIC:
        raise ValueError("not an RC01 frame: bad magic")
    if len(data) < 12:
        raise ValueError("truncated RC01 frame")
    (n,) = struct.unpack(">I", data[4:8])
    (stored,) = struct.unpack(">I", data[-4:])
    # r13: coder/model state inlined as loop locals (the per-bit
    # decode()/update()/_bit() method calls were most of the wall) and
    # the code bytes unpacked to a flat bit list once — reads past the
    # end yield the coder's implicit trailing zeros, exactly like
    # _Decoder._bit. Bit decisions identical to the class-based
    # reference (pinned by tests/test_bitio_r13.py).
    import numpy as np

    code = data[8:-4]
    bits = np.unpackbits(np.frombuffer(code, dtype=np.uint8)).tolist()
    nbits = len(bits)
    c0 = [1] * 256
    c1 = [1] * 256
    low = 0
    high = _MASK
    pos = 0
    value = 0
    for _ in range(_BITS):
        if pos < nbits:
            value = (value << 1) | bits[pos]
            pos += 1
        else:
            value <<= 1
    half, quarter, q3 = _HALF, _QUARTER, 3 * _QUARTER
    out = bytearray()
    for _ in range(n):
        ctx = 1
        for _ in range(8):
            nc0 = c0[ctx]
            nc1 = c1[ctx]
            span = high - low + 1
            mid = low + (span * nc0) // (nc0 + nc1) - 1
            if value > mid:
                bit = 1
                low = mid + 1
                nc1 += 1
            else:
                bit = 0
                high = mid
                nc0 += 1
            if nc0 + nc1 >= _RESCALE:
                nc0 = max(1, nc0 >> 1)
                nc1 = max(1, nc1 >> 1)
            c0[ctx] = nc0
            c1[ctx] = nc1
            while True:
                if high < half:
                    pass
                elif low >= half:
                    low -= half
                    high -= half
                    value -= half
                elif low >= quarter and high < q3:
                    low -= quarter
                    high -= quarter
                    value -= quarter
                else:
                    break
                low <<= 1
                high = (high << 1) | 1
                if pos < nbits:
                    value = (value << 1) | bits[pos]
                    pos += 1
                else:
                    value <<= 1
            ctx = (ctx << 1) | bit
        out.append(ctx & 0xFF)
    payload = bytes(out)
    actual = adler32_spec(payload)
    if actual != stored:
        raise ValueError(
            f"RC01 Adler-32 mismatch: stored {stored:#010x}, "
            f"decoded {actual:#010x}"
        )
    return payload
