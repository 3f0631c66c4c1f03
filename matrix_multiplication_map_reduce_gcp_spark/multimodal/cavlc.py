"""CAVLC residual coding for the AVC intra rung ("AVCC") — the
H.264 context-adaptive entropy layer the AVC1 rung documented as its
remaining surface (avc.py module docstring; VERDICT r11 #3).

The reference repo contains no codec code (it moves JSON matrices
through GCS, reference orchestrator/main.py:54-64); this rung exists
for the engine's multimodal north star. CAVLC's substance is
ALGORITHMIC — which table is consulted when, and how the level coder
adapts — and that machinery is implemented here spec-faithfully
(ITU-T H.264 §9.2):

* SYNTAX STRUCTURE (9.2, residual_block_cavlc): coeff_token jointly
  coding (TotalCoeff, TrailingOnes ≤ 3) → trailing-one sign flags in
  reverse zigzag order → remaining levels in reverse zigzag order →
  total_zeros (zeros before the highest-frequency coefficient) →
  run_before per coefficient with zerosLeft bookkeeping (runs stop
  being coded when zerosLeft hits 0; the lowest-frequency coefficient
  absorbs the remainder and never codes a run).
* CONTEXT SELECTION (9.2.1): nC = (nA + nB + 1) >> 1 when both the
  left and upper neighbor block coefficient counts are available,
  else the available one, else 0; table choice by the spec's
  thresholds nC < 2 / < 4 / < 8 / ≥ 8 (the last a fixed-length code).
* LEVEL CODING ADAPTATION (9.2.2.1): suffixLength starts at 1 iff
  TotalCoeff > 10 and TrailingOnes < 3, else 0; levelCode =
  2·(|level|−1) + sign, the first non-trailing level is reduced by 2
  when TrailingOnes < 3 (its magnitude is known ≥ 2); each coded
  level bumps suffixLength (to a cap of 6) when |level| >
  3 << (suffixLength − 1); codeword = unary level_prefix +
  suffixLength-bit level_suffix.

What is deliberately NOT transcribed (the jpeg/mpeg-ladder
discipline: a falsely-claimed spec table is worse than a documented
substitution): the CODEWORD BIT PATTERNS of Tables 9-5 (coeff_token),
9-7/9-8 (total_zeros) and 9-10 (run_before). The substitutes keep the
tables' adaptive STRUCTURE measurable —

* coeff_token tables 0-2: TotalCoeff rides ue(v) of the zigzag
  distance from a per-table anchor (0/2/4) — short codes exactly
  where the context predicts the count, which is what the spec's
  three tables realize — plus a 2-bit TrailingOnes field; the nC ≥ 8
  context is a fixed-length (TotalCoeff << 2 | TrailingOnes) code,
  the spec's own structure for that context.
* total_zeros: fixed-width ceil(log2(17 − TotalCoeff)) bits — the
  width SELECTED BY TotalCoeff, as the spec's table family is.
* run_before: fixed-width ceil(log2(zerosLeft + 1)) bits — selected
  by zerosLeft, as Table 9-10's columns are.
* the level-coder escape (levelCode ≥ 15 << suffixLength) codes the
  remainder as ue(v) instead of the spec's 12-bit/extended-prefix
  ladder.

Encoder and decoder share every mapping, so round-trips are bit-exact
by construction; tests/test_multimodal.py pins the coeff_token
machinery exhaustively over every (nC context, TotalCoeff,
TrailingOnes) triple and the suffixLength adaptation against hand
walks.
"""

from __future__ import annotations

import struct
import sys

import numpy as np

from pyspark import cloudpickle

from .avc import (
    B,
    DC,
    MAX_QP,
    N_MODES,
    ZIGZAG4,
    _adler32,
    _available_modes,
    _code_mode,
    _decode_mode,
    _neighbors,
    dequant_inverse_transform,
    dequant_inverse_transform_batch,
    forward_transform_quant,
    predict_4x4,
    ue_decode,
    ue_encode,
)
from .mpeg import _BitReader, _BitWriter, unary_zeros

cloudpickle.register_pickle_by_value(sys.modules[__name__])

MAGIC = b"AVCC"

# coeff_token context anchors for the three VLC tables (nC < 2 /
# < 4 / < 8): the TotalCoeff each context codes shortest.
_ANCHORS = (0, 2, 4)
_MAX_COEFF = B * B


def n_c(tc: np.ndarray, by: int, bx: int) -> int:
    """coeff_token context (9.2.1): mean of the available neighbor
    blocks' TotalCoeff, rounded up; 0 when neither neighbor exists."""
    na = int(tc[by, bx - 1]) if bx > 0 else None
    nb = int(tc[by - 1, bx]) if by > 0 else None
    if na is not None and nb is not None:
        return (na + nb + 1) >> 1
    if na is not None:
        return na
    if nb is not None:
        return nb
    return 0


def _table_index(nc: int) -> int:
    """9.2.1 table choice: 0 for nC<2, 1 for nC<4, 2 for nC<8,
    3 = the fixed-length context for nC >= 8."""
    if nc < 2:
        return 0
    if nc < 4:
        return 1
    if nc < 8:
        return 2
    return 3


def _zig_dist(v: int, anchor: int) -> int:
    return 2 * (v - anchor) if v >= anchor else 2 * (anchor - v) - 1


def _zig_undist(d: int, anchor: int) -> int:
    return anchor + d // 2 if d % 2 == 0 else anchor - (d + 1) // 2


def _coeff_token_encode(bw: _BitWriter, total: int, t1: int, nc: int) -> None:
    t = _table_index(nc)
    if t == 3:
        bw.write((total << 2) | t1, 7)
        return
    ue_encode(bw, _zig_dist(total, _ANCHORS[t]))
    bw.write(t1, 2)


def _coeff_token_decode(br: _BitReader, nc: int) -> tuple[int, int]:
    t = _table_index(nc)
    if t == 3:
        v = br.read(7)
        total, t1 = v >> 2, v & 3
    else:
        total = _zig_undist(ue_decode(br), _ANCHORS[t])
        t1 = br.read(2)
    if not 0 <= total <= _MAX_COEFF or t1 > min(3, total):
        raise ValueError("corrupt AVCC: bad coeff_token")
    return total, t1


def _flc_width(n: int) -> int:
    """Width of the fixed-length field for values in [0, n]."""
    return max(1, n.bit_length()) if n > 0 else 0


def _level_encode(bw: _BitWriter, levels: list[int], t1: int) -> None:
    """9.2.2.1 level coding with suffixLength adaptation over the
    non-trailing levels (highest frequency first)."""
    total = len(levels) + t1
    suffix_len = 1 if total > 10 and t1 < 3 else 0
    for i, lv in enumerate(levels):
        code = 2 * (abs(lv) - 1) + (1 if lv < 0 else 0)
        if i == 0 and t1 < 3:
            code -= 2
        if code < (15 << suffix_len):
            prefix = code >> suffix_len
            bw.write(0, prefix)
            bw.write(1, 1)
            if suffix_len:
                bw.write(code & ((1 << suffix_len) - 1), suffix_len)
        else:
            bw.write(0, 15)
            bw.write(1, 1)
            ue_encode(bw, code - (15 << suffix_len))
        if suffix_len == 0:
            suffix_len = 1
        if abs(lv) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1


def _level_decode(br: _BitReader, n: int, t1: int) -> list[int]:
    total = n + t1
    suffix_len = 1 if total > 10 and t1 < 3 else 0
    out = []
    for i in range(n):
        prefix = unary_zeros(br, 15, "corrupt AVCC: bad level prefix")
        if prefix < 15:
            code = prefix << suffix_len
            if suffix_len:
                code |= br.read(suffix_len)
        else:
            code = (15 << suffix_len) + ue_decode(br)
        if i == 0 and t1 < 3:
            code += 2
        lv = (code >> 1) + 1
        if code & 1:
            lv = -lv
        out.append(lv)
        if suffix_len == 0:
            suffix_len = 1
        if abs(lv) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    return out


def cavlc_encode_block(bw: _BitWriter, z: np.ndarray, nc: int) -> int:
    """Encode one 4x4 coefficient block; returns TotalCoeff (the
    caller records it — it is the nC context of later blocks)."""
    zz = z.ravel()[list(ZIGZAG4)]
    nz = [(k, int(v)) for k, v in enumerate(zz) if v]
    total = len(nz)
    # Trailing ones: up to 3 consecutive +-1 at the high-frequency end.
    t1 = 0
    while t1 < min(3, total) and abs(nz[total - 1 - t1][1]) == 1:
        t1 += 1
    _coeff_token_encode(bw, total, t1, nc)
    if total == 0:
        return 0
    for i in range(t1):  # sign flags, highest frequency first
        bw.write(1 if nz[total - 1 - i][1] < 0 else 0, 1)
    _level_encode(
        bw, [v for _, v in reversed(nz[: total - t1])], t1
    )
    last_pos = nz[-1][0]
    total_zeros = last_pos + 1 - total
    if total < _MAX_COEFF:
        bw.write(total_zeros, _flc_width(_MAX_COEFF - total))
    zeros_left = total_zeros
    for i in range(total - 1, 0, -1):  # runs, highest frequency first
        if zeros_left == 0:
            break
        run = nz[i][0] - nz[i - 1][0] - 1
        bw.write(run, _flc_width(zeros_left))
        zeros_left -= run
    return total


def cavlc_decode_block(br: _BitReader, nc: int) -> tuple[np.ndarray, int]:
    """Decode one 4x4 coefficient block; returns (block, TotalCoeff)."""
    total, t1 = _coeff_token_decode(br, nc)
    out = np.zeros(_MAX_COEFF, dtype=np.int64)
    if total == 0:
        return out.reshape(B, B), 0
    signs = [br.read(1) for _ in range(t1)]
    levels = _level_decode(br, total - t1, t1)
    # Levels in decode order are highest frequency first: t1 ones,
    # then the coded levels.
    seq = [(-1 if s else 1) for s in signs] + levels
    if total < _MAX_COEFF:
        total_zeros = br.read(_flc_width(_MAX_COEFF - total))
    else:
        total_zeros = 0
    if total + total_zeros > _MAX_COEFF:
        raise ValueError("corrupt AVCC: total_zeros overflow")
    pos = total + total_zeros - 1
    zeros_left = total_zeros
    zz = np.zeros(_MAX_COEFF, dtype=np.int64)
    for i, lv in enumerate(seq):
        if pos < 0:
            raise ValueError("corrupt AVCC: coefficient underflow")
        zz[pos] = lv
        if i == total - 1:
            break
        run = br.read(_flc_width(zeros_left)) if zeros_left > 0 else 0
        if run > zeros_left:
            raise ValueError("corrupt AVCC: run_before overflow")
        zeros_left -= run
        pos -= run + 1
    out[list(ZIGZAG4)] = zz
    return out.reshape(B, B), total


def avcc_encode_stats(width: int, height: int, qp: int, plane: bytes):
    """AVC intra encode with CAVLC residuals (blob magic "AVCC").
    Identical prediction/transform/mode machinery to avc.py's AVC1 —
    the residual entropy layer is the only difference. Returns
    (blob, modes, recon, tc) with ``tc`` the per-block TotalCoeff
    array (the nC context field, closed-loop identical to the
    decoder's by construction)."""
    if width % B or height % B or width < B or height < B:
        raise ValueError("AVCC requires 4-px-aligned dimensions")
    if not 0 <= qp <= MAX_QP:
        raise ValueError(f"AVCC profile: qp must be 0..{MAX_QP}")
    src = np.frombuffer(plane, dtype=np.uint8).reshape(height, width)
    if len(plane) != width * height:
        raise ValueError("plane size mismatch")
    nby, nbx = height // B, width // B
    recon = np.zeros((height, width), dtype=np.uint8)
    modes = np.full((nby, nbx), -1, dtype=np.int64)
    tc = np.zeros((nby, nbx), dtype=np.int64)
    bw = _BitWriter()
    for by in range(nby):
        for bx in range(nbx):
            y0, x0 = by * B, bx * B
            blk = src[y0 : y0 + B, x0 : x0 + B].astype(np.int64)
            top, left, topleft, topright = _neighbors(recon, by, bx, nbx)
            best_mode, best_pred, best_sad = None, None, None
            for mode in _available_modes(by > 0, bx > 0):
                pred = predict_4x4(mode, top, left, topleft, topright)
                sad = int(np.abs(blk - pred).sum())
                if best_sad is None or sad < best_sad:
                    best_mode, best_pred, best_sad = mode, pred, sad
            mode_a = int(modes[by, bx - 1]) if bx > 0 else DC
            mode_b = int(modes[by - 1, bx]) if by > 0 else DC
            _code_mode(bw, best_mode, min(mode_a, mode_b))
            z = forward_transform_quant(blk - best_pred, qp)
            tc[by, bx] = cavlc_encode_block(bw, z, n_c(tc, by, bx))
            rec = np.clip(
                best_pred + dequant_inverse_transform(z, qp), 0, 255
            )
            recon[y0 : y0 + B, x0 : x0 + B] = rec.astype(np.uint8)
            modes[by, bx] = best_mode
    payload = bw.flush()
    blob = (
        MAGIC
        + struct.pack(">HHBI", width, height, qp, len(payload))
        + payload
        + struct.pack(">I", _adler32(recon))
    )
    return blob, modes, recon, tc


def avcc_decode(data: bytes):
    """Decode an AVCC stream. Returns (width, height, qp, recon,
    modes, tc); the trailer Adler-32 is verified."""
    if data[:4] != MAGIC:
        raise ValueError("not an AVCC stream: bad magic")
    if len(data) < 13:
        raise ValueError("truncated AVCC header")
    width, height, qp, plen = struct.unpack(">HHBI", data[4:13])
    if width % B or height % B or not width or not height:
        raise ValueError("corrupt AVCC: bad geometry")
    if qp > MAX_QP:
        raise ValueError("corrupt AVCC: qp out of profile")
    if len(data) != 13 + plen + 4:
        raise ValueError("corrupt AVCC: payload length mismatch")
    br = _BitReader(data[13 : 13 + plen])
    nby, nbx = height // B, width // B
    recon = np.zeros((height, width), dtype=np.uint8)
    modes = np.full((nby, nbx), -1, dtype=np.int64)
    tc = np.zeros((nby, nbx), dtype=np.int64)
    # r13: two passes, as in avc_decode. The bitstream (modes, CAVLC
    # residuals — whose nC context needs only already-entropy-decoded
    # neighbor TotalCoeffs) has no dependency on the reconstruction,
    # so the entropy pass runs first and the residual inverse
    # transforms batch into ONE numpy call; only the prediction loop
    # stays closed-loop sequential.
    zs = np.empty((nby * nbx, B, B), dtype=np.int64)
    i = 0
    for by in range(nby):
        for bx in range(nbx):
            mode_a = int(modes[by, bx - 1]) if bx > 0 else DC
            mode_b = int(modes[by - 1, bx]) if by > 0 else DC
            modes[by, bx] = _decode_mode(br, min(mode_a, mode_b))
            z, total = cavlc_decode_block(br, n_c(tc, by, bx))
            tc[by, bx] = total
            zs[i] = z
            i += 1
    resid = dequant_inverse_transform_batch(zs, qp)
    i = 0
    for by in range(nby):
        for bx in range(nbx):
            y0, x0 = by * B, bx * B
            top, left, topleft, topright = _neighbors(recon, by, bx, nbx)
            pred = predict_4x4(int(modes[by, bx]), top, left, topleft,
                               topright)
            rec = np.clip(pred + resid[i], 0, 255)
            recon[y0 : y0 + B, x0 : x0 + B] = rec.astype(np.uint8)
            i += 1
    if br.overrun():
        raise ValueError("corrupt AVCC: entropy stream truncated")
    (crc,) = struct.unpack(">I", data[13 + plen : 13 + plen + 4])
    if crc != _adler32(recon):
        raise ValueError("corrupt AVCC: reconstruction checksum mismatch")
    return width, height, qp, recon, modes, tc
