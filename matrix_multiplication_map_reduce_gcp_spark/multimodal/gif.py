"""GIF89a codec — real LZW entropy coding from the spec, pure stdlib.

The LOSSLESS entropy-coded rung of the multimodal codec ladder
(PNG filter ladder -> Adam7 -> JPEG -> this): unlike JPEG, LZW is
exact, so the driver oracle can recompute every decoded byte in SQL
instead of settling for a tolerance flag.

Implements the GIF89a on-disk format end to end:
 - header + logical screen descriptor + 256-entry global color table,
 - image descriptor (non-interlaced),
 - variable-width LZW (9->12 bits, LSB-first bit packing, CLEAR/EOI
   control codes, table reset on overflow per the spec),
 - 255-byte data sub-block framing + trailer.

Reference parity note: the reference repo
(benseddikismail/matrix-multiplication-map-reduce-gcp) contains no codec
code at all — this module exists because the commissioned engine
treats multimodal blobs as first-class columns; the decode rides the
same Arrow-batched mapInPandas seam as every other ladder rung
(multimodal/blobs.py).

Scale posture: encode/decode are per-row CPU work with zero shuffle —
the 100 TB shape is a map-only stage whose parallelism is the number
of input splits; nothing here ever collects or broadcasts pixels.
"""

from __future__ import annotations

import struct
import sys

# Spark Python workers do not have this package on sys.path; closures
# that capture these codec functions must ship them BY VALUE (same
# opt-in as multimodal/blobs.py and multimodal/jpeg.py).
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

GIF_MIN_CODE_SIZE = 8  # 256-color indexed stream
_CLEAR = 1 << GIF_MIN_CODE_SIZE  # 256
_EOI = _CLEAR + 1  # 257
_MAX_CODE = 4095  # 12-bit ceiling per the spec


def gif_palette() -> bytes:
    """The deterministic 256-entry global color table used by the
    ladder generator: entry j = (j, (j*7) % 256, (j*13) % 256). The
    decoder returns the palette it actually READ so the content check
    exercises the color-table bytes, not just the index stream."""
    out = bytearray()
    for j in range(256):
        out += bytes((j, (j * 7) % 256, (j * 13) % 256))
    return bytes(out)


def lzw_encode(indices: bytes, min_code_size: int = GIF_MIN_CODE_SIZE) -> bytes:
    """GIF-variant LZW: variable code width starting at
    min_code_size+1, LSB-first packing, leading CLEAR, trailing EOI,
    and a CLEAR + table reset when the next free slot would exceed
    4095 (the spec's 12-bit ceiling).

    Width-bump bookkeeping: the decoder grows its table one entry
    behind the encoder, and bumps when ITS next free slot reaches
    2**width; the encoder therefore bumps when its next free slot
    reaches 2**width + 1 — the classic off-by-one that round-trip
    tests alone cannot catch (a symmetric bug still round-trips), so
    tests/test_multimodal.py pins the exact code stream of a small
    known input as well."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, width)
    it = iter(indices)
    try:
        cur = next(it)
    except StopIteration:
        emit(eoi, width)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)
    for k in it:
        seen = table.get((cur, k))
        if seen is not None:
            cur = seen
            continue
        emit(cur, width)
        if next_code <= _MAX_CODE:
            table[(cur, k)] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            # Table full: reset per spec so the stream stays standard
            # even for pathological inputs (never reached by the
            # <=1024-px ladder geometry; exercised in tests).
            emit(clear, width)
            table.clear()
            width = min_code_size + 1
            next_code = eoi + 1
        cur = k
    emit(cur, width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def lzw_decode(
    data: bytes, n_expected: int, min_code_size: int = GIF_MIN_CODE_SIZE
) -> bytes:
    """Inverse of lzw_encode, tolerant of deferred CLEAR (a full table
    simply stops growing until the encoder clears). Raises on corrupt
    streams: a code beyond the table frontier, a missing EOI, or more
    output than the image descriptor promised."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    # table[c] = decoded byte string for code c; roots are implicit.
    table: list[bytes] = [bytes((i,)) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("corrupt GIF: LZW stream ended before EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            del table[eoi + 1 :]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF: first code is not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError(
                f"corrupt GIF: code {code} beyond table frontier {len(table)}"
            )
        out += entry
        if prev is not None and len(table) <= _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > n_expected:
            raise ValueError(
                f"corrupt GIF: {len(out)} pixels decoded, descriptor "
                f"declares {n_expected}"
            )
    if len(out) != n_expected:
        raise ValueError(
            f"corrupt GIF: {len(out)} pixels decoded, descriptor "
            f"declares {n_expected}"
        )
    return bytes(out)


def gif_encode(width: int, height: int, indices: bytes) -> bytes:
    """Standards-shaped GIF89a: header, logical screen descriptor,
    256-entry global color table (gif_palette), one non-interlaced
    image, LZW-compressed pixel data in <=255-byte sub-blocks,
    trailer. Any standards-compliant GIF viewer renders the output."""
    if len(indices) != width * height:
        raise ValueError("index stream does not match geometry")
    # packed: GCT present | 8 bits/channel color resolution | GCT size 2^(7+1)
    lsd = struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    imd = struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    lzw = lzw_encode(indices)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return (
        b"GIF89a"
        + lsd
        + gif_palette()
        + imd
        + bytes((GIF_MIN_CODE_SIZE,))
        + bytes(blocks)
        + b"\x3B"
    )


def gif_decode(data: bytes) -> tuple[int, int, bytes, bytes]:
    """Decode a GIF89a produced by gif_encode (or any single-image,
    non-interlaced, 256-color GCT GIF): returns (width, height,
    palette, indices) with palette the 768 color-table bytes actually
    read and indices the LZW-decoded pixel stream. Raises on foreign
    shapes (interlace, local color tables, missing trailer) instead of
    guessing — the honest-guard convention of wav_decode/avi_decode."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF: bad signature")
    w_screen, h_screen, packed, _bg, _aspect = struct.unpack(
        "<HHBBB", data[6:13]
    )
    if not packed & 0x80:
        raise ValueError("unsupported GIF: no global color table")
    gct_size = 2 << (packed & 0x07)
    if gct_size != 256:
        raise ValueError("unsupported GIF: need a 256-entry color table")
    pos = 13
    palette = data[pos : pos + gct_size * 3]
    if len(palette) != gct_size * 3:
        raise ValueError("corrupt GIF: truncated color table")
    pos += gct_size * 3
    # Skip extension blocks (0x21 introducer + label + sub-blocks).
    while pos < len(data) and data[pos] == 0x21:
        pos += 2
        while data[pos]:
            pos += 1 + data[pos]
        pos += 1
    if pos >= len(data) or data[pos] != 0x2C:
        raise ValueError("corrupt GIF: missing image descriptor")
    _, left, top, width, height, ipacked = struct.unpack(
        "<BHHHHB", data[pos : pos + 10]
    )
    pos += 10
    if ipacked & 0x80:
        raise ValueError("unsupported GIF: local color table")
    if ipacked & 0x40:
        raise ValueError("unsupported GIF: interlaced image")
    if left or top or width > w_screen or height > h_screen:
        raise ValueError("corrupt GIF: image exceeds logical screen")
    mcs = data[pos]
    pos += 1
    if mcs != GIF_MIN_CODE_SIZE:
        raise ValueError("unsupported GIF: need an 8-bit index stream")
    lzw = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("corrupt GIF: unterminated data sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            break
        if len(data) - pos < ln:
            raise ValueError("corrupt GIF: truncated data sub-block")
        lzw += data[pos : pos + ln]
        pos += ln
    if pos >= len(data) or data[pos] != 0x3B:
        raise ValueError("corrupt GIF: missing trailer")
    indices = lzw_decode(bytes(lzw), width * height)
    return width, height, palette, indices
