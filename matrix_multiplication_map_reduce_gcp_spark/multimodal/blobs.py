"""Binary-column operators via mapInPandas.

`with_blob` manufactures a binary column from document text;
`with_png_blob` goes further and encodes REAL PNG files (stdlib
zlib/struct — signature, IHDR, IDAT with per-scanline filter bytes,
CRCs, IEND) whose dimensions and pixels derive deterministically from
the text. `decode_image_meta` then performs a REAL decode: it parses
the chunk stream, validates CRCs, inflates IDAT, strips scanline
filters, and reports metadata plus a pixel checksum — nothing is
passed side-band from the encoder. Swapping the codec for PIL/ffmpeg
changes only the two pure-Python codec functions; the Spark plumbing
(schema, Arrow batching, partitioning) is identical.

IMPORTANT (worker serialization): every function passed to
mapInPandas is a self-contained closure — no references to this
package's module globals — so cloudpickle ships it by value and the
Python workers never need the package importable on their sys.path.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The PNG codec functions below are captured by mapInPandas closures.
# Python workers do NOT have this package on sys.path, so module
# globals must ship BY VALUE inside the pickled closure instead of by
# module reference — cloudpickle supports exactly this opt-in.
from pyspark import cloudpickle

cloudpickle.register_pickle_by_value(sys.modules[__name__])

DECODE_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "n_pixels long, pixel_sum long"
)
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_offset long"


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column (+ keep doc_id)."""
    return docs.select("doc_id", F.encode("text", "utf-8").alias("blob"))


def png_encode(
    width: int, height: int, channels: int, pixels: bytes, row_filter: int = 0
) -> bytes:
    """Minimal REAL PNG writer (stdlib only): 8-bit greyscale or
    truecolor, one IDAT, correct CRCs. Readable by any
    standards-compliant viewer. ``row_filter`` picks the scanline
    filter: 0 (None) or 2 (Up — each row stores its delta vs the row
    above, the spec's cheap vertical predictor; repetitive pixel
    streams deflate much smaller, which is why real encoders filter)."""
    import struct
    import zlib

    if row_filter not in (0, 2):
        raise ValueError(f"unsupported encode filter {row_filter}")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    color_type = 2 if channels == 3 else 0
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    if row_filter == 0:
        raw = b"".join(
            b"\x00" + pixels[r * stride : (r + 1) * stride]
            for r in range(height)
        )
    else:  # Up: out[x] = cur[x] - prev[x] (mod 256), row-vectorized
        import numpy as np

        mat = np.frombuffer(pixels, dtype=np.uint8).reshape(height, stride)
        deltas = np.empty((height, stride + 1), dtype=np.uint8)
        deltas[:, 0] = 2
        deltas[0, 1:] = mat[0]
        deltas[1:, 1:] = mat[1:] - mat[:-1]  # uint8 wraps mod 256
        raw = deltas.tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


# Adam7 pass grid: (x_origin, y_origin, x_step, y_step) per pass, in
# pass order. Each pass is an independent sub-image for filtering
# (its first row's "above" is zero), serialized back-to-back in one
# deflate stream; passes whose sub-image is empty contribute nothing
# (not even filter bytes).
ADAM7_PASSES = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _defilter(mat, bpp: int):
    """Reverse the per-scanline filter over one (sub-)image: ``mat``
    is the (rows, stride+1) uint8 matrix of [filter_byte | bytes];
    returns the (rows, stride) reconstructed pixels. All five spec
    types; out-of-spec filter bytes raise. The common filters (None,
    Sub, Up) are one numpy op per ROW — uint8 add wraps mod 256
    natively, and Sub's left-recursion is a per-channel-lane cumsum —
    so the hot path costs O(rows) numpy calls, not O(pixel_bytes)
    Python iterations. Average and Paeth depend on the RECONSTRUCTED
    left byte — an inherently sequential recurrence along the row —
    but are vectorized ACROSS the channel lanes (one numpy step per
    PIXEL column, not per byte), so a foreign file using them costs
    O(width) interpreter iterations per row instead of
    O(width·channels) (ADVICE r9; they remain foreign-file-only —
    our encoders emit 0/2)."""
    import numpy as np

    rows, stride = mat.shape[0], mat.shape[1] - 1
    ftypes = mat[:, 0]
    if ftypes.max(initial=0) > 4:
        bad = int(ftypes[ftypes > 4][0])
        raise ValueError(f"corrupt PNG: filter byte {bad} out of spec")
    out = np.empty((rows, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(rows):
        ftype, line = int(ftypes[r]), mat[r, 1:]
        if ftype == 0:
            cur = line.copy()
        elif ftype == 1:  # Sub: + left ⇒ cumsum along each channel lane
            cur = np.empty(stride, dtype=np.uint8)
            for c in range(bpp):
                lane = line[c::bpp].astype(np.int64).cumsum()
                cur[c::bpp] = (lane % 256).astype(np.uint8)
        elif ftype == 2:  # Up: + above (uint8 add wraps mod 256)
            cur = line + prev
        elif ftype == 3:  # Average: + floor((left + above)/2)
            ln = line.reshape(-1, bpp).astype(np.int64)
            pv = prev.reshape(-1, bpp).astype(np.int64)
            rec = np.empty_like(ln)
            left = np.zeros(bpp, dtype=np.int64)
            for xi in range(ln.shape[0]):
                left = (ln[xi] + (left + pv[xi]) // 2) & 0xFF
                rec[xi] = left
            cur = rec.astype(np.uint8).reshape(-1)
        else:  # Paeth predictor
            ln = line.reshape(-1, bpp).astype(np.int64)
            pv = prev.reshape(-1, bpp).astype(np.int64)
            rec = np.empty_like(ln)
            a = np.zeros(bpp, dtype=np.int64)  # reconstructed left
            c = np.zeros(bpp, dtype=np.int64)  # reconstructed upper-left
            for xi in range(ln.shape[0]):
                b = pv[xi]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                a = (ln[xi] + pred) & 0xFF
                rec[xi] = a
                c = b
            cur = rec.astype(np.uint8).reshape(-1)
        out[r] = cur
        prev = cur
    return out


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Minimal REAL PNG reader (stdlib only): walks the chunk stream,
    checks the signature and chunk CRCs, parses IHDR, inflates the
    concatenated IDAT stream, and reverses the per-scanline filter —
    all five spec filter types (0 None, 1 Sub, 2 Up, 3 Average,
    4 Paeth) — for BOTH interlace methods (0 sequential, 1 Adam7: the
    seven passes de-filter independently, then scatter back onto the
    full raster by the pass grid), so any standards-compliant 8-bit
    PNG decodes; an out-of-spec filter byte raises. Returns
    (width, height, channels, pixel_bytes) in raster order."""
    import struct
    import zlib

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG: bad signature")
    pos, idat = 8, b""
    width = height = color_type = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + ln
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace not in (0, 1):
                raise ValueError("unsupported PNG: need 8-bit, interlace 0/1")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("invalid PNG: no IHDR chunk")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride = width * channels
    import numpy as np

    bpp = channels  # bytes per pixel at depth 8
    if interlace == 0:
        if len(raw) != height * (stride + 1):
            raise ValueError(
                f"corrupt PNG: inflated {len(raw)} bytes, "
                f"expected {height * (stride + 1)}"
            )
        mat = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
        return width, height, channels, _defilter(mat, bpp).tobytes()

    # Adam7: seven independently-filtered sub-images back-to-back in
    # one deflate stream; de-filter each, then one vectorized numpy
    # scatter per pass puts its pixels on the full raster grid.
    img = np.zeros((height, width, channels), dtype=np.uint8)
    pos = 0
    buf = np.frombuffer(raw, dtype=np.uint8)
    for x0, y0, dx, dy in ADAM7_PASSES:
        wp = (width - x0 + dx - 1) // dx
        hp = (height - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        sp = wp * channels
        nbytes = hp * (sp + 1)
        if pos + nbytes > len(buf):
            raise ValueError("corrupt PNG: Adam7 stream truncated")
        mat = buf[pos : pos + nbytes].reshape(hp, sp + 1)
        pos += nbytes
        img[y0::dy, x0::dx, :] = _defilter(mat, bpp).reshape(hp, wp, channels)
    if pos != len(buf):
        raise ValueError(
            f"corrupt PNG: {len(buf) - pos} trailing bytes after Adam7 passes"
        )
    return width, height, channels, img.tobytes()


def with_png_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, blob) where blob is a REAL PNG: width/height from the
    first/last text byte (1..8 each), truecolor iff the byte length is
    even, pixels cycling through the text bytes."""
    encode = png_encode  # bind by value for the worker closure

    def op(batches):
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    # The SQL oracles index text by CHARACTER
                    # (ascii(substr)) while this generator indexes
                    # UTF-8 BYTES — identical only for ASCII. A
                    # non-ASCII doc must raise loudly, never
                    # silently diverge from the oracle (ADVICE r8;
                    # corpus ASCII-ness is also pinned in
                    # tests/test_multimodal.py).
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                w = 1 + (b[0] % 8) if b else 1
                h = 1 + (b[-1] % 8) if b else 1
                ch = 3 if len(b) % 2 == 0 else 1
                need = w * h * ch
                px = (b * (need // max(1, len(b)) + 1))[:need] if b else b"\x00" * need
                rows.append((doc_id, encode(w, h, ch, px)))
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])
            rows = []

    return docs.select("doc_id", "text").mapInPandas(op, "doc_id long, blob binary")


def decode_image_meta(docs: DataFrame) -> DataFrame:
    """(doc_id, width, height, channels, n_pixels, pixel_sum) via
    Arrow-batched mapInPandas — one Python crossing per batch, not per
    row. The decode is REAL: everything reported is recovered from the
    PNG byte stream (chunk walk, CRC check, inflate, de-filter), never
    from the generation parameters."""
    decode = png_decode

    def op(batches):
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, ch, px = decode(bytes(blob))
                rows.append((doc_id, w, h, ch, w * h, sum(px)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels", "n_pixels", "pixel_sum",
                ],
            )
            rows = []

    return with_png_blob(docs).mapInPandas(op, DECODE_SCHEMA)


def with_png_blob_filtered(docs: DataFrame) -> DataFrame:
    """(doc_id, blob) at the LARGER ladder geometry with Up-filtered
    scanlines: 16..32 px per side (width from the first text byte,
    height from the last), always truecolor, pixel i =
    (byte[i mod n] + (i // 7) * 13) mod 256, rows stored as filter-2
    deltas before deflate — the shape real encoders emit. Geometry is
    bounded at 32x32x3 = 3072 px so the SQL oracle's per-pixel UNNEST
    stays ~1.5M rows at sf0.01.

    Unlike the header-light decode trilogy, this stage is CPU-bound
    (inflate + de-filter over ~3 KB of pixels/doc), so decode
    parallelism must not be hostage to file layout: a single-file
    corpus plans as ONE input partition and would serialize the whole
    codec on one core (measured 1.8 s at sf0.1 on local[32]). The
    deliberate round-robin repartition of the tiny (doc_id, text)
    rows below is the production shape for CPU-heavy codecs over few
    large files — the one Exchange this query's plan gate allows."""
    encode = png_encode  # bind by value for the worker closure

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    # Same ASCII corpus contract as every byte-indexed
                    # generator (see with_png_blob).
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                w = 16 + (b[0] % 17) if n else 16
                h = 16 + (b[-1] % 17) if n else 16
                m = w * h * 3
                i = np.arange(m, dtype=np.int64)
                src = (
                    np.frombuffer(b, dtype=np.uint8).astype(np.int64)[i % n]
                    if n
                    else np.zeros(m, dtype=np.int64)
                )
                px = ((src + (i // 7) * 13) % 256).astype(np.uint8).tobytes()
                rows.append((doc_id, encode(w, h, 3, px, row_filter=2)))
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, blob binary")


def decode_image_meta_filtered(docs: DataFrame) -> DataFrame:
    """decode_image_meta over the filtered/large-geometry blobs: the
    decoder must reverse the Up filter on every scanline before the
    reported pixel_sum can match the oracle's per-pixel recompute —
    a filter-ignoring reader fails the content hash, not just a
    header check."""
    decode = png_decode

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, ch, px = decode(bytes(blob))
                psum = int(np.frombuffer(px, dtype=np.uint8).sum(dtype=np.int64))
                rows.append((doc_id, w, h, ch, w * h, psum))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels", "n_pixels", "pixel_sum",
                ],
            )
            rows = []

    return with_png_blob_filtered(docs).mapInPandas(op, DECODE_SCHEMA)


def png_encode_adam7(
    width: int, height: int, channels: int, pixels: bytes, row_filter: int = 2
) -> bytes:
    """Minimal REAL interlaced PNG writer (stdlib only): IHDR
    interlace=1, pixels split into the seven Adam7 passes, each pass
    filtered as an INDEPENDENT sub-image (its first row's "above" is
    zero — the spec's rule), all passes deflated into one IDAT.
    ``row_filter``: 0 (None) or 2 (Up within the pass). Readable by
    any standards-compliant viewer."""
    import struct
    import zlib

    import numpy as np

    if row_filter not in (0, 2):
        raise ValueError(f"unsupported encode filter {row_filter}")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    color_type = 2 if channels == 3 else 0
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 1)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    parts = []
    for x0, y0, dx, dy in ADAM7_PASSES:
        wp = (width - x0 + dx - 1) // dx
        hp = (height - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        sub = img[y0::dy, x0::dx, :].reshape(hp, wp * channels)
        ser = np.empty((hp, wp * channels + 1), dtype=np.uint8)
        ser[:, 0] = row_filter
        if row_filter == 0:
            ser[:, 1:] = sub
        else:  # Up within the pass: row r stores sub[r] - sub[r-1]
            ser[0, 1:] = sub[0]
            ser[1:, 1:] = sub[1:] - sub[:-1]  # uint8 wraps mod 256
        parts.append(ser.tobytes())
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + chunk(b"IEND", b"")
    )


# Position weight modulus for the Adam7 content check: pixel_sum alone
# is PERMUTATION-INVARIANT, so a decoder that de-filters correctly but
# scatters a pass to the wrong grid cells would still match it. The
# weighted digest sum((i % ADAM7_W_MOD + 1) * px[i]) over RASTER order
# breaks under any misplacement. 9973 is prime (no resonance with the
# 1..32-px strides); max term 9973*255*3072 per doc stays far inside
# int64.
ADAM7_W_MOD = 9973


def with_png_blob_adam7(docs: DataFrame) -> DataFrame:
    """(doc_id, blob) ADAM7-INTERLACED at the filtered ladder's
    geometry: 16..32 px per side (width from the first text byte,
    height from the last), truecolor, pixel i =
    (byte[i mod n] + (i // 5) * 11) mod 256, each pass Up-filtered
    independently before the shared deflate. Same CPU-bound
    round-robin repartition rationale as with_png_blob_filtered."""
    encode = png_encode_adam7  # bind by value for the worker closure

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                w = 16 + (b[0] % 17) if n else 16
                h = 16 + (b[-1] % 17) if n else 16
                m = w * h * 3
                i = np.arange(m, dtype=np.int64)
                src = (
                    np.frombuffer(b, dtype=np.uint8).astype(np.int64)[i % n]
                    if n
                    else np.zeros(m, dtype=np.int64)
                )
                px = ((src + (i // 5) * 11) % 256).astype(np.uint8).tobytes()
                rows.append((doc_id, encode(w, h, 3, px, row_filter=2)))
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, blob binary")


def decode_image_meta_adam7(docs: DataFrame) -> DataFrame:
    """decode_image_meta over the Adam7 blobs, with the
    POSITION-WEIGHTED digest alongside pixel_sum: de-interlacing must
    put every pass's pixels on exactly the right raster cells for
    pos_weighted_sum to match the oracle's raster-order recompute —
    a decoder that merely concatenates de-filtered passes (right
    values, wrong order) fails it."""
    decode = png_decode
    wmod = ADAM7_W_MOD

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, ch, px = decode(bytes(blob))
                arr = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                i = np.arange(arr.size, dtype=np.int64)
                psum = int(arr.sum())
                wsum = int(((i % wmod + 1) * arr).sum())
                rows.append((doc_id, w, h, ch, w * h, psum, wsum))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "n_pixels", "pixel_sum", "pos_weighted_sum",
                ],
            )
            rows = []

    return with_png_blob_adam7(docs).mapInPandas(
        op, DECODE_SCHEMA + ", pos_weighted_sum long"
    )


def with_jpeg_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, text, blob) with blob a REAL baseline JPEG (SOF0,
    4:4:4, Annex-K Huffman entropy coding, flat quant table) at the
    ladder geometry: 16..32 px per side (width from the first text
    byte, height from the last), truecolor, pixel i =
    (byte[i mod n] + (i // 3) * 7) mod 256. ``text`` rides along so
    the round-trip stage can regenerate the EXPECTED pixels and bound
    reconstruction error against the true source, not an
    encode/decode fixpoint. Same CPU-bound round-robin repartition
    rationale as with_png_blob_filtered — entropy coding is the most
    CPU-intensive codec stage in the ladder."""
    from .jpeg import jpeg_encode

    encode = jpeg_encode  # bind by value for the worker closure

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                w = 16 + (b[0] % 17) if n else 16
                h = 16 + (b[-1] % 17) if n else 16
                m = w * h * 3
                i = np.arange(m, dtype=np.int64)
                src = (
                    np.frombuffer(b, dtype=np.uint8).astype(np.int64)[i % n]
                    if n
                    else np.zeros(m, dtype=np.int64)
                )
                px = ((src + (i // 3) * 7) % 256).astype(np.uint8).tobytes()
                rows.append((doc_id, text, encode(w, h, px)))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, text string, blob binary")


JPEG_ROUNDTRIP_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "n_pixels long, within_tolerance boolean"
)


def decode_jpeg_roundtrip(docs: DataFrame) -> DataFrame:
    """Decode the real JPEG blobs and bound reconstruction error
    against the regenerated SOURCE pixels: within_tolerance =
    (max abs pixel error <= JPEG_TOL). JPEG is lossy, so the oracle
    cannot recompute pixel values in SQL; this is the repo's
    approx-sketch contract instead — geometry columns are
    SQL-recomputed exactly and the oracle expects within_tolerance
    TRUE for every doc, so a codec regression (wrong Huffman table,
    misplaced block, broken predictor) is a driver-red hash mismatch,
    not a silent quality drift. The pytest side additionally pins the
    measured error ceiling and real-compression behavior."""
    from .jpeg import JPEG_TOL, jpeg_decode

    decode = jpeg_decode
    tol = JPEG_TOL

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text, blob in zip(
                pdf["doc_id"], pdf["text"], pdf["blob"]
            ):
                w, h, ch, px = decode(bytes(blob))
                b = text.encode("utf-8")
                n = len(b)
                m = w * h * 3
                i = np.arange(m, dtype=np.int64)
                src = (
                    np.frombuffer(b, dtype=np.uint8).astype(np.int64)[i % n]
                    if n
                    else np.zeros(m, dtype=np.int64)
                )
                expected = ((src + (i // 3) * 7) % 256).astype(np.int64)
                got = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                max_err = int(np.abs(got - expected).max()) if m else 0
                rows.append(
                    (doc_id, w, h, ch, w * h, bool(max_err <= tol))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "n_pixels", "within_tolerance",
                ],
            )
            rows = []

    return with_jpeg_blob(docs).mapInPandas(op, JPEG_ROUNDTRIP_SCHEMA)


AUDIO_SCHEMA = "doc_id long, window_idx int, mean_amplitude double, peak_amplitude int"


def audio_window_features(docs: DataFrame, window_bytes: int = 256) -> DataFrame:
    """'Audio' feature extraction: per fixed-size byte window, mean and
    peak amplitude (bytes stand in for PCM samples — swap the body for
    a real codec read; the windowed-feature plumbing is the operator).
    The mean is int_sum/window_bytes with a power-of-two denominator —
    a dyadic rational, exactly representable in double, so NO rounding
    (rounding would hit exact .5 midpoints where Python banker's-rounds
    and DuckDB half-up-rounds differently)."""

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                arr = np.frombuffer(blob, dtype=np.uint8)
                for w in range(0, len(arr), window_bytes):
                    chunk = arr[w : w + window_bytes]
                    rows.append(
                        (
                            doc_id,
                            w // window_bytes,
                            int(chunk.sum()) / len(chunk),
                            int(chunk.max()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "window_idx", "mean_amplitude", "peak_amplitude"]
            )
            rows = []

    return with_blob(docs).mapInPandas(op, AUDIO_SCHEMA)


def sample_frames(docs: DataFrame, stride: int = 1000) -> DataFrame:
    """One row per sampled 'frame': ceil(n_bytes/stride) frames (min 1
    for empty blobs) — the 1→N expansion shape of video frame
    sampling. Ceil, not //+1: the latter emits a frame at
    offset == n_bytes (past the end) whenever n_bytes is an exact
    stride multiple."""

    def op(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n_frames = max(1, (len(blob) + stride - 1) // stride)
                rows.extend((doc_id, idx, idx * stride) for idx in range(n_frames))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_offset"])

    return with_blob(docs).mapInPandas(op, FRAMES_SCHEMA)


PHASH_SCHEMA = "doc_id long, width int, height int, channels int, ahash long"


def image_ahash(docs: DataFrame) -> DataFrame:
    """(doc_id, width, height, channels, ahash) — average-hash
    perceptual fingerprint over the REAL decoded pixels: bit i is set
    iff pixel_i >= mean(pixels), first 60 pixels (bigint-safe, no sign
    bit). The mean compare is the exact integer cross-multiply
    px*n >= sum, so the hash is bit-reproducible in SQL. Identical
    images (and byte-identical pixel streams) collide; the downstream
    groupBy is the image-dedup step of a multimodal pipeline."""
    decode = png_decode

    def op(batches):
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, ch, px = decode(bytes(blob))
                n, s = len(px), sum(px)
                bits = 0
                for i in range(min(60, n)):
                    if px[i] * n >= s:
                        bits |= 1 << i
                rows.append((doc_id, w, h, ch, bits))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "channels", "ahash"]
            )
            rows = []

    return with_png_blob(docs).mapInPandas(op, PHASH_SCHEMA)


WAV_DECODE_SCHEMA = (
    "doc_id long, sample_rate int, channels int, bit_depth int, "
    "n_frames long, sample_sum long"
)


def wav_encode(sample_rate: int, channels: int, frames: bytes) -> bytes:
    """Minimal REAL WAV writer (stdlib only): canonical RIFF/WAVE with
    a 16-byte PCM fmt chunk and one data chunk. `frames` is the raw
    little-endian int16 sample stream (n_frames * channels samples).
    Playable by any standards-compliant audio tool."""
    import struct

    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes):
    """Minimal REAL WAV reader (stdlib + numpy): validates the RIFF
    signature and declared size, walks the word-aligned chunk stream,
    parses fmt (16-bit integer PCM only — anything else raises, the
    honest guard for foreign files), cross-checks byte-rate and
    block-align against the advertised geometry, and decodes the data
    chunk. Returns (sample_rate, channels, bit_depth, n_frames,
    samples) with samples an int16 numpy array — nothing is passed
    side-band from the encoder."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF":
        raise ValueError("not a WAV: bad RIFF signature")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size != len(data) - 8:
        raise ValueError(
            f"corrupt WAV: RIFF declares {riff_size}, have {len(data) - 8}"
        )
    if data[8:12] != b"WAVE":
        raise ValueError("not a WAV: missing WAVE form type")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"corrupt WAV: chunk {tag!r} truncated")
        pos += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
        if tag == b"fmt ":
            if fmt is not None:
                # Keep the raise-on-anomaly guarantee: a second fmt
                # chunk would silently overwrite the geometry the
                # first one declared (ADVICE r8).
                raise ValueError("corrupt WAV: duplicate fmt chunk")
            audio_fmt, channels, rate, byte_rate, block_align, bits = (
                struct.unpack("<HHIIHH", body[:16])
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("unsupported WAV: need 16-bit integer PCM")
            if block_align != channels * 2 or byte_rate != rate * block_align:
                raise ValueError("corrupt WAV: fmt geometry inconsistent")
            fmt = (rate, channels, bits)
        elif tag == b"data":
            if pcm is not None:
                raise ValueError("corrupt WAV: duplicate data chunk")
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError("invalid WAV: missing fmt/data chunk")
    rate, channels, bits = fmt
    samples = np.frombuffer(pcm, dtype="<i2")
    if samples.size % channels:
        raise ValueError("corrupt WAV: data chunk not frame-aligned")
    return rate, channels, bits, samples.size // channels, samples


def with_wav_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, blob) where blob is a REAL PCM WAV whose geometry and
    samples derive deterministically from the text bytes (so a SQL
    oracle can predict what a correct decoder must report):
    sample_rate = 8000 * (1 + first_byte % 3), stereo iff the byte
    length is odd, n_frames = 1 + last_byte % 32, and sample k =
    ((text_byte[k mod n] * 131 + k * 7919) mod 65536) - 32768."""
    encode = wav_encode  # bind by value for the worker closure

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    # The SQL oracles index text by CHARACTER
                    # (ascii(substr)) while this generator indexes
                    # UTF-8 BYTES — identical only for ASCII. A
                    # non-ASCII doc must raise loudly, never
                    # silently diverge from the oracle (ADVICE r8;
                    # corpus ASCII-ness is also pinned in
                    # tests/test_multimodal.py).
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                rate = 8000 * (1 + (b[0] % 3)) if n else 8000
                channels = 1 + n % 2
                n_frames = 1 + (b[-1] % 32) if n else 1
                m = n_frames * channels
                idx = np.arange(m, dtype=np.int64)
                t = (
                    np.frombuffer(b, dtype=np.uint8)[idx % n].astype(np.int64)
                    if n
                    else np.zeros(m, dtype=np.int64)
                )
                v = (t * 131 + idx * 7919) % 65536 - 32768
                rows.append((doc_id, encode(rate, channels, v.astype("<i2").tobytes())))
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])
            rows = []

    return docs.select("doc_id", "text").mapInPandas(op, "doc_id long, blob binary")


def decode_audio_meta(docs: DataFrame) -> DataFrame:
    """(doc_id, sample_rate, channels, bit_depth, n_frames, sample_sum)
    via Arrow-batched mapInPandas. The decode is REAL: every reported
    value is recovered from the WAV byte stream (RIFF walk, fmt
    geometry cross-check, int16 frame decode) — sample_sum covers the
    decoded CONTENT, not just the header."""
    decode = wav_decode

    def op(batches):
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                rate, channels, bits, n_frames, samples = decode(bytes(blob))
                rows.append(
                    (doc_id, rate, channels, bits, n_frames,
                     int(samples.astype("int64").sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "channels", "bit_depth",
                    "n_frames", "sample_sum",
                ],
            )
            rows = []

    return with_wav_blob(docs).mapInPandas(op, WAV_DECODE_SCHEMA)


ENVELOPE_SCHEMA = (
    "doc_id long, sample_rate int, channels int, "
    "n_blocks long, envelope_sum long"
)


def decode_audio_envelope(docs: DataFrame, factor: int = 4) -> DataFrame:
    """Peak-decimation envelope extraction over the REAL decoded PCM
    stream — the waveform-display / VAD-frontend downsample: per
    channel, frames group into blocks of ``factor`` and each block
    reports its MAX sample (max, not mean: integer-exact in SQL with
    no floor-vs-truncate division hazard across engines). Returns
    (doc_id, sample_rate, channels, n_blocks, envelope_sum) where
    n_blocks = ceil(n_frames/factor) and envelope_sum is the int64
    sum of every per-channel block peak — content-checking the whole
    decimation, not just its shape."""
    decode = wav_decode
    k = int(factor)

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                rate, channels, bits, n_frames, samples = decode(bytes(blob))
                frames = samples.astype(np.int64).reshape(n_frames, channels)
                n_blocks = (n_frames + k - 1) // k
                pad = n_blocks * k - n_frames
                if pad:
                    # -32768 is the int16 minimum: identity for MAX,
                    # and partial blocks always hold >=1 real frame.
                    frames = np.vstack(
                        [frames, np.full((pad, channels), -32768, np.int64)]
                    )
                peaks = frames.reshape(n_blocks, k, channels).max(axis=1)
                rows.append(
                    (doc_id, rate, channels, n_blocks, int(peaks.sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "channels",
                    "n_blocks", "envelope_sum",
                ],
            )
            rows = []

    return with_wav_blob(docs).mapInPandas(op, ENVELOPE_SCHEMA)


AVI_DECODE_SCHEMA = (
    "doc_id long, width int, height int, fps int, "
    "n_frames long, pixel_sum long"
)


def avi_encode(width: int, height: int, fps: int, frames: list) -> bytes:
    """Minimal REAL AVI writer (stdlib only): RIFF('AVI ') with a
    standards-shaped hdrl (AVIMAINHEADER + one 'vids' stream:
    AVISTREAMHEADER + BITMAPINFOHEADER, 24-bit BI_RGB) and a movi list
    of raw '00db' DIB frames — bottom-up BGR rows, stride padded to 4
    bytes, exactly what an uncompressed AVI player expects. `frames`
    is a list of top-down RGB frame buffers (width*height*3 bytes)."""
    import struct

    stride = (width * 3 + 3) // 4 * 4
    pad = b"\x00" * (stride - width * 3)

    def dib(frame: bytes) -> bytes:
        rows = []
        for r in range(height - 1, -1, -1):  # DIB rows are bottom-up
            row = frame[r * width * 3 : (r + 1) * width * 3]
            # RGB -> BGR per pixel
            rows.append(
                b"".join(row[p + 2 : p + 3] + row[p + 1 : p + 2] + row[p : p + 1]
                         for p in range(0, len(row), 3)) + pad
            )
        return b"".join(rows)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    frame_bytes = stride * height
    avih = struct.pack(
        "<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0, len(frames), 0,
        1, frame_bytes, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", b"DIB ", 0, 0, 0, 0,
        1, fps, 0, len(frames), frame_bytes, 0, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", dib(f)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(data: bytes):
    """Minimal REAL AVI reader (stdlib + numpy): validates the RIFF
    signature and declared size, walks the list/chunk tree, parses
    AVIMAINHEADER + the vids stream's AVISTREAMHEADER and
    BITMAPINFOHEADER (24-bit BI_RGB only — anything else raises),
    cross-checks fps (dwRate/dwScale vs dwMicroSecPerFrame) and the
    frame count (movi '00db' chunks vs dwTotalFrames vs stream
    dwLength), strips stride padding, flips the bottom-up BGR rows
    back to top-down RGB, and returns (width, height, fps, n_frames,
    frames) with frames a list of RGB byte buffers."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF":
        raise ValueError("not an AVI: bad RIFF signature")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size != len(data) - 8:
        raise ValueError(
            f"corrupt AVI: RIFF declares {riff_size}, have {len(data) - 8}"
        )
    if data[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing form type")

    def walk(buf, pos, end):
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + ln > end:
                raise ValueError(f"corrupt AVI: chunk {tag!r} truncated")
            yield tag, body_start, ln
            pos = body_start + ln + (ln & 1)

    avih = strh = strf = None
    frame_chunks = []

    def scan(buf, pos, end):
        nonlocal avih, strh, strf
        for tag, start, ln in walk(buf, pos, end):
            if tag == b"LIST":
                scan(buf, start + 4, start + ln)
            elif tag == b"avih":
                avih = struct.unpack("<14I", buf[start : start + 56])
            elif tag == b"strh":
                strh = struct.unpack("<4s4sIHHIIIIIIII4h", buf[start : start + 56])
            elif tag == b"strf":
                strf = struct.unpack("<IiiHHIIiiII", buf[start : start + 40])
            elif tag == b"00db":
                frame_chunks.append((start, ln))
            elif tag == b"00dc":
                # '00dc' marks COMPRESSED frame data; this decoder
                # supports only raw DIB ('00db'). Treating a 00dc
                # chunk as raw pixels would misreport a malformed
                # file instead of rejecting it (ADVICE r8).
                raise ValueError(
                    "unsupported AVI: compressed '00dc' frame chunk "
                    "(raw '00db' DIB frames only)"
                )

    scan(data, 12, len(data))
    if avih is None or strh is None or strf is None:
        raise ValueError("invalid AVI: missing avih/strh/strf header")
    usec, _, _, _, total_frames, _, n_streams, _, width, height = avih[:10]
    if strh[0] != b"vids":
        raise ValueError("unsupported AVI: first stream is not video")
    scale, rate, length = strh[6], strh[7], strh[9]
    bit_count, compression = strf[4], strf[5]
    if compression != 0 or bit_count != 24:
        raise ValueError("unsupported AVI: need 24-bit BI_RGB frames")
    if scale == 0 or rate % scale:
        raise ValueError("corrupt AVI: non-integer frame rate")
    fps = rate // scale
    if usec != 1_000_000 // fps:
        raise ValueError("corrupt AVI: dwMicroSecPerFrame disagrees with rate/scale")
    if len(frame_chunks) != total_frames or length != total_frames:
        raise ValueError(
            f"corrupt AVI: {len(frame_chunks)} movi frames, header declares "
            f"{total_frames}/{length}"
        )
    stride = (width * 3 + 3) // 4 * 4
    frames = []
    for start, ln in frame_chunks:
        if ln != stride * height:
            raise ValueError(
                f"corrupt AVI: frame is {ln} bytes, expected {stride * height}"
            )
        dib = np.frombuffer(data, dtype=np.uint8, count=ln, offset=start)
        rows = dib.reshape(height, stride)[:, : width * 3]  # strip pad
        rgb = rows.reshape(height, width, 3)[::-1, :, ::-1]  # flip + BGR->RGB
        frames.append(rgb.tobytes())
    return width, height, fps, total_frames, frames


def with_avi_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, blob) where blob is a REAL uncompressed AVI whose
    geometry and frame pixels derive deterministically from the text
    bytes (SQL-predictable): width = 1 + first_byte % 8, height =
    1 + last_byte % 8, fps = 5 * (1 + byte_length % 5), n_frames =
    1 + (first_byte + last_byte) % 6, and pixel byte k of frame f =
    (text_byte[(f*31 + k) mod n] + f*17) mod 256."""
    encode = avi_encode  # bind by value for the worker closure

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    # The SQL oracles index text by CHARACTER
                    # (ascii(substr)) while this generator indexes
                    # UTF-8 BYTES — identical only for ASCII. A
                    # non-ASCII doc must raise loudly, never
                    # silently diverge from the oracle (ADVICE r8;
                    # corpus ASCII-ness is also pinned in
                    # tests/test_multimodal.py).
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                w = 1 + (b[0] % 8) if n else 1
                h = 1 + (b[-1] % 8) if n else 1
                fps = 5 * (1 + n % 5)
                nf = 1 + ((b[0] + b[-1]) % 6) if n else 1
                sz = w * h * 3
                frames = []
                src = np.frombuffer(b, dtype=np.uint8).astype(np.int64) if n else None
                for f in range(nf):
                    k = np.arange(sz, dtype=np.int64)
                    t = src[(f * 31 + k) % n] if n else np.zeros(sz, dtype=np.int64)
                    frames.append(((t + f * 17) % 256).astype(np.uint8).tobytes())
                rows.append((doc_id, encode(w, h, fps, frames)))
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])
            rows = []

    return docs.select("doc_id", "text").mapInPandas(op, "doc_id long, blob binary")


def decode_video_meta(docs: DataFrame) -> DataFrame:
    """(doc_id, width, height, fps, n_frames, pixel_sum) via
    Arrow-batched mapInPandas. The decode is REAL: every reported
    value is recovered from the AVI byte stream (RIFF/list walk,
    header cross-checks, DIB de-pad + re-flip) — pixel_sum covers the
    decoded frame CONTENT across all frames, not just the headers."""
    decode = avi_decode

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, fps, nf, frames = decode(bytes(blob))
                psum = sum(
                    int(np.frombuffer(f, dtype=np.uint8).astype(np.int64).sum())
                    for f in frames
                )
                rows.append((doc_id, w, h, fps, nf, psum))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "fps", "n_frames", "pixel_sum"],
            )
            rows = []

    return with_avi_blob(docs).mapInPandas(op, AVI_DECODE_SCHEMA)


MOTION_SCHEMA = (
    "doc_id long, n_frames long, n_transitions long, motion_sum long"
)


def decode_video_motion(docs: DataFrame) -> DataFrame:
    """Temporal-difference motion metric over the REAL decoded frame
    stream — the scene-change / static-clip signal a video curation
    pipeline thresholds before frame sampling: motion_sum =
    Σ_{t≥1} Σ_p |frame_t[p] − frame_{t−1}[p]| (exact integer L1 delta
    between consecutive decoded RGB frames), n_transitions =
    n_frames − 1. A single-frame clip reports (0 transitions, 0
    motion). Content-checks every byte of every frame PAIR, a
    stronger oracle than the per-frame sum."""
    decode = avi_decode

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, fps, nf, frames = decode(bytes(blob))
                stack = np.stack(
                    [np.frombuffer(f, dtype=np.uint8) for f in frames]
                ).astype(np.int64)
                motion = (
                    int(np.abs(stack[1:] - stack[:-1]).sum()) if nf > 1 else 0
                )
                rows.append((doc_id, nf, max(nf - 1, 0), motion))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_frames", "n_transitions", "motion_sum"],
            )
            rows = []

    return with_avi_blob(docs).mapInPandas(op, MOTION_SCHEMA)


VIDEO_AHASH_SCHEMA = "doc_id long, frame_idx int, width int, height int, ahash long"


def video_frame_ahash(docs: DataFrame) -> DataFrame:
    """(doc_id, frame_idx, width, height, ahash) — the per-FRAME
    average-hash over the REAL decoded AVI frames (decode → aHash in
    one Arrow-batched pass). Same exact integer mean-compare as
    image_ahash (bit i set iff pixel_byte_i * n >= sum over the whole
    frame, first 60 bytes), so every bit is reproducible in SQL. This
    is the unit of video dedup: identical frames collide regardless of
    which video or position they appear in."""
    decode = avi_decode

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, _fps, _nf, frames = decode(bytes(blob))
                for fi, fb in enumerate(frames):
                    px = np.frombuffer(fb, dtype=np.uint8).astype(np.int64)
                    n, s = px.size, int(px.sum())
                    bits = 0
                    for i in range(min(60, n)):
                        if int(px[i]) * n >= s:
                            bits |= 1 << i
                    rows.append((doc_id, fi, w, h, bits))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "width", "height", "ahash"]
            )
            rows = []

    return with_avi_blob(docs).mapInPandas(op, VIDEO_AHASH_SCHEMA)


GIF_DECODE_SCHEMA = (
    "doc_id long, width int, height int, n_px long, "
    "index_sum long, pos_weighted_sum long, rgb_sum long"
)


def with_gif_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, text, blob) with blob a REAL GIF89a (256-entry global
    color table, variable-width LZW entropy coding — multimodal/gif.py)
    at the ladder geometry: width = 16 + first_byte % 17, height =
    16 + last_byte % 17, index i = (byte[(i//5) mod n] + i//64) % 256.
    The run-of-5 structure makes LZW genuinely compress (pinned in
    tests); the rule stays SQL-recomputable so the oracle checks every
    decoded byte. Same CPU-bound round-robin repartition rationale as
    with_jpeg_blob — entropy coding dominates the rung's cost."""
    from .gif import gif_encode

    encode = gif_encode  # bind by value for the worker closure

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                w = 16 + (b[0] % 17) if n else 16
                h = 16 + (b[-1] % 17) if n else 16
                m = w * h
                i = np.arange(m, dtype=np.int64)
                src = (
                    np.frombuffer(b, dtype=np.uint8).astype(np.int64)[
                        (i // 5) % n
                    ]
                    if n
                    else np.zeros(m, dtype=np.int64)
                )
                idx = ((src + i // 64) % 256).astype(np.uint8).tobytes()
                rows.append((doc_id, text, encode(w, h, idx)))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, text string, blob binary")


def decode_gif_meta(docs: DataFrame) -> DataFrame:
    """Decode the real GIF blobs and report EXACT content sums over
    the decoded index stream AND the decoded color table: index_sum /
    pos_weighted_sum cover the LZW stream byte for byte, rgb_sum maps
    every index through the palette actually read from the file —
    unlike the lossy JPEG rung, every output column here is
    SQL-recomputable, so the driver hash certifies the whole decode
    path (bit unpacking, width bumps, sub-block framing, color
    table) with no tolerance flag."""
    from .gif import gif_decode

    decode = gif_decode

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, palette, indices = decode(bytes(blob))
                idx = np.frombuffer(indices, dtype=np.uint8).astype(np.int64)
                pal_sums = (
                    np.frombuffer(palette, dtype=np.uint8)
                    .reshape(256, 3)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                m = idx.size
                pos = np.arange(m, dtype=np.int64)
                rows.append(
                    (
                        doc_id, w, h, m,
                        int(idx.sum()),
                        int((pos * idx).sum()),
                        int(pal_sums[idx].sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_px",
                    "index_sum", "pos_weighted_sum", "rgb_sum",
                ],
            )
            rows = []

    return with_gif_blob(docs).mapInPandas(op, GIF_DECODE_SCHEMA)


ADPCM_ROUNDTRIP_SCHEMA = (
    "doc_id long, sample_rate int, n_blocks int, n_samples long, "
    "first_sample int, within_tolerance boolean"
)


def with_adpcm_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, text, blob) with blob a REAL IMA-ADPCM WAV (format tag
    0x11, 256-byte blocks, fact chunk — multimodal/adpcm.py). Signal:
    a varying-slope triangle wave, smooth everywhere so the 4-bit
    codes track it — A_k = cumsum(1 + byte[k mod n] % 13), v = A_k mod
    4096 reflected to a triangle, sample_k = (tri - 1024) * 8. Geometry:
    sample_rate = 8000 * (1 + first_byte % 3), n_blocks = 1 + last_byte
    % 4, n_samples = n_blocks * 505 (exact multiple — no final-block
    padding). ``text`` rides along so the round-trip stage regenerates
    the EXPECTED samples. The first sample 8*(1 + first_byte % 13) -
    8192 is stored EXACTLY in the block header per the spec, giving the
    oracle one SQL-recomputable CONTENT column even though ADPCM is
    lossy."""
    from .adpcm import SAMPLES_PER_BLOCK, adpcm_wav_encode

    encode = adpcm_wav_encode
    spb = SAMPLES_PER_BLOCK

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                rate = 8000 * (1 + (b[0] % 3)) if n else 8000
                n_blocks = 1 + (b[-1] % 4) if n else 1
                m = n_blocks * spb
                k = np.arange(m, dtype=np.int64)
                d = (
                    1
                    + np.frombuffer(b, dtype=np.uint8).astype(np.int64)[
                        k % n
                    ]
                    % 13
                    if n
                    else np.ones(m, dtype=np.int64)
                )
                v = np.cumsum(d) % 4096
                tri = np.where(v < 2048, v, 4095 - v)
                s = ((tri - 1024) * 8).astype(np.int64)
                rows.append((doc_id, text, encode(rate, s)))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, text string, blob binary")


def decode_adpcm_roundtrip(docs: DataFrame) -> DataFrame:
    """Decode the real IMA-ADPCM WAVs and bound reconstruction against
    the regenerated SOURCE samples: within_tolerance = (max abs sample
    error <= ADPCM_TOL). Same contract as the JPEG rung — geometry and
    the exactly-stored block-header first sample are SQL-recomputed;
    a step-table slip, nibble-order swap, or index-clamp bug reds the
    driver hash via within_tolerance (a broken path errs in the
    thousands, two orders past the transient bound)."""
    from .adpcm import ADPCM_TOL, SAMPLES_PER_BLOCK, adpcm_wav_decode

    decode = adpcm_wav_decode
    spb = SAMPLES_PER_BLOCK
    tol = ADPCM_TOL

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text, blob in zip(
                pdf["doc_id"], pdf["text"], pdf["blob"]
            ):
                rate, n_samples, n_blocks, dec = decode(bytes(blob))
                b = text.encode("utf-8")
                n = len(b)
                m = n_samples
                k = np.arange(m, dtype=np.int64)
                d = (
                    1
                    + np.frombuffer(b, dtype=np.uint8).astype(np.int64)[
                        k % n
                    ]
                    % 13
                    if n
                    else np.ones(m, dtype=np.int64)
                )
                v = np.cumsum(d) % 4096
                tri = np.where(v < 2048, v, 4095 - v)
                expected = (tri - 1024) * 8
                got = np.asarray(dec, dtype=np.int64)
                max_err = int(np.abs(got - expected).max()) if m else 0
                rows.append(
                    (
                        doc_id, rate, n_blocks, n_samples,
                        int(got[0]) if m else 0,
                        bool(max_err <= tol),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_blocks", "n_samples",
                    "first_sample", "within_tolerance",
                ],
            )
            rows = []

    return with_adpcm_blob(docs).mapInPandas(op, ADPCM_ROUNDTRIP_SCHEMA)


MJPEG_SCHEMA = (
    "doc_id long, frame_idx int, width int, height int, "
    "n_frames int, fps int, within_tolerance boolean"
)
_MJPG_FOURCC = 0x47504A4D  # 'MJPG' little-endian

# Module-level binding, NOT a call-time relative import:
# mjpeg_avi_decode executes INSIDE worker closures, and a `from .jpeg
# import ...` at call time needs the package importable on the
# worker's sys.path (it is not when cwd != repo root). Both this
# module and jpeg.py are registered pickle-by-value, so a global
# reference ships the decoder inside the closure.
from .jpeg import jpeg_decode as _jpeg_frame_decode  # noqa: E402


def mjpeg_avi_encode(width: int, height: int, fps: int, jpeg_frames: list) -> bytes:
    """Minimal REAL Motion-JPEG AVI writer (stdlib only): same
    RIFF('AVI ') / hdrl / movi shape as avi_encode, but the vids
    stream declares fccHandler='MJPG' + biCompression='MJPG' and each
    frame is a COMPRESSED '00dc' chunk holding a complete baseline
    JPEG (multimodal/jpeg.py) — the classic MJPEG-in-AVI layout that
    standards-compliant players (ffmpeg, VLC) accept."""
    import struct

    max_frame = max((len(f) for f in jpeg_frames), default=0)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            tag + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, max_frame * fps, 0, 0, len(jpeg_frames),
        0, 1, max_frame, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h", b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, len(jpeg_frames), max_frame, 0, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, _MJPG_FOURCC,
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def mjpeg_avi_decode(data: bytes):
    """Minimal REAL MJPEG-AVI reader: validates the RIFF tree the same
    way as avi_decode, requires biCompression='MJPG' (raw '00db'
    frames raise — the mirror-image guard of avi_decode's '00dc'
    rejection), cross-checks fps and frame counts, then ENTROPY-
    DECODES every '00dc' chunk through the baseline JPEG decoder and
    verifies each frame's geometry against the stream header. Returns
    (width, height, fps, n_frames, frames) with frames RGB byte
    buffers."""
    import struct

    jpeg_decode = _jpeg_frame_decode

    if data[:4] != b"RIFF":
        raise ValueError("not an AVI: bad RIFF signature")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size != len(data) - 8:
        raise ValueError(
            f"corrupt AVI: RIFF declares {riff_size}, have {len(data) - 8}"
        )
    if data[8:12] != b"AVI ":
        raise ValueError("not an AVI: missing form type")

    def walk(buf, pos, end):
        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (ln,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + ln > end:
                raise ValueError(f"corrupt AVI: chunk {tag!r} truncated")
            yield tag, body_start, ln
            pos = body_start + ln + (ln & 1)

    avih = strh = strf = None
    frame_chunks = []

    def scan(buf, pos, end):
        nonlocal avih, strh, strf
        for tag, start, ln in walk(buf, pos, end):
            if tag == b"LIST":
                scan(buf, start + 4, start + ln)
            elif tag == b"avih":
                avih = struct.unpack("<14I", buf[start : start + 56])
            elif tag == b"strh":
                strh = struct.unpack(
                    "<4s4sIHHIIIIIIII4h", buf[start : start + 56]
                )
            elif tag == b"strf":
                strf = struct.unpack("<IiiHHIIiiII", buf[start : start + 40])
            elif tag == b"00dc":
                frame_chunks.append((start, ln))
            elif tag == b"00db":
                raise ValueError(
                    "unsupported AVI: raw '00db' frame in an MJPEG "
                    "stream (compressed '00dc' JPEG frames only)"
                )

    scan(data, 12, len(data))
    if avih is None or strh is None or strf is None:
        raise ValueError("invalid AVI: missing avih/strh/strf header")
    usec, _, _, _, total_frames, _, _n_streams, _, width, height = avih[:10]
    if strh[0] != b"vids" or strh[1] != b"MJPG":
        raise ValueError("unsupported AVI: first stream is not MJPG video")
    scale, rate, length = strh[6], strh[7], strh[9]
    bit_count, compression = strf[4], strf[5]
    if compression != _MJPG_FOURCC or bit_count != 24:
        raise ValueError("unsupported AVI: need 24-bit MJPG frames")
    if scale == 0 or rate % scale:
        raise ValueError("corrupt AVI: non-integer frame rate")
    fps = rate // scale
    if usec != 1_000_000 // fps:
        raise ValueError(
            "corrupt AVI: dwMicroSecPerFrame disagrees with rate/scale"
        )
    if len(frame_chunks) != total_frames or length != total_frames:
        raise ValueError(
            f"corrupt AVI: {len(frame_chunks)} movi frames, header "
            f"declares {total_frames}/{length}"
        )
    frames = []
    for start, ln in frame_chunks:
        w, h, _ch, px = jpeg_decode(data[start : start + ln])
        if (w, h) != (width, height):
            raise ValueError(
                f"corrupt AVI: frame geometry {w}x{h} disagrees with "
                f"stream header {width}x{height}"
            )
        frames.append(px)
    return width, height, fps, total_frames, frames


def with_mjpeg_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, text, blob) with blob a REAL MJPEG AVI: width =
    16 + first_byte % 5, height = 16 + last_byte % 5, fps = 5 * (1 +
    byte_length % 4), n_frames = 2 + (first_byte + last_byte) % 3,
    frame f pixel i = (byte[i mod n] + (i//3)*7 + f*11) % 256 — the
    JPEG rung's smooth content family shifted per frame so frame
    ORDER is checkable. ``text`` rides along for the round-trip
    stage."""
    from .jpeg import jpeg_encode

    encode_frame = jpeg_encode
    encode_avi = mjpeg_avi_encode

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                w = 16 + (b[0] % 5) if n else 16
                h = 16 + (b[-1] % 5) if n else 16
                fps = 5 * (1 + n % 4)
                nf = 2 + ((b[0] + b[-1]) % 3) if n else 2
                m = w * h * 3
                i = np.arange(m, dtype=np.int64)
                src = (
                    np.frombuffer(b, dtype=np.uint8).astype(np.int64)[i % n]
                    if n
                    else np.zeros(m, dtype=np.int64)
                )
                base = src + (i // 3) * 7
                frames = [
                    encode_frame(
                        w, h, ((base + f * 11) % 256).astype(np.uint8).tobytes()
                    )
                    for f in range(nf)
                ]
                rows.append((doc_id, text, encode_avi(w, h, fps, frames)))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, text string, blob binary")


def decode_mjpeg_frames(docs: DataFrame) -> DataFrame:
    """Decode the real MJPEG AVIs and bound every frame's
    reconstruction against the regenerated per-frame source:
    one output row per FRAME (doc_id, frame_idx, geometry, fps,
    within_tolerance) — a dropped, reordered, or misdecoded frame
    either changes the row set or reds within_tolerance, so the
    driver hash certifies container walking AND per-frame entropy
    decoding together.

    r13 (guide §4): FUSED with the blob stage — one mapInPandas runs
    generation + per-frame JPEG encode + AVI mux + the real container
    walk + per-frame entropy decode per document (the pixel base is
    generated once, and (text, blob) never crosses an extra Arrow
    boundary). Rows identical by construction; with_mjpeg_blob stays
    as the standalone blob maker."""
    from .jpeg import JPEG_TOL, jpeg_encode

    encode_frame = jpeg_encode
    encode_avi = mjpeg_avi_encode
    decode = mjpeg_avi_decode
    tol = JPEG_TOL

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                w = 16 + (b[0] % 5) if n else 16
                h = 16 + (b[-1] % 5) if n else 16
                fps = 5 * (1 + n % 4)
                nf = 2 + ((b[0] + b[-1]) % 3) if n else 2
                m = w * h * 3
                i = np.arange(m, dtype=np.int64)
                src = (
                    np.frombuffer(b, dtype=np.uint8).astype(np.int64)[i % n]
                    if n
                    else np.zeros(m, dtype=np.int64)
                )
                base = src + (i // 3) * 7
                jframes = [
                    encode_frame(
                        w, h,
                        ((base + f * 11) % 256).astype(np.uint8).tobytes(),
                    )
                    for f in range(nf)
                ]
                blob = encode_avi(w, h, fps, jframes)
                # The query's claim: the REAL container walk +
                # per-frame entropy decode.
                w, h, fps, nf, frames = decode(blob)
                for f, px in enumerate(frames):
                    expected = (base + f * 11) % 256
                    got = np.frombuffer(px, dtype=np.uint8).astype(np.int64)
                    max_err = int(np.abs(got - expected).max()) if m else 0
                    rows.append(
                        (doc_id, f, w, h, nf, fps, bool(max_err <= tol))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "n_frames", "fps", "within_tolerance",
                ],
            )
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, MJPEG_SCHEMA)


DEFLATE_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, pos_weighted_sum long, "
    "adler32 long, has_all_btypes boolean"
)


def with_deflate_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, blob) with blob a REAL zlib stream (RFC 1950 wrapper,
    RFC 1951 body) produced by multimodal/inflate.py's multiblock
    encoder: payload = the doc's ASCII bytes repeated k times,
    k = 6 + first_byte % 5, so byte i of the payload is
    text[(i mod n)] — SQL-recomputable down to the Adler-32. Every
    stream provably holds all three DEFLATE block types (dynamic head,
    stored sync-flush boundary, fixed tail), pinned corpus-wide in
    tests. Same CPU-bound round-robin repartition rationale as the
    other entropy rungs."""
    from .inflate import zlib_multiblock_compress

    encode = zlib_multiblock_compress

    def op(batches):
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                if not b:
                    # UNNEST(range(0, n_bytes)) oracles emit ZERO rows
                    # for an empty payload while the decode side emits
                    # one — enforce the non-empty corpus contract at
                    # generation (ADVICE r10) so the asymmetry can
                    # never reach the driver compare.
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                k = 6 + (b[0] % 5)
                rows.append((doc_id, encode(b * k)))
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, blob binary")


def decode_deflate_payload(docs: DataFrame) -> DataFrame:
    """Inflate the real zlib blobs with the FROM-SPEC RFC 1951/1950
    decoder (multimodal/inflate.py — canonical Huffman, all three
    block types, LZ77 back-references, header + Adler-32 checks) and
    report EXACT content sums over the decoded payload: byte_sum /
    pos_weighted_sum cover every byte in order, adler32 is the
    from-spec checksum the decoder verified against the stream
    trailer, and has_all_btypes certifies the stream exercised the
    stored+fixed+dynamic paths. A mispacked bit, a wrong extra-bits
    table entry, or a bad back-reference is a driver-red hash
    mismatch."""
    from .inflate import adler32_spec, zlib_inflate

    decode = zlib_inflate
    adler = adler32_spec

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                payload, btypes = decode(bytes(blob))
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                pos = np.arange(arr.size, dtype=np.int64)
                rows.append(
                    (
                        doc_id,
                        arr.size,
                        int(arr.sum()),
                        int((pos * arr).sum()),
                        adler(payload),
                        set(btypes) == {0, 1, 2},
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "byte_sum",
                    "pos_weighted_sum", "adler32", "has_all_btypes",
                ],
            )
            rows = []

    return with_deflate_blob(docs).mapInPandas(op, DEFLATE_DECODE_SCHEMA)


FLAC_DECODE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, n_frames int, "
    "sample_sum long, pos_weighted_sum long, md5_ok boolean"
)


def with_flac_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, blob) with blob a REAL native-FLAC-subset stream
    (multimodal/flac.py): sample_rate = 8000*(1 + first_byte % 3),
    n_samples = 1024 + 256*(last_byte % 4) + 377 (a deliberate
    non-multiple of the 1024 block so every stream has a short tail
    frame), and sample i = (tri((i*s) mod 4096) - 1024)*8 +
    byte[i mod n] % 16 - 8 with slope s = 16 + first_byte % 32 —
    a smooth ramp the FIXED predictors squeeze plus a text-keyed
    per-sample term that binds content, all SQL-recomputable. Same
    CPU-bound round-robin repartition rationale as the other entropy
    rungs."""
    from .flac import flac_encode

    encode = flac_encode

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                if not n:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                sr = 8000 * (1 + b[0] % 3)
                total = 1024 + 256 * (b[-1] % 4) + 377
                s = 16 + (b[0] % 32)
                i = np.arange(total, dtype=np.int64)
                v = (i * s) % 4096
                tri = np.where(v < 2048, v, 4095 - v)
                txt = np.frombuffer(b, dtype=np.uint8).astype(np.int64)[i % n]
                samples = (tri - 1024) * 8 + txt % 16 - 8
                rows.append((doc_id, encode(sr, samples.tolist())))
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, blob binary")


def decode_flac_meta(docs: DataFrame) -> DataFrame:
    """Decode the real FLAC blobs with the from-spec decoder
    (multimodal/flac.py — frame sync + CRC-8 + CRC-16 + STREAMINFO
    MD5 all verified) and report EXACT content sums over the decoded
    samples. FLAC is lossless, so unlike the ADPCM rung every column
    is SQL-recomputable: a predictor slip, a Rice parameter misread,
    or a mispacked warm-up sample is a driver-red hash mismatch."""
    from .flac import flac_decode

    decode = flac_decode

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                sr, n, nf, samples = decode(bytes(blob))
                arr = np.asarray(samples, dtype=np.int64)
                pos = np.arange(arr.size, dtype=np.int64)
                rows.append(
                    (
                        doc_id, sr, n, nf,
                        int(arr.sum()),
                        int((pos * arr).sum()),
                        True,  # decode() raised otherwise
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "n_frames",
                    "sample_sum", "pos_weighted_sum", "md5_ok",
                ],
            )
            rows = []

    return with_flac_blob(docs).mapInPandas(op, FLAC_DECODE_SCHEMA)


RC_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, pos_weighted_sum long, "
    "adler32 long, compressed boolean"
)


def with_rc_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, blob) with blob an RC01 adaptive-arithmetic frame
    (multimodal/rangecoder.py) over payload = the doc's ASCII bytes
    repeated twice — byte i is text[i mod n], SQL-recomputable down to
    the Adler-32 trailer. English-like byte statistics compress well
    under the adaptive bit-tree model (pinned corpus-wide via the
    `compressed` column). Same CPU-bound round-robin repartition
    rationale as the other entropy rungs."""
    from .rangecoder import rc_encode

    encode = rc_encode

    def op(batches):
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                if not b:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                blob = encode(b * 2)
                # The multimodal_arith_decode oracle hardcodes
                # `compressed` TRUE — enforce it where the blob is
                # MADE (ADVICE r10): a doc too short/high-entropy to
                # beat 8 bits/byte under the fresh adaptive model
                # must fail loudly here, not as an oracle mismatch.
                if len(blob) - 12 >= 2 * len(b):
                    raise ValueError(
                        f"RC01 corpus contract violated (doc_id="
                        f"{doc_id}): code {len(blob) - 12} B did not "
                        f"compress payload {2 * len(b)} B"
                    )
                rows.append((doc_id, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, blob binary")


def decode_rc_payload(docs: DataFrame) -> DataFrame:
    """Decode the RC01 frames with the context-adaptive binary
    arithmetic decoder (multimodal/rangecoder.py) and report EXACT
    content sums over the decoded payload plus the from-spec Adler-32
    the decoder verified against the frame trailer. `compressed`
    certifies the adaptive model genuinely beat 8 bits/byte on the
    corpus content (code bytes < payload bytes).

    r13 (guide §4): FUSED with the blob stage — one mapInPandas runs
    generation + contract check + encode + the real adaptive decode
    per document, so the blob never crosses an extra Arrow boundary.
    Rows identical by construction; with_rc_blob stays as the
    standalone blob maker."""
    from .rangecoder import rc_decode, rc_encode
    from .inflate import adler32_spec

    encode = rc_encode
    decode = rc_decode
    adler = adler32_spec

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                if not b:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                blob = encode(b * 2)
                if len(blob) - 12 >= 2 * len(b):
                    raise ValueError(
                        f"RC01 corpus contract violated (doc_id="
                        f"{doc_id}): code {len(blob) - 12} B did not "
                        f"compress payload {2 * len(b)} B"
                    )
                # The query's claim: the REAL adaptive decode.
                payload = decode(blob)
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                pos = np.arange(arr.size, dtype=np.int64)
                rows.append(
                    (
                        doc_id,
                        arr.size,
                        int(arr.sum()),
                        int((pos * arr).sum()),
                        adler(payload),
                        len(blob) - 12 < arr.size,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "byte_sum",
                    "pos_weighted_sum", "adler32", "compressed",
                ],
            )
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, RC_DECODE_SCHEMA)


MPEG_SCHEMA = (
    "doc_id long, frame_idx int, frame_type string, width int, "
    "height int, n_frames int, n_mb int, n_interior int, "
    "mv_dx int, mv_dy int, within_tolerance boolean"
)


def with_mpeg_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, text, blob) with blob a motion-compensated MPV1 stream
    (multimodal/mpeg.py — intra DCT frame + P-frames with full-search
    motion vectors and coded residuals). Content is a TRANSLATING
    texture so the motion field is SQL-predictable: width =
    32 + 16*(first_byte % 2), height = 32 + 16*(last_byte % 2),
    n_frames = 3 + (first_byte + last_byte) % 2, per-frame shift
    (sx, sy) = (1 + first_byte % 3, 1 + last_byte % 3), fps =
    5 * (1 + byte_length % 4), base pixel p = (byte[p mod n]*131 +
    p*7919) % 256, and frame f pixel (y, x) = base[(y + f*sy) mod h,
    (x + f*sx) mod w]. Every INTERIOR macroblock of a P-frame (one
    whose 16x16 window still fits after the shift: y0+16+sy <= h and
    x0+16+sx <= w) is then an EXACT translation of the previous frame,
    so its best motion vector is exactly (sy, sx) — enforced HERE at
    generation (ADVICE r10 discipline: corpus contracts fail loudly at
    the blob maker, not as driver-red oracle mismatches) along with
    the MPEG_TOL reconstruction bound. ``text`` rides along for the
    decode stage's source regeneration."""
    from .mpeg import MB, MPEG_TOL, mpeg_encode_stats

    encode = mpeg_encode_stats
    mb = MB
    tol = MPEG_TOL

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                if not n:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                w = 32 + 16 * int(bb[0] % 2)
                h = 32 + 16 * int(bb[-1] % 2)
                nf = 3 + int((bb[0] + bb[-1]) % 2)
                sx = 1 + int(bb[0] % 3)
                sy = 1 + int(bb[-1] % 3)
                fps = 5 * (1 + n % 4)
                p = np.arange(h * w, dtype=np.int64)
                base = ((bb[p % n] * 131 + p * 7919) % 256).reshape(h, w)
                frames = []
                for f in range(nf):
                    yy = (np.arange(h)[:, None] + f * sy) % h
                    xx = (np.arange(w)[None, :] + f * sx) % w
                    frames.append(base[yy, xx].astype(np.uint8).tobytes())
                # Generation-time corpus contract from the ENCODER's
                # closed-loop state (bit-identical to decode by
                # construction — the query stage still does the real
                # bitstream decode): (a) every interior P-frame
                # macroblock carries the designed motion vector — in
                # HALF-PEL units an exact translation must land on the
                # EVEN vector (2*sy, 2*sx); a SAD tie, a search bug, or
                # a half-pel refinement that wrongly "improves" on an
                # exact match must fail HERE, loudly — (b)
                # reconstruction within MPEG_TOL of the source.
                blob, mvs, errs = encode(w, h, fps, frames)
                for f in range(1, nf):
                    k = 0
                    for y0 in range(0, h, mb):
                        for x0 in range(0, w, mb):
                            if y0 + mb + sy <= h and x0 + mb + sx <= w:
                                if mvs[f][k] != (2 * sy, 2 * sx):
                                    raise ValueError(
                                        "MPV1 corpus contract violated "
                                        f"(doc_id={doc_id}, frame {f}, "
                                        f"mb ({y0},{x0})): half-pel mv "
                                        f"{mvs[f][k]} != designed "
                                        f"({2 * sy}, {2 * sx})"
                                    )
                            k += 1
                for f, err in enumerate(errs):
                    if err > tol:
                        raise ValueError(
                            "MPV1 corpus contract violated (doc_id="
                            f"{doc_id}, frame {f}): max abs err {err} "
                            f"> MPEG_TOL {tol}"
                        )
                rows.append((doc_id, text, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, text string, blob binary")


def decode_mpeg_frames(docs: DataFrame) -> DataFrame:
    """Decode the MPV1 streams and emit one row per FRAME binding the
    bitstream-decoded MOTION FIELD and geometry to SQL-exact values:
    frame_type from the stream's frame headers, (mv_dy, mv_dx) = the
    decoded vector of the frame's FIRST interior macroblock in
    FULL-PEL units (the bitstream carries half-pel vectors; exact
    translations are even, so the >>1 is lossless — 0 for the intra
    frame), n_interior = the count of interior-position macroblocks
    whose DECODED half-pel vector equals the doc's designed shift —
    a misparsed Exp-Golomb bit, swapped components, wrong half-pel
    scaling, or wrong macroblock order changes these columns and reds
    the driver hash.
    within_tolerance bounds the motion-compensated reconstruction
    against the regenerated source (closed-loop: error must NOT
    accumulate across P-frames).

    r13 (guide §4): FUSED with the blob stage — one mapInPandas runs
    generation + contract checks + encode + the real bitstream decode
    per document, so the (text, blob) pair never crosses the Arrow
    boundary between two Python stages and the source plane is
    generated once instead of twice. Rows identical by construction
    (same generation, same encode, same decode, same comparisons);
    with_mpeg_blob stays as the standalone blob maker."""
    from .mpeg import MB, MPEG_TOL, mpeg_decode, mpeg_encode_stats

    encode = mpeg_encode_stats
    decode = mpeg_decode
    mb = MB
    tol = MPEG_TOL

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                if not n:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                w = 32 + 16 * int(bb[0] % 2)
                h = 32 + 16 * int(bb[-1] % 2)
                nf = 3 + int((bb[0] + bb[-1]) % 2)
                sx = 1 + int(bb[0] % 3)
                sy = 1 + int(bb[-1] % 3)
                fps = 5 * (1 + n % 4)
                p = np.arange(h * w, dtype=np.int64)
                base = ((bb[p % n] * 131 + p * 7919) % 256).reshape(h, w)
                frames = []
                for f in range(nf):
                    yy = (np.arange(h)[:, None] + f * sy) % h
                    xx = (np.arange(w)[None, :] + f * sx) % w
                    frames.append(base[yy, xx].astype(np.uint8).tobytes())
                # Generation-time corpus contract from the ENCODER's
                # closed-loop state (with_mpeg_blob's checks, verbatim).
                blob, emvs, errs = encode(w, h, fps, frames)
                for f in range(1, nf):
                    k = 0
                    for y0 in range(0, h, mb):
                        for x0 in range(0, w, mb):
                            if y0 + mb + sy <= h and x0 + mb + sx <= w:
                                if emvs[f][k] != (2 * sy, 2 * sx):
                                    raise ValueError(
                                        "MPV1 corpus contract violated "
                                        f"(doc_id={doc_id}, frame {f}, "
                                        f"mb ({y0},{x0})): half-pel mv "
                                        f"{emvs[f][k]} != designed "
                                        f"({2 * sy}, {2 * sx})"
                                    )
                            k += 1
                for f, err in enumerate(errs):
                    if err > tol:
                        raise ValueError(
                            "MPV1 corpus contract violated (doc_id="
                            f"{doc_id}, frame {f}): max abs err {err} "
                            f"> MPEG_TOL {tol}"
                        )
                # The query's claim: the REAL bitstream decode.
                w, h, fps, nf, out, mvs = decode(blob)
                n_mb = (w // mb) * (h // mb)
                for f in range(nf):
                    yy = (np.arange(h)[:, None] + f * sy) % h
                    xx = (np.arange(w)[None, :] + f * sx) % w
                    src_f = base[yy, xx].astype(np.int64)
                    got = np.frombuffer(out[f], dtype=np.uint8).astype(
                        np.int64
                    ).reshape(h, w)
                    max_err = int(np.abs(got - src_f).max())
                    if f == 0:
                        ftype, mv_dx, mv_dy, n_int = "I", 0, 0, 0
                    else:
                        ftype = "P"
                        mv_dx = mv_dy = 0
                        n_int = 0
                        first = True
                        k = 0
                        for y0 in range(0, h, mb):
                            for x0 in range(0, w, mb):
                                if y0 + mb + sy <= h and x0 + mb + sx <= w:
                                    dy2, dx2 = mvs[f][k]
                                    if first:
                                        # full-pel view of the half-pel
                                        # stream vector (floor — odd
                                        # vectors would mismatch the
                                        # oracle and red the driver)
                                        mv_dy, mv_dx = dy2 >> 1, dx2 >> 1
                                        first = False
                                    if (dy2, dx2) == (2 * sy, 2 * sx):
                                        n_int += 1
                                k += 1
                    rows.append(
                        (
                            doc_id, f, ftype, w, h, nf, n_mb, n_int,
                            mv_dx, mv_dy, bool(max_err <= tol),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "frame_type", "width",
                    "height", "n_frames", "n_mb", "n_interior",
                    "mv_dx", "mv_dy", "within_tolerance",
                ],
            )
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, MPEG_SCHEMA)


MAU_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, n_frames int, "
    "first_sample int, within_tolerance boolean"
)


def _mau_samples(bb, n):
    """The MAU1 corpus signal family (SQL-recomputable): sample i =
    (tri((i*s) mod 4096) - 1024)*8 + byte[i mod n] % 16 - 8 with slope
    s = 12 + first_byte % 24 — a smooth ramp (energy in the low MDCT
    bands, where the static allocation spends its bits) plus a
    text-keyed broadband term that binds content."""
    import numpy as np

    total = 1024 + 128 * int(bb[-1] % 4) + 193
    s = 12 + int(bb[0] % 24)
    i = np.arange(total, dtype=np.int64)
    v = (i * s) % 4096
    tri = np.where(v < 2048, v, 4095 - v)
    txt = bb[i % n]
    return (tri - 1024) * 8 + txt % 16 - 8


def with_mau_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, text, blob) with blob a MAU1 perceptual-audio stream
    (multimodal/mdct.py — MDCT + per-band scalefactor quantization,
    MPEG-1-Layer-I-style): sample_rate = 8000*(1 + first_byte % 3),
    n_samples = 1024 + 128*(last_byte % 4) + 193 (never a multiple of
    the 128-sample hop, so every stream has a partial tail frame).
    The MAU_TOL reconstruction bound is enforced HERE at generation
    (ADVICE r10 discipline: the oracle hardcodes within_tolerance
    TRUE, so the corpus contract must fail loudly at the blob maker,
    not as a driver-red mismatch)."""
    from .mdct import MAU_TOL, mau_decode, mau_encode

    encode = mau_encode
    decode = mau_decode
    tol = MAU_TOL
    gen = _mau_samples

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                if not n:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                sr = 8000 * (1 + int(bb[0] % 3))
                samples = gen(bb, n)
                blob = encode(sr, samples.tolist())
                _, _, _, _, out = decode(blob)
                err = int(np.abs(np.asarray(out) - samples).max())
                if err > tol:
                    raise ValueError(
                        "MAU1 corpus contract violated (doc_id="
                        f"{doc_id}): max abs err {err} > MAU_TOL {tol}"
                    )
                rows.append((doc_id, text, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, text string, blob binary")


def decode_mau_meta(docs: DataFrame) -> DataFrame:
    """Decode the MAU1 streams: geometry + the raw header first sample
    are exact decode outputs (a desynced scalefactor table or bit
    layout breaks them), within_tolerance re-bounds the lossy MDCT
    reconstruction against the regenerated source.

    r13 (guide §4): FUSED with the blob stage — one mapInPandas runs
    generation + encode + ONE decode per document. The two-stage form
    decoded every stream twice (once for the generation contract, once
    here) and shipped (text, blob) across an extra Arrow boundary; the
    single decode serves both the contract check (raise on breach, as
    the blob maker did) and the emitted bound — same samples, same
    comparison, identical rows. with_mau_blob stays as the standalone
    blob maker."""
    from .mdct import MAU_TOL, mau_decode, mau_encode

    encode = mau_encode
    decode = mau_decode
    tol = MAU_TOL
    gen = _mau_samples

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                if not n:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                samples = gen(bb, n)
                blob = encode(8000 * (1 + int(bb[0] % 3)), samples.tolist())
                sr, n_samples, nf, first, out = decode(blob)
                err = int(np.abs(np.asarray(out) - samples).max())
                if err > tol:
                    raise ValueError(
                        "MAU1 corpus contract violated (doc_id="
                        f"{doc_id}): max abs err {err} > MAU_TOL {tol}"
                    )
                rows.append(
                    (doc_id, sr, n_samples, nf, first, bool(err <= tol))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "n_frames",
                    "first_sample", "within_tolerance",
                ],
            )
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, MAU_SCHEMA)


MAU2_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, n_frames int, "
    "first_sample int, within_tolerance boolean, snr_ok boolean"
)


def with_mau2_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, text, blob) with blob a MAU2 stream — the MAU1 family
    with DYNAMIC psychoacoustic bit allocation (multimodal/mdct.py:
    spreading-function masking thresholds -> greedy NMR-priority
    allocation under a 1024-bit/frame budget, 11% below MAU1's static
    spend). Same SQL-exact signal family as MAU1. Both contract bounds
    (MAU2_TOL absolute cap, MAU2_SNR_FLOOR_DB noise-energy floor) are
    enforced HERE at generation (ADVICE r10 discipline)."""
    from .mdct import MAU2_SNR_FLOOR_DB, MAU2_TOL, mau2_decode, mau2_encode

    encode = mau2_encode
    decode = mau2_decode
    tol = MAU2_TOL
    floor_db = MAU2_SNR_FLOOR_DB
    gen = _mau_samples

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                if not n:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                sr = 8000 * (1 + int(bb[0] % 3))
                samples = gen(bb, n)
                blob = encode(sr, samples.tolist())
                _, _, _, _, out = decode(blob)
                noise = np.asarray(out, dtype=np.float64) - samples
                err = int(np.abs(noise).max())
                sig = float((samples.astype(np.float64) ** 2).sum())
                snr = 10.0 * np.log10(
                    sig / max(float((noise**2).sum()), 1e-12)
                )
                if err > tol or snr < floor_db:
                    raise ValueError(
                        "MAU2 corpus contract violated (doc_id="
                        f"{doc_id}): err {err} (tol {tol}), snr "
                        f"{snr:.1f} dB (floor {floor_db})"
                    )
                rows.append((doc_id, text, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, text string, blob binary")


def decode_mau2_meta(docs: DataFrame) -> DataFrame:
    """Decode the MAU2 streams: exact geometry + header first sample,
    plus the two-sided lossy contract (absolute cap AND an SNR floor —
    a perceptual allocator controls noise ENERGY, not peak error).

    r13 (guide §4): FUSED with the blob stage — one mapInPandas runs
    generation + encode + ONE decode per document (the two-stage form
    decoded every stream twice and shipped (text, blob) across an
    extra Arrow boundary). The single decode serves both the
    generation contract (raise on breach, as the blob maker did) and
    the emitted bounds — the stage-2 `expected` was the same
    regenerated signal as stage-1's `samples`, so the comparisons and
    rows are identical. with_mau2_blob stays as the standalone blob
    maker."""
    from .mdct import MAU2_SNR_FLOOR_DB, MAU2_TOL, mau2_decode, mau2_encode

    encode = mau2_encode
    decode = mau2_decode
    tol = MAU2_TOL
    floor_db = MAU2_SNR_FLOOR_DB
    gen = _mau_samples

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                if not n:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                samples = gen(bb, n)
                blob = encode(8000 * (1 + int(bb[0] % 3)), samples.tolist())
                sr, n_samples, nf, first, out = decode(blob)
                expected = samples.astype(np.float64)
                noise = np.asarray(out, dtype=np.float64) - expected
                err = int(np.abs(noise).max())
                sig = float((expected**2).sum())
                snr = 10.0 * np.log10(
                    sig / max(float((noise**2).sum()), 1e-12)
                )
                if err > tol or snr < floor_db:
                    raise ValueError(
                        "MAU2 corpus contract violated (doc_id="
                        f"{doc_id}): err {err} (tol {tol}), snr "
                        f"{snr:.1f} dB (floor {floor_db})"
                    )
                rows.append(
                    (
                        doc_id, sr, n_samples, nf, first,
                        bool(err <= tol), bool(snr >= floor_db),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "sample_rate", "n_samples", "n_frames",
                    "first_sample", "within_tolerance", "snr_ok",
                ],
            )
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, MAU2_SCHEMA)


AVC_SCHEMA = (
    "doc_id long, width int, height int, qp int, n_blocks int, "
    "n_mode0 int, n_mode1 int, n_mode2 int, pixel_sum long, "
    "recon_exact boolean, within_tolerance boolean"
)


def _avc_stripe_plane(bb, n, width: int, height: int):
    """The AVC1 corpus image family (SQL-recomputable): 4-px-wide
    VERTICAL stripes, stripe bx = value (byte[bx mod n]*131 +
    bx*7919) % 256, identical down every row. Each 4x4 block is
    CONSTANT, so by the exhaustively-pinned constant-residual
    exactness at qp <= 11 the whole closed loop is LOSSLESS and the
    mode field is forced: block (0,0) has no neighbors (DC), the rest
    of block-row 0 ties HOR/DC at equal SAD and the lower index wins
    (HOR), and every block below row 0 sees an EXACT vertical
    predictor (SAD 0 -> VERT, the lowest index). pixel_sum is then
    height * 4 * sum(v)."""
    import numpy as np

    nbx = width // 4
    bx = np.arange(nbx, dtype=np.int64)
    v = (bb[bx % n] * 131 + bx * 7919) % 256
    return np.repeat(v, 4)[None, :].repeat(height, axis=0).astype(
        np.uint8
    ), v


def with_avc_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, text, blob) with blob an AVC1 intra stream
    (multimodal/avc.py — H.264-style Intra_4x4 prediction + exact
    integer transform/quant LUTs). Geometry/qp from the text bytes:
    width = 32 + 16*(first_byte % 2), height = 32 + 16*(last_byte %
    2), qp = (first_byte*7 + last_byte) % 12 — qp spans BOTH qP//6
    shift banks and every qP%6 table column across the corpus. The
    designed mode field (DC once, HOR across block-row 0, VERT
    everywhere below) and the EXACT reconstruction are enforced HERE
    at generation from the encoder's closed-loop stats (ADVICE r10
    discipline: corpus drift fails loudly at the blob maker, not as a
    driver-red oracle mismatch)."""
    from .avc import DC, HOR, VERT, avc_encode_stats

    encode = avc_encode_stats
    dc, hor, vert = DC, HOR, VERT
    gen = _avc_stripe_plane

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                if not n:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                width = 32 + 16 * int(bb[0] % 2)
                height = 32 + 16 * int(bb[-1] % 2)
                qp = (int(bb[0]) * 7 + int(bb[-1])) % 12
                img, _ = gen(bb, n, width, height)
                blob, modes, recon = encode(
                    width, height, qp, img.tobytes()
                )
                designed = (
                    modes[0, 0] == dc
                    and (modes[0, 1:] == hor).all()
                    and (modes[1:, :] == vert).all()
                )
                if not designed:
                    raise ValueError(
                        "AVC1 corpus contract violated (doc_id="
                        f"{doc_id}): mode field departs from the "
                        "designed DC/HOR/VERT layout"
                    )
                if not (recon == img).all():
                    raise ValueError(
                        "AVC1 corpus contract violated (doc_id="
                        f"{doc_id}): stripe reconstruction not exact "
                        f"at qp={qp}"
                    )
                rows.append((doc_id, text, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, text string, blob binary")


def decode_avc_intra(docs: DataFrame) -> DataFrame:
    """Decode the AVC1 streams and bind the bitstream-decoded MODE
    FIELD and pixel content to SQL-exact values: n_mode0/1/2 count the
    decoded Intra_4x4 modes (a misparsed mode bit, wrong MPM
    prediction chain, or wrong block raster order changes the counts
    and reds the driver hash), pixel_sum sums the decoded plane (the
    designed corpus reconstructs EXACTLY, so the oracle recomputes it
    from the generation rule), recon_exact pins that bit-exactness
    and within_tolerance re-states the general AVC_TOL envelope.

    r13 (guide §4): FUSED with the blob stage — one mapInPandas runs
    generation + contract checks + encode + the real bitstream decode
    per document (the stripe plane is generated once, and (text, blob)
    never crosses an extra Arrow boundary). Rows identical by
    construction; with_avc_blob stays as the standalone blob maker.
    The streaming twin (stream_avc_ingest) consumes this same fused
    operator."""
    from .avc import AVC_TOL, DC, HOR, VERT, avc_decode, avc_encode_stats

    encode = avc_encode_stats
    decode = avc_decode
    dc, hor, vert = DC, HOR, VERT
    tol = AVC_TOL
    gen = _avc_stripe_plane

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                if not n:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                width = 32 + 16 * int(bb[0] % 2)
                height = 32 + 16 * int(bb[-1] % 2)
                qp = (int(bb[0]) * 7 + int(bb[-1])) % 12
                img, _ = gen(bb, n, width, height)
                blob, emodes, erecon = encode(
                    width, height, qp, img.tobytes()
                )
                designed = (
                    emodes[0, 0] == dc
                    and (emodes[0, 1:] == hor).all()
                    and (emodes[1:, :] == vert).all()
                )
                if not designed:
                    raise ValueError(
                        "AVC1 corpus contract violated (doc_id="
                        f"{doc_id}): mode field departs from the "
                        "designed DC/HOR/VERT layout"
                    )
                if not (erecon == img).all():
                    raise ValueError(
                        "AVC1 corpus contract violated (doc_id="
                        f"{doc_id}): stripe reconstruction not exact "
                        f"at qp={qp}"
                    )
                # The query's claim: the REAL bitstream decode.
                width, height, qp, recon, modes = decode(blob)
                err = int(
                    np.abs(
                        recon.astype(np.int64) - img.astype(np.int64)
                    ).max()
                )
                rows.append(
                    (
                        doc_id,
                        width,
                        height,
                        qp,
                        int(modes.size),
                        int((modes == vert).sum()),
                        int((modes == hor).sum()),
                        int((modes == dc).sum()),
                        int(recon.astype(np.int64).sum()),
                        bool(err == 0),
                        bool(err <= tol),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "qp", "n_blocks",
                    "n_mode0", "n_mode1", "n_mode2", "pixel_sum",
                    "recon_exact", "within_tolerance",
                ],
            )
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, AVC_SCHEMA)


AVCC_SCHEMA = (
    "doc_id long, width int, height int, qp int, n_blocks int, "
    "total_coeff_sum long, n_mode0 int, n_mode1 int, n_mode2 int, "
    "pixel_sum long, recon_exact boolean, within_tolerance boolean"
)


def with_avcc_blob(docs: DataFrame) -> DataFrame:
    """(doc_id, text, blob) with blob an AVCC stream — the AVC intra
    codec with CAVLC residual coding (multimodal/cavlc.py). Same
    stripe corpus / geometry / qp rules as with_avc_blob, so the mode
    field and exact reconstruction carry over; additionally the
    per-block TotalCoeff field is enforced at generation against the
    closed-form prediction (constant residuals quantize to at most
    ONE DC coefficient, so row-0 blocks carry 0 or 1 coefficients and
    every lower block carries 0 — the quantized level per stripe is
    SQL-recomputable from the MF table and the intra offset)."""
    from .avc import DC, HOR, VERT
    from .cavlc import avcc_encode_stats

    encode = avcc_encode_stats
    dc, hor, vert = DC, HOR, VERT
    gen = _avc_stripe_plane
    mf_a = (13107, 11916, 10082, 9362, 8192, 7282)

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                if not n:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                width = 32 + 16 * int(bb[0] % 2)
                height = 32 + 16 * int(bb[-1] % 2)
                qp = (int(bb[0]) * 7 + int(bb[-1])) % 12
                img, v = gen(bb, n, width, height)
                blob, modes, recon, tc = encode(
                    width, height, qp, img.tobytes()
                )
                designed = (
                    modes[0, 0] == dc
                    and (modes[0, 1:] == hor).all()
                    and (modes[1:, :] == vert).all()
                    and (tc[1:, :] == 0).all()
                )
                if not designed:
                    raise ValueError(
                        "AVCC corpus contract violated (doc_id="
                        f"{doc_id}): mode/TotalCoeff field departs "
                        "from the designed layout"
                    )
                if not (recon == img).all():
                    raise ValueError(
                        "AVCC corpus contract violated (doc_id="
                        f"{doc_id}): stripe reconstruction not exact "
                        f"at qp={qp}"
                    )
                qbits = 15 + qp // 6
                f = (1 << qbits) // 3
                mf = mf_a[qp % 6]
                r = np.empty(len(v), dtype=np.int64)
                r[0] = v[0] - 128
                r[1:] = v[1:] - v[:-1]
                lv = np.sign(16 * r) * (
                    (np.abs(16 * r) * mf + f) >> qbits
                )
                if int((lv != 0).sum()) != int(tc.sum()):
                    raise ValueError(
                        "AVCC corpus contract violated (doc_id="
                        f"{doc_id}): TotalCoeff departs from the "
                        "closed-form stripe prediction"
                    )
                rows.append((doc_id, text, blob))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "blob"])
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, "doc_id long, text string, blob binary")


def decode_avc_cavlc(docs: DataFrame) -> DataFrame:
    """Decode the AVCC streams: the bitstream-decoded per-block
    TotalCoeff field (the CAVLC nC context chain), mode field and
    pixel content all bind to SQL-exact values — a wrong coeff_token
    context, a mis-adapted suffixLength, a bad run_before width or a
    swapped trailing-one sign desyncs the stream and reds the
    checksum or the counts.

    r13 (guide §4): FUSED with the blob stage — one mapInPandas runs
    generation + contract checks (incl. the closed-form TotalCoeff
    prediction) + encode + the real bitstream decode per document.
    Rows identical by construction; with_avcc_blob stays as the
    standalone blob maker."""
    from .avc import AVC_TOL, DC, HOR, VERT
    from .cavlc import avcc_decode, avcc_encode_stats

    encode = avcc_encode_stats
    decode = avcc_decode
    dc, hor, vert = DC, HOR, VERT
    tol = AVC_TOL
    gen = _avc_stripe_plane
    mf_a = (13107, 11916, 10082, 9362, 8192, 7282)

    def op(batches):
        import numpy as np
        import pandas as pd

        rows = []
        for pdf in batches:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                if len(b) != len(text):
                    raise ValueError(
                        f"non-ASCII document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires the "
                        "ASCII corpus contract"
                    )
                n = len(b)
                if not n:
                    raise ValueError(
                        f"empty document text (doc_id={doc_id}): "
                        "byte-indexed blob generation requires a "
                        "non-empty corpus"
                    )
                bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
                width = 32 + 16 * int(bb[0] % 2)
                height = 32 + 16 * int(bb[-1] % 2)
                qp = (int(bb[0]) * 7 + int(bb[-1])) % 12
                img, v = gen(bb, n, width, height)
                blob, emodes, erecon, etc = encode(
                    width, height, qp, img.tobytes()
                )
                designed = (
                    emodes[0, 0] == dc
                    and (emodes[0, 1:] == hor).all()
                    and (emodes[1:, :] == vert).all()
                    and (etc[1:, :] == 0).all()
                )
                if not designed:
                    raise ValueError(
                        "AVCC corpus contract violated (doc_id="
                        f"{doc_id}): mode/TotalCoeff field departs "
                        "from the designed layout"
                    )
                if not (erecon == img).all():
                    raise ValueError(
                        "AVCC corpus contract violated (doc_id="
                        f"{doc_id}): stripe reconstruction not exact "
                        f"at qp={qp}"
                    )
                qbits = 15 + qp // 6
                f = (1 << qbits) // 3
                mf = mf_a[qp % 6]
                r = np.empty(len(v), dtype=np.int64)
                r[0] = v[0] - 128
                r[1:] = v[1:] - v[:-1]
                lv = np.sign(16 * r) * (
                    (np.abs(16 * r) * mf + f) >> qbits
                )
                if int((lv != 0).sum()) != int(etc.sum()):
                    raise ValueError(
                        "AVCC corpus contract violated (doc_id="
                        f"{doc_id}): TotalCoeff departs from the "
                        "closed-form stripe prediction"
                    )
                # The query's claim: the REAL bitstream decode.
                width, height, qp, recon, modes, tc = decode(blob)
                err = int(
                    np.abs(
                        recon.astype(np.int64) - img.astype(np.int64)
                    ).max()
                )
                rows.append(
                    (
                        doc_id,
                        width,
                        height,
                        qp,
                        int(modes.size),
                        int(tc.sum()),
                        int((modes == vert).sum()),
                        int((modes == hor).sum()),
                        int((modes == dc).sum()),
                        int(recon.astype(np.int64).sum()),
                        bool(err == 0),
                        bool(err <= tol),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "qp", "n_blocks",
                    "total_coeff_sum", "n_mode0", "n_mode1", "n_mode2",
                    "pixel_sum", "recon_exact", "within_tolerance",
                ],
            )
            rows = []

    src = docs.select("doc_id", "text")
    spark = src.sparkSession
    src = src.repartition(spark.sparkContext.defaultParallelism)
    return src.mapInPandas(op, AVCC_SCHEMA)
