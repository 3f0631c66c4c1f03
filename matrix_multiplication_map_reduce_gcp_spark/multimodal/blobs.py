"""Binary-column operators via mapInPandas.

`with_blob` manufactures a binary column from document text (the
fixtures carry no real media; UTF-8 bytes stand in for image bytes).
`decode_image_meta` / `sample_frames` run per-partition over Arrow
batches — the exact plumbing a real decoder plugs into: swap the
fake-decode body for a PIL/ffmpeg call and nothing else changes.

IMPORTANT (worker serialization): every function passed to
mapInPandas is a self-contained closure — no references to this
package's module globals — so cloudpickle ships it by value and the
Python workers never need the package importable on their sys.path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = "doc_id long, n_bytes long, width int, height int, channels int"
FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_offset long"


def real_decode_available() -> bool:
    try:  # pragma: no cover - codec libs absent in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary column (+ keep doc_id)."""
    return docs.select("doc_id", F.encode("text", "utf-8").alias("blob"))


def decode_image_meta(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bytes, width, height, channels) via Arrow-batched
    mapInPandas — one Python crossing per batch, not per row.

    The decode is a deterministic STUB (metadata derived from raw
    bytes, mirrored in SQL oracles via ascii/octet_length); the real
    codec path raises NotImplementedError until PIL lands."""

    def op(batches):
        import pandas as pd

        try:
            import PIL.Image  # noqa: F401

            raise NotImplementedError(
                "real image decode not wired yet; container lacks codecs"
            )
        except ImportError:
            pass

        def fake_decode(blob):
            n = len(blob)
            width = 64 + (blob[0] if n else 0)
            height = 64 + (blob[-1] if n else 0)
            return n, width, height, 3

        for pdf in batches:
            meta = pdf["blob"].map(fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": meta.map(lambda m: m[0]),
                    "width": meta.map(lambda m: m[1]),
                    "height": meta.map(lambda m: m[2]),
                    "channels": meta.map(lambda m: m[3]),
                }
            )

    return with_blob(docs).mapInPandas(op, DECODE_SCHEMA)


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
    """One row per sampled 'frame': frame_idx = 0..n_bytes//stride —
    the 1→N expansion shape of video frame sampling."""

    def op(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                n_frames = len(blob) // stride + 1
                rows.extend((doc_id, idx, idx * stride) for idx in range(n_frames))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_offset"])

    return with_blob(docs).mapInPandas(op, FRAMES_SCHEMA)
