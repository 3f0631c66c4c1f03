"""Multimodal (image/audio/video) column plumbing: opaque binary
columns + typed metadata, decoded / feature-extracted via Arrow-batched
mapInPandas (north-star surface; BASELINE.json).

Decode status (r8): the UNCOMPRESSED-format decodes are REAL and
self-contained — PNG (stdlib zlib/struct: chunk walk, CRC checks,
IDAT inflate, scanline de-filter; blobs.py::png_decode, since r7),
PCM WAV (stdlib struct + numpy: RIFF walk, fmt geometry cross-check,
int16 frame decode; blobs.py::wav_decode, r8), and uncompressed AVI
video (RIFF/list tree walk, header cross-checks, raw 24-bit DIB
frames de-padded + re-flipped to RGB; blobs.py::avi_decode, r8) —
all round-tripped against standards-shaped encoders and hash-checked
by DuckDB oracles that recompute what a correct decoder must report
(multimodal_image_meta, multimodal_audio_decode,
multimodal_video_decode). The remaining boundary is COMPRESSED
codecs (JPEG/mp3/aac/h264): this container
ships no codec libraries, so those paths stay behind the documented
import-try; swapping PIL/ffmpeg in changes only the pure-Python codec
functions — the Spark-side plumbing (binary schema, partitioning, UDF
signatures, Arrow batch shapes) is identical and tested.
"""
