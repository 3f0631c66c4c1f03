"""Out-of-Spark codec profiling for the r13 optimization round.

Times encode/decode per rung over the real sf0.1 document texts
(loaded with pyarrow, no Spark), and cProfiles the decode paths to
attribute time to the bit readers vs the DSP — the evidence behind
VERDICT r12 #4 (word-at-a-time bit reader) and #5 (stage fusing).

    python scripts/profile_codecs_r13.py [mpeg|mau|mau2|cavlc|avc|...]
"""
from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time

import numpy as np
import pyarrow.parquet as pq

import os
REPO = os.environ.get("CODEC_REPO", "/root/repo")
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.1"


def doc_texts(limit=None):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_pylist()
    txts = t.column("text").to_pylist()
    if limit:
        ids, txts = ids[:limit], txts[:limit]
    return list(zip(ids, txts))


def timeit(label, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt:.3f}s")
    return out, dt


def profile(label, fn, *args, top=18):
    if os.environ.get("CODEC_NOPROFILE"):
        return
    pr = cProfile.Profile()
    pr.enable()
    fn(*args)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(top)
    print(f"---- cProfile {label} ----")
    print("\n".join(s.getvalue().splitlines()[:top + 8]))


def run_mpeg(docs):
    from matrix_multiplication_map_reduce_gcp_spark.multimodal.mpeg import (
        mpeg_encode_stats, mpeg_decode)

    blobs = []

    def enc():
        for doc_id, text in docs:
            b = text.encode()
            bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            n = len(b)
            w = 32 + 16 * int(bb[0] % 2)
            h = 32 + 16 * int(bb[-1] % 2)
            nf = 3 + int((bb[0] + bb[-1]) % 2)
            sx, sy = 1 + int(bb[0] % 3), 1 + int(bb[-1] % 3)
            fps = 5 * (1 + n % 4)
            p = np.arange(h * w, dtype=np.int64)
            base = ((bb[p % n] * 131 + p * 7919) % 256).reshape(h, w)
            frames = []
            for f in range(nf):
                yy = (np.arange(h)[:, None] + f * sy) % h
                xx = (np.arange(w)[None, :] + f * sx) % w
                frames.append(base[yy, xx].astype(np.uint8).tobytes())
            blob, _, _ = mpeg_encode_stats(w, h, fps, frames)
            blobs.append(blob)

    def dec():
        for blob in blobs:
            mpeg_decode(blob)

    _, te = timeit("mpeg encode(+stats)", enc)
    _, td = timeit("mpeg decode", dec)
    profile("mpeg decode", dec)
    profile("mpeg encode", lambda: (blobs.clear(), enc()))


def run_mau(docs, two=False):
    from matrix_multiplication_map_reduce_gcp_spark.multimodal.mdct import (
        mau_encode, mau_decode, mau2_encode, mau2_decode)
    from matrix_multiplication_map_reduce_gcp_spark.multimodal.blobs import (
        _mau_samples)

    enc_fn, dec_fn = (mau2_encode, mau2_decode) if two else (mau_encode, mau_decode)
    name = "mau2" if two else "mau1"
    blobs = []

    def enc():
        for doc_id, text in docs:
            b = text.encode()
            bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            sr = 8000 * (1 + int(bb[0] % 3))
            samples = _mau_samples(bb, len(b))
            blobs.append(enc_fn(sr, samples.tolist()))

    def dec():
        for blob in blobs:
            dec_fn(blob)

    timeit(f"{name} encode", enc)
    timeit(f"{name} decode", dec)
    profile(f"{name} decode", dec)
    profile(f"{name} encode", lambda: (blobs.clear(), enc()))


def run_avc(docs, cavlc=False):
    mod = __import__(
        "matrix_multiplication_map_reduce_gcp_spark.multimodal."
        + ("cavlc" if cavlc else "avc"),
        fromlist=["x"])
    from matrix_multiplication_map_reduce_gcp_spark.multimodal.blobs import (
        _avc_stripe_plane)
    name = "cavlc" if cavlc else "avc"
    enc_fn = mod.avcc_encode_stats if cavlc else mod.avc_encode_stats
    dec_fn = mod.avcc_decode if cavlc else mod.avc_decode

    blobs = []

    def enc():
        for doc_id, text in docs:
            b = text.encode()
            bb = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            n = len(b)
            w = 32 + 16 * int(bb[0] % 2)
            h = 32 + 16 * int(bb[-1] % 2)
            qp = (int(bb[0]) * 7 + int(bb[-1])) % 12
            plane, _ = _avc_stripe_plane(bb, n, w, h)
            blobs.append(enc_fn(w, h, qp, plane.tobytes())[0])

    def dec():
        for blob in blobs:
            dec_fn(blob)

    timeit(f"{name} encode", enc)
    timeit(f"{name} decode", dec)
    profile(f"{name} decode", dec)


def main():
    which = sys.argv[1:] or ["mpeg", "mau", "mau2"]
    docs = doc_texts(int(os.environ.get("CODEC_LIMIT", "0")) or None)
    print(f"{len(docs)} documents from {SF}")
    for w in which:
        print(f"== {w} ==")
        if w == "mpeg":
            run_mpeg(docs)
        elif w == "mau":
            run_mau(docs, two=False)
        elif w == "mau2":
            run_mau(docs, two=True)
        elif w == "avc":
            run_avc(docs, cavlc=False)
        elif w == "cavlc":
            run_avc(docs, cavlc=True)


if __name__ == "__main__":
    main()
