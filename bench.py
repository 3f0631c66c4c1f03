"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line the driver records as BENCH_r{N}.json.

Includes `matmul_dense_200`: C = A(200×200) @ B(200×200) on generated
uniform-int matrices — the reference's largest published case, which
it ran in 46.1 s on Cloud Functions (BASELINE.md; its NumPy VM oracle:
0.7 s). Everything is forced through a noop sink so full plans execute
without driver collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark import registry
from matrix_multiplication_map_reduce_gcp_spark.matrix.coo import CooMatrix
from matrix_multiplication_map_reduce_gcp_spark.session import get_spark

HEADLINE = [
    "matmul",
    "matmul_sparse",
    "matrix_gram",
    "pricing_summary",
    "shipping_priority",
    "region_nation_revenue",
    "top3_orders_per_customer",
    "user_sessions",
    "json_extraction",
    "dedup_exact",
    "minhash_lsh_pairs",
    "dedup_incremental_lsh",
    "simhash_fingerprints",
    "ngram_jaccard_pairs",
    "ann_brute_force_topk",
    "ann_lsh_topk",
    "ann_lsh_multiprobe_topk",
    "ann_sq8_topk",
    "ann_pq_rerank_topk",
    "kmeans_assignments",
    "cms_heavy_hitters",
    "quality_filter_verdict",
    "sequence_pack_greedy",
    "scd2_user_event_history",
    "stream_tumbling_counts",
    # r4 additions: the A-priori basket self-join and the binned
    # interval-overlap join — the two heaviest new shuffle shapes.
    "market_basket_pairs",
    "incident_impact_events",
    # r4 second wave: the new curation flagships — DSIR's two-pass
    # broadcast-model scoring, SemDeDup's cell-bounded pair join, the
    # all-corpus multi-probe kNN graph, and the 3-round LPA driver
    # loop (the heaviest new iterative shape).
    "dsir_importance_weights",
    "semdedup_keep_list",
    "knn_graph_lsh",
    "label_propagation_communities",
    # r4 third wave: the cogrouped-Arrow per-key merge (a new execution
    # path — FlatMapCoGroupsInPandas), the Jacobi solver's broadcast
    # sweep loop, and the chain-ordered matmul pipeline.
    "cogroup_events_before_order",
    "jacobi_solve_2iter",
    "matmul_chain_assoc",
    # r8: the two new REAL uncompressed-media decode round-trips —
    # Arrow-batched mapInPandas codec paths (PCM WAV, DIB AVI), both
    # map-only scan-bandwidth shapes (~0.6 s / ~1.2 s at sf0.1 on
    # first measurement) — and the frame-granularity video dedup
    # (decode + per-frame aHash, then a metadata-keyed hash-groupBy).
    "multimodal_audio_decode",
    "multimodal_video_decode",
    "multimodal_frame_dup_groups",
    # r9: the compressed-PNG ladder step — Up-filtered scanlines at
    # 16-32px geometry, full spec de-filter in the decoder; one
    # deliberate round-robin Exchange decouples the CPU-bound codec
    # from file layout (plan-gated); plus the two decoded-content
    # analytics over the real codec streams (peak-decimation envelope,
    # temporal-diff motion) — both map-only.
    "multimodal_image_decode_filtered",
    "multimodal_audio_envelope",
    "multimodal_video_motion",
    # r10: the interlaced (Adam7) PNG rung — seven independently
    # filtered passes scattered back to the raster, content-checked by
    # a position-weighted digest; same map-only CPU-bound codec shape.
    "multimodal_image_decode_adam7",
    # r10: the entropy-coded rung — REAL baseline JPEG encode+decode
    # (T.81: batched DCT, Annex-K Huffman, byte stuffing, LUT
    # decoder); the most CPU-intensive codec stage in the ladder.
    "multimodal_jpeg_roundtrip",
    # r10 second wave: the three remaining entropy-coded-codec rungs —
    # lossless GIF/LZW (variable-width codes, exact-content oracle),
    # compressed audio (IMA ADPCM blocks), and compressed video
    # (Motion-JPEG AVI, per-frame entropy decode). All the same
    # map-only Arrow-batched codec shape.
    "multimodal_gif_decode",
    "multimodal_adpcm_roundtrip",
    "multimodal_mjpeg_frames",
    # r10 third wave: the general-purpose entropy rung — FROM-SPEC
    # RFC 1951/1950 inflate (stored/fixed/dynamic Huffman blocks,
    # LZ77 back-references, Adler-32), removing the stdlib-zlib IDAT
    # boundary. Same map-only Arrow-batched codec shape.
    "multimodal_deflate_decode",
    # r10 fourth wave: the predictive lossless-audio rung — REAL
    # native-FLAC subset (RFC 9639: fixed predictors + adaptive Rice
    # coding, CRC-8/CRC-16/MD5 verified). Same map-only codec shape.
    "multimodal_flac_decode",
    # r10 fifth wave: the adaptive-entropy rung — context-adaptive
    # binary arithmetic coding (Witten–Neal–Cleary / CABAC class),
    # completing the ladder's entropy-coding inventory. Same shape.
    "multimodal_arith_decode",
    # r11: the MOTION-COMPENSATED video rung — simplified MPEG-1-style
    # MPV1 (intra DCT frame + full-search motion vectors + coded
    # residuals, Exp-Golomb MV coding), crossing the lossy
    # motion-modeling boundary. Same map-only codec shape.
    "multimodal_mpeg_motion",
    # r11 wave 2: the PERCEPTUAL-AUDIO rung — MDCT (Princen–Bradley
    # TDAC) + per-band scalefactor quantization with a static
    # allocation curve, MPEG-1-Layer-I-style. Same shape.
    "multimodal_mdct_audio",
    # r11 wave 3: the PSYCHOACOUSTIC-MODEL rung — spreading-function
    # masking thresholds driving dynamic NMR-priority allocation under
    # a hard budget 11% below the static spend. Same shape.
    "multimodal_psycho_audio",
    # r11 wave 4: the H.264-TOOLING rung — AVC-style Intra_4x4
    # prediction + the exact integer transform / MF-V quant LUTs +
    # MPM mode coding; stripe corpus makes the mode field and the
    # full reconstruction SQL-exact. Same map-only codec shape.
    "multimodal_avc_intra",
    # r11 wave 5: distributed BPE tokenizer TRAINING — three unrolled
    # count→argmax→rewrite merge iterations; alphabet^2-bounded
    # shuffles, broadcast 1-row winners, map-only rewrites.
    "bpe_train_merges",
    # r11 wave 6: the OPTIMIZE-ZORDER planning pass — Morton-bucket
    # zone maps for both predicate dimensions vs single-column sort;
    # pure-codegen bit arithmetic + a 64-key map-side-combine shuffle.
    "zorder_layout_plan",
    # r11 wave 7: one Strassen level over the flagship product — the
    # Strassen tensor as a tagged replication flatMap: all seven
    # half-size products in ONE broadcast join-agg (the
    # communication-avoiding matmul trade), bit-equal to the direct
    # product on the integer-valued fixtures.
    "matmul_strassen",
    # r11 wave 8: multimodal decode-at-ingest — the AVC1 rung as a
    # Structured Streaming pipeline (documents file stream -> Arrow
    # decode stages per micro-batch -> append sink, exactly once),
    # row-identical to the batch rung by construction.
    "stream_avc_ingest",
    # r12 wave 1: OPTIMIZE-ZORDER EXECUTED — the double rewrite
    # (Morton-bucket vs date-sort parquet layouts), re-read zone-map
    # audit + pushed-predicate row counts on the rewritten files.
    "zorder_layout_execute",
    # r12 wave 1: STATEFUL dedup-at-ingest — per-micro-batch MinHash
    # band signatures joining an append-only persisted band index,
    # exactly-once verdicts (the stateful sibling of stream_avc_ingest).
    "stream_dedup_ingest",
    # r12 wave 2: the CAVLC rung — AVC intra with context-adaptive
    # residual coding (nC contexts, suffixLength adaptation,
    # total_zeros/run_before bookkeeping). Same map-only codec shape.
    "multimodal_avc_cavlc",
]

# The 10 heaviest registry queries (by a full-registry sf0.1 timing
# sweep, r5) that had never been measured at the sf1 scale point, plus
# the four families VERDICT r4 called out as unmeasured (all four are
# sub-second at sf0.1 — included to close the question with numbers).
# Run via SPARK_GRAFT_BENCH_GROUP=heavy at sf0.1 AND sf1; every query
# gets median-of-3. Recorded as BENCH_SF1_r{N}.json with per-query
# scale ratios.
HEAVY_SCALE = [
    "triangle_count_suppliers",
    "dedup_cluster_size_histogram",
    "dedup_clusters",
    "dedup_keep_list",
    "containment_dup_pairs",
    "levenshtein_near_dup_pairs",
    "embedding_near_dup_pairs",
    "ann_ivf_cells",
    "simhash_near_dup_pairs",
    "supplier_two_hop_reach",
    # VERDICT r4 named families
    "join_view_ivm",
    "merge_upsert_orders",
    "event_path_trigrams_topk",
    "weekly_retention_cohorts",
    # r5 new operators: scale-audited the round they ship (k-core's
    # pair stage shares LPA's self-join shape; the other two are
    # map-side-combining aggregations that should ratio ~linearly).
    "k_core_suppliers",
    "source_minhash_similarity",
    "epoch_shuffle_shards",
    # r6: top-k-per-doc capped variants of the two emit-all-pairs
    # operators whose sf1 walls were output-volume quadratics of the
    # planted duplicate groups (VERDICT r5 #7) — the capped emit is
    # ≤ k·n rows, so the sf1 ratio should drop back to ~linear.
    "embedding_near_dup_pairs_capped",
    "levenshtein_near_dup_pairs_capped",
    # r6: the two biggest Arrow-cosine-kernel beneficiaries — sf1
    # tracking so the swap's effect stays measured per round — and the
    # new map-only chunking op (should ratio ~linearly at scan
    # bandwidth).
    "knn_graph_lsh",
    "semdedup_keep_list",
    "rag_chunk_manifest",
]


def gen_matrix(spark, n: int, seed: int) -> CooMatrix:
    """Dense n×n uniform ints 0..99 (the reference's generator shape,
    test/test.py:42-43), built distributed via spark.range."""
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") / n).cast("long").alias("i"),
            (F.col("id") % n).alias("j"),
            F.floor(F.rand(seed) * 100).cast("double").alias("v"),
        )
    )
    return CooMatrix(df, n, n)


# The driver records the LAST line of a 2000-char tail of merged
# stdout+stderr. Everything emitted must fit that window.
DRIVER_TAIL_CHARS = 2000
# The degradation backstop may only fire when the line TRULY cannot
# fit the tail window (ADVICE r12: the old >=1900 trigger sat INSIDE
# the supported worst-case projection of 1916-1946 chars, so it would
# have dropped every `queries` entry — the exact contract regression
# it existed to prevent). 5 chars of margin cover the trailing newline
# in the driver's tail slice.
LINE_HARD_BUDGET = DRIVER_TAIL_CHARS - 5


def compact_line(compact: dict) -> str:
    """Serialize the compact stdout record, degrading gracefully so the
    driver can ALWAYS parse a record and `queries` entries survive in
    every supported case:

      1. full record (the normal path — worst-case 66-entry projection
         is ~1946 chars with the canary pair, under LINE_HARD_BUDGET);
      2. if that truly cannot fit the tail window, drop the `canary`
         pair first (session-era metadata, duplicated in the full
         artifact) — `queries` is the driver contract and survives;
      3. only if the line STILL cannot fit (every query ≥1000 s — a
         failed round regardless), drop the per-query map rather than
         emit an unparseable record; it lives in the full artifact.
    """
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) < LINE_HARD_BUDGET:
        return line
    slim = {k: v for k, v in compact.items() if k != "canary"}
    line = json.dumps(slim, separators=(",", ":"))
    if len(line) < LINE_HARD_BUDGET:
        return line
    slim.pop("queries", None)  # pragma: no cover — beyond-catastrophic
    return json.dumps(slim, separators=(",", ":"))


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def jvm_gc_ms(spark) -> int:
    beans = (spark._jvm.java.lang.management.ManagementFactory
             .getGarbageCollectorMXBeans())
    return sum(b.getCollectionTime() for b in beans)


def gc_drain(spark) -> None:
    """Full JVM heap drain (JMH-style inter-iteration hygiene).
    The r7 A/Bs (scripts/ab_4000_block.py, ab_4000_gc.py) proved
    the 4000² block-matmul rep spread was HEAP STATE, not the
    plan: the GarbageCollectorMXBean counters attribute a 90.6 s
    rep to 21.1 s of in-rep GC (and 40/35 s reps to 5-6 s) right
    after heavy session work, while after this drain in-rep GC is
    ~1 s and walls sit at 9.6-18.9 s (median 10.2, spread <2×).
    One System.gc() alone is NOT enough: the second pass +
    sleeps let the ContextCleaner actually unpersist the
    broadcast/shuffle state the first pass only enqueued (its
    cleanup is async, driven by weak-ref collection). Used only
    where the measured operator allocates GB-scale JVM state
    (the block matmuls' 16M-struct collect_list pack)."""
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    time.sleep(1.0)
    spark._jvm.System.gc()
    time.sleep(1.0)


def run_block4000_rep() -> None:
    """SPARK_GRAFT_BENCH_GROUP=block4000: ONE timed rep of the dense
    block matmul in a FRESH JVM, emitted as one JSON line.

    VERDICT r9 #3: in-session reps share a heap era — the 2.5-10× rep
    spread survived GC-drain + interleaving across three rounds
    because every rep inherits the session's allocation history. A
    subprocess-isolated rep gives each measurement its own heap, so
    spread across reps finally isolates the operator from the era.
    Warm-up stays per-JVM (small-kernel codegen + one untimed
    full-size rep — JIT tiering needs real iteration volume,
    SCALING.md 4000² protocol) so the timed rep measures warm
    steady-state compute, not cold-start."""
    n = int(os.environ.get("SPARK_GRAFT_BENCH_BLOCK_N", "4000"))
    bs = int(os.environ.get("SPARK_GRAFT_BENCH_BLOCK_SIZE", "500"))
    from matrix_multiplication_map_reduce_gcp_spark.matrix.block import block_multiply
    from matrix_multiplication_map_reduce_gcp_spark.session import get_spark as _gs

    spark = _gs(app_name="spark_graft_bench_block4000")
    run_noop(block_multiply(gen_matrix(spark, 40, seed=9),
                            gen_matrix(spark, 40, seed=10),
                            block_size=20).df)
    a, b = gen_matrix(spark, n, seed=5), gen_matrix(spark, n, seed=6)
    run_noop(block_multiply(a, b, block_size=bs).df)  # untimed warm rep
    gc_drain(spark)
    g0 = jvm_gc_ms(spark)
    t0 = time.perf_counter()
    run_noop(block_multiply(a, b, block_size=bs).df)
    wall = round(time.perf_counter() - t0, 3)
    gc_ms = jvm_gc_ms(spark) - g0
    spark.stop()
    time.sleep(2.0)
    sys.stderr.flush()
    print(json.dumps({
        "metric": "block4000_rep_wall", "value": wall, "unit": "sec",
        "n": n, "block_size": bs, "gc_ms": gc_ms,
    }, separators=(",", ":")))
    sys.stdout.flush()


def fresh_jvm_block4000_reps(reps: int) -> tuple[list[float], list[int], str]:
    """Run `reps` subprocess-isolated block4000 reps SEQUENTIALLY
    (never two 48g-driver JVMs at once — callers invoke this BEFORE
    creating their own session). Returns (walls, gc_ms, error)."""
    import subprocess

    walls: list[float] = []
    gcs: list[int] = []
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ, SPARK_GRAFT_BENCH_GROUP="block4000")
    for i in range(reps):
        proc = None
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=1200, cwd=here,
            )
            line = [ln for ln in proc.stdout.strip().splitlines()
                    if ln.strip()][-1]
            rec = json.loads(line)
            assert rec["metric"] == "block4000_rep_wall"
            walls.append(float(rec["value"]))
            gcs.append(int(rec["gc_ms"]))
        except Exception as exc:
            tail = proc.stderr[-300:] if proc is not None else ""
            return walls, gcs, (
                f"fresh-JVM rep {i} failed: {type(exc).__name__}: {exc} "
                f"stderr={tail}"
            )[:500]
    return walls, gcs, ""


def main() -> None:
    if os.environ.get("SPARK_GRAFT_BENCH_GROUP") == "block4000":
        run_block4000_rep()
        return
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    # Smoke mode (tests/test_bench_contract.py): a 3-query subset that
    # exercises every code path of THIS harness — timing, repetitions,
    # dense ladder, plot, JSON emission — so a bench.py regression is
    # caught by the suite instead of costing the round its BENCH
    # artifact (the round-2 failure mode).
    smoke = bool(os.environ.get("SPARK_GRAFT_BENCH_SMOKE"))
    # group=heavy: the scale-audit group (HEAVY_SCALE, median-of-3,
    # no dense ladder/plot) — same harness, different query list, so
    # fault isolation and the one-JSON-line contract are shared.
    heavy = os.environ.get("SPARK_GRAFT_BENCH_GROUP") == "heavy"
    headline = HEAVY_SCALE if heavy else (HEADLINE[:3] if smoke else HEADLINE)
    ladder = () if heavy else ((4,) if smoke else (4, 10, 50, 100, 200))

    # VERDICT r9 #3: the 4000² block-matmul reps run in SUBPROCESS-
    # ISOLATED fresh JVMs, BEFORE this process creates its own 48g
    # session (never two driver heaps at once). Each child does its
    # own warm-up + drain + one timed rep; the spread across children
    # finally measures the operator without a shared heap era
    # (SCALING.md fresh-JVM bar: <1.5× across 3 reps).
    block4000_walls: list[float] = []
    block4000_gc: list[int] = []
    block4000_err = ""
    if not smoke and not heavy:
        block4000_walls, block4000_gc, block4000_err = fresh_jvm_block4000_reps(
            reps=int(os.environ.get("SPARK_GRAFT_BENCH_4000_REPS", "3")))

    spark = get_spark(app_name="spark_graft_bench")
    queries = registry.load_all()

    # Warm the JVM/codegen paths on the smallest SF so headline numbers
    # measure the queries, not session startup. Three distinct paths:
    # join/agg codegen (matmul), mapInArrow/applyInArrow (the SUMMA
    # block kernel — the r3 matmul_dense_1000_block +55% delta appeared with
    # only the join/agg warm-up), and the wide in-codegen fold
    # expressions the SQ8/PQ ANN queries compile on first hit.
    from matrix_multiplication_map_reduce_gcp_spark.matrix.block import block_multiply

    for wname, wthunk in (
        ("matmul", lambda: queries["matmul"].fn(spark, "/root/testdata/sf0.001").count()),
        ("block_kernel", lambda: block_multiply(
            gen_matrix(spark, 40, seed=9), gen_matrix(spark, 40, seed=10),
            block_size=20).df.count()),
        ("wide_fold", lambda: queries["ann_sq8_topk"].fn(
            spark, "/root/testdata/sf0.001").count()),
    ):
        try:
            wthunk()
        except Exception as exc:  # pragma: no cover
            print(f"warmup {wname} failed: {exc}", file=sys.stderr)

    # Heavy group: warm EVERY query once at sf0.01 before timing.
    # An sf0.001 warmup is NOT enough to stabilize the CPU-bound
    # queries — measured on triangle_count_suppliers at sf0.1: first
    # rep 40.7 s after an sf0.001 warmup vs 7.1 s after an sf0.01 one
    # (JIT tiering needs real iteration volume before the hot loops
    # compile), which is exactly the 9.4/17.7/5.8 s spread VERDICT r5
    # #5 flagged. The heavy group measures SCALE RATIOS, not session
    # cold-start, so pre-warming is the honest protocol; with it the
    # sf0.1 spread lands ≤1.5x (7.06/5.21/5.59 measured).
    if heavy:
        for name in headline:
            try:
                run_noop(queries[name].fn(spark, "/root/testdata/sf0.01"))
            except Exception as exc:  # pragma: no cover
                print(f"heavy warmup {name} failed: {exc}", file=sys.stderr)
        # r11 (VERDICT r10 #4 adjudication): one untimed pass at the
        # TARGET SF as well. The sf0.01 warm-up stabilizes codegen but
        # not FIRST-EXECUTION-at-full-size costs — cold parquet page
        # cache + JIT tiering at real volume — which at sf1 put 2-5x
        # of one-time cost into the first timed rep
        # (probe_triangle_sf1: first rep 66-69 s vs a 23.5 s converged
        # floor, GC tiny). The heavy group's declared purpose is SCALE
        # RATIOS, not session cold-start; medians over reps that
        # include one cold rep swing with page-cache luck (the r10
        # triangle median read 57.5 s vs r9's 27.5 on an unchanged
        # plan).
        for name in headline:
            try:
                run_noop(queries[name].fn(spark, sf_dir))
            except Exception as exc:  # pragma: no cover
                print(f"heavy target-SF warmup {name} failed: {exc}",
                      file=sys.stderr)

    # Per-query fault isolation: one broken query must never cost the
    # round its entire bench record (round-2 lesson — a single
    # AnalysisException produced rc=1 and zero numbers).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    repetitions: dict[str, list[float]] = {}
    gc_attrib: dict[str, list[int]] = {}
    gc_adjusted: dict[str, list[float]] = {}

    def gc_now() -> None:
        """See gc_drain — module-level since r10 so the block4000
        fresh-JVM mode shares the identical drain discipline."""
        gc_drain(spark)

    def timed(name, thunk, reps: int = 1, pre=None) -> None:
        walls = []
        gc_walls = []
        try:
            for _ in range(reps):
                if pre is not None:
                    pre()
                g0 = jvm_gc_ms(spark) if pre is not None else 0
                t0 = time.perf_counter()
                thunk()
                walls.append(round(time.perf_counter() - t0, 3))
                if pre is not None:
                    gc_walls.append(jvm_gc_ms(spark) - g0)
        except Exception as exc:
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench query {name} failed: {errors[name]}", file=sys.stderr)
            return
        timings[name] = sorted(walls)[len(walls) // 2]  # median
        if reps > 1:
            repetitions[name] = walls
        if gc_walls:
            # Committed per-rep in-rep GC time: the evidence that
            # adjudicates a slow rep as GC debt vs a real regression.
            gc_attrib[name] = gc_walls
            # gc-adjusted wall = wall − in-rep GC time: the compute
            # cost the operator would show on an executor whose heap
            # isn't carrying this session's allocation history.
            # Committed alongside raw walls + gc_ms as adjudication
            # evidence for outlier reps (SCALING.md, r8: the spread
            # bar is withdrawn — median is the declared bar).
            gc_adjusted[name] = [
                round(w - g / 1000.0, 3) for w, g in zip(walls, gc_walls)
            ]

    # Era-drift canary (VERDICT r6 #5): the same 5 queries timed once
    # at session START and once at session END of every bench run,
    # committed inside BENCH_r{N}. Headline totals have moved ±20%
    # round-over-round on untouched code; comparing canary_start
    # across rounds (same session position, same warm state) makes
    # environment-era drift measurable instead of inferred, and
    # end-vs-start within one run exposes in-session state decay
    # (heap/codegen-cache growth). The five span the engine's main
    # cost shapes: scan+agg, join+agg matmul, hash-groupBy dedup,
    # broadcast-crossJoin cosine top-k, and a streaming micro-batch.
    CANARY = ("pricing_summary", "matmul", "dedup_exact",
              "ann_brute_force_topk", "stream_tumbling_counts")

    def run_canary() -> dict[str, float]:
        out: dict[str, float] = {}
        for cname in CANARY:
            try:
                t0 = time.perf_counter()
                run_noop(queries[cname].fn(spark, sf_dir))
                out[cname] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # pragma: no cover
                out[cname] = -1.0
                print(f"canary {cname} failed: {exc}", file=sys.stderr)
        return out

    canary_start = run_canary()

    # Queries that moved >10% between r1 and r3 on untouched code —
    # n=1 evidence couldn't adjudicate whether the cost was real
    # (VERDICT r3 "What's wrong" #1-2). Median-of-3 settles it.
    REPEAT3 = {
        "ngram_jaccard_pairs",
        "matrix_gram",
        "matmul_sparse",
        "ann_brute_force_topk",  # +15% r3→r4 preview on untouched code
        # r5→r6: both crept >30% on untouched code with single reps —
        # medians decide drift vs noise (VERDICT r5 #6).
        "knn_graph_lsh",
        "pricing_summary",
        # r6: session noise (±0.5 s) exceeds any real delta at sf0.1
        # after the lane-packing change — record medians.
        "simhash_fingerprints",
    }

    # VERDICT r10 #3: the decode rungs' FIRST execution pays one-time
    # session costs — codec modules ship by value (cloudpickle) to all
    # 32 workers and the Arrow mapInPandas seam warms — which priced
    # adam7 at 10.32 s in the r10 driver record vs 0.91 s steady-state
    # (an 11× evidence error). Warm every multimodal headline query
    # once at sf0.01 (the validate protocol) so the timed reps measure
    # the plan, and record median-of-3 since their walls are ~1-2 s
    # where session noise exceeds real deltas.
    def is_codec(name: str) -> bool:
        """Queries that run the Arrow codec stages — including the
        streaming decode-at-ingest wrapper, which pays the identical
        first-execution costs (module ship-by-value + Arrow seam)
        under a different name prefix."""
        return name.startswith("multimodal_") or name == "stream_avc_ingest"

    if not heavy:
        for name in headline:
            if is_codec(name):
                try:
                    run_noop(queries[name].fn(spark, "/root/testdata/sf0.01"))
                except Exception as exc:  # pragma: no cover
                    print(f"multimodal warmup {name} failed: {exc}",
                          file=sys.stderr)

    for name in headline:
        timed(name, lambda name=name: run_noop(queries[name].fn(spark, sf_dir)),
              reps=3 if (heavy or name in REPEAT3 or is_codec(name)) else 1)

    # Reference-comparable dense matmul ladder — the exact sizes the
    # reference published (BASELINE.md: 3.0/6.2/27.8/35.5/46.1 s on
    # Cloud Functions; its NumPy VM oracle: 0.3-0.7 s).
    for n in ladder:
        a, b = gen_matrix(spark, n, seed=1), gen_matrix(spark, n, seed=2)
        timed(f"matmul_dense_{n}",
              lambda a=a, b=b: run_noop(a.multiply(b, exact=False).df),
              reps=3)

    # Beyond the reference's ladder: 1000×1000 dense via the SUMMA
    # block path (1e9 multiply-pairs — the entry-level join-agg plan
    # would materialize all of them; the block plan shuffles 4x4x4
    # block pairs and runs BLAS inside Arrow-native mapInArrow /
    # applyInArrow kernels, matrix/block.py).
    if not smoke and not heavy:
        # One UNTIMED warm rep per block entry before the timed reps
        # (JMH warmup-iteration discipline): the r7 validation run
        # measured first-rep walls of 3-4× the warm floor with LOW
        # gc_ms (36.8/41.5 s vs 9.0-13.8 s warm at 4000²) — that cost
        # is operator-level warm-up (JIT tiering on the pack/agg
        # codegen at full size, first-touch page cache on the
        # generated inputs), not heap debt, so the drain alone cannot
        # remove it and it does not represent the operator's
        # steady-state cost on a long-lived cluster.
        a, b = gen_matrix(spark, 1000, seed=3), gen_matrix(spark, 1000, seed=4)
        run_noop(block_multiply(a, b, block_size=250).df)
        timed("matmul_dense_1000_block",
              lambda: run_noop(block_multiply(a, b, block_size=250).df),
              reps=3, pre=gc_now)
        # 4000×4000 (6.4e10 multiply-pairs, 20x the reference's largest
        # published size squared) — the stress point where block-size /
        # shuffle behavior matters: an 8×8 block grid, 512 GEMM tasks,
        # and only block rows through every shuffle
        # (tests/test_plans.py::test_summa_block_plan_shuffles_block_rows_only).
        # Since r10 the reps are FRESH-JVM subprocesses collected
        # BEFORE this session existed (fresh_jvm_block4000_reps, run
        # at the top of main — VERDICT r9 #3): three rounds of drain +
        # interleaving never tamed the 2.5-10× in-session rep spread
        # because reps shared one heap era. Each child warms, drains,
        # and times exactly one rep; the per-child gc_ms stays the
        # adjudication evidence, and SCALING.md pins the fresh-JVM
        # spread bar (<1.5× across 3 reps).
        if block4000_walls and not block4000_err:
            timings["matmul_dense_4000_block"] = sorted(
                block4000_walls)[len(block4000_walls) // 2]
            repetitions["matmul_dense_4000_block"] = block4000_walls
            gc_attrib["matmul_dense_4000_block"] = block4000_gc
            gc_adjusted["matmul_dense_4000_block"] = [
                round(w - g / 1000.0, 3)
                for w, g in zip(block4000_walls, block4000_gc)
            ]
        if block4000_err:
            errors["matmul_dense_4000_block"] = block4000_err
            print(f"bench query matmul_dense_4000_block failed: "
                  f"{block4000_err}", file=sys.stderr)

    # NOTE: canary_end runs right after the gc_now-drained 1000² block
    # reps, so its end-vs-start delta reads "post-drain warm state",
    # not raw in-session decay — the heap-debt component of decay is
    # deliberately removed by the drain. Cross-ROUND comparison of
    # canary_start (pre-drain, same session position every round) is
    # the era-drift signal; end-vs-start is the post-drain warm bonus.
    canary_end = run_canary()

    # Reference-parity chart artifact (the reference's test.py plotted
    # MapReduce vs VM; we add our curve). Never let plotting break the
    # one-JSON-line stdout contract.
    if not heavy:
        try:
            from scripts.plot_bench import write_from_timings

            write_from_timings(
                timings,
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmark_comparison.svg"),
            )
        except Exception as exc:  # pragma: no cover
            print(f"plot generation failed: {exc}", file=sys.stderr)

    # Headline composition (VERDICT r8 #2): `value` EXCLUDES
    # matmul_dense_4000_block — its wall has shown 3-10× run-to-run
    # spread across JVM heap eras (adjudicated as environment, not
    # plan, by scripts/ab_4000_spread.py), so summing it would let one
    # heap era swing the 44-query headline by ±15%. Its median is
    # still committed per-query in `queries` (with raw reps + gc
    # evidence in the full record) and tracked against its own bar
    # (SCALING.md: driver-side median ≤60 s).
    EXCLUDED_FROM_VALUE = ("matmul_dense_4000_block",)
    total = round(
        sum(v for k, v in timings.items() if k not in EXCLUDED_FROM_VALUE), 3)
    # Group split (VERDICT r11 #8): the codec-ladder rungs each add
    # 2-6 s of REAL decode work to every bench run, so the single
    # headline sum increasingly mixes two different cost stories.
    # `groups` splits `value` into core (relational/dedup/ANN/text
    # engine queries) vs ladder (the Arrow codec rungs, is_codec())
    # so cross-round drift reads per group; ab_* drift tooling and
    # the contract tests consume this split.
    groups = {
        "core": round(
            sum(v for k, v in timings.items()
                if k not in EXCLUDED_FROM_VALUE and not is_codec(k)), 3),
        "ladder": round(
            sum(v for k, v in timings.items()
                if k not in EXCLUDED_FROM_VALUE and is_codec(k)), 3),
    }
    record = {
        "metric": "heavy_scale_queries_total_wall" if heavy
        else "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        # ADVICE r9: `value` excludes the unstable 4000² block since
        # r9 while r1-r8 records included it — emit the all-inclusive
        # sum too so cross-round tooling compares like with like.
        "value_with_excluded": round(sum(timings.values()), 3),
        "groups": groups,
        "queries": timings,
        "sf": sf,
        "excluded_from_value": [
            k for k in EXCLUDED_FROM_VALUE if k in timings],
        # Same-position runs of the same 5 queries at session start and
        # end: cross-ROUND comparison of "start" (or "end") isolates
        # era drift; end-vs-start within this run shows session decay.
        "canary": {"start": canary_start, "end": canary_end},
    }
    if repetitions:
        # Raw per-repetition walls for the median-of-3 queries — the
        # committed evidence that adjudicates round-over-round deltas.
        record["repetitions"] = repetitions
        # Per-query max/median rep spread (VERDICT r12 #2/#4): the r12
        # driver runs carried host-steal stalls (single reps of 28-143 s
        # beside 2-4 s neighbours) that PERF could not distinguish from
        # code regressions. A spread ≥~3 marks that query's median as
        # era-contaminated evidence.
        record["rep_spread"] = {
            n: round(max(w) / max(sorted(w)[len(w) // 2], 1e-9), 2)
            for n, w in repetitions.items()
        }
    if gc_attrib:
        # Per-rep in-rep JVM GC milliseconds for the gc-hygiene'd
        # entries (the block matmuls): a slow rep with high gc_ms is
        # heap debt, not a plan regression (r7 adjudication protocol).
        record["gc_ms"] = gc_attrib
        # wall − gc_ms/1000 per rep: outlier-rep adjudication evidence
        # (SCALING.md 4000² protocol; the declared bar is the median).
        record["gc_adjusted_walls"] = gc_adjusted
    if block4000_walls:
        # Fresh-JVM isolation evidence (VERDICT r9 #3): per-rep walls
        # + gc_ms already live in repetitions/gc_ms; the spread here
        # is the number SCALING.md's <1.5× bar reads.
        record["block4000"] = {
            "isolation": "fresh_jvm_per_rep",
            "spread": round(max(block4000_walls) / min(block4000_walls), 2),
        }
    if errors:
        # A partial total is not comparable across rounds — flag it so
        # downstream consumers can't mistake it for a full run.
        record["errors"] = errors
        record["partial"] = True

    # Two-tier emission (VERDICT r8 #1): the driver captures only a
    # 2000-char TAIL of merged stdout+stderr, so the r8 full record
    # (~2.2 KB with canary/reps/gc) had its head truncated —
    # parsed:null two rounds running. The FULL record (all evidence)
    # goes to a file artifact; stdout gets a COMPACT line — per-query
    # medians rounded to 2 dp, no canary/reps/gc — measured ~1.3 KB at
    # 44 queries and pinned <1900 chars by tests/test_bench_contract.py.
    # ADVICE r9: suffix the default artifact name with mode+sf so a
    # heavy/smoke run can't silently overwrite the headline evidence
    # that an earlier compact record's full_record pointer references.
    mode = "heavy" if heavy else ("smoke" if smoke else "headline")
    full_out = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_artifacts", f"bench_full_{mode}_sf{sf}.json"),
    )
    try:
        os.makedirs(os.path.dirname(full_out), exist_ok=True)
        with open(full_out, "w") as fh:
            json.dump(record, fh, indent=1)
            fh.write("\n")
    except Exception as exc:  # pragma: no cover
        print(f"full-record write failed (non-fatal): {exc}", file=sys.stderr)

    # Compact-line dieting (r11): the headline grew to 58 queries and
    # the worst-case projection (999.99 s values) crossed the 1900-char
    # budget of the driver's 2000-char tail window. Second diet at 62
    # queries (wave 7): n_queries (derivable: len(queries)) and the
    # full_record pointer (a FIXED convention —
    # bench_artifacts/bench_full_<mode>_sf<sf>.json; run_heavy_scale
    # and the contract tests resolve it by convention) left the line
    # too. The compact line is now EXACTLY the driver contract
    # (metric/value/unit/queries/sf); value_with_excluded,
    # excluded_from_value, canaries, repetitions and 3-dp timings all
    # live in the full-record artifact. Query values round to 1 dp —
    # the compact record is the cross-round headline ledger, not the
    # adjudication evidence.
    # THIRD diet (r12 REVISED): the driver contract forbids REMOVING
    # entries from `queries` — BENCH_r11's line carried every codec
    # rung, so the mid-r12 "core-only" line would have dropped 22
    # committed entries (a contract regression, caught before any
    # driver run consumed it). The line carries ALL queries again;
    # the chars come out of the r11-added `groups` sums instead,
    # which move to the full record (bench_artifacts/bench_full_
    # <mode>_sf<sf>.json, the fixed convention the drift tooling
    # reads). Worst-case projection at 66 entries, every value 99.9:
    # 1916 chars + the 22-char r13 canary pair = ~1938 < 1950 budget <
    # the driver's 2000-char tail window (a single query ≥100 s would
    # be a failed round regardless). compact_line() owns the
    # degradation ladder beyond that (canary first, queries last).
    compact = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": "sec",
        "queries": {k: round(v, 1) for k, v in timings.items()},
        "sf": sf,
        # Stall discriminator (VERDICT r12 #2): pricing_summary's wall
        # at session start and end (~22 chars). Cross-round, the start
        # value isolates environment-era drift from code; within one
        # run, end≫start or start≫end flags host-steal contamination of
        # THIS record. Full 5-query canary pairs stay in the artifact.
        "canary": [
            round(canary_start.get("pricing_summary", -1.0), 2),
            round(canary_end.get("pricing_summary", -1.0), 2),
        ],
    }
    if errors:
        compact["partial"] = True
        compact["n_errors"] = len(errors)
    line = compact_line(compact)

    # Quiesce the session BEFORE emitting the one-JSON-line record
    # (VERDICT r7 #1): the r7 canary ends on a real streaming query
    # (stream_tumbling_counts) whose HDFS state-store maintenance
    # thread races JVM shutdown — its "RpcEnv already stopped" unload
    # noise landed AFTER the JSON line in the driver's captured
    # stream, so BENCH_r07 recorded parsed:null. Order matters:
    #  1. stop any still-active streaming queries,
    #  2. StateStore.stop() — unloads every loaded provider and stops
    #     the maintenance pool while the RpcEnv is still up (the exact
    #     thread that produced r7's post-JSON noise),
    #  3. spark.stop() + a grace sleep so all remaining JVM shutdown
    #     chatter flushes to the captured stream first,
    # then print. Pinned by tests/test_bench_contract.py::
    # test_last_combined_output_line_is_the_json_record, which runs
    # this harness with stderr merged into stdout (the driver's view)
    # and asserts the LAST line parses.
    try:
        for q in spark.streams.active:
            q.stop()
        spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    except Exception as exc:  # pragma: no cover
        print(f"state-store quiesce failed (non-fatal): {exc}", file=sys.stderr)
    spark.stop()
    time.sleep(2.0)
    sys.stderr.flush()
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
