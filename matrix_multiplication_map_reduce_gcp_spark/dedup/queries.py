"""Registry entries for every dedup operator, each with its DuckDB
oracle (SURVEY.md §2.3 north-star rows)."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.portable_hash import hash32, md5_hex, sql_hash32
from ..functions.vectors import as_double_array, sql_cosine_rounded
from ..similarity.lsh import sql_bucket_expr
from ..registry import query
from .clusters import sql_components_ctes
from .jaccard import (
    containment_pairs,
    jaccard_pairs,
    sql_containment_pairs,
    sql_jaccard_pairs,
)
from .minhash import (
    candidate_pairs,
    lsh_bands,
    minhash_signatures,
    sql_band_selects,
    sql_candidate_pairs,
    sql_minhash_signatures,
)
from .simhash import hamming_pairs_banded, simhash, sql_hamming_pairs, sql_simhash


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content, keep the smallest id.
    One shuffle on the hash — the canonical 100 TB dedup shape."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies")
    )


@query("minhash_signatures", oracle=sql_minhash_signatures())
def minhash_signatures_q(spark, sf_dir):
    """Per-doc MinHash signature (8 portable seeded hashes)."""
    return minhash_signatures(load_table(spark, sf_dir, "documents"))


@query("minhash_lsh_pairs", oracle=sql_candidate_pairs())
def minhash_lsh_pairs(spark, sf_dir):
    """Banded-LSH candidate near-dup pairs (4 bands × 2 hashes)."""
    return candidate_pairs(load_table(spark, sf_dir, "documents"))


@query("simhash_fingerprints", oracle=sql_simhash())
def simhash_fingerprints(spark, sf_dir):
    """60-bit SimHash per document (integer-exact, portable hash;
    width sized for 15-bit pigeonhole bands — see dedup/simhash.py)."""
    return simhash(load_table(spark, sf_dir, "documents"))


@query("simhash_near_dup_pairs", oracle=sql_hamming_pairs())
def simhash_near_dup_pairs(spark, sf_dir):
    """SimHash near-dup pairs (Hamming ≤ 3) via EXACT pigeonhole
    banding: 4 equi-joins on fingerprint bands replace the n² cross
    product; candidates verified by true bit_count distance. The
    oracle is the all-pairs formulation — equality is the proof."""
    fp = simhash(load_table(spark, sf_dir, "documents"))
    return hamming_pairs_banded(fp, max_dist=3)


@query("ngram_jaccard_pairs", oracle=sql_jaccard_pairs())
def ngram_jaccard_pairs(spark, sf_dir):
    """Exact 3-gram Jaccard over same-(lang,source) blocked pairs."""
    return jaccard_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {sql_components_ctes(sql_candidate_pairs())}
    SELECT doc_id, cluster_id FROM comp
    """,
)
def dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERS: connected components over the MinHash-LSH
    pair graph via iterative min-label propagation (driver loop, one
    join+agg per round). The recursive-CTE oracle computes the same
    unique fixpoint."""
    from .clusters import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = candidate_pairs(docs)
    return connected_components(pairs, docs.select("doc_id"))


@query(
    "dedup_keep_list",
    oracle=f"""
    WITH RECURSIVE {sql_components_ctes(sql_candidate_pairs())}
    SELECT doc_id FROM comp WHERE doc_id = cluster_id
    """,
)
def dedup_keep_list(spark, sf_dir):
    """The end-to-end dedup DECISION: one representative (smallest id)
    kept per near-dup cluster, all other cluster members dropped —
    what a training-data pipeline actually joins against before
    tokenization."""
    from .clusters import connected_components

    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components(candidate_pairs(docs), docs.select("doc_id"))
    return comp.filter(F.col("doc_id") == F.col("cluster_id")).select("doc_id")


@query(
    "stratified_sample_balanced",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents)
    SELECT lang, doc_id FROM ranked WHERE rn <= 50
    """,
)
def stratified_sample_balanced(spark, sf_dir):
    """Deterministic stratified downsampling: at most 50 docs per
    language, chosen by md5(doc_id) order — a reproducible 'random'
    sample (portable hash as the shuffle key) for corpus balancing;
    `sampleBy` would be engine-/partitioning-dependent."""
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(md5_hex(F.col("doc_id")), "doc_id")
    return (
        d.select("lang", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
        .drop("rn")
    )


# Shared CTE text: SRP band generation (ids only), reused by the full
# query's oracle and the capped variant's so the banding can't drift.
_EMB_BAND_CTES = f"""bkt AS (
      SELECT vec_id, label, embedding,
             {sql_bucket_expr('embedding')} AS bucket
      FROM embeddings),
    bands AS (
      SELECT vec_id, label, bucket, r.i AS band_idx,
             (bucket >> (2 * CAST(r.i AS INTEGER))) & 3 AS band_val
      FROM bkt, UNNEST(range(0, 4)) AS r(i))"""

# Full pipeline: banded candidates + exact-cosine scoring.
_EMB_SCORED_CTES = f"""{_EMB_BAND_CTES},
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bands a JOIN bands b
        ON a.label = b.label AND a.band_idx = b.band_idx
       AND a.band_val = b.band_val AND a.vec_id < b.vec_id),
    scored AS (
      SELECT c.vec_a, c.vec_b,
             {sql_cosine_rounded('ea.embedding', 'eb.embedding')} AS cos_sim
      FROM cand c JOIN embeddings ea ON c.vec_a = ea.vec_id
                  JOIN embeddings eb ON c.vec_b = eb.vec_id
      WHERE {sql_cosine_rounded('ea.embedding', 'eb.embedding')} >= 0.35)"""


@query(
    "embedding_near_dup_pairs",
    exact_baseline=True,
    oracle=f"""
    WITH {_EMB_SCORED_CTES}
    SELECT vec_a, vec_b, cos_sim FROM scored
    """,
)
def embedding_near_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup AUDIT baseline (emits EVERY pair —
    quadratic in duplicate-cluster size by contract; the crawl-scale
    production default is embedding_near_dup_pairs_capped), blocked by
    (label, SRP-LSH band). A label-only self-join is O(n²/|labels|)
    on a 10⁹-vector corpus; instead each vector's 8-bit
    sign-random-projection bucket is split into 4 bands of 2 planes,
    and candidates must agree on label AND at least one band (the
    equi-join on (label, band_idx, band_val) realizes the OR over
    bands). Candidate volume tracks real neighborhood density, never
    the block size. Exact rounded cosine then verifies candidates
    against the 0.35 floor.

    Recall: P(2-plane band agrees) = (1-θ/π)²; missing all 4 bands at
    cos=0.9 is <2%, and →0 as cos→1 — near-exact where near-dups
    live, pinned by test_dedup_similarity.py. The oracle mirrors the
    banding bit-for-bit, so the gate checks the whole pipeline."""
    e, pairs = _emb_band_pair_stream(spark, sf_dir)
    return _emb_verify_cosine(e, pairs.distinct())


def _emb_bands(spark, sf_dir):
    """(embeddings table, banded id stream): one row per (vector,
    band) with the vector's FULL bucket kept alongside — ids only.
    The 512-byte embedding arrays never enter the band explode, the
    candidate generation, or any shuffle downstream of it; vectors
    join back once per SURVIVING candidate pair. At 10^9 vectors this
    is the difference between shuffling ids and shuffling the corpus
    x bands twice."""
    from ..similarity.lsh import bucket_arrow

    e = load_table(spark, sf_dir, "embeddings")
    v = as_double_array("embedding")
    bkt = e.select("vec_id", "label", bucket_arrow(v).alias("bucket"))
    bands = bkt.select(
        "vec_id",
        "label",
        "bucket",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), "
                "i -> struct(i AS band_idx, shiftright(bucket, 2 * i) & 3 AS band_val))"
            )
        ).alias("bd"),
    ).select("vec_id", "label", "bucket", "bd.band_idx", "bd.band_val")
    return e, bands


def _emb_band_pair_stream(spark, sf_dir):
    """(embeddings table, raw banded candidate stream): one (vec_a,
    vec_b) row per shared (label, band) — the full equi-join, exact
    within the banding but quadratic in duplicate-cluster size."""
    e, bands = _emb_bands(spark, sf_dir)
    a = bands.select(
        F.col("vec_id").alias("vec_a"), "label", "band_idx", "band_val"
    )
    b = bands.select(
        F.col("vec_id").alias("vec_b"), "label", "band_idx", "band_val"
    )
    pairs = (
        a.join(b, ["label", "band_idx", "band_val"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
    )
    return e, pairs


def _emb_verify_cosine(e, cand):
    """Join both endpoints' vectors onto the candidate id pairs and
    keep those at or above the 0.35 exact-rounded-cosine floor. The
    cosine runs in the Arrow/NumPy kernel (bit-identical to the fold —
    tests/test_vectors_arrow.py): the verify is the dominant per-
    candidate cost, profiled at ~0.3 ms/pair in interpreted folds."""
    from ..functions.vectors import cosine_rounded_arrow

    v = as_double_array("embedding")
    va = e.select(F.col("vec_id").alias("vec_a"), v.alias("va"))
    vb = e.select(F.col("vec_id").alias("vec_b"), v.alias("vb"))
    cos = cosine_rounded_arrow(F.col("va"), F.col("vb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= 0.35)
    )


PAIR_TOP_K = 4  # per-doc neighbor budget for the capped pair variants
EMB_CAND_CAP = 8  # coarse per-vector candidate budget (by shared bands)
EMB_SN_WINDOW = 8  # sorted-neighborhood width inside each band bucket


def _sn_neighbors(df, part_cols, order_cols, width, lead_cols, keep_cols):
    """Sorted-neighborhood expansion — the linear candidate generator
    all three windowed-blocking variants share (embedding capped,
    levenshtein capped, sorted_neighborhood_pairs): each row pairs
    with its next ``width`` sort neighbors INSIDE its ``part_cols``
    block via lead() windows (never a self-join), emitting
    ``keep_cols`` plus a neighbor struct ``p`` carrying the lead of
    each ``lead_cols``; block-tail rows with no neighbor in a slot
    are dropped. One window sort per block, m·width candidates per
    block of m — the m² → m·w bound. Window exprs are not allowed
    inside generators, so the leads materialize as columns first,
    then one explode. Sort keys are pinned ASC NULLS LAST: Spark's
    default orderBy puts NULLs FIRST while DuckDB's ROW_NUMBER puts
    them LAST, so a NULL sort key (NULL text head, NULL bucket) would
    silently shift every neighbor in the partition and diverge the
    candidate sets across engines (r6 ADVICE) — the mirrored oracles
    say NULLS LAST explicitly."""
    w = W.partitionBy(*part_cols).orderBy(
        *[F.asc_nulls_last(c) for c in order_cols]
    )
    led = df
    for off in range(1, width + 1):
        for c in lead_cols:
            led = led.withColumn(f"__sn_{c}_{off}", F.lead(c, off).over(w))
    nbrs = F.array(
        *[
            F.struct(
                *[F.col(f"__sn_{c}_{off}").alias(c) for c in lead_cols]
            )
            for off in range(1, width + 1)
        ]
    )
    return led.select(*keep_cols, F.explode(nbrs).alias("p")).filter(
        F.col(f"p.{lead_cols[0]}").isNotNull()
    )


def _top_k_per_endpoint(pairs, id_a: str, id_b: str, val: str, best_first,
                        k: int = PAIR_TOP_K):
    """Keep a pair iff it ranks within EITHER endpoint's top-``k`` by
    ``val`` (OR-semantics keeps recall high — a hub doc can exhaust
    its own budget yet still be reported by its neighbors). One
    explode to both orientations, one window per endpoint over its
    candidate list, canonicalize + distinct. Output is ≤ k·n rows
    regardless of how duplicate-heavy the corpus is. Used twice by the
    capped variants: as a coarse CANDIDATE cap on id-only rows (cheap
    — the window never sees vectors or text), then as the final
    neighbor budget after exact verification."""
    pair = F.explode(
        F.array(
            F.struct(F.col(id_a).alias("d"), F.col(id_b).alias("o")),
            F.struct(F.col(id_b).alias("d"), F.col(id_a).alias("o")),
        )
    ).alias("p")
    oriented = pairs.select(pair, val).select("p.d", "p.o", val)
    w = W.partitionBy("d").orderBy(best_first(val), "o")
    return (
        oriented.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.least("d", "o").alias(id_a),
            F.greatest("d", "o").alias(id_b),
            val,
        )
        .distinct()
    )


def _sql_top_k_per_endpoint(
    id_a: str, id_b: str, val: str, direction: str,
    k: int = PAIR_TOP_K, src: str = "scored", prefix: str = "",
    out: str | None = None,
) -> str:
    """DuckDB CTE-body mirror of ``_top_k_per_endpoint`` over the CTE
    named ``src`` — UNION ALL to both orientations, ROW_NUMBER per
    endpoint, canonicalize + DISTINCT. With ``out=None`` it ends with
    a bare SELECT closing the ``WITH`` chain; with ``out`` set, the
    final select becomes one more flat CTE named ``out`` so the chain
    can continue (CTEs cannot nest — pass ``prefix`` to disambiguate
    the intermediates when used twice in one query)."""
    final = (
        f"SELECT DISTINCT LEAST(d, o) AS {id_a}, GREATEST(d, o) AS {id_b}, "
        f"{val}\n    FROM {prefix}ranked WHERE rn <= {k}"
    )
    closing = final if out is None else f"{out} AS (\n    {final})"
    sep = ",\n    " if out is not None else "\n    "
    return f"""{prefix}oriented AS (
      SELECT {id_a} AS d, {id_b} AS o, {val} FROM {src}
      UNION ALL
      SELECT {id_b} AS d, {id_a} AS o, {val} FROM {src}),
    {prefix}ranked AS (
      SELECT d, o, {val},
             ROW_NUMBER() OVER (PARTITION BY d
                                ORDER BY {val} {direction}, o) AS rn
      FROM {prefix}oriented){sep}{closing}"""


@query(
    "embedding_near_dup_pairs_capped",
    oracle=f"""
    WITH {_EMB_BAND_CTES},
    nb AS (
      SELECT vec_id, label, band_idx, band_val,
             ROW_NUMBER() OVER (PARTITION BY label, band_idx, band_val
                                ORDER BY bucket NULLS LAST,
                                         vec_id NULLS LAST) AS rn
      FROM bands),
    sn AS (
      SELECT LEAST(a.vec_id, b.vec_id) AS vec_a,
             GREATEST(a.vec_id, b.vec_id) AS vec_b
      FROM nb a JOIN nb b
        ON a.label = b.label AND a.band_idx = b.band_idx
       AND a.band_val = b.band_val
       AND b.rn BETWEEN a.rn + 1 AND a.rn + {EMB_SN_WINDOW}),
    cand AS (
      SELECT vec_a, vec_b, CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM sn GROUP BY 1, 2),
    {_sql_top_k_per_endpoint('vec_a', 'vec_b', 'n_shared', 'DESC',
                             k=EMB_CAND_CAP, src='cand', prefix='c_',
                             out='coarse')},
    scored AS (
      SELECT c.vec_a, c.vec_b,
             {sql_cosine_rounded('ea.embedding', 'eb.embedding')} AS cos_sim
      FROM coarse c JOIN embeddings ea ON c.vec_a = ea.vec_id
                    JOIN embeddings eb ON c.vec_b = eb.vec_id
      WHERE {sql_cosine_rounded('ea.embedding', 'eb.embedding')} >= 0.35),
    {_sql_top_k_per_endpoint('vec_a', 'vec_b', 'cos_sim', 'DESC')}
    """,
)
def embedding_near_dup_pairs_capped(spark, sf_dir):
    """PRODUCTION DEFAULT for crawl-scale embedding dedup:
    embedding_near_dup_pairs with bounded WORK, not just bounded
    emit. The full variant's band self-join is quadratic in duplicate-
    cluster size (a cluster of g identical vectors shares every band
    bucket, so each bucket contributes g²/2 candidate rows — profiled
    at 13.7M candidate pairs on the 10x fixture). Here candidates come
    from a sorted neighborhood INSIDE each band bucket: members sort
    by (full 8-bit bucket, vec_id) and pair only with their next
    {EMB_SN_WINDOW} sort neighbors, so the raw stream is ≤
    4·{EMB_SN_WINDOW}·n rows no matter how duplicate-heavy the corpus
    is. Ordering by the FULL bucket keeps recall where it matters:
    exact/near-exact duplicates share all 8 bucket bits, sort
    contiguously inside every band bucket, and chain through the
    window. Candidates are then capped per vector at {EMB_CAND_CAP}
    by shared-band count (strongest coarse signal first) before the
    exact-cosine verify — an interpreted 64-dim fold per pair, the
    dominant per-candidate cost — and finally budgeted at
    {PAIR_TOP_K} neighbors per vector by cosine. Recall tradeoff:
    within a duplicate cluster of size g, pair recall ≈ min(1,
    k/(g-1)) while CLUSTER recall (≥1 surviving pair per true
    cluster, what connected-components dedup actually needs) stays
    1.0 via window chaining (tests/test_quality_gates.py pins it)."""
    e, bands = _emb_bands(spark, sf_dir)
    sn = _sn_neighbors(
        bands,
        part_cols=("label", "band_idx", "band_val"),
        order_cols=("bucket", "vec_id"),
        width=EMB_SN_WINDOW,
        lead_cols=("vec_id",),
        keep_cols=("vec_id",),
    ).select(
        F.least("vec_id", "p.vec_id").alias("vec_a"),
        F.greatest("vec_id", "p.vec_id").alias("vec_b"),
    )
    cand = sn.groupBy("vec_a", "vec_b").agg(F.count("*").alias("n_shared"))
    coarse = _top_k_per_endpoint(
        cand, "vec_a", "vec_b", "n_shared", F.desc, k=EMB_CAND_CAP
    ).drop("n_shared")
    scored = _emb_verify_cosine(e, coarse)
    return _top_k_per_endpoint(scored, "vec_a", "vec_b", "cos_sim", F.desc)


LEV_PREFIX = 80  # edit distance computed on this prefix (cost cap)
LEV_MAX = 40
LEN_BUCKET = 16


# Shared CTE text for the levenshtein family (full + capped oracles).
_LEV_SCORED_CTES = f"""d AS (
      SELECT doc_id, lang, n_chars // {LEN_BUCKET} AS len_bucket,
             substr(text, 1, {LEV_PREFIX}) AS head
      FROM documents),
    scored AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_distance
      FROM d a JOIN d b
        ON a.lang = b.lang AND a.len_bucket = b.len_bucket
       AND a.doc_id < b.doc_id
      WHERE levenshtein(a.head, b.head) <= {LEV_MAX})"""


@query(
    "levenshtein_near_dup_pairs",
    exact_baseline=True,
    oracle=f"""
    WITH {_LEV_SCORED_CTES}
    SELECT doc_a, doc_b, edit_distance FROM scored
    """,
)
def levenshtein_near_dup_pairs(spark, sf_dir):
    """Edit-distance near-dup AUDIT baseline (emits every qualifying
    pair — quadratic per block by contract; the crawl-scale production
    default is levenshtein_near_dup_pairs_capped): pairs within the
    same (lang, length-bucket) block whose {LEV_PREFIX}-char prefixes are
    within {LEV_MAX} edits. Levenshtein is an exact integer in both
    engines, so every emitted distance is hash-checked. Scale shape:
    the self-join is blocked on (lang, floor(n_chars/{LEN_BUCKET})) —
    near-dups rarely differ much in length, so blocks stay dense in
    true pairs while bounding the quadratic term; the prefix cap
    bounds each comparison at O({LEV_PREFIX}^2) independent of
    document size. The cheap md5/minhash passes run first at 100 TB;
    this is the precise verifier on their candidate buckets."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / LEN_BUCKET).cast("bigint").alias("len_bucket"),
        F.substring("text", 1, LEV_PREFIX).alias("head"),
    )
    # Explicit co-partitioning on the block key, at a FIXED partition
    # count: the join INPUT is byte-small (80-char heads), so AQE's
    # byte-based coalescing would fold the shuffle to ~1 partition —
    # but the join OUTPUT is quadratic per block and the levenshtein
    # runs on the joined pairs, so the explosion would land on one
    # task (measured at 10x scale: minutes on 1 task vs seconds wide).
    # A user-specified repartition count is exempt from coalescing,
    # and both sides sharing it means the join reuses the exchange.
    n_part = spark.sparkContext.defaultParallelism * 4
    d = d.repartition(n_part, "lang", "len_bucket")
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        "len_bucket",
        F.col("head").alias("head_a"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        "lang",
        "len_bucket",
        F.col("head").alias("head_b"),
    )
    dist = F.levenshtein("head_a", "head_b")
    return (
        a.join(b, ["lang", "len_bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(dist <= LEV_MAX)
        .select("doc_a", "doc_b", dist.cast("bigint").alias("edit_distance"))
    )


LEV_SN_WINDOW = 8  # sorted-neighborhood width for the capped variant


@query(
    "levenshtein_near_dup_pairs_capped",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, n_chars // {LEN_BUCKET} AS len_bucket,
             substr(text, 1, {LEV_PREFIX}) AS head
      FROM documents),
    nb AS (
      SELECT doc_id, lang, len_bucket, head,
             ROW_NUMBER() OVER (PARTITION BY lang, len_bucket
                                ORDER BY head NULLS LAST,
                                         doc_id NULLS LAST) AS rn
      FROM d),
    scored AS (
      SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
             GREATEST(a.doc_id, b.doc_id) AS doc_b,
             CAST(levenshtein(a.head, b.head) AS BIGINT) AS edit_distance
      FROM nb a JOIN nb b
        ON a.lang = b.lang AND a.len_bucket = b.len_bucket
       AND b.rn BETWEEN a.rn + 1 AND a.rn + {LEV_SN_WINDOW}
      WHERE levenshtein(a.head, b.head) <= {LEV_MAX}),
    {_sql_top_k_per_endpoint('doc_a', 'doc_b', 'edit_distance', 'ASC')}
    """,
)
def levenshtein_near_dup_pairs_capped(spark, sf_dir):
    """PRODUCTION DEFAULT for crawl-scale edit-distance dedup:
    levenshtein_near_dup_pairs with bounded WORK and bounded emit.
    The full variant's cost is the quadratic per-block levenshtein —
    every pair in a (lang, len_bucket) block is compared, so planted
    duplicate clusters multiply wall by cluster_size² (measured 68x at
    10x data). Here candidates come from a sorted neighborhood INSIDE
    each block: docs sort by ({LEV_PREFIX}-char prefix, doc_id) and
    pair only with their next {LEV_SN_WINDOW} sort neighbors —
    identical/near-identical prefixes sort adjacent, so true near-dups
    stay candidates while comparisons drop from m² to m·{LEV_SN_WINDOW}
    per block. Exact edit distance verifies candidates; the final
    {PAIR_TOP_K}-per-endpoint budget (lowest distance first) bounds
    the emit. CLUSTER recall on planted duplicates stays 1.0 — members
    share a prefix, sort contiguously, and chain through the window
    (tests/test_quality_gates.py pins recall + connectivity)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("n_chars") / LEN_BUCKET).cast("bigint").alias("len_bucket"),
        F.substring("text", 1, LEV_PREFIX).alias("head"),
    )
    dist = F.levenshtein("head", F.col("p.head"))
    scored = (
        _sn_neighbors(
            d,
            part_cols=("lang", "len_bucket"),
            order_cols=("head", "doc_id"),
            width=LEV_SN_WINDOW,
            lead_cols=("doc_id", "head"),
            keep_cols=("doc_id", "head"),
        )
        .filter(dist <= LEV_MAX)
        .select(
            F.least("doc_id", "p.doc_id").alias("doc_a"),
            F.greatest("doc_id", "p.doc_id").alias("doc_b"),
            dist.cast("bigint").alias("edit_distance"),
        )
    )
    return _top_k_per_endpoint(
        scored, "doc_a", "doc_b", "edit_distance", F.asc
    )


@query(
    "dedup_cluster_size_histogram",
    oracle=f"""
    WITH RECURSIVE {sql_components_ctes(sql_candidate_pairs())},
    sizes AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM comp GROUP BY 1)
    SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY 1
    """,
)
def dedup_cluster_size_histogram(spark, sf_dir):
    """Duplication-profile histogram: how many near-dup clusters exist
    at each size (and the doc mass they hold) — the one-glance answer
    to 'how duplicated is this corpus', and the number that predicts
    dedup's token savings. Two tiny aggregates on top of the connected
    components; singleton clusters dominate by design."""
    from .clusters import connected_components

    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components(candidate_pairs(docs), docs.select("doc_id"))
    sizes = comp.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        (F.col("cluster_size") * F.count("*")).alias("n_docs"),
    )


SN_PREFIX = 40  # sort-key prefix length
SN_WINDOW = 3  # each doc pairs with the next SN_WINDOW-1 neighbors


@query(
    "sorted_neighborhood_pairs",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang, source, substr(text, 1, {SN_PREFIX}) AS head
      FROM documents),
    nb AS (
      SELECT lang, source, doc_id, head,
             LEAD(doc_id, 1) OVER w AS n1, LEAD(head, 1) OVER w AS h1,
             LEAD(doc_id, 2) OVER w AS n2, LEAD(head, 2) OVER w AS h2
      FROM d WINDOW w AS (PARTITION BY lang, source
                          ORDER BY head NULLS LAST, doc_id NULLS LAST)),
    pairs AS (
      SELECT lang, source, doc_id, head, n1 AS nbr, h1 AS nbr_head
      FROM nb WHERE n1 IS NOT NULL
      UNION ALL
      SELECT lang, source, doc_id, head, n2, h2
      FROM nb WHERE n2 IS NOT NULL)
    SELECT lang, source,
           LEAST(doc_id, nbr) AS doc_a, GREATEST(doc_id, nbr) AS doc_b,
           CAST(levenshtein(head, nbr_head) AS BIGINT) AS head_edit_distance
    FROM pairs
    """,
)
def sorted_neighborhood_pairs(spark, sf_dir):
    """Sorted-neighborhood dedup blocking: docs sorted by a
    {SN_PREFIX}-char prefix key within each (lang, source) block pair
    with their next {SN_WINDOW - 1} sort neighbors; each candidate is
    verified by the exact prefix edit distance. The classic
    complement to hash blocking — near-dups with small leading edits
    sort adjacently even when their md5/minhash buckets differ.

    Scale shape: one window sort per (lang, source) partition and a
    LINEAR candidate count (w-1 pairs per doc, never quadratic in the
    block). At 100 TB the window runs per-partition after a shuffle
    on the block key; no self-join materializes. A global (unkeyed)
    sort would be the scale-killer variant — blocking on (lang,
    source) keeps every window partition-local."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        F.substring("text", 1, SN_PREFIX).alias("head"),
    )
    return _sn_neighbors(
        d,
        part_cols=("lang", "source"),
        order_cols=("head", "doc_id"),
        width=SN_WINDOW - 1,
        lead_cols=("doc_id", "head"),
        keep_cols=("lang", "source", "doc_id", "head"),
    ).select(
        "lang",
        "source",
        F.least("doc_id", "p.doc_id").alias("doc_a"),
        F.greatest("doc_id", "p.doc_id").alias("doc_b"),
        F.levenshtein("head", F.col("p.head"))
        .cast("bigint")
        .alias("head_edit_distance"),
    )


# ---- Incremental (batch-vs-index) dedup -----------------------------------

BATCH_MOD = 5  # doc_id % 5 == 0 plays the incoming increment (~20%)


@query(
    "dedup_incremental_lsh",
    oracle=f"""
    WITH sig AS ({sql_minhash_signatures()}),
    bands AS ({sql_band_selects()}),
    batchb AS (SELECT * FROM bands WHERE doc_id % {BATCH_MOD} = 0),
    indexb AS (SELECT * FROM bands WHERE doc_id % {BATCH_MOD} <> 0),
    m AS (
      SELECT b.doc_id,
             COUNT(DISTINCT i.doc_id) AS n_index_matches,
             MIN(i.doc_id) AS first_match_id
      FROM batchb b JOIN indexb i ON b.band = i.band AND b.sig = i.sig
      GROUP BY 1)
    SELECT d.doc_id,
           COALESCE(m.n_index_matches, 0) AS n_index_matches,
           m.first_match_id,
           CASE WHEN m.doc_id IS NOT NULL THEN 'dup' ELSE 'new' END AS verdict
    FROM (SELECT doc_id FROM documents WHERE doc_id % {BATCH_MOD} = 0) d
    LEFT JOIN m ON d.doc_id = m.doc_id
    """,
)
def dedup_incremental_lsh(spark, sf_dir):
    """Incremental dedup: an incoming BATCH (doc_id % 5 == 0, ~20%)
    checked against the existing corpus INDEX (the rest) — the shape
    a production pipeline actually runs daily, where every other
    dedup query here is the one-off whole-corpus self-join. Each
    batch doc gets (n_index_matches, first_match_id, verdict
    'dup'/'new') from a banded-LSH equi-join of batch band rows
    against index band rows.

    Scale shape (100 TB corpus + daily increment): the index band
    table is write-once and bucketed by (band, sig); the daily job
    shingles/minhashes ONLY the increment (map-only over new docs)
    and equi-joins the bucketed index — cost scales with increment
    size + collision count, and the corpus raw text is never
    re-touched. Here both sides derive from `documents` so the DuckDB
    oracle can replay the split exactly."""
    docs = load_table(spark, sf_dir, "documents")
    bands = lsh_bands(minhash_signatures(docs))
    batch_bands = bands.filter(F.col("doc_id") % BATCH_MOD == 0)
    index_bands = bands.filter(F.col("doc_id") % BATCH_MOD != 0).select(
        F.col("doc_id").alias("index_id"), "band", "sig"
    )
    matches = (
        batch_bands.join(index_bands, ["band", "sig"])
        .groupBy("doc_id")
        .agg(
            F.count_distinct("index_id").alias("n_index_matches"),
            F.min("index_id").alias("first_match_id"),
        )
    )
    batch_docs = docs.filter(F.col("doc_id") % BATCH_MOD == 0).select("doc_id")
    return batch_docs.join(matches, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_index_matches", F.lit(0).cast("bigint")).alias(
            "n_index_matches"
        ),
        "first_match_id",
        F.when(F.col("n_index_matches").isNotNull(), F.lit("dup"))
        .otherwise(F.lit("new"))
        .alias("verdict"),
    )


@query("containment_dup_pairs", oracle=sql_containment_pairs())
def containment_dup_pairs(spark, sf_dir):
    """Directed shingle containment (Broder): flags documents mostly
    embedded in another — the quote/boilerplate case symmetric Jaccard
    underweights. See jaccard.py::containment_pairs for the plan."""
    return containment_pairs(load_table(spark, sf_dir, "documents"))


# ---- corpus-level (source-vs-source) MinHash similarity -------------------

N_SRC_HASHES = 8


def _sql_source_minhash_similarity(k: int = N_SRC_HASHES) -> str:
    members = " UNION ALL ".join(
        f"SELECT source, {s} AS i, h{s} AS h FROM sig" for s in range(k)
    )
    # n_agree is summed as BIGINT and divided OUTSIDE the aggregate:
    # BIGINT/8.0 is one exact IEEE op (n_agree <= k << 2^53), and the
    # oracle-type gate's CAST(SUM AS DOUBLE) pattern stays banned.
    return f"""
    WITH sig AS (
      {sql_minhash_signatures(k, group_col="source", distinct=False)}),
    mem AS ({members}),
    agree AS (
      SELECT a.source AS source_a, b.source AS source_b,
             CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree
      FROM mem a JOIN mem b ON a.i = b.i AND a.source < b.source
      GROUP BY 1, 2)
    SELECT source_a, source_b, n_agree, n_agree / {k}.0 AS est_jaccard
    FROM agree
    """


@query("source_minhash_similarity", oracle=_sql_source_minhash_similarity())
def source_minhash_similarity(spark, sf_dir):
    """Corpus-governance view: estimated Jaccard similarity between
    every pair of SOURCES (not documents) from per-source MinHash
    signatures — the "how much does this crawl snapshot overlap that
    one" question that decides whether a new dump is worth ingesting.

    The whole-corpus sketch falls out of the same affine MinHash
    family as doc-level LSH (minhash.py), grouped by source instead
    of doc_id. Three scale properties make this THE way to compare
    corpora at 100 TB:

    - no distinct needed: MIN over duplicate shingles equals MIN over
      the shingle set, so the explode feeds a partial-aggregatable
      groupBy (map-side combine reduces each partition to one row per
      source before the shuffle — the shuffle carries |sources| rows
      per partition, not shingles);
    - the pair stage is sketch-bounded: signatures explode to
      (source, member, hash) rows and self-join on the member index,
      so cost is |sources|^2 * k regardless of corpus bytes;
    - bit-exact cross-engine: md5-based base hash + integer affine
      family, so the estimate (n_agree/k, a dyadic rational) is
      identical in Spark and DuckDB — no tolerance band.

    est_jaccard is an 8-member estimate (stderr ~ 1/sqrt(8)); the
    production knob is N_SRC_HASHES, which scales the sketch linearly
    and the pair stage quadratically-in-k-but-tiny."""
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(
        docs, N_SRC_HASHES, group_col="source", distinct=False
    )
    mem = sig.select(
        "source",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("i"), F.col(f"h{s}").alias("h")
                    )
                    for s in range(N_SRC_HASHES)
                ]
            )
        ).alias("m"),
    ).select("source", F.col("m.i").alias("i"), F.col("m.h").alias("h"))
    a = mem.select(
        F.col("source").alias("source_a"), "i", F.col("h").alias("ha")
    )
    b = mem.select(
        F.col("source").alias("source_b"), "i", F.col("h").alias("hb")
    )
    agree = F.sum(F.when(F.col("ha") == F.col("hb"), 1).otherwise(0))
    return (
        a.join(b, "i")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            agree.cast("bigint").alias("n_agree"),
            (agree.cast("double") / N_SRC_HASHES).alias("est_jaccard"),
        )
    )


# ---- leakage-safe (cluster-aware) train/val/test split --------------------

SPLIT_SEED = 7  # salt for the split coin — bump for a fresh assignment


@query(
    "leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE {sql_components_ctes(sql_candidate_pairs())}
    SELECT doc_id, cluster_id,
           CASE WHEN h < 5 THEN 'test'
                WHEN h < 15 THEN 'val'
                ELSE 'train' END AS split
    FROM (SELECT doc_id, cluster_id,
                 {sql_hash32('cluster_id', SPLIT_SEED)} % 100 AS h
          FROM comp)
    """,
)
def leakage_safe_split(spark, sf_dir):
    """Train/val/test split that cannot leak near-duplicates across
    splits: the 85/10/5 hash coin is flipped on the document's
    near-dup CLUSTER id (connected components over the MinHash-LSH
    pair graph), not the document id — so a training doc's near-twin
    can never land in val/test and inflate eval scores. This is the
    group-aware upgrade of train_val_test_manifest (text/queries.py),
    which splits per-doc and is only sound AFTER dedup; this one is
    sound on the raw corpus.

    Scale: the split adds ZERO passes on top of the CC labels — one
    md5 of the cluster id per row, map-only. The CC cost is the
    dedup pipeline's existing cost (banded LSH candidates, active-
    subgraph min-label propagation with pointer jumping); any corpus
    that runs near-dup dedup already has these labels on hand, and
    the operator composes with a persisted cluster table by swapping
    the first stage for a scan."""
    from .clusters import connected_components

    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components(candidate_pairs(docs), docs.select("doc_id"))
    coin = F.pmod(hash32(F.col("cluster_id"), SPLIT_SEED), 100)
    return comp.select(
        "doc_id",
        "cluster_id",
        F.when(coin < 5, "test")
        .when(coin < 15, "val")
        .otherwise("train")
        .alias("split"),
    )
