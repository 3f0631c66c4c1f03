"""Text-analysis queries over the `documents` table: per-doc stats,
quality scoring, stopword language id, fingerprinting, regex token
counting. Every score is exact integer-ratio arithmetic so both
engines produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import query
from .analysis import shingles, sql_shingle_rows, tokens

# Tiny per-language stopword profiles (inline dimension data — the
# lang-id heuristic scores hit-rate per profile and argmaxes).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "shi", "le", "he", "zai"),
}


@query(
    "doc_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           n_chars,
           CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS distinct_ratio
    FROM documents
    """,
)
def doc_token_stats(spark, sf_dir):
    """Per-document token statistics — the base features every
    quality/dedup stage consumes."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens()
    n_tok = F.size(t)
    n_dis = F.size(F.array_distinct(t))
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        n_dis.alias("n_distinct"),
        "n_chars",
        (F.col("n_chars").cast("double") / n_tok).alias("chars_per_token"),
        (n_dis.cast("double") / n_tok).alias("distinct_ratio"),
    )


@query(
    "doc_quality_score",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' '))) AS n_distinct
      FROM documents)
    SELECT doc_id, lang,
           0.6 * (CAST(n_distinct AS DOUBLE) / n_tokens)
             + 0.4 * (CAST(LEAST(n_tokens, 100) AS DOUBLE) / 100) AS quality,
           CASE WHEN CAST(n_distinct AS DOUBLE) / n_tokens < 0.2 THEN 'repetitive'
                WHEN n_tokens < 20 THEN 'too_short'
                ELSE 'ok' END AS quality_class
    FROM s
    """,
)
def doc_quality_score(spark, sf_dir):
    """Heuristic quality score: lexical diversity + length saturation,
    plus a filter class (the keep/drop decision of a data pipeline)."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens()
    n_tok = F.size(t)
    n_dis = F.size(F.array_distinct(t))
    diversity = n_dis.cast("double") / n_tok
    len_sat = F.least(n_tok, F.lit(100)).cast("double") / 100
    return d.select(
        "doc_id",
        "lang",
        (F.lit(0.6) * diversity + F.lit(0.4) * len_sat).alias("quality"),
        F.when(diversity < 0.2, "repetitive")
        .when(n_tok < 20, "too_short")
        .otherwise("ok")
        .alias("quality_class"),
    )


def _sql_stopword_values() -> str:
    rows = [
        f"('{lang}', '{w}')" for lang, ws in STOPWORDS.items() for w in ws
    ]
    return f"(VALUES {', '.join(rows)}) AS sw(sw_lang, sw_word)"


@query(
    "lang_id_stopwords",
    oracle=f"""
    WITH tok AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
    hits AS (
      SELECT t.doc_id, sw.sw_lang, COUNT(*) AS hits
      FROM tok t JOIN {_sql_stopword_values()} ON t.tok = sw.sw_word
      GROUP BY t.doc_id, sw.sw_lang),
    ranked AS (
      SELECT d.doc_id, s.sw_lang AS pred_lang, COALESCE(h.hits, 0) AS hits,
             ROW_NUMBER() OVER (PARTITION BY d.doc_id
                                ORDER BY COALESCE(h.hits, 0) DESC, s.sw_lang) AS rn
      FROM documents d
      CROSS JOIN (SELECT DISTINCT sw_lang FROM {_sql_stopword_values()}) s
      LEFT JOIN hits h ON h.doc_id = d.doc_id AND h.sw_lang = s.sw_lang)
    SELECT doc_id, pred_lang, hits FROM ranked WHERE rn = 1
    """,
)
def lang_id_stopwords(spark, sf_dir):
    """N-gram-heuristic language id: stopword-profile hit counting +
    argmax (deterministic tiebreak on lang name). The profile table is
    broadcast; token explode is the only wide-ish step and reduces
    immediately (partial agg)."""
    d = load_table(spark, sf_dir, "documents")
    sw = F.broadcast(
        d.sparkSession.createDataFrame(
            [(lang, w) for lang, ws in STOPWORDS.items() for w in ws],
            "sw_lang string, sw_word string",
        )
    )
    langs = F.broadcast(
        d.sparkSession.createDataFrame([(l,) for l in STOPWORDS], "sw_lang string")
    )
    tok = d.select("doc_id", F.explode(tokens()).alias("tok"))
    hits = (
        tok.join(sw, tok.tok == sw.sw_word)
        .groupBy("doc_id", "sw_lang")
        .agg(F.count("*").alias("hits"))
    )
    all_pairs = d.select("doc_id").crossJoin(langs)
    scored = all_pairs.join(hits, ["doc_id", "sw_lang"], "left").select(
        "doc_id",
        F.col("sw_lang").alias("pred_lang"),
        F.coalesce("hits", F.lit(0)).alias("hits"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("hits"), "pred_lang")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           substr(md5(lower(trim(text))), 1, 16) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Content fingerprint: 64-bit hex prefix of the md5 of normalized
    text — the exact-dedup key (portable across engines)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring(F.md5(F.lower(F.trim("text"))), 1, 16).alias("fingerprint"),
    )


@query(
    "token_count_regex",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+')) AS n_word_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS n_number_tokens,
           len(string_split(text, ' ')) AS n_ws_tokens
    FROM documents
    """,
)
def token_count_regex(spark, sf_dir):
    """Token counting two ways: whitespace and a BPE-ish regex pass
    (letter runs / digit runs), all JVM-side regex."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"[a-z]+")).cast("bigint").alias("n_word_tokens"),
        F.regexp_count("text", F.lit(r"[0-9]+")).cast("bigint").alias("n_number_tokens"),
        F.size(tokens()).cast("bigint").alias("n_ws_tokens"),
    )


@query(
    "lang_source_profile",
    oracle="""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(CAST(SUM(n_chars) AS STRING) AS DOUBLE) / COUNT(*) AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def lang_source_profile(spark, sf_dir):
    """Corpus profiling per (lang, source) — the triage view of a crawl."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def _sql_top_gram_frac(n: int, alias: str) -> str:
    """CTE pair computing per-doc max/total n-gram counts in DuckDB."""
    return f"""
    g{alias} AS (SELECT doc_id, shingle
                 FROM ({sql_shingle_rows(n, distinct=False)})),
    c{alias} AS (SELECT doc_id, shingle, COUNT(*) AS c
                 FROM g{alias} GROUP BY 1, 2),
    m{alias} AS (SELECT doc_id, MAX(c) AS top_c,
                        CAST(SUM(c) AS BIGINT) AS tot
                 FROM c{alias} GROUP BY 1)"""


@query(
    "repetition_signals",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    base AS (SELECT doc_id, len(w) AS n_words,
                    len(list_distinct(w)) AS n_distinct FROM t),
    {_sql_top_gram_frac(2, 'b')},
    {_sql_top_gram_frac(3, 't')}
    SELECT b.doc_id, b.n_words,
           CAST(b.n_words - b.n_distinct AS DOUBLE) / b.n_words AS dup_word_frac,
           COALESCE(CAST(mb.top_c AS DOUBLE) / mb.tot, 0.0) AS top2gram_frac,
           COALESCE(CAST(mt.top_c AS DOUBLE) / mt.tot, 0.0) AS top3gram_frac
    FROM base b LEFT JOIN mb ON b.doc_id = mb.doc_id
                LEFT JOIN mt ON b.doc_id = mt.doc_id
    """,
)
def repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    adapted to the line-less fixture corpus): duplicate-word fraction
    plus the fraction of all 2-gram/3-gram occurrences claimed by the
    single most frequent n-gram. High values flag boilerplate and
    degenerate repetition. All ratios are single divisions of exact
    integer counts, so both engines emit identical doubles. Word stats
    are computed row-locally (no shuffle); each n-gram pipeline is
    explode → two partial-aggregated groupBys keyed by doc_id — the
    map-side combine absorbs the repetition itself, so skew from a
    degenerate doc stays bounded."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("__t"))
    base = toks.select(
        "doc_id",
        F.size("__t").cast("bigint").alias("n_words"),
        F.size(F.array_distinct("__t")).cast("bigint").alias("n_distinct"),
    )

    def top_frac(n: int, out: str):
        g = toks.select("doc_id", F.explode(shingles(n)).alias("g"))
        c = g.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
        return c.groupBy("doc_id").agg(
            (F.max("c").cast("double") / F.sum("c")).alias(out)
        )

    return (
        base.join(top_frac(2, "top2gram_frac"), "doc_id", "left")
        .join(top_frac(3, "top3gram_frac"), "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            (
                (F.col("n_words") - F.col("n_distinct")).cast("double")
                / F.col("n_words")
            ).alias("dup_word_frac"),
            F.coalesce("top2gram_frac", F.lit(0.0)).alias("top2gram_frac"),
            F.coalesce("top3gram_frac", F.lit(0.0)).alias("top3gram_frac"),
        )
    )


@query(
    "quality_filter_verdict",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             len(list_distinct(string_split(text, ' '))) AS n_distinct,
             n_chars
      FROM documents),
    f AS (
      SELECT doc_id, n_words,
             CAST(n_chars - n_words + 1 AS DOUBLE) / n_words AS mean_word_len,
             CAST(n_words - n_distinct AS DOUBLE) / n_words AS dup_word_frac
      FROM s)
    SELECT doc_id, n_words, mean_word_len, dup_word_frac,
           n_words BETWEEN 20 AND 90 AS pass_word_count,
           mean_word_len BETWEEN 3.0 AND 5.0 AS pass_mean_word_len,
           dup_word_frac <= 0.6 AS pass_repetition,
           (n_words BETWEEN 20 AND 90) AND (mean_word_len BETWEEN 3.0 AND 5.0)
             AND dup_word_frac <= 0.6 AS keep,
           CASE WHEN NOT n_words BETWEEN 20 AND 90 THEN 'word_count'
                WHEN NOT mean_word_len BETWEEN 3.0 AND 5.0 THEN 'word_length'
                WHEN dup_word_frac > 0.6 THEN 'repetition'
                ELSE 'keep' END AS reject_reason
    FROM f
    """,
)
def quality_filter_verdict(spark, sf_dir):
    """The keep/drop decision of a Gopher/C4-style quality filter,
    with per-rule booleans and the first failing rule as the reject
    reason (what a pipeline logs for filter-rate dashboards). Entirely
    map-side — no shuffle at any scale. mean word length derives from
    n_chars arithmetically (single-spaced corpus: chars = wordchars +
    n_words - 1), avoiding a per-word lambda in the row path."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens()
    n_words = F.size(t).cast("bigint")
    n_distinct = F.size(F.array_distinct(t)).cast("bigint")
    mean_wl = (F.col("n_chars") - n_words + 1).cast("double") / n_words
    dup_frac = (n_words - n_distinct).cast("double") / n_words
    p_wc = (n_words >= 20) & (n_words <= 90)
    p_wl = (mean_wl >= 3.0) & (mean_wl <= 5.0)
    p_rep = dup_frac <= 0.6
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        dup_frac.alias("dup_word_frac"),
        p_wc.alias("pass_word_count"),
        p_wl.alias("pass_mean_word_len"),
        p_rep.alias("pass_repetition"),
        (p_wc & p_wl & p_rep).alias("keep"),
        F.when(~p_wc, "word_count")
        .when(~p_wl, "word_length")
        .when(~p_rep, "repetition")
        .otherwise("keep")
        .alias("reject_reason"),
    )


@query(
    "duplicate_spans",
    oracle=f"""
    WITH sh AS ({sql_shingle_rows(5, distinct=True)})
    SELECT shingle AS span, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM sh GROUP BY shingle HAVING COUNT(*) >= 2
    """,
)
def duplicate_spans(spark, sf_dir):
    """Exact-substring duplication index: 5-word spans appearing in 2+
    documents — the span inventory behind C4/suffix-array-style exact
    substring dedup. Distinct-per-doc spans → one partial-aggregated
    count keyed by span. At 100 TB the span key is high-cardinality and
    near-uniform (the partial agg collapses per-doc repeats first), so
    the shuffle is balanced; output volume is only the duplicated
    tail."""
    from ..text.analysis import shingle_rows

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(d, n=5, distinct=True)
    return (
        sh.groupBy(F.col("shingle").alias("span"))
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "doc_span_dup_ratio",
    oracle=f"""
    WITH sh AS ({sql_shingle_rows(5, distinct=True)}),
    marked AS (
      SELECT doc_id, COUNT(*) OVER (PARTITION BY shingle) AS span_docs
      FROM sh)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN span_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           CAST(CAST(SUM(CASE WHEN span_docs >= 2 THEN 1 ELSE 0 END) AS STRING) AS DOUBLE)
             / COUNT(*) AS dup_ratio
    FROM marked GROUP BY doc_id
    """,
)
def doc_span_dup_ratio(spark, sf_dir):
    """Per-document duplicated-text ratio: the fraction of a doc's
    5-word spans that also occur in another document — the signal C4
    thresholds to drop boilerplate-heavy pages. One COUNT window on
    the span key (the same shuffle the duplicate-span index needs),
    then a per-doc aggregate."""
    from ..text.analysis import shingle_rows

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_rows(d, n=5, distinct=True)
    span_docs = F.count("*").over(W.partitionBy("shingle"))
    marked = sh.select("doc_id", span_docs.alias("span_docs"))
    dup = F.sum(F.when(F.col("span_docs") >= 2, 1).otherwise(0))
    return marked.groupBy("doc_id").agg(
        F.count("*").alias("n_spans"),
        dup.alias("n_dup_spans"),
        (dup.cast("double") / F.count("*")).alias("dup_ratio"),
    )


# Context-window capacity (tokens) for sequence packing.
PACK_CAPACITY = 2048

_PACK_SQL_CTES = f"""
    t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
                 md5(CAST(doc_id AS VARCHAR)) AS pack_key
          FROM documents),
    packed AS (
      SELECT doc_id, lang, n_tokens, pack_key,
             CAST(SUM(n_tokens) OVER (PARTITION BY lang
                                      ORDER BY pack_key, doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS BIGINT)
               - n_tokens AS prev_cum
      FROM t)
"""


@query(
    "sequence_pack_greedy",
    oracle=f"""
    WITH {_PACK_SQL_CTES}
    SELECT doc_id, lang, n_tokens,
           prev_cum // {PACK_CAPACITY} AS bin_id,
           prev_cum % {PACK_CAPACITY} AS offset_in_bin
    FROM packed
    """,
)
def sequence_pack_greedy(spark, sf_dir):
    """Sequence packing for training: concatenate documents in a
    deterministic pseudo-random order (md5 of doc_id — a portable
    shuffle) and cut the stream into fixed {PACK_CAPACITY}-token
    context windows; each doc is assigned the window its first token
    lands in (GPT-style concat-then-chunk packing; docs may straddle a
    boundary, exactly as the training tokenizer would). Packing is
    PARTITIONED BY LANG — each language packs its own stream, so the
    prefix-sum window parallelizes across partitions instead of
    serializing the corpus through one task (the 100 TB shape: shard
    by (lang, shard_id) and pack per shard)."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens()).cast("bigint")
    t = d.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("pack_key"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("pack_key", "doc_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    prev_cum = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("bigint")
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        (prev_cum / PACK_CAPACITY).cast("bigint").alias("bin_id"),
        (prev_cum % PACK_CAPACITY).alias("offset_in_bin"),
    )


@query(
    "pack_bin_stats",
    oracle=f"""
    WITH {_PACK_SQL_CTES}
    SELECT lang, prev_cum // {PACK_CAPACITY} AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs_started,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
           CAST(CAST(SUM(n_tokens) AS STRING) AS DOUBLE) / {PACK_CAPACITY} AS fill_ratio
    FROM packed
    GROUP BY 1, 2
    """,
)
def pack_bin_stats(spark, sf_dir):
    """Packing efficiency accounting per (lang, context window): docs
    starting in the window, their token mass, and fill ratio vs the
    {PACK_CAPACITY}-token capacity — the waste metric a packing
    strategy is judged by."""
    packed = sequence_pack_greedy(spark, sf_dir)
    return packed.groupBy(
        "lang", "bin_id"
    ).agg(
        F.count("*").alias("n_docs_started"),
        F.sum("n_tokens").alias("tokens_started"),
        (F.sum("n_tokens").cast("double") / PACK_CAPACITY).alias("fill_ratio"),
    )


# ---- Domain-mixture resampling -------------------------------------------
#
# Balancing a training mixture across domains (languages here) without
# floats: keep_rate_d = min_domain_tokens / domain_tokens, and a doc
# is kept iff hash32(doc_id) / 2^32 < keep_rate — evaluated as the
# EXACT bigint cross-multiplication h * domain_tokens < 2^32 *
# min_tokens, so both engines make the identical keep/drop decision on
# every document (no float rate, no RNG). The md5 hash is the sampling
# "coin": uniform, deterministic, reproducible across runs and
# engines. The 100 TB shape: one tiny per-domain aggregate broadcast
# back onto a map-only filter — the corpus never shuffles.

_TWO32 = 1 << 32

_MIX_SQL_CTES = """
    d AS (SELECT doc_id, lang,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                 CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                      AS BIGINT) AS h
          FROM documents),
    dom AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS domain_tokens
            FROM d GROUP BY 1),
    m AS (SELECT MIN(domain_tokens) AS min_tokens FROM dom),
    kept AS (SELECT d.doc_id, d.lang, d.n_tokens
             FROM d JOIN dom USING (lang) CROSS JOIN m
             WHERE d.h * dom.domain_tokens < 4294967296 * m.min_tokens)
"""


@query(
    "domain_mixture_plan",
    oracle=f"""
    WITH {_MIX_SQL_CTES}
    SELECT dom.lang, dom.n_docs, dom.domain_tokens,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
    FROM dom LEFT JOIN (SELECT lang, COUNT(*) AS n_kept,
                               SUM(n_tokens) AS kept_tokens
                        FROM kept GROUP BY 1) k USING (lang)
    """,
)
def domain_mixture_plan(spark, sf_dir):
    """Per-domain mixture accounting: original doc/token mass and the
    mass surviving token-balanced resampling (every language downsampled
    to the smallest language's token budget). The keep decision is an
    exact integer cross-multiply of the doc's hash coin against the
    domain rate — deterministic, engine-portable, no RNG state. Kept
    token mass lands within ~hash-uniformity noise of min_tokens for
    every domain (pinned in tests)."""
    from ..functions.portable_hash import hash32_unsalted

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(tokens()).cast("bigint").alias("n_tokens"),
        hash32_unsalted(F.col("doc_id")).alias("h"),
    )
    dom = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("domain_tokens"),
    )
    m = dom.agg(F.min("domain_tokens").alias("min_tokens"))
    kept = (
        d.join(F.broadcast(dom.select("lang", "domain_tokens")), "lang")
        .crossJoin(F.broadcast(m))
        .filter(
            F.col("h") * F.col("domain_tokens")
            < F.lit(_TWO32) * F.col("min_tokens")
        )
    )
    k = kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"), F.sum("n_tokens").alias("kept_tokens")
    )
    return dom.join(k, "lang", "left").select(
        "lang",
        "n_docs",
        "domain_tokens",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
    )


@query(
    "domain_balanced_sample",
    oracle=f"""
    WITH {_MIX_SQL_CTES}
    SELECT doc_id, lang, n_tokens FROM kept
    """,
)
def domain_balanced_sample(spark, sf_dir):
    """The kept-document list of the token-balanced mixture — the
    actual training-set manifest a sampler would write. Map-only after
    two broadcast scalars; rerunning at any partitioning yields the
    identical manifest."""
    from ..functions.portable_hash import hash32_unsalted

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(tokens()).cast("bigint").alias("n_tokens"),
        hash32_unsalted(F.col("doc_id")).alias("h"),
    )
    dom = d.groupBy("lang").agg(F.sum("n_tokens").alias("domain_tokens"))
    m = dom.agg(F.min("domain_tokens").alias("min_tokens"))
    return (
        d.join(F.broadcast(dom), "lang")
        .crossJoin(F.broadcast(m))
        .filter(
            F.col("h") * F.col("domain_tokens")
            < F.lit(_TWO32) * F.col("min_tokens")
        )
        .select("doc_id", "lang", "n_tokens")
    )


VOCAB_SIZE = 1000


@query(
    "vocab_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    vc AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY 1),
    vocab AS (SELECT t FROM vc ORDER BY c DESC, t LIMIT {VOCAB_SIZE})
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS STRING) AS DOUBLE)
             / COUNT(*) AS oov_rate
    FROM tok LEFT JOIN vocab v USING (t)
    GROUP BY doc_id
    """,
)
def vocab_oov_rate(spark, sf_dir):
    """Tokenizer-coverage audit: build the top-{VOCAB_SIZE} corpus
    vocabulary (deterministic count-then-token tiebreak) and report
    each document's out-of-vocabulary token rate — the signal that
    decides whether a tokenizer/vocab fits a corpus before training.
    The vocab is a broadcast semi-join side; the per-doc agg partial-
    aggregates map-side. oov_rate is one exact-integer division."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens()).alias("t"))
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "t")
        .limit(VOCAB_SIZE)
        .select("t", F.lit(True).alias("in_vocab"))
    )
    n_oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return (
        tok.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            n_oov.cast("bigint").alias("n_oov"),
            (n_oov.cast("double") / F.count("*")).alias("oov_rate"),
        )
    )


BPE_TOP = 20


@query(
    "bpe_first_merges",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents),
    pairs AS (
      SELECT substr(t, CAST(r.i AS INT), 2) AS pair
      FROM tok, UNNEST(range(1, length(t))) AS r(i)),
    counted AS (
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM pairs GROUP BY 1),
    ranked AS (
      SELECT pair, n, ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS rank
      FROM counted)
    SELECT pair, n, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {BPE_TOP}
    """,
)
def bpe_first_merges(spark, sf_dir):
    """The first step of BPE tokenizer training: count every adjacent
    character pair inside words across the corpus (occurrence-
    weighted) and rank the top-{BPE_TOP} merge candidates — the pair a
    BPE trainer would merge first, with a deterministic (count, pair)
    tiebreak. Shape: explode tokens -> explode in-word adjacent pairs
    -> one partial-aggregated count keyed by pair (a few thousand
    distinct pairs regardless of corpus size, so the shuffle is
    bounded by alphabet^2, not data volume) -> global top-k."""
    d = load_table(spark, sf_dir, "documents")
    # length >= 2 guard: Spark's sequence(1, 0) would be DESCENDING
    # [1, 0], not empty like DuckDB's half-open range — filter first.
    tok = d.select(F.explode(tokens()).alias("t")).filter(
        F.length("t") >= 2
    )
    pairs = tok.select(
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(F.count("*").alias("n"))
    # Top-k via TakeOrderedAndProject, then rank the <=BPE_TOP rows —
    # never a global row_number over the full pair table.
    top = counted.orderBy(F.desc("n"), "pair").limit(BPE_TOP)
    w = W.orderBy(F.desc("n"), "pair")
    return top.select("pair", "n", F.row_number().over(w).alias("rank"))


# Split fractions in hash-coin buckets of 100: test < 5, val < 15.
_SPLIT_SQL = """
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CASE
             WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 100 < 5 THEN 'test'
             WHEN CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 100 < 15 THEN 'val'
             ELSE 'train'
           END AS split
    FROM documents
"""


@query("train_val_test_manifest", oracle=_SPLIT_SQL)
def train_val_test_manifest(spark, sf_dir):
    """Deterministic 85/10/5 train/val/test split: the md5 hash coin
    (mod 100) assigns every document a split that is stable across
    runs, partitionings, and engines — no RNG state to manage, and a
    document can never leak between splits on a rerun (the property
    an evaluation pipeline actually needs). Map-only."""
    from ..functions.portable_hash import hash32_unsalted

    d = load_table(spark, sf_dir, "documents")
    coin = F.pmod(hash32_unsalted(F.col("doc_id")), 100)
    return d.select(
        "doc_id",
        "lang",
        F.size(tokens()).cast("bigint").alias("n_tokens"),
        F.when(coin < 5, "test")
        .when(coin < 15, "val")
        .otherwise("train")
        .alias("split"),
    )


@query(
    "lang_mixture_kl",
    oracle="""
    WITH sl AS (
      SELECT source, lang, COUNT(*) AS n_sl FROM documents GROUP BY 1, 2),
    cells AS (
      SELECT source, lang, n_sl,
             SUM(n_sl) OVER (PARTITION BY source) AS n_s,
             SUM(n_sl) OVER (PARTITION BY lang) AS n_l,
             SUM(n_sl) OVER () AS n_tot
      FROM sl),
    terms AS (
      SELECT source, n_s,
             CAST(ROUND((CAST(n_sl AS DOUBLE) / n_s)
                        * LN((CAST(n_sl AS DOUBLE) / n_s)
                             / (CAST(n_l AS DOUBLE) / n_tot)) * 1e9)
                  AS BIGINT) AS term_nano
      FROM cells)
    SELECT source, CAST(MIN(n_s) AS BIGINT) AS n_docs,
           CAST(CAST(SUM(term_nano) AS STRING) AS DOUBLE) / 1e9 AS kl_nats
    FROM terms GROUP BY source
    """,
)
def lang_mixture_kl(spark, sf_dir):
    """Per-source language-mixture drift: KL(P_lang|source || P_lang)
    in nats — the monitor a training-data pipeline runs to catch a
    source whose language mix shifted from the corpus-wide mixture.

    Exactness discipline: each KL term is computed per (source, lang)
    CELL (deterministic per-row double math from integer counts via a
    textually identical formula in both engines), scaled to integer
    nano-nats, and only INTEGERS are summed across rows — so the
    result is bit-stable under any partitioning / engine. Scale shape:
    one groupBy shuffle over documents; the marginal windows run over
    the aggregated |sources|x|langs| cell table, not the corpus."""
    d = load_table(spark, sf_dir, "documents").select("source", "lang")
    sl = d.groupBy("source", "lang").agg(F.count("*").alias("n_sl"))
    cells = sl.select(
        "*",
        F.sum("n_sl").over(W.partitionBy("source")).alias("n_s"),
        F.sum("n_sl").over(W.partitionBy("lang")).alias("n_l"),
        F.sum("n_sl").over(W.partitionBy()).alias("n_tot"),
    )
    p_s = F.col("n_sl").cast("double") / F.col("n_s")
    p_g = F.col("n_l").cast("double") / F.col("n_tot")
    term_nano = F.round(p_s * F.log(p_s / p_g) * F.lit(1e9)).cast("bigint")
    return (
        cells.select("source", "n_s", term_nano.alias("term_nano"))
        .groupBy("source")
        .agg(
            F.min("n_s").alias("n_docs"),
            (F.sum("term_nano").cast("double") / F.lit(1e9)).alias("kl_nats"),
        )
    )


LM_KEEP_NANO = -4_000_000_000  # keep threshold: avg logprob >= -4.0 nats


@query(
    "lm_bigram_quality_scores",
    oracle=f"""
    WITH bg AS (
      {sql_shingle_rows(n=2, distinct=False)}),
    scored AS (
      SELECT doc_id,
             CAST(ROUND(LN(CAST(COUNT(*) OVER (PARTITION BY shingle) AS DOUBLE)
                           / (COUNT(*) OVER (PARTITION BY string_split(shingle, ' ')[1])))
                        * 1e9) AS BIGINT) AS term_nano
      FROM bg)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           (CAST(CAST(SUM(term_nano) AS STRING) AS DOUBLE) / COUNT(*)) / 1e9 AS avg_logprob,
           CASE WHEN SUM(term_nano) >= COUNT(*) * CAST({LM_KEEP_NANO} AS BIGINT)
                THEN 'keep' ELSE 'drop' END AS verdict
    FROM scored GROUP BY doc_id
    """,
)
def lm_bigram_quality_scores(spark, sf_dir):
    """CCNet-style language-model quality filter: score every document
    by the average log-probability of its word bigrams under the
    corpus's own bigram MLE model (P(w2|w1) = C(w1 w2)/C(w1 ·)), and
    keep/drop against a threshold — the classic perplexity proxy for
    LLM training-data curation, with the corpus itself as the LM.

    JOIN-FREE plan: both model counts ride WINDOWS over the exploded
    bigram rows (partition by bigram, then by history token), so the
    model is never materialized or joined back — two shuffles of the
    bigram stream total, each partially aggregated map-side. Exactness:
    counts are integers, each ln term rounds to integer nano-nats
    per-row, only integers sum across rows, and the keep/drop verdict
    compares integers (sum >= n * threshold) — no float ever crosses a
    row boundary, so the verdict is bit-stable at any partitioning."""
    d = load_table(spark, sf_dir, "documents")
    bg = (
        d.select("doc_id", F.split("text", " ").alias("__t"))
        .select("doc_id", F.explode(shingles(2)).alias("shingle"))
    )
    c_bg = F.count("*").over(W.partitionBy("shingle"))
    c_u = F.count("*").over(
        W.partitionBy(F.split("shingle", " ").getItem(0))
    )
    term_nano = F.round(
        F.log(c_bg.cast("double") / c_u) * F.lit(1e9)
    ).cast("bigint")
    scored = bg.select("doc_id", term_nano.alias("term_nano"))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        (
            (F.sum("term_nano").cast("double") / F.count("*")) / F.lit(1e9)
        ).alias("avg_logprob"),
        F.when(
            F.sum("term_nano")
            >= F.count("*") * F.lit(LM_KEEP_NANO).cast("bigint"),
            "keep",
        )
        .otherwise("drop")
        .alias("verdict"),
    )


@query(
    "bpe_train_merges",
    oracle="""
    WITH w0 AS (
      SELECT unnest(string_split(text, ' ')) AS t FROM documents),
    p1 AS (
      SELECT substr(t, CAST(r.i AS INT), 2) AS pair
      FROM w0, UNNEST(range(1, length(t))) AS r(i)),
    c1 AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM p1 GROUP BY 1),
    m1 AS (SELECT pair, n FROM c1 ORDER BY n DESC, pair LIMIT 1),
    w1 AS (SELECT replace(t, (SELECT pair FROM m1), chr(1)) AS t FROM w0),
    p2 AS (
      SELECT substr(t, CAST(r.i AS INT), 2) AS pair
      FROM w1, UNNEST(range(1, length(t))) AS r(i)),
    c2 AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM p2 GROUP BY 1),
    m2 AS (SELECT pair, n FROM c2 ORDER BY n DESC, pair LIMIT 1),
    w2 AS (SELECT replace(t, (SELECT pair FROM m2), chr(2)) AS t FROM w1),
    p3 AS (
      SELECT substr(t, CAST(r.i AS INT), 2) AS pair
      FROM w2, UNNEST(range(1, length(t))) AS r(i)),
    c3 AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n FROM p3 GROUP BY 1),
    m3 AS (SELECT pair, n FROM c3 ORDER BY n DESC, pair LIMIT 1),
    w3 AS (SELECT replace(t, (SELECT pair FROM m3), chr(3)) AS t FROM w2)
    SELECT CAST(1 AS INT) AS merge_rank,
           ascii(substr(pair, 1, 1)) AS left_code,
           ascii(substr(pair, 2, 1)) AS right_code,
           n AS pair_count,
           (SELECT CAST(SUM(length(t)) AS BIGINT) FROM w1) AS tokens_after
    FROM m1
    UNION ALL
    SELECT CAST(2 AS INT), ascii(substr(pair, 1, 1)),
           ascii(substr(pair, 2, 1)), n,
           (SELECT CAST(SUM(length(t)) AS BIGINT) FROM w2)
    FROM m2
    UNION ALL
    SELECT CAST(3 AS INT), ascii(substr(pair, 1, 1)),
           ascii(substr(pair, 2, 1)), n,
           (SELECT CAST(SUM(length(t)) AS BIGINT) FROM w3)
    FROM m3
    """,
)
def bpe_train_merges(spark, sf_dir):
    """BPE tokenizer TRAINING, not just the first counting step
    (`bpe_first_merges` ranks candidates; this LEARNS): three full
    merge iterations of the Sennrich et al. algorithm over the word
    corpus — count adjacent symbol pairs, pick the argmax with the
    deterministic (count DESC, pair ASC) tie-break, APPLY the merge
    (leftmost non-overlapping, exactly both engines' `replace`
    semantics on the 1-char-per-symbol string encoding: merged
    symbols become the fresh sentinel chars \\x01/\\x02/\\x03, which
    the ASCII corpus can never contain), then re-count on the REWRITTEN
    corpus so later merges see earlier ones — including merges INTO
    merged symbols (a round-2 winner may contain \\x01). Emits one row
    per learned merge: the pair's symbol codes, its count at selection
    time, and the corpus token count after applying it (which differs
    from count_before - pair_count exactly when occurrences overlap —
    'aaa' counts 'aa' twice but merges once; both engines agree
    because the rewrite, not subtraction, defines it).

    Scale shape (r12 — the standard Sennrich trainer trains on the
    WORD-FREQUENCY table, not the raw token stream): ONE corpus pass
    folds the token stream to (word, cnt) — a vocabulary-bounded
    shuffle — and every merge iteration then works on the vocab table:
    pair counts are cnt-weighted sums (identical numbers to counting
    raw occurrences, since every occurrence of a word contributes the
    same pairs), the 1-row winner joins back as a BROADCAST (the
    selection never leaves the plan — no collect), the rewrite is
    map-only over the vocab, and re-aggregating by the rewritten word
    keeps the table minimal. The vocab is CHECKPOINTED between
    iterations (what a crawl-scale run does instead of replaying
    lineage — without it the 3-branch union replays the whole chain
    once per branch per prior iteration). Iteration cost is bounded by
    |vocab| and |alphabet|² regardless of corpus size — measured
    3.1-5.3 s at sf0.1 in the token-stream form, 1.1 s in this form."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(tokens()).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    out = None
    for k in (1, 2, 3):
        counted = (
            vocab.filter(F.length("t") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, length(t) - 1),"
                        " i -> substring(t, i, 2))"
                    )
                ).alias("pair"),
                "cnt",
            )
            .groupBy("pair")
            .agg(F.sum("cnt").alias("n"))
        )
        # 1-row winner: checkpoint so the rewrite pass and the output
        # row don't each re-run the count.
        winner = counted.orderBy(F.desc("n"), "pair").limit(1).localCheckpoint(
            eager=True
        )
        vocab = (
            vocab.crossJoin(F.broadcast(winner.select("pair")))
            .select(
                F.replace(F.col("t"), F.col("pair"), F.lit(chr(k))).alias("t"),
                "cnt",
            )
            .groupBy("t")
            .agg(F.sum("cnt").alias("cnt"))
            .localCheckpoint(eager=True)
        )
        stats = vocab.agg(
            F.sum(F.length("t") * F.col("cnt")).cast("bigint").alias(
                "tokens_after"
            )
        )
        row = winner.crossJoin(F.broadcast(stats)).select(
            F.lit(k).cast("int").alias("merge_rank"),
            F.ascii(F.substring("pair", 1, 1)).alias("left_code"),
            F.ascii(F.substring("pair", 2, 1)).alias("right_code"),
            F.col("n").alias("pair_count"),
            "tokens_after",
        )
        out = row if out is None else out.unionAll(row)
    return out
