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
from .analysis import tokens

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
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
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
