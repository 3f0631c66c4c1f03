"""Behavioral invariants for the LLM-pipeline text operators added in
round 2: quality verdicts, repetition signals, span-level dedup, and
sequence packing. (Bit-exactness vs DuckDB is covered by the master
gate in test_registry_oracle; these pin semantics the hash can't —
non-vacuousness, conservation laws, bounds.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark import registry
from matrix_multiplication_map_reduce_gcp_spark.text.queries import PACK_CAPACITY

from .conftest import SF_SMOKE

QUERIES = registry.load_all()


def test_quality_verdict_splits_corpus(spark):
    rows = QUERIES["quality_filter_verdict"].fn(spark, SF_SMOKE).collect()
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    assert kept and dropped, "thresholds must split the fixture, not rubber-stamp it"
    for r in rows:
        assert r.keep == (
            r.pass_word_count and r.pass_mean_word_len and r.pass_repetition
        )
        assert (r.reject_reason == "keep") == r.keep
        if r.reject_reason == "word_count":
            assert not r.pass_word_count


def test_repetition_signals_bounded(spark):
    rows = QUERIES["repetition_signals"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_word_frac < 1.0
        assert 0.0 <= r.top2gram_frac <= 1.0
        assert 0.0 <= r.top3gram_frac <= 1.0
        # a single most-frequent trigram can't claim more mass than the
        # most-frequent bigram's ceiling allows on word-soup text
        assert r.n_words > 0


def test_span_dup_conservation(spark):
    """Σ per-doc duplicated spans == Σ over duplicated spans of their
    doc counts (both count the same (doc, dup-span) incidences)."""
    per_doc = (
        QUERIES["doc_span_dup_ratio"].fn(spark, SF_SMOKE)
        .agg(F.sum("n_dup_spans"))
        .collect()[0][0]
    )
    per_span = (
        QUERIES["duplicate_spans"].fn(spark, SF_SMOKE)
        .agg(F.sum("n_docs"))
        .collect()[0][0]
    )
    assert per_doc == per_span
    assert per_doc > 0, "fixture has no duplicated spans — vacuous"


def test_packing_invariants(spark):
    packed = QUERIES["sequence_pack_greedy"].fn(spark, SF_SMOKE).collect()
    assert packed
    for r in packed:
        assert 0 <= r.offset_in_bin < PACK_CAPACITY
        assert r.bin_id >= 0
    # per lang: bins are dense 0..max (the stream has no holes)
    by_lang: dict[str, set[int]] = {}
    for r in packed:
        by_lang.setdefault(r.lang, set()).add(r.bin_id)
    for lang, bins in by_lang.items():
        assert bins == set(range(max(bins) + 1)), f"holes in {lang} bins"

    # token conservation: bin stats account for every packed token
    stats = QUERIES["pack_bin_stats"].fn(spark, SF_SMOKE).collect()
    assert sum(r.tokens_started for r in stats) == sum(r.n_tokens for r in packed)
    for s in stats:
        assert abs(s.fill_ratio - s.tokens_started / PACK_CAPACITY) < 1e-12


def test_domain_mixture_balances_token_mass(spark):
    """Every language's kept token mass must land within hash-noise of
    the smallest language's budget: 0.5x..1.5x min_tokens (binomial
    noise at ~60-doc domains), and the smallest domain keeps ~all of
    itself."""
    from matrix_multiplication_map_reduce_gcp_spark import registry
    from .conftest import SF_CORRECTNESS

    qs = registry.load_all()
    rows = qs["domain_mixture_plan"].fn(spark, SF_CORRECTNESS).collect()
    assert len(rows) >= 3
    min_tokens = min(r.domain_tokens for r in rows)
    for r in rows:
        assert r.n_kept <= r.n_docs
        assert 0.5 * min_tokens <= r.kept_tokens <= 1.5 * min_tokens, (
            f"{r.lang}: kept {r.kept_tokens} vs budget {min_tokens}"
        )


def test_scd2_ranges_partition_each_user_timeline(spark):
    """SCD2 invariants: per user, exactly one current row; ranges are
    non-overlapping and contiguous (each valid_to equals the next
    valid_from); n_events sums to the user's event count."""
    from collections import defaultdict

    from matrix_multiplication_map_reduce_gcp_spark import registry
    from matrix_multiplication_map_reduce_gcp_spark.catalog import load_table
    from .conftest import SF_CORRECTNESS

    qs = registry.load_all()
    rows = qs["scd2_user_event_history"].fn(spark, SF_CORRECTNESS).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    ev_counts = {
        r.user_id: r.n
        for r in load_table(spark, SF_CORRECTNESS, "events")
        .groupBy("user_id")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for uid, hist in by_user.items():
        hist.sort(key=lambda r: r.valid_from)
        assert sum(r.n_events for r in hist) == ev_counts[uid]
        assert sum(1 for r in hist if r.is_current) == 1
        assert hist[-1].is_current and hist[-1].valid_to is None
        for a, b in zip(hist, hist[1:]):
            assert a.valid_to == b.valid_from, f"gap/overlap for user {uid}"
        for a, b in zip(hist, hist[1:]):
            assert a.event_type != b.event_type, "uncollapsed adjacent runs"


def test_bpe_train_merges_matches_reference_trainer(spark):
    """The 3-round distributed BPE trainer equals a pure-Python
    reference implementation of Sennrich-style training on a
    constructed corpus that exercises every subtlety: overlapping
    occurrences ('aaaa' counts 'aa' 3x but rewrites to \\x01\\x01),
    a merge INTO a merged symbol in a later round, and the
    (count DESC, pair ASC) tie-break."""
    from collections import Counter

    from matrix_multiplication_map_reduce_gcp_spark import registry

    docs = [
        "aaaa aaaa banana banana bandana",
        "aaaa banana anan anan anan",
    ]

    def reference(texts, rounds=3):
        words = [w for t in texts for w in t.split(" ")]
        out = []
        for k in (1, 2, 3)[:rounds]:
            cnt = Counter()
            for w in words:
                for i in range(len(w) - 1):
                    cnt[w[i : i + 2]] += 1
            pair, n = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            words = [w.replace(pair, chr(k)) for w in words]
            out.append(
                (k, ord(pair[0]), ord(pair[1]), n,
                 sum(len(w) for w in words))
            )
        return out

    expected = reference(docs)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    df.createOrReplaceTempView("_bpe_docs")
    import tempfile, os
    with tempfile.TemporaryDirectory() as tmp:
        df.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
        got = sorted(
            (
                (r.merge_rank, r.left_code, r.right_code, r.pair_count,
                 r.tokens_after)
                for r in registry.load_all()["bpe_train_merges"]
                .fn(spark, tmp)
                .collect()
            )
        )
    assert got == expected, (got, expected)
    # the constructed corpus really exercises the subtleties:
    # round-1 winner 'an' (count 8 incl. overlapping 'anan' runs),
    # and a later round merges a pair containing a sentinel symbol
    assert expected[0][1:3] == (ord("a"), ord("n"))
    assert any(
        left < 4 or right < 4 for _, left, right, _, _ in expected
    ), "no merge into a merged symbol — corpus lost its point"
