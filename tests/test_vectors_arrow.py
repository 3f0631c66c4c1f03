"""Bit-equality pin for the Arrow cosine kernel.

cosine_arrow replaces the interpreted zip_with/aggregate fold on hot
verify paths (embedding near-dup, SemDeDup, kNN graph). The whole
design rests on one claim: the NumPy kernel executes the SAME IEEE-754
operation sequence as the fold — elementwise products, sequential
index-order accumulation from a 0.0 seed, correctly-rounded sqrt and
divide — so its doubles are bit-identical, not merely close. These
tests pin that claim on adversarial random vectors (mixed magnitudes,
negatives, denormal-ish small values) and on the real fixture, with
exact == comparison on the raw (unrounded) doubles.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from matrix_multiplication_map_reduce_gcp_spark.functions.vectors import (
    as_double_array,
    cosine,
    cosine_arrow,
    cosine_rounded,
    cosine_rounded_arrow,
)


def _pairs_df(spark, n=500, dim=64, seed=7):
    rng = np.random.default_rng(seed)
    # Mixed magnitudes: exercise rounding at many exponents, not just
    # the fixture's unit-ish scale.
    scale = 10.0 ** rng.integers(-6, 7, size=(n, 1))
    a = (rng.standard_normal((n, dim)) * scale).tolist()
    b = (rng.standard_normal((n, dim)) * scale).tolist()
    return spark.createDataFrame(
        [(i, a[i], b[i]) for i in range(n)], "id long, a array<double>, b array<double>"
    )


def test_cosine_arrow_bit_identical_random(spark):
    df = _pairs_df(spark)
    rows = (
        df.select(
            "id",
            cosine(F.col("a"), F.col("b")).alias("fold"),
            cosine_arrow(F.col("a"), F.col("b")).alias("arrow"),
        )
        .collect()
    )
    assert len(rows) == 500
    for r in rows:
        # Exact bit equality — struct-pack compare to catch ±0.0/NaN.
        assert math.isnan(r.fold) == math.isnan(r.arrow)
        if not math.isnan(r.fold):
            assert r.fold == r.arrow and math.copysign(1, r.fold) == math.copysign(1, r.arrow), (
                r.id, r.fold.hex(), r.arrow.hex())


def test_cosine_rounded_arrow_bit_identical_fixture(spark):
    """On the real embeddings fixture: every same-label pair within a
    64-row sample, rounded values compared exactly (the rounded grid is
    what every oracle compares against)."""
    e = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 64)
        .select("vec_id", as_double_array("embedding").alias("v"))
    )
    a = e.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    rows = pairs.select(
        cosine_rounded(F.col("va"), F.col("vb")).alias("fold"),
        cosine_rounded_arrow(F.col("va"), F.col("vb")).alias("arrow"),
    ).collect()
    assert rows and all(r.fold == r.arrow for r in rows)


def test_cosine_arrow_empty_batch(spark):
    """A filter that empties a partition upstream must not crash the
    kernel (the kmeans empty-Arrow-batch regression, same class)."""
    df = _pairs_df(spark, n=8).filter(F.col("id") < 0)
    out = df.select(cosine_arrow(F.col("a"), F.col("b")).alias("c")).collect()
    assert out == []


@pytest.mark.parametrize("dim", [1, 2, 63, 64, 128])
def test_cosine_arrow_dims(spark, dim):
    rng = np.random.default_rng(dim)
    a = rng.standard_normal((40, dim)).tolist()
    b = rng.standard_normal((40, dim)).tolist()
    df = spark.createDataFrame(
        [(i, a[i], b[i]) for i in range(40)],
        "id long, a array<double>, b array<double>",
    )
    rows = df.select(
        cosine(F.col("a"), F.col("b")).alias("fold"),
        cosine_arrow(F.col("a"), F.col("b")).alias("arrow"),
    ).collect()
    assert all(r.fold == r.arrow for r in rows)


def test_cosine_arrow_mixed_dims_one_batch(spark):
    """One Arrow batch mixing dim-64 and dim-32 rows (each internally
    consistent: size(a)==size(b) per row) must compute — real corpora
    mix dims after embedding-model migrations — and stay bit-identical
    to the fold. Pre-fix the kernel's np.array(ragged) raised
    ValueError where the fold returned a value (VERDICT r6 #2)."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        dim = 64 if i % 2 == 0 else 32
        rows.append(
            (i, rng.standard_normal(dim).tolist(), rng.standard_normal(dim).tolist())
        )
    # coalesce(1): all rows land in ONE partition → one Arrow batch,
    # the exact shape that used to crash.
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    ).coalesce(1)
    got = df.select(
        "id",
        cosine(F.col("a"), F.col("b")).alias("fold"),
        cosine_arrow(F.col("a"), F.col("b")).alias("arrow"),
    ).collect()
    assert len(got) == 60
    assert all(r.fold == r.arrow for r in got)


def test_cosine_arrow_mixed_dims_with_nulls_one_batch(spark):
    """Mixed dims AND null/ragged rows in the same batch: the null
    contract and the per-length vectorization must compose."""
    rows = [
        (0, [1.0, 2.0], [3.0, 4.0]),
        (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
        (2, None, [1.0]),
        (3, [1.0, 2.0, 5.0], [3.0, 4.0]),  # ragged -> NULL
        (4, [7.0], [9.0]),
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    ).coalesce(1)
    got = {
        r.id: (r.fold, r.arrow)
        for r in df.select(
            "id",
            cosine_rounded(F.col("a"), F.col("b")).alias("fold"),
            cosine_rounded_arrow(F.col("a"), F.col("b")).alias("arrow"),
        ).collect()
    }
    for i in (0, 1, 4):
        assert got[i][0] == got[i][1] and got[i][0] is not None, (i, got[i])
    for i in (2, 3):
        assert got[i] == (None, None), (i, got[i])


def test_cosine_arrow_null_semantics_match_fold(spark):
    """Null array, null element, and length mismatch must all yield
    NULL (the fold's contract: zip_with pads/propagates null) — never
    a crash and never NaN, which Spark orders ABOVE every number and
    would therefore sail through >= threshold filters."""
    rows = [
        (0, [1.0, 2.0], [3.0, 4.0]),      # clean
        (1, None, [3.0, 4.0]),            # null array
        (2, [1.0, None], [3.0, 4.0]),     # null element
        (3, [1.0, 2.0, 5.0], [3.0, 4.0]), # ragged
    ]
    df = spark.createDataFrame(
        rows, "id long, a array<double>, b array<double>"
    )
    got = {
        r.id: (r.fold, r.arrow)
        for r in df.select(
            "id",
            cosine_rounded(F.col("a"), F.col("b")).alias("fold"),
            cosine_rounded_arrow(F.col("a"), F.col("b")).alias("arrow"),
        ).collect()
    }
    assert got[0][0] == got[0][1] and got[0][0] is not None
    for i in (1, 2, 3):
        assert got[i] == (None, None), (i, got[i])
    # And the threshold filter drops the bad rows on both paths.
    n = df.filter(
        cosine_rounded_arrow(F.col("a"), F.col("b")) >= -1.0
    ).count()
    assert n == 1


def test_bucket_arrow_bit_identical_to_fold(spark):
    """The r12 LSH bucketing kernel (lsh.bucket_arrow) must produce
    the IDENTICAL bucket id as the interpreted fold (lsh.bucket_expr)
    for every row — each plane's dot uses the same IEEE op sequence,
    so every sign bit agrees. Pinned on adversarial random vectors at
    both the default and the max plane count, plus the null contract
    (null array / null element / ragged -> bucket 0 on both paths)."""
    from matrix_multiplication_map_reduce_gcp_spark.similarity.lsh import (
        N_PLANES_MAX,
        bucket_arrow,
        bucket_expr,
    )

    df = _pairs_df(spark, n=500)
    for planes in (8, N_PLANES_MAX):
        got = df.select(
            bucket_expr(F.col("a"), n_planes=planes).alias("fold"),
            bucket_arrow(F.col("a"), n_planes=planes).alias("arrow"),
        ).collect()
        assert all(r.fold == r.arrow for r in got), planes

    rows = [
        (0, [1.0] * 64),          # clean
        (1, None),                # null array
        (2, [1.0, None] + [0.0] * 62),  # null element
        (3, [1.0, 2.0]),          # ragged (dim != 64)
    ]
    ndf = spark.createDataFrame(rows, "id long, a array<double>")
    got = {
        r.id: (r.fold, r.arrow)
        for r in ndf.select(
            "id",
            bucket_expr(F.col("a")).alias("fold"),
            bucket_arrow(F.col("a")).alias("arrow"),
        ).collect()
    }
    assert got[0][0] == got[0][1]
    for i in (1, 2, 3):
        assert got[i] == (0, 0), (i, got[i])


def test_sq8_degenerate_inputs_fail_loudly_and_codes_match_fold(spark):
    """ADVICE r12: the old Arrow kernel cast a zero-norm vector's NaN
    codes to an undefined int64 and crashed opaquely inside np.array on
    a null embedding row, while the JVM fold raises DIVIDE_BY_ZERO
    under the session's ANSI mode. Pin (a) dot-for-dot equality with
    the fold's codes on a healthy corpus, (b) a loud ValueError on a
    zero-norm row (the fold's failure class), (c) a loud ValueError on
    a null row."""
    import numpy as np
    import pytest

    from matrix_multiplication_map_reduce_gcp_spark.similarity.quantization import (
        code_arrays, sq8_scored_arrow)

    rng = np.random.RandomState(21)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(6)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fold = {
        r["vec_id"]: np.array(list(r["codes"]), dtype=np.int64)
        for r in code_arrays(e).collect()
    }
    scored = {
        (r["query_id"], r["neighbor_id"]): r["qdot"]
        for r in sq8_scored_arrow(e, 2).collect()
    }
    for q in range(2):
        for nbr in fold:
            if nbr == q:
                continue
            assert scored[(q, nbr)] == int(fold[q] @ fold[nbr]), (q, nbr)

    # Zero-norm corpus vector: loud failure (the fold raises
    # DIVIDE_BY_ZERO; the kernel must not emit undefined codes).
    rows_zero = rows + [(90, [0.0] * 8)]
    e_zero = spark.createDataFrame(
        rows_zero, "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="zero-norm|DIVIDE_BY_ZERO"):
        sq8_scored_arrow(e_zero, 2).collect()

    # Null embedding row: loud contract failure, not an opaque crash.
    rows_bad = rows + [(99, None)]
    e_bad = spark.createDataFrame(
        rows_bad, "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="corpus contract|null embedding"):
        sq8_scored_arrow(e_bad, 2).collect()
