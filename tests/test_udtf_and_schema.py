"""Python UDTF surface (1→N table function) and cross-SF schema
stability of every registered query."""

from __future__ import annotations

import pytest

from matrix_multiplication_map_reduce_gcp_spark import registry

from .conftest import SF_SMOKE


def test_python_udtf_lateral_expansion(spark):
    """Python UDTF (Spark 3.5+): a table function splitting text into
    (token, position) rows, applied laterally — the custom-operator
    API beyond mapInPandas."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")[:5]):
                yield tok, i

    spark.udtf.register("tokenize5", Tokenize)
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(
        10
    ).createOrReplaceTempView("docs10")
    out = spark.sql(
        "SELECT d.doc_id, t.token, t.pos FROM docs10 d, LATERAL tokenize5(d.text) t"
    ).collect()
    assert len(out) == 50  # 10 docs × 5 tokens
    assert all(0 <= r.pos < 5 for r in out)


@pytest.mark.parametrize("name", sorted(registry.load_all()))
def test_schema_stable_across_sfs(spark, name):
    """Every query must produce the identical schema at sf0.001 and
    sf0.01 — schema drift across scale factors breaks the driver's
    stable-schema contract."""
    qd = registry.load_all()[name]
    s1 = qd.fn(spark, SF_SMOKE).schema
    s2 = qd.fn(spark, "/root/testdata/sf0.01").schema
    assert s1 == s2
