"""Reference-parity entry point: multiply two matrices in the
reference's own wire format.

The reference's user interface is an HTTP POST to the orchestrator
with two GCS blob names containing JSON list-of-lists matrices; the
result is another JSON list-of-lists blob (reference
orchestrator/main.py:41-158, test/test.py:59-73). A user switching to
this engine calls :func:`multiply_json` (or the module CLI) with the
same payloads and gets the same answer — computed as one Catalyst
join+agg plan instead of ~2,500 HTTP round-trips.

CLI: ``python -m matrix_multiplication_map_reduce_gcp_spark.matrix.facade A.json B.json -o C.json``
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession

from .coo import validate_matmul_dims
from .dense import coo_to_dense_rows, shred_json_matrix
from .coo import CooMatrix


def multiply_json(spark: SparkSession, a_json: str, b_json: str) -> str:
    """JSON list-of-lists × JSON list-of-lists → JSON list-of-lists.

    Mirrors the reference's end-to-end semantics, including the
    dimension check its live path skipped (orchestrator/main.py:187-188
    was commented out)."""
    a_rows = json.loads(a_json)
    b_rows = json.loads(b_json)
    a_shape = (len(a_rows), len(a_rows[0]) if a_rows else 0)
    b_shape = (len(b_rows), len(b_rows[0]) if b_rows else 0)
    validate_matmul_dims(*a_shape, *b_shape)

    a = CooMatrix(shred_json_matrix(spark, a_json), *a_shape)
    b = CooMatrix(shred_json_matrix(spark, b_json), *b_shape)
    c = a.multiply(b)

    dense_rows = {
        r["i"]: r["row"] for r in coo_to_dense_rows(c.df, c.n_cols).collect()
    }
    zero = [0.0] * c.n_cols
    return json.dumps([list(dense_rows.get(i, zero)) for i in range(c.n_rows)])


def main(argv: list[str] | None = None) -> None:
    import argparse

    from ..session import get_spark

    p = argparse.ArgumentParser(description="C = A @ B on JSON list-of-lists files")
    p.add_argument("a_path")
    p.add_argument("b_path")
    p.add_argument("-o", "--out", default="-")
    args = p.parse_args(argv)

    spark = get_spark(app_name="matrix_multiplication_map_reduce_gcp_spark-matmul")
    with open(args.a_path) as fa, open(args.b_path) as fb:
        result = multiply_json(spark, fa.read(), fb.read())
    if args.out == "-":
        print(result)
    else:
        with open(args.out, "w") as fo:
            fo.write(result)


if __name__ == "__main__":
    main()
