"""Custom PySpark 4 Python DataSource: a deterministic dense-matrix
generator (`spark.read.format("matrixgen")`).

This is the engine-native replacement for the reference's random
matrix generation (reference test/test.py:42-43 fills matrices with
uniform ints 0..99 on the client): instead of generating on a single
node and uploading, the SOURCE is the generator — Spark plans N
partition readers that each emit their row range, so a 10^6-row
matrix materializes in parallel with no ingest step.

Determinism discipline: values derive from md5(seed|i|j) — no RNG
state, so every engine (and the DuckDB oracle, via the identical SQL
md5 formula) sees bit-identical matrices, and a re-read returns the
same data (a Spark source must be re-computable for fault recovery —
a `random()`-based source silently violates lineage replay).

Worker-shipping discipline: the DataSource classes are defined INSIDE
the factory below, so cloudpickle serializes them BY VALUE. Defined
at module top level they would pickle by reference and die with
ModuleNotFoundError on executors whose Python lacks this repo on
sys.path (the mapInPandas closure rule — same rule, class edition).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

VAL_MOD = 100  # uniform ints 0..99, the reference generator's range


def _build_source_class():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _RowRange(InputPartition):
        def __init__(self, start: int, end: int, n: int, seed: int):
            self.start, self.end, self.n, self.seed = start, end, n, seed

    class _Reader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", 10))
            self.seed = int(options.get("seed", 0))
            self.parts = max(1, min(int(options.get("partitions", 4)), self.n))

        def partitions(self):
            n, p = self.n, self.parts
            step = (n + p - 1) // p
            return [
                _RowRange(s, min(s + step, n), n, self.seed)
                for s in range(0, n, step)
            ]

        def read(self, part):
            import hashlib  # self-contained: no repo imports on workers

            for i in range(part.start, part.end):
                for j in range(part.n):
                    h = hashlib.md5(
                        f"m{part.seed}|{i}|{j}".encode()
                    ).hexdigest()[:8]
                    yield (i, j, int(h, 16) % VAL_MOD)

    class MatrixGenDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "matrixgen"

        def schema(self) -> str:
            return "i BIGINT, j BIGINT, v BIGINT"

        def reader(self, schema):
            return _Reader(self.options)

    return MatrixGenDataSource


def register_matrixgen(spark: SparkSession) -> None:
    """Register the matrixgen source on this session. Registration
    REPLACES any prior source of the same name, so calling again is
    always safe — an id(spark)-keyed seen-set would be wrong here (a
    GC'd session's id can be reused by a new session, which would then
    silently skip registration)."""
    spark.dataSource.register(_build_source_class())


def gen_value(seed: int, i: int, j: int) -> int:
    """Python replica of the cell formula (tests compare against it)."""
    import hashlib

    return int(hashlib.md5(f"m{seed}|{i}|{j}".encode()).hexdigest()[:8], 16) % VAL_MOD


def sql_gen_value(seed: int, i_expr: str, j_expr: str) -> str:
    """DuckDB mirror of the cell formula for oracle SQL."""
    return (
        f"CAST(CONCAT('0x', substr(md5(CONCAT('m{seed}|', {i_expr}, '|', {j_expr})), 1, 8)) AS BIGINT) % {VAL_MOD}"
    )
