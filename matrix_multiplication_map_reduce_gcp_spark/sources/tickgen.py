"""Custom STREAMING Python DataSource (Spark 4
SimpleDataSourceStreamReader): a deterministic, offset-tracked tick
stream.

Where `matrixgen` (sources/matrixgen.py) shows the batch half of the
Python DataSource API, this shows the streaming half: the reader owns
an OFFSET (a plain dict checkpointed by the engine), each micro-batch
advances it by at most BATCH_ROWS, and `readBetweenOffsets` replays
any committed range on recovery — which is exactly the contract that
makes a custom source exactly-once under restarts. Cell values derive
from md5(tick_id): replays are bit-identical by construction, never
"close enough".

The total is finite (N_TOTAL) so tests can drive the stream to
exhaustion: with availableNow, each run consumes ONE pending
increment; restarting from the same checkpoint resumes at the
committed offset. tests/test_streaming.py drives several restarts
into an append parquet sink and asserts every tick landed exactly
once.

Classes are built inside the factory so cloudpickle ships them by
value (same worker-import rule as matrixgen)."""

from __future__ import annotations

from pyspark.sql import SparkSession

N_TOTAL = 200  # ticks the source ever emits
BATCH_ROWS = 60  # max ticks per micro-batch
VAL_MOD = 100


def _build_source_class():
    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    class _Reader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def _rows(self, lo: int, hi: int):
            import hashlib  # self-contained: no repo imports on workers

            # Materialized list, not a generator: the engine PICKLES
            # the prefetched rows when caching the increment for the
            # executors, and generators don't pickle.
            return [
                (k, int(hashlib.md5(f"t{k}".encode()).hexdigest()[:8], 16) % VAL_MOD)
                for k in range(lo, hi)
            ]

        def read(self, start):
            pos = start["pos"]
            end = min(pos + BATCH_ROWS, N_TOTAL)
            return iter(self._rows(pos, end)), {"pos": end}

        def readBetweenOffsets(self, start, end):
            # Recovery replay of a committed range — must equal what
            # read() produced, which md5 determinism guarantees.
            return iter(self._rows(start["pos"], end["pos"]))

    class TickGenDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "tickgen"

        def schema(self) -> str:
            return "tick_id BIGINT, cents BIGINT"

        def simpleStreamReader(self, schema):
            return _Reader()

    return TickGenDataSource


def register_tickgen(spark: SparkSession) -> None:
    """Register the tickgen stream source on this session.
    Registration REPLACES any prior source of the same name, so
    calling again is always safe — an id(spark)-keyed seen-set would
    be wrong here (a GC'd session's id can be reused by a new session,
    which would then silently skip registration)."""
    spark.dataSource.register(_build_source_class())


def gen_cents(tick_id: int) -> int:
    """Python replica of the tick value (tests compare against it)."""
    import hashlib

    return int(hashlib.md5(f"t{tick_id}".encode()).hexdigest()[:8], 16) % VAL_MOD
