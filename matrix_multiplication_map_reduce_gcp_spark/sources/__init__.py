"""Sources & sinks: parquet / JSON / CSV readers and writers with
save modes and partitioned layout (SURVEY.md §2.3 scans/sinks rows —
the reference's only I/O was GCS JSON blobs, orchestrator/main.py:54-64,
mapper/main.py:43-46)."""

from .connectors import ConnectorUnavailable, read_delta, read_iceberg, read_kafka_stream
from .io import read_any, write_any
from .maintenance import compact_parquet, dir_bytes, parquet_file_count

__all__ = [
    "ConnectorUnavailable",
    "compact_parquet",
    "dir_bytes",
    "parquet_file_count",
    "read_any",
    "read_delta",
    "read_iceberg",
    "read_kafka_stream",
    "write_any",
]
