"""Sources & sinks: parquet / JSON / CSV readers and writers with
save modes and partitioned layout (SURVEY.md §2.3 scans/sinks rows —
the reference's only I/O was GCS JSON blobs, orchestrator/main.py:54-64,
mapper/main.py:43-46)."""

from .io import read_any, write_any

__all__ = ["read_any", "write_any"]
