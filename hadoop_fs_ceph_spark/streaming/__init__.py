"""Structured Streaming surface.

The reference feeds engines a byte-stream filesystem; its streaming analog
in Spark is the file stream source over a table directory. Every streaming
operator here reads the ``events`` table with ``readStream``, applies
watermarked/windowed transformations, and drains with ``availableNow`` —
so each declared streaming query is a *finite* run whose result must equal
the equivalent batch query (and, where SQL-expressible, the DuckDB oracle).
"""

from hadoop_fs_ceph_spark.streaming.runner import (
    AuditStop,
    audit_gate,
    events_stream,
    run_to_memory,
    stream_state_width,
)

__all__ = [
    "AuditStop",
    "audit_gate",
    "events_stream",
    "run_to_memory",
    "stream_state_width",
]
