"""Eager localCheckpoint barrier with audit capture (round-13).

``localCheckpoint()`` materializes its input and replaces the logical plan
with an RDD scan — which also BLINDS the plan auditor to everything
upstream of the barrier. Round 12 demonstrated the failure mode twice: the
refine-family collect flags stopped firing (seven allowlist entries went
stale because the collect sat *under* the new per-pass barrier), and four
BOUNDED_SORT entries had to be added because the sort auditor lost sight
of the aggregation a barrier hid (VERDICT r12 "what's wrong" #3).

Every operator barrier therefore goes through this wrapper: when the audit
CLI / fleet plan test is running (``_capture`` set to a list), the INPUT
DataFrame — whose plan is the full pre-barrier sub-plan — is recorded so
the same collect/sort/cartesian/window audits run on what the barrier
hides. A planted unbounded collect under a barrier now trips the gate
(tests/test_plans.py::test_collect_gate_sees_through_barriers). Outside an
audit, the wrapper is exactly ``df.localCheckpoint()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# set by plans.inspect.audit_with_barriers while a query function runs
_capture: list[DataFrame] | None = None


def eager_barrier(df: DataFrame) -> DataFrame:
    """Eager lineage cut (materialize + truncate plan), audit-visible."""
    if _capture is not None:
        _capture.append(df)
    return df.localCheckpoint()
