"""Executed-plan scan I/O statistics — the proof hook for partition
pruning claims (VERDICT r10 #1).

``scan_io_stats(df)`` executes a DataFrame via ``collect()`` and reads
back, from the SAME QueryExecution's final physical plan, each parquet
scan's driver-side I/O metrics: files read, bytes read, partitions read
(partitioned tables only). This is the ground truth for "the ``cell IN``
probe filter prunes the stored IVFADC index at the scan" — wall time
cannot show it at page-cache-resident local sizes, files/bytes read can.

Why not ``df.count()`` / a noop write: both build a NEW QueryExecution,
leaving the original plan's metrics untouched (the r10 audit_plans
gotcha). Why not the REST SQL endpoint: it needs ``spark.ui.enabled``
and execution-id attribution; the py4j plan walk reads the exact plan
that just ran, works under the test session, and needs no polling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SCAN_METRICS = (
    "numFiles",
    "filesSize",
    "numPartitions",
    "numOutputRows",
)


def _walk_scans(jplan, out: list) -> None:
    """Collect FileSourceScanExec nodes from an executed plan tree,
    descending through AQE wrapper nodes (AdaptiveSparkPlanExec /
    QueryStageExec hide the final subtree from collectLeaves)."""
    cls = jplan.getClass().getName()
    if "FileSourceScanExec" in cls:
        out.append(jplan)
        return
    # AQE wrappers expose their live subtree via executedPlan()/plan()
    for accessor in ("executedPlan", "plan"):
        if cls.endswith(("AdaptiveSparkPlanExec", "QueryStageExec")) or (
            "QueryStage" in cls and accessor == "plan"
        ):
            try:
                _walk_scans(getattr(jplan, accessor)(), out)
                return
            except Exception:
                pass
    children = jplan.children()
    for i in range(children.size()):
        _walk_scans(children.apply(i), out)
    # InMemoryTableScan / reused subtrees have no children() entries for
    # their cached child plan — fine: a cached relation is not a file
    # scan, pruning happened (or not) when it was materialized.


def scan_io_stats(df: DataFrame, *, run: bool = True) -> list[dict]:
    """Execute ``df`` and return one dict per parquet file scan in its
    final plan: ``{"path": ..., "numFiles": n, "filesSize": bytes,
    "numPartitions": n-or-None, "numOutputRows": n}``.

    ``numPartitions`` is None for non-partitioned tables (Spark only
    registers the metric for partitioned scans). ``path`` is the scan's
    root location string — match on it when a plan reads several tables.
    """
    if run:
        df.collect()
    scans: list = []
    _walk_scans(df._jdf.queryExecution().executedPlan(), scans)
    out = []
    for s in scans:
        m = s.metrics()
        row: dict = {"path": None}
        try:
            # HadoopFsRelation -> location.rootPaths
            roots = s.relation().location().rootPaths()
            if roots.size() > 0:
                row["path"] = roots.apply(0).toString()
        except Exception:
            pass
        for k in _SCAN_METRICS:
            row[k] = int(m.apply(k).value()) if m.contains(k) else None
        out.append(row)
    return out
