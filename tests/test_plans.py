"""Physical-plan regression guards: the scale properties claimed in
SCALE.md must be visible in the plans, not just asserted in prose.

- no row-at-a-time Python (BatchEvalPython) anywhere — Python only via
  Arrow (mapInPandas) in the multimodal path;
- no cartesian/nested-loop joins except the two intentional
  broadcast-query-side scans (brute-force ANN, exact near-dup baseline);
- column pruning reaches the lineitem scan in q1 (ReadSchema subset);
- the events time predicate is pushed to the scan in the flagship.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

# crossJoin against a broadcast handful of query vectors is the intended
# physical shape for the exact baselines only:
# the two exact ANN baselines + the PQ ADC scoring join (broadcast NL
# against the 10-row query side — bounded by construction)
# declared-bounded cross/NL joins:
#   emb_brute_topk / emb_near_dup / emb_pq_topk — exact ANN baselines,
#     broadcast NL against the <=O(100)-row query side;
#   agg_regularize_anchored — gap_fill(anchor="previous") broadcasts the
#     ONE-ROW first-real-record aggregate onto the grid (the backward
#     leading-fill anchor, r7); a 1-row broadcast side by construction.
CROSS_OK = {
    "emb_brute_topk",
    "emb_near_dup",
    "emb_pq_topk",
    "agg_regularize_anchored",
}


def _plan(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark):
    return {name: _plan(spark, name) for name in entry_mod.queries()}


def test_no_rowwise_python_udfs(plans):
    for name, plan in plans.items():
        assert "BatchEvalPython" not in plan, f"{name} uses row-wise Python"


def test_no_unexpected_cartesian_joins(plans):
    for name, plan in plans.items():
        if name in CROSS_OK:
            continue
        assert "CartesianProduct" not in plan, f"{name} has a cartesian join"
        assert (
            "BroadcastNestedLoopJoin" not in plan
        ), f"{name} has a nested-loop join"


def test_q1_prunes_lineitem_columns(plans):
    plan = plans["rel_q1_pricing"]
    scan = plan.split("ReadSchema", 1)[1].splitlines()[0]
    # 16-column lineitem: only the 6 referenced columns may be read
    assert "l_comment" not in scan and "l_orderkey" not in scan
    assert "l_quantity" in scan and "l_returnflag" in scan


def test_flagship_pushes_time_range(plans):
    # the RANGE predicate (not just IsNotNull) must reach the scan — it is
    # applied on the raw nanos long before conversion (sources/tables.py)
    plan = plans["agg_bounds_filter"]
    pushed = plan.split("PushedFilters", 1)[1].splitlines()[0]
    assert "GreaterThanOrEqual(ts" in pushed
    assert "LessThan(ts" in pushed
