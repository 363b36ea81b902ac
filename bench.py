"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": <sf>}

Each query is timed end-to-end with ``df.write.format("noop")`` — the
standard Spark benchmarking sink: it fully evaluates every output column
(a bare count() would let Catalyst prune the expensive expressions and
measure nothing) without driver-side row conversion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from ncagg_spark.session import get_spark

# Representative, scale-sensitive subset of queries(): the reference's
# core regularization path, the relational star-schema set, the dedup /
# similarity / text pipeline ops. Every query is evaluated through the
# noop sink (full output materialization, no driver-side rows).
BENCH_QUERIES = [
    "agg_regularize_day",
    "agg_regularize_anchored",
    "agg_dedup_cadence",
    "agg_manifest_attrs",
    "evt_sessionize",
    "evt_asof_purchase",
    "rel_q1_pricing",
    "rel_q3_topk",
    "rel_q5_nation_volume",
    "rel_window_topk",
    "rel_rollup",
    "rel_anti_join",
    "agg_multidim",
    "doc_exact_dedup",
    "doc_text_stats",
    "doc_minhash_sig",
    "doc_lsh_pairs",
    "doc_simhash",
    "emb_brute_topk",
    "emb_ivf_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="ncagg-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM / parquet footer caches so the first measured query
    # isn't charged for session spin-up (steady-state numbers).
    for t in (
        "events", "lineitem", "orders", "customer", "supplier",
        "nation", "region", "part", "documents", "embeddings",
    ):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.format("noop").mode(
            "overwrite"
        ).save()

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
