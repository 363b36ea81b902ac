"""Same-session interleaved A/B for spark.sql.join.preferSortMergeJoin
(VERDICT r15 #4/#5: the r15 session default `false` was a measured wash
at sf0.1 — prove it at sf1/sf10 or revert).

preferSortMergeJoin is a runtime SQL conf, so the A/B runs in ONE
session with the conf toggled per repeat (ABAB... per query): no
cross-process noise, identical JVM/JIT/page-cache state for both arms.

Usage: SPARK_GRAFT_SF_DIR=<dir> python tools/ab_shj.py [query ...]
defaults: the join-heavy declared set.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry  # noqa: E402
from ncagg_spark.session import get_spark  # noqa: E402

JOIN_HEAVY = [
    "rel_q3_topk",
    "rel_q5_nation_volume",
    "rel_anti_join",
    "rel_semi_join",
    "evt_asof_purchase",
    "evt_sessionize_skew",
]

KEY = "spark.sql.join.preferSortMergeJoin"


def main() -> None:
    names = sys.argv[1:] or JOIN_HEAVY
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = max(1, int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3")))
    spark = get_spark(app_name="ncagg-ab-shj")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("events", "lineitem", "orders", "customer", "supplier",
              "nation", "region", "part"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode(
                "overwrite"
            ).save()
    qs = entry.queries()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        samples: dict[str, list[float]] = {"shj": [], "smj": []}
        # untimed warmup once per query so neither arm absorbs the
        # first-plan codegen cost
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for _ in range(rounds):
            for arm, pref in (("shj", "false"), ("smj", "true")):
                spark.conf.set(KEY, pref)
                spark.sparkContext.setJobDescription(f"{name} [{arm}]")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples[arm].append(time.time() - t0)
        spark.conf.unset(KEY)  # back to the session default
        out[name] = {
            arm: round(statistics.median(v), 3)
            for arm, v in samples.items()
        }
        out[name]["shj_over_smj"] = round(
            out[name]["shj"] / max(out[name]["smj"], 1e-9), 3
        )
        print(
            f"# {name}: shj={out[name]['shj']} smj={out[name]['smj']} "
            f"ratio={out[name]['shj_over_smj']} "
            f"(shj {['%.2f' % s for s in samples['shj']]}, "
            f"smj {['%.2f' % s for s in samples['smj']]})",
            file=sys.stderr,
        )
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds, "queries": out}))


if __name__ == "__main__":
    main()
