"""Same-session A/B helper (r15 methodology, memory: cross-process bench
deltas are noise — only interleaved A/B decides): time a named subset of
declared queries (median of $SPARK_GRAFT_BENCH_REPEATS, default 3,
through the noop sink) and print one JSON line. Run alternately from two
worktrees (old/new) several times and compare the medians.

Usage: python tools/ab_bench.py <query> [query ...]
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


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    spark = get_spark(app_name="ncagg-ab")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("events", "lineitem", "orders", "documents", "embeddings"):
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode(
                "overwrite"
            ).save()
    qs = entry.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for _ in range(repeats):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        out[name] = round(statistics.median(samples), 3)
        print(f"# {name}: {out[name]} {['%.2f' % s for s in samples]}",
              file=sys.stderr)
    print(json.dumps({"repo": REPO, "queries": out}))


if __name__ == "__main__":
    main()
