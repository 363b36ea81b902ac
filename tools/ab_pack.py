"""Same-session interleaved A/B for the packing counts materialization
(r16: token_offsets localCheckpoints the narrow (id, n_tok) frame when
the source subtree's size estimate crosses the gate, so the corpus
tokenize pass runs once instead of once per consumer).

The gate reads $NCAGG_PACK_MATERIALIZE_MIN_BYTES at call time, so the
A/B runs in ONE session with the env toggled per repeat (ABAB per
query): no cross-process noise, identical JVM/JIT/page-cache state for
both arms. Arm A (huge threshold) is the pre-change lazy plan — the
gate-off path is byte-identical to the r15 shape — and arm B (0) is
the checkpointed path.

Usage: SPARK_GRAFT_SF_DIR=<dir> python tools/ab_pack.py [repeats]
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

ENV = "NCAGG_PACK_MATERIALIZE_MIN_BYTES"
QUERIES = ["doc_pack_sequences", "doc_pack_bpeish"]


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ncagg-ab-pack")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/documents.parquet").write.format(
        "noop"
    ).mode("overwrite").save()
    qs = entry.queries()
    out: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        fn = qs[name]
        samples: dict[str, list[float]] = {"lazy": [], "ckpt": []}
        for _ in range(repeats):
            for arm, val in (("lazy", str(1 << 60)), ("ckpt", "0")):
                os.environ[ENV] = val
                spark.sparkContext.setJobDescription(f"{name}[{arm}]")
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples[arm].append(time.time() - t0)
        os.environ.pop(ENV, None)
        out[name] = {
            arm: round(statistics.median(v), 3)
            for arm, v in samples.items()
        }
        print(
            f"# {name}: lazy {out[name]['lazy']} ckpt {out[name]['ckpt']}"
            f"  ({['%.2f' % s for s in samples['lazy']]} vs"
            f" {['%.2f' % s for s in samples['ckpt']]})",
            file=sys.stderr,
        )
    print(json.dumps({"sf_dir": sf_dir, "repeats": repeats, "ab": out}))


if __name__ == "__main__":
    main()
