"""Same-session interleaved A/B: simhash_near_duplicates candidate
scheme — r15 degenerate k=1 (block_bits=8, 4 tables of 8-bit keys) vs
r16 combination scheme (block_bits=4, C(8,5)=56 tables of 20-bit keys).

Both arms run in ONE session (same JVM/JIT/page cache), alternating
ABAB per repeat, timing (a) the candidate pipeline alone via
pairs.write(noop) and (b) the end-to-end near_dedup consumer. Results
are identical by pigeonhole (pinned by
tests/test_round16_fixes.py::test_simhash_combination_scheme_parity and
the 82/82 oracle gate); this tool measures the cost.

Usage: python tools/ab_simhash.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ncagg_spark.pipeline.dedup import (  # noqa: E402
    near_dedup,
    simhash_near_duplicates,
    simhash_signatures,
)
from ncagg_spark.session import get_spark  # noqa: E402
from ncagg_spark.sources.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf10"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab-simhash")
    spark.sparkContext.setLogLevel("ERROR")

    def pairs_of(block_bits: int):
        d = load_table(spark, f"{sf_dir}/documents.parquet")
        sigs = simhash_signatures(d)
        return simhash_near_duplicates(
            sigs, max_hamming=3, block_bits=block_bits
        ).select("id_a", "id_b")

    def run_pairs(block_bits: int) -> float:
        spark.sparkContext.setJobDescription(
            f"ab-simhash pairs block_bits={block_bits}"
        )
        t0 = time.time()
        pairs_of(block_bits).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def run_near_dedup(block_bits: int) -> float:
        spark.sparkContext.setJobDescription(
            f"ab-simhash near_dedup block_bits={block_bits}"
        )
        d = load_table(spark, f"{sf_dir}/documents.parquet")
        t0 = time.time()
        near_dedup(
            d, pairs_of(block_bits), num_partitions=None, unique_pairs=True
        ).select("doc_id", "n_members").write.format("noop").mode(
            "overwrite"
        ).save()
        return time.time() - t0

    # untimed warmup (footer caches, codegen shapes)
    load_table(spark, f"{sf_dir}/documents.parquet").write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for stage, fn in (("pairs", run_pairs), ("near_dedup", run_near_dedup)):
        for _ in range(repeats):
            for bb in (8, 4):
                out.setdefault(f"{stage}_bb{bb}", []).append(fn(bb))
    print(f"# {sf_dir} repeats={repeats}")
    for k, v in out.items():
        print(
            f"{k}: median {statistics.median(v):.2f}s "
            f"(samples {[round(x, 2) for x in v]})"
        )


if __name__ == "__main__":
    main()
