"""Profile minhash LSH candidate-pair variants at sf0.1.

Usage: python tools/profile_lsh.py
       {current|postagg|sigscache|windowguard} [sf_dir]

Run each variant in its OWN process (persist/cache poisons repeat runs in
one session — see bench notes). Times signature+pairs end-to-end through
a noop sink.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> None:
    variants = ("current", "postagg", "sigscache", "windowguard")
    if len(sys.argv) < 2 or sys.argv[1] not in variants:
        sys.exit(f"usage: profile_lsh.py {{{'|'.join(variants)}}} [sf_dir]")
    variant = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from ncagg_spark.functions.hashing import band_hashes
    from ncagg_spark.pipeline.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
    )
    from ncagg_spark.session import get_spark
    from ncagg_spark.sources.tables import load_table

    spark = get_spark(app_name=f"lsh-prof-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, f"{sf_dir}/documents.parquet")
    d.write.format("noop").mode("overwrite").save()  # warm scan

    t0 = time.time()
    sigs = minhash_signatures(d, shingle_n=3, num_perm=16)

    if variant == "current":
        pairs = minhash_lsh_candidates(sigs)
    elif variant == "postagg":
        # no persist, no guard pre-pass: one shuffle, filter on size(ids)
        # AFTER collect_list (transiently materializes big buckets)
        bands = sigs.select(
            F.col("doc_id"),
            F.posexplode(band_hashes(F.col("sig"), 4, 4)).alias("band", "bh"),
        )
        buckets = (
            bands.groupBy("band", "bh")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .filter((F.size("ids") >= 2) & (F.size("ids") <= 1000))
        )
        pairs = (
            buckets.select(F.col("ids"), F.posexplode("ids").alias("i", "id_a"))
            .select(
                "id_a",
                F.explode(F.expr("slice(ids, i + 2, size(ids))")).alias(
                    "id_b"
                ),
            )
            .distinct()
        )
    elif variant == "windowguard":
        # ONE shuffle, no persist: rank members within each bucket
        # (window), keep cap+1, re-group (exchange-free — same keys),
        # drop buckets that hit cap+1. Memory bounded at cap+1 ids.
        from pyspark.sql import Window

        cap = 1000
        bands = sigs.select(
            F.col("doc_id"),
            F.posexplode(band_hashes(F.col("sig"), 4, 4)).alias("band", "bh"),
        )
        w = Window.partitionBy("band", "bh").orderBy("doc_id")
        ranked = bands.withColumn("__r", F.row_number().over(w)).filter(
            F.col("__r") <= cap + 1
        )
        buckets = (
            ranked.groupBy("band", "bh")
            .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
            .filter((F.size("ids") >= 2) & (F.size("ids") <= cap))
        )
        pairs = (
            buckets.select(F.col("ids"), F.posexplode("ids").alias("i", "id_a"))
            .select(
                "id_a",
                F.explode(F.expr("slice(ids, i + 2, size(ids))")).alias(
                    "id_b"
                ),
            )
            .distinct()
        )
    elif variant == "sigscache":
        # cache the small sig table; derive bands twice (banding is cheap
        # once sig is materialized), keep the pre-collect guard
        sigs = sigs.persist()
        sigs.count()
        pairs = minhash_lsh_candidates(sigs)
    else:
        raise SystemExit(f"unknown variant {variant}")

    pairs.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(f"{variant}: {dt:.2f}s")


if __name__ == "__main__":
    main()
