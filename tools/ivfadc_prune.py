"""IVFADC partition-prune proof (VERDICT r10 #1): measure FILES and
BYTES actually read by `ivf_pq_topk` against the same index stored two
ways — `partitionBy("cell")` vs flat — at several batch shapes.

The claim under test: the search's `cell IN (probed-union)` filter is a
PARTITION filter on the partitioned store, so scan I/O is proportional
to the probed-cell union, not the corpus. Wall time cannot show this at
page-cache-resident local sizes (SCALE.md r10 concession); files/bytes
read from the executed plan's scan metrics can.

The honest axis is the probed-cell UNION across the query batch, not
per-query n_probe/n_cells: a 100-query batch at n_probe=0.25*n_cells
unions to ~every cell (coupon collector), so the grid below varies both
n_q and n_probe and reports expected union fraction alongside measured
files/bytes fractions.

Usage: python tools/ivfadc_prune.py [n] [--keep] [--corpus <parquet>]
       n defaults to 2_000_000 (the r10 measurement corpus);
       --corpus runs against a real embeddings table instead (e.g.
       the sf10 store's 200k rows, float32 cast to double).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from ncagg_spark.pipeline.pq import (  # noqa: E402
    build_ivf_pq_index,
    ivf_pq_topk,
    pq_train,
    read_ivf_pq_index,
    write_ivf_pq_index,
)
from ncagg_spark.pipeline.similarity import (  # noqa: E402
    _unit_scale,
    sample_centroids,
)
from ncagg_spark.plans.scanstats import scan_io_stats  # noqa: E402
from ncagg_spark.session import get_spark  # noqa: E402
from tools.scale_ann import DIM, synth_corpus  # noqa: E402

K = 5


def du(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) under a parquet store."""
    files = bytes_ = 0
    for root, _, names in os.walk(path):
        for f in names:
            if f.endswith(".parquet"):
                files += 1
                bytes_ += os.path.getsize(os.path.join(root, f))
    return files, bytes_


def expected_union(queries_np, cents, n_probe: int) -> list[int]:
    """Replicate ivf_pq_topk's probe ranking (raw-dot argsort against
    unit centroids) to get the probed-cell union for a query batch."""
    cents_s = sorted(cents, key=lambda cv: int(cv[0]))
    cell_ids = np.array([int(c) for c, _ in cents_s], dtype="int64")
    Cu = np.array([_unit_scale(v) for _, v in cents_s], dtype="float64").T
    order = np.argsort(-(queries_np @ Cu), axis=1, kind="stable")[
        :, :n_probe
    ]
    return sorted({int(c) for row in cell_ids[order] for c in row})


def main() -> None:
    keep = "--keep" in sys.argv
    corpus_path = None
    argv = [a for a in sys.argv[1:] if a != "--keep"]
    if "--corpus" in argv:
        corpus_path = argv[argv.index("--corpus") + 1]
        argv = [a for a in argv if a != "--corpus" and a != corpus_path]
    n = int(argv[0]) if argv else 2_000_000
    spark = get_spark(app_name="ivfadc-prune")
    spark.sparkContext.setLogLevel("ERROR")

    if corpus_path:
        from pyspark.sql import functions as F

        corpus = spark.read.parquet(corpus_path).select(
            "vec_id", F.col("embedding").cast("array<double>").alias(
                "embedding"
            )
        )
        n = corpus.count()
    else:
        corpus = synth_corpus(spark, n)
    corpus = corpus.repartition(32, "vec_id").persist()
    corpus.write.format("noop").mode("overwrite").save()

    n_cells = int(math.sqrt(n))
    t0 = time.time()
    cents = sample_centroids(corpus, n_cells)
    books = pq_train(corpus, dim=DIM, m=8, n_codes=64)
    index = build_ivf_pq_index(corpus, cents, books)
    t_model = time.time() - t0

    base = "/root/repo/.scale/ivfadc_store"
    part_dir, flat_dir = f"{base}/part", f"{base}/flat"
    t0 = time.time()
    write_ivf_pq_index(index, part_dir)
    t_part = time.time() - t0
    t0 = time.time()
    # flat twin: same rows, same file count granularity, no partitioning
    index.repartition(32).write.mode("overwrite").parquet(flat_dir)
    t_flat = time.time() - t0

    files_p, bytes_p = du(part_dir)
    files_f, bytes_f = du(flat_dir)
    print(
        f"# corpus n={n} dim={DIM} n_cells={n_cells}; model+encode "
        f"{t_model:.1f}s; store part {files_p} files/{bytes_p/1e6:.1f}MB "
        f"({t_part:.1f}s), flat {files_f} files/{bytes_f/1e6:.1f}MB "
        f"({t_flat:.1f}s)"
    )

    # batch-shape grid: production-ish probe counts and the r10
    # oracle-parity setting (n_probe = n_cells/4) at n_q=1
    grid = [
        (1, max(1, n_cells // 4)),  # r10 parity fraction, single query
        (1, 32),
        (10, 32),
        (100, 32),
        (100, 8),
    ]
    rows = []
    for n_q, n_probe in grid:
        stride = max(n // n_q, 1)
        queries = corpus.filter(f"vec_id % {stride} = 0").limit(n_q)
        q_np = np.array(
            [list(r["embedding"]) for r in queries.collect()],
            dtype="float64",
        )
        union = expected_union(q_np, cents, n_probe)
        exp_frac = len(union) / n_cells
        row = {
            "n_q": n_q,
            "n_probe": n_probe,
            "union_cells": len(union),
            "n_cells": n_cells,
            "expected_frac": round(exp_frac, 4),
        }
        for store, sdir in (("part", part_dir), ("flat", flat_dir)):
            idx = read_ivf_pq_index(spark, sdir)
            t0 = time.time()
            res = ivf_pq_topk(
                idx, cents, books, corpus, queries,
                k=K, expand=4, n_probe=n_probe,
            )
            stats = scan_io_stats(res)  # executes via collect()
            wall = time.time() - t0
            scans = [s for s in stats if s["path"] and sdir in s["path"]]
            nf = sum(s["numFiles"] or 0 for s in scans)
            nb = sum(s["filesSize"] or 0 for s in scans)
            tot_f, tot_b = (files_p, bytes_p) if store == "part" else (
                files_f, bytes_f,
            )
            row[f"{store}_files_read"] = nf
            row[f"{store}_bytes_read"] = nb
            row[f"{store}_files_frac"] = round(nf / tot_f, 4)
            row[f"{store}_bytes_frac"] = round(nb / tot_b, 4)
            row[f"{store}_wall_s"] = round(wall, 2)
        rows.append(row)
        print(json.dumps(row))

    print()
    print(
        "| n_q | n_probe | union/cells | part files read | part bytes "
        "frac | flat files read | flat bytes frac |"
    )
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['n_q']} | {r['n_probe']} | {r['union_cells']}/"
            f"{r['n_cells']} ({r['expected_frac']:.3f}) | "
            f"{r['part_files_read']}/{files_p} | "
            f"{r['part_bytes_frac']:.3f} | "
            f"{r['flat_files_read']}/{files_f} | "
            f"{r['flat_bytes_frac']:.3f} |"
        )

    if not keep:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
