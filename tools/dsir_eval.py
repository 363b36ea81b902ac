"""DSIR selection-quality evaluation (VERDICT r11 #6) — the Xie et al.
2023 §5 methodology, adapted to the synthetic corpus.

The corpus's `lang`/`source` labels carry NO distributional signal
(measured: per-label token frequencies and per-gram importance weights
are identical across labels — every doc is an iid draw from one
vocabulary), so no selection method can beat random on a label. The
eval therefore PLANTS a domain the way the repo's ANN family plants
recall targets: the "domain" is the top quartile of docs by relative
frequency of a probe token set (their empirical n-gram distributions
genuinely differ — that IS the domain shift DSIR is built to detect).

Protocol (no leakage):
  - feature(d)    = count of probe tokens / token count
  - domain        = docs with feature above the corpus 75th percentile
  - target-train  = even-doc_id half of the domain
  - pool          = everything else (odd-id domain docs + non-domain)
  - DSIR          = train log-ratios target-train vs pool, select k
  - random        = salted-hash ranking over the same pool, k docs

Metrics vs the random baseline:
  1. domain precision@k — selected docs in the (held-out) domain;
     random's expectation is the pool's domain rate;
  2. hashed-bigram KL(target-train || selected), add-alpha smoothed —
     the paper's distribution-match proxy, lower is better.

Usage: python tools/dsir_eval.py [sf_dir] [k]
Prints a markdown table + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ncagg_spark.functions.hashing import hash64  # noqa: E402
from ncagg_spark.pipeline.dsir import (  # noqa: E402
    _bucket,
    _grams,
    dsir_sample,
    hashed_ngram_logratios,
)
from ncagg_spark.pipeline.text import token_count, tokenize  # noqa: E402
from ncagg_spark.pipeline.topk import bounded_topk  # noqa: E402
from ncagg_spark.session import get_spark  # noqa: E402

N = 2
BUCKETS = 512
ALPHA = 1.0
SALT = "dsir"
PROBE_TOKENS = ("vector", "hash", "stream")


def bucket_hist(docs, text_col="text") -> np.ndarray:
    """Hashed-n-gram bucket occurrence histogram (length BUCKETS)."""
    rows = (
        docs.select(F.explode(_grams(text_col, N)).alias("gram"))
        .select(_bucket(F.col("gram"), BUCKETS, SALT).alias("bucket"))
        .groupBy("bucket")
        .count()
        .collect()
    )
    h = np.zeros(BUCKETS, dtype=np.float64)
    for r in rows:
        h[int(r["bucket"])] = float(r["count"])
    return h


def kl(p_counts: np.ndarray, q_counts: np.ndarray) -> float:
    """KL(p || q) with add-ALPHA smoothing on both histograms."""
    p = (p_counts + ALPHA) / (p_counts.sum() + ALPHA * BUCKETS)
    q = (q_counts + ALPHA) / (q_counts.sum() + ALPHA * BUCKETS)
    return float(np.sum(p * np.log(p / q)))


def evaluate(spark, sf_dir: str, k: int) -> dict:
    """Run the planted-domain protocol; returns the metrics dict."""
    probe_hits = F.size(
        F.filter(
            tokenize(F.col("text")),
            lambda t: t.isin(*PROBE_TOKENS),
        )
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(token_count(F.col("text")) > 0)
        .withColumn(
            "__feat",
            probe_hits.cast("double")
            / token_count(F.col("text")).cast("double"),
        )
    )
    (thr,) = docs.approxQuantile("__feat", [0.75], 0.001)
    docs = docs.withColumn("__domain", F.col("__feat") > F.lit(thr))

    target_train = docs.filter(
        F.col("__domain") & (F.col("doc_id") % 2 == 0)
    )
    pool = docs.filter(~F.col("__domain") | (F.col("doc_id") % 2 != 0))
    n_pool = pool.count()
    n_pool_domain = pool.filter(F.col("__domain")).count()
    base_rate = n_pool_domain / n_pool

    lr = hashed_ngram_logratios(
        target_train, pool, n=N, buckets=BUCKETS, alpha=ALPHA
    )
    sel = dsir_sample(pool, lr, k=k, n=N, buckets=BUCKETS).join(
        docs, "doc_id", "inner"
    )

    # deterministic random baseline: salted-hash ranking over the pool
    rnd = bounded_topk(
        pool.withColumn(
            "__rk", hash64(F.concat(F.lit("rndeval|"), F.col("doc_id")))
        ),
        [F.col("__rk").asc(), F.col("doc_id").asc()],
        k,
        id_col="doc_id",
    ).drop("__rk", "rank")

    prec_dsir = sel.filter(F.col("__domain")).count() / k
    prec_rnd = rnd.filter(F.col("__domain")).count() / k

    h_target = bucket_hist(target_train)
    kl_dsir = kl(h_target, bucket_hist(sel))
    kl_rnd = kl(h_target, bucket_hist(rnd))
    kl_pool = kl(h_target, bucket_hist(pool))

    return {
        "sf_dir": sf_dir,
        "k": k,
        "threshold": round(float(thr), 4),
        "pool_docs": n_pool,
        "pool_domain_rate": round(base_rate, 4),
        "precision_dsir": round(prec_dsir, 4),
        "precision_random": round(prec_rnd, 4),
        "kl_dsir": round(kl_dsir, 4),
        "kl_random": round(kl_rnd, 4),
        "kl_pool": round(kl_pool, 4),
        "dsir_beats_random": bool(
            prec_dsir > prec_rnd and kl_dsir < kl_rnd
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 300

    spark = get_spark(app_name="dsir-eval")
    spark.sparkContext.setLogLevel("ERROR")
    m = evaluate(spark, sf_dir, k)

    print(
        f"planted domain: top-quartile relative frequency of "
        f"{PROBE_TOKENS} (threshold {m['threshold']}); pool "
        f"{m['pool_docs']} docs, domain rate {m['pool_domain_rate']}"
    )
    print(f"| metric | DSIR (k={k}) | random (k={k}) | pool |")
    print("|---|---|---|---|")
    print(
        f"| domain precision | {m['precision_dsir']:.3f} "
        f"| {m['precision_random']:.3f} | {m['pool_domain_rate']:.3f} |"
    )
    print(
        f"| KL(target ‖ set), {BUCKETS} hashed-bigram buckets "
        f"| {m['kl_dsir']:.4f} | {m['kl_random']:.4f} "
        f"| {m['kl_pool']:.4f} |"
    )
    print(json.dumps(m))


if __name__ == "__main__":
    main()
