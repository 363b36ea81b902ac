"""Document-dedup pipeline: exact dedup, MinHash/LSH, n-gram Jaccard,
SimHash — small crafted corpora with hand-checkable expectations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ncagg_spark.pipeline.dedup import (
    exact_dedup,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard,
    simhash_near_duplicates,
    simhash_signatures,
)


@pytest.fixture()
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, "  the quick   brown fox jumps over the lazy dog again and again today "),  # ws-normalized dup
        (4, base.replace("lazy", "sleepy")),  # near dup
        (5, "completely different text about spark dataframes and parquet files here"),
        (6, "short doc"),  # fewer tokens than shingle_n
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_groups(docs):
    out = {r["keep_id"]: r["n_dups"] for r in exact_duplicates(docs).collect()}
    assert out[1] == 3  # docs 1,2,3 share a fingerprint
    assert out[4] == 1 and out[5] == 1 and out[6] == 1


def test_exact_dedup_keeps_min_id(docs):
    kept = sorted(r["doc_id"] for r in exact_dedup(docs).collect())
    assert kept == [1, 4, 5, 6]


def test_minhash_identical_docs_identical_sigs(docs):
    sigs = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2] == sigs[3]
    assert sigs[1] != sigs[5]
    assert len(sigs[1]) == 16
    # doc shorter than shingle_n: all-null signature, not a crash
    assert sigs[6] == [None] * 16


def test_lsh_finds_exact_and_near_dups(docs):
    sigs = minhash_signatures(docs)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(sigs).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs
    # near-dup shares most shingles -> should collide in >=1 of 4 bands
    assert (1, 4) in pairs
    assert not any(5 in p for p in pairs)


def test_ngram_jaccard_values(spark, docs):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 4), (1, 5)], "id_a long, id_b long"
    )
    j = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard(docs, pairs).collect()
    }
    assert j[(1, 2)] == pytest.approx(1.0)
    assert 0.0 < j[(1, 4)] < 1.0
    assert j[(1, 5)] == pytest.approx(0.0)


def test_simhash_dup_invariance_and_spread(docs):
    s = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert s[1] == s[2] == s[3]
    assert s[1] != s[5]
    assert all(0 <= v < (1 << 32) for v in s.values())


def test_simhash_near_duplicates(docs):
    sigs = simhash_signatures(docs)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_duplicates(sigs, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == 0
    assert not any(5 in p for p in pairs)


def test_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert exact_duplicates(empty).count() == 0
    assert minhash_signatures(empty).count() == 0
    assert simhash_signatures(empty).count() == 0
