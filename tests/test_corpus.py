"""End-to-end corpus cleaning: planted junk, exact dups, near-dups, and
benchmark contamination must each be removed by the right stage.
"""

from __future__ import annotations

import pytest

from ncagg_spark.pipeline.corpus import clean_corpus

GOOD = (
    "the committee published its annual report on regional water "
    "management and reviewed the infrastructure maintenance schedule "
    "for the coming fiscal year with several detailed recommendations"
)
GOOD2 = (
    "astronomers observed the distant galaxy cluster through the new "
    "telescope array and recorded unusual radio emissions over several "
    "nights of continuous monitoring during the winter campaign"
)
NEAR_DUP = GOOD.replace("annual", "yearly")  # high word-shingle overlap


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),        # exact duplicate of 1
        (3, NEAR_DUP),    # near duplicate of 1
        (4, GOOD2),
        (5, "x x x x"),   # junk: fails the quality gate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_clean_corpus_stages(corpus):
    got = clean_corpus(corpus, min_quality=0.3, jaccard_threshold=0.5)
    by_id = {r["doc_id"]: r["n_members"] for r in got.collect()}
    # 5 junk-filtered; 2 exact-dup removed; 3 near-dup clustered into 1
    assert set(by_id) == {1, 4}
    assert by_id[1] == 2  # doc 1 represents {1, 3}
    assert by_id[4] == 1


def test_clean_corpus_decontamination(spark, corpus):
    bench = spark.createDataFrame(
        [(100, GOOD2)], "bench_id long, text string"
    )
    got = clean_corpus(
        corpus,
        min_quality=0.3,
        jaccard_threshold=0.5,
        benchmark=bench,
        max_bench_frac=0.5,
    )
    # doc 4 is a verbatim copy of the benchmark doc -> dropped
    assert {r["doc_id"] for r in got.collect()} == {1}


def test_clean_corpus_preserves_columns(spark):
    rows = [(1, GOOD, "en"), (2, GOOD2, "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = clean_corpus(df)
    assert set(got.columns) == {"doc_id", "text", "lang", "n_members"}
    assert got.count() == 2


def test_clean_corpus_repetition_gate(spark):
    from ncagg_spark.pipeline.corpus import clean_corpus

    docs = spark.createDataFrame(
        [
            (1, "normal document with several distinct words here"),
            (2, "spam spam\nspam spam\nspam spam\nspam spam"),
        ],
        "doc_id long, text string",
    )
    kept = clean_corpus(docs, max_dup_line_frac=0.3)
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_clean_corpus_span_gate(spark):
    shared = (
        "this exact licensing paragraph appears verbatim in both "
        "documents word for word without any change at all"
    )
    distinct = (
        "harbor engineers completed the quarterly inspection of the "
        "breakwater foundations and filed separate findings about "
        "sediment drift patterns near the northern channel markers"
    )
    rows = [
        (1, GOOD + " " + shared),
        (2, GOOD2 + " " + shared + " plus unique trailing content"),
        (3, distinct),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # without the gate all three survive (distinct docs overall)
    assert clean_corpus(docs).count() == 3
    # with it, the higher id of the span-sharing pair is dropped
    kept = clean_corpus(docs, max_shared_span=12)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {1, 3}


def test_clean_corpus_lm_fluency_gate(spark):
    from pyspark.sql import functions as F

    from ncagg_spark.pipeline.lm import lm_score, ngram_lm

    fluent = "the cat sat on the mat near the door"
    gibberish = "zx qy vw kj pf tb nm rr ss tt"
    docs = spark.createDataFrame(
        [(1, fluent), (2, fluent + " again today"), (3, gibberish)],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(i, fluent) for i in range(10, 14)], "doc_id long, text string"
    )
    # pick the cut between the in-domain and gibberish scores
    scores = {
        r["doc_id"]: r["avg_nll"]
        for r in lm_score(docs, ngram_lm(ref, n=2), n=2).collect()
    }
    cut = (max(scores[1], scores[2]) + scores[3]) / 2
    # without the gate: all three survive (distinct docs)
    assert clean_corpus(docs).count() == 3
    kept = clean_corpus(docs, lm_reference=ref, max_avg_nll=cut)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids == {1, 2}
