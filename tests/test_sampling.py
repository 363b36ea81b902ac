"""Deterministic sampling / mixing / splitting (pipeline/sampling.py):
reproducibility under repartitioning and appends, split disjointness,
stratum and mix proportions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ncagg_spark.pipeline.sampling import (
    mix_corpora,
    sample_hash,
    split_train_val,
    stratified_sample,
)

N = 4000


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(N).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )


def test_sample_hash_fraction_and_determinism(docs):
    got = sample_hash(docs, 0.25, key_col="doc_id")
    n = got.count()
    assert abs(n - N * 0.25) < N * 0.05  # within 5pp of target
    a = {r["doc_id"] for r in got.collect()}
    b = {
        r["doc_id"]
        for r in sample_hash(
            docs.repartition(16, "doc_id"), 0.25, key_col="doc_id"
        ).collect()
    }
    assert a == b  # identical SET under repartitioning


def test_sample_hash_stable_under_appends(spark, docs):
    before = {
        r["doc_id"] for r in sample_hash(docs, 0.3).collect()
    }
    bigger = spark.range(2 * N).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("lang"),
    )
    after = {r["doc_id"] for r in sample_hash(bigger, 0.3).collect()}
    # every originally-kept row is still kept; no original row flips
    assert before == {d for d in after if d < N}


def test_sample_hash_salts_are_independent(docs):
    a = {r["doc_id"] for r in sample_hash(docs, 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in sample_hash(docs, 0.5, salt="b").collect()}
    overlap = len(a & b) / min(len(a), len(b))
    assert 0.3 < overlap < 0.7  # ~independent draws, not the same set


def test_split_train_val_disjoint_exhaustive(docs):
    train, val = split_train_val(docs, 0.2)
    t = {r["doc_id"] for r in train.collect()}
    v = {r["doc_id"] for r in val.collect()}
    assert not (t & v)
    assert len(t) + len(v) == N
    assert abs(len(v) - N * 0.2) < N * 0.05
    # membership never migrates on a rebuild from a superset
    train2, val2 = split_train_val(docs.repartition(8), 0.2)
    assert {r["doc_id"] for r in val2.collect()} == v


def test_stratified_sample_per_stratum(docs):
    got = stratified_sample(
        docs,
        {"0": 1.0, "1": 0.5, "2": 0.0},
        strata_col="lang",
        default_fraction=0.25,
    )
    by = {
        r["lang"]: r["n"]
        for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    per = N // 4
    assert by["0"] == per  # keep all
    assert "2" not in by  # drop all
    assert abs(by["1"] - per * 0.5) < per * 0.12
    assert abs(by.get("3", 0) - per * 0.25) < per * 0.12  # default


def test_mix_corpora_proportions(spark):
    web = spark.range(9000).select(F.col("id").alias("doc_id"))
    code = spark.range(1500).select((F.col("id") + 100000).alias("doc_id"))
    ref = spark.range(400).select((F.col("id") + 200000).alias("doc_id"))
    out = mix_corpora(
        {"web": web, "code": code, "ref": ref},
        {"web": 0.80, "code": 0.15, "ref": 0.05},
    )
    by = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    total = sum(by.values())
    # ref is the binding source: T = 400 / 0.05 = 8000 rows total
    assert abs(total - 8000) < 8000 * 0.06
    assert abs(by["web"] / total - 0.80) < 0.04
    assert abs(by["code"] / total - 0.15) < 0.03
    assert abs(by["ref"] / total - 0.05) < 0.02
    # no oversampling: every source's rows are unique originals
    assert out.count() == out.select("doc_id").distinct().count()


def test_mix_corpora_deterministic(spark):
    a = spark.range(2000).select(F.col("id").alias("doc_id"))
    b = spark.range(1000).select((F.col("id") + 50000).alias("doc_id"))
    m1 = mix_corpora({"a": a, "b": b}, {"a": 0.5, "b": 0.5})
    m2 = mix_corpora(
        {"a": a.repartition(16), "b": b.repartition(4)},
        {"a": 0.5, "b": 0.5},
    )
    assert sorted(r["doc_id"] for r in m1.collect()) == sorted(
        r["doc_id"] for r in m2.collect()
    )


def test_mix_corpus_labeled_matches_mix_corpora(spark):
    """The single-scan labeled overload (VERDICT r14 #2) produces the
    IDENTICAL row set + provenance as the dict-of-frames API over the
    same label slices — same _mix_fractions arithmetic, same per-label
    ticket salts — while deriving every per-source count from ONE
    groupBy job instead of one count() job per source."""
    from ncagg_spark.pipeline.sampling import mix_corpus_labeled

    df = spark.range(6000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 7 < 4, "en")
        .when(F.col("id") % 7 < 6, "de")
        .otherwise("zh")
        .alias("lang"),
    )
    props = {"en": 0.6, "de": 0.25, "zh": 0.15}
    via_frames = mix_corpora(
        {k: df.filter(F.col("lang") == k) for k in props}, props
    )
    via_label = mix_corpus_labeled(df, props, label_col="lang")
    a = sorted(
        (r["doc_id"], r["source"])
        for r in via_frames.select("doc_id", "source").collect()
    )
    b = sorted(
        (r["doc_id"], r["source"])
        for r in via_label.select("doc_id", "source").collect()
    )
    assert a == b and len(a) > 0


def test_mix_corpus_labeled_excludes_unlisted_and_fails_loud(spark):
    from ncagg_spark.pipeline.sampling import mix_corpus_labeled

    df = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en")
        .when(F.col("id") % 3 == 1, "de")
        .otherwise("xx")
        .alias("lang"),
    )
    out = mix_corpus_labeled(df, {"en": 0.5, "de": 0.5}, label_col="lang")
    langs = {r["source"] for r in out.select("source").distinct().collect()}
    assert langs == {"en", "de"}  # 'xx' rows are not a source
    # a positive-proportion label with zero rows raises, exactly like
    # mix_corpora (ADVICE r14 #1 — the oracle now errors the same way)
    with pytest.raises(ValueError, match="zero rows"):
        mix_corpus_labeled(
            df, {"en": 0.5, "fr": 0.5}, label_col="lang"
        )


def test_split_label_matches_split_train_val(spark):
    """The one-pass label column partitions rows EXACTLY as the
    two-frame API (same ticket, same floor(x+0.5) cut) — the labeled
    form exists so consumers don't scan the source twice."""
    from ncagg_spark.pipeline.sampling import split_label, split_train_val

    df = spark.range(3000).select(F.col("id").alias("doc_id"))
    train, val = split_train_val(df, 0.25, salt="s14")
    labeled = df.select(
        "doc_id", split_label(0.25, salt="s14").alias("split")
    )
    got_val = sorted(
        r["doc_id"] for r in labeled.filter("split = 'val'").collect()
    )
    got_train = sorted(
        r["doc_id"] for r in labeled.filter("split = 'train'").collect()
    )
    assert got_val == sorted(r["doc_id"] for r in val.collect())
    assert got_train == sorted(r["doc_id"] for r in train.collect())
    assert len(got_val) + len(got_train) == 3000
