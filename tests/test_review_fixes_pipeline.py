"""Regression tests for the pipeline/functions review findings:
zero-norm cosine under ANSI mode, SRP dim fail-fast, LSH banding
validation, per-granule CF epochs, tolerant CF units spellings, and
generic id types in the Arrow ANN paths.
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

from ncagg_spark.config import AggregationConfig
from ncagg_spark.functions.time import _parse_units
from ncagg_spark.pipeline.corpus import clean_corpus
from ncagg_spark.pipeline.dedup import minhash_lsh_candidates
from ncagg_spark.pipeline.pq import pq_encode, pq_topk, pq_train
from ncagg_spark.pipeline.similarity import (
    brute_force_topk,
    brute_force_topk_matmul,
    random_hyperplanes,
    srp_bucket,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_zero_norm_vector_does_not_crash(spark):
    """One all-zero embedding previously killed the job with
    DIVIDE_BY_ZERO under Spark's default ANSI mode; it now scores 0."""
    corpus = _emb(
        spark,
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
    )
    queries = _emb(spark, [(1, [1.0, 0.0])])
    out = brute_force_topk(corpus, queries, k=3).collect()
    scores = {r["neighbor_id"]: r["cosine"] for r in out}
    assert scores[3] == 0.0  # zero vector: cosine 0, not a crash
    assert scores[2] == 0.0


def test_srp_bucket_rejects_dim_mismatch(spark):
    planes = random_hyperplanes(4, 3)
    ok = spark.createDataFrame([([1.0, 2.0, 3.0],)], "v array<double>")
    assert ok.select(srp_bucket("v", planes)).count() == 1
    nul = spark.createDataFrame([(None,)], "v array<double>")
    assert (
        nul.select(srp_bucket("v", planes).alias("b")).collect()[0]["b"]
        is None
    )
    bad = spark.createDataFrame([([1.0, 2.0],)], "v array<double>")
    with pytest.raises(Exception, match="embedding length"):
        bad.select(srp_bucket("v", planes)).collect()


def test_lsh_banding_validated(spark):
    sigs = spark.createDataFrame(
        [(1, [1, 2, 3, 4, 5, 6, 7, 8])], "doc_id long, sig array<long>"
    )
    with pytest.raises(ValueError, match="banding"):
        minhash_lsh_candidates(sigs, num_perm=8)  # default 4x4 != 8


def test_clean_corpus_forwards_banding(spark):
    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 3)
         for i in range(4)],
        "doc_id long, text string",
    )
    # num_perm=8 with matching 2x4 banding runs; default 4x4 raises
    out = clean_corpus(
        docs, num_perm=8, num_bands=2, rows_per_band=4
    )
    assert out.count() >= 1
    with pytest.raises(ValueError, match="banding"):
        clean_corpus(docs, num_perm=8)


def test_parse_units_tolerant_spellings():
    cases = {
        "seconds since 2000-01-01T12:00:00Z":
            (1.0, datetime(2000, 1, 1, 12, tzinfo=timezone.utc)),
        "hours since 2000-01-01 00:00:0.0":
            (3600.0, datetime(2000, 1, 1, tzinfo=timezone.utc)),
        "seconds since 2000-01-01 00:00:00 UTC":
            (1.0, datetime(2000, 1, 1, tzinfo=timezone.utc)),
        "days since 2000-01-01 00:00:00 -06:00":
            (86400.0, datetime(2000, 1, 1, 6, tzinfo=timezone.utc)),
        "milliseconds since 1970-01-01":
            (1e-3, datetime(1970, 1, 1, tzinfo=timezone.utc)),
    }
    for units, (scale, epoch) in cases.items():
        s, e = _parse_units(units)
        assert (s, e) == (scale, epoch), units
    with pytest.raises(ValueError):
        _parse_units("parsecs since 2000-01-01")


def test_aggregate_nc_per_granule_epochs(spark, tmp_path):
    """Two granules with DIFFERENT CF epochs aggregate correctly: file
    B's records must not shift by the epoch difference."""
    from ncagg_spark.api import aggregate_nc
    from ncagg_spark.sources.netcdf3 import write_netcdf3

    t0 = 1_704_153_600  # 2024-01-02T00:00:00Z
    # A: seconds since the day start; B: same instants, epoch 1h later
    write_netcdf3(
        str(tmp_path / "a.nc"),
        dims=[("t", 0)],
        variables={"t": (["t"], np.array([0.0, 1.0, 2.0])),
                   "v": (["t"], np.array([1.0, 2.0, 3.0]))},
        var_attributes={"t": {"units": "seconds since 2024-01-02 00:00:00"}},
    )
    write_netcdf3(
        str(tmp_path / "b.nc"),
        dims=[("t", 0)],
        variables={"t": (["t"], np.array([-3595.0, -3594.0])),
                   "v": (["t"], np.array([5.0, 6.0]))},
        var_attributes={"t": {"units": "seconds since 2024-01-02 01:00:00"}},
    )
    cfg = AggregationConfig(
        index_by="t",
        cadence_hz=1.0,
        min_bound=t0,
        max_bound=t0 + 10,
    )
    out = aggregate_nc(
        spark,
        [str(tmp_path / "a.nc"), str(tmp_path / "b.nc")],
        str(tmp_path / "out"),
        cfg,
    )
    real = {
        # naive .timestamp() round-trips the collected local-naive
        # datetime correctly in ANY OS timezone (replace(tzinfo=utc)
        # would shift keys on a non-UTC machine)
        int(r["t"].timestamp() - t0): r["v"]
        for r in out.filter(~F.col("is_fill")).collect()
    }
    # B's records land at +5s/+6s, NOT 1h early (which would drop them)
    assert real == {0: 1.0, 1: 2.0, 2: 3.0, 5: 5.0, 6: 6.0}


def test_pq_and_matmul_support_string_ids(spark):
    rows = [(f"doc{i}", [float(i == j) for j in range(8)]) for i in range(6)]
    corpus = spark.createDataFrame(rows, "doc_id string, embedding array<double>")
    queries = corpus.limit(2)
    out = brute_force_topk_matmul(
        corpus, queries, k=2, id_col="doc_id"
    ).collect()
    assert out and all(isinstance(r["neighbor_id"], str) for r in out)

    books = pq_train(corpus, m=2, n_codes=4, dim=8, id_col="doc_id")
    codes = pq_encode(corpus, books, id_col="doc_id")
    assert codes.columns[0] == "doc_id"
    got = pq_topk(codes, books, queries, k=2, id_col="doc_id").collect()
    assert got and all(isinstance(r["neighbor_id"], str) for r in got)
