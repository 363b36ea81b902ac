"""Round-16 pins (optimization round 2 of 2):

1. CC seam (VERDICT r15 #6): the same pair graph solved just UNDER the
   driver gate (vectorized numpy path) and just OVER it (distributed
   loop) produces identical clusterings — the gate is a pure
   performance switch.
2. NULL edge ids (ADVICE r15): the driver path declines graphs with
   NULL ids and the gate falls back to the distributed loop instead of
   raising from ``to_numpy``.
3. bm25 single-tokenize restructure (VERDICT r15 #2): the r16 narrow
   (one corpus pass) form returns exactly the rows of the r15
   three-subtree form, reconstructed inline here as the spec.
4. ``clean_corpus(keep_cached=True)`` (VERDICT r15 #3) returns the same
   survivors as the default hygiene path, plus the cache handle.
5. ``gap_fill(anchor="previous")`` input materialization returns
   identical rows (leading fills included) — pinned on a case with a
   leading gap, an interior gap and a trailing gap.
"""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from ncagg_spark.operators.dedup import cadence_bucket, dedup_cadence  # noqa: E402
from ncagg_spark.operators.gapfill import gap_fill  # noqa: E402
from ncagg_spark.pipeline.corpus import clean_corpus  # noqa: E402
from ncagg_spark.pipeline.dedup import connected_components  # noqa: E402
from ncagg_spark.pipeline.search import bm25_topk  # noqa: E402
from ncagg_spark.pipeline.text import token_count, tokenize  # noqa: E402
from ncagg_spark.pipeline.topk import bounded_topk  # noqa: E402


def _cc_rows(spark, pairs, gate, monkeypatch):
    monkeypatch.setenv("NCAGG_CC_DRIVER_MAX_EDGES", str(gate))
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = connected_components(df, num_partitions=None, unique_pairs=True)
    return sorted((r.node, r.cluster_id) for r in out.collect())


def test_cc_seam_driver_vs_loop_identical(spark, monkeypatch):
    # chain (diameter > 1 round), a triangle-ish clique and singles —
    # 12 pairs -> 24 symmetric edge rows
    pairs = (
        [(i, i + 1) for i in range(6)]  # chain 0..6
        + [(10, 11), (11, 12), (10, 12)]  # clique
        + [(20, 21), (30, 31), (40, 41)]
    )
    n_edges = 2 * len(pairs)
    under = _cc_rows(spark, pairs, n_edges, monkeypatch)  # gate fits -> driver
    over = _cc_rows(spark, pairs, n_edges - 1, monkeypatch)  # too big -> loop
    assert under == over
    # and the clustering is the min-label spec
    assert (6, 0) in under and (12, 10) in under and (41, 40) in under


def test_cc_null_ids_fall_back_to_loop(spark, monkeypatch):
    monkeypatch.setenv("NCAGG_CC_DRIVER_MAX_EDGES", "1000000")
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (None, 5)], "id_a long, id_b long"
    )
    # must not raise (driver path declines, loop runs)
    out = connected_components(df, num_partitions=None, unique_pairs=True)
    got = {(r.node, r.cluster_id) for r in out.collect() if r.node is not None}
    assert {(1, 1), (2, 1), (3, 1)} <= got


def _bm25_topk_r15_spec(docs, terms, *, k, k1=1.2, b=0.75):
    """The r15 three-subtree form, verbatim, as the equivalence spec."""
    MICRO = 1_000_000.0
    base = docs.select(
        F.col("doc_id"),
        token_count("text").cast("double").alias("dl"),
        F.explode(tokenize("text")).alias("tok"),
    ).filter(F.col("tok").isin(sorted(set(terms))))
    tf = base.groupBy("doc_id", "dl", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    consts = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum(token_count("text")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_part = (
        F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    contrib = (
        tf.join(F.broadcast(dfreq), on="tok")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            F.floor(idf * tf_part * F.lit(MICRO)).cast("long").alias("c_micro"),
        )
    )
    scores = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        (F.sum("c_micro").cast("double") / F.lit(MICRO)).alias("score"),
    )
    return bounded_topk(
        scores,
        [F.col("score").desc(), F.col("doc_id").asc()],
        k,
        id_col="doc_id",
    ).select("doc_id", "n_terms", "score", "rank")


def test_bm25_narrow_equals_r15_form(spark):
    rows = []
    words = ["data", "spark", "corpus", "filter", "index", "query"]
    for i in range(40):
        toks = [words[(i + j) % len(words)] for j in range(3 + i % 7)]
        if i % 5 == 0:
            toks += ["spark", "spark"]
        if i % 9 == 0:
            toks = []  # empty text
        rows.append((i, " ".join(toks)))
    rows.append((99, None))  # NULL text
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    terms = ["spark", "index"]
    got = bm25_topk(docs, terms, k=8).collect()
    want = _bm25_topk_r15_spec(docs, terms, k=8).collect()
    key = lambda r: (r.rank, r.doc_id)  # noqa: E731
    assert sorted(map(tuple, sorted(got, key=key))) == sorted(
        map(tuple, sorted(want, key=key))
    )
    assert len(got) == 8


def test_clean_corpus_keep_cached_same_survivors(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "a completely different document about spark optimization"),
        (4, "a completely different document about spark optimisation"),
        (5, "short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = clean_corpus(docs, jaccard_threshold=0.5)
    kept, cached = clean_corpus(docs, jaccard_threshold=0.5, keep_cached=True)
    got = sorted((r.doc_id, r.n_members) for r in kept.collect())
    cached.unpersist()
    want = sorted((r.doc_id, r.n_members) for r in base.collect())
    assert got == want


@pytest.mark.parametrize("materialize", [False, True])
def test_gap_fill_previous_materialized_rows_unchanged(
    spark, monkeypatch, materialize
):
    # 1-min cadence over 12 slots; real records at slots 3, 4, 8 with
    # off-grid phases -> leading fills (back-computed), interior fills
    # (continue-from-previous) and trailing fills all exercised
    # size-gate override: 0 forces the materialized path, a huge value
    # forces the lazy (shared-subtree) path — rows must be identical
    monkeypatch.setenv(
        "NCAGG_GAPFILL_MATERIALIZE_MIN_BYTES",
        "0" if materialize else str(1 << 60),
    )
    origin = 1_700_000_000_000_000
    step = 60_000_000
    data = [
        (1, origin + 3 * step + 7_000_000),
        (2, origin + 4 * step + 11_000_000),
        (3, origin + 8 * step + 2_000_000),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in data], "event_id long, us long"
    ).select("event_id", F.timestamp_micros(F.col("us")).alias("ts"))
    df = cadence_bucket(df, "ts", origin_us=origin, step_us=step)
    df = dedup_cadence(df, "ts", tiebreak=["event_id"])
    out = gap_fill(
        spark, df, "ts",
        origin_us=origin, step_us=step, n_buckets=12,
        anchor="previous", keep_bucket=True,
    )
    rows = {r["__bucket"]: r for r in out.collect()}
    assert len(rows) == 12
    lead_us = origin + 3 * step + 7_000_000
    import datetime as _dt

    def us_of(ts: _dt.datetime) -> int:
        return int(ts.replace(tzinfo=_dt.timezone.utc).timestamp() * 1e6)

    for b in (0, 1, 2):
        assert us_of(rows[b].ts) == lead_us - (3 - b) * step
    # interior fills continue from the previous real record (slot 4)
    for b in (5, 6, 7):
        assert rows[b].is_fill
        assert us_of(rows[b].ts) == us_of(rows[4].ts) + (b - 4) * step
    # trailing fills continue from slot 8
    for b in (9, 10, 11):
        assert rows[b].is_fill
        assert us_of(rows[b].ts) == us_of(rows[8].ts) + (b - 8) * step
    # real records untouched
    for b, (_eid, us) in zip((3, 4, 8), data):
        assert not rows[b].is_fill and us_of(rows[b].ts) == us


@pytest.mark.parametrize("materialize", [False, True])
def test_pack_sequences_materialized_rows_unchanged(
    spark, monkeypatch, materialize
):
    # size-gate override: 0 forces the checkpointed-counts path, a huge
    # value forces the lazy (re-derived-counts) path — the manifest must
    # be identical row for row. Mixed doc lengths so sequences cross
    # document boundaries, plus a zero-token doc (occupies no stream
    # positions) and a dropped trailing partial sequence.
    from ncagg_spark.pipeline.packing import pack_sequences

    monkeypatch.setenv(
        "NCAGG_PACK_MATERIALIZE_MIN_BYTES",
        "0" if materialize else str(1 << 60),
    )
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),          # 5 tokens
            (2, ""),                   # 0 tokens -> no stream positions
            (3, "f g h"),              # 3 tokens
            (4, "i j k l m n o"),      # 7 tokens
            (5, "p q"),                # 2 tokens -> 17 total, seq_len 4
        ],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, seq_len=4, drop_incomplete=True)
    rows = sorted(
        (r.seq_id, r.doc_id, r.doc_offset, r.seq_offset, r.seg_len)
        for r in out.collect()
    )
    # 17 tokens // 4 = 4 complete sequences; doc 1 spans seqs 0-1,
    # doc 3 spans 1-2, doc 4 spans 2-3, doc 5 starts at offset 15
    # (seq 3) and its tail falls in the dropped partial seq 4
    assert rows == [
        (0, 1, 0, 0, 4),
        (1, 1, 4, 0, 1),
        (1, 3, 0, 1, 3),
        (2, 4, 0, 0, 4),
        (3, 4, 4, 0, 3),
        (3, 5, 0, 3, 1),
    ]


# ---------------------------------------------------------------------------
# r16: simhash combination-scheme candidates (block_bits=4, k=5) must
# return EXACTLY the quadratic-scan pair set — and exactly what the
# degenerate r15 scheme (block_bits=8, k=1) returns. The fixture is
# adversarial for the pigeonhole: errors concentrated in one block,
# spread 1-per-block across 4 blocks (defeats any single-combo scheme
# that skips a table), identical-signature clusters, and just-over-the-
# threshold distances that a sloppy key would still bucket together.
def test_simhash_combination_scheme_parity(spark):
    import random

    from ncagg_spark.pipeline.dedup import simhash_near_duplicates

    rng = random.Random(416)
    base = rng.getrandbits(32)

    def flip(sig, *bits):
        for b in bits:
            sig ^= 1 << b
        return sig & 0xFFFFFFFF

    sigs = [
        base,                          # identical cluster (d=0)
        base,
        flip(base, 7),                 # d=1, inside block 1
        flip(base, 0, 1, 2),           # d=3, all in block 0
        flip(base, 3, 11, 19),         # d=3, one bit in 3 blocks
        flip(base, 0, 8, 16, 24),      # d=4 spread 1-per-byte-block: OUT
        flip(base, 28, 29, 30, 31),    # d=4 concentrated: OUT
    ] + [rng.getrandbits(32) for _ in range(60)]
    rows = [(i, s) for i, s in enumerate(sigs)]
    df = spark.createDataFrame(rows, "doc_id long, simhash long")

    def popcount(x):
        return bin(x).count("1")

    expected = {
        (a, b)
        for i, (a, sa) in enumerate(rows)
        for b, sb in rows[i + 1 :]
        if popcount(sa ^ sb) <= 3
    }
    got_new = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_duplicates(df, max_hamming=3).collect()
    }
    got_old = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_duplicates(
            df, max_hamming=3, block_bits=8
        ).collect()
    }
    assert got_new == expected
    assert got_old == expected
    # the adversarial cases actually exercise both sides of the gate
    assert (0, 1) in expected and (0, 3) in expected and (0, 4) in expected
    assert (0, 5) not in expected and (0, 6) not in expected
