"""Property-based invariants for the text-pipeline operators
(hypothesis): chunking exactly covers the token sequence under the
window rule for ANY (n, size, overlap); span dedup finds exactly the
planted shared passage for ANY passage placement; PII redaction is
idempotent and never leaves a matchable pattern behind.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ncagg_spark.pipeline.chunking import chunk_documents
from ncagg_spark.pipeline.pii import PII_PATTERNS, redact_pii
from ncagg_spark.pipeline.spans import duplicate_spans

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


@given(
    n=st.integers(min_value=0, max_value=120),
    size=st.integers(min_value=2, max_value=32),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
@settings(**SETTINGS)
def test_chunk_cover_property(spark, n, size, overlap_frac):
    overlap = min(int(size * overlap_frac), size - 1)
    step = size - overlap
    text = " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, size=size, overlap=overlap).collect(),
        key=lambda r: r["chunk_start"],
    )
    # one chunk minimum; short docs exactly one
    assert rows
    if n <= size:
        assert len(rows) == 1
        assert rows[0]["chunk_tokens"] == n
    else:
        covered = set()
        for r in rows:
            assert r["chunk_tokens"] <= size
            covered.update(
                range(r["chunk_start"], r["chunk_start"] + r["chunk_tokens"])
            )
        assert covered == set(range(n))
        # starts form an arithmetic sequence with stride = step
        starts = [r["chunk_start"] for r in rows]
        assert starts == list(range(0, starts[-1] + 1, step))
        # no trailing chunk strictly inside the previous one
        assert starts[-1] + size >= n
        assert len(starts) < 2 or starts[-2] + size < n
    # chunk text round-trips the tokens
    for r in rows:
        toks = r["chunk_text"].split()
        assert toks == [
            f"w{i}"
            for i in range(
                r["chunk_start"], r["chunk_start"] + r["chunk_tokens"]
            )
        ]


@given(
    k=st.integers(min_value=3, max_value=10),
    passage_len_extra=st.integers(min_value=0, max_value=8),
    pre_a=st.integers(min_value=0, max_value=6),
    pre_b=st.integers(min_value=0, max_value=6),
    post=st.integers(min_value=0, max_value=5),
)
@settings(**SETTINGS)
def test_span_plant_property(spark, k, passage_len_extra, pre_a, pre_b, post):
    """Plant one shared passage of length k + extra between two docs of
    otherwise-unique tokens: exactly one maximal span is reported, at
    the planted offsets, with the planted length."""
    plen = k + passage_len_extra
    passage = [f"p{i}" for i in range(plen)]
    doc_a = [f"a{i}" for i in range(pre_a)] + passage + [
        f"x{i}" for i in range(post)
    ]
    doc_b = [f"b{i}" for i in range(pre_b)] + passage + [
        f"y{i}" for i in range(post)
    ]
    df = spark.createDataFrame(
        [(0, " ".join(doc_a)), (1, " ".join(doc_b))],
        "doc_id long, text string",
    )
    out = duplicate_spans(df, k=k).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["a_start"], r["b_start"], r["length"]) == (pre_a, pre_b, plen)


_PII_SNIPPETS = [
    "mail a@b.io now",
    "host 10.0.0.1 up",
    "ssn 123-45-6789",
    "card 4111 1111 1111 1111",
    "tel 303-555-0142",
    "plain words only",
]


@given(
    parts=st.lists(st.sampled_from(_PII_SNIPPETS), min_size=0, max_size=5)
)
@settings(**SETTINGS)
def test_pii_redaction_idempotent_and_complete(spark, parts):
    text = " | ".join(parts)
    df = spark.createDataFrame([(text,)], "t string")
    once = df.select(redact_pii("t").alias("r1"))
    twice = once.select(
        F.col("r1"), redact_pii(F.col("r1")).alias("r2")
    ).collect()[0]
    assert twice["r1"] == twice["r2"]  # idempotent
    # nothing matchable survives: re-counting on the redacted text is 0
    import re

    for _, pat in PII_PATTERNS:
        assert not re.search(pat, twice["r1"]), (pat, twice["r1"])
