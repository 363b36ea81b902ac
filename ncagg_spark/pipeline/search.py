"""BM25 keyword retrieval over the document corpus — the classic
Okapi/Lucene ranking function (Robertson & Zaragoza 2009, public), the
standard "find training examples about X" tool in a data pipeline:

    score(d, q) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    idf(t)      = ln( (N - df + 0.5) / (df + 0.5) + 1 )    (Lucene form,
                                                            always >= 0)

Relational shape (Spark-first, zero UDFs):

- One explode of the tokenized text, filtered to the query terms
  BEFORE any shuffle — the term filter prunes ~everything, so the
  groupBy that builds (doc, term, tf) shuffles only matching
  occurrences, never the corpus.
- ``dl`` (doc token count) is a pure expression carried through the
  same pass (no per-doc join); ``df``/``N``/``avgdl`` are tiny aggs
  broadcast back in.
- Per-term contributions are quantized to integer micro-units
  (floor(score * 1e6) BIGINT) so the per-doc sum is exact in any
  partition order, then rendered back as the plain division sum/1e6 —
  the same BIGINT over the same constant is bit-identical in any
  engine (an engine round() is NOT: Spark and DuckDB resolve exact
  decimal halves differently). All float inputs to the
  chain (tf, dl, df, N, avgdl) are integers or single divisions of
  integers, identical in both engines; ln bit-parity is probed in
  pipeline/lm.py's module docstring.

Reference parity: the reference engine has no text retrieval;
beyond-reference capability per the training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ncagg_spark.pipeline.text import sql_tokenize, token_count, tokenize

MICRO = 1_000_000.0


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_terms, score) for every document matching >= 1 query term.

    ``n_terms`` = distinct query terms present (the conjunction-ish
    signal callers often rank by first); ``score`` = BM25 in micro-unit
    resolution (integer micro sum / 1e6).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    k1 = float(k1)
    b = float(b)

    base = docs.select(
        F.col(id_col),
        token_count(text_col).cast("double").alias("dl"),
        F.explode(tokenize(text_col)).alias("tok"),
    ).filter(F.col("tok").isin(terms))
    tf = base.groupBy(id_col, "dl", "tok").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    # corpus constants: N and avgdl over ALL docs (not just matches)
    consts = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum(token_count(text_col)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    # document frequency via groupBy + tiny broadcast — NOT a window
    # over tok: this consumes tf twice (the corpus tokenize/explode runs
    # twice per query), but the groupBy's partial aggregation is
    # skew-immune, whereas a tok-partitioned window would funnel every
    # match of a hot term into ONE task (r15: tried, rejected —
    # tests/test_topk.py pins the bounded-window discipline).
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
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
            id_col,
            F.floor(idf * tf_part * F.lit(MICRO))
            .cast("long")
            .alias("c_micro"),
        )
    )
    # no engine round(): the score IS the integer micro sum divided by
    # 1e6 — the same BIGINT / 1e6 is bit-identical in any engine,
    # whereas round() resolves exact decimal halves engine-specifically
    return contrib.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms"),
        (F.sum("c_micro").cast("double") / F.lit(MICRO)).alias("score"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score (ties -> lower id, the repo-wide
    deterministic tie-break). Ranked with the bounded two-phase top-k
    (pipeline/topk.py, VERDICT r11 #3): a common query term makes the
    scored set corpus-sized at 100 TB, so the only single-partition
    sort is over the <= k x n_buckets per-bucket survivors — never the
    scored set itself. Ranks are identical to a single global window
    (the ordering is total via the id tie-break), so oracle hashes are
    unchanged."""
    from ncagg_spark.pipeline.topk import bounded_topk

    scores = bm25_scores(
        docs, query_terms, k1=k1, b=b, id_col=id_col, text_col=text_col
    )
    return bounded_topk(
        scores,
        [F.col("score").desc(), F.col(id_col).asc()],
        k,
        id_col=id_col,
    ).select(id_col, "n_terms", "score", "rank")


def sql_bm25_scores(
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of ``bm25_scores`` over the ``documents`` view —
    SELECT text producing (doc_id, n_terms, score)."""
    terms = ", ".join(
        "'" + t.replace("'", "''") + "'" for t in sorted(set(query_terms))
    )
    toks = sql_tokenize("text")
    k1r, br = repr(float(k1)), repr(float(b))
    return f"""
        WITH base AS (
            SELECT doc_id, len({toks})::DOUBLE AS dl,
                   unnest({toks}) AS tok
            FROM documents
        ),
        tf AS (
            SELECT doc_id, dl, tok, count(*)::DOUBLE AS tf
            FROM base WHERE tok IN ({terms})
            GROUP BY doc_id, dl, tok
        ),
        consts AS (
            SELECT count(*)::DOUBLE AS n_docs,
                   sum(len({toks}))::DOUBLE / count(*)::DOUBLE AS avgdl
            FROM documents
        ),
        dfreq AS (
            SELECT tok, count(*)::DOUBLE AS df FROM tf GROUP BY tok
        ),
        contrib AS (
            SELECT tf.doc_id,
                   CAST(floor(
                       ln((c.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                       * (tf.tf * ({k1r} + 1.0)
                          / (tf.tf + {k1r} * (1.0 - {br}
                             + {br} * tf.dl / c.avgdl)))
                       * 1000000.0) AS BIGINT) AS c_micro
            FROM tf JOIN dfreq d ON d.tok = tf.tok CROSS JOIN consts c
        )
        SELECT doc_id, count(*)::BIGINT AS n_terms,
               sum(c_micro)::DOUBLE / 1000000.0 AS score
        FROM contrib GROUP BY doc_id"""
