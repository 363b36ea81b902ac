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

from ncagg_spark.functions.binding import bind_once
from ncagg_spark.pipeline.text import sql_tokenize, tokenize

MICRO = 1_000_000.0


def _bm25_narrow(
    docs: DataFrame, terms: list[str], id_col: str, text_col: str
) -> DataFrame:
    """ONE corpus tokenize pass (guide §8, VERDICT r15 #2): per doc, the
    integer token count and the tokens matching the query terms. Every
    downstream quantity (tf, dl, df, N, avgdl) derives from this
    metadata-sized frame, so each evaluation of it costs exactly one
    scan+tokenize of the corpus — the old plan held three independent
    tokenize subtrees (tf for scoring, tf again under the document-
    frequency agg, token_count for N/avgdl).

    ``__tc`` stays INTEGER here: consts sums it and casts the SUM (exact
    long arithmetic), matching the original sum(token_count) expression
    bit-for-bit; the per-row double cast for ``dl`` happens at the tf
    projection exactly where the original cast sat."""
    s = bind_once(
        tokenize(text_col),
        lambda toks: F.struct(
            F.size(toks).alias("tc"),
            F.filter(toks, lambda t: t.isin(terms)).alias("mtoks"),
        ),
    )
    # two-step select: CollapseProject refuses to inline a non-cheap
    # aliased expression referenced more than once, so the bound
    # tokenize stays single-evaluation through the field extraction
    return docs.select(F.col(id_col), s.alias("__s")).select(
        id_col,
        F.col("__s").getField("tc").alias("__tc"),
        F.col("__s").getField("mtoks").alias("__mtoks"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    _narrow: DataFrame | None = None,
) -> DataFrame:
    """(id, n_terms, score) for every document matching >= 1 query term.

    ``n_terms`` = distinct query terms present (the conjunction-ish
    signal callers often rank by first); ``score`` = BM25 in micro-unit
    resolution (integer micro sum / 1e6).

    ``_narrow``: a pre-built (optionally persisted) ``_bm25_narrow``
    frame — ``bm25_topk`` passes one so the single tokenize pass is
    shared by every consumer through the cache.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    k1 = float(k1)
    b = float(b)

    narrow = (
        _narrow
        if _narrow is not None
        else _bm25_narrow(docs, terms, id_col, text_col)
    )
    # explode-then-filter and filter-inside-the-array commute row-wise
    # (same matching occurrences, same dl), so tf is unchanged
    tf = (
        narrow.select(
            id_col,
            F.col("__tc").cast("double").alias("dl"),
            F.explode("__mtoks").alias("tok"),
        )
        .groupBy(id_col, "dl", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    # corpus constants: N and avgdl over ALL docs (not just matches);
    # sum(int)::double / count::double — identical arithmetic to the
    # original sum(token_count(text)) form
    consts = narrow.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (
            F.sum("__tc").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    # document frequency via groupBy + tiny broadcast — NOT a window
    # over tok: the groupBy's partial aggregation is skew-immune,
    # whereas a tok-partitioned window would funnel every match of a
    # hot term into ONE task (r15: tried, rejected — tests/test_topk.py
    # pins the bounded-window discipline). This consumes the narrow
    # frame a second time; bm25_topk persists it so both consumers
    # share one tokenize pass, and the lazy bm25_scores form pays one
    # extra scan of the metadata-sized frame, never a window skew.
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
    unchanged.

    The narrow (id, token-count, matched-tokens) frame is persisted for
    the duration of this call and the small top-k result materialized
    eagerly (r16, VERDICT r15 #2 — the DSIR/LM pattern): the corpus is
    scanned and tokenized exactly ONCE per invocation, where the lazy
    three-subtree plan paid three passes per evaluation. Paired
    persist/unpersist inside one call — nothing survives the return, so
    repeated invocations each recompute from the parquet inputs. The
    returned plan is the checkpointed <= k-row result; the pre-collapse
    pipeline is reported via plan_probe for audits."""
    from ncagg_spark import plan_probe
    from ncagg_spark.pipeline.topk import bounded_topk

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = sorted(set(query_terms))
    narrow = _bm25_narrow(docs, terms, id_col, text_col).persist()
    try:
        scores = bm25_scores(
            docs,
            query_terms,
            k1=k1,
            b=b,
            id_col=id_col,
            text_col=text_col,
            _narrow=narrow,
        )
        out = bounded_topk(
            scores,
            [F.col("score").desc(), F.col(id_col).asc()],
            k,
            id_col=id_col,
        ).select(id_col, "n_terms", "score", "rank")
        plan_probe.observe("bm25-topk", out)
        # one action computes the whole pipeline; the persisted narrow
        # frame is filled once and read by all three consumers (tf for
        # scoring, tf under dfreq, consts)
        return out.localCheckpoint(eager=True)
    finally:
        narrow.unpersist()


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
