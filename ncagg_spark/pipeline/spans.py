"""Span-level (substring) duplicate detection across documents.

Document-level dedup (exact/MinHash/SimHash) misses the common failure
mode of web corpora: long VERBATIM passages (boilerplate, licenses,
quoted articles) embedded in otherwise-distinct documents. The
substring-dedup primitive (cf. "Deduplicating Training Data Makes
Language Models Better", Lee et al. 2022 — they use a suffix array; the
distributed shape here is the rolling-hash equivalent) finds every
k-token window shared verbatim between two documents and merges
overlapping matches into MAXIMAL shared spans.

Fully relational and deterministic:

  tokenize -> k-gram rolling hash with position (per-row explode)
  -> group by hash (ONE shuffle), emit cross-document position pairs
  -> gaps-and-islands merge along each (id_a, id_b, diagonal)
     (one more shuffle) -> (id_a, id_b, a_start, b_start, length)

Hot hashes (boilerplate shared by everything) are capped per hash the
same way the LSH bucket guard works, so no single task inflates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ncagg_spark.functions.hashing import hash64
from ncagg_spark.pipeline.text import tokenize, word_ngrams


def span_hashes(
    docs: DataFrame,
    *,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, pos, h): rolling hash of the k-token window at each token
    position. Pure per-row explode — scan-parallel, no shuffle."""
    toks = tokenize(F.col(text_col))
    grams = word_ngrams(toks, k)
    return docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(grams).alias("pos", "gram"),
    ).select("id", "pos", hash64(F.col("gram")).alias("h"))


def duplicate_span_pairs(
    docs: DataFrame,
    *,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences_per_hash: int = 64,
) -> DataFrame:
    """Cross-document k-token window matches:
    (id_a, id_b, pos_a, pos_b) with id_a < id_b.

    Hashes occurring more than ``max_occurrences_per_hash`` times are
    dropped (corpus-wide boilerplate — the callers that want it use
    doc_top_ngrams); the in-bucket pair expansion is bounded by the cap
    squared, mirroring the LSH bucket guard.
    """
    occ = span_hashes(docs, k=k, id_col=id_col, text_col=text_col)
    # SALTED truncation, same scheme as minhash_lsh_candidates: rank
    # within (h, salt) and truncate at cap+1 per salt — an unsalted
    # window over h would make a corpus-wide boilerplate hash one
    # unsplittable task. Pigeonhole keeps drop semantics exact: total
    # count > cap  <=>  surviving count > cap (either some salt group
    # truncated at cap+1, or none did and surviving == total), so the
    # size(ms) filter on the bounded remnant keeps exactly the hashes
    # a full count would keep, untruncated.
    n_salts = 16
    salt = F.pmod(F.xxhash64("id", "pos"), F.lit(n_salts))
    ws = Window.partitionBy("h", "__salt").orderBy("id", "pos")
    ranked = (
        occ.withColumn("__salt", salt)
        .withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= max_occurrences_per_hash + 1)
    )
    # ONE shuffle gathers each hash bucket; pairs expand in place with
    # posexplode + slice (the minhash_lsh_candidates idiom). The old
    # self-join form (a.join(b, on="h")) evaluated the whole
    # scan->explode->window subtree TWICE — measured in the
    # doc_clean_corpus profile as two duplicate pairs of 151k-row
    # exchanges (VERDICT r10 #6) — and needed a second window over h
    # for the occurrence cap, which size(ms) now applies for free.
    # collect_list memory is bounded by construction:
    # <= n_salts * (cap + 1) structs per bucket.
    grouped = ranked.groupBy("h").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("id"), F.col("pos")))
        ).alias("ms")
    )
    buckets = grouped.filter(
        (F.size("ms") >= 2)
        & (F.size("ms") <= max_occurrences_per_hash)
    )
    # struct sort is (id, pos) lexicographic, so j > i ==> b.id >= a.id;
    # the != filter leaves exactly id_a < id_b with positions attached
    # to the right side. Duplicate-free by construction: (id, pos) rows
    # are unique and each unordered pair appears once in the expansion.
    return (
        buckets.select(F.col("ms"), F.posexplode("ms").alias("i", "a"))
        .select(
            "a",
            F.explode(F.expr("slice(ms, i + 2, size(ms))")).alias("b"),
        )
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.pos").alias("pos_a"),
            F.col("b.pos").alias("pos_b"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    *,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences_per_hash: int = 64,
) -> DataFrame:
    """MAXIMAL shared spans: (id_a, id_b, a_start, b_start, length).

    Overlapping window matches on the same alignment diagonal
    (pos_a - pos_b constant) merge via gaps-and-islands: consecutive
    pos_a values belong to one island; a span of ``r`` consecutive
    windows covers r + k - 1 tokens.
    """
    pairs = duplicate_span_pairs(
        docs, k=k, id_col=id_col, text_col=text_col,
        max_occurrences_per_hash=max_occurrences_per_hash,
    ).withColumn("diag", F.col("pos_a") - F.col("pos_b"))
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    islands = pairs.withColumn(
        "brk",
        F.when(
            F.col("pos_a") - F.lag("pos_a", 1).over(w) == 1, 0
        ).otherwise(1),
    ).withColumn(
        "island", F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    return (
        islands.groupBy("id_a", "id_b", "diag", "island")
        .agg(
            F.min("pos_a").alias("a_start"),
            F.min("pos_b").alias("b_start"),
            (F.max("pos_a") - F.min("pos_a") + k).alias("length"),
        )
        .select("id_a", "id_b", "a_start", "b_start", "length")
    )


def sql_duplicate_spans(
    k: int,
    max_occurrences_per_hash: int = 64,
    source: str = "documents",
) -> str:
    """DuckDB twin of duplicate_spans over ``source`` (a view/CTE name
    with (doc_id, text)) — used by tests and the clean-corpus oracle to
    pin cross-engine parity."""
    from ncagg_spark.functions.hashing import sql_hash64
    from ncagg_spark.pipeline.text import sql_tokenize, sql_word_ngrams

    toks = sql_tokenize("text")
    grams = sql_word_ngrams("toks", k)
    h = sql_hash64("gram")
    return f"""
        WITH t AS (SELECT doc_id AS id, {toks} AS toks FROM {source}),
        g AS (
            SELECT id, generate_subscripts(grams, 1) - 1 AS pos,
                   unnest(grams) AS gram
            FROM (SELECT id, {grams} AS grams FROM t)
        ),
        occ AS (SELECT id, pos, {h} AS h FROM g),
        capped AS (
            -- same keep set as the salted Spark guard: a hash survives
            -- iff its TOTAL occurrence count is within the cap, and
            -- surviving hashes keep every occurrence
            SELECT id, pos, h FROM (
                SELECT id, pos, h,
                       count(*) OVER (PARTITION BY h) AS n_occ
                FROM occ
            ) WHERE n_occ <= {max_occurrences_per_hash}
        ),
        pairs AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                   a.pos AS pos_a, b.pos AS pos_b
            FROM capped a JOIN capped b USING (h)
            WHERE a.id < b.id
        ),
        breaks AS (
            SELECT *, pos_a - pos_b AS diag,
                   CASE WHEN pos_a - lag(pos_a) OVER
                           (PARTITION BY id_a, id_b, pos_a - pos_b
                            ORDER BY pos_a) = 1
                        THEN 0 ELSE 1 END AS brk
            FROM pairs
        ),
        islands AS (
            SELECT *, SUM(brk) OVER
                       (PARTITION BY id_a, id_b, diag
                        ORDER BY pos_a) AS island
            FROM breaks
        )
        SELECT id_a, id_b,
               CAST(min(pos_a) AS BIGINT) AS a_start,
               CAST(min(pos_b) AS BIGINT) AS b_start,
               CAST(max(pos_a) - min(pos_a) + {k} AS BIGINT) AS length
        FROM islands
        GROUP BY id_a, id_b, diag, island
    """
