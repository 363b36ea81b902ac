"""Document chunking for training/RAG pipelines: split each document
into fixed-size token windows with configurable overlap.

Relational implementation — tokenize, generate the chunk-start sequence,
explode, slice — all Catalyst expressions (sequence/slice/array_join),
no Python UDFs and no shuffle: chunking is a per-row flatMap, so a
100 TB corpus chunks in one scan at scan parallelism.

Window rule (the standard sliding-window contract): starts are
0, step, 2*step, ... with ``step = size - overlap``; the LAST start is
the smallest multiple of step with ``start + size >= n_tokens``, so no
trailing chunk is a strict suffix of the previous one. Documents with
<= size tokens yield exactly one chunk (possibly empty for empty docs).
The DuckDB twin (`sql_chunk_starts`) encodes the same rule for the
driver oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokenize


def chunk_starts(n_tokens: Column, size: int, overlap: int) -> Column:
    """Array of chunk-start token offsets for a document of n_tokens."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    last = F.when(n_tokens <= size, F.lit(0)).otherwise(
        F.floor((n_tokens - size + (step - 1)) / step).cast("int") * step
    )
    return F.sequence(F.lit(0), last, F.lit(step))


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode documents into overlapping token-window chunks.

    Returns (id, chunk_idx, chunk_start, chunk_tokens, chunk_text):
    chunk_idx = chunk_start / step, chunk_tokens the actual token count
    (< size only for the final window).
    """
    step = size - overlap
    toks = tokenize(F.col(text_col))
    with_toks = df.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    )
    exploded = with_toks.select(
        id_col,
        "_toks",
        F.explode(chunk_starts(F.col("_n"), size, overlap)).alias(
            "chunk_start"
        ),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_start") + 1, size)
    return exploded.select(
        id_col,
        (F.col("chunk_start") / step).cast("int").alias("chunk_idx"),
        "chunk_start",
        F.size(chunk).alias("chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def sql_chunk_starts(n_expr: str, size: int, overlap: int) -> str:
    """DuckDB twin of `chunk_starts` over a token-count expression."""
    step = size - overlap
    last = (
        f"CASE WHEN ({n_expr}) <= {size} THEN 0 "
        f"ELSE (({n_expr}) - {size} + {step - 1}) // {step} * {step} END"
    )
    return f"generate_series(0, {last}, {step})"
