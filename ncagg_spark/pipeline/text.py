"""Text analysis operators for large-scale training-data pipelines:
tokenization, token counting, quality scoring, language ID, document
fingerprinting.

All pure Catalyst expressions (split / higher-order functions / md5) — no
Python UDFs — so a 100 TB documents scan stays in whole-stage codegen.
Every operator has a DuckDB-SQL twin (sql_* helpers) used by the driver
oracle so correctness is end-to-end checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ncagg_spark.functions.binding import bind_once

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + hard-coded so Spark and the SQL oracle
# share them verbatim.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "du"),
    "es": ("el", "la", "y", "los", "las", "un", "una", "del"),
    "de": ("der", "die", "und", "das", "den", "ein", "eine", "von"),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization (empty tokens removed)."""
    return F.filter(
        F.split(F.trim(_c(col)), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokenize(col))


def word_ngrams(tokens: Column, n: int) -> Column:
    """n-gram shingles over a token array (space-joined strings).

    Guarded so docs shorter than n yield an empty array — Spark's
    sequence() would otherwise produce a DESCENDING range.

    ``tokens`` is bound once (functions/binding.py): the old form
    referenced the caller's token expression inside the transform
    lambda, re-evaluating the whole tokenize tree per gram — O(T^2)
    per document, measured 9.4x slower at sf0.1 (r15).
    """

    def grams_of(toks: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
        return F.when(F.size(toks) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return bind_once(tokens, grams_of)


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized text (DuckDB twin: md5 of the same normalization).
    """
    normalized = F.array_join(tokenize(col), " ")
    return F.md5(normalized)


def stopword_ratio(tokens: Column, lang: str = "en") -> Column:
    # only two references to ``tokens`` — not worth a bind_once wrapper
    # (callers on hot paths pass an already-bound variable anyway)
    hits = F.size(
        F.filter(tokens, lambda t: t.isin(*STOPWORDS[lang]))
    )
    return hits / F.greatest(F.size(tokens), F.lit(1))


def mean_token_length(tokens: Column) -> Column:
    # only two references to ``tokens`` — not worth a bind_once wrapper
    total = F.aggregate(
        tokens, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
    )
    return total.cast("double") / F.greatest(F.size(tokens), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: rewards stopword presence and
    sane token lengths; penalizes ultra-short docs. Mirrors the shape of
    common pretraining-corpus quality filters (length / stopword gates).
    """
    def score_of(toks: Column) -> Column:
        sw = stopword_ratio(toks)
        mlen = mean_token_length(toks)
        len_ok = F.when(
            (F.size(toks) >= 10) & (F.size(toks) <= 100000), F.lit(1.0)
        ).otherwise(F.lit(0.0))
        mlen_ok = F.when(
            (mlen >= 2.0) & (mlen <= 12.0), F.lit(1.0)
        ).otherwise(F.lit(0.0))
        return F.round(
            (F.least(sw * F.lit(5.0), F.lit(1.0)) + len_ok + mlen_ok)
            / F.lit(3.0),
            6,
        )

    # bind the token array once — the inline form evaluated tokenize()
    # per sub-signal (4x per row; see functions/binding.py)
    return bind_once(tokenize(col), score_of)


def language_hits(tokens: Column) -> dict[str, Column]:
    """Per-language stopword hit COUNT (integer — float-free comparisons
    so the SQL oracle can't diverge on rounding)."""
    return {
        lang: _hit_count(tokens, words) for lang, words in STOPWORDS.items()
    }


def _hit_count(tokens: Column, words: tuple[str, ...]) -> Column:
    # NB: the lambda must take exactly one parameter — pyspark inspects
    # arity, so default-arg capture tricks break higher-order functions.
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


# Fixed precedence for argmax ties — first listed wins. The SQL oracle
# mirrors the same CASE chain, so determinism is shared by construction.
LANG_PRECEDENCE = ("en", "fr", "es", "de")


def detect_language(col: Column | str) -> Column:
    """Argmax over language stopword scores via a fixed-precedence CASE
    chain; 'und' (undetermined) when all scores are zero.
    """
    def lang_of(toks: Column) -> Column:
        hits = language_hits(toks)
        expr = F.lit("und")
        for lang in reversed(LANG_PRECEDENCE):
            others = [hits[o] for o in LANG_PRECEDENCE if o != lang]
            is_max = (hits[lang] > 0) & F.lit(True)
            for o in others:
                is_max = is_max & (hits[lang] >= o)
            # earlier langs override later ones on ties (loop is reversed)
            expr = F.when(is_max, F.lit(lang)).otherwise(expr)
        return expr

    # bind the token array once — the inline form evaluated tokenize()
    # once per language hit count (4x per row)
    return bind_once(tokenize(col), lang_of)


# BPE-ish pre-tokenization: the GPT-2-style coarse split into letter runs,
# digit runs, and punctuation runs. Kept to character classes only so the
# Java (Spark) and RE2-ish (DuckDB) regex dialects agree exactly.
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpeish_tokens(col: Column | str) -> Column:
    """BPE-style pre-tokens (letter/digit/punct runs). A practical proxy
    for LLM token counting when the real tokenizer isn't available
    engine-side; the count correlates with BPE token counts far better
    than whitespace words do (punctuation and numbers split off)."""
    return F.regexp_extract_all(_c(col), F.lit(BPEISH_PATTERN), 0)


def bpeish_token_count(col: Column | str) -> Column:
    return F.size(bpeish_tokens(col))


def winnow_fingerprint(tokens: Column, window: int = 8) -> Column:
    """Rolling-hash document fingerprint (winnowing-style): hash every
    ``window``-token shingle and keep the MINIMUM hash — robust to
    insertions/deletions outside the minimal window, unlike the whole-doc
    md5. Docs shorter than the window fall back to hashing the whole
    token sequence."""
    from ncagg_spark.functions.hashing import hash64

    def fp_of(toks: Column) -> Column:
        whole = hash64(F.array_join(toks, " "))

        def from_grams(grams: Column) -> Column:
            return F.when(
                F.size(grams) > 0,
                F.array_min(F.transform(grams, lambda g: hash64(g))),
            ).otherwise(whole)

        return bind_once(word_ngrams(toks, window), from_grams)

    # bind tokens (referenced by grams AND the short-doc fallback) and
    # the gram array (referenced by the guard AND the min) once each
    return bind_once(tokens, fp_of)


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def sql_bpeish_tokens(expr: str) -> str:
    return f"regexp_extract_all({expr}, '{BPEISH_PATTERN}')"


def sql_winnow_fingerprint(tokens_expr: str, window: int = 8) -> str:
    from ncagg_spark.functions.hashing import sql_hash64

    grams = sql_word_ngrams(tokens_expr, window)
    whole = sql_hash64(f"array_to_string({tokens_expr}, ' ')")
    return (
        f"CASE WHEN len({grams}) > 0 THEN "
        f"list_min(list_transform({grams}, g -> {sql_hash64('g')})) "
        f"ELSE {whole} END"
    )


def sql_tokenize(expr: str) -> str:
    return f"list_filter(regexp_split_to_array(trim({expr}), '\\s+'), t -> t <> '')"


def sql_word_ngrams(tokens_expr: str, n: int) -> str:
    return (
        f"CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"list_transform(generate_series(0, len({tokens_expr}) - {n}), "
        f"i -> array_to_string(list_slice({tokens_expr}, i + 1, i + {n}), ' ')) "
        f"ELSE [] END"
    )


def sql_lines(expr: str) -> str:
    """DuckDB twin of `_lines`: trimmed non-blank lines."""
    return (
        f"list_filter(list_transform(regexp_split_to_array({expr}, '\\n'), "
        f"s -> trim(s)), s -> s <> '')"
    )


def sql_paragraphs(expr: str) -> str:
    """DuckDB twin of `_paragraphs`: blank-line-separated paragraphs.
    Shares the explicit whitespace class with the Spark twin (Java \\s
    includes \\x0B, RE2 \\s does not — ADVICE r11)."""
    return (
        f"list_filter(list_transform("
        f"regexp_split_to_array({expr}, '\\n[ \\t\\r\\n\\f]*\\n'), "
        f"s -> trim(s)), s -> s <> '')"
    )


def sql_stopword_hits(tokens_expr: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({tokens_expr}, t -> t IN ({words})))"


def benchmark_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    min_shared: int = 1,
) -> DataFrame:
    """Decontamination scan: which corpus docs share >= ``min_shared``
    distinct word n-grams with which benchmark docs (the n-gram-overlap
    contamination rule used when cleaning pretraining corpora against
    eval sets).

    Returns (id_col, bench_id_col, n_shared, bench_frac) where
    ``bench_frac`` is the fraction of the benchmark doc's distinct
    n-grams found in the corpus doc. Shape at 100 TB: both sides explode
    to distinct (id, gram) rows; the benchmark side is tiny by
    construction (an eval set), so the gram join broadcasts it — the
    corpus side streams through map-side, one shuffle for the per-pair
    count. The corpus rows never carry their text past the explode.
    """
    c_grams = corpus.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams(tokenize(F.col(text_col)), n))
        ).alias("gram"),
    )
    b_grams = benchmark.select(
        F.col(bench_id_col),
        F.explode(
            F.array_distinct(word_ngrams(tokenize(F.col(text_col)), n))
        ).alias("gram"),
    )
    b_tot = b_grams.groupBy(bench_id_col).agg(
        F.count(F.lit(1)).alias("__b_total")
    )
    shared = (
        c_grams.join(F.broadcast(b_grams), on="gram")
        .groupBy(id_col, bench_id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    return shared.join(F.broadcast(b_tot), on=bench_id_col).select(
        F.col(id_col),
        F.col(bench_id_col),
        F.col("n_shared"),
        F.round(F.col("n_shared") / F.col("__b_total"), 6).alias(
            "bench_frac"
        ),
    )


# ---------------------------------------------------------------------------
# repetition signals (the published web-corpus repetition filters:
# Rae et al. 2021 "Scaling Language Models" §A1.1 — duplicate-line
# fraction, duplicate-paragraph fraction, top-n-gram mass, duplicated
# n-gram mass). Pure Catalyst expressions — no UDFs, codegen throughout.
# ---------------------------------------------------------------------------


def _lines(col: Column | str) -> Column:
    return F.filter(
        F.transform(F.split(_c(col), r"\n"), lambda s: F.trim(s)),
        lambda s: s != F.lit(""),
    )


def duplicate_line_fraction(col: Column | str) -> Column:
    """Fraction of (non-blank, trimmed) lines that are duplicates of an
    earlier line: 1 - distinct/total. 0 for empty docs."""
    def frac_of(lines: Column) -> Column:
        n = F.size(lines)
        return F.when(
            n > 0, 1.0 - F.size(F.array_distinct(lines)) / n
        ).otherwise(F.lit(0.0))

    return bind_once(_lines(col), frac_of)


def _paragraphs(col: Column | str) -> Column:
    # explicit whitespace class, NOT \s: Java's \s includes \x0B
    # (vertical tab) while DuckDB's RE2 \s does not — texts with a
    # vertical tab between newlines would paragraph-split differently
    # in the two engines (ADVICE r11)
    return F.filter(
        F.transform(
            F.split(_c(col), r"\n[ \t\r\n\f]*\n"), lambda s: F.trim(s)
        ),
        lambda s: s != F.lit(""),
    )


def duplicate_paragraph_fraction(col: Column | str) -> Column:
    """Same signal over blank-line-separated paragraphs."""
    def frac_of(paras: Column) -> Column:
        n = F.size(paras)
        return F.when(
            n > 0, 1.0 - F.size(F.array_distinct(paras)) / n
        ).otherwise(F.lit(0.0))

    return bind_once(_paragraphs(col), frac_of)


def top_ngram_count(col: Column | str, n: int = 2) -> Column:
    """Occurrence count of the single most frequent n-gram (the mode
    multiplicity) — the integer numerator of `top_ngram_fraction`,
    exposed separately so round-free driver queries can compare
    integers instead of hashing a double.

    Expression-only mode count: sort the gram array, then the longest
    run of equal neighbors is the mode multiplicity (aggregate over the
    sorted array with a (run, best, prev) accumulator).
    """
    return _run_length_mode(
        F.array_sort(word_ngrams(tokenize(_c(col)), n))
    )


def top_ngram_fraction(col: Column | str, n: int = 2) -> Column:
    """Fraction of all n-gram occurrences taken by the single most
    frequent n-gram — high values mean one phrase dominates the doc."""
    def frac_of(grams: Column) -> Column:
        total = F.size(grams)
        return F.when(
            total > 0, _run_length_mode(F.array_sort(grams)) / total
        ).otherwise(F.lit(0.0))

    # one gram build shared by the mode count and the denominator
    return bind_once(word_ngrams(tokenize(_c(col)), n), frac_of)


def duplicated_ngram_fraction(col: Column | str, n: int = 5) -> Column:
    """Fraction of n-gram occurrences whose gram appears more than once
    (1 - distinct/total over the n-gram multiset) — boilerplate pages
    score high even when no single gram dominates."""
    def frac_of(grams: Column) -> Column:
        total = F.size(grams)
        return F.when(
            total > 0, 1.0 - F.size(F.array_distinct(grams)) / total
        ).otherwise(F.lit(0.0))

    return bind_once(word_ngrams(tokenize(_c(col)), n), frac_of)


def repetition_signals(col: Column | str) -> list[Column]:
    """The published filter set as aliased columns, ready for select():
    gating thresholds (e.g. dup_line_frac > 0.30 => drop) are corpus
    policy, left to the caller."""
    return [
        duplicate_line_fraction(col).alias("dup_line_frac"),
        duplicate_paragraph_fraction(col).alias("dup_para_frac"),
        top_ngram_fraction(col, 2).alias("top_2gram_frac"),
        duplicated_ngram_fraction(col, 5).alias("dup_5gram_frac"),
    ]


def repetition_counts(col: Column | str) -> list[Column]:
    """The same repetition signals as RAW INTEGER counts — numerators
    and denominators separately, so a driver query can gate on exact
    integer cross-multiplication instead of hashing a double (the repo's
    round-free convention). Per-row Catalyst expressions only: one scan,
    no shuffle, codegen throughout.

    NOTE: each signal expression re-evaluates tokenize/ngram from the
    raw text (Catalyst does NOT common-subexpression these across
    select items) — measured 14x slower than the shared-projection form
    at sf0.1 (r12). Prefer ``repetition_counts_df`` on any hot path;
    this form remains for expression-level composition."""
    lines = _lines(col)
    paras = _paragraphs(col)
    grams5 = word_ngrams(tokenize(_c(col)), 5)
    return [
        F.size(lines).alias("n_lines"),
        F.size(F.array_distinct(lines)).alias("n_uniq_lines"),
        F.size(paras).alias("n_paras"),
        F.size(F.array_distinct(paras)).alias("n_uniq_paras"),
        F.size(word_ngrams(tokenize(_c(col)), 2)).alias("n_2grams"),
        top_ngram_count(col, 2).alias("top_2gram_n"),
        F.size(grams5).alias("n_5grams"),
        F.size(F.array_distinct(grams5)).alias("n_uniq_5grams"),
    ]


def _run_length_mode(sorted_grams: Column) -> Column:
    """Mode multiplicity of an ALREADY-SORTED gram array (the
    top_ngram_count accumulator, factored so shared-projection callers
    can feed a precomputed column)."""
    return F.aggregate(
        sorted_grams,
        F.struct(
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
            F.lit(None).cast("string").alias("prev"),
        ),
        lambda acc, g: F.struct(
            F.when(
                acc["prev"].isNotNull() & (g == acc["prev"]),
                acc["run"] + 1,
            ).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(
                    acc["prev"].isNotNull() & (g == acc["prev"]),
                    acc["run"] + 1,
                ).otherwise(F.lit(1)),
            ).alias("best"),
            g.alias("prev"),
        ),
        lambda acc: acc["best"],
    )


def repetition_counts_df(
    df: DataFrame, text_col: str = "text", *, keep_cols: list[str] | None = None
) -> DataFrame:
    """``repetition_counts`` restructured as a TWO-STAGE projection:
    stage 1 materializes each shared intermediate (lines, paragraphs,
    2-grams, 5-grams — one tokenize, one ngram build each) exactly
    once; stage 2 derives all eight counts from those columns. Same
    values, same one-scan/zero-shuffle plan — but the text is tokenized
    once instead of per signal: **14x faster at sf0.1, measured r12**
    (Catalyst does not CSE the repeated tokenize/ngram subtrees)."""
    keep = list(keep_cols or [])
    c = F.col(text_col)
    toks = tokenize(c)
    staged = df.select(
        *keep,
        _lines(c).alias("__rlines"),
        _paragraphs(c).alias("__rparas"),
        word_ngrams(toks, 2).alias("__rg2"),
        word_ngrams(toks, 5).alias("__rg5"),
    )
    return staged.select(
        *keep,
        F.size("__rlines").alias("n_lines"),
        F.size(F.array_distinct("__rlines")).alias("n_uniq_lines"),
        F.size("__rparas").alias("n_paras"),
        F.size(F.array_distinct("__rparas")).alias("n_uniq_paras"),
        F.size("__rg2").alias("n_2grams"),
        _run_length_mode(F.array_sort(F.col("__rg2"))).alias(
            "top_2gram_n"
        ),
        F.size("__rg5").alias("n_5grams"),
        F.size(F.array_distinct("__rg5")).alias("n_uniq_5grams"),
    )


def repetition_keep(
    *,
    max_dup_line: tuple[int, int] = (3, 10),
    max_dup_para: tuple[int, int] = (3, 10),
    max_top_2gram: tuple[int, int] = (1, 5),
    max_dup_5gram: tuple[int, int] = (3, 10),
) -> Column:
    """Gopher-style repetition gate over `repetition_counts` columns as
    an EXACT integer predicate: each threshold is a rational (num, den),
    e.g. dup_line_frac <= 3/10 becomes
    ``den * (n_lines - n_uniq_lines) <= num * n_lines`` — no floating
    division, so Spark and the SQL oracle agree bit-for-bit (empty
    denominators reduce to 0 <= 0 = keep, matching the fraction form's
    0.0)."""
    ln, ld = max_dup_line
    pn, pd = max_dup_para
    tn, td = max_top_2gram
    gn, gd = max_dup_5gram
    return (
        ((F.col("n_lines") - F.col("n_uniq_lines")) * ld
         <= F.col("n_lines") * ln)
        & ((F.col("n_paras") - F.col("n_uniq_paras")) * pd
           <= F.col("n_paras") * pn)
        & (F.col("top_2gram_n") * td <= F.col("n_2grams") * tn)
        & ((F.col("n_5grams") - F.col("n_uniq_5grams")) * gd
           <= F.col("n_5grams") * gn)
    )
