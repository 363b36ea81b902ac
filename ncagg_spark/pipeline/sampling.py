"""Deterministic sampling, corpus mixing, and train/val splitting — the
dataset-assembly operations a training-data pipeline runs after cleaning
and dedup (downsample a source, mix sources to target proportions, carve
a held-out split).

Everything is keyed CONTENT-HASH sampling, not `df.sample()`:

  * reproducible — the same row set survives re-runs, repartitioning,
    cluster resizing, and engine upgrades (rand()-based sampling gives a
    different set per run and per partitioning);
  * portable — the decision is `hash64(key || salt) % M < fraction * M`
    on the md5-based 60-bit hash (functions/hashing.py), computable
    bit-identically in DuckDB SQL, so sampled outputs remain
    oracle-checkable;
  * stable under appends — adding new rows never flips the keep/drop
    decision of existing rows (the property that makes incremental
    dataset builds reproducible).

PRECONDITION: the sampling key must be NON-NULL (a primary key like
doc_id). On a NULL key the engine's ``concat_ws`` SKIPS the null and
hashes the salt alone (every null-key row gets the same ticket), while
a SQL oracle written with ``||`` yields NULL and silently DROPS the
row — a keep/drop divergence (ADVICE r14). Rather than silently
filtering (which would break split_train_val's exhaustiveness
guarantee), the contract is: sample on a non-null key, or
``COALESCE``/filter nulls yourself before calling.

Scale: every decision is a pure projection + filter (whole-stage
codegen, pushes through scans); no shuffle is introduced by sampling
itself. `mix_corpora` adds one count() aggregate per source to compute
feasible fractions — driver traffic is one number per source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ncagg_spark.functions.hashing import hash64

# keep-decision resolution: fraction quantized to 1/M
SAMPLE_MOD = 1_000_000


def _keep_ticket(key: Column | str, salt: str) -> Column:
    """Uniform ticket in [0, SAMPLE_MOD) from the portable content hash.
    Same expression renders to SQL for the oracle:
    ('0x'||substring(md5(key||'|'||salt),1,15))::BIGINT % 1000000.

    Key must be non-null (module PRECONDITION): ``concat_ws`` skips a
    NULL key (ticket = hash of the salt alone) where the SQL ``||``
    nulls out and drops the row — only a non-null key is portable."""
    c = F.col(key) if isinstance(key, str) else key
    return hash64(F.concat_ws("|", c.cast("string"), F.lit(salt))) % F.lit(
        SAMPLE_MOD
    )


def sample_hash(
    df: DataFrame,
    fraction: float,
    *,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep ~`fraction` of rows, decided by content hash of ``key_col``.

    Deterministic per (key, salt): re-runs, repartitioning, and appends
    never change an existing row's fate. Different salts draw
    independent samples from the same corpus.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction {fraction} not in [0, 1]")
    # floor(x + 0.5), NOT Python round(): round() is banker's
    # (half-to-even) and diverges from the SQL oracle's FLOOR(x+0.5)
    # at exact half-ticket cuts — same portability convention as the
    # gap-fill slot count (operators/gapfill.py)
    cut = int(fraction * SAMPLE_MOD + 0.5)
    return df.filter(_keep_ticket(key_col, salt) < F.lit(cut))


def split_train_val(
    df: DataFrame,
    val_fraction: float,
    *,
    key_col: str = "doc_id",
    salt: str = "split",
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, val) split by content hash.

    The SAME ticket partitions both sides (val = ticket < cut, train =
    rest), so membership is mutually exclusive and collectively
    exhaustive by construction — no row is lost or duplicated, and a
    document never migrates between splits across rebuilds (the
    contamination-safety property)."""
    if not 0.0 <= val_fraction <= 1.0:
        raise ValueError(f"val_fraction {val_fraction} not in [0, 1]")
    cut = int(val_fraction * SAMPLE_MOD + 0.5)  # floor(x+0.5), see sample_hash
    ticket = _keep_ticket(key_col, salt)
    return (
        df.filter(ticket >= F.lit(cut)),
        df.filter(ticket < F.lit(cut)),
    )


def split_label(
    val_fraction: float,
    *,
    key_col: str = "doc_id",
    salt: str = "split",
    train_label: str = "train",
    val_label: str = "val",
) -> Column:
    """One-pass label column ('train'/'val') from the SAME ticket
    ``split_train_val`` partitions on — use when the consumer wants
    labeled rows rather than two frames (a union of the two split
    frames would scan the source twice; this is a single projection
    on a single scan)."""
    if not 0.0 <= val_fraction <= 1.0:
        raise ValueError(f"val_fraction {val_fraction} not in [0, 1]")
    cut = int(val_fraction * SAMPLE_MOD + 0.5)  # floor(x+0.5), see sample_hash
    return (
        F.when(_keep_ticket(key_col, salt) < F.lit(cut), F.lit(val_label))
        .otherwise(F.lit(train_label))
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str,
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    languages, keep all rare ones): stratum s keeps fractions[s] of its
    rows; strata absent from the map keep ``default_fraction``.

    One projection + filter — the per-stratum cut is a CASE expression,
    no join, no shuffle."""
    for s, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction {f_} for stratum {s!r} not in [0, 1]")
    # floor(x+0.5) cuts, see sample_hash
    cut = F.lit(int(default_fraction * SAMPLE_MOD + 0.5))
    for s, f_ in sorted(fractions.items()):
        cut = (
            F.when(
                F.col(strata_col) == F.lit(s),
                F.lit(int(f_ * SAMPLE_MOD + 0.5)),
            ).otherwise(cut)
        )
    return df.filter(_keep_ticket(key_col, salt) < cut)


def _mix_fractions(
    counts: dict[str, int], proportions: dict[str, float]
) -> dict[str, float]:
    """The count-driven mix arithmetic, shared VERBATIM by
    ``mix_corpora`` and ``mix_corpus_labeled`` so the two APIs (and the
    SQL oracle that mirrors this expression order step for step) keep
    bit-identical IEEE-754 cuts: normalize proportions, find the
    largest feasible total T = min_i count_i / prop_i, and return the
    per-source keep fraction min(1, T * p_i / count_i). Raises on a
    positive-proportion source with zero rows (an empty source would
    silently drive the whole mix to empty)."""
    total_p = sum(proportions.values())
    if total_p <= 0:
        raise ValueError("proportions must sum to > 0")
    props = {k: v / total_p for k, v in proportions.items()}
    empty = sorted(k for k, p in props.items() if p > 0 and counts[k] == 0)
    if empty:
        raise ValueError(
            f"source(s) {empty} have positive proportion but zero rows; "
            "drop them from proportions or supply data"
        )
    feasible_total = min(counts[k] / p for k, p in props.items() if p > 0)
    return {
        k: min(1.0, (feasible_total * p) / counts[k])
        for k, p in props.items()
        if p > 0 and counts[k] > 0
    }


def mix_corpora(
    sources: dict[str, DataFrame],
    proportions: dict[str, float],
    *,
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Mix named sources to target proportions WITHOUT oversampling.

    Finds the largest total T such that every source can supply its
    share from its own rows (T = min_i count_i / prop_i), downsamples
    source i to T * prop_i rows via deterministic hash sampling, and
    unions with a ``source`` provenance column. One count() per source
    (driver traffic: one number each); the mix itself is
    projection+filter+union — no shuffle.

    The standard pre-training data-mixing shape (web 80% / code 15% /
    reference 5%): proportions are by ROW COUNT; weight by tokens by
    pre-aggregating if needed.
    """
    if set(sources) != set(proportions):
        raise ValueError("sources and proportions must share keys")
    counts = {k: df.count() for k, df in sources.items()}
    fracs = _mix_fractions(counts, proportions)
    parts = []
    for name in sorted(sources):
        if name not in fracs:
            continue
        part = sample_hash(
            sources[name], fracs[name], key_col=key_col,
            salt=f"{salt}:{name}",
        )
        parts.append(part.withColumn(source_col, F.lit(name)))
    if not parts:
        raise ValueError(
            "no mixable source: every source with positive proportion "
            "is empty"
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def mix_corpus_labeled(
    df: DataFrame,
    proportions: dict[str, float],
    *,
    label_col: str,
    key_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """``mix_corpora`` for the common case where the sources are label
    slices of ONE frame (e.g. per-language cuts of a documents table):
    all per-source counts come from a single ``groupBy(label).count()``
    job and the mix itself is one projection + filter over ONE scan.

    The dict-of-frames API run over slices of the same table costs one
    count JOB (one full scan of the label column) per source plus one
    scan per surviving slice in the union — 2k scans for k sources.
    At 100 TB that is the difference between reading the corpus once
    and reading it 2k times (VERDICT r14 #2). Same arithmetic
    (``_mix_fractions``) and same per-source ticket salts
    (``{salt}:{label}``) as ``mix_corpora``: the two APIs produce the
    IDENTICAL row set for identical inputs — pinned by test.

    Rows whose label is absent from ``proportions`` are excluded (they
    are not a source). Raises like ``mix_corpora`` when a
    positive-proportion label has zero rows.
    """
    labels = sorted(proportions)
    cnt_rows = (
        df.filter(F.col(label_col).isin(labels))
        .groupBy(label_col)
        .count()
        .collect()
    )
    counts = {k: 0 for k in labels}
    counts.update({r[label_col]: int(r["count"]) for r in cnt_rows})
    fracs = _mix_fractions(counts, proportions)
    if not fracs:
        raise ValueError(
            "no mixable source: every source with positive proportion "
            "is empty"
        )
    # per-label cut as ONE nested CASE; ticket salt is the label value
    # itself ('{salt}:{label}'), byte-identical to the per-frame salts
    cut = F.lit(None).cast("long")
    for name in labels:
        if name in fracs:
            cut = F.when(
                F.col(label_col) == F.lit(name),
                F.lit(int(fracs[name] * SAMPLE_MOD + 0.5)),
            ).otherwise(cut)
    ticket = hash64(
        F.concat_ws(
            "|",
            F.col(key_col).cast("string"),
            F.concat(F.lit(f"{salt}:"), F.col(label_col).cast("string")),
        )
    ) % F.lit(SAMPLE_MOD)
    return df.filter(ticket < cut).withColumn(
        source_col, F.col(label_col).cast("string")
    )
