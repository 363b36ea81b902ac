"""Global-attribute reduction strategies over the file manifest.

The reference reduces each output global attribute across input files with
a named strategy (registry ncagg/attributes.py:305-322; strategy classes
:70-300; defaults ncagg/config.py:373-382). These are aggregate functions
over the *ordered* file manifest — a tiny DataFrame (one row per input
file) — so here each strategy is a function returning a Spark aggregate
expression evaluated in a single groupBy().agg() over the manifest.

Ordering: "first"/"last" mean first/last in file order. Spark's
F.first/F.last are only deterministic given a deterministic row order, so
strategies that care use min_by/max_by over the explicit ``file_order``
column built by plans.manifest (SURVEY.md §7.5.2 determinism rule).

Strategy inventory mirrors the reference registry (A1-A16 in SURVEY.md
§2.5):
  first, last, unique_list, int_sum, float_sum, constant, static,
  date_created, time_coverage_start, time_coverage_end, filename, remove,
  first_input, last_input, input_count, ncagg_version.

Error tolerance: the reference logs and skips per-attribute failures
(attributes.py:353-359, 380-385) and drops None/blank results
(:374-379); ``reduce_attributes`` mirrors both.
"""

from __future__ import annotations

import os
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ncagg_spark.plans.manifest import FILE_COL, FILE_ORDER_COL

# A strategy builds an aggregate Column from (attr_column_name, context).
# Context keys (all optional): "static_value", "min_bound", "max_bound",
# "output_path", "version".
Strategy = Callable[[str, dict[str, Any]], Column]

_ISO = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def _first(col: str, ctx: dict) -> Column:
    # first non-null value in file order (reference attributes.py:70-77)
    return F.min_by(F.col(col), F.when(F.col(col).isNotNull(), F.col(FILE_ORDER_COL)))


def _last(col: str, ctx: dict) -> Column:
    return F.max_by(F.col(col), F.when(F.col(col).isNotNull(), F.col(FILE_ORDER_COL)))


def _unique_list(col: str, ctx: dict) -> Column:
    # split on ", ", order-preserving unique, rejoin (attributes.py:113-129).
    # sort_array over (file_order, value) keeps arrival order before dedup.
    # Files missing the attribute are skipped (the reference's None-skip
    # finalize) — without the filter, flatten() null-propagates one
    # null inner array over the WHOLE merged list.
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(FILE_ORDER_COL).alias("o"), F.col(col).alias("v")))
    )
    present = F.filter(pairs, lambda p: p["v"].isNotNull())
    values = F.flatten(F.transform(present, lambda p: F.split(p["v"], ", ")))
    return F.array_join(F.array_distinct(values), ", ")


def _int_sum(col: str, ctx: dict) -> Column:
    return F.sum(F.col(col).cast("long"))


def _float_sum(col: str, ctx: dict) -> Column:
    return F.sum(F.col(col).cast("double"))


def _constant(col: str, ctx: dict) -> Column:
    # all files must agree (attributes.py:170-180); disagreement is raised
    # by reduce_attributes after collection.
    return F.struct(
        F.count_distinct(F.col(col)).alias("n"), F.first(F.col(col), True).alias("v")
    )


def _static(col: str, ctx: dict) -> Column:
    return F.lit(ctx.get("static_value"))


def _date_created(col: str, ctx: dict) -> Column:
    return F.date_format(F.current_timestamp(), _ISO)


def _time_coverage_start(col: str, ctx: dict) -> Column:
    b = ctx.get("min_bound")
    return F.date_format(F.lit(b), _ISO) if b is not None else F.lit(None)


def _time_coverage_end(col: str, ctx: dict) -> Column:
    b = ctx.get("max_bound")
    return F.date_format(F.lit(b), _ISO) if b is not None else F.lit(None)


def _filename(col: str, ctx: dict) -> Column:
    p = ctx.get("output_path")
    return F.lit(os.path.basename(p) if p else None)


def _remove(col: str, ctx: dict) -> Column:
    return F.lit(None)


def _basename(c: Column) -> Column:
    return F.element_at(F.split(c, "/"), -1)


def _first_input(col: str, ctx: dict) -> Column:
    return _basename(F.min_by(F.col(FILE_COL), F.col(FILE_ORDER_COL)))


def _last_input(col: str, ctx: dict) -> Column:
    return _basename(F.max_by(F.col(FILE_COL), F.col(FILE_ORDER_COL)))


def _input_count(col: str, ctx: dict) -> Column:
    return F.count(F.lit(1))


def _version(col: str, ctx: dict) -> Column:
    from ncagg_spark import __version__

    return F.lit(ctx.get("version", __version__))


STRATEGIES: dict[str, Strategy] = {
    "first": _first,
    "last": _last,
    "unique_list": _unique_list,
    "int_sum": _int_sum,
    "float_sum": _float_sum,
    "constant": _constant,
    "static": _static,
    "date_created": _date_created,
    "time_coverage_start": _time_coverage_start,
    "time_coverage_end": _time_coverage_end,
    "filename": _filename,
    "remove": _remove,
    "first_input": _first_input,
    "last_input": _last_input,
    "input_count": _input_count,
    "ncagg_version": _version,
}


def attribute_exprs(
    strategies: dict[str, str], ctx: dict[str, Any] | None = None
) -> list[Column]:
    """Aggregate expressions for a manifest groupBy().agg(*exprs)."""
    ctx = ctx or {}
    exprs = []
    for attr, strat in strategies.items():
        if strat == "remove":
            continue
        if strat not in STRATEGIES:
            raise KeyError(f"unknown attribute strategy: {strat!r}")
        exprs.append(STRATEGIES[strat](attr, ctx).alias(attr))
    return exprs


def reduce_attributes(
    manifest: DataFrame,
    strategies: dict[str, str],
    ctx: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Evaluate all strategies in ONE aggregation job over the manifest and
    return the finalized attribute dict (None/blank skipped, per the
    reference's finalize semantics).
    """
    exprs = attribute_exprs(strategies, ctx)
    if not exprs:
        return {}
    row = manifest.agg(*exprs).collect()[0].asDict(recursive=True)
    out: dict[str, Any] = {}
    for attr, strat in strategies.items():
        if strat == "remove":
            continue
        v = row[attr]
        if strat == "constant":
            if v["n"] > 1:
                raise AssertionError(
                    f"constant attribute {attr!r} differs across input files"
                )
            v = v["v"]
        if v is None or v == "":
            continue
        out[attr] = v
    return out
