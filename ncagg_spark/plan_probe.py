"""Capture the internal DataFrames an eager-at-construction operator
executes, so plan audits and tests can see the REAL work (VERDICT r12
#3: ``doc_len_quantiles`` runs <= 7 histogram jobs during query
construction and returns a local relation — without this hook the plan
audit printed a vacuous 0/0/0 for it).

Operators that execute jobs at construction call ``observe(label, df)``
with each internal DataFrame IMMEDIATELY before running it. When no
capture is active this is a no-op (one falsy list check). Auditors and
tests wrap the construction:

    with plan_probe.capture() as jobs:
        q = exact_quantiles(df, "x", [0.5])
    for label, internal_df in jobs:
        internal_df.explain(...)

The audit tool sums plan facts over the captured frames, so a PLANS row
for an eager query reports the true scan/shuffle counts instead of the
empty shape of the returned local relation.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame

_sinks: List[List[Tuple[str, DataFrame]]] = []


def observe(label: str, df: DataFrame) -> None:
    """Report an internal DataFrame about to be executed at query
    construction. No-op unless a ``capture()`` block is active."""
    for sink in _sinks:
        sink.append((label, df))


@contextmanager
def capture() -> Iterator[List[Tuple[str, DataFrame]]]:
    """Collect every ``observe`` call made while the block runs."""
    sink: List[Tuple[str, DataFrame]] = []
    _sinks.append(sink)
    try:
        yield sink
    finally:
        _sinks.remove(sink)
