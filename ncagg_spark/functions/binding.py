"""Expression binding: evaluate a subtree once, reference it many times.

Catalyst performs no common-subexpression elimination inside
higher-order-function lambdas, and none across repeated references to
the same subtree within one expression: referencing e.g.
``tokenize(text)`` inside a ``transform()`` lambda re-evaluates the
whole tokenize tree per array element (O(T^2) for word_ngrams — the
gram loop re-splits the document for every gram), and referencing it
from k sibling sub-expressions evaluates it k times.

``bind_once(expr, fn)`` wraps ``expr`` in a single-element array and
applies ``fn`` through ``transform``: the lambda parameter is a bound
``NamedLambdaVariable`` — a plain attribute read — so every reference
inside ``fn``'s body costs nothing, and ``expr`` is evaluated exactly
once per row. Values are unchanged (the wrapper is get(transform(
array(e), fn), 0), an identity around fn(e)), including for NULL
``expr``: the lambda still runs once with a NULL argument, exactly as
the inline form would.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_once(expr: Column, fn: Callable[[Column], Column]) -> Column:
    """fn(expr) with ``expr`` evaluated once per row (see module doc)."""
    return F.get(F.transform(F.array(expr), fn), 0)
