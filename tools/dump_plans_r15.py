"""Dump .explain("formatted") for driver queries to plans/r15/<q>_<tag>.txt.

Usage:
    python tools/dump_plans_r15.py <tag> [query ...]     # default: all queries

The optimization-round evidence artifact: a _before and _after file per
touched query so plan claims (Exchange counts, join strategies, pushed
filters) are checkable without running Spark.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from ncagg_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out_dir = "/root/repo/plans/r15"
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="ncagg-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    if not names:
        names = list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # streaming queries etc.
            text = f"(explain failed: {exc})\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} [{tag}]\n")
            fh.write(text)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
