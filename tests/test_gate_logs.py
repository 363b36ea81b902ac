"""Gate-log truncation guard (VERDICT r11 #2, tightened r13 per VERDICT
r12 #7): round-11's close-of-round sf1.0 gate log was checked in with
only 2 PASS lines and no summary — not evidence. From r12 on, every
checked-in scale-gate log MUST contain the complete `N passed, 0
failed` summary line; from r13 on, N must equal the CURRENT registry
size for the latest round's logs (a complete-but-partial log saying
"2 passed, 0 failed" would otherwise slip through)."""

from __future__ import annotations

import glob
import os
import re

TOOLS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")


def _round_of(path: str) -> int:
    m = re.search(r"_r(\d+)[a-z]?\.txt$", path)
    return int(m.group(1)) if m else 0


def _gate_logs() -> list[str]:
    return sorted(
        glob.glob(os.path.join(TOOLS, "logs_sf1_gate_*.txt"))
        + glob.glob(os.path.join(TOOLS, "logs_sf10_gate_*.txt"))
    )


def test_gate_logs_end_with_complete_summary():
    logs = _gate_logs()
    assert logs, "no gate logs found"
    bad = []
    for path in logs:
        if _round_of(path) < 12:
            continue  # legacy logs predate the convention
        text = open(path).read()
        if not re.search(r"^\d+ passed, 0 failed\s*$", text, re.M):
            bad.append(os.path.basename(path))
    assert not bad, f"gate logs missing the 'N passed, 0 failed' summary: {bad}"


def test_latest_gate_logs_cover_the_full_registry():
    """The N in 'N passed, 0 failed' must equal the registry size for
    the LATEST round's gate logs. Older logs are pinned history — their
    registry was smaller — so only the newest round is held to the
    current size (the registry only grows; a stale-but-complete old log
    can't masquerade as current-round evidence because the round number
    is in the filename)."""
    import __spark_entry__ as entry

    registry_n = len(entry.queries())
    logs = [p for p in _gate_logs() if _round_of(p) >= 12]
    assert logs, "no r12+ gate logs found"
    latest = max(_round_of(p) for p in logs)
    bad = []
    for path in logs:
        if _round_of(path) != latest:
            continue
        text = open(path).read()
        m = re.search(r"^(\d+) passed, 0 failed\s*$", text, re.M)
        n = int(m.group(1)) if m else -1
        if n != registry_n:
            bad.append(f"{os.path.basename(path)}: {n} != {registry_n}")
    assert not bad, (
        "latest-round gate logs do not cover the full registry: "
        f"{bad}"
    )
