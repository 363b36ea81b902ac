"""Gate-log truncation guard (VERDICT r11 #2): round-11's close-of-round
sf1.0 gate log was checked in with only 2 PASS lines and no summary —
not evidence. From r12 on, every checked-in scale-gate log MUST contain
the complete `N passed, 0 failed` summary line; a truncated log fails
the suite, so it cannot ride along into a round close unnoticed."""

from __future__ import annotations

import glob
import os
import re

TOOLS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")


def _round_of(path: str) -> int:
    m = re.search(r"_r(\d+)[a-z]?\.txt$", path)
    return int(m.group(1)) if m else 0


def test_gate_logs_end_with_complete_summary():
    logs = sorted(
        glob.glob(os.path.join(TOOLS, "logs_sf1_gate_*.txt"))
        + glob.glob(os.path.join(TOOLS, "logs_sf10_gate_*.txt"))
    )
    assert logs, "no gate logs found"
    bad = []
    for path in logs:
        if _round_of(path) < 12:
            continue  # legacy logs predate the convention
        text = open(path).read()
        if not re.search(r"^\d+ passed, 0 failed\s*$", text, re.M):
            bad.append(os.path.basename(path))
    assert not bad, f"gate logs missing the 'N passed, 0 failed' summary: {bad}"
