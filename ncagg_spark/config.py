"""Aggregation configuration — the Spark-native successor of the reference's
JSON Config (reference: ncagg/config.py:27-138).

The reference Config bundles output schema (dims/vars/attrs) with
aggregation settings. In Spark the schema half is just a StructType that the
Parquet source/sink carries natively, so this module keeps only the
aggregation settings:

  * ``index_by``      — the event-time (ordering) column
                        (reference: ncagg/config.py:216).
  * ``cadence_hz``    — expected records/second along the index
                        (reference: `expected_cadence`, ncagg/config.py:217).
  * ``min_bound`` / ``max_bound`` — output time range
                        (reference: dim min/max, ncagg/cli.py:203-205).
  * ``timing_certainty`` — tolerance band for dedup/gap decisions
                        (reference: ncagg/aggregator.py:29-33, fixed 0.9).
  * per-column fill-value sentinels, alt-name coalesce lists, attribute
    strategies (reference: config.py:271-289, 355-382).

Cadence tolerance formulas are the reference's, verbatim
(ncagg/aggregator.py:119-125):

    dt_min = 1 / ((2 - c) * hz)     # closer than this => duplicate
    dt_nom = 1 / hz                 # nominal spacing
    dt_max = 1 / (c * hz)           # farther than this => gap

with c = timing_certainty in (0, 1].
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

MICROS = 1_000_000


def _to_micros(t: datetime | int | float | None) -> int | None:
    """Normalize a bound to integer epoch-microseconds (UTC)."""
    if t is None:
        return None
    if isinstance(t, datetime):
        if t.tzinfo is None:
            t = t.replace(tzinfo=timezone.utc)
        return int(round(t.timestamp() * MICROS))
    return int(round(float(t) * MICROS))


@dataclass
class AggregationConfig:
    """Settings for one regularized aggregation over a granule table."""

    index_by: str
    cadence_hz: float | None = None
    min_bound: datetime | int | float | None = None
    max_bound: datetime | int | float | None = None
    timing_certainty: float = 0.9
    # column -> sentinel that means "missing" and becomes null on read
    # (reference: _FillValue normalization, ncagg/aggrelist.py:568-582)
    fill_values: dict[str, Any] = field(default_factory=dict)
    # output column -> ordered list of alternate source columns
    # (reference: copy_from_alt, ncagg/config.py:282-289)
    copy_from_alt: dict[str, list[str]] = field(default_factory=dict)
    # cadence-slot alignment: slot = floor((t - origin)/step + phase).
    # 0.0 (default) = floor buckets [k, k+1) — the engine's oracle-checked
    # semantics; 0.5 = NEAREST-slot buckets [k-1/2, k+1/2), the
    # reference's phase (its too-close chop merges records within half a
    # cadence of each other, ncagg/aggrelist.py:290-293)
    bucket_phase: float = 0.0
    # where the cadence grid's sub-step phase comes from:
    #   "bound" (default) — slot k's nominal time is min_bound + k*step;
    #       the engine's oracle-checked semantics.
    #   "data" — the grid is anchored to the FIRST real record's phase:
    #       origin = min_bound + ((first_record - min_bound) mod step).
    #       This is the reference's effective behavior — it never
    #       rewrites real timestamps and back-computes leading fill
    #       start times from the next real node
    #       (ncagg/aggregator.py:176-191: start_from = next_start -
    #       (size+1)*dt_nom, bumped up so the first fill stays >= the
    #       bound — which is exactly the mod-step phase shift), so a
    #       day build over phase-offset granules reproduces the
    #       reference's grid slot-for-slot. Costs one extra min()
    #       aggregate over the index column at plan time.
    grid_phase: str = "bound"
    # global-attribute name -> strategy name (see plans/attributes.py)
    # (reference: ncagg/config.py:355-382)
    attribute_strategies: dict[str, str] = field(default_factory=dict)
    # array column -> element index to extract (drops the fixed dim)
    # (reference: take_dim_indicies, README.md:299-317 — regressed there,
    # implemented here)
    take_dim_indices: dict[str, int] = field(default_factory=dict)
    # output renames (reference: map_to, ncagg/aggregator.py:378)
    rename: dict[str, str] = field(default_factory=dict)
    # deterministic tiebreak column(s) for dedup beyond the index itself
    tiebreak: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        if not (0.0 < self.timing_certainty <= 1.0):
            raise ValueError("timing_certainty must be in (0, 1]")
        if self.cadence_hz is not None and self.cadence_hz <= 0:
            raise ValueError("cadence_hz must be positive")
        if self.grid_phase not in ("bound", "data"):
            raise ValueError(
                f"grid_phase must be 'bound' or 'data', got "
                f"{self.grid_phase!r}"
            )

    def validate_columns(self, columns: Sequence[str]) -> None:
        """Inter-validation against the actual input columns — the
        reference's Config.inter_validate (ncagg/config.py; exercised by
        test/generic/test_util_validate_unlim_config.py): settings that
        MUST name a real variable raise a clear error up front instead of
        a deep AnalysisException at plan time.

        ``fill_values`` and ``copy_from_alt`` are deliberately lenient —
        a sentinel for a column some granules lack, or an alternate name
        absent from this batch, is a no-op by design (P4 semantics).
        """
        cols = set(columns)
        # the index may materialize from alternate source names (P3):
        # accept it if any declared alternate is present
        index_sources = {self.index_by, *self.copy_from_alt.get(
            self.index_by, []
        )}
        if not (index_sources & cols):
            raise ValueError(
                f"index_by {self.index_by!r} is not an input column "
                "(and no copy_from_alt alternate for it is present)"
            )
        for c in self.tiebreak:
            if c not in cols:
                raise ValueError(f"tiebreak column {c!r} is not an input column")
        for c, i in self.take_dim_indices.items():
            if c not in cols:
                raise ValueError(
                    f"take_dim_indices column {c!r} is not an input column"
                )
            if i < 0:
                raise ValueError(
                    f"take_dim_indices[{c!r}] must be >= 0, got {i}"
                )

    # --- cadence tolerances (reference: ncagg/aggregator.py:119-125) ---

    @property
    def dt_nom(self) -> float:
        assert self.cadence_hz is not None
        return 1.0 / self.cadence_hz

    @property
    def dt_min(self) -> float:
        assert self.cadence_hz is not None
        return 1.0 / ((2.0 - self.timing_certainty) * self.cadence_hz)

    @property
    def dt_max(self) -> float:
        assert self.cadence_hz is not None
        return 1.0 / (self.timing_certainty * self.cadence_hz)

    # --- integer-microsecond views (exact arithmetic for oracle parity) ---

    @property
    def step_us(self) -> int:
        """Nominal cadence step in whole microseconds."""
        assert self.cadence_hz is not None
        return int(round(MICROS / self.cadence_hz))

    @property
    def min_us(self) -> int | None:
        return _to_micros(self.min_bound)

    @property
    def max_us(self) -> int | None:
        return _to_micros(self.max_bound)

    def n_buckets(self) -> int:
        """Number of cadence slots in [min_bound, max_bound)."""
        lo, hi = self.min_us, self.max_us
        if lo is None or hi is None:
            raise ValueError("n_buckets requires both bounds")
        return max(0, -(-(hi - lo) // self.step_us))
