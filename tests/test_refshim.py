"""The head-to-head harness (tools/bench_vs_reference.py) runs the
ACTUAL reference package over tools/refshim's netCDF4/cerberus stand-ins
backed by this repo's from-spec codecs. Pin that the reference really
runs and produces its documented output through the shim, so the
benchmark artifact in SCALE.md stays reproducible."""

from __future__ import annotations

import glob
import os
import sys
import tempfile
from datetime import datetime

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not glob.glob(f"{REF}/test/exis/EXISL1bSFXR_5min/data/*.nc"),
    reason="reference fixtures not present",
)


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, os.path.join(REPO, "tools", "refshim"))
    sys.path.insert(0, REF)
    try:
        import ncagg.aggregator as agg
        import ncagg.config as refcfg

        yield refcfg, agg
    finally:
        sys.path.remove(os.path.join(REPO, "tools", "refshim"))
        sys.path.remove(REF)


def test_reference_exis_runs_through_shim(ref_modules):
    refcfg, agg = ref_modules
    files = sorted(
        glob.glob(f"{REF}/test/exis/EXISL1bSFXR_5min/data/*.nc")
    )
    cfg = refcfg.Config.from_nc(files[0])
    cfg.dims["report_number"].update(
        {
            "index_by": "time",
            "min": datetime(2017, 3, 5, 0, 30),
            "max": datetime(2017, 3, 5, 0, 35),
            "expected_cadence": {"report_number": 1},
        }
    )
    cfg.inter_validate()
    fd, out = tempfile.mkstemp(suffix=".nc")
    os.close(fd)
    try:
        al = agg.generate_aggregation_list(cfg, files)
        agg.evaluate_aggregation_list(cfg, al, out)
        import netCDF4 as nc  # resolves to the shim inside the fixture

        with nc.Dataset(out) as f:
            t = f.variables["time"][:]
            # the reference's own assertions (test_EXISL1bSFXR.py):
            # exact 1 Hz diffs over the 5-minute window
            assert t.size == 300
            d = np.diff(t)
            assert abs(d.min() - 1.0) < 1e-3
            assert abs(d.max() - 1.0) < 1e-3
            assert len(f.variables) > 50
    finally:
        os.remove(out)


def test_shim_num2date_roundtrip(ref_modules):
    import netCDF4 as nc

    units = "seconds since 2000-01-01 12:00:00"
    dt = datetime(2017, 2, 12, 15, 0, 30)
    num = nc.date2num(dt, units)
    assert nc.num2date(num, units) == dt
    arr = nc.num2date(np.array([num, num + 1.0]), units)
    assert list(arr) == [dt, datetime(2017, 2, 12, 15, 0, 31)]
