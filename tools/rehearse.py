#!/usr/bin/env python3
"""Dtype-STRICT driver rehearsal (VERDICT r4 #2).

Replays the driver's correctness gate locally: for every entry in
``__ray_entry__.queries()`` that has an ``oracle_sql()`` twin, run the
Ray pipeline AND the DuckDB oracle on the same parquet tables and
compare rows + schema + values — and, beyond the round-4 rehearsal
that let four dtype bugs ship, compare ``DataFrame.dtypes``
**strictly** (the driver's value hash is dtype-sensitive: an int64
engine column vs a float64 oracle column hash-mismatches even when
every value is equal).

Usage:
    python tools/rehearse.py                      # all queries, sf0.01
    python tools/rehearse.py --first 50           # the driver's window
    python tools/rehearse.py --sf /root/testdata/sf0.001 q1_pricing_summary
    python tools/rehearse.py --json out.json

Exit status 0 iff every compared query is fully green (rows + schema +
values + dtypes).  Queries without a SQL oracle get the driver's weaker
rows-only check (runs + ≥0 rows) and are reported as ``rows_only``.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
import traceback

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _to_df(res) -> pd.DataFrame:
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon_values(df: pd.DataFrame) -> pd.DataFrame:
    """Column-sorted, row-sorted, float-rounded value frame (the
    driver-shaped value comparison).  Dtypes are compared SEPARATELY
    and strictly — this canonicalization is only for value equality."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].astype("float64").round(6)
        elif str(df[c].dtype).startswith(("uint", "int", "Int")):
            # nullable Int64 with NaN cannot cast to int64; go float
            if df[c].isna().any():
                df[c] = df[c].astype("float64")
            else:
                df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool" or str(df[c].dtype) == "boolean":
            df[c] = df[c].astype("bool")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _dtype_sig(df: pd.DataFrame) -> dict[str, str]:
    return {c: str(df[c].dtype) for c in sorted(df.columns)}


def compare(name: str, eng: pd.DataFrame, orc: pd.DataFrame) -> dict:
    out: dict = {"rows_match": len(eng) == len(orc),
                 "engine_rows": len(eng), "oracle_rows": len(orc)}
    out["schema_match"] = sorted(eng.columns) == sorted(orc.columns)
    esig, osig = _dtype_sig(eng), _dtype_sig(orc)
    out["dtype_match"] = esig == osig
    if not out["dtype_match"]:
        out["dtype_diff"] = {
            c: [esig.get(c), osig.get(c)]
            for c in set(esig) | set(osig)
            if esig.get(c) != osig.get(c)
        }
    if out["rows_match"] and out["schema_match"]:
        ce, co = _canon_values(eng), _canon_values(orc)
        try:
            pd.testing.assert_frame_equal(ce, co, check_dtype=False)
            out["value_match"] = True
        except AssertionError as exc:
            out["value_match"] = False
            out["value_diff"] = str(exc).splitlines()[-1][:300]
    else:
        out["value_match"] = False
    out["green"] = bool(out["rows_match"] and out["schema_match"]
                        and out["dtype_match"] and out["value_match"])
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: all)")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--first", type=int, default=None,
                    help="only the first N queries (driver window = 50)")
    ap.add_argument("--json", default=None, help="write full results here")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True,
                 logging_level="ERROR")

    import __ray_entry__ as E

    qs, oracles = E.queries(), E.oracle_sql()
    names = list(qs)
    if args.first:
        names = names[: args.first]
    if args.names:
        names = [n for n in names if n in set(args.names)] or args.names

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    results: dict[str, dict] = {}
    n_green = n_red = n_rows_only = 0
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            eng = _to_df(qs[name](args.sf))
            if name in oracles:
                orc = con.execute(oracles[name]).df()
                r = compare(name, eng, orc)
            else:
                r = {"rows_only": True, "engine_rows": len(eng),
                     "green": len(eng) >= 0}
                n_rows_only += 1
        except Exception:
            r = {"green": False, "err": traceback.format_exc(limit=4)}
        r["sec"] = round(time.time() - t0, 3)
        results[name] = r
        flag = "OK " if r["green"] else "RED"
        if r["green"]:
            n_green += 1
        else:
            n_red += 1
        extra = ""
        if r.get("dtype_diff"):
            extra = f"  dtype_diff={r['dtype_diff']}"
        if r.get("err"):
            extra = "  ERR " + r["err"].splitlines()[-1][:160]
        if r.get("value_diff"):
            extra += f"  value_diff={r['value_diff'][:160]}"
        print(f"[{i + 1:3d}/{len(names)}] {flag} {name:40s}"
              f" {r['sec']:7.2f}s{extra}", flush=True)

    print(f"\nGREEN {n_green}/{len(names)}  (rows-only: {n_rows_only})")
    reds = [n for n, r in results.items() if not r["green"]]
    if reds:
        print("FAILING:", ", ".join(reds))
    else:
        print("FAILING: none")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=1)
    ray.shutdown()
    return 0 if not reds else 1


if __name__ == "__main__":
    sys.exit(main())
