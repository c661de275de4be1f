#!/usr/bin/env python3
"""Strict replay of the driver's correctness gate, mimicking its read
path: oracle via duckdb .df() (DECIMAL->float64, HUGEINT->float64),
Spark output via pandas.read_parquet, columns sorted by name, rows
sorted pandas-style, then EXACT per-cell comparison (both value and
string form — a hash of either must match). Reports dtype differences
and per-column diffs for diagnosis.

Usage: python3 tools/strict_check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, pathlib, math, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    try:
        df = df.sort_values(by=cols, kind="mergesort")
    except TypeError as e:
        raise RuntimeError(f"driver-style sort failed (unsortable cell type): {e}")
    return df.reset_index(drop=True)

def cell(v):
    # string form a hash would see; normalize NaN/None spellings only
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    # DATE columns: duckdb .df() yields midnight Timestamps, spark
    # parquet yields datetime.date objects — the driver accepts this
    # (q15/q25 hash-matched in round 1), so normalize both to the date.
    if isinstance(v, pd.Timestamp) and v.normalize() == v:
        return str(v.date())
    return str(v)

def main(sf_dir, out_dir, only):
    out_dir = pathlib.Path(out_dir)
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    con.execute("SET threads TO 4; SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok, fails = 0, []
    # unknown names must FAIL, not silently shrink the checked set to 0
    for name in sorted(only - set(oracle)):
        fails.append((name, "UNKNOWN query name (not in oracle_sql.json)"))
    for name, sql in sorted(oracle.items()):
        if only and name not in only: continue
        try:
            d = canon(con.execute(sql).df())
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            s = canon(pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        except Exception as e:
            fails.append((name, f"ERROR {str(e).splitlines()[-1][:200]}"))
            continue
        if list(d.columns) != list(s.columns):
            fails.append((name, f"SCHEMA duck={list(d.columns)} spark={list(s.columns)}")); continue
        if len(d) != len(s):
            fails.append((name, f"ROWCOUNT duck={len(d)} spark={len(s)}")); continue
        dtype_notes = [f"{c}: duck={d[c].dtype} spark={s[c].dtype}"
                       for c in d.columns if str(d[c].dtype) != str(s[c].dtype)]
        bad = {}
        for c in d.columns:
            dv, sv = d[c].tolist(), s[c].tolist()
            for i, (a, b) in enumerate(zip(dv, sv)):
                ca, cb = cell(a), cell(b)
                if ca != cb:
                    if c not in bad:
                        bad[c] = f"row{i} duck={ca!r} spark={cb!r} types=({type(a).__name__},{type(b).__name__})"
        if bad:
            detail = "; ".join(f"{c}: {ex}" for c, ex in sorted(bad.items()))
            if dtype_notes: detail += " | DTYPES " + "; ".join(dtype_notes)
            fails.append((name, f"VALUES {detail[:600]}"))
        else:
            n_ok += 1
            note = (" [dtype-diff: " + "; ".join(dtype_notes) + "]") if dtype_notes else ""
            print(f"OK   {name}  rows={len(d)}{note}")
    for name, msg in fails:
        print(f"FAIL {name}  {msg}")
    total = len(only) if only else len(oracle)
    print(f"== {n_ok}/{total} EXACT-MATCH")
    return 0 if not fails else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
