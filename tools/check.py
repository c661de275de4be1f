#!/usr/bin/env python3
"""Local replay of the driver's t2 correctness gate: run graft.Verify's
parquet output against the DuckDB oracle (oracle_sql.json) and diff
normalized rows. Usage: python3 tools/check.py <sfDir> <verifyOutDir>"""
import sys, json, pathlib
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if v is None: vals.append("NULL")
            elif isinstance(v, bool): vals.append(str(v).lower())
            elif isinstance(v, float): vals.append(f"{v:.6f}")
            elif hasattr(v, "isoformat"): vals.append(v.isoformat()[:26])
            else: vals.append(str(v))
        out.append("|".join(vals))
    return out

def main(sf_dir, out_dir):
    out_dir = pathlib.Path(out_dir)
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    con.execute("SET threads TO 4; SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = 0
    fails = []
    for name, sql in sorted(oracle.items()):
        def fetch_sorted(q):
            cur = con.execute(q)
            cols = [d[0] for d in cur.description]
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            rows = [tuple(r[i] for i in order) for r in cur.fetchall()]
            return sorted(cols), rows
        try:
            duck_cols, duck_raw = fetch_sorted(sql)
            duck_rows = norm(duck_raw)
            # spark result parquet, columns sorted by name like the driver
            sp_cols, sp_raw = fetch_sorted(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            sp_rows = norm(sp_raw)
            if duck_cols != sp_cols:
                fails.append((name, f"SCHEMA duck={duck_cols} spark={sp_cols}"))
            elif duck_rows != sp_rows:
                d = [i for i, (a, b) in enumerate(zip(duck_rows, sp_rows)) if a != b]
                detail = f"ROWS duck_n={len(duck_rows)} spark_n={len(sp_rows)}"
                if d: detail += f" first_diff@{d[0]}: duck={duck_rows[d[0]]!r} spark={sp_rows[d[0]]!r}"
                fails.append((name, detail))
            else:
                n_ok += 1
                print(f"OK   {name}  rows={len(duck_rows)}")
        except Exception as e:
            fails.append((name, f"ERROR {str(e).splitlines()[0][:200]}"))
    for name, msg in fails:
        print(f"FAIL {name}  {msg}")
    print(f"== {n_ok}/{len(oracle)} MATCH")
    return 0 if not fails else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
