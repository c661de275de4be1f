#!/usr/bin/env python3
"""Time the DuckDB oracle replay of the full contract battery — the
same-data cross-engine comparison BASELINE.md records each round.

Usage: python3 tools/time_oracle.py <sfDir> <verifyOutDir> [threads]

<verifyOutDir> must contain oracle_sql.json (graft.Verify writes it).
Views are registered and warmed (schema resolution) before timing;
each query is then timed once, cold data, in sorted key order — the
same discipline as graft.Bench. Emits one JSON line per query and a
final summary line with the total and the 1-min loadavg at start.
"""
import sys, json, os, time, pathlib
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main(sf_dir, out_dir, threads=32):
    oracle = json.loads((pathlib.Path(out_dir) / "oracle_sql.json").read_text())
    load = os.getloadavg()[0]
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}; SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    total = 0.0
    times = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.monotonic()
        con.execute(sql).fetchall()
        sec = time.monotonic() - t0
        times[name] = round(sec, 3)
        total += sec
        print(json.dumps({"query": name, "sec": round(sec, 3)}))
    print(json.dumps({"metric": "oracle_total", "value": round(total, 2),
                      "unit": "sec", "n": len(times), "sf": sf_dir,
                      "threads": threads, "load": round(load, 2),
                      "queries": times}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 32)
