#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB — the per-query half of the bench's
2x-of-baseline gate. Run graft.Verify first so oracle_sql.json exists;
pass the sf dir the driver benches (default sf0.1).
"""
import sys, json, time
import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
times = {}
for name in sorted(oracle):
    try:
        # mirror the Spark bench's method: one warm pass (page cache,
        # catalog), then min-of-2 timed samples
        con.execute(oracle[name]).fetchall()
        samples = []
        for _ in range(2):
            t0 = time.time()
            con.execute(oracle[name]).fetchall()
            samples.append(time.time() - t0)
        times[name] = round(min(samples), 3)
    except Exception as e:
        times[name] = None
        print(f"{name:24s} ERROR {str(e)[:120]}")
total = sum(v for v in times.values() if v is not None)
for name, v in sorted(times.items(), key=lambda kv: -(kv[1] or 0)):
    print(f"{name:26s} {v}")
print(f"TOTAL {total:.2f} over {sum(1 for v in times.values() if v is not None)} queries")
with open("/root/repo/tools/duckdb_sf01_times.json", "w") as f:
    json.dump({"sf_dir": SFDIR, "method": "min-of-2 after one warm pass",
               "times": {k: v for k, v in times.items() if v is not None}},
              f, indent=1, sort_keys=True)
print("wrote tools/duckdb_sf01_times.json")
