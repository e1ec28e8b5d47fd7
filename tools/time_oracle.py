#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB — the per-query half of the bench's
2x-of-baseline gate. Run graft.Verify first so oracle_sql.json exists;
pass the sf dir the driver benches (default sf0.1).

Two outputs per query into tools/duckdb_sf01_times.json:
 - times[q]: full oracle wall (min-of-2 after a warm pass), MERGED as a
   per-query min with whatever the committed file already records, so
   re-running in a noisy window can only tighten the baseline;
 - times_fixture_cte[q] (fixture-family only, per
   oracle_fixture_cte.json written by Verify): the wall of the oracle's
   fixture-equivalent CTE prefix, timed standalone as
   `<WITH chain truncated at the boundary> SELECT count(*) FROM <cte>`.
   The Spark side reads that stage from a prepare-materialized store,
   so `times[q] - times_fixture_cte[q]` is the like-for-like
   denominator (approximate: DuckDB may overlap prefix and suffix work
   when running the full query, so the split is a labeled upper bound
   on the moved cost, not an exact decomposition).
"""
import sys, json, os, time
import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
DEST = "/root/repo/tools/duckdb_sf01_times.json"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
try:
    fixture_cte = json.load(open(f"{OUT}/oracle_fixture_cte.json"))
except FileNotFoundError:
    fixture_cte = {}


def prefix_query(sql, cte):
    """Truncate a WITH chain right after `cte`'s definition and select
    its cardinality — paren-depth scan, skipping string literals."""
    import re
    m = re.search(r"\b" + re.escape(cte) + r"\s+AS\s*\(", sql)
    if not m:
        return None
    i, depth, in_str = m.end() - 1, 0, False
    while i < len(sql):
        c = sql[i]
        if in_str:
            if c == "'":
                in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return sql[: i + 1] + f"\nSELECT count(*) FROM {cte}"
        i += 1
    return None


def timed(sql):
    con.execute(sql).fetchall()  # warm pass: page cache, catalog
    samples = []
    for _ in range(2):
        t0 = time.time()
        con.execute(sql).fetchall()
        samples.append(time.time() - t0)
    return round(min(samples), 3)


times, fixture_times = {}, {}
for name in sorted(oracle):
    try:
        times[name] = timed(oracle[name])
    except Exception as e:
        times[name] = None
        print(f"{name:24s} ERROR {str(e)[:120]}")
        continue
    if name in fixture_cte:
        psql = prefix_query(oracle[name], fixture_cte[name])
        if psql is None:
            print(f"{name:24s} FIXTURE-CTE '{fixture_cte[name]}' NOT FOUND")
            continue
        try:
            fixture_times[name] = timed(psql)
        except Exception as e:
            print(f"{name:24s} FIXTURE-ERROR {str(e)[:120]}")

# merge-min with the committed file: the baseline is the best honest
# DuckDB time we have ever observed for each query, so a throttled
# re-run can't loosen it (BASELINE.md records the method)
prev = {}
if os.path.exists(DEST):
    try:
        prev = json.load(open(DEST))
    except Exception:
        prev = {}
merged = dict(prev.get("times", {}))
for k, v in times.items():
    if v is not None:
        merged[k] = min(v, merged[k]) if k in merged else v
merged_fx = dict(prev.get("times_fixture_cte", {}))
for k, v in fixture_times.items():
    merged_fx[k] = min(v, merged_fx[k]) if k in merged_fx else v

total = sum(v for v in merged.values() if v is not None)
for name, v in sorted(times.items(), key=lambda kv: -(kv[1] or 0)):
    fx = f"  (fixture-cte {fixture_times[name]})" if name in fixture_times else ""
    print(f"{name:26s} {v}{fx}")
print(f"TOTAL {total:.2f} (merged) over {len(merged)} queries")
with open(DEST, "w") as f:
    json.dump({"sf_dir": SFDIR,
               "method": "per-query MIN across recorded runs, each "
                         "min-of-2 after one warm pass",
               "fixture_cte_method": "prefix of the oracle's WITH chain "
                         "through the boundary CTE named in "
                         "oracle_fixture_cte.json, timed standalone as "
                         "SELECT count(*); like-for-like denominator = "
                         "times - times_fixture_cte (approximate split)",
               "times": merged, "times_fixture_cte": merged_fx},
              f, indent=1, sort_keys=True)
print(f"wrote {DEST}")
