#!/usr/bin/env python3
"""check.py restricted to a key subset, with unbuffered per-key output
(dev tool): lets big-SF oracle sweeps run in parallel batches and
report progressively instead of one monolithic multi-hour DuckDB
process whose stdout is invisible until exit.

Usage: check_keys.py <sfDir> <verifyOutDir> key [key ...]
"""
import sys, json, math, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, bytes): return v.hex()
    return v

def rows_of(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in data:
        out.append(tuple(norm(row[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in order], out

# check.py's value comparison verbatim: exact for non-floats; floats pass
# at 1e-12 rel (with a WARN when close-but-not-exact).
def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (a == b) or (b != 0 and abs(a - b) / abs(b) < 1e-12)
    return a == b

def main(sf_dir, out_dir, keys):
    import os, time
    con = duckdb.connect()
    con.execute(f"SET threads TO {int(os.environ.get('CHECK_THREADS', '8'))}")
    # Parallel batches each default to ~80% of RAM and OOM each other at
    # big SFs; cap per-process memory explicitly (e.g. CHECK_MEM=24GB).
    if os.environ.get("CHECK_MEM"):
        con.execute(f"SET memory_limit='{os.environ['CHECK_MEM']}'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in keys:
        if name not in oracle:
            print(f"FAIL {name}: no oracle", flush=True); n_fail += 1; continue
        t0 = time.time()
        try:
            res = con.sql(oracle[name])
            ocols, odata = res.columns, res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}", flush=True)
            n_fail += 1; continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output", flush=True); n_fail += 1; continue
        tbl = pq.read_table(files[0])
        scols = tbl.column_names
        sdata = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
        oc, orows = rows_of(ocols, odata)
        sc, srows = rows_of(scols, sdata)
        secs = round(time.time() - t0, 1)
        if [c.lower() for c in oc] != [c.lower() for c in sc]:
            print(f"FAIL {name}: schema {sc} vs oracle {oc}", flush=True)
            n_fail += 1; continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows {len(srows)} vs oracle {len(orows)}",
                  flush=True)
            n_fail += 1; continue
        bad = None
        for i, (ra, rb) in enumerate(zip(srows, orows)):
            if len(ra) != len(rb) or not all(eq(a, b) for a, b in zip(ra, rb)):
                bad = (i, ra, rb); break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: spark={bad[1]} oracle={bad[2]}",
                  flush=True)
            n_fail += 1; continue
        print(f"PASS {name} ({len(srows)} rows, {secs}s)", flush=True)
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==", flush=True)
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
