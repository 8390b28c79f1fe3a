#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool, not shipped code).

Runs DuckDB on each oracle_sql.json entry over the sf tables, loads the
Spark-written parquet for the same key, sorts columns by name and rows by
all columns, and compares values strictly (exact for non-floats; floats
must match to 1e-9 rel AND their repr must match after round-trip — we aim
for bit-identical).

Usage: check.py <sfDir> <verifyOutDir>
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

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.sql(sql)
            ocols, odata = res.columns, res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1; continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        tbl = pq.read_table(files[0])
        scols = tbl.column_names
        sdata = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
        oc, orows = rows_of(ocols, odata)
        sc, srows = rows_of(scols, sdata)
        if [c.lower() for c in oc] != [c.lower() for c in sc]:
            print(f"FAIL {name}: schema {sc} vs oracle {oc}"); n_fail += 1; continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rows {len(srows)} vs oracle {len(orows)}"); n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, orows)):
            for j, (x, y) in enumerate(zip(a, b)):
                if isinstance(x, float) and isinstance(y, float):
                    ok = (x == y) or (y != 0 and abs(x-y)/abs(y) < 1e-12)
                    exact = (x == y)
                else:
                    ok = exact = (x == y)
                if not ok:
                    bad = (i, oc[j], x, y); break
                if not exact:
                    print(f"WARN {name}: row {i} col {oc[j]}: {x!r} vs {y!r} (close, not exact)")
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
