#!/usr/bin/env python3
"""Staged d12 oracle for big SFs (dev tool, not shipped code).

The one-query d12 mirror is infeasible in DuckDB at sf10: its pinned
MATERIALIZED CTEs (band table, pair set, CC labels, per-vector centroid
scores) cannot spill, and the recursive reach CTE enumerates
(vertex, reachable-label) tuples for every embedding — >100 GiB of
pinned buffer at 5M vectors. This tool runs the SAME oracle semantics
as sequential DuckDB passes that land the expensive shared CTEs as
parquet temp tables (COPY), so peak memory is per-stage:

  stage 1  bands -> candidate pairs -> verified d12p pairs  (pairs.parquet)
  stage 2  connected components as ITERATIVE min-label propagation
           (hop + path-compression per round, disk-backed tables) —
           the same fixpoint the recursive CTE computes, identical
           labels, memory bounded by the edge-incident vertex set
  stage 3  Lloyd centroids + final assignment + per-vector centroid
           cosine (cs.parquet) — the e03 CTE chain verbatim
  stage 4  group stats + SemDeDup keeper + final select over the
           staged tables, compared row-for-row against the Spark
           output parquet (check.py's normalization + float rule)

The CTE texts are CUT FROM THE REAL ORACLE (oracle_sql.json written by
graft.Verify at the target SF, with the calibrated band width already
threaded), not re-stated here — a drifting copy cannot silently pass.

Usage: d12_stage.py <sfDir> <verifyOutDir> [workDir]
  (verifyOutDir must hold oracle_sql.json + d12_semantic_groups/*.parquet)
"""
import sys, os, json, glob, time
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from check_keys import rows_of, eq, TABLES


def cut(sql, start_cte, end_cte):
    """The CTE-list slice from `start_cte AS` up to (not incl.) `,\n<end_cte> AS`."""
    i = sql.index(start_cte + " AS")
    j = sql.index(end_cte + " AS", i)
    j = sql.rindex(",", i, j)
    return sql[i:j]


def main(sf_dir, out_dir, work="/tmp/d12_stage"):
    os.makedirs(work, exist_ok=True)
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["d12_semantic_groups"]
    con = duckdb.connect()
    con.execute(f"SET threads TO {int(os.environ.get('CHECK_THREADS', '16'))}")
    con.execute(f"SET memory_limit='{os.environ.get('CHECK_MEM', '96GB')}'")
    con.execute(f"SET temp_directory='{work}/duck_tmp'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    def stage(name, fn):
        t0 = time.time()
        fn()
        print(f"[stage] {name}: {round(time.time() - t0, 1)}s", flush=True)

    # -- stage 1: bands -> cand -> verified pairs ------------------------
    def s1():
        pairs_sql = "WITH " + cut(sql, "bands", "edges") + \
            " SELECT id_a, id_b FROM d12p"
        con.execute(
            f"COPY ({pairs_sql}) TO '{work}/pairs.parquet' (FORMAT PARQUET)")
    stage("pairs", s1)

    # -- stage 2: CC by iterative min-label propagation ------------------
    def s2():
        con.execute(f"""CREATE OR REPLACE TABLE edges AS
            SELECT id_a AS src, id_b AS dst FROM '{work}/pairs.parquet'
            UNION ALL SELECT id_b, id_a FROM '{work}/pairs.parquet'""")
        con.execute("""CREATE OR REPLACE TABLE labels AS
            SELECT DISTINCT src AS id, src AS lbl FROM edges""")
        rounds = 0
        while True:
            con.execute("""CREATE OR REPLACE TABLE hop AS
                WITH via AS (SELECT dst, MIN(lbl) AS elbl
                             FROM edges JOIN labels ON src = id GROUP BY dst)
                SELECT l.id, l.lbl AS olbl,
                       LEAST(l.lbl, COALESCE(v.elbl, l.lbl)) AS hlbl
                FROM labels l LEFT JOIN via v ON v.dst = l.id""")
            # path compression: lbl <- lbl(lbl); the invariant lbl <= id
            # makes the self-join total, exactly as in the Spark loop
            con.execute("""CREATE OR REPLACE TABLE nxt AS
                SELECT h.id, h.olbl, p.hlbl AS lbl
                FROM hop h JOIN hop p ON h.hlbl = p.id""")
            changed = con.sql(
                "SELECT count(*) FROM nxt WHERE lbl <> olbl").fetchone()[0]
            con.execute("CREATE OR REPLACE TABLE labels AS SELECT id, lbl FROM nxt")
            rounds += 1
            if changed == 0:
                break
        print(f"[stage] cc rounds: {rounds}", flush=True)
        con.execute(f"""COPY (SELECT e.vec_id, COALESCE(l.lbl, e.vec_id) AS group_id
            FROM embeddings e LEFT JOIN labels l ON l.id = e.vec_id)
            TO '{work}/lab.parquet' (FORMAT PARQUET)""")
    stage("cc_labels", s2)

    # -- stage 3: Lloyd + assignment + centroid cosine -------------------
    def s3():
        cs_sql = "WITH " + cut(sql, "cent0", "mm") + " SELECT * FROM cs"
        con.execute(
            f"COPY ({cs_sql}) TO '{work}/cs.parquet' (FORMAT PARQUET)")
    stage("centroid_scores", s3)

    # -- stage 4: final assembly + compare vs Spark ----------------------
    def s4():
        res = con.sql(f"""WITH lab AS (SELECT * FROM '{work}/lab.parquet'),
            cs AS (SELECT * FROM '{work}/cs.parquet'),
            mm AS (SELECT l.vec_id, l.group_id, cs.cscore
                   FROM lab l JOIN cs USING (vec_id)),
            gs AS (SELECT group_id, COUNT(*) AS group_size FROM mm GROUP BY 1),
            kp AS (SELECT group_id, vec_id AS keeper_id FROM (
                    SELECT group_id, vec_id,
                      ROW_NUMBER() OVER (PARTITION BY group_id
                        ORDER BY cscore DESC, vec_id) AS rr
                    FROM mm) WHERE rr = 1)
            SELECT mm.vec_id, mm.group_id, gs.group_size, mm.cscore,
              kp.keeper_id, mm.vec_id = kp.keeper_id AS is_keeper
            FROM mm JOIN gs USING (group_id) JOIN kp USING (group_id)
            ORDER BY mm.vec_id""")
        ocols, odata = res.columns, res.fetchall()
        import pyarrow.parquet as pq
        tbl = pq.read_table(glob.glob(f"{out_dir}/d12_semantic_groups/*.parquet")[0])
        scols = tbl.column_names
        sdata = [tuple(r[c] for c in scols) for r in tbl.to_pylist()]
        oc, orows = rows_of(ocols, odata)
        sc, srows = rows_of(scols, sdata)
        assert [c.lower() for c in oc] == [c.lower() for c in sc], \
            f"schema {sc} vs {oc}"
        if len(orows) != len(srows):
            print(f"FAIL d12: rows {len(srows)} vs oracle {len(orows)}")
            sys.exit(1)
        for i, (ra, rb) in enumerate(zip(srows, orows)):
            if not all(eq(a, b) for a, b in zip(ra, rb)):
                print(f"FAIL d12: row {i}: spark={ra} oracle={rb}")
                sys.exit(1)
        print(f"PASS d12_semantic_groups ({len(srows)} rows, staged)", flush=True)
    stage("assemble_compare", s4)


if __name__ == "__main__":
    main(*sys.argv[1:])
