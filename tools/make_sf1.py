#!/usr/bin/env python3
"""Build an sf1-scale dataset by 10x key-shifted replication of sf0.1
(dev tool, not shipped code — the sf generator itself is driver-side).

Scaling rules (TPC-H-style):
- fact/dim keys shift by i*max_key per replica, consistently across
  joined tables (customer/orders/lineitem), so join selectivity is
  preserved while row counts grow 10x;
- events keep user_id (a fixed user base accumulating 10x the events —
  the honest shape of growth for behavioral tables) and get +i us on the
  timestamp so replicas aren't exact ties; ts goes through pyarrow, NOT
  DuckDB (which silently truncates TIMESTAMP(NANOS) to us on read), and
  is written back as TIMESTAMP(NANOS) so the sf1 schema is identical to
  the driver-generated SFs — Spark's legacy nanosAsLong read, the DuckDB
  oracles' epoch_us(ts), and pandas' datetime64[ns] all behave exactly
  as they do on /root/testdata;
- documents get a per-replica token suffix (replica 0 unchanged), so the
  corpus grows by NEW content instead of 10 identical copies of every
  shingle (which would turn every shingle into a stop-shingle and make
  the dedup workloads degenerate);
- embeddings: vec_id shifts by 2000 (a multiple of 100, so the %100
  query-selection rule keeps exactly 1% of rows as queries); replica
  i>0 vectors are FRESH deterministic hash-derived draws (same rule as
  make_sf.py) — exact copies made near-dup pair output quadratic in the
  replica count, which inflated d05's sf10 cost by ~2x (a generator
  artifact, measured in BENCH.md round 8).

Usage: make_sf1.py [outDir]   (default /tmp/sf1)
"""
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPL = 10
SRC = "/root/testdata/sf0.1"


def main(out):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def gen(table, sql):
        con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ["region", "nation"]:
        gen(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    rng = f"range(0, {REPL}) t(i)"
    gen("customer",
        f"SELECT * EXCLUDE (i) REPLACE (c_custkey + i*15000 AS c_custkey) FROM '{SRC}/customer.parquet', {rng}")
    gen("supplier",
        f"SELECT * EXCLUDE (i) REPLACE (s_suppkey + i*1000 AS s_suppkey) FROM '{SRC}/supplier.parquet', {rng}")
    gen("part",
        f"SELECT * EXCLUDE (i) REPLACE (p_partkey + i*20000 AS p_partkey) FROM '{SRC}/part.parquet', {rng}")
    gen("orders",
        f"SELECT * EXCLUDE (i) REPLACE (o_orderkey + i*150000 AS o_orderkey, o_custkey + i*15000 AS o_custkey) "
        f"FROM '{SRC}/orders.parquet', {rng}")
    gen("lineitem",
        f"SELECT * EXCLUDE (i) REPLACE (l_orderkey + i*150000 AS l_orderkey) FROM '{SRC}/lineitem.parquet', {rng}")
    gen("documents",
        f"SELECT * EXCLUDE (i) REPLACE (doc_id + i*100000 AS doc_id, "
        f"CASE WHEN i = 0 THEN text ELSE regexp_replace(text, '(\\S+)', '\\1x'||i, 'g') END AS text) "
        f"FROM '{SRC}/documents.parquet', {rng}")
    # Fresh per-replica draws (replica 0 = source) — see module docstring.
    gen("embeddings",
        f"SELECT * EXCLUDE (i) REPLACE (vec_id + i*2000 AS vec_id, "
        f"CASE WHEN i = 0 THEN embedding ELSE "
        f"list_transform(range(1, 1 + len(embedding)), j -> "
        f"CAST((CAST(hash(vec_id + i*2000, j) % 400001 AS BIGINT) - 200000) / 1000000.0 AS FLOAT)) "
        f"END AS embedding) FROM '{SRC}/embeddings.parquet', {rng}")

    # events via pyarrow: preserve the SOURCE timestamp encoding exactly
    # (the driver has generated both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    # across rounds; Tables.eventsWithTs adapts to either, and sf1 must
    # mirror whatever /root/testdata currently carries).
    src_ts = str(pq.read_schema(f"{SRC}/events.parquet").field("ts").type)
    ev = pq.read_table(f"{SRC}/events.parquet").to_pandas()
    parts = []
    for i in range(REPL):
        c = ev.copy()
        c["event_id"] = c.event_id + i * 100000
        # +i us: replicas are distinct, session gaps untouched
        c["ts"] = ev.ts + pd.to_timedelta(i * 1000, unit="ns")
        parts.append(c)
    allv = pd.concat(parts, ignore_index=True)
    t = pa.Table.from_pandas(allv, preserve_index=False)
    i_ts = t.schema.get_field_index("ts")
    # Cast to the source's pa.DataType OBJECT, not type_for_alias(str):
    # the alias path can't resolve tz-aware types like
    # 'timestamp[us, tz=UTC]', which the rest of the system supports.
    src_ts_type = pq.read_schema(f"{SRC}/events.parquet").field("ts").type
    t = t.set_column(i_ts, "ts", t.column("ts").cast(src_ts_type))
    pq.write_table(t, f"{out}/events.parquet")
    sch = pq.read_schema(f"{out}/events.parquet")
    assert str(sch.field("ts").type) == src_ts, (sch.field("ts"), src_ts)
    print(f"events: {len(allv)} rows (ts {src_ts}, matches source)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
