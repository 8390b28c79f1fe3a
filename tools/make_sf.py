#!/usr/bin/env python3
"""Build a larger SF by REPL-x key-shifted replication of an existing SF
(dev tool, not shipped code - the real sf generator is driver-side).
Generalizes make_sf1.py: the same scaling rules, but source dir, replica
count, key-shift unit scale, and the document-vocabulary suffix letter
are parameters, so SFs compose:

  sf0.1 --(repl=10, unit=1, suffix=x)--> sf1     [= make_sf1.py]
  sf1   --(repl=10, unit=10, suffix=y)--> sf10

Scaling rules (TPC-H-style):
- fact/dim keys shift by i*base*unit per replica, consistently across
  joined tables, preserving join selectivity while rows grow REPL-x;
- events keep user_id (a fixed user base accumulating REPL-x the
  events) and get +i*unit us on the timestamp; nanos preserved via
  pyarrow end-to-end (DuckDB truncates TIMESTAMP(NANOS));
- documents get a per-replica token suffix (replica 0 unchanged) with a
  LEVEL-specific letter, so composed SFs keep minting NEW vocabulary
  instead of replicating shingles into stop-shingles;
- embeddings shift by a multiple of 100, so vec_id % 100 == 0 keeps
  selecting exactly 1% of rows as queries.

Usage: make_sf.py OUT SRC REPL UNIT SUFFIX
  e.g. make_sf.py /tmp/sf10 /tmp/sf1 10 10 y
"""
import os
import sys

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# base key-shift units, sized for sf0.1 (unit=1); larger sources pass
# unit = their scale relative to sf0.1
BASE = {
    "customer": 15000, "supplier": 1000, "part": 20000,
    "orders": 150000, "lineitem": 150000, "documents": 100000,
    "embeddings": 2000, "events": 100000,
}


def main(out, src, repl, unit, suffix):
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def shift(table, key):
        return f"{key} + i*{BASE[table] * unit} AS {key}"

    def gen(table, sql):
        con.execute(f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows", flush=True)

    for t in ["region", "nation"]:
        gen(t, f"SELECT * FROM '{src}/{t}.parquet'")

    rng = f"range(0, {repl}) t(i)"
    gen("customer",
        f"SELECT * EXCLUDE (i) REPLACE ({shift('customer', 'c_custkey')}) FROM '{src}/customer.parquet', {rng}")
    gen("supplier",
        f"SELECT * EXCLUDE (i) REPLACE ({shift('supplier', 's_suppkey')}) FROM '{src}/supplier.parquet', {rng}")
    gen("part",
        f"SELECT * EXCLUDE (i) REPLACE ({shift('part', 'p_partkey')}) FROM '{src}/part.parquet', {rng}")
    gen("orders",
        f"SELECT * EXCLUDE (i) REPLACE ({shift('orders', 'o_orderkey')}, {shift('customer', 'o_custkey')}) "
        f"FROM '{src}/orders.parquet', {rng}")
    gen("lineitem",
        f"SELECT * EXCLUDE (i) REPLACE ({shift('lineitem', 'l_orderkey')}) FROM '{src}/lineitem.parquet', {rng}")
    gen("documents",
        f"SELECT * EXCLUDE (i) REPLACE ({shift('documents', 'doc_id')}, "
        f"CASE WHEN i = 0 THEN text ELSE regexp_replace(text, '(\\S+)', '\\1{suffix}'||i, 'g') END AS text) "
        f"FROM '{src}/documents.parquet', {rng}")
    # Replica embeddings are FRESH deterministic pseudo-random draws
    # (hash-derived components, same near-orthogonal distribution as the
    # originals), not identical copies: an exact copy of every vector
    # would make near-dup pair OUTPUT quadratic in the replica count — a
    # generator artifact, not a property of the workload. Replica 0 keeps
    # the source vectors. (sf1 predates this rule and replicates exactly;
    # its e/d numbers in BASELINE.md were measured on that layout.)
    gen("embeddings",
        f"SELECT * EXCLUDE (i) REPLACE ({shift('embeddings', 'vec_id')}, "
        f"CASE WHEN i = 0 THEN embedding ELSE "
        f"list_transform(range(1, 1 + len(embedding)), j -> "
        f"CAST((CAST(hash(vec_id + i*{BASE['embeddings'] * unit}, j) % 400001 AS BIGINT) - 200000) / 1000000.0 AS FLOAT)) "
        f"END AS embedding) FROM '{src}/embeddings.parquet', {rng}")

    # events via pyarrow: preserve the SOURCE ts encoding exactly (the
    # driver has generated both TIMESTAMP(NANOS) and TIMESTAMP(MICROS)
    # across rounds; Tables.eventsWithTs adapts to either).
    src_ts = str(pq.read_schema(f"{src}/events.parquet").field("ts").type)
    ev = pq.read_table(f"{src}/events.parquet").to_pandas()
    parts = []
    for i in range(repl):
        c = ev.copy()
        c["event_id"] = c.event_id + i * BASE["events"] * unit
        # +i*unit us: replicas distinct, session gaps untouched
        c["ts"] = ev.ts + pd.to_timedelta(i * 1000 * unit, unit="ns")
        parts.append(c)
    allv = pd.concat(parts, ignore_index=True)
    t = pa.Table.from_pandas(allv, preserve_index=False)
    i_ts = t.schema.get_field_index("ts")
    # Cast to the source's pa.DataType OBJECT, not type_for_alias(str):
    # the alias path can't resolve tz-aware types like
    # 'timestamp[us, tz=UTC]', which the rest of the system supports.
    src_ts_type = pq.read_schema(f"{src}/events.parquet").field("ts").type
    t = t.set_column(i_ts, "ts", t.column("ts").cast(src_ts_type))
    pq.write_table(t, f"{out}/events.parquet")
    sch = pq.read_schema(f"{out}/events.parquet")
    assert str(sch.field("ts").type) == src_ts, (sch.field("ts"), src_ts)
    print(f"events: {len(allv)} rows (ts {src_ts}, matches source)", flush=True)


if __name__ == "__main__":
    out, src, repl, unit, suffix = sys.argv[1:6]
    main(out, src, int(repl), int(unit), suffix)
