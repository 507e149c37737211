#!/usr/bin/env python3
"""Build the 10x SCALING.md replica ("sf1") from /root/testdata/sf0.1.

Usage: python3 tools/make_sf1.py [outDir=/tmp/sf1] [k=10]

Replicates each fact table k times with offset keys and shifted
timestamps (the recipe documented in SCALING.md — /tmp is volatile, so
the replica is rebuilt per measurement session, ~10 s):
  documents:  doc_id + k*5000
  embeddings: vec_id + k*2000
  events:     event_id + k*100000, user_id + k*1500, ts + k*366 days
  orders:     o_orderkey + k*150000, o_custkey + k*15000
  lineitem:   l_orderkey + k*150000
  customer:   c_custkey + k*15000
  supplier/part/nation/region: copied as-is.
Replication makes every document/vector appear k times, so dedup
workloads grow superlinearly BY CONSTRUCTION (each clone group is
k*(k-1)/2 true pairs) — read growth factors accordingly.
"""
import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE ks AS SELECT unnest(range({k})) AS k")
    reps = {
        "documents": "doc_id + k*5000 AS doc_id, text, lang, source, n_chars",
        "embeddings": "vec_id + k*2000 AS vec_id, embedding, label",
        "events": ("event_id + k*100000 AS event_id,"
                   " ts + to_days((k*366)::int) AS ts,"
                   " user_id + k*1500 AS user_id, event_type, value, props"),
        "orders": ("o_orderkey + k*150000 AS o_orderkey,"
                   " o_custkey + k*15000 AS o_custkey,"
                   " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"),
        "lineitem": ("l_orderkey + k*150000 AS l_orderkey, l_partkey, l_suppkey,"
                     " l_linenumber, l_quantity, l_extendedprice, l_discount,"
                     " l_tax, l_returnflag, l_linestatus, l_shipdate"),
        "customer": ("c_custkey + k*15000 AS c_custkey, c_name, c_nationkey,"
                     " c_acctbal, c_mktsegment"),
    }
    for t, proj in reps.items():
        con.execute(
            f"COPY (SELECT {proj} FROM '{SRC}/{t}.parquet', ks ORDER BY 1) "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)")
    for t in ["supplier", "part", "nation", "region"]:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT parquet)")
    for t in list(reps) + ["supplier", "part", "nation", "region"]:
        n = con.execute(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
