#!/usr/bin/env python
"""Derive a larger benchmark scale factor from an existing testdata SF
by replicating each table K times with key offsets (BENCH-ONLY data —
correctness oracles always run on the driver's own testdata).

Replication keeps value distributions identical while scaling row
counts and key cardinalities linearly, which is what a scaling-trend
check needs: a plan whose cost curves superlinearly in rows/keys shows
up immediately.  Keys are offset per replica so joins fan out
correctly (orderkey/custkey/... remain consistent ACROSS tables within
a replica); document text gets a per-replica token prefix so exact and
near-dup dedup don't collapse replicas into one cluster.

Usage: python scripts/gen_scale.py [--src /root/testdata/sf0.1]
                                   [--factor 10] [--out /tmp/sfgen/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# per-table key columns to offset by replica*stride, and the stride
# source (max over the src table, rounded up) — consistent across
# tables so FK joins still match within a replica
OFFSETS = {
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "customer": {"c_custkey": "customer"},
    "part": {"p_partkey": "part"},
    "supplier": {"s_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
    "nation": {},     # dimension tables stay as-is
    "region": {},
}

STRIDE_SQL = {
    "orders": "SELECT max(o_orderkey) FROM '{src}/orders.parquet'",
    "customer": "SELECT max(c_custkey) FROM '{src}/customer.parquet'",
    "part": "SELECT max(p_partkey) FROM '{src}/part.parquet'",
    "supplier": "SELECT max(s_suppkey) FROM '{src}/supplier.parquet'",
    "events": "SELECT max(event_id) FROM '{src}/events.parquet'",
    "events_user": "SELECT max(user_id) FROM '{src}/events.parquet'",
    "documents": "SELECT max(doc_id) FROM '{src}/documents.parquet'",
    "embeddings": "SELECT max(vec_id) FROM '{src}/embeddings.parquet'",
}


def generate(src: str, factor: int, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    strides = {k: int(con.sql(q.format(src=src)).fetchone()[0]) + 1
               for k, q in STRIDE_SQL.items()}
    for table, keys in OFFSETS.items():
        path = f"{src}/{table}.parquet"
        dst = f"{out}/{table}.parquet"
        if not keys:
            con.sql(f"COPY (SELECT * FROM '{path}') TO '{dst}' "
                    f"(FORMAT PARQUET)")
            continue
        cols = [c[0] for c in
                con.sql(f"DESCRIBE SELECT * FROM '{path}'").fetchall()]
        parts = []
        for r in range(factor):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {r * strides[keys[c]]} AS {c}")
                elif table == "documents" and c == "text" and r > 0:
                    # tag EVERY token with the replica id so replica
                    # vocabularies (and therefore shingles / minhash
                    # bands) are fully disjoint — replicas must not
                    # read as near-duplicates of each other, or the
                    # scaled corpus has 10x the true near-dup density
                    # of the source and LSH candidate counts scale
                    # quadratically by construction
                    sel.append(f"'r{r}' || replace(text, ' ', ' r{r}') "
                               f"AS text")
                else:
                    sel.append(c)
            parts.append(f"SELECT {', '.join(sel)} FROM '{path}'")
        con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}' "
                f"(FORMAT PARQUET)")
    print(f"wrote {out} at {factor}x {src}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sfgen/sf1")
    a = ap.parse_args()
    generate(a.src, a.factor, a.out)


if __name__ == "__main__":
    main()
