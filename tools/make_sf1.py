"""Synthesize a 10x (sf1-scale) bench corpus from the sf0.1 testdata.

VERDICT r3 item 6: the driver testdata is ONE parquet file per table,
so several r1-r3 plan choices exist because of that quirk (single-task
scans, AQE-coalesced tiny shuffles). This tool materializes a 10x
replica corpus as MULTI-file parquet (one file per replica per table) so
the headline bench exercises real multi-file scan parallelism and
genuinely multi-partition shuffles.

Replication is deterministic and key-consistent:
- documents: doc_id offset per replica; a ``repN`` token is appended to
  the text so replicas are NEAR-duplicates (one extra shingle), the
  realistic web-corpus shape — exact-dedup sees distinct rows, LSH sees
  ~10-member near-dup clusters (which also exercises the bucket cap).
- embeddings: vec_id offset per replica, vectors unchanged.
- lineitem/orders: l_orderkey/o_orderkey offset with the SAME base so
  the order join stays referentially intact; dim keys (cust/part/supp)
  are reused across replicas — dims grow slower than facts.
- events: event_id offset.
- dimension tables (region nation customer supplier part) are copied
  as-is.

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10


def main(out: str = "/tmp/sf1") -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def src(t: str) -> str:
        return f"read_parquet('{SRC}/{t}.parquet')"

    max_doc = con.execute(f"SELECT max(doc_id)+1 FROM {src('documents')}").fetchone()[0]
    max_vec = con.execute(f"SELECT max(vec_id)+1 FROM {src('embeddings')}").fetchone()[0]
    max_ord = con.execute(f"SELECT max(o_orderkey)+1 FROM {src('orders')}").fetchone()[0]
    max_ev = con.execute(f"SELECT max(event_id)+1 FROM {src('events')}").fetchone()[0]

    plans = {
        "documents": (
            # n_chars recomputed from the perturbed text so the stored
            # column stays consistent with length(text) on every replica
            "SELECT doc_id + {k} * {md} AS doc_id, "
            "CASE WHEN {k} = 0 THEN text ELSE text || ' rep{k}' END AS text, "
            "lang, source, "
            "CAST(length(CASE WHEN {k} = 0 THEN text ELSE text || ' rep{k}' END) AS INT) AS n_chars "
            "FROM " + src("documents")
        ),
        "embeddings": (
            "SELECT vec_id + {k} * {mv} AS vec_id, embedding, label FROM "
            + src("embeddings")
        ),
        "lineitem": (
            "SELECT l_orderkey + {k} * {mo} AS l_orderkey, l_partkey, l_suppkey, "
            "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
            "l_returnflag, l_linestatus, l_shipdate FROM " + src("lineitem")
        ),
        "orders": (
            "SELECT o_orderkey + {k} * {mo} AS o_orderkey, o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM "
            + src("orders")
        ),
        "events": (
            "SELECT event_id + {k} * {me} AS event_id, ts, user_id, event_type, "
            "value, props FROM " + src("events")
        ),
    }
    for t, q in plans.items():
        d = os.path.join(out, f"{t}.parquet")
        if os.path.isdir(d):
            shutil.rmtree(d)
        os.makedirs(d)
        for k in range(REPLICAS):
            sql = q.format(k=k, md=max_doc, mv=max_vec, mo=max_ord, me=max_ev)
            con.execute(
                f"COPY ({sql}) TO '{d}/part-{k:04d}.parquet' (FORMAT parquet)"
            )
        print(f"{t}: {REPLICAS} files")
    for t in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(out, f"{t}.parquet")
        if os.path.exists(dst):
            os.remove(dst)
        shutil.copy(f"{SRC}/{t}.parquet", dst)
        print(f"{t}: copied")
    print(f"sf1 corpus at {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
