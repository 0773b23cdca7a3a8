#!/usr/bin/env python3
"""Generate a local sf1-equivalent (10x sf0.1) for scale-stress replay.

Scaling model: USERS AND THEIR ACTIVITY scale 10x, the CATALOG stays
fixed — the reference's world (a music service gains listeners, not a
10x bigger song catalog), and the same shape as TPC-H fact-vs-dim
scaling. Concretely, per replica r in 0..9:

  - customer / orders / lineitem / events: replicated with re-keyed ids
    (custkey += r*1e6, orderkey += r*1e7, event_id += r*1e7); the
    catalog FKs (l_partkey, l_suppkey, c_nationkey) are UNCHANGED so
    fact->dim joins keep their semantics and per-key group sizes are
    preserved (10x groups, not 10x hotter groups).
  - part / supplier / nation / region: copied once, unreplicated.
  - documents: doc_id += r*1e6 and every TOKEN gets an @r suffix for
    r>0 (replica 0 byte-identical to sf0.1). A naive copy would make
    every doc a 10-way exact clone: shingle document-frequencies x10
    and near-dup candidate work x100 (quadratic in bucket size) — a
    pathological corpus, not a bigger one. Token suffixing keeps each
    replica's intra-corpus shingle/Jaccard structure EXACTLY sf0.1's
    while making cross-replica Jaccard 0, i.e. "10 independent
    crawls of the same distribution". n_chars is recomputed.
  - embeddings: vec_id += r*1e6 and a per-replica SIGNED COORDINATE
    PERMUTATION (an orthogonal transform: intra-replica cosines are
    bit-preserved, cross-replica pairs decorrelate) — the same
    clone-pathology avoidance for the ANN/near-dup operators. Replica
    0 is identity.

Output: /tmp/sf1/*.parquet (NOT checked in; regenerate at will).
Determinism: numpy seeded per replica; byte-stable across runs.

Usage: python3 scripts/make_sf1.py [src_dir] [dst_dir] [replicas]
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
REPLICAS = int(sys.argv[3]) if len(sys.argv) > 3 else 10

CUST_OFF = 1_000_000
ORDER_OFF = 10_000_000
EVENT_OFF = 10_000_000
DOC_OFF = 1_000_000
VEC_OFF = 1_000_000


def offset(col: pa.ChunkedArray, off: int) -> pa.Array:
    return pa.array(col.to_numpy(zero_copy_only=False) + off, type=col.type)


def replicate(table: pa.Table, transform) -> pa.Table:
    return pa.concat_tables([transform(table, r) for r in range(REPLICAS)])


def write(name: str, table: pa.Table) -> None:
    pq.write_table(table, f"{DST}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows")


def main() -> None:
    import os
    os.makedirs(DST, exist_ok=True)

    for fixed in ("region", "nation", "part", "supplier"):
        write(fixed, pq.read_table(f"{SRC}/{fixed}.parquet"))

    cust = pq.read_table(f"{SRC}/customer.parquet")
    write("customer", replicate(cust, lambda t, r: t.set_column(
        t.schema.get_field_index("c_custkey"), "c_custkey",
        offset(t.column("c_custkey"), r * CUST_OFF))))

    orders = pq.read_table(f"{SRC}/orders.parquet")

    def tx_orders(t: pa.Table, r: int) -> pa.Table:
        t = t.set_column(t.schema.get_field_index("o_orderkey"), "o_orderkey",
                         offset(t.column("o_orderkey"), r * ORDER_OFF))
        return t.set_column(t.schema.get_field_index("o_custkey"), "o_custkey",
                            offset(t.column("o_custkey"), r * CUST_OFF))
    write("orders", replicate(orders, tx_orders))

    li = pq.read_table(f"{SRC}/lineitem.parquet")
    write("lineitem", replicate(li, lambda t, r: t.set_column(
        t.schema.get_field_index("l_orderkey"), "l_orderkey",
        offset(t.column("l_orderkey"), r * ORDER_OFF))))

    ev = pq.read_table(f"{SRC}/events.parquet")

    def tx_events(t: pa.Table, r: int) -> pa.Table:
        t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                         offset(t.column("event_id"), r * EVENT_OFF))
        return t.set_column(t.schema.get_field_index("user_id"), "user_id",
                            offset(t.column("user_id"), r * CUST_OFF))
    write("events", replicate(ev, tx_events))

    docs = pq.read_table(f"{SRC}/documents.parquet")

    def tx_docs(t: pa.Table, r: int) -> pa.Table:
        t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                         offset(t.column("doc_id"), r * DOC_OFF))
        if r > 0:
            texts = [" ".join(f"{tok}@{r}" for tok in s.split())
                     for s in t.column("text").to_pylist()]
            t = t.set_column(t.schema.get_field_index("text"), "text",
                             pa.array(texts, type=pa.string()))
            t = t.set_column(t.schema.get_field_index("n_chars"), "n_chars",
                             pa.array([len(s) for s in texts], type=pa.int64()))
        return t
    write("documents", replicate(docs, tx_docs))

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]

    def tx_emb(t: pa.Table, r: int) -> pa.Table:
        t = t.set_column(t.schema.get_field_index("vec_id"), "vec_id",
                         offset(t.column("vec_id"), r * VEC_OFF))
        if r > 0:
            rng = np.random.default_rng(r)
            perm = rng.permutation(dim)
            signs = rng.choice(np.array([-1.0, 1.0], dtype=np.float32), dim)
            v = vecs[:, perm] * signs
            t = t.set_column(t.schema.get_field_index("embedding"), "embedding",
                             pa.array(v.tolist(), type=pa.list_(pa.float32())))
        return t
    write("embeddings", replicate(emb, tx_emb))


if __name__ == "__main__":
    main()
