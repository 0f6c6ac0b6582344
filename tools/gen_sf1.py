#!/usr/bin/env python3
"""Generate a local sf1 dataset for the scale probe (round-7 verdict #2).

TPC-H tables come from DuckDB's bundled `tpch` extension (dbgen sf=1,
~6M lineitem rows — 10x the sf0.1 fixtures), cut down to the exact
column subsets and arrow types the sf0.1 fixtures carry. The pipeline
corpora (documents/embeddings/events) are scaled 10x from the sf0.1
fixtures with deterministic, structure-preserving transforms:

- documents: replica r>0 deterministically SHUFFLES each doc's words
  (seeded by (doc_id, r)), so replicas share a vocabulary but NOT word
  n-gram shingles — near-dup density stays ~linear in corpus size
  instead of exploding quadratically, which is the workload a probe
  should measure.
- embeddings: replicas perturb each component by a small seeded jitter
  (cosine structure preserved, no exact-duplicate vectors).
- events: replicas shift event_id/user_id/ts (timeline extends 10x,
  user count 10x at constant events-per-user; TIMESTAMP_NS preserved).

Output: /root/repo/localdata/sf1/*.parquet (gitignored — ~2 GB).
Everything is seeded; rerunning reproduces byte-identical logical data.
"""
import os
import random
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/localdata/sf1"
REPLICAS = 10
os.makedirs(OUT, exist_ok=True)

con = duckdb.connect()
con.execute("LOAD tpch")
print("dbgen sf=1 ...", flush=True)
con.execute("CALL dbgen(sf=1)")

# Exact column subsets + arrow types of the sf0.1 fixtures.
TPCH = {
    "region":   ("r_regionkey int32, r_name string",
                 "r_regionkey, r_name FROM region"),
    "nation":   ("n_nationkey int32, n_name string, n_regionkey int32",
                 "n_nationkey, n_name, n_regionkey FROM nation"),
    "customer": ("c_custkey int64, c_name string, c_nationkey int32, "
                 "c_acctbal double, c_mktsegment string",
                 "c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment "
                 "FROM customer"),
    "supplier": ("s_suppkey int64, s_name string, s_nationkey int32, "
                 "s_acctbal double",
                 "s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier"),
    "part":     ("p_partkey int64, p_name string, p_brand string, "
                 "p_type string, p_size int32, p_retailprice double",
                 "p_partkey, p_name, p_brand, p_type, p_size, p_retailprice "
                 "FROM part"),
    "orders":   ("o_orderkey int64, o_custkey int64, o_orderstatus string, "
                 "o_totalprice double, o_orderdate timestamp[ms], "
                 "o_orderpriority string",
                 "o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
                 "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate, "
                 "o_orderpriority FROM orders"),
    "lineitem": ("l_orderkey int64, l_partkey int64, l_suppkey int64, "
                 "l_linenumber int32, l_quantity double, "
                 "l_extendedprice double, l_discount double, l_tax double, "
                 "l_returnflag string, l_linestatus string, "
                 "l_shipdate timestamp[ms]",
                 "l_orderkey, l_partkey, l_suppkey, l_linenumber, "
                 "CAST(l_quantity AS DOUBLE) AS l_quantity, l_extendedprice, "
                 "l_discount, l_tax, l_returnflag, l_linestatus, "
                 "CAST(l_shipdate AS TIMESTAMP) AS l_shipdate FROM lineitem"),
}

ARROW_T = {"int32": pa.int32(), "int64": pa.int64(), "double": pa.float64(),
           "string": pa.string(), "timestamp[ms]": pa.timestamp("ms")}


def target_schema(spec: str) -> pa.Schema:
    fields = []
    for colspec in spec.split(", "):
        name, typ = colspec.rsplit(" ", 1)
        fields.append(pa.field(name, ARROW_T[typ]))
    return pa.schema(fields)


for name, (spec, sel) in TPCH.items():
    tbl = con.execute(f"SELECT {sel}").fetch_arrow_table()
    tbl = tbl.cast(target_schema(spec))
    pq.write_table(tbl, f"{OUT}/{name}.parquet", row_group_size=256 * 1024)
    print(f"{name}: {tbl.num_rows} rows", flush=True)

# ── documents x10 ───────────────────────────────────────────────────────
src = pq.read_table(f"{SRC}/documents.parquet")
n_docs = src.num_rows
doc_ids = src.column("doc_id").to_pylist()
texts = src.column("text").to_pylist()
langs = src.column("lang").to_pylist()
sources = src.column("source").to_pylist()

out = {"doc_id": [], "text": [], "lang": [], "source": [], "n_chars": []}
for r in range(REPLICAS):
    for i in range(n_docs):
        if r == 0:
            t = texts[i]
        else:
            words = texts[i].split()
            random.Random(doc_ids[i] * 1000003 + r).shuffle(words)
            t = " ".join(words)
        out["doc_id"].append(doc_ids[i] + r * n_docs)
        out["text"].append(t)
        out["lang"].append(langs[i])
        out["source"].append(sources[i])
        out["n_chars"].append(len(t))
docs = pa.table(out, schema=pa.schema([
    ("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string()),
    ("source", pa.string()), ("n_chars", pa.int64())]))
pq.write_table(docs, f"{OUT}/documents.parquet", row_group_size=64 * 1024)
print(f"documents: {docs.num_rows} rows", flush=True)

# ── embeddings x10 ──────────────────────────────────────────────────────
src = pq.read_table(f"{SRC}/embeddings.parquet")
n_emb = src.num_rows
vecs = np.array(src.column("embedding").to_pylist(), dtype=np.float32)
vec_ids = np.array(src.column("vec_id").to_pylist(), dtype=np.int64)
labels = np.array(src.column("label").to_pylist(), dtype=np.int32)

all_ids, all_vecs, all_labels = [], [], []
for r in range(REPLICAS):
    rng = np.random.default_rng(seed=1000 + r)
    jitter = (rng.standard_normal(vecs.shape).astype(np.float32) * 0.02
              if r > 0 else np.zeros_like(vecs))
    all_ids.append(vec_ids + r * n_emb)
    all_vecs.append(vecs + jitter)
    all_labels.append(labels)
emb = pa.table({
    "vec_id": pa.array(np.concatenate(all_ids), type=pa.int64()),
    "embedding": pa.array(
        [v for chunk in all_vecs for v in chunk.tolist()],
        type=pa.list_(pa.float32())),
    "label": pa.array(np.concatenate(all_labels), type=pa.int32()),
})
pq.write_table(emb, f"{OUT}/embeddings.parquet", row_group_size=64 * 1024)
print(f"embeddings: {emb.num_rows} rows", flush=True)

# ── events x10 ──────────────────────────────────────────────────────────
src = pq.read_table(f"{SRC}/events.parquet")
n_ev = src.num_rows
# The sf0.1 fixture stores timestamp[us]; cast through timestamp("ns")
# FIRST so the int64 values are real epoch nanos. (r17 fix: casting the
# us column straight to int64 kept micro values that were then stamped
# as nanos — a 1000x timeline compression that turned every event-time
# density assumption upside down at sf1: 1M events in 7 wall-clock
# hours instead of 10 months. Only q241's overlap join was
# density-sensitive enough to blow up on it — 11.6e9 pairs — but every
# session/window probe before it was silently measuring a timeline
# that no production stream has.)
ts = (src.column("ts").cast(pa.timestamp("ns"))
      .cast(pa.int64()).to_numpy())  # epoch nanos
span = int(ts.max() - ts.min()) + 10**9
ev_id = src.column("event_id").to_numpy()
user = src.column("user_id").to_numpy()
n_users = int(user.max()) + 1
etype = src.column("event_type").to_pylist()
value = src.column("value").to_numpy()
props = src.column("props").to_pylist()

cols = {"event_id": [], "ts": [], "user_id": [], "event_type": [],
        "value": [], "props": []}
for r in range(REPLICAS):
    cols["event_id"].append(ev_id + r * n_ev)
    cols["ts"].append(ts + r * span)       # timeline extends 10x
    cols["user_id"].append(user + r * n_users)  # user count 10x
    cols["event_type"].extend(etype)
    cols["value"].append(value)
    cols["props"].extend(props)
ev = pa.table({
    "event_id": pa.array(np.concatenate(cols["event_id"]), type=pa.int64()),
    "ts": pa.array(np.concatenate(cols["ts"]), type=pa.int64())
        .cast(pa.timestamp("ns")),
    "user_id": pa.array(np.concatenate(cols["user_id"]), type=pa.int64()),
    "event_type": pa.array(cols["event_type"], type=pa.string()),
    "value": pa.array(np.concatenate(cols["value"]), type=pa.float64()),
    "props": pa.array(cols["props"], type=pa.string()),
})
pq.write_table(ev, f"{OUT}/events.parquet", row_group_size=256 * 1024)
print(f"events: {ev.num_rows} rows", flush=True)
print("done:", OUT, flush=True)
