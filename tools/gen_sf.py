#!/usr/bin/env python3
"""Generate an sf1-shaped dataset for the scale-headroom drill.

The driver ships sf0.001/0.01/0.1 only; VERDICT r7 item 5 asks for a
full-registry + bench pass at sf1 (~6M lineitem rows). This generator
reproduces the OBSERVED schema and distributions of the driver's tables
(sampled from /root/testdata/sf0.1 — see BENCHNOTES round 8) at 10x
scale, deterministically (fixed seed). It does NOT touch /root/testdata;
output goes under target/ (regenerable, not committed).

Usage: python3 tools/gen_sf.py [outdir] [scale]
  outdir default target/sf1, scale default 10 (x sf0.1 counts).
"""
import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "target/sf1"
SCALE = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SRC01 = "/root/testdata/sf0.1"
rng = np.random.default_rng(4242)
os.makedirs(OUT, exist_ok=True)

N_CUST = 15000 * SCALE
N_SUPP = 1000 * SCALE
N_PART = 20000 * SCALE
N_ORD = 150000 * SCALE
N_EVT = 100000 * SCALE
N_DOC = 5000 * SCALE
N_EMB = 2000 * 4  # driver scales embeddings sub-linearly (500->500->2000)

DAY_US = 86_400_000_000


def write(name, cols):
    t = pa.table(cols)
    pq.write_table(t, f"{OUT}/{name}.parquet")
    print(f"[gen_sf] {name}: {t.num_rows} rows")


def ts_us(base, us):
    return (np.datetime64(base) + us.astype("timedelta64[us]")).astype(
        "datetime64[us]")


# region/nation: fixed dimension tables — identical content at every sf
for t in ("region", "nation"):
    shutil.copyfile(f"{SRC01}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(f"[gen_sf] {t}: copied from sf0.1")

SEGS = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
k = np.arange(N_CUST)
write("customer", {
    "c_custkey": k.astype("int64"),
    "c_name": np.array([f"Customer#{i:09d}" for i in k]),
    "c_nationkey": rng.integers(0, 25, N_CUST).astype("int32"),
    "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, N_CUST), 2),
    "c_mktsegment": SEGS[rng.integers(0, 5, N_CUST)],
})

k = np.arange(N_SUPP)
write("supplier", {
    "s_suppkey": k.astype("int64"),
    "s_name": np.array([f"Supplier#{i:09d}" for i in k]),
    "s_nationkey": rng.integers(0, 25, N_SUPP).astype("int32"),
    "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, N_SUPP), 2),
})

ADJ = ["large", "hot", "small", "cold", "shiny", "dim", "new", "old"]
NOUN = ["ring", "bolt", "case", "drum", "cap", "plate", "tube", "wheel"]
k = np.arange(N_PART)
write("part", {
    "p_partkey": k.astype("int64"),
    "p_name": np.array([f"{ADJ[i % 8]} {NOUN[(i // 8) % 8]}" for i in k]),
    "p_brand": np.array([f"Brand#{i % 25}" for i in k]),
    "p_type": np.array(["LARGE", "STANDARD", "ECONOMY", "MEDIUM", "SMALL",
                        "PROMO"])[rng.integers(0, 6, N_PART)],
    "p_size": rng.integers(1, 51, N_PART).astype("int32"),
    "p_retailprice": np.round(900.0 + (k % 1000) / 10.0, 1),
})

k = np.arange(N_ORD)
odate_day = rng.integers(0, 2405, N_ORD)  # daily dates 1995-01-01..2001-08-01
odate = ts_us("1995-01-01", odate_day * DAY_US)
write("orders", {
    "o_orderkey": k.astype("int64"),
    "o_custkey": rng.integers(0, N_CUST, N_ORD).astype("int64"),
    "o_orderstatus": np.array(["O", "P", "F"])[rng.integers(0, 3, N_ORD)],
    "o_totalprice": np.round(rng.uniform(1000.0, 500000.0, N_ORD), 2),
    "o_orderdate": odate,
    "o_orderpriority": np.array(
        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    )[rng.integers(0, 5, N_ORD)],
})

# lineitem: lines-per-order ~ shifted Poisson (observed mode 3-4, max ~17)
lines = np.clip(rng.poisson(3.0, N_ORD) + 1, 1, 17)
lok = np.repeat(k, lines)
n_li = lok.size
lnum = np.concatenate([np.arange(1, c + 1) for c in lines]).astype("int32")
ship = ts_us("1995-01-01",
             np.clip(odate_day[lok] + np.round(rng.normal(48, 90, n_li)),
                     1, 2498).astype("int64") * DAY_US)
qty = rng.integers(1, 51, n_li).astype("float64")
write("lineitem", {
    "l_orderkey": lok.astype("int64"),
    "l_partkey": rng.integers(0, N_PART, n_li).astype("int64"),
    "l_suppkey": rng.integers(0, N_SUPP, n_li).astype("int64"),
    "l_linenumber": lnum,
    "l_quantity": qty,
    "l_extendedprice": np.round(qty * rng.uniform(900.0, 2100.0, n_li), 2),
    "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
    "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
    "l_returnflag": np.array(["R", "N", "A"])[rng.integers(0, 3, n_li)],
    "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
    "l_shipdate": ship,
})

# events: arrival-ordered timestamps over 30 days (exponential gaps)
gaps = rng.exponential(30 * 86400e6 / N_EVT, N_EVT)
ets = ts_us("2024-01-01", np.cumsum(gaps).astype("int64"))
write("events", {
    "event_id": np.arange(N_EVT).astype("int64"),
    "ts": ets,
    "user_id": rng.integers(0, 1500 * SCALE, N_EVT).astype("int64"),
    "event_type": np.array(["view", "click", "signup", "purchase", "error"]
                           )[rng.integers(0, 5, N_EVT)],
    "value": np.round(rng.exponential(75.0, N_EVT), 2),
    "props": np.array([f'{{"k": {v}}}' for v in rng.integers(0, 100, N_EVT)]),
})

# documents: word salad over the observed 31-word vocab, 10-100 words,
# ~0.2% planted exact duplicates (sf0.1 carries 8/5000)
VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window"])
doc_len = rng.integers(10, 101, N_DOC)
texts = [" ".join(VOCAB[rng.integers(0, 31, doc_len[i])]) for i in range(N_DOC)]
for i in range(500, N_DOC, 500):
    texts[i] = texts[i - 1]  # planted exact duplicate
texts = np.array(texts)
lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
write("documents", {
    "doc_id": np.arange(N_DOC).astype("int64"),
    "text": texts,
    "lang": np.array(["en", "de", "fr", "es", "zh"])[
        rng.choice(5, N_DOC, p=lang_p)],
    "source": np.array([f"src{i}" for i in rng.integers(0, 20, N_DOC)]),
    "n_chars": np.array([len(t) for t in texts], dtype="int64"),
})

# embeddings: 64-dim unit vectors with weak label structure (observed avg
# cos-to-label-centroid ~0.07, cross ~0.0)
centers = rng.standard_normal((10, 64))
centers /= np.linalg.norm(centers, axis=1, keepdims=True)
labels = rng.integers(0, 10, N_EMB)
vecs = 0.07 * centers[labels] + rng.standard_normal((N_EMB, 64)) * (1 / 8)
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
write("embeddings", {
    "vec_id": np.arange(N_EMB).astype("int64"),
    "embedding": pa.array([v.astype("float32") for v in vecs],
                          type=pa.list_(pa.float32())),
    "label": labels.astype("int32"),
})
print("[gen_sf] done:", OUT)
