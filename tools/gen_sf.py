#!/usr/bin/env python3
"""Generate a larger scale factor of the TPC-H-ish synthetic testdata
(see TESTDATA.md) for scale benchmarking. The driver only provides
sf0.001/0.01/0.1; the round-5 verdict asks for a same-methodology sf1
run, so this produces statistically-matching tables at any multiple of
sf0.1 WITHOUT touching the read-only /root/testdata.

Distributions were measured from /root/testdata/sf0.1 (schemas,
value domains, ranges, lines-per-order histogram, doc vocab/lengths/
dup rate, embedding norm/clustering) — see BASELINE.md for the audit.
Different RNG seed on purpose: this is *matching*, not *replaying*,
the driver's generator.

Usage: python3 tools/gen_sf.py <outdir> [multiple-of-sf0.1, default 10]
"""
import sys, os, shutil, json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "testdata/sf1"
M = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SRC = "/root/testdata/sf0.1"
rng = np.random.default_rng(4242)
os.makedirs(OUT, exist_ok=True)

def write(name, table):
    pq.write_table(table, f"{OUT}/{name}.parquet")
    print(f"{name}: {table.num_rows} rows", file=sys.stderr)

# region/nation are fixed dimension tables — copy verbatim
for t in ("region", "nation"):
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    print(f"{t}: copied", file=sys.stderr)

N_CUST, N_SUPP, N_PART = 15000 * M, 1000 * M, 20000 * M
N_ORD, N_EVT, N_DOC, N_EMB = 150000 * M, 100000 * M, 5000 * M, 2000 * M
N_USER = 1500 * M

def money(lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)

# ---- customer ----------------------------------------------------------
seg = np.array(["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"])
write("customer", pa.table({
    "c_custkey": pa.array(np.arange(N_CUST, dtype=np.int64)),
    "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)]),
    "c_nationkey": pa.array(rng.integers(0, 25, N_CUST).astype(np.int32)),
    "c_acctbal": pa.array(money(-1000, 10000, N_CUST)),
    "c_mktsegment": pa.array(seg[rng.integers(0, 5, N_CUST)]),
}))

# ---- supplier ----------------------------------------------------------
write("supplier", pa.table({
    "s_suppkey": pa.array(np.arange(N_SUPP, dtype=np.int64)),
    "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)]),
    "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP).astype(np.int32)),
    "s_acctbal": pa.array(money(-1000, 10000, N_SUPP)),
}))

# ---- part --------------------------------------------------------------
adjs = np.array(["large", "hot", "blue", "old", "cold", "small", "red", "new"])
nouns = np.array(["ring", "bolt", "plate", "screw", "wheel", "cap", "rod", "pin"])
ptypes = np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"])
pk = np.arange(N_PART, dtype=np.int64)
write("part", pa.table({
    "p_partkey": pa.array(pk),
    "p_name": pa.array(np.char.add(np.char.add(
        adjs[rng.integers(0, len(adjs), N_PART)], " "),
        nouns[rng.integers(0, len(nouns), N_PART)])),
    "p_brand": pa.array(np.char.add("Brand#",
        (rng.integers(1, 26, N_PART)).astype(str))),
    "p_type": pa.array(ptypes[rng.integers(0, len(ptypes), N_PART)]),
    "p_size": pa.array(rng.integers(1, 51, N_PART).astype(np.int32)),
    # same grid as sf0.1: 900.0 .. 999.9 keyed off partkey
    "p_retailprice": pa.array(np.round(900.0 + (pk % 1000) * 0.1, 1)),
}))

# ---- orders ------------------------------------------------------------
US = 1_000_000
DAY_US = 86400 * US
d0 = np.datetime64("1995-01-01T00:00:00", "us").astype(np.int64)
d1 = np.datetime64("2001-08-01T00:00:00", "us").astype(np.int64)
odate_us = d0 + rng.integers(0, (d1 - d0) // DAY_US + 1, N_ORD) * DAY_US
ostat = np.array(["O", "P", "F"])
opri = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
write("orders", pa.table({
    "o_orderkey": pa.array(np.arange(N_ORD, dtype=np.int64)),
    "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD).astype(np.int64)),
    "o_orderstatus": pa.array(ostat[rng.integers(0, 3, N_ORD)]),
    "o_totalprice": pa.array(money(1000, 500000, N_ORD)),
    "o_orderdate": pa.array(odate_us, pa.timestamp("us")),
    "o_orderpriority": pa.array(opri[rng.integers(0, 5, N_ORD)]),
}))

# ---- lineitem ----------------------------------------------------------
# lines-per-order: the measured sf0.1 histogram (mean 4.0)
lp_vals = np.arange(1, 18)
lp_cnt = np.array([11016, 21814, 29500, 29097, 23631, 15625, 8941, 4407,
                   1959, 818, 292, 93, 29, 10, 1, 2, 1], dtype=np.float64)
lines = rng.choice(lp_vals, size=N_ORD, p=lp_cnt / lp_cnt.sum())
lok = np.repeat(np.arange(N_ORD, dtype=np.int64), lines)
NL = len(lok)
lln = (np.arange(NL) - np.repeat(np.cumsum(lines) - lines, lines) + 1).astype(np.int32)
ls0 = np.datetime64("1995-01-02T00:00:00", "us").astype(np.int64)
ls1 = np.datetime64("2001-11-04T00:00:00", "us").astype(np.int64)
rf = np.array(["A", "N", "R"]); lst = np.array(["F", "O"])
write("lineitem", pa.table({
    "l_orderkey": pa.array(lok),
    "l_partkey": pa.array(rng.integers(0, N_PART, NL).astype(np.int64)),
    "l_suppkey": pa.array(rng.integers(0, N_SUPP, NL).astype(np.int64)),
    "l_linenumber": pa.array(lln),
    "l_quantity": pa.array(rng.integers(1, 51, NL).astype(np.float64)),
    "l_extendedprice": pa.array(money(900, 105000, NL)),
    "l_discount": pa.array(rng.integers(0, 11, NL) / 100.0),
    "l_tax": pa.array(rng.integers(0, 9, NL) / 100.0),
    "l_returnflag": pa.array(rf[rng.integers(0, 3, NL)]),
    "l_linestatus": pa.array(lst[rng.integers(0, 2, NL)]),
    "l_shipdate": pa.array(
        ls0 + rng.integers(0, (ls1 - ls0) // DAY_US + 1, NL) * DAY_US,
        pa.timestamp("us")),
}))
del lok, lln

# ---- events ------------------------------------------------------------
e0 = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
e1 = np.datetime64("2024-01-31T00:00:00", "us").astype(np.int64)
etype = np.array(["click", "error", "purchase", "signup", "view"])
write("events", pa.table({
    "event_id": pa.array(np.arange(N_EVT, dtype=np.int64)),
    "ts": pa.array(rng.integers(e0, e1, N_EVT), pa.timestamp("us")),
    "user_id": pa.array(rng.integers(0, N_USER, N_EVT).astype(np.int64)),
    "event_type": pa.array(etype[rng.integers(0, 5, N_EVT)]),
    # exponential-ish positive metric, same ~0..560 span as sf0.1
    "value": pa.array(np.round(np.minimum(
        rng.exponential(50.0, N_EVT), 560.0), 2)),
    "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVT)]),
}))

# ---- documents ---------------------------------------------------------
vocab = ("spark window merge table column vector stream value data small "
         "join filter big group hash customer sort order slow line part "
         "fast row the agg key query a scan batch").split()
langs = np.array(["en", "zh", "es", "fr", "de"])
lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
texts = []
nw = rng.integers(10, 101, N_DOC)
widx = rng.integers(0, len(vocab), int(nw.sum()))
has_dup_tok = rng.random(N_DOC) < 0.05
copy_prev = rng.random(N_DOC) < 0.0016  # ~8 exact dups per 5000 docs
pos = 0
for i in range(N_DOC):
    k = int(nw[i])
    if copy_prev[i] and i > 0:
        texts.append(texts[int(rng.integers(0, i))])
    else:
        ws = [vocab[j] for j in widx[pos:pos + k]]
        if has_dup_tok[i]:
            ws[int(rng.integers(0, k))] = "dup"
        texts.append(" ".join(ws))
    pos += k
write("documents", pa.table({
    "doc_id": pa.array(np.arange(N_DOC, dtype=np.int64)),
    "text": pa.array(texts),
    "lang": pa.array(langs[rng.choice(5, N_DOC, p=lang_p)]),
    "source": pa.array(np.char.add("src", rng.integers(0, 20, N_DOC).astype(str))),
    "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
}))

# ---- embeddings --------------------------------------------------------
DIMS, K = 64, 10
cents = rng.normal(size=(K, DIMS))
cents /= np.linalg.norm(cents, axis=1, keepdims=True)
lab = rng.integers(0, K, N_EMB)
vec = cents[lab] + rng.normal(scale=0.35, size=(N_EMB, DIMS))
vec /= np.linalg.norm(vec, axis=1, keepdims=True)
vec = vec.astype(np.float32)
write("embeddings", pa.table({
    "vec_id": pa.array(np.arange(N_EMB, dtype=np.int64)),
    "embedding": pa.array(list(vec), pa.list_(pa.float32())),
    "label": pa.array(lab.astype(np.int32)),
}))
print(json.dumps({"out": OUT, "multiple": M}))
