#!/usr/bin/env python3
"""Synthetic-testdata generator for scale factors the driver didn't ship.

Reproduces the schema and distributions of /root/testdata/sf* (seed 42,
numpy) so Bench/Verify can run at sf1+ locally:

    python3 tools/gen_testdata.py 1.0 /tmp/testdata/sf1

Byte-identity with the driver's generator is NOT claimed (its script is
not in the repo); correctness at any sf stays rigorous because
check_correctness.py replays the DuckDB oracles over the SAME generated
input. Parquet physical types mirror the shipped files exactly
(timestamp[us] for orders/lineitem dates and events.ts — the current
testdata generation; the engine also still reads the earlier
timestamp[ns] events encoding via nanosAsLong + TimeFunctions).
"""
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window"])
LANGS = (["en"] * 8 + ["de", "fr", "zh", "es"] * 3)  # ~40% en, rest even
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PART_ADJ = ["large", "hot", "blue", "red", "green", "small", "dim", "light"]
PART_NOUN = ["ring", "bolt", "screw", "washer", "gear", "cog", "pin", "cap"]
PART_TYPE = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

US = pa.timestamp("us")


def write(outdir, name, table):
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"{name:12s} {table.num_rows:>10,} rows")


def day_us(rng, n, start_year=1995, end_year=2001):
    start = np.datetime64(f"{start_year}-01-01").astype("datetime64[D]").astype(int)
    end = np.datetime64(f"{end_year}-08-01").astype("datetime64[D]").astype(int)
    days = rng.integers(start, end + 1, n)
    return days.astype("int64") * 86_400_000_000


def main(sf, outdir):
    rng = np.random.default_rng(42)
    os.makedirs(outdir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = max(500, int(20_000 * sf))

    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    write(outdir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]}))

    write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2)}))

    adj = np.array(PART_ADJ)[rng.integers(0, len(PART_ADJ), n_part)]
    noun = np.array(PART_NOUN)[rng.integers(0, len(PART_NOUN), n_part)]
    write(outdir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[
            rng.integers(0, 25, n_part)],
        "p_type": np.array(PART_TYPE)[rng.integers(0, len(PART_TYPE), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + 0.1 * np.arange(n_part), 2)}))

    write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000.0, 500_000.0, n_ord), 2),
        "o_orderdate": pa.array(day_us(rng, n_ord), US),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]}))

    write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 100_000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["R", "A", "N"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(day_us(rng, n_li), US)}))

    # events: ~30 days of monotonically increasing us timestamps
    gaps = rng.exponential(30 * 86_400e6 / n_ev, n_ev)
    ts = (np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
          + np.cumsum(gaps)).astype(np.int64)
    write(outdir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, US),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(60.0, n_ev).clip(0, 560.21), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)]}))

    # documents: vocab word-salad, ~0.2% exact duplicates, ~1% near-dups
    # (a copy with a handful of word substitutions), langs ~40% en
    lens = rng.integers(8, 106, n_doc)
    texts = [" ".join(VOCAB[rng.integers(0, len(VOCAB), ln)]) for ln in lens]
    for i in range(0, n_doc - 1, 500):
        texts[i + 1] = texts[i]  # exact dup
    for i in range(250, n_doc - 1, 100):
        words = texts[i].split(" ")
        for _ in range(max(1, len(words) // 20)):
            words[int(rng.integers(0, len(words)))] = str(
                VOCAB[int(rng.integers(0, len(VOCAB)))])
        texts[i + 1] = " ".join(words)  # near dup
    write(outdir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)],
        "source": np.array([f"src{s}" for s in range(20)])[
            rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    # embeddings: 10 unit-norm clusters on the 64-sphere + ~1% near-dups
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + 0.35 * rng.standard_normal((n_emb, 64))
    for i in range(0, n_emb - 1, 100):
        labels[i + 1] = labels[i]
        vecs[i + 1] = vecs[i] + 0.02 * rng.standard_normal(64)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
