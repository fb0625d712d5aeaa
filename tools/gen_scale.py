#!/usr/bin/env python3
"""Synthetic scale-factor generator for the scaling sweep (r14 verdict #1).

Reproduces the /root/testdata star schema one decade (or more) beyond the
driver's largest shipped scale (sf0.1, ~17 MB), so the 100 TB design
claims get a MEASURED third scale point instead of stopping at plan-shape
audits. Distributions are reverse-engineered from the driver parquet
itself (dev-tool side; the engine never sees this script):

  region/nation    fixed 5 / 25 rows, values copied verbatim
  customer         sf*150k; Customer#%09d, nation U(0,24), acctbal
                   U(-1000,10000), segment U{5}
  supplier         sf*10k;  Supplier#%09d, same shape
  part             sf*200k; "<adj> <noun>", Brand#1..25, 6 types,
                   size U(1,50), retailprice 900 + (k%1000)/10
  orders           sf*1.5M; status U{P,O,F}, priority U{5}, totalprice
                   U(1000,500000), orderdate U(1995-01-01, 2001-08-01)
  lineitem         sf*6M;   l_orderkey drawn UNIFORMLY over orders, so
                   lines/order is Binomial(6M, 1/1.5M) ~ Poisson(4.0)
                   INCLUDING zero-line orders — close to, but not the
                   same as, the driver data's zero-truncated shape
                   (avg 4.08, no empty orders). Scaling exponents are
                   unaffected (both are mean-4 constant-fanout);
                   per-query absolute walls at a given sf can differ a
                   few % from true driver-shaped data. linenumber
                   U(1,7), qty U(1,50), extprice
                   U(900,105000), disc U(0,0.1), tax U(0,0.08),
                   flags U{A,N,R}xU{F,O}, shipdate U(1995-01-02,2001-11-04)
  events           sf*1M;   ts U over 2024-01 (30 days), user_id U over
                   sf*15k users, type U{5}, value Exp(mean 50),
                   props {"k": U(0,99)}
  documents        max(500, sf*50k); 10..100 words from the 30-word
                   vocab, lang {en:40%, de/es/fr/zh:15%}, source
                   src0..19, and 5% planted near-dups: an earlier doc's
                   text + " dup" (the exact structure the dedup family's
                   candidate-pair counts scale on)
  embeddings       max(500, sf*20k); 64-dim unit float32, label U(0,9)

Deterministic (numpy default_rng(seed)); one .parquet FILE per table,
same names as /root/testdata/sf*/ so SPARK_GRAFT_SF_DIR just points here.

Usage: python3 tools/gen_scale.py SF OUTDIR [SEED]
   eg: python3 tools/gen_scale.py 1 /root/repo/scale_data/sf1
"""
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("a agg batch big column customer data dup fast filter group hash "
         "join key line merge order part query row scan slow small sort "
         "spark stream table the value vector window").split()
VOCAB.remove("dup")  # only appears as the planted near-dup marker
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]
ADJS = ["large", "hot", "blue", "red", "green", "small", "dim", "shiny"]
NOUNS = ["ring", "bolt", "nut", "cog", "gear", "pin", "rod", "cap"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
DAY_US = 86_400_000_000


GEN_VERSION = "gen_scale-v2"  # bump on ANY distribution change

_row_counts = {}


def write(outdir, name, table):
    path = f"{outdir}/{name}.parquet"
    pq.write_table(table, path, compression="snappy")
    _row_counts[name] = table.num_rows
    print(f"  {name}: {table.num_rows} rows -> {path}")


def write_meta(outdir, sf, seed):
    """Freeze the provenance next to the data (r15 verdict #7): bench
    artifacts embed this verbatim, and scale_table.py refuses to mix
    artifacts measured against different generator versions/seeds."""
    import json
    meta = {"generator": GEN_VERSION, "sf": sf, "seed": seed,
            "rows": _row_counts}
    with open(f"{outdir}/_meta.json", "w") as f:
        json.dump(meta, f)
    print(f"  _meta.json: {meta}")


def ts_col(us):
    return pa.array(us, type=pa.timestamp("us"))


def main():
    sf = float(sys.argv[1])
    outdir = sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 42
    rng = np.random.default_rng(seed)
    import os
    os.makedirs(outdir, exist_ok=True)

    n_cust = int(sf * 150_000)
    n_supp = int(sf * 10_000)
    n_part = int(sf * 200_000)
    n_ord = int(sf * 1_500_000)
    n_li = int(sf * 6_000_000)
    n_ev = int(sf * 1_000_000)
    n_users = int(sf * 15_000)
    n_doc = max(500, int(sf * 50_000))
    n_emb = max(500, int(sf * 20_000))

    # region / nation: fixed reference dimensions, verbatim
    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]}))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGS)[rng.integers(0, 5, n_cust)])}))

    write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)}))

    adj = np.array(ADJS)[rng.integers(0, len(ADJS), n_part)]
    noun = np.array(NOUNS)[rng.integers(0, len(NOUNS), n_part)]
    write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": np.char.add(np.char.add(adj, " "), noun),
        "p_brand": np.array([f"Brand#{b}" for b in range(1, 26)])[
            rng.integers(0, 25, n_part)],
        "p_type": np.array(TYPES)[rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0}))

    od_lo = np.datetime64("1995-01-01").astype("datetime64[us]").astype(np.int64)
    od_days = 2404  # 1995-01-01 .. 2001-08-01
    write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": ts_col(od_lo + rng.integers(0, od_days + 1, n_ord) * DAY_US),
        "o_orderpriority": np.array(PRIOS)[rng.integers(0, 5, n_ord)]}))

    sd_lo = od_lo + DAY_US  # 1995-01-02
    sd_days = 2498  # .. 2001-11-04
    write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.integers(0, 2, n_li)],
        "l_shipdate": ts_col(sd_lo + rng.integers(0, sd_days + 1, n_li) * DAY_US)}))

    ev_lo = np.datetime64("2024-01-01").astype("datetime64[us]").astype(np.int64)
    ev_span = 30 * DAY_US
    write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": ts_col(ev_lo + rng.integers(0, ev_span, n_ev)),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(["click", "error", "purchase", "signup",
                                "view"])[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": np.char.add(np.char.add('{"k": ',
            rng.integers(0, 100, n_ev).astype(str)), "}")}))

    # documents: word salad + 5% planted near-dups (earlier text + " dup")
    vocab = np.array(VOCAB)
    nwords = rng.integers(10, 101, n_doc)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), k)]) for k in nwords]
    dup_count = n_doc // 20
    dup_ids = rng.choice(np.arange(1, n_doc), size=dup_count, replace=False)
    for d in dup_ids:
        base = rng.integers(0, d)  # copy an EARLIER doc, as the driver does
        texts[d] = texts[base] + " dup"
    langs = np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]
    write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": np.array([f"src{i}" for i in range(20)])[
            rng.integers(0, 20, n_doc)],
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64())}))

    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())}))

    write_meta(outdir, sf, seed)


if __name__ == "__main__":
    main()
