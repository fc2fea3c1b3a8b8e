#!/usr/bin/env python3
"""Scale-rehearsal fixture generator (driver-side tooling, like check.py).

Generates deterministic synthetic tables with the same schemas and
statistical shape as the driver fixtures described in TESTDATA.md
(seed 42), at a chosen multiple of the sf0.1 scale. Used by the
round-8 scale rehearsal (SCALE.md): generate a 1x and a 10x corpus
with the SAME generator, run the dedup/retrieval battery on both, and
verify the sf0.1->sf1 wall-time ratios stay within each operator's
documented complexity shape.

Matched shape properties (measured from /root/testdata/sf0.1):
  documents: 31-word vocabulary (30 ~uniform common words + 'dup' in
    ~5% of docs), 10..100 tokens/doc uniform, langs en~41%/others,
    10 sources, ~5% of docs are planted ~90%-overlap near-dups of an
    earlier doc and ~0.2% verbatim dups (dd2 found 25 pairs per 500
    docs at sf0.01 -- near-dup density is linear in corpus size).
  embeddings: 64-dim float32 around 10 label centroids, ~5% near-dup
    vectors (dd5 found 27 pairs per 500 at sf0.01).
  events: timestamp[ns] parquet (the TESTDATA nanos gotcha), ~10 s
    cadence from 2024-01-01.
  lineitem/orders: TPC-H-ish columns, 4 lines/order, non-unique
    (orderkey, linenumber) -- matching the TESTDATA caveat.

Usage: python3 tools/gen_fixture.py MULT OUTDIR
  MULT: size as a multiple of sf0.1 (1 -> gsf0.1-equivalent, 10 -> sf1)
  e.g. python3 tools/gen_fixture.py 10 target/fixtures/gsf1
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

COMMON = ("spark window merge table column vector stream value data small "
          "join filter big group hash customer sort order slow line part "
          "fast the row agg key query a scan batch").split()
LANGS = ["en", "zh", "fr", "es", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def gen_documents(rng, n):
    texts, langs, sources = [], [], []
    tok_counts = rng.integers(10, 101, size=n)
    near_dup = rng.random(n) < 0.05
    exact_dup = rng.random(n) < 0.002
    dup_term = rng.random(n) < 0.05
    for i in range(n):
        if i > 0 and exact_dup[i]:
            texts.append(texts[rng.integers(0, i)])
        elif i > 0 and near_dup[i]:
            base = texts[rng.integers(0, i)].split()
            m = max(1, len(base) // 10)
            for _ in range(m):
                base[rng.integers(0, len(base))] = COMMON[rng.integers(0, 30)]
            texts.append(" ".join(base))
        else:
            toks = [COMMON[j] for j in rng.integers(0, 30, size=tok_counts[i])]
            if dup_term[i]:
                toks[rng.integers(0, len(toks))] = "dup"
            texts.append(" ".join(toks))
        langs.append(LANGS[rng.choice(5, p=LANG_P)])
        sources.append(f"src{rng.integers(0, 10)}")
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(sources),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })


def gen_embeddings(rng, n, dim=64, labels=10):
    cents = rng.normal(0, 0.15, size=(labels, dim)).astype(np.float32)
    lab = rng.integers(0, labels, size=n)
    vecs = cents[lab] + rng.normal(0, 0.08, size=(n, dim)).astype(np.float32)
    near = np.flatnonzero(rng.random(n) < 0.05)
    for i in near[near > 0]:
        j = rng.integers(0, i)
        vecs[i] = vecs[j] + rng.normal(0, 0.005, size=dim).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              type=pa.list_(pa.float32())),
        "label": pa.array(lab.astype(np.int32)),
    })


def gen_events(rng, n, n_users):
    base = np.datetime64("2024-01-01T00:00:00", "ns")
    gaps = rng.exponential(10.0, size=n)
    ts = base + (np.cumsum(gaps) * 1e9).astype("timedelta64[ns]")
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, n_users, size=n)),
        "event_type": pa.array([EVENT_TYPES[i] for i in
                                rng.integers(0, len(EVENT_TYPES), size=n)]),
        "value": pa.array(np.round(rng.uniform(0, 200, size=n), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in
                           rng.integers(0, 100, size=n)]),
    })


def days(rng, n, lo="1992-01-01", hi="2004-12-31"):
    span = (np.datetime64(hi) - np.datetime64(lo)).astype(int)
    d = np.datetime64(lo, "us") + (rng.integers(0, span, size=n)
                                   * 86_400_000_000).astype("timedelta64[us]")
    return pa.array(d, type=pa.timestamp("us"))


def gen_orders(rng, n, n_cust):
    return pa.table({
        "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n)),
        "o_orderstatus": pa.array([["O", "F", "P"][i] for i in
                                   rng.integers(0, 3, size=n)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, size=n), 2)),
        "o_orderdate": days(rng, n),
        "o_orderpriority": pa.array(
            [["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"][i]
             for i in rng.integers(0, 5, size=n)]),
    })


def gen_lineitem(rng, n, n_orders, n_part, n_supp):
    return pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_orders, size=n)),
        "l_partkey": pa.array(rng.integers(0, n_part, size=n)),
        "l_suppkey": pa.array(rng.integers(0, n_supp, size=n)),
        "l_linenumber": pa.array(rng.integers(1, 8, size=n).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, size=n).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, size=n), 2)),
        "l_discount": pa.array(np.round(rng.integers(0, 11, size=n) * 0.01, 2)),
        "l_tax": pa.array(np.round(rng.integers(0, 9, size=n) * 0.01, 2)),
        "l_returnflag": pa.array([["A", "N", "R"][i] for i in
                                  rng.integers(0, 3, size=n)]),
        "l_linestatus": pa.array([["O", "F"][i] for i in
                                  rng.integers(0, 2, size=n)]),
        "l_shipdate": days(rng, n),
    })


def main():
    mult, outdir = float(sys.argv[1]), sys.argv[2]
    import os
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)

    def emit(name, table):
        pq.write_table(table, f"{outdir}/{name}.parquet")
        print(f"{name}: {table.num_rows} rows")

    emit("documents", gen_documents(rng, int(5000 * mult)))
    emit("embeddings", gen_embeddings(rng, int(2000 * mult)))
    emit("events", gen_events(rng, int(100000 * mult), int(2000 * mult)))
    n_orders = int(150000 * mult)
    emit("orders", gen_orders(rng, n_orders, int(15000 * mult)))
    emit("lineitem", gen_lineitem(rng, int(600000 * mult), n_orders,
                                  int(20000 * mult), int(1000 * mult)))


if __name__ == "__main__":
    main()
