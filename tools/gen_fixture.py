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

Usage: python3 tools/gen_fixture.py MULT OUTDIR [--skew]
  MULT: size as a multiple of sf0.1 (1 -> gsf0.1-equivalent, 10 -> sf1)
  e.g. python3 tools/gen_fixture.py 10 target/fixtures/gsf1

--skew (round-9 skew-realism rehearsal, VERDICT r8 ask #4): emits ONLY
documents.parquet + planted_pairs.parquet, with the statistical shape
of a real crawl instead of the driver fixture's uniform 31-word toy:
  - 20,000-type Zipf(s=1.07) vocabulary (hot shingles arise naturally),
  - lognormal doc lengths (median ~150 tokens, tail to 3,000),
  - per-language function words at ~30% token rate (en/de/es/fr; zh
    docs carry no markers and must resolve to 'und'),
  - a 20% boilerplate TEMPLATE CLIQUE (100 fixed tokens + 8 unique) --
    the error-page/listing-template shape that makes unguarded LSH,
    shingle joins and winnowing postings quadratic,
  - a dominant domain (src0 at 60%) and ~2% blank-payload assets
    (empty text -- identical payloads for the pHash path),
  - ~5% planted ~95%-overlap near-dup pairs OUTSIDE the clique,
    recorded in planted_pairs.parquet(doc_a, doc_b) so guard-on runs
    can report recall against ground truth.
Consumed by graft.RehearseSkew (SCALE.md skew-rehearsal table).
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


SKEW_VOCAB = 20000
SKEW_ZIPF_S = 1.07
FUNC_WORDS = {"en": ["the", "a", "is"], "de": ["der", "die", "und"],
              "es": ["el", "la", "y"], "fr": ["le", "les", "et"]}
SKEW_LANGS = ["en", "de", "es", "fr", "zh"]
SKEW_LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents_skew(rng, n):
    """Realistic-crawl document corpus (see module docstring)."""
    # Zipf(s) over a truncated 20k-type vocabulary via inverse-CDF on
    # the normalized rank weights (rng.zipf is unbounded; choice(p=...)
    # over 20k categories is slow for ~10M draws).
    ranks = np.arange(1, SKEW_VOCAB + 1, dtype=np.float64)
    cdf = np.cumsum(ranks ** -SKEW_ZIPF_S)
    cdf /= cdf[-1]

    def zipf_words(k):
        return [f"w{r}" for r in np.searchsorted(cdf, rng.random(k))]

    template = zipf_words(100)  # the boilerplate clique body
    lens = np.clip(rng.lognormal(np.log(150.0), 0.8, size=n), 10, 3000)
    lens = lens.astype(np.int64)
    lang_idx = rng.choice(5, size=n, p=SKEW_LANG_P)
    is_template = rng.random(n) < 0.20
    is_blank = (~is_template) & (rng.random(n) < 0.025)
    is_neardup = (~is_template) & (~is_blank) & (rng.random(n) < 0.055)
    # src0 dominates (60%); the rest spread over src1..src9.
    src_draw = rng.random(n)
    sources = [("src0" if d < 0.60 else f"src{1 + int((d - 0.60) / 0.40 * 9)}")
               for d in src_draw]

    texts, langs = [], []
    organic = []          # indices eligible as near-dup bases
    planted_a, planted_b = [], []
    for i in range(n):
        lang = SKEW_LANGS[lang_idx[i]]
        if is_blank[i]:
            texts.append("")
            langs.append(lang)
            continue
        if is_template[i]:
            # 100 shared tokens + 8 unique: one hot LSH bucket / hot
            # shingles / hot winnow fingerprints, by construction.
            texts.append(" ".join(template + [f"u{i}_{j}" for j in range(8)]))
            langs.append(lang)
            continue
        if is_neardup[i] and organic:
            base_i = organic[rng.integers(0, len(organic))]
            toks = texts[base_i].split()
            m = max(1, len(toks) // 20)  # ~95% token overlap
            for _ in range(m):
                toks[rng.integers(0, len(toks))] = f"w{1 + rng.integers(0, SKEW_VOCAB)}"
            texts.append(" ".join(toks))
            langs.append(langs[base_i])
            planted_a.append(base_i)
            planted_b.append(i)
            continue
        toks = zipf_words(int(lens[i]))
        fw = FUNC_WORDS.get(lang)
        if fw is not None:  # ~30% function-word rate, like real prose
            marks = np.flatnonzero(rng.random(len(toks)) < 0.30)
            for p in marks:
                toks[p] = fw[rng.integers(0, len(fw))]
        texts.append(" ".join(toks))
        langs.append(lang)
        organic.append(i)

    docs = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(sources),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    pairs = pa.table({
        "doc_a": pa.array(np.array(planted_a, dtype=np.int64)),
        "doc_b": pa.array(np.array(planted_b, dtype=np.int64)),
    })
    return docs, pairs


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
    # timestamp[us], matching the round-10+ driver fixtures (the
    # TIMESTAMP(NANOS) generation flipped to MICROS; Tables.events
    # handles both, but the DuckDB hash gate needs the same unit the
    # driver fixture carries or sub-microsecond truncation diverges)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    gaps = rng.exponential(10.0, size=n)
    ts = base + (np.cumsum(gaps) * 1e6).astype("timedelta64[us]")
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, size=n)),
        "event_type": pa.array([EVENT_TYPES[i] for i in
                                rng.integers(0, len(EVENT_TYPES), size=n)]),
        "value": pa.array(np.round(rng.uniform(0, 200, size=n), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in
                           rng.integers(0, 100, size=n)]),
    })


REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
MKT_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
P_ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]


def gen_region():
    return pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS),
    })


def gen_nation():
    return pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    })


def gen_customer(rng, n):
    return pa.table({
        "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
        "c_nationkey": pa.array(rng.integers(0, 25, size=n).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, size=n), 2)),
        "c_mktsegment": pa.array([MKT_SEGS[i] for i in
                                  rng.integers(0, 5, size=n)]),
    })


def gen_supplier(rng, n):
    return pa.table({
        "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
        "s_nationkey": pa.array(rng.integers(0, 25, size=n).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, size=n), 2)),
    })


def gen_part(rng, n):
    names = [f"{P_ADJS[a]} {P_NOUNS[b]}" for a, b in
             zip(rng.integers(0, 8, size=n), rng.integers(0, 8, size=n))]
    return pa.table({
        "p_partkey": pa.array(np.arange(n, dtype=np.int64)),
        "p_name": pa.array(names),
        "p_brand": pa.array([f"Brand#{i}" for i in
                             rng.integers(1, 26, size=n)]),
        "p_type": pa.array([P_TYPES[i] for i in rng.integers(0, 6, size=n)]),
        "p_size": pa.array(rng.integers(1, 51, size=n).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, size=n), 2)),
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
    skew = "--skew" in sys.argv[3:]
    import os
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)

    def emit(name, table):
        pq.write_table(table, f"{outdir}/{name}.parquet")
        print(f"{name}: {table.num_rows} rows")

    if skew:
        docs, pairs = gen_documents_skew(rng, int(5000 * mult))
        emit("documents", docs)
        emit("planted_pairs", pairs)
        return

    emit("documents", gen_documents(rng, int(5000 * mult)))
    emit("embeddings", gen_embeddings(rng, int(2000 * mult)))
    emit("events", gen_events(rng, int(100000 * mult), int(2000 * mult)))
    emit("region", gen_region())
    emit("nation", gen_nation())
    n_cust, n_part, n_supp = (int(15000 * mult), int(20000 * mult),
                              int(1000 * mult))
    emit("customer", gen_customer(rng, n_cust))
    emit("supplier", gen_supplier(rng, n_supp))
    emit("part", gen_part(rng, n_part))
    n_orders = int(150000 * mult)
    emit("orders", gen_orders(rng, n_orders, n_cust))
    emit("lineitem", gen_lineitem(rng, int(600000 * mult), n_orders,
                                  n_part, n_supp))


if __name__ == "__main__":
    main()
