"""Generate synthetic testdata parquet at an arbitrary scale factor.

Reproduces the DISTRIBUTION FAMILY of the driver-generated tables in
/root/testdata (TESTDATA.md: TPC-H-ish star schema + events/documents/
embeddings, seed 42) so scale experiments above the shipped sf0.1 run
against statistically compatible data.  Every column was measured from
the shipped parquet before being encoded here (uniform categoricals,
uniform dates, exponential event values, Poisson-via-uniform-orderkey
line counts, 5%% 'dup'-token docs, ~0.16%% exact-copy docs, unit-norm
gaussian embeddings with uniform labels); row-count rules: customer
150k·sf, supplier 10k·sf, part 200k·sf, orders 1.5M·sf, lineitem
6M·sf, events 1M·sf (users 15k·sf), documents max(500, 50k·sf),
embeddings max(500, 20k·sf).

NOT a byte-for-byte replica (the driver's RNG call order is unknown) —
the oracle gate runs Spark and DuckDB on the SAME generated files, so
cross-engine correctness is unaffected; only absolute row values differ
from the driver's copies.

Usage: python tools/gen_testdata.py 1.0 /root/repo/testdata/sf1.0
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = [
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA",
    "ROMANIA", "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM",
    "UNITED STATES",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}", file=sys.stderr)


def _ts_us(date_str: str) -> int:
    return int(np.datetime64(date_str, "us").astype("int64"))


def generate(sf: float, out_dir: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = max(1, int(15_000 * sf))
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": NATIONS,
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    ck = np.arange(n_cust, dtype=np.int64)
    _write(out_dir, "customer", pa.table({
        "c_custkey": ck,
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    pk = np.arange(n_part, dtype=np.int64)
    adj = np.array(ADJ)[rng.integers(0, 8, n_part)]
    noun = np.array(NOUN)[rng.integers(0, 8, n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pk,
        "p_name": pa.array([f"{a} {b}" for a, b in zip(adj, noun)]),
        "p_brand": pa.array(
            [f"Brand#{i}" for i in rng.integers(0, 25, n_part)]
        ),
        "p_type": pa.array(np.array(TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": 900.0 + (pk % 1000) / 10.0,
    }))

    o_start = _ts_us("1995-01-01")
    o_days = rng.integers(0, 2405, n_ord)  # 1995-01-01 .. 2001-08-01
    _write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, n_cust, n_ord).astype(np.int64),
        "o_orderstatus": pa.array(
            np.array(STATUSES)[rng.integers(0, 3, n_ord)]
        ),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(
            o_start + o_days * DAY_US, pa.timestamp("us")
        ),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    s_start = _ts_us("1995-01-01")
    _write(out_dir, "lineitem", pa.table({
        # uniform orderkey per line => Binomial(n_li, 1/n_ord) ≈ Poisson(4)
        # lines per order, matching the shipped per-order distribution
        "l_orderkey": rng.integers(0, n_ord, n_li).astype(np.int64),
        "l_partkey": rng.integers(0, n_part, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(
            np.array(["F", "O"])[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": pa.array(
            s_start + rng.integers(1, 2500, n_li) * DAY_US,
            pa.timestamp("us"),
        ),
    }))

    ev_start = _ts_us("2024-01-01")
    ev_span = _ts_us("2024-01-31") - ev_start
    ts = np.sort(ev_start + (rng.random(n_ev) * ev_span).astype(np.int64))
    _write(out_dir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": rng.integers(0, n_users, n_ev).astype(np.int64),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]
        ),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]
        ),
    }))

    vocab = np.array(VOCAB)
    lens = rng.integers(10, 101, n_doc)
    texts: list[str] = []
    for i in range(n_doc):
        words = vocab[rng.integers(0, len(vocab), lens[i])]
        if rng.random() < 0.05:  # 'dup'-token docs (shipped rate: 5%)
            pos = rng.integers(0, lens[i], rng.integers(1, 4))
            words = words.copy()
            words[pos] = "dup"
        if i > 0 and rng.random() < 0.0016:  # exact-copy docs (~8/5000)
            texts.append(texts[int(rng.integers(0, i))])
        else:
            texts.append(" ".join(words))
    _write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": pa.array(
            np.array(LANGS)[rng.choice(len(LANGS), n_doc, p=LANG_P)]
        ),
        "source": pa.array([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": rng.integers(0, 10, n_emb).astype(np.int32),
    }))


def generate_clustered_embeddings(
    n: int,
    out_dir: str,
    n_clusters: int = 50,
    eps: float = 0.25,
    dim: int = 64,
    seed: int = 7,
) -> None:
    """Seeded Gaussian-mixture embeddings (the REALISTIC ANN fixture):
    ``n_clusters`` centers uniform in [-1, 1)^dim, each vector =
    center[vec_id % n_clusters] + N(0, eps²) noise — planted structure
    so recall/occupancy measurements grade the serving tier on data
    shaped like real embedding spaces, not uniform noise.  label =
    planted cluster id (the ground truth for integrity checks).  Writes
    ``embeddings.parquet`` in the standard table schema so every
    operator and bench path reads it unchanged."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1.0, 1.0, (n_clusters, dim))
    assign = np.arange(n, dtype=np.int64) % n_clusters
    vecs = (centers[assign] + rng.normal(0.0, eps, (n, dim))).astype(
        np.float32
    )
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": assign.astype(np.int32),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--clustered":
        n = int(sys.argv[2])
        out = sys.argv[3]
        nc = int(sys.argv[4]) if len(sys.argv) > 4 else 50
        e = float(sys.argv[5]) if len(sys.argv) > 5 else 0.25
        generate_clustered_embeddings(n, out, n_clusters=nc, eps=e)
        print(f"generated clustered embeddings n={n} clusters={nc} eps={e} at {out}")
        sys.exit(0)
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "testdata",
            f"sf{sf:g}",
        )
    )
    generate(sf, out)
    print(f"generated sf={sf} at {out}")
