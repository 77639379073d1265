"""Generate a Zipf-SKEWED variant of the sf0.1 tables (VERDICT r7 #4):
the one 100 TB scale-killer class no driver dataset exercises — hot keys.

Same size as sf0.1, same schemas, but with planted skew in exactly the
columns the join / sessionization / heavy-hitter / near-dup families key
on, so the hostile driver_sim sweep over this draw checks BOTH that every
plan stays correct under skew (the DuckDB oracle sees the same skewed
parquet) and, via timing comparison against the normal sf0.1 sweep, which
plans degrade and need salting / AQE skew handling:

* events.user_id   — the TOP USER owns ~20% of all rows (the verdict's
  spec), users 1-10 split another ~30% (Zipf-ish harmonic weights), the
  remaining half stays uniform. Hits sessionization, per-user windows,
  journeys, heavy hitters, stream-state keying.
* orders.o_custkey — same 20/30/50 split onto customer 0 / 1-10 / all.
  Hits every orders-customer join and per-customer aggregate.
* lineitem.l_partkey, l_suppkey — 20% onto part 0 / supplier 0. Hits the
  part/supplier join family (q2/q11/q20, salted-join demos).
* documents.text   — a planted HOT NEAR-DUP CLUSTER: 2.5% of docs (125)
  become single-token edits of one shared template, so LSH band buckets,
  SimHash bands, and PPJoin prefix groups all get one quadratic-ish hot
  bucket (the skew mode of near-dup at corpus scale). n_chars recomputed.
* embeddings.embedding — 2% of vectors (40) collapse onto one tight
  cluster (shared center + 1% noise): one hot IVF list, a dense cosine
  near-dup clique, a hot SRP bucket.

All other tables copy through unchanged; every rewrite is seeded and
per-row deterministic. Keys, FK ranges, and row counts are IDENTICAL to
sf0.1 — only value distributions skew.

Usage: python scripts/make_skew_data.py [out_dir]   (default scaledata/skew)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"
SEED = 1717

# 20% of rows onto the single hot key, 30% Zipf-ish over the next 10,
# 50% kept from the original (uniform-ish) draw.
P_HOT = 0.20
P_WARM = 0.30


def _skew_keys(rng: np.random.Generator, orig: np.ndarray) -> np.ndarray:
    """Rewrite a key column in place of ``orig``: 20% -> key 0, 30% ->
    keys 1..10 with harmonic (1/r) weights, 50% keep the original."""
    n = len(orig)
    u = rng.random(n)
    out = orig.copy()
    out[u < P_HOT] = 0
    warm_mask = (u >= P_HOT) & (u < P_HOT + P_WARM)
    ranks = np.arange(1, 11, dtype=np.float64)
    w = (1.0 / ranks) / (1.0 / ranks).sum()
    out[warm_mask] = rng.choice(np.arange(1, 11), size=int(warm_mask.sum()), p=w)
    return out


def main() -> None:
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(os.path.dirname(__file__), "..", "scaledata", "skew")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(SEED)

    # untouched dimensions copy through
    for t in ("region", "nation", "customer", "supplier", "part"):
        shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")

    # events: hot user_id
    ev = con.execute(
        f"SELECT * FROM '{BASE}/events.parquet' ORDER BY event_id"
    ).fetch_arrow_table()
    uid = _skew_keys(rng, ev.column("user_id").to_numpy().astype(np.int64))
    ev = ev.set_column(
        ev.schema.get_field_index("user_id"), "user_id", pa.array(uid)
    )
    pq.write_table(ev, f"{out}/events.parquet")
    print(f"events: top user owns {np.mean(uid == 0):.1%}")

    # orders: hot o_custkey
    od = con.execute(
        f"SELECT * FROM '{BASE}/orders.parquet' ORDER BY o_orderkey"
    ).fetch_arrow_table()
    ck = _skew_keys(rng, od.column("o_custkey").to_numpy().astype(np.int64))
    od = od.set_column(
        od.schema.get_field_index("o_custkey"), "o_custkey", pa.array(ck)
    )
    pq.write_table(od, f"{out}/orders.parquet")
    print(f"orders: top customer owns {np.mean(ck == 0):.1%}")

    # lineitem: hot l_partkey and l_suppkey
    li = con.execute(
        f"SELECT * FROM '{BASE}/lineitem.parquet' ORDER BY l_orderkey, l_linenumber"
    ).fetch_arrow_table()
    pk = _skew_keys(rng, li.column("l_partkey").to_numpy().astype(np.int64))
    sk = _skew_keys(rng, li.column("l_suppkey").to_numpy().astype(np.int64))
    li = li.set_column(
        li.schema.get_field_index("l_partkey"), "l_partkey", pa.array(pk)
    )
    li = li.set_column(
        li.schema.get_field_index("l_suppkey"), "l_suppkey", pa.array(sk)
    )
    pq.write_table(li, f"{out}/lineitem.parquet")
    print(f"lineitem: top part {np.mean(pk == 0):.1%}, top supp {np.mean(sk == 0):.1%}")

    # documents: planted hot near-dup cluster (single-token edits of one
    # template). n_chars recomputed so length-derived queries stay
    # consistent with the text column.
    docs = con.execute(
        f"SELECT * FROM '{BASE}/documents.parquet' ORDER BY doc_id"
    ).fetch_arrow_table()
    doc_ids = docs.column("doc_id").to_numpy()
    texts = docs.column("text").to_pylist()
    template = texts[3]
    n_cluster = 0
    for i, d in enumerate(doc_ids):
        if d % 40 == 7:
            texts[i] = f"{template} edit{int(d)}"
            n_cluster += 1
    n_chars = [len(t) for t in texts]
    docs = docs.set_column(
        docs.schema.get_field_index("text"), "text", pa.array(texts)
    )
    docs = docs.set_column(
        docs.schema.get_field_index("n_chars"),
        "n_chars",
        pa.array(n_chars, type=pa.int64()),
    )
    pq.write_table(docs, f"{out}/documents.parquet")
    print(f"documents: hot near-dup cluster of {n_cluster}")

    # embeddings: 2% collapse onto one tight cluster
    emb = con.execute(
        f"SELECT * FROM '{BASE}/embeddings.parquet' ORDER BY vec_id"
    ).fetch_arrow_table()
    vec_ids = emb.column("vec_id").to_numpy()
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    center = vecs[100].copy()
    cluster_mask = vec_ids % 50 == 3
    noise = rng.normal(0.0, 0.01 * float(np.abs(center).mean()), size=(int(cluster_mask.sum()), vecs.shape[1]))
    vecs[cluster_mask] = (center[None, :] + noise).astype(np.float32)
    emb = emb.set_column(
        emb.schema.get_field_index("embedding"),
        "embedding",
        pa.array([list(map(float, v)) for v in vecs], type=pa.list_(pa.float32())),
    )
    pq.write_table(emb, f"{out}/embeddings.parquet")
    print(f"embeddings: hot cluster of {int(cluster_mask.sum())}")


if __name__ == "__main__":
    main()
