"""Generate LOCAL larger-scale copies of the documents/embeddings tables
for the scaling demonstration (PLANS.md "Scaling evidence" section).

/root/testdata is driver-owned and read-only, so the bigger corpora live
under the repo (scaledata/, git-ignored). The generator matches the
driver tables' MODEL, sampled from sf0.1 itself — same vocabulary, the
empirical per-doc token-count distribution, the same lang/source label
sets, embeddings uniform over the same per-dimension value range — so a
query's work per row is comparable and wall-time ratios between scales
measure the ENGINE's scaling, not a data-shape change. Text is freshly
drawn per row (hash-seeded, deterministic), not tiled copies of sf0.1:
tiling would plant exact duplicates whose LSH band buckets grow
quadratically and would corrupt the dedup queries' scaling curve.

Usage: python scripts/make_scale_data.py [mult] [out_dir]
       (default: mult=10 -> ~sf1 at scaledata/sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE = "/root/testdata/sf0.1"


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", "scaledata", "sf1")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    vocab = [
        r[0]
        for r in con.execute(
            "SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
            f"FROM '{BASE}/documents.parquet' ORDER BY w"
        ).fetchall()
    ]
    lengths = np.array(
        [
            r[0]
            for r in con.execute(
                "SELECT len(string_split(text, ' ')) "
                f"FROM '{BASE}/documents.parquet'"
            ).fetchall()
        ],
        dtype=np.int64,
    )
    langs = [
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT lang FROM '{BASE}/documents.parquet' ORDER BY 1"
        ).fetchall()
    ]
    n_src = con.execute(
        f"SELECT count(DISTINCT source) FROM '{BASE}/documents.parquet'"
    ).fetchone()[0]
    n_docs_base, n_vecs_base = (
        con.execute(
            f"SELECT count(*) FROM '{BASE}/documents.parquet'"
        ).fetchone()[0],
        con.execute(
            f"SELECT count(*) FROM '{BASE}/embeddings.parquet'"
        ).fetchone()[0],
    )
    lo, hi = con.execute(
        "SELECT min(x), max(x) FROM (SELECT unnest(embedding) AS x "
        f"FROM '{BASE}/embeddings.parquet')"
    ).fetchone()

    rng = np.random.default_rng(int(sys.argv[3]) if len(sys.argv) > 3 else 42)
    n_docs = n_docs_base * mult
    doc_lens = rng.choice(lengths, size=n_docs, replace=True)
    voc = np.array(vocab)
    texts = []
    for ln in doc_lens:
        texts.append(" ".join(voc[rng.integers(0, len(voc), size=ln)]))
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [langs[i] for i in rng.integers(0, len(langs), size=n_docs)],
                pa.string(),
            ),
            "source": pa.array(
                [f"src{i}" for i in rng.integers(0, n_src, size=n_docs)],
                pa.string(),
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(docs, os.path.join(out, "documents.parquet"))

    n_vecs = n_vecs_base * mult
    emb = rng.uniform(lo, hi, size=(n_vecs, 64)).astype(np.float32)
    embeddings = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=n_vecs), pa.int32()
            ),
        }
    )
    pq.write_table(embeddings, os.path.join(out, "embeddings.parquet"))
    print(
        f"wrote {n_docs} documents / {n_vecs} embeddings to {out} "
        f"(mult={mult} over {BASE})"
    )


if __name__ == "__main__":
    main()
