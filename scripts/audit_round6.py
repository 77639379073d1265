"""Mechanical audit of the accepted-risk 6dp round() family (VERDICT r8 #4).

Spark's round() is HALF_UP on the double's shortest decimal repr; DuckDB's
is half-even on the repr digits (root cause established round 8, see
.claude/skills/verify/SKILL.md). They diverge exactly when the UNROUNDED
value's shortest repr terminates at scale+1 fractional digits with a final
5 (an "exact decimal half"). Rounds 7/8 converted every short-repr-prone
site to the floor-grid form on both engines; the 6dp cosine/tfidf/xent
family stayed on round()/round() with a documented rationale ("irrational
values, 17-digit reprs, an exact 7-digit half essentially cannot occur").
After three consecutive rounds in which a fresh data axis found a rounding
divergence, this script converts that assumption into a CHECKED invariant:

For every data draw it computes the complete UNROUNDED value population of
each still-on-round() 6dp family —

* cosine_pairs — every pairwise cosine among the embeddings table (the
  population every cosine-emitting query draws from: near-dup/semdedup/
  SRP-LSH pairs, ANN/IVF/kNN/rerank/hard-negative query-corpus cosines —
  query vectors are rows of the same table);
* tfidf — tf * (ln((n_docs+1)/(df+1)) + 1) for EVERY (doc, term), the
  population doc_tfidf_top_terms ranks (top-k only narrows it);
* char_lm_xent — the char-bigram LM cross-entropy -k/(n_bigrams*1e6) for
  every doc (k integer micro-nats), the one RATIONAL member of the family
  (doc_char_lm_scores) and therefore the likeliest to land on a short repr

— and flags any value on which the two engines' round(x, 6) DISAGREE.

Refined model (this script's first run corrected the round-8 one): DuckDB
does NOT round half-even on the repr digits — it rounds the BINARY
product x*1e6 half-away-from-zero, so whether an exact-decimal-half
diverges from Spark's repr-HALF_UP depends on which side of .5 the
binary multiplication error lands (probe: round(4.5897545, 6) agrees
across engines — product lands above .5 — while round(0.565, 2)
diverges). Divergence therefore requires x*1e6 within ~1 ulp of an exact
.5 boundary; the SQL prefilter (|x*1e7 - nearest int| < 1e-6 with that
int ending in 5) is a wide superset of that band. Each candidate is then
checked EXACTLY: Spark's result as Decimal(repr(x)) quantized HALF_UP
(BigDecimal.valueOf semantics, established r8), DuckDB's by executing
its round() on the candidate; a hit is a genuine cross-engine mismatch.

Zero hits across all draws = the family's documented assumption is
mechanically verified for the data the catalog is attested on. Any hit =
convert that family to the floor-grid form on both sides (the standing
closure recipe) — do NOT widen the tolerance. Benign exact-decimal
halves (precondition met, engines agree) are reported as near_miss.

Usage: python scripts/audit_round6.py [draw_dir ...]
(defaults to all seven standing draws). Exit 1 on any true hit.
"""

from __future__ import annotations

import sys
from decimal import Decimal

import duckdb

DEFAULT_DRAWS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    "/root/repo/scaledata/sf1",
    "/root/repo/scaledata/alt",
    "/root/repo/scaledata/alt2",
    "/root/repo/scaledata/skew",
)

_TOKENS = (
    "list_filter(string_split_regex(trim(lower(text)), '\\s+'), w -> len(w) > 0)"
)

# Each family: SQL producing one column x = the complete unrounded
# population of values that feed a round(x, 6) in both engines.
FAMILIES = {
    "cosine_pairs": """
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec
                   FROM '{d}/embeddings.parquet')
        SELECT list_cosine_similarity(a.vec, b.vec) AS x
        FROM v a JOIN v b ON a.vec_id < b.vec_id
    """,
    "tfidf": f"""
        WITH tokens AS MATERIALIZED (
            SELECT doc_id, unnest({_TOKENS}) AS term
            FROM '{{d}}/documents.parquet'
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf
               FROM tokens GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id) AS df
               FROM tokens GROUP BY term),
        nd AS (SELECT count(*) AS n_docs FROM '{{d}}/documents.parquet')
        SELECT tf.tf * (ln((nd.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS x
        FROM tf JOIN df ON tf.term = df.term, nd
    """,
    "char_lm_xent": """
        WITH g AS MATERIALIZED (
            SELECT doc_id,
                   unnest(list_transform(range(1, length(text)),
                                         i -> substr(text, i, 2))) AS bg
            FROM '{d}/documents.parquet' WHERE length(text) >= 2
        ),
        c AS MATERIALIZED (
            SELECT bg, CAST(count(*) AS BIGINT) AS n_bg FROM g GROUP BY bg
        ),
        t AS (SELECT CAST(sum(n_bg) AS BIGINT) AS n_total FROM c)
        SELECT -CAST(sum(CAST(floor(
                    ln(CAST(c.n_bg AS DOUBLE) / t.n_total) * 1e6 + 0.5
                ) AS BIGINT)) AS BIGINT)
               / (count(*) * 1e6) AS x
        FROM g JOIN c USING (bg), t
        GROUP BY g.doc_id
    """,
}

# Superset prefilter, evaluated inside DuckDB so only counts + candidate
# values cross into Python (the sf1 cosine population is ~2e8 rows).
_DANGER = (
    "abs(x * 1e7 - floor(x * 1e7 + 0.5)) < 1e-6"
    " AND CAST(abs(floor(x * 1e7 + 0.5)) AS BIGINT) % 10 = 5"
)


def spark_round6(v: float) -> float:
    """Spark round(v, 6): HALF_UP at scale 6 on the shortest decimal repr
    (BigDecimal.valueOf(v).setScale(6, HALF_UP)); exact via Decimal."""
    import decimal

    return float(
        Decimal(repr(v)).quantize(Decimal("0.000001"), decimal.ROUND_HALF_UP)
    )


def duck_round6(v: float) -> float:
    """DuckDB round(v, 6), by asking DuckDB (repr round-trips the double)."""
    return duckdb.sql(f"SELECT round({v!r}::DOUBLE, 6)").fetchone()[0]


def main() -> int:
    draws = sys.argv[1:] or list(DEFAULT_DRAWS)
    any_hit = False
    for d in draws:
        for fam, sql in FAMILIES.items():
            pop = sql.format(d=d)
            n, n_pref = duckdb.sql(
                f"SELECT count(*), count(*) FILTER (WHERE {_DANGER})"
                f" FROM ({pop})"
            ).fetchone()
            hits, near = [], []
            if n_pref:
                cand = duckdb.sql(
                    f"SELECT x FROM ({pop}) WHERE {_DANGER} LIMIT 1000"
                ).fetchall()
                for (v,) in cand:
                    if spark_round6(v) != duck_round6(v):
                        hits.append(v)
                    else:
                        near.append(v)
            status = "HIT" if hits else "ok"
            print(
                f"{d} {fam}: population={n} prefilter={n_pref} "
                f"divergences={len(hits)} near_miss={len(near)} {status}"
                + (f" values={hits[:10]}" if hits else "")
                + (f" near={near[:5]}" if near else "")
            )
            any_hit = any_hit or bool(hits)
    print("AUDIT:", "HITS FOUND — convert the family to floor-grid"
          if any_hit else "zero cross-engine round(x,6) divergences — "
          "invariant holds")
    return 1 if any_hit else 0


if __name__ == "__main__":
    raise SystemExit(main())
