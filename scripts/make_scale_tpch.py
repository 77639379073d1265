"""Generate LOCAL ~sf1 copies of the RELATIONAL tables for the scaling
demonstration (companion to make_scale_data.py, which covers
documents/embeddings; PLANS.md "Scaling evidence" section).

Same rules as the text generator: /root/testdata is driver-owned, so the
bigger tables live under scaledata/ (git-ignored); every table matches
the driver tables' MODEL sampled from sf0.1 (empirical label
distributions, value ranges, date windows) with freshly drawn rows and
0-based contiguous keys; all draws are seeded, so the output is
identical on every run. Foreign keys reference the scaled parents
(orders -> customer, lineitem -> orders/part/supplier), so every join in
the TPC-H family has the same selectivity structure at both scales —
wall-time ratios measure the ENGINE's scaling, not a data-shape change.
nation/region are fixed dimensions and copy through unchanged.

Usage: python scripts/make_scale_tpch.py [mult] [out_dir]
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


def _empirical(con, table: str, col: str):
    """(values, probabilities) of a label column at the base scale."""
    rows = con.execute(
        f"SELECT {col}, count(*) FROM '{BASE}/{table}.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    vals = [r[0] for r in rows]
    counts = np.array([r[1] for r in rows], dtype=np.float64)
    return vals, counts / counts.sum()


def _range(con, table: str, col: str):
    lo, hi = con.execute(
        f"SELECT min({col}), max({col}) FROM '{BASE}/{table}.parquet'"
    ).fetchone()
    return lo, hi


def _draw(rng, vals, probs, n):
    return np.array(vals, dtype=object)[rng.choice(len(vals), size=n, p=probs)]


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", "scaledata", "sf1")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    rng = np.random.default_rng(int(sys.argv[3]) if len(sys.argv) > 3 else 20260814)

    # fixed dimensions: copy through
    for t in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM '{BASE}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    def count(t):
        return con.execute(f"SELECT count(*) FROM '{BASE}/{t}.parquet'").fetchone()[0]

    # supplier
    n_sup = count("supplier") * mult
    nk_vals, nk_p = _empirical(con, "supplier", "s_nationkey")
    b_lo, b_hi = _range(con, "supplier", "s_acctbal")
    pq.write_table(
        pa.table(
            {
                "s_suppkey": np.arange(n_sup, dtype=np.int64),
                "s_name": [f"SUPP_{i}" for i in range(n_sup)],
                "s_nationkey": _draw(rng, nk_vals, nk_p, n_sup).astype(np.int32),
                "s_acctbal": np.round(rng.uniform(b_lo, b_hi, n_sup), 2),
            }
        ),
        f"{out}/supplier.parquet",
    )
    print(f"supplier: {n_sup}")

    # customer
    n_cust = count("customer") * mult
    cnk_vals, cnk_p = _empirical(con, "customer", "c_nationkey")
    seg_vals, seg_p = _empirical(con, "customer", "c_mktsegment")
    cb_lo, cb_hi = _range(con, "customer", "c_acctbal")
    pq.write_table(
        pa.table(
            {
                "c_custkey": np.arange(n_cust, dtype=np.int64),
                "c_name": [f"CUST_{i}" for i in range(n_cust)],
                "c_nationkey": _draw(rng, cnk_vals, cnk_p, n_cust).astype(np.int32),
                "c_acctbal": np.round(rng.uniform(cb_lo, cb_hi, n_cust), 2),
                "c_mktsegment": _draw(rng, seg_vals, seg_p, n_cust).astype(str),
            }
        ),
        f"{out}/customer.parquet",
    )
    print(f"customer: {n_cust}")

    # part (p_name = "word word" from the base name vocabulary)
    n_part = count("part") * mult
    name_words = [
        r[0]
        for r in con.execute(
            f"SELECT DISTINCT unnest(string_split(p_name, ' ')) FROM '{BASE}/part.parquet' ORDER BY 1"
        ).fetchall()
    ]
    brand_vals, brand_p = _empirical(con, "part", "p_brand")
    type_vals, type_p = _empirical(con, "part", "p_type")
    size_vals, size_p = _empirical(con, "part", "p_size")
    rp_lo, rp_hi = _range(con, "part", "p_retailprice")
    w1 = rng.choice(len(name_words), n_part)
    w2 = rng.choice(len(name_words), n_part)
    pq.write_table(
        pa.table(
            {
                "p_partkey": np.arange(n_part, dtype=np.int64),
                "p_name": [f"{name_words[a]} {name_words[b]}" for a, b in zip(w1, w2)],
                "p_brand": _draw(rng, brand_vals, brand_p, n_part).astype(str),
                "p_type": _draw(rng, type_vals, type_p, n_part).astype(str),
                "p_size": _draw(rng, size_vals, size_p, n_part).astype(np.int32),
                "p_retailprice": np.round(rng.uniform(rp_lo, rp_hi, n_part), 2),
            }
        ),
        f"{out}/part.parquet",
    )
    print(f"part: {n_part}")

    # orders
    n_ord = count("orders") * mult
    st_vals, st_p = _empirical(con, "orders", "o_orderstatus")
    pr_vals, pr_p = _empirical(con, "orders", "o_orderpriority")
    tp_lo, tp_hi = _range(con, "orders", "o_totalprice")
    d_lo, d_hi = _range(con, "orders", "o_orderdate")
    span = int((d_hi - d_lo).total_seconds())
    odate = np.array(d_lo, dtype="datetime64[us]") + (
        rng.integers(0, span, n_ord) * 1_000_000
    ).astype("timedelta64[us]")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": np.arange(n_ord, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, n_ord),
                "o_orderstatus": _draw(rng, st_vals, st_p, n_ord).astype(str),
                "o_totalprice": np.round(rng.uniform(tp_lo, tp_hi, n_ord), 2),
                "o_orderdate": odate,
                "o_orderpriority": _draw(rng, pr_vals, pr_p, n_ord).astype(str),
            }
        ),
        f"{out}/orders.parquet",
    )
    print(f"orders: {n_ord}")

    # lineitem
    n_li = count("lineitem") * mult
    rf_vals, rf_p = _empirical(con, "lineitem", "l_returnflag")
    ls_vals, ls_p = _empirical(con, "lineitem", "l_linestatus")
    q_lo, q_hi = _range(con, "lineitem", "l_quantity")
    ep_lo, ep_hi = _range(con, "lineitem", "l_extendedprice")
    dc_lo, dc_hi = _range(con, "lineitem", "l_discount")
    tx_lo, tx_hi = _range(con, "lineitem", "l_tax")
    sd_lo, sd_hi = _range(con, "lineitem", "l_shipdate")
    sspan = int((sd_hi - sd_lo).total_seconds())
    sdate = np.array(sd_lo, dtype="datetime64[us]") + (
        rng.integers(0, sspan, n_li) * 1_000_000
    ).astype("timedelta64[us]")
    pq.write_table(
        pa.table(
            {
                "l_orderkey": rng.integers(0, n_ord, n_li),
                "l_partkey": rng.integers(0, n_part, n_li),
                "l_suppkey": rng.integers(0, n_sup, n_li),
                "l_linenumber": rng.integers(1, 8, n_li).astype(np.int32),
                "l_quantity": np.floor(rng.uniform(q_lo, q_hi + 1, n_li)),
                "l_extendedprice": np.round(rng.uniform(ep_lo, ep_hi, n_li), 2),
                "l_discount": np.round(rng.uniform(dc_lo, dc_hi, n_li), 2),
                "l_tax": np.round(rng.uniform(tx_lo, tx_hi, n_li), 2),
                "l_returnflag": _draw(rng, rf_vals, rf_p, n_li).astype(str),
                "l_linestatus": _draw(rng, ls_vals, ls_p, n_li).astype(str),
                "l_shipdate": sdate,
            }
        ),
        f"{out}/lineitem.parquet",
    )
    print(f"lineitem: {n_li}")


if __name__ == "__main__":
    main()
