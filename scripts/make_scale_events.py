"""Generate a LOCAL ~sf1 copy of the EVENTS table for the scaling
demonstration (companion to make_scale_data.py / make_scale_tpch.py).

Model sampled from sf0.1: event_type and props keep their empirical
distributions, value its range, ts uniform over the same one-month
window; users scale x10 with uniform assignment so per-user event
volume (the group size behind every sessionization / window / journey
query) stays constant while total volume grows — the ratio then
measures the engine, not larger per-user groups. Seeded and
deterministic. ts is written as TIMESTAMP micros, the encoding
sources/readers.load_table normalizes either way.

Usage: python scripts/make_scale_events.py [mult] [out_dir]
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
    rng = np.random.default_rng(int(sys.argv[3]) if len(sys.argv) > 3 else 20260814)

    n_base, n_users = con.execute(
        f"SELECT count(*), count(DISTINCT user_id) FROM '{BASE}/events.parquet'"
    ).fetchone()
    n = n_base * mult

    def emp(col):
        rows = con.execute(
            f"SELECT {col}, count(*) FROM '{BASE}/events.parquet' GROUP BY 1 ORDER BY 1"
        ).fetchall()
        vals = [r[0] for r in rows]
        p = np.array([r[1] for r in rows], dtype=np.float64)
        return vals, p / p.sum()

    et_vals, et_p = emp("event_type")
    pr_vals, pr_p = emp("props")
    v_lo, v_hi = con.execute(
        f"SELECT min(value), max(value) FROM '{BASE}/events.parquet'"
    ).fetchone()
    t_lo, t_hi = con.execute(
        f"SELECT min(ts), max(ts) FROM '{BASE}/events.parquet'"
    ).fetchone()
    span_us = int((t_hi - t_lo).total_seconds() * 1_000_000)
    ts = np.array(t_lo, dtype="datetime64[us]") + rng.integers(
        0, span_us, n
    ).astype("timedelta64[us]")

    def draw(vals, p):
        return np.array(vals, dtype=object)[rng.choice(len(vals), size=n, p=p)]

    pq.write_table(
        pa.table(
            {
                "event_id": np.arange(n, dtype=np.int64),
                "ts": ts,
                "user_id": rng.integers(0, n_users * mult, n),
                "event_type": draw(et_vals, et_p).astype(str),
                "value": np.round(rng.uniform(v_lo, v_hi, n), 4),
                "props": draw(pr_vals, pr_p).astype(str),
            }
        ),
        f"{out}/events.parquet",
    )
    print(f"events: {n} rows, {n_users * mult} users")


if __name__ == "__main__":
    main()
