"""Attestation-staleness report: for every catalog query, the most
recent round whose CORRECTNESS_r*.json recorded it green — the input
each round's _SAMPLE_PRIORITY rotation is computed from (VERDICT r5 #1's
"nothing >2 rounds stale" invariant).

Usage: python scripts/staleness.py
Prints one block per last-green round (oldest first) plus never-attested
queries; paste the oldest block(s) into the next rotation.
"""

from __future__ import annotations

import glob
import json
import sys
from collections import defaultdict

sys.path.insert(0, ".")

from data_algorithms_with_pyspark_spark.plans.catalog import (  # noqa: E402
    all_queries,
)


def latest_green() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(path.split("_r")[1].split(".")[0])
        with open(path) as f:
            data = json.load(f)
        for name, rec in data.items():
            green = rec.get("hash_match") or (
                rec.get("err") == "no_oracle"
                and rec.get("spark_rows") is not None
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def main() -> None:
    latest = latest_green()
    names = list(all_queries())
    by_round: dict[int, list[str]] = defaultdict(list)
    never = []
    for n in names:
        if n in latest:
            by_round[latest[n]].append(n)
        else:
            never.append(n)
    print(f"catalog: {len(names)} queries; driver-attested: {len(names) - len(never)}")
    if never:
        print(f"\n-- NEVER driver-attested ({len(never)}):")
        for n in never:
            print(f'    "{n}",')
    for rnd in sorted(by_round):
        block = sorted(by_round[rnd])
        print(f"\n-- last green r{rnd} ({len(block)}):")
        for n in block:
            print(f'    "{n}",')


if __name__ == "__main__":
    main()
