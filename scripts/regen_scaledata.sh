#!/usr/bin/env bash
# Regenerate the git-ignored scaledata/ draws after an environment reset.
# All generators are seeded, so every draw is bit-identical across runs:
#   alt2 — fresh-seed sf0.1-sized independent draw (seed 31415)
#   skew — Zipf-skewed sf0.1-sized draw (seeded internally)
#   sf1  — ~sf1 (10x sf0.1) all tables (default seeds)
#   sf10 — ~sf10 (100x sf0.1) all tables (default seeds); ~2.5 GB
# (The historic alt/alt-1313 draws used the same scripts with seeds 777
# and 1313 — regenerate only if re-attesting those PLANS.md records.)
set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/make_scale_data.py   1 scaledata/alt2 31415
python scripts/make_scale_tpch.py   1 scaledata/alt2 31415
python scripts/make_scale_events.py 1 scaledata/alt2 31415

python scripts/make_skew_data.py

python scripts/make_scale_data.py   10 scaledata/sf1
python scripts/make_scale_tpch.py   10 scaledata/sf1
python scripts/make_scale_events.py 10 scaledata/sf1

if [[ "${WITH_SF10:-0}" == "1" ]]; then
  python scripts/make_scale_data.py   100 scaledata/sf10
  python scripts/make_scale_tpch.py   100 scaledata/sf10
  python scripts/make_scale_events.py 100 scaledata/sf10
fi
echo "scaledata draws regenerated"
