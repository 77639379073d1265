"""Round-10 sf10 panel extension (VERDICT r9 #6): engine-side wall for
the recall-audit family and one append-mode streaming parity row at the
2.5 GB sf10 draw — the lanes the r9 21-query panel did not cover. Wall
times are engine-side only (fn(spark, sf_dir).count()), matching the r9
panel's method. Usage: python scripts/sf10_panel_r10.py [queries...]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from data_algorithms_with_pyspark_spark.plans.catalog import get_query
from data_algorithms_with_pyspark_spark.session import get_spark

DEFAULT = (
    "minhash_lsh_recall_report",
    "sq8_recall_report",
    "pq_recall_report",
    "pq_trained_recall_report",
    "ivf_trained_recall_report",
    "ivf_pq_recall_report",
    "ivf_nprobe_recall_curve",
    "streaming_append_hourly_parity",
)


def main() -> None:
    names = sys.argv[1:] or list(DEFAULT)
    spark = get_spark(
        app_name="sf10-panel-r10",
        extra_conf={"spark.driver.memory": "48g"},
    )
    sf_dir = "scaledata/sf10"
    for name in names:
        q = get_query(name)
        t0 = time.perf_counter()
        n = q.fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        print(f"PANEL {name}: {wall:.1f}s {n} rows", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
