"""Round-11 sf10 panel (VERDICT r10 #5): engine-side wall AND measured
state-store telemetry for the STATEFUL streaming lanes at the 2.5 GB
sf10 draw — sessions-append, restart-recovery, and the CDC sink. These
lanes' scale claim is "state is bounded by the watermark / the keyed
aggregate, never by the stream length"; this panel turns that from a
design argument into recorded numbers via
plans/streaming_parity.STATE_METRICS (max numRowsTotal /
memoryUsedBytes / numRowsDroppedByWatermark over each run's progress
events). Method matches the r9/r10 panels: wall is engine-side only
(fn(spark, sf_dir).count()). Usage: python scripts/sf10_panel_r11.py
[queries...]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from data_algorithms_with_pyspark_spark.plans import streaming_parity
from data_algorithms_with_pyspark_spark.plans.catalog import get_query
from data_algorithms_with_pyspark_spark.session import get_spark

DEFAULT = (
    "streaming_append_sessions_parity",
    "streaming_restart_recovery_parity",
    "streaming_cdc_sink_parity",
)


def main() -> None:
    names = sys.argv[1:] or list(DEFAULT)
    spark = get_spark(
        app_name="sf10-panel-r11",
        extra_conf={"spark.driver.memory": "48g"},
    )
    sf_dir = "scaledata/sf10"
    for name in names:
        before = set(streaming_parity.STATE_METRICS)
        q = get_query(name)
        t0 = time.perf_counter()
        n = q.fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        print(f"PANEL {name}: {wall:.1f}s {n} rows", flush=True)
        for key in sorted(set(streaming_parity.STATE_METRICS) - before):
            print(
                f"  STATE {key}: {streaming_parity.STATE_METRICS[key]}",
                flush=True,
            )
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
