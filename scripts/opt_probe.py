"""Per-query optimization probe (round 11).

Times individual catalog queries the same way bench.py does (untimed
warm-up pass, then min-of-N timed passes, spark.catalog.clearCache()
between passes, count() as the action) but additionally:

* splits BUILD time (the Python call that constructs the DataFrame —
  includes any driver-side actions the iterative trainers run) from
  EXECUTE time (the count() on the returned DataFrame);
* optionally dumps ``.explain("formatted")`` to plans/r11/<q>_<suffix>.txt
  so before/after plan shapes are on the record;
* labels jobs via setJobDescription for UI-based digging.

Usage:
    python scripts/opt_probe.py q1_pricing_summary bm25_search_topk
    python scripts/opt_probe.py --explain=before minhash_near_dup_candidates
    python scripts/opt_probe.py --sf=/root/testdata/sf0.1 --n=3 core
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    n_passes = 3
    explain_suffix = None
    names: list[str] = []
    for arg in sys.argv[1:]:
        if arg.startswith("--sf="):
            sf_dir = arg.split("=", 1)[1]
        elif arg.startswith("--n="):
            n_passes = int(arg.split("=", 1)[1])
        elif arg.startswith("--explain="):
            explain_suffix = arg.split("=", 1)[1]
        else:
            names.append(arg)

    from data_algorithms_with_pyspark_spark.plans.catalog import all_queries
    from data_algorithms_with_pyspark_spark.session import get_spark

    catalog = all_queries()
    if names == ["core"]:
        import bench

        names = list(bench.CORE_QUERIES)
    unknown = [n for n in names if n not in catalog]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="opt_probe", extra_conf={"spark.driver.memory": "8g"})

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "plans", "r12")
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for name in names:
        q = catalog[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        df = q.fn(spark, sf_dir)
        df.count()
        if explain_suffix:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{explain_suffix}.txt"), "w") as f:
                f.write(plan)
        spark.catalog.clearCache()

        build_s, exec_s, total_s = [], [], []
        jvm_tracker = spark.sparkContext._jsc.sc().statusTracker()
        jobs0 = stages0 = None
        for i in range(n_passes):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            before_ids = set(jvm_tracker.getJobIdsForGroup(None))
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            t1 = time.perf_counter()
            rows = df.count()
            t2 = time.perf_counter()
            build_s.append(t1 - t0)
            exec_s.append(t2 - t1)
            total_s.append(t2 - t0)
            if i == 0:
                # deterministic structural evidence: Spark jobs + stages
                # submitted by ONE full pass of this query
                new_jids = [
                    j
                    for j in jvm_tracker.getJobIdsForGroup(None)
                    if j not in before_ids
                ]
                jobs0 = len(new_jids)
                stages0 = 0
                for jid in new_jids:
                    info = jvm_tracker.getJobInfo(jid)
                    if info.nonEmpty():
                        stages0 += len(info.get().stageIds())
            spark.catalog.clearCache()
        results[name] = {
            "min_total": round(min(total_s), 3),
            "min_build": round(min(build_s), 3),
            "min_exec": round(min(exec_s), 3),
            "all_total": [round(x, 3) for x in total_s],
            "jobs": jobs0,
            "stages": stages0,
            "rows": rows,
        }
        print(
            f"# {name}: total={min(total_s):.3f}s "
            f"(build={min(build_s):.3f} exec={min(exec_s):.3f}) "
            f"jobs={jobs0} stages={stages0} rows={rows}",
            file=sys.stderr,
        )
    print(json.dumps({"sf_dir": sf_dir, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
