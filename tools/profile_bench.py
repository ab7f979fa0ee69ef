"""Per-query profiler: steady-state wall time + Spark job/stage/task
counts (guide §1 'measure first' — the job count is the fixed-floor
proxy: on this box each Spark job costs ~0.10-0.14 s of scheduling
floor, so `jobs × floor` vs wall time separates floor-dominated
queries from compute-bound ones).

Usage:
    python tools/profile_bench.py [query ...]      # default: bench set

Mirrors bench.py's protocol (prime once untimed, then time; Tier C
memo cache cleared at family boundaries) so the numbers are the same
steady state BENCH_r*.json reports.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import FAMILIES
    from shards_prometheus_spark.session import get_spark
    from shards_prometheus_spark.registry import all_queries
    from shards_prometheus_spark.operators.tierc_common import clear_caches

    only = set(sys.argv[1:])
    spark = get_spark("profile")
    queries = all_queries()
    sc = spark.sparkContext
    st = sc.statusTracker()

    # warm codegen/shuffle machinery like bench.py
    for wname in ("counter_sum", "histogram_quantile", "tpch_q3"):
        queries[wname](spark, "/root/testdata/sf0.001").count()
    clear_caches(spark)
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    out = []
    for family, names in FAMILIES:
        ran_any = False
        for name in names:
            if only and name not in only:
                continue
            fn = queries.get(name)
            if fn is None:
                continue
            ran_any = True
            # prime (untimed, separate job group)
            sc.setJobGroup(f"prime:{name}", f"prime:{name}")
            fn(spark, sf_dir).count()
            rec = {"query": name, "reps": []}
            for rep in range(2):
                gid = f"q:{name}:{rep}"
                sc.setJobGroup(gid, gid)
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count()
                wall = time.perf_counter() - t0
                job_ids = st.getJobIdsForGroup(gid)
                n_stages = 0
                n_tasks = 0
                for jid in job_ids:
                    ji = st.getJobInfo(jid)
                    if ji is None:
                        continue
                    for sid in ji.stageIds:
                        si = st.getStageInfo(sid)
                        if si is None:
                            continue
                        # skipped (reused-exchange) stages complete 0 tasks
                        if si.numCompletedTasks == 0 and si.numTasks > 0:
                            continue
                        n_stages += 1
                        n_tasks += si.numCompletedTasks
                rec["reps"].append(
                    {
                        "wall": round(wall, 4),
                        "jobs": len(job_ids),
                        "stages": n_stages,
                        "tasks": n_tasks,
                        "rows": n,
                    }
                )
            out.append(rec)
            r = min(rec["reps"], key=lambda x: x["wall"])
            print(
                f"{name:32s} wall={r['wall']:7.3f}s jobs={r['jobs']:3d} "
                f"stages={r['stages']:3d} tasks={r['tasks']:5d} rows={r['rows']}",
                flush=True,
            )
        if ran_any:
            clear_caches(spark)
    path = os.environ.get("SPARK_GRAFT_PROFILE_OUT", "tmp/profile_bench.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
