"""Phase breakdown per query: DataFrame build (Python), analysis,
optimization+physical planning, and execution — separates driver-side
plan cost from cluster-side compute (guide §7.3: planning time is
driver-side, single-threaded work).

Usage: python tools/profile_phase.py query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from shards_prometheus_spark.session import get_spark
    from shards_prometheus_spark.registry import all_queries

    names = sys.argv[1:]
    spark = get_spark("profile-phase")
    queries = all_queries()

    # JIT warmup: run two structurally rich queries twice so the
    # analyzer/optimizer JIT state matches bench steady state.
    for w in ("agg_by_label", "histogram_quantile", "tpch_q3", "promql_rate_by_user"):
        for _ in range(2):
            queries[w](spark, sf_dir).count()

    print(f"{'query':32s} {'build':>7} {'analyze':>8} {'plan':>7} {'exec':>7} {'total':>7}")
    for name in names:
        fn = queries[name]
        fn(spark, sf_dir).count()  # prime (memos, codegen)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.schema  # forces analysis
            t2 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()  # optimize + plan
            t3 = time.perf_counter()
            n = df.count()
            t4 = time.perf_counter()
            rec = (t1 - t0, t2 - t1, t3 - t2, t4 - t3, t4 - t0)
            if best is None or rec[4] < best[4]:
                best = rec
        b, a, p, e, t = best
        print(
            f"{name:32s} {b:7.3f} {a:8.3f} {p:7.3f} {e:7.3f} {t:7.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
