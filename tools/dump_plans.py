"""Dump `.explain("formatted")` for named queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> query [query ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt for each
(round defaults to r16).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from shards_prometheus_spark.plans import formatted_plan
    from shards_prometheus_spark.registry import all_queries
    from shards_prometheus_spark.session import get_spark

    rnd = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
    spark = get_spark("dump-plans")
    queries = all_queries()
    os.makedirs(f"plans/{rnd}", exist_ok=True)
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = formatted_plan(df)
        path = f"plans/{rnd}/{name}_{suffix}.txt"
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
