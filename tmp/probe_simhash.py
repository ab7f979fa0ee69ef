"""Targeted probe: dedup_simhash_classes at sf1.0/sf3.0 (VERDICT r9
task #5) — primed, 7 reps per leg, medians + spreads, fresh session,
nothing else running. Decides whether the r8 BENCH_sf3 4.93x reading
is leg variance on sub-floor absolutes or a real scale term."""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")

from shards_prometheus_spark.session import get_spark
from shards_prometheus_spark.registry import all_queries
from shards_prometheus_spark.operators.tierc_common import clear_caches

spark = get_spark("probe-simhash")
fn = all_queries()["dedup_simhash_classes"]
out = {}
for sf_dir, key in [("/root/repo/tmp/sf1.0", "sf1.0"), ("/root/repo/tmp/sf3.0", "sf3.0")]:
    clear_caches(spark)
    rows = fn(spark, sf_dir).count()  # prime (builds memoized sigs)
    samples = []
    for _ in range(7):
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    out[key] = {
        "median": round(statistics.median(samples), 3),
        "spread": [round(min(samples), 3), round(max(samples), 3)],
        "samples": [round(s, 3) for s in samples],
        "rows": n,
    }
    # also one COLD sample (post cache clear) — the rehearsal's rep
    # shape includes the signature build after each family boundary
    clear_caches(spark)
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    out[key]["cold_first_rep"] = round(time.perf_counter() - t0, 3)
out["ratio_of_medians"] = round(out["sf3.0"]["median"] / out["sf1.0"]["median"], 2)
print(json.dumps(out, indent=1))
