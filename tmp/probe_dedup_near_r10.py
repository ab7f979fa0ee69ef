"""Isolated two-leg probe for the r10 BENCH_sf1 dedup_near flag:
fresh JVM, ONLY dedup_near, sf0.1 then tmp/sf1.0, prime + 3 timed
reps each — the §7.2 adjudication method (is the in-suite median a
property of the operator or of suite-level storage pressure?)."""
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from shards_prometheus_spark.registry import all_queries
from shards_prometheus_spark.session import get_spark

spark = get_spark("probe-dedup-near-r10")
fn = all_queries()["dedup_near"]
out = {}
for sf_dir, key in (
    ("/root/testdata/sf0.1", "sf0.1"),
    ("/root/repo/tmp/sf1.0", "sf1.0"),
):
    fn(spark, sf_dir).count()  # prime (cache build)
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        samples.append(round(time.perf_counter() - t0, 3))
    out[key] = {
        "median": round(statistics.median(samples), 3),
        "samples": samples,
        "rows": n,
    }
out["ratio"] = round(out["sf1.0"]["median"] / out["sf0.1"]["median"], 2)
with open("/root/repo/tmp/probe_dedup_near_r10.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))
