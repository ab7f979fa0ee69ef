"""r11 probe: bench-shaped timings for the rule/grid family at sf0.1.

Mirrors bench.py: sf0.001 warmup of the same shapes (JIT/codegen),
then 1 untimed + 3 timed reps per query at sf0.1; reports medians.
"""
import json, os, statistics, sys, time
sys.path.insert(0, "/root/repo")
from shards_prometheus_spark.session import get_spark
from shards_prometheus_spark.registry import all_queries

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"
spark = get_spark("probe_rules", master="local[32]", shuffle_partitions=32)
qs = all_queries()
names = ["recording_rules", "rules_chained", "alert_rules",
         "alert_rules_for", "alert_rules_keep_firing"]
for n in names:          # JIT warmup pass, tiny SF
    qs[n](spark, WARM).count()
out = {}
for n in names:
    fn = qs[n]
    fn(spark, SF).count()  # warm at measured SF
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, SF).count()
        ts.append(time.perf_counter() - t0)
    out[n] = round(statistics.median(ts), 3)
out["_sum"] = round(sum(v for k, v in out.items() if not k.startswith("_")), 3)
print(json.dumps(out))
