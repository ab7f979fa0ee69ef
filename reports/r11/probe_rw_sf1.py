"""r11 probe: remote_write_roundtrip at sf0.1 vs sf1.0 (10x data).

Median of 3 after 1 warm rep per leg, fresh JVM — the §7.1 rehearsal
protocol for the new distributed encode+decode operator.
"""
import json, statistics, sys, time
sys.path.insert(0, "/root/repo")
from shards_prometheus_spark.session import get_spark
from shards_prometheus_spark.sources.remote_write import remote_write_roundtrip

spark = get_spark("probe_rw", master="local[32]", shuffle_partitions=32)
out = {}
rows = {}
for name, d in (("sf0.1", "/root/testdata/sf0.1"), ("sf1.0", "/root/repo/tmp/sf1.0")):
    rows[name] = remote_write_roundtrip(spark, d).count()  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        remote_write_roundtrip(spark, d).count()
        ts.append(time.perf_counter() - t0)
    out[name] = round(statistics.median(ts), 3)
out["ratio"] = round(out["sf1.0"] / out["sf0.1"], 2)
out["rows"] = rows
print(json.dumps(out))
