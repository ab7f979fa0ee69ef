"""Physical-plan inspection (the 100 TB discipline, mechanized).

The reference needs no optimizer (SURVEY.md §4); our engine leans on
Catalyst, and these helpers assert that the *right* physical plans come
out: filters reach the parquet scan, projections prune columns,
dimension joins broadcast, partitioned layouts prune partitions. Used
by tests/test_plans.py so plan regressions fail CI, not production.
"""

from shards_prometheus_spark.plans.checks import (  # noqa: F401
    assert_broadcast_join,
    assert_no_cartesian_product,
    assert_partition_filters,
    assert_pushed_filters,
    assert_read_schema_pruned,
    count_single_partition_exchanges,
    formatted_plan,
)
from shards_prometheus_spark.plans.skew import salted_join  # noqa: F401
