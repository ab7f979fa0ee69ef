"""Assertions over `.explain("formatted")` output.

Each helper inspects the physical plan string — the same artifact a
human reads while tuning — so the properties that make queries viable
at 100 TB (pushdown, pruning, broadcast, no accidental cartesians) are
pinned by tests instead of folklore.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def count_single_partition_exchanges(df: DataFrame) -> int:
    """Number of Exchange SinglePartition nodes in the physical plan.

    In ``explain("formatted")`` output an exchange's distribution is
    printed on its own ``Arguments:`` line, never inline as
    "Exchange SinglePartition" — counting the inline form silently
    reports 0 for every plan (the round-1 audit bug). A global
    (unpartitioned) window that survives optimization shows up here;
    row_number ≤ k forms don't, because Catalyst rewrites them to
    TakeOrderedAndProject.
    """
    return formatted_plan(df).count("Arguments: SinglePartition")


def assert_pushed_filters(df: DataFrame, *fragments: str) -> str:
    """The scan node must carry PushedFilters including `fragments`."""
    plan = formatted_plan(df)
    m = re.search(r"PushedFilters: \[(?P<f>[^\]]*)\]", plan)
    assert m, f"no PushedFilters in plan:\n{plan}"
    pushed = m.group("f")
    for frag in fragments:
        assert frag in pushed, (
            f"filter {frag!r} not pushed to scan (got: {pushed})\n{plan}"
        )
    return plan


def assert_read_schema_pruned(
    df: DataFrame, required: set[str], banned: set[str]
) -> str:
    """The parquet ReadSchema must project `required` and NOT `banned`
    (column pruning — a scan reading payload columns it doesn't need
    is a 100 TB bug even when results are correct)."""
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<(?P<s>[^>]*)>", plan)
    assert m, f"no ReadSchema in plan:\n{plan}"
    cols = {c.split(":")[0].strip() for c in m.group("s").split(",") if c}
    missing = required - cols
    leaked = banned & cols
    assert not missing, f"columns {missing} missing from scan: {cols}\n{plan}"
    assert not leaked, f"columns {leaked} read but unused: {cols}\n{plan}"
    return plan


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> str:
    """At least `min_count` BroadcastHashJoin nodes (dimension joins
    must not shuffle the fact side)."""
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= min_count, f"expected ≥{min_count} broadcast joins, saw {n}\n{plan}"
    return plan


def assert_no_cartesian_product(df: DataFrame) -> str:
    """No CartesianProduct nodes — broadcast nested loops against a
    literal-sized side are fine, full cartesians never are."""
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan}"
    return plan


def assert_partition_filters(df: DataFrame, fragment: str) -> str:
    """The scan must prune partitions on `fragment` (PartitionFilters)."""
    plan = formatted_plan(df)
    m = re.search(r"PartitionFilters: \[(?P<f>[^\]]*)\]", plan)
    assert m, f"no PartitionFilters in plan:\n{plan}"
    assert fragment in m.group("f"), (
        f"{fragment!r} not in PartitionFilters (got: {m.group('f')})\n{plan}"
    )
    return plan
