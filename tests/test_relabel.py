"""Scrape-time relabeling (operators/relabel.py).

Upstream relabel_config semantics — replace/keep/drop/keepequal/
dropequal/lowercase/uppercase/hashmod/labelmap/labeldrop/labelkeep —
compiled to pure Catalyst column expressions, applied to the
canonical (metric, labels MAP) shape and to the scrape loop between
classify_lines and the registry (the r11 VERDICT's #1 ask).
"""

from __future__ import annotations

import time

from tests.conftest import SF_SMOKE


def _rel(spark, rows, rules):
    from shards_prometheus_spark.operators.relabel import apply_relabel

    df = spark.createDataFrame(
        [(m, dict(lbls)) for m, lbls in rows],
        "metric string, labels map<string,string>",
    )
    return [
        (r["metric"], dict(r["labels"]))
        for r in apply_relabel(df, rules).collect()
    ]


def test_replace_sets_rewrites_and_removes(spark):
    rows = [("m", {"user": "42", "zone": "eu-west-1"})]
    # derive a label with group refs (both $1 and ${1} forms)
    got = _rel(
        spark,
        rows,
        [
            {
                "action": "replace",
                "source_labels": ["zone"],
                "regex": r"([a-z]+)-([a-z]+)-(\d+)",
                "target_label": "region",
                "replacement": "${1}_${2}",
            }
        ],
    )
    assert got == [("m", {"user": "42", "zone": "eu-west-1", "region": "eu_west"})]
    # no match → no-op (target untouched)
    got = _rel(
        spark,
        rows,
        [
            {
                "action": "replace",
                "source_labels": ["zone"],
                "regex": r"us-.*",
                "target_label": "region",
                "replacement": "x",
            }
        ],
    )
    assert got == [("m", {"user": "42", "zone": "eu-west-1"})]
    # empty expanded value → label REMOVED
    got = _rel(
        spark,
        rows,
        [
            {
                "action": "replace",
                "source_labels": ["user"],
                "regex": r"(.*)",
                "target_label": "zone",
                "replacement": "",
            }
        ],
    )
    assert got == [("m", {"user": "42"})]
    # __name__ as source AND target: rename the family
    got = _rel(
        spark,
        rows,
        [
            {
                "action": "replace",
                "source_labels": ["__name__", "user"],
                "regex": r"(.+);(\d+)",
                "target_label": "__name__",
                "replacement": "$1_u$2",
            }
        ],
    )
    assert got == [("m_u42", {"user": "42", "zone": "eu-west-1"})]


def test_keep_drop_and_equals(spark):
    rows = [
        ("click", {"user": "1"}),
        ("view", {"user": "2"}),
        ("tmp_debug", {"user": "3"}),
    ]
    keep = [
        {"action": "keep", "source_labels": ["__name__"], "regex": "click|view"}
    ]
    assert {m for m, _ in _rel(spark, rows, keep)} == {"click", "view"}
    drop = [
        {"action": "drop", "source_labels": ["__name__"], "regex": "tmp_.*"}
    ]
    assert {m for m, _ in _rel(spark, rows, drop)} == {"click", "view"}
    # keepequal / dropequal compare concat to the target label's value
    rows2 = [("m", {"a": "x", "b": "x"}), ("m", {"a": "x", "b": "y"})]
    ke = [
        {"action": "keepequal", "source_labels": ["a"], "target_label": "b"}
    ]
    assert _rel(spark, rows2, ke) == [("m", {"a": "x", "b": "x"})]
    de = [
        {"action": "dropequal", "source_labels": ["a"], "target_label": "b"}
    ]
    assert _rel(spark, rows2, de) == [("m", {"a": "x", "b": "y"})]


def test_case_hashmod_labelmap_labeldrop_labelkeep(spark):
    rows = [("m", {"user": "Alice", "sh_zone": "EU"})]
    lc = [
        {
            "action": "lowercase",
            "source_labels": ["user"],
            "target_label": "user",
        },
        {
            "action": "uppercase",
            "source_labels": ["user"],
            "target_label": "loud",
        },
    ]
    assert _rel(spark, rows, lc) == [
        ("m", {"user": "alice", "sh_zone": "EU", "loud": "ALICE"})
    ]

    # hashmod: upstream's md5[8:16] big-endian % modulus, exactly
    import hashlib
    import struct

    want = str(
        struct.unpack(">Q", hashlib.md5(b"Alice").digest()[8:])[0] % 13
    )
    hm = [
        {
            "action": "hashmod",
            "source_labels": ["user"],
            "modulus": 13,
            "target_label": "bucket",
        }
    ]
    (got,) = _rel(spark, rows, hm)
    assert got[1]["bucket"] == want

    lm = [{"action": "labelmap", "regex": "sh_(.*)", "replacement": "$1"}]
    assert _rel(spark, rows, lm) == [
        ("m", {"user": "Alice", "sh_zone": "EU", "zone": "EU"})
    ]
    ld = [{"action": "labeldrop", "regex": "sh_.*"}]
    assert _rel(spark, rows, ld) == [("m", {"user": "Alice"})]
    lk = [{"action": "labelkeep", "regex": "user"}]
    assert _rel(spark, rows, lk) == [("m", {"user": "Alice"})]


def test_rules_apply_sequentially_and_validate(spark):
    import pytest

    from shards_prometheus_spark.operators.relabel import (
        RelabelRule,
        parse_relabel_configs,
    )

    # a later rule sees the earlier rewrite
    rows = [("m", {"user": "42"})]
    chain = [
        {
            "action": "replace",
            "source_labels": ["user"],
            "regex": r"(\d+)",
            "target_label": "derived",
            "replacement": "u$1",
        },
        {"action": "keep", "source_labels": ["derived"], "regex": "u42"},
    ]
    assert len(_rel(spark, rows, chain)) == 1
    chain[1]["regex"] = "u43"
    assert _rel(spark, rows, chain) == []

    with pytest.raises(ValueError, match="unknown relabel action"):
        RelabelRule(action="explode")
    with pytest.raises(ValueError, match="modulus"):
        RelabelRule(action="hashmod", target_label="b")
    with pytest.raises(ValueError, match="target_label"):
        RelabelRule(action="replace")
    # defaults: replace, separator ';', regex (.*), replacement $1
    (r,) = parse_relabel_configs(
        [{"source_labels": ["a"], "target_label": "b"}]
    )
    assert (r.action, r.separator, r.regex, r.replacement) == (
        "replace",
        ";",
        "(.*)",
        "$1",
    )


def test_relabel_chain_plan_is_shuffle_free(spark):
    """The compiled chain must be a scan-side projection + filter —
    no Exchange before the query's own aggregation, no Python UDFs
    anywhere."""
    from shards_prometheus_spark.model import samples_multi
    from shards_prometheus_spark.operators.relabel import (
        DEMO_RULES,
        apply_relabel,
    )

    plan = apply_relabel(
        samples_multi(spark, SF_SMOKE), DEMO_RULES
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scrape_loop_with_relabeling_across_micro_batches(spark):
    """The r11 VERDICT's Done-bar: a scrape LOOP (real micro-batches)
    with metric_relabel_configs where a `drop` rule removes a family
    and a `replace` rewrites a label — the relabeled registry must
    show the rewritten label, no dropped-family rows, and the
    untouched families intact."""
    from pyspark.sql import functions as F

    from shards_prometheus_spark.sources import MetricsExposer
    from shards_prometheus_spark.sources.scraper import (
        scrape_stream,
        scraped_samples,
    )

    relabel = [
        # drop the gauge family entirely
        {
            "action": "drop",
            "source_labels": ["__name__"],
            "regex": "error",
        },
        # rewrite the user label: prefix it
        {
            "action": "replace",
            "source_labels": ["user"],
            "regex": "(.+)",
            "target_label": "user",
            "replacement": "u-$1",
        },
    ]
    exposer = MetricsExposer(spark, SF_SMOKE).start()
    query = None
    try:
        url = f"http://{exposer.host}:{exposer.port}/metrics"
        lines = scrape_stream(spark, url, max_ticks=2)
        scraped = scraped_samples(lines, metric_relabel_configs=relabel)
        query = (
            scraped.writeStream.outputMode("append")
            .format("memory")
            .queryName("relabel_scrape_t")
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            n = (
                spark.table("relabel_scrape_t")
                .select("scrape_idx")
                .distinct()
                .count()
            )
            if n >= 2:
                break
            time.sleep(0.5)
        else:
            raise AssertionError("scrape loop never reached 2 ticks")
        query.stop()
        query = None

        log = spark.table("relabel_scrape_t")
        metrics = {r["metric"] for r in log.select("metric").distinct().collect()}
        # drop rule removed the family on every tick
        assert "error" not in metrics
        assert "click" in metrics  # other families survived
        # replace rewrote the label on every surviving row
        users = [
            r["label_user"]
            for r in log.select("label_user").distinct().collect()
            if r["label_user"] is not None
        ]
        assert users and all(u.startswith("u-") for u in users)
        # the rewritten map rides along for labels beyond the
        # flattened pair
        assert "labels" in log.columns
        inst = (
            log.select(
                F.element_at("labels", F.lit("instance")).alias("i")
            )
            .distinct()
            .collect()
        )
        assert {r["i"] for r in inst} == {url}
    finally:
        if query is not None:
            query.stop()
        exposer.stop()
