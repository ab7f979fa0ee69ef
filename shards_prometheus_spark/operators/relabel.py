"""Scrape-time relabeling — `relabel_configs` / `metric_relabel_configs`.

The most-used knob in real Prometheus fleets: a rule list rewrites a
sample's label set (the reference's generalized Label/Value surface,
prometheus.cpp:105-110) between the scrape and the registry —
keep/drop a series, rewrite or derive a label, bucket by hash. The
public semantics (prometheus.io/docs relabel_config; relabel.go):

- each rule concatenates its ``source_labels`` values with
  ``separator`` (missing label ⇒ empty string; ``__name__`` reads the
  metric name), tests the result against the FULLY-ANCHORED ``regex``,
  and then acts:

  ========== ===========================================================
  replace     regex matched ⇒ ``target_label`` := expanded
              ``replacement`` (``$1``/``${1}`` group refs; expansion
              also applies to ``target_label`` itself); empty expanded
              value ⇒ the label is REMOVED; no match ⇒ no-op
  keep        drop the ROW unless regex matches
  drop        drop the ROW if regex matches
  keepequal   keep the row iff concat == ``target_label``'s value
  dropequal   drop the row iff concat == ``target_label``'s value
  lowercase / uppercase
              ``target_label`` := lower/upper(concat)
  hashmod     ``target_label`` := str(uint64(md5(concat)[8:16]
              big-endian) % ``modulus``) — upstream's exact hash
  labelmap    every label NAME matching regex is COPIED to the
              expanded ``replacement`` name (value unchanged,
              original kept)
  labeldrop / labelkeep
              remove labels whose NAME matches / doesn't match regex
              (acts on the label MAP; the metric name is addressed
              via ``__name__`` in replace/keep/drop, not here)
  ========== ===========================================================

- rules apply SEQUENTIALLY: later rules see earlier rewrites.

Spark-first compilation: the whole chain compiles to pure Catalyst
column expressions — ``rlike``/``regexp_replace`` for the regex work
(anchored exactly like the matcher path, labelset.apply_matchers) and
map higher-order functions (``map_filter`` / ``map_entries`` /
``map_concat`` / ``aggregate``) for the label-set rewrites. Zero
shuffles, zero UDFs: at 100 TB a relabel chain is a projection fused
into the scan's codegen stage, and keep/drop rules become plan
FILTERS that prune before anything downstream shuffles.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_ACTIONS = {
    "replace",
    "keep",
    "drop",
    "keepequal",
    "dropequal",
    "lowercase",
    "uppercase",
    "hashmod",
    "labelmap",
    "labeldrop",
    "labelkeep",
}

#: upstream defaults (relabel.DefaultRelabelConfig)
_DEF_SEPARATOR = ";"
_DEF_REGEX = "(.*)"
_DEF_REPLACEMENT = "$1"


@dataclass(frozen=True)
class RelabelRule:
    """One normalized relabel rule (upstream's relabel.Config)."""

    action: str = "replace"
    source_labels: tuple = ()
    separator: str = _DEF_SEPARATOR
    regex: str = _DEF_REGEX
    target_label: str = ""
    replacement: str = _DEF_REPLACEMENT
    modulus: int = 0

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise ValueError(f"unknown relabel action: {self.action}")
        if self.action == "hashmod" and self.modulus <= 0:
            raise ValueError("hashmod needs a positive modulus")
        needs_target = {
            "replace",
            "keepequal",
            "dropequal",
            "lowercase",
            "uppercase",
            "hashmod",
        }
        if self.action in needs_target and not self.target_label:
            raise ValueError(
                f"action {self.action} requires target_label"
            )


def parse_relabel_configs(cfgs: "list[dict] | None") -> list[RelabelRule]:
    """YAML rule dicts (the `relabel_configs:` list of a
    prometheus.yml scrape config) → normalized rules, upstream
    defaults applied."""
    rules = []
    for c in cfgs or []:
        rules.append(
            RelabelRule(
                action=str(c.get("action", "replace")),
                source_labels=tuple(c.get("source_labels") or ()),
                separator=str(c.get("separator", _DEF_SEPARATOR)),
                regex=str(c.get("regex", _DEF_REGEX)),
                target_label=str(c.get("target_label", "")),
                replacement=str(c.get("replacement", _DEF_REPLACEMENT)),
                modulus=int(c.get("modulus") or 0),
            )
        )
    return rules


def _anchored(regex: str) -> str:
    """Full anchoring, matcher-convention (labelset.apply_matchers):
    `(?d)` keeps Java's `.`/`$` RE2-compatible on \\r-bearing values,
    `\\z` is the hard end anchor."""
    return f"(?d)^(?:{regex})\\z"


def _template(t: str) -> str:
    """RE2 `${1}` group refs → Java `$1` (Java reads `${…}` as a
    NAMED-group ref and rejects digits); literal `$$` → `$`."""
    return _re.sub(r"\$\{(\d+)\}", r"$\1", t).replace("$$", "\\$")


def _expand(concat: Column, regex: str, template: str) -> Column:
    """RE2 Expand of `template` against the (anchored, single) match
    of `regex` over the concatenated source values."""
    return F.regexp_replace(concat, _anchored(regex), _template(template))


def _concat_sources(metric: Column, labels: Column, rule: RelabelRule) -> Column:
    """separator-join of the source label values; `__name__` reads the
    metric column, a missing label reads as the empty string."""
    parts = [
        metric
        if s == "__name__"
        else F.coalesce(F.element_at(labels, F.lit(s)), F.lit(""))
        for s in rule.source_labels
    ]
    if not parts:
        return F.lit("")
    return F.concat_ws(rule.separator, *parts)


def _map_set(labels: Column, key: Column, value: Column) -> Column:
    """labels with `key` set to `value` (last-wins), or REMOVED when
    `value` is the empty string — upstream's replace contract."""
    cleared = F.map_filter(labels, lambda k, _v: k != key)
    return F.when(value == "", cleared).otherwise(
        F.map_concat(cleared, F.map_from_arrays(F.array(key), F.array(value)))
    )


def _hashmod(concat: Column, modulus: int) -> Column:
    """Upstream's exact hashmod: big-endian uint64 of md5 bytes 8..15,
    mod `modulus` — hex chars 17..32 of the digest, parsed unsigned
    (conv base-16→10), modded in DECIMAL(20,0) so the full uint64
    range survives."""
    u64 = F.conv(F.substring(F.md5(concat), 17, 16), 16, 10).cast(
        "decimal(20,0)"
    )
    return F.pmod(u64, F.lit(modulus)).cast("long").cast("string")


def apply_relabel(
    df: DataFrame,
    rules: "list[RelabelRule] | list[dict]",
    metric_col: str = "metric",
    labels_col: str = "labels",
) -> DataFrame:
    """Apply a relabel chain to a (metric, labels MAP) relation.

    Each rule compiles to one projection (and, for keep/drop rules,
    one filter) over the previous rule's output — the chain stays a
    single codegen stage; Catalyst collapses the projections and
    pushes the keep/drop filters toward the scan."""
    rules = [
        r if isinstance(r, RelabelRule) else parse_relabel_configs([r])[0]
        for r in rules
    ]
    metric = F.col(metric_col)
    labels = F.col(labels_col)
    for rule in rules:
        concat = _concat_sources(metric, labels, rule)
        anchored = _anchored(rule.regex)
        act = rule.action
        if act == "keep":
            df = df.filter(concat.rlike(anchored))
            continue
        if act == "drop":
            df = df.filter(~concat.rlike(anchored))
            continue
        if act in ("keepequal", "dropequal"):
            tgt = F.coalesce(
                F.element_at(labels, F.lit(rule.target_label)), F.lit("")
            )
            cond = concat == tgt
            df = df.filter(cond if act == "keepequal" else ~cond)
            continue

        if act == "replace":
            matched = concat.rlike(anchored)
            key = _expand(concat, rule.regex, rule.target_label)
            val = _expand(concat, rule.regex, rule.replacement)
            if rule.target_label == "__name__":
                new_metric = F.when(matched, val).otherwise(metric)
                new_labels = labels
            else:
                new_metric = metric
                new_labels = F.when(
                    matched & (key != ""), _map_set(labels, key, val)
                ).otherwise(labels)
        elif act in ("lowercase", "uppercase"):
            val = F.lower(concat) if act == "lowercase" else F.upper(concat)
            new_metric = metric
            new_labels = _map_set(labels, F.lit(rule.target_label), val)
        elif act == "hashmod":
            new_metric = metric
            new_labels = _map_set(
                labels,
                F.lit(rule.target_label),
                _hashmod(concat, rule.modulus),
            )
        elif act == "labelmap":
            # copy every matching-name label to its expanded name:
            # fold the copies over the original map, last-wins
            copies = F.transform(
                F.filter(
                    F.map_entries(labels),
                    lambda e: e.key.rlike(anchored),
                ),
                lambda e: F.struct(
                    F.regexp_replace(
                        e.key, anchored, _template(rule.replacement)
                    ).alias("key"),
                    e.value.alias("value"),
                ),
            )
            new_metric = metric
            new_labels = F.aggregate(
                copies,
                labels,
                lambda acc, e: F.map_concat(
                    F.map_filter(acc, lambda k, _v: k != e.key),
                    F.map_from_arrays(
                        F.array(e.key), F.array(e.value)
                    ),
                ),
            )
        elif act == "labeldrop":
            new_metric = metric
            new_labels = F.map_filter(
                labels, lambda k, _v: ~k.rlike(anchored)
            )
        elif act == "labelkeep":
            new_metric = metric
            new_labels = F.map_filter(
                labels, lambda k, _v: k.rlike(anchored)
            )
        else:  # pragma: no cover - __post_init__ rejects unknowns
            raise ValueError(f"unknown relabel action: {act}")
        df = df.withColumns(
            {metric_col: new_metric, labels_col: new_labels}
        )
        metric = F.col(metric_col)
        labels = F.col(labels_col)
    return df


# ---------------------------------------------------------------------------
# registered parity query
# ---------------------------------------------------------------------------


#: the deterministic demo chain: one rule per action family, each with
#: a DuckDB-expressible oracle twin (regexes kept in the RE2∩Java
#: common subset)
DEMO_RULES = [
    # keep only the two click/view families
    {"action": "keep", "source_labels": ["__name__"], "regex": "click|view"},
    # drop users whose id starts with 1
    {"action": "drop", "source_labels": ["user"], "regex": "1.*"},
    # derive slot = "<shard>-<user>" via multi-source group expansion
    {
        "action": "replace",
        "source_labels": ["user", "shard"],
        "regex": r"(\d+);(\d+)",
        "target_label": "slot",
        "replacement": "$2-$1",
    },
    # hash users into 7 buckets (upstream md5 semantics)
    {
        "action": "hashmod",
        "source_labels": ["user"],
        "modulus": 7,
        "target_label": "bucket",
    },
    # copy shard → x_ard, then drop the original
    {"action": "labelmap", "regex": "sh(.*)", "replacement": "x_$1"},
    {"action": "labeldrop", "regex": "shard"},
]


def relabel_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered parity query: the DEMO_RULES chain applied to the
    multi-label samples relation, folded per relabeled series. Every
    output label is read back from the REWRITTEN map (element_at), so
    the check covers the full chain: keep/drop filtering, replace's
    group expansion, hashmod's exact md5 arithmetic, labelmap's
    copy, and labeldrop's removal (x_ard survives, shard must not)."""
    from shards_prometheus_spark.model import (
        parallelism_floor,
        samples_multi,
    )

    # byte-gated parallelism floor: a no-op below 32 MB (every bench
    # SF — plan byte-identical to the serial form), an exchange to
    # core width when a big single-row-group file would otherwise run
    # the regex/map chain on one core (model.parallelism_floor)
    s = apply_relabel(
        parallelism_floor(spark, sf_dir, samples_multi(spark, sf_dir)),
        DEMO_RULES,
    )
    lbl = lambda k: F.coalesce(  # noqa: E731
        F.element_at("labels", F.lit(k)), F.lit("")
    )
    return (
        s.groupBy(
            F.col("metric"),
            lbl("user").alias("user"),
            lbl("slot").alias("slot"),
            lbl("bucket").alias("bucket"),
            lbl("x_ard").alias("x_ard"),
            lbl("shard").alias("shard_dropped"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("metric", "user", "slot")
    )


QUERIES = {"relabel_chain": relabel_chain}


def _relabel_chain_sql() -> str:
    from shards_prometheus_spark.model import SAMPLES_MULTI_CTE, dround

    return (
        f"{SAMPLES_MULTI_CTE} "
        "SELECT metric, l_user AS user, "
        "l_shard || '-' || l_user AS slot, "
        "CAST(CAST(('0x' || substring(md5(l_user), 17, 16)) AS UBIGINT) "
        "% 7 AS VARCHAR) AS bucket, "
        "l_shard AS x_ard, '' AS shard_dropped, "
        "COUNT(*) AS n_samples, "
        + dround("SUM(value)", 4)
        + " AS sum_value "
        "FROM samples_multi "
        "WHERE metric IN ('click', 'view') "
        "AND NOT regexp_full_match(l_user, '1.*') "
        "GROUP BY ALL"
    )


ORACLES = {"relabel_chain": _relabel_chain_sql()}


def lift_labels(classified: DataFrame) -> DataFrame:
    """Lift a classified scrape relation into the canonical
    (metric, labels MAP) shape: the parsed label map when the
    classifier provided one (multi-label scrapes), else the flattened
    `user`/`le` pair, plus `instance` := the scrape target when not
    already set — the labels upstream attaches before metric
    relabeling runs. Pure map expressions, zero shuffles."""
    pairs = [(F.lit("user"), F.col("label_user")), (F.lit("le"), F.col("le"))]
    flat = F.map_filter(
        F.create_map(*[c for kv in pairs for c in kv]),
        lambda _k, v: v.isNotNull(),
    )
    base = (
        F.coalesce(F.col("labels"), flat)
        if "labels" in classified.columns
        else flat
    )
    if "target" in classified.columns:
        # instance defaults to the scrape target; an instance label
        # already present (a relabeled or multi-label payload) wins
        base = F.when(
            F.array_contains(F.map_keys(base), "instance"), base
        ).otherwise(
            F.map_concat(
                base,
                F.map_filter(
                    F.create_map(F.lit("instance"), F.col("target")),
                    lambda _k, v: v.isNotNull(),
                ),
            )
        )
    return classified.withColumn("labels", base)


def relabel_scraped(classified: DataFrame, rules) -> DataFrame:
    """`metric_relabel_configs` over the CLASSIFIED scrape relation
    (scraper.scraped_samples / any classify_lines output): lift into
    the canonical (metric, labels MAP) shape via `lift_labels` — the
    FULL parsed label map when the classifier provided one, else the
    flattened `user`/`le` pair, plus `instance` := the scrape target
    — apply the compiled chain, and flatten `user`/`le` back. The
    full rewritten map rides along as a `labels` column so labels
    beyond the flattened pair (a third payload label, a hashmod
    bucket, a labelmap copy) are not lost. keep/drop rules drop ROWS
    here, which for a family-wide regex is upstream's
    drop-the-family knob."""
    out = apply_relabel(lift_labels(classified), rules)
    return out.withColumns(
        {
            "label_user": F.element_at("labels", F.lit("user")),
            "le": F.element_at("labels", F.lit("le")),
        }
    )
