"""Alertmanager notification push — the last hop of the alerting
pipeline.

The paired server doesn't just EVALUATE alerting rules (operators/
rules.py) and SERVE the firing set (`/api/v1/alerts`): after each rule
group evaluation it POSTs the firing alerts to every configured
Alertmanager as a JSON array on ``/api/v2/alerts`` (the public v2
push shape: ``[{labels, annotations, startsAt, generatorURL}]``).
This module is that hop:

- ``firing_to_v2``: the `/api/v1/alerts` entries → v2 push objects —
  one conversion, so what a webhook receives is label-for-label what
  the API serves.
- ``AlertmanagerNotifier``: a configured pool of base URLs; `notify`
  fans a payload out to every pool member and reports per-URL
  delivery status WITHOUT raising — a dead Alertmanager must never
  crash rule evaluation (upstream queues and drops, it doesn't
  fail the rule group).
- ``notify_firing``: evaluate a rule file's firing set off the
  engine's samples relation and push it — the "after each rule-group
  evaluation" hook.
- ``pool_data``: the configured pool in `/api/v1/alertmanagers`'
  public shape (activeAlertmanagers with the full push URL).

The evaluation itself stays fully distributed (eval_rule_file is the
same Spark pass `/api/v1/alerts` uses); only the firing SET — alert-
count-sized by definition — is serialized to JSON on the driver.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from datetime import datetime, timezone

#: Path the v2 push API lives on, appended to each configured base URL.
PUSH_PATH = "/api/v2/alerts"


def _rfc3339(ts_us: int) -> str:
    """µs since epoch → RFC3339 UTC (what v2 startsAt expects)."""
    return (
        datetime.fromtimestamp(ts_us / 1e6, tz=timezone.utc)
        .isoformat(timespec="milliseconds")
        .replace("+00:00", "Z")
    )


def firing_to_v2(
    alerts: "list[dict]",
    starts_at_us: int,
    generator_url: str | None = None,
) -> "list[dict]":
    """`/api/v1/alerts` entries ({labels, state, value[, annotations]})
    → the v2 push array. Labels and annotations pass through verbatim
    (they were already template-expanded by alerts_data); startsAt is
    the evaluation time."""
    out = []
    for a in alerts:
        entry = {
            "labels": dict(a.get("labels") or {}),
            "annotations": dict(a.get("annotations") or {}),
            "startsAt": _rfc3339(starts_at_us),
        }
        if generator_url:
            entry["generatorURL"] = generator_url
        out.append(entry)
    return out


class AlertmanagerNotifier:
    """A configured Alertmanager pool. `notify` POSTs JSON arrays
    to every member's ``/api/v2/alerts`` and returns
    ``{push_url: http_status}`` (-1 for a connection failure) —
    delivery problems are reported, never raised.

    With ``send_resolved`` (upstream's default) the notifier
    remembers the previous push's firing label sets and appends a
    RESOLVED entry (``endsAt`` = this evaluation time, original
    ``startsAt``) for every alert that stopped firing since — the
    notification Alertmanager needs to close the incident. Sent once
    per resolution (upstream re-sends for resolve_timeout; a single
    engine evaluation pass has no re-send loop to hang it on).

    Cadence, following upstream's notifier/rules semantics:

    - ``startsAt`` is pinned to the alert's FIRST-SEEN firing time
      (upstream's ActiveAt) — a continuously-firing alert keeps one
      startsAt across pushes, and its resolved entry inherits the
      ORIGINAL firing time, not the last push's stamp.
    - ``resend_delay_us`` (upstream `--rules.alert.resend-delay`,
      default 1m): an alert whose label set was already delivered is
      NOT re-POSTed until the delay elapses — rule groups evaluate
      far more often than Alertmanager needs reminding. Resolved
      entries always send immediately.
    - ``max_batch_size`` (upstream notifier maxBatchSize, 64): a
      larger payload splits into sequential POSTs of at most this
      many alerts; the per-URL status reports the first failure, else
      the last batch's status.
    """

    def __init__(
        self,
        urls: "list[str]",
        timeout_s: float = 10.0,
        send_resolved: bool = True,
        resend_delay_us: int = 60_000_000,
        max_batch_size: int = 64,
        headers_by_url: "dict[str, dict] | None" = None,
    ):
        self.urls = [u.rstrip("/") for u in urls]
        #: per-BASE-URL extra request headers (a secured pool member's
        #: Authorization from its alertmanagers[] entry auth section)
        self.headers_by_url = {
            u.rstrip("/"): dict(h)
            for u, h in (headers_by_url or {}).items()
            if h
        }
        self.timeout_s = timeout_s
        self.send_resolved = send_resolved
        self.resend_delay_us = resend_delay_us
        self.max_batch_size = max(1, int(max_batch_size))
        #: label-set key → the v2 entry as last pushed (for startsAt)
        self._active: "dict[tuple, dict]" = {}
        #: label-set key → µs timestamp of the last delivered push
        self._last_sent: "dict[tuple, int]" = {}

    def push_state(
        self, firing_v2: "list[dict]", now_us: int
    ) -> "tuple[list[dict], dict[str, int]]":
        """Diff the firing set against the previous push, pin
        startsAt for already-firing label sets, drop entries inside
        the resend window, append resolved entries, POST, and update
        the remembered state. Returns (the delivered payload incl.
        resolved, per-URL statuses — both empty when the resend
        window suppressed everything: no delta, no POST)."""

        def key(entry: dict) -> tuple:
            return tuple(sorted((entry.get("labels") or {}).items()))

        current: "dict[tuple, dict]" = {}
        payload: "list[dict]" = []
        stamped: "list[tuple[tuple, int | None]]" = []
        for e in firing_v2:
            k = key(e)
            entry = dict(e)
            prev = self._active.get(k)
            if prev is not None and "startsAt" in prev:
                # upstream pins startsAt to ActiveAt — the FIRST
                # evaluation that saw this label set firing
                entry["startsAt"] = prev["startsAt"]
            current[k] = entry
            last = self._last_sent.get(k)
            if last is None or now_us - last >= self.resend_delay_us:
                payload.append(entry)
                stamped.append((k, last))
                self._last_sent[k] = now_us
        resolved_keys: "list[tuple[tuple, dict, int | None]]" = []
        if self.send_resolved:
            for k, prev in self._active.items():
                if k in current:
                    continue
                resolved = dict(prev)
                resolved["endsAt"] = _rfc3339(now_us)
                payload.append(resolved)
                resolved_keys.append((k, prev, self._last_sent.pop(k, None)))
        else:
            for k in list(self._last_sent):
                if k not in current:
                    del self._last_sent[k]
        statuses = self.notify(payload) if payload else {}
        if payload and statuses and not any(
            200 <= s < 300 for s in statuses.values()
        ):
            # a FULLY-failed delivery (every member -1/4xx/5xx) rolls
            # the resend stamps back so the next evaluation retries —
            # upstream's notifier queue retries failed sends; stamping
            # before the POST would otherwise suppress the alert for
            # the whole resend window with nothing delivered
            for k, prev_ts in stamped:
                if prev_ts is None:
                    self._last_sent.pop(k, None)
                else:
                    self._last_sent[k] = prev_ts
            # ... and the resolved delta must be retried too: re-arm
            # each undelivered resolved entry as still-active (and
            # restore its resend stamp) so the NEXT evaluation
            # regenerates its endsAt notification instead of dropping
            # the resolution permanently — upstream retries resolved
            # sends exactly like firing ones
            for k, prev, prev_ts in resolved_keys:
                current[k] = prev
                if prev_ts is not None:
                    self._last_sent[k] = prev_ts
        self._active = current
        return payload, statuses

    @property
    def push_urls(self) -> "list[str]":
        return [u + PUSH_PATH for u in self.urls]

    def notify(self, v2_alerts: "list[dict]") -> "dict[str, int]":
        batches = [
            v2_alerts[i : i + self.max_batch_size]
            for i in range(0, len(v2_alerts), self.max_batch_size)
        ] or [[]]
        statuses: dict[str, int] = {}
        for base, url in zip(self.urls, self.push_urls):
            extra = self.headers_by_url.get(base) or {}
            results: list[int] = []
            for batch in batches:
                body = json.dumps(batch).encode("utf-8")
                req = urllib.request.Request(
                    url,
                    data=body,
                    headers={
                        "Content-Type": "application/json",
                        **extra,
                    },
                    method="POST",
                )
                try:
                    with urllib.request.urlopen(
                        req, timeout=self.timeout_s
                    ) as resp:
                        results.append(resp.status)
                except urllib.error.HTTPError as exc:
                    results.append(exc.code)
                except Exception:  # noqa: BLE001 - never raise
                    results.append(-1)
            # first failing batch wins the report (later batches
            # still attempt — upstream keeps draining its queue)
            bad = [s for s in results if not 200 <= s < 300]
            statuses[url] = bad[0] if bad else results[-1]
        return statuses


def attach_external_labels(
    alerts: "list[dict]", external_labels: "dict | None"
) -> "list[dict]":
    """`global.external_labels` on the notification boundary:
    upstream attaches them to every alert BEFORE
    alert_relabel_configs runs (rules/alerting.go sends through the
    external-label hop first), so an HA pair pushing to one
    Alertmanager carries its cluster/replica identity and the
    relabel chain can act on it. An alert's OWN label wins a name
    conflict — external labels never overwrite rule labels."""
    if not external_labels:
        return list(alerts)
    out = []
    for a in alerts:
        labels = dict(external_labels)
        labels.update(a.get("labels") or {})
        e = dict(a)
        e["labels"] = labels
        out.append(e)
    return out


def relabel_alerts(
    alerts: "list[dict]", rules: "list[dict]", spark
) -> "list[dict]":
    """Upstream's top-level `alerting.alert_relabel_configs`: the
    relabel chain applied to every alert's LABEL SET between rule
    evaluation and the notifier — a `drop` rule removes the alert
    from the push entirely, rewrites change what Alertmanager
    receives (the served `/api/v1/alerts` state is NOT relabeled,
    exactly upstream's split). Runs the SAME compiled chain the
    target and metric hops use, over an alert-count-sized relation —
    the collect is the firing set."""
    from shards_prometheus_spark.operators.relabel import apply_relabel

    if not alerts or not rules:
        return list(alerts)
    df = spark.createDataFrame(
        [
            (i, "", dict(a.get("labels") or {}))
            for i, a in enumerate(alerts)
        ],
        "idx long, metric string, labels map<string,string>",
    )
    kept = {
        r["idx"]: dict(r["labels"])
        for r in apply_relabel(df, rules)
        .select("idx", "labels")
        .collect()
    }
    out = []
    for i, a in enumerate(alerts):
        if i not in kept:
            continue  # dropped before the POST
        e = dict(a)
        e["labels"] = kept[i]
        out.append(e)
    return out


def notify_firing(
    evaluator,
    rule_file: str,
    notifier: AlertmanagerNotifier,
    generator_url: str | None = None,
    alert_relabel_configs: "list[dict] | None" = None,
    external_labels: "dict | None" = None,
) -> "tuple[list[dict], dict[str, int]]":
    """Evaluate `rule_file`'s firing set (the SAME eval_rule_file pass
    `/api/v1/alerts` serves — labels/annotations identical by
    construction) and push it to the pool via `push_state` — firing
    entries plus an `endsAt`-stamped resolved entry for every alert
    that stopped firing since the notifier's previous push. Returns
    (the delivered v2 payload, per-URL delivery statuses). A push
    whose every entry is inside the notifier's resend window delivers
    nothing — no delta, no POST (upstream's resend_delay).
    `external_labels` (the config's `global.external_labels`) attach
    to every alert FIRST, then `alert_relabel_configs` (the config's
    top-level alerting hop) runs over the result — upstream's
    ordering, so relabel rules can match on cluster/replica."""
    from shards_prometheus_spark.sources.query_api import alerts_data

    now_us = evaluator.eval_time_us()
    alerts = alerts_data(evaluator, rule_file)["alerts"]
    alerts = attach_external_labels(alerts, external_labels)
    if alert_relabel_configs:
        alerts = relabel_alerts(
            alerts, alert_relabel_configs, evaluator.samples.sparkSession
        )
    return notifier.push_state(
        firing_to_v2(alerts, now_us, generator_url), now_us
    )


def pool_data(urls: "list[str] | None") -> dict:
    """`/api/v1/alertmanagers`: the configured pool in the public
    shape — each active member listed by its full push URL; servers
    with no pool serve two empty lists."""
    if not urls:
        return {"activeAlertmanagers": [], "droppedAlertmanagers": []}
    return {
        "activeAlertmanagers": [
            {"url": u.rstrip("/") + PUSH_PATH} for u in urls
        ],
        "droppedAlertmanagers": [],
    }
