"""`prometheus.yml` scrape_configs — the deployment file drives the loop.

`operators.rules.load_rule_groups` parses the rule-file half of a real
deployment's config; this module parses the OTHER half — the
`scrape_configs:` list (job_name, static_configs, scrape_interval,
metrics_path, scheme, relabel_configs, metric_relabel_configs) plus
the `global:` defaults — and turns each job into the engine's scrape
loop inputs, so a switching user's existing prometheus.yml drives
`sources.scraper.scrape_stream` unchanged. The reference side of the
pairing is its exposer's fixed 127.0.0.1:9090 default
(prometheus.cpp:47): upstream's config file is exactly the document
that tells a server to scrape such an exposer.

Upstream semantics implemented:

- **Target resolution**: each static target starts from the label set
  {__address__, job, __metrics_path__, __scheme__} plus the
  static_config's own `labels:`; `relabel_configs` (the TARGET hop,
  not the metric hop) rewrites/keeps/drops that set; after the chain,
  `instance` defaults to `__address__`, the scrape URL is rebuilt
  from the possibly-rewritten __scheme__/__address__/__metrics_path__,
  and `__`-internal labels are stripped. The chain is the SAME
  compiled relabel implementation the metric hop uses
  (operators.relabel.apply_relabel) run over a config-sized local
  relation — one semantics, two hops; the collect is target-list
  sized by construction.
- **job/instance injection with honor_labels=false** (the default):
  target labels win a conflict and the scraped label is renamed
  `exported_<name>`; `honor_labels: true` flips the precedence. Both
  compile to map higher-order expressions keyed by the row's target
  URL through a config-sized literal map — no join, no shuffle.
- **metric_relabel_configs**: applied by scraped_samples between
  classification and the registry (operators.relabel.relabel_scraped).
- **params**: per-job URL query parameters, surfaced to the relabel
  hop as `__param_<name>` labels (first value) and rebuilt into the
  final scrape URL — upstream's federation/blackbox-probe mechanics.
- **http_sd_configs**: the generic HTTP discovery mechanism — the
  served `{targets, labels}` JSON groups merge through the same
  relabel hop as static/file_sd at resolution, and the LIVE loop
  re-resolves the fleet per tick (time-gated by refresh_interval)
  inside the scrape source, so a discovery service can add/remove
  targets mid-loop; removed targets stop being scraped and stale out.
- **basic_auth / authorization**: compiled to the `Authorization`
  header every one of the job's GETs carries (`*_file` secrets read at
  config load); a secured exporter scrapes instead of reading `up` 0
  forever. The scraper also always sends upstream's negotiation pair —
  `Accept` (OpenMetrics-preferred, driving the per-row timestamp-unit
  logic) and `X-Prometheus-Scrape-Timeout-Seconds` (scraper.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: upstream's global default when neither global: nor the job sets one
_DEF_INTERVAL = "1m"
_DEF_TIMEOUT = "10s"
_DEF_METRICS_PATH = "/metrics"
_DEF_SCHEME = "http"


@dataclass
class ResolvedTarget:
    """One post-relabeling scrape target: final URL + the label set
    injected into every sample scraped from it."""

    url: str
    labels: dict


@dataclass
class ScrapeJob:
    """One normalized scrape_configs entry."""

    job_name: str
    interval_us: int
    #: upstream scrape_timeout (default 10s; capped at the interval)
    timeout_us: int = 10_000_000
    metrics_path: str = _DEF_METRICS_PATH
    scheme: str = _DEF_SCHEME
    honor_labels: bool = False
    #: upstream honor_timestamps (default true): false stamps every
    #: sample at scrape time, ignoring exposed timestamps
    honor_timestamps: bool = True
    #: upstream sample_limit (0 = unlimited): an over-limit payload
    #: FAILS its scrape — up 0, nothing ingested
    sample_limit: int = 0
    #: upstream body_size_limit in BYTES (0 = unlimited; the YAML
    #: accepts upstream's size units, e.g. "10MB")
    body_limit: int = 0
    #: upstream label_limit (0 = unlimited): max exposed label pairs
    #: per sample — a violating payload FAILS its scrape like
    #: sample_limit
    label_limit: int = 0
    #: upstream label_name_length_limit / label_value_length_limit
    #: (0 = unlimited): per-label length guards, same failure mode
    label_name_length_limit: int = 0
    label_value_length_limit: int = 0
    #: upstream target_limit (0 = unlimited): if MORE targets than
    #: this resolve after relabeling, every target of the job is
    #: marked failed (up 0) WITHOUT being scraped
    target_limit: int = 0
    #: upstream enable_compression (default true): advertise
    #: Accept-Encoding: gzip and inflate a gzip payload
    enable_compression: bool = True
    #: upstream follow_redirects (default true): false fails the
    #: scrape on any 3xx answer
    follow_redirects: bool = True
    #: upstream proxy_url: route every scrape GET through this HTTP
    #: proxy ("" = direct)
    proxy_url: str = ""
    #: upstream 3.x fallback_scrape_protocol: the dialect assumed for
    #: a target that omits Content-Type ("" = classic text)
    fallback_scrape_protocol: str = ""
    static_targets: list = field(default_factory=list)  # (addr, labels)
    relabel_configs: list = field(default_factory=list)
    metric_relabel_configs: list = field(default_factory=list)
    #: file_sd_configs: file paths/globs (JSON or YAML target lists),
    #: re-read on every resolve_targets call — upstream's file-based
    #: service discovery, where the file IS the mutable target source
    file_sd_files: list = field(default_factory=list)
    #: http_sd_configs: the generic HTTP discovery mechanism
    #: (Consul/K8s bridges speak it) — each spec {url, refresh_s,
    #: headers?, tls?} is GET on resolve (and re-resolved per tick
    #: by the live loop); its own basic_auth/authorization and
    #: tls_config apply to the SD GET, like upstream
    http_sd: list = field(default_factory=list)
    #: upstream `params`: URL query parameters sent with every scrape
    #: ({name: [values]}); surfaced to relabeling as `__param_<name>`
    #: labels (first value), like upstream
    params: dict = field(default_factory=dict)
    #: the compiled `Authorization` header value from the job's
    #: basic_auth / authorization section (None = unauthenticated).
    #: *_file credentials are read at config-load time — re-load the
    #: config to pick up a rotated secret.
    auth_header: "str | None" = None
    #: upstream `tls_config` for https targets: ca_file (trust root
    #: for self-signed exporter fleets), cert_file/key_file (client
    #: pair, mTLS), insecure_skip_verify. Applied per GET on the
    #: executors (scraper._tls_context).
    tls: dict = field(default_factory=dict)
    #: upstream per-job `scrape_protocols`: the ordered negotiation
    #: list compiled to the job's Accept header — e.g. a classic-only
    #: `[PrometheusText0.0.4]` pins `text/plain;version=0.0.4` for an
    #: exporter that mis-serves OpenMetrics (empty = upstream's
    #: default OM-preferred list, scraper.ACCEPT_HEADER)
    scrape_protocols: list = field(default_factory=list)

    def request_headers(self) -> "dict | None":
        """Extra per-GET headers this job's scrapes carry (on top of
        the scraper's standard Accept + timeout-advisory pair; a
        non-default scrape_protocols list OVERRIDES the standard
        Accept — extra headers win the merge in _scrape_headers)."""
        h: dict = {}
        if self.auth_header:
            h["Authorization"] = self.auth_header
        if self.scrape_protocols:
            h["Accept"] = _accept_header(self.scrape_protocols)
        return h or None

    def guard_limits(self) -> "dict | None":
        """The job's non-secret guard knobs as the scraper's `limits`
        map (scraper._ScrapeTarget.limits) — only non-default values
        travel; None when everything is at its default."""
        lim: dict = {}
        if self.label_limit:
            lim["label_limit"] = self.label_limit
        if self.label_name_length_limit:
            lim["label_name_length_limit"] = self.label_name_length_limit
        if self.label_value_length_limit:
            lim["label_value_length_limit"] = (
                self.label_value_length_limit
            )
        if self.target_limit:
            lim["target_limit"] = self.target_limit
        if not self.enable_compression:
            lim["compression"] = False
        if not self.follow_redirects:
            lim["follow_redirects"] = False
        if self.proxy_url:
            lim["proxy_url"] = self.proxy_url
        return lim or None


@dataclass
class ScrapeConfig:
    """The parsed deployment file: global defaults + jobs + the
    VERBATIM yaml text (served on /api/v1/status/config, which echoes
    the loaded file, not a re-rendering)."""

    global_interval_us: int
    jobs: list
    yaml_text: str
    rule_files: list = field(default_factory=list)
    alertmanager_urls: list = field(default_factory=list)
    #: raw `alerting.alertmanagers` entries — resolve_alertmanagers
    #: routes their relabel_configs through the compiled chain
    alertmanager_configs: list = field(default_factory=list)
    #: top-level `alerting.alert_relabel_configs` — applied to every
    #: alert's labels before notification (the hop upstream runs
    #: between rule evaluation and the notifier queue)
    alert_relabel_configs: list = field(default_factory=list)
    #: upstream `global.keep_dropped_targets` (0 = unlimited): caps
    #: how many relabel-dropped targets /api/v1/targets remembers
    keep_dropped_targets: int = 0
    #: `global.external_labels` — the identity labels upstream
    #: attaches at every OUTBOUND boundary (alerts pushed to
    #: Alertmanager, /federate output, remote-write sends) but never
    #: stores in its own TSDB; the knob an HA pair sets
    #: (cluster:/replica:) on day one so one Alertmanager can dedup
    #: their notifications
    external_labels: dict = field(default_factory=dict)
    #: `remote_write:` entries — the config-driven continuous push
    #: every real fleet shipping to Mimir/Thanos/Cortex sets
    remote_write: list = field(default_factory=list)
    #: `remote_read:` entries — the read-federation twin
    remote_read: list = field(default_factory=list)
    #: the top-level `otlp:` section (public 3.x shape):
    #: promote_resource_attributes, keep_identifying_resource_
    #: attributes, promote_scope_metadata — adopted by the exposer's
    #: OTLP receiver unless overridden by explicit constructor flags
    otlp: dict = field(default_factory=dict)


@dataclass
class RemoteWriteEntry:
    """One `remote_write:` endpoint (upstream's public shape): where
    scraped samples are continuously pushed. `protocol` compiles from
    `protobuf_message` (io.prometheus.write.v2.Request → "2.0");
    `write_relabel_configs` run through the SAME compiled chain as
    scrape relabeling, applied to each outgoing sample AFTER
    external_labels attach (upstream's ordering — the hop can drop
    or rewrite them); `auth_header` from basic_auth/authorization
    like a scrape job."""

    url: str
    name: str = ""
    protocol: str = "1.0"
    write_relabel_configs: list = field(default_factory=list)
    auth_header: "str | None" = None
    timeout_s: float = 30.0
    headers: dict = field(default_factory=dict)

    def request_headers(self) -> "dict | None":
        h = dict(self.headers)
        if self.auth_header:
            h["Authorization"] = self.auth_header
        return h or None


@dataclass
class RemoteReadEntry:
    """One `remote_read:` endpoint: a paired server whose
    /api/v1/read answers this engine's queries.
    `required_matchers` (upstream semantics) gate WHICH selectors may
    fan out to the endpoint AND are added to every outgoing
    ReadRequest as equality matchers. `read_recent` is parsed for
    config fidelity; this engine's store is an immutable batch
    relation with no local-retention boundary, so remote reads always
    span the queried range (the read_recent=false skip-what's-local
    optimization has nothing to skip against)."""

    url: str
    name: str = ""
    required_matchers: dict = field(default_factory=dict)
    read_recent: bool = False
    auth_header: "str | None" = None
    timeout_s: float = 30.0
    headers: dict = field(default_factory=dict)

    def request_headers(self) -> "dict | None":
        h = dict(self.headers)
        if self.auth_header:
            h["Authorization"] = self.auth_header
        return h or None


def load_scrape_configs(
    text: str, base_dir: "str | None" = None
) -> ScrapeConfig:
    """Parse a prometheus.yml document (the public shape).
    `base_dir` anchors `scrape_config_files` globs (upstream resolves
    them relative to the loading config's directory; default cwd)."""
    import glob as _glob
    import os as _os

    import yaml

    from shards_prometheus_spark.functions.promql_parser import _dur_us

    doc = yaml.safe_load(text) or {}
    g = doc.get("global") or {}
    g_interval = _dur_us(str(g.get("scrape_interval", _DEF_INTERVAL)))
    g_timeout = _dur_us(str(g.get("scrape_timeout", _DEF_TIMEOUT)))
    # upstream `scrape_config_files`: glob-included files each holding
    # their own `scrape_configs:` list (a bare top-level list is also
    # accepted), merged after the inline jobs in glob order; a
    # malformed include raises like a malformed main document (the
    # reload path keeps the old config on failure)
    scrape_entries = list(doc.get("scrape_configs") or [])
    for pattern in doc.get("scrape_config_files") or []:
        pat = str(pattern)
        if base_dir and not _os.path.isabs(pat):
            pat = _os.path.join(base_dir, pat)
        for path in sorted(_glob.glob(pat)):
            with open(path) as f:
                sub = yaml.safe_load(f.read()) or {}
            scrape_entries.extend(
                sub if isinstance(sub, list)
                else sub.get("scrape_configs") or []
            )
    jobs = []
    for sc in scrape_entries:
        statics = []
        for st in sc.get("static_configs") or []:
            lbls = {str(k): str(v) for k, v in (st.get("labels") or {}).items()}
            for addr in st.get("targets") or []:
                statics.append((str(addr), lbls))
        jobs.append(
            ScrapeJob(
                job_name=str(sc["job_name"]),
                interval_us=_dur_us(str(sc["scrape_interval"]))
                if sc.get("scrape_interval")
                else g_interval,
                # upstream: a timeout above the interval is clamped
                # to it (a scrape must finish before the next tick)
                timeout_us=min(
                    _dur_us(str(sc["scrape_timeout"]))
                    if sc.get("scrape_timeout")
                    else g_timeout,
                    _dur_us(str(sc["scrape_interval"]))
                    if sc.get("scrape_interval")
                    else g_interval,
                ),
                metrics_path=str(sc.get("metrics_path", _DEF_METRICS_PATH)),
                scheme=str(sc.get("scheme", _DEF_SCHEME)),
                honor_labels=bool(sc.get("honor_labels", False)),
                honor_timestamps=bool(sc.get("honor_timestamps", True)),
                sample_limit=int(sc.get("sample_limit", 0)),
                body_limit=_size_bytes(sc.get("body_size_limit", 0)),
                label_limit=int(sc.get("label_limit", 0)),
                label_name_length_limit=int(
                    sc.get("label_name_length_limit", 0)
                ),
                label_value_length_limit=int(
                    sc.get("label_value_length_limit", 0)
                ),
                target_limit=int(sc.get("target_limit", 0)),
                enable_compression=bool(
                    sc.get("enable_compression", True)
                ),
                follow_redirects=bool(sc.get("follow_redirects", True)),
                proxy_url=str(sc.get("proxy_url") or ""),
                fallback_scrape_protocol=str(
                    sc.get("fallback_scrape_protocol") or ""
                ),
                static_targets=statics,
                relabel_configs=list(sc.get("relabel_configs") or []),
                metric_relabel_configs=list(
                    sc.get("metric_relabel_configs") or []
                ),
                file_sd_files=[
                    str(p)
                    for fsd in sc.get("file_sd_configs") or []
                    for p in fsd.get("files") or []
                ],
                http_sd=[
                    _http_sd_spec(hsd)
                    for hsd in sc.get("http_sd_configs") or []
                    if hsd.get("url")
                ],
                params={
                    str(k): [str(x) for x in v]
                    if isinstance(v, list)
                    else [str(v)]
                    for k, v in (sc.get("params") or {}).items()
                },
                auth_header=_auth_header(sc),
                tls=_tls_config(sc),
                scrape_protocols=[
                    str(x) for x in sc.get("scrape_protocols") or []
                ],
            )
        )
    # alerting: alertmanagers: [static_configs: [targets: [...]]]
    alerting = doc.get("alerting") or {}
    am_entries = list(alerting.get("alertmanagers") or [])
    am_urls = []
    for am in am_entries:
        scheme = str(am.get("scheme", _DEF_SCHEME))
        path = str(am.get("path_prefix", "")).rstrip("/")
        for st in am.get("static_configs") or []:
            for addr in st.get("targets") or []:
                am_urls.append(f"{scheme}://{addr}{path}")
    return ScrapeConfig(
        global_interval_us=g_interval,
        jobs=jobs,
        yaml_text=text,
        rule_files=[str(p) for p in doc.get("rule_files") or []],
        alertmanager_urls=am_urls,
        alertmanager_configs=am_entries,
        alert_relabel_configs=list(
            alerting.get("alert_relabel_configs") or []
        ),
        external_labels={
            str(k): str(v)
            for k, v in (g.get("external_labels") or {}).items()
        },
        keep_dropped_targets=int(g.get("keep_dropped_targets") or 0),
        remote_write=[
            RemoteWriteEntry(
                url=str(rw["url"]),
                name=str(rw.get("name", "")),
                protocol=(
                    "2.0"
                    if "write.v2.Request"
                    in str(rw.get("protobuf_message", ""))
                    else "1.0"
                ),
                write_relabel_configs=list(
                    rw.get("write_relabel_configs") or []
                ),
                auth_header=_auth_header(rw),
                timeout_s=_dur_us(str(rw.get("remote_timeout", "30s")))
                / 1e6,
                headers={
                    str(k): str(v)
                    for k, v in (rw.get("headers") or {}).items()
                },
            )
            for rw in doc.get("remote_write") or []
            if rw.get("url")
        ],
        otlp={
            "promote_resource_attributes": [
                str(a)
                for a in (doc.get("otlp") or {}).get(
                    "promote_resource_attributes"
                )
                or []
            ],
            "keep_identifying_resource_attributes": bool(
                (doc.get("otlp") or {}).get(
                    "keep_identifying_resource_attributes"
                )
            ),
            "promote_scope_metadata": bool(
                (doc.get("otlp") or {}).get("promote_scope_metadata")
            ),
        }
        if doc.get("otlp")
        else {},
        remote_read=[
            RemoteReadEntry(
                url=str(rr["url"]),
                name=str(rr.get("name", "")),
                required_matchers={
                    str(k): str(v)
                    for k, v in (rr.get("required_matchers") or {}).items()
                },
                read_recent=bool(rr.get("read_recent", False)),
                auth_header=_auth_header(rr),
                timeout_s=_dur_us(str(rr.get("remote_timeout", "1m")))
                / 1e6,
                headers={
                    str(k): str(v)
                    for k, v in (rr.get("headers") or {}).items()
                },
            )
            for rr in doc.get("remote_read") or []
            if rr.get("url")
        ],
    )


def resolve_alertmanagers(spark: SparkSession, cfg: ScrapeConfig) -> list:
    """The push-URL projection of `resolve_alertmanagers_full` (the
    public shape most callers want)."""
    return [u for u, _h in resolve_alertmanagers_full(spark, cfg)]


def resolve_alertmanagers_full(
    spark: SparkSession, cfg: ScrapeConfig
) -> "list[tuple[str, dict | None]]":
    """`alerting.alertmanagers[]` resolution: [(push base URL,
    request headers)]. `relabel_configs` route through the SAME
    relabel machinery as scrape targets (a rewritten `__address__`
    changes the push URL, a dropped row removes the pool member);
    entries without rules pass through statically — the per-entry
    relation is pool-sized, the collect IS the config. Each entry's
    `basic_auth`/`authorization` compiles to an Authorization header
    every push to that entry's members carries (a secured
    Alertmanager answers 401 to a bare POST, which the notifier
    reports as that member's delivery status)."""
    from shards_prometheus_spark.operators.relabel import apply_relabel

    out: "list[tuple[str, dict | None]]" = []
    for am in cfg.alertmanager_configs:
        scheme = str(am.get("scheme", _DEF_SCHEME))
        path = str(am.get("path_prefix", "")).rstrip("/")
        auth = _auth_header(am)
        headers = {"Authorization": auth} if auth else None
        addrs = [
            str(a)
            for st in am.get("static_configs") or []
            for a in st.get("targets") or []
        ]
        rules = list(am.get("relabel_configs") or [])
        if not rules:
            out.extend(
                (f"{scheme}://{a}{path}", headers) for a in addrs
            )
            continue
        if not addrs:
            continue
        df = spark.createDataFrame(
            [
                ("", {"__address__": a, "__scheme__": scheme})
                for a in addrs
            ],
            "metric string, labels map<string,string>",
        )
        for r in apply_relabel(df, rules).collect():
            labels = dict(r["labels"])
            addr = labels.get("__address__", "")
            if not addr:
                continue  # relabeled away: dropped pool member
            out.append(
                (
                    f"{labels.get('__scheme__', scheme)}://{addr}{path}",
                    headers,
                )
            )
    return out


def _read_secret_file(path: str) -> str:
    """A *_file credential: upstream reads the whole file and strips
    trailing newlines."""
    with open(path) as f:
        return f.read().rstrip("\n")


def _auth_header(sc: dict) -> "str | None":
    """The job's `basic_auth:` / `authorization:` section → one
    `Authorization` header value (upstream's http client config; the
    two sections are mutually exclusive in upstream's validation —
    basic_auth wins here if both appear).

    - basic_auth: username + (password | password_file) → Basic b64.
    - authorization: (type, default Bearer) + (credentials |
      credentials_file) → `<type> <credentials>`.
    """
    import base64

    ba = sc.get("basic_auth")
    if ba:
        user = str(ba.get("username", ""))
        pw = (
            _read_secret_file(str(ba["password_file"]))
            if ba.get("password_file")
            else str(ba.get("password", ""))
        )
        tok = base64.b64encode(f"{user}:{pw}".encode()).decode()
        return f"Basic {tok}"
    auth = sc.get("authorization")
    if auth:
        typ = str(auth.get("type", "Bearer"))
        cred = (
            _read_secret_file(str(auth["credentials_file"]))
            if auth.get("credentials_file")
            else str(auth.get("credentials", ""))
        )
        return f"{typ} {cred}" if cred else None
    return None


def _tls_config(sc: dict) -> dict:
    """The job's `tls_config:` section, normalized to the knobs the
    scraper's SSL context builder consumes (unknown keys dropped per
    the be-liberal parse convention)."""
    raw = sc.get("tls_config") or {}
    out: dict = {}
    for k in ("ca_file", "cert_file", "key_file"):
        if raw.get(k):
            out[k] = str(raw[k])
    if raw.get("insecure_skip_verify"):
        out["insecure_skip_verify"] = True
    return out


#: upstream's public scrape_protocols names → the Accept media types
#: they negotiate (Prometheus config.ScrapeProtocolsHeaders)
_PROTOCOL_TYPES = {
    "PrometheusProto": (
        "application/vnd.google.protobuf;"
        "proto=io.prometheus.client.MetricFamily;encoding=delimited"
    ),
    "PrometheusText0.0.4": "text/plain;version=0.0.4",
    "PrometheusText1.0.0": "text/plain;version=1.0.0;escaping=allow-utf-8",
    "OpenMetricsText0.0.1": "application/openmetrics-text;version=0.0.1",
    "OpenMetricsText1.0.0": "application/openmetrics-text;version=1.0.0",
}


def _accept_header(protocols: "list[str]") -> str:
    """A job's `scrape_protocols` list → the q-graded Accept header,
    upstream's scheme: earlier entries get higher q (the default
    3-entry list renders q=0.6/0.5/0.4), `*/*;q=0.1` always last so
    a misconfigured exporter still answers SOMETHING the classifier
    can reject. Unknown protocol names are skipped (be-liberal parse
    convention); an all-unknown list falls back to the default."""
    from shards_prometheus_spark.sources.scraper import ACCEPT_HEADER

    known = [p for p in protocols if p in _PROTOCOL_TYPES]
    if not known:
        return ACCEPT_HEADER
    n = len(known)
    parts = [
        f"{_PROTOCOL_TYPES[p]};q={min(0.3 + 0.1 * (n - i), 0.9):.1f}"
        for i, p in enumerate(known)
    ]
    return ",".join(parts) + ",*/*;q=0.1"


def _size_bytes(v) -> int:
    """Upstream's config size type: an int is bytes; strings accept
    the public units (B, KB, MB, GB, KiB, MiB, GiB — upstream treats
    the decimal names as base-1024 too)."""
    if isinstance(v, (int, float)):
        return int(v)
    s = str(v).strip().upper()
    for suffix, mult in (
        ("GIB", 1 << 30), ("MIB", 1 << 20), ("KIB", 1 << 10),
        ("GB", 1 << 30), ("MB", 1 << 20), ("KB", 1 << 10), ("B", 1),
    ):
        if s.endswith(suffix):
            return int(float(s[: -len(suffix)]) * mult)
    return int(float(s))


def _http_sd_spec(hsd: dict) -> dict:
    """One `http_sd_configs` entry → the live-loop spec: url,
    refresh_s (upstream refresh_interval, default 1m), plus the
    entry's OWN auth/tls sections compiled with the same helpers the
    scrape job uses (upstream: the SD HTTP client has its own
    http_config)."""
    from shards_prometheus_spark.functions.promql_parser import _dur_us

    spec: dict = {"url": str(hsd["url"])}
    if hsd.get("refresh_interval"):
        spec["refresh_s"] = _dur_us(str(hsd["refresh_interval"])) / 1e6
    auth = _auth_header(hsd)
    if auth:
        spec["headers"] = {"Authorization": auth}
    tls = _tls_config(hsd)
    if tls:
        spec["tls"] = tls
    return spec


def _http_sd_targets(job: ScrapeJob) -> "list[tuple[str, dict]]":
    """Resolve the job's http_sd_configs ONCE (the batch/startup
    hop): GET each spec's url and flatten the served
    `{targets, labels}` groups — the same group shape file_sd reads
    off disk, so both SD mechanisms merge through one relabel hop.
    An unreachable or malformed SD endpoint contributes no targets
    rather than failing the job (upstream logs and keeps the
    previous set; at startup that set is empty). The LIVE loop
    re-resolves per tick inside the scrape source instead
    (scraper._ScrapeStreamReader._current_urls)."""
    import json as _json
    import urllib.request

    from shards_prometheus_spark.sources.scraper import (
        _scrape_headers,
        _tls_context,
    )

    out: "list[tuple[str, dict]]" = []
    for spec in job.http_sd:
        try:
            req = urllib.request.Request(
                spec["url"],
                headers=_scrape_headers(
                    job.timeout_us / 1e6, spec.get("headers")
                ),
            )
            with urllib.request.urlopen(
                req,
                timeout=job.timeout_us / 1e6,
                context=_tls_context(spec["url"], spec.get("tls")),
            ) as resp:
                groups = _json.loads(resp.read().decode("utf-8"))
            for st in groups:
                lbls = {
                    str(k): str(v)
                    for k, v in (st.get("labels") or {}).items()
                }
                for addr in st.get("targets") or []:
                    out.append((str(addr), lbls))
        except Exception:  # noqa: BLE001 - a dead SD endpoint skips
            continue
    return out


def _file_sd_targets(job: ScrapeJob) -> "list[tuple[str, dict]]":
    """Read the job's file_sd_configs target files (the public shape:
    a JSON or YAML list of `{targets: [...], labels: {...}}` groups;
    paths may be globs). Read fresh on EVERY call — upstream watches
    these files for changes, and here each target resolution re-reads
    them, so editing the file and re-resolving (or restarting the
    stream) picks up the new fleet. An unreadable or malformed file
    contributes no targets rather than failing the job (upstream logs
    and keeps the previous set)."""
    import glob as _glob
    import json as _json

    out: list[tuple[str, dict]] = []
    for pattern in job.file_sd_files:
        for path in sorted(_glob.glob(pattern)):
            try:
                with open(path) as f:
                    text = f.read()
                if path.endswith((".yml", ".yaml")):
                    import yaml

                    groups = yaml.safe_load(text) or []
                else:
                    groups = _json.loads(text)
                for st in groups:
                    lbls = {
                        str(k): str(v)
                        for k, v in (st.get("labels") or {}).items()
                    }
                    for addr in st.get("targets") or []:
                        out.append((str(addr), lbls))
            except Exception:  # noqa: BLE001 - a bad SD file skips
                continue
    return out


def resolve_targets(
    spark: SparkSession,
    job: ScrapeJob,
    include_http_sd: bool = True,
) -> list[ResolvedTarget]:
    """The TARGET relabeling hop: static + file-SD (+ http-SD, unless
    `include_http_sd=False` — the live loop keeps the SD fleet on its
    own per-tick refresh channel instead of freezing the startup
    snapshot into the static list) targets → final scrape URLs +
    per-target label sets, through the same compiled relabel chain
    the metric hop uses (one semantics definition). Runs on a local
    config-sized relation; the collect IS the config."""
    active, _dropped = resolve_targets_full(
        spark, job, include_http_sd
    )
    return active


def resolve_targets_full(
    spark: SparkSession,
    job: ScrapeJob,
    include_http_sd: bool = True,
) -> "tuple[list[ResolvedTarget], list[dict]]":
    """resolve_targets plus the DROPPED side: targets eliminated by
    the relabel hop (a `drop`/failed-`keep` rule, or a relabeled-away
    `__address__`) are returned as their PRE-relabel discovered label
    sets — what upstream serves in `/api/v1/targets`'
    `droppedTargets` (each entry carries only `discoveredLabels`;
    active entries show the post-relabel set)."""
    from shards_prometheus_spark.operators.relabel import apply_relabel

    from urllib.parse import quote

    all_targets = list(job.static_targets) + _file_sd_targets(job)
    if include_http_sd:
        all_targets += _http_sd_targets(job)
    if not all_targets:
        return [], []
    rows = []
    discovered: "list[dict]" = []
    for idx, (addr, extra) in enumerate(all_targets):
        labels = {
            "__address__": addr,
            "job": job.job_name,
            "__metrics_path__": job.metrics_path,
            "__scheme__": job.scheme,
        }
        # upstream surfaces each `params` entry's FIRST value as a
        # `__param_<name>` label relabeling may rewrite; extra values
        # ride the URL unchanged
        for k, vs in job.params.items():
            if vs:
                labels[f"__param_{k}"] = vs[0]
        labels.update(extra)
        discovered.append(dict(labels))
        rows.append((idx, "", labels))
    df = spark.createDataFrame(
        rows, "idx long, metric string, labels map<string,string>"
    )
    out = []
    kept_idx: set = set()
    for r in apply_relabel(df, job.relabel_configs).collect():
        labels = dict(r["labels"])
        addr = labels.get("__address__", "")
        scheme = labels.get("__scheme__", job.scheme)
        path = labels.get("__metrics_path__", job.metrics_path)
        if not addr:
            continue  # relabeled away its address: not scrapeable
        kept_idx.add(r["idx"])
        labels.setdefault("instance", addr)
        # rebuild the query string from the (possibly relabeled)
        # __param_* labels, then the params' extra values
        pairs = [
            (k[len("__param_"):], v)
            for k, v in sorted(labels.items())
            if k.startswith("__param_")
        ]
        pairs += [
            (k, v)
            for k, vs in sorted(job.params.items())
            for v in vs[1:]
        ]
        query = "&".join(
            f"{quote(k, safe='')}={quote(v, safe='')}" for k, v in pairs
        )
        url = f"{scheme}://{addr}{path}" + (f"?{query}" if query else "")
        public = {
            k: v for k, v in labels.items() if not k.startswith("__")
        }
        out.append(ResolvedTarget(url=url, labels=public))
    dropped = [
        lbls
        for i, lbls in enumerate(discovered)
        if i not in kept_idx
    ]
    return out, dropped


def attach_target_labels(
    scraped: DataFrame,
    targets: list[ResolvedTarget],
    honor_labels: bool = False,
    default_job: "str | None" = None,
) -> DataFrame:
    """job/instance (and every other resolved target label) injection
    onto scraped rows, keyed by the row's `target` URL through a
    literal config-sized map — zero joins, zero shuffles, streaming-
    safe.

    honor_labels=false (upstream default): a target label beats a
    scraped label of the same name, and the scraped one survives as
    `exported_<name>`. honor_labels=true: scraped labels win and the
    conflicting target labels are discarded.

    `default_job`: rows from a target NOT in the resolved list (an
    http_sd addition joining mid-loop — the literal map is compiled
    at plan-construction time) fall back to {job: default_job,
    instance: host:port-of-url} instead of nulling the label map —
    upstream's baseline injection for an unrelabeled target."""
    if not targets and default_job is None:
        return scraped
    entries = []
    for t in targets:
        entries.append(F.lit(t.url))
        entries.append(
            F.create_map(
                *[F.lit(x) for kv in sorted(t.labels.items()) for x in kv]
            )
        )
    fallback = (
        F.create_map(
            F.lit("instance"),
            F.regexp_extract("target", r"^[a-z+.-]+://([^/]+)", 1),
            F.lit("job"),
            F.lit(default_job),
        )
        if default_job is not None
        else F.create_map(
            F.lit("instance"),
            F.regexp_extract("target", r"^[a-z+.-]+://([^/]+)", 1),
        )
    )
    tmap = F.coalesce(
        F.element_at(F.create_map(*entries), F.col("target"))
        if entries
        else F.lit(None).cast("map<string,string>"),
        fallback,
    )
    sample = (
        F.col("labels")
        if "labels" in scraped.columns
        else F.map_filter(
            F.create_map(
                F.lit("user"), F.col("label_user"), F.lit("le"), F.col("le")
            ),
            lambda _k, v: v.isNotNull(),
        )
    )
    tkeys = F.map_keys(tmap)
    if honor_labels:
        merged = F.map_concat(
            F.map_filter(
                tmap, lambda k, _v: ~F.array_contains(F.map_keys(sample), k)
            ),
            sample,
        )
    else:
        conflicts = F.map_filter(
            sample, lambda k, _v: F.array_contains(tkeys, k)
        )
        merged = F.map_concat(
            F.map_filter(
                sample, lambda k, _v: ~F.array_contains(tkeys, k)
            ),
            F.transform_keys(
                conflicts, lambda k, _v: F.concat(F.lit("exported_"), k)
            ),
            tmap,
        )
    out = scraped.withColumn("labels", merged)
    # refresh the flattened pair from the merged map (a target label
    # named user/le would now win under honor_labels=false)
    return out.withColumns(
        {
            "label_user": F.element_at("labels", F.lit("user")),
            "le": F.element_at("labels", F.lit("le")),
        }
    )


def scrape_job_stream(
    spark: SparkSession,
    job: ScrapeJob,
    targets: "list[ResolvedTarget] | None" = None,
    max_ticks: int = 0,
) -> DataFrame:
    """One job's scrape loop, config-driven end-to-end: resolved
    targets → the streaming scrape source → classification →
    metric_relabel_configs → job/instance injection. The caller picks
    the trigger (`processingTime=f"{job.interval_us/1e6} seconds"` is
    upstream's cadence)."""
    from shards_prometheus_spark.sources.scraper import (
        scrape_stream,
        scraped_samples,
    )

    if targets is None:
        targets = resolve_targets(spark, job)
    if not targets and not job.http_sd:
        raise ValueError(f"job {job.job_name!r} resolved zero targets")
    if job.http_sd:
        # only static/file targets ride the fixed list — the SD fleet
        # stays on the source's per-tick refresh channel, so a target
        # removed from the discovery service actually STOPS being
        # scraped (a frozen startup snapshot would pin it forever)
        static_targets = resolve_targets(
            spark, job, include_http_sd=False
        )
    else:
        static_targets = targets
    lines = scrape_stream(
        spark,
        [t.url for t in static_targets],
        timeout_s=job.timeout_us / 1e6,
        max_ticks=max_ticks,
        sample_limit=job.sample_limit,
        body_limit=job.body_limit,
        headers=job.request_headers(),
        tls=job.tls or None,
        # live per-tick re-resolution: a discovery service mutating
        # its list adds/removes targets mid-loop (additions scrape
        # at the job's scheme/path; their group labels attach on the
        # NEXT stream construction — the relabel hop is a
        # plan-compile-time mapping)
        http_sd=job.http_sd or None,
        sd_scheme=job.scheme,
        sd_path=job.metrics_path,
        # target_limit rides the limits map and is enforced at
        # partition construction each tick (so an http_sd fleet that
        # grows past the cap flips the whole pool to up 0 mid-loop,
        # upstream's mark-failed-without-scraping semantics)
        limits=job.guard_limits(),
    )
    scraped = scraped_samples(
        lines,
        metric_relabel_configs=job.metric_relabel_configs or None,
        honor_timestamps=job.honor_timestamps,
        fallback_protocol=job.fallback_scrape_protocol,
    )
    return attach_target_labels(
        scraped, targets, job.honor_labels, default_job=job.job_name
    )


class ScrapingServer:
    """A running engine from one prometheus.yml — the switching
    user's whole deployment in one object (`serve_scraped_config`):
    every scrape_configs job's loop started as a streaming query
    (micro-batch per tick at the job's own scrape_interval), the
    accumulated scrape logs unioned, staleness-synthesized, and
    served through a full MetricsExposer — PromQL read API, rules
    and alerts from the config's rule_files, Alertmanager pool from
    its alerting section, `/metrics` re-exposing the scraped state
    (multi-label and summary families included), `up` and the other
    scrape synthetics queryable.

    The demo/test sink is the in-memory table (driver-resident, log
    grows per tick); a production deployment points the SAME
    scrape_job_stream at a parquet/Kafka sink and passes that
    relation as the exposer's `samples_fn` — nothing else changes."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: ScrapeConfig,
        exposer,
        streams,
        tables: "list[str] | None" = None,
    ):
        self.spark = spark
        self.config = cfg
        self.exposer = exposer
        self.streams = streams
        self.tables = tables or []
        #: per-remote-write-entry high-water mark (max pushed ts_us):
        #: push_remote_writes sends only samples newer than it, so a
        #: cadence caller pushes each scrape's delta exactly once —
        #: the driver-held twin of upstream's WAL read position
        self._rw_watermarks: "dict[str, int]" = {}

    def scraped_samples_now(self):
        """The CURRENT accumulated scrape state as the §1.2 samples
        relation (the same derivation the exposer's read API
        serves)."""
        from shards_prometheus_spark.sources.scraper import (
            scraped_as_samples,
            scraped_with_staleness,
        )

        log = self.spark.table(self.tables[0])
        for n in self.tables[1:]:
            log = log.unionByName(
                self.spark.table(n), allowMissingColumns=True
            )
        return scraped_as_samples(scraped_with_staleness(log))

    def push_remote_writes(self) -> "dict[str, list]":
        """Push the scrape log's NEW samples (per-entry watermark on
        ts_us) through every configured `remote_write:` entry — the
        config-driven continuous-push loop, driven at the caller's
        cadence (tests/the rule loop; a production deployment points
        `remote_write_sink` at the same scrape_job_stream with a
        real checkpoint instead). Each entry applies its write
        policy (external_labels then write_relabel_configs),
        protocol, timeout, and auth headers; returns {entry: status
        rows} — delivery problems are data, and a fully-failed push
        leaves the watermark unmoved so the next call retries."""
        from pyspark.sql import functions as _F

        from shards_prometheus_spark.sources.remote_write import (
            apply_write_policy,
            push_samples,
        )

        if not self.config.remote_write or not self.tables:
            return {}
        samples = self.scraped_samples_now()
        if "stale" in samples.columns:
            samples = samples.filter(
                ~_F.coalesce(_F.col("stale"), _F.lit(False))
            )
        results: "dict[str, list]" = {}
        for entry in self.config.remote_write:
            key = entry.name or entry.url
            wm = self._rw_watermarks.get(key, -(2**62))
            fresh = samples.filter(_F.col("ts_us") > wm)
            hi = fresh.agg(_F.max("ts_us").alias("hi")).first()["hi"]
            if hi is None:
                results[key] = []
                continue
            shaped = apply_write_policy(
                fresh, entry, self.config.external_labels
            )
            statuses = push_samples(
                shaped,
                entry.url,
                timeout_s=entry.timeout_s,
                protocol=entry.protocol,
                extra_headers=entry.request_headers(),
            ).collect()
            if any(200 <= r["status"] < 300 for r in statuses) or not statuses:
                self._rw_watermarks[key] = hi
            results[key] = statuses
        return results

    def stop(self) -> None:
        for q in self.streams:
            try:
                q.stop()
            except Exception:  # noqa: BLE001 - stop the rest anyway
                pass
        self.exposer.stop()


def serve_scraped_config(
    spark: SparkSession,
    config_text: str,
    sf_dir: str,
    max_ticks: int = 0,
    trigger_seconds: "float | None" = None,
    rule_file: "str | None" = None,
) -> ScrapingServer:
    """prometheus.yml in → running engine out. Parses the config,
    starts one scrape loop per job (each at its own
    `scrape_interval` unless `trigger_seconds` overrides — tests use
    a fast trigger + `max_ticks`), and serves the read API over the
    union of the accumulating scrape logs with staleness markers
    applied, via `scraper.scraped_as_samples`. The exposer also
    re-serves `/metrics` from the scraped registry
    (`exposition.classified_lines`), so a downstream server can
    federate this one."""
    import re as _re

    from shards_prometheus_spark.sources.exposition import (
        MetricsExposer,
        classified_lines,
        classify_summary_families,
    )
    from shards_prometheus_spark.sources.scraper import (
        SYNTHETIC_METRICS,
        registry_from_scrapes,
        scraped_as_samples,
        scraped_with_staleness,
    )

    cfg = load_scrape_configs(config_text)
    if not cfg.jobs:
        raise ValueError("config declares no scrape_configs jobs")
    streams = []
    tables = []
    token = abs(hash(config_text)) % 100_000
    for job in cfg.jobs:
        name = "scrape_srv_{}_{}".format(
            _re.sub(r"\W", "_", job.job_name), token
        )
        secs = (
            trigger_seconds
            if trigger_seconds is not None
            else job.interval_us / 1e6
        )
        q = (
            scrape_job_stream(spark, job, max_ticks=max_ticks)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .trigger(processingTime=f"{secs} seconds")
            .start()
        )
        streams.append(q)
        tables.append(name)

    def samples_fn():
        logs = [spark.table(n) for n in tables]
        log = logs[0]
        for more in logs[1:]:
            log = log.unionByName(more, allowMissingColumns=True)
        return scraped_as_samples(scraped_with_staleness(log))

    def lines_fn():
        log = spark.table(tables[0])
        for n in tables[1:]:
            log = log.unionByName(spark.table(n), allowMissingColumns=True)
        reg = registry_from_scrapes(log)
        from pyspark.sql import functions as _F

        # family-level summary completion (batch context — this IS
        # the documented place): without it a scraped summary family
        # re-exposes with CONFLICTING headers — '# TYPE x summary'
        # for its quantile rows plus '# TYPE x histogram' for the
        # per-row-classified _sum/_count siblings — and a federating
        # Prometheus rejects the payload on duplicate TYPE metadata
        reg = classify_summary_families(reg)
        return classified_lines(
            reg.filter(~_F.col("metric").isin(*SYNTHETIC_METRICS))
        )

    exposer = MetricsExposer(
        spark,
        sf_dir,
        samples_fn=samples_fn,
        lines_fn=lines_fn,
        scrape_config=config_text,
        rule_file=rule_file,
    ).start()
    return ScrapingServer(spark, cfg, exposer, streams, tables)
