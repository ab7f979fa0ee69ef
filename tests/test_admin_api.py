"""TSDB admin API (upstream --web.enable-admin-api):
delete_series tombstones masking every read path, clean_tombstones as
a successful no-op over the immutable store, snapshot as a distributed
parquet write — all gated behind the admin flag (503 when off).
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.parse
import urllib.request

import pytest

from tests.conftest import SF_SMOKE


def _post(base: str, path: str, params: dict):
    body = urllib.parse.urlencode(params, doseq=True).encode()
    req = urllib.request.Request(
        base + path,
        data=body,
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as resp:
        raw = resp.read()
        return resp.status, json.loads(raw) if raw else None


def _get(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=120) as resp:
        return resp.status, json.loads(resp.read())


def _series(base: str, match: str, extra: str = "") -> list:
    q = urllib.parse.quote(match)
    _, payload = _get(base, f"/api/v1/series?match[]={q}{extra}")
    return payload["data"]


def test_delete_series_masks_reads(spark, tmp_path):
    from shards_prometheus_spark.sources import MetricsExposer

    exposer = MetricsExposer(
        spark, SF_SMOKE, admin_api=True, snapshot_dir=str(tmp_path)
    ).start()
    base = f"http://{exposer.host}:{exposer.port}"
    try:
        n_user1 = len(_series(base, 'click{user="1"}'))
        assert n_user1 >= 1  # one per shard (multi-label store)
        n_click = len(_series(base, "click"))
        assert n_click > n_user1

        status, _ = _post(
            base,
            "/api/v1/admin/tsdb/delete_series",
            {"match[]": 'click{user="1"}'},
        )
        assert status == 204
        # the deleted series is gone from every read; siblings stay
        assert _series(base, 'click{user="1"}') == []
        assert len(_series(base, "click")) == n_click - n_user1
        assert len(_series(base, "view")) > 0

        # clean_tombstones: successful no-op, the mask stays
        status, _ = _post(
            base, "/api/v1/admin/tsdb/clean_tombstones", {}
        )
        assert status == 204
        assert _series(base, 'click{user="1"}') == []

        # snapshot: the CURRENT masked relation, written distributed
        status, payload = _post(
            base, "/api/v1/admin/tsdb/snapshot", {}
        )
        assert status == 200
        name = payload["data"]["name"]
        snap = spark.read.parquet(
            os.path.join(str(tmp_path), name, "samples.parquet")
        )
        assert snap.count() == exposer.read_samples().count()
        assert (
            snap.filter(
                "metric = 'click' AND element_at(labels, 'user') = '1'"
            ).count()
            == 0
        )

        # invalid selector: 400, no state change
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(
                base,
                "/api/v1/admin/tsdb/delete_series",
                {"match[]": "rate(click[5m])"},
            )
        assert exc.value.code == 400
    finally:
        exposer.stop()


def test_delete_series_time_range(spark):
    """A [start, end]-bounded delete masks only in-range samples: the
    series survives with its newer points."""
    from pyspark.sql import functions as F

    from shards_prometheus_spark.model import samples_multi
    from shards_prometheus_spark.sources import MetricsExposer

    s = samples_multi(spark, SF_SMOKE).filter("metric = 'view'")
    row = s.agg(
        F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")
    ).collect()[0]
    mid_s = (row["lo"] + (row["hi"] - row["lo"]) // 2) / 1e6
    n_before = s.count()

    exposer = MetricsExposer(spark, SF_SMOKE, admin_api=True).start()
    base = f"http://{exposer.host}:{exposer.port}"
    try:
        status, _ = _post(
            base,
            "/api/v1/admin/tsdb/delete_series",
            {"match[]": "view", "end": str(mid_s)},
        )
        assert status == 204
        remaining = exposer.read_samples().filter(
            "metric = 'view'"
        )
        n_after = remaining.count()
        assert 0 < n_after < n_before
        assert remaining.agg(F.min("ts_us")).collect()[0][0] > int(
            mid_s * 1e6
        )
        # the series itself still exists (newer samples)
        assert len(_series(base, "view")) > 0
    finally:
        exposer.stop()


def test_admin_api_disabled_answers_unavailable(spark):
    from shards_prometheus_spark.sources import MetricsExposer

    exposer = MetricsExposer(spark, SF_SMOKE).start()
    base = f"http://{exposer.host}:{exposer.port}"
    try:
        for ep in ("delete_series", "clean_tombstones", "snapshot"):
            with pytest.raises(urllib.error.HTTPError) as exc:
                _post(
                    base,
                    f"/api/v1/admin/tsdb/{ep}",
                    {"match[]": "click"},
                )
            assert exc.value.code == 503
            payload = json.loads(exc.value.read())
            assert payload["errorType"] == "unavailable"
            assert "disabled" in payload["error"]
    finally:
        exposer.stop()


def test_admin_api_rejects_get(spark):
    """State-mutating admin endpoints are POST/PUT only (upstream
    registers them via r.Post/r.Put): a plain GET answers 405 and
    changes NO state — a prefetcher or crawler hitting the URL must
    never delete series or trigger a snapshot write."""
    from shards_prometheus_spark.sources import MetricsExposer

    exposer = MetricsExposer(spark, SF_SMOKE, admin_api=True).start()
    base = f"http://{exposer.host}:{exposer.port}"
    try:
        n_click = len(_series(base, "click"))
        assert n_click > 0
        for ep, q in (
            ("delete_series", "?match[]=click"),
            ("clean_tombstones", ""),
            ("snapshot", ""),
        ):
            with pytest.raises(urllib.error.HTTPError) as exc:
                _get(base, f"/api/v1/admin/tsdb/{ep}{q}")
            assert exc.value.code == 405
            payload = json.loads(exc.value.read())
            assert payload["errorType"] == "method_not_allowed"
        # the GETs mutated nothing: every series still reads back
        assert len(_series(base, "click")) == n_click
    finally:
        exposer.stop()
