"""Property-based tests (hypothesis) for the Tier A metric semantics.

The reference's semantics are simple invariants (counter = sum of
non-negative increments, gauge = last write, histogram buckets
partition the samples); hypothesis drives them with arbitrary sample
batches instead of fixtures, checking the DataFrame implementations
against direct Python folds.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shards_prometheus_spark.registry_api import MetricsRegistry

BOUNDS = [1.0, 5.0, 25.0]

sample_rows = st.lists(
    st.tuples(
        st.sampled_from(["m1", "m2"]),          # metric
        st.sampled_from(["a", "b", "c"]),       # label
        st.floats(
            min_value=-100, max_value=1000,
            allow_nan=False, allow_infinity=False,
        ),
    ),
    min_size=1,
    max_size=60,
)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _registry(spark, rows):
    data = [
        (i, m, lab, 1_000 * i, float(v))
        for i, (m, lab, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, metric string, label_user string, "
        "ts_us long, value double",
    )
    return MetricsRegistry(df), data


@given(rows=sample_rows)
@_slow
def test_counter_total_is_sum_of_nonnegative(spark, rows):
    reg, data = _registry(spark, rows)
    got = {
        (r["metric"], r["label_user"]): r["total"]
        for r in reg.counter_total().collect()
    }
    want: dict = {}
    for _, m, lab, _, v in data:
        if v >= 0:
            want[(m, lab)] = want.get((m, lab), 0.0) + v
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


@given(rows=sample_rows)
@_slow
def test_gauge_last_is_final_write(spark, rows):
    reg, data = _registry(spark, rows)
    got = {
        (r["metric"], r["label_user"]): r["last"]
        for r in reg.gauge_last().collect()
    }
    want: dict = {}
    for _, m, lab, _, v in data:  # data is ts/event ordered
        want[(m, lab)] = v
    assert got == want


@given(rows=sample_rows)
@_slow
def test_histogram_partitions_and_cumulates(spark, rows):
    reg, data = _registry(spark, rows)
    out = reg.histogram(BOUNDS).collect()
    # bucket counts partition the samples per series
    per_series: dict = {}
    for _, m, lab, _, v in data:
        per_series[(m, lab)] = per_series.get((m, lab), 0) + 1
    totals: dict = {}
    for r in out:
        k = (r["metric"], r["label_user"])
        totals[k] = totals.get(k, 0) + r["bucket_count"]
        assert r["hist_count"] == per_series[k]
    assert totals == per_series
    # cumulative counts are monotone per series, ending at the total
    by_series: dict = {}
    for r in out:
        by_series.setdefault((r["metric"], r["label_user"]), []).append(
            (r["bucket_idx"], r["cum_count"])
        )
    for k, pairs in by_series.items():
        pairs.sort()
        cums = [c for _, c in pairs]
        assert cums == sorted(cums)
        assert cums[-1] == per_series[k]


def test_dedup_clusters_invariants(spark):
    """Structural invariants of connected-components clustering: every
    near-dup edge stays inside one cluster, cluster_id is the component
    minimum, and each cluster has exactly one keeper (its minimum)."""
    from shards_prometheus_spark.operators.dedup import dedup_clusters, dedup_near
    from tests.conftest import SF_SMOKE

    clusters = {r["doc_id"]: (r["cluster_id"], r["is_keeper"])
                for r in dedup_clusters(spark, SF_SMOKE).collect()}
    edges = dedup_near(spark, SF_SMOKE).select("doc_a", "doc_b").collect()
    assert edges, "smoke corpus must contain near-dup pairs"
    members: dict = {}
    for doc, (cid, keeper) in clusters.items():
        assert cid <= doc
        assert keeper == (1 if cid == doc else 0)
        members.setdefault(cid, []).append(doc)
    for e in edges:
        assert clusters[e["doc_a"]][0] == clusters[e["doc_b"]][0]
    for cid, docs in members.items():
        assert min(docs) == cid
        assert sum(clusters[d][1] for d in docs) == 1


def test_pack_chunks_conservation(spark):
    """Packing is lossless: every chunk except the last is exactly full,
    chunk ids are contiguous from 0, and token totals are conserved."""
    from shards_prometheus_spark.operators.pipeline import CHUNK_TOKENS, pack_chunks
    from shards_prometheus_spark.operators.tierc_common import doc_token_ids
    from tests.conftest import SF_SMOKE

    chunks = sorted(
        (r["chunk_id"], r["n_tokens"])
        for r in pack_chunks(spark, SF_SMOKE).collect()
    )
    total = doc_token_ids(spark, SF_SMOKE).count()
    assert [c for c, _ in chunks] == list(range(len(chunks)))
    assert all(n == CHUNK_TOKENS for _, n in chunks[:-1])
    assert 0 < chunks[-1][1] <= CHUNK_TOKENS
    assert sum(n for _, n in chunks) == total


def test_split_assign_partitions_corpus(spark):
    """Every doc lands in exactly one split; proportions are near 90/5/5."""
    from shards_prometheus_spark.operators.pipeline import split_assign
    from tests.conftest import SF_SMOKE

    rows = split_assign(spark, SF_SMOKE).collect()
    n = len(rows)
    by = {}
    for r in rows:
        by[r["split"]] = by.get(r["split"], 0) + 1
    assert set(by) <= {"train", "val", "test"}
    assert sum(by.values()) == n
    assert by["train"] / n > 0.8


def test_kmeans_partitions_corpus(spark):
    """Every vector lands in exactly one final cluster; centroid norms
    are positive and k ≤ 4 clusters survive."""
    from shards_prometheus_spark.model import load_table
    from shards_prometheus_spark.operators.similarity import similarity_kmeans
    from tests.conftest import SF_SMOKE

    rows = similarity_kmeans(spark, SF_SMOKE).collect()
    n_vecs = load_table(spark, SF_SMOKE, "embeddings").count()
    assert 1 <= len(rows) <= 4
    assert sum(r["n_members"] for r in rows) == n_vecs
    assert all(r["centroid_norm"] > 0 for r in rows)


def test_funnel_is_monotone(spark):
    """Funnel counts can only shrink stage to stage; conversion from
    the first stage is 1.0 by construction."""
    from shards_prometheus_spark.operators.olap import funnel_stages
    from tests.conftest import SF_SMOKE

    rows = {r["stage"]: r for r in funnel_stages(spark, SF_SMOKE).collect()}
    assert rows["signup"]["conv_rate"] == 1.0
    assert rows["signup"]["n_users"] >= rows["view"]["n_users"]
    assert rows["view"]["n_users"] >= rows["purchase"]["n_users"]


def test_retention_triangle_shape(spark):
    """Week-0 retention is 1.0 for every cohort (everyone is active in
    their own first week) and no cell exceeds its cohort size."""
    from shards_prometheus_spark.operators.olap import retention_cohorts
    from tests.conftest import SF_SMOKE

    rows = retention_cohorts(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 < r["n_active"] <= r["cohort_size"]
        if r["week_offset"] == 0:
            assert r["retention"] == 1.0


_label_values = st.lists(
    st.text(
        alphabet=st.characters(
            codec="ascii", exclude_characters='\x00'
        ),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=12,
)


@given(vals=_label_values)
@_slow
def test_promql_matcher_semantics_match_python_re(spark, vals):
    """PromQL matchers vs a Python ground truth over arbitrary ASCII
    label values: `=~` is fully anchored, `!~` its complement, and
    `!=`/`=""` treat a missing label as empty — the public matcher
    semantics, via the evaluator end to end."""
    import re

    from shards_prometheus_spark.functions.promql_parser import (
        PromQLEvaluator,
    )

    rows = [
        (i, i, "m", {"user": v} if v != "" else {}, 1_000_000, float(i))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, series_id long, metric string, "
        "labels map<string,string>, ts_us long, value double",
    )
    ev = PromQLEvaluator(df)
    pattern = "a.*|[0-4]"

    def got(expr):
        return sorted(r["value"] for r in ev.eval(expr).collect())

    # fullmatch, not ^(?:re)$ + match: Python's `$` matches BEFORE a
    # trailing newline, so the ground truth would wrongly admit
    # values like "0\n" that RE2/Prometheus \z anchoring rejects
    # (hypothesis counterexample, r10)
    anchored = re.compile(pattern)
    assert got(f'm{{user=~"{pattern}"}}') == sorted(
        float(i) for i, v in enumerate(vals) if anchored.fullmatch(v)
    )
    assert got(f'm{{user!~"{pattern}"}}') == sorted(
        float(i) for i, v in enumerate(vals) if not anchored.fullmatch(v)
    )
    assert got('m{user=""}') == sorted(
        float(i) for i, v in enumerate(vals) if v == ""
    )


def test_promql_matcher_carriage_return_matches_re2(spark):
    """Deterministic pin of the RE2-vs-Java line-terminator case the
    property test above found: Java regex treats ``\\r`` as a line
    terminator (``.`` skips it, ``$`` matches before it) while
    RE2/Prometheus excludes only ``\\n`` — so ``"a\\r0"`` must match
    ``user=~"a.*|[0-4]"`` and ``"a\\r"`` must match ``user=~"a."``.
    Fixed by anchoring with ``(?d)…\\z`` (labelset.py apply_matchers)."""
    from shards_prometheus_spark.functions.promql_parser import (
        PromQLEvaluator,
    )

    vals = ["a\r0", "a\r", "a\n0", "b ", "plain", "0\n"]
    rows = [
        (i, i, "m", {"user": v}, 1_000_000, float(i))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, series_id long, metric string, "
        "labels map<string,string>, ts_us long, value double",
    )
    ev = PromQLEvaluator(df)

    def got(expr):
        return sorted(r["value"] for r in ev.eval(expr).collect())

    # "a\r0" matches a.* (RE2 `.` matches \r); "a\n0" does not
    # (`.` never matches \n); "a\r" matches via a.* too.
    assert got('m{user=~"a.*|[0-4]"}') == [0.0, 1.0]
    # `a.` must consume the \r / U+2028 as an ordinary char.
    assert got('m{user=~"a."}') == [1.0]
    # $-bearing user regex: full anchoring must not let Java's $
    # match before a trailing terminator.
    assert got('m{user=~"a$"}') == []
    assert got('m{user=~"b "}') == [3.0]
    # "0\n" must NOT match [0-4]: Python's `$` would admit it
    # before the trailing newline, RE2's \z anchoring does not
    # (the r10 hypothesis counterexample, pinned)
    assert got('m{user!~"a.*|[0-4]"}') == [2.0, 3.0, 4.0, 5.0]


def _render(node):
    """Canonical PromQL rendering of the small AST subset the strategy
    below generates."""
    from shards_prometheus_spark.functions import promql_parser as P

    if isinstance(node, P.Selector):
        s = node.metric
        if node.matchers:
            s += "{" + ",".join(
                f'{l}{op}"{v}"' for l, op, v in node.matchers
            ) + "}"
        if node.range_us is not None:
            s += f"[{node.range_us // 1_000_000}s]"
        if node.offset_us:
            s += f" offset {node.offset_us // 1_000_000}s"
        return s
    if isinstance(node, P.Subquery):
        s = f"{_render(node.expr)}[{node.range_us // 1_000_000}s"
        s += f":{node.step_us // 1_000_000}s]"
        if node.offset_us:
            s += f" offset {node.offset_us // 1_000_000}s"
        return s
    if isinstance(node, P.RangeFn):
        if node.fn == "quantile_over_time":
            return (
                f"quantile_over_time({node.param}, {_render(node.sel)})"
            )
        if node.fn == "predict_linear":
            return f"predict_linear({_render(node.sel)}, {node.param})"
        return f"{node.fn}({_render(node.sel)})"
    if isinstance(node, P.Agg):
        by = f" by ({', '.join(node.by)})" if node.by else ""
        return f"{node.op}{by} ({_render(node.expr)})"
    if isinstance(node, P.MathFn):
        return f"{node.fn}({_render(node.expr)})"
    raise AssertionError(node)


_name = st.from_regex(r"[a-z][a-z0-9_]{0,6}", fullmatch=True).filter(
    lambda s: s
    not in {
        "sum", "avg", "min", "max", "count", "quantile", "group",
        "stddev", "stdvar", "topk", "bottomk", "sort", "abs", "ceil",
        "floor", "exp", "ln", "log2", "log10", "sqrt", "sgn", "sin",
        "cos", "tan", "asin", "acos", "atan", "sinh", "cosh", "tanh",
        "asinh", "acosh", "atanh", "deg", "rad", "rate", "irate",
        "increase", "delta", "idelta", "resets", "changes", "deriv",
        "absent", "vector", "time", "scalar", "round", "clamp", "by",
        "on", "ignoring", "and", "or", "unless", "offset", "bool",
        "without", "timestamp", "minute", "hour", "month", "year",
    }
)


@st.composite
def _ast(draw):
    from shards_prometheus_spark.functions import promql_parser as P

    metric = draw(_name)
    matchers = draw(
        st.lists(
            st.tuples(
                _name,
                st.sampled_from(["=", "!=", "=~", "!~"]),
                st.from_regex(r"[a-z0-9.*+]{0,5}", fullmatch=True),
            ),
            max_size=2,
        )
    )
    sel = P.Selector(metric, list(matchers))
    sel.offset_us = draw(st.sampled_from([0, 60_000_000]))
    kind = draw(
        st.sampled_from(["instant", "range", "agg", "math", "subq"])
    )
    if kind == "instant":
        return sel
    if kind == "range":
        sel.range_us = 300_000_000
        return P.RangeFn(draw(st.sampled_from(["rate", "increase"])), sel)
    if kind == "subq":
        # counter-family AND *_over_time outers over a subquery whose
        # inner is an instant selector or a range function
        if draw(st.booleans()):
            # instant selector inner; its own offset is not renderable
            # inside subquery brackets (offset binds to the subquery)
            sel.offset_us = 0
            inner = sel
        else:
            rsel = P.Selector(metric, list(matchers))
            rsel.offset_us = sel.offset_us
            rsel.range_us = 300_000_000
            inner = P.RangeFn("rate", rsel)
        sub = P.Subquery(
            inner,
            3_600_000_000,
            300_000_000,
            offset_us=draw(st.sampled_from([0, 60_000_000])),
        )
        # r7 counter family + r8 phi/regression folds over subqueries
        fn = draw(
            st.sampled_from(
                ["rate", "increase", "delta", "resets",
                 "max_over_time", "last_over_time",
                 "quantile_over_time", "deriv", "predict_linear"]
            )
        )
        param = {
            "quantile_over_time": 0.9, "predict_linear": 600.0,
        }.get(fn)
        return P.RangeFn(fn, sub, param=param)
    if kind == "math":
        return P.MathFn(draw(st.sampled_from(["abs", "sqrt"])), sel)
    sel.range_us = 300_000_000
    inner = P.RangeFn("rate", sel)
    by = draw(st.lists(_name, max_size=2, unique=True))
    return P.Agg(draw(st.sampled_from(["sum", "avg"])), inner, by)


@given(node=_ast())
@settings(max_examples=60, deadline=None)
def test_promql_parse_render_round_trip(node):
    """render(ast) reparses to the identical AST (dataclass equality)
    across selectors, matchers, offsets, range fns, aggs, math fns."""
    from shards_prometheus_spark.functions.promql_parser import parse

    assert parse(_render(node)) == node


# -- canonical label string round trip (pure Python, no Spark) ---------

_struct = st.text(
    alphabet=st.sampled_from(list('abz09 ,=\\"\n')), max_size=8
)


def _py_esc(s: str) -> str:
    """labelset._esc replicated in Python (backslash first — the
    Spark twin's replace order; equality of the two renderings is
    pinned by test_parse_label_str_inverse_of_label_str)."""
    return (
        s.replace("\\", "\\\\").replace(",", "\\,").replace("=", "\\=")
    )


@given(st.dictionaries(_struct, _struct, max_size=5))
def test_parse_label_str_roundtrip_property(d):
    """query_api.parse_label_str inverts the canonical rendering for
    ARBITRARY keys/values containing the structural characters."""
    from shards_prometheus_spark.sources.query_api import parse_label_str

    s = ",".join(
        f"{_py_esc(k)}={_py_esc(v)}" for k, v in sorted(d.items())
    )
    assert parse_label_str(s) == d
