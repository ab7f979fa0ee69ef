"""PromQL expression evaluator: parse a PromQL string, compile it to a
Spark DataFrame plan.

The reference's data is queried through the Prometheus server's PromQL
endpoint (SURVEY.md §2b); this module closes the last switch-over gap —
a reference user types PromQL strings, so the engine accepts them
directly instead of only pre-registered operator functions.

Supported core (instant query at evaluation time T):

- selectors: ``metric{label="v", label=~"re", label!="v", label!~"re"}``
- range selectors + functions: ``rate, irate, increase, delta, resets,
  avg_over_time, min_over_time, max_over_time, sum_over_time,
  count_over_time, last_over_time`` over ``m[<dur>]``
- ``offset <dur>`` modifier; ``absent(selector)``
- aggregation: ``sum/avg/min/max/count [by (l1, l2) | without (l1)]
  (expr)`` and ``topk/bottomk(k, expr)``
- binary ops: vector⋄scalar and vector⋄vector arithmetic
  (``+ - * / %``) with label matching — implicit full-set,
  ``on (l1, …)`` / ``ignoring (l1, …)``, and many-to-one
  ``group_left`` — and comparison filters (``> >= < <= == !=``)

Evaluation model: T = the max sample timestamp, carried as a COLUMN
(broadcast 1-row relation, never collected) so the whole expression
stays one declarative plan — filters on metric reach the parquet scan,
range windows become per-series aggregations, label grouping is
``element_at(labels, k)``. Everything compiles to the same shapes the
registered operators use, so the scale properties (pushdown, map-side
partials, no cartesians) carry over.

Compare the reference chain: shards → exposition → Prometheus server →
PromQL HTTP API (prometheus.cpp:27-93 exposes; the server evaluates).
Here the evaluator runs inside the engine.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shards_prometheus_spark.model import samples_multi

#: Staleness lookback for instant selectors (PromQL default 5m).
LOOKBACK_US = 300_000_000

_DUR_US = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000, "d": 86_400_000_000}

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<num>\d+(?:\.\d+)?(?:[smhd])?)      # number or duration
      | (?P<id>[A-Za-z_][A-Za-z0-9_]*)
      | (?P<str>"[^"]*")
      | (?P<op>=~|!~|!=|==|>=|<=|[{}()\[\],=<>+\-*/%])
    )""",
    re.VERBOSE,
)

_AGG_OPS = {"sum", "avg", "min", "max", "count"}
_TOPK_OPS = {"topk", "bottomk"}
_RANGE_FNS = {
    "rate",
    "irate",
    "increase",
    "delta",
    "resets",
    "avg_over_time",
    "min_over_time",
    "max_over_time",
    "sum_over_time",
    "count_over_time",
    "last_over_time",
}
_CMP_OPS = {">", ">=", "<", "<=", "==", "!="}


class PromQLSyntaxError(ValueError):
    pass


@dataclass
class Selector:
    metric: str
    matchers: list[tuple[str, str, str]] = field(default_factory=list)
    range_us: int | None = None
    offset_us: int = 0


@dataclass
class RangeFn:
    fn: str
    sel: Selector


@dataclass
class Agg:
    op: str
    expr: object
    by: list[str] = field(default_factory=list)
    k: int | None = None
    #: grouping mode: "by" keeps exactly `by`; "without" drops them
    mode: str = "by"


@dataclass
class BinOp:
    op: str
    lhs: object
    rhs: object
    #: vector-matching modifier: ("on"|"ignoring", [labels]) or None
    match: tuple[str, list[str]] | None = None
    #: many-to-one: left side keeps its full label set
    group_left: bool = False


@dataclass
class Scalar:
    value: float


@dataclass
class Absent:
    sel: Selector


def _tokenize(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if m is None or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise PromQLSyntaxError(f"cannot tokenize at: {s[pos:]!r}")
        tok = next(v for v in m.groups() if v is not None)
        out.append(tok)
        pos = m.end()
    return out


def _dur_us(tok: str) -> int:
    m = re.fullmatch(r"(\d+(?:\.\d+)?)([smhd])", tok)
    if not m:
        raise PromQLSyntaxError(f"expected duration, got {tok!r}")
    return int(float(m.group(1)) * _DUR_US[m.group(2)])


class _Parser:
    """Recursive descent; precedence: cmp < add < mul < unary."""

    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise PromQLSyntaxError("unexpected end of expression")
        self.i += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.next()
        if got != tok:
            raise PromQLSyntaxError(f"expected {tok!r}, got {got!r}")

    def parse(self):
        e = self.cmp_expr()
        if self.peek() is not None:
            raise PromQLSyntaxError(f"trailing tokens: {self.toks[self.i:]}")
        return e

    def _matching(self) -> tuple[tuple[str, list[str]] | None, bool]:
        """Optional `on(…)/ignoring(…)` + `group_left` after a binop."""
        match = None
        group_left = False
        if self.peek() in {"on", "ignoring"}:
            kind = self.next()
            self.expect("(")
            labels: list[str] = []
            while self.peek() != ")":
                labels.append(self.next())
                if self.peek() == ",":
                    self.next()
            self.expect(")")
            match = (kind, labels)
        if self.peek() == "group_left":
            self.next()
            group_left = True
        return match, group_left

    def cmp_expr(self):
        e = self.add_expr()
        while self.peek() in _CMP_OPS:
            op = self.next()
            match, gl = self._matching()
            e = BinOp(op, e, self.add_expr(), match=match, group_left=gl)
        return e

    def add_expr(self):
        e = self.mul_expr()
        while self.peek() in {"+", "-"}:
            op = self.next()
            match, gl = self._matching()
            e = BinOp(op, e, self.mul_expr(), match=match, group_left=gl)
        return e

    def mul_expr(self):
        e = self.primary()
        while self.peek() in {"*", "/", "%"}:
            op = self.next()
            match, gl = self._matching()
            e = BinOp(op, e, self.primary(), match=match, group_left=gl)
        return e

    def primary(self):
        tok = self.peek()
        if tok is None:
            raise PromQLSyntaxError("unexpected end of expression")
        if tok == "(":
            self.next()
            e = self.cmp_expr()
            self.expect(")")
            return e
        if re.fullmatch(r"\d+(?:\.\d+)?", tok):
            return Scalar(float(self.next()))
        if tok in _AGG_OPS:
            return self._agg()
        if tok in _TOPK_OPS:
            return self._topk()
        if tok in _RANGE_FNS:
            return self._range_fn()
        if tok == "absent":
            self.next()
            self.expect("(")
            sel = self._selector()
            self.expect(")")
            if sel.range_us is not None:
                raise PromQLSyntaxError("absent() takes an instant selector")
            return Absent(sel)
        return self._selector()

    def _agg(self):
        op = self.next()
        by: list[str] = []
        mode = "by"
        if self.peek() in {"by", "without"}:
            mode = self.next()
            self.expect("(")
            while self.peek() != ")":
                by.append(self.next())
                if self.peek() == ",":
                    self.next()
            self.expect(")")
        self.expect("(")
        e = self.cmp_expr()
        self.expect(")")
        return Agg(op, e, by, mode=mode)

    def _topk(self):
        op = self.next()
        self.expect("(")
        ktok = self.next()
        try:
            k = int(float(ktok))
        except ValueError:
            raise PromQLSyntaxError(
                f"{op}() needs a numeric k, got {ktok!r}"
            ) from None
        self.expect(",")
        e = self.cmp_expr()
        self.expect(")")
        return Agg(op, e, [], k=k)

    def _range_fn(self):
        fn = self.next()
        self.expect("(")
        sel = self._selector()
        self.expect(")")
        if sel.range_us is None:
            raise PromQLSyntaxError(f"{fn}() needs a range selector [d]")
        return RangeFn(fn, sel)

    def _selector(self) -> Selector:
        metric = self.next()
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", metric):
            raise PromQLSyntaxError(f"expected metric name, got {metric!r}")
        sel = Selector(metric)
        if self.peek() == "{":
            self.next()
            while self.peek() != "}":
                label = self.next()
                op = self.next()
                if op not in {"=", "!=", "=~", "!~"}:
                    raise PromQLSyntaxError(f"bad matcher op {op!r}")
                val = self.next()
                if not (val.startswith('"') and val.endswith('"')):
                    raise PromQLSyntaxError(f"matcher value must be quoted: {val!r}")
                sel.matchers.append((label, op, val[1:-1]))
                if self.peek() == ",":
                    self.next()
            self.expect("}")
        if self.peek() == "[":
            self.next()
            sel.range_us = _dur_us(self.next())
            self.expect("]")
        if self.peek() == "offset":
            self.next()
            sel.offset_us = _dur_us(self.next())
        return sel


def parse(expr: str):
    """PromQL string → AST."""
    return _Parser(_tokenize(expr)).parse()


# --------------------------------------------------------------------------
# Compilation to DataFrame plans
# --------------------------------------------------------------------------

#: Canonical label-set rendering: sorted `k=v` pairs joined by commas —
#: deterministic across engines (map iteration order is not).
def _label_str(labels: Column) -> Column:
    return F.array_join(
        F.transform(
            F.array_sort(F.map_entries(labels)),
            lambda e: F.concat(e.key, F.lit("="), e.value),
        ),
        ",",
    )


class PromQLEvaluator:
    """Compile PromQL ASTs against the multi-label samples relation.

    Every vector result is a DataFrame (labels MAP, label_str STRING,
    value DOUBLE); `t_max` (the evaluation time) rides along as a
    broadcast column, never collected.
    """

    def __init__(self, samples: DataFrame):
        """`samples` is any relation with (event_id, series_id, metric,
        labels MAP<STRING,STRING>, ts_us, value) — the §1.2 model."""
        tmax = samples.agg(F.max("ts_us").alias("t_max"))
        self.samples = samples.join(F.broadcast(tmax))

    @classmethod
    def from_dir(cls, spark: SparkSession, sf_dir: str) -> "PromQLEvaluator":
        return cls(samples_multi(spark, sf_dir))

    # -- selectors -------------------------------------------------------
    def _matched(self, sel: Selector) -> DataFrame:
        df = self.samples.filter(F.col("metric") == sel.metric)
        for label, op, val in sel.matchers:
            col = F.element_at("labels", F.lit(label))
            # PromQL regex matchers are FULLY ANCHORED (^pattern$) —
            # rlike alone is substring search and would over-match.
            anchored = f"^(?:{val})$"
            if op == "=":
                df = df.filter(col == val)
            elif op == "!=":
                df = df.filter(col != val)
            elif op == "=~":
                df = df.filter(col.rlike(anchored))
            else:
                df = df.filter(~col.rlike(anchored))
        return df

    def _instant(self, sel: Selector) -> DataFrame:
        end = F.col("t_max") - F.lit(sel.offset_us)
        df = self._matched(sel).filter(
            (F.col("ts_us") <= end) & (F.col("ts_us") > end - LOOKBACK_US)
        )
        w = Window.partitionBy("series_id").orderBy(
            F.desc("ts_us"), F.desc("event_id")
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("labels", F.col("value").cast("double").alias("value"))
        )

    def _range(self, node: RangeFn) -> DataFrame:
        sel, fn = node.sel, node.fn
        end = F.col("t_max") - F.lit(sel.offset_us)
        df = self._matched(sel).filter(
            (F.col("ts_us") <= end) & (F.col("ts_us") > end - sel.range_us)
        )
        keys = ["series_id"]
        if fn in {"avg_over_time", "min_over_time", "max_over_time",
                  "sum_over_time", "count_over_time"}:
            agg = {
                "avg_over_time": F.avg("value"),
                "min_over_time": F.min("value"),
                "max_over_time": F.max("value"),
                "sum_over_time": F.sum("value"),
                "count_over_time": F.count(F.lit(1)).cast("double"),
            }[fn]
            return (
                df.groupBy(*keys)
                .agg(F.first("labels").alias("labels"), agg.alias("value"))
                .select("labels", "value")
            )
        if fn == "last_over_time":
            w = Window.partitionBy(*keys).orderBy(
                F.desc("ts_us"), F.desc("event_id")
            )
            return (
                df.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("labels", F.col("value").cast("double").alias("value"))
            )
        # order-dependent fns share the lag spine
        w = Window.partitionBy(*keys).orderBy("ts_us", "event_id")
        d = df.withColumn("prev", F.lag("value").over(w)).withColumn(
            "rn_d",
            F.row_number().over(
                Window.partitionBy(*keys).orderBy(
                    F.desc("ts_us"), F.desc("event_id")
                )
            ),
        )
        clamped = F.when(
            F.col("value") < F.col("prev"), F.col("value")
        ).otherwise(F.col("value") - F.col("prev"))
        if fn in {"increase", "rate"}:
            out = d.filter(F.col("prev").isNotNull()).groupBy(*keys).agg(
                F.first("labels").alias("labels"),
                F.sum(clamped).alias("value"),
            )
            if fn == "rate":
                out = out.withColumn(
                    "value", F.col("value") / F.lit(sel.range_us / 1e6)
                )
            return out.select("labels", "value")
        if fn == "irate":
            return (
                d.filter((F.col("rn_d") == 1) & F.col("prev").isNotNull())
                .select("labels", clamped.alias("value"))
            )
        if fn == "delta":
            first_w = Window.partitionBy(*keys).orderBy("ts_us", "event_id")
            return (
                d.withColumn("rn_a", F.row_number().over(first_w))
                .groupBy(*keys)
                .agg(
                    F.first("labels").alias("labels"),
                    (
                        F.max(F.when(F.col("rn_d") == 1, F.col("value")))
                        - F.max(F.when(F.col("rn_a") == 1, F.col("value")))
                    ).alias("value"),
                )
                .select("labels", "value")
            )
        if fn == "resets":
            return (
                d.filter(F.col("prev").isNotNull())
                .groupBy(*keys)
                .agg(
                    F.first("labels").alias("labels"),
                    F.sum(
                        F.when(F.col("value") < F.col("prev"), 1).otherwise(0)
                    )
                    .cast("double")
                    .alias("value"),
                )
                .select("labels", "value")
            )
        raise PromQLSyntaxError(f"unsupported range function {fn!r}")

    # -- structure -------------------------------------------------------
    def _agg(self, node: Agg) -> DataFrame:
        child = self._vector(node.expr)
        if node.k is not None:  # topk / bottomk over the full vector
            # rank on the 6dp-pinned value (cross-engine accumulation
            # noise must not reorder ranks), ties broken on label text
            pinned = F.round(F.col("value"), 6)
            order = F.desc(pinned) if node.op == "topk" else F.asc(pinned)
            w = Window.orderBy(order, F.asc(_label_str(F.col("labels"))))
            return (
                child.withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= node.k)
                .drop("rk")
            )
        if node.mode == "without":
            new_labels = F.map_filter(
                F.col("labels"), lambda k, _v: ~k.isin(*node.by)
            ) if node.by else F.col("labels")
        else:
            new_labels = F.map_from_arrays(
                F.array(*[F.lit(b) for b in node.by]),
                F.array(
                    *[F.element_at("labels", F.lit(b)) for b in node.by]
                ),
            ) if node.by else F.map_from_arrays(F.array(), F.array())
        agg = {
            "sum": F.sum("value"),
            "avg": F.avg("value"),
            "min": F.min("value"),
            "max": F.max("value"),
            "count": F.count(F.lit(1)).cast("double"),
        }[node.op]
        grouped = child.withColumn("labels", new_labels).groupBy(
            _label_str(F.col("labels")).alias("_k")
        )
        return (
            grouped.agg(
                F.first("labels").alias("labels"), agg.alias("value")
            ).drop("_k")
        )

    def _binop(self, node: BinOp) -> DataFrame:
        lsc = isinstance(node.lhs, Scalar)
        rsc = isinstance(node.rhs, Scalar)
        if lsc and rsc:
            raise PromQLSyntaxError("scalar-scalar expressions unsupported")

        def apply(a: Column, b: Column) -> Column:
            return {
                "+": a + b, "-": a - b, "*": a * b, "/": a / b, "%": a % b,
            }[node.op]

        if node.op in _CMP_OPS:  # comparison = vector filter
            if rsc:
                vec = self._vector(node.lhs)
                thr = F.lit(node.rhs.value)
                # threshold the 6dp-pinned value: a discrete decision on
                # a raw accumulated double can flip across engines
                v6 = F.round(F.col("value"), 6)
                cond = {
                    ">": v6 > thr, ">=": v6 >= thr,
                    "<": v6 < thr, "<=": v6 <= thr,
                    "==": v6 == thr, "!=": v6 != thr,
                }[node.op]
                return vec.filter(cond)
            raise PromQLSyntaxError("comparisons need a scalar rhs")
        if rsc or lsc:
            vec = self._vector(node.lhs if rsc else node.rhs)
            sc = F.lit((node.rhs if rsc else node.lhs).value)
            val = apply(F.col("value"), sc) if rsc else apply(sc, F.col("value"))
            return vec.withColumn("value", val)
        # vector-vector: equi-join on the canonical string of the match
        # label set — full set by default, on()'s subset, or the map
        # minus ignoring()'s labels. group_left keeps the left side's
        # full label set (many-to-one); otherwise the output carries
        # exactly the match labels, per PromQL.
        def match_labels(labels_col: Column) -> Column:
            if node.match is None:
                return labels_col
            kind, ls = node.match
            if kind == "on":
                return F.map_from_arrays(
                    F.array(*[F.lit(l) for l in ls]),
                    F.array(
                        *[F.element_at(labels_col, F.lit(l)) for l in ls]
                    ),
                )
            return F.map_filter(
                labels_col, lambda k, _v: ~k.isin(*ls)
            )

        out_labels = (
            F.col("labels")
            if node.match is None or node.group_left
            else match_labels(F.col("labels"))
        )
        left = self._vector(node.lhs).select(
            _label_str(match_labels(F.col("labels"))).alias("_k"),
            out_labels.alias("labels"),
            F.col("value").alias("_l"),
        )
        right = self._vector(node.rhs).select(
            _label_str(match_labels(F.col("labels"))).alias("_k"),
            F.col("value").alias("_r"),
        )
        return left.join(right, "_k").select(
            "labels", apply(F.col("_l"), F.col("_r")).alias("value")
        )

    def _absent(self, node: Absent) -> DataFrame:
        """1 iff no series matches the selector at T, labeled with the
        selector's equality matchers (PromQL convention). The emptiness
        probe is a 1-row count aggregate — tiny, but necessarily a
        global fold (absence is a global fact)."""
        eq = [(l, v) for l, op, v in node.sel.matchers if op == "="]
        labels = (
            F.map_from_arrays(
                F.array(*[F.lit(l) for l, _ in eq]),
                F.array(*[F.lit(v) for _, v in eq]),
            )
            if eq
            else F.map_from_arrays(F.array(), F.array())
        )
        n = self._instant(node.sel).agg(F.count(F.lit(1)).alias("n"))
        return n.filter(F.col("n") == 0).select(
            labels.alias("labels"), F.lit(1.0).alias("value")
        )

    def _vector(self, node) -> DataFrame:
        if isinstance(node, Absent):
            return self._absent(node)
        if isinstance(node, Selector):
            if node.range_us is not None:
                raise PromQLSyntaxError(
                    "range selector outside a range function"
                )
            return self._instant(node)
        if isinstance(node, RangeFn):
            return self._range(node)
        if isinstance(node, Agg):
            return self._agg(node)
        if isinstance(node, BinOp):
            return self._binop(node)
        raise PromQLSyntaxError(f"not a vector expression: {node}")

    def eval(self, expr: str) -> DataFrame:
        """Evaluate a PromQL string → (label_str, value) DataFrame."""
        vec = self._vector(parse(expr))
        return vec.select(
            _label_str(F.col("labels")).alias("labels"),
            F.round("value", 4).alias("value"),
        )


def promql_eval(spark: SparkSession, sf_dir: str, expr: str) -> DataFrame:
    """One-shot: evaluate a PromQL expression over a dataset."""
    return PromQLEvaluator.from_dir(spark, sf_dir).eval(expr)


# --------------------------------------------------------------------------
# Registered demo expressions (driver-checkable against DuckDB oracles)
# --------------------------------------------------------------------------

from shards_prometheus_spark.model import SAMPLES_MULTI_CTE, dround  # noqa: E402

PROMQL_RATE_BY_USER = "sum by (user) (rate(click[720h]))"
PROMQL_TOPK_USERS = "topk(5, sum by (user) (increase(purchase[720h])))"
PROMQL_FILTER_REGEX = 'avg_over_time(view{shard=~"[0-3]"}[240h]) > 40'
PROMQL_RATIO = (
    "sum by (user) (increase(click[720h])) / "
    "sum by (user) (increase(view[720h]))"
)
PROMQL_SHARE = (
    "sum by (user, shard) (increase(click[720h])) / on (user) group_left "
    "sum by (user) (increase(click[720h]))"
)


def promql_rate_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parsed + compiled from the PromQL string — not a hand-built plan."""
    return promql_eval(spark, sf_dir, PROMQL_RATE_BY_USER)


def promql_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return promql_eval(spark, sf_dir, PROMQL_TOPK_USERS)


def promql_filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return promql_eval(spark, sf_dir, PROMQL_FILTER_REGEX)


def promql_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    return promql_eval(spark, sf_dir, PROMQL_RATIO)


def promql_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """on(user) group_left: each (user, shard) series' share of its
    user's total — the canonical many-to-one PromQL join."""
    return promql_eval(spark, sf_dir, PROMQL_SHARE)


_T_CTE = "t AS (SELECT MAX(ts_us) AS t_max FROM samples_multi)"
_H720_US = 720 * 3_600_000_000
_H240_US = 240 * 3_600_000_000


def _increase_cte(metric: str, rng_us: int, name: str) -> str:
    """Per-series clamped increase over (t_max - rng, t_max]."""
    return (
        f"{name}_w AS (SELECT s.* FROM samples_multi s, t "
        f"WHERE s.metric = '{metric}' AND s.ts_us <= t.t_max "
        f"AND s.ts_us > t.t_max - {rng_us}), "
        f"{name}_d AS (SELECT l_user, l_shard, value, "
        "LAG(value) OVER (PARTITION BY l_user, l_shard "
        f"ORDER BY ts_us, event_id) AS prev FROM {name}_w), "
        f"{name} AS (SELECT l_user, l_shard, "
        "SUM(CASE WHEN value < prev THEN value ELSE value - prev END) AS inc "
        f"FROM {name}_d WHERE prev IS NOT NULL GROUP BY l_user, l_shard)"
    )


QUERIES = {
    "promql_rate_by_user": promql_rate_by_user,
    "promql_topk_users": promql_topk_users,
    "promql_filter_regex": promql_filter_regex,
    "promql_ratio": promql_ratio,
    "promql_share": promql_share,
}

ORACLES = {
    "promql_rate_by_user": (
        f"{SAMPLES_MULTI_CTE}, {_T_CTE}, "
        + _increase_cte("click", _H720_US, "inc")
        + ", r AS (SELECT l_user, inc / "
        + f"{_H720_US / 1e6}"
        + " AS rate FROM inc) "
        "SELECT 'user=' || l_user AS labels, "
        + dround("SUM(rate)", 4)
        + " AS value FROM r GROUP BY l_user"
    ),
    "promql_topk_users": (
        f"{SAMPLES_MULTI_CTE}, {_T_CTE}, "
        + _increase_cte("purchase", _H720_US, "inc")
        + ", s AS (SELECT 'user=' || l_user AS labels, SUM(inc) AS v "
        "FROM inc GROUP BY l_user) "
        "SELECT labels, value FROM (SELECT labels, "
        + dround("v", 4)
        + " AS value, ROW_NUMBER() OVER (ORDER BY "
        + dround("v", 6)
        + " DESC, labels ASC) AS rk FROM s) WHERE rk <= 5"
    ),
    "promql_filter_regex": (
        f"{SAMPLES_MULTI_CTE}, {_T_CTE}, "
        "w AS (SELECT s.* FROM samples_multi s, t "
        "WHERE s.metric = 'view' "
        "AND regexp_matches(s.l_shard, '^(?:[0-3])$') "
        f"AND s.ts_us <= t.t_max AND s.ts_us > t.t_max - {_H240_US}), "
        "a AS (SELECT l_user, l_shard, AVG(value) AS v FROM w "
        "GROUP BY l_user, l_shard) "
        "SELECT 'shard=' || l_shard || ',user=' || l_user AS labels, "
        + dround("v", 4)
        + " AS value FROM a WHERE "
        + dround("v", 6)
        + " > 40"
    ),
    "promql_ratio": (
        f"{SAMPLES_MULTI_CTE}, {_T_CTE}, "
        + _increase_cte("click", _H720_US, "ca")
        + ", "
        + _increase_cte("view", _H720_US, "va")
        + ", cu AS (SELECT l_user, SUM(inc) AS v FROM ca GROUP BY l_user), "
        "vu AS (SELECT l_user, SUM(inc) AS v FROM va GROUP BY l_user) "
        "SELECT 'user=' || cu.l_user AS labels, "
        + dround("cu.v / vu.v", 4)
        + " AS value FROM cu JOIN vu ON vu.l_user = cu.l_user"
    ),
    "promql_share": (
        f"{SAMPLES_MULTI_CTE}, {_T_CTE}, "
        + _increase_cte("click", _H720_US, "inc")
        + ", per AS (SELECT l_user, l_shard, SUM(inc) AS v FROM inc "
        "GROUP BY l_user, l_shard), "
        "tot AS (SELECT l_user, SUM(inc) AS v FROM inc GROUP BY l_user) "
        "SELECT 'shard=' || p.l_shard || ',user=' || p.l_user AS labels, "
        + dround("p.v / t.v", 4)
        + " AS value FROM per p JOIN tot t ON t.l_user = p.l_user"
    ),
}
