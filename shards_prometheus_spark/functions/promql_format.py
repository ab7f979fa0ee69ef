"""PromQL pretty-printer + public AST JSON — `/api/v1/format_query`
and `/api/v1/parse_query` (the 3.x endpoints Grafana's query builder
probes; the reference's paired server serves both over the same parse
tree its evaluator uses, exactly as here: the dataclass AST of
functions.promql_parser).

`format_expr` guarantees the ROUND-TRIP property
``parse(format_expr(parse(e))) == parse(e)`` — the printed text is
regenerated from the AST, so it is canonical (normalized spacing,
explicit parentheses around binary operands) rather than
byte-preserving, the same contract as upstream's prettier.

`ast_json` renders the upstream AST-JSON shape (`translateAST`):
node types vectorSelector / matrixSelector / aggregation /
binaryExpr / subquery / call / numberLiteral / stringLiteral,
durations in MILLISECONDS. Divergence, documented: `call` nodes carry
``{"func": {"name": ...}, "args": [...]}`` without upstream's
argTypes/variadic/returnType signature metadata (our engine compiles
functions structurally, not via a signature registry); desugared
forms (e.g. ``year()``'s implicit ``vector(time())`` argument) render
as their explicit equivalents. Unknown/experimental nodes fall back
to ``{"type": "unknown", "repr": format_expr(node)}`` rather than
erroring, so new AST classes degrade visibly.
"""

from __future__ import annotations

from shards_prometheus_spark.functions.promql_parser import (
    _AT_END,
    _AT_START,
    _DATE_FNS as _DATE_FN_SET,
    Absent,
    AbsentExpr,
    Agg,
    BinOp,
    HistFraction,
    HistQuantile,
    InfoFn,
    LabelFn,
    MathFn,
    RangeFn,
    Scalar,
    ScalarFn,
    Selector,
    Subquery,
    TimeFn,
    TsFn,
    TsFnExpr,
    VectorExpr,
    VectorFn,
    VectorTimeFn,
    _SORT_BY_LABEL_FNS,
    _SORT_FNS,
    parse,
)

#: descending duration units for canonical printing (µs each);
#: weeks beat a bare day count for long ranges, years stay spelled
#: as weeks+days (Prometheus prints the same way)
_UNITS = [
    ("w", 7 * 24 * 3_600_000_000),
    ("d", 24 * 3_600_000_000),
    ("h", 3_600_000_000),
    ("m", 60_000_000),
    ("s", 1_000_000),
    ("ms", 1_000),
]


import re as _re

#: the classic (unquoted) metric / label-name charsets; anything
#: else prints in the 3.x quoted selector form
_CLASSIC_NAME = _re.compile(
    r"[A-Za-z_][A-Za-z0-9_]*(?::[A-Za-z_][A-Za-z0-9_]*)*"
)
_CLASSIC_LABEL = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _fmt_dur(us: int) -> str:
    """µs → canonical compound duration (descending unique units)."""
    if us <= 0:
        raise ValueError(f"cannot format non-positive duration {us}")
    if us % 1_000:
        raise ValueError(
            f"duration {us}µs has sub-millisecond residue — not "
            "representable in the public duration grammar"
        )
    out = []
    for unit, size in _UNITS:
        n, us = divmod(us, size)
        if n:
            out.append(f"{n}{unit}")
    return "".join(out)


def _num(x: float) -> str:
    """Number literal: integer form when exact, shortest repr else;
    non-finite values keep PromQL's spellings (Inf parses back
    through the same number path)."""
    import math

    if math.isnan(x):
        return "NaN"
    if math.isinf(x):
        return "Inf" if x > 0 else "-Inf"
    if x == int(x) and abs(x) < 1e15:
        return str(int(x))
    return repr(x)


def _quote(s: str) -> str:
    """PromQL double-quoted string with the parser's escapes."""
    return (
        '"'
        + s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\t", "\\t")
        .replace("\r", "\\r")
        + '"'
    )


def _modifiers(node) -> str:
    """` offset d` / ` @ ts` suffixes shared by selector/subquery."""
    out = ""
    off = getattr(node, "offset_us", 0)
    if off:
        out += (
            f" offset -{_fmt_dur(-off)}" if off < 0
            else f" offset {_fmt_dur(off)}"
        )
    at = getattr(node, "at_us", None)
    if at is not None:
        if at == _AT_START:
            out += " @ start()"
        elif at == _AT_END:
            out += " @ end()"
        else:
            out += f" @ {_num(at / 1e6)}"
    return out


def _operand(node) -> str:
    """Binary operands print parenthesized when they are themselves
    binary — explicit grouping, so the round-trip never depends on
    precedence reconstruction."""
    s = format_expr(node)
    return f"({s})" if isinstance(node, BinOp) else s


def format_expr(node) -> str:
    """AST → canonical PromQL text (see module docstring)."""
    if isinstance(node, Scalar):
        return _num(node.value)
    if isinstance(node, TimeFn):
        return "time()"
    if isinstance(node, VectorTimeFn):
        return "vector(time())"
    if isinstance(node, VectorFn):
        return f"vector({_num(node.value)})"
    if isinstance(node, VectorExpr):
        return f"vector({format_expr(node.expr)})"
    if isinstance(node, ScalarFn):
        return f"scalar({format_expr(node.expr)})"
    if isinstance(node, (TsFn, TsFnExpr)):
        inner = node.sel if isinstance(node, TsFn) else node.expr
        return f"timestamp({format_expr(inner)})"
    if isinstance(node, Absent):
        fn = "absent_over_time" if node.over_time else "absent"
        return f"{fn}({format_expr(node.sel)})"
    if isinstance(node, AbsentExpr):
        return f"absent({format_expr(node.expr)})"
    if isinstance(node, HistQuantile):
        return (
            f"histogram_quantile({_num(node.phi)}, "
            f"{format_expr(node.expr)})"
        )
    if isinstance(node, HistFraction):
        return (
            f"histogram_fraction({_num(node.lo)}, {_num(node.hi)}, "
            f"{format_expr(node.expr)})"
        )
    if isinstance(node, Selector):
        # names outside the classic charset print in the 3.x quoted
        # form: {"metric.name", "label.name"="v"}
        classic = bool(_CLASSIC_NAME.fullmatch(node.metric))
        entries = [] if classic else [_quote(node.metric)]
        entries += [
            (
                lbl
                if _CLASSIC_LABEL.fullmatch(lbl)
                else _quote(lbl)
            )
            + op
            + _quote(val)
            for lbl, op, val in node.matchers
        ]
        s = node.metric if classic else ""
        if entries or not classic:
            s += "{" + ",".join(entries) + "}"
        if node.range_us is not None:
            s += f"[{_fmt_dur(node.range_us)}]"
        return s + _modifiers(node)
    if isinstance(node, Subquery):
        # _operand: a binary inner must keep its parentheses —
        # `(a + b)[1h:5m]` re-parsed without them would attach the
        # subquery to the right operand only
        return (
            f"{_operand(node.expr)}"
            f"[{_fmt_dur(node.range_us)}:{_fmt_dur(node.step_us)}]"
            + _modifiers(node)
        )
    if isinstance(node, RangeFn):
        arg = format_expr(node.sel)
        if node.fn == "quantile_over_time":
            return f"{node.fn}({_num(node.param or 0.0)}, {arg})"
        tail = ""
        if node.param is not None:
            tail += f", {_num(node.param)}"
        if node.param2 is not None:
            tail += f", {_num(node.param2)}"
        return f"{node.fn}({arg}{tail})"
    if isinstance(node, MathFn):
        if node.fn in _DATE_FN_SET and isinstance(
            node.expr, VectorTimeFn
        ):
            return f"{node.fn}()"  # year() ≡ year(vector(time()))
        tail = "".join(f", {_num(a)}" for a in node.args)
        return f"{node.fn}({format_expr(node.expr)}{tail})"
    if isinstance(node, LabelFn):
        fn = "label_replace" if node.kind == "replace" else "label_join"
        args = ", ".join(_quote(a) for a in node.args)
        return (
            f"{fn}({format_expr(node.expr)}, {_quote(node.dst)}, {args})"
        )
    if isinstance(node, InfoFn):
        if not node.matchers:
            return "info(" + format_expr(node.expr) + ")"
        entries = ",".join(
            (lbl if _CLASSIC_LABEL.fullmatch(lbl) else _quote(lbl))
            + op
            + _quote(val)
            for lbl, op, val in node.matchers
        )
        return (
            "info(" + format_expr(node.expr) + ", {" + entries + "})"
        )
    if isinstance(node, Agg):
        if node.op in _SORT_FNS:
            return f"{node.op}({format_expr(node.expr)})"
        if node.op in _SORT_BY_LABEL_FNS:
            lbls = "".join(f", {_quote(b)}" for b in node.by)
            return f"{node.op}({format_expr(node.expr)}{lbls})"
        grouping = ""
        if node.by or node.mode == "without":
            grouping = f" {node.mode} ({', '.join(node.by)}) "
        head: list[str] = []
        if node.op == "count_values":
            head.append(_quote(node.value_label or ""))
        if node.op == "quantile":
            head.append(_num(node.param or 0.0))
        if node.op in ("limit_ratio",):
            head.append(_num(node.param or 0.0))
        if node.k is not None:
            head.append(str(node.k))
        inner = ", ".join(head + [format_expr(node.expr)])
        return f"{node.op}{grouping}({inner})"
    if isinstance(node, BinOp):
        op = node.op
        mods = ""
        if node.bool_mode:
            mods += " bool"
        if node.match is not None:
            kind, labels = node.match
            mods += f" {kind}({', '.join(labels)})"
        if node.group is not None:
            mods += f" group_{node.group}({', '.join(node.extra)})"
        return f"{_operand(node.lhs)} {op}{mods} {_operand(node.rhs)}"
    raise ValueError(f"cannot format AST node {node!r}")


def format_query(expr: str) -> str:
    """Parse + pretty-print (the format_query endpoint body)."""
    return format_expr(parse(expr))


def _ms(us: int | None) -> int | None:
    return None if us is None else us // 1_000


_MATCH_TYPE = {"=": "=", "!=": "!=", "=~": "=~", "!~": "!~"}


def _at_fields(node) -> dict:
    """timestamp/startOrEnd per the public shape (`@` renders into
    `timestamp` ms, `@ start()/end()` into startOrEnd)."""
    at = getattr(node, "at_us", None)
    if at == _AT_START:
        return {"timestamp": None, "startOrEnd": "start"}
    if at == _AT_END:
        return {"timestamp": None, "startOrEnd": "end"}
    return {"timestamp": _ms(at), "startOrEnd": None}


def ast_json(node) -> dict:
    """AST → the public parse_query JSON shape (see module
    docstring for the documented divergences)."""
    if isinstance(node, Scalar):
        return {"type": "numberLiteral", "val": _num(node.value)}
    if isinstance(node, Selector):
        matchers = [
            {"name": lbl, "type": _MATCH_TYPE[op], "value": val}
            for lbl, op, val in node.matchers
        ]
        base = {
            "name": node.metric,
            "matchers": matchers,
            "offset": _ms(node.offset_us) or 0,
            **_at_fields(node),
        }
        if node.range_us is not None:
            return {
                "type": "matrixSelector",
                "range": _ms(node.range_us),
                **base,
            }
        return {"type": "vectorSelector", **base}
    if isinstance(node, Subquery):
        return {
            "type": "subquery",
            "expr": ast_json(node.expr),
            "range": _ms(node.range_us),
            "step": _ms(node.step_us),
            "offset": _ms(node.offset_us) or 0,
            **_at_fields(node),
        }
    if isinstance(node, Agg) and node.op not in (
        _SORT_FNS | _SORT_BY_LABEL_FNS
    ):
        param = None
        if node.op == "count_values":
            param = {
                "type": "stringLiteral",
                "val": node.value_label or "",
            }
        elif node.param is not None:
            param = {"type": "numberLiteral", "val": _num(node.param)}
        elif node.k is not None:
            param = {"type": "numberLiteral", "val": str(node.k)}
        return {
            "type": "aggregation",
            "op": node.op,
            "expr": ast_json(node.expr),
            "param": param,
            "grouping": list(node.by),
            "without": node.mode == "without",
        }
    if isinstance(node, BinOp):
        matching = None
        if node.match is not None or node.group is not None:
            kind, labels = node.match or ("on", [])
            card = {
                None: "one-to-one",
                "left": "many-to-one",
                "right": "one-to-many",
            }[node.group]
            matching = {
                "card": card,
                "labels": list(labels),
                "on": kind == "on",
                "include": list(node.extra),
            }
        return {
            "type": "binaryExpr",
            "op": node.op,
            "lhs": ast_json(node.lhs),
            "rhs": ast_json(node.rhs),
            "matching": matching,
            "bool": node.bool_mode,
        }

    def call(name: str, args: list) -> dict:
        return {
            "type": "call",
            "func": {"name": name},
            "args": args,
        }

    if isinstance(node, TimeFn):
        return call("time", [])
    if isinstance(node, VectorTimeFn):
        return call("vector", [call("time", [])])
    if isinstance(node, VectorFn):
        return call(
            "vector", [{"type": "numberLiteral", "val": _num(node.value)}]
        )
    if isinstance(node, VectorExpr):
        return call("vector", [ast_json(node.expr)])
    if isinstance(node, ScalarFn):
        return call("scalar", [ast_json(node.expr)])
    if isinstance(node, (TsFn, TsFnExpr)):
        inner = node.sel if isinstance(node, TsFn) else node.expr
        return call("timestamp", [ast_json(inner)])
    if isinstance(node, Absent):
        fn = "absent_over_time" if node.over_time else "absent"
        return call(fn, [ast_json(node.sel)])
    if isinstance(node, AbsentExpr):
        return call("absent", [ast_json(node.expr)])
    if isinstance(node, HistQuantile):
        return call(
            "histogram_quantile",
            [
                {"type": "numberLiteral", "val": _num(node.phi)},
                ast_json(node.expr),
            ],
        )
    if isinstance(node, HistFraction):
        return call(
            "histogram_fraction",
            [
                {"type": "numberLiteral", "val": _num(node.lo)},
                {"type": "numberLiteral", "val": _num(node.hi)},
                ast_json(node.expr),
            ],
        )
    if isinstance(node, RangeFn):
        args = [ast_json(node.sel)]
        if node.fn == "quantile_over_time":
            args.insert(
                0,
                {"type": "numberLiteral", "val": _num(node.param or 0.0)},
            )
        else:
            for p in (node.param, node.param2):
                if p is not None:
                    args.append(
                        {"type": "numberLiteral", "val": _num(p)}
                    )
        return call(node.fn, args)
    if isinstance(node, MathFn):
        args = [ast_json(node.expr)] + [
            {"type": "numberLiteral", "val": _num(a)} for a in node.args
        ]
        return call(node.fn, args)
    if isinstance(node, LabelFn):
        fn = "label_replace" if node.kind == "replace" else "label_join"
        args = [ast_json(node.expr)] + [
            {"type": "stringLiteral", "val": s}
            for s in [node.dst, *node.args]
        ]
        return call(fn, args)
    if isinstance(node, InfoFn):
        args = [ast_json(node.expr)]
        if node.matchers:
            args.append(ast_json(Selector("", list(node.matchers))))
        return call("info", args)
    if isinstance(node, Agg):  # sort/sort_by_label presentation forms
        args = [ast_json(node.expr)] + [
            {"type": "stringLiteral", "val": b} for b in node.by
        ]
        return call(node.op, args)
    # unknown/experimental node: degrade visibly, never 500
    return {"type": "unknown", "repr": format_expr(node)}


def parse_query_json(expr: str) -> dict:
    """Parse + AST JSON (the parse_query endpoint body)."""
    return ast_json(parse(expr))
