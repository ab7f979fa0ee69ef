"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs each registered Spark query and its oracle SQL side by side,
compares row count, column-name set, and order-insensitive values
(floats must agree to 1e-9 — the queries themselves round, so this is
effectively exact). Usage:

    python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def duck_connection(sf_dir: str):
    import duckdb

    from shards_prometheus_spark.model import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(rows, columns):
    """Column-name-sorted, row-sorted canonical form (driver-style)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def key(v):
        if v is None:
            return (0, "")
        if isinstance(v, bool):
            return (1, str(int(v)))
        if isinstance(v, (int, float)):
            f = float(v)
            return (2, f"{f:.9f}") if math.isfinite(f) else (2, str(f))
        return (3, str(v))

    canon = [tuple(r[i] for i in order) for r in rows]
    return sorted(canon, key=lambda row: tuple(key(v) for v in row))


def _values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return str(a) == str(b)


def compare(spark_df, con, sql: str, name: str = "?") -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    o = con.execute(sql)
    o_cols = [d[0] for d in o.description]
    o_rows = [tuple(r) for r in o.fetchall()]

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"[{name}] schema: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"[{name}] rowcount: spark={len(s_rows)} oracle={len(o_rows)}")
        return problems

    sc = _canon(s_rows, s_cols)
    oc = _canon(o_rows, o_cols)
    bad = 0
    for i, (sr, orow) in enumerate(zip(sc, oc)):
        if not all(_values_equal(a, b) for a, b in zip(sr, orow)):
            bad += 1
            if bad <= 3:
                problems.append(f"[{name}] row {i}: spark={sr} oracle={orow}")
    if bad > 3:
        problems.append(f"[{name}] ... {bad} mismatched rows total")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from __spark_entry__ import oracle_sql, queries
    from shards_prometheus_spark.session import get_spark

    spark = get_spark("parity", master="local[8]", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    qs, oracles = queries(), oracle_sql()

    failed = []
    attempted = 0
    for qname, fn in qs.items():
        if only and qname not in only:
            continue
        attempted += 1
        if qname not in oracles:
            df = fn(spark, sf_dir)
            n = df.count()
            print(f"  {qname}: rows-only check, {n} rows")
            continue
        try:
            problems = compare(fn(spark, sf_dir), con, oracles[qname], qname)
        except Exception as e:  # surface, keep going
            problems = [f"[{qname}] EXCEPTION: {type(e).__name__}: {e}"]
        if problems:
            failed.append(qname)
            for p in problems:
                print("  FAIL", p)
        else:
            print(f"  ok   {qname}")
    print(
        f"{attempted - len(failed)}/{attempted} attempted queries match at {sf_dir}"
        + ("" if attempted == len(qs) else f" ({len(qs) - attempted} not run)")
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
