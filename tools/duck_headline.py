"""Time the DuckDB oracle of selected headline queries at sf0.1.

The quantitative baseline for ARCHITECTURE.md §7: DuckDB executing the
IDENTICAL oracle SQL on the same parquet, 32 threads, per-query median
of 3 consecutive `con.execute(sql).fetchall()` on an idle machine.

Usage: python tools/duck_headline.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "dedup_near",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "similarity_kmeans",
    "counter_rate",
    "histogram_quantile",
    "counter_sum",
    "tpch_q10",
    "user_sessions",
]


def main() -> None:
    from tools.parity import duck_connection

    import __spark_entry__ as entry

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or DEFAULT_QUERIES
    oracles = entry.oracle_sql()
    con = duck_connection(sf_dir)
    con.execute("SET threads=32")
    for name in names:
        sql = oracles[name]
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        print(
            f"{name}: median {statistics.median(times):.3f}s "
            f"(spread {min(times):.3f}..{max(times):.3f})"
        )


if __name__ == "__main__":
    main()
