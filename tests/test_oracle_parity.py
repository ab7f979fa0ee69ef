"""Every registered query hash-matches its DuckDB oracle at sf0.001
(the driver runs the same comparison at sf0.01 — SURVEY.md §5)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tools.parity import compare

import __spark_entry__ as entry_mod

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


def test_every_oracle_key_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn = _QUERIES[name]
    if name not in _ORACLES:
        # rows-only contract (e.g. approx sketches)
        assert fn(spark, SF_SMOKE).count() > 0
        return
    problems = compare(fn(spark, SF_SMOKE), duck, _ORACLES[name], name)
    assert not problems, "\n".join(problems)
