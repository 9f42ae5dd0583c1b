"""Every ``queries()`` entry must match its ``oracle_sql()`` twin on the
smoke-scale tables — a local mirror of the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from conftest import SF_SMOKE, assert_frame_parity, run_duck

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema) > 0


def test_every_query_has_callable():
    assert QUERIES, "queries() must not be empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    if name not in ORACLES:
        # rows-only check for non-SQL-expressible ops (driver's weak gate)
        assert df.count() >= 0
        return
    oracle = run_duck(duck, ORACLES[name])
    assert_frame_parity(df, oracle)
