"""Runs every registered (query, oracle) pair exactly the way the driver
does. Default scale factor sf0.001 for speed; set TFS_TEST_SF_DIR to run
against sf0.01 (the driver's correctness scale)."""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.slow  # full-registry oracle sweep; CORRECTNESS_LOCAL artifacts cover it per round

import __spark_entry__ as entrymod
from tests.oracle import compare, duck_connection

SF_DIR = os.environ.get("TFS_TEST_SF_DIR", "/root/testdata/sf0.001")

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = _QUERIES[name](spark, SF_DIR)
    if name not in _ORACLES:
        # rows-only check (driver's weaker path for non-SQL-expressible ops)
        assert df.count() >= 0
        return
    oracle_df = duck.execute(_ORACLES[name]).fetchdf()
    problems = compare(df, oracle_df)
    assert not problems, f"{name}: " + "; ".join(problems)
