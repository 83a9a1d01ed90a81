"""Drive the full driver contract: every queries() entry runs and
hash-matches its oracle_sql() on the test scale factor — the same gate
the driver applies at sf0.01."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_frames_match

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_an_oracle_or_is_flagged():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name not in ORACLES:
        assert df.count() >= 0  # weaker rows-only check (driver parity)
        return
    assert_frames_match(df, duck.sql(ORACLES[name]))
