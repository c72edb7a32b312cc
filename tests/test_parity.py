"""Every registered query must hash-match its DuckDB oracle at sf0.001 —
the local twin of the driver's t2 gate (which runs at sf0.01)."""

from __future__ import annotations

import pytest

from beam_scala_examples_spark.queries import ORACLE, QUERIES

from .oracle_harness import compare, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, duck, ORACLE[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
