"""Every registered query must hash-match its DuckDB oracle at sf0.001 —
the local twin of the driver's t2 gate (which runs at sf0.01).

Set SPARK_GRAFT_TWO_SF=1 to ALSO run the full sweep at sf0.01 (the
driver's own scale — catches float-order / tie-boundary flips that
sf0.001 can miss; see tests/README.md)."""

from __future__ import annotations

import os

import pytest

from beam_scala_examples_spark.queries import ORACLE, QUERIES

from .oracle_harness import compare, duck_connect

SF2_DIR = os.environ.get("SPARK_GRAFT_TEST_SF2_DIR", "/root/testdata/sf0.01")
TWO_SF = os.environ.get("SPARK_GRAFT_TWO_SF", "") not in ("", "0")


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


@pytest.fixture(scope="module")
def duck_sf2():
    con = duck_connect(SF2_DIR)
    yield con
    con.close()


@pytest.mark.skipif(
    not TWO_SF, reason="driver-scale sweep: set SPARK_GRAFT_TWO_SF=1"
)
@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle_driver_scale(name, spark, duck_sf2):
    """The sf0.01 twin of the sweep above — the exact scale the driver's
    correctness gate runs at."""
    df = QUERIES[name](spark, SF2_DIR)
    ok, msg = compare(df, duck_sf2, ORACLE[name])
    assert ok, f"{name}@sf0.01: {msg}"
