"""Query registry.

Each sibling module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[str, str]`` (DuckDB SQL over the pre-registered views
``region nation customer supplier part orders lineitem events documents
embeddings``).  This package flattens them into the engine-wide registry
consumed by ``__spark_entry__.py``, ``bench.py`` and the parity tests.

Determinism contract (the driver hash-compares Spark vs DuckDB results):
 - every aggregate/computed column is aliased identically on both sides;
 - double-valued aggregates are rounded (4–6 dp) on both sides;
 - integer aggregates are cast to BIGINT on both sides (DuckDB promotes
   ``sum(int)`` to HUGEINT otherwise);
 - ties in any top-k / argmax are broken by a total order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (autocomplete, behavior, classify, clustering, cookbook, dq,
               game, llmdata, relational, sessions, starschema, temporal,
               tfidf, traffic, wordcount)

_MODULES = (wordcount, cookbook, game, tfidf, autocomplete, sessions, traffic,
            llmdata, starschema, relational, temporal, clustering, behavior,
            dq, classify)

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        if _name in QUERIES:
            raise ValueError(f"duplicate query name {_name!r}")
        QUERIES[_name] = _fn
    ORACLE.update(getattr(_m, "ORACLE", {}))

# Oracle keys must be a subset of query keys.
_extra = set(ORACLE) - set(QUERIES)
if _extra:
    raise ValueError(f"oracle entries without queries: {sorted(_extra)}")

# Round-8 determinism hardening: materialize the execution-verified
# at-risk CTEs (multi-referenced + window/UNION body — the round-7
# double-evaluation flake shape).  ORACLE_RAW keeps the unhardened SQL
# for tools/oracle_stability.py to re-verify against.
from .oraclelint import harden_oracles as _harden  # noqa: E402

ORACLE_RAW: dict[str, str] = dict(ORACLE)
ORACLE = _harden(ORACLE)
