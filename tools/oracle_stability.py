"""Repeat-run oracle stability harness (round-8 verdict item 1).

The correctness gate hash-compares every Spark query against its DuckDB
oracle — so a nondeterministic ORACLE is a gate flake even when the
engine is right (round 7 saw exactly one: a multi-referenced
unmaterialized windowed CTE double-evaluated by DuckDB,
``docs/ROUND7_NOTES.md``).  This tool makes the oracle side auditable:

  --audit   list every at-risk CTE (multi-referenced + window/UNION
            body) per ``queries.oraclelint.at_risk_ctes``.
  --emit    execution-verify materializing those CTEs (hardened SQL
            must run AND hash-equal the unhardened result; DuckDB
            rejects MATERIALIZED in some compositions with an internal
            "Recursive CTE scan" error, and a hardened plan could in
            principle change a tie — both are caught here) and write
            the safe lists to queries/oracle_materialize.json.
  --check   run every HARDENED oracle --repeats times (fresh connection
            each) and fail on any hash instability or stale list entry.

Usage: python tools/oracle_stability.py --audit|--emit|--check
           [--repeats N] [--sf-dir DIR] [--names a,b,...]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time
from datetime import datetime

import duckdb

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from beam_scala_examples_spark.queries import (  # noqa: E402
    ORACLE,
    ORACLE_RAW,
)
from beam_scala_examples_spark.queries import oraclelint  # noqa: E402
from beam_scala_examples_spark.tables import TABLES  # noqa: E402

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, bool):
        return f"bool:{v}"
    return repr(v)


def result_hash(con: duckdb.DuckDBPyConnection, sql: str) -> str:
    res = con.sql(sql)
    cols = list(res.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(
        tuple(_canon_cell(r[i]) for i in order) for r in res.fetchall()
    )
    h = hashlib.sha256()
    h.update(repr(sorted(cols)).encode())
    for r in rows:
        h.update(repr(r).encode())
    return f"{h.hexdigest()}:{len(rows)}"


def audit() -> dict[str, list[str]]:
    out = {}
    for name in sorted(ORACLE_RAW):
        r = oraclelint.at_risk_ctes(ORACLE_RAW[name])
        if r:
            out[name] = r
    return out


def _verify_subset(
    sf_dir: str, sql: str, names: list[str], base: str, repeats: int
) -> bool:
    hard = oraclelint.materialize(sql, names)
    for _ in range(repeats):
        con = _connect(sf_dir)
        try:
            if result_hash(con, hard) != base:
                return False
        except Exception:
            return False
        finally:
            con.close()
    return True


def emit(sf_dir: str, repeats: int, only: set[str] | None) -> None:
    risk = audit()
    lists: dict[str, list[str]] = {}
    for name, ctes in risk.items():
        if only and name not in only:
            continue
        sql = ORACLE_RAW[name]
        t0 = time.time()
        con = _connect(sf_dir)
        base = result_hash(con, sql)
        con.close()
        if _verify_subset(sf_dir, sql, ctes, base, repeats):
            kept = list(ctes)
        else:
            kept = [
                c
                for c in ctes
                if _verify_subset(sf_dir, sql, [c], base, repeats)
            ]
            if kept and not _verify_subset(
                sf_dir, sql, kept, base, repeats
            ):
                kept = []
        status = "all" if kept == ctes else f"kept {kept}"
        print(
            f"{name}: {len(ctes)} candidate(s) -> {status}"
            f" ({time.time() - t0:.1f}s)"
        )
        if kept:
            lists[name] = kept
    with open(oraclelint._DATA_PATH, "w") as f:
        json.dump(lists, f, indent=1, sort_keys=True)
    n = sum(map(len, lists.values()))
    print(
        f"wrote {len(lists)} oracle(s), {n} materialized CTE(s)"
        f" -> {oraclelint._DATA_PATH}"
    )


def check(sf_dir: str, repeats: int, only: set[str] | None) -> int:
    # stale-list detection: every committed entry must still name a
    # present, unmaterialized CTE in the RAW sql
    stale = []
    for name, names in oraclelint.load_materialize_lists().items():
        if name not in ORACLE_RAW:
            stale.append((name, "oracle gone"))
            continue
        have = oraclelint.all_unmaterialized_cte_names(ORACLE_RAW[name])
        missing = [n for n in names if n not in have]
        if missing:
            stale.append((name, f"CTEs not applicable: {missing}"))
    for name, why in stale:
        print(f"STALE {name}: {why}")

    unstable = []
    names = sorted(only or ORACLE)
    t0 = time.time()
    for k, name in enumerate(names):
        sql = ORACLE[name]
        hashes = set()
        for _ in range(repeats):
            con = _connect(sf_dir)
            try:
                hashes.add(result_hash(con, sql))
            finally:
                con.close()
        if len(hashes) != 1:
            unstable.append(name)
            print(f"UNSTABLE {name}: {sorted(hashes)}")
        if (k + 1) % 50 == 0:
            print(
                f"... {k + 1}/{len(names)} checked"
                f" ({time.time() - t0:.0f}s)",
                flush=True,
            )
    print(
        f"checked {len(names)} oracles x {repeats} repeats:"
        f" {len(unstable)} unstable, {len(stale)} stale"
        f" ({time.time() - t0:.0f}s)"
    )
    return 1 if (unstable or stale) else 0


def main() -> None:
    args = sys.argv[1:]
    sf_dir = DEFAULT_SF_DIR
    repeats = 3
    only: set[str] | None = None
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    if "--repeats" in args:
        repeats = int(args[args.index("--repeats") + 1])
    if "--names" in args:
        only = set(args[args.index("--names") + 1].split(","))
    if "--audit" in args:
        risk = audit()
        for name, ctes in risk.items():
            print(f"{name}: {ctes}")
        print(
            f"{len(risk)} at-risk oracle(s),"
            f" {sum(map(len, risk.values()))} CTE(s)"
        )
    elif "--emit" in args:
        emit(sf_dir, repeats, only)
    elif "--check" in args:
        sys.exit(check(sf_dir, repeats, only))
    else:
        print(__doc__)
        sys.exit(2)


if __name__ == "__main__":
    main()
