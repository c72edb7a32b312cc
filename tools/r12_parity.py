#!/usr/bin/env python
"""Round-12 parity spot-check: run named queries against their DuckDB
oracles at one or more fixture SFs (tests/oracle_harness.py semantics —
the local twin of the driver's correctness gate).

    python tools/r12_parity.py [--sf sf0.001,sf0.01] name [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)

from beam_scala_examples_spark.queries import ORACLE, QUERIES  # noqa: E402
from beam_scala_examples_spark.session import get_spark  # noqa: E402
from oracle_harness import compare, duck_connect  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="sf0.001,sf0.01")
    args = ap.parse_args()

    spark = get_spark(
        app_name="bese-r12-parity",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    for sf in args.sf.split(","):
        sf_dir = f"/root/testdata/{sf}"
        con = duck_connect(sf_dir)
        for name in args.names:
            ok, msg = compare(
                QUERIES[name](spark, sf_dir), con, ORACLE[name],
                fresh_factory=lambda: duck_connect(sf_dir),
                name=name, scale=sf,
            )
            print(f"{sf} {name}: {'OK' if ok else 'FAIL'} — {msg}")
            failures += 0 if ok else 1
        con.close()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
