#!/usr/bin/env python
"""Round-12 isolated query measurement: bench-identical methodology
(warm pass at sf0.001 for codegen cache, the blessed-codebook
train_warmup, best-of-N noop-sink timing at $SPARK_GRAFT_SF_DIR), for a
named subset of queries — so a single optimization's before/after can
be measured without paying the full 328-query suite.

Round-12 accounting (r11 verdict item 1): queries listed in
bench.COLD_MEMOS are timed COLD exactly as the bench now times them —
their backing session memos are dropped before every rep, so the
reported number is build+serve, never a cache read.

    python tools/r12_measure.py [--plans TAG] [--reps N] name [name ...]

With --plans TAG, also writes plans/r12/<name>_<TAG>.txt (the
explain("formatted") output) for each query.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beam_scala_examples_spark.queries import QUERIES  # noqa: E402
from beam_scala_examples_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None, help="plan file tag (e.g. after)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--no-train-warmup", action="store_true")
    ap.add_argument(
        "--warm", action="store_true",
        help="skip the COLD_MEMOS clearing (measure the serve leg)",
    )
    args = ap.parse_args()

    import bench

    ev = bench.capture_evidence()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="bese-r12-measure",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in args.names:
            QUERIES[name](spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
    if not args.no_train_warmup:
        bench.train_warmup(spark, sf_dir)

    plan_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12",
    )
    os.makedirs(plan_dir, exist_ok=True)
    timings: dict[str, float] = {}
    for name in args.names:
        fn = QUERIES[name]
        cold = None if args.warm else bench.COLD_MEMOS.get(name)
        spark.sparkContext.setJobDescription(f"r12-measure: {name}")
        best = float("inf")
        for _ in range(args.reps):
            if cold:
                bench.clear_cold_memos(cold)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        if args.plans:
            df = fn(spark, sf_dir)
            path = os.path.join(plan_dir, f"{name}_{args.plans}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
    print(json.dumps({"capture": ev, "sf_dir": sf_dir, "timings": timings}))


if __name__ == "__main__":
    main()
