"""CLI entry point — the engine analogue of the reference's
``PipelineOptionsFactory`` lifecycle (SURVEY §3.1: CLI -> typed options ->
pipeline -> run -> sink).

Usage::

    python -m beam_scala_examples_spark list
    python -m beam_scala_examples_spark run q07_tfidf \
        [--sf-dir /root/testdata/sf0.01] [--output /tmp/out] \
        [--format parquet|csv|json|text] [--shards N] [--show N]

Without ``--output`` the result is shown (``--show`` rows); with it, the
result is written via the matching sink (S4/S8 shapes; ``--shards`` maps
the reference's ``withNumShards``).
"""

from __future__ import annotations

import argparse
import sys
import time

from pyspark.sql import functions as F

from .queries import ORACLE, QUERIES
from .session import get_spark


def _run(args: argparse.Namespace) -> int:
    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
        return 2
    spark = get_spark(app_name=f"bese-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.output:
        if args.shards:
            df = df.repartition(args.shards)
        if args.format == "text":
            # text sink needs a single string column (P4 format shape)
            df = df.select(
                F.concat_ws(",", *[F.col(c).cast("string") for c in df.columns])
                .alias("value")
            )
        df.write.mode("overwrite").format(args.format).save(args.output)
        print(f"wrote {args.output} [{args.format}] "
              f"in {time.perf_counter() - t0:.2f}s")
    else:
        # persist so show + count run the pipeline once (the second
        # action reads the cache), then release
        df = df.persist()
        try:
            df.show(args.show, truncate=False)
            print(f"{args.query}: {df.count()} rows "
                  f"in {time.perf_counter() - t0:.2f}s")
        finally:
            df.unpersist(blocking=False)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="beam_scala_examples_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    runp = sub.add_parser("run", help="run one query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--output", default=None, help="write here instead of show")
    runp.add_argument("--format", default="parquet",
                      choices=["parquet", "csv", "json", "text"])
    runp.add_argument("--shards", type=int, default=None,
                      help="fixed output shard count (withNumShards)")
    runp.add_argument("--show", type=int, default=20)

    exp = sub.add_parser(
        "explain", help="print a query's formatted physical plan"
    )
    exp.add_argument("query")
    exp.add_argument("--sf-dir", default="/root/testdata/sf0.001")

    args = p.parse_args(argv)
    if args.cmd == "list":
        for name in sorted(QUERIES):
            oracle = "oracle" if name in ORACLE else "rows-only"
            print(f"{name}  [{oracle}]")
        return 0
    if args.cmd == "explain":
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
            return 2
        spark = get_spark(app_name=f"bese-explain-{args.query}")
        spark.sparkContext.setLogLevel("ERROR")
        QUERIES[args.query](spark, args.sf_dir).explain("formatted")
        return 0
    return _run(args)


if __name__ == "__main__":
    raise SystemExit(main())
