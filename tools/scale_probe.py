#!/usr/bin/env python
"""Measured-scaling probe: inflate the fixture ``documents`` table by
1x / 4x / 16x and time representative engine paths at each factor, so
the docs/SCALE.md claims ("shuffle grows with docs, not pairs";
"map-only ops scale with input bandwidth") are measurements, not
assertions.

Copies are DECORRELATED (per-copy letter-rotation of the text), so
inflation multiplies the distinct-shingle/document population instead of
creating cross-copy near-duplicates — the probe measures throughput on
more data, not a quadratic duplicate blowup the fixture doesn't have.
Non-document tables are symlinked from the source SF dir, so every
registered query runs unchanged against the probe dirs.

Usage: python tools/scale_probe.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import shutil
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beam_scala_examples_spark.queries import QUERIES  # noqa: E402
from beam_scala_examples_spark.session import get_spark  # noqa: E402
from beam_scala_examples_spark.tables import TABLES, load  # noqa: E402

FACTORS = (1, 4, 16)
PROBES = (
    "dedup_minhash_pairs",   # LSH candidate join: Sigma|bucket|^2 path
    "dedup_exact",           # one hash shuffle
    "text_quality_score",    # map-only scan
    "text_vocabulary",       # explode + hash agg + top-k
    "events_sessions",       # session-window sessionization
    "events_asof_click",     # as-of join (union + running-last)
    "events_user_activity_7d",  # RANGE frame over user-day aggregate
    "text_lm_score",         # corpus-sized vocab join (hint-free, AQE-sized)
    "events_segment_revenue",   # broadcast dim join + additive rollup
)
BASE = "/tmp/scale_probe"


def build_dirs(spark, sf_dir: str) -> dict[int, str]:
    """Probe dirs with `documents` and `events` inflated by each factor
    (decorrelated copies: rotated text / disjoint user+event id ranges),
    all other tables symlinked."""
    docs = load(spark, sf_dir, "documents")
    ev = load(spark, sf_dir, "events")
    n_docs = docs.count()
    id_span = ev.agg(
        F.max("event_id").alias("e"), F.max("user_id").alias("u")
    ).collect()[0]
    lower = string.ascii_lowercase
    dirs = {}
    for f in FACTORS:
        d = os.path.join(BASE, f"f{f}")
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        for t in TABLES:
            if t not in ("documents", "events"):
                os.symlink(
                    os.path.join(os.path.abspath(sf_dir), f"{t}.parquet"),
                    os.path.join(d, f"{t}.parquet"),
                )
        doc_parts, ev_parts = [], []
        for k in range(f):
            rot = lower[k % 26:] + lower[: k % 26]
            doc_parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(k * n_docs)).alias("doc_id"),
                    F.translate("text", lower, rot).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
            ev_parts.append(
                ev.select(
                    (F.col("event_id") + F.lit(k * (id_span.e + 1))).alias(
                        "event_id"
                    ),
                    "ts",
                    (F.col("user_id") + F.lit(k * (id_span.u + 1))).alias(
                        "user_id"
                    ),
                    "event_type",
                    "value",
                    "props",
                )
            )

        def _union(parts):
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        _union(doc_parts).write.mode("overwrite").parquet(
            os.path.join(d, "documents.parquet")
        )
        _union(ev_parts).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        dirs[f] = d
    return dirs


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe.json"
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    dirs = build_dirs(spark, sf_dir)

    results: dict[str, dict[int, float]] = {q: {} for q in PROBES}
    for name in PROBES:
        for f in FACTORS:
            # warm once (codegen), then best-of-2 timed
            QUERIES[name](spark, dirs[f]).write.format("noop").mode(
                "overwrite"
            ).save()
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                QUERIES[name](spark, dirs[f]).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            results[name][f] = round(best, 3)
            print(f"{name} x{f}: {results[name][f]}s", flush=True)

    summary = {
        name: {
            "times": times,
            "ratio_16x_vs_1x": round(times[16] / times[1], 2),
        }
        for name, times in results.items()
    }
    with open(out_json, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
