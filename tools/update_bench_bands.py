#!/usr/bin/env python
"""Regenerate bench_bands.json from the latest bench_detail.json.

Run after a full `python bench.py` at the reference scale factor when a
perf change (or a batch of new queries) deliberately moves timings; the
committed bands file is the per-query reference the bench regression
gate compares against.  Timings are taken verbatim from the detail run
(best-of-N already applied by bench.py).
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    with open(os.path.join(ROOT, "bench_detail.json")) as f:
        detail = json.load(f)
    bands = {
        "comment": (
            "Per-query reference timings (sec, sf%s, local[32]) for the "
            "bench regression gate. Regenerate with "
            "tools/update_bench_bands.py after a deliberate perf change."
            % detail["sf"]
        ),
        "sf": detail["sf"],
        "anchor_r01_shared_total": detail["r01_shared_total"],
        "queries": detail["queries"],
    }
    out = os.path.join(ROOT, "bench_bands.json")
    with open(out, "w") as f:
        json.dump(bands, f, indent=1, sort_keys=True)
    print(
        "wrote %d bands (anchor %.3f s) -> %s"
        % (len(detail["queries"]), detail["r01_shared_total"], out)
    )


if __name__ == "__main__":
    main()
