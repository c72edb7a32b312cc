#!/usr/bin/env python
"""Regenerate bench_bands.json from the latest bench_detail.json,
keeping HISTORICAL MINIMA per query.

Run after a full `python bench.py` at the reference scale factor when a
perf change (or a batch of new queries) deliberately moves timings; the
committed bands file is the per-query reference the bench regression
gate compares against.

Round-7 gate hygiene (round-6 verdict finding 1): a refresh no longer
re-baselines every query to the latest capture — that let a noisy-high
machine inflate all 280 references at once, and a slow drift spread
across rounds could never trip a band.  Instead each query's band is
min(existing band, new capture): bands only ratchet DOWN, so the gate
keeps the best machine ever measured as its reference and cross-round
drift stays detectable.  Queries new in this capture enter verbatim;
queries no longer benched drop out.  After a DELIBERATE perf trade that
makes a query permanently slower, pass --reset to rebuild all bands
from the current capture alone (the pre-round-7 behavior) — and say so
in the commit message.
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def merged_bands(detail: dict, old: dict | None, reset: bool,
                 adopt_warmth: bool = False) -> dict:
    """Min-of-N merge of the new capture into the existing bands (same
    sf only); `reset` or an sf change rebuilds from the capture alone.

    Round 10: each band also records the memo-WARMTH SIGNATURE of the
    capture that set it (from bench_detail's memo_state, via
    bench.warmth_sig) — band_violations refuses to judge a measurement
    against a band taken at different warmth (a codebook-cold run vs a
    codebook-warm band was rounds 8-9's recurring false flag).  When a
    query keeps its old (lower) band, it keeps that band's recorded
    warmth; a legacy bands file without warmth adopts the current
    capture's signatures (the min was captured under the same bench
    order, so same warmth, in every known case)."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py")
    )
    bench = _ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    ms = detail.get("memo_state", {})
    queries = dict(detail["queries"])
    warmth = {n: bench.warmth_sig(ms.get(n)) for n in queries}
    anchor = float(detail["r01_shared_total"])
    # Round-11: the host-independent CPU probe reference (see
    # bench.cpu_micro_sec) min-merges like everything else — the gate's
    # drift corroboration compares against the fastest host ever seen.
    cpu_ref = detail.get("cpu_micro_sec")
    if (
        not reset
        and old is not None
        and abs(float(old.get("sf", -1)) - float(detail["sf"])) < 1e-9
    ):
        # --adopt-warmth (round 11): REGISTERING A NEW SESSION MEMO
        # changes every query's warmth signature encoding (the new
        # cache name appears in every "warm" set), which would warmth-
        # skip the entire suite forever against pre-registration bands.
        # The band VALUES stay comparable — a cache a query never
        # touches does not change its execution — so this mode keeps
        # the min-merged numbers but stamps the CURRENT capture's
        # signatures.  Use it (and say so in the commit) in the same
        # round that adds a memo to session.memo_snapshot.
        old_w = old.get("warmth", {})
        for name, band in old.get("queries", {}).items():
            if name in queries and band < queries[name]:
                queries[name] = band
                if name in old_w and not adopt_warmth:
                    warmth[name] = old_w[name]
        prev_anchor = old.get("anchor_r01_shared_total")
        if prev_anchor is not None:
            anchor = min(anchor, float(prev_anchor))
        prev_cpu = old.get("cpu_micro_ref")
        if prev_cpu is not None:
            cpu_ref = min(cpu_ref, float(prev_cpu)) if cpu_ref else prev_cpu
    out = {
        "comment": (
            "Per-query reference timings (sec, sf%s, local[32]) for the "
            "bench regression gate. MIN-OF-N rule: each regeneration "
            "(tools/update_bench_bands.py) keeps min(existing band, new "
            "capture) per query, so bands only ratchet down and a "
            "noisy-high capture can never loosen the gate; use --reset "
            "after a deliberate perf trade. Each band carries the memo-"
            "warmth signature of the capture that set it; the gate only "
            "compares like-warmth (bench.py band_violations)."
            % detail["sf"]
        ),
        "sf": detail["sf"],
        "anchor_r01_shared_total": anchor,
        "queries": queries,
        "warmth": warmth,
    }
    if cpu_ref is not None:
        out["cpu_micro_ref"] = cpu_ref
    return out


def main() -> None:
    args = sys.argv[1:]
    reset = "--reset" in args
    adopt_warmth = "--adopt-warmth" in args
    # --reset-names a,b (round 9): re-baseline ONLY the named queries to
    # the current capture (drop their historical minima) while every
    # other band keeps the min-merge rule — for adjudicated warmth-drift
    # bands (a min captured memo-warm is unattainable under the current
    # bench order; see bench_detail.json's memo_state).  Say so in the
    # commit message, with the measurement attached.
    reset_names: set[str] = set()
    if "--reset-names" in args:
        reset_names = set(args[args.index("--reset-names") + 1].split(","))
    with open(os.path.join(ROOT, "bench_detail.json")) as f:
        detail = json.load(f)
    out = os.path.join(ROOT, "bench_bands.json")
    old = None
    if os.path.exists(out):
        with open(out) as f:
            old = json.load(f)
    if reset_names and old is not None:
        unknown = reset_names - set(detail["queries"])
        if unknown:
            raise KeyError(f"--reset-names not in capture: {sorted(unknown)}")
        old = dict(old)
        old["queries"] = {
            k: v
            for k, v in old.get("queries", {}).items()
            if k not in reset_names
        }
    bands = merged_bands(detail, old, reset, adopt_warmth)
    with open(out, "w") as f:
        json.dump(bands, f, indent=1, sort_keys=True)
    lowered = sum(
        1
        for k, v in bands["queries"].items()
        if old and k in old.get("queries", {}) and v < old["queries"][k]
    )
    print(
        "wrote %d bands (anchor %.3f s, %s, %d lowered by this"
        " capture) -> %s"
        % (
            len(bands["queries"]),
            bands["anchor_r01_shared_total"],
            "reset" if reset else "min-merged",
            lowered,
            out,
        )
    )


if __name__ == "__main__":
    main()
