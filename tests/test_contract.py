"""Driver-contract self-test: ``__spark_entry__`` is the runtime surface
the harness consumes — pin its shape so a refactor cannot silently break
the gate (keys drift, a query stops returning a DataFrame, the flagship
entry changes schema).
"""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import DataFrame

_SPEC = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
)
assert _SPEC is not None
entry_mod = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(entry_mod)


def test_every_query_has_matching_oracle_keys():
    qs = entry_mod.queries()
    oracle = entry_mod.oracle_sql()
    assert set(oracle) == set(qs), (
        "oracle_sql() keys must exactly match queries() keys"
    )
    assert len(qs) >= 56


def test_entry_returns_dataframe_with_stable_schema(spark):
    import pytest

    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("entry() reads the driver's fixed sf0.001 path")
    df = entry_mod.entry(spark)
    assert isinstance(df, DataFrame)
    assert df.columns == ["doc_id", "word", "tfidf"]


def test_queries_accept_bare_session(spark, sf_dir):
    """The driver hands a BARE session; the query wrapper must re-apply
    the engine confs per call. Un-set them first so the test actually
    catches a dropped _configure (the shared fixture session already has
    them), and restore the fixture's shuffle sizing afterwards."""
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.unset("spark.sql.session.timeZone")
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        qs = entry_mod.queries()
        df = qs["q01_minimal_wordcount"](spark, sf_dir)
        assert isinstance(df, DataFrame)
        assert df.count() > 0  # nanos parquet readable again
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)


def test_bench_headline_names_are_registered():
    """Every bench.py HEADLINE name must be a registered query — a typo
    here would crash the driver's per-round benchmark run."""
    import bench

    from beam_scala_examples_spark.queries import QUERIES

    missing = [q for q in bench.HEADLINE if q not in QUERIES]
    assert not missing, f"bench names not in registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate bench names"


def test_band_gate_trips_on_deliberate_slowdown():
    """The round-5 per-query regression gate: a query that doubles AND
    loses >0.25 s absolute is flagged by name; sub-second noise and
    unrecorded (new) queries are not.  Simulates the scratch-branch
    slowdown the gate exists to catch, without re-running the bench."""
    import bench

    bands = {
        "sf": 0.1,
        "anchor_r01_shared_total": 13.0,
        "queries": {"slow_one": 1.0, "tiny": 0.05, "steady": 2.0},
    }
    timings = {
        "slow_one": 5.0,   # 5x and +4 s -> violation
        "tiny": 0.2,       # 4x but only +0.15 s -> noise, not flagged
        "steady": 2.1,     # within band
        "brand_new": 9.9,  # no recorded band -> never a violation
    }
    v = bench.band_violations(timings, bands)
    assert v == {"slow_one": [1.0, 5.0]}
    assert bench.band_violations(timings, None) == {}
    assert not bench.anchor_regressed(14.0, bands)
    assert bench.anchor_regressed(27.0, bands)
    assert not bench.anchor_regressed(27.0, None)


def test_band_gate_is_drift_proof():
    """Round-10 verdict item 2: a deliberately dirty/cold replay must
    produce ZERO false flags while an injected slowdown in one query
    still trips.

    (a) Uniform host drift: every query 2.2x its band because the host
    is 2.2x slower (anchor moved identically) -> the anchor-normalized
    gate cancels it (drift capped at DRIFT_CAP).
    (b) Warmth: a codebook-cold measurement is never judged against a
    codebook-warm band — it lands in warmth_skipped instead.
    (c) A genuine 2x+ regression (anchor flat, same warmth) trips."""
    import bench

    warm = bench.warmth_sig({"warm": {"trained_codebooks": 2}, "built": {}})
    cold = bench.warmth_sig({"warm": {}, "built": {"trained_codebooks": 2}})
    assert warm != cold and bench.warmth_sig(None) == ""

    bands = {
        "sf": 0.1,
        "anchor_r01_shared_total": 10.0,
        "queries": {"ann": 2.0, "steady": 1.0},
        "warmth": {"ann": warm, "steady": ""},
    }
    # (a) uniformly slow host: everything 2.2x, anchor too -> no flags
    slow_host = {"ann": 4.4, "steady": 2.2}
    ms_warm = {"ann": {"warm": {"trained_codebooks": 2}, "built": {}}}
    assert bench.band_violations(slow_host, bands, ms_warm, 22.0) == {}
    # (b) codebook-cold replay of ann (trained inside its timed run):
    # 3x the warm band on a quiet host -> adjudicated out, not flagged
    ms_cold = {"ann": {"warm": {}, "built": {"trained_codebooks": 2}}}
    cold_run = {"ann": 6.0, "steady": 1.05}
    assert bench.band_violations(cold_run, bands, ms_cold, 10.1) == {}
    skips = bench.warmth_skips(cold_run, bands, ms_cold)
    assert skips == {"ann": [warm, cold]}
    # (c) real regression: same warmth, anchor flat, one query 3x
    regressed = {"ann": 6.0, "steady": 1.05}
    assert bench.band_violations(regressed, bands, ms_warm, 10.1) == {
        "ann": [2.0, 6.0]
    }
    # drift relaxes only: a FASTER host never tightens the gate
    assert bench._drift(bands, 5.0) == 1.0
    assert bench._drift(bands, 100.0) == bench.DRIFT_CAP


def test_drift_requires_cpu_corroboration():
    """Round-11 (round-10 ADVICE, medium): the anchor-derived drift
    factor alone cannot tell a slower host from a uniform code
    regression.  Round-12 (r11 verdict item 3): when the bands file
    records the host-independent CPU probe reference, the gate's
    relaxing factor is the cpu ratio ALONE — the round-11 min(anchor,
    cpu) under-relaxed every untouched band whenever a round's code
    made the ANCHOR faster on a SLOWER host (the r11 driver capture
    flagged >=10 untouched queries exactly this way):

    (a) genuine host slowdown (cpu probe also 2.2x) -> bands relax,
        no flags;
    (b) uniform CODE regression (anchor 2.2x, cpu probe flat) -> the
        gate does NOT relax (a code change cannot move the probe):
        every slowed query is flagged;
    (c) raw-band breaches excused by corroborated drift are surfaced
        (drift_excused) and fail a --strict run (exit 5) instead of
        vanishing into the relaxed gate;
    (d) the r11 failure mode: slower host (cpu 2.2x) whose anchor
        moved only 1.1x because this round's code made the anchor
        faster -> untouched queries at host-drifted 2.2x must NOT
        flag (min() flagged them; cpu-alone excuses them)."""
    import bench

    bands = {
        "sf": 0.1,
        "anchor_r01_shared_total": 10.0,
        "queries": {"a": 2.0, "b": 1.0},
        "cpu_micro_ref": 0.02,
    }
    slowed = {"a": 4.4, "b": 2.2}
    # (a) host really is 2.2x slower: cpu probe corroborates -> no flags
    assert bench.band_violations(slowed, bands, {}, 22.0, 0.044) == {}
    # (b) cpu probe flat: the 2.2x is code, not host -> both flagged
    flagged = bench.band_violations(slowed, bands, {}, 22.0, 0.02)
    assert set(flagged) == {"a", "b"}
    # (d) slower host masked by faster code: anchor only 1.1x but the
    # probe reads 2.2x -> cpu-alone relaxation, no false flags
    assert bench.band_violations(slowed, bands, {}, 11.0, 0.044) == {}
    assert round(bench._drift(bands, 11.0, 0.044), 9) == 2.2
    # legacy bands without the probe keep the round-10 anchor fallback
    legacy = {k: v for k, v in bands.items() if k != "cpu_micro_ref"}
    assert bench.band_violations(slowed, legacy, {}, 22.0, 0.02) == {}
    # (c) corroborated-drift excusals are reportable, and strict-fatal
    excused = bench.drift_excused(slowed, bands, {}, 22.0, 0.044)
    assert set(excused) == {"a", "b"}
    assert bench.exit_code(11.0, bands, {}, strict=False, excused=excused) == 0
    assert bench.exit_code(11.0, bands, {}, strict=True, excused=excused) == 5
    assert bench.exit_code(
        11.0, bands, {}, strict=True, warmth_skipped={"a": ["w", "c"]}
    ) == 5
    assert bench.exit_code(11.0, bands, {}, strict=True) == 0


def test_loadavg_gate_sees_ghost_load():
    """Round-11 (verdict item 2): the documented firecracker ghost-load
    state (loadavg 5-10 with zero busy procs, ~2x small-query
    inflation) must never stamp a capture clean — BENCH_r10 was stamped
    clean at loadavg1 6.71 under the old cores/4 threshold."""
    import bench

    assert bench.LOADAVG_CLEAN_MAX < 5.0


def test_band_merge_keeps_historical_minima():
    """Round-7 gate hygiene: regenerating bands min-merges the new
    capture into the existing file — a noisy-high machine can never
    loosen the gate, new queries enter verbatim, removed queries drop
    out, and --reset (or an sf change) rebuilds from the capture."""
    import importlib.util as _ilu
    import os as _os

    spec = _ilu.spec_from_file_location(
        "update_bench_bands",
        _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "tools", "update_bench_bands.py",
        ),
    )
    ubb = _ilu.module_from_spec(spec)
    spec.loader.exec_module(ubb)

    old = {
        "sf": 0.1,
        "anchor_r01_shared_total": 11.0,
        "queries": {"a": 1.0, "b": 3.0, "removed": 0.5},
    }
    detail = {
        "sf": 0.1,
        "r01_shared_total": 13.0,          # noisier capture
        "queries": {"a": 2.0, "b": 2.5, "new_q": 4.0},
    }
    merged = ubb.merged_bands(detail, old, reset=False)
    assert merged["queries"] == {"a": 1.0, "b": 2.5, "new_q": 4.0}
    assert merged["anchor_r01_shared_total"] == 11.0
    assert "removed" not in merged["queries"]
    assert "MIN-OF-N" in merged["comment"]

    reset = ubb.merged_bands(detail, old, reset=True)
    assert reset["queries"] == detail["queries"]
    assert reset["anchor_r01_shared_total"] == 13.0

    other_sf = ubb.merged_bands(detail, {**old, "sf": 0.01}, reset=False)
    assert other_sf["queries"] == detail["queries"]

    # round-11 --adopt-warmth: registering a new session memo changes
    # every warmth signature's encoding; the mode keeps min-merged
    # VALUES but stamps the current capture's signatures (default mode
    # keeps the old band's warmth with the old band)
    spec2 = _ilu.spec_from_file_location(
        "bench_t", _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "bench.py",
        ),
    )
    bench_t = _ilu.module_from_spec(spec2)
    spec2.loader.exec_module(bench_t)
    old_sig = bench_t.warmth_sig({"warm": {"codebooks": 1}, "built": {}})
    new_sig = bench_t.warmth_sig(
        {"warm": {"codebooks": 1, "new_memo": 1}, "built": {}}
    )
    old_w = {**old, "warmth": {"a": old_sig}}
    det_w = {**detail, "memo_state": {
        "a": {"warm": {"codebooks": 1, "new_memo": 1}, "built": {}}
    }}
    kept = ubb.merged_bands(det_w, old_w, reset=False)
    assert kept["queries"]["a"] == 1.0 and kept["warmth"]["a"] == old_sig
    adopted = ubb.merged_bands(det_w, old_w, reset=False, adopt_warmth=True)
    assert adopted["queries"]["a"] == 1.0      # value still min-merged
    assert adopted["warmth"]["a"] == new_sig   # signature re-stamped

    # round-11: the cpu probe reference min-merges too, and an old
    # reference survives a capture that lacks the probe
    m2 = ubb.merged_bands(
        {**detail, "cpu_micro_sec": 0.03},
        {**old, "cpu_micro_ref": 0.02},
        reset=False,
    )
    assert m2["cpu_micro_ref"] == 0.02
    m3 = ubb.merged_bands(detail, {**old, "cpu_micro_ref": 0.02}, False)
    assert m3["cpu_micro_ref"] == 0.02
    assert "cpu_micro_ref" not in ubb.merged_bands(detail, old, False)


def test_bands_file_matches_registry():
    """bench_bands.json must cover the registered queries it claims to
    gate — a band for an unregistered name is a stale file."""
    import json

    import bench
    from beam_scala_examples_spark.queries import QUERIES

    bands = bench.load_bands(0.1)
    assert bands is not None, "bench_bands.json missing or wrong SF"
    stale = [n for n in bands["queries"] if n not in QUERIES]
    assert not stale, f"bands for unregistered queries: {stale}"


def test_bench_strict_exit_semantics():
    """Round-6 --strict: confirmed per-query violations fail ONLY under
    strict; anchor regression fails either way and takes precedence."""
    import bench

    bands = {"sf": 0.1, "anchor_r01_shared_total": 13.0,
             "queries": {"q": 1.0}}
    v = {"q": [1.0, 5.0]}
    assert bench.exit_code(14.0, bands, {}, strict=False) == 0
    assert bench.exit_code(14.0, bands, {}, strict=True) == 0
    assert bench.exit_code(14.0, bands, v, strict=False) == 0
    assert bench.exit_code(14.0, bands, v, strict=True) == 3
    assert bench.exit_code(27.0, bands, v, strict=True) == 2
    assert bench.exit_code(27.0, bands, {}, strict=False) == 2


def test_clear_session_memos_rebuilds_identically(spark, sf_dir):
    """Round-6 memo lifecycle: clearing every session memo releases the
    persisted relations and the next call rebuilds bit-identical
    results (everything memoized is deterministic)."""
    from beam_scala_examples_spark.queries.clustering import (
        _TRAIN_MEMO,
        emb_kmeans,
    )
    from beam_scala_examples_spark.queries.llmdata import (
        _STRUCT_MEMO,
        _WINNOW_PRINT_MEMO,
        text_structured,
        winnow_prints_memo,
    )
    from beam_scala_examples_spark.queries.relational import (
        _LPA_CACHE,
        _copurchase_edges,
    )
    from beam_scala_examples_spark.session import clear_session_memos

    before_struct = sorted(
        tuple(r) for r in text_structured(spark, sf_dir).collect()
    )
    before_km = sorted(
        tuple(r[0:2]) for r in emb_kmeans(spark, sf_dir).collect()
    )
    before_prints = sorted(
        tuple(r) for r in winnow_prints_memo(spark, sf_dir).collect()
    )
    before_edges = sorted(
        tuple(r) for r in _copurchase_edges(spark, sf_dir).collect()
    )
    assert (_STRUCT_MEMO and _TRAIN_MEMO and _WINNOW_PRINT_MEMO
            and _LPA_CACHE)
    clear_session_memos()
    assert (not _STRUCT_MEMO and not _TRAIN_MEMO
            and not _WINNOW_PRINT_MEMO and not _LPA_CACHE)
    after_struct = sorted(
        tuple(r) for r in text_structured(spark, sf_dir).collect()
    )
    after_km = sorted(
        tuple(r[0:2]) for r in emb_kmeans(spark, sf_dir).collect()
    )
    after_prints = sorted(
        tuple(r) for r in winnow_prints_memo(spark, sf_dir).collect()
    )
    after_edges = sorted(
        tuple(r) for r in _copurchase_edges(spark, sf_dir).collect()
    )
    assert before_struct == after_struct
    assert before_km == after_km
    assert before_prints == after_prints
    assert before_edges == after_edges


def test_bench_capture_hygiene_evidence():
    """Round-8 capture hygiene: the contention census must see this
    test's own Spark JVM as OURS (descendant), report foreign JVMs as a
    non-negative count, and classify evidence with the documented clean
    rule — so a committed bench capture carries trustworthy evidence it
    ran alone (the r07 committed capture was contention-inflated)."""
    import os

    import bench

    assert bench._is_descendant(os.getpid(), os.getpid())
    assert not bench._is_descendant(1, os.getpid())
    ev = bench.capture_evidence()
    assert set(ev) == {"foreign_jvms", "loadavg1", "clean"}
    assert ev["foreign_jvms"] >= 0
    # the clean rule is exactly the documented predicate
    assert ev["clean"] == (
        ev["foreign_jvms"] == 0
        and ev["loadavg1"] <= bench.LOADAVG_CLEAN_MAX
    )


def test_driver_window_is_derived_and_unbiased():
    """Round-10 (ADVICE): the driver-gate window is a pure function of
    the query registry and the committed CORRECTNESS_r*.json history —
    deterministic across calls, exactly _WINDOW names, CORE + FRESH
    always present, and the rotating slots filled never-driver-checked-
    first so no query can be held out of the gate for not being green."""
    import importlib.util as _ilu
    import os as _os

    spec = _ilu.spec_from_file_location(
        "entry_mod_t",
        _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "__spark_entry__.py",
        ),
    )
    m = _ilu.module_from_spec(spec)
    spec.loader.exec_module(m)

    w1, w2 = m.driver_window(), m.driver_window()
    assert w1 == w2, "window must be deterministic"
    assert len(w1) == m._WINDOW and len(set(w1)) == m._WINDOW
    for name in m._CORE + m._FRESH:
        assert name in w1, f"core/fresh query {name} missing from window"
    from beam_scala_examples_spark.queries import QUERIES
    assert all(n in QUERIES for n in w1)
    # rotation prefers never-driver-checked queries: while unseen
    # queries remain, no rotated slot may hold an already-checked one
    salt, seen = m._gate_history()
    head = set(m._CORE) | set(m._FRESH)
    rotated = [n for n in w1 if n not in head]
    unseen_pool = [n for n in QUERIES if n not in head and n not in seen]
    if len(unseen_pool) >= len(rotated):
        assert all(n not in seen for n in rotated)
    # the window is the exact prefix of queries()
    assert list(m.queries())[: m._WINDOW] == w1
