"""Distributed connected components (duplicate-cluster resolution).

Min-label propagation with **pointer jumping**: each round first takes
the minimum label over graph neighbors (propagate), then shortcuts
``label(v) <- label(label(v))`` (jump).  Propagation alone needs
O(diameter) shuffle rounds — a 100-link near-dup chain would take 100
rounds at 100 TB; the jump step halves the remaining pointer depth each
round, bounding the loop at O(log diameter) rounds (the simple variant
of the large-star/small-star MapReduce scheme, Kiveris et al. 2014,
"Connected Components in MapReduce and Beyond").  Labels are always doc
ids inside the same component (the min over a set of member ids is a
member id), so the jump's label-of-label lookup is a self-join on the
label relation, never on the corpus.

Per-round cost: one edge-label shuffle join + one label self-join, both
keyed on high-cardinality ids.  Each round's labels are
``localCheckpoint``-ed: persist alone leaves the logical plan growing
~4× per round (the labels relation appears in the propagate join, the
least(), and the jump self-join), which overflows Catalyst's tree
walker after a handful of rounds — checkpointing truncates lineage to
the materialized result, the standard discipline for iterative Spark
algorithms (superseded rounds are dropped by the ContextCleaner once
unreferenced).  ``tests/test_properties.py`` pins the logarithmic round
count on a diameter-100 chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame) -> tuple[DataFrame, int]:
    """``pairs`` (doc1, doc2) = undirected duplicate edges.  Returns
    (labels, rounds): labels has one row per node appearing in any pair,
    ``component`` = minimum doc_id reachable from it.  The returned
    DataFrame is backed by a ``localCheckpoint`` — already materialized,
    cheap to re-consume; its storage (like each superseded round's) is
    released by the ContextCleaner once the DataFrame is unreferenced,
    NOT by ``unpersist()`` (a no-op on checkpointed frames) — callers
    manage lifetime by dropping references."""
    edges = pairs.unionByName(
        pairs.select(F.col("doc2").alias("doc1"), F.col("doc1").alias("doc2"))
    )
    # Round 11 (guide §2 — scale-adaptive partitioning): the loop's
    # per-round cost on a near-dup graph is task/stage overhead, not
    # compute — label relations are O(nodes-in-pairs) slim rows, and a
    # fixed 32-way layout pays 32 tasks per stage per round for a graph
    # of a few thousand edges.  Partition count derives from the
    # measured edge count (one bounded count on the relation the loop
    # materializes anyway; ~50k edges per partition, capped at the
    # session parallelism), so the same code lays out a 100 TB pair
    # graph wide and a small one narrow.  Measured at sf0.1: the pHash
    # component resolve dropped ~2x in same-window A/B.
    # Round 12 (r11 ADVICE): count the PERSISTED union, not the raw
    # plan — counting first evaluated the upstream pair pipeline twice
    # (once for the width probe, once on first materialization), which
    # is cheap for memo-backed callers but a full recompute for any
    # caller passing an expensive un-cached pairs relation.  The staging
    # cache is released as soon as the repartitioned layout is
    # materialized off it.
    staged = edges.persist()
    n_edges = staged.count()
    np_ = max(
        1,
        min(
            pairs.sparkSession.sparkContext.defaultParallelism,
            n_edges // 50_000 + 1,
        ),
    )
    edges = staged.repartition(np_, "doc2").persist()
    edges.count()  # materialize the layout from the staging cache
    staged.unpersist(blocking=False)
    labels = (
        edges.select(F.col("doc1").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .repartition(np_, "doc_id")
        .localCheckpoint(eager=True)
    )
    rounds = 0
    while True:
        rounds += 1
        neighbor_min = (
            edges.join(labels, edges.doc2 == labels.doc_id)
            .groupBy(F.col("doc1").alias("doc_id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        # carry the round-start label as `prev` so convergence is a
        # filter on the checkpointed result, not an extra join+job
        prop = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", "component")
                ).alias("component"),
                F.col("component").alias("prev"),
            )
            .persist()  # read twice by the jump; lazy — materialized
        )                # once, inside the checkpoint below
        # pointer jump: label(v) <- label(label(v)); the looked-up node
        # is always present (labels are member doc ids)
        parent = prop.select(
            F.col("doc_id").alias("p_id"), F.col("component").alias("p_comp")
        )
        jumped = (
            prop.join(parent, prop.component == parent.p_id, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"), F.coalesce("p_comp", "component")
                ).alias("component"),
                "prev",
            )
            .localCheckpoint(eager=True)
        )
        changed = jumped.filter(F.col("component") != F.col("prev")).count()
        prop.unpersist(blocking=False)
        labels = jumped.select("doc_id", "component")
        if changed == 0:
            break
    edges.unpersist(blocking=False)
    return labels, rounds


def pagerank_int(
    edges: DataFrame,
    iters: int,
    scale: int = 10**9,
    damp_num: int = 85,
    damp_den: int = 100,
    prepartitioned: bool = False,
) -> DataFrame:
    """PageRank in exact integer fixed point (per-node normalization:
    every node starts with ``scale`` units; classic PR times N).

    ``edges`` is directed (src, dst) — pass both directions for an
    undirected graph.  Every arithmetic step is integer (contribution =
    rank DIV out-degree; damping = ``damp_num * sum DIV damp_den``), so
    the result is bit-identical across engines, partitionings and
    reruns — no float summation anywhere, the same determinism rule as
    the cents/k-means fixed-point paths.  Nodes are the edge sources
    (an undirected graph has deg >= 1 everywhere, so no dangling-mass
    term).

    Per iteration: the EDGE list never re-shuffles — it is hash-
    partitioned by src once and persisted (its in-memory partitioning
    satisfies the join's distribution requirement), so each round
    exchanges the O(nodes) per-source rank relation onto it, then sums
    contributions per dst with map-side partial combine.  Ranks are
    ``localCheckpoint``-ed per round (see module docstring for why).
    At 100 TB this is the iterate-on-the-small-side discipline: the
    O(edges) shuffle is paid once at setup; each round's network is the
    rank relation in plus the partially-combined contribution sums out
    — O(nodes × partitions), never the raw edge list.
    """
    # ``prepartitioned=True``: the caller hands in an edge list already
    # hash-partitioned by src and persisted (e.g. a session memo shared
    # across calls — round 9); its lifecycle belongs to the caller.
    # Round 11 (guide §2 — scale-adaptive partitioning, the
    # connected_components treatment): the edge layout width derives
    # from the measured edge count instead of the session default, so
    # every per-round stage over a small graph runs a handful of tasks
    # instead of 32 — times ``iters`` rounds.  A prepartitioned caller
    # already chose its width; it is left untouched.
    if prepartitioned:
        e = edges
    else:
        # r11 ADVICE: persist-then-count so the caller's edge pipeline
        # is evaluated once, not once per (probe, materialization) —
        # see connected_components for the same fix
        staged = edges.persist()
        n_edges = staged.count()
        np_ = max(
            1,
            min(
                edges.sparkSession.sparkContext.defaultParallelism,
                n_edges // 50_000 + 1,
            ),
        )
        e = staged.repartition(np_, "src").persist()
        e.count()  # materialize the layout from the staging cache
        staged.unpersist(blocking=False)
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    nodes = deg.select(F.col("src").alias("node"))
    base = (scale * (damp_den - damp_num)) // damp_den
    ranks = nodes.withColumn(
        "rank", F.lit(scale).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(iters):
        # per-source outgoing contribution: O(nodes) rows, node-keyed
        per_src = (
            ranks.withColumnRenamed("node", "src")
            .join(deg, "src")
            .select("src", F.expr("rank DIV deg").alias("c"))
        )
        contribs = (
            e.join(per_src, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"{damp_num} * coalesce(s, 0L) DIV {damp_den}"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    if not prepartitioned:
        e.unpersist()
    return ranks
