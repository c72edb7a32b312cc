"""K-means: partitioning-independence and plan shape.

Oracle parity at sf0.01 lives in the driver gate / ``test_parity.py``;
here we pin the property that makes the parity stable — the fixed-point
centroid sums make the final assignment identical under a different
partitioning — and that the assignment pass is narrow (literal
centroids, no join).
"""

from __future__ import annotations

from beam_scala_examples_spark.queries import QUERIES
from beam_scala_examples_spark.queries.clustering import KM_K
from tests.test_plans import plan_str


def test_kmeans_partitioning_independent(spark, sf_dir):
    base = {
        (r.vec_id, r.cluster)
        for r in QUERIES["emb_kmeans"](spark, sf_dir).collect()
    }
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        other = {
            (r.vec_id, r.cluster)
            for r in QUERIES["emb_kmeans"](spark, sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == other
    assert len({c for _, c in base}) <= KM_K


def test_kmeans_assignment_is_narrow(spark, sf_dir):
    """The final assignment plan must not contain any join operator —
    centroids ride in the kernel closure.  The only Exchange allowed is
    the one-time repartition *inside* the cached corpus relation (spreads
    a single parquet file across the cluster once); everything above the
    InMemoryTableScan must be a narrow Arrow-vectorized map."""
    p = plan_str(QUERIES["emb_kmeans"](spark, sf_dir))
    for join_op in ("SortMergeJoin", "BroadcastHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in p
    assert "ArrowEvalPython" in p       # vectorized, not row-at-a-time
    assert "BatchEvalPython" not in p
    above_cache = p.split("InMemoryRelation")[0]
    assert "InMemoryTableScan" in above_cache  # assignment reads the cache
    assert "Exchange" not in above_cache  # narrow above the cached corpus
