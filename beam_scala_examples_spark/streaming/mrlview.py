"""Streaming Matryoshka (MRL) prefix-budget index ingest: incremental
maintenance of the structured-MRL serving relations
(``queries/llmdata.py::sim_matryoshka_recall_structured`` is the batch
twin) over an arriving embedding stream.

Where this sits on the streaming-index ladder the repo documents:

* k-means codebook (``ivfretrain.DriftRetrainIvfSink``) — NOT
  mergeable; needs a drift-triggered retrain gate;
* SQ8 min/max stats (``sq8view.Sq8IngestSink``) — mergeable PARTIALS,
  merged at serve time;
* MRL prefix norms (this sink) — **per-row** state: every vector's
  per-budget prefix norm is a pure function of that vector alone, so
  the ingest needs NO global statistics at all — the simplest rung,
  and the reason MRL serving composes with any arrival order trivially.

Scale design (the actual point of the twin): the structured vector is
stored SEGMENTED by budget — dims 1-8, 9-16, 17-32, 33-64 as separate
parquet columns — so serving at budget d reads ONLY the segment
columns that d needs (parquet column pruning, plan-tested); at 100 TB
the IO of a budget-8 query is ~1/8 of the full-dimension scan instead
of "scan everything, slice in memory".  This is the production MRL
serving trick (progressive column groups) expressed Spark-first.

The per-dim decay structuring reuses the exact shared double literals
of the batch query (``llmdata._SPARK_MRL_EMB``), so served rankings
are bit-comparable with the batch build.  Pinned EXACTLY equal to the
batch relations once the same vectors are in; replay-idempotent by the
dynamic-overwrite contract; empty-prefix-safe via :mod:`.logio`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.topk import top_k_per_key
from ..queries.llmdata import (
    _SPARK_DOT,
    EMB_DIM,
    MRL_DIMS,
    N_QUERY_VECS,
    TOPK_NEIGHBORS,
    mrl_structured,
)
from .logio import read_log, write_log_partition

# Segment boundaries: segment i holds dims (MRL_DIMS[i-1], MRL_DIMS[i]]
# — the increment each budget adds over the previous one.
_SEG_BOUNDS = [
    (1 if i == 0 else MRL_DIMS[i - 1] + 1, d) for i, d in enumerate(MRL_DIMS)
]


class MrlIngestSink:
    """foreachBatch sink maintaining the segmented Matryoshka index
    over (vec_id, embedding) micro-batches."""

    def __init__(self, log_path: str):
        self.vec_path = f"{log_path}/vectors"
        self._schema = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # guarded build (round-11 ADVICE): a wrong-dim arrival fails the
        # micro-batch loudly instead of logging null-padded segments
        structured = mrl_structured(
            batch_df.select("vec_id", "embedding")
        )
        cols = [F.col("vec_id")]
        for i, (lo, hi) in enumerate(_SEG_BOUNDS):
            cols.append(
                F.expr(f"slice(embedding, {lo}, {hi - lo + 1})").alias(
                    f"seg{i}"
                )
            )
        # per-budget prefix norms, one per MRL_DIMS entry — per-row
        # state, no global aggregate anywhere in this sink
        cols.append(
            F.array(*[
                F.expr(_SPARK_DOT.format(
                    a=f"slice(embedding, 1, {d})",
                    b=f"slice(embedding, 1, {d})",
                ))
                for d in MRL_DIMS
            ]).alias("pnorms")
        )
        self._schema = write_log_partition(
            structured.select(*cols), batch_id, self.vec_path
        )

    def _budget_relation(self, spark: SparkSession, d: int) -> DataFrame:
        """(vec_id, pe, nrm) at budget ``d``, reading ONLY the segment
        columns the budget needs (parquet prunes the rest)."""
        idx = MRL_DIMS.index(d)
        segs = [f"seg{i}" for i in range(idx + 1)]
        emb = segs[0] if len(segs) == 1 else "concat({})".format(
            ", ".join(segs)
        )
        return (
            read_log(spark, self.vec_path, self._schema)
            .select(
                "vec_id",
                F.expr(emb).alias("pe"),
                F.element_at("pnorms", idx + 1).alias("nrm"),
            )
            .filter(F.col("nrm") > 0)
        )

    def topk_view(self, spark: SparkSession, d: int) -> DataFrame:
        """The batch prefix-budget top-k relation (llmdata ``topd``)
        served from the log at budget ``d``."""
        base = self._budget_relation(spark, d)
        q = base.filter(F.col("vec_id") < N_QUERY_VECS).select(
            F.col("vec_id").alias("qid"),
            F.col("pe").alias("qe"),
            F.col("nrm").alias("qnorm"),
        )
        pairs = (
            base.join(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid", "vec_id",
                (
                    F.expr(_SPARK_DOT.format(a="qe", b="pe"))
                    / F.sqrt(F.col("qnorm") * F.col("nrm"))
                ).alias("cos"),
            )
        )
        return top_k_per_key(
            pairs, ["qid"], [F.desc("cos"), F.asc("vec_id")],
            TOPK_NEIGHBORS,
        ).select("qid", "vec_id")

    def recall_view(self, spark: SparkSession) -> DataFrame:
        """The full prefix-budget recall frontier — the batch
        ``sim_matryoshka_recall_structured`` relation served from the
        log (truth = the full-dimension budget over the same log)."""
        truth = self.topk_view(spark, EMB_DIM)
        legs = []
        for d in MRL_DIMS:
            legs.append(
                truth.join(
                    self.topk_view(spark, d).withColumn("hit", F.lit(1)),
                    ["qid", "vec_id"],
                    "left",
                )
                .agg(
                    F.lit(d).cast("long").alias("dim_budget"),
                    F.count("hit").alias("hits"),
                    F.count("*").alias("truth_rows"),
                )
                .select(
                    "dim_budget", "hits", "truth_rows",
                    # identical to the batch expression when rows exist;
                    # 0 on an empty log (the batch twin never sees one)
                    F.expr(
                        "if(truth_rows = 0, 0L,"
                        " (hits * 10000) div truth_rows)"
                    ).alias("mean_recall_bp"),
                )
            )
        out = legs[0]
        for leg in legs[1:]:
            out = out.unionByName(leg)
        return out
