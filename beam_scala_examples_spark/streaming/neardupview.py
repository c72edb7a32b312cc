"""Ingest-time NEAR-duplicate detection: the MinHash-LSH member of the
streaming dedup family (``dedupview.py`` is the exact-hash twin;
``queries/llmdata.py::dedup_lsh_novelty`` is this sink's batch twin).

A training-data pipeline wants near-dup decisions AT ARRIVAL TIME —
"have we already ingested something like this?" — without re-running
corpus-wide LSH per drop.  The sink maintains a bucket registry
(``(band, bucket) -> earliest doc_id seen``) incrementally: each
micro-batch computes its own banded MinHash signatures
(``minhash_buckets``, the identical expression pipeline the batch path
uses), consults the registry, and appends its own bucket minima.

Semantics: first-seen-wins over arrival order — a document is a dup iff
ANY of its band buckets was produced by an earlier document (earlier
batch, or a smaller doc_id within the same batch); ``dup_of`` is the
earliest such document.  With id-ordered arrival this equals the batch
``dedup_lsh_novelty`` relation exactly (pinned); out-of-order arrival
keeps first-seen — the honest streaming semantics, stated rather than
hidden.

Scale posture:
 - Per batch: O(batch) shingle/minhash work + one join against the
   registry keyed on (band, bucket).  The registry is O(distinct
   buckets) slim rows; the per-batch contribution is one row per
   bucket TOUCHED by the batch — never a corpus rescan.
 - Replay safety (the dedupview discipline): decisions and registry
   contributions both partition by batch_id with dynamic partition
   overwrite, and the registry read EXCLUDES the current batch's own
   partition, so a replayed batch re-derives exactly the rows it owned.
 - With Delta/Iceberg the registry append becomes a MERGE on
   (band, bucket) keeping the min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..queries.llmdata import minhash_buckets


class NearDupIngestSink:
    """foreachBatch sink maintaining the LSH bucket registry and the
    per-document near-dup decision log."""

    def __init__(self, registry_path: str, decisions_path: str):
        self.registry_path = registry_path
        self.decisions_path = decisions_path

    def _registry(
        self, spark: SparkSession, exclude_batch: int
    ) -> DataFrame | None:
        try:
            log = spark.read.parquet(self.registry_path)
        except AnalysisException:
            return None
        return (
            log.filter(F.col("batch_id") != exclude_batch)
            .groupBy("band", "bucket")
            .agg(F.min("first_doc").alias("prior_doc"))
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sigs = minhash_buckets(batch_df.select("doc_id", "text"))
        bmin = sigs.groupBy("band", "bucket").agg(
            F.min("doc_id").alias("batch_min")
        )
        enriched = sigs.join(bmin, ["band", "bucket"])
        reg = self._registry(spark, int(batch_id))
        if reg is not None:
            enriched = enriched.join(reg, ["band", "bucket"], "left")
        else:
            enriched = enriched.withColumn(
                "prior_doc", F.lit(None).cast("long")
            )
        # earliest earlier doc sharing this bucket: a smaller id within
        # the batch, or the registry's minimum — both guarded < doc_id
        # so out-of-order arrival can only keep first-seen, never point
        # a doc at a LATER one.
        prior = F.least(
            F.when(F.col("batch_min") < F.col("doc_id"), F.col("batch_min")),
            F.when(F.col("prior_doc") < F.col("doc_id"), F.col("prior_doc")),
        )
        decisions = (
            enriched.select("doc_id", prior.alias("prior"))
            .groupBy("doc_id")
            .agg(F.min("prior").alias("dup_of"))
            .select(
                "doc_id",
                F.col("dup_of").isNotNull().alias("is_dup"),
                "dup_of",
            )
        )
        (
            decisions.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.decisions_path)
        )
        # Registry contribution: this batch's bucket minima.  Computed
        # from batch data only (never reads registry_path), so there is
        # no read-then-overwrite-same-path hazard here.
        (
            bmin.select(
                "band", "bucket", F.col("batch_min").alias("first_doc")
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.registry_path)
        )

    def serving_view(self, spark: SparkSession) -> DataFrame:
        """All near-dup decisions so far: (doc_id, is_dup, dup_of) —
        each document decided exactly once, at arrival."""
        return spark.read.parquet(self.decisions_path).select(
            "doc_id", "is_dup", "dup_of"
        )
