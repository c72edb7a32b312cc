"""Ingest-time PERCEPTUAL image near-dup detection: the pHash member
of the streaming dedup family (``neardupview.py`` is the MinHash-LSH
text twin; ``queries/llmdata.py::multimodal_phash_novelty`` is this
sink's batch twin).

A multimodal pipeline wants "have we already ingested an image that
LOOKS like this?" at arrival time.  The sink maintains a band-bucket
registry (``(band, 16-bit bucket) -> earliest img_id``) over the
63-bit pHash: each micro-batch renders its documents' images (the
identical constructed corpus the batch queries use — originals plus the
salted variants), hashes the parsed BMP rasters, applies the
``PHASH_MIN_BITS`` entropy gate (flat rasters abstain), consults the
registry, and appends its own bucket minima.

Semantics: first-seen-wins over arrival order — an image is a dup iff
ANY of its bands was produced by an earlier image (earlier batch, or a
smaller img_id within the same batch).  With id-ordered arrival this
equals the batch ``multimodal_phash_novelty`` relation exactly
(pinned); out-of-order arrival keeps first-seen, stated not hidden.

Scale posture (the NearDupIngestSink discipline verbatim): per batch
O(batch) render/hash work (two narrow Arrow passes) + one join against
the registry keyed on (band, bucket); registry is O(distinct buckets)
slim rows, contribution is one row per bucket touched; decisions and
registry partition by batch_id with dynamic overwrite and the registry
read excludes the current batch's own partition, so replay re-derives
exactly the rows it owned.  With Delta/Iceberg the append becomes a
MERGE on (band, bucket) keeping the min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..operators.multimodal import (
    attach_bmp_payload_keyed,
    phash_bmp_metadata,
)
from ..queries.llmdata import (
    PHASH_BANDS,
    PHASH_MIN_BITS,
    _phash_image_corpus,
)


class PhashIngestSink:
    """foreachBatch sink maintaining the pHash bucket registry and the
    per-image near-dup decision log over (doc_id, text) micro-batches."""

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
            .agg(F.min("first_img").alias("prior_img"))
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        imgs = _phash_image_corpus(batch_df.select("doc_id", "text"))
        hashes = phash_bmp_metadata(attach_bmp_payload_keyed(imgs))
        # Decisions are per ARRIVING image (gate-failers abstain ->
        # never dup), so anchor on the full corpus member like the
        # batch twin does.
        gated = hashes.filter(
            F.expr("bit_count(phash)") >= PHASH_MIN_BITS
        )
        bands = gated.select(
            "img_id",
            F.explode(
                F.expr(f"sequence(0, {PHASH_BANDS - 1})")
            ).alias("band"),
            "phash",
        ).withColumn(
            "bucket", F.expr("shiftright(phash, band * 16) & 65535")
        )
        bmin = bands.groupBy("band", "bucket").agg(
            F.min("img_id").alias("batch_min")
        )
        enriched = bands.join(bmin, ["band", "bucket"])
        reg = self._registry(spark, int(batch_id))
        if reg is not None:
            enriched = enriched.join(reg, ["band", "bucket"], "left")
        else:
            enriched = enriched.withColumn(
                "prior_img", F.lit(None).cast("long")
            )
        prior = F.least(
            F.when(
                F.col("batch_min") < F.col("img_id"), F.col("batch_min")
            ),
            F.when(
                F.col("prior_img") < F.col("img_id"), F.col("prior_img")
            ),
        )
        dup = (
            enriched.select("img_id", prior.alias("prior"))
            .groupBy("img_id")
            .agg(F.min("prior").alias("dup_of"))
        )
        decisions = (
            hashes.select("img_id")
            .join(dup, "img_id", "left")
            .select(
                "img_id",
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
        (
            bmin.select(
                "band", "bucket", F.col("batch_min").alias("first_img")
            )
            .withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.registry_path)
        )

    def serving_view(self, spark: SparkSession) -> DataFrame:
        """All image near-dup decisions so far: (img_id, is_dup,
        dup_of) — each image decided exactly once, at arrival."""
        return spark.read.parquet(self.decisions_path).select(
            "img_id", "is_dup", "dup_of"
        )
