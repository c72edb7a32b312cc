"""Ingest-time video near-dup detection: the video member of the
streaming dedup family (``phashview.py`` is the image twin;
``queries/llmdata.py::multimodal_video_pairs`` is this sink's batch
twin).

A multimodal pipeline signs each arriving video ONCE — render, parse,
scene-segment, keyframe-hash (the expensive half) — and appends the
slim (vid_id, sig, plane_px) rows to a batch_id-partitioned signature
registry.  Pair detection then runs over signatures only: serving
recomputes the Jaccard-verified pair relation (and is pinned EXACTLY
equal to the batch ``multimodal_video_pairs`` over the same corpus),
so the per-arrival cost is one signing pass and the quadratic term
stays the bucket-bounded Σ|bucket|² self-join, on slim rows, on
demand.

Scale posture (the house registry discipline): contribution is
O(batch scenes) rows under the batch's own partition with dynamic
overwrite — replay re-derives exactly its own rows (pinned); the
registry read for serving is one parquet scan of int64 rows.  With
Delta/Iceberg the append becomes a plain INSERT; an incremental
serving variant would join only the NEW batch's signatures against the
registry (first-seen semantics like ``PhashIngestSink``) — the full
recompute here keeps the strong batch-equality pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_y4m_payload_keyed,
    scene_keyframes_y4m_metadata,
)
from ..queries.llmdata import (
    VIDEO_DUP_MIN_JACCARD_BP,
    VIDEO_MIN_PLANE_PX,
    _video_corpus,
)
from .logio import read_log, write_log_partition


class VideoSigIngestSink:
    """foreachBatch sink maintaining the per-scene keyframe signature
    registry over (doc_id, text) micro-batches."""

    def __init__(self, registry_path: str):
        self.registry_path = registry_path
        self._log_schema = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        vids = _video_corpus(batch_df.select("doc_id", "text"))
        sigs = scene_keyframes_y4m_metadata(
            attach_y4m_payload_keyed(vids)
        )
        self._log_schema = write_log_partition(
            sigs, batch_id, self.registry_path
        )

    def signatures(self, spark: SparkSession) -> DataFrame:
        """The accumulated signature registry (vid_id, scene_idx,
        scene_len, plane_px, sig)."""
        return read_log(
            spark, self.registry_path, self._log_schema
        ).drop("batch_id")

    def serving_view(self, spark: SparkSession) -> DataFrame:
        """The Jaccard-verified near-dup pair relation over every video
        ingested so far — the identical gate/join/verify expressions to
        the batch ``multimodal_video_pairs``, over the registry."""
        sigs = (
            self.signatures(spark)
            .filter(F.col("plane_px") >= VIDEO_MIN_PLANE_PX)
            .select("vid_id", "sig")
            .distinct()
        )
        cnt = sigs.groupBy("vid_id").agg(F.count("*").alias("n"))
        a = sigs.alias("a")
        b = sigs.alias("b").hint("SHUFFLE_HASH")
        shared = (
            a.join(b, "sig")
            .filter(F.col("a.vid_id") < F.col("b.vid_id"))
            .groupBy(
                F.col("a.vid_id").alias("vid_a"),
                F.col("b.vid_id").alias("vid_b"),
            )
            .agg(F.count("*").alias("n_shared"))
        )
        ca = cnt.alias("ca")
        cb = cnt.alias("cb")
        return (
            shared.join(ca, F.col("vid_a") == F.col("ca.vid_id"))
            .join(cb, F.col("vid_b") == F.col("cb.vid_id"))
            .select(
                "vid_a", "vid_b", "n_shared",
                F.expr(
                    "(n_shared * 10000) div (ca.n + cb.n - n_shared)"
                ).alias("jaccard_bp"),
            )
            .filter(F.col("jaccard_bp") >= VIDEO_DUP_MIN_JACCARD_BP)
        )
