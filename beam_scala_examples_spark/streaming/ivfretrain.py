"""Drift-triggered IVF retraining (round 8, verdict item 8): wires the
two existing streaming pieces together — :class:`~.ivfview.IvfIngestSink`
serves a FROZEN trained quantizer, :class:`~.pcadrift.PcaDriftViewSink`
measures embedding drift — into the maintenance loop a production
vector index actually runs: ingest vectors, watch the dominant
direction of the accumulated corpus, and when it moves past a threshold
RETRAIN the coarse quantizer on the accumulated log, versioning each
codebook in a registry.

State (all batch_id/version-partitioned, the house log discipline):

 - ``vectors``: (vec_id, embedding) per batch — the accumulated corpus
   (the retrainer's training set; also what serving scores against);
 - ``pca_log``: the batch's additive integer PCA moment rows
   (:func:`~.pcadrift.pca_moment_contrib` — identical constructor);
 - ``codebooks``: (version, cluster, centroid) — one partition per
   retrain, version = the batch_id that triggered it;
 - ``pc_snapshots``: (version, dim, v_micro) — the top principal
   component AT train time, the reference the drift test compares
   against;
 - ``drift_log``: (batch_id, version, drift_micro, retrained) — the
   per-batch decision, observable and testable.

Drift metric: ``1e6 − |cos(v_now, v_ref)|·1e6`` over the integer-micro
eigenvectors (both from the same deterministic fixed-point power
iteration), so the decision is exact integer arithmetic and a REPLAYED
batch — whose moment/vector logs re-derive identically and whose
dueness reads exclude nothing it doesn't own — re-derives the identical
decision, codebook (Lloyd from lowest-vec_id init is deterministic),
and version number (the batch_id).  Replay-idempotent end to end.

Scale posture: per batch one narrow moment pass + two O(K·DIM) driver
aggregates (the power iteration and, on retrain, the Lloyd loop — both
the bounded-collect sanction); the retrain reads the accumulated vector
log once per trigger, the same cost as the index rebuild it is.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..operators.topk import top_k_per_key
from ..queries.clustering import IVF_TR_NPROBE, _assign, _kmeans_train
from ..queries.llmdata import N_QUERY_VECS, TOPK_NEIGHBORS, _SPARK_DOT
from .pcadrift import pca_moment_contrib, pca_top_component_from_log

# Retrain when the accumulated top PC has rotated by more than ~18°
# (|cos| < 0.95) away from the active codebook's training-time PC.
DRIFT_RETRAIN_MICRO = 50_000


def _cos_micro(a: dict[int, int], b: dict[int, int]) -> int:
    """|cos| in micro units between two integer-micro eigenvectors."""
    dot = sum(v * b.get(d, 0) for d, v in a.items())
    na = math.isqrt(sum(v * v for v in a.values()))
    nb = math.isqrt(sum(v * v for v in b.values()))
    if na == 0 or nb == 0:
        return 0
    return abs(dot) * 1_000_000 // (na * nb)


class DriftRetrainIvfSink:
    """foreachBatch sink over (vec_id, embedding) micro-batches that
    maintains a VERSIONED trained-IVF quantizer, retraining when the
    accumulated embedding drift exceeds ``drift_retrain_micro``."""

    def __init__(
        self, base_path: str,
        drift_retrain_micro: int = DRIFT_RETRAIN_MICRO,
    ):
        self.vectors_path = f"{base_path}/vectors"
        self.pca_log_path = f"{base_path}/pca_log"
        self.codebooks_path = f"{base_path}/codebooks"
        self.snapshots_path = f"{base_path}/pc_snapshots"
        self.drift_log_path = f"{base_path}/drift_log"
        self.drift_retrain_micro = int(drift_retrain_micro)

    # -- log plumbing -------------------------------------------------
    def _write(self, df: DataFrame, part_col: str, part: int, path: str):
        (
            df.withColumn(part_col, F.lit(int(part)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(part_col)
            .parquet(path)
        )

    def _read(self, spark: SparkSession, path: str) -> DataFrame | None:
        try:
            return spark.read.parquet(path)
        except AnalysisException:
            return None

    # -- serving ------------------------------------------------------
    def active_version(self, spark: SparkSession) -> int | None:
        reg = self._read(spark, self.codebooks_path)
        if reg is None:
            return None
        row = reg.agg(F.max("version").alias("v")).collect()[0]
        return None if row.v is None else int(row.v)

    def centroids(
        self, spark: SparkSession, version: int | None = None
    ) -> list[tuple[int, list[float]]]:
        if version is None:
            version = self.active_version(spark)
        rows = (
            spark.read.parquet(self.codebooks_path)
            .filter(F.col("version") == int(version))
            .orderBy("cluster")
            .collect()
        )
        return [(int(r.cluster), list(r.centroid)) for r in rows]

    def _snapshot(self, spark: SparkSession, version: int) -> dict:
        rows = (
            spark.read.parquet(self.snapshots_path)
            .filter(F.col("version") == int(version))
            .collect()
        )
        return {int(r.dim): int(r.v_micro) for r in rows}

    def _current_pc(self, spark: SparkSession) -> dict:
        log = self._read(spark, self.pca_log_path)
        rows = pca_top_component_from_log(log).collect()
        return {int(r.dim): int(r.v_micro) for r in rows}

    # -- ingest -------------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        vecs = batch_df.select("vec_id", "embedding")
        self._write(vecs, "batch_id", batch_id, self.vectors_path)
        self._write(
            pca_moment_contrib(vecs), "batch_id", batch_id,
            self.pca_log_path,
        )
        pc_now = self._current_pc(spark)
        active = self.active_version(spark)
        if active is None:
            drift = 1_000_000
        else:
            drift = 1_000_000 - _cos_micro(
                pc_now, self._snapshot(spark, active)
            )
        retrain = drift > self.drift_retrain_micro
        if retrain:
            corpus = (
                spark.read.parquet(self.vectors_path)
                .select("vec_id", "embedding")
                .localCheckpoint()
            )
            cents = _kmeans_train(corpus)
            cdf = spark.createDataFrame(
                [(cid, vec) for cid, vec in cents],
                "cluster bigint, centroid array<double>",
            )
            self._write(cdf, "version", batch_id, self.codebooks_path)
            pdf = spark.createDataFrame(
                [(d, v) for d, v in sorted(pc_now.items())],
                "dim bigint, v_micro bigint",
            )
            self._write(pdf, "version", batch_id, self.snapshots_path)
        decision = spark.createDataFrame(
            [(
                -1 if active is None else active,
                int(drift),
                bool(retrain),
            )],
            "version bigint, drift_micro bigint, retrained boolean",
        )
        self._write(decision, "batch_id", batch_id, self.drift_log_path)

    # -- retrieval + recall -------------------------------------------
    def topk_view(
        self, spark: SparkSession, version: int | None = None,
        query_ids: list[int] | None = None,
    ) -> DataFrame:
        """The trained-IVF probe top-k over the accumulated corpus with
        the given (default: active) codebook version — the identical
        probe ranking and exact-cosine scoring the frozen
        ``IvfIngestSink.topk_view`` serves, but against a VERSIONED
        quantizer.  ``query_ids`` selects the query workload (default:
        the house ``vec_id < N_QUERY_VECS`` set) — under drift the
        workload follows the data, which is what makes the retrain
        guard measurable."""
        cents = self.centroids(spark, version)
        log = _assign(
            spark.read.parquet(self.vectors_path).select(
                "vec_id", "embedding"
            ),
            cents,
        ).localCheckpoint(eager=False)
        norm = F.expr(_SPARK_DOT.format(a="embedding", b="embedding"))
        log = log.withColumn("nrm", norm)
        cdf = spark.createDataFrame(
            [(cid, vec) for cid, vec in cents],
            "cluster bigint, c array<double>",
        )
        qpred = (
            F.col("vec_id") < N_QUERY_VECS
            if query_ids is None
            else F.col("vec_id").isin([int(q) for q in query_ids])
        )
        qdf = log.filter(qpred).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnorm"),
        )
        l2 = F.expr(
            "aggregate(zip_with(qe, c,"
            " (x, y) -> (cast(x as double) - y) * (cast(x as double) - y)),"
            " cast(0 as double), (acc, v) -> acc + v)"
        )
        probes = top_k_per_key(
            qdf.crossJoin(F.broadcast(cdf)).select(
                "qid", "qe", "qnorm", "cluster", l2.alias("d2")
            ),
            ["qid"],
            [F.asc("d2"), F.asc("cluster")],
            IVF_TR_NPROBE,
        ).select("qid", "qe", "qnorm", "cluster")
        dot = F.expr(_SPARK_DOT.format(a="qe", b="embedding"))
        cand = (
            log.join(F.broadcast(probes), "cluster")
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid",
                "vec_id",
                (dot / F.sqrt(F.col("qnorm") * F.col("nrm"))).alias("cos"),
            )
        )
        return top_k_per_key(
            cand, ["qid"], [F.desc("cos"), F.asc("vec_id")], TOPK_NEIGHBORS
        ).select("qid", "vec_id", F.round("cos", 6).alias("cosine"))

    def recall_micro(
        self, spark: SparkSession, version: int | None = None,
        query_ids: list[int] | None = None,
    ) -> int:
        """Measured recall (micro units) of the versioned probe top-k
        against the exact brute-force cosine top-k over the SAME
        accumulated corpus and the SAME query workload — the number
        the retrain guard pins (with drifted queries: the workload a
        drifted corpus actually serves)."""
        vecs = spark.read.parquet(self.vectors_path).select(
            "vec_id", "embedding"
        )
        norm = F.expr(_SPARK_DOT.format(a="embedding", b="embedding"))
        base = vecs.withColumn("nrm", norm).localCheckpoint(eager=False)
        qpred = (
            F.col("vec_id") < N_QUERY_VECS
            if query_ids is None
            else F.col("vec_id").isin([int(q) for q in query_ids])
        )
        qdf = base.filter(qpred).select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qe"),
            F.col("nrm").alias("qnorm"),
        )
        dot = F.expr(_SPARK_DOT.format(a="qe", b="embedding"))
        exact = top_k_per_key(
            base.crossJoin(F.broadcast(qdf))
            .filter(F.col("vec_id") != F.col("qid"))
            .select(
                "qid",
                "vec_id",
                (dot / F.sqrt(F.col("qnorm") * F.col("nrm"))).alias("cos"),
            ),
            ["qid"],
            [F.desc("cos"), F.asc("vec_id")],
            TOPK_NEIGHBORS,
        ).select("qid", "vec_id")
        got = self.topk_view(spark, version, query_ids).select(
            "qid", "vec_id"
        )
        hit = exact.join(got, ["qid", "vec_id"], "left_semi").count()
        total = exact.count()
        return hit * 1_000_000 // total if total else 0
