"""Ingest-time MODEL-AWARE dataset card: the streaming twin of
``queries/classify.py::data_dataset_card_model``.

Composes three existing sinks plus two slim logs:

 - an embedded :class:`~.cardview.DatasetCardSink` maintains every
   base-card member;
 - an embedded :class:`~.nbview.NbIngestSink` accumulates the NB model
   partials over the TRAIN-split docs of each batch (the split is a
   map-only hash predicate, so batches need no coordination);
 - an embedded :class:`~.dsirview.DsirIngestSink` accumulates the DSIR
   bucket counts + doc registry over ALL docs;
 - eval-split feature instances and truth labels are logged per batch
   (slim (doc_id, f) / (doc_id, label) rows) — serving scores them
   against the log-merged model with the SHARED scorer core
   (:func:`~..queries.classify.nb_scores_from_features`), so document
   TEXT is read exactly once, at arrival.

The model members depend on the FINAL model (trained on every train
doc seen), so they cannot be computed per batch — they are served from
the logs, which is the point: the veto rate and target-likeness rate
are re-servable after every micro-batch under the model-so-far, and
once the stream has delivered the corpus they equal the batch card
exactly (pinned in tests/test_classify.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..queries.classify import (
    _TRAIN_PRED_SPARK,
    nb_feature_instances,
    nb_scores_from_features,
    quality_label,
)
from .cardview import DatasetCardSink
from .dsirview import DsirIngestSink
from .logio import read_log, write_log_partition
from .nbview import NbIngestSink


class ModelCardSink:
    """foreachBatch sink maintaining the model-aware dataset card over
    (doc_id, text, lang, source) micro-batches."""

    def __init__(self, base_path: str):
        self.card = DatasetCardSink(f"{base_path}/card")
        self.nb = NbIngestSink(f"{base_path}/nb")
        self.dsir = DsirIngestSink(f"{base_path}/dsir")
        self.evalfeats_path = f"{base_path}/mc_eval_feats"
        self.evallab_path = f"{base_path}/mc_eval_lab"
        self._ef_schema: T.StructType | None = None
        self._el_schema: T.StructType | None = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.card(batch_df, batch_id)
        train = batch_df.filter(F.expr(_TRAIN_PRED_SPARK))
        eval_docs = batch_df.filter(~F.expr(_TRAIN_PRED_SPARK))
        self.nb(train, batch_id)
        self.dsir(batch_df, batch_id)
        self._ef_schema = write_log_partition(
            nb_feature_instances(eval_docs), batch_id, self.evalfeats_path
        )
        self._el_schema = write_log_partition(
            quality_label(eval_docs), batch_id, self.evallab_path
        )

    def _model_members(self, spark: SparkSession) -> list[DataFrame]:
        counts, cls = self.nb.model(spark)
        ef = read_log(spark, self.evalfeats_path, self._ef_schema).select(
            "doc_id", "f"
        )
        el = read_log(spark, self.evallab_path, self._el_schema).select(
            "doc_id", "label"
        )
        preds = nb_scores_from_features(
            counts, cls, ef, el.select("doc_id")
        )
        nb = preds.join(el, "doc_id").agg(
            F.count("*").alias("n_eval"),
            F.sum(
                (
                    (F.col("label") == "keep")
                    & (F.col("label_pred") == "drop")
                ).cast("long")
            ).alias("n_veto"),
        )
        ds = self.dsir.weights(spark).agg(
            F.count("*").alias("n_w"),
            F.sum((F.col("dsir_logratio") >= 0).cast("long")).alias(
                "n_nonneg"
            ),
        )
        return [
            nb.select(
                F.lit("nb_veto_bp").alias("metric"),
                F.expr("(n_veto * 10000) div n_eval").alias("value"),
            ),
            ds.select(
                F.lit("dsir_target_like_bp").alias("metric"),
                F.expr("(n_nonneg * 10000) div n_w").alias("value"),
            ),
        ]

    def serving_view(self, spark: SparkSession) -> DataFrame:
        """The full model-aware card — base members from the embedded
        card sink, model members scored from the logs; equals the batch
        ``data_dataset_card_model`` once the stream covers the
        corpus."""
        out = self.card.serving_view(spark)
        for m in self._model_members(spark):
            out = out.unionByName(m)
        return out
