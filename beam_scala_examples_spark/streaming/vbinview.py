"""Ingest-time log-bin value sketch: the third streaming member of the
mergeable-sketch family — HLL registers merge with max
(:class:`~.hllview.HllIngestSink`), CMS counters with sum
(:class:`~.cmsview.CmsIngestSink`), and the round-7 quantile bins
(``queries/dq.py::vbin_partial_counts``) also with PLAIN SUM, so the
batch_id-partitioned log of per-batch bin counters IS the sketch and
serving is one sum-aggregate.  Appends never read earlier batches.

Per batch: one map-side-combined aggregate of the batch's rows to at
most ``groups × bins`` slim (group..., sign, vbin, cnt) rows, appended
under the batch's partition with dynamic overwrite — replay
re-derives exactly the batch's own partial, so the served counters are
replay-idempotent by construction.  The served view is pinned EXACTLY
equal to the batch counters over the same corpus, which pins every
derived percentile bound (``vbin_quantile_bounds`` runs unchanged over
the served relation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.dq import VBIN_SCALE, vbin_partial_counts
from .logio import read_log, write_log_partition


class VbinIngestSink:
    """foreachBatch sink maintaining a grouped log-bin counter log over
    micro-batches carrying ``value_col`` (plus any group columns, e.g.
    a caller-derived day)."""

    def __init__(self, log_path: str, value_col: str = "value",
                 group_cols: tuple[str, ...] = (),
                 scale: int = VBIN_SCALE):
        self.log_path = log_path
        self.value_col = value_col
        self.group_cols = tuple(group_cols)
        self.scale = scale
        self._log_schema = None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        partial = vbin_partial_counts(
            batch_df, self.value_col, group_cols=self.group_cols,
            scale=self.scale,
        )
        self._log_schema = write_log_partition(
            partial, batch_id, self.log_path
        )

    def serving_view(self, spark: SparkSession) -> DataFrame:
        """The merged sketch: sum over every batch's partial counters —
        identical to binning the full corpus.  Explicit-schema read:
        an all-NULL stream so far serves the empty relation instead of
        failing schema inference on a file-less log."""
        return (
            read_log(spark, self.log_path, self._log_schema)
            .groupBy(*self.group_cols, "sign", "vbin")
            .agg(F.sum("cnt").alias("cnt"))
        )
