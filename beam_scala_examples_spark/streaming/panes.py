"""Pane-timing emulation (SURVEY §2.7 X6/X7; ``cookbook/TriggerExample.scala:342-361``).

Spark has no ``PaneInfo``; the engine derives Beam-style timing labels
from the semantics of the output mode:

 - **update mode** emissions are speculative refinements while the
   watermark is below the window end — Beam's EARLY panes (Spark evicts
   window state once the watermark passes, so a native update stream
   cannot re-fire a closed window);
 - **append mode** emits each window exactly once, when the watermark
   passes its end — Beam's ON_TIME pane;
 - a re-emission of an already-finalized (window, key) — possible only in
   engine-assisted refinement pipelines (e.g. a foreachBatch MERGE sink) —
   is labeled LATE via the finalized-pane dedup set.

This is precisely the X4 approximation documented in SURVEY §7.4: Beam's
late-firing panes beyond the watermark have no native Spark equivalent.

The per-batch watermark (from ``lastProgress``, one batch behind by
construction) is recorded as pane metadata, mirroring PaneInfo's
processing-time fields.

Scale note: labels are constants per batch/mode, so in a production sink
the timing column is a literal; the only state is the finalized-pane set,
which in a real deployment is the MERGE key of the target table rather
than driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class PaneTagger:
    """foreachBatch sink collecting panes with Beam-style timing labels.

    ``mode`` must match the query's output mode ("update" or "append").
    Attach the running query with ``attach()`` after ``start()`` so the
    per-batch watermark can be recorded as metadata.
    """

    def __init__(self, win_end_col: str, key_cols: tuple[str, ...],
                 mode: str = "update"):
        if mode not in ("update", "append"):
            raise ValueError(f"mode must be update|append, got {mode!r}")
        self.win_end_col = win_end_col
        self.key_cols = key_cols
        self.mode = mode
        self.query = None
        self._finalized: set = set()
        self.panes: list[dict] = []

    def attach(self, query) -> "PaneTagger":
        self.query = query
        return self

    def _watermark(self) -> str | None:
        if self.query is not None and self.query.lastProgress:
            return (self.query.lastProgress.get("eventTime") or {}).get("watermark")
        return None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        wm = self._watermark()
        for row in batch_df.collect():
            d = row.asDict()
            pane_key = (d[self.win_end_col], *(d[k] for k in self.key_cols))
            if self.mode == "update":
                d["timing"] = "EARLY"
            elif pane_key in self._finalized:
                d["timing"] = "LATE"
            else:
                d["timing"] = "ON_TIME"
                self._finalized.add(pane_key)
            d["processing_batch"] = batch_id
            d["watermark"] = wm
            self.panes.append(d)
