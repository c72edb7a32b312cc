"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The decode step itself (image/audio/video libraries) is STUBBED with a
deterministic fake — the libraries are not in this container — but the
Spark-side machinery is real and tested: binary column schema, Arrow
batch transfer, ``mapInPandas`` signature, and partition-preserving
metadata extraction. Swap ``_fake_decode`` for a real decoder (PIL /
ffmpeg / soundfile) without touching the plan.

Scale notes: ``mapInPandas`` is a narrow transformation — no shuffle; the
Arrow batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``)
bounds per-batch memory for large payloads, and binary columns ride
parquet's byte-array encoding with full column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, kind string, fake_width long, fake_height long"
)

_KINDS = ("image", "audio", "video")


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real media decoder.

    A real implementation would be, e.g.::

        from PIL import Image           # not available in this container
        img = Image.open(io.BytesIO(payload))
        return {"width": img.width, "height": img.height, ...}
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "kind": _KINDS[n % 3],
        "fake_width": n % 640,
        "fake_height": n % 480,
    }


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary): the opaque-media shape.
    Fixtures carry text; real pipelines read parquet binary columns."""
    return docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def decode_metadata(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(meta)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out[["doc_id", "n_bytes", "kind", "fake_width", "fake_height"]]

    return with_payload.mapInPandas(decode, schema=DECODED_SCHEMA)
