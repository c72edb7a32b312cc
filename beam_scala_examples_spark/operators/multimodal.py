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


N_FRAMES = 4
THUMB_MAX = 64
FRAME_SCHEMA = (
    "doc_id long, frame_idx long, frame_len long, frame_sig long,"
    " thumb_w long, thumb_h long"
)


def _thumb(w: int, h: int) -> tuple[int, int]:
    """Aspect-preserving fit into THUMB_MAX x THUMB_MAX, integer math only
    (stands in for a real resample; +1 guards the zero-size fakes)."""
    w, h = w + 1, h + 1
    if w >= h:
        return THUMB_MAX, max(1, h * THUMB_MAX // w)
    return max(1, w * THUMB_MAX // h), THUMB_MAX


def sample_frames(with_payload: DataFrame, n_frames: int = N_FRAMES) -> DataFrame:
    """Frame sampling + per-frame feature extraction + thumbnail-resize
    arithmetic, Arrow-batched: each payload yields up to ``n_frames``
    equal-length slices ("frames"), each with a content signature and the
    thumbnail dims a real resize would produce. One input row fans out to
    many output rows — the UDTF shape of a video pipeline — with no
    shuffle (``mapInPandas`` is a narrow transformation; at 100 TB the
    fan-out multiplies rows inside each task, never across the exchange).
    A real implementation swaps the slice/signature for ffmpeg frame
    extraction + an image hash; the plan is unchanged.
    """
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "frame_idx", "frame_len", "frame_sig",
                     "thumb_w", "thumb_h")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                text = raw.decode("utf-8")
                meta = _fake_decode(raw)
                tw, th = _thumb(meta["fake_width"], meta["fake_height"])
                flen = len(text) // n_frames
                if flen == 0:
                    continue
                for i in range(n_frames):
                    frame = text[i * flen:(i + 1) * flen]
                    sig = int(
                        hashlib.md5(frame.encode("utf-8")).hexdigest()[:8], 16
                    )
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_len"].append(flen)
                    rows["frame_sig"].append(sig)
                    rows["thumb_w"].append(tw)
                    rows["thumb_h"].append(th)
            yield pd.DataFrame(rows)

    return with_payload.mapInPandas(gen, schema=FRAME_SCHEMA)
