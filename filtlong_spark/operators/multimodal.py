"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode/feature steps are STUBBED (no image/audio libraries in this
container — each stub raises NotImplementedError unless the deterministic
fake is requested), but the Spark-side plumbing is real and tested:
schemas, Arrow batch shapes, mapInPandas signatures, partitioning.

Production swap-in: replace ``_fake_decode_*`` with PIL/librosa/pyav calls
inside the same mapInPandas mappers — the dataflow (binary column in,
fixed-size feature array + metadata struct out, map-only, no shuffle)
does not change.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id long, kind string, media binary, "
                "meta struct<mime:string, width:int, height:int, "
                "duration_ms:int>")

IMAGE_FEATURES = 16


def attach_media_stub(docs: DataFrame) -> DataFrame:
    """Derive a deterministic fake media column from the text (so tests
    exercise real binary columns without external data): media = utf-8
    bytes, meta from simple arithmetic."""
    return docs.select(
        "doc_id",
        F.lit("image").alias("kind"),
        F.encode(F.substring("text", 1, 64), "UTF-8").alias("media"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(0).cast("int").alias("duration_ms"),
        ).alias("meta"))


def _fake_decode_image(data: bytes) -> list[float]:
    """Deterministic stand-in for image decode + feature extraction:
    16 floats derived from the md5 of the bytes. Raises if asked to do a
    real decode."""
    h = hashlib.md5(data or b"").digest()
    return [b / 255.0 for b in h]


def decode_image_features(media: DataFrame, real: bool = False) -> DataFrame:
    """(doc_id, features: array<float>) via mapInPandas over binary media.

    ``real=True`` is the production path (PIL etc.) — not available in
    this container."""
    if real:
        raise NotImplementedError(
            "real image decode requires PIL/torchvision — not in this "
            "container; the deterministic fake exercises the same plumbing")

    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()

    def mapper(batches):
        for pdf in batches:
            feats = [_fake_decode_image(m) for m in pdf["media"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return media.select("doc_id", "media").mapInPandas(
        mapper, schema="doc_id long, features array<double>")


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: emits (doc_id, frame_idx, frame binary) rows.
    Frame extraction itself is faked (slices of the source bytes); the
    one-to-many mapInPandas shape is the real thing."""
    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()

    def mapper(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, m, meta in zip(pdf["doc_id"], pdf["media"],
                                       pdf["meta"]):
                n_frames = max(1, (meta["duration_ms"] or 0) // every_ms) \
                    if isinstance(meta, dict) else 1
                data = m or b""
                for i in range(int(n_frames)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(data[i::max(1, int(n_frames))])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return media.mapInPandas(
        mapper, schema="doc_id long, frame_idx int, frame binary")
