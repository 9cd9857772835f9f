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


# ---------------------------------------------------------------------------
# REAL header sniffing: mime + pixel dimensions parsed from the actual
# container bytes (PNG IHDR / GIF logical screen / JPEG SOF markers) — no
# media library needed; only pixel DECODE is stubbed.
# ---------------------------------------------------------------------------

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def make_png_bytes(width: int, height: int) -> bytes:
    """Minimal structurally-valid PNG header (magic + IHDR chunk) — used
    by tests/fixtures to exercise the sniffing on real container bytes."""
    import struct
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    return PNG_MAGIC + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr


def sniff_bytes(data: bytes) -> tuple[str | None, int | None, int | None]:
    """(mime, width, height) parsed from container headers:
    - PNG: IHDR width/height, big-endian u32 at offsets 16/20
    - GIF87a/89a: logical screen size, little-endian u16 at 6/8
    - JPEG: walk the marker stream to the first SOF0-SOF15 frame header
    Unknown containers -> (None, None, None)."""
    import struct
    if not data:
        return None, None, None
    if data[:8] == PNG_MAGIC and len(data) >= 24 and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return "image/png", w, h
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return "image/gif", w, h
    if data[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 9 < len(data):
            if data[i] != 0xFF:
                break
            marker = data[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                return "image/jpeg", w, h
            seg_len = struct.unpack(">H", data[i + 2:i + 4])[0]
            i += 2 + seg_len
        return "image/jpeg", None, None
    return None, None, None


def sniff_media_meta(media: DataFrame) -> DataFrame:
    """(doc_id, mime, width, height) from the binary column via one
    map-only Arrow pass — REAL header parsing, not a fake."""
    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()

    def mapper(batches):
        for pdf in batches:
            mimes, ws, hs = [], [], []
            for m in pdf["media"]:
                mime, w, h = sniff_bytes(bytes(m) if m is not None else b"")
                mimes.append(mime)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "mime": mimes,
                                "width": ws, "height": hs})

    return media.select("doc_id", "media").mapInPandas(
        mapper, schema="doc_id long, mime string, width int, height int")


def media_near_dups(media: DataFrame, threshold: float = 0.99) -> DataFrame:
    """End-to-end media dedup: binary -> feature vector (decode step; the
    fake is byte-deterministic, so identical media always pair at cos 1)
    -> the SAME sign-LSH bucket self-join as text embeddings
    (similarity.near_dup_pairs). Swap the decoder for a real CNN/CLIP
    embedding and nothing downstream changes."""
    from .similarity import near_dup_pairs
    feats = decode_image_features(media).select(
        F.col("doc_id").alias("vec_id"),
        F.col("features").alias("embedding"))
    return near_dup_pairs(feats, threshold=threshold)


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
