"""Structured Streaming scorer + multimodal plumbing."""

import pytest

from filtlong_spark import fixtures as fx
from filtlong_spark.config import FilterConfig
from filtlong_spark.operators import multimodal as mm
from filtlong_spark.operators import refset as refset_op
from filtlong_spark.operators import score as score_op


def _cfg(**kw):
    kw.setdefault("mode", "intrinsic")
    kw.setdefault("vocab", fx.VOCAB)
    return FilterConfig(**kw)


def test_stream_matches_batch(spark, tmp_path):
    """availableNow streaming scoring == batch scoring on the same input."""
    from filtlong_spark.streaming.stream import run_available_now

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    rows = fx.volume(sf=0.0001)
    fx.to_spark_df(spark, rows).write.parquet(src)

    cfg = _cfg(min_length=100, min_mean_q=50.0, split=40)
    run_available_now(spark, src, cfg, sink, ckpt)
    streamed = {(r["url"], r["n_chars"], r["mean_q"], r["window_q"],
                 r["hard_passed"])
                for r in spark.read.parquet(sink).collect()}

    bc = refset_op.build_broadcast(spark, cfg, None)
    batch = {(r["url"], r["n_chars"], r["mean_q"], r["window_q"],
              r["hard_passed"])
             for r in score_op.score_and_scrub(
                 spark.read.parquet(src), cfg, bc).collect()}
    assert streamed == batch
    assert len(streamed) > 0


def test_media_schema_and_decode(spark, sf_dir="/root/testdata/sf0.001"):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    media = mm.attach_media_stub(docs)
    assert media.schema.simpleString() == (
        "struct<doc_id:bigint,kind:string,media:binary,"
        "meta:struct<mime:string,width:int,height:int,duration_ms:int>>")
    feats = mm.decode_image_features(media).collect()
    assert len(feats) == 50
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic: same input -> same features
    again = mm.decode_image_features(media).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_real_decode_is_stubbed(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(1)
    with pytest.raises(NotImplementedError):
        mm.decode_image_features(mm.attach_media_stub(docs), real=True)


def test_frame_sampling_shape(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(10)
    media = mm.attach_media_stub(docs)
    frames = mm.frame_sample_stub(media).collect()
    assert len(frames) >= 10
    assert {f["frame_idx"] for f in frames} == {0}  # duration 0 -> 1 frame


def test_sniff_real_container_headers(spark):
    """mime + dimensions parsed from REAL container bytes (PNG IHDR, GIF
    screen descriptor, JPEG SOF marker walk)."""
    import struct
    png = mm.make_png_bytes(640, 480)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    # APP0 length 16 = 2 length bytes + 14 payload bytes, then SOF0
    jpeg = (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", 1080, 1920) + b"\x03" + b"\x00" * 9)
    rows = [(1, "image", png), (2, "image", gif), (3, "image", jpeg),
            (4, "image", b"not an image")]
    media = spark.createDataFrame(rows, "doc_id long, kind string, media binary")
    got = {r["doc_id"]: (r["mime"], r["width"], r["height"])
           for r in mm.sniff_media_meta(media).collect()}
    assert got[1] == ("image/png", 640, 480)
    assert got[2] == ("image/gif", 320, 200)
    assert got[3] == ("image/jpeg", 1920, 1080)
    assert got[4] == (None, None, None)


def test_media_near_dups_pipeline(spark):
    """binary media -> features -> the SAME bucketed near-dup join as text
    embeddings: identical media must pair at cos == 1.0."""
    blob_a = mm.make_png_bytes(100, 100)
    blob_b = mm.make_png_bytes(200, 50)
    rows = [(1, "image", blob_a), (2, "image", blob_a),  # exact dup
            (3, "image", blob_b)]
    media = spark.createDataFrame(rows, "doc_id long, kind string, media binary")
    pairs = {(r["probe_id"], r["vec_id"]): r["cos"]
             for r in mm.media_near_dups(media).collect()}
    assert pairs.get((1, 2)) == 1.0
    assert (1, 3) not in pairs and (2, 3) not in pairs
