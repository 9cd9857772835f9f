"""Matroska/WebM container parsing — pure stdlib (no pyav).

Parser: EBML element walk (RFC 8794 varints) through Segment ->
Tracks/Info/Clusters to the video track's CodecID + PixelWidth/Height
and the per-frame SimpleBlocks. For MJPEG tracks (CodecID 'V_MJPEG' —
every block is a complete JPEG image) the frames extract directly and
decode with operators/jpeg.py; per-frame durations come from
successive block timestamps (TimestampScale-scaled), the last frame
from DefaultDuration. Compressed codecs (V_VP8/V_VP9/V_AV1/
V_MPEG4/...) are identified but NOT decoded — a codec decoder is out
of scope for a stdlib build and those records quarantine to the
deterministic fallback (multimodal.frame_sample). DocType 'webm' vs
'matroska' distinguishes the reported mime.

Writer (fixture/test support for the parser): a minimal valid
single-video-track MJPEG Matroska (EBML header + Segment with Info,
Tracks, one Cluster of SimpleBlocks) whose frames are caller-provided
JPEG bytes with per-frame durations.

Scope anchor: multimodal columns are SURVEY.md §2H (training-data
extras), not a reference operator; the reference
(/root/reference/src/main.cpp) is text-only.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

EBML_MAGIC = b"\x1a\x45\xdf\xa3"

# element IDs (stored form, marker bit kept — RFC 8794 §5)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_DEFAULT_DURATION = 0x23E383        # ns per frame
_VIDEO = 0xE0
_PIXEL_WIDTH = 0xB0
_PIXEL_HEIGHT = 0xBA
_CLUSTER = 0x1F43B675
_CLUSTER_TS = 0xE7
_SIMPLE_BLOCK = 0xA3

MJPEG_CODEC = "V_MJPEG"


class MkvVideoTrack(NamedTuple):
    codec: str                 # CodecID, e.g. 'V_MJPEG', 'V_VP9'
    width: int
    height: int
    track_num: int
    timestamp_scale: int       # ns per timestamp unit (default 1e6)
    default_duration: int      # ns per frame, 0 when absent
    doc_type: str              # 'webm' or 'matroska'


def _read_vint(data: bytes, i: int, keep_marker: bool) -> tuple[int, int]:
    """(value, next_index). Element IDs keep the marker bit (their
    stored form IS the id); sizes strip it."""
    if i >= len(data):
        raise ValueError("EBML truncated")
    b0 = data[i]
    if b0 == 0:
        raise ValueError("invalid EBML varint")
    length = 1
    mask = 0x80
    while not (b0 & mask):
        length += 1
        mask >>= 1
    if i + length > len(data):
        raise ValueError("EBML truncated")
    v = b0 if keep_marker else (b0 & (mask - 1))
    for k in range(1, length):
        v = (v << 8) | data[i + k]
    return v, i + length


def _elements(data: bytes, start: int, end: int):
    """Yield (id, payload_start, payload_end) for a container's
    children. Unknown-size elements (all-ones size — legal for Segment
    in streamed files) extend to the container's end."""
    i = start
    while i < end:
        eid, j = _read_vint(data, i, keep_marker=True)
        size, k = _read_vint(data, j, keep_marker=False)
        # all-ones size payload == unknown: 2^(7*len)-1 after stripping
        nbytes = k - j
        if size == (1 << (7 * nbytes)) - 1:
            pe = end
        else:
            pe = k + size
        if pe > end:
            raise ValueError("EBML element overruns container")
        yield eid, k, pe
        i = pe


def _uint(data: bytes, s: int, e: int) -> int:
    v = 0
    for b in data[s:e]:
        v = (v << 8) | b
    return v


def _find(data, start, end, eid):
    for i, s, e in _elements(data, start, end):
        if i == eid:
            return s, e
    return None


def ebml_doc_type(data: bytes) -> str:
    """DocType from the EBML header alone ('webm'/'matroska'), usable
    even when the Segment has no parseable video track (audio-only
    WebM is common in a crawl). Falls back to 'matroska'."""
    try:
        head = _find(data, 0, len(data), _EBML)
        if head:
            dt = _find(data, head[0], head[1], _DOCTYPE)
            if dt:
                return data[dt[0]:dt[1]].split(b"\x00")[0] \
                    .decode("ascii", "replace")
    except ValueError:
        pass
    return "matroska"


def parse_video_track(data: bytes) -> MkvVideoTrack | None:
    """First video TrackEntry of the first Segment, or None when the
    EBML/Segment/Tracks walk fails structurally."""
    if data[:4] != EBML_MAGIC:
        return None
    try:
        doc_type = ebml_doc_type(data)
        seg = _find(data, 0, len(data), _SEGMENT)
        if seg is None:
            return None
        ts_scale = 1_000_000
        info = _find(data, seg[0], seg[1], _INFO)
        if info:
            tsel = _find(data, info[0], info[1], _TIMESTAMP_SCALE)
            if tsel:
                ts_scale = _uint(data, *tsel) or 1_000_000
        tracks = _find(data, seg[0], seg[1], _TRACKS)
        if tracks is None:
            return None
        for eid, s, e in _elements(data, tracks[0], tracks[1]):
            if eid != _TRACK_ENTRY:
                continue
            ttype = _find(data, s, e, _TRACK_TYPE)
            if not ttype or _uint(data, *ttype) != 1:  # 1 = video
                continue
            num_el = _find(data, s, e, _TRACK_NUMBER)
            codec_el = _find(data, s, e, _CODEC_ID)
            vid = _find(data, s, e, _VIDEO)
            w = h = 0
            if vid:
                wel = _find(data, vid[0], vid[1], _PIXEL_WIDTH)
                hel = _find(data, vid[0], vid[1], _PIXEL_HEIGHT)
                w = _uint(data, *wel) if wel else 0
                h = _uint(data, *hel) if hel else 0
            dd = _find(data, s, e, _DEFAULT_DURATION)
            return MkvVideoTrack(
                codec=(data[codec_el[0]:codec_el[1]].split(b"\x00")[0]
                       .decode("ascii", "replace") if codec_el else ""),
                width=w, height=h,
                track_num=_uint(data, *num_el) if num_el else 1,
                timestamp_scale=ts_scale,
                default_duration=_uint(data, *dd) if dd else 0,
                doc_type=doc_type)
        return None
    except ValueError:
        return None


def mjpeg_frames(data: bytes):
    """[(jpeg_bytes, duration_ms)] for a V_MJPEG track; raises
    ValueError for absent/compressed-codec tracks (the caller
    quarantines those to its deterministic fallback)."""
    trk = parse_video_track(data)
    if trk is None:
        raise ValueError("no parseable Matroska video track")
    if trk.codec != MJPEG_CODEC:
        raise ValueError("compressed video codec %r not supported"
                         % trk.codec)
    seg = _find(data, 0, len(data), _SEGMENT)
    frames: list[bytes] = []
    ts_ms: list[int] = []
    for eid, cs, ce in _elements(data, seg[0], seg[1]):
        if eid != _CLUSTER:
            continue
        cts = 0
        tel = _find(data, cs, ce, _CLUSTER_TS)
        if tel:
            cts = _uint(data, *tel)
        for bid, bs, be in _elements(data, cs, ce):
            if bid != _SIMPLE_BLOCK:
                continue
            tnum, j = _read_vint(data, bs, keep_marker=False)
            if tnum != trk.track_num:
                continue
            if be - j < 3:
                raise ValueError("SimpleBlock truncated")
            rel = struct.unpack(">h", data[j:j + 2])[0]
            flags = data[j + 2]
            if flags & 0x06:
                raise ValueError("laced MJPEG blocks not supported")
            frame = data[j + 3:be]
            if frame[:2] != b"\xff\xd8":
                raise ValueError("MJPEG block is not a JPEG")
            frames.append(frame)
            ts_ms.append((cts + rel) * trk.timestamp_scale // 1_000_000)
    if not frames:
        raise ValueError("no MJPEG blocks found")
    out = []
    default_ms = trk.default_duration // 1_000_000
    for i, f in enumerate(frames):
        if i + 1 < len(frames):
            d = ts_ms[i + 1] - ts_ms[i]
        else:
            d = default_ms or (ts_ms[-1] - ts_ms[-2]
                               if len(ts_ms) > 1 else 0)
        out.append((f, int(d)))
    return out


# ---------------------------------------------------------------------------
# Writer (fixture/test support)
# ---------------------------------------------------------------------------


def _enc_vint(n: int) -> bytes:
    """Minimal-length EBML varint for a size (marker added here)."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            v = n | (1 << (7 * length))
            return v.to_bytes(length, "big")
    raise ValueError("varint too large")


def _el(eid: int, payload: bytes) -> bytes:
    nid = (eid.bit_length() + 7) // 8
    return eid.to_bytes(nid, "big") + _enc_vint(len(payload)) + payload


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def mkv_encode_mjpeg(jpeg_frames_in, durations_ms, width: int,
                     height: int) -> bytes:
    """Minimal valid single-track MJPEG Matroska: EBML header + Segment
    (Info, Tracks, one Cluster of SimpleBlocks at cumulative-duration
    timestamps; DefaultDuration carries the last frame's duration).
    TimestampScale stays the 1 ms default so block times are ms."""
    assert len(jpeg_frames_in) == len(durations_ms) and jpeg_frames_in
    header = _el(_EBML, b"".join([
        _el_uint(0x4286, 1),              # EBMLVersion
        _el_uint(0x42F7, 1),              # EBMLReadVersion
        _el_uint(0x42F2, 4),              # EBMLMaxIDLength
        _el_uint(0x42F3, 8),              # EBMLMaxSizeLength
        _el(_DOCTYPE, b"matroska"),
        _el_uint(0x4287, 4),              # DocTypeVersion
        _el_uint(0x4285, 2),              # DocTypeReadVersion
    ]))
    info = _el(_INFO, b"".join([
        _el_uint(_TIMESTAMP_SCALE, 1_000_000),
        _el(0x4D80, b"filtlong_spark"),   # MuxingApp
        _el(0x5741, b"filtlong_spark"),   # WritingApp
    ]))
    track = _el(_TRACKS, _el(_TRACK_ENTRY, b"".join([
        _el_uint(_TRACK_NUMBER, 1),
        _el_uint(0x73C5, 1),              # TrackUID
        _el_uint(_TRACK_TYPE, 1),         # video
        _el(_CODEC_ID, b"V_MJPEG"),
        _el_uint(_DEFAULT_DURATION, durations_ms[-1] * 1_000_000),
        _el(_VIDEO, _el_uint(_PIXEL_WIDTH, width)
            + _el_uint(_PIXEL_HEIGHT, height)),
    ])))
    # block timestamps are SIGNED 16-BIT offsets from their cluster's
    # timestamp — roll into a new cluster before the offset overflows
    # (exactly what real muxers do), so long fixtures encode too
    clusters = []
    blocks: list[bytes] = []
    cluster_t = 0
    t = 0
    for f, d in zip(jpeg_frames_in, durations_ms):
        if not blocks:
            cluster_t = t
        rel = t - cluster_t
        if rel > 32767:
            clusters.append(_el(_CLUSTER, b"".join(
                [_el_uint(_CLUSTER_TS, cluster_t)] + blocks)))
            blocks = []
            cluster_t = t
            rel = 0
        blocks.append(_el(_SIMPLE_BLOCK,
                          _enc_vint(1)               # track number
                          + struct.pack(">h", rel)    # relative ts (ms)
                          + b"\x80"                   # keyframe, no lacing
                          + f))
        t += d
    if blocks:
        clusters.append(_el(_CLUSTER, b"".join(
            [_el_uint(_CLUSTER_TS, cluster_t)] + blocks)))
    return header + _el(_SEGMENT, info + track + b"".join(clusters))
