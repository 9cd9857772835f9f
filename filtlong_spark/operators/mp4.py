"""MP4/QuickTime container parsing — pure stdlib (no pyav).

Parser: ISO BMFF box walk (moov -> trak -> mdia/minf/stbl) to the
sample tables: stsd (codec fourcc + frame size), stts (per-sample
durations), stsz (sample sizes), stsc (sample->chunk mapping),
stco/co64 (chunk file offsets). For MJPEG tracks (fourcc 'jpeg'/'mjpa'
— Motion JPEG: every sample is a complete JPEG image) the samples
extract directly and decode with operators/jpeg.py. Compressed video
codecs (avc1/hev1/vp09...) are identified but NOT decoded — a codec
decoder is out of scope for a stdlib build and those records
quarantine to the deterministic fallback (multimodal.frame_sample).

Writer (fixture/test support for the parser): a minimal valid
single-video-track MP4 (ftyp + mdat + moov) whose samples are
caller-provided JPEG bytes with per-sample durations — the shape a
real MJPEG-in-MP4 capture has.

Scope anchor: multimodal columns are SURVEY.md §2H (training-data
extras), not a reference operator; the reference
(/root/reference/src/main.cpp) is text-only.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

# fourccs whose samples are standalone JPEG images
MJPEG_CODECS = (b"jpeg", b"mjpa", b"mjpb", b"AVDJ")


class Mp4VideoTrack(NamedTuple):
    codec: str                 # stsd entry fourcc, e.g. 'jpeg', 'avc1'
    width: int
    height: int
    timescale: int             # mdhd ticks per second
    samples: list              # [(file_offset, size, duration_ticks)]


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for boxes in a range."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", data[i:i + 4])[0]
        typ = data[i + 4:i + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if i + 16 > end:
                break
            size = struct.unpack(">Q", data[i + 8:i + 16])[0]
            hdr = 16
        elif size == 0:  # to end of enclosing box
            size = end - i
        if size < hdr or i + size > end:
            break
        yield typ, i + hdr, i + size
        i += size


def _find(data, start, end, *path):
    """Descend a box path; returns (payload_start, payload_end)."""
    for typ in path:
        found = None
        for t, s, e in _boxes(data, start, end):
            if t == typ:
                found = (s, e)
                break
        if found is None:
            return None
        start, end = found
    return start, end


def _full(data, s):
    """FullBox version/flags at payload start; returns (version, s+4)."""
    return data[s], s + 4


def parse_video_track(data: bytes) -> Mp4VideoTrack | None:
    """First 'vide'-handler track's codec + expanded sample table, or
    None when the container has no parseable video track."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        return None
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        return None
    for typ, ts, te in _boxes(data, *moov):
        if typ != b"trak":
            continue
        mdia = _find(data, ts, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        if mdhd is None:
            continue
        ver, p = _full(data, mdhd[0])
        # v0: ctime/mtime u32 x2 then timescale; v1: u64 x2
        timescale = struct.unpack(
            ">I", data[p + (16 if ver else 8):p + (20 if ver else 12)])[0]
        stbl = _find(data, *mdia, b"minf", b"stbl")
        if stbl is None:
            continue
        tabs = {}
        for t, s, e in _boxes(data, *stbl):
            tabs[t] = (s, e)
        if not all(k in tabs for k in
                   (b"stsd", b"stts", b"stsz", b"stsc")):
            continue
        if b"stco" not in tabs and b"co64" not in tabs:
            continue

        # stsd: first sample entry fourcc + VisualSampleEntry dims
        s, e = tabs[b"stsd"]
        _, p = _full(data, s)
        p += 4  # entry_count
        entry_size = struct.unpack(">I", data[p:p + 4])[0]
        fourcc = data[p + 4:p + 8]
        w = h = 0
        if entry_size >= 0x56 and p + 0x24 <= e:
            # VisualSampleEntry: 8 hdr + 6 reserved + 2 dref + 16
            # predefined/reserved = offset 32 to width/height
            w, h = struct.unpack(">HH", data[p + 32:p + 36])

        # every sample occupies >= 1 byte of mdat, so the FILE SIZE
        # bounds any honest sample/entry count — reject counts beyond it
        # before expanding lists (untrusted 32-bit counts in a crafted
        # ~200-byte file could otherwise allocate tens of GB inside the
        # per-record try/except, and the OOM kill is NOT catchable)
        max_n = len(data)

        # stts: [(count, delta)] -> flat per-sample durations
        s, e = tabs[b"stts"]
        _, p = _full(data, s)
        n = struct.unpack(">I", data[p:p + 4])[0]
        p += 4
        if n > max_n:
            raise ValueError("stts entry count exceeds file size")
        durations = []
        for _i in range(n):
            cnt, delta = struct.unpack(">II", data[p:p + 8])
            p += 8
            if cnt > max_n or len(durations) + cnt > max_n:
                raise ValueError("stts sample count exceeds file size")
            durations.extend([delta] * cnt)

        # stsz: per-sample sizes (or one constant size)
        s, e = tabs[b"stsz"]
        _, p = _full(data, s)
        const_size, n_samples = struct.unpack(">II", data[p:p + 8])
        p += 8
        if n_samples > max_n:
            raise ValueError("stsz sample count exceeds file size")
        if const_size:
            sizes = [const_size] * n_samples
        else:
            sizes = list(struct.unpack(
                ">%dI" % n_samples, data[p:p + 4 * n_samples]))

        # stsc: sample-to-chunk runs
        s, e = tabs[b"stsc"]
        _, p = _full(data, s)
        n = struct.unpack(">I", data[p:p + 4])[0]
        p += 4
        stsc = []
        for _i in range(n):
            first, per, _desc = struct.unpack(">III", data[p:p + 12])
            p += 12
            stsc.append((first, per))

        # stco/co64: chunk offsets
        if b"stco" in tabs:
            s, e = tabs[b"stco"]
            _, p = _full(data, s)
            n = struct.unpack(">I", data[p:p + 4])[0]
            p += 4
            chunk_offs = list(struct.unpack(">%dI" % n, data[p:p + 4 * n]))
        else:
            s, e = tabs[b"co64"]
            _, p = _full(data, s)
            n = struct.unpack(">I", data[p:p + 4])[0]
            p += 4
            chunk_offs = list(struct.unpack(">%dQ" % n, data[p:p + 8 * n]))

        # expand: walk chunks, assigning per-chunk sample counts from
        # the stsc runs, accumulating intra-chunk offsets from sizes
        samples = []
        si = 0
        for ci, coff in enumerate(chunk_offs):
            per = 0
            for first, cnt in stsc:
                if ci + 1 >= first:
                    per = cnt
            off = coff
            for _j in range(per):
                if si >= len(sizes):
                    break
                dur = durations[si] if si < len(durations) else 0
                samples.append((off, sizes[si], dur))
                off += sizes[si]
                si += 1
        return Mp4VideoTrack(fourcc.decode("latin-1"), w, h,
                             timescale or 1, samples)
    return None


def mjpeg_frames(data: bytes):
    """[(jpeg_bytes, duration_ms)] for an MJPEG video track; raises
    ValueError for absent/compressed-codec tracks (the caller
    quarantines those to its deterministic fallback)."""
    trk = parse_video_track(data)
    if trk is None:
        raise ValueError("no parseable MP4 video track")
    if trk.codec.encode("latin-1") not in MJPEG_CODECS:
        raise ValueError("compressed video codec %r not supported"
                         % trk.codec)
    out = []
    for off, size, dur in trk.samples:
        sample = data[off:off + size]
        if sample[:2] != b"\xff\xd8":
            raise ValueError("MJPEG sample is not a JPEG")
        out.append((sample, int(dur * 1000 / trk.timescale)))
    return out


# ---------------------------------------------------------------------------
# Writer (fixture/test support)
# ---------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def _fullbox(typ: bytes, payload: bytes, version: int = 0,
             flags: int = 0) -> bytes:
    return _box(typ, struct.pack(">I", (version << 24) | flags) + payload)


def mp4_encode_mjpeg(jpeg_samples, durations_ms, width: int, height: int,
                     timescale: int = 1000) -> bytes:
    """Minimal valid single-track MJPEG MP4: ftyp + mdat + moov. Sample
    data is the caller's JPEG bytes verbatim (one chunk); durations in
    milliseconds map 1:1 to mdhd ticks at the default timescale."""
    assert len(jpeg_samples) == len(durations_ms) and jpeg_samples
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                + b"isommp41")
    mdat_payload = b"".join(jpeg_samples)
    # sample data begins after ftyp + the mdat header (8 bytes)
    data_start = len(ftyp) + 8
    mdat = _box(b"mdat", mdat_payload)

    total_ticks = sum(durations_ms) * timescale // 1000
    mvhd = _fullbox(b"mvhd", struct.pack(
        ">IIII", 0, 0, timescale, total_ticks)
        + struct.pack(">I", 0x00010000)    # rate 1.0
        + struct.pack(">H", 0x0100)        # volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)          # identity matrix
        + b"\x00" * 24
        + struct.pack(">I", 2))            # next track id

    tkhd = _fullbox(b"tkhd", struct.pack(
        ">IIIII", 0, 0, 1, 0, total_ticks)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", width << 16, height << 16), flags=7)

    mdhd = _fullbox(b"mdhd", struct.pack(
        ">IIII", 0, 0, timescale, total_ticks)
        + struct.pack(">HH", 0x55C4, 0))   # language 'und'
    hdlr = _fullbox(b"hdlr", struct.pack(">I", 0) + b"vide"
                    + b"\x00" * 12 + b"MJPEG\x00")
    vmhd = _fullbox(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
    dref = _fullbox(b"dref", struct.pack(">I", 1)
                    + _fullbox(b"url ", b"", flags=1))
    dinf = _box(b"dinf", dref)

    # VisualSampleEntry 'jpeg'
    entry = (b"\x00" * 6 + struct.pack(">H", 1)      # data_ref_index
             + b"\x00" * 16
             + struct.pack(">HH", width, height)
             + struct.pack(">II", 0x00480000, 0x00480000)
             + struct.pack(">I", 0)
             + struct.pack(">H", 1)                   # frame count
             + b"\x05MJPEG" + b"\x00" * 26            # compressorname
             + struct.pack(">Hh", 24, -1))            # depth, pre_defined
    stsd = _fullbox(b"stsd", struct.pack(">I", 1)
                    + _box(b"jpeg", entry))

    # stts: run-length encode consecutive equal durations
    runs = []
    for d in durations_ms:
        ticks = d * timescale // 1000
        if runs and runs[-1][1] == ticks:
            runs[-1][0] += 1
        else:
            runs.append([1, ticks])
    stts = _fullbox(b"stts", struct.pack(">I", len(runs))
                    + b"".join(struct.pack(">II", c, t)
                               for c, t in runs))
    stsc = _fullbox(b"stsc", struct.pack(">I", 1)
                    + struct.pack(">III", 1, len(jpeg_samples), 1))
    stsz = _fullbox(b"stsz", struct.pack(">II", 0, len(jpeg_samples))
                    + b"".join(struct.pack(">I", len(s))
                               for s in jpeg_samples))
    stco = _fullbox(b"stco", struct.pack(">I", 1)
                    + struct.pack(">I", data_start))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
