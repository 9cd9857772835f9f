"""Baseline JPEG codec — pure stdlib + numpy (no PIL).

Decoder: SOI/APPn/DQT/SOF0/DHT/DRI/SOS marker walk, canonical Huffman
decode of the entropy stream (byte unstuffing, RSTn restart handling),
dequantize + dezigzag, separable float IDCT, chroma upsampling for any
(h, v) factors up to the frame max, JFIF YCbCr -> RGB. Baseline
sequential only (SOF0); progressive (SOF2) and arithmetic coding raise
ValueError — the caller (multimodal.decode_image_features) quarantines
those records to the byte-deterministic fallback.

Encoder (fixture/test support for the decoder): 4:4:4 or 2x1/2x2
subsampled, caller-chosen quant tables (all-ones by default, making the
round-trip exact up to DCT float rounding — tight test assertions), and
self-built fixed-length canonical Huffman tables emitted via DHT (the
decoder reads whatever DHT declares, so no dependence on the Annex K
tables).

Reference scope anchor: the multimodal column work is SURVEY.md §2H
(training-data extras), not a reference operator; see
multimodal.decode_image_features for the Spark-side plumbing.
"""

from __future__ import annotations

import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_matrix():
    import numpy as np
    x, u = np.meshgrid(np.arange(8), np.arange(8))
    M = np.cos((2 * x + 1) * u * np.pi / 16)
    M[0] *= 1 / np.sqrt(2)
    return M * 0.5  # orthonormal-ish: spatial = M.T @ coef @ M


def _build_huffman(bits, huffval):
    """(length, code) -> symbol map from a DHT segment's BITS/HUFFVAL."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError("hit RST inside a block")
            else:
                raise ValueError("unexpected marker in entropy stream")
        else:
            self.pos += 1
        # _fill only runs when nbits == 0, so any previously consumed
        # bits in acc are dead weight — assigning (not accumulating)
        # keeps acc a 1-byte int and the whole decode linear in the
        # entropy-stream length (an accumulating acc turns a multi-MB
        # crawl JPEG into an O(N^2) Python-bigint shift per fill).
        self.acc = b
        self.nbits = 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_rst(self):
        """Byte-align and consume an RSTn marker (restart interval)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # skip fill bytes up to the marker
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected RST marker")


def _decode_huff(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def jpeg_decode_pixels(data: bytes):
    """Baseline JPEG -> uint8 array (height, width, 3) RGB (grayscale
    frames are replicated to 3 channels)."""
    import numpy as np
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    restart_interval = 0
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        m = data[i + 1]
        if m == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", data[i + 2:i + 4])[0]
        seg = data[i + 4:i + 2 + ln]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[j:j + 64], dtype=np.uint8)
                    j += 64
                else:
                    tbl = np.frombuffer(seg[j:j + 128],
                                        dtype=">u2").astype(np.int64)
                    j += 128
                qt[tq] = np.asarray(tbl, dtype=np.int64)
        elif m in (0xC0, 0xC1):  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (h, w, comps)
        elif m == 0xC2:
            raise ValueError("progressive JPEG not supported")
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1:j + 17])
                n = sum(bits)
                vals = list(seg[j + 17:j + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated DHT segment")
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    bits, vals)
                j += 17 + n
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif m == 0xDA:  # SOS — scan follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(data, i + 2 + ln, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        i += 2 + ln
    raise ValueError("no scan data in JPEG")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval):
    import numpy as np
    h, w, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    M = _idct_matrix()
    zz = np.array(ZIGZAG)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8),
                               dtype=np.float64))
    pred = [0] * len(comps)
    br = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count \
                    and mcu_count % restart_interval == 0:
                br.align_to_rst()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan[c["id"]]
                dct = huff_dc[dc_t]
                act = huff_ac[ac_t]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        size = _decode_huff(br, dct)
                        pred[ci] += _extend(br.receive(size), size)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break        # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[k] = _extend(br.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[zz] = coef * q
                        spat = M.T @ block.reshape(8, 8) @ M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = spat
            mcu_count += 1
    # upsample to frame grid, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    Y, Cb, Cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = Y + 1.402 * Cr
    g = Y - 0.344136 * Cb - 0.714136 * Cr
    b = Y + 1.772 * Cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255) \
        .astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (test support)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        for k in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> k) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _fixed_huffman(symbols):
    """Canonical fixed-length code covering ``symbols`` (deterministic
    order): every code has length L = bits needed, codes 0..n-1 — valid
    as long as the all-ones code is unused (guaranteed by using
    n < 2^L). Returns (bits, huffval, {sym: (code, L)})."""
    syms = sorted(set(symbols))
    n = len(syms)
    L = max(1, (n + 1 - 1).bit_length())  # n < 2^L strictly
    if n >= (1 << L):
        L += 1
    bits = [0] * 16
    bits[L - 1] = n
    enc = {s: (i, L) for i, s in enumerate(syms)}
    return bits, syms, enc


def _size_cat(v: int) -> int:
    return abs(v).bit_length()


def jpeg_encode(pixels, quality_tables=None, subsample=(1, 1),
                restart_interval: int = 0) -> bytes:
    """Minimal baseline JPEG writer: RGB (h, w, 3) uint8 in, SOF0 +
    self-built canonical Huffman tables out. ``quality_tables`` =
    (luma_qt, chroma_qt) flat length-64 int arrays in zigzag order
    (default all ones -> near-lossless round-trip); ``subsample`` =
    (h, v) factors for luma (chroma stays 1x1), e.g. (2, 2) for
    4:2:0."""
    import numpy as np
    px = np.asarray(pixels, dtype=np.float64)
    h, w, _ = px.shape
    if quality_tables is None:
        lq = cq = np.ones(64, dtype=np.int64)
    else:
        lq = np.asarray(quality_tables[0], dtype=np.int64)
        cq = np.asarray(quality_tables[1], dtype=np.int64)
    sh, sv = subsample
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    Y = 0.299 * r + 0.587 * g + 0.114 * b
    Cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    Cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    comps = [
        {"id": 1, "h": sh, "v": sv, "tq": 0, "plane": Y, "q": lq},
        {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": Cb, "q": cq},
        {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": Cr, "q": cq},
    ]
    hmax, vmax = sh, sv
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    M = _idct_matrix()
    zz = np.array(ZIGZAG)

    def comp_blocks(c):
        """Yield quantized zigzag blocks in MCU interleave order."""
        p = c["plane"]
        # box-downsample chroma when luma is subsampled
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            ph = -(-p.shape[0] // fy) * fy
            pw = -(-p.shape[1] // fx) * fx
            pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                         mode="edge")
            p = pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        th = mcus_y * c["v"] * 8
        tw = mcus_x * c["h"] * 8
        p = np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                   mode="edge")
        out = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = (M @ blk @ M.T).reshape(-1)[zz]
                        out.append(np.round(coef / c["q"]).astype(np.int64))
        return out

    all_blocks = [comp_blocks(c) for c in comps]

    # entropy-code once symbolically to collect symbols, then build codes
    def runlength(coef):
        """[(dc_diff)], [(run, size, amplitude)...] AC symbols."""
        acs = []
        k = 1
        while k < 64:
            run = 0
            while k < 64 and coef[k] == 0:
                run += 1
                k += 1
            if k >= 64:
                acs.append((0x00, 0))  # EOB
                break
            while run > 15:
                acs.append((0xF0, 0))  # ZRL
                run -= 16
            v = int(coef[k])
            acs.append(((run << 4) | _size_cat(v), v))
            k += 1
        # NB: no EOB when coefficient 63 is nonzero — the decoder's k
        # loop exits at 64 without reading another symbol
        return acs

    # interleaved MCU stream with per-component block cursors
    per_comp_iter = [iter(bl) for bl in all_blocks]
    sequence = []  # (comp_idx, dc_diff, [ac symbols])
    pred = [0, 0, 0]
    n_mcus = mcus_x * mcus_y
    for mi in range(n_mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            sequence.append(("RST", (mi // restart_interval - 1) % 8, None))
            pred = [0, 0, 0]
        for ci, c in enumerate(comps):
            for _ in range(c["h"] * c["v"]):
                coef = next(per_comp_iter[ci])
                diff = int(coef[0]) - pred[ci]
                pred[ci] = int(coef[0])
                sequence.append((ci, diff, runlength(coef)))

    dc_syms = [[] for _ in range(2)]
    ac_syms = [[] for _ in range(2)]
    for item in sequence:
        if item[0] == "RST":
            continue
        ci, diff, acs = item
        t = 0 if ci == 0 else 1
        dc_syms[t].append(_size_cat(diff))
        ac_syms[t].extend(s for s, _ in acs)
    dc_tabs = [_fixed_huffman(s or [0]) for s in dc_syms]
    ac_tabs = [_fixed_huffman(s or [0]) for s in ac_syms]

    bw = _BitWriter()

    def put_amp(v, size):
        if size:
            bw.write(v if v >= 0 else v + (1 << size) - 1, size)

    for item in sequence:
        if item[0] == "RST":
            bw.flush()
            bw.out.extend((0xFF, 0xD0 + item[1]))
            continue
        ci, diff, acs = item
        t = 0 if ci == 0 else 1
        size = _size_cat(diff)
        code, ln = dc_tabs[t][2][size]
        bw.write(code, ln)
        put_amp(diff, size)
        for s, v in acs:
            code, ln = ac_tabs[t][2][s]
            bw.write(code, ln)
            put_amp(v, s & 0x0F)
    bw.flush()

    out = bytearray(b"\xff\xd8")

    def seg(marker, payload):
        out.extend((0xFF, marker))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    seg(0xDB, bytes([0x00]) + bytes(int(x) for x in lq))
    seg(0xDB, bytes([0x01]) + bytes(int(x) for x in cq))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    seg(0xC0, sof)
    for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for th, (bits, vals, _enc) in enumerate(tabs):
            seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([3])
    for ci, c in enumerate(comps):
        t = 0 if ci == 0 else 1
        sos += bytes([c["id"], (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
