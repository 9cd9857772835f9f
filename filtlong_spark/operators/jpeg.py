"""Baseline + progressive JPEG codec — pure stdlib + numpy (no PIL).

Decoder: SOI/APPn/DQT/SOF0/SOF2/DHT/DRI/SOS marker walk, canonical
Huffman decode of the entropy stream (byte unstuffing, RSTn restart
handling), dequantize + dezigzag, separable float IDCT, chroma
upsampling for any (h, v) factors up to the frame max, JFIF YCbCr ->
RGB. Progressive (SOF2) accumulates coefficients across scans —
spectral selection (Ss..Se bands) and successive approximation
(Ah/Al first + refinement passes, EOB-run decoding for both) — then
reconstructs once; this is the most common real-crawl JPEG variant.
Arithmetic coding (SOF9/SOF10) raises ValueError — the caller
(multimodal.decode_image_features) quarantines those records to the
byte-deterministic fallback.

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
    """Baseline or progressive JPEG -> uint8 array (height, width, 3)
    RGB (grayscale frames are replicated to 3 channels)."""
    import numpy as np
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt = {}
    huff_dc = {}
    huff_ac = {}
    frame = None
    progressive = False
    prog = None            # _ProgState once the first SOF2 scan arrives
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
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            # decompression-bomb guard: dims are untrusted header bytes
            # and the coefficient/pixel grids allocate from them BEFORE
            # any entropy data validates. A few-hundred-byte file
            # declaring 65535x65535 would commit ~17 GB per component —
            # and the resulting OOM kill is not catchable by the
            # per-record quarantine. 64 MPixel ceiling (~8k x 8k).
            if h * w > 64_000_000:
                raise ValueError(
                    "JPEG dimensions %dx%d exceed the 64 MPixel decode "
                    "ceiling" % (w, h))
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = (h, w, comps)
            progressive = m == 0xC2
        elif m in (0xC9, 0xCA, 0xCB):
            raise ValueError("arithmetic-coded JPEG not supported")
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
            if not progressive:
                scan = {}
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    scan[cs] = (tt >> 4, tt & 0x0F)
                return _decode_scan(data, i + 2 + ln, frame, scan, qt,
                                    huff_dc, huff_ac, restart_interval)
            # progressive: scan order matters and the spectral band /
            # successive-approximation fields drive the decode
            scomps = [(seg[1 + 2 * c], seg[2 + 2 * c] >> 4,
                       seg[2 + 2 * c] & 0x0F) for c in range(ns)]
            ss, se, a = seg[1 + 2 * ns:4 + 2 * ns]
            if prog is None:
                prog = _ProgState(frame)
            i = _decode_scan_progressive(
                data, i + 2 + ln, prog, scomps, ss, se, a >> 4, a & 0x0F,
                huff_dc, huff_ac, restart_interval)
            continue
        i += 2 + ln
    if progressive and prog is not None and prog.any_scan:
        return _reconstruct_progressive(prog, qt)
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
    return _planes_to_rgb(planes, frame, hmax, vmax)


def _planes_to_rgb(planes, frame, hmax, vmax):
    """Upsample component planes to the frame grid, crop, and JFIF
    YCbCr -> RGB (grayscale replicated to 3 channels)."""
    import numpy as np
    h, w, comps = frame
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
# Progressive (SOF2) decode — T.81 Annex G.2
# ---------------------------------------------------------------------------


class _ProgState:
    """Coefficient accumulator across progressive scans: one int32
    (blocks_y, blocks_x, 64) array per component (zigzag order),
    MCU-padded so interleaved DC scans can write their dummy edge
    blocks; non-interleaved scans touch only the real
    ``nblocks`` sub-grid (T.81 A.2.2/A.2.3)."""

    def __init__(self, frame):
        import numpy as np
        h, w, comps = frame
        self.frame = frame
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        self.mcus_x = -(-w // (8 * self.hmax))
        self.mcus_y = -(-h // (8 * self.vmax))
        self.coefs = []
        self.nblocks = []
        for c in comps:
            self.coefs.append(np.zeros(
                (self.mcus_y * c["v"], self.mcus_x * c["h"], 64),
                dtype=np.int32))
            cw = -(-w * c["h"] // self.hmax)
            ch = -(-h * c["v"] // self.vmax)
            self.nblocks.append((-(-ch // 8), -(-cw // 8)))
        self.any_scan = False


def _decode_scan_progressive(data, pos, prog, scomps, ss, se, ah, al,
                             huff_dc, huff_ac, restart_interval):
    """Decode ONE progressive scan into prog.coefs; returns the stream
    position of the marker after the entropy data. Scan kinds: DC first
    (Ss=0, Ah=0), DC refinement (Ss=0, Ah>0), AC first (Ss>0, Ah=0),
    AC refinement (Ss>0, Ah>0); AC scans are single-component by
    spec."""
    if ss == 0 and se != 0:
        raise ValueError("bad progressive scan script (DC scan, Se>0)")
    if ss > 0 and len(scomps) != 1:
        raise ValueError(
            "bad progressive scan script (interleaved AC scan)")
    if se > 63 or ss > se:
        raise ValueError("bad progressive scan header")
    prog.any_scan = True
    br = _BitReader(data, pos)
    if ss == 0:
        _dc_scan(br, prog, scomps, ah, al, huff_dc, restart_interval)
    else:
        _ac_scan(br, prog, scomps[0], ss, se, ah, al, huff_ac,
                 restart_interval)
    # advance past any fill bits to the next marker (stuffed 0xFF00 and
    # stray RSTs inside what we already consumed were handled by the
    # reader; anything else 0xFFxx here is the next segment)
    j = br.pos
    d = data
    while j + 1 < len(d):
        if d[j] == 0xFF and d[j + 1] != 0x00 \
                and not (0xD0 <= d[j + 1] <= 0xD7):
            return j
        j += 1
    return len(d)


def _dc_block(br, block, preds, cs, tab, ah, al):
    if ah == 0:
        s = _decode_huff(br, tab)
        preds[cs] += _extend(br.receive(s), s)
        block[0] = preds[cs] << al
    elif br.read_bit():
        block[0] |= 1 << al


def _dc_scan(br, prog, scomps, ah, al, huff_dc, restart_interval):
    h, w, comps = prog.frame
    idx_of = {c["id"]: k for k, c in enumerate(comps)}
    preds = {cs: 0 for cs, _, _ in scomps}
    tabs = {}
    for cs, td, _ in scomps:
        if ah == 0:
            tabs[cs] = huff_dc.get(td)
            if tabs[cs] is None:
                raise ValueError("missing DC huffman table")
        else:
            tabs[cs] = None

    def restart():
        br.align_to_rst()
        for k in preds:
            preds[k] = 0

    units = 0
    if len(scomps) == 1:
        # non-interleaved: the component's own real block grid
        cs = scomps[0][0]
        ci = idx_of[cs]
        coef = prog.coefs[ci]
        nby, nbx = prog.nblocks[ci]
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and units \
                        and units % restart_interval == 0:
                    restart()
                _dc_block(br, coef[by, bx], preds, cs, tabs[cs], ah, al)
                units += 1
        return
    for my in range(prog.mcus_y):
        for mx in range(prog.mcus_x):
            if restart_interval and units \
                    and units % restart_interval == 0:
                restart()
            for cs, _td, _ in scomps:
                ci = idx_of[cs]
                c = comps[ci]
                coef = prog.coefs[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        _dc_block(br, coef[my * c["v"] + by,
                                           mx * c["h"] + bx],
                                  preds, cs, tabs[cs], ah, al)
            units += 1


def _ac_first_block(br, tab, coef, ss, se, al, eobrun):
    """First AC pass for one block band: zero-history coefficients get
    their high-order bits; EOBn codes start a run of end-of-band
    blocks (this block included)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += br.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        coef[k] = _extend(br.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine_block(br, tab, coef, ss, se, al, eobrun):
    """AC successive-approximation refinement for one block band:
    already-nonzero coefficients consume one correction bit wherever
    the scan passes them; newly significant coefficients arrive as
    +-1<<Al after a run of r zero-HISTORY positions. The & p1 test and
    the signed increment mirror T.81 G.2 (and two's-complement & on
    negative ints matches C's)."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.receive(r)
                    break
                # ZRL: skip 16 zero-history positions
            elif s != 1:
                raise ValueError("bad AC refinement symbol")
            else:
                val = p1 if br.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    if br.read_bit() and (int(coef[k]) & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                if br.read_bit() and (int(coef[k]) & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _ac_scan(br, prog, scomp, ss, se, ah, al, huff_ac, restart_interval):
    cs, _td, ta = scomp
    h, w, comps = prog.frame
    idx_of = {c["id"]: k for k, c in enumerate(comps)}
    ci = idx_of[cs]
    coef = prog.coefs[ci]
    nby, nbx = prog.nblocks[ci]
    tab = huff_ac.get(ta)
    if tab is None:
        raise ValueError("missing AC huffman table")
    eobrun = 0
    units = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and units \
                    and units % restart_interval == 0:
                br.align_to_rst()
                eobrun = 0
            if ah == 0:
                eobrun = _ac_first_block(br, tab, coef[by, bx], ss, se,
                                         al, eobrun)
            else:
                eobrun = _ac_refine_block(br, tab, coef[by, bx], ss, se,
                                          al, eobrun)
            units += 1


def _reconstruct_progressive(prog, qt):
    """Dequantize + dezigzag + batched separable IDCT (one einsum per
    component plane, not per block), then the shared upsample/color
    tail."""
    import numpy as np
    M = _idct_matrix()
    zz = np.array(ZIGZAG)
    h, w, comps = prog.frame
    planes = []
    for ci, c in enumerate(comps):
        q = np.asarray(qt[c["tq"]], dtype=np.float64)
        deq = prog.coefs[ci].astype(np.float64) * q
        nby, nbx = deq.shape[:2]
        nat = np.zeros((nby, nbx, 64), dtype=np.float64)
        nat[:, :, zz] = deq
        blocks = nat.reshape(nby * nbx, 8, 8)
        # per-block 2-D matmul, exactly the baseline decoder's
        # `M.T @ block @ M` op order and kernel — a stacked/broadcast
        # matmul takes a different BLAS path whose last-bit rounding
        # differs, and the round-trip test asserts BIT-identical pixels
        # between the progressive and baseline renderings
        spat = np.empty_like(blocks)
        for bi in range(blocks.shape[0]):
            spat[bi] = M.T @ blocks[bi] @ M
        spat = spat.reshape(nby, nbx, 8, 8) + 128.0
        planes.append(spat.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
    return _planes_to_rgb(planes, prog.frame, prog.hmax, prog.vmax)


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


def _quantized_grids(pixels, lq, cq, subsample):
    """RGB pixels -> per-component quantized coefficient grids
    (nby_pad, nbx_pad, 64) in zigzag order, plus frame metadata —
    shared DCT front-end for the progressive encoder."""
    import numpy as np
    px = np.asarray(pixels, dtype=np.float64)
    h, w, _ = px.shape
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
    grids = []
    nreal = []
    for c in comps:
        p = c["plane"]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:
            ph = -(-p.shape[0] // fy) * fy
            pw = -(-p.shape[1] // fx) * fx
            pad = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                         mode="edge")
            p = pad.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        nby, nbx = mcus_y * c["v"], mcus_x * c["h"]
        p = np.pad(p, ((0, nby * 8 - p.shape[0]),
                       (0, nbx * 8 - p.shape[1])), mode="edge")
        blocks = (p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
                  - 128.0).reshape(nby * nbx, 8, 8)
        # per-block 2-D matmul = the baseline encoder's exact op order:
        # a batched kernel rounds the last bit differently, which flips
        # np.round at .5-adjacent quotients and breaks the
        # progressive-vs-baseline bit-identity the tests assert
        coefs = np.empty_like(blocks)
        for bi in range(blocks.shape[0]):
            coefs[bi] = M @ blocks[bi] @ M.T
        zig = coefs.reshape(nby, nbx, 64)[:, :, zz]
        grids.append(np.round(zig / c["q"]).astype(np.int64))
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        nreal.append((-(-ch // 8), -(-cw // 8)))
    return comps, grids, nreal, mcus_x, mcus_y, h, w


def jpeg_encode_progressive(pixels, quality_tables=None,
                            subsample=(1, 1)) -> bytes:
    """Progressive (SOF2) JPEG writer — decoder-test support.

    Scan script exercises all four progressive decode paths: DC first
    (interleaved, Al=1), per-component AC first scans with spectral
    bands at Al=1, DC refinement (Ah=1), per-component AC refinement
    (Ah=1 -> Al=0). The successive-approximation split is LOSSLESS
    (shift then refinement bit restores every coefficient exactly), so
    decoding this file yields pixels bit-identical to decoding
    jpeg_encode() of the same input — the round-trip test asserts
    exactly that. EOB runs are per-block (EOBRUN=1); cross-block EOB
    runs are covered by the real-libjpeg-file test."""
    import numpy as np
    if quality_tables is None:
        lq = cq = np.ones(64, dtype=np.int64)
    else:
        lq = np.asarray(quality_tables[0], dtype=np.int64)
        cq = np.asarray(quality_tables[1], dtype=np.int64)
    comps, grids, nreal, mcus_x, mcus_y, h, w = _quantized_grids(
        pixels, lq, cq, subsample)

    def amp(v, s):
        return ("b", v if v >= 0 else v + (1 << s) - 1, s)

    def dc_first_scan(al):
        ops = []
        pred = [0, 0, 0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, c in enumerate(comps):
                    tab = "dc0" if ci == 0 else "dc1"
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc = int(grids[ci][my * c["v"] + by,
                                               mx * c["h"] + bx, 0]) >> al
                            diff = dc - pred[ci]
                            pred[ci] = dc
                            s = _size_cat(diff)
                            ops.append(("s", tab, s))
                            if s:
                                ops.append(amp(diff, s))
        header = [3]
        for ci, c in enumerate(comps):
            header += [c["id"], ((0 if ci == 0 else 1) << 4) | 0]
        header += [0, 0, (0 << 4) | al]
        return bytes(header), ops

    def dc_refine_scan(ah, al):
        ops = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, c in enumerate(comps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc = int(grids[ci][my * c["v"] + by,
                                               mx * c["h"] + bx, 0])
                            ops.append(("b", (dc >> al) & 1, 1))
        header = [3]
        for c in comps:
            header += [c["id"], 0]
        header += [0, 0, (ah << 4) | al]
        return bytes(header), ops

    def pt_ac(v, al):
        """AC point transform: magnitude shift with sign restored."""
        m = abs(int(v)) >> al
        return -m if v < 0 else m

    def ac_first_scan(ci, ss, se, al):
        # cross-block EOB runs (EOBn): consecutive all-zero bands (and
        # band tails) accumulate and flush as one EOBn symbol at the
        # run's first block position — exercising the decoder's
        # eobrun>1 skip path, which every real progressive file uses
        ops = []
        tab = "ac0" if ci == 0 else "ac1"
        nby, nbx = nreal[ci]
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            while eobrun:
                r = min(eobrun.bit_length() - 1, 14)
                chunk = min(eobrun, (1 << (r + 1)) - 1)
                ops.append(("s", tab, r << 4))
                if r:
                    ops.append(("b", chunk - (1 << r), r))
                eobrun -= chunk

        for by in range(nby):
            for bx in range(nbx):
                coef = grids[ci][by, bx]
                vals = [pt_ac(coef[k], al) for k in range(ss, se + 1)]
                if not any(vals):
                    eobrun += 1
                    continue
                flush_eob()
                r = 0
                for v in vals:
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        ops.append(("s", tab, 0xF0))
                        r -= 16
                    s = _size_cat(v)
                    ops.append(("s", tab, (r << 4) | s))
                    ops.append(amp(v, s))
                    r = 0
                if r:
                    eobrun = 1  # band tail joins the next run
        flush_eob()
        header = [1, comps[ci]["id"], (0 << 4) | (0 if ci == 0 else 1),
                  ss, se, (0 << 4) | al]
        return bytes(header), ops

    def ac_refine_scan(ci, ss, se, ah, al):
        # Each ZRL's appended correction bits must be exactly those for
        # the nonzero-history positions inside ITS OWN 16-zero window
        # (the decoder reads them while skipping that window), so ZRLs
        # are emitted EAGERLY as the zero-run crosses 16 — but only
        # while a later newly-significant coefficient exists in the
        # band; trailing zeros + corrections fold into the EOB instead.
        ops = []
        tab = "ac0" if ci == 0 else "ac1"
        nby, nbx = nreal[ci]
        for by in range(nby):
            for bx in range(nbx):
                coef = grids[ci][by, bx]
                eobpos = -1
                for k in range(ss, se + 1):
                    if pt_ac(coef[k], ah) == 0 and pt_ac(coef[k], al):
                        eobpos = k
                r = 0
                br = []
                for k in range(ss, se + 1):
                    now = pt_ac(coef[k], al)
                    if pt_ac(coef[k], ah) != 0:
                        br.append(abs(now) & 1)
                        continue
                    if now == 0:
                        r += 1
                        if r == 16 and k < eobpos:
                            ops.append(("s", tab, 0xF0))
                            ops.extend(("b", bit, 1) for bit in br)
                            br = []
                            r = 0
                        continue
                    ops.append(("s", tab, (r << 4) | 1))
                    ops.append(("b", 1 if now > 0 else 0, 1))
                    ops.extend(("b", bit, 1) for bit in br)
                    br = []
                    r = 0
                if r or br:
                    ops.append(("s", tab, 0x00))
                    ops.extend(("b", bit, 1) for bit in br)
        header = [1, comps[ci]["id"], (0 << 4) | (0 if ci == 0 else 1),
                  ss, se, (ah << 4) | al]
        return bytes(header), ops

    scans = [
        dc_first_scan(1),
        ac_first_scan(0, 1, 5, 1),
        ac_first_scan(0, 6, 63, 1),
        ac_first_scan(1, 1, 63, 1),
        ac_first_scan(2, 1, 63, 1),
        dc_refine_scan(1, 0),
        ac_refine_scan(0, 1, 63, 1, 0),
        ac_refine_scan(1, 1, 63, 1, 0),
        ac_refine_scan(2, 1, 63, 1, 0),
    ]

    syms = {"dc0": [], "dc1": [], "ac0": [], "ac1": []}
    for _, ops in scans:
        for op in ops:
            if op[0] == "s":
                syms[op[1]].append(op[2])
    tabs = {k: _fixed_huffman(v or [0]) for k, v in syms.items()}

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
    seg(0xC2, sof)
    for key, (tc, th) in (("dc0", (0, 0)), ("dc1", (0, 1)),
                          ("ac0", (1, 0)), ("ac1", (1, 1))):
        bits, vals, _enc = tabs[key]
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    for header, ops in scans:
        seg(0xDA, header)
        bw = _BitWriter()
        for op in ops:
            if op[0] == "s":
                code, ln = tabs[op[1]][2][op[2]]
                bw.write(code, ln)
            else:
                _, v, n = op
                if n:
                    bw.write(v, n)
        bw.flush()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
