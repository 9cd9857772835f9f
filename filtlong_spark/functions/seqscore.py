"""Sequence-native scoring kernels — the LITERAL Filtlong semantics over
FASTQ/FASTA reads (base granularity), vectorized with numpy.

- Phred -> probability per base (C1, src/read.cpp:270-273)
- rolling 2-bit 16-mer encode, both strands (B1, src/kmers.cpp:106-239)
- k-mer hit painting (C2, src/read.cpp:41-58)
- base-level trim/split spans (G1-G5, src/read.cpp:75-143)

Mean/window/length/final-score math is shared with the web path via
filtlong_spark.core (identical formulas, src/read.cpp:208-267).
"""

from __future__ import annotations

import numpy as np

from .. import core

K = 16
_MASK32 = np.uint64(0xFFFFFFFF)

# base -> 2-bit codes; non-ACGT maps to 0 on the forward strand
# (src/kmers.cpp:176-198) and to 0 on the reverse strand
# (src/kmers.cpp:201-219: the complement table, default 0)
BASE_FWD = np.zeros(256, dtype=np.uint64)
BASE_RC = np.zeros(256, dtype=np.uint64)
for _c, _v in (("A", 0), ("C", 1), ("G", 2), ("T", 3)):
    BASE_FWD[ord(_c)] = BASE_FWD[ord(_c.lower())] = _v
for _c, _v in (("T", 0), ("G", 1), ("C", 2), ("A", 3)):
    BASE_RC[ord(_c)] = BASE_RC[ord(_c.lower())] = _v

# kmer ending at i = sum_t bits(b[i-15+t]) << 2*(15-t)  (forward rolling
# shift-left, src/kmers.cpp:112-115); reverse strand accumulates at the
# top: rk = sum_t rc_bits(w[t]) << 2*t (src/kmers.cpp:117-119,235-239)
_PW_FWD = (np.uint64(4) ** np.arange(K - 1, -1, -1, dtype=np.uint64))
_PW_REV = (np.uint64(4) ** np.arange(0, K, dtype=np.uint64))


def _codes(seq: str, table: np.ndarray) -> np.ndarray:
    return table[np.frombuffer(seq.encode("ascii"), dtype=np.uint8)]


def kmers_forward(seq: str) -> np.ndarray:
    """uint32 forward 16-mers ending at positions 15..n-1."""
    if len(seq) < K:
        return np.zeros(0, dtype=np.uint64)
    b = _codes(seq, BASE_FWD)
    win = np.lib.stride_tricks.sliding_window_view(b, K)
    return (win @ _PW_FWD) & _MASK32


def kmers_reverse(seq: str) -> np.ndarray:
    """uint32 reverse-strand 16-mers ending at positions 15..n-1."""
    if len(seq) < K:
        return np.zeros(0, dtype=np.uint64)
    b = _codes(seq, BASE_RC)
    win = np.lib.stride_tricks.sliding_window_view(b, K)
    return (win @ _PW_REV) & _MASK32


def phred_qualities(qual: str) -> np.ndarray:
    """q = char-33; quality = 1 - 10^(-q/10) (src/read.cpp:270-273).

    Documented deviation (final-ULP only): the reference's window quality
    accumulates a rolling add/subtract of q/window (src/read.cpp:226-232,
    floating-point drift grows with read length), while this engine uses
    cumsum-differences (core.window_quality). For 0/1 paintings (k-mer
    mode) every partial sum is an exact integer and the two are
    bit-identical; for Phred fractions the results can differ in the last
    ULPs, which can flip a keep/drop vs the C++ binary only when a read's
    min-window mean sits exactly AT a --min_window_q boundary. The
    cumsum form is the numerically better one (no drift), so we keep it
    rather than replicate the drift."""
    q = np.frombuffer(qual.encode("ascii"), dtype=np.uint8).astype(np.float64)
    return 1.0 - np.power(10.0, -(q - 33.0) / 10.0)


def kmer_paint(seq: str, accepted_sorted: np.ndarray) -> np.ndarray:
    """Base qualities via k-mer painting: 1.0 for every base covered by a
    present forward 16-mer, else 0.0 (src/read.cpp:41-58)."""
    n = len(seq)
    q = np.zeros(n, dtype=np.float64)
    if n < K or accepted_sorted.size == 0:
        return q
    km = kmers_forward(seq)
    idx = np.searchsorted(accepted_sorted, km)
    idx[idx >= accepted_sorted.size] = accepted_sorted.size - 1
    hit_end = np.nonzero(accepted_sorted[idx] == km)[0] + (K - 1)
    if hit_end.size == 0:
        return q
    # paint [i-15, i] for each hit via +1/-1 boundary marks + cumsum
    marks = np.zeros(n + 1, dtype=np.int64)
    np.add.at(marks, hit_end - (K - 1), 1)
    np.add.at(marks, hit_end + 1, -1)
    q[np.cumsum(marks[:-1]) > 0] = 1.0
    return q


def zero_runs(q: np.ndarray) -> list[tuple[int, int]]:
    """Maximal runs of quality == 0.0 as [start, end) base ranges
    (src/read.cpp:88-103)."""
    mask = (q == 0.0)
    if not mask.any():
        return []
    d = np.diff(mask.astype(np.int8))
    starts = list(np.nonzero(d == 1)[0] + 1)
    ends = list(np.nonzero(d == -1)[0] + 1)
    if mask[0]:
        starts.insert(0, 0)
    if mask[-1]:
        ends.append(len(q))
    return list(zip(map(int, starts), map(int, ends)))


def scrub_spans_bases(q: np.ndarray, trim: bool,
                      split_threshold: int | None) -> core.ScrubResult:
    """Base-level trim/split (src/read.cpp:75-143): split = zero runs >=
    threshold; trim = [0, first painted) + [last painted, n); complement
    shared with the token path (core.complement_bad_ranges)."""
    n = int(q.size)
    bad: list[tuple[int, int]] = []
    if split_threshold is not None:
        bad.extend((s, e) for s, e in zero_runs(q)
                   if e - s >= split_threshold)
    if trim:
        nz = np.nonzero(q != 0.0)[0]
        if nz.size:  # no painted base -> no trim ranges (first stays -1)
            first, last = int(nz[0]), int(nz[-1]) + 1
            for tr in ((0, first), (last, n)):
                if tr[1] > tr[0] and tr not in bad:
                    bad.append(tr)
    if not bad:
        return core.ScrubResult(child_spans=[(0, n)], changed=False)
    children = core.complement_bad_ranges(bad, n)
    if not children:
        return core.ScrubResult(child_spans=[(0, n)], changed=False)
    return core.ScrubResult(child_spans=children, changed=True)


def score_read(seq: str, qual: str, accepted_sorted: np.ndarray | None,
               window_size: int, trim: bool = False,
               split: int | None = None) -> dict:
    """Full per-read scoring, reference order (Read ctor,
    src/read.cpp:25-143). Returns metrics + child spans. Plain-scalar
    params so worker-side pickles never reference the config module."""
    if accepted_sorted is not None:
        q = kmer_paint(seq, accepted_sorted)
    else:
        q = phred_qualities(qual)
    mq = core.mean_quality(q)
    wq = core.window_quality(q, window_size)
    out = {"n_chars": len(seq), "mean_q": mq, "window_q": wq,
           "ratio": core.window_ratio(mq, wq), "child_spans": None}
    if (trim or split is not None) and accepted_sorted is not None:
        res = scrub_spans_bases(q, trim, split)
        if res.changed:
            out["child_spans"] = res.child_spans
    return out


def make_fastx_scoring_mapper(accepted_bc, window_size: int, trim: bool,
                              split: int | None):
    """mapInPandas mapper (name, seq, qual, file, rec_idx) -> scored
    records; children fully re-scored, never re-scrubbed (one level,
    src/main.cpp:136-147). Lives in THIS module so the pickle only
    reaches numpy/core (worker-safe by-value modules)."""
    import pandas as pd

    def mapper(batches):
        accepted = accepted_bc.value  # sorted np.uint64 array or None
        for pdf in batches:
            rows = []
            for name, seq, qual, fil, ridx in zip(
                    pdf["name"], pdf["seq"], pdf["qual"],
                    pdf["file"], pdf["rec_idx"]):
                m = score_read(seq, qual, accepted, window_size, trim, split)
                if m["child_spans"] is not None:
                    for (s, e) in m["child_spans"]:
                        cm = score_read(seq[s:e], qual[s:e] if qual else "",
                                        accepted, window_size)
                        rows.append((f"{name}_{s + 1}-{e}", name, fil, ridx,
                                     e - s, cm["mean_q"], cm["window_q"],
                                     cm["ratio"], s, e, True))
                    continue
                rows.append((name, name, fil, ridx, m["n_chars"],
                             m["mean_q"], m["window_q"], m["ratio"],
                             0, m["n_chars"], False))
            yield pd.DataFrame(rows, columns=[
                "name", "parent_name", "file", "rec_idx", "n_chars",
                "mean_q", "window_q", "ratio", "child_start", "child_end",
                "is_child"])

    return mapper


def make_kmer_count_mapper():
    """mapInPandas mapper: reference reads -> partial (kmer, cnt) counts
    over BOTH strands (src/kmers.cpp:106-134)."""
    import pandas as pd

    def partial_counts(batches):
        for pdf in batches:
            acc: dict = {}
            for seq in pdf["seq"]:
                if len(seq) < K:
                    continue  # src/kmers.cpp:97-98
                for arr in (kmers_forward(seq), kmers_reverse(seq)):
                    vals, cnts = np.unique(arr, return_counts=True)
                    for v, c in zip(vals.tolist(), cnts.tolist()):
                        acc[v] = acc.get(v, 0) + c
            yield pd.DataFrame({"kmer": list(acc.keys()),
                                "cnt": list(acc.values())})

    return partial_counts
