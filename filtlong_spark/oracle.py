"""Pure-Python reference oracle — the stand-in for the Filtlong binary.

Implements the EXACT pipeline semantics of SURVEY.md §2/§3 (score ->
scrub -> normalize -> budget -> ordered output) on plain Python rows, at
small scale only. Golden labels and scrubbed text for the pytest suite and
the F1-fidelity check come from here.

Lifecycle mirror (reference src/main.cpp:40-311):
  1. scan+score each doc (Read ctor, src/read.cpp:25-143) incl. trim/split
  2. children replace parents (src/main.cpp:136-147)
  3. global normalize over the post-scrub set (src/main.cpp:169-212)
  4. budget filter (src/main.cpp:218-261)
  5. output survivors in input order (src/main.cpp:263-311)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import core
from .config import FilterConfig


@dataclass
class OracleDoc:
    url: str
    text: str
    order: int               # input order; children share parent's order
    child_start: int = 0     # span start for ordering children
    n_chars: int = 0
    mean_q: float = 0.0
    window_q: float = 0.0
    length_s: float = 0.0
    ratio: float = 1.0
    mean_q_score: float = 0.0
    window_q_score: float = 0.0
    final_score: float = 0.0
    hard_passed: bool = True
    passed: bool = True
    is_child: bool = False


@dataclass
class OracleResult:
    docs: list[OracleDoc]                 # the post-scrub set ("reads2")
    kept: list[OracleDoc] = field(default_factory=list)
    total_input_chars: int = 0            # raw input total (src/main.cpp:89)
    target: int | None = None


def build_accepted(cfg: FilterConfig, ref_rows: list[dict] | None):
    """The quality-signal payload (web analog of the k-mer set,
    SURVEY.md §2B): vocabulary, count-thresholded accepted set
    (src/kmers.cpp:41,137-166), or the bigram-LM counts."""
    if cfg.mode == "intrinsic":
        return set(cfg.vocab)
    assert ref_rows is not None
    if cfg.mode == "bigram_lm":
        docs_tokens = [[t for t, _, _ in core.tokenize(r["text"])]
                       for r in ref_rows]
        c2, c1, total = core.build_bigram_lm(docs_tokens)
        return ("lm", c2, c1, total, cfg.lm_threshold)
    counts: dict[str, int] = {}
    for r in ref_rows:
        for t, _, _ in core.tokenize(r["text"]):
            counts[t] = counts.get(t, 0) + 1
    return {t for t, c in counts.items() if c >= cfg.required_copies}


def _score_doc(d: OracleDoc, accepted: set[str], cfg: FilterConfig) -> None:
    toks = core.tokenize(d.text)
    q = core.quality_for(accepted)([t for t, _, _ in toks])
    d.n_chars = len(d.text)
    d.mean_q = core.mean_quality(q)
    d.window_q = core.window_quality(q, cfg.window_size)
    d.length_s = core.length_score(d.n_chars)
    d.ratio = core.window_ratio(d.mean_q, d.window_q)
    # hard thresholds on RAW metrics (src/read.cpp:64-73)
    d.hard_passed = not (
        (cfg.min_length is not None and d.n_chars < cfg.min_length)
        or (cfg.max_length is not None and d.n_chars > cfg.max_length)
        or (cfg.min_mean_q is not None and d.mean_q < cfg.min_mean_q)
        or (cfg.min_window_q is not None and d.window_q < cfg.min_window_q))
    d.passed = d.hard_passed


def run_pipeline(rows: list[dict], cfg: FilterConfig,
                 ref_rows: list[dict] | None = None) -> OracleResult:
    cfg.validate()
    accepted = build_accepted(cfg, ref_rows)
    scrub = cfg.trim or cfg.split is not None or cfg.pii_scrub

    total_input_chars = 0
    reads2: list[OracleDoc] = []
    seen_urls: set[str] = set()
    for order, r in enumerate(rows):
        text = r["text"]
        if text is None or text == "":
            continue  # quarantined by validation (A3/A4 analog)
        if r["url"] in seen_urls:
            continue  # duplicate url -> quarantine (src/main.cpp:113-117)
        seen_urls.add(r["url"])
        total_input_chars += len(text)
        if cfg.langid_enabled and cfg.langid_expected is not None:
            pred, _ = core.predict_lang(text)
            if pred != cfg.langid_expected:
                continue  # langid gate (A2 analog) — never normalized
        parent = OracleDoc(url=r["url"], text=text, order=order)
        if scrub:
            toks = core.tokenize(text)
            q = core.quality_for(accepted)([t for t, _, _ in toks])
            spans_q = [(s, e, float(q[i])) for i, (_, s, e) in enumerate(toks)]
            extra = core.pii_spans(text) if cfg.pii_scrub else None
            res = core.scrub_spans(text, spans_q, cfg.trim, cfg.split, extra)
            if res.changed:
                for (s, e) in res.child_spans:
                    child = OracleDoc(
                        url=core.child_name(r["url"], s, e),
                        text=text[s:e], order=order, child_start=s,
                        is_child=True)
                    _score_doc(child, accepted, cfg)
                    reads2.append(child)
                continue
        _score_doc(parent, accepted, cfg)
        reads2.append(parent)

    result = OracleResult(docs=reads2, total_input_chars=total_input_chars)
    if not reads2:
        return result

    # global normalization (E1/E2/E3, src/main.cpp:169-212)
    mqs = np.array([d.mean_q for d in reads2])
    mu, min_q, max_q = float(mqs.mean()), float(mqs.min()), float(mqs.max())
    sigma = float(np.sqrt(((mqs - mu) ** 2).mean()))  # population stdev
    for d in reads2:
        d.mean_q_score = core.normalize_mean_q(d.mean_q, mu, sigma, min_q, max_q)
        d.window_q_score = d.mean_q_score * d.ratio
        d.final_score = core.final_score(
            d.length_s, d.mean_q_score, d.ratio,
            cfg.length_weight, cfg.mean_q_weight, cfg.window_q_weight)

    # budget (F1-F4, src/main.cpp:218-261)
    if cfg.target_chars is not None or cfg.keep_percent is not None:
        target = cfg.target_chars if cfg.target_chars is not None else (1 << 62)
        if cfg.keep_percent is not None:
            target = min(target, int((cfg.keep_percent / 100.0) * total_input_chars))
        result.target = target
        passed_chars = sum(d.n_chars for d in reads2 if d.passed)
        if target >= total_input_chars or target >= passed_chars:
            pass  # early exit: no additional failures (src/main.cpp:239-244)
        else:
            # sort desc by final score; deterministic tiebreak = url asc
            # (reference uses unstable std::sort, src/main.cpp:246-248)
            ordered = sorted(reads2, key=lambda d: (-d.final_score, d.url))
            so_far = 0
            for d in ordered:
                if d.passed and so_far < target:
                    so_far += d.n_chars
                else:
                    d.passed = False

    # ordered output (A7): input order, children by span start
    result.kept = sorted((d for d in reads2 if d.passed),
                         key=lambda d: (d.order, d.child_start))
    return result
