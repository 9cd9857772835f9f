"""Unit tests for the shared kernels (filtlong_spark.core)."""

import numpy as np
import pytest

from filtlong_spark import core


def test_tokenize_offsets():
    toks = core.tokenize("ab  cd e")
    assert toks == [("ab", 0, 2), ("cd", 4, 6), ("e", 7, 8)]
    assert core.tokenize("") == []


def test_mean_quality():
    q = np.array([1.0, 0.0, 1.0, 1.0])
    assert core.mean_quality(q) == 75.0
    assert core.mean_quality(np.zeros(0)) == 0.0


def test_window_quality_short_doc_equals_mean():
    # doc shorter than window -> whole-doc mean (src/read.cpp:217-218)
    q = np.array([1.0, 0.0, 1.0])
    assert core.window_quality(q, 250) == core.mean_quality(q)


def test_window_quality_min_window():
    # window 2 over [1,1,0,0,1]: window means 1, .5, 0, .5 -> min 0
    q = np.array([1.0, 1.0, 0.0, 0.0, 1.0])
    assert core.window_quality(q, 2) == 0.0
    # window 3: means 2/3, 1/3, 1/3 -> min 1/3
    assert core.window_quality(q, 3) == pytest.approx(100 / 3)


def test_window_quality_snap_to_zero():
    # min window mean just below 0.5/window -> snaps to 0 (src/read.cpp:233-234)
    w = 10
    q = np.ones(30)
    q[10:20] = 0.0   # one window fully zero -> 0 < 0.05 -> snap
    assert core.window_quality(q, w) == 0.0
    # one good token in every window: min mean = 0.1 >= 0.05 -> no snap
    q2 = np.zeros(30)
    q2[::10] = 1.0
    assert core.window_quality(q2, w) > 0.0


def test_length_score():
    assert core.length_score(5000) == 50.0
    assert core.length_score(0) == 0.0


def test_window_ratio_zero_mean_policy():
    assert core.window_ratio(0.0, 0.0) == 1.0
    assert core.window_ratio(50.0, 25.0) == 0.5
    assert core.window_ratio(50.0, 80.0) == 1.0


def test_normalize_sigma_zero_policy():
    assert core.normalize_mean_q(80.0, 80.0, 0.0, 80.0, 80.0) == 50.0
    assert core.normalize_mean_q(90.0, 85.0, 5.0, 80.0, 90.0) == 100.0
    assert core.normalize_mean_q(80.0, 85.0, 5.0, 80.0, 90.0) == 0.0


def test_final_score_default_weights():
    # ratio 1 -> plain sqrt geometric mean
    assert core.final_score(50.0, 50.0, 1.0) == 50.0
    # window weight pulls down by (1-wf) + ratio*wf with wf = 1/3
    assert core.final_score(50.0, 50.0, 0.0) == pytest.approx(50.0 * (2 / 3))


def _spans(text, vocab):
    toks = core.tokenize(text)
    q = core.token_quality([t for t, _, _ in toks], vocab)
    return [(s, e, float(q[i])) for i, (_, s, e) in enumerate(toks)]


GOOD = {"good"}


def test_scrub_trim_prefix():
    text = "bad1 bad2 good good good"
    res = core.scrub_spans(text, _spans(text, GOOD), trim=True, split_threshold=None)
    assert res.changed and res.child_spans == [(10, 24)]
    assert text[10:24] == "good good good"


def test_scrub_no_bad_unchanged():
    text = "good good"
    res = core.scrub_spans(text, _spans(text, GOOD), trim=True, split_threshold=None)
    assert not res.changed and res.child_spans == [(0, 9)]


def test_scrub_all_bad_parent_kept():
    # no good tokens -> NO trim ranges -> parent unchanged
    # (src/read.cpp:105-117 with first_base_in_kmer == -1)
    text = "bad bad bad"
    res = core.scrub_spans(text, _spans(text, GOOD), trim=True, split_threshold=None)
    assert not res.changed


def test_scrub_split_threshold_boundary():
    text = "good bad1 bad2 good"   # bad run chars [5,14) = 9 chars
    spans = _spans(text, GOOD)
    assert core.scrub_spans(text, spans, False, 10).changed is False
    res = core.scrub_spans(text, spans, False, 9)
    assert res.changed and res.child_spans == [(0, 5), (14, 19)]


def test_scrub_split_whole_doc_bad_keeps_parent():
    # bad range covers everything -> zero children -> parent kept
    # (src/main.cpp:140-147)
    text = "bad1 bad2"
    res = core.scrub_spans(text, _spans(text, GOOD), False, 1)
    assert not res.changed


def test_child_name():
    assert core.child_name("u", 20, 701) == "u_21-701"
