"""Golden-behavior tests of the pure-Python oracle on the fixture designs
(FIXTURES.md F1-F7; ports of reference test/test_sort.py, test_trim.py,
test_split.py semantics)."""

import pytest

from filtlong_spark import fixtures as fx
from filtlong_spark import oracle
from filtlong_spark.config import FilterConfig


def _cfg(**kw):
    kw.setdefault("mode", "intrinsic")
    kw.setdefault("vocab", fx.VOCAB)
    return FilterConfig(**kw)


class TestSortSuite:
    def test_intrinsic_ranking(self):
        res = oracle.run_pipeline(fx.sort_suite(), _cfg(min_length=1))
        ranked = [d.url.split("/")[-1]
                  for d in sorted(res.docs, key=lambda d: -d.final_score)]
        assert ranked == ["2", "3", "1"]

    @pytest.mark.parametrize("noisy,copies", [(False, 1), (True, 4)])
    def test_refset_ranking_inverts(self, noisy, copies):
        # the keep/drop ranking must INVERT under reference mode
        # (reference test/test_sort.txt:6-8, test_sort.py:183-192)
        cfg = FilterConfig(min_length=1, mode="refset", required_copies=copies)
        res = oracle.run_pipeline(fx.sort_suite(), cfg,
                                  ref_rows=fx.ref_corpus(noisy=noisy))
        ranked = [d.url.split("/")[-1]
                  for d in sorted(res.docs, key=lambda d: -d.final_score)]
        assert ranked == ["1", "3", "2"]

    def test_refset_quality_percentages_exact(self):
        cfg = FilterConfig(min_length=1, mode="refset", required_copies=1)
        res = oracle.run_pipeline(fx.sort_suite(), cfg, ref_rows=fx.ref_corpus())
        by = {d.url.split("/")[-1]: d.mean_q for d in res.docs}
        assert by == {"1": 100.0, "2": 97.0, "3": 99.0}

    @pytest.mark.parametrize("target,expect", [
        (100_000, {"1", "2", "3"}),   # target >= total -> early exit
        (10_001, {"1", "2", "3"}),    # overshoot rule keeps all three
        (10_000, {"2", "3"}),
        (5_001, {"2", "3"}),          # cum-before 5000 < 5001 -> 3 kept
        (5_000, {"2"}),
        (1, {"2"}),
    ])
    def test_budget_boundaries(self, target, expect):
        # reference test/test_sort.py:85-354 boundary sweep incl. the
        # overshoot semantics of src/main.cpp:250-257
        res = oracle.run_pipeline(fx.sort_suite(), _cfg(target_chars=target))
        assert {d.url.split("/")[-1] for d in res.kept} == expect


class TestTrimSuite:
    def test_trim_children_and_totals(self):
        res = oracle.run_pipeline(fx.trim_suite(), _cfg(trim=True, min_length=1))
        got = {(d.url, d.n_chars) for d in res.kept}
        assert got == {
            ("https://fixture.test/trim/1", 1300),
            ("https://fixture.test/trim/2_21-701", 681),
            ("https://fixture.test/trim/3_1-970", 970),
            ("https://fixture.test/trim/4_13-1885", 1873),
        }
        # aggregate counters: 4 docs, 4,901 -> 4,824 chars (FIXTURES.md F2)
        assert res.total_input_chars == 4901
        assert sum(d.n_chars for d in res.docs) == 4824

    def test_trim_text_byte_identical(self):
        rows = fx.trim_suite()
        res = oracle.run_pipeline(rows, _cfg(trim=True, min_length=1))
        parent = {r["url"]: r["text"] for r in rows}
        d = next(d for d in res.kept if d.url.endswith("_21-701"))
        assert d.text == parent["https://fixture.test/trim/2"][20:701]


class TestSplitSuite:
    # run splits iff char-run-length >= threshold (src/read.cpp:88-103);
    # planted runs are 0/50/100/200 chars at char 1000
    @pytest.mark.parametrize("thr,expect", [
        (250, {"split/1", "split/2", "split/3", "split/4"}),
        (201, {"split/1", "split/2", "split/3", "split/4"}),
        (200, {"split/1", "split/2", "split/3",
               "split/4_1-1000", "split/4_1201-2900"}),
        (175, {"split/1", "split/2", "split/3",
               "split/4_1-1000", "split/4_1201-2900"}),
        (75, {"split/1", "split/2", "split/3_1-1000", "split/3_1101-2900",
              "split/4_1-1000", "split/4_1201-2900"}),
        (51, {"split/1", "split/2", "split/3_1-1000", "split/3_1101-2900",
              "split/4_1-1000", "split/4_1201-2900"}),
        (50, {"split/1", "split/2_1-1000", "split/2_1051-2900",
              "split/3_1-1000", "split/3_1101-2900",
              "split/4_1-1000", "split/4_1201-2900"}),
        (25, {"split/1", "split/2_1-1000", "split/2_1051-2900",
              "split/3_1-1000", "split/3_1101-2900",
              "split/4_1-1000", "split/4_1201-2900"}),
    ])
    def test_split_sweep(self, thr, expect):
        res = oracle.run_pipeline(fx.split_suite(), _cfg(split=thr))
        assert {d.url.split("test/")[1] for d in res.kept} == expect


class TestEdgeCases:
    def test_sigma_zero_all_identical(self):
        # all docs identical quality -> sigma == 0 -> everyone scores 50
        rows = [dict(r, url=f"u{i}", text="join hash sort")
                for i, r in enumerate(fx.sort_suite())]
        res = oracle.run_pipeline(rows, _cfg(min_length=1))
        assert all(d.mean_q_score == 50.0 for d in res.docs)
        assert len({d.final_score for d in res.docs}) == 1

    def test_keep_percent_uses_raw_input_chars(self):
        # keep_percent is a percentage of RAW input chars, counted before
        # scrub (src/main.cpp:89,234-236). With trim shrinking docs, the
        # target is still computed off the raw total.
        rows = fx.trim_suite()
        cfg = _cfg(trim=True, keep_percent=50.0)
        res = oracle.run_pipeline(rows, cfg)
        assert res.target == int(0.50 * 4901)

    def test_duplicate_url_quarantined(self):
        rows = fx.badrec_suite()
        res = oracle.run_pipeline(rows, _cfg(min_length=1))
        urls = [d.url for d in res.docs]
        assert urls.count("https://fixture.test/bad/dup") == 1
        assert not any(d.url.endswith("/bad/empty") for d in res.docs)

    def test_budget_tiebreak_deterministic(self):
        # identical scores at the boundary -> url-ascending tiebreak
        rows = [dict(fx.sort_suite()[0], url=f"https://t/{c}",
                     text="join hash sort part") for c in "bca"]
        res = oracle.run_pipeline(rows, _cfg(target_chars=25))
        # each doc 19 chars; cum-before: a=0, b=19, c=38 -> a,b kept
        assert {d.url for d in res.kept} == {"https://t/a", "https://t/b"}
