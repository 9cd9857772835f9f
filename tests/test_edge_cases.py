"""Degenerate-input robustness: the vectorized batch kernels have
empty-array edges that must not crash or mislabel."""

from filtlong_spark import fixtures as fx
from filtlong_spark.config import FilterConfig
from filtlong_spark.plans.pipeline import run_filter


def _cfg(**kw):
    kw.setdefault("mode", "intrinsic")
    kw.setdefault("vocab", fx.VOCAB)
    return FilterConfig(**kw)


def _pages(spark, rows):
    return spark.createDataFrame(rows, fx.PAGES_SCHEMA)


def test_empty_input(spark):
    res = run_filter(spark, _pages(spark, []), _cfg(min_length=1))
    assert res.kept.count() == 0
    assert res.total_input_chars == 0


def test_whitespace_only_docs(spark):
    rows = [("https://e.test/1", None, None, "   \t \n ", "en"),
            ("https://e.test/2", None, None, "the fast sort", "en")]
    res = run_filter(spark, _pages(spark, rows),
                     _cfg(min_length=1, trim=True, split=3))
    kept = {r["url"]: r for r in res.kept.collect()}
    # the whitespace doc has zero tokens -> mean 0, passes min_length=1
    assert set(kept) == {"https://e.test/1", "https://e.test/2"}
    assert kept["https://e.test/1"]["n_tokens"] == 0
    assert kept["https://e.test/1"]["mean_q"] == 0.0


def test_all_docs_gated(spark):
    rows = [(f"https://g.test/{i}", None, None,
             "der die und das ist " * 10, "de") for i in range(5)]
    res = run_filter(spark, _pages(spark, rows),
                     _cfg(min_length=1, langid_enabled=True,
                          langid_expected="en"))
    assert res.kept.count() == 0
    assert res.lang_rejected.count() == 5


def test_single_doc_keep_percent(spark):
    rows = [("https://s.test/1", None, None, "the fast sort " * 50, "en")]
    res = run_filter(spark, _pages(spark, rows),
                     _cfg(keep_percent=50.0, budget_algorithm="approx"))
    # 50% of one doc: greedy overshoot keeps the single doc
    assert res.kept.count() == 1


def test_empty_input_bigram_lm(spark):
    ref = fx.to_spark_df(spark, fx.ref_corpus(noisy=True))
    res = run_filter(spark, _pages(spark, []),
                     FilterConfig(min_length=1, mode="bigram_lm"),
                     ref_pages=ref)
    assert res.kept.count() == 0
