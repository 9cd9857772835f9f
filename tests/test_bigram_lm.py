"""Bigram-LM quality mode (KenLM-style perplexity slot)."""

import pytest

from filtlong_spark import core
from filtlong_spark import fixtures as fx
from filtlong_spark import oracle
from filtlong_spark.config import FilterConfig
from filtlong_spark.plans.pipeline import run_filter


def test_bigram_counts_and_prob():
    c2, c1, total = core.build_bigram_lm([["a", "b", "a", "b"], ["a", "c"]])
    assert c1 == {"a": 3, "b": 2, "c": 1} and total == 6
    assert c2 == {("a", "b"): 2, ("b", "a"): 1, ("a", "c"): 1}
    assert core.bigram_prob("a", "b", c2, c1, total) == 2 / 3
    assert core.bigram_prob(None, "a", c2, c1, total) == 3 / 6
    # unseen bigram -> unigram backoff
    assert core.bigram_prob("c", "a", c2, c1, total) == 0.4 * (3 / 6)
    # unseen token -> epsilon
    assert core.bigram_prob("a", "zzz", c2, c1, total) == 1 / 60


def test_bigram_quality_threshold():
    c2, c1, total = core.build_bigram_lm([["a", "b"] * 50])
    q = core.bigram_quality(["a", "b", "zzz"], c2, c1, total, threshold=0.01)
    assert list(q) == [1.0, 1.0, 0.0]


def test_doc_perplexity_orders_docs():
    corpus = [["the", "fast", "sort"] * 20]
    c2, c1, total = core.build_bigram_lm(corpus)
    good = core.doc_perplexity(["the", "fast", "sort"], c2, c1, total)
    bad = core.doc_perplexity(["zq", "xv", "kk"], c2, c1, total)
    assert good < bad


def test_pipeline_bigram_mode_matches_oracle(spark):
    rows = fx.sort_suite()
    ref = fx.ref_corpus(noisy=True)
    cfg = dict(min_length=1, mode="bigram_lm", keep_percent=90.0)
    res_o = oracle.run_pipeline(rows, FilterConfig(**cfg), ref_rows=ref)
    res_s = run_filter(spark, fx.to_spark_df(spark, rows),
                       FilterConfig(**cfg),
                       ref_pages=fx.to_spark_df(spark, ref))
    got = sorted((r["url"], r["mean_q"], r["window_q"], r["final_score"])
                 for r in res_s.kept.collect())
    exp = sorted((d.url, d.mean_q, d.window_q, d.final_score)
                 for d in res_o.kept)
    assert got == exp and len(got) > 0


def _lm_kept(res):
    return sorted((r["url"], r["n_chars"], r["mean_q"], r["window_q"],
                   r["final_score"]) for r in res.kept.collect())


@pytest.mark.parametrize("strategy", ["distributed", "broadcast"])
def test_pipeline_bigram_scrub_matches_oracle(spark, strategy):
    """Full LM pipeline (trim+split+pii+langid) == pure-Python oracle, for
    BOTH physical strategies (joins vs broadcast payload)."""
    rows = fx.volume(sf=0.0002)
    ref = fx.ref_corpus(noisy=True)
    cfg = dict(min_length=50, mode="bigram_lm", keep_percent=80.0,
               trim=True, split=40, pii_scrub=True,
               langid_enabled=True, langid_expected="en")
    res_o = oracle.run_pipeline(rows, FilterConfig(**cfg), ref_rows=ref)
    res_s = run_filter(spark, fx.to_spark_df(spark, rows),
                       FilterConfig(**cfg, lm_strategy=strategy),
                       ref_pages=fx.to_spark_df(spark, ref))
    got = _lm_kept(res_s)
    exp = sorted((d.url, d.n_chars, d.mean_q, d.window_q, d.final_score)
                 for d in res_o.kept)
    assert got == exp and len(got) > 0


def test_lm_distributed_no_model_collect(spark):
    """The join strategy's plan must contain the token joins (the whole
    point: no model table is ever collected to the driver)."""
    from filtlong_spark.operators import lm as lm_op
    ref = fx.to_spark_df(spark, fx.ref_corpus(noisy=True))
    pages = fx.to_spark_df(spark, fx.sort_suite())
    cfg = FilterConfig(min_length=1, mode="bigram_lm")
    reads2 = lm_op.score_and_scrub_distributed(spark, pages, cfg, ref)
    plan = reads2._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan
    out = reads2.collect()
    assert len(out) == 3 and all(r["n_tokens"] == 1000 for r in out)


def test_lm_auto_strategy_switches_on_model_size(spark):
    """lm_strategy='auto' picks broadcast iff the PRUNED model's entry
    count fits the configured budget — and the auto-resolved pipeline
    matches both explicit strategies."""
    from filtlong_spark.operators import lm as lm_op
    rows = fx.sort_suite()
    ref_rows = fx.ref_corpus(noisy=True)
    ref = fx.to_spark_df(spark, ref_rows)
    cfg = FilterConfig(min_length=1, mode="bigram_lm", keep_percent=90.0)
    # tiny fixture model: far under the default budget -> broadcast
    assert lm_op.choose_strategy(ref, cfg) == "broadcast"
    # squeeze the budget below the model size -> distributed
    assert lm_op.choose_strategy(ref, cfg, max_entries=1) == "distributed"
    assert lm_op.choose_strategy(None, cfg) == "distributed"
    outs = []
    for strategy in ("auto", "distributed", "broadcast"):
        c = FilterConfig(min_length=1, mode="bigram_lm", keep_percent=90.0,
                         lm_strategy=strategy)
        res = run_filter(spark, fx.to_spark_df(spark, rows), c,
                         ref_pages=ref)
        outs.append(_lm_kept(res))
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) > 0


def test_lm_min_count_prunes(spark):
    """lm_min_count > 1: rare bigrams paint as unseen (KenLM-style prune),
    identical across both strategies."""
    rows = fx.sort_suite()
    ref = fx.ref_corpus(noisy=True)
    outs = []
    for strategy in ("distributed", "broadcast"):
        cfg = FilterConfig(min_length=1, mode="bigram_lm", keep_percent=90.0,
                           lm_min_count=3, lm_strategy=strategy)
        res = run_filter(spark, fx.to_spark_df(spark, rows), cfg,
                         ref_pages=fx.to_spark_df(spark, ref))
        outs.append(_lm_kept(res))
    assert outs[0] == outs[1] and len(outs[0]) > 0
