"""Spark pipeline vs pure-Python oracle: exact agreement on labels, scores,
and scrubbed text (the BASELINE.json fidelity gate, tested at fixture scale
and on the seeded volume generator)."""

import pytest

from filtlong_spark import fixtures as fx
from filtlong_spark import oracle
from filtlong_spark.config import FilterConfig
from filtlong_spark.plans.pipeline import run_filter


def _cfg(**kw):
    kw.setdefault("mode", "intrinsic")
    kw.setdefault("vocab", fx.VOCAB)
    return FilterConfig(**kw)


def _spark_kept(spark, rows, cfg, ref_rows=None):
    df = fx.to_spark_df(spark, rows)
    ref_df = fx.to_spark_df(spark, ref_rows) if ref_rows else None
    res = run_filter(spark, df, cfg, ref_pages=ref_df)
    out = [(r["url"], r["n_chars"], r["mean_q"], r["window_q"],
            r["final_score"], r["text"]) for r in res.kept.collect()]
    res.reads2.unpersist()
    return out, res


def _oracle_kept(rows, cfg, ref_rows=None):
    res = oracle.run_pipeline(rows, cfg, ref_rows=ref_rows)
    return [(d.url, d.n_chars, d.mean_q, d.window_q, d.final_score, d.text)
            for d in res.kept], res


def assert_match(spark, rows, cfg_kwargs, ref_rows=None, mode=None):
    kw = dict(cfg_kwargs)
    if mode:
        kw["mode"] = mode
        kw.pop("vocab", None)
        cfg_s, cfg_o = FilterConfig(**kw), FilterConfig(**dict(kw))
    else:
        cfg_s, cfg_o = _cfg(**kw), _cfg(**dict(kw))
    got, _ = _spark_kept(spark, rows, cfg_s, ref_rows)
    exp, _ = _oracle_kept(rows, cfg_o, ref_rows)
    assert got == exp  # bit-identical: scores AND scrubbed text


def test_sort_budget_exact(spark):
    assert_match(spark, fx.sort_suite(), dict(target_chars=10_000))


def test_sort_refset_mode(spark):
    assert_match(spark, fx.sort_suite(),
                 dict(min_length=1, required_copies=4),
                 ref_rows=fx.ref_corpus(noisy=True), mode="refset")


def test_trim_byte_identical(spark):
    assert_match(spark, fx.trim_suite(), dict(trim=True, min_length=1))


@pytest.mark.parametrize("thr", [200, 50])
def test_split(spark, thr):
    assert_match(spark, fx.split_suite(), dict(split=thr))


def test_badrec_quarantine(spark):
    rows = fx.badrec_suite()
    df = fx.to_spark_df(spark, rows)
    res = run_filter(spark, df, _cfg(min_length=1))
    q = {(r["url"], r["reason"]) for r in res.quarantine.collect()}
    assert ("https://fixture.test/bad/empty", "empty_text") in q
    assert ("https://fixture.test/bad/dup", "duplicate_url") in q
    assert ("https://fixture.test/bad/null", "null_text") in q
    kept_urls = [r["url"] for r in res.kept.collect()]
    assert kept_urls.count("https://fixture.test/bad/dup") == 1


def test_volume_label_fidelity(spark):
    """Seeded volume table: every keep/drop label and score must match the
    oracle exactly (F1 == 1.0 >= the 0.99 gate)."""
    rows = fx.volume(sf=0.0003)  # 300 docs
    cfg_kwargs = dict(min_length=300, keep_percent=80.0, min_mean_q=60.0)
    got, gres = _spark_kept(spark, rows, _cfg(**cfg_kwargs))
    exp, ores = _oracle_kept(rows, _cfg(**cfg_kwargs))
    assert gres.total_input_chars == ores.total_input_chars
    assert gres.target == ores.target
    assert got == exp
    assert len(got) > 0


def test_volume_scrub_fidelity(spark):
    rows = fx.volume(sf=0.0002)
    kw = dict(trim=True, split=40, min_length=100, target_chars="100k")
    got, _ = _spark_kept(spark, rows, _cfg(**kw))
    exp, _ = _oracle_kept(rows, _cfg(**kw))
    assert got == exp
    assert len(got) > 0


def test_approx_budget_equals_exact(spark):
    rows = fx.volume(sf=0.0003)
    kw = dict(min_length=200, target_chars="200k")
    exact, _ = _spark_kept(spark, rows, _cfg(**kw, budget_algorithm="exact"))
    approx, _ = _spark_kept(spark, rows, _cfg(**kw, budget_algorithm="approx"))
    assert exact == approx
    assert 0 < len(exact) < len(rows)
