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


def test_child_output_order_digit_inversion(spark):
    """Sibling children whose start offsets cross a digit boundary (4 vs
    13) sort lexicographically inverted by NAME ('_13-15' < '_4-7'); the
    output must still be in SPAN order (src/main.cpp:284-309)."""
    # tokens: zzz(bad, 0-3)  aa(good)  zzzzz(bad, 7-12)  aa(good)
    # split=3 -> bad runs [0,3) and [7,12) -> children (3,7) and (12,15)
    rows = [{"url": "https://fixture.test/inv", "warc_ts": None,
             "html": None, "text": "zzz aa zzzzz aa", "lang": "en"}]
    kw = dict(split=3, min_length=1, vocab=frozenset({"aa"}))
    got, _ = _spark_kept(spark, rows, _cfg(**kw))
    exp, _ = _oracle_kept(rows, _cfg(**kw))
    assert got == exp
    assert [g[0] for g in got] == ["https://fixture.test/inv_4-7",
                                   "https://fixture.test/inv_13-15"]


def test_partitioned_output_ordering(spark):
    """output_ordering='partitioned' must produce the same survivor set
    with per-partition span order and NO global sort in the plan."""
    rows = fx.volume(sf=0.0002)
    kw = dict(trim=True, split=40, min_length=100)
    g, _ = _spark_kept(spark, rows, _cfg(**kw, output_ordering="global"))
    df = fx.to_spark_df(spark, rows)
    res = run_filter(spark, df, _cfg(**kw, output_ordering="partitioned"))
    plan = res.kept._jdf.queryExecution().optimizedPlan().toString()
    assert not any(ln.strip().startswith("Sort") and ", true" in ln
                   for ln in plan.split("\n")), plan
    p = [(r["url"], r["n_chars"], r["mean_q"], r["window_q"],
          r["final_score"], r["text"]) for r in res.kept.collect()]
    assert sorted(p) == sorted(g)
    # span order must hold within every output partition
    part_rows = res.kept.select(
        "warc_ts", "parent_url", "child_start").rdd.glom().collect()
    for part in part_rows:
        keys = [(r["warc_ts"], r["parent_url"], r["child_start"])
                for r in part]
        assert keys == sorted(keys)


def test_approx_budget_equals_exact(spark):
    rows = fx.volume(sf=0.0003)
    kw = dict(min_length=200, target_chars="200k")
    exact, _ = _spark_kept(spark, rows, _cfg(**kw, budget_algorithm="exact"))
    approx, _ = _spark_kept(spark, rows, _cfg(**kw, budget_algorithm="approx"))
    assert exact == approx
    assert 0 < len(exact) < len(rows)


def test_physical_plan_properties(spark, tmp_path):
    """The plans we'd want at 100 TB, asserted: (a) the survivor label
    join broadcasts the metrics side (text never shuffles), (b) reads of
    the committed metrics snapshot are column-pruned down to the columns
    the stats job needs."""
    import re

    from filtlong_spark.operators import normalize as normalize_op

    ck = str(tmp_path / "ck")
    rows = fx.volume(sf=0.0002)
    df = fx.to_spark_df(spark, rows)
    res = run_filter(spark, df, _cfg(min_length=100, keep_percent=80.0),
                     checkpoint_dir=ck)
    res.kept.collect()
    plan = res.kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan

    reads2 = spark.read.parquet(ck + "/reads2")
    agg = reads2.agg(*normalize_op.stats_aggs())
    s = agg._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: struct<([^>]*)>", s)
    assert m, s
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols <= {"mean_q", "n_chars", "hard_passed"}, cols


@pytest.mark.parametrize("weights", [
    dict(length_weight=2.0, mean_q_weight=1.0, window_q_weight=3.0),
    dict(length_weight=0.5, mean_q_weight=2.5, window_q_weight=1.0),
    dict(length_weight=1.0, mean_q_weight=1.0, window_q_weight=0.0),
])
def test_nondefault_weights_bit_identical(spark, weights):
    """Weighted final scores must be BIT-identical to the oracle (JVM pow
    is 1-ulp off libm; the weighted path routes through the shared Python
    kernel instead)."""
    assert_match(spark, fx.volume(sf=0.0002),
                 dict(min_length=100, keep_percent=70.0, **weights))


@pytest.mark.parametrize("kw", [
    dict(window_size=1, min_window_q=50.0, min_length=1),
    dict(window_size=2, trim=True, split=1, pii_scrub=True, min_length=1),
    dict(keep_percent=5.0, budget_algorithm="approx", min_length=1),
])
def test_exotic_config_combos(spark, kw):
    """Corner configs from the fuzz sweep (window 1-2, split 1, tiny
    keep_percent): bit-exact vs the oracle."""
    assert_match(spark, fx.volume(sf=0.0002), kw)


def test_exotic_refset_combo(spark):
    assert_match(spark, fx.volume(sf=0.0002),
                 dict(required_copies=8, trim=True, split=25, min_length=1),
                 ref_rows=fx.ref_corpus(noisy=True), mode="refset")
