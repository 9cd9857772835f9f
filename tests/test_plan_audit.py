"""Physical-plan audits: every driver-facing query must stay on
hash/broadcast equi-join paths — a CartesianProduct or
BroadcastNestedLoopJoin anywhere means an operator silently degraded to
all-pairs (the round-2 embedding-LSH failure mode, now structurally
guarded)."""

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin", "Cross")


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_no_cross_products(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in FORBIDDEN:
        assert marker not in plan, f"{name}: {marker} in plan\n{plan}"


def test_pipeline_label_join_not_cartesian(spark):
    """The output label join (metrics-only side vs source text) must be
    an equi-join on the parent url — never a nested loop."""
    from filtlong_spark.plans.pipeline import run_filter
    from filtlong_spark.sources import tables
    import bench
    pages = tables.documents_as_pages(spark, SF_DIR)
    res = run_filter(spark, pages, bench.full_stack_cfg())
    plan = res.kept._jdf.queryExecution().executedPlan().toString()
    for marker in FORBIDDEN:
        assert marker not in plan, plan


def test_lm_paint_joins_are_broadcast(spark):
    """The token-grain goodness painting must join the (pruned, small)
    count tables by BROADCAST when they fit — a sort-merge/shuffle-hash
    strategy here would shuffle the full token stream twice (by
    (prev, tok) then by tok), the single most expensive mistake the LM
    plan can make at scale. AQE can only pick broadcast if the static
    estimate doesn't pin the join; this guards the plan shape."""
    from pyspark.sql import functions as F
    from filtlong_spark.operators import lm as lm_op
    import bench
    from filtlong_spark.sources import tables as t
    pages = t.documents_as_pages(spark, SF_DIR)
    cfg = bench.lm_stack_cfg()
    tabs = lm_op.lm_count_tables(pages, cfg.lm_min_count)
    keyed = pages.select(F.xxhash64("url").alias("doc_key"), "url", "text")
    tok = keyed.mapInArrow(lm_op.make_token_mapper(cfg),
                           schema=lm_op.TOK_SCHEMA)
    painted = lm_op.paint_goodness(tok, tabs.c1, tabs.c2e, tabs.total,
                                   cfg.lm_threshold)
    plan = painted._jdf.queryExecution().executedPlan().toString()
    tabs.release()
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_quality_buckets_approx_plan_has_no_sort(spark):
    """The approx (web-scale) bucket path must be: one lang-grain
    aggregate -> BROADCAST join of the tiny cutpoint table -> map-only
    compare. A Window or a per-language sort in this plan means the
    'no global sort' promise silently regressed to the exact path."""
    from filtlong_spark.operators import sampling
    docs = spark.createDataFrame(
        [(f"d{i}", "en", float(i)) for i in range(50)],
        "doc_id string, lang string, q double")
    out = sampling.quality_buckets(docs, "q", algorithm="approx")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_quality_buckets_exact_plan_single_window(spark):
    """The exact path is ntile over ONE window (partitioned by lang) —
    no second shuffle, no join."""
    from filtlong_spark.operators import sampling
    docs = spark.createDataFrame(
        [(f"d{i}", "en", float(i)) for i in range(50)],
        "doc_id string, lang string, q double")
    out = sampling.quality_buckets(docs, "q")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Window") == 1, plan
    assert "Join" not in plan, plan
