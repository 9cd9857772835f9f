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
