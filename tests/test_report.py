"""C8 number formatting + --verbose report rendering."""

from filtlong_spark import fixtures as fx
from filtlong_spark.config import FilterConfig
from filtlong_spark.functions import report
from filtlong_spark.plans.pipeline import run_filter


def test_int_to_string_grouping():
    assert report.int_to_string(4901) == "4,901"
    assert report.int_to_string(1234567) == "1,234,567"
    assert report.int_to_string(42) == "42"


def test_double_to_string_padding():
    # src/misc.cpp:24-32: fixed 2dp, left-padded to width 5
    assert report.double_to_string(3.14159) == " 3.14"
    assert report.double_to_string(99.996) == "100.00"
    assert report.double_to_string(0.0) == " 0.00"


def test_filter_summary_branches():
    assert report.filter_summary(None, 10, 10, 10) == []
    assert report.filter_summary(100, 50, 40, 40)[-1] == \
        "  not enough reads to reach target"
    assert report.filter_summary(45, 50, 40, 40)[-1] == \
        "  reads already fall below target after filtering"
    out = report.filter_summary(30, 50, 40, 30)
    assert out[0] == "Filtering long reads"
    assert out[1] == "  target: 30 bp"
    assert out[-1] == "  keeping 30 bp"


def test_verbose_tables_render(spark):
    rows = fx.split_suite()
    cfg = FilterConfig(split=50, keep_percent=90.0, mode="intrinsic",
                       vocab=fx.VOCAB)
    res = run_filter(spark, fx.to_spark_df(spark, rows), cfg)
    recs = res.reads2.collect()
    info = report.verbose_read_info(recs)
    assert any(ln.startswith("      child ranges = ") for ln in info)
    assert any("mean quality = " in ln for ln in info)
    table = report.verbose_scores_table(recs)
    assert table[0].startswith("Read name\tLength score")
    assert len(table) == len(recs) + 1
    assert all("\t" in ln for ln in table[1:])
