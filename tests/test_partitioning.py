"""Salted repartitioning / skew utilities."""

from pyspark.sql import functions as F

from filtlong_spark import fixtures as fx
from filtlong_spark.operators import partitioning as pt


def test_salt_deterministic_and_bounded(spark):
    df = fx.to_spark_df(spark, fx.volume(sf=0.0002))
    a = {(r["url"], r["_salt"]) for r in pt.with_salt(df).collect()}
    b = {(r["url"], r["_salt"]) for r in pt.with_salt(df).collect()}
    assert a == b
    assert all(0 <= s < 16 for _, s in a)


def test_salted_repartition_spreads_hot_key(spark):
    # one hot host with 400 docs + 50 cold docs
    rows = [dict(fx.sort_suite()[0], url=f"https://hot.example.com/d/{i}",
                 text="join hash sort") for i in range(400)]
    rows += [dict(fx.sort_suite()[0], url=f"https://cold{i}.example.com/d",
                  text="join hash sort") for i in range(50)]
    df = fx.to_spark_df(spark, rows)
    parts = (pt.repartition_salted(df, 8, key="url")
             .withColumn("pid", F.spark_partition_id())
             .groupBy("pid").count().collect())
    # the hot host's rows must land on >1 partition
    assert len(parts) > 1
    assert max(r["count"] for r in parts) < 450


def test_skew_aware_host_agg_correct(spark):
    rows = [dict(fx.sort_suite()[0], url=f"https://hot.example.com/d/{i}",
                 text="abcde") for i in range(100)]
    df = fx.to_spark_df(spark, rows)
    out = {(r["host"], r["n_docs"], r["chars"])
           for r in pt.skew_aware_host_agg(df).collect()}
    assert out == {("hot.example.com", 100, 500)}
