"""Salted repartitioning / skew utilities."""

from pyspark.sql import functions as F

from filtlong_spark import fixtures as fx
from filtlong_spark.operators import partitioning as pt


def test_salt_deterministic_and_bounded(spark):
    df = fx.to_spark_df(spark, fx.volume(sf=0.0002))
    a = {(r["url"], r["_salt"])
         for r in pt.with_salt(df, key="url", salt_from="text").collect()}
    b = {(r["url"], r["_salt"])
         for r in pt.with_salt(df, key="url", salt_from="text").collect()}
    assert a == b
    assert all(0 <= s < 16 for _, s in a)


def test_salt_varies_within_hot_key(spark):
    # ONE host repeated 400x: the salt must take >1 value within the key
    # (a salt that is a pure function of the key spreads nothing)
    rows = [dict(fx.sort_suite()[0], url=f"https://hot.example.com/d/{i}",
                 text="join hash sort") for i in range(400)]
    df = (fx.to_spark_df(spark, rows)
          .withColumn("host", pt.host_of(F.col("url"))))
    salts = {r["_salt"] for r in
             pt.with_salt(df, key="host", salt_from="url").collect()}
    assert len(salts) > 1


def test_salted_repartition_spreads_identical_key(spark):
    # ONE url repeated 400x (rows bit-identical in the key) + 50 cold docs:
    # counter-based salting must still spread the hot key over >1 partition
    rows = [dict(fx.sort_suite()[0], url="https://hot.example.com/d",
                 text=f"join hash sort {i}") for i in range(400)]
    rows += [dict(fx.sort_suite()[0], url=f"https://cold{i}.example.com/d",
                  text="join hash sort") for i in range(50)]
    df = fx.to_spark_df(spark, rows)
    hot_pids = (pt.repartition_salted(df, 8, key="url", salt_from=None)
                .filter(F.col("url") == "https://hot.example.com/d")
                .select(F.spark_partition_id().alias("pid"))
                .distinct().count())
    assert hot_pids > 1
    # and the deterministic payload-salt path spreads a hot HOST key
    # (urls distinct, host identical — the canonical web-skew shape)
    rows2 = [dict(fx.sort_suite()[0], url=f"https://hot.example.com/d/{i}",
                  text="join hash sort") for i in range(400)]
    df2 = (fx.to_spark_df(spark, rows2)
           .withColumn("host", pt.host_of(F.col("url"))))
    hot_pids2 = (pt.repartition_salted(df2, 8, key="host", salt_from="url")
                 .filter(F.col("host") == "hot.example.com")
                 .select(F.spark_partition_id().alias("pid"))
                 .distinct().count())
    assert hot_pids2 > 1


def test_skew_aware_host_agg_correct(spark):
    rows = [dict(fx.sort_suite()[0], url=f"https://hot.example.com/d/{i}",
                 text="abcde") for i in range(100)]
    df = fx.to_spark_df(spark, rows)
    out = {(r["host"], r["n_docs"], r["chars"])
           for r in pt.skew_aware_host_agg(df).collect()}
    assert out == {("hot.example.com", 100, 500)}
