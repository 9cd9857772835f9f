"""Table loaders + adapters.

- testdata parquet loaders (TESTDATA.md layout)
- documents -> input_hint pages adapter (deterministic), so the flagship
  pipeline can run over the driver-provided tables
- Iceberg-or-parquet sink abstraction lives in operators/output.py
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load(spark: SparkSession, sf_dir: str, name: str,
         spread: bool = True) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _spread(spark, df) if spread else df


def spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Unsplittable-input guard (optimization guide §2.5, 'input skew:
    one huge unsplittable file ... repartition immediately after the
    read'): the testdata tables are single-file, single-row-group
    parquet, so the scan yields 1-2 partitions and every downstream
    per-doc stage (Arrow mappers, explode+partial-agg) runs on 1-2 of
    the cluster's cores. A round-robin repartition to the session's
    default parallelism right after the read costs one tiny exchange
    (the tables are MBs) and restores full-width execution. No-op for
    inputs that already split into enough tasks (any real multi-file
    table at scale), so the guard is scale-adaptive, not tuned to
    local[32]."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> pages(url, warc_ts,
    html, text, lang) in the BASELINE.json input_hint shape, derived
    deterministically (url from source/doc_id, warc_ts from doc_id)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
                 F.col("doc_id").cast("string")).alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=F.col("doc_id").cast("double"))).alias("warc_ts"),
        F.encode(F.col("text"), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


_spread = spread  # load()'s keyword arg shadows the function name
