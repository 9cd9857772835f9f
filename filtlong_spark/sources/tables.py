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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


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
