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
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if spread and _should_spread(spark, path):
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _should_spread(spark: SparkSession, path: str) -> bool:
    """Whether the unsplittable-input repartition pays for itself,
    decided from os.stat alone (an earlier draft probed
    df.rdd.getNumPartitions(), but that converts the plan to an RDD
    through py4j at ~0.15-0.2 s per QUERY CONSTRUCTION — a pure latency
    tax at any scale). Two conditions:

    - fewer data files than cores (a single file is the testdata shape;
      a real at-scale table has >= one file per split of parallelism),
      AND
    - the table is at least maxPartitionBytes/8 on disk — below that,
      the whole table fits comfortably inside a fraction of ONE scan
      split, and the extra AQE shuffle stage's fixed latency (~0.4 s
      measured: stage materialization + task launches) exceeds any
      parallelism gain. Both bounds derive from session config, not
      from a bench constant."""
    files, total = 1, 0
    if os.path.isdir(path):
        names = [f for f in os.listdir(path)
                 if not f.startswith(("_", "."))]
        files = max(1, len(names))
        total = sum(os.path.getsize(os.path.join(path, f))
                    for f in names)
    else:
        total = os.path.getsize(path)
    if files >= spark.sparkContext.defaultParallelism:
        return False
    return total >= _max_partition_bytes(spark) // 8


def _max_partition_bytes(spark: SparkSession) -> int:
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes",
                             "134217728")).strip().lower()
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "b": 1}
    if raw and raw[-1] in mult:
        return int(raw[:-1]) * mult[raw[-1]]
    return int(raw)


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
    local[32]. Prefer load()'s path-based estimate; this DataFrame
    variant pays an RDD-conversion probe and exists for callers that
    hold only a computed plan."""
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def documents_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) -> pages(url, warc_ts,
    html, text, lang) in the BASELINE.json input_hint shape, derived
    deterministically (url from source/doc_id, warc_ts from doc_id)."""
    # spread=False: run_filter's ingest starts with a url-only dup-key
    # aggregate (column-pruned scan, no text movement) and the pipeline
    # fans out AFTER it (pipeline.py's own repartition guard). A spread
    # here would shuffle the text column once more before that
    # aggregate for nothing (measured: pipeline leg 3.5 -> 4.3 s).
    docs = load(spark, sf_dir, "documents", spread=False)
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
