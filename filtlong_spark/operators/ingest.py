"""Ingest + validation (SURVEY.md §2A: A1-A4).

- A1 scan: the caller supplies any DataFrame in the input_hint shape
  (Iceberg/parquet table scan; Catalyst handles pushdown/pruning).
- A3 malformed records: null/empty text -> quarantine (the reference
  aborts on malformed FASTQ, src/main.cpp:80-87; at 10^12 docs we route
  to a quarantine sink instead of failing the job, keeping counts).
- A4 duplicate keys: duplicate url -> first occurrence wins, rest
  quarantined (reference aborts, src/main.cpp:113-117).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class IngestResult:
    valid: DataFrame       # deduped, non-empty text, with order_ts/order_url
    quarantine: DataFrame  # rows rejected, with a reason column


def ingest(pages: DataFrame, order_cols=("warc_ts", "url")) -> IngestResult:
    """Validate + stamp the order key used by the order-preserving sink
    (A7). The order key is (warc_ts, url) — stable and data-derived, unlike
    monotonically_increasing_id which depends on partition layout."""
    base = pages.withColumn(
        "_reason",
        F.when(F.col("text").isNull(), F.lit("null_text"))
         .when(F.length("text") == 0, F.lit("empty_text")))

    # duplicate-url check (A4): keep the first by order key, deterministic
    w = Window.partitionBy("url").orderBy(*[F.col(c) for c in order_cols])
    base = base.withColumn("_rn", F.row_number().over(w))
    base = base.withColumn(
        "_reason",
        F.when(F.col("_reason").isNotNull(), F.col("_reason"))
         .when(F.col("_rn") > 1, F.lit("duplicate_url")))

    valid = base.filter(F.col("_reason").isNull()).drop("_reason", "_rn")
    quarantine = (base.filter(F.col("_reason").isNotNull())
                  .withColumnRenamed("_reason", "reason").drop("_rn"))
    return IngestResult(valid=valid, quarantine=quarantine)


def dup_check(pages: DataFrame) -> DataFrame:
    """A4 as a standalone data-quality gate: urls with count > 1."""
    return (pages.groupBy("url").agg(F.count("*").alias("n"))
            .filter(F.col("n") > 1))
