"""Deterministic dataset splitting/sampling for training pipelines.

Train/val/test assignment must be a PURE FUNCTION of the document key —
never of partitioning, row order, or an RNG — so that re-runs, resumes,
and incremental ingests put every document in the same split forever
(the property `df.randomSplit` cannot give you across jobs). The bucket
is the first 8 md5 hex chars of the key string mod 100: exact integer
arithmetic, identical in Spark, DuckDB, and Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 100


def split_bucket_col(key: Column) -> Column:
    """md5-derived stable bucket in [0, 100) from the key's string form."""
    h = F.conv(F.substring(F.md5(key.cast("string").cast("binary")), 1, 8),
               16, 10).cast("long")
    return h % SPLIT_BUCKETS


def split_assign(docs: DataFrame, key: str = "doc_id",
                 train_pct: int = 90, val_pct: int = 5) -> DataFrame:
    """(key, bucket, split): split = train | val | test by bucket
    thresholds (defaults 90/5/5). Map-only — no shuffle, no state."""
    bucket = split_bucket_col(F.col(key))
    split = (F.when(bucket < train_pct, F.lit("train"))
             .when(bucket < train_pct + val_pct, F.lit("val"))
             .otherwise(F.lit("test")))
    return docs.select(key, bucket.alias("bucket"), split.alias("split"))
