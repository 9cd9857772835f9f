"""Partitioning & skew utilities (north_star: salted repartitioning on
url-hash to defuse host-level skew + explicit shuffle-partition tuning).

Web crawls are host-skewed (Zipf): any groupBy/join keyed by host (or a
prefix of url) concentrates hot hosts onto single tasks. Remedies, in
preference order:

1. AQE skew-join splitting (spark.sql.adaptive.skewJoin.enabled) — free,
   joins only.
2. Salted repartition (here): spread rows of the same key over
   ``n_salts`` buckets via xxhash64(url, salt); aggregations then run
   partial-per-salt -> final-per-key (two-stage agg).
3. Pre-bucketed tables (Iceberg bucket(url, N) partition spec) for
   repeated co-located joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_of(url_col) -> "F.Column":
    return F.regexp_extract(url_col, r"^https?://([^/]+)/", 1)


def with_salt(df: DataFrame, key: str = "url", n_salts: int = 16) -> DataFrame:
    """Deterministic salt column in [0, n_salts) from xxhash64 of the key
    (no RNG: repeatable across retries/resumes)."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(key)), F.lit(n_salts)).cast("int"))


def repartition_salted(df: DataFrame, n_partitions: int,
                       key: str = "url", n_salts: int = 16) -> DataFrame:
    """Hash-repartition on (key, salt) — same-key rows spread over
    n_salts partitions, defusing single-host hot spots."""
    return with_salt(df, key, n_salts).repartition(
        n_partitions, F.col(key), F.col("_salt"))


def skew_aware_host_agg(pages: DataFrame, n_salts: int = 16) -> DataFrame:
    """Two-stage (salted) per-host aggregation: partial per (host, salt),
    final per host — the hot host's rows are reduced by n_salts tasks
    before the single final row. Returns (host, n_docs, chars)."""
    base = (pages.withColumn("host", host_of(F.col("url")))
            .withColumn("_salt",
                        F.pmod(F.xxhash64("url"), F.lit(n_salts)).cast("int")))
    partial = (base.groupBy("host", "_salt")
               .agg(F.count("*").alias("n"),
                    F.sum(F.length("text")).alias("c")))
    return (partial.groupBy("host")
            .agg(F.sum("n").alias("n_docs"), F.sum("c").alias("chars")))
