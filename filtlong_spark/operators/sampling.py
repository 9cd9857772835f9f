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


def pack_sequences(docs: DataFrame, capacity: int,
                   group_col: str = "lang", key: str = "doc_id",
                   order_col: str | None = None) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing: within each group,
    documents are laid end-to-end in (order_col, key) order and the
    token stream is cut into fixed-``capacity`` training sequences; a
    document that straddles a boundary is split across the adjacent
    sequences (the standard pretraining packing — no padding waste, no
    bin-packing heuristic). Returns per doc:
    (key, group, n_tok, start_tok, first_seq, last_seq) where
    ``start_tok`` is the doc's offset in its group's token stream and
    ``first_seq``/``last_seq`` the 0-based sequence ids it lands in
    (empty docs take the sequence at their offset).

    Scale shape: ONE window running-sum partitioned by ``group_col`` —
    each group (language/domain/shard id) packs independently, which is
    exactly how production packing shards: no global order, shuffle
    bounded by the largest group. All-integer arithmetic -> the
    pack_sequences oracle matches bit-for-bit."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    from pyspark.sql import Window
    order = order_col or key
    toks = F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)"))
    base = docs.select(F.col(key), F.col(group_col).alias("group"),
                       toks.alias("n_tok"), F.col(order).alias("_ord"))
    w = (Window.partitionBy("group").orderBy("_ord", key)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tok").over(w)
    start = (cum - F.col("n_tok")).cast("long")
    end = cum.cast("long")
    last_tok = F.greatest(end - 1, start)   # empty doc -> its offset
    # seq ids via INTEGER division (div), never a double floor — exact
    # at any offset and identical to the oracle's // operator
    return (base
            .withColumn("start_tok", start)
            .withColumn("_last_tok", last_tok)
            .withColumn("first_seq",
                        F.expr(f"start_tok div {int(capacity)}"))
            .withColumn("last_seq",
                        F.expr(f"_last_tok div {int(capacity)}"))
            .select(key, "group", "n_tok", "start_tok",
                    "first_seq", "last_seq"))


def mixture_sample(docs: DataFrame, target_shares: dict,
                   token_budget: int, group_col: str = "lang",
                   key: str = "doc_id") -> DataFrame:
    """Static-mixture downsampling to a TARGET distribution (the
    Pile/DoReMi-style domain-mixing stage): given per-group target
    shares of a total token budget, each group keeps docs with
    p_keep = min(1, share * budget / group_tokens), so the expected
    kept-token mass per group is its budget slice (a group smaller than
    its slice keeps everything — shares are a ceiling-capped target,
    not an up-sampler). Groups absent from ``target_shares`` (or with
    zero tokens) get p_keep = 0.0 — excluded from the mixture.

    The per-doc draw is the same deterministic md5 uniform as
    partitioning.host_temperature_sample (60-bit prefix / 2^60): pure
    function of the doc key, reproducible across runs, cluster sizes,
    and engines. Returns (key, group, n_tok, group_tokens, p_keep,
    sampled) for EVERY input doc.

    Scale shape: one explode-free token count per doc (map-side), a
    key-only group aggregate (tiny — rows = distinct groups), broadcast
    back, then a map-only comparison. No doc-grain shuffle, no text
    movement. p_keep is one multiply + one divide on exact integer
    sums -> the mixture_sample oracle matches bit-for-bit."""
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    shares_df = docs.sparkSession.createDataFrame(
        [(g, float(s)) for g, s in sorted(target_shares.items())],
        "group string, share double")
    toks = F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)"))
    base = docs.select(F.col(key), F.col(group_col).alias("group"),
                       toks.cast("long").alias("n_tok"))
    counts = (base.groupBy("group")
              .agg(F.sum("n_tok").alias("group_tokens")))
    plan = (counts.join(F.broadcast(shares_df), "group", "left")
            .select("group", "group_tokens",
                    F.when(F.col("share").isNotNull()
                           & (F.col("group_tokens") > 0),
                           F.least(F.lit(1.0),
                                   F.col("share")
                                   * F.lit(float(token_budget))
                                   / F.col("group_tokens")))
                    .otherwise(F.lit(0.0)).alias("p_keep")))
    u01 = (F.conv(F.substring(
               F.md5(F.col(key).cast("string").cast("binary")), 1, 15),
               16, 10).cast("long") / F.lit(float(1 << 60)))
    return (base.join(F.broadcast(plan), "group")
            .select(key, "group", "n_tok", "group_tokens", "p_keep",
                    (u01 < F.col("p_keep")).alias("sampled")))


DEFAULT_BUCKET_LABELS = ("head", "middle", "tail")


def quality_buckets(docs: DataFrame, score_col: str,
                    lang_col: str = "lang", key: str = "doc_id",
                    n_buckets: int = 3,
                    labels: tuple[str, ...] = DEFAULT_BUCKET_LABELS,
                    algorithm: str = "exact") -> DataFrame:
    """CCNet-style per-language quality bucketing: within each language,
    rank documents by ``score_col`` (higher = better — pass a NEGATED
    perplexity or any quality score) and cut the ranking into
    ``n_buckets`` equal-count buckets. Bucket 1 ("head") is the best
    slice, the last ("tail") the worst — the head/middle/tail split
    CCNet uses to stratify Common-Crawl by LM perplexity so downstream
    sampling can weight clean text up without discarding the tail.

    Two algorithms, same output columns (key, lang, score, bucket,
    label):

    - ``exact``: ``ntile(n)`` over a window partitioned by language,
      ordered by (score desc, key) — a TOTAL order, so the assignment
      is deterministic and identical in Spark and DuckDB (ANSI ntile:
      the first ``rows % n`` buckets take the extra row). This is
      CCNet's own per-language sort; each language sorts independently
      across the cluster, so the shuffle is bounded by the largest
      single language, not the corpus.
    - ``approx``: per-language ``percentile_approx`` thresholds
      (one tiny lang-grain aggregate, broadcast back, map-only
      compare) — no global sort at all, the right plan at 10^12 docs
      where equal-count exactness is not worth a per-language sort.
      Boundary docs may land one bucket off their exact rank; counts
      are approximately equal. Same keep-everything contract.

    Scores must be non-null (guard upstream): engines disagree on
    where NULL sorts in a DESC window, so a null score would break the
    exact path's engine-identical claim.
    """
    if len(labels) != n_buckets:
        raise ValueError("labels must have n_buckets entries")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    score = F.col(score_col).cast("double")
    base = docs.select(F.col(key), F.col(lang_col).alias("lang"),
                       score.alias("score"))
    if n_buckets == 1:
        # degenerate split: everything is the single bucket (the approx
        # path would otherwise ask percentile_approx for zero quantiles)
        return base.select(key, "lang", "score",
                           F.lit(1).alias("bucket"),
                           F.lit(labels[0]).alias("label"))
    if algorithm == "exact":
        from pyspark.sql import Window
        w = (Window.partitionBy("lang")
             .orderBy(F.desc("score"), F.col(key)))
        out = base.withColumn("bucket", F.ntile(n_buckets).over(w))
    elif algorithm == "approx":
        qs = [i / n_buckets for i in range(1, n_buckets)]
        # descending cutpoints: bucket b = docs with score in
        # (cut[b], cut[b-1]]; percentile_approx on the NEGATED score
        # gives the descending quantiles directly
        cuts = (base.groupBy("lang")
                .agg(F.percentile_approx(-F.col("score"), qs, 10_000)
                     .alias("cuts")))
        out = base.join(F.broadcast(cuts), "lang")
        bucket = F.lit(n_buckets)
        for i in range(n_buckets - 1, 0, -1):
            bucket = F.when(-F.col("score") <= F.col("cuts")[i - 1],
                            F.lit(i)).otherwise(bucket)
        out = out.withColumn("bucket", bucket).drop("cuts")
    else:
        raise ValueError(f"unknown algorithm {algorithm!r}")
    label = F.element_at(F.array(*[F.lit(x) for x in labels]),
                         F.col("bucket"))
    return out.select(key, "lang", "score", "bucket",
                      label.alias("label"))
