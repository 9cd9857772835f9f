"""Deduplication operators for a training-data pipeline.

Beyond the reference's scope (it aborts on duplicate names,
src/main.cpp:113-117) — these are the dedup stages a 100 TB corpus needs:

- exact: normalize -> md5 -> groupBy (one shuffle on the hash; at scale,
  pre-partition by hash prefix and the agg is map-side-heavy)
- minhash + LSH: shingle -> k md5-permutation minhashes -> band -> bucket
  join. All JVM-side (explode + groupBy min), no Python.
- simhash: 16-bit weighted-bit fingerprint from token md5s
- n-gram Jaccard: shared-shingle candidate join + exact Jaccard
- embedding cosine near-dup lives in operators/similarity.py

Every operator here is mirrored by an exact DuckDB SQL oracle in
__spark_entry__.py (same md5-derived hashes -> identical values in both
engines, no float ambiguity except cosine, which is rounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.textstats import token_hash

NORM_EXPR = "replace(text, ' dup', '')"  # testdata near-dup normalizer


def shingles_col(n: int = 3):
    """Word n-gram shingles as strings (space-joined)."""
    toks = F.expr(r"regexp_extract_all(text, '\\S+', 0)")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + k) for k in range(n)]))


def exact_dupes(docs: DataFrame, key_expr: str = NORM_EXPR) -> DataFrame:
    """Exact dedup groups: (text_hash, n_docs, keep_doc_id). keep = min id
    (first writer wins); groups of 1 are excluded (nothing to dedupe)."""
    return (docs
            .withColumn("text_hash", F.md5(F.expr(key_expr).cast("binary")))
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_docs"),
                 F.min("doc_id").alias("keep_doc_id"))
            .filter(F.col("n_docs") > 1))


N_HASHES = 8
BAND_ROWS = 2  # 4 bands x 2 rows


def minhash_signatures(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """(doc_id, h (0..7), minhash): minhash_i = lexicographic min over the
    doc's shingles of md5(i || ':' || shingle). Explode + groupBy min —
    partial aggregation does the heavy lifting map-side."""
    sh = (docs.select("doc_id",
                      F.explode(F.array_distinct(shingles_col(shingle_n)))
                      .alias("shingle")))
    perms = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1))).alias("h"),
        F.col("shingle"))
    hashed = perms.withColumn(
        "hval",
        F.md5(F.concat_ws(":", F.col("h").cast("string"), F.col("shingle"))
              .cast("binary")))
    return (hashed.groupBy("doc_id", "h")
            .agg(F.min("hval").alias("minhash")))


def lsh_candidate_pairs(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    """LSH banding: band key = concat of the band's minhashes; docs sharing
    a band bucket become candidate pairs (a < b). The join is on band_key —
    a self-equi-join on a high-cardinality key, shuffle-partitioned, no
    cross product."""
    sig = minhash_signatures(docs, shingle_n)
    bands = (sig.withColumn("band", F.floor(F.col("h") / BAND_ROWS))
             .groupBy("doc_id", "band")
             .agg(F.concat_ws("|", F.sort_array(F.collect_list(
                 F.concat_ws(":", F.col("h").cast("string"), "minhash"))))
                  .alias("band_key")))
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.band_key") == F.col("b.band_key"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("doc_a"),
                     F.col("b.doc_id").alias("doc_b"))
             .distinct())
    return pairs


def jaccard_pairs(docs: DataFrame, shingle_n: int = 5,
                  threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard over shared-shingle candidates:
    (doc_a, doc_b, inter, union, jaccard >= threshold). Candidate
    generation via shingle equi-join (docs with no shared shingle never
    pair). Jaccard kept as an exact ratio of integers."""
    sh = (docs.select("doc_id",
                      F.explode(F.array_distinct(shingles_col(shingle_n)))
                      .alias("shingle")))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    out = (inter
           .join(sizes.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("n_sh", "n_a"), "doc_a")
           .join(sizes.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("n_sh", "n_b"), "doc_b")
           .withColumn("jaccard",
                       F.col("inter").cast("double")
                       / (F.col("n_a") + F.col("n_b") - F.col("inter")))
           .filter(F.col("jaccard") >= threshold)
           .select("doc_a", "doc_b", "inter", "jaccard"))
    return out


SIMHASH_BITS = 16


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 16-bit simhash — bit b of md5's first 16 bits per
    token votes +1/-1 weighted by token multiplicity; fingerprint bit = 1
    iff the vote sum > 0. Explode tokens x bits stays JVM-side."""
    toks = docs.select(
        "doc_id",
        F.explode(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).alias("tok"))
    h16 = F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 4),
                 16, 10).cast("long")
    bits = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b"),
        h16.alias("h16"))
    # column-valued shift counts need SQL shiftright/shiftleft (the Python
    # wrappers only take int literals)
    votes = (bits.withColumn(
        "vote", F.expr("CASE WHEN (shiftright(h16, b) & 1) = 1 "
                       "THEN 1 ELSE -1 END"))
        .groupBy("doc_id", "b").agg(F.sum("vote").alias("v")))
    return (votes.withColumn(
        "bitval", F.expr("CASE WHEN v > 0 THEN shiftleft(1L, b) ELSE 0L END"))
        .groupBy("doc_id").agg(F.sum("bitval").alias("simhash")))
