"""Per-document scoring stage (SURVEY.md §2C: C1-C6 + D1).

Two implementations:

- ``score_pandas`` — the full pipeline path: one Arrow-batched pandas UDF
  computes per-token painting, mean/window quality, and (when scrubbing)
  child spans; everything else (length score, hard rules) stays in
  whole-stage codegen.
- ``quality_catalyst`` — a pure-Catalyst mean-quality path (explode tokens
  -> broadcast join accepted set -> re-aggregate). No Python at all; used
  by the driver-facing oracle queries and as the spill path when the
  accepted set is too big to broadcast as a variable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import FilterConfig
from ..functions import scoring


def score_pandas(pages: DataFrame, cfg: FilterConfig, accepted_bc) -> DataFrame:
    """pages(url, text, ...) -> + n_chars, n_tokens, mean_q, window_q,
    ratio, child_spans, scrubbed, length_s, hard_passed."""
    udf = scoring.make_score_udf(accepted_bc, cfg)
    df = pages.withColumn("_m", udf(F.col("text"))).select("*", "_m.*").drop("_m")
    df = df.withColumn("length_s", scoring.length_score_col(F.col("n_chars")))
    return df.withColumn("hard_passed", scoring.hard_pass_col(cfg))


def score_and_scrub(pages: DataFrame, cfg: FilterConfig, accepted_bc) -> DataFrame:
    """The pipeline's fused scoring stage: one mapInPandas pass emits the
    post-scrub record set ('reads2') directly — scored parents, or fully
    re-scored children replacing scrubbed parents (src/read.cpp:25-143 +
    src/main.cpp:136-147 in a single narrow stage, no shuffle)."""
    mapper, schema = scoring.make_reads2_mapper(accepted_bc, cfg)
    reads2 = pages.select("url", "text").mapInPandas(mapper, schema=schema)
    reads2 = reads2.withColumn("length_s",
                               scoring.length_score_col(F.col("n_chars")))
    return reads2.withColumn("hard_passed", scoring.hard_pass_col(cfg))


def quality_catalyst(pages: DataFrame, accepted: DataFrame,
                     doc_key: str = "url") -> DataFrame:
    """Mean quality via explode + broadcast semi-join + re-agg, fully
    JVM-side. Returns (doc_key, n_tokens, good_tokens, mean_q).

    The broadcast join is the row-grain rendering of the reference's
    per-base set probe (src/kmers.cpp:170-172)."""
    toks = pages.select(
        F.col(doc_key),
        F.explode(F.expr(scoring_tokenize_expr())).alias("token"))
    # no broadcast hint on purpose: this IS the spill path for accepted
    # sets too big to broadcast — AQE broadcasts when the set is small and
    # falls back to a shuffle join when it isn't (forcing the hint would
    # OOM exactly in the case this path exists for)
    acc = (accepted.select("token").distinct()
           .withColumn("_hit", F.lit(1)))
    joined = toks.join(acc, "token", "left")
    return (joined.groupBy(doc_key)
            .agg(F.count("*").alias("n_tokens"),
                 F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("good_tokens"))
            .withColumn("mean_q",
                        100.0 * F.col("good_tokens") / F.col("n_tokens")))


def scoring_tokenize_expr() -> str:
    return r"regexp_extract_all(text, '\\S+', 0)"
