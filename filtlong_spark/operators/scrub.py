"""Scrub stage: trim/split -> child documents (SURVEY.md §2G: G1-G6).

The scoring UDF already computed good child char-spans per parent
(core.scrub_spans <- src/read.cpp:75-143). This operator:

- G5: ``posexplode``s the spans into child rows, extracts the child text
  with ``substring`` (byte-identical requirement: substring on the same
  UTF-8 string both engines), names children ``{url}_{start+1}-{end}``
  (src/read.cpp:135-136), and fully RE-SCORES each child (children get
  their own mean/window quality and hard-threshold evaluation,
  src/read.cpp:131-141);
- G6: children REPLACE parents (src/main.cpp:136-147): parents with
  scrubbed=true never reach the output set.

One level of recursion only, like the reference: children cannot acquire
new bad ranges (their spans are all-good by construction except trim
boundary spaces, and the reference likewise does not re-scrub children).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import FilterConfig
from . import score as score_op


def explode_children(scored: DataFrame, cfg: FilterConfig, accepted_bc) -> DataFrame:
    """scored (parents with child_spans/scrubbed) -> the post-scrub set
    'reads2': untouched parents + re-scored children."""
    parents = (scored.filter(~F.col("scrubbed"))
               .withColumn("child_start", F.lit(0))
               .withColumn("is_child", F.lit(False)))

    changed = scored.filter(F.col("scrubbed"))
    children = (changed
                .select("url", "warc_ts", "lang", "text",
                        F.explode("child_spans").alias("span"))
                .withColumn("child_start", F.col("span.start"))
                .withColumn("child_end", F.col("span.end"))
                # substring is 1-based; child naming {url}_{start+1}-{end}
                .withColumn("child_url",
                            F.concat_ws("", F.col("url"), F.lit("_"),
                                        (F.col("child_start") + 1).cast("string"),
                                        F.lit("-"),
                                        F.col("child_end").cast("string")))
                .withColumn("text",
                            F.substring(F.col("text"),
                                        F.col("child_start") + 1,
                                        F.col("child_end") - F.col("child_start")))
                .drop("span", "url")
                .withColumnRenamed("child_url", "url"))
    # children are fully re-scored; re-scrub is disabled (one level only)
    child_cfg = FilterConfig(**{**cfg.__dict__, "trim": False, "split": None})
    children = score_op.score_pandas(
        children.withColumn("html", F.lit(None).cast("binary")),
        child_cfg, accepted_bc)
    children = (children.withColumn("is_child", F.lit(True))
                .drop("child_end"))

    cols = ["url", "warc_ts", "lang", "text", "html",
            "n_chars", "n_tokens", "mean_q", "window_q", "ratio",
            "child_spans", "scrubbed", "length_s", "hard_passed",
            "child_start", "is_child"]
    return parents.select(*cols).unionByName(children.select(*cols))
