"""Global keep-budget filter (SURVEY.md §2F: F1-F4).

Reference semantics (src/main.cpp:218-261): sort by final score desc, keep
hard-passed docs while cumulative-chars-BEFORE-this-doc < target (greedy
prefix; the last kept doc may overshoot — test/test_sort.py:218-227).
Deterministic tiebreak = url asc (reference uses unstable std::sort).

Two physical strategies:

- exact: window cumsum over a single global ordering. Correct at any SF,
  but the Window has one partition -> one-task bottleneck. This is the
  small-scale correctness oracle.
- approx: the 100 TB path (the north_star's "approxQuantile + broadcast
  threshold instead of a global sort", rendered exactly rather than
  approximately). A score HISTOGRAM (one groupBy over B buckets,
  partial+final agg -> B rows on the driver) finds the boundary bucket;
  docs strictly above it pass outright; the exact cumsum runs only WITHIN
  the boundary bucket (tiny). One extra narrow job instead of a global
  sort. With enough buckets the result is IDENTICAL to exact (asserted in
  tests), because inside the boundary bucket we fall back to the exact
  rule with the global ordering offset carried in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import FilterConfig

N_BUCKETS = 100_000  # final_score is in [0,100] -> bucket width 1e-3


def compute_target(cfg: FilterConfig, total_input_chars: int) -> int | None:
    """F1 (src/main.cpp:228-237). total_input_chars is the RAW input total
    — counted before scrub and before hard filters (src/main.cpp:89)."""
    if cfg.target_chars is None and cfg.keep_percent is None:
        return None
    target = cfg.target_chars if cfg.target_chars is not None else (1 << 62)
    if cfg.keep_percent is not None:
        target = min(target, int((cfg.keep_percent / 100.0) * total_input_chars))
    return target


def apply_budget(reads2: DataFrame, cfg: FilterConfig,
                 total_input_chars: int,
                 passed_chars: int | None = None) -> DataFrame:
    """Adds the final ``passed`` column. reads2 must carry final_score,
    n_chars, hard_passed, url. ``passed_chars`` may be precomputed (the
    pipeline piggybacks it on the normalization stats job)."""
    target = compute_target(cfg, total_input_chars)
    if target is None:
        return reads2.withColumn("passed", F.col("hard_passed"))

    # F2 early exits (src/main.cpp:239-244) — driver-side guards that skip
    # the expensive job entirely
    if target >= total_input_chars:
        return reads2.withColumn("passed", F.col("hard_passed"))
    if passed_chars is None:
        passed_chars = (reads2.filter("hard_passed")
                        .agg(F.sum("n_chars")).collect()[0][0]) or 0
    if target >= passed_chars:
        return reads2.withColumn("passed", F.col("hard_passed"))

    if cfg.budget_algorithm == "exact":
        return _exact(reads2, target)
    return _approx(reads2, target)


def _exact(reads2: DataFrame, target: int) -> DataFrame:
    w = (Window.orderBy(F.desc("final_score"), F.asc("url"))
         .rowsBetween(Window.unboundedPreceding, -1))
    cum_before = F.coalesce(
        F.sum(F.when(F.col("hard_passed"), F.col("n_chars"))).over(w), F.lit(0))
    # cum-before-check semantics incl. overshoot (src/main.cpp:250-257);
    # budget-failed docs inflating cum_before doesn't matter: keep is
    # monotone in the ordering, so everything after the first failure
    # fails anyway
    return reads2.withColumn(
        "passed", F.col("hard_passed") & (cum_before < F.lit(target)))


def _approx(reads2: DataFrame, target: int) -> DataFrame:
    """Histogram threshold + boundary-bucket exact refinement. Result is
    identical to _exact: buckets above the boundary are exactly the docs
    whose cum_before can't reach the target; within the boundary bucket the
    exact rule runs with the carried-in offset."""
    spark = reads2.sparkSession
    eligible = F.col("hard_passed")
    bucket = F.when(eligible,
                    F.floor(F.col("final_score") * (N_BUCKETS / 100.0))
                    .cast("long"))
    hist = (reads2.withColumn("_b", bucket)
            .filter(F.col("_b").isNotNull())
            .groupBy("_b").agg(F.sum("n_chars").alias("chars"))
            .collect())
    hist.sort(key=lambda r: -r["_b"])
    cum = 0
    boundary_bucket = None
    cum_above_boundary = 0
    for r in hist:
        if cum >= target:
            break
        boundary_bucket = r["_b"]
        cum_above_boundary = cum
        cum += r["chars"]
    if boundary_bucket is None:
        # no eligible docs at all
        return reads2.withColumn("passed", F.lit(False))

    df = reads2.withColumn("_b", bucket)
    # within the boundary bucket only: exact ordering with carried offset.
    # The Window is global-ordered but the frame only ever contains rows of
    # one bucket (filtered below), so the one-task window sees a tiny slice.
    w = (Window.orderBy(F.desc("final_score"), F.asc("url"))
         .rowsBetween(Window.unboundedPreceding, -1))
    in_boundary = F.col("_b") == F.lit(boundary_bucket)
    boundary = (df.filter(eligible & in_boundary)
                .withColumn("_cum_in", F.coalesce(F.sum("n_chars").over(w), F.lit(0)))
                .withColumn("_pass_b",
                            (F.lit(cum_above_boundary) + F.col("_cum_in"))
                            < F.lit(target))
                .select("url", "_pass_b"))
    # no broadcast hint: the boundary bucket is usually tiny (AQE will pick
    # broadcast), but degenerates to the whole dataset when scores tie
    # en masse — let AQE decide instead of forcing an OOM
    out = (df.join(boundary, "url", "left")
           .withColumn(
               "passed",
               F.when(~eligible, F.lit(False))
                .when(F.col("_b") > F.lit(boundary_bucket), F.lit(True))
                .when(in_boundary, F.coalesce(F.col("_pass_b"), F.lit(False)))
                .otherwise(F.lit(False)))
           .drop("_b", "_pass_b"))
    return out
