"""Global normalization (SURVEY.md §2E: E1-E3; reference src/main.cpp:169-212).

E1 aggregates 4 scalars over the post-scrub set (cheap partial+final hash
agg -> 4 numbers on the driver, exactly the reference's two passes over
reads2). E2/E3/C6 are then pure column expressions with the scalars inlined
as literals — no shuffle, stays in whole-stage codegen.

sigma == 0 policy (reference NaNs, src/main.cpp:186-207): every doc gets
mean_q_score = 50.0 (FIXTURES.md F7).
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf resolves 'pd.Series' hints here

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import FilterConfig


def stats_aggs():
    """E1 aggregates + the budget's passed-chars sum (one shared job)."""
    return [
        F.min("mean_q").alias("min_q"), F.max("mean_q").alias("max_q"),
        F.mean("mean_q").alias("mu"),
        F.coalesce(F.stddev_pop("mean_q"), F.lit(0.0)).alias("sigma"),
        F.coalesce(F.sum(F.when(F.col("hard_passed"), F.col("n_chars"))),
                   F.lit(0)).alias("passed_chars"),
    ]


def normalize(reads2: DataFrame, cfg: FilterConfig, stats=None) -> DataFrame:
    """``stats`` may be precomputed (the pipeline piggybacks the E1
    aggregate and the budget's passed-chars sum on one job)."""
    if stats is None:
        stats = reads2.agg(*stats_aggs()).collect()[0]
    min_q, max_q, sigma = stats["min_q"], stats["max_q"], stats["sigma"]

    if (min_q is None or max_q is None or sigma is None
            or sigma <= 0.0 or max_q <= min_q):
        mean_q_score = F.lit(50.0)
    else:
        # closed form of the z-score scaling (src/main.cpp:198-201):
        # 100*(z - z_min)/(z_max - z_min) == 100*(q - min)/(max - min)
        mean_q_score = (100.0 * (F.col("mean_q") - F.lit(min_q))
                        / F.lit(max_q - min_q))

    df = reads2.withColumn("mean_q_score", mean_q_score)
    df = df.withColumn("window_q_score", F.col("mean_q_score") * F.col("ratio"))

    wl, wq, ww = cfg.length_weight, cfg.mean_q_weight, cfg.window_q_weight
    if wl == 1.0 and wq == 1.0:
        # sqrt is IEEE-correctly-rounded on both JVM and CPython -> the
        # default-weight final score is bit-identical to the oracle's
        g = F.sqrt(F.col("length_s") * F.col("mean_q_score"))
        wf = ww / (wl + wq + ww)
        return df.withColumn(
            "final_score", g * (F.lit(1.0 - wf) + F.col("ratio") * F.lit(wf)))

    # non-default weights need pow, and JVM pow is only 1-ulp-accurate vs
    # libm — enough to flip a keep/drop at an exact budget tie. Route the
    # (rare) weighted path through the SHARED Python kernel so scores are
    # bit-identical to the oracle; it runs over three small double
    # columns, not the text.
    from .. import core
    from ..functions.scoring import _register_self_contained_pickling
    _register_self_contained_pickling()

    @F.pandas_udf("double")
    def weighted_fs(length_s: pd.Series, mqs: pd.Series,
                    ratio: pd.Series) -> pd.Series:
        return pd.Series([core.final_score(ls, m, r, wl, wq, ww)
                          for ls, m, r in zip(length_s, mqs, ratio)],
                         dtype="float64")

    return df.withColumn(
        "final_score",
        weighted_fs(F.col("length_s"), F.col("mean_q_score"),
                    F.col("ratio")))
