"""End-to-end filter pipeline (SURVEY.md §3 query lifecycle).

Stage order mirrors the reference exactly (src/main.cpp:40-311):

  ingest/validate -> [refset build] -> fused score+scrub (one mapInPandas
  pass emitting the post-scrub set) -> normalize over the POST-scrub set
  -> budget (target measured against RAW input chars) -> ordered survivors

Physical plan discipline (the 100 TB posture):
- ONE Python stage total (the fused scorer); everything else is columnar.
- total raw input chars ride an Observation on the scoring job — no
  separate input traversal.
- E1 stats + the budget's passed-chars sum share ONE aggregate job over
  the cached post-scrub set.
- approx budget adds one histogram aggregate + a boundary-bucket-only
  window; there is NO global sort of the data.
- cached-plan AQE is enabled so the persisted set coalesces to sane
  partition counts (persist otherwise pins the raw shuffle partitioning).

Job count: 1 (materialize+stats+observation) + [budget: 1 histogram +
boundary] + the consumer's action.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..config import FilterConfig
from ..operators import budget as budget_op
from ..operators import ingest as ingest_op
from ..operators import normalize as normalize_op
from ..operators import refset as refset_op
from ..operators import score as score_op


@dataclass
class PipelineResult:
    kept: DataFrame        # survivors, ordered (warc_ts, url, child_start)
    reads2: DataFrame      # full post-scrub scored set with passed labels
    quarantine: DataFrame
    total_input_chars: int
    target: int | None


def run_filter(spark: SparkSession, pages: DataFrame, cfg: FilterConfig,
               ref_pages: DataFrame | None = None) -> PipelineResult:
    cfg.validate()
    try:
        # without this, persist() pins the pre-AQE shuffle partitioning and
        # every cached read fans out to shuffle.partitions tiny tasks
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true")
    except Exception:
        pass

    ing = ingest_op.ingest(pages)

    # raw input char total (src/main.cpp:89) — observed on the scoring job
    # instead of a separate traversal
    obs = Observation("raw_input")
    valid = ing.valid.observe(
        obs, F.sum(F.length("text")).alias("total_chars"),
        F.count(F.lit(1)).alias("n_docs"))

    accepted_bc = refset_op.build_broadcast(spark, cfg, ref_pages)

    reads2 = score_op.score_and_scrub(valid, cfg, accepted_bc).persist()

    # one job: materializes the cache, fills the observation, and computes
    # E1 stats + the budget's passed-chars sum together
    stats = reads2.agg(*normalize_op.stats_aggs()).collect()[0]
    total_input_chars = obs.get["total_chars"] or 0

    normalized = normalize_op.normalize(reads2, cfg, stats=stats)
    labeled = budget_op.apply_budget(normalized, cfg, total_input_chars,
                                     passed_chars=stats["passed_chars"])
    target = budget_op.compute_target(cfg, total_input_chars)

    kept = (labeled.filter(F.col("passed"))
            .orderBy("warc_ts", "url", "child_start"))
    return PipelineResult(kept=kept, reads2=labeled, quarantine=ing.quarantine,
                          total_input_chars=total_input_chars, target=target)
