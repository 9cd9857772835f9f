"""End-to-end filter pipeline (SURVEY.md §3 query lifecycle).

Stage order mirrors the reference exactly (src/main.cpp:40-311):

  ingest/validate -> [refset build] -> score (+spans) -> explode children
  -> normalize over the POST-scrub set -> budget (target measured against
  RAW input chars) -> ordered survivors

Driver <-> executor boundaries: the driver holds config, the broadcast
accepted set, 4 normalization scalars, the raw-input char total, and the
budget histogram; executors run the scoring/scrub UDFs and all columnar
work. Shuffles: refset groupBy (only in refset mode), the stats aggregate
(partial+final, cheap), the budget histogram aggregate, and the final
orderBy — there is NO global sort of the data in approx mode.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import FilterConfig
from ..operators import budget as budget_op
from ..operators import ingest as ingest_op
from ..operators import normalize as normalize_op
from ..operators import refset as refset_op
from ..operators import score as score_op
from ..operators import scrub as scrub_op


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
    ing = ingest_op.ingest(pages)
    valid = ing.valid

    # raw input char total (src/main.cpp:89) — counted on the validated
    # input BEFORE scrub/filters; single cheap aggregate
    total_input_chars = (valid.agg(F.sum(F.length("text"))).collect()[0][0]) or 0

    accepted_bc = refset_op.build_broadcast(spark, cfg, ref_pages)

    scored = score_op.score_pandas(valid, cfg, accepted_bc)

    if cfg.trim or cfg.split is not None:
        reads2 = scrub_op.explode_children(scored, cfg, accepted_bc)
    else:
        reads2 = (scored.withColumn("child_start", F.lit(0))
                  .withColumn("is_child", F.lit(False)))

    # cache: normalize/budget/output each traverse reads2; without this the
    # pandas-UDF scoring would re-run per action
    reads2 = reads2.persist()

    normalized = normalize_op.normalize(reads2, cfg)
    labeled = budget_op.apply_budget(normalized, cfg, total_input_chars)
    target = budget_op.compute_target(cfg, total_input_chars)

    kept = (labeled.filter(F.col("passed"))
            .orderBy("warc_ts", "url", "child_start"))
    return PipelineResult(kept=kept, reads2=labeled, quarantine=ing.quarantine,
                          total_input_chars=total_input_chars, target=target)
