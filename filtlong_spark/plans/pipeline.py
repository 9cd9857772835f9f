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

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..config import FilterConfig
from ..operators import budget as budget_op
from ..operators import ingest as ingest_op
from ..operators import normalize as normalize_op
from ..operators import output as output_op
from ..operators import refset as refset_op
from ..operators import score as score_op


@dataclass
class PipelineResult:
    kept: DataFrame        # survivors, ordered (warc_ts, url, child_start)
    reads2: DataFrame      # full post-scrub scored set with passed labels
    quarantine: DataFrame
    total_input_chars: int
    target: int | None
    scratch_dir: str = ""
    resumed: bool = False
    metrics: dict | None = None
    lang_rejected: DataFrame | None = None  # langid-gated docs (A2 analog)

    def unpersist(self):  # compat no-op (scratch is parquet-backed)
        return self


# cfg fields baked into the committed reads2 snapshot (anything that moves
# per-doc metrics, hard_passed, or the child set). Budget/weight fields are
# applied AFTER the snapshot, so changing them on resume is legal.
_SNAPSHOT_FIELDS = (
    "canonical_url_dedup", "near_dup_dedup", "line_dedup_min_df",
    "blocklist_hosts", "blocklist_words",
    "clf_threshold", "clf_weights",
    "window_size", "trim", "split", "pii_scrub", "mode", "vocab",
    "required_copies", "lm_threshold", "lm_min_count",
    "langid_enabled", "langid_expected",
    "min_length", "max_length", "min_mean_q", "min_window_q",
)


def _check_resume_config(cfg: FilterConfig, committed: dict) -> None:
    """Refuse to resume from a snapshot scored under a different config —
    silently reusing stale scores would mislabel every document. Budget /
    weight knobs may change freely (they run after the snapshot)."""
    def canon(v):
        return sorted(v) if isinstance(v, (frozenset, set, list, tuple)) else v
    diffs = [f for f in _SNAPSHOT_FIELDS
             if f in committed and canon(committed[f]) != canon(
                 getattr(cfg, f, None))]
    if diffs:
        from ..config import ConfigError
        raise ConfigError(
            "Error: cannot resume — checkpoint was scored with a different "
            f"config (mismatched fields: {', '.join(diffs)}); use a new "
            "checkpoint_dir or pass resume=False to re-score")


def _combine_stats(part_rows) -> dict:
    """Combine per-language-group aggregates into the global E1 stats.
    min/max/sum/count combine exactly; sigma comes from the moment sums
    and is consumed only by normalize()'s sigma<=0 degenerate check."""
    import math
    rows = [r for r in part_rows if r["n_docs"]]
    n = sum(r["n_docs"] for r in rows)
    if n == 0:
        return {"min_q": None, "max_q": None, "mu": None, "sigma": None,
                "passed_chars": 0}
    min_q = min(r["min_q"] for r in rows if r["min_q"] is not None)
    max_q = max(r["max_q"] for r in rows if r["max_q"] is not None)
    sum_q = sum(r["sum_q"] or 0.0 for r in rows)
    sum_q2 = sum(r["sum_q2"] or 0.0 for r in rows)
    mu = sum_q / n
    sigma = math.sqrt(max(sum_q2 / n - mu * mu, 0.0))
    passed = sum(int(r["passed_chars"] or 0) for r in rows)
    return {"min_q": min_q, "max_q": max_q, "mu": mu, "sigma": sigma,
            "passed_chars": passed}


def run_filter(spark: SparkSession, pages: DataFrame, cfg: FilterConfig,
               ref_pages: DataFrame | None = None,
               checkpoint_dir: str | None = None,
               resume: bool = True,
               blocklist_hosts_df: DataFrame | None = None) -> PipelineResult:
    """Run the full filter. ``checkpoint_dir``: where the scored post-scrub
    set is committed (parquet + lineage.json); pass the same dir again to
    RESUME — a committed run skips ingest+scoring entirely
    (north_rule: resumable from the last committed snapshot).
    ``blocklist_hosts_df``: optional one-column DataFrame(host) deny list
    for the blocklist stage when the list is too large for
    cfg.blocklist_hosts (UT1 scale); unioned with the config tuple."""
    cfg.validate()
    scratch = checkpoint_dir or output_op.new_scratch_dir()

    # ingest always runs — the source table is re-read at output time to
    # reattach survivor text (the reference's second input pass,
    # src/main.cpp:263-311); the committed snapshot holds metrics only
    ing = ingest_op.ingest(
        pages, canonical_url_dedup=cfg.canonical_url_dedup)
    quarantine = ing.quarantine

    def _line_clean(pages_df):
        """Line-level boilerplate dedup stage (cfg.line_dedup_min_df):
        runs on the SAME lineage in the scoring pass and the output
        text-reattach pass — deterministic, so both see identical
        cleaned text (the byte-identity contract holds for the cleaned
        corpus, which is what this stage defines as the corpus)."""
        if cfg.line_dedup_min_df is None:
            return pages_df
        from ..operators import dedup as dedup_op
        return dedup_op.line_clean_pages(pages_df, cfg.line_dedup_min_df)

    near_dup_dropped = None
    blocklist_dropped = None
    clf_dropped = None
    resumed = resume and output_op.is_committed(os.path.join(scratch, "reads2"))
    if resumed:
        output_op.verify_snapshot_chain(scratch)
        lineage = output_op.read_lineage(scratch) or {}
        _check_resume_config(cfg, lineage.get("config") or {})
        reads2 = spark.read.parquet(os.path.join(scratch, "reads2"))
        total_input_chars = lineage.get("total_input_chars", 0)
        near_dup_dropped = lineage.get("near_dup_dropped")
        blocklist_dropped = lineage.get("blocklist_dropped")
        clf_dropped = lineage.get("clf_dropped")
        # survivors reattach the line-CLEANED text; the near-dup drop
        # set needs no recompute (dropped docs were never scored, so the
        # inner label join below cannot resurrect them)
        src_pages = _line_clean(ing.valid)
    else:
        # raw input char total (src/main.cpp:89) — observed on the scoring
        # job instead of a separate input traversal
        obs = Observation()
        valid = ing.valid.observe(
            obs, F.sum(F.length("text")).alias("total_chars"),
            F.count(F.lit(1)).alias("n_docs"))
        # small inputs arrive as fewer splits than cores (one ~16 MB file
        # at bench SF) and would run the CPU-heavy Python scoring stage
        # on a single task; fan them out first. At corpus scale the
        # source has >> defaultParallelism splits, so this is a no-op —
        # no extra shuffle of text is ever paid where it would hurt.
        # The partition probe converts the plan to an RDD through py4j
        # (~0.15 s); repeated run_filter calls over the SAME pages
        # DataFrame (the bench's min-of-N loops) reuse the first
        # answer via an attribute on that object.
        par = spark.sparkContext.defaultParallelism
        nparts = getattr(pages, "_filtlong_src_nparts", None)
        if nparts is None:
            nparts = ing.valid.rdd.getNumPartitions()
            try:
                pages._filtlong_src_nparts = nparts
            except Exception:
                pass
        if nparts < par:
            valid = valid.repartition(par)

        # dedup stages (north_rule pipeline composition; all observe-
        # downstream, so total_input_chars stays the RAW pre-dedup
        # figure the budget is measured against — the reference's
        # target-vs-raw-input semantics, src/main.cpp:89,228-237):
        # 0. UT1-style deny-list gate runs FIRST — no dedup/scoring work
        #    is spent on blocklisted documents
        if cfg.blocklist_hosts or cfg.blocklist_words \
                or blocklist_hosts_df is not None:
            from ..operators import partitioning as part_op
            hosts_df = spark.createDataFrame(
                [(h,) for h in cfg.blocklist_hosts], "host string")
            if blocklist_hosts_df is not None:
                hosts_df = hosts_df.unionByName(
                    blocklist_hosts_df.toDF("host"))
            verdict = part_op.blocklist_gate(
                valid.withColumn("_bl_host",
                                 part_op.host_of(F.col("url"))),
                hosts_df, tuple(cfg.blocklist_words),
                host_col="_bl_host", key_col="url")
            # eager: the checkpoint action itself fires the raw-char
            # Observation with the full-input totals (a lazy one would
            # permanently poison it with an empty accumulator); the
            # count after it is a cheap cached-RDD count
            blocked_urls = (verdict.filter(~F.col("keep")).select("url")
                            .localCheckpoint(eager=True))
            blocklist_dropped = blocked_urls.count()
            quarantine = quarantine.unionByName(
                ing.valid.join(blocked_urls, "url")
                .withColumn("reason", F.lit("blocklisted")))
            valid = valid.join(blocked_urls, "url", "left_anti")
        # 1. line-level boilerplate removal rewrites text
        valid = _line_clean(valid)
        # 2. near-dup dedup quarantines whole documents before scoring
        if cfg.near_dup_dedup is not None:
            from ..operators import dedup as dedup_op
            nd = dedup_op.near_dup_url_labels(valid, cfg.near_dup_dedup)
            # the verdict table is url+bool — tiny next to the corpus —
            # and is consumed twice (quarantine + anti-join): pin it so
            # the banded-LSH pass runs once (eager, for the same
            # Observation-poisoning reason as the blocklist stage)
            dup_urls = (nd.filter(F.col("is_dup")).select("url")
                        .localCheckpoint(eager=True))
            near_dup_dropped = dup_urls.count()
            quarantine = quarantine.unionByName(
                ing.valid.join(dup_urls, "url").withColumn(
                    "reason",
                    F.lit(f"near_duplicate_{cfg.near_dup_dedup}")))
            valid = valid.join(dup_urls, "url", "left_anti")
        # 3. model-based quality gate (DCLM order: dedup -> classifier):
        #    linear logit over guarded-ratio features, weights folded
        #    into the plan as literals — one explode + hash agg + doc-
        #    grain join, no broadcast variable, no Python stage
        if cfg.clf_threshold is not None:
            from ..operators import classifier as clf_op
            w = (clf_op.weights_from_tuple(cfg.clf_weights)
                 if cfg.clf_weights else None)
            verdict = clf_op.quality_classifier(
                valid, sorted(cfg.vocab), weights=w,
                threshold=cfg.clf_threshold, key="url")
            # eager, for the same Observation-poisoning reason as the
            # blocklist stage above
            rejected = (verdict.filter(~F.col("keep")).select("url")
                        .localCheckpoint(eager=True))
            clf_dropped = rejected.count()
            quarantine = quarantine.unionByName(
                ing.valid.join(rejected, "url")
                .withColumn("reason", F.lit("classifier_rejected")))
            valid = valid.join(rejected, "url", "left_anti")

        lm_strategy, lm_tables = None, None
        if cfg.mode == "bigram_lm":
            from ..operators import lm as lm_op
            lm_strategy = cfg.lm_strategy
            if lm_strategy == "auto":
                # planning step: broadcast iff the pruned model fits the
                # budget (one count job over the build-side ref corpus);
                # the tables it builds are persisted and REUSED by the
                # chosen path below — the model is only counted once
                lm_strategy, lm_tables = lm_op.plan_lm(ref_pages, cfg)
            elif ref_pages is not None:
                lm_tables = lm_op.lm_count_tables(ref_pages,
                                                  cfg.lm_min_count)
        try:
            if lm_strategy == "distributed":
                # LM scale path: token-grain Catalyst joins against the
                # count tables — the model is never collected anywhere
                scored = lm_op.score_and_scrub_distributed(
                    spark, valid, cfg, ref_pages, tables=lm_tables)
            else:
                accepted_bc = refset_op.build_broadcast(
                    spark, cfg, ref_pages, lm_tables=lm_tables)
                scored = score_op.score_and_scrub(valid, cfg, accepted_bc)
            reads2, _ = output_op.checkpoint(
                scored, spark, os.path.join(scratch, "reads2"),
                resume=False)
        finally:
            if lm_tables is not None:
                # the committed snapshot is materialized (or the job
                # failed) — either way the cached count tables must not
                # stay pinned in executor storage
                lm_tables.release()
        # survivors reattach text from the post-dedup cleaned lineage
        # (identical plan to what was scored; the observation re-fires
        # harmlessly on the output job)
        src_pages = valid
        try:
            total_input_chars = obs.get["total_chars"] or 0
        except Exception:
            # an all-empty input lets PropagateEmptyRelation collapse the
            # observed subtree (joins downstream), so the CollectMetrics
            # node never runs and Observation.get raises — zero docs means
            # zero chars
            total_input_chars = 0

    # langid gate (A2 analog): rejected docs never enter normalization
    lang_rejected = reads2.filter(~F.col("lang_ok"))
    reads2 = reads2.filter(F.col("lang_ok"))

    # E1 stats + the budget's passed-chars sum + the per-language-partition
    # lineage counters: ONE aggregate job over the committed set (grouped
    # by lang_pred — a handful of rows — then combined driver-side;
    # column-pruned parquet read). min/max/sums combine exactly across
    # groups; sigma is derived from (sum, sum_sq, n) and only ever feeds
    # the sigma<=0 degenerate check, never a score (normalize() scales by
    # min/max — the closed form of the z-score scaling).
    part_rows = (reads2.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("chars"),
        F.sum(F.when(F.col("hard_passed"), 1).otherwise(0))
        .alias("hard_passed_docs"),
        F.min("mean_q").alias("min_q"), F.max("mean_q").alias("max_q"),
        F.sum("mean_q").alias("sum_q"),
        F.sum(F.col("mean_q") * F.col("mean_q")).alias("sum_q2"),
        F.sum(F.when(F.col("hard_passed"), F.col("n_chars")))
        .alias("passed_chars"),
    ).collect())
    stats = _combine_stats(part_rows)

    normalized = normalize_op.normalize(reads2, cfg, stats=stats)
    labeled = budget_op.apply_budget(normalized, cfg, total_input_chars,
                                     passed_chars=stats["passed_chars"])
    target = budget_op.compute_target(cfg, total_input_chars)

    metrics = {
        "total_input_chars": int(total_input_chars),
        "post_scrub_docs": None,  # filled by consumers if they count
        "passed_chars_pre_budget": int(stats["passed_chars"] or 0),
        "target": target,
        "resumed": resumed,
        # near-dup quarantine lineage counter (None when the stage is
        # off; on resume, read back from the committed lineage)
        "near_dup_dropped": near_dup_dropped,
        "blocklist_dropped": blocklist_dropped,
        "clf_dropped": clf_dropped,
        "config": {k: (list(v) if isinstance(v, frozenset) else v)
                   for k, v in cfg.__dict__.items()},
    }
    if not resumed:
        # per-partition lineage rows (north_rule): counters per language
        # partition of the committed snapshot — already computed by the
        # shared stats job above (on a cluster these are the Iceberg
        # partition-level counters)
        metrics["partitions"] = {
            str(r["lang_pred"]): {"n_docs": r["n_docs"],
                                  "chars": int(r["chars"] or 0),
                                  "hard_passed_docs": int(
                                      r["hard_passed_docs"] or 0)}
            for r in part_rows}
        output_op.write_lineage(scratch, metrics)

    # output: reattach text by joining labels back to the source table —
    # the labels side is small (metrics only) so AQE turns this into a
    # broadcast join and the text column never shuffles; child text is a
    # substring of the parent (byte-identical requirement)
    labels = labeled.filter(F.col("passed"))
    src = src_pages.select(F.col("url").alias("parent_url"),
                           "warc_ts", "lang", "text")
    kept = (labels.join(src, "parent_url")
            .withColumn(
                "text",
                F.when(F.col("is_child"),
                       F.substring(F.col("text"), F.col("child_start") + 1,
                                   F.col("child_end") - F.col("child_start")))
                .otherwise(F.col("text"))))
    # survivor order = input order, children in span order (the reference's
    # output contract, src/main.cpp:284-309). Keyed on parent_url, NOT the
    # child url: sibling children share warc_ts and child names sort
    # lexicographically ("_15-19" < "_4-8"), so url ordering would invert
    # digit-crossing child starts.
    order_cols = ("warc_ts", "parent_url", "child_start")
    if cfg.output_ordering == "partitioned":
        # 100 TB path: no global sort — range-partition on the leading keys
        # and sort within each output task (what an Iceberg write task does)
        kept = (kept.repartitionByRange(*order_cols[:2])
                .sortWithinPartitions(*order_cols))
    else:
        kept = kept.orderBy(*order_cols)
    return PipelineResult(kept=kept, reads2=labeled, quarantine=quarantine,
                          total_input_chars=total_input_chars, target=target,
                          scratch_dir=scratch, resumed=resumed,
                          metrics=metrics, lang_rejected=lang_rejected)
