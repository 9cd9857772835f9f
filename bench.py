"""Benchmark harness.

Runs the headline pipeline + representative operator queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

--scaling: run the headline job at local[8] and local[32] (fresh JVM each,
via subprocess) on the same input and report throughput at both plus the
scaling efficiency — the sandbox proxy for N vs 4N executors required by
BASELINE.json's north_rule.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# representative operator queries (from __spark_entry__.queries())
BENCH_QUERIES = [
    "hard_rules", "window_quality", "final_score", "keep_budget",
    "refset_quality", "scrub_children", "langid", "quality_heuristics",
    "fingerprint", "dedup_exact", "dedup_minhash", "dedup_lsh_pairs",
    "simhash", "ann_cosine",
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def build_session(cpus: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder
            .master(f"local[{cpus}]")
            .appName("filtlong_spark_bench")
            .config("spark.sql.shuffle.partitions", str(cpus))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                    "true")
            # small heap on purpose: 16g+ heaps show sporadic multi-10s
            # allocation/GC stalls in this container, and bench-SF data is
            # tiny; -Xms=-Xmx avoids lazy heap growth mid-run
            .config("spark.driver.memory", os.environ.get("BENCH_DRIVER_MEM", "6g"))
            # codegen emits classes per query; the default ~240m code cache
            # fills mid-suite, JIT disables, and later queries run
            # interpreted 10-100x slower (the "random" stalls)
            .config("spark.driver.extraJavaOptions",
                    f"-Xms{os.environ.get('BENCH_DRIVER_MEM', '6g')} "
                    "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing")
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.ui.enabled", "false")
            .getOrCreate())


def force(df) -> int:
    """Force full computation (incl. sorts) without driver collect."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_pipeline(spark, sf_dir: str) -> dict:
    """Headline: full quality-filter pipeline (langid-gate shape, scoring,
    scrub, normalize, approx budget) over the documents table mapped to the
    input_hint page shape."""
    from filtlong_spark import FilterConfig
    from filtlong_spark import fixtures as fx
    from filtlong_spark.plans.pipeline import run_filter
    from filtlong_spark.sources import tables

    pages = tables.documents_as_pages(spark, sf_dir)
    n_docs = pages.count()
    cfg = FilterConfig(min_length=100, keep_percent=80.0, trim=True, split=3,
                       window_size=50, mode="intrinsic",
                       vocab=frozenset(fx.VOCAB), budget_algorithm="approx")
    t0 = time.time()
    res = run_filter(spark, pages, cfg)
    kept = res.kept.count()
    dt = time.time() - t0
    res.reads2.unpersist()
    return {"pipeline_sec": dt, "n_docs": n_docs, "kept": kept,
            "docs_per_sec": n_docs / dt}


def run_bench(cpus: int = CPUS, sf_dir: str = SF_DIR) -> dict:
    t_start = time.time()
    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    startup = time.time() - t_start

    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()

    head = run_pipeline(spark, sf_dir)

    per_query = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        per_query[name] = round(time.time() - t0, 3)

    total = head["pipeline_sec"] + sum(per_query.values())
    out = {
        "metric": "filter_pipeline+operator_suite_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {"pipeline": round(head["pipeline_sec"], 3), **per_query},
        "sf": _sf_from_dir(sf_dir),
        "docs": head["n_docs"],
        "kept": head["kept"],
        "docs_per_sec": round(head["docs_per_sec"], 1),
        "cpus": cpus,
        "startup_sec": round(startup, 1),
    }
    spark.stop()
    return out


def run_scaling() -> None:
    """Same headline job at local[8] vs local[32] (fresh JVM each)."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_SF_DIR=SF_DIR, BENCH_PIPELINE_ONLY="1")
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8 = results[8]["docs_per_sec"]
    t32 = results[32]["docs_per_sec"]
    eff = (t32 / t8) / 4.0
    print(json.dumps({
        "scaling": {"local8_docs_per_sec": t8, "local32_docs_per_sec": t32,
                    "speedup_8_to_32": round(t32 / t8, 3),
                    "efficiency_n_to_4n": round(eff, 3)},
        "sf": _sf_from_dir(SF_DIR)}))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif os.environ.get("BENCH_PIPELINE_ONLY"):
        spark = build_session(CPUS)
        spark.sparkContext.setLogLevel("ERROR")
        head = run_pipeline(spark, SF_DIR)
        print(json.dumps({"docs_per_sec": head["docs_per_sec"],
                          "pipeline_sec": head["pipeline_sec"],
                          "docs": head["n_docs"], "cpus": CPUS}))
        spark.stop()
    else:
        print(json.dumps(run_bench()))
