"""The north_rule deployment clause, driven literally: build the
--py-files artifact with scripts/make_pyfiles.py, then run a real
``spark-submit --py-files filtlong_spark.zip job.py`` as a fresh OS
process whose working directory does NOT contain the repo — the job
can only import filtlong_spark from the shipped zip. The job runs the
full filter (scoring + budget + scrub) and prints a sentinel the test
asserts, plus the kept count for determinism."""

import os
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """\
import json
from pyspark.sql import SparkSession

# no sys.path surgery: filtlong_spark must come from --py-files
from filtlong_spark import FilterConfig, fixtures as fx
from filtlong_spark.plans.pipeline import run_filter

spark = (SparkSession.builder
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = fx.to_spark_df(spark, fx.volume(sf=0.0002))
cfg = FilterConfig(min_length=50, keep_percent=80.0,
                   vocab=frozenset(fx.VOCAB), budget_algorithm="approx")
res = run_filter(spark, pages, cfg)
print("SUBMIT_OK", json.dumps({"kept": res.kept.count(),
                               "chars": res.total_input_chars}))
spark.stop()
"""


def test_spark_submit_py_files_end_to_end(tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    try:
        import make_pyfiles
    finally:
        sys.path.pop(0)
    zip_path = make_pyfiles.build(str(tmp_path / "filtlong_spark.zip"))
    job = tmp_path / "job.py"
    job.write_text(JOB)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    p = subprocess.run(
        [spark_submit, "--master", "local[2]",
         "--py-files", zip_path, str(job)],
        cwd=str(tmp_path),          # repo NOT importable from here
        env=env, capture_output=True, text=True, timeout=420)
    assert p.returncode == 0, p.stderr[-3000:]
    line = [ln for ln in p.stdout.splitlines()
            if ln.startswith("SUBMIT_OK")]
    assert line, p.stdout[-2000:] + p.stderr[-2000:]
    import json
    stats = json.loads(line[0].split(" ", 1)[1])
    assert stats["kept"] > 0 and stats["chars"] > 0
