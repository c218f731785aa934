"""The north_rule run mode: spark-submit --py-files from a clean cwd.

Builds the dist zip, runs jobs/crawl_job.py under spark-submit over a
small synthesized CC corpus with a store, then resumes — asserting the
resumed run continues (no reprocessing of completed waves)."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _run(extra, tmp):
    cmd = [SPARK_SUBMIT, "--master", "local[4]",
           "--conf", "spark.sql.shuffle.partitions=8",
           "--conf", "spark.ui.enabled=false",
           "--py-files", os.path.join(tmp, "simplecrawler_spark.zip"),
           os.path.join(REPO, "jobs", "crawl_job.py"),
           "--pages", "synth:1500:40", "--tokens-per-host", "64",
           "--store", os.path.join(tmp, "store")] + extra
    out = subprocess.run(cmd, capture_output=True, text=True, cwd=tmp,
                         timeout=540)
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_submit_then_resume(tmp_path):
    tmp = str(tmp_path)
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    try:
        import package as pkg
    finally:
        sys.path.pop(0)
    pkg.build(os.path.join(tmp, "simplecrawler_spark.zip"))

    first = _run(["--waves", "2", "--seed-frac", "0.1"], tmp)
    assert first["waves_run"] == 2
    assert first["urls_processed"] > 0
    assert first["lineage_rows"] > 0

    resumed = _run(["--waves", "1", "--resume"], tmp)
    assert resumed["waves_run"] == 1
    # resume continues mid-crawl: frontier monotonically grows, and the
    # resumed wave picks up where the killed run stopped
    assert resumed["frontier_rows"] >= first["frontier_rows"]
    assert resumed["wave_metrics"][0]["wave"] == 2
