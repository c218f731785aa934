"""Interleaved same-window A/B of the split (async) wave commit at one
core count: spark-submit legs alternating --async-commit on/off on the
identical input. Decides the sweep default (SPARK_GRAFT_SCALE_ASYNC) with
window drift controlled the only way this VM allows — adjacency.

Usage: python BENCH/ab_async.py [cpus] [rounds]   (default 16 2)
"""
import json
import os
import subprocess
import sys
import tempfile
import shutil
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench
from bench import REPO, SEED_FRAC, _pin_prefix, _hw_rate


def leg(cpus, zip_path, async_commit):
    shm = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix=f"ab{cpus}_", dir=shm)
    cmd = _pin_prefix(cpus) + [
        shutil.which("spark-submit"), "--master", f"local[{cpus}]",
        "--conf", f"spark.sql.shuffle.partitions={max(cpus * 6, 48)}",
        "--conf", f"spark.default.parallelism={cpus}",
        "--conf", "spark.sql.adaptive.coalescePartitions.enabled=false",
        "--conf", "spark.driver.memory=48g",
        "--conf", f"spark.local.dir={os.path.join(tmp, 'local')}",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "jobs", "crawl_job.py"),
        "--pages", "synth:3200000:64000", "--waves", "3",
        "--seed-frac", str(SEED_FRAC), "--tokens-per-host", "256",
        "--host-buckets", "128", "--robots",
        "--store", os.path.join(tmp, "store")] \
        + (["--async-commit"] if async_commit else [])
    hw0 = _hw_rate(cpus)
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    hw1 = _hw_rate(cpus)
    shutil.rmtree(tmp, ignore_errors=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    urls = sum(m.get("fetchstart", 0) for m in res["wave_metrics"][1:])
    secs = sum(res["wave_secs"][1:])
    return {"async": async_commit,
            "steady": round(urls / secs, 1) if secs else 0.0,
            "wave_secs": res["wave_secs"],
            "hw": round((hw0 + hw1) / 2, 2),
            "phases_w1": {k[2:]: v for k, v in res["wave_metrics"][1].items()
                          if k.startswith("t_")}}


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sys.path.insert(0, os.path.join(REPO, "jobs"))
    import package as _pkg
    zip_path = _pkg.build()
    legs = []
    for r in range(rounds):
        for a in ((True, False) if r % 2 == 0 else (False, True)):
            res = leg(cpus, zip_path, a)
            res["round"] = r
            legs.append(res)
            print("LEG", json.dumps(res), flush=True)
    on = [l["steady"] for l in legs if l["async"]]
    off = [l["steady"] for l in legs if not l["async"]]
    print(json.dumps({"cpus": cpus, "on_best": max(on), "off_best": max(off),
                      "on_all": on, "off_all": off,
                      "async_speedup_best": round(max(on) / max(off), 3)}))


if __name__ == "__main__":
    main()
