"""Phase-stamped A/B of the crawl bench legs (robots off vs on) for the
round-4 robots_overhead_x reconciliation. Runs interleaved legs in ONE
Spark session with CRAWL_DEBUG_TIMING on and prints per-wave phase stamps.

Usage: CRAWL_DEBUG_TIMING=1 python BENCH/diag_robots.py [sf] [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CRAWL_DEBUG_TIMING", "1")

import bench


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = bench.make_session(bench.CPUS)
    legs = []
    for r in range(rounds):
        for robots in (False, True):
            t0 = time.time()
            print(f"=== leg round={r} robots={robots} ===", flush=True)
            res = bench.crawl_bench(spark, sf, respect_robots=robots)
            print(f"=== done robots={robots} wall={time.time()-t0:.1f} "
                  f"steady={res['urls_per_sec_steady']} "
                  f"wave_secs={res['wave_secs']} ===", flush=True)
            legs.append((r, robots, res["urls_per_sec_steady"],
                         res["wave_secs"]))
    print("SUMMARY")
    for leg in legs:
        print(leg)


if __name__ == "__main__":
    main()
