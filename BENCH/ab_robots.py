"""Interleaved robots OFF/ON A/B with FULL per-wave phase receipts.

Usage: python BENCH/ab_robots.py [sf] [rounds]
Prints one JSON line per leg: steady rate, wave secs, wave phase dicts —
the attribution evidence for robots_overhead_x iterations.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = bench.make_session(bench.CPUS)
    pairs = []
    for r in range(rounds):
        rates = {}
        # order-balanced: odd rounds run the ON leg first (VM credit drain)
        for robots in ((False, True) if r % 2 == 0 else (True, False)):
            t0 = time.time()
            res = bench.crawl_bench(spark, sf, respect_robots=robots)
            rates[robots] = res["urls_per_sec_steady"]
            print(json.dumps({
                "round": r, "robots": robots, "wall": round(time.time() - t0, 1),
                "steady": res["urls_per_sec_steady"],
                "wave_secs": res["wave_secs"],
                "wave_urls": res["wave_urls"],
                "wave_phases": res["wave_phases"]}), flush=True)
        pairs.append(round(rates[False] / rates[True], 3)
                     if rates[True] else None)
    print(json.dumps({"overhead_rounds": pairs,
                      "median": sorted(pairs)[len(pairs) // 2]
                      if pairs else None}), flush=True)


if __name__ == "__main__":
    main()
