"""Round-7 sf0.1 vs sf1 scaling measurement for operator batches 50-63
(plans/breadth70-83 — the queries SCALE.md's tables stopped short of;
round-6 verdict "What's missing" #3). Protocol as before: best-of-2,
quiet machine, collect() unless the output is row-heavy (then count()).

Usage: python scripts/bench_scale_r7.py [name ...]   (default: all 84)
"""

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def batch_queries() -> list[str]:
    names = []
    for i in range(70, 84):
        src = open(f"{REPO}/nocouncil_etl_spark/plans/breadth{i}.py").read()
        names += re.findall(r'@query\(\s*\n?\s*"([a-z_0-9]+)"', src)
    return names


# row-heavy outputs: time the computation, not driver-side serialization
BIG: set[str] = set()


def main():
    from nocouncil_etl_spark.registry import load_all
    from nocouncil_etl_spark.session import get_session

    reg = load_all()
    names = sys.argv[1:] or batch_queries()
    spark = get_session("r7-scale-bench")
    for sf_dir in ("/root/testdata/sf0.1", os.path.join(REPO, ".scratch/sf1")):
        reg["pricing_summary"].fn(spark, sf_dir).collect()  # warm
        for name in names:
            best = float("inf")
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    df = reg[name].fn(spark, sf_dir)
                    n = df.count() if name in BIG else len(df.collect())
                    best = min(best, time.perf_counter() - t0)
            except Exception as exc:  # noqa: BLE001
                print(f"{name}: EXC {str(exc)[:140]}", flush=True)
                continue
            print(
                f"{os.path.basename(sf_dir):>6} {name:36s} {best:7.2f}s rows={n}",
                flush=True,
            )
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    spark.stop()


main()
