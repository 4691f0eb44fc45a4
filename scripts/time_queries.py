"""Isolated per-query timing: same methodology as bench.py (warm-up +
median of 3 collects, cache clear + GC between queries), fresh session,
but only the named queries. Usage:
  python scripts/time_queries.py q1 q2 ...   [$SPARK_GRAFT_SF_DIR]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from nocouncil_etl_spark.registry import load_all
    from nocouncil_etl_spark.session import get_session

    registry = load_all()
    spark = get_session("time-queries")
    registry["pricing_summary"].fn(spark, sf_dir).collect()  # warm JVM
    out: dict[str, float] = {}
    for name in names:
        samples: list[float] = []
        for i in range(4):
            t0 = time.perf_counter()
            df = registry[name].fn(spark, sf_dir)
            df.collect()
            if i > 0:
                samples.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(samples), 3)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
