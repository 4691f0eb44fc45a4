"""Round-11 targeted sf0.1 vs sf1 re-measure, self-labeled for contention
(round-10 verdict #3 + #5):

- join_record_linkage_fs — the ONE query whose round-10 factor was still
  harness-confounded: linkage keys are customer NAMES, which replicated
  verbatim until scripts/make_sf1.py's round-11 c_name salt. Re-measured
  here on the salted harness for a faithful 10× factor.
- vec_knn_graph_mutual / dedup_semantic_centroid — the two kernels that
  gained the over-cap celled path this round; sf1 blocks (~2.2k rows) are
  under KNNG_BLOCK_CAP/PAIR_BLOCK_CAP=4096, so walls must be within noise
  of round 10 (the strategy switch costs one tiny broadcast-size agg).

Every measurement block carries the shared contention sentinel
(scripts/_contention.py — same thresholds as bench.py, pinned by
tests/test_contention_sentinel.py) so the SCALE.md factor rows are
self-labeling: a contended block is read as load noise, not code.

Usage: python scripts/bench_scale_r11.py [name ...]
(median of 3 per SF after a warm-up; interleaved SFs; prints a
markdown-ready table plus the sentinel flags)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT = [
    "join_record_linkage_fs",
    "vec_knn_graph_mutual",
    "dedup_semantic_centroid",
]


def main() -> None:
    from _contention import Sentinel

    from nocouncil_etl_spark.registry import load_all
    from nocouncil_etl_spark.session import get_session

    reg = load_all()
    names = sys.argv[1:] or DEFAULT
    spark = get_session("r11-scale-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dirs = ("/root/testdata/sf0.1", os.path.join(REPO, ".scratch", "sf1"))
    for sf_dir in sf_dirs:
        reg["pricing_summary"].fn(spark, sf_dir).collect()  # warm the scans

    sentinel = Sentinel(spark)
    times: dict[str, dict[str, float]] = {}
    rows_out: dict[str, dict[str, int]] = {}
    for name in names:
        for sf_dir in sf_dirs:
            sf = os.path.basename(sf_dir).replace("sf", "sf")
            samples = []
            n = 0
            for i in range(4):  # warm-up + median-of-3, like bench.py
                t0 = time.perf_counter()
                n = len(reg[name].fn(spark, sf_dir).collect())
                if i > 0:
                    samples.append(time.perf_counter() - t0)
            times.setdefault(name, {})[sf] = statistics.median(samples)
            rows_out.setdefault(name, {})[sf] = n
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            print(
                f"{sf:>6} {name:30s} {times[name][sf]:7.2f}s rows={n}",
                flush=True,
            )
    flags = sentinel.finish()

    print("\n| query | sf0.1 s | sf1 s | factor | rows sf0.1 | rows sf1 | out ratio |")
    print("|---|---|---|---|---|---|---|")
    for name in names:
        t = times[name]
        r = rows_out[name]
        f = t["sf1"] / max(t["sf0.1"], 1e-9)
        ratio = r["sf1"] / max(r["sf0.1"], 1)
        print(
            f"| {name} | {t['sf0.1']:.2f} | {t['sf1']:.2f} | {f:.1f}x "
            f"| {r['sf0.1']} | {r['sf1']} | {ratio:.1f}x |"
        )
    print(f"\nsentinel: {flags}")
    spark.stop()


main()
