"""Round-9 full-catalog sf0.1 vs sf1 scaling TRIAGE for the ~430 registry
queries with no measured factor row in SCALE.md (rounds 5-8 covered the
other ~322). Single run per SF — this is a triage pass to surface
exceptions and >=3x factors for deep measurement, not a publication run.

Usage: python scripts/bench_scale_r9.py [name ...]
       (default: every registry query absent from SCALE.md's tables)

Prints one line per (sf, query); ends with a FLAGGED section listing
exceptions and factor >= 3 queries.
"""

from __future__ import annotations

import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def unmeasured() -> list[str]:
    from nocouncil_etl_spark.registry import load_all

    txt = open(os.path.join(REPO, "SCALE.md")).read()
    measured = set(re.findall(r"^\| ([a-z_0-9]+) \|", txt, re.M))
    return sorted(set(load_all()) - measured)


def main() -> None:
    from nocouncil_etl_spark.registry import load_all
    from nocouncil_etl_spark.session import get_session

    reg = load_all()
    names = sys.argv[1:] or unmeasured()
    spark = get_session("r9-scale-triage")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, dict[str, float]] = {}
    flagged: list[str] = []
    sf_dirs = ("/root/testdata/sf0.1", os.path.join(REPO, ".scratch", "sf1"))
    for sf_dir in sf_dirs:
        reg["pricing_summary"].fn(spark, sf_dir).collect()  # warm the scans
    # Interleave the two SFs per query so the sf1/sf0.1 ratio is robust to
    # ambient machine load drifting over the sweep.
    for name in names:
        for sf_dir in sf_dirs:
            sf = os.path.basename(sf_dir)
            t0 = time.perf_counter()
            try:
                df = reg[name].fn(spark, sf_dir)
                n = len(df.collect())
            except Exception as exc:  # noqa: BLE001
                print(f"{sf:>6} {name:40s} EXC {str(exc)[:160]}", flush=True)
                flagged.append(f"{name}: EXC at {sf}: {str(exc)[:160]}")
                continue
            dt = time.perf_counter() - t0
            times.setdefault(name, {})[sf] = dt
            print(f"{sf:>6} {name:40s} {dt:7.2f}s rows={n}", flush=True)
            spark.catalog.clearCache()
    print("\n=== factors (sf1 / sf0.1) ===", flush=True)
    for name in names:
        t = times.get(name, {})
        if "sf0.1" in t and "sf1" in t:
            f = t["sf1"] / max(t["sf0.1"], 1e-9)
            mark = "  <<< FLAG" if f >= 3.0 and t["sf1"] > 2.0 else ""
            if mark:
                flagged.append(f"{name}: factor {f:.1f}x ({t['sf0.1']:.2f} -> {t['sf1']:.2f}s)")
            print(f"{name:40s} {t['sf0.1']:7.2f} {t['sf1']:7.2f}  {f:5.1f}x{mark}", flush=True)
    print(f"\n=== FLAGGED ({len(flagged)}) ===")
    for f in flagged:
        print(f)
    spark.stop()


main()
