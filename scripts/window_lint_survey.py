"""Dev survey for the unpartitioned-window lint (round-7):
for every registered query at sf0.001, detect global-order Window nodes in
the physical plan (planning only), then execute the flagged ones and read
each global WindowExec's actual input cardinality from the executed-plan
SQL metrics (nocouncil_etl_spark/plancheck.py). Output: one line per
(query, window) with the nearest metric node and row count — the data the
lint threshold + whitelist in tests/test_window_lint.py are chosen from.

Usage: python scripts/window_lint_survey.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from nocouncil_etl_spark.plancheck import (  # noqa: E402
    global_window_inputs,
    plan_has_global_window,
)


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from nocouncil_etl_spark.registry import load_all

    reg = load_all()
    names = [n for n in reg if not only or n in only]
    flagged = []
    for name in names:
        try:
            df = reg[name].fn(spark, sf_dir)
            if plan_has_global_window(df):
                flagged.append(name)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: PLAN-EXC {str(exc)[:120]}", flush=True)
        spark.catalog.clearCache()
    print(f"# {len(flagged)}/{len(names)} queries plan a global window", flush=True)

    for name in flagged:
        try:
            df = reg[name].fn(spark, sf_dir)
            df.collect()
            for node, rows in global_window_inputs(df):
                print(f"{name:45s} {node:28s} rows={rows}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: EXEC-EXC {str(exc)[:120]}", flush=True)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
