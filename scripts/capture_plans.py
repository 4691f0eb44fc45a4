"""Capture .explain("formatted") for headline queries into plans/r11/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/r11/<query>_<suffix>.txt for each headline query (or the named
subset). Plan text is machine-load-insensitive, so this can run any time.
Note: queries whose plan *construction* executes jobs (iterative graph
kernels, driver-side power iteration) will run those jobs here — that is the
same work the bench pays, just untimed.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402  (headline list lives there)
from nocouncil_etl_spark.registry import load_all  # noqa: E402
from nocouncil_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r12"))
    os.makedirs(out_dir, exist_ok=True)
    registry = load_all()
    spark = get_session("plan-capture")
    targets = names or [n for n in bench.HEADLINE if n in registry]
    for name in targets:
        try:
            df = registry[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"PLAN CAPTURE FAILED: {exc!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
