"""Dev survey for the fan-out lint: which registry queries plan a Generate
(explode) fed by a file scan with no shuffle in between, and over which
table. Used to calibrate tests/test_fanout_lint.py's whitelist.

Usage: python scripts/fanout_lint_survey.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    from nocouncil_etl_spark.plancheck import unfanned_generates
    from nocouncil_etl_spark.registry import load_all

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    reg = load_all()
    n_hit = 0
    for name in sorted(reg):
        try:
            bad = unfanned_generates(reg[name].fn(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: EXC {str(exc)[:120]}")
            continue
        finally:
            spark.catalog.clearCache()
        if bad:
            n_hit += 1
            tables = sorted({s.split("/")[-1].split(".parquet")[0][:40] for _g, s in bad})
            print(f"{name}: {len(bad)} unfanned generate(s) over {tables}")
    print(f"--- {n_hit}/{len(reg)} queries flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
