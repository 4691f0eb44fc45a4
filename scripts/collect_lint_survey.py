"""Survey every driver-side materialization (.collect()/.toPandas()) that
fires while CONSTRUCTING each registry query — the bootstrap for
tests/test_collect_lint.py's whitelist (round-8 verdict #4).

Prints one line per distinct call site: `relpath:function  max_rows  queries`
so each site can be whitelisted with a reason (or fixed). All driver-side
fetches happen at plan-construction time (the returned object is a
DataFrame; its execution cannot call back into Python), so constructing
fn(spark, sf_dir) under the patch observes the complete set.

Usage: python scripts/collect_lint_survey.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

PKG = os.path.join(REPO, "nocouncil_etl_spark")


def site_key(skip_self: int = 1) -> str:
    """Innermost stack frame inside the package: `relpath:function`."""
    for frame, _ in traceback.walk_stack(sys._getframe(skip_self)):
        fn = frame.f_code.co_filename
        if fn.startswith(PKG):
            rel = os.path.relpath(fn, REPO)
            return f"{rel}:{frame.f_code.co_name}"
    return "<outside-package>"


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    # patch the CONCRETE class: pyspark.sql.DataFrame is the abstract base
    # in PySpark 4 and classic instances override collect/toPandas
    from pyspark.sql.classic.dataframe import DataFrame

    from nocouncil_etl_spark.registry import load_all
    from nocouncil_etl_spark.session import get_session

    spark = get_session("collect-lint-survey")
    reg = load_all()

    seen: dict[str, tuple[int, set[str]]] = {}
    orig_collect = DataFrame.collect
    orig_topandas = DataFrame.toPandas
    current = {"q": "?"}

    def rec(key: str, n: int) -> None:
        mx, qs = seen.get(key, (0, set()))
        qs.add(current["q"])
        seen[key] = (max(mx, n), qs)

    def collect(self):
        rows = orig_collect(self)
        rec(site_key(), len(rows))
        return rows

    def topandas(self):
        pdf = orig_topandas(self)
        rec(site_key(), len(pdf))
        return pdf

    DataFrame.collect = collect
    DataFrame.toPandas = topandas
    try:
        for name in sorted(reg):
            current["q"] = name
            try:
                reg[name].fn(spark, sf)
            except Exception as e:  # noqa: BLE001 — survey, not a gate
                print(f"ERR {name}: {type(e).__name__}: {e}", file=sys.stderr)
    finally:
        DataFrame.collect = orig_collect
        DataFrame.toPandas = orig_topandas

    for key in sorted(seen):
        mx, qs = seen[key]
        ql = ",".join(sorted(qs)[:4]) + ("…" if len(qs) > 4 else "")
        print(f"{key}\t{mx}\t{ql}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
