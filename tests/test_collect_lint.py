"""Registry-wide driver-materialization lint (round-8 verdict #4) — the
sibling of tests/test_window_lint.py.

The engine's convention: a .collect()/.toPandas() inside a query's
construction is only allowed for DRIVER-BOUNDED fetches — single scalars
(normalizers, seeds, domain spans), #partitions-sized offset tables,
k-row centroid/codebook matrices, manifest reads, limit(k) survivors.
Anything data-sized on the driver is exactly what dies at 100 TB
(stream_cdc_apply shipped one for two rounds before the r9 fix).

Mechanics: patch DataFrame.collect/toPandas to record, for every
materialization fired while CONSTRUCTING each registry query at the test
scale, the innermost package call site (`relpath:function`) and the row
count. All driver-side fetches happen at construction time — the returned
object is a DataFrame whose execution cannot call back into Python (the
one exception, foreachBatch streams, also drains during fn()). Every
observed site must be on the WHITELIST (with a reason string) AND return
<= ROW_CAP rows; a new .collect() in a future batch fails here until it
is either bounded or justified.

ROW_CAP calibration at sf0.001: fact tables are lineitem ~6k / events 20k
/ documents 600 rows; the catalog's legitimate bounded fetches top out at
the largest whitelisted frame measured by scripts/collect_lint_survey.py
(~500 rows: PCA component matrices, blocked-KNN query sides). The cap
sits between those regimes.
"""

from __future__ import annotations

import os
import sys
import traceback

import pytest

# patch the CONCRETE class: pyspark.sql.DataFrame is the abstract base in
# PySpark 4 and classic instances override collect/toPandas
from pyspark.sql.classic.dataframe import DataFrame

from nocouncil_etl_spark.registry import load_all

REG = load_all()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "nocouncil_etl_spark")

ROW_CAP = 600

# site (`relpath:function`) → reason it is driver-bounded. Reasons must
# argue SF-independence (or an explicit cap), not just small-at-test-scale.
WHITELIST: dict[str, str] = {}


def _site_key() -> str:
    for frame, _ in traceback.walk_stack(sys._getframe(1)):
        fn = frame.f_code.co_filename
        if fn.startswith(PKG):
            rel = os.path.relpath(fn, REPO)
            return f"{rel}:{frame.f_code.co_name}"
    return "<outside-package>"


@pytest.fixture
def record_collects(monkeypatch):
    records: list[tuple[str, int]] = []
    orig_collect = DataFrame.collect
    orig_topandas = DataFrame.toPandas

    def collect(self):
        rows = orig_collect(self)
        key = _site_key()
        if key != "<outside-package>":
            records.append((key, len(rows)))
        return rows

    def topandas(self):
        pdf = orig_topandas(self)
        key = _site_key()
        if key != "<outside-package>":
            records.append((key, len(pdf)))
        return pdf

    monkeypatch.setattr(DataFrame, "collect", collect)
    monkeypatch.setattr(DataFrame, "toPandas", topandas)
    return records


@pytest.mark.parametrize("name", sorted(REG))
def test_no_unbounded_driver_materialization(
    name, spark, sf_dir, record_collects
):
    REG[name].fn(spark, sf_dir)
    bad = [
        (site, n)
        for site, n in record_collects
        if site not in WHITELIST or n > ROW_CAP
    ]
    assert not bad, (
        f"{name}: driver-side materialization at non-whitelisted or "
        f"over-cap site(s) {bad} (cap {ROW_CAP}); keep driver fetches "
        f"bounded (scalar / offset-table / codebook / manifest) or "
        f"whitelist with a reason arguing SF-independence"
    )
