"""Semantic invariants for the grid-cell radius join."""

from __future__ import annotations

import hashlib

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.plans.geo_plans import (
    LAT_RANGE,
    LON_RANGE,
    RADIUS_MDEG,
)
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def _coord(prefix: str, uid: int, rng: int) -> int:
    hv = int(hashlib.md5(f"{prefix}#{uid}".encode()).hexdigest()[:15], 16)
    return hv % rng


def test_radius_join_matches_brute_force(spark, sf_dir):
    """The cell join must return EXACTLY the brute-force all-pairs result —
    bucketing is an optimization, never a recall trade-off at 3x3 probes."""
    users = sorted(
        r.user_id
        for r in load(spark, sf_dir, "events").select("user_id").distinct().collect()
    )
    pts = {u: (_coord("lon", u, LON_RANGE), _coord("lat", u, LAT_RANGE)) for u in users}
    expect = set()
    r2 = RADIUS_MDEG * RADIUS_MDEG
    for i, a in enumerate(users):
        xa, ya = pts[a]
        for b in users[i + 1 :]:
            xb, yb = pts[b]
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r2:
                expect.add((a, b, d2))
    got = {
        (r.id_a, r.id_b, r.d2)
        for r in REG["geo_radius_join"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert got, "the synthetic city should produce at least one nearby pair"
