"""Breadth batch 43: phonetic blocking, IPF raking, spectral entropy,
candidate keys, mutual k-NN graph, LTTB downsampling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nocouncil_etl_spark.plans.breadth43 import (
    KNNG_K,
    LTTB_B,
    PHON_TOP,
    SPEC_PERIODS,
    _phon_key_sql,
)
from nocouncil_etl_spark.registry import load_all

REG = load_all()


def test_phonetic_key_groups_soundalikes(spark):
    # classic Soundex pairs collapse to one key; distinct-sounding words don't
    words = ["robert", "rupert", "smith", "smyth", "brian", "bryan"]
    df = spark.createDataFrame([(w,) for w in words], "word STRING").select(
        "word", F.expr(_phon_key_sql("word", False)).alias("pkey")
    )
    keys = {r.word: r.pkey for r in df.collect()}
    assert keys["robert"] == keys["rupert"]
    assert keys["smith"] == keys["smyth"]
    assert keys["brian"] == keys["bryan"]
    assert keys["robert"] != keys["smith"]
    for k in keys.values():
        assert len(k) == 4 and k[0].isalpha()


def test_phonetic_block_rows_are_ranked_buckets(spark, sf_dir):
    rows = REG["dedup_phonetic_block"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= PHON_TOP
    assert [r.rk for r in sorted(rows, key=lambda r: r.rk)] == list(
        range(1, len(rows) + 1)
    )
    for r in rows:
        assert r.n_parts >= r.n_words >= 1


def test_raking_moves_column_margins_toward_uniform(spark, sf_dir):
    rows = REG["agg_raking_ipf"].fn(spark, sf_dir).collect()
    assert rows
    n = sum(r.n_raw for r in rows)
    dows = {r.dow for r in rows}
    target = n / len(dows)
    # the LAST scaling is over dow columns, so fitted column margins sit
    # within per-cell floor-rounding of the uniform target
    for d in dows:
        fitted = sum(r.fitted for r in rows if r.dow == d)
        assert abs(fitted - target) <= len(rows) + 2
    for r in rows:
        assert r.w_1e6 > 0


def test_spectral_entropy_shares_and_bound(spark, sf_dir):
    rows = REG["ts_spectral_entropy"].fn(spark, sf_dir).collect()
    assert rows
    hmax = round(math.log(len(SPEC_PERIODS)) * 1_000_000)
    for r in rows:
        shares = [r.p3_1e6, r.p5_1e6, r.p7_1e6, r.p14_1e6]
        assert all(s >= 0 for s in shares)
        assert abs(sum(shares) - 1_000_000) <= 4  # rounded shares of one total
        assert 0 <= r.entropy_micro <= hmax + 4


def test_candidate_keys_verdicts(spark, sf_dir):
    rows = {r.ckey: r for r in REG["dq_candidate_keys"].fn(spark, sf_dir).collect()}
    assert rows["orders.o_orderkey"].is_unique == 1
    assert rows["events.event_id"].is_unique == 1
    # the synthetic lineitem re-uses line numbers within an order — the
    # audit's whole point is surfacing that a "natural" key is NOT a key
    assert rows["lineitem.l_orderkey+l_linenumber"].dup_rows > 0
    assert rows["orders.o_custkey"].is_unique == 0
    for r in rows.values():
        assert r.n_rows == r.n_keys + r.dup_rows
        assert (r.is_unique == 1) == (r.max_per_key == 1)


def test_mutual_knn_graph_is_symmetric_and_bounded(spark, sf_dir):
    edges = REG["vec_knn_graph_mutual"].fn(spark, sf_dir).collect()
    assert edges
    seen = set()
    deg: dict[int, int] = {}
    for e in edges:
        assert e.u < e.v
        assert (e.u, e.v) not in seen
        seen.add((e.u, e.v))
        deg[e.u] = deg.get(e.u, 0) + 1
        deg[e.v] = deg.get(e.v, 0) + 1
    # mutual degree can never exceed the directed out-degree cap
    assert max(deg.values()) <= KNNG_K


def test_mutual_knn_graph_tiling_is_result_invariant(spark, sf_dir, monkeypatch):
    """The block kernel's quadratic-intermediate guard: shrinking the tile
    budget to one element forces every query row into its own tile (the
    degenerate many-tile execution an oversized label block would take),
    and the edge set must be bit-identical to the default single-tile run."""
    import nocouncil_etl_spark.plans.breadth43 as b43

    fn = REG["vec_knn_graph_mutual"].fn
    base = sorted(map(tuple, fn(spark, sf_dir).collect()))
    monkeypatch.setattr(b43, "KNNG_TILE_ELEMS", 1)
    tiled = sorted(map(tuple, fn(spark, sf_dir).collect()))
    assert base == tiled
    assert base  # non-vacuous


def test_lttb_keeps_endpoints_and_subsets_the_series(spark, sf_dir):
    from nocouncil_etl_spark.io import load

    out = REG["ts_lttb_downsample"].fn(spark, sf_dir).collect()
    ev = load(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.to_date("ts")).alias("s"))
    daily = {
        (r.t, r.y)
        for r in ev.crossJoin(F.broadcast(d0))
        .groupBy(F.datediff(F.to_date("ts"), F.col("s")).cast("long").alias("t"))
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("y"))
        .collect()
    }
    offs = [r.off for r in out]
    assert len(offs) == len(set(offs))  # one point per selection
    assert len(out) <= LTTB_B + 2
    assert min(offs) == min(t for t, _ in daily)
    assert max(offs) == max(t for t, _ in daily)
    for r in out:
        assert (r.off, r.y) in daily  # selected points are real points
