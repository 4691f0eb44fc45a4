"""Property tests for the round-7 scan operators
(operators/quantiles.ranged_rank_cumsum / dense_cumsum / _domain_shift):
each must be output-IDENTICAL to the single-partition global window it
replaces, across partition counts, tie patterns, negative values, and
wide domains — these are the primitives 40+ queries now stand on.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.operators.quantiles import (
    _domain_shift,
    cumulate,
    dense_cumsum,
    ranged_group_rank_cumsum,
    ranged_rank_cumsum,
    with_global_rank,
)


def _ref(df, exprs):
    w = Window.orderBy("v", "id")
    wr = w.rowsBetween(Window.unboundedPreceding, 0)
    wx = w.rowsBetween(Window.unboundedPreceding, -1)
    cols = {
        "rk": F.row_number().over(w).cast("long"),
        "cum_m": F.sum("m").over(wr).cast("long"),
        "cummax_t": F.max("t").over(wr).cast("long"),
        "cummax_excl_t": F.max("t").over(wx).cast("long"),
        "prev_t": F.lag("t").over(w).cast("long"),
    }
    return {
        r["id"]: tuple(r[e] for e in exprs)
        for r in df.select(
            "id", *[cols[e].alias(e) for e in exprs]
        ).collect()
    }


@pytest.mark.parametrize("nparts", [1, 3, 17])
@pytest.mark.parametrize("seed,vmax", [(1, 30), (2, 10**13)])
def test_ranged_scan_equals_global_window(spark, nparts, seed, vmax):
    """rank + cumsum + inclusive/exclusive max + lag, identical to the
    global-window reference — heavy ties (vmax=30) and near-unique wide
    domains (1e13), 1/3/17 partitions."""
    rng = random.Random(seed)
    rows = [
        (i, rng.randint(-5, vmax), rng.randint(-9, 9), rng.randint(0, 400))
        for i in range(1500)
    ]
    df = spark.createDataFrame(rows, "id long, v long, m long, t long")
    out = ranged_rank_cumsum(
        df,
        "v",
        "id",
        ("m",),
        n_partitions=nparts,
        max_cols=("t",),
        lag_col="t",
        max_cols_exclusive=("t",),
    )
    got = {
        r["id"]: (r.rk, r.cum_m, r.cummax_t, r.cummax_excl_t, r.prev_t)
        for r in out.collect()
    }
    want = _ref(df, ["rk", "cum_m", "cummax_t", "cummax_excl_t", "prev_t"])
    assert got == want


def test_ranged_scan_boundary_spanning_tie_block(spark):
    """Deterministic regression for the r8 composite-min fix
    (operators/quantiles.py:568): a 100-row value-tie block (v=5, ids
    100-199) forced across range-partition boundaries (4 partitions over
    103 rows) PLUS a later partition holding a larger value with smaller
    ids (v=9, ids 0-2). The pre-fix offset ordering — (min(value),
    min(id)) as SEPARATE aggregates — sorts the v=9 partition (min id 0)
    before the tail of the tie block (min id > 0), corrupting every
    rank/cumsum/cummax/lag downstream of the boundary. The composite
    min(struct(value, id)) orders exactly like the range partitioner."""
    rows = [(i, 5, 1, i % 7) for i in range(100, 200)]  # tie block
    rows += [(i, 9, 1, 50 + i) for i in range(3)]  # larger v, smaller ids
    df = spark.createDataFrame(rows, "id long, v long, m long, t long")
    out = ranged_rank_cumsum(
        df,
        "v",
        "id",
        ("m",),
        n_partitions=4,
        max_cols=("t",),
        lag_col="t",
        max_cols_exclusive=("t",),
    )
    got = {
        r["id"]: (r.rk, r.cum_m, r.cummax_t, r.cummax_excl_t, r.prev_t)
        for r in out.collect()
    }
    want = _ref(df, ["rk", "cum_m", "cummax_t", "cummax_excl_t", "prev_t"])
    assert got == want


def test_ranged_scan_heavy_tie_stress_randomized(spark):
    """500-row heavy-tie stress (few distinct values → every boundary
    lands inside a tie block) across awkward partition counts."""
    rng = random.Random(42)
    rows = [
        (i, rng.choice([2, 5, 5, 5, 9]), rng.randint(-3, 3), rng.randint(0, 50))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id long, v long, m long, t long")
    for nparts in (4, 7):
        out = ranged_rank_cumsum(
            df, "v", "id", ("m",), n_partitions=nparts,
            max_cols=("t",), lag_col="t", max_cols_exclusive=("t",),
        )
        got = {
            r["id"]: (r.rk, r.cum_m, r.cummax_t, r.cummax_excl_t, r.prev_t)
            for r in out.collect()
        }
        want = _ref(df, ["rk", "cum_m", "cummax_t", "cummax_excl_t", "prev_t"])
        assert got == want


def test_ranged_scan_all_null_value_partition(spark):
    """NULL value_col rows range-partition FIRST in Spark; the driver
    offset sort must put the all-NULL partition first via the None-first
    wrapper instead of raising TypeError (r7 advice, low). Reference:
    Window.orderBy sorts NULLs first by default, same total order."""
    rows = [(i, None, 1) for i in range(40)] + [
        (i, (i * 13) % 9, 1) for i in range(40, 160)
    ]
    df = spark.createDataFrame(rows, "id long, v long, m long")
    out = ranged_rank_cumsum(df, "v", "id", ("m",), n_partitions=5)
    got = {r["id"]: (r.rk, r.cum_m) for r in out.collect()}
    w = Window.orderBy(F.asc_nulls_first("v"), "id")
    want = {
        r["id"]: (r.rk, r.cum_m)
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rk"),
            F.sum("m")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum_m"),
        ).collect()
    }
    assert got == want


def test_ranged_scan_plan_has_no_global_window(spark):
    from nocouncil_etl_spark.plancheck import plan_has_global_window

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 37 % 1001).alias("v"), F.lit(1).alias("m")
    )
    out = ranged_rank_cumsum(df, "v", "id", ("m",))
    out.collect()
    assert not plan_has_global_window(out)


def test_dense_cumsum_matches_running_sum(spark):
    df = spark.range(1, 20001).select(
        F.col("id").alias("j"), (F.col("id") % 13 - 3).alias("l")
    )
    got = {r.j: r.cum for r in dense_cumsum(df, "j", "l").collect()}
    run = 0
    for j in range(1, 20001):
        run += j % 13 - 3
        assert got[j] == run


def test_domain_shift_sizes_levels_to_span(spark):
    narrow = spark.createDataFrame([(5,), (9,), (7,)], "_v long")
    mn, lv = _domain_shift(narrow, "_v")
    assert mn == 5 and lv == 3  # span 5 → 3 bits
    wide = spark.createDataFrame([(0,), (10**14,)], "_v long")
    _, lv2 = _domain_shift(wide, "_v")
    assert 2**lv2 > 10**14
    empty = spark.createDataFrame([], "_v long")
    assert _domain_shift(empty, "_v") == (0, 1)


def test_cumulate_auto_levels_wide_domain_exact(spark):
    """Regression for the 31-level truncation bug: micro-timestamp-sized
    domains must cumulate exactly under the auto-sized default."""
    rng = random.Random(11)
    rows = [(rng.randint(0, 10**14), rng.randint(1, 5)) for _ in range(400)]
    agg = {}
    for v, c in rows:
        agg[v] = agg.get(v, 0) + c
    hist = spark.createDataFrame(list(agg.items()), "val long, c long")
    got = {r["val"]: r["cum_c"] for r in cumulate(hist, "val", ("c",)).collect()}
    run = 0
    for v in sorted(agg):
        run += agg[v]
        assert got[v] == run


def test_ranged_scan_nan_value_partitions(spark):
    """Float NaN value_col: Spark orders NaN LAST (above +inf); the
    driver offset sort normalizes NaN to a last tier instead of letting
    unordered Python NaN comparisons silently scramble list.sort (r8
    advice, low)."""
    rows = [(i, float((i * 13) % 9), 1) for i in range(120)]
    rows += [(i, float("nan"), 1) for i in range(120, 200)]
    rows += [(i, float("inf"), 1) for i in range(200, 210)]
    df = spark.createDataFrame(rows, "id long, v double, m long")
    out = ranged_rank_cumsum(df, "v", "id", ("m",), n_partitions=6)
    got = {r["id"]: (r.rk, r.cum_m) for r in out.collect()}
    w = Window.orderBy("v", "id")  # Spark window also orders NaN last
    want = {
        r["id"]: (r.rk, r.cum_m)
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rk"),
            F.sum("m")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum_m"),
        ).collect()
    }
    assert got == want


def test_with_global_rank_raises_on_null_value(spark):
    """Contract: NULL value_col is rejected loudly at execution time
    instead of silently dropping rows through the inner equi-join."""
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 7)], "id long, v long"
    )
    with pytest.raises(Exception, match="NULL v unsupported"):
        with_global_rank(df, "v", "id").collect()


def test_dense_cumsum_pinned_partition_ids(spark):
    """dense_cumsum's _pid tag feeds two actions; the localCheckpoint pin
    must keep results exact even when the input plan involves a shuffle
    (round-robin repartition is the canonical nondeterministic case)."""
    df = (
        spark.range(1, 5001)
        .repartitionByRange(8, "id")  # contiguous intervals, via a shuffle
        .sortWithinPartitions("id")
        .select(F.col("id").alias("j"), (F.col("id") % 7 - 2).alias("l"))
    )
    got = {r.j: r.cum for r in dense_cumsum(df, "j", "l").collect()}
    run = 0
    for j in range(1, 5001):
        run += j % 7 - 2
        assert got[j] == run


def test_with_global_rank_negative_values(spark):
    rows = [(i, (i * 7919) % 100 - 50) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {r.id: r.rk for r in with_global_rank(df, "v", "id").collect()}
    want = {
        r.id: r.rk
        for r in df.select(
            "id",
            F.row_number().over(Window.orderBy("v", "id")).cast("long").alias("rk"),
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("nparts", [1, 4, 17])
def test_ranged_group_rank_equals_partitioned_window(spark, nparts):
    """Grouped scan vs Window.partitionBy(g).orderBy(v, id): FEW groups
    (3, like return flags) each much larger than a range partition, heavy
    ties, group boundaries inside partitions."""
    rng = random.Random(7)
    rows = [
        (i, "ANR"[rng.randint(0, 2)], rng.randint(0, 40), rng.randint(-5, 5))
        for i in range(1500)
    ]
    df = spark.createDataFrame(rows, "id long, g string, v long, m long")
    out = ranged_group_rank_cumsum(
        df, "g", "v", "id", ("m",), n_partitions=nparts
    )
    got = {r["id"]: (r.rk, r.cum_m) for r in out.collect()}
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        r["id"]: (r.rk, r.cum_m)
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rk"),
            F.sum("m")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum_m"),
        ).collect()
    }
    assert got == want


def test_ranged_group_rank_boundary_tie_block(spark):
    """The r8 boundary bug class, grouped form: one group's value-tie
    block spans partitions while a LATER group holds smaller values —
    the per-group offset walk must not interleave groups."""
    rows = [(i, "a", 5, 1) for i in range(100, 200)]
    rows += [(i, "b", 1, 1) for i in range(3)]
    df = spark.createDataFrame(rows, "id long, g string, v long, m long")
    out = ranged_group_rank_cumsum(df, "g", "v", "id", ("m",), n_partitions=4)
    got = {r["id"]: (r.rk, r.cum_m) for r in out.collect()}
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        r["id"]: (r.rk, r.cum_m)
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rk"),
            F.sum("m")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum_m"),
        ).collect()
    }
    assert got == want


def test_ranged_group_rank_null_values(spark):
    """NULL value rows rank FIRST within their group (Spark default),
    via the None-first wrapper in the per-group offset walk."""
    rows = [(i, "xy"[i % 2], None if i < 20 else (i * 7) % 11, 1)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, v long, m long")
    out = ranged_group_rank_cumsum(df, "g", "v", "id", ("m",), n_partitions=5)
    got = {r["id"]: (r.rk, r.cum_m) for r in out.collect()}
    w = Window.partitionBy("g").orderBy(F.asc_nulls_first("v"), "id")
    want = {
        r["id"]: (r.rk, r.cum_m)
        for r in df.select(
            "id",
            F.row_number().over(w).cast("long").alias("rk"),
            F.sum("m")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("cum_m"),
        ).collect()
    }
    assert got == want
