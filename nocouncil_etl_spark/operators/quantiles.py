"""Exact quantile-normalization kernels, shared by the oracle-checked plans
(normalization_plans.curation_quantile_normalize, stats6 grid twin) and the
Engine facade verb — one implementation of the index arithmetic (the
shared-operator contract from the gapfill advice item).

Two forms:

- ``quantile_normalize_frame`` — per-row pooled order statistic via a
  global row_number (single-partition window on the POOLED side; exact,
  fine up to mid scale, the WindowExec warning in the bench tail).
- ``quantile_normalize_grid`` — the 100 TB form the docstring below always
  promised: rows map to a FIXED G-point quantile grid, and the grid's
  pooled order statistics are computed with NO global sort — a
  histogram + Fenwick-style binary prefix decomposition turns
  "count of rows ≤ v" into an equi-join of O(log D) aligned blocks per
  distinct value, all map-side-combined aggregates and keyed joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantile_normalize_frame(
    df: DataFrame, id_col: str, value_col: str, group_col: str
) -> DataFrame:
    """Map each row's within-group rank onto the pooled order statistic:
    target index = ((rn−1)·(N−1)) div (n_g−1) + 1 (1 when the group is a
    singleton) — pure integer arithmetic over (value, id) total orders.
    Returns (id_col, group_col, orig, normalized), both BIGINT.

    Scale: one window sort per group + one global sort for the pooled
    order statistics + an equi-join on the index; swap the pooled side
    for a fixed quantile grid at 100 TB (same join shape)."""
    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("long").alias("_v"),
    )
    ranked = src.select(
        "_id",
        "_g",
        "_v",
        F.row_number()
        .over(Window.partitionBy("_g").orderBy("_v", "_id"))
        .cast("long")
        .alias("_rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("_g"))
        .cast("long")
        .alias("_ns"),
    )
    pooled = src.select(
        F.col("_v").alias("_pv"),
        F.row_number()
        .over(Window.orderBy("_v", "_id"))
        .cast("long")
        .alias("_prow"),
    )
    n = src.count()  # one scalar — the table size, not data
    idx = ranked.select(
        "_id",
        "_g",
        "_v",
        F.when(F.col("_ns") == 1, F.lit(1).cast("long"))
        .otherwise(F.expr(f"((_rn - 1) * ({n} - 1)) div (_ns - 1) + 1"))
        .alias("_target"),
    )
    return idx.join(pooled, F.col("_target") == F.col("_prow")).select(
        F.col("_id").alias(id_col),
        F.col("_g").alias(group_col),
        F.col("_v").alias("orig"),
        F.col("_pv").alias("normalized"),
    )


GRID_LEVELS = 31  # binary prefix levels — covers any non-negative v < 2^31


def prefix_counts(hist: DataFrame, value_col: str = "_v", cnt_col: str = "_c",
                  levels: int = GRID_LEVELS) -> DataFrame:
    """cle(v) = #rows with value ≤ v, for every distinct value, WITHOUT a
    cumulative window: per-level aligned block counts (block of size 2^L
    containing w is floor(w / 2^L)) are one explode(levels)+groupBy over the
    DISTINCT-VALUE histogram; each value's prefix [0, v] then decomposes
    into its ≤``levels`` Fenwick blocks — for u = v+1, level L contributes
    iff bit L of u is set, with block index 2·(u >> (L+1)) — and one
    equi-join + sum reassembles the exact cumulative count. Everything is
    hash-partitioned aggregate + equi-join; nothing is sorted globally.

    Requires 0 ≤ value < 2^levels (filter/shift negatives upstream)."""
    blocks = (
        hist.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(L).alias("lv"),
                            F.shiftright(F.col(value_col), L).alias("blk"),
                        )
                        for L in range(levels)
                    ]
                )
            ).alias("k"),
            F.col(cnt_col),
        )
        .groupBy("k.lv", "k.blk")
        .agg(F.sum(cnt_col).alias("_bc"))
    )
    u = F.col(value_col) + F.lit(1)
    dec_terms = [
        F.when(
            F.shiftright(u, L).bitwiseAND(F.lit(1)) == 1,
            F.struct(
                F.lit(L).alias("lv"),
                (F.shiftright(u, L + 1) * 2).alias("blk"),
            ),
        )
        for L in range(levels)
    ]
    dec = hist.select(
        value_col,
        F.explode(F.array_compact(F.array(*dec_terms))).alias("k"),
    ).select(value_col, "k.lv", "k.blk")
    return (
        dec.join(blocks, ["lv", "blk"])
        .groupBy(value_col)
        .agg(F.sum("_bc").cast("long").alias("cle"))
    )


def quantile_normalize_grid(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_col: str,
    n_grid: int = 64,
) -> DataFrame:
    """Grid quantile normalization: each row's within-group rank maps to a
    grid cell g = ((rn−1)·G) div (n_g−1) ∈ [0, G] (singletons → 0), and the
    pooled value at grid rank pr_g = 1 + ((N−1)·g) div G replaces the raw
    score. Returns (id_col, group_col, orig, grid_q, normalized), BIGINTs.

    Exactly the quantile_normalize_frame recipe with the pooled side
    REPLACED by G+1 exact order statistics computed shuffle-only:
    per-group windows stay hash-partitioned; the pooled side is
    histogram → prefix_counts (equi-joins, no global sort) → a broadcast
    non-equi join against the G+1-row grid (cle ≥ pr → min value), i.e.
    the only "sort-free inverse CDF" the plan needs. At 100 TB nothing
    single-partition touches row-scale data: the histogram is
    value-domain-sized, the grid is 65 rows."""
    src = df.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_g"),
        F.col(value_col).cast("long").alias("_v"),
    )
    ranked = src.select(
        "_id",
        "_g",
        "_v",
        F.row_number()
        .over(Window.partitionBy("_g").orderBy("_v", "_id"))
        .cast("long")
        .alias("_rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("_g"))
        .cast("long")
        .alias("_ns"),
    )
    gq = ranked.select(
        "_id",
        "_g",
        "_v",
        F.when(F.col("_ns") == 1, F.lit(0).cast("long"))
        .otherwise(F.expr(f"((_rn - 1) * {n_grid}) div (_ns - 1)"))
        .alias("_gq"),
    )
    n = src.count()  # one scalar — the table size, not data
    hist = src.groupBy("_v").agg(F.count(F.lit(1)).cast("long").alias("_c"))
    cum = prefix_counts(hist)
    spark = df.sparkSession
    grid = spark.range(0, n_grid + 1).select(
        F.col("id").cast("long").alias("_grid"),
        (F.lit(1) + F.expr(f"(({n} - 1) * id) div {n_grid}")).cast("long").alias("_pr"),
    )
    gridvals = (
        cum.join(F.broadcast(grid), F.col("cle") >= F.col("_pr"))
        .groupBy("_grid")
        .agg(F.min("_v").alias("_gval"))
    )
    return gq.join(
        F.broadcast(gridvals), F.col("_gq") == F.col("_grid")
    ).select(
        F.col("_id").alias(id_col),
        F.col("_g").alias(group_col),
        F.col("_v").alias("orig"),
        F.col("_gq").alias("grid_q"),
        F.col("_gval").alias("normalized"),
    )
