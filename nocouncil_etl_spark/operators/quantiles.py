"""Exact quantile-normalization kernel, shared by the oracle-checked plan
(normalization_plans.curation_quantile_normalize) and the Engine facade
verb — one implementation of the index arithmetic (the shared-operator
contract from the gapfill advice item).
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
