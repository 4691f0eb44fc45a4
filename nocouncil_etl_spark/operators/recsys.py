"""Recommender kernels shared by plans/breadth10.py and Engine.covisitation.

Item-to-item covisitation: the candidate-generation workhorse of
large-scale recommenders, expressed as basket-bounded joins — never an
all-pairs item scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

REC_SCALE = 1_000_000


def covisitation_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int,
    scale: int = REC_SCALE,
) -> DataFrame:
    """Top-k co-visited items per item from (basket, item) pairs: score =
    co²·scale/(cnt_a·cnt_b) — squared cosine of the binary incidence
    vectors in exact integer 1/scale units, monotone in cosine — ranked
    per item with a total (score, co, rec) tie order. Returns (item, rec,
    co, score_1e6, rk).

    Scale shape: the self-join is keyed on the basket id, so the
    quadratic term is bounded by basket size; pair counts are map-side
    combinable; the frequency joins hit the item dimension; top-k is one
    window over scored pairs."""
    b = baskets.select(
        F.col(basket_col).alias("ok"), F.col(item_col).alias("item")
    ).distinct()
    cnt = b.groupBy("item").agg(F.count("*").cast("long").alias("c"))
    a = b.select("ok", F.col("item").alias("ia"))
    bb = b.select("ok", F.col("item").alias("ib"))
    pairs = (
        a.join(bb, "ok")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").cast("long").alias("co"))
    )
    sym = pairs.select(
        F.col("ia").alias("item"), F.col("ib").alias("rec"), "co"
    ).unionByName(
        pairs.select(F.col("ib").alias("item"), F.col("ia").alias("rec"), "co")
    )
    scored = (
        sym.join(cnt.select(F.col("item"), F.col("c").alias("ca")), "item")
        .join(cnt.select(F.col("item").alias("rec"), F.col("c").alias("cb")), "rec")
        .select(
            "item",
            "rec",
            "co",
            F.expr(f"(co * co * {scale}) div (ca * cb)")
            .cast("long")
            .alias("score_1e6"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.desc("score_1e6"), F.desc("co"), F.asc("rec")
    )
    return scored.select(
        "item",
        "rec",
        "co",
        "score_1e6",
        F.row_number().over(w).cast("int").alias("rk"),
    ).filter(F.col("rk") <= k)
