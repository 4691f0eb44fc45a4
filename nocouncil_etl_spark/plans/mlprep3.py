"""ML-prep wave 3: in-engine decision-tree training step and checksum
validation.

- ``ml_best_split_gini`` — the CART split search: over banded candidate
  thresholds on a numeric feature, the weighted Gini impurity of a binary
  label, computed for ALL candidates from one cumulative table (no
  per-candidate re-scan) — the inner loop of decision-tree/GBDT training
  expressed as a distributed aggregate (model_naive_bayes_lang trains a
  classifier; this trains a split).
- ``fn_luhn_check`` — Luhn mod-10 checksum validation over synthesized
  16-digit account numbers: the classic ingest-time validity gate for
  card/IMEI-like identifiers, exact digit arithmetic on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

LABEL_CENTS = 46_710_000   # ~median per-customer max order value (cents·100)
BAND = 100_000             # candidate thresholds every 1000 currency units


@query(
    "ml_best_split_gini",
    oracle=f"""
WITH labeled AS (
  SELECT c.c_custkey,
         CAST(round(c.c_acctbal * 100) AS BIGINT) AS x,
         CASE WHEN (SELECT CAST(round(max(o.o_totalprice) * 100) AS BIGINT)
                    FROM orders o WHERE o.o_custkey = c.c_custkey)
              > {LABEL_CENTS} THEN 1 ELSE 0 END AS y
  FROM customer c
),
bands AS (
  SELECT CAST(floor(CAST(x AS DOUBLE) / {BAND}) AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS pos
  FROM labeled GROUP BY 1
),
cum AS (
  SELECT band,
         CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS n_left,
         CAST(sum(pos) OVER (ORDER BY band) AS BIGINT) AS pos_left
  FROM bands
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(pos) AS BIGINT) AS pos FROM bands
),
cand AS (
  SELECT (c.band + 1) * {BAND} - 1 AS threshold_cents,
         c.n_left, c.pos_left,
         t.n - c.n_left AS n_right, t.pos - c.pos_left AS pos_right
  FROM cum c CROSS JOIN tot t
  WHERE c.n_left < t.n
),
scored AS (
  SELECT threshold_cents, n_left, pos_left, n_right, pos_right,
         round(
           (n_left * (1.0
              - (CAST(pos_left AS DOUBLE) / n_left) * (CAST(pos_left AS DOUBLE) / n_left)
              - (CAST(n_left - pos_left AS DOUBLE) / n_left)
                * (CAST(n_left - pos_left AS DOUBLE) / n_left))
            + n_right * (1.0
              - (CAST(pos_right AS DOUBLE) / n_right) * (CAST(pos_right AS DOUBLE) / n_right)
              - (CAST(n_right - pos_right AS DOUBLE) / n_right)
                * (CAST(n_right - pos_right AS DOUBLE) / n_right)))
           / (n_left + CAST(n_right AS DOUBLE)), 6) AS weighted_gini
  FROM cand
)
SELECT threshold_cents, n_left, pos_left, n_right, pos_right, weighted_gini,
       CAST(row_number() OVER (ORDER BY weighted_gini, threshold_cents) = 1
            AS BOOLEAN) AS is_best
FROM scored
""",
)
def ml_best_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CART split search on account balance against the "customer has a
    high-value order" label (max order > {LABEL_CENTS} c·100): candidate
    thresholds at every {BAND}-cent band boundary, each scored with the
    weighted Gini impurity of its left/right partition — all candidates
    from ONE cumulative pass over the banded counts (the ECDF discipline),
    never a per-threshold re-scan. is_best flags the argmin (ties →
    smallest threshold). Counts exact BIGINTs; the impurity expression is
    identical scalar doubles rounded 6dp.

    Scale shape: label join is one keyed agg; band histogram is one
    combine-agg into ≤|range|/{BAND} groups; the cumulative window runs
    over the band table. Exactly the shape a distributed GBDT uses for
    histogram-based split finding (LightGBM-style) — the histogram IS the
    shuffle payload, never the rows."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    mx = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.round(F.max("o_totalprice") * 100).cast("long").alias("mx")
    )
    labeled = c.join(mx, "c_custkey", "left").select(
        F.round(F.col("c_acctbal") * 100).cast("long").alias("x"),
        F.when(F.col("mx") > LABEL_CENTS, 1).otherwise(0).alias("y"),
    )
    bands = labeled.groupBy(
        F.floor(F.col("x").cast("double") / BAND).cast("long").alias("band")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"),
    )
    w = Window.orderBy("band")
    cum = bands.select(
        "band",
        F.sum("n").over(w).cast("long").alias("n_left"),
        F.sum("pos").over(w).cast("long").alias("pos_left"),
    )
    tot = bands.agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("pos"),
    )
    cand = (
        cum.crossJoin(F.broadcast(tot))
        .filter(F.col("n_left") < F.col("n"))
        .select(
            ((F.col("band") + 1) * BAND - 1).alias("threshold_cents"),
            "n_left",
            "pos_left",
            (F.col("n") - F.col("n_left")).alias("n_right"),
            (F.col("pos") - F.col("pos_left")).alias("pos_right"),
        )
    )

    def gini(pos, n):
        p = pos.cast("double") / n
        q = (n - pos).cast("double") / n
        return 1.0 - p * p - q * q

    wg = F.round(
        (
            F.col("n_left") * gini(F.col("pos_left"), F.col("n_left"))
            + F.col("n_right") * gini(F.col("pos_right"), F.col("n_right"))
        )
        / (F.col("n_left") + F.col("n_right").cast("double")),
        6,
    )
    scored = cand.select(
        "threshold_cents",
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
        wg.alias("weighted_gini"),
    )
    return scored.select(
        "*",
        (
            F.row_number().over(
                Window.orderBy("weighted_gini", "threshold_cents")
            )
            == 1
        ).alias("is_best"),
    )


@query(
    "fn_luhn_check",
    oracle="""
WITH nums AS (
  SELECT o_orderkey,
         substring(regexp_replace(md5(CAST(o_orderkey AS VARCHAR)), '[a-f]', '', 'g')
                   || '0000000000000000', 1, 16) AS pan
  FROM orders WHERE o_orderkey % 29 = 0
),
digits AS (
  SELECT o_orderkey, pan, p.i AS pos,
         CAST(substring(pan, CAST(p.i AS INT), 1) AS BIGINT) AS d
  FROM nums, LATERAL (SELECT unnest(range(1, 17)) AS i) p
),
weighted AS (
  SELECT o_orderkey, pan,
         CASE WHEN (16 - pos) % 2 = 1 THEN
           CASE WHEN d * 2 > 9 THEN d * 2 - 9 ELSE d * 2 END
         ELSE d END AS wd
  FROM digits
)
SELECT o_orderkey, pan,
       CAST(sum(wd) AS BIGINT) AS luhn_sum,
       CAST(sum(wd) % 10 = 0 AS BOOLEAN) AS luhn_valid
FROM weighted GROUP BY o_orderkey, pan
""",
)
def fn_luhn_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn mod-10 validation over synthesized 16-digit identifiers (the
    digits of md5(o_orderkey) zero-padded — deterministic on both
    engines): double every second digit from the right, subtract 9 when
    it exceeds 9, valid iff the sum is ≡ 0 (mod 10). The ingest-time
    checksum gate for card/IMEI-shaped identifiers — on random digits
    ~10% validate, so both outcomes appear.

    Scale shape: a narrow per-row digit explode (16 rows) + combine-agg —
    a pure map-side computation; in production this folds into one scalar
    expression per row."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 29 == 0)
    nums = o.select(
        "o_orderkey",
        F.substring(
            F.concat(
                F.regexp_replace(
                    F.md5(F.col("o_orderkey").cast("string")), "[a-f]", ""
                ),
                F.lit("0000000000000000"),
            ),
            1,
            16,
        ).alias("pan"),
    )
    digits = nums.select(
        "o_orderkey",
        "pan",
        F.explode(F.expr("sequence(1, 16)")).alias("pos"),
    ).select(
        "o_orderkey",
        "pan",
        "pos",
        F.expr("CAST(substring(pan, CAST(pos AS INT), 1) AS BIGINT)").alias(
            "d"
        ),
    )
    wd = F.when(
        (16 - F.col("pos")) % 2 == 1,
        F.when(F.col("d") * 2 > 9, F.col("d") * 2 - 9).otherwise(
            F.col("d") * 2
        ),
    ).otherwise(F.col("d"))
    return (
        digits.select("o_orderkey", "pan", wd.alias("wd"))
        .groupBy("o_orderkey", "pan")
        .agg(
            F.sum("wd").cast("long").alias("luhn_sum"),
            (F.sum("wd") % 10 == 0).alias("luhn_valid"),
        )
    )
