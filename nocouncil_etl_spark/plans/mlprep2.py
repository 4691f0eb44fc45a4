"""ML-prep wave 2: feature relevance and pipeline freshness.

- ``ml_mutual_information`` — rank categorical features by mutual
  information with a label, the model-free feature-selection step before
  training a classifier (the information-theoretic sibling of the
  chi-square independence test in evalstats): MI(X;Y) = Σ p(x,y)·
  ln(p(x,y)/(p(x)p(y))), every term an exact count ratio with the ln on
  identical doubles, quantized to DECIMAL(18,6) before the sum.
- ``dq_freshness_lag`` — per-source freshness audit against the dataset's
  own frontier (max event time — no wall clock, so both engines agree):
  lag minutes, row counts, and an SLO breach flag. The check a daily-cron
  pipeline (reference sample_cron_job.sh) runs before trusting any
  downstream rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

# label: customer has positive account balance (a clean binary attribute)
_LABEL_SQL = "CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END"
_FEATURES = ("c_mktsegment", "c_nationkey")
FRESH_SLO_MIN = 25  # minutes behind the frontier before a source breaches


def _mi_oracle() -> str:
    branches = []
    for f in _FEATURES:
        branches.append(f"""
SELECT '{f}' AS feature, CAST({f} AS VARCHAR) AS x, {_LABEL_SQL} AS y
FROM customer""")
    return f"""
WITH obs AS ({" UNION ALL ".join(branches)}),
joint AS (
  SELECT feature, x, y, CAST(count(*) AS BIGINT) AS nxy
  FROM obs GROUP BY feature, x, y
),
margx AS (
  SELECT feature, x, CAST(sum(nxy) AS BIGINT) AS nx FROM joint GROUP BY feature, x
),
margy AS (
  SELECT feature, y, CAST(sum(nxy) AS BIGINT) AS ny FROM joint GROUP BY feature, y
),
tot AS (SELECT feature, CAST(sum(nxy) AS BIGINT) AS n FROM joint GROUP BY feature),
terms AS (
  SELECT j.feature,
         CAST(round((CAST(j.nxy AS DOUBLE) / t.n)
               * ln(CAST(j.nxy AS DOUBLE) * t.n
                    / (CAST(mx.nx AS DOUBLE) * my.ny)), 6)
              AS DECIMAL(18, 6)) AS mi_part,
         j.nxy, t.n
  FROM joint j
  JOIN margx mx ON mx.feature = j.feature AND mx.x = j.x
  JOIN margy my ON my.feature = j.feature AND my.y = j.y
  JOIN tot t ON t.feature = j.feature
),
hx AS (
  SELECT feature,
         sum(CAST(round(-(CAST(nx AS DOUBLE) / t.n)
                        * ln(CAST(nx AS DOUBLE) / t.n), 6)
                  AS DECIMAL(18, 6))) AS h_feature,
         CAST(count(*) AS BIGINT) AS n_levels
  FROM margx JOIN tot t USING (feature) GROUP BY feature
)
SELECT t.feature,
       CAST(sum(t.mi_part) AS DOUBLE) AS mi_nats,
       CAST(any_value(h.h_feature) AS DOUBLE) AS h_feature,
       any_value(h.n_levels) AS n_levels,
       round(CAST(sum(t.mi_part) AS DOUBLE)
             / CAST(any_value(h.h_feature) AS DOUBLE), 6) AS mi_ratio
FROM terms t JOIN hx h ON h.feature = t.feature
GROUP BY t.feature
"""


@query("ml_mutual_information", oracle=_mi_oracle())
def ml_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information of each categorical feature with the
    positive-balance label: MI = Σ_xy (n_xy/n)·ln(n_xy·n/(n_x·n_y)),
    each term DECIMAL-quantized before the sum (combine-order-free), plus
    the feature entropy H(X) and the normalized ratio MI/H(X) — the
    feature-selection sheet. ln() runs on exact count ratios (identical
    doubles both engines, the established libm-parity grid).

    Scale shape: one (feature, x, y) hash-agg per feature (unioned —
    contingency-table-sized state), broadcast-joined marginals, a
    |features|-row result. At 100 TB: still one shuffle per feature
    column, state bounded by cardinality, not rows."""
    c = load(spark, sf_dir, "customer")
    obs = None
    for f in _FEATURES:
        branch = c.select(
            F.lit(f).alias("feature"),
            F.col(f).cast("string").alias("x"),
            F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("y"),
        )
        obs = branch if obs is None else obs.unionByName(branch)
    joint = obs.groupBy("feature", "x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("nxy")
    )
    joint.persist()
    margx = joint.groupBy("feature", "x").agg(
        F.sum("nxy").cast("long").alias("nx")
    )
    margy = joint.groupBy("feature", "y").agg(
        F.sum("nxy").cast("long").alias("ny")
    )
    tot = joint.groupBy("feature").agg(F.sum("nxy").cast("long").alias("n"))
    terms = (
        joint.join(margx, ["feature", "x"])
        .join(margy, ["feature", "y"])
        .join(F.broadcast(tot), "feature")
        .select(
            "feature",
            F.round(
                (F.col("nxy").cast("double") / F.col("n"))
                * F.log(
                    F.col("nxy").cast("double")
                    * F.col("n")
                    / (F.col("nx").cast("double") * F.col("ny"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("mi_part"),
        )
    )
    hx = (
        margx.join(F.broadcast(tot), "feature")
        .select(
            "feature",
            F.round(
                -(F.col("nx").cast("double") / F.col("n"))
                * F.log(F.col("nx").cast("double") / F.col("n")),
                6,
            )
            .cast("decimal(18,6)")
            .alias("h_part"),
        )
        .groupBy("feature")
        .agg(
            F.sum("h_part").alias("h_feature"),
            F.count(F.lit(1)).cast("long").alias("n_levels"),
        )
    )
    mi = terms.groupBy("feature").agg(F.sum("mi_part").alias("mi_dec"))
    return mi.join(hx, "feature").select(
        "feature",
        F.col("mi_dec").cast("double").alias("mi_nats"),
        F.col("h_feature").cast("double").alias("h_feature"),
        "n_levels",
        F.round(
            F.col("mi_dec").cast("double")
            / F.col("h_feature").cast("double"),
            6,
        ).alias("mi_ratio"),
    )


@query(
    "dq_freshness_lag",
    oracle=f"""
WITH frontier AS (
  SELECT max(ts) AS fmax FROM events
),
per_type AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
         max(ts) AS latest
  FROM events GROUP BY event_type
)
SELECT p.event_type,
       p.n_rows,
       CAST(epoch_us(p.latest) AS BIGINT) AS latest_us,
       CAST((epoch_us(f.fmax) - epoch_us(p.latest)) // 60000000 AS BIGINT)
         AS lag_minutes,
       CAST((epoch_us(f.fmax) - epoch_us(p.latest)) // 60000000
            > {FRESH_SLO_MIN} AS BOOLEAN) AS slo_breach
FROM per_type p CROSS JOIN frontier f
""",
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness audit per event source (event_type standing in for the
    upstream feed): minutes behind the dataset's own frontier (global max
    event time — deterministic, no wall clock), with an SLO flag at
    {FRESH_SLO_MIN} minutes. Timestamps cross the engine boundary as epoch
    microseconds (the registry's timestamp discipline).

    Scale shape: two max/count aggs — one grouped, one global (broadcast
    back). The audit is O(sources) output regardless of stream size."""
    ev = load(spark, sf_dir, "events")
    frontier = ev.agg(F.max("ts").alias("fmax"))
    per_type = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.max("ts").alias("latest"),
    )
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    lag_min = F.expr(
        "CAST((unix_micros(fmax) - unix_micros(latest)) div 60000000 AS BIGINT)"
    )
    return per_type.crossJoin(F.broadcast(frontier)).select(
        "event_type",
        "n_rows",
        us("latest").cast("long").alias("latest_us"),
        lag_min.alias("lag_minutes"),
        (lag_min > FRESH_SLO_MIN).alias("slo_breach"),
    )


# --------------------------------------------------------------------------
# Median imputation (planted missingness)
# --------------------------------------------------------------------------


@query(
    "ml_impute_median",
    oracle="""
WITH masked AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 13 = 0 THEN NULL
              ELSE CAST(n_chars AS BIGINT) END AS v
  FROM documents
),
obs AS (
  SELECT source, v, doc_id,
         CAST(row_number() OVER (PARTITION BY source ORDER BY v, doc_id)
              AS BIGINT) AS rn,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS cnt
  FROM masked WHERE v IS NOT NULL
),
med AS (
  SELECT source, v AS med FROM obs WHERE rn = (cnt + 1) // 2
)
SELECT m.doc_id, m.source,
       coalesce(m.v, d.med) AS value_filled,
       CAST(m.v IS NULL AS BOOLEAN) AS was_imputed
FROM masked m JOIN med d ON d.source = m.source
""",
)
def ml_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group median imputation with planted missingness (doc_id % 13
    → NULL, so both engines mask the identical rows — ground truth by
    construction): each missing value is filled with its source's exact
    lower median of the OBSERVED values (rank pick, (value, id) total
    order). Emits every row with the fill flag — the standard tabular
    preprocessing step, exact and reproducible.

    Scale shape: one window sort per source partition for the rank-picked
    median (groups sort independently — no global sort), then a broadcast
    join of the |sources|-row median table back onto the data."""
    docs = load(spark, sf_dir, "documents")
    masked = docs.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 13 == 0, F.lit(None))
        .otherwise(F.col("n_chars").cast("long"))
        .alias("v"),
    )
    obs = masked.filter(F.col("v").isNotNull()).select(
        "source",
        "v",
        "doc_id",
        F.row_number()
        .over(Window.partitionBy("source").orderBy("v", "doc_id"))
        .cast("long")
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("source"))
        .cast("long")
        .alias("cnt"),
    )
    med = obs.filter(
        F.col("rn") == F.expr("(cnt + 1) div 2")
    ).select("source", F.col("v").alias("med"))
    return masked.join(F.broadcast(med), "source").select(
        "doc_id",
        "source",
        F.coalesce("v", "med").alias("value_filled"),
        F.col("v").isNull().alias("was_imputed"),
    )
