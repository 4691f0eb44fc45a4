"""Range join, hypertable-style continuous aggregates, positional explode —
operators Spark lacks natively, composed from built-ins (SURVEY.md §4.2
pattern: rewrite to equi-join on a derived key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.numeric import exact_sum
from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

BUCKET_US = 600_000_000  # 10 minutes


@query(
    "join_range_bucketed",
    oracle="""
SELECT e.event_id,
       count(p.event_id) AS n_preceding
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN events p
  ON p.user_id = e.user_id
 AND p.event_id <> e.event_id
 AND epoch_us(p.ts) <= epoch_us(e.ts)
 AND epoch_us(p.ts) > epoch_us(e.ts) - 600000000
GROUP BY e.event_id
""",
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join via bucketing: 'events in the 10 minutes before
    each error'. Spark has no native range join; the naive form is a
    quadratic theta join. Rewrite: bucket both sides by floor(ts/width); each
    probe checks buckets {b-1, b} via an exploded candidate key, so the plan
    is an equi-join on (user_id, bucket) + a residual filter — linear and
    shuffle-partitioned (SURVEY §4.2-2 applied to ranges)."""
    ev = load(spark, sf_dir, "events").withColumn("t_us", F.unix_micros("ts"))
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"),
        F.col("user_id"),
        F.col("t_us").alias("e_t"),
        F.explode(
            F.array(
                F.floor(F.col("t_us") / BUCKET_US) - 1,
                F.floor(F.col("t_us") / BUCKET_US),
            )
        ).alias("bucket"),
    )
    probes = ev.select(
        F.col("event_id").alias("p_id"),
        F.col("user_id"),
        F.col("t_us").alias("p_t"),
        F.floor(F.col("t_us") / BUCKET_US).alias("bucket"),
    )
    hits = (
        errors.join(probes, ["user_id", "bucket"])
        .filter(
            (F.col("p_id") != F.col("e_id"))
            & (F.col("p_t") <= F.col("e_t"))
            & (F.col("p_t") > F.col("e_t") - BUCKET_US)
        )
        .groupBy("e_id")
        .agg(F.count(F.lit(1)).alias("n_preceding"))
    )
    # left semantics: errors with zero preceding events still appear
    all_errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id")
    )
    return (
        all_errors.join(hits, "e_id", "left")
        .select(
            F.col("e_id").alias("event_id"),
            F.coalesce("n_preceding", F.lit(0)).alias("n_preceding"),
        )
    )


@query(
    "rollup_timeseries",
    oracle="""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n, sum(CAST(value AS DECIMAL(18,6))) AS total
  FROM events GROUP BY 1, 2
)
SELECT epoch_us(date_trunc('day', h)) AS day_us, event_type,
       CAST(sum(n) AS BIGINT) AS n, CAST(round(sum(total), 2) AS DOUBLE) AS total,
       count(*) AS hours_with_data
FROM hourly
GROUP BY 1, 2
""",
)
def rollup_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: daily rollup computed FROM the
    hourly aggregate, not from raw rows — the multi-resolution pattern that
    makes 100 TB dashboards cheap (each resolution reads the previous one;
    sums/counts compose). Sums run on DECIMAL(18,6)-quantized values so the
    rollup is order-independent (functions.numeric): round 1's only driver
    hash flake was this query's round(sum(double)) straddling a .005
    boundary under a different combine order."""
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), exact_sum("value").alias("total"))
    )
    daily = (
        hourly.groupBy(F.date_trunc("day", "h").alias("d"), "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("total"), 2).cast("double").alias("total"),
            F.count(F.lit(1)).alias("hours_with_data"),
        )
    )
    return daily.select(
        F.unix_micros(F.col("d").cast("timestamp")).alias("day_us"),
        "event_type",
        "n",
        "total",
        "hours_with_data",
    )


@query(
    "explode_positions",
    oracle="""
WITH ws AS (SELECT doc_id, (string_split(text, ' '))[1:5] AS w FROM documents)
SELECT doc_id,
       CAST(unnest(range(0, len(w))) AS INT) AS pos,
       unnest(w) AS word
FROM ws
""",
)
def explode_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode surface: first-5 words with positions (zipped unnest on the
    oracle side)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.posexplode(F.slice(F.split("text", " "), 1, 5)).alias("pos", "word")
    )


A_LEN_US = 1_800_000_000   # purchase activity window: 30 min after
B_PAD_US = 600_000_000     # error investigation window: ±10 min
OVL_BUCKET_US = 1_800_000_000


@query(
    "join_interval_overlap",
    oracle=f"""
WITH a AS (
  SELECT event_id AS a_id, user_id,
         epoch_us(ts) AS s, epoch_us(ts) + {A_LEN_US} AS e
  FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT event_id AS b_id, user_id,
         epoch_us(ts) - {B_PAD_US} AS s, epoch_us(ts) + {B_PAD_US} AS e
  FROM events WHERE event_type = 'error'
)
SELECT a.a_id, b.b_id,
       least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
FROM a JOIN b
  ON a.user_id = b.user_id AND a.s <= b.e AND b.s <= a.e
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (the interval×interval sibling of
    join_range_bucketed's point-in-interval): per user, every purchase
    activity window [t, t+30 min] paired with every overlapping error
    window [t−10 min, t+10 min], with the exact overlap duration. The
    calendar/genomics overlap shape Spark has no native operator for.

    Scale shape: each interval explodes to the 30-min buckets it covers
    (bounded fan-out — an interval spans ≤ 3 buckets by construction), the
    candidate join is equi on (user, bucket), pairs dedupe through
    distinct, and the overlap predicate is a residual filter — the naive
    theta join (the oracle's formulation, fine at oracle scale) would be
    quadratic per user at 100 TB."""
    ev = load(spark, sf_dir, "events").withColumn("t_us", F.unix_micros("ts"))
    a = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("a_id"),
        "user_id",
        F.col("t_us").alias("a_s"),
        (F.col("t_us") + A_LEN_US).alias("a_e"),
    )
    b = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("b_id"),
        "user_id",
        (F.col("t_us") - B_PAD_US).alias("b_s"),
        (F.col("t_us") + B_PAD_US).alias("b_e"),
    )

    def bucketed(df, s, e):
        return df.withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / OVL_BUCKET_US),
                    F.floor(F.col(e) / OVL_BUCKET_US),
                )
            ),
        )

    pairs = (
        bucketed(a, "a_s", "a_e")
        .join(bucketed(b, "b_s", "b_e"), ["user_id", "bucket"])
        .filter(
            (F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e"))
        )
        .select(
            "a_id",
            "b_id",
            (
                F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
            ).alias("overlap_us"),
        )
        .distinct()
    )
    return pairs
