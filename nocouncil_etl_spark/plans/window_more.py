"""Additional window-frame and collection-aggregate surface: moving average,
distribution ranks, sorted distinct collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import cumulate, with_global_rank
from nocouncil_etl_spark.registry import query


@query(
    "window_moving_avg",
    oracle="""
SELECT event_id, user_id,
       round(CAST(sum(CAST(value AS DECIMAL(18,6)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg,
       count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS frame_n
FROM events
""",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-frame window: 4-row moving average per user — the smoothing
    primitive for the time-series rollups. Mean = exact decimal frame sum /
    frame count (window combine order is engine-internal, see
    functions.numeric)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    frame_sum = F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
    frame_n = F.count(F.lit(1)).over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.round(frame_sum / frame_n, 4).alias("mov_avg"),
        frame_n.alias("frame_n"),
    )


@query(
    "window_distribution",
    oracle="""
SELECT c_custkey,
       round(percent_rank() OVER (ORDER BY round(c_acctbal, 2), c_custkey), 6) AS pr,
       round(cume_dist() OVER (ORDER BY round(c_acctbal, 2)), 6) AS cd
FROM customer
""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks: percent_rank / cume_dist over account balance.

    r7: windowless — percent_rank = (rank − 1)/(n − 1) on the
    with_global_rank total order (the tie-break makes rank ≡
    row_number), cume_dist = inclusive cumulative count / n straight
    from the Fenwick balance histogram; no global sort at any scale."""
    c = load(spark, sf_dir, "customer")
    src = c.select(
        "c_custkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("b100"),
    )
    tot = src.agg(F.count(F.lit(1)).cast("long").alias("n"))
    byv = src.groupBy("b100").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cd_tab = cumulate(byv, "b100", ("c",)).select(
        "b100", F.col("cum_c").alias("cle")
    )
    return (
        with_global_rank(src, "b100", "c_custkey", "r")
        .join(cd_tab, "b100")
        .crossJoin(F.broadcast(tot))
        .select(
            "c_custkey",
            F.round((F.col("r") - 1) / (F.col("n") - 1), 6).alias("pr"),
            F.round(F.col("cle") / F.col("n"), 6).alias("cd"),
        )
    )


@query(
    "agg_collect_set_sorted",
    oracle="""
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
       count(DISTINCT event_type) AS n_types
FROM events
GROUP BY user_id
""",
)
def agg_collect_set_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted distinct collection per group — set-valued aggregation made
    deterministic by an explicit sort (SURVEY §7.3-2: never iterate unsorted
    sets)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias("types"),
        F.countDistinct("event_type").alias("n_types"),
    )


DAU_WINDOW_DAYS = 7


@query(
    "window_rolling_distinct_users",
    oracle=f"""
WITH days AS (
  SELECT CAST(ts AS DATE) AS d, user_id FROM events
),
fan AS (
  SELECT d + CAST(unnest(range(0, {DAU_WINDOW_DAYS})) AS INTEGER) AS wday, user_id
  FROM (SELECT DISTINCT d, user_id FROM days)
),
base AS (SELECT DISTINCT CAST(ts AS DATE) AS wday FROM events)
SELECT epoch_us(CAST(b.wday AS TIMESTAMP)) AS day_us,
       count(DISTINCT f.user_id) AS active_users_7d
FROM base b JOIN fan f ON f.wday = b.wday
GROUP BY b.wday
""",
)
def window_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct actives per day (the DAU/WAU retention
    metric): a DISTINCT over a sliding window cannot ride a window frame
    (distinct doesn't decompose), so each (day, user) contributes itself
    to the {DAU_WINDOW_DAYS} window-days it belongs to — fan-out
    {DAU_WINDOW_DAYS} rows per distinct (day, user), then one
    count(DISTINCT) per window-day, restricted to days the data actually
    covers. The standard rewrite that turns an O(n·w) re-scan into one
    explode + one distinct agg.

    Scale shape: the fan-out is per DISTINCT (day, user) — bounded by
    actives, not events; the distinct agg partial-aggregates map-side."""
    ev = load(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    du = ev.distinct()
    fan = du.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(DAU_WINDOW_DAYS - 1))
        ).alias("k"),
        "d",
        "user_id",
    ).select(F.date_add("d", F.col("k")).alias("wday"), "user_id")
    base = ev.select(F.col("d").alias("wday")).distinct()
    return (
        base.join(fan, "wday")
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
        .select(
            F.unix_micros(F.col("wday").cast("timestamp")).alias("day_us"),
            "active_users_7d",
        )
    )


@query(
    "window_activity_streaks",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
g AS (
  SELECT user_id, d,
         d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                  AS INTEGER) AS anchor
  FROM days
),
streaks AS (
  SELECT user_id, anchor, count(*) AS len FROM g GROUP BY user_id, anchor
)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(sum(len) AS BIGINT) AS active_days
FROM streaks GROUP BY user_id
""",
)
def window_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user — longest streak, streak
    count, total active days — via the date-minus-rank trick: within a
    user's sorted distinct days, consecutive dates share (d − rank), so
    one group-by on that anchor collapses each run. The engagement metric
    behind retention dashboards, and the canonical consecutive-sequence
    idiom the gaps-and-islands family lacked.

    Scale shape: distinct (user, day) bounded by actives × days; one
    window rank + two keyed aggs, all on the user key."""
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    g = days.select(
        "user_id",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("anchor"),
    )
    streaks = g.groupBy("user_id", "anchor").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.max("len").cast("long").alias("longest_streak"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.sum("len").cast("long").alias("active_days"),
    )
