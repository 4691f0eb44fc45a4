"""Joins (SURVEY.md §2.6 J1-J6 + the join surface the engine exposes beyond
the reference: semi/anti/intersect/except and an as-of join).

Scale notes: dimension sides are broadcast (J1/J2); the contains-join (J3) is
rewritten to a derived-key equi join instead of a broadcast-nested-loop — the
rewrite is the difference between O(n·m) and a shuffle hash join at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.numeric import rsum, rsum_sql
from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.registry import query


@query(
    "join_lookup",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
""",
)
def join_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: lookup (left-outer equi) join, dim side broadcast — the
    `video→box_link` dict probe at transcribe_council.py:92-98."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_merge_coalesce",
    oracle="""
WITH old AS (
  SELECT o_orderkey, 'link_' || o_orderkey AS box_link
  FROM orders WHERE o_orderkey % 3 = 0
)
SELECT o.o_orderkey,
       coalesce(old.box_link, 'fresh_' || o.o_orderkey) AS box_link
FROM orders o LEFT JOIN old ON o.o_orderkey = old.o_orderkey
""",
)
def join_merge_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: join + coalesce merge-preserve — keep existing box_link, else mint
    a fresh one (get_box_links.py:43-68, apply at :68)."""
    o = load(spark, sf_dir, "orders")
    old = (
        o.filter(F.col("o_orderkey") % 3 == 0)
        .select("o_orderkey", F.concat(F.lit("link_"), "o_orderkey").alias("box_link"))
    )
    return (
        o.join(F.broadcast(old), "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce("box_link", F.concat(F.lit("fresh_"), "o_orderkey")).alias("box_link"),
        )
    )


@query(
    "join_anti_seen",
    oracle="""
SELECT e.event_id, e.event_type
FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM events s WHERE s.event_id % 10 = 0 AND s.event_id = e.event_id
)
""",
)
def join_anti_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: existence anti-join dedup gate — skip records whose id is already
    in the seen-set (newscrawler.py:125-127,366-369). At scale the seen-set is
    a parquet table; the anti-join replaces the in-memory python set."""
    ev = load(spark, sf_dir, "events")
    seen = ev.filter(F.col("event_id") % 10 == 0).select("event_id")
    return ev.join(seen, "event_id", "left_anti").select("event_id", "event_type")


@query(
    "join_semi_exists",
    oracle="""
SELECT o.o_orderkey, o.o_custkey
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
)
""",
)
def join_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5-adjacent: existence check as a left-semi join (skip-if-exists logic
    at transcribe_council.py:119,127 / summarize.py:174, inverted)."""
    o = load(spark, sf_dir, "orders")
    rich = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return o.join(rich, o.o_custkey == rich.c_custkey, "left_semi").select(
        "o_orderkey", "o_custkey"
    )


@query(
    "join_first_match",
    oracle="""
SELECT l_orderkey, l_linenumber, l_partkey
FROM (
  SELECT l_orderkey, l_linenumber, l_partkey,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_linenumber, l_partkey) AS rn
  FROM lineitem
)
WHERE rn = 1
""",
)
def join_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: first-match semantics with a deterministic tie-break — the
    `.iloc[0]` after a contains-filter (vectorize.py:64, get_box_links.py:49)
    becomes row_number over an explicit ordering (SURVEY §7.3-1)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey")
    )


@query(
    "join_contains_rewrite",
    oracle="""
WITH doc_tokens AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
),
part_keyed AS (
  SELECT p_partkey, string_split(p_name, ' ')[1] AS token FROM part
)
SELECT d.doc_id, min(p.p_partkey) AS first_partkey
FROM doc_tokens d JOIN part_keyed p ON d.token = p.token
GROUP BY d.doc_id
""",
)
def join_contains_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: contains/theta join rewritten to a derived-key equi join
    (SURVEY §4.2-2). Reference joins via `df.video.str.contains(item.name)`
    (get_box_links.py:48-49) — a quadratic scan; deriving the join key
    (token) turns it into a shuffle hash join that scales linearly.
    First-match = min(partkey), J6's deterministic tie-break."""
    docs = load(spark, sf_dir, "documents")
    parts = load(spark, sf_dir, "part")
    # array_distinct dedupes within the doc BEFORE the explode, so the
    # (doc_id, token) rows are already globally unique — a post-explode
    # .distinct() would re-shuffle the whole token multiset for nothing
    doc_tokens = fan_out(docs).select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )
    part_keyed = parts.select(
        "p_partkey", F.element_at(F.split("p_name", " "), 1).alias("token")
    )
    return (
        doc_tokens.join(F.broadcast(part_keyed), "token")
        .groupBy("doc_id")
        .agg(F.min("p_partkey").alias("first_partkey"))
    )


@query(
    "join_asof",
    oracle="""
SELECT e.event_id, e.user_id, epoch_us(s.ts) AS last_signup_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (engine extension; Spark lacks a native one): for each
    purchase, the most recent prior-or-equal signup of the same user.
    Implemented as union-tag + last_value over an ordered window — one shuffle
    on (user_id), no quadratic pairing; at 100 TB this beats a range
    cross-join by orders of magnitude.
    """
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_left"), F.col("ts").alias("sig_ts")
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("is_left"),
        F.col("ts").alias("sig_ts"),
    )
    merged = left.unionByName(right)
    # right rows sort before left rows at equal ts so `>=` semantics hold
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last(F.when(F.col("is_left") == 0, F.col("sig_ts")), ignorenulls=True).over(w)
    return (
        merged.withColumn("last_signup", carried)
        .filter(F.col("is_left") == 1)
        .select("event_id", "user_id", F.unix_micros("last_signup").alias("last_signup_us"))
    )


@query(
    "set_intersect",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'signup'
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op surface (SURVEY §2.8): users who both signed up and purchased."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op surface: viewers who never purchased."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "view").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.subtract(b)  # EXCEPT DISTINCT semantics, matching the SQL oracle


@query(
    "join_asof_forward",
    oracle="""
SELECT e.event_id, e.user_id, epoch_us(c.ts) AS next_click_us
FROM (SELECT * FROM events WHERE event_type = 'view') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts <= c.ts
""",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each view, the EARLIEST at-or-after click of
    the same user — the "what happened next" direction (merge_asof
    direction='forward'). Same union-tag idiom as join_asof, mirrored: first
    right-row timestamp over the FOLLOWING window; left rows sort before
    right rows at equal ts so `<=` semantics hold.

    Scale shape: one (user_id) shuffle + ordered scan; no range cross-join."""
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_right"),
        F.col("ts").alias("r_ts"),
    )
    right = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.lit(1).alias("is_right"),
        F.col("ts").alias("r_ts"),
    )
    merged = left.unionByName(right)
    # running frame over the REVERSED order, not (0, unboundedFollowing):
    # Spark re-scans the whole tail per row for following frames (O(n^2)
    # per user), while the preceding frame is incremental. Same rows: at
    # equal ts the right row sorts before the left row here, exactly as it
    # sorted after it in the forward order.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("is_right"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last(
        F.when(F.col("is_right") == 1, F.col("r_ts")), ignorenulls=True
    ).over(w)
    return (
        merged.withColumn("next_click", carried)
        .filter(F.col("is_right") == 0)
        .select("event_id", "user_id", F.unix_micros("next_click").alias("next_click_us"))
    )


ASOF_TOL_US = 7 * 86400 * 1_000_000  # 7 days


@query(
    "join_asof_tolerance",
    oracle=f"""
SELECT e.event_id, e.user_id,
       CASE WHEN epoch_us(e.ts) - epoch_us(s.ts) <= {ASOF_TOL_US}
            THEN epoch_us(s.ts) END AS recent_signup_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON e.user_id = s.user_id AND e.ts >= s.ts
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a staleness bound (merge_asof tolerance=7d): the
    most recent prior signup counts only if it is within 7 days of the
    purchase; staler matches null out but the left row survives — exactly
    how a feature-store point-in-time lookup treats expired features.

    Scale shape: identical to join_asof (carry over one ordered window);
    the tolerance is a post-carry CASE, not a second join."""
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_left"),
        F.col("ts").alias("sig_ts"),
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("is_left"),
        F.col("ts").alias("sig_ts"),
    )
    merged = left.unionByName(right)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last(
        F.when(F.col("is_left") == 0, F.col("sig_ts")), ignorenulls=True
    ).over(w)
    fresh = F.when(
        F.unix_micros("ts") - F.unix_micros(F.col("last_signup")) <= ASOF_TOL_US,
        F.unix_micros(F.col("last_signup")),
    )
    return (
        merged.withColumn("last_signup", carried)
        .filter(F.col("is_left") == 1)
        .select("event_id", "user_id", fresh.alias("recent_signup_us"))
    )


@query(
    "join_asof_nearest",
    oracle="""
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
s AS (SELECT * FROM events WHERE event_type = 'signup'),
b AS (
  SELECT e.event_id, e.user_id, e.ts, s.ts AS bts
  FROM p e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts >= s.ts
),
f AS (
  SELECT e.event_id, s.ts AS fts
  FROM p e ASOF LEFT JOIN s ON e.user_id = s.user_id AND e.ts <= s.ts
)
SELECT b.event_id, b.user_id,
       CASE
         WHEN bts IS NULL AND fts IS NULL THEN NULL
         WHEN fts IS NULL THEN epoch_us(bts)
         WHEN bts IS NULL THEN epoch_us(fts)
         WHEN epoch_us(b.ts) - epoch_us(bts)
              <= epoch_us(fts) - epoch_us(b.ts) THEN epoch_us(bts)
         ELSE epoch_us(fts)
       END AS nearest_signup_us
FROM b JOIN f USING (event_id)
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (merge_asof direction='nearest'): for
    each purchase, the signup CLOSEST in time in either direction, ties
    choosing the earlier (backward) match. One union-tag pass computes
    BOTH carries — the backward window orders signups before purchases at
    equal ts (so `>=` is inclusive) and the forward window orders them
    after (so `<=` is inclusive) — then a CASE picks the smaller |Δt|.
    The oracle composes DuckDB's native backward and forward ASOF joins,
    an independent formulation of the same semantics.

    Scale shape: one (user_id) shuffle feeding two ordered window scans;
    no range cross-join, no second shuffle (same partition key)."""
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_left"),
        F.col("ts").alias("sig_ts"),
    )
    right = ev.filter(F.col("event_type") == "signup").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        "ts",
        F.lit(0).alias("is_left"),
        F.col("ts").alias("sig_ts"),
    )
    merged = left.unionByName(right)
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # reversed running frame — a following frame is O(n^2) per user in
    # Spark (tail rescan per row); see join_asof_forward
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), "is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_sig = F.when(F.col("is_left") == 0, F.col("sig_ts"))
    out = merged.select(
        "event_id",
        "user_id",
        "ts",
        "is_left",
        F.last(is_sig, ignorenulls=True).over(w_back).alias("bts"),
        F.last(is_sig, ignorenulls=True).over(w_fwd).alias("fts"),
    ).filter(F.col("is_left") == 1)
    t, bts, fts = F.unix_micros("ts"), F.unix_micros("bts"), F.unix_micros("fts")
    nearest = (
        F.when(F.col("bts").isNull() & F.col("fts").isNull(), F.lit(None))
        .when(F.col("fts").isNull(), bts)
        .when(F.col("bts").isNull(), fts)
        .when(t - bts <= fts - t, bts)
        .otherwise(fts)
    )
    return out.select(
        "event_id", "user_id", nearest.cast("long").alias("nearest_signup_us")
    )


@query(
    "join_scd2_point_in_time",
    oracle=f"""
WITH vers AS (
  SELECT n_nationkey AS nk, n_name || ' v' || v AS dim_name,
         CAST(CASE v WHEN 1 THEN '2024-01-01' WHEN 2 THEN '2024-01-11'
                     ELSE '2024-01-21' END AS TIMESTAMP) AS valid_from,
         CAST(CASE v WHEN 1 THEN '2024-01-11' WHEN 2 THEN '2024-01-21'
                     ELSE '2099-01-01' END AS TIMESTAMP) AS valid_to
  FROM nation, (SELECT unnest([1, 2, 3]) AS v)
)
SELECT d.dim_name, count(*) AS n, {rsum_sql("e.value")} AS total
FROM events e
JOIN vers d ON e.user_id % 25 = d.nk
           AND e.ts >= d.valid_from AND e.ts < d.valid_to
GROUP BY d.dim_name
""",
)
def join_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) point-in-time join: each fact row
    joins the dimension VERSION that was valid at its event time — the
    temporal-correctness contract of every warehouse star schema (joining
    the current version silently rewrites history). Dimension versions are
    synthesized as three validity windows per nation.

    Scale shape: the join is EQUI on the surrogate key (BroadcastHashJoin
    on the tiny dim); the validity-interval predicate is a residual filter
    on the matched rows, never a range cross-join — each fact row meets
    only its key's ~3 versions."""
    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % 25).alias("nk"), "ts", "value"
    )
    nation = load(spark, sf_dir, "nation")
    vers = nation.select(
        F.col("n_nationkey").alias("nk"),
        "n_name",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("v"),
    ).select(
        "nk",
        F.concat("n_name", F.lit(" v"), F.col("v").cast("string")).alias(
            "dim_name"
        ),
        F.when(F.col("v") == 1, F.lit("2024-01-01"))
        .when(F.col("v") == 2, F.lit("2024-01-11"))
        .otherwise(F.lit("2024-01-21"))
        .cast("timestamp")
        .alias("valid_from"),
        F.when(F.col("v") == 1, F.lit("2024-01-11"))
        .when(F.col("v") == 2, F.lit("2024-01-21"))
        .otherwise(F.lit("2099-01-01"))
        .cast("timestamp")
        .alias("valid_to"),
    )
    return (
        ev.join(F.broadcast(vers), "nk")
        .filter((F.col("ts") >= F.col("valid_from")) & (F.col("ts") < F.col("valid_to")))
        .groupBy("dim_name")
        .agg(F.count(F.lit(1)).alias("n"), rsum("value").alias("total"))
    )
