"""Breadth batch 34 (round 6): manifest pruning, average precision,
Grubbs outlier, JL projection, off-policy replay, point-in-polygon.

Six operators (reference scope: data-skipping file layout, ranking-model
eval, single-outlier triage, cheap dimensionality reduction, offline
policy evaluation over the logged feed, and geofencing):

- ``io_manifest_file_pruning`` — poor-man's Iceberg: data buckets + a
  min/max manifest; a range query reads the manifest first and scans
  only overlapping buckets.
- ``eval_average_precision`` — exact AP over an md5-scored ranking,
  computed scalably (bucket partials + tiny prefix table, no global
  single-partition window).
- ``stat_grubbs_outlier``   — Grubbs' max-deviation outlier test per
  event type, argmax exact in integers.
- ``vec_random_projection_jl`` — ±1 Johnson-Lindenstrauss projection
  64→16 dims with per-pair distance-distortion accounting.
- ``eval_policy_replay_ips`` — inverse-propensity off-policy value of a
  deterministic target policy over the logged arms.
- ``geo_point_in_polygon``  — exact integer ray-casting point-in-polygon
  over the synthetic point cloud.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Manifest-based file pruning
# --------------------------------------------------------------------------

BUCKET_DAYS = 5
PRUNE_LO, PRUNE_HI = 8, 17  # query range in day offsets (0-based)


@query(
    "io_manifest_file_pruning",
    oracle=f"""
WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS start FROM events),
x AS (
  SELECT event_type, CAST(ts AS DATE) - d0.start AS off,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events, d0
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS cents
FROM x WHERE off BETWEEN {PRUNE_LO} AND {PRUNE_HI}
GROUP BY 1
""",
)
def io_manifest_file_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-driven data skipping (the Iceberg/Delta layout in
    miniature): the event feed is published as {BUCKET_DAYS}-day bucket
    files plus a MANIFEST table holding each bucket's (min, max, rows)
    day-offset stats; a date-range query reads the manifest FIRST (tiny,
    driver-side), keeps only buckets overlapping [{PRUNE_LO}, {PRUNE_HI}],
    and scans just those — tests assert the pruned scan touches fewer
    buckets than exist. The residual filter still applies inside the
    surviving buckets (bucket granularity over-covers), so the result is
    exactly the full-scan answer — hash-checked against the oracle's
    direct range aggregate.

    Scale shape: THE 100 TB read-path pattern — file-level stats prune
    before any data IO; the manifest is metadata (bytes per bucket).
    Hive partitionBy gives the same effect per literal value;
    manifest stats generalize it to ranges and any column."""
    import os
    import tempfile

    ev = load(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"manifest_lake_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    d0 = ev.agg(F.min(F.to_date("ts")).alias("start"))
    x = ev.crossJoin(F.broadcast(d0)).select(
        "event_type",
        F.datediff(F.to_date("ts"), F.col("start")).cast("long").alias("off"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    data = x.withColumn("bucket", F.expr(f"off div {BUCKET_DAYS}"))
    data.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(base, "data")
    )
    manifest = data.groupBy("bucket").agg(
        F.min("off").alias("min_off"),
        F.max("off").alias("max_off"),
        F.count("*").alias("n_rows"),
    )
    manifest.write.mode("overwrite").parquet(os.path.join(base, "manifest"))
    # plan the read from the manifest: tiny, bounded driver fetch
    keep = [
        r.bucket
        for r in spark.read.parquet(os.path.join(base, "manifest"))
        .filter(
            (F.col("max_off") >= PRUNE_LO) & (F.col("min_off") <= PRUNE_HI)
        )
        .collect()
    ]
    pruned = spark.read.parquet(os.path.join(base, "data")).filter(
        F.col("bucket").isin(keep)
    )
    return (
        pruned.filter(F.col("off").between(PRUNE_LO, PRUNE_HI))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("cents"),
        )
    )


# --------------------------------------------------------------------------
# 2. Exact average precision, bucket-scalable
# --------------------------------------------------------------------------

AP_BUCKET = 1 << 20


@query(
    "eval_average_precision",
    oracle=f"""
WITH scored AS (
  SELECT {_pt_sql('ap#', 'event_id', 1_000_000_000)} AS score,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
  FROM events
),
ranked AS (
  SELECT y,
         CAST(row_number() OVER (ORDER BY score DESC) AS BIGINT) AS k,
         CAST(sum(y) OVER (ORDER BY score DESC) AS BIGINT) AS tp
  FROM scored
),
terms AS (
  SELECT CAST(sum(CASE WHEN y = 1
                       THEN CAST(round(1000000000.0 * tp / k) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS s,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(count(*) AS BIGINT) AS n
  FROM ranked
)
SELECT n, n_pos, s // n_pos AS ap_1e9 FROM terms
""",
)
def eval_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact average precision of a deterministic md5 scorer against the
    'error' label: AP = mean over positives of precision@rank. Each
    positive's precision term rounds to integer nano-units BEFORE the
    corpus sum (order-free BIGINTs). The Spark side refuses the naive
    global single-partition window: scores are bucketed ({AP_BUCKET}-wide
    ranges), per-bucket (rows, positives) partials roll up in a TINY
    prefix table that broadcasts back, and ranks/cum-positives come from
    a window PARTITIONED BY bucket plus the bucket's prefix offsets —
    the distributed exact-ranking recipe (same grid idea as
    curation_quantile_normalize_grid). md5 scores are collision-free at
    these sizes, so ranking is total and both engines agree.

    Scale shape: one scan + per-bucket windows (each bucket a few
    thousand rows) + a bucket-count-sized broadcast. No stage sees the
    corpus in one task."""
    ev = load(spark, sf_dir, "events")
    scored = ev.select(
        (_pt("ap#", F.col("event_id")) % 1_000_000_000).alias("score"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
    ).withColumn("bucket", F.expr(f"score div {AP_BUCKET}"))
    bstats = scored.groupBy("bucket").agg(
        F.count("*").cast("long").alias("bn"),
        F.sum("y").cast("long").alias("bpos"),
    )
    # prefix over DESCENDING buckets: rows/positives in strictly higher buckets
    wb = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = bstats.select(
        "bucket",
        F.coalesce(F.sum("bn").over(wb), F.lit(0)).cast("long").alias("n_before"),
        F.coalesce(F.sum("bpos").over(wb), F.lit(0))
        .cast("long")
        .alias("tp_before"),
    )
    win = Window.partitionBy("bucket").orderBy(F.desc("score"))
    ranked = (
        scored.join(F.broadcast(prefix), "bucket")
        .select(
            "y",
            (F.row_number().over(win) + F.col("n_before")).cast("long").alias("k"),
            (F.sum("y").over(win.rowsBetween(Window.unboundedPreceding, 0))
             + F.col("tp_before")).cast("long").alias("tp"),
        )
    )
    terms = ranked.agg(
        F.sum(
            F.when(
                F.col("y") == 1,
                F.round(1000000000.0 * F.col("tp") / F.col("k")).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("s"),
        F.sum("y").cast("long").alias("n_pos"),
        F.count("*").cast("long").alias("n"),
    )
    return terms.select(
        "n", "n_pos", F.expr("s div n_pos").cast("long").alias("ap_1e9")
    )


# --------------------------------------------------------------------------
# 3. Grubbs' outlier test
# --------------------------------------------------------------------------


@query(
    "stat_grubbs_outlier",
    oracle="""
WITH cents AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
mom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v) AS BIGINT) AS sc,
         CAST(sum(v * v) AS BIGINT) AS scc
  FROM cents GROUP BY 1
),
dev AS (
  SELECT c.event_type, c.v,
         abs(c.v * m.n - m.sc) AS nd,
         CAST(row_number() OVER (PARTITION BY c.event_type
                                 ORDER BY abs(c.v * m.n - m.sc) DESC, c.v)
              AS BIGINT) AS rk
  FROM cents c JOIN mom m ON c.event_type = m.event_type
)
SELECT m.event_type, m.n, d.v AS outlier_v,
       round((CAST(d.nd AS DOUBLE) / m.n)
             / sqrt((CAST(m.scc AS DOUBLE)
                     - CAST(m.sc AS DOUBLE) * m.sc / m.n) / (m.n - 1)), 6)
         AS g_stat
FROM mom m JOIN dev d ON m.event_type = d.event_type AND d.rk = 1
""",
)
def stat_grubbs_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs' single-outlier test per event type: G = max|v − mean| / s.
    The argmax is found on the EXACT integer quantity |v·n − Sigma v|
    (no float enters the ranking; ties break on the value), and only the
    final G assembles floats from exact moments — so both engines pick
    the identical outlier row and agree on G to the printed rounding.

    Scale shape: one moment hash-agg, one per-type max via window over
    the deviation — at scale the window becomes a max-struct aggregate;
    either way a single scan."""
    ev = load(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    mom = cents.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("sc"),
        F.sum(F.col("v") * F.col("v")).cast("long").alias("scc"),
    )
    dev = cents.join(mom, "event_type").select(
        "event_type",
        "v",
        "n",
        "sc",
        "scc",
        F.abs(F.col("v") * F.col("n") - F.col("sc")).alias("nd"),
    )
    top = dev.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.desc("nd"), "v")
        ),
    ).filter(F.col("rk") == 1)
    s = F.sqrt(
        (
            F.col("scc").cast("double")
            - F.col("sc").cast("double") * F.col("sc") / F.col("n")
        )
        / (F.col("n") - 1)
    )
    return top.select(
        "event_type",
        "n",
        F.col("v").alias("outlier_v"),
        F.round((F.col("nd").cast("double") / F.col("n")) / s, 6).alias(
            "g_stat"
        ),
    )


# --------------------------------------------------------------------------
# 4. Johnson-Lindenstrauss ±1 projection
# --------------------------------------------------------------------------

JL_K = 16
JL_PAIRS = 50


@query(
    "vec_random_projection_jl",
    oracle=f"""
WITH comp AS (
  SELECT vec_id, CAST(i AS BIGINT) AS i,
         CAST(round(1000 * CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE))
              AS BIGINT) AS x
  FROM (SELECT vec_id, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
        WHERE vec_id <= {JL_PAIRS})
),
signs AS (
  SELECT i.i, j.j,
         CASE WHEN CAST(('0x' || substring(md5('jl#'
                   || CAST(i.i AS VARCHAR) || '#' || CAST(j.j AS VARCHAR)),
                   1, 15)) AS BIGINT) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM (SELECT DISTINCT i FROM comp) i,
       (SELECT unnest(range(0, {JL_K})) AS j) j
),
proj AS (
  SELECT c.vec_id, s.j, CAST(sum(c.x * s.s) AS BIGINT) AS y
  FROM comp c JOIN signs s ON c.i = s.i
  GROUP BY 1, 2
),
d_orig AS (
  SELECT a.vec_id AS va, CAST(sum((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS d2
  FROM comp a JOIN comp b ON a.i = b.i AND b.vec_id = a.vec_id + 1
  GROUP BY 1
),
d_proj AS (
  SELECT a.vec_id AS va, CAST(sum((a.y - b.y) * (a.y - b.y)) AS BIGINT) AS d2
  FROM proj a JOIN proj b ON a.j = b.j AND b.vec_id = a.vec_id + 1
  GROUP BY 1
),
ratios AS (
  SELECT o.va, (1000000 * p.d2) // ({JL_K} * o.d2) AS ratio_1e6
  FROM d_orig o JOIN d_proj p ON o.va = p.va
  WHERE o.d2 > 0
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(ratio_1e6) AS BIGINT) AS min_ratio_1e6,
       CAST(max(ratio_1e6) AS BIGINT) AS max_ratio_1e6,
       CAST(sum(ratio_1e6) AS BIGINT) // count(*) AS mean_ratio_1e6
FROM ratios
""",
)
def vec_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss in its cheapest clothing: project 64-dim
    embeddings to {JL_K} dims with a deterministic ±1 (Achlioptas) sign
    matrix (md5-derived), then account the pairwise squared-distance
    distortion ratio ||p(a)−p(b)||²/(k·||a−b||²) over consecutive-id
    pairs — the JL lemma says these ratios concentrate near 1, and the
    result row exhibits exactly how tightly at k={JL_K}. Components are
    milli-quantized so every distance is an exact BIGINT; ratios are ppm
    integers.

    Scale shape: the projection is one broadcast-join (64×{JL_K} sign
    rows) + hash-agg per vector — the standard pre-LSH/pre-ANN
    compression pass; distance accounting is an equi-join on the pair
    key. No pair blowup: pairs here are a fixed probe set."""
    e = fan_out(load(spark, sf_dir, "embeddings")).filter(F.col("vec_id") <= JL_PAIRS)
    comp = e.select(
        "vec_id",
        F.posexplode("embedding").alias("i0", "xv"),
    ).select(
        "vec_id",
        (F.col("i0") + 1).cast("long").alias("i"),
        F.round(1000 * F.col("xv").cast("double")).cast("long").alias("x"),
    )
    dims = comp.select("i").distinct()
    js = spark.range(JL_K).select(F.col("id").cast("long").alias("j"))
    signs = dims.crossJoin(js).select(
        "i",
        "j",
        F.when(
            _pt(
                "jl#",
                F.concat(F.col("i").cast("string"), F.lit("#"), F.col("j").cast("string")),
            )
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("s"),
    )
    proj = (
        comp.join(F.broadcast(signs), "i")
        .groupBy("vec_id", "j")
        .agg(F.sum(F.col("x") * F.col("s")).cast("long").alias("y"))
    )

    def pair_d2(df, val, key):
        a = df.select(F.col("vec_id").alias("va"), F.col(key).alias("kk"), F.col(val).alias("pa"))
        b = df.select(
            (F.col("vec_id") - 1).alias("va"),
            F.col(key).alias("kk"),
            F.col(val).alias("pb"),
        )
        return (
            a.join(b, ["va", "kk"])
            .groupBy("va")
            .agg(
                F.sum((F.col("pa") - F.col("pb")) * (F.col("pa") - F.col("pb")))
                .cast("long")
                .alias("d2")
            )
        )

    d_orig = pair_d2(comp, "x", "i")
    d_proj = pair_d2(proj, "y", "j").withColumnRenamed("d2", "d2p")
    ratios = (
        d_orig.join(d_proj, "va")
        .filter(F.col("d2") > 0)
        .select(F.expr(f"(1000000 * d2p) div ({JL_K} * d2)").alias("ratio_1e6"))
    )
    return ratios.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.min("ratio_1e6").cast("long").alias("min_ratio_1e6"),
        F.max("ratio_1e6").cast("long").alias("max_ratio_1e6"),
        F.expr("CAST(sum(ratio_1e6) AS BIGINT) div count(*)")
        .cast("long")
        .alias("mean_ratio_1e6"),
    )


# --------------------------------------------------------------------------
# 5. Off-policy replay (IPS)
# --------------------------------------------------------------------------


@query(
    "eval_policy_replay_ips",
    oracle=f"""
WITH arms AS (
  SELECT event_type AS arm,
         CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) AS aid
  FROM (SELECT DISTINCT event_type FROM events)
),
k AS (SELECT CAST(count(*) AS BIGINT) AS n_arms FROM arms),
logged AS (
  SELECT e.event_type AS arm,
         CAST(round(e.value * 100) AS BIGINT) AS r,
         {_pt_sql('pol#', 'e.user_id', 1000)} % (SELECT n_arms FROM k)
           AS pick
  FROM events e
),
matched AS (
  SELECT l.arm, CAST(count(*) AS BIGINT) AS n_a,
         CAST(sum(CASE WHEN a.aid = l.pick THEN l.r ELSE 0 END) AS BIGINT)
           AS s_match,
         CAST(sum(CASE WHEN a.aid = l.pick THEN 1 ELSE 0 END) AS BIGINT)
           AS n_match
  FROM logged l JOIN arms a ON a.arm = l.arm
  GROUP BY 1
)
SELECT CAST(sum(n_a) AS BIGINT) AS n,
       CAST(sum(n_match) AS BIGINT) AS n_matched,
       CAST(sum(CAST(round(1000.0 * s_match / n_a) AS BIGINT)) AS BIGINT)
         AS ips_value_milli,
       CAST((1000 * CAST(sum(s_all) AS BIGINT)) // sum(n_a) AS BIGINT)
         AS naive_mean_milli
FROM (SELECT m.*, (SELECT CAST(sum(r) AS BIGINT) FROM logged l2
                   WHERE l2.arm = m.arm) AS s_all
      FROM matched m)
""",
)
def eval_policy_replay_ips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation by inverse-propensity replay (Li et al.
    2011): the logged feed chose arm = its event_type with empirical
    propensity n_a/n; the TARGET policy deterministically picks an arm
    per user (md5 mod k). IPS value = (1/n)·Sigma r·1[logged = target]
    / p̂(logged) = Sigma_a S_a^match / n_a — each per-arm term rounds to
    milli-units before the k-term sum (order-free), laid beside the
    naive logged mean so the off-policy correction is visible.

    Scale shape: one hash-agg per arm over a single scan; the arm table
    broadcasts. The estimator every bandit/recommendation team runs
    before an online test — unbiased under logged-propensity support."""
    ev = load(spark, sf_dir, "events")
    arms = (
        ev.select("event_type").distinct()
        .select(
            F.col("event_type").alias("arm"),
            (F.row_number().over(Window.orderBy("event_type")) - 1)
            .cast("long")
            .alias("aid"),
        )
    )
    n_arms = arms.count()
    logged = ev.select(
        F.col("event_type").alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("r"),
        ((_pt("pol#", F.col("user_id")) % 1000) % n_arms).alias("pick"),
    )
    matched = (
        logged.join(F.broadcast(arms), "arm")
        .groupBy("arm")
        .agg(
            F.count("*").cast("long").alias("n_a"),
            F.sum(F.when(F.col("aid") == F.col("pick"), F.col("r")).otherwise(0))
            .cast("long")
            .alias("s_match"),
            F.sum(F.when(F.col("aid") == F.col("pick"), 1).otherwise(0))
            .cast("long")
            .alias("n_match"),
            F.sum("r").cast("long").alias("s_all"),
        )
    )
    return matched.agg(
        F.sum("n_a").cast("long").alias("n"),
        F.sum("n_match").cast("long").alias("n_matched"),
        F.sum(
            F.round(1000.0 * F.col("s_match") / F.col("n_a")).cast("long")
        )
        .cast("long")
        .alias("ips_value_milli"),
        F.expr("(1000 * CAST(sum(s_all) AS BIGINT)) div sum(n_a)")
        .cast("long")
        .alias("naive_mean_milli"),
    )


# --------------------------------------------------------------------------
# 6. Integer ray-casting point-in-polygon
# --------------------------------------------------------------------------

# irregular pentagon in the [0, 32768)² point space (integer vertices)
POLY = ((4000, 6000), (28000, 2500), (30500, 17000), (16000, 30000), (2500, 21000))


def _poly_edges():
    edges = []
    for idx in range(len(POLY)):
        x1, y1 = POLY[idx]
        x2, y2 = POLY[(idx + 1) % len(POLY)]
        edges.append((idx, x1, y1, x2, y2))
    return edges


@query(
    "geo_point_in_polygon",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey,
         {_pt_sql('mx#', 'c_custkey', 32768)} AS px,
         {_pt_sql('my#', 'c_custkey', 32768)} AS py,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer
),
edges AS (
  SELECT * FROM (VALUES
    {', '.join(f'({i}, {x1}, {y1}, {x2}, {y2})' for i, x1, y1, x2, y2 in _poly_edges())}
  ) AS t(eid, x1, y1, x2, y2)
),
crossings AS (
  SELECT p.c_custkey, p.bal,
         CAST(sum(CASE WHEN (e.y1 > p.py) <> (e.y2 > p.py)
                        AND CASE WHEN e.y2 > e.y1
                                 THEN (p.px - e.x1) * (e.y2 - e.y1)
                                      < (e.x2 - e.x1) * (p.py - e.y1)
                                 ELSE (p.px - e.x1) * (e.y2 - e.y1)
                                      > (e.x2 - e.x1) * (p.py - e.y1)
                            END
                       THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM pts p, edges e
  GROUP BY 1, 2
)
SELECT CAST(sum(CASE WHEN k % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
       CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_outside,
       CAST(sum(CASE WHEN k % 2 = 1 THEN bal ELSE 0 END) AS BIGINT)
         AS inside_bal_cents
FROM crossings
""",
)
def geo_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer ray-casting point-in-polygon: each synthetic customer
    point casts a +x ray and counts crossings with the pentagon's edges —
    odd = inside. The crossing test is the textbook half-open rule
    ((y1 > py) != (y2 > py)) with the x-intersection comparison
    CROSS-MULTIPLIED so no division ever happens: sign-adjusted
    (px−x1)(y2−y1) vs (x2−x1)(py−y1). Pure integers, so both engines
    agree point-for-point — including points exactly on an edge (strict
    inequality: not counted, consistently). The geofencing kernel.

    Scale shape: polygon edges broadcast (5 rows); one map-side pass +
    scalar agg. For polygon SETS, bucket by bounding-box grid cell first
    (the geo_radius_join grid) and only test points in overlapping
    cells."""
    c = load(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        (_pt("mx#", F.col("c_custkey")) % 32768).alias("px"),
        (_pt("my#", F.col("c_custkey")) % 32768).alias("py"),
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal"),
    )
    edges = spark.createDataFrame(
        _poly_edges(), "eid INT, x1 LONG, y1 LONG, x2 LONG, y2 LONG"
    )
    lhs = (F.col("px") - F.col("x1")) * (F.col("y2") - F.col("y1"))
    rhs = (F.col("x2") - F.col("x1")) * (F.col("py") - F.col("y1"))
    crosses = (
        ((F.col("y1") > F.col("py")) != (F.col("y2") > F.col("py")))
        & F.when(F.col("y2") > F.col("y1"), lhs < rhs).otherwise(lhs > rhs)
    )
    k = (
        pts.crossJoin(F.broadcast(edges))
        .groupBy("c_custkey", "bal")
        .agg(F.sum(F.when(crosses, 1).otherwise(0)).cast("long").alias("k"))
    )
    return k.agg(
        F.sum(F.when(F.col("k") % 2 == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_inside"),
        F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_outside"),
        F.sum(F.when(F.col("k") % 2 == 1, F.col("bal")).otherwise(0))
        .cast("long")
        .alias("inside_bal_cents"),
    )
