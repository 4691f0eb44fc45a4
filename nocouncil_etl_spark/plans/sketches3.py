"""Sketch family wave 3 + preference-ranking evaluation.

- ``sketch_quantile_histogram`` — mergeable quantile estimation via a
  fixed-width 1024-bucket integer histogram, completing the sketch family
  (KMV distinct / CMS frequency / Bloom membership / HLL cardinality /
  — quantiles). The histogram is a pure combine-agg (mergeable across any
  partitioning — the property that matters at 100 TB), and because it is
  deterministic, the oracle checks the ESTIMATE itself plus its provable
  error bound (|est − exact| ≤ bucket width) against the exact order
  statistics, computed side by side — the agg_approx_sketches discipline.
- ``model_bradley_terry_leaderboard`` — a model leaderboard from pairwise
  preference outcomes (the DPO-adjacent evaluation: given "a beats b"
  counts, rank the players): Copeland score (wins − losses) plus
  Bradley-Terry strengths by fixed-point iteration in integer arithmetic,
  the oracle unrolling every iteration (the PageRank technique applied to
  an MM-style recurrence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import cumulate
from nocouncil_etl_spark.registry import query

N_BUCKETS = 1024
PCTS = (50, 90, 99)


@query(
    "sketch_quantile_histogram",
    oracle=f"""
WITH cents AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS v FROM events
),
ext AS (
  SELECT CAST(min(v) AS BIGINT) AS mn, CAST(max(v) AS BIGINT) AS mx,
         CAST(count(*) AS BIGINT) AS n
  FROM cents
),
m AS (SELECT mn, mx, n, (mx - mn) // {N_BUCKETS} + 1 AS w FROM ext),
hist AS (
  SELECT (v - m.mn) // m.w AS b, CAST(count(*) AS BIGINT) AS c
  FROM cents CROSS JOIN m GROUP BY 1
),
cumh AS (
  SELECT b, CAST(sum(c) OVER (ORDER BY b) AS BIGINT) AS cum FROM hist
),
byv AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM cents GROUP BY v),
cumv AS (
  SELECT v, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) AS cum FROM byv
),
pcts AS (SELECT unnest([{", ".join(str(p) for p in PCTS)}]) AS p),
tgt AS (
  SELECT p.p, (p.p * m.n + 99) // 100 AS r, m.mn, m.w, m.n
  FROM pcts p CROSS JOIN m
),
est AS (
  SELECT t.p, t.n, t.r, t.w,
         t.mn + min(h.b) * t.w + t.w // 2 AS est
  FROM tgt t JOIN cumh h ON h.cum >= t.r
  GROUP BY t.p, t.n, t.r, t.w, t.mn
),
exact AS (
  SELECT t.p, min(cv.v) AS exact
  FROM tgt t JOIN cumv cv ON cv.cum >= t.r
  GROUP BY t.p
)
SELECT e.p AS p, e.n, e.r AS rank, e.est, x.exact,
       abs(e.est - x.exact) AS err,
       CAST(abs(e.est - x.exact) <= e.w AS BOOLEAN) AS in_bound
FROM est e JOIN exact x ON x.p = e.p
""",
)
def sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a fixed 1024-bucket integer histogram over
    event cents: bucket width w = (max−min) div 1024 + 1, estimate =
    bucket midpoint of the first bucket whose cumulative count reaches the
    nearest-rank target r = ⌈p·n/100⌉. The exact order statistic is
    computed beside it and the oracle pins estimate, exact value, error,
    and the provable bound err ≤ w — the estimate itself hash-matches
    because the sketch is deterministic.

    Scale shape: min/max is one agg, the histogram is one combine-agg into
    ≤{N_BUCKETS} groups (mergeable: partial histograms add — the property
    that makes this a SKETCH), the exact side reuses the distinct-value
    cum table (value-grid-bounded). At 100 TB the exact side disappears
    and the histogram answer stands alone with its bound."""
    ev = load(spark, sf_dir, "events")
    cents = ev.select(F.round(F.col("value") * 100).cast("long").alias("v"))
    cents.persist()
    ext = cents.agg(
        F.min("v").cast("long").alias("mn"),
        F.max("v").cast("long").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    m = ext.select(
        "mn", "mx", "n", F.expr(f"(mx - mn) div {N_BUCKETS} + 1").alias("w")
    )
    hist = (
        cents.crossJoin(F.broadcast(m))
        .select(F.expr("(v - mn) div w").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # r7: both cumulative tables via Fenwick prefix sums — no windows
    cumh = cumulate(hist, "b", ("c",)).select(
        "b", F.col("cum_c").cast("long").alias("cum")
    )
    byv = cents.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cumv = cumulate(byv, "v", ("c",)).select(
        "v", F.col("cum_c").cast("long").alias("cum")
    )
    pcts = spark.createDataFrame([(p,) for p in PCTS], "p long")
    tgt = pcts.crossJoin(F.broadcast(m)).select(
        "p", F.expr("(p * n + 99) div 100").alias("r"), "mn", "w", "n"
    )
    est = (
        tgt.join(cumh, F.col("cum") >= F.col("r"))
        .groupBy("p", "n", "r", "w", "mn")
        .agg(F.min("b").alias("minb"))
        .select(
            "p",
            "n",
            "r",
            "w",
            F.expr("mn + minb * w + w div 2").alias("est"),
        )
    )
    exact = (
        tgt.select("p", "r")
        .join(cumv, F.col("cum") >= F.col("r"))
        .groupBy("p")
        .agg(F.min("v").alias("exact"))
    )
    return est.join(exact, "p").select(
        "p",
        "n",
        F.col("r").alias("rank"),
        "est",
        "exact",
        F.abs(F.col("est") - F.col("exact")).alias("err"),
        (F.abs(F.col("est") - F.col("exact")) <= F.col("w")).alias("in_bound"),
    )


# --------------------------------------------------------------------------
# Bradley-Terry leaderboard from pairwise preferences
# --------------------------------------------------------------------------

BT_ITERS = 4
BT_SCALE = 10**9

# battles: consecutive events of one user = a matchup between the two event
# types; the higher value wins (ties void). Deterministic on both engines.
_BATTLES_SQL = """
seq AS (
  SELECT user_id, event_type, value, ts, event_id,
         lead(event_type) OVER w AS next_type,
         lead(value) OVER w AS next_value
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
battles AS (
  SELECT CASE WHEN value > next_value THEN event_type ELSE next_type END AS winner,
         CASE WHEN value > next_value THEN next_type ELSE event_type END AS loser
  FROM seq
  WHERE next_type IS NOT NULL AND event_type <> next_type
        AND value <> next_value
),
players AS (SELECT DISTINCT winner AS pl FROM battles
            UNION SELECT DISTINCT loser FROM battles),
wl AS (
  SELECT pl,
         CAST(coalesce(w.wins, 0) AS BIGINT) AS wins,
         CAST(coalesce(l.losses, 0) AS BIGINT) AS losses
  FROM players
  LEFT JOIN (SELECT winner, count(*) AS wins FROM battles GROUP BY 1) w
    ON w.winner = pl
  LEFT JOIN (SELECT loser, count(*) AS losses FROM battles GROUP BY 1) l
    ON l.loser = pl
),
pairs AS (
  SELECT a, b, CAST(sum(n) AS BIGINT) AS n_ab FROM (
    SELECT winner AS a, loser AS b, count(*) AS n FROM battles GROUP BY 1, 2
    UNION ALL
    SELECT loser, winner, count(*) FROM battles GROUP BY 1, 2
  ) GROUP BY a, b
)
"""


def _bt_oracle() -> str:
    cte = [f"WITH {_BATTLES_SQL},"]
    cte.append(
        f"bt0 AS (SELECT pl, CAST({BT_SCALE} AS BIGINT)"
        f" // (SELECT count(*) FROM players) AS s FROM players)"
    )
    for k in range(BT_ITERS):
        cte.append(f""",
den{k} AS (
  SELECT p.a AS pl,
         CAST(sum((p.n_ab * {BT_SCALE}) // (sa.s + sb.s)) AS BIGINT) AS d
  FROM pairs p
  JOIN bt{k} sa ON sa.pl = p.a
  JOIN bt{k} sb ON sb.pl = p.b
  GROUP BY p.a
),
bt{k + 1} AS (
  SELECT w.pl,
         CASE WHEN coalesce(d.d, 0) = 0 THEN b.s
              ELSE (w.wins * {BT_SCALE}) // d.d END AS s
  FROM wl w
  JOIN bt{k} b ON b.pl = w.pl
  LEFT JOIN den{k} d ON d.pl = w.pl
)""")
    cte.append(f"""
SELECT w.pl AS player, w.wins, w.losses,
       w.wins - w.losses AS copeland,
       b.s AS bt_strength_1e9,
       CAST(row_number() OVER (ORDER BY b.s DESC, w.pl) AS INT) AS rk
FROM wl w JOIN bt{BT_ITERS} b ON b.pl = w.pl""")
    return "".join(cte)


@query("model_bradley_terry_leaderboard", oracle=_bt_oracle())
def model_bradley_terry_leaderboard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Leaderboard from pairwise preference outcomes: consecutive same-user
    events form a matchup between their event types (higher value wins,
    ties void — a deterministic stand-in for "annotator preferred response
    A"). Reports wins/losses, the Copeland score, and Bradley-Terry
    strengths after {BT_ITERS} MM fixed-point iterations
    π'_i = W_i / Σ_j n_ij/(π_i+π_j), run entirely in integer fixed point
    ({BT_SCALE}-scaled with div semantics shared by both engines) and
    replayed by the oracle as unrolled CTEs. The evaluation layer the DPO
    preference pipeline (pipeline_dpo_e2e) feeds.

    Scale shape: battles are one lead() window over the event stream; the
    iteration state is |players| rows and each step is a pairs-table join
    (|players|² bounded) — broadcast-sized at any corpus scale since
    players = models, not data."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "value",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("value").over(w).alias("next_value"),
    )
    battles = seq.filter(
        F.col("next_type").isNotNull()
        & (F.col("event_type") != F.col("next_type"))
        & (F.col("value") != F.col("next_value"))
    ).select(
        F.when(F.col("value") > F.col("next_value"), F.col("event_type"))
        .otherwise(F.col("next_type"))
        .alias("winner"),
        F.when(F.col("value") > F.col("next_value"), F.col("next_type"))
        .otherwise(F.col("event_type"))
        .alias("loser"),
    )
    battles.persist()
    players = (
        battles.select(F.col("winner").alias("pl"))
        .union(battles.select("loser"))
        .distinct()
    )
    wins = battles.groupBy(F.col("winner").alias("pl")).agg(
        F.count(F.lit(1)).alias("wins")
    )
    losses = battles.groupBy(F.col("loser").alias("pl")).agg(
        F.count(F.lit(1)).alias("losses")
    )
    wl = (
        players.join(wins, "pl", "left")
        .join(losses, "pl", "left")
        .select(
            "pl",
            F.coalesce("wins", F.lit(0)).cast("long").alias("wins"),
            F.coalesce("losses", F.lit(0)).cast("long").alias("losses"),
        )
    )
    ab = battles.groupBy(
        F.col("winner").alias("a"), F.col("loser").alias("b")
    ).agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        ab.select("a", "b", "n")
        .unionByName(
            ab.select(
                F.col("b").alias("a"), F.col("a").alias("b"), "n"
            )
        )
        .groupBy("a", "b")
        .agg(F.sum("n").cast("long").alias("n_ab"))
    )
    pairs.persist()
    n_players = players.count()  # = |models|, a constant
    bt = players.select(
        "pl", F.lit(BT_SCALE // n_players).cast("long").alias("s")
    )
    for _ in range(BT_ITERS):
        den = (
            pairs.join(
                bt.select(F.col("pl").alias("a"), F.col("s").alias("sa")), "a"
            )
            .join(
                bt.select(F.col("pl").alias("b"), F.col("s").alias("sb")), "b"
            )
            .groupBy(F.col("a").alias("pl"))
            .agg(
                F.sum(F.expr(f"(n_ab * {BT_SCALE}) div (sa + sb)"))
                .cast("long")
                .alias("d")
            )
        )
        bt = (
            wl.join(bt.select("pl", "s"), "pl")
            .join(den, "pl", "left")
            .select(
                "pl",
                F.when(F.coalesce("d", F.lit(0)) == 0, F.col("s"))
                .otherwise(F.expr(f"(wins * {BT_SCALE}) div d"))
                .cast("long")
                .alias("s"),
            )
        )
    return wl.join(bt, "pl").select(
        F.col("pl").alias("player"),
        "wins",
        "losses",
        (F.col("wins") - F.col("losses")).alias("copeland"),
        F.col("s").alias("bt_strength_1e9"),
        F.row_number()
        .over(Window.orderBy(F.desc("s"), "pl"))
        .cast("int")
        .alias("rk"),
    )


# --------------------------------------------------------------------------
# Lorenz curve (pairs with the Gini coefficient in analytics5)
# --------------------------------------------------------------------------

N_DECILES = 10


@query(
    "agg_lorenz_curve",
    oracle=f"""
WITH per_user AS (
  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
ranked AS (
  SELECT cents,
         CAST(row_number() OVER (ORDER BY cents, user_id) AS BIGINT) AS rn,
         CAST(sum(cents) OVER (ORDER BY cents, user_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM per_user
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
  FROM per_user
),
dec AS (SELECT unnest(range(1, {N_DECILES} + 1)) AS decile)
SELECT d.decile,
       (d.decile * t.n) // {N_DECILES} AS n_users_cum,
       r.cum AS cum_cents,
       (r.cum * 1000000) // t.s AS share_ppm
FROM dec d
CROSS JOIN tot t
JOIN ranked r ON r.rn = (d.decile * t.n) // {N_DECILES}
""",
)
def agg_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve of user spend at decile boundaries: users ranked by
    total cents ascending; at each decile boundary (rank = ⌊d·n/10⌋) emit
    the cumulative spend and its parts-per-million share — exact integer
    arithmetic end to end. The curve behind the Gini coefficient
    (analytics5): the Gini is twice the area between this curve and the
    diagonal; the curve itself says WHERE the concentration lives.

    Scale shape (r7): one per-user hash-agg; rank and running spend come
    from Fenwick prefix sums over the distinct-spend histogram (count +
    spend mass) plus a spend-partitioned tie-block window — no global
    sort over users; a {N_DECILES}-row broadcast join after."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    per_user.persist()
    byv = per_user.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("cents").cast("long").alias("sx"),
    )
    bel = cumulate(byv, "cents", ("c", "sx")).select(
        "cents",
        (F.col("cum_c") - F.col("c")).alias("below"),
        (F.col("cum_sx") - F.col("sx")).alias("sx_below"),
    )
    j = F.row_number().over(Window.partitionBy("cents").orderBy("user_id"))
    ranked = per_user.join(bel, "cents").select(
        "cents",
        (F.col("below") + j).cast("long").alias("rn"),
        (F.col("sx_below") + F.col("cents") * j).cast("long").alias("cum"),
    )
    tot = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    dec = spark.range(1, N_DECILES + 1).select(F.col("id").alias("decile"))
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            F.expr(f"(decile * n) div {N_DECILES}").alias("n_users_cum"),
            "s",
        )
        .join(ranked, F.col("rn") == F.col("n_users_cum"))
        .select(
            "decile",
            "n_users_cum",
            F.col("cum").alias("cum_cents"),
            F.expr("(cum * 1000000) div s").alias("share_ppm"),
        )
    )
