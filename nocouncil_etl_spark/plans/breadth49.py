"""Breadth batch 49 (round 6): token-bucket admission, Z-order skip
benefit, Elo ratings, median polish, Markov next-event eval, systematic
sampling.

Six operators (reference scope: the crawler's rate limiter as an
auditable batch computation, file-layout design for 2-D predicates,
leaderboards from sequential outcomes, robust two-way table effects,
"does the transition matrix actually predict", and the classic
design-based sample):

- ``agg_token_bucket_admission`` — per-user token-bucket rate limiting
  replayed as a deterministic integer recursion (SURVEY §2 T4's
  oracle-backed batch twin).
- ``layout_zorder_skip``    — linear vs Z-order bucket layout: how many
  min/max-pruned buckets a 2-D box predicate touches in each.
- ``ml_elo_rating``         — sequential Elo over daily pairwise
  revenue outcomes, zero-sum integer updates.
- ``agg_median_polish``     — Tukey median polish of the type×weekday
  matrix (the robust twin of ``agg_raking_ipf``).
- ``rec_markov_next_event`` — next-event hit rate of the first-half
  transition matrix on second-half transitions.
- ``sample_systematic``     — every-k-th systematic sample with an
  md5-derived start offset.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.quantiles import ranged_rank_cumsum, with_global_rank
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Token-bucket admission replay
# --------------------------------------------------------------------------

TB_CAP_MILLI = 2000  # bucket capacity: 2 tokens
TB_REFILL_SECS = 7200  # one token per 2 hours


@query(
    "agg_token_bucket_admission",
    oracle=f"""
WITH RECURSIVE ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS i
  FROM events
),
dt AS (
  SELECT user_id, i,
         coalesce(s - lag(s) OVER (PARTITION BY user_id ORDER BY i), 0)
           AS dt
  FROM ev
),
meta AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM dt GROUP BY 1
),
st AS (
  SELECT user_id, i,
         CAST({TB_CAP_MILLI} - 1000 AS BIGINT) AS tokens,
         CAST(1 AS BIGINT) AS adm
  FROM dt WHERE i = 1
  UNION ALL
  SELECT d.user_id, d.i,
         CAST(CASE WHEN least({TB_CAP_MILLI},
                        s.tokens + (d.dt * 1000) // {TB_REFILL_SECS})
                        >= 1000
              THEN least({TB_CAP_MILLI},
                        s.tokens + (d.dt * 1000) // {TB_REFILL_SECS}) - 1000
              ELSE least({TB_CAP_MILLI},
                        s.tokens + (d.dt * 1000) // {TB_REFILL_SECS})
              END AS BIGINT),
         CAST(s.adm + CASE WHEN least({TB_CAP_MILLI},
                        s.tokens + (d.dt * 1000) // {TB_REFILL_SECS})
                        >= 1000 THEN 1 ELSE 0 END AS BIGINT)
  FROM st s JOIN dt d ON d.user_id = s.user_id AND d.i = s.i + 1
)
SELECT s.user_id, m.n AS n_events, s.adm AS n_admitted,
       m.n - s.adm AS n_throttled, s.tokens AS tokens_final_milli
FROM st s JOIN meta m ON m.user_id = s.user_id AND s.i = m.n
""",
)
def agg_token_bucket_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bucket rate limiting replayed as a batch audit: each user's
    bucket holds {TB_CAP_MILLI}/1000 tokens, refills one token per
    {TB_REFILL_SECS}s (milli-token integer arithmetic, one floor
    division per inter-arrival gap), and every event is admitted iff a
    full token is available. This is the ORACLE-BACKED batch twin of
    the live rate limiter in ``sources/ingest.py`` (SURVEY §2 T4,
    previously pytest-only): the admission sequence is a deterministic
    per-key recursion, so capacity planning ("how many fetches would
    this policy have throttled") runs as a query instead of a replay.

    Scale shape: one per-key Arrow batch with O(1) state (tokens,
    admitted-count) per step — the applyInPandasWithState shape; the
    recursion never leaves the key."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = ev.select(
        "user_id",
        F.unix_timestamp("ts").cast("long").alias("s"),
        F.row_number().over(w).cast("long").alias("i"),
    ).select(
        "user_id",
        "i",
        F.coalesce(
            F.col("s")
            - F.lag("s").over(Window.partitionBy("user_id").orderBy("i")),
            F.lit(0),
        ).alias("dt"),
    )
    out_schema = (
        "user_id long, n_events long, n_admitted long, n_throttled long,"
        " tokens_final_milli long"
    )

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("i")
        tokens = TB_CAP_MILLI
        adm = 0
        for gap in pdf["dt"]:
            tokens = min(TB_CAP_MILLI, tokens + (int(gap) * 1000) // TB_REFILL_SECS)
            if tokens >= 1000:
                tokens -= 1000
                adm += 1
        n = len(pdf)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "n_admitted": [adm],
                "n_throttled": [n - adm],
                "tokens_final_milli": [tokens],
            }
        )

    return dt.groupBy("user_id").applyInPandas(bucket, out_schema)


# --------------------------------------------------------------------------
# 2. Z-order vs linear layout skip benefit
# --------------------------------------------------------------------------

ZO_BUCKETS = 16
ZO_LO, ZO_HI = 64, 127  # the query box on both normalized axes


def _morton_sql(cx: str, cy: str, idiv: str = "//") -> str:
    terms = []
    for b in range(8):
        terms.append(f"(({cx} {idiv} {1 << b}) % 2) * {1 << (2 * b + 1)}")
        terms.append(f"(({cy} {idiv} {1 << b}) % 2) * {1 << (2 * b)}")
    return " + ".join(terms)


@query(
    "layout_zorder_skip",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey,
         CAST(o_custkey AS BIGINT) AS ck,
         CAST(CAST(o_orderdate AS DATE)
              - (SELECT min(CAST(o_orderdate AS DATE)) FROM orders)
              AS BIGINT) AS doff
  FROM orders
),
mx AS (
  SELECT max(ck) + 1 AS mck, max(doff) + 1 AS mdo FROM o
),
norm AS (
  SELECT o_orderkey,
         (ck * 256) // (SELECT mck FROM mx) AS cx,
         (doff * 256) // (SELECT mdo FROM mx) AS cy
  FROM o
),
keyed AS (
  SELECT *, {_morton_sql('cx', 'cy')} AS mz FROM norm
),
meta AS (SELECT CAST(count(*) AS BIGINT) AS n FROM keyed),
linear AS (
  SELECT cx, cy,
         ((row_number() OVER (ORDER BY cx, cy, o_orderkey) - 1)
          * {ZO_BUCKETS}) // (SELECT n FROM meta) AS b
  FROM keyed
),
zorder AS (
  SELECT cx, cy,
         ((row_number() OVER (ORDER BY mz, o_orderkey) - 1)
          * {ZO_BUCKETS}) // (SELECT n FROM meta) AS b
  FROM keyed
),
lstats AS (
  SELECT b, min(cx) AS x0, max(cx) AS x1, min(cy) AS y0, max(cy) AS y1
  FROM linear GROUP BY b
),
zstats AS (
  SELECT b, min(cx) AS x0, max(cx) AS x1, min(cy) AS y0, max(cy) AS y1
  FROM zorder GROUP BY b
),
hits AS (
  SELECT CAST(count(*) AS BIGINT) AS rows_matched FROM keyed
  WHERE cx BETWEEN {ZO_LO} AND {ZO_HI} AND cy BETWEEN {ZO_LO} AND {ZO_HI}
)
SELECT CAST({ZO_BUCKETS} AS BIGINT) AS n_buckets,
       (SELECT CAST(count(*) AS BIGINT) FROM lstats
        WHERE x0 <= {ZO_HI} AND x1 >= {ZO_LO}
          AND y0 <= {ZO_HI} AND y1 >= {ZO_LO}) AS touched_linear,
       (SELECT CAST(count(*) AS BIGINT) FROM zstats
        WHERE x0 <= {ZO_HI} AND x1 >= {ZO_LO}
          AND y0 <= {ZO_HI} AND y1 >= {ZO_LO}) AS touched_zorder,
       (SELECT rows_matched FROM hits) AS rows_matched
""",
)
def layout_zorder_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout benefit, measured: normalize (custkey, order-day)
    to a 256×256 grid, lay the table out in {ZO_BUCKETS} equal buckets
    two ways — sorted linearly by (cx, cy) vs sorted by the Morton
    interleave — record each bucket's min/max per dimension (exactly
    the parquet footer stats ``layout_minmax_pruning`` reads), and
    count how many buckets a square box predicate TOUCHES under
    min/max pruning. Linear sort gives perfect pruning on the leading
    key and none on the second; Z-order bounds BOTH dimensions per
    bucket, which is why lakehouse OPTIMIZE ZORDER exists. The row
    count inside the box is emitted as the invariant both layouts must
    serve.

    Scale shape: bucket assignment is a rank over the (dimension-sized
    here) key stream — in production the sort IS the one-time layout
    write; the skip accounting runs on {ZO_BUCKETS} stat rows."""
    o = load(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_custkey").cast("long").alias("ck"),
        F.to_date("o_orderdate").alias("d"),
    )
    mn = base.agg(
        F.min("d").alias("d0"),
        (F.max("ck") + 1).alias("mck"),
    )
    norm = (
        base.crossJoin(F.broadcast(mn))
        .select(
            "o_orderkey",
            "ck",
            F.datediff("d", "d0").cast("long").alias("doff"),
        )
        .crossJoin(
            F.broadcast(
                base.crossJoin(F.broadcast(mn))
                .agg((F.max(F.datediff("d", "d0")) + 1).cast("long").alias("mdo"))
            )
        )
        .crossJoin(F.broadcast(mn.select("mck")))
        .select(
            "o_orderkey",
            F.expr("(ck * 256) div mck").alias("cx"),
            F.expr("(doff * 256) div mdo").alias("cy"),
        )
    )
    keyed = norm.withColumn("mz", F.expr(_morton_sql("cx", "cy", "div")))
    # r9: keyed fans out into SEVEN downstream evaluations (the count, two
    # rank passes each reading it twice, the hit filter) — without a pin
    # the whole scan+normalize+morton pipeline re-executed per consumer
    # (measured 3.9x at 10x data; 23 s → ~6 s at sf1 with the pin)
    keyed = keyed.localCheckpoint(eager=True)
    n = keyed.count()

    # r7: the file-bucket assignment needs the global layout rank; both
    # sort keys pack into one long (cx, cy ≤ 256), so with_global_rank
    # (Fenwick + tie-block window) replaces the global sorts
    def stats(key_col):
        rk = with_global_rank(
            keyed.withColumn("_lk", key_col), "_lk", "o_orderkey", "_r"
        )
        return (
            rk.withColumn(
                "b", F.expr(f"((_r - 1) * {ZO_BUCKETS}) div {n}")
            )
            .groupBy("b")
            .agg(
                F.min("cx").alias("x0"),
                F.max("cx").alias("x1"),
                F.min("cy").alias("y0"),
                F.max("cy").alias("y1"),
            )
        )

    lstats = stats(F.col("cx") * 65536 + F.col("cy"))
    zstats = stats(F.col("mz"))
    box = (
        (F.col("x0") <= ZO_HI)
        & (F.col("x1") >= ZO_LO)
        & (F.col("y0") <= ZO_HI)
        & (F.col("y1") >= ZO_LO)
    )
    tl = lstats.filter(box).agg(F.count("*").cast("long").alias("touched_linear"))
    tz = zstats.filter(box).agg(F.count("*").cast("long").alias("touched_zorder"))
    hits = keyed.filter(
        F.col("cx").between(ZO_LO, ZO_HI) & F.col("cy").between(ZO_LO, ZO_HI)
    ).agg(F.count("*").cast("long").alias("rows_matched"))
    return (
        tl.crossJoin(tz)
        .crossJoin(hits)
        .select(
            F.lit(ZO_BUCKETS).cast("long").alias("n_buckets"),
            "touched_linear",
            "touched_zorder",
            "rows_matched",
        )
    )


# --------------------------------------------------------------------------
# 3. Sequential Elo ratings
# --------------------------------------------------------------------------

ELO_INIT = 1500000  # milli rating points
ELO_K = 32000  # milli


def _elo_oracle() -> str:
    # arms indexed 1..5 alphabetically; state carries r1..r5 milli ratings
    ra = "CASE m.ai " + " ".join(f"WHEN {i} THEN s.r{i}" for i in range(1, 6)) + " END"
    rb = "CASE m.bi " + " ".join(f"WHEN {i} THEN s.r{i}" for i in range(1, 6)) + " END"
    ea = f"CAST(round(1000000 / (1 + pow(10, ({rb} - {ra}) / 400000.0))) AS BIGINT)"
    delta = f"({ELO_K} * (m.sa_ppm - {ea})) // 1000000"
    upd = ", ".join(
        f"CAST(CASE WHEN m.ai = {i} THEN s.r{i} + {delta}"
        f" WHEN m.bi = {i} THEN s.r{i} - {delta}"
        f" ELSE s.r{i} END AS BIGINT)"
        for i in range(1, 6)
    )
    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
arms AS (
  SELECT event_type,
         CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) AS aid
  FROM (SELECT DISTINCT event_type FROM daily)
),
matches0 AS (
  SELECT a.d, x.aid AS ai, z.aid AS bi,
         CASE WHEN a.y >= b.y THEN 1000000 ELSE 0 END AS sa_ppm
  FROM daily a JOIN daily b ON a.d = b.d AND a.event_type < b.event_type
  JOIN arms x ON x.event_type = a.event_type
  JOIN arms z ON z.event_type = b.event_type
),
matches AS (
  SELECT CAST(row_number() OVER (ORDER BY d, ai, bi) AS BIGINT) AS step,
         ai, bi, sa_ppm
  FROM matches0
),
meta AS (SELECT CAST(count(*) AS BIGINT) AS n FROM matches),
st AS (
  SELECT CAST(0 AS BIGINT) AS step,
         {', '.join(f'CAST({ELO_INIT} AS BIGINT) AS r{i}' for i in range(1, 6))}
  UNION ALL
  SELECT s.step + 1, {upd}
  FROM st s JOIN matches m ON m.step = s.step + 1
),
fin AS (
  SELECT * FROM st WHERE step = (SELECT n FROM meta)
),
wins AS (
  SELECT a.aid,
         CAST(sum(CASE WHEN (m.ai = a.aid AND m.sa_ppm = 1000000)
                         OR (m.bi = a.aid AND m.sa_ppm = 0)
                  THEN 1 ELSE 0 END) AS BIGINT) AS w,
         CAST(sum(CASE WHEN m.ai = a.aid OR m.bi = a.aid THEN 1 ELSE 0 END)
              AS BIGINT) AS games
  FROM arms a, matches m GROUP BY a.aid
)
SELECT ar.event_type AS arm,
       CAST(CASE ar.aid {' '.join(f'WHEN {i} THEN f.r{i}' for i in range(1, 6))}
            END AS BIGINT) AS rating_milli,
       w.w AS wins, w.games - w.w AS losses
FROM arms ar JOIN wins w ON w.aid = ar.aid, fin f
"""


@query("ml_elo_rating", oracle=_elo_oracle())
def ml_elo_rating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential Elo ratings over daily pairwise outcomes (each day,
    every pair of event types 'plays'; the higher daily revenue wins):
    r ← r + K(s − E[s]) with the logistic expectation
    E = 1/(1+10^(Δ/400)), K = {ELO_K}/1000, ratings in exact milli
    integers and the expectation quantized ONCE per match to ppm.
    Updates are zero-sum by construction. Elo is the ONLINE sibling of
    ``model_bradley_terry_leaderboard`` (BT refits the whole history;
    Elo folds each outcome in as it arrives — the leaderboard you can
    run on a stream), which is exactly how LLM arena rankings are
    maintained.

    Scale shape: the match log is bounded (days × pairs); the recursion
    is one Arrow batch with k ratings of state — per-league
    applyInPandasWithState in streaming form."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("y")
    )
    a = daily.select(
        F.col("d").alias("da"), F.col("event_type").alias("ea"), F.col("y").alias("ya")
    )
    b = daily.select(
        F.col("d").alias("db"), F.col("event_type").alias("eb"), F.col("y").alias("yb")
    )
    matches = (
        a.join(b, (a.da == b.db) & (a.ea < b.eb))
        .select(
            F.col("da").alias("d"),
            "ea",
            "eb",
            F.when(F.col("ya") >= F.col("yb"), 1000000).otherwise(0).alias("sa_ppm"),
        )
        .withColumn("g", F.lit(1))
    )
    out_schema = "arm string, rating_milli long, wins long, losses long"

    def elo(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["d", "ea", "eb"])
        arms = sorted(set(pdf["ea"]) | set(pdf["eb"]))
        r = {x: ELO_INIT for x in arms}
        wins = {x: 0 for x in arms}
        games = {x: 0 for x in arms}
        for _, m in pdf.iterrows():
            ea_, eb_, sa = m["ea"], m["eb"], int(m["sa_ppm"])
            # DuckDB round() = half away from zero; // truncates toward 0
            e = int(1000000 / (1 + 10 ** ((r[eb_] - r[ea_]) / 400000.0)) + 0.5)
            num = ELO_K * (sa - e)
            delta = num // 1000000 if num >= 0 else -((-num) // 1000000)
            r[ea_] += delta
            r[eb_] -= delta
            games[ea_] += 1
            games[eb_] += 1
            if sa == 1000000:
                wins[ea_] += 1
            else:
                wins[eb_] += 1
        return pd.DataFrame(
            {
                "arm": arms,
                "rating_milli": [r[x] for x in arms],
                "wins": [wins[x] for x in arms],
                "losses": [games[x] - wins[x] for x in arms],
            }
        )

    return matches.groupBy("g").applyInPandas(elo, out_schema)


# --------------------------------------------------------------------------
# 4. Tukey median polish
# --------------------------------------------------------------------------

MP_ITERS = 2


def _mp_median(src: str, part: str, val: str) -> str:
    return f"""(
  SELECT {part}, {val} AS med FROM (
    SELECT {part}, {val},
           row_number() OVER (PARTITION BY {part} ORDER BY {val}) AS rk,
           count(*) OVER (PARTITION BY {part}) AS cnt
    FROM {src}
  ) WHERE rk = (cnt + 1) // 2
)"""


def _mp_oracle() -> str:
    parts = [
        """WITH cells AS (
  SELECT event_type AS et,
         CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT) AS dw,
         CAST((1000 * sum(CAST(round(value * 100) AS BIGINT))) // count(*)
              AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
r0 AS (
  SELECT et, dw, v AS resid, CAST(0 AS BIGINT) AS re, CAST(0 AS BIGINT) AS ce
  FROM cells
)"""
    ]
    cur = "r0"
    for it in range(1, MP_ITERS + 1):
        parts.append(
            f"rm{it} AS {_mp_median(cur, 'et', 'resid')}"
        )
        parts.append(
            f"""ra{it} AS (
  SELECT c.et, c.dw, c.resid - m.med AS resid, c.re + m.med AS re, c.ce
  FROM {cur} c JOIN rm{it} m ON c.et = m.et
)"""
        )
        parts.append(
            f"cm{it} AS {_mp_median(f'ra{it}', 'dw', 'resid')}"
        )
        parts.append(
            f"""r{it} AS (
  SELECT c.et, c.dw, c.resid - m.med AS resid, c.re, c.ce + m.med AS ce
  FROM ra{it} c JOIN cm{it} m ON c.dw = m.dw
)"""
        )
        cur = f"r{it}"
    return (
        ",\n".join(parts)
        + f"""
SELECT et AS event_type, dw AS dow,
       CAST(re AS BIGINT) AS row_eff_milli,
       CAST(ce AS BIGINT) AS col_eff_milli,
       CAST(resid AS BIGINT) AS resid_milli
FROM {cur}
"""
    )


@query("agg_median_polish", oracle=_mp_oracle())
def agg_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish of the (event_type × weekday) mean-cents
    matrix: alternately sweep out row medians and column medians for
    {MP_ITERS} iterations, accumulating row/column effects and leaving
    a residual matrix — the ROBUST two-way decomposition (means-based
    ANOVA chases outlier cells; medians don't), and the robust twin of
    ``agg_raking_ipf`` (IPF rescales to margins; polish subtracts
    effects). A residual cell far from 0 is a (type, weekday)
    interaction worth investigating. Medians are nearest-rank
    ((n+1)//2) on exact milli integers — no float anywhere.

    Scale shape: the matrix is |types|×7 regardless of scan size; each
    sweep is a bounded per-group window on that tiny frame."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.col("event_type").alias("et"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) % 7)
        .cast("long")
        .alias("dw"),
    ).agg(
        F.expr(
            "CAST((1000 * sum(CAST(round(value * 100) AS BIGINT)))"
            " div count(*) AS BIGINT)"
        ).alias("resid")
    ).select("et", "dw", "resid", F.lit(0).cast("long").alias("re"),
             F.lit(0).cast("long").alias("ce"))
    cur = cells
    for _ in range(MP_ITERS):
        for part, eff in (("et", "re"), ("dw", "ce")):
            med = (
                cur.withColumn(
                    "rk",
                    F.row_number().over(Window.partitionBy(part).orderBy("resid")),
                )
                .withColumn(
                    "cnt", F.count("*").over(Window.partitionBy(part))
                )
                .filter(F.expr("rk = (cnt + 1) div 2"))
                .select(part, F.col("resid").alias("med"))
            )
            cur = cur.join(F.broadcast(med), part).select(
                "et",
                "dw",
                (F.col("resid") - F.col("med")).alias("resid"),
                (F.col("re") + (F.col("med") if eff == "re" else F.lit(0))).alias("re"),
                (F.col("ce") + (F.col("med") if eff == "ce" else F.lit(0))).alias("ce"),
            )
    return cur.select(
        F.col("et").alias("event_type"),
        F.col("dw").alias("dow"),
        F.col("re").cast("long").alias("row_eff_milli"),
        F.col("ce").cast("long").alias("col_eff_milli"),
        F.col("resid").cast("long").alias("resid_milli"),
    )


# --------------------------------------------------------------------------
# 5. Markov next-event prediction eval
# --------------------------------------------------------------------------


@query(
    "rec_markov_next_event",
    oracle="""
WITH mid AS (
  SELECT min(CAST(ts AS DATE))
         + CAST((max(CAST(ts AS DATE)) - min(CAST(ts AS DATE))) // 2
                AS INTEGER) AS m
  FROM events
),
seq AS (
  SELECT user_id, event_type, ts,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
  FROM events
),
trans AS (
  SELECT prev, event_type AS nxt,
         CASE WHEN CAST(ts AS DATE) < (SELECT m FROM mid) THEN 1 ELSE 2 END
           AS half
  FROM seq WHERE prev IS NOT NULL
),
model AS (
  SELECT prev, nxt, CAST(count(*) AS BIGINT) AS c
  FROM trans WHERE half = 1 GROUP BY 1, 2
),
pred AS (
  SELECT prev, nxt AS predicted FROM (
    SELECT prev, nxt, row_number() OVER (PARTITION BY prev
                                         ORDER BY c DESC, nxt) AS rk
    FROM model
  ) WHERE rk = 1
),
test AS (
  SELECT t.prev, t.nxt, p.predicted
  FROM trans t JOIN pred p ON t.prev = p.prev
  WHERE t.half = 2
)
SELECT prev, max(predicted) AS predicted,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN nxt = predicted THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hit,
       CAST((sum(CASE WHEN nxt = predicted THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS BIGINT) AS hit_ppm
FROM test GROUP BY prev
""",
)
def rec_markov_next_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the transition matrix actually predict? Train a first-order
    Markov next-event model on the FIRST half of the horizon (argmax
    next type per previous type — ``session_transitions`` turned into a
    predictor) and score hit@1 on the SECOND half's transitions — the
    temporal-split eval that catches a model memorizing seasonality it
    can't carry forward. Per-state hit rates are emitted so a state
    whose behavior drifted (alarmed by ``dq_null_drift``'s cousin,
    ``agg_psi_drift``) is visible next to its miss rate.

    Scale shape: transitions come from one per-key lag window; the
    model is |states|² counts; scoring is a broadcast join of the
    argmax table against second-half transitions."""
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr(
            "min(to_date(ts)) + CAST(datediff(max(to_date(ts)),"
            " min(to_date(ts))) div 2 AS INT)"
        ).alias("m")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        "ts",
        F.lag("event_type").over(w).alias("prev"),
    )
    trans = (
        seq.filter(F.col("prev").isNotNull())
        .crossJoin(F.broadcast(mid))
        .select(
            "prev",
            F.col("event_type").alias("nxt"),
            F.when(F.to_date("ts") < F.col("m"), 1).otherwise(2).alias("half"),
        )
    )
    model = (
        trans.filter(F.col("half") == 1)
        .groupBy("prev", "nxt")
        .agg(F.count("*").cast("long").alias("c"))
    )
    pred = (
        model.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("prev").orderBy(F.desc("c"), "nxt")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("prev", F.col("nxt").alias("predicted"))
    )
    test = trans.filter(F.col("half") == 2).join(F.broadcast(pred), "prev")
    return test.groupBy("prev").agg(
        F.max("predicted").alias("predicted"),
        F.count("*").cast("long").alias("n_test"),
        F.sum(F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0))
        .cast("long")
        .alias("n_hit"),
        F.expr(
            "CAST((sum(CASE WHEN nxt = predicted THEN 1 ELSE 0 END)"
            " * 1000000) div count(*) AS BIGINT)"
        ).alias("hit_ppm"),
    )


# --------------------------------------------------------------------------
# 6. Systematic sampling
# --------------------------------------------------------------------------

SYS_K = 20


@query(
    "sample_systematic",
    oracle=f"""
WITH ranked AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(row_number() OVER (ORDER BY ts, event_id) - 1 AS BIGINT) AS r
  FROM events
),
start AS (
  SELECT {_pt_sql('sys#', "'seed'", SYS_K)} AS s
),
samp AS (
  SELECT cents FROM ranked, start WHERE r % {SYS_K} = s
),
pop AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pop, CAST(sum(cents) AS BIGINT) AS sp
  FROM ranked
)
SELECT (SELECT n_pop FROM pop) AS n_pop,
       CAST(count(*) AS BIGINT) AS n_sample,
       CAST((SELECT s FROM start) AS BIGINT) AS start_offset,
       CAST((1000 * (SELECT sp FROM pop)) // (SELECT n_pop FROM pop)
            AS BIGINT) AS pop_mean_milli,
       CAST((1000 * sum(cents)) // count(*) AS BIGINT) AS sample_mean_milli
FROM samp
""",
)
def sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic sampling: order the frame by (ts, event_id), draw an
    md5-derived start offset in [0, {SYS_K}), and take every
    {SYS_K}-th row — the design that gives implicit STRATIFICATION by
    the sort key for free (a time-ordered frame yields a sample spread
    evenly across the horizon, where ``sample_hash_fraction``'s
    Bernoulli draw can clump). The population and sample means sit side
    by side as the design-unbiasedness display. The known failure mode
    — periodicity in the frame aligned with k — is exactly what
    ``ts_spectral_entropy`` screens for.

    Scale shape: at 100 TB the global rank is replaced by per-partition
    ranks with offset composition (rank = partition prefix + local
    rank), keeping selection one map-side modulo; the demo uses the
    direct global form."""
    ev = load(spark, sf_dir, "events")
    # r7: the arrival-order index via the range-partitioned two-phase
    # scan (near-unique microsecond domain — the cheap-constant form);
    # no global sort, no single-partition stage
    ranked = ranged_rank_cumsum(
        ev.select(
            F.round(F.col("value") * 100).cast("long").alias("cents"),
            F.unix_micros("ts").alias("tsu"),
            "event_id",
        ),
        "tsu",
        "event_id",
        rank_col="rn",
    ).select("cents", (F.col("rn") - 1).cast("long").alias("r"))
    start = (_pt("sys#", F.lit("seed")) % SYS_K).cast("long")
    samp = ranked.withColumn("s", start).filter(
        F.col("r") % SYS_K == F.col("s")
    )
    pop = ranked.agg(
        F.count("*").cast("long").alias("n_pop"),
        F.sum("cents").cast("long").alias("sp"),
    )
    return (
        samp.agg(
            F.count("*").cast("long").alias("n_sample"),
            F.sum("cents").cast("long").alias("sc"),
            F.max("s").cast("long").alias("start_offset"),
        )
        .crossJoin(F.broadcast(pop))
        .select(
            "n_pop",
            "n_sample",
            "start_offset",
            F.expr("CAST((1000 * sp) div n_pop AS BIGINT)").alias(
                "pop_mean_milli"
            ),
            F.expr("CAST((1000 * sc) div n_sample AS BIGINT)").alias(
                "sample_mean_milli"
            ),
        )
    )
