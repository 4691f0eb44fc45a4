"""Breadth batch 30 (round 6): Viterbi burst detection, corpus BLEU,
item-item CF, business-day lag, scalar Kalman filter, apportionment.

Six operators (reference scope: the crawl log's per-feed activity bursts,
generation-quality eval over the corpus, co-fetch recommendation, SLA
calendars, smoothing noisy fetch-rate series, and pro-rata budget splits):

- ``ts_burst_viterbi``   — Kleinberg-style 2-state burst detection as an
  exact integer min-cost Viterbi path (emission = |x − rate|, switch
  penalty), with path statistics carried through the DP.
- ``eval_bleu_ngram``    — corpus BLEU-4 (clipped modified n-gram
  precision, linear brevity penalty variant) over consecutive-doc pairs.
- ``rec_item_cosine``    — item-item collaborative filtering: cosine over
  the shared-customer rating vectors, top-k pairs.
- ``fn_business_days``   — weekday-count date arithmetic via the closed
  form W(d) = 5*(d div 7) + min(d mod 7, 5); order→first-ship lag
  histogram in business days.
- ``ts_kalman_filter_1d`` — scalar random-walk Kalman filter in integer
  milli-units (fixed-point gain), innovation energy per series.
- ``agg_apportion_seats`` — largest-remainder (Hamilton) apportionment of
  a fixed budget across event types.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Two-state Viterbi burst detection
# --------------------------------------------------------------------------


def _burst_oracle() -> str:
    # argmin with deterministic tie-break: staying in the current state
    # wins ties (<=). Carried per state: cost, burst-day count, switches.
    to_base = "dp.cb <= dp.cbu + i.pen"
    to_burst = "dp.cbu <= dp.cb + i.pen"
    return f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
meta AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) // count(*) AS mu
  FROM daily GROUP BY 1
),
idx AS (
  SELECT d.event_type,
         CAST(row_number() OVER (PARTITION BY d.event_type ORDER BY d.d)
              AS BIGINT) AS i,
         d.x, m.mu, m.mu // 2 + 1 AS pen
  FROM daily d JOIN meta m ON d.event_type = m.event_type
),
dp AS (
  SELECT event_type, i,
         CAST(abs(x - mu) AS BIGINT) AS cb,
         CAST(0 AS BIGINT) AS bdb, CAST(0 AS BIGINT) AS swb,
         CAST(abs(x - 2 * mu) + pen AS BIGINT) AS cbu,
         CAST(1 AS BIGINT) AS bdu, CAST(0 AS BIGINT) AS swu
  FROM idx WHERE i = 1
  UNION ALL
  SELECT i.event_type, i.i,
         CAST(abs(i.x - i.mu)
              + CASE WHEN {to_base} THEN dp.cb ELSE dp.cbu + i.pen END
              AS BIGINT),
         CAST(CASE WHEN {to_base} THEN dp.bdb ELSE dp.bdu END AS BIGINT),
         CAST(CASE WHEN {to_base} THEN dp.swb ELSE dp.swu + 1 END AS BIGINT),
         CAST(abs(i.x - 2 * i.mu)
              + CASE WHEN {to_burst} THEN dp.cbu ELSE dp.cb + i.pen END
              AS BIGINT),
         CAST(1 + CASE WHEN {to_burst} THEN dp.bdu ELSE dp.bdb END AS BIGINT),
         CAST(CASE WHEN {to_burst} THEN dp.swu ELSE dp.swb + 1 END AS BIGINT)
  FROM dp JOIN idx i ON i.event_type = dp.event_type AND i.i = dp.i + 1
)
SELECT d.event_type, m.n AS n_days,
       CASE WHEN d.cb <= d.cbu THEN d.cb ELSE d.cbu END AS total_cost,
       CASE WHEN d.cb <= d.cbu THEN d.bdb ELSE d.bdu END AS burst_days,
       CASE WHEN d.cb <= d.cbu THEN d.swb ELSE d.swu END AS n_switches
FROM dp d JOIN meta m ON m.event_type = d.event_type AND d.i = m.n
"""


@query("ts_burst_viterbi", oracle=_burst_oracle())
def ts_burst_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-state burst detection (Kleinberg's automaton, integer form) on
    each event-type's daily count series: states base (rate mu) and burst
    (rate 2mu), emission cost |x − rate|, switch penalty mu/2 + 1; the
    min-cost Viterbi path's cost, burst-day count and switch count are
    carried THROUGH the DP (argmin tie → stay), so path statistics come
    out without a backtrace pass. Exact BIGINT arithmetic end to end;
    the oracle replays the identical recurrence as a recursive CTE with
    six carried columns (the ts_dtw_pattern technique).

    Scale shape: daily collapse map-side, then one Arrow batch per key
    (applyInPandas), O(n_days) per key with date-range-bounded series —
    the same 100 TB argument as ts_mann_kendall_trend. Reference parity:
    ingest.py's per-feed fetch cadence is exactly the bursty/baseline
    signal this segments."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count("*").cast("long").alias("x")
    )
    out_schema = (
        "event_type string, n_days long, total_cost long, "
        "burst_days long, n_switches long"
    )

    def viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        xs = [int(v) for v in pdf["x"]]
        n = len(xs)
        mu = sum(xs) // n
        pen = mu // 2 + 1
        cb, bdb, swb = abs(xs[0] - mu), 0, 0
        cbu, bdu, swu = abs(xs[0] - 2 * mu) + pen, 1, 0
        for x in xs[1:]:
            if cb <= cbu + pen:
                ncb, nbdb, nswb = cb, bdb, swb
            else:
                ncb, nbdb, nswb = cbu + pen, bdu, swu + 1
            if cbu <= cb + pen:
                ncbu, nbdu, nswu = cbu, bdu, swu
            else:
                ncbu, nbdu, nswu = cb + pen, bdb, swb + 1
            cb, bdb, swb = abs(x - mu) + ncb, nbdb, nswb
            cbu, bdu, swu = abs(x - 2 * mu) + ncbu, 1 + nbdu, nswu
        if cb <= cbu:
            cost, bd, sw = cb, bdb, swb
        else:
            cost, bd, sw = cbu, bdu, swu
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [n],
                "total_cost": [cost],
                "burst_days": [bd],
                "n_switches": [sw],
            }
        )

    return daily.groupBy("event_type").applyInPandas(viterbi, out_schema)


# --------------------------------------------------------------------------
# 2. Corpus BLEU-4
# --------------------------------------------------------------------------

BLEU_ORDERS = (1, 2, 3, 4)


def _bleu_oracle() -> str:
    gram_blocks = []
    for n in BLEU_ORDERS:
        for side in ("h", "r"):
            col = "hyp" if side == "h" else "ref"
            gram_blocks.append(
                f"""g{side}{n} AS (
  SELECT pid, {n} AS n, unnest(
    CASE WHEN len({col}) >= {n}
         THEN list_transform(range(1, len({col}) - {n} + 2),
                             i -> array_to_string({col}[i:i+{n - 1}], ' '))
         ELSE [] END) AS gram
  FROM pairs
)"""
            )
    hu = " UNION ALL ".join(f"SELECT * FROM gh{n}" for n in BLEU_ORDERS)
    ru = " UNION ALL ".join(f"SELECT * FROM gr{n}" for n in BLEU_ORDERS)
    return f"""
WITH docs2 AS (
  SELECT source, doc_id, string_split(text, ' ') AS w FROM documents
),
pairs AS (
  SELECT doc_id AS pid, w AS hyp,
         lead(w) OVER (PARTITION BY source ORDER BY doc_id) AS ref
  FROM docs2 QUALIFY ref IS NOT NULL
),
{','.join(gram_blocks)},
hc AS (SELECT pid, n, gram, CAST(count(*) AS BIGINT) AS ch
       FROM ({hu}) GROUP BY 1, 2, 3),
rc AS (SELECT pid, n, gram, CAST(count(*) AS BIGINT) AS cr
       FROM ({ru}) GROUP BY 1, 2, 3),
clipped AS (
  SELECT h.n,
         CAST(sum(least(h.ch, coalesce(r.cr, 0))) AS BIGINT) AS num,
         CAST(sum(h.ch) AS BIGINT) AS den
  FROM hc h LEFT JOIN rc r ON h.pid = r.pid AND h.n = r.n AND h.gram = r.gram
  GROUP BY h.n
),
lens AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(len(hyp)) AS BIGINT) AS c_len,
         CAST(sum(len(ref)) AS BIGINT) AS r_len
  FROM pairs
),
piv AS (
  SELECT max(CASE WHEN n = 1 THEN num END) AS num1,
         max(CASE WHEN n = 1 THEN den END) AS den1,
         max(CASE WHEN n = 2 THEN num END) AS num2,
         max(CASE WHEN n = 2 THEN den END) AS den2,
         max(CASE WHEN n = 3 THEN num END) AS num3,
         max(CASE WHEN n = 3 THEN den END) AS den3,
         max(CASE WHEN n = 4 THEN num END) AS num4,
         max(CASE WHEN n = 4 THEN den END) AS den4
  FROM clipped
)
SELECT l.n_pairs, l.c_len, l.r_len,
       p.num1, p.den1, p.num2, p.den2, p.num3, p.den3, p.num4, p.den4,
       round(least(1.0, CAST(l.c_len AS DOUBLE) / l.r_len), 6) AS bp,
       round(least(1.0, CAST(l.c_len AS DOUBLE) / l.r_len)
             * sqrt(sqrt((CAST(p.num1 AS DOUBLE) / p.den1)
                         * (CAST(p.num2 AS DOUBLE) / p.den2)
                         * (CAST(p.num3 AS DOUBLE) / p.den3)
                         * (CAST(p.num4 AS DOUBLE) / p.den4))), 6) AS bleu
FROM lens l, piv p
"""


@query("eval_bleu_ngram", oracle=_bleu_oracle())
def eval_bleu_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU-4 between each document (hypothesis) and its successor
    within the same source (reference) — the ROUGE sibling
    (eval_rouge_ngram) from the precision side: clipped modified n-gram
    precision p_n = Sigma min(count_hyp, count_ref) / Sigma count_hyp for
    n = 1..4, all counts exact BIGINTs; geometric mean via sqrt(sqrt(
    p1·p2·p3·p4)) (IEEE sqrt is correctly rounded — no transcendental
    exp/log needed) and the LINEAR brevity penalty min(1, c/r)
    (documented variant: the classic e^(1−r/c) differs across libms;
    for c ≥ r both are exactly 1).

    Scale shape (r11 opt, guide §4.2/§2.4): the hypothesis and its
    reference live in the SAME ROW, so the clipped counts are a per-row
    multiset intersection — no distributed state at all. The old plan
    exploded BOTH sides' n-gram multisets into two (pid, n, gram)
    hash-aggs and a clip join — three exchanges moving every n-gram
    string of the corpus — to join a row with itself. Now one Arrow
    mapInPandas pass computes per-batch partial sums (Counter
    intersection per pair — exact BIGINT counts, the same min/Σ
    arithmetic), and a scalar agg folds the ≤one-row-per-batch partials:
    ZERO n-gram bytes ever shuffle, and the pair frame no longer needs
    pinning (single consumer). The final formula is evaluated on the
    same integer totals, so bp/bleu bits are unchanged."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    pairs = fan_out(
        docs.select(
            "source",
            "doc_id",
            F.split("text", " ").alias("hyp"),
        )
        .withColumn("ref", F.lead("hyp").over(w))
        .filter(F.col("ref").isNotNull())
        .select("hyp", "ref")
    )

    fields = (
        ["n_pairs", "c_len", "r_len"]
        + [f"{c}{n}" for n in BLEU_ORDERS for c in ("num", "den")]
    )
    out_schema = ", ".join(f"{f} long" for f in fields)

    def _bleu_partials(batches):
        from collections import Counter

        for pdf in batches:
            n_pairs = c_len = r_len = 0
            nums = dict.fromkeys(BLEU_ORDERS, 0)
            dens = dict.fromkeys(BLEU_ORDERS, 0)
            for h, r in zip(pdf["hyp"].tolist(), pdf["ref"].tolist()):
                h = list(h)
                r = list(r)
                n_pairs += 1
                c_len += len(h)
                r_len += len(r)
                for n in BLEU_ORDERS:
                    if len(h) < n:
                        continue
                    dens[n] += len(h) - n + 1
                    hc = Counter(
                        tuple(h[i : i + n]) for i in range(len(h) - n + 1)
                    )
                    if len(r) >= n:
                        rc = Counter(
                            tuple(r[i : i + n]) for i in range(len(r) - n + 1)
                        )
                        nums[n] += sum((hc & rc).values())
            row = [n_pairs, c_len, r_len] + [
                x for n in BLEU_ORDERS for x in (nums[n], dens[n])
            ]
            yield pd.DataFrame([row], columns=fields)

    partials = pairs.mapInPandas(_bleu_partials, out_schema)
    totals = partials.agg(
        F.coalesce(F.sum("n_pairs"), F.lit(0)).cast("long").alias("n_pairs"),
        *[F.sum(f).cast("long").alias(f) for f in fields[1:]],
    )
    bp = F.least(F.lit(1.0), F.col("c_len").cast("double") / F.col("r_len"))
    prod = (
        (F.col("num1").cast("double") / F.col("den1"))
        * (F.col("num2").cast("double") / F.col("den2"))
        * (F.col("num3").cast("double") / F.col("den3"))
        * (F.col("num4").cast("double") / F.col("den4"))
    )
    return totals.select(
        "n_pairs",
        "c_len",
        "r_len",
        "num1",
        "den1",
        "num2",
        "den2",
        "num3",
        "den3",
        "num4",
        "den4",
        F.round(bp, 6).alias("bp"),
        F.round(bp * F.sqrt(F.sqrt(prod)), 6).alias("bleu"),
    )


# --------------------------------------------------------------------------
# 3. Item-item cosine CF
# --------------------------------------------------------------------------

COSINE_TOPK = 20
COSINE_MIN_COMMON = 2
# Per-customer rating-list cap: bounds the CF self-join's pair volume to
# cap² per customer (Σ degree² → n·cap²), the same bound-the-per-key-fanout
# philosophy as the salted LSH bands (operators/dedup.py). Heavy raters
# contribute the least signal per pair (Sarwar et al. 2001 §4.3).
COSINE_RATING_CAP = 50


def item_cosine_topk(
    ratings: DataFrame,
    cap: int = COSINE_RATING_CAP,
    min_common: int = COSINE_MIN_COMMON,
    k: int = COSINE_TOPK,
) -> DataFrame:
    """Capped item-item cosine kernel over a (cid, pid, r) ratings frame.

    Scale contract: (1) each customer's rating list is capped to its top
    ``cap`` items by rating (deterministic tie-break on pid) BEFORE the
    self-join, so pair volume is ≤ n_customers·cap² instead of
    Σ degree² — one hot customer can no longer emit billions of pairs;
    (2) the global top-k is ``orderBy().limit(k)`` (TakeOrderedAndProject,
    per-partition heaps + driver merge of k·n_part rows), with the rank
    column computed on the k survivors only — no unbounded
    single-partition WindowExec (plan-asserted in tests/test_rec_cf.py).
    """
    # r11 note (measured and REJECTED): a row-local variant — per-cid
    # collect_list + in-row sort/cap + HOF pair generation, mirroring the
    # market_basket rewrite — benched ~2x SLOWER here (two full-bench runs,
    # rec_item_cosine 2.3 s -> 4.6-5.2 s): the rating cap makes per-row
    # pair arrays ~cap² structs, and Spark evaluates higher-order
    # functions interpreted (no codegen — the dedup.py:86 finding), so the
    # in-row slice/transform chain cost more than the co-partitioned
    # self-join it replaced. Keeping the window-cap + self-join shape.
    capped = (
        ratings.withColumn(
            "_urk",
            F.row_number().over(
                Window.partitionBy("cid").orderBy(F.desc("r"), "pid")
            ),
        )
        .filter(F.col("_urk") <= cap)
        .drop("_urk")
        # three consumers (both self-join sides + norms) would each re-run
        # the upstream join+agg+cap; pin the capped ratings once. persist
        # (not localCheckpoint): the cache keeps the cap window's
        # hashpartitioning(cid) + sort, so BOTH self-join sides read it
        # exchange-free — the cap's shuffle replaces the join's, it does
        # not add to it. Caller-owned cache (cleared per query by the
        # harness), same contract as the graph iterates.
        .persist()
    )
    norms = capped.groupBy("pid").agg(
        F.sum(F.col("r") * F.col("r")).cast("long").alias("n2")
    )
    a = capped.select("cid", F.col("pid").alias("pid1"), F.col("r").alias("r1"))
    b = capped.select("cid", F.col("pid").alias("pid2"), F.col("r").alias("r2"))
    pairs = (
        a.join(b, "cid")
        .filter(F.col("pid1") < F.col("pid2"))
        .groupBy("pid1", "pid2")
        .agg(
            F.sum(F.col("r1") * F.col("r2")).cast("long").alias("num"),
            F.count("*").cast("long").alias("n_common"),
        )
        .filter(F.col("n_common") >= min_common)
    )
    scored = (
        pairs.join(norms.withColumnRenamed("pid", "pid1").withColumnRenamed("n2", "n2a"), "pid1")
        .join(norms.withColumnRenamed("pid", "pid2").withColumnRenamed("n2", "n2b"), "pid2")
        .select(
            "pid1",
            "pid2",
            "num",
            "n_common",
            F.round(
                F.col("num").cast("double")
                / F.sqrt(F.col("n2a").cast("double") * F.col("n2b").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    survivors = scored.orderBy(F.desc("cosine"), "pid1", "pid2").limit(k)
    return (
        survivors.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("cosine"), "pid1", "pid2"))
            .cast("int"),
        )
        .select("pid1", "pid2", "num", "n_common", "cosine", "rk")
    )


@query(
    "rec_item_cosine",
    oracle=f"""
WITH ratings_raw AS (
  SELECT o.o_custkey AS cid, l.l_partkey AS pid,
         CAST(round(sum(l.l_quantity)) AS BIGINT) AS r
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
ratings AS (
  SELECT cid, pid, r FROM (
    SELECT *, row_number() OVER (PARTITION BY cid ORDER BY r DESC, pid)
                AS urk
    FROM ratings_raw
  ) WHERE urk <= {COSINE_RATING_CAP}
),
norms AS (
  SELECT pid, CAST(sum(r * r) AS BIGINT) AS n2 FROM ratings GROUP BY pid
),
pairs AS (
  SELECT a.pid AS pid1, b.pid AS pid2,
         CAST(sum(a.r * b.r) AS BIGINT) AS num,
         CAST(count(*) AS BIGINT) AS n_common
  FROM ratings a JOIN ratings b ON a.cid = b.cid AND a.pid < b.pid
  GROUP BY 1, 2
),
scored AS (
  SELECT p.pid1, p.pid2, p.num, p.n_common,
         round(CAST(p.num AS DOUBLE)
               / sqrt(CAST(x.n2 AS DOUBLE) * CAST(y.n2 AS DOUBLE)), 6)
           AS cosine
  FROM pairs p
  JOIN norms x ON p.pid1 = x.pid
  JOIN norms y ON p.pid2 = y.pid
  WHERE p.n_common >= {COSINE_MIN_COMMON}
)
SELECT pid1, pid2, num, n_common, cosine, rk FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY cosine DESC, pid1, pid2)
                 AS INT) AS rk
  FROM scored
) WHERE rk <= {COSINE_TOPK}
""",
)
def rec_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: cosine similarity between part
    rating vectors (rating = total quantity by customer), computed over
    shared customers only — the classic "customers who bought X also
    bought Y" kernel (Sarwar et al. 2001). Numerators and norms are exact
    BIGINTs; pairs need ≥ {COSINE_MIN_COMMON} common raters;
    top-{COSINE_TOPK} by cosine with deterministic tie-break.

    Scale shape (see item_cosine_topk): per-customer rating lists are
    capped to their top {COSINE_RATING_CAP} items BEFORE the
    customer-keyed self-join, bounding pair volume to n·cap² instead of
    Σ degree²; the global top-k is TakeOrderedAndProject with the rank
    computed on the k survivors only. The oracle applies the identical
    cap CTE. Reference parity: the co-fetch affinity vectorize.py's
    neighbor queries approximate."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    ratings = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("cid"), F.col("l_partkey").alias("pid"))
        .agg(F.round(F.sum("l_quantity")).cast("long").alias("r"))
    )
    return item_cosine_topk(ratings)


# --------------------------------------------------------------------------
# 4. Business-day lag histogram
# --------------------------------------------------------------------------

# W(d) = weekdays strictly before day-number d (day 0 = Mon 1970-01-05)
_W_SQL = "(5 * ({d} // 7) + least({d} % 7, 5))"


@query(
    "fn_business_days",
    oracle=f"""
WITH ship AS (
  SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
  FROM lineitem GROUP BY 1
),
lag AS (
  SELECT
    {_W_SQL.format(d="(s.first_ship - DATE '1970-01-05')")}
      - {_W_SQL.format(d="(CAST(o.o_orderdate AS DATE) - DATE '1970-01-05')")}
      AS bdays
  FROM orders o JOIN ship s ON o.o_orderkey = s.l_orderkey
)
SELECT CAST(bdays AS BIGINT) AS bdays, CAST(count(*) AS BIGINT) AS n_orders
FROM lag GROUP BY 1
""",
)
def fn_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day (Mon-Fri) lag between order placement and first
    shipment, as a histogram — the SLA metric calendars are built on.
    Weekday counting uses the closed form W(d) = 5·(d div 7) +
    min(d mod 7, 5) with d = days since Monday 1970-01-05, so the lag is
    W(ship) − W(order): pure integer arithmetic, no engine-specific
    day-of-week numbering (Spark and DuckDB disagree on dayofweek()
    origins; date subtraction they agree on exactly).

    Scale shape: first-ship is a map-side-combined min per order; the
    join is equi on the order key; the histogram collapses to the
    (bounded) distinct-lag table."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    ship = li.groupBy("l_orderkey").agg(
        F.min(F.to_date("l_shipdate")).alias("first_ship")
    )
    epoch = F.lit("1970-01-05").cast("date")
    joined = orders.join(ship, orders.o_orderkey == ship.l_orderkey).select(
        F.datediff(F.col("first_ship"), epoch).cast("long").alias("ds"),
        F.datediff(F.to_date("o_orderdate"), epoch).cast("long").alias("do"),
    )
    w_ship = F.expr("5 * (ds div 7) + least(ds % 7, 5)")
    w_ord = F.expr("5 * (do div 7) + least(do % 7, 5)")
    return (
        joined.select((w_ship - w_ord).cast("long").alias("bdays"))
        .groupBy("bdays")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# 5. Scalar Kalman filter
# --------------------------------------------------------------------------

KF_Q = 200_000  # process noise (fixed-point P units)
KF_R = 1_000_000  # observation noise


@query(
    "ts_kalman_filter_1d",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS z
  FROM events GROUP BY 1, 2
),
meta AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM daily GROUP BY 1),
idx AS (
  SELECT event_type,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
              AS BIGINT) AS i,
         z
  FROM daily
),
dp AS (
  SELECT event_type, i, CAST(z * 1000 AS BIGINT) AS xhat,
         CAST({KF_R} AS BIGINT) AS p, CAST(0 AS BIGINT) AS sse
  FROM idx WHERE i = 1
  UNION ALL
  SELECT i.event_type, i.i,
         CAST(dp.xhat
              + ((1000 * (dp.p + {KF_Q})) // (dp.p + {KF_Q} + {KF_R}))
                * (i.z * 1000 - dp.xhat) // 1000 AS BIGINT),
         CAST((1000 - (1000 * (dp.p + {KF_Q}))
                      // (dp.p + {KF_Q} + {KF_R}))
              * (dp.p + {KF_Q}) // 1000 AS BIGINT),
         CAST(dp.sse + ((i.z * 1000 - dp.xhat) // 1000)
                       * ((i.z * 1000 - dp.xhat) // 1000) AS BIGINT)
  FROM dp JOIN idx i ON i.event_type = dp.event_type AND i.i = dp.i + 1
)
SELECT d.event_type, m.n AS n_days, d.xhat AS xhat_milli,
       d.p AS p_final, d.sse AS innov_sse
FROM dp d JOIN meta m ON m.event_type = d.event_type AND d.i = m.n
""",
)
def ts_kalman_filter_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar random-walk Kalman filter over each event-type's daily
    total, in integer milli-units: predict P' = P + Q, fixed-point gain
    K = 1000·P'/(P'+R) (truncating), update x̂ += K·innov/1000,
    P = (1000−K)·P'/1000 — the streaming smoother every metrics pipeline
    runs, made bit-exact in both engines by keeping the gain in
    milli-units and letting only truncating integer division appear.
    Emits the final state, final covariance, and the sum of squared
    innovations (the online model-fit diagnostic).

    Scale shape: daily collapse map-side; one Arrow batch per key with
    O(1) state per step (three BIGINTs) — the applyInPandasWithState
    shape if run streaming. Reference parity: smoothing ingest.py's
    per-feed fetch-latency series."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.sum(F.round("value").cast("long")).cast("long").alias("z")
    )
    out_schema = (
        "event_type string, n_days long, xhat_milli long, "
        "p_final long, innov_sse long"
    )

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // b
        return -q if a < 0 else q

    def kf(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        zs = [int(v) for v in pdf["z"]]
        xhat, p, sse = zs[0] * 1000, KF_R, 0
        for z in zs[1:]:
            pp = p + KF_Q
            k = (1000 * pp) // (pp + KF_R)
            innov = z * 1000 - xhat
            xhat = xhat + tdiv(k * innov, 1000)
            p = ((1000 - k) * pp) // 1000
            sse = sse + tdiv(innov, 1000) * tdiv(innov, 1000)
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(zs)],
                "xhat_milli": [xhat],
                "p_final": [p],
                "innov_sse": [sse],
            }
        )

    return daily.groupBy("event_type").applyInPandas(kf, out_schema)


# --------------------------------------------------------------------------
# 6. Largest-remainder apportionment
# --------------------------------------------------------------------------

SEATS = 1000


@query(
    "agg_apportion_seats",
    oracle=f"""
WITH cnt AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cnt),
quota AS (
  SELECT c.event_type, c.n,
         (c.n * {SEATS}) // t.total AS base_seats,
         (c.n * {SEATS}) % t.total AS rem
  FROM cnt c, tot t
),
ranked AS (
  SELECT *, CAST(row_number() OVER (ORDER BY rem DESC, event_type)
                 AS BIGINT) AS rr,
         CAST({SEATS} AS BIGINT) - sum(base_seats) OVER () AS leftover
  FROM quota
)
SELECT event_type, n, base_seats,
       CAST(CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
       CAST(base_seats + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS seats
FROM ranked
""",
)
def agg_apportion_seats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment: split a fixed budget of
    {SEATS} seats across event types proportionally to their event counts
    — floor quotas first, then the leftover seats go to the largest
    fractional remainders (ties → type name). The exact pro-rata
    allocation kernel behind sampling budgets, shard assignment, and
    quota splits; all integer (quotient/remainder of n·S by N).

    Scale shape: one map-side-combined count to k rows; the ranking
    window runs on k rows. The invariant Sigma seats = {SEATS} holds by
    construction and is asserted in tests/test_breadth30.py."""
    ev = load(spark, sf_dir, "events")
    cnt = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    tot = cnt.agg(F.sum("n").cast("long").alias("total"))
    quota = cnt.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n",
        F.expr(f"(n * {SEATS}) div total").alias("base_seats"),
        ((F.col("n") * SEATS) % F.col("total")).alias("rem"),
    )
    w = Window.orderBy(F.desc("rem"), "event_type")
    wall = Window.partitionBy()
    ranked = quota.select(
        "event_type",
        "n",
        "base_seats",
        F.row_number().over(w).cast("long").alias("rr"),
        (F.lit(SEATS) - F.sum("base_seats").over(wall)).cast("long").alias(
            "leftover"
        ),
    )
    extra = F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
    return ranked.select(
        "event_type",
        "n",
        "base_seats",
        extra.cast("long").alias("extra"),
        (F.col("base_seats") + extra).cast("long").alias("seats"),
    )
