"""Breadth batch 47 (round 6): bagged stumps, null-rate drift,
Hodges-Lehmann, query likelihood, ETC bandit replay, bow-tie structure.

Six operators (reference scope: variance-reduced weak learners to
complement boosting, schema-health drift alarms, robust shift estimates,
the probabilistic twin of BM25, decision-process replay with regret
accounting, and the classic web-graph macro-structure census):

- ``ml_bagging_stumps``     — 8 deterministic Poisson-bootstrap bags,
  best stump per bag, majority vote (bagging vs batch-44's boosting).
- ``dq_null_drift``         — per-column validity-rate drift between
  horizon halves with ppm alarms.
- ``stat_hodges_lehmann``   — pairwise-difference median shift estimate
  + Walsh-average pseudo-median (the Mann-Whitney estimator).
- ``search_query_likelihood`` — Dirichlet-smoothed query-likelihood
  document ranking (Zhai & Lafferty), exact rational inner terms.
- ``eval_bandit_etc_regret`` — explore-then-commit bandit replay over
  the daily arm rewards with exact regret accounting.
- ``graph_bowtie_classify`` — CORE/IN/OUT/OTHER bow-tie census from
  fixed-depth forward+backward reachability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.plans.breadth33 import _POIS_CDF, _boot_weight_sql
from nocouncil_etl_spark.plans.breadth44 import ADA_STUMPS, _ADA_STUMPS_SQL
from nocouncil_etl_spark.plans.graph_plans import _EDGES_SQL, _graph
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. Bagged stumps (the bagging complement of ml_adaboost_stumps)
# --------------------------------------------------------------------------

BAG_B = 8


@query(
    "ml_bagging_stumps",
    oracle=f"""
WITH data AS MATERIALIZED (
  SELECT event_id, CAST(round(value) AS BIGINT) AS v,
         CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS BIGINT) AS dw,
         CAST(hour(ts) AS BIGINT) AS hr,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS y
  FROM events
),
stumps(sid, feat, thr) AS (VALUES {_ADA_STUMPS_SQL}),
hs AS MATERIALIZED (
  SELECT d.event_id, d.y, s.sid,
         CASE WHEN (CASE s.feat WHEN 'v' THEN d.v WHEN 'dw' THEN d.dw
                    ELSE d.hr END) >= s.thr THEN 1 ELSE -1 END AS h
  FROM data d, stumps s
),
bags AS (SELECT unnest(range(0, {BAG_B})) AS b),
bw AS MATERIALIZED (
  SELECT d.event_id, g.b,
         CAST({_boot_weight_sql(_pt_sql('bag#', "CAST(g.b AS VARCHAR) || ':' || CAST(d.event_id AS VARCHAR)", 1_000_000_000))}
              AS BIGINT) AS w
  FROM data d, bags g
),
errs AS (
  SELECT w.b, h.sid,
         CAST(sum(CASE WHEN h.h <> h.y THEN w.w ELSE 0 END) AS BIGINT)
           AS werr,
         CAST(sum(w.w) AS BIGINT) AS wtot
  FROM hs h JOIN bw w ON h.event_id = w.event_id
  GROUP BY 1, 2
),
winners AS MATERIALIZED (
  SELECT b, sid, werr, wtot FROM (
    SELECT *, row_number() OVER (PARTITION BY b ORDER BY werr, sid) AS rk
    FROM errs
  ) WHERE rk = 1
),
votes AS (
  SELECT h.event_id, max(h.y) AS y, CAST(sum(h.h) AS BIGINT) AS vote
  FROM hs h JOIN winners wn ON h.sid = wn.sid
  GROUP BY h.event_id
),
acc AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN (CASE WHEN vote >= 0 THEN 1 ELSE -1 END) = y
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
  FROM votes
)
SELECT w.b AS bag, CAST(w.sid AS BIGINT) AS sid,
       CAST((w.werr * 1000000) // w.wtot AS BIGINT) AS eps_ppm,
       a.n, a.n_correct,
       CAST((a.n_correct * 1000000) // a.n AS BIGINT) AS acc_ppm
FROM winners w, acc a
""",
)
def ml_bagging_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bagging (Breiman 1996) over the SAME stump pool and label as
    ``ml_adaboost_stumps``: {BAG_B} deterministic Poisson(1)-bootstrap
    bags (the ``sample_poisson_bootstrap`` weight inverter keyed by
    bag×event — Poisson weights ARE the distributed bootstrap, no
    resampled copies materialize), each bag picks its best stump by
    weighted error, and the ensemble majority-votes. Boosting reweights
    sequentially to cut bias; bagging averages independent fits to cut
    variance — shipping both, sharing the weak-learner machinery, is
    the point. Note a bag's vote sums raw ±1 stump outputs, so a
    repeated winning stump weighs more — the multiset vote.

    Scale shape: one (row × stump) and one (row × bag) broadcast
    expansion, both hash-agged map-side; bags are embarrassingly
    parallel (vs boosting's inherent rounds)."""
    ev = load(spark, sf_dir, "events")
    data = ev.select(
        "event_id",
        F.round("value").cast("long").alias("v"),
        (F.datediff(F.to_date("ts"), F.lit("1970-01-05").cast("date")) % 7)
        .cast("long")
        .alias("dw"),
        F.hour("ts").cast("long").alias("hr"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(-1).alias("y"),
    )
    stumps = spark.createDataFrame(
        list(ADA_STUMPS), "sid LONG, feat STRING, thr LONG"
    )
    hs = data.crossJoin(F.broadcast(stumps)).select(
        "event_id",
        "y",
        "sid",
        F.expr(
            "CASE WHEN (CASE feat WHEN 'v' THEN v WHEN 'dw' THEN dw"
            " ELSE hr END) >= thr THEN 1 ELSE -1 END"
        ).alias("h"),
    )
    bags = spark.range(BAG_B).select(F.col("id").alias("b"))
    u = _pt(
        "bag#",
        F.concat(
            F.col("b").cast("string"), F.lit(":"), F.col("event_id").cast("string")
        ),
    ) % 1_000_000_000
    w_expr = F.lit(8)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w_expr = F.when(u < _POIS_CDF[k], k).otherwise(w_expr)
    bw = data.select("event_id").crossJoin(F.broadcast(bags)).select(
        "event_id", "b", w_expr.cast("long").alias("w")
    )
    errs = (
        hs.join(bw, "event_id")
        .groupBy("b", "sid")
        .agg(
            F.sum(F.when(F.col("h") != F.col("y"), F.col("w")).otherwise(0))
            .cast("long")
            .alias("werr"),
            F.sum("w").cast("long").alias("wtot"),
        )
    )
    winners = (
        errs.withColumn(
            "rk", F.row_number().over(Window.partitionBy("b").orderBy("werr", "sid"))
        )
        .filter(F.col("rk") == 1)
        .select("b", "sid", "werr", "wtot")
    )
    votes = (
        hs.join(F.broadcast(winners.select("sid")), "sid")
        .groupBy("event_id")
        .agg(F.max("y").alias("y"), F.sum("h").cast("long").alias("vote"))
    )
    acc = votes.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when(
                F.expr("(CASE WHEN vote >= 0 THEN 1 ELSE -1 END) = y"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_correct"),
    )
    return winners.crossJoin(F.broadcast(acc)).select(
        F.col("b").alias("bag"),
        F.col("sid").cast("long"),
        F.expr("CAST((werr * 1000000) div wtot AS BIGINT)").alias("eps_ppm"),
        "n",
        "n_correct",
        F.expr("CAST((n_correct * 1000000) div n AS BIGINT)").alias("acc_ppm"),
    )


# --------------------------------------------------------------------------
# 2. Null / validity drift between horizon halves
# --------------------------------------------------------------------------

# (check name, SQL predicate marking a row INVALID for that check)
_NULL_CHECKS = (
    ("value_nonneg", "value IS NULL OR value < 0"),
    ("props_present", "props IS NULL OR length(props) = 0"),
    ("user_id_present", "user_id IS NULL"),
)
DQ_DRIFT_ALARM_PPM = 10000


def _nd_oracle() -> str:
    checks = ", ".join(f"('{n}')" for n, _ in _NULL_CHECKS)
    cases = " ".join(
        f"WHEN c.name = '{n}' THEN CASE WHEN {p} THEN 1 ELSE 0 END"
        for n, p in _NULL_CHECKS
    )
    return f"""
WITH mid AS (
  SELECT min(CAST(ts AS DATE))
         + CAST((max(CAST(ts AS DATE)) - min(CAST(ts AS DATE))) // 2
                AS INTEGER) AS m
  FROM events
),
checks(name) AS (VALUES {checks}),
marked AS (
  SELECT c.name,
         CASE WHEN CAST(e.ts AS DATE) < (SELECT m FROM mid)
              THEN 1 ELSE 2 END AS half,
         CASE {cases} END AS bad
  FROM events e, checks c
),
agg AS (
  SELECT name, half, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(bad) AS BIGINT) AS n_bad
  FROM marked GROUP BY 1, 2
)
SELECT a.name AS check_name, a.n AS n1, a.n_bad AS bad1, b.n AS n2,
       b.n_bad AS bad2,
       CAST((a.n_bad * 1000000) // a.n AS BIGINT) AS rate1_ppm,
       CAST((b.n_bad * 1000000) // b.n AS BIGINT) AS rate2_ppm,
       CAST((b.n_bad * 1000000) // b.n - (a.n_bad * 1000000) // a.n
            AS BIGINT) AS drift_ppm,
       CAST(CASE WHEN abs((b.n_bad * 1000000) // b.n
                          - (a.n_bad * 1000000) // a.n)
                      > {DQ_DRIFT_ALARM_PPM}
            THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM (SELECT * FROM agg WHERE half = 1) a
JOIN (SELECT * FROM agg WHERE half = 2) b ON a.name = b.name
"""


@query("dq_null_drift", oracle=_nd_oracle())
def dq_null_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validity-rate drift monitor: each declared column check (null /
    negative / empty predicates) is evaluated on both halves of the
    ingest horizon and the ppm rate delta is alarmed past
    ±{DQ_DRIFT_ALARM_PPM} ppm — the schema-health companion to
    ``agg_psi_drift`` (which watches the value DISTRIBUTION; this
    watches structural validity, which is what actually breaks when an
    upstream producer ships a bad deploy mid-horizon). Absolute rates
    sit beside the delta so a check that was always broken is
    distinguishable from one that just broke.

    Scale shape: one pass, conditional sums per (check, half) — the
    check table broadcasts; fully map-side-combinable."""
    ev = load(spark, sf_dir, "events")
    mid = ev.agg(
        F.expr(
            "min(to_date(ts)) + CAST(datediff(max(to_date(ts)),"
            " min(to_date(ts))) div 2 AS INT)"
        ).alias("m")
    )
    out = None
    evm = ev.crossJoin(F.broadcast(mid)).withColumn(
        "half", F.when(F.to_date("ts") < F.col("m"), 1).otherwise(2)
    )
    for name, pred in _NULL_CHECKS:
        agg = evm.groupBy("half").agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).cast("long").alias("n_bad"),
        )
        a = agg.filter(F.col("half") == 1).select(
            F.col("n").alias("n1"), F.col("n_bad").alias("bad1")
        )
        b = agg.filter(F.col("half") == 2).select(
            F.col("n").alias("n2"), F.col("n_bad").alias("bad2")
        )
        row = (
            a.crossJoin(b)
            .select(
                F.lit(name).alias("check_name"),
                "n1",
                "bad1",
                "n2",
                "bad2",
                F.expr("CAST((bad1 * 1000000) div n1 AS BIGINT)").alias("rate1_ppm"),
                F.expr("CAST((bad2 * 1000000) div n2 AS BIGINT)").alias("rate2_ppm"),
                F.expr(
                    "CAST((bad2 * 1000000) div n2 - (bad1 * 1000000) div n1"
                    " AS BIGINT)"
                ).alias("drift_ppm"),
                F.expr(
                    "CAST(CASE WHEN abs((bad2 * 1000000) div n2"
                    f" - (bad1 * 1000000) div n1) > {DQ_DRIFT_ALARM_PPM}"
                    " THEN 1 ELSE 0 END AS BIGINT)"
                ).alias("alarm"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


# --------------------------------------------------------------------------
# 3. Hodges-Lehmann estimators
# --------------------------------------------------------------------------


@query(
    "stat_hodges_lehmann",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(sum(CAST(round(value) AS BIGINT)) AS BIGINT) AS y
  FROM events WHERE event_type IN ('click', 'view')
  GROUP BY 1, 2
),
a AS (SELECT d, y FROM daily WHERE event_type = 'click'),
b AS (SELECT d, y FROM daily WHERE event_type = 'view'),
diffs AS (
  SELECT a.y - b.y AS dv FROM a, b
),
dmeta AS (SELECT CAST(count(*) AS BIGINT) AS np FROM diffs),
hl AS (
  SELECT dv FROM (
    SELECT dv, row_number() OVER (ORDER BY dv) AS rk FROM diffs
  ) WHERE rk = (SELECT (np + 1) // 2 FROM dmeta)
),
walsh AS (
  SELECT x.y + z.y AS w2
  FROM a x JOIN a z ON x.d <= z.d
),
wmeta AS (SELECT CAST(count(*) AS BIGINT) AS nw FROM walsh),
pm AS (
  SELECT w2 FROM (
    SELECT w2, row_number() OVER (ORDER BY w2) AS rk FROM walsh
  ) WHERE rk = (SELECT (nw + 1) // 2 FROM wmeta)
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
       (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
       (SELECT np FROM dmeta) AS n_pairs,
       (SELECT CAST(dv AS BIGINT) FROM hl) AS hl_shift,
       (SELECT nw FROM wmeta) AS n_walsh,
       (SELECT CAST((1000 * w2) // 2 AS BIGINT) FROM pm)
         AS pseudo_median_a_milli
""",
)
def stat_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hodges-Lehmann estimators over the click vs view daily series:
    the SHIFT estimate (median of all pairwise differences aᵢ−bⱼ — the
    location estimator whose test is Mann-Whitney U, 29% efficiency
    loss vs the mean under normality but immune to outliers) and the
    one-sample PSEUDO-MEDIAN of the click series (median of Walsh
    averages (aᵢ+aⱼ)/2, i ≤ j — Wilcoxon signed-rank's estimator).
    Medians are nearest-rank on exact integers (Walsh sums stay doubled
    until one final milli division), so no float enters the estimate.

    Scale shape: the pair frames are day-count² of the BOUNDED daily
    table; on raw data the same estimator runs on a quantile sketch of
    the difference distribution instead of literal pairs."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.sum(F.round("value").cast("long")).cast("long").alias("y"))
    )
    a = daily.filter(F.col("event_type") == "click").select(
        F.col("d").alias("da"), F.col("y").alias("ya")
    )
    b = daily.filter(F.col("event_type") == "view").select(
        F.col("d").alias("db"), F.col("y").alias("yb")
    )
    # r11 opt: day-level frames (≤ #days rows) — broadcast the right side
    # so the pair stage is one BroadcastNestedLoopJoin, not a 1024-task
    # CartesianProduct
    diffs = a.crossJoin(F.broadcast(b)).select((F.col("ya") - F.col("yb")).alias("dv"))
    np_ = diffs.count()
    hl = (
        diffs.withColumn("rk", F.row_number().over(Window.orderBy("dv")))
        .filter(F.col("rk") == (np_ + 1) // 2)
        .select(F.col("dv").cast("long").alias("hl_shift"))
    )
    a2 = a.select(F.col("da").alias("d2"), F.col("ya").alias("y2"))
    walsh = (
        a.crossJoin(F.broadcast(a2))
        .filter(F.col("da") <= F.col("d2"))
        .select((F.col("ya") + F.col("y2")).alias("w2"))
    )
    nw = walsh.count()
    pm = (
        walsh.withColumn("rk", F.row_number().over(Window.orderBy("w2")))
        .filter(F.col("rk") == (nw + 1) // 2)
        .select(F.expr("CAST((1000 * w2) div 2 AS BIGINT)").alias(
            "pseudo_median_a_milli"
        ))
    )
    na = a.count()
    nb = b.count()
    return (
        hl.crossJoin(pm)
        .select(
            F.lit(na).cast("long").alias("n_a"),
            F.lit(nb).cast("long").alias("n_b"),
            F.lit(np_).cast("long").alias("n_pairs"),
            "hl_shift",
            F.lit(nw).cast("long").alias("n_walsh"),
            "pseudo_median_a_milli",
        )
    )


# --------------------------------------------------------------------------
# 4. Dirichlet-smoothed query likelihood
# --------------------------------------------------------------------------

QL_MU = 2000
QL_TOP = 10
QL_NQ = 2


@query(
    "search_query_likelihood",
    oracle=f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
cf AS (SELECT term, CAST(count(*) AS BIGINT) AS cf FROM toks GROUP BY 1),
ctot AS (SELECT CAST(count(*) AS BIGINT) AS ct FROM toks),
q AS (
  SELECT term, cf FROM (
    SELECT term, cf, row_number() OVER (ORDER BY cf DESC, term) AS rk
    FROM cf
  ) WHERE rk <= {QL_NQ}
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
  GROUP BY 1, 2
),
scores AS (
  SELECT d.doc_id,
         CAST(sum(CAST(round(1000000 * ln(
             (CAST(coalesce(t.tf, 0) AS DOUBLE) * c.ct + {QL_MU} * q.cf)
             / (CAST(d.dl + {QL_MU} AS DOUBLE) * c.ct))) AS BIGINT))
           AS BIGINT) AS ql_micro
  FROM dl d
  CROSS JOIN q
  LEFT JOIN tf t ON t.doc_id = d.doc_id AND t.term = q.term
  CROSS JOIN ctot c
  GROUP BY d.doc_id
)
SELECT rk, doc_id, ql_micro FROM (
  SELECT doc_id, ql_micro,
         CAST(row_number() OVER (ORDER BY ql_micro DESC, doc_id) AS INT)
           AS rk
  FROM scores
) WHERE rk <= {QL_TOP}
""",
)
def search_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty
    2001): score(q,d) = Σ_t ln((tf + μ·P(t|C)) / (|d| + μ)) with
    μ={QL_MU} — the language-modeling twin of ``text_bm25_search``
    (BM25 is a tf saturation heuristic; QL is a generative model whose
    smoothing term doubles as length normalization). The query is the
    corpus's top-{QL_NQ} terms, picked in-query deterministically. Each
    log term's argument is the exact rational (tf·|C| + μ·cf) /
    ((|d|+μ)·|C|) — integer numerator and denominator on both engines,
    one micro quantization per term, exact sum, top-{QL_TOP} rank.

    Scale shape: term/doc stats are two hash-aggs over the token
    stream; scoring joins only the |docs|×{QL_NQ} grid against the tf
    table (queries are tiny; the posting lists do the work)."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    cf = toks.groupBy("term").agg(F.count("*").cast("long").alias("cf"))
    ctot = toks.agg(F.count("*").cast("long").alias("ct"))
    q = (
        cf.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("cf"), "term"))
        )
        .filter(F.col("rk") <= QL_NQ)
        .select("term", "cf")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count("*").cast("long").alias("tf")
    )
    scores = (
        dl.crossJoin(F.broadcast(q))
        .join(tf, ["doc_id", "term"], "left")
        .crossJoin(F.broadcast(ctot))
        .select(
            "doc_id",
            F.round(
                1000000
                * F.log(
                    (F.coalesce("tf", F.lit(0)).cast("double") * F.col("ct")
                     + QL_MU * F.col("cf"))
                    / ((F.col("dl") + QL_MU).cast("double") * F.col("ct"))
                )
            )
            .cast("long")
            .alias("t_micro"),
        )
        .groupBy("doc_id")
        .agg(F.sum("t_micro").cast("long").alias("ql_micro"))
    )
    return (
        scores.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.desc("ql_micro"), "doc_id"))
            .cast("int"),
        )
        .filter(F.col("rk") <= QL_TOP)
        .select("rk", "doc_id", "ql_micro")
    )


# --------------------------------------------------------------------------
# 5. Explore-then-commit bandit replay
# --------------------------------------------------------------------------

ETC_EXPLORE = 10


@query(
    "eval_bandit_etc_regret",
    oracle=f"""
WITH daily AS (
  SELECT event_type AS arm, CAST(ts AS DATE) AS d,
         CAST((1000 * sum(CAST(round(value) AS BIGINT))) // count(*)
              AS BIGINT) AS r
  FROM events GROUP BY 1, 2
),
arms AS (
  SELECT arm, CAST(row_number() OVER (ORDER BY arm) - 1 AS BIGINT) AS aid
  FROM (SELECT DISTINCT arm FROM daily)
),
k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM arms),
days AS (
  SELECT d, CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t
  FROM (SELECT DISTINCT d FROM daily)
),
grid AS (
  SELECT y.d, y.t, a.arm, a.aid, coalesce(dd.r, 0) AS r
  FROM days y CROSS JOIN arms a
  LEFT JOIN daily dd ON dd.d = y.d AND dd.arm = a.arm
),
explore AS (
  SELECT * FROM grid
  WHERE t <= {ETC_EXPLORE} AND aid = (t - 1) % (SELECT k FROM k)
),
emeans AS (
  SELECT arm, CAST(sum(r) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS c
  FROM explore GROUP BY arm
),
chosen AS (
  SELECT arm FROM (
    SELECT arm, row_number() OVER (ORDER BY (1000 * s) // c DESC, arm)
                  AS rk
    FROM emeans
  ) WHERE rk = 1
),
exploit AS (
  SELECT g.r FROM grid g, chosen c
  WHERE g.t > {ETC_EXPLORE} AND g.arm = c.arm
),
collected AS (
  SELECT (SELECT CAST(sum(r) AS BIGINT) FROM explore)
         + (SELECT CAST(coalesce(sum(r), 0) AS BIGINT) FROM exploit)
           AS total
),
hind AS (
  SELECT arm, CAST(sum(r) AS BIGINT) AS tot FROM grid GROUP BY arm
),
best AS (
  SELECT arm, tot FROM (
    SELECT *, row_number() OVER (ORDER BY tot DESC, arm) AS rk FROM hind
  ) WHERE rk = 1
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM days) AS n_days,
       (SELECT k FROM k) AS n_arms,
       CAST({ETC_EXPLORE} AS BIGINT) AS explore_days,
       (SELECT arm FROM chosen) AS chosen_arm,
       (SELECT total FROM collected) AS total_milli,
       (SELECT arm FROM best) AS best_arm,
       (SELECT tot FROM best) AS best_total_milli,
       (SELECT tot FROM best) - (SELECT total FROM collected)
         AS regret_milli
""",
)
def eval_bandit_etc_regret(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explore-then-commit bandit replay over the daily per-arm mean
    rewards (arms = event types, reward = that day's milli-mean cents):
    round-robin the arms for the first {ETC_EXPLORE} days, commit to
    the best observed explore-phase mean, play it for the rest, and
    account the EXACT regret against the best fixed arm in hindsight —
    the simplest bandit whose decision rule has no evolving state after
    commit, which is exactly what makes the replay a pure SQL DAG
    (UCB/Thompson replays need per-step state — that's the
    ``stream_stateful_user_stats`` applyInPandasWithState pattern; the
    IPS/DR estimators in eval_policy_replay_ips / eval_doubly_robust_
    value answer the counterfactual question without replaying at all).

    Scale shape: the replay runs on the bounded day×arm grid; reward
    construction is one map-side-combined hash-agg over the scan."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("arm"), F.to_date("ts").alias("d")
    ).agg(
        F.expr(
            "CAST((1000 * sum(CAST(round(value) AS BIGINT))) div count(*)"
            " AS BIGINT)"
        ).alias("r")
    )
    arms = (
        daily.select("arm")
        .distinct()
        .select(
            "arm",
            (F.row_number().over(Window.orderBy("arm")) - 1)
            .cast("long")
            .alias("aid"),
        )
    )
    k = arms.count()
    days = (
        daily.select("d")
        .distinct()
        .select("d", F.row_number().over(Window.orderBy("d")).cast("long").alias("t"))
    )
    grid = (
        days.crossJoin(F.broadcast(arms))
        .join(daily, ["d", "arm"], "left")
        .select("d", "t", "arm", "aid", F.coalesce("r", F.lit(0)).alias("r"))
    )
    explore = grid.filter(
        (F.col("t") <= ETC_EXPLORE) & (F.col("aid") == (F.col("t") - 1) % k)
    )
    emeans = explore.groupBy("arm").agg(
        F.sum("r").cast("long").alias("s"), F.count("*").cast("long").alias("c")
    )
    chosen = (
        emeans.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc(F.expr("(1000 * s) div c")), "arm")
            ),
        )
        .filter(F.col("rk") == 1)
        .select(F.col("arm").alias("chosen_arm"))
    )
    exploit_sum = (
        grid.join(
            F.broadcast(chosen), grid.arm == chosen.chosen_arm
        )
        .filter(F.col("t") > ETC_EXPLORE)
        .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("es"))
    )
    explore_sum = explore.agg(F.sum("r").cast("long").alias("xs"))
    hind = grid.groupBy("arm").agg(F.sum("r").cast("long").alias("tot"))
    best = (
        hind.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("tot"), "arm"))
        )
        .filter(F.col("rk") == 1)
        .select(F.col("arm").alias("best_arm"), F.col("tot").alias("best_total_milli"))
    )
    n_days = days.count()
    return (
        chosen.crossJoin(explore_sum)
        .crossJoin(exploit_sum)
        .crossJoin(best)
        .select(
            F.lit(n_days).cast("long").alias("n_days"),
            F.lit(k).cast("long").alias("n_arms"),
            F.lit(ETC_EXPLORE).cast("long").alias("explore_days"),
            "chosen_arm",
            (F.col("xs") + F.col("es")).cast("long").alias("total_milli"),
            "best_arm",
            "best_total_milli",
            (F.col("best_total_milli") - (F.col("xs") + F.col("es")))
            .cast("long")
            .alias("regret_milli"),
        )
    )


# --------------------------------------------------------------------------
# 6. Bow-tie macro-structure census
# --------------------------------------------------------------------------

BT_LAYERS = 6


def _bt_reach_sql(edges: str, seed_col: str, tag: str) -> str:
    parts = [
        f"{tag}0 AS (SELECT (SELECT {seed_col} FROM btseed) AS v)",
    ]
    for l in range(1, BT_LAYERS + 1):
        parts.append(
            f"""{tag}{l} AS MATERIALIZED (
  SELECT v FROM {tag}{l - 1}
  UNION
  SELECT e.dst FROM {tag}{l - 1} p JOIN {edges} e ON e.src = p.v
)"""
        )
    return ",\n".join(parts)


def _bt_oracle() -> str:
    return f"""
WITH {_EDGES_SQL},
redges AS (SELECT dst AS src, src AS dst FROM edges0),
btseed AS (
  SELECT src AS s FROM (
    SELECT src, count(*) AS d FROM edges0 GROUP BY src
    ORDER BY d DESC, src LIMIT 1
  )
),
{_bt_reach_sql('edges0', 's', 'fw')},
{_bt_reach_sql('redges', 's', 'bw')},
cls AS (
  SELECT n.node,
         CASE
           WHEN n.node IN (SELECT v FROM fw{BT_LAYERS})
            AND n.node IN (SELECT v FROM bw{BT_LAYERS}) THEN 'CORE'
           WHEN n.node IN (SELECT v FROM bw{BT_LAYERS}) THEN 'IN'
           WHEN n.node IN (SELECT v FROM fw{BT_LAYERS}) THEN 'OUT'
           ELSE 'OTHER' END AS cls
  FROM nodes n
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cls)
SELECT cls, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST((count(*) * 1000000) // (SELECT n FROM tot) AS BIGINT)
         AS share_ppm
FROM cls GROUP BY cls
"""


@query("graph_bowtie_classify", oracle=_bt_oracle())
def graph_bowtie_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bow-tie macro-structure census (Broder et al. 2000, the web-graph
    paper): from the highest-out-degree seed, compute {BT_LAYERS}-layer
    forward and backward reachable sets, then classify every node —
    CORE = reaches and is reached (the seed's strongly-connected
    neighborhood), IN = feeds the core, OUT = fed by it, OTHER =
    disconnected tendrils. The IN/CORE/OUT shares are THE first
    diagnostic of a crawl frontier's health (a tiny CORE means the
    crawl is stuck in tendrils). Depth-limited like the other
    fixed-point graph ops so both engines run the same unrolled
    recursion; CORE here means "within {BT_LAYERS} hops both ways",
    documented.

    Scale shape: each layer is one equi-join + union-distinct from a
    frontier that only grows toward |V|; classification is two
    semi-joins against the final sets."""
    nodes, edges, n = _graph(spark, sf_dir)
    e = edges.select("src", "dst")
    seed = (
        e.groupBy("src")
        .agg(F.count("*").alias("d"))
        .orderBy(F.desc("d"), "src")
        .limit(1)
        .collect()[0]
        .src
    )

    def reach(ed: DataFrame) -> DataFrame:
        cur = spark.createDataFrame([(seed,)], "v LONG").localCheckpoint(
            eager=True
        )
        for _ in range(BT_LAYERS):
            cur = (
                cur.unionByName(
                    cur.join(ed, cur.v == ed.src).select(
                        ed.dst.cast("long").alias("v")
                    )
                )
                .distinct()
                .coalesce(4)
                .localCheckpoint(eager=True)
            )
        return cur

    fw = reach(e)
    bw = reach(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    cls = (
        nodes.join(
            fw.select(F.col("v").alias("node"), F.lit(1).alias("in_f")),
            "node",
            "left",
        )
        .join(
            bw.select(F.col("v").alias("node"), F.lit(1).alias("in_b")),
            "node",
            "left",
        )
        .select(
            F.when(
                F.col("in_f").isNotNull() & F.col("in_b").isNotNull(), "CORE"
            )
            .when(F.col("in_b").isNotNull(), "IN")
            .when(F.col("in_f").isNotNull(), "OUT")
            .otherwise("OTHER")
            .alias("cls")
        )
    )
    tot = cls.count()
    return cls.groupBy("cls").agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.expr(f"CAST((count(*) * 1000000) div {tot} AS BIGINT)").alias(
            "share_ppm"
        ),
    )
