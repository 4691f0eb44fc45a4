"""Breadth batch 39 (round 6): grid DBSCAN, k-center coreset, LSA power
iteration, TOST equivalence, MCC/F-beta, file integrity audit.

Six operators (reference scope: density clustering of the point cloud,
diversity-maximizing sample selection for curation, latent-concept
mining over the term-doc matrix, non-inferiority testing, imbalanced
classifier metrics, and storage integrity):

- ``cluster_dbscan_grid``  — DBSCAN with grid-bucketed neighbor search
  (scaled extent, constant per-cell density) + min-label components
  over core adjacency.
- ``sample_kcenter_coreset`` — greedy k-center (farthest-point) coreset
  over embeddings; exact integer distances, 8 unrolled rounds.
- ``text_lsa_top_concept`` — top LSA concept via integer power iteration
  on the tf-idf term-doc matrix (normalized half-steps).
- ``stat_tost_equivalence`` — two one-sided tests for equivalence of
  the md5 arms within a ±5% margin.
- ``eval_mcc_fbeta``       — Matthews correlation, balanced accuracy and
  F2 from one exact confusion matrix.
- ``io_integrity_audit``   — write + sha256 manifest + re-verify pass
  (corruption detection exercised in tests).
"""

from __future__ import annotations

import hashlib
import math
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.graph import star_components
from nocouncil_etl_spark.plans.breadth15 import _pt, _pt_sql
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. DBSCAN with grid-bucketed neighbors
# --------------------------------------------------------------------------

DB_EPS = 800  # millidegrees
DB_MINPTS = 4  # including the point itself
DB_BASE_RANGE = 32768


@query(
    "cluster_dbscan_grid",
    oracle=f"""
WITH RECURSIVE sc AS (
  SELECT CAST(ceil(sqrt(count(*) / 1500.0)) AS BIGINT) AS k FROM customer
),
pts AS (
  SELECT c_custkey AS id,
         {_pt_sql('dbx#', 'c_custkey', f'({DB_BASE_RANGE} * (SELECT k FROM sc))')} AS x,
         {_pt_sql('dby#', 'c_custkey', f'({DB_BASE_RANGE} * (SELECT k FROM sc))')} AS y
  FROM customer
),
home AS (SELECT id, x, y, x // {DB_EPS} AS cx, y // {DB_EPS} AS cy FROM pts),
probe AS (
  SELECT id, x, y, (x // {DB_EPS}) + dx.d AS cx, (y // {DB_EPS}) + dy.d AS cy
  FROM pts, (SELECT unnest([-1, 0, 1]) AS d) dx,
            (SELECT unnest([-1, 0, 1]) AS d) dy
),
nbrs AS (
  SELECT p.id AS a, h.id AS b
  FROM probe p JOIN home h ON p.cx = h.cx AND p.cy = h.cy
  WHERE p.id <> h.id
    AND (p.x - h.x) * (p.x - h.x) + (p.y - h.y) * (p.y - h.y)
        <= {DB_EPS * DB_EPS}
),
core AS (
  SELECT a AS id FROM nbrs GROUP BY a HAVING count(*) >= {DB_MINPTS - 1}
),
ce AS (
  SELECT n.a, n.b FROM nbrs n
  JOIN core c1 ON n.a = c1.id JOIN core c2 ON n.b = c2.id
),
lab AS (
  SELECT id AS v, id AS lab FROM core
  UNION
  SELECT ce.b AS v, lab.lab FROM lab JOIN ce ON ce.a = lab.v
),
cc AS (SELECT v, CAST(min(lab) AS BIGINT) AS cl FROM lab GROUP BY v),
border AS (
  SELECT n.a AS id, CAST(min(c.cl) AS BIGINT) AS cl
  FROM nbrs n JOIN cc c ON n.b = c.v
  WHERE n.a NOT IN (SELECT id FROM core)
  GROUP BY n.a
),
stats AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM pts) AS n_points,
         (SELECT CAST(count(*) AS BIGINT) FROM core) AS n_core,
         (SELECT CAST(count(*) AS BIGINT) FROM border) AS n_border,
         (SELECT CAST(count(DISTINCT cl) AS BIGINT) FROM cc) AS n_clusters,
         (SELECT CAST(max(sz) AS BIGINT) FROM (
            SELECT count(*) AS sz FROM (
              SELECT v, cl FROM cc
              UNION ALL SELECT id, cl FROM border
            ) GROUP BY cl)) AS largest_cluster
)
SELECT n_points, n_core, n_border,
       n_points - n_core - n_border AS n_noise,
       n_clusters, largest_cluster
FROM stats
""",
)
def cluster_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN over the synthetic customer point cloud: neighbor search is
    grid-bucketed at cell = eps (each point probes its 3x3 neighborhood —
    the geo_nearest_join machinery), core points have ≥ {DB_MINPTS}
    eps-neighbors (self included), clusters are connected components of
    the core-core adjacency via large-star/small-star edge rewiring
    (operators/graph.star_components), and border points attach to their
    smallest neighboring core cluster. The city extent scales with
    sqrt(n) (breadth15 convention) so per-cell density — and with it the
    candidate-join volume — is CONSTANT in the data size. Exact integer
    distances throughout.

    Scale shape: candidates = Sigma per-cell density² with density
    pinned; the CC rounds are O(log^2 n), NOT O(cluster diameter) —
    spatial cluster diameters grow with the map, so the r9 swap from
    min-label propagation (28 rounds at sf1) to star rewiring (6 rounds,
    identical labels) is what keeps the loop bounded at 100 TB. This is
    the DBSCAN layout that actually distributes — no kd-tree, no global
    index."""
    c = load(spark, sf_dir, "customer")
    k = math.ceil(math.sqrt(c.count() / 1500.0))
    rng = DB_BASE_RANGE * k
    pts = c.select(
        F.col("c_custkey").alias("id"),
        (_pt("dbx#", F.col("c_custkey")) % rng).alias("x"),
        (_pt("dby#", F.col("c_custkey")) % rng).alias("y"),
    ).localCheckpoint(eager=True)
    home = pts.select(
        "id", "x", "y",
        F.expr(f"x div {DB_EPS}").alias("cx"),
        F.expr(f"y div {DB_EPS}").alias("cy"),
    )
    d = spark.createDataFrame([(-1,), (0,), (1,)], "d INT")
    probe = (
        pts.crossJoin(F.broadcast(d.select(F.col("d").alias("dx"))))
        .crossJoin(F.broadcast(d.select(F.col("d").alias("dy"))))
        .select(
            F.col("id").alias("pid"),
            F.col("x").alias("px"),
            F.col("y").alias("py"),
            (F.expr(f"x div {DB_EPS}") + F.col("dx")).alias("cx"),
            (F.expr(f"y div {DB_EPS}") + F.col("dy")).alias("cy"),
        )
    )
    d2 = (F.col("px") - F.col("x")) * (F.col("px") - F.col("x")) + (
        F.col("py") - F.col("y")
    ) * (F.col("py") - F.col("y"))
    nbrs = (
        probe.join(home, ["cx", "cy"])
        .filter((F.col("pid") != F.col("id")) & (d2 <= DB_EPS * DB_EPS))
        .select(F.col("pid").alias("a"), F.col("id").alias("b"))
        .localCheckpoint(eager=True)
    )
    core = (
        nbrs.groupBy("a")
        .agg(F.count("*").alias("nn"))
        .filter(F.col("nn") >= DB_MINPTS - 1)
        .select(F.col("a").alias("id"))
        .localCheckpoint(eager=True)
    )
    ce = (
        nbrs.join(core.withColumnRenamed("id", "a"), "a")
        .join(core.withColumnRenamed("id", "b"), "b")
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    # Spatial cluster diameters grow with data size (percolation-style
    # graphs), so the min-label loop's O(diameter) rounds are unbounded at
    # scale (measured 28 rounds at sf1); star_components rewires edges
    # toward minima in O(log^2 n) rounds (6 at sf1, identical labels).
    stars = star_components(ce, "a", "b")
    cc = core.join(
        stars.withColumnRenamed("node", "id"), "id", "left"
    ).select(F.col("id").alias("v"), F.coalesce("comp", "id").alias("cl"))
    border = (
        nbrs.join(core.withColumnRenamed("id", "a"), "a", "left_anti")
        .join(cc, nbrs.b == cc.v)
        .groupBy("a")
        .agg(F.min("cl").alias("cl"))
    )
    n_points = pts.count()
    n_core = core.count()
    n_border = border.count()
    n_clusters = cc.select("cl").distinct().count()
    largest = (
        cc.select("cl")
        .unionByName(border.select("cl"))
        .groupBy("cl")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    return spark.createDataFrame(
        [
            (
                n_points,
                n_core,
                n_border,
                n_points - n_core - n_border,
                n_clusters,
                largest,
            )
        ],
        "n_points BIGINT, n_core BIGINT, n_border BIGINT, n_noise BIGINT,"
        " n_clusters BIGINT, largest_cluster BIGINT",
    )


# --------------------------------------------------------------------------
# 2. Greedy k-center coreset
# --------------------------------------------------------------------------

KC_K = 8


def _kc_oracle() -> str:
    parts = [
        """WITH comp AS (
  SELECT vec_id, CAST(i AS BIGINT) AS i,
         CAST(round(1000 * CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE))
              AS BIGINT) AS x
  FROM (SELECT vec_id, embedding,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
)""",
        "c1 AS (SELECT CAST(min(vec_id) AS BIGINT) AS cid FROM comp)",
        """m1 AS (
  SELECT c.vec_id, CAST(sum((c.x - k.x) * (c.x - k.x)) AS BIGINT) AS md
  FROM comp c
  JOIN comp k ON k.i = c.i AND k.vec_id = (SELECT cid FROM c1)
  GROUP BY c.vec_id
)""",
    ]
    for t in range(2, KC_K + 1):
        parts.append(
            f"""c{t} AS (
  SELECT vec_id AS cid, md FROM m{t - 1}
  ORDER BY md DESC, vec_id LIMIT 1
)"""
        )
        if t < KC_K:
            parts.append(
                f"""m{t} AS (
  SELECT m.vec_id, least(m.md, d.nd) AS md
  FROM m{t - 1} m JOIN (
    SELECT c.vec_id, CAST(sum((c.x - k.x) * (c.x - k.x)) AS BIGINT) AS nd
    FROM comp c
    JOIN comp k ON k.i = c.i AND k.vec_id = (SELECT cid FROM c{t})
    GROUP BY c.vec_id
  ) d ON m.vec_id = d.vec_id
)"""
            )
    selects = ["SELECT 1 AS t, (SELECT cid FROM c1) AS center_id, CAST(0 AS BIGINT) AS sel_d2"]
    for t in range(2, KC_K + 1):
        selects.append(
            f"SELECT {t}, (SELECT cid FROM c{t}), (SELECT md FROM c{t})"
        )
    return ",\n".join(parts) + "\n" + " UNION ALL ".join(selects)


@query("sample_kcenter_coreset", oracle=_kc_oracle())
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point-first, Gonzalez 1985) coreset over
    the embedding corpus — the diversity-maximizing selection every
    data-curation pipeline wants next to its dedup pass: start from the
    smallest id, repeatedly add the point FARTHEST from the selected
    set ({KC_K} rounds), emitting each center with its selection
    distance (a non-increasing sequence = the coverage-radius curve;
    greedy is a provable 2-approximation of the optimal k-center
    radius). Exact integer milli distances; argmax ties break on id.

    Scale shape: each round is one broadcast of the new center's 64
    components + a min-update of the per-point distance frame
    (localCheckpointed) + one bounded argmax — k passes total, the
    standard distributed farthest-point layout."""
    e = load(spark, sf_dir, "embeddings")
    comp = e.select(
        "vec_id", F.posexplode("embedding").alias("i0", "xv")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.round(1000 * F.col("xv").cast("double")).cast("long").alias("x"),
    ).localCheckpoint(eager=True)

    def dist_to(center_id: int):
        k = comp.filter(F.col("vec_id") == center_id).select(
            "i", F.col("x").alias("kx")
        )
        return (
            comp.join(F.broadcast(k), "i")
            .groupBy("vec_id")
            .agg(
                F.sum((F.col("x") - F.col("kx")) * (F.col("x") - F.col("kx")))
                .cast("long")
                .alias("nd")
            )
        )

    c1 = comp.agg(F.min("vec_id")).collect()[0][0]
    md = dist_to(c1).withColumnRenamed("nd", "md").localCheckpoint(eager=True)
    out = [(1, c1, 0)]
    for t in range(2, KC_K + 1):
        top = md.orderBy(F.desc("md"), "vec_id").limit(1).collect()[0]
        out.append((t, top.vec_id, top.md))
        if t < KC_K:
            md = (
                md.join(dist_to(top.vec_id), "vec_id")
                .select("vec_id", F.least("md", "nd").alias("md"))
                .localCheckpoint(eager=True)
            )
    return spark.createDataFrame(
        out, "t BIGINT, center_id BIGINT, sel_d2 BIGINT"
    )


# --------------------------------------------------------------------------
# 3. LSA top concept via power iteration
# --------------------------------------------------------------------------

LSA_ITERS = 3
LSA_TOP = 10


def _lsa_oracle() -> str:
    parts = [
        """WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY 1, 2),
meta AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM tok),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
a AS (
  SELECT t.doc_id, t.term,
         CAST(round(1000.0 * t.tf
               * ln(CAST((SELECT nd FROM meta) AS DOUBLE) / d.df))
              AS BIGINT) AS w
  FROM tf t JOIN df d ON t.term = d.term
  WHERE d.df < (SELECT nd FROM meta)
),
v0 AS (SELECT DISTINCT term, CAST(1000 AS BIGINT) AS v FROM a)""",
    ]
    prev = "v0"
    for t in range(1, LSA_ITERS + 1):
        parts.append(
            f"""u{t}r AS (
  SELECT a.doc_id, CAST(sum(a.w * v.v) AS BIGINT) AS u
  FROM a JOIN {prev} v ON a.term = v.term GROUP BY a.doc_id
)"""
        )
        parts.append(
            f"u{t}m AS (SELECT CAST(max(abs(u)) AS BIGINT) AS m FROM u{t}r)"
        )
        parts.append(
            f"""u{t} AS (
  SELECT doc_id, (u * 1000) // (SELECT m FROM u{t}m) AS u FROM u{t}r
)"""
        )
        parts.append(
            f"""v{t}r AS (
  SELECT a.term, CAST(sum(a.w * u.u) AS BIGINT) AS v
  FROM a JOIN u{t} u ON a.doc_id = u.doc_id GROUP BY a.term
)"""
        )
        parts.append(
            f"v{t}m AS (SELECT CAST(max(abs(v)) AS BIGINT) AS m FROM v{t}r)"
        )
        parts.append(
            f"""v{t} AS (
  SELECT term, (v * 1000) // (SELECT m FROM v{t}m) AS v FROM v{t}r
)"""
        )
        prev = f"v{t}"
    return (
        ",\n".join(parts)
        + f"""
SELECT term, loading_1e3, rk FROM (
  SELECT term, v AS loading_1e3,
         CAST(row_number() OVER (ORDER BY abs(v) DESC, term) AS INT) AS rk
  FROM v{LSA_ITERS}
) WHERE rk <= {LSA_TOP}
"""
    )


@query("text_lsa_top_concept", oracle=_lsa_oracle())
def text_lsa_top_concept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top latent-semantic concept of the corpus: power iteration for the
    dominant right-singular vector of the tf-idf term-doc matrix
    (LSA/LSI, Deerwester et al.), {LSA_ITERS} iterations of the
    two-sided map v → A^T(Av) with BOTH half-steps renormalized to
    ±1000 by exact integer division — weights are milli-quantized
    tf·ln(N/df) integers (terms in every doc are dropped: idf = 0), so
    the whole iteration is deterministic BIGINT arithmetic. Emits the
    top-{LSA_TOP} terms by |loading|: the vocabulary axis explaining
    the most co-occurrence variance.

    Scale shape: each half-step is one equi-join + hash-agg over the
    sparse (doc, term, w) matrix — the classic distributed SpMV; the
    normalizer is a one-scalar fetch (the graph.py discipline). Same
    kernel family as vec_pca_power, but on the TEXT matrix."""
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    nd = tok.select("doc_id").distinct().count()
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    a = (
        tf.join(df, "term")
        .filter(F.col("df") < nd)
        .select(
            "doc_id",
            "term",
            F.round(
                1000.0 * F.col("tf") * F.log(F.lit(float(nd)) / F.col("df"))
            )
            .cast("long")
            .alias("w"),
        )
        .localCheckpoint(eager=True)
    )
    v = a.select("term").distinct().select("term", F.lit(1000).cast("long").alias("v"))
    for _ in range(LSA_ITERS):
        ur = (
            a.join(v, "term")
            .groupBy("doc_id")
            .agg(F.sum(F.col("w") * F.col("v")).cast("long").alias("u"))
        )
        um = ur.agg(F.max(F.abs("u"))).collect()[0][0]
        u = ur.select("doc_id", F.expr(f"(u * 1000) div {um}").alias("u"))
        vr = (
            a.join(u, "doc_id")
            .groupBy("term")
            .agg(F.sum(F.col("w") * F.col("u")).cast("long").alias("v"))
        )
        vm = vr.agg(F.max(F.abs("v"))).collect()[0][0]
        v = vr.select("term", F.expr(f"(v * 1000) div {vm}").alias("v")).localCheckpoint(
            eager=True
        )
    return (
        v.select(
            "term",
            F.col("v").alias("loading_1e3"),
            F.row_number()
            .over(Window.orderBy(F.desc(F.abs("v")), "term"))
            .cast("int")
            .alias("rk"),
        )
        .filter(F.col("rk") <= LSA_TOP)
        .select("term", "loading_1e3", "rk")
    )


# --------------------------------------------------------------------------
# 4. TOST equivalence test
# --------------------------------------------------------------------------


@query(
    "stat_tost_equivalence",
    oracle=f"""
WITH per_user AS (
  SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS x
  FROM events GROUP BY user_id
),
armed AS (
  SELECT CASE WHEN {_pt_sql('srm#', 'user_id', 1000)} % 2 = 0
              THEN 0 ELSE 1 END AS arm, x
  FROM per_user
),
mom AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM armed GROUP BY arm
),
wide AS (
  SELECT max(CASE WHEN arm = 0 THEN n END) AS n0,
         max(CASE WHEN arm = 0 THEN sx END) AS sx0,
         max(CASE WHEN arm = 0 THEN sxx END) AS sxx0,
         max(CASE WHEN arm = 1 THEN n END) AS n1,
         max(CASE WHEN arm = 1 THEN sx END) AS sx1,
         max(CASE WHEN arm = 1 THEN sxx END) AS sxx1
  FROM mom
),
calc AS (
  SELECT n0, n1,
         CAST(sx1 AS DOUBLE) / n1 - CAST(sx0 AS DOUBLE) / n0 AS diff,
         (CAST(sx0 AS BIGINT) + sx1) * 5
           // ((n0 + n1) * 100) AS delta,
         sqrt((CAST(sxx0 AS DOUBLE) - CAST(sx0 AS DOUBLE) * sx0 / n0)
              / (n0 - 1) / n0
              + (CAST(sxx1 AS DOUBLE) - CAST(sx1 AS DOUBLE) * sx1 / n1)
                / (n1 - 1) / n1) AS se
  FROM wide
)
SELECT n0, n1, round(diff, 6) AS diff_cents, CAST(delta AS BIGINT)
         AS delta_cents,
       round(se, 6) AS se,
       round((diff + delta) / se, 6) AS t_lower,
       round((delta - diff) / se, 6) AS t_upper,
       CAST((diff + delta) / se > 1.645 AND (delta - diff) / se > 1.645
            AS BOOLEAN) AS equivalent
FROM calc
""",
)
def stat_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two one-sided tests (TOST) for EQUIVALENCE of the md5 arms on
    per-user spend within a ±5%-of-pooled-mean margin — the correct way
    to conclude 'the arms are the same' (a non-significant t-test is
    NOT evidence of equivalence): both one-sided Welch statistics must
    clear the 1.645 critical value. Moments exact; the margin delta is
    an exact integer (5% of pooled mean, floor); one fixed IEEE
    expression per statistic.

    Scale shape: per-user collapse, 2-row moment table — the A/A-test
    gate every experiment platform runs before trusting its bucketing."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x")
    )
    armed = per_user.select(
        F.when((_pt("srm#", F.col("user_id")) % 1000) % 2 == 0, 0)
        .otherwise(1)
        .alias("arm"),
        "x",
    )
    mom = armed.groupBy("arm").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    wide = mom.agg(
        *[
            F.max(F.when(F.col("arm") == a, F.col(c))).alias(f"{c}{a}")
            for a in (0, 1)
            for c in ("n", "sx", "sxx")
        ]
    )
    diff = F.col("sx1").cast("double") / F.col("n1") - F.col("sx0").cast(
        "double"
    ) / F.col("n0")
    delta = F.expr("(sx0 + sx1) * 5 div ((n0 + n1) * 100)")
    se = F.sqrt(
        (
            F.col("sxx0").cast("double")
            - F.col("sx0").cast("double") * F.col("sx0") / F.col("n0")
        )
        / (F.col("n0") - 1)
        / F.col("n0")
        + (
            F.col("sxx1").cast("double")
            - F.col("sx1").cast("double") * F.col("sx1") / F.col("n1")
        )
        / (F.col("n1") - 1)
        / F.col("n1")
    )
    return wide.select(
        "n0",
        "n1",
        F.round(diff, 6).alias("diff_cents"),
        delta.cast("long").alias("delta_cents"),
        F.round(se, 6).alias("se"),
        F.round((diff + delta) / se, 6).alias("t_lower"),
        F.round((delta - diff) / se, 6).alias("t_upper"),
        (((diff + delta) / se > 1.645) & ((delta - diff) / se > 1.645)).alias(
            "equivalent"
        ),
    )


# --------------------------------------------------------------------------
# 5. MCC / balanced accuracy / F2
# --------------------------------------------------------------------------


@query(
    "eval_mcc_fbeta",
    oracle="""
WITH mu AS (
  SELECT CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           // count(*) AS m
  FROM events
),
conf AS (
  SELECT
    CAST(sum(CASE WHEN p = 1 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
    CAST(sum(CASE WHEN p = 1 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
    CAST(sum(CASE WHEN p = 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
    CAST(sum(CASE WHEN p = 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM (
    SELECT CASE WHEN CAST(round(e.value * 100) AS BIGINT) > mu.m
                THEN 1 ELSE 0 END AS p,
           CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END AS y
    FROM events e, mu
  )
)
SELECT tp, fp, fn, tn,
       round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
             / sqrt(CAST(tp + fp AS DOUBLE) * (tp + fn)
                    * (tn + fp) * (tn + fn)), 6) AS mcc,
       round((CAST(tp AS DOUBLE) / (tp + fn)
              + CAST(tn AS DOUBLE) / (tn + fp)) / 2, 6) AS balanced_acc,
       round(5.0 * tp / (5.0 * tp + 4.0 * fn + fp), 6) AS f2
FROM conf
""",
)
def eval_mcc_fbeta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The imbalanced-classification scorecard from one exact confusion
    matrix (value-above-mean predicting 'error'): Matthews correlation
    (the single number that survives class skew), balanced accuracy
    (mean of the two recalls), and F2 (recall-weighted F-beta,
    5TP/(5TP + 4FN + FP)) — the metrics accuracy hides behind at a 20%
    positive rate. Counts exact; three fixed IEEE expressions.

    Scale shape: one map-side-combined 4-cell reduce."""
    ev = load(spark, sf_dir, "events")
    mu = ev.agg(
        F.expr(
            "CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)"
            " div count(*)"
        ).alias("m")
    )
    preds = ev.crossJoin(F.broadcast(mu)).select(
        F.when(F.round(F.col("value") * 100).cast("long") > F.col("m"), 1)
        .otherwise(0)
        .alias("p"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("y"),
    )
    conf = preds.agg(
        F.sum(F.when((F.col("p") == 1) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when((F.col("p") == 1) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when((F.col("p") == 0) & (F.col("y") == 1), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
        F.sum(F.when((F.col("p") == 0) & (F.col("y") == 0), 1).otherwise(0))
        .cast("long")
        .alias("tn"),
    )
    mcc = (
        F.col("tp").cast("double") * F.col("tn")
        - F.col("fp").cast("double") * F.col("fn")
    ) / F.sqrt(
        (F.col("tp") + F.col("fp")).cast("double")
        * (F.col("tp") + F.col("fn"))
        * (F.col("tn") + F.col("fp"))
        * (F.col("tn") + F.col("fn"))
    )
    return conf.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(mcc, 6).alias("mcc"),
        F.round(
            (
                F.col("tp").cast("double") / (F.col("tp") + F.col("fn"))
                + F.col("tn").cast("double") / (F.col("tn") + F.col("fp"))
            )
            / 2,
            6,
        ).alias("balanced_acc"),
        F.round(
            5.0 * F.col("tp") / (5.0 * F.col("tp") + 4.0 * F.col("fn") + F.col("fp")),
            6,
        ).alias("f2"),
    )


# --------------------------------------------------------------------------
# 6. Storage integrity audit
# --------------------------------------------------------------------------

AUDIT_FILES = 4


def _file_sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def verify_manifest(base: str) -> tuple[int, int]:
    """Re-hash every data file against the manifest; returns
    (n_verified, n_corrupt). Used by the query and by the corruption
    test."""
    import json

    with open(os.path.join(base, "MANIFEST.json")) as f:
        manifest = json.load(f)
    ok = bad = 0
    for name, digest in manifest.items():
        if _file_sha256(os.path.join(base, "data", name)) == digest:
            ok += 1
        else:
            bad += 1
    return ok, bad


@query(
    "io_integrity_audit",
    oracle="""
SELECT CAST(4 AS BIGINT) AS n_files, CAST(4 AS BIGINT) AS n_verified,
       CAST(0 AS BIGINT) AS n_corrupt,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
""",
)
def io_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage integrity audit: publish the feed as {AUDIT_FILES} parquet
    files, record each file's sha256 in a MANIFEST.json, then run the
    verification pass (re-hash every file against the manifest) and
    read the data back — the audit row carries both the file-level
    verdict (all verified, none corrupt) and the content totals, which
    hash-match the source. tests/test_breadth39.py flips one byte in a
    copied file and asserts the same verifier reports the corruption.

    Scale shape: hashing is one sequential read per file (at scale, a
    distributed binaryFile scan computing digests map-side); the
    manifest is metadata. The bit-rot defense layer under every
    retention policy."""
    import json

    ev = load(spark, sf_dir, "events")
    base = os.path.join(
        tempfile.gettempdir(),
        "nocouncil_etl_spark_scratch",
        f"audit_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    data_dir = os.path.join(base, "data")
    ev.select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    ).repartition(AUDIT_FILES).write.mode("overwrite").parquet(data_dir)
    files = sorted(
        f for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    manifest = {f: _file_sha256(os.path.join(data_dir, f)) for f in files}
    with open(os.path.join(base, "MANIFEST.json"), "w") as fh:
        json.dump(manifest, fh)
    ok, bad = verify_manifest(base)
    agg = (
        spark.read.parquet(data_dir)
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .collect()[0]
    )
    return spark.createDataFrame(
        [(len(files), ok, bad, agg.n_rows, agg.cents)],
        "n_files BIGINT, n_verified BIGINT, n_corrupt BIGINT,"
        " n_rows BIGINT, cents BIGINT",
    )
