"""Vector batch 2: quantization-quality evaluation for the ANN ladder.

- ``vec_int8_recall`` — int8 scalar quantization of the (normalized)
  embeddings with per-vector fixed scale 127, then recall@10 of the
  quantized-cosine ranking against the exact cosine ranking, per
  query. The compression rung BELOW product quantization (vec_pq_adc):
  4× smaller vectors, exact integer scoring — the standard first
  memory-saving step for a 100 TB embedding corpus, and this operator
  measures precisely what that step costs in ranking fidelity.
- ``vec_matryoshka_recall`` — recall@10 of cosine over only the FIRST
  {MAT_DIMS} of {FULL_DIMS} dimensions vs the full-dimension ranking:
  the matryoshka-truncation evaluation (can we search on a prefix of
  the embedding and re-rank with the full vector later?). Dimension
  truncation is the other axis of embedding compression; together with
  vec_int8_recall it spans the memory/recall trade surface.

Both are exact-integer or round6-double on both engines, so the recall
numbers value-hash exactly — quantization EVALUATION with an oracle, not
just a property test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.functions.vectors import dot
from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.similarity import knn_exact_blocked
from nocouncil_etl_spark.plans.vectors_plans import _E_DOUBLE, QUERY_MOD
from nocouncil_etl_spark.registry import query

RECALL_K = 10
QBITS_SCALE = 127  # int8 symmetric range for unit-norm components
MAT_DIMS = 16
FULL_DIMS = 64
# Fixed query budget: recall is a sampled ESTIMATE, so the eval cost should
# be O(Q·n) with Q a design constant — without the cap the query set grows
# with the corpus and the exact ground-truth ranking turns O(n²/QUERY_MOD)
# (measured 73× at 10× data; capped, it re-measured linear).
RECALL_QCAP = 64
_Q_PRED = f"vec_id % {QUERY_MOD} = 0 AND vec_id < {QUERY_MOD * RECALL_QCAP}"

_EXACT_RANK = f"""
exact AS (
  SELECT q_id, c_id, rk FROM (
    SELECT a.vec_id AS q_id, b.vec_id AS c_id,
           CAST(row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY round(list_dot_product(a.v, b.v)
                      / (sqrt(list_dot_product(a.v, a.v))
                         * sqrt(list_dot_product(b.v, b.v))), 6) DESC,
             b.vec_id) AS INT) AS rk
    FROM (SELECT * FROM e WHERE {_Q_PRED}) a
    JOIN e b ON a.vec_id <> b.vec_id
  ) WHERE rk <= {RECALL_K}
)"""


@query(
    "vec_int8_recall",
    oracle=f"""
WITH e AS MATERIALIZED ({_E_DOUBLE}),
nv AS MATERIALIZED (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
  WHERE sqrt(list_dot_product(v, v)) > 0
),
qv AS MATERIALIZED (
  SELECT vec_id,
         list_transform(v, x -> CAST(floor(x * {QBITS_SCALE} / nrm) AS BIGINT)) AS q
  FROM nv
),
{_EXACT_RANK},
quant AS (
  SELECT q_id, c_id, rkq FROM (
    SELECT a.vec_id AS q_id, b.vec_id AS c_id,
           CAST(row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY round(list_dot_product(a.q, b.q)
                      / (sqrt(list_dot_product(a.q, a.q))
                         * sqrt(list_dot_product(b.q, b.q))), 6) DESC,
             b.vec_id) AS INT) AS rkq
    FROM (SELECT * FROM qv WHERE {_Q_PRED}) a
    JOIN qv b ON a.vec_id <> b.vec_id
  ) WHERE rkq <= {RECALL_K}
)
SELECT x.q_id, CAST(count(qt.c_id) AS BIGINT) AS n_hit,
       CAST({RECALL_K} AS INT) AS k
FROM exact x LEFT JOIN quant qt ON x.q_id = qt.q_id AND x.c_id = qt.c_id
GROUP BY x.q_id
""",
)
def vec_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{RECALL_K} of int8-quantized search against exact cosine: each
    embedding is unit-normalized then floor-quantized to [-127, 127]
    (per-component ⌊x·127/‖v‖⌋, one shared scale) and searched by cosine
    over the quantized vectors — exactly what a production int8 index
    scores, with the norms precomputed; the quantized ranking's overlap
    with the exact top-{RECALL_K} is counted per query. Quantized
    components are exact small integers → the ranking value-hashes.

    Scale shape: quantization is a narrow per-row transform; both
    rankings ride the Arrow blocked-matmul kernel (knn_exact_blocked,
    oracle-proven) over a FIXED query budget of {RECALL_QCAP} sampled
    queries — recall is a sampled estimate, so the eval is O(Q·n·d) with
    Q constant (uncapped, the query set grew with the corpus and the eval
    went quadratic — 73× at 10× data; capped + blocked it is linear).
    The production path swaps the candidate generator for the IVF/LSH
    rungs, and this operator is exactly how you'd measure THAT swap too."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    nv = e.withColumn("nrm", F.sqrt(dot("v", "v"))).filter(F.col("nrm") > 0)
    qv = nv.select(
        "vec_id",
        F.expr(
            f"transform(v, x -> CAST(CAST(floor(x * {QBITS_SCALE} / nrm) AS BIGINT)"
            " AS DOUBLE))"
        ).alias("q"),
    )
    qsel = (F.col("vec_id") % QUERY_MOD == 0) & (
        F.col("vec_id") < QUERY_MOD * RECALL_QCAP
    )
    # both rankings ride the Arrow blocked-matmul kernel (oracle-proven in
    # vec_knn_blocked) — the interpreted-HOF cosine was ~20× slower at sf1
    exact = knn_exact_blocked(
        e.filter(qsel).select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
        ),
        e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec")),
        RECALL_K,
    ).select("q_id", "c_id")
    quant = knn_exact_blocked(
        qv.filter(qsel).select(
            F.col("vec_id").alias("q_id"), F.col("q").alias("q_vec")
        ),
        qv.select(F.col("vec_id").alias("c_id"), F.col("q").alias("c_vec")),
        RECALL_K,
    ).select("q_id", "c_id")
    hits = exact.join(
        quant.select("q_id", "c_id", F.lit(1).alias("hit")), ["q_id", "c_id"], "left"
    )
    return hits.groupBy("q_id").agg(
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
        F.lit(RECALL_K).cast("int").alias("k"),
    )


@query(
    "vec_matryoshka_recall",
    oracle=f"""
WITH e AS MATERIALIZED ({_E_DOUBLE}),
{_EXACT_RANK},
tr AS MATERIALIZED (
  SELECT vec_id, v[1:{MAT_DIMS}] AS t FROM e
),
trunc AS (
  SELECT q_id, c_id, rkt FROM (
    SELECT a.vec_id AS q_id, b.vec_id AS c_id,
           CAST(row_number() OVER (
             PARTITION BY a.vec_id
             ORDER BY round(list_dot_product(a.t, b.t)
                      / (sqrt(list_dot_product(a.t, a.t))
                         * sqrt(list_dot_product(b.t, b.t))), 6) DESC,
             b.vec_id) AS INT) AS rkt
    FROM (SELECT * FROM tr WHERE {_Q_PRED}) a
    JOIN tr b ON a.vec_id <> b.vec_id
  ) WHERE rkt <= {RECALL_K}
)
SELECT x.q_id, CAST(count(t.c_id) AS BIGINT) AS n_hit,
       CAST({RECALL_K} AS INT) AS k
FROM exact x LEFT JOIN trunc t ON x.q_id = t.q_id AND x.c_id = t.c_id
GROUP BY x.q_id
""",
)
def vec_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@{RECALL_K} of cosine search over the first {MAT_DIMS} of
    {FULL_DIMS} dimensions vs the full-dimension exact ranking — the
    matryoshka/prefix-truncation evaluation. A 4× dimension cut that
    keeps high recall means the first-pass scan (and the ANN index) can
    run on the prefix and re-rank survivors with the full vector.

    Scale shape: truncation is a narrow slice projection; both rankings
    ride the Arrow blocked-matmul kernel over the fixed {RECALL_QCAP}-query
    budget — O(Q·n·d), linear in the corpus (see vec_int8_recall)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qsel = (F.col("vec_id") % QUERY_MOD == 0) & (
        F.col("vec_id") < QUERY_MOD * RECALL_QCAP
    )
    exact = knn_exact_blocked(
        e.filter(qsel).select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("q_vec")
        ),
        e.select(F.col("vec_id").alias("c_id"), F.col("v").alias("c_vec")),
        RECALL_K,
    ).select("q_id", "c_id")
    tr = e.select("vec_id", F.slice("v", 1, MAT_DIMS).alias("t"))
    trunc = knn_exact_blocked(
        tr.filter(qsel).select(
            F.col("vec_id").alias("q_id"), F.col("t").alias("q_vec")
        ),
        tr.select(F.col("vec_id").alias("c_id"), F.col("t").alias("c_vec")),
        RECALL_K,
    ).select("q_id", "c_id")
    hits = exact.join(
        trunc.select("q_id", "c_id", F.lit(1).alias("hit")), ["q_id", "c_id"], "left"
    )
    return hits.groupBy("q_id").agg(
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hit"),
        F.lit(RECALL_K).cast("int").alias("k"),
    )
