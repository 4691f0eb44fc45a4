"""Product quantization (Jégou et al., 2011) — the compressed-domain rung
of the ANN ladder (operators/similarity.py has exact/blocked/IVF/LSH;
clustering.py added trained-IVF). PQ is what actually fits 100 TB of
vectors in memory: each vector is stored as M small codes (here {M}×1
byte) instead of {DIMS} floats — a 32× compression — and search runs in
the compressed domain via ADC (asymmetric distance computation): the
query builds an M×K lookup table of exact subspace distances, and every
candidate's distance is M table lookups summed, never a full-vector
multiply.

Exactness: subspace codebooks are trained with the SAME integer-grid
Lloyd's recurrence as cluster_kmeans_fixed (operators/kmeans.py), one
independent k-means per subspace — the oracle splices {M} prefixed
``kmeans_cte`` blocks into one statement and replays encode + table +
scan in exact BIGINT arithmetic. An iterative trained index, value-hash
checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.operators.kmeans import (
    assign_l2,
    assign_l2_topn,
    kmeans_fit,
    quantize_vectors,
)
from nocouncil_etl_spark.operators.pq import pq_assign_codes, pq_fit
from nocouncil_etl_spark.plans.clustering import kmeans_cte, quantize_sql
from nocouncil_etl_spark.registry import query

DIMS = 64
M = 8            # subspaces
SUBD = DIMS // M  # dims per subspace
K_PQ = 8         # codebook size per subspace (3-bit codes here; 256 in prod)
PQ_ITERS = 2
QUERY_MOD = 100  # vec_id % 100 == 0 → query set (vectors_plans convention)
PQ_TOPK = 5


def _pq_oracle() -> str:
    subs = []
    for m in range(M):
        lo, hi = m * SUBD + 1, (m + 1) * SUBD
        subs.append(f"""
sub{m} AS (SELECT vec_id, xq[{lo}:{hi}] AS xq FROM base)""")
    blocks = ",".join(
        kmeans_cte(f"sub{m}", K_PQ, PQ_ITERS, dims=SUBD, prefix=f"s{m}_")
        for m in range(M)
    )
    codes = " UNION ALL ".join(
        f"SELECT vid, {m} AS m, cid AS code FROM s{m}_asg_final"
        for m in range(M)
    )
    cents = " UNION ALL ".join(
        f"SELECT {m} AS m, cid, cv FROM s{m}_cent{PQ_ITERS}" for m in range(M)
    )
    qsubs = " UNION ALL ".join(
        f"SELECT vec_id AS q_id, {m} AS m, xq[{m * SUBD + 1}:{(m + 1) * SUBD}] AS qx "
        f"FROM base WHERE vec_id % {QUERY_MOD} = 0"
        for m in range(M)
    )
    return f"""
WITH base AS (
  SELECT vec_id, {quantize_sql("embedding::DOUBLE[]")} AS xq FROM embeddings
),{",".join(subs)},{blocks},
codes AS ({codes}),
cents AS ({cents}),
qsubs AS ({qsubs}),
dtab AS (
  SELECT q.q_id, q.m, c.cid,
         CAST(list_sum(list_transform(range(1, {SUBD + 1}),
              i -> (q.qx[i] - c.cv[i]) * (q.qx[i] - c.cv[i]))) AS BIGINT) AS d
  FROM qsubs q JOIN cents c ON c.m = q.m
),
adc AS (
  SELECT t.q_id, k.vid AS c_id, CAST(sum(t.d) AS BIGINT) AS adc_dist
  FROM codes k JOIN dtab t ON t.m = k.m AND t.cid = k.code
  WHERE k.vid <> t.q_id
  GROUP BY t.q_id, k.vid
  HAVING count(*) = {M}
)
SELECT q_id, c_id, adc_dist, rk FROM (
  SELECT q_id, c_id, adc_dist,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, c_id)
              AS INT) AS rk
  FROM adc
) WHERE rk <= {PQ_TOPK}
"""


@query("vec_pq_adc_search", oracle=_pq_oracle())
def vec_pq_adc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN, the SEARCH stage over clustering.vec_pq_encode's
    representation (this query trains its own {K_PQ}-code books so the
    whole train→encode→search path sits under one oracle):
    {M} independent integer-grid k-means codebooks
    (one per {SUBD}-dim subspace, k={K_PQ}, {PQ_ITERS} Lloyd's iterations)
    encode every vector as {M} codes; each query (vec_id % {QUERY_MOD})
    builds its exact {M}×{K_PQ} subspace-distance table and scans the
    CODES — candidate distance = Σ of {M} BIGINT lookups (ADC), top-{PQ_TOPK}
    per query by (distance, id), self excluded. The oracle replays all {M}
    trainings as prefixed unrolled-CTE blocks plus the encode/table/scan in
    one statement.

    Scale shape: training cost is {M} narrow Arrow passes per iteration
    with {K_PQ}×{SUBD} closures (constants); the corpus is stored once as
    (vec_id, m, code) — the 32×-compressed representation — and the search
    join is codes ⋈ broadcast(dtab) on (m, code): one shuffle-free
    broadcast join + a (q, candidate) combine-agg. No full-vector math
    touches the corpus at query time — that is the entire point of PQ."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    eq = quantize_vectors(e, "v", "xq").select("vec_id", "xq").persist()
    try:
        # all M codebooks advance together: iters+1 corpus passes total
        # (operators/pq.py), not M·iters — the 100 TB-correct trainer.
        cms = pq_fit(eq, M, SUBD, K_PQ, PQ_ITERS)
        codes = pq_assign_codes(eq, cms, SUBD).select(
            F.col("vec_id").alias("vid"), "m", F.col("code").alias("code")
        )
        cent = spark.createDataFrame(
            [
                (m, i + 1, [int(x) for x in cms[m][i]])
                for m in range(M)
                for i in range(len(cms[m]))
            ],
            "m long, cid long, cv array<long>",
        )
        qsub = eq.filter(F.col("vec_id") % QUERY_MOD == 0).select(
            F.col("vec_id").alias("q_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).cast("long").alias("m"),
                            F.slice("xq", m * SUBD + 1, SUBD).alias("qx"),
                        )
                        for m in range(M)
                    ]
                )
            ).alias("sub"),
        ).select("q_id", "sub.m", "sub.qx")
        dtab = (
            qsub.join(F.broadcast(cent), "m")
            .select(
                "q_id",
                "m",
                "cid",
                F.expr(
                    "aggregate(zip_with(qx, cv, (a, b) -> (a - b) * (a - b)), "
                    "0L, (acc, x) -> acc + x)"
                ).alias("d"),
            )
        )
        adc = (
            codes.alias("k")
            .join(
                F.broadcast(dtab.alias("t")),
                (F.col("t.m") == F.col("k.m"))
                & (F.col("t.cid") == F.col("k.code")),
            )
            .filter(F.col("k.vid") != F.col("t.q_id"))
            .groupBy(
                F.col("t.q_id").alias("q_id"), F.col("k.vid").alias("c_id")
            )
            .agg(
                F.sum("t.d").cast("long").alias("adc_dist"),
                F.count(F.lit(1)).alias("nm"),
            )
            .filter(F.col("nm") == M)
            .drop("nm")
        )
        w = Window.partitionBy("q_id").orderBy("adc_dist", "c_id")
        return (
            adc.withColumn("rk", F.row_number().over(w).cast("int"))
            .filter(F.col("rk") <= PQ_TOPK)
            .select("q_id", "c_id", "adc_dist", "rk")
        )
    finally:
        eq.unpersist()


# --------------------------------------------------------------------------
# IVF-PQ: coarse cells + compressed codes — scan only the probed cells
# --------------------------------------------------------------------------

KC_IVF = 8
C_ITERS = 2
NPROBE = 2


def _ivfpq_oracle() -> str:
    subs = []
    for m in range(M):
        lo, hi = m * SUBD + 1, (m + 1) * SUBD
        subs.append(f"""
sub{m} AS (SELECT vec_id, xq[{lo}:{hi}] AS xq FROM base)""")
    coarse = kmeans_cte("base", KC_IVF, C_ITERS, dims=DIMS, prefix="c_")
    blocks = ",".join(
        kmeans_cte(f"sub{m}", K_PQ, PQ_ITERS, dims=SUBD, prefix=f"s{m}_")
        for m in range(M)
    )
    codes = " UNION ALL ".join(
        f"SELECT vid, {m} AS m, cid AS code FROM s{m}_asg_final"
        for m in range(M)
    )
    cents = " UNION ALL ".join(
        f"SELECT {m} AS m, cid, cv FROM s{m}_cent{PQ_ITERS}" for m in range(M)
    )
    qsubs = " UNION ALL ".join(
        f"SELECT vec_id AS q_id, {m} AS m, xq[{m * SUBD + 1}:{(m + 1) * SUBD}] AS qx "
        f"FROM base WHERE vec_id % {QUERY_MOD} = 0"
        for m in range(M)
    )
    cdist = (
        f"CAST(list_sum(list_transform(range(1, {DIMS + 1}), "
        f"i -> (q.xq[i] - c.cv[i]) * (q.xq[i] - c.cv[i]))) AS BIGINT)"
    )
    return f"""
WITH base AS (
  SELECT vec_id, {quantize_sql("embedding::DOUBLE[]")} AS xq FROM embeddings
),{",".join(subs)},{coarse},{blocks},
probes AS (
  SELECT q_id, cid FROM (
    SELECT q.vec_id AS q_id, c.cid,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY {cdist}, c.cid) AS crk
    FROM (SELECT vec_id, xq FROM base WHERE vec_id % {QUERY_MOD} = 0) q
    CROSS JOIN c_cent{C_ITERS} c
  ) WHERE crk <= {NPROBE}
),
cand AS (
  SELECT p.q_id, a.vid AS c_id
  FROM probes p JOIN c_asg_final a ON a.cid = p.cid
  WHERE a.vid <> p.q_id
),
codes AS ({codes}),
cents AS ({cents}),
qsubs AS ({qsubs}),
dtab AS (
  SELECT q.q_id, q.m, c.cid,
         CAST(list_sum(list_transform(range(1, {SUBD + 1}),
              i -> (q.qx[i] - c.cv[i]) * (q.qx[i] - c.cv[i]))) AS BIGINT) AS d
  FROM qsubs q JOIN cents c ON c.m = q.m
),
adc AS (
  SELECT cd.q_id, cd.c_id, CAST(sum(t.d) AS BIGINT) AS adc_dist
  FROM cand cd
  JOIN codes k ON k.vid = cd.c_id
  JOIN dtab t ON t.q_id = cd.q_id AND t.m = k.m AND t.cid = k.code
  GROUP BY cd.q_id, cd.c_id
  HAVING count(*) = {M}
)
SELECT q_id, c_id, adc_dist, rk FROM (
  SELECT q_id, c_id, adc_dist,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_dist, c_id)
              AS INT) AS rk
  FROM adc
) WHERE rk <= {PQ_TOPK}
"""


@query("vec_pq_ivf_search", oracle=_ivfpq_oracle())
def vec_pq_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the composition SCALE.md's PQ row names as the production
    rung: a trained coarse quantizer ({KC_IVF} cells, {C_ITERS} Lloyd's
    iterations on FULL vectors) partitions the corpus; every vector stores
    only (cell, {M} PQ codes); a query probes its {NPROBE} nearest cells
    (exact integer L2 against the coarse centroids) and ADC-scans ONLY the
    probed cells' codes. Top-{PQ_TOPK} per query by (ADC distance, id),
    self excluded. The oracle splices 1 coarse + {M} subspace unrolled
    k-means blocks plus probe/encode/table/scan into one exact statement.

    Scale shape: the full-vector scan cost drops from n to
    n·{NPROBE}/{KC_IVF} candidates per query — and those candidates are
    read as codes (32× smaller), never raw vectors; the per-query work is
    a broadcast dtab join over the probed cells' code lists. This is the
    memory/IO layout FAISS-style systems run at billion-vector scale,
    expressed as two broadcast-shaped joins."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    eq = quantize_vectors(e, "v", "xq").select("vec_id", "xq").persist()
    try:
        # coarse cells (full-dim k-means)
        c_ids, c_cm = kmeans_fit(eq, KC_IVF, C_ITERS)
        cells = assign_l2(eq, c_ids, c_cm).select(
            F.col("vec_id").alias("c_vid"), F.col("cid").alias("cell")
        )
        queries = eq.filter(F.col("vec_id") % QUERY_MOD == 0)
        probes = assign_l2_topn(queries, c_ids, c_cm, NPROBE).select(
            F.col("vec_id").alias("q_id"), F.col("cid").alias("cell")
        )
        cand = (
            probes.join(cells, "cell")
            .filter(F.col("c_vid") != F.col("q_id"))
            .select("q_id", F.col("c_vid").alias("c_id"))
        )
        # PQ codes + query distance tables (same kernels as vec_pq_adc_search)
        cms = pq_fit(eq, M, SUBD, K_PQ, PQ_ITERS)
        codes = pq_assign_codes(eq, cms, SUBD).select(
            F.col("vec_id").alias("c_id"), "m", "code"
        )
        cent = spark.createDataFrame(
            [
                (m, i + 1, [int(x) for x in cms[m][i]])
                for m in range(M)
                for i in range(len(cms[m]))
            ],
            "m long, cid long, cv array<long>",
        )
        qsub = queries.select(
            F.col("vec_id").alias("q_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(m).cast("long").alias("m"),
                            F.slice("xq", m * SUBD + 1, SUBD).alias("qx"),
                        )
                        for m in range(M)
                    ]
                )
            ).alias("sub"),
        ).select("q_id", "sub.m", "sub.qx")
        dtab = qsub.join(F.broadcast(cent), "m").select(
            "q_id",
            "m",
            "cid",
            F.expr(
                "aggregate(zip_with(qx, cv, (a, b) -> (a - b) * (a - b)), "
                "0L, (acc, x) -> acc + x)"
            ).alias("d"),
        )
        adc = (
            cand.join(codes, "c_id")
            .join(
                F.broadcast(dtab.withColumnRenamed("cid", "code")),
                ["q_id", "m", "code"],
            )
            .groupBy("q_id", "c_id")
            .agg(
                F.sum("d").cast("long").alias("adc_dist"),
                F.count(F.lit(1)).alias("nm"),
            )
            .filter(F.col("nm") == M)
            .drop("nm")
        )
        w = Window.partitionBy("q_id").orderBy("adc_dist", "c_id")
        return (
            adc.withColumn("rk", F.row_number().over(w).cast("int"))
            .filter(F.col("rk") <= PQ_TOPK)
            .select("q_id", "c_id", "adc_dist", "rk")
        )
    finally:
        eq.unpersist()
