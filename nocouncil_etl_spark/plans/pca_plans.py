"""Principal component analysis via integer power iteration.

``vec_pca_power`` — the top principal component of the embedding corpus:
exact integer scatter matrix S = n·Σxxᵀ − (Σx)(Σx)ᵀ aggregated
distributedly, then a fixed-point power iteration on the D×D matrix. The
dimensionality-reduction / drift-axis primitive: which direction explains
the most variance in the corpus (PCA whitening, embedding-drift axes,
1-bit semantic hashing all start here).

Determinism rules (the kmeans/PageRank discipline applied to an
eigenproblem):
- vectors quantize to an integer grid q(x) = round(x·1000), so first and
  second moments are exact BIGINTs and combine-order-independent;
- the scatter matrix is the exact integer identity n·Σxᵢxⱼ − ΣxᵢΣxⱼ
  (no float covariance anywhere);
- the power iteration runs in pure integer arithmetic — matvec, then
  renormalize with TRUNCATING division v′ = w // (max|w| // VSCALE + 1);
  DuckDB's integer `//` truncates toward zero (like Spark's `div`, unlike
  Python's flooring `//`), and loadings go negative, where the two
  conventions differ — the driver loop uses an explicit truncating helper;
- sign is fixed by convention (first dimension's loading ≥ 0), the same
  rule both engines apply.

Scale shape: the ONLY corpus-sized work is one explode + self-join per
vec_id (D² rows per vector, map-side-combined into D² groups) — at 100 TB
that is a single Arrow-friendly pass whose shuffle carries D² partial sums
per task, not per row. The D×D matrix (D = {D}: 256 entries) then iterates
DRIVER-SIDE — bounded state by design, the same contract as the k-means
centroid matrix (operators/kmeans.MAX_CENTROIDS) and the similarity query
cap. Python's arbitrary-precision ints and DuckDB's BIGINT agree because
every intermediate is bounded ≤ 16·n·10¹¹ ≪ 2⁶³ (checked for n up to 10⁹
vectors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

D = 16  # leading dimensions used (keeps the oracle CTE and D² pass small)
QUANT = 1000
VSCALE = 100_000
PCA_ITERS = 24


def _pca_oracle() -> str:
    # MATERIALIZED + window-function renormalization keep DuckDB's CTE
    # evaluation linear: the first scalar-subquery formulation re-inlined
    # each iteration's subtree multiplicatively (minutes at 500 vectors).
    cte = [f"""
WITH q AS MATERIALIZED (
  SELECT vec_id, i, CAST(round(CAST(embedding[i] AS DOUBLE) * {QUANT}) AS BIGINT) AS x
  FROM embeddings, range(1, {D + 1}) t(i)
),
meta AS MATERIALIZED (SELECT count(DISTINCT vec_id) AS n FROM q),
m1 AS MATERIALIZED (SELECT i, CAST(sum(x) AS BIGINT) AS m FROM q GROUP BY i),
s2 AS MATERIALIZED (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.x * b.x) AS BIGINT) AS s
  FROM q a JOIN q b USING (vec_id) GROUP BY 1, 2
),
smat AS MATERIALIZED (
  SELECT s2.i, s2.j,
         ((SELECT n FROM meta) * s2.s - ma.m * mb.m) // (SELECT n FROM meta) AS sn
  FROM s2 JOIN m1 ma ON ma.i = s2.i JOIN m1 mb ON mb.i = s2.j
),
v0 AS MATERIALIZED (SELECT i, {VSCALE}::BIGINT AS v FROM range(1, {D + 1}) r(i))"""]
    for k in range(PCA_ITERS):
        cte.append(f""",
w{k} AS MATERIALIZED (
  SELECT s.i, CAST(sum(s.sn * v.v) AS BIGINT) AS w,
         max(abs(CAST(sum(s.sn * v.v) AS BIGINT))) OVER () AS mx
  FROM smat s JOIN v{k} v ON s.j = v.i GROUP BY s.i
),
v{k + 1} AS MATERIALIZED (
  SELECT i, w // (mx // {VSCALE} + 1) AS v,
         max(abs(w // (mx // {VSCALE} + 1))) OVER () AS vmx
  FROM w{k}
)""")
    last = PCA_ITERS
    cte.append(f""",
sgn AS MATERIALIZED (
  SELECT CASE WHEN (SELECT v FROM v{last} WHERE i = 1) < 0 THEN -1 ELSE 1 END AS s
)
SELECT i AS dim, CAST(v * (SELECT s FROM sgn) AS BIGINT) AS loading,
       round((SELECT CAST(max(mx) AS DOUBLE) FROM w{last - 1})
             / (SELECT max(vmx) FROM v{last - 1}), 6) AS lambda_est
FROM v{last}""")
    return "".join(cte)


@query("vec_pca_power", oracle=_pca_oracle())
def vec_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus (leading {D} dims)
    by integer power iteration — see module docstring for the exactness
    contract. Emits one row per dimension: the fixed-point loading (scale
    {VSCALE}, sign-normalized so dim 1 ≥ 0) and the Rayleigh-style
    eigenvalue estimate max|w|/max|v| from the final matvec.

    The corpus pass is distributed (explode → self-join per vec_id →
    map-side-combined D² sums); the D×D iteration state is driver-side and
    bounded by design, mirroring the k-means centroid contract."""
    emb = load(spark, sf_dir, "embeddings")
    x = emb.select(
        "vec_id",
        F.posexplode(F.slice("embedding", 1, D)).alias("pos", "val"),
    ).select(
        "vec_id",
        (F.col("pos") + 1).alias("i"),
        F.round(F.col("val").cast("double") * QUANT).cast("long").alias("x"),
    )
    n = emb.count()  # one scalar: the corpus size
    m1 = {r.i: r.m for r in x.groupBy("i").agg(F.sum("x").cast("long").alias("m")).collect()}
    a, b = x.alias("a"), x.alias("b")
    s2_rows = (
        a.join(b, "vec_id")
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg(F.sum(F.col("a.x") * F.col("b.x")).cast("long").alias("s"))
        .collect()
    )
    def tdiv(x: int, d: int) -> int:
        # truncate-toward-zero division (DuckDB `//`, Spark `div`); d > 0
        return abs(x) // d if x >= 0 else -(abs(x) // d)

    # D×D scatter matrix — bounded driver state (256 entries), kmeans contract
    sn = {}
    for r in s2_rows:
        sn[(r.i, r.j)] = tdiv(n * r.s - m1[r.i] * m1[r.j], n)
    v = {i: VSCALE for i in range(1, D + 1)}
    mx_last = vmax_last = 1
    for _ in range(PCA_ITERS):
        vmax_last = max(abs(x) for x in v.values())
        w = {
            i: sum(sn[(i, j)] * v[j] for j in range(1, D + 1))
            for i in range(1, D + 1)
        }
        mx_last = max(abs(x) for x in w.values())
        v = {i: tdiv(w[i], mx_last // VSCALE + 1) for i in range(1, D + 1)}
    sign = -1 if v[1] < 0 else 1
    lam = round(mx_last / vmax_last, 6)
    rows = [(i, sign * v[i], lam) for i in range(1, D + 1)]
    return spark.createDataFrame(rows, "dim INT, loading BIGINT, lambda_est DOUBLE")
