"""Similarity search operators (SURVEY.md §2.9 E3, §4.2-1).

The reference's ANN is ChromaDB HNSW over cosine space (vectorize.py:119-123);
queried top-k out of repo. The engine provides a strategy ladder:

1. ``knn_exact``  — brute-force: join queries × corpus, cosine, window top-k.
   O(|Q|·|C|) — correct baseline, fine when |Q| is small or |C| is broadcast-able.
2. ``knn_partitioned`` — IVF-style: restrict pairing to a coarse partition
   (here the ``label`` column stands in for a centroid assignment), cutting
   the candidate set by the partition fan-out.
3. ``lsh_bucket`` / ``knn_lsh`` — random-hyperplane (SimHash) LSH: bucket by
   sign-bit signature, pair only within buckets. At 100 TB this is the scale
   path: bucketing is a narrow map, pairing is an equi-join shuffle on the
   bucket key — no quadratic stage anywhere. Hyperplanes are derived from a
   fixed seed so results are deterministic and oracle-checkable.

All kernels are pure column expressions (functions/vectors.py) — no UDFs.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nocouncil_etl_spark.functions.vectors import as_double, cosine, dot, l2_norm  # noqa: F401  (cosine kept as public kernel)

LSH_SEED = 42
LSH_PLANES = 8
LSH_DIM = 64

# OR-amplification: L independent, identically-seeded-apart signature tables.
# Fewer planes per table than the single-table path (wider buckets) × more
# tables = the recall knob; candidates are the UNION over tables, so recall
# compounds as 1-(1-p^r)^L while cost stays a bucketed equi-join.
LSH_MULTI_TABLES = 4
LSH_MULTI_PLANES = 6


def _planes(seed: int, n_planes: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return [
        [round(float(x), 6) for x in rng.standard_normal(LSH_DIM)]
        for _ in range(n_planes)
    ]


# Deterministic hyperplane matrices, shared by the Spark plan and the
# generated oracle SQL (plans/vectors_plans.py embeds the same literals).
HYPERPLANES: list[list[float]] = _planes(LSH_SEED, LSH_PLANES)
HYPERPLANES_MULTI: list[list[list[float]]] = [
    _planes(LSH_SEED + t, LSH_MULTI_PLANES) for t in range(LSH_MULTI_TABLES)
]


def _plane_lit(plane: list[float]) -> Column:
    return F.array(*[F.lit(x) for x in plane])


# The ONE place the signature encodings live (the SQL twins in
# plans/vectors_plans.py are generated from the same constants): a bucket key
# is the sign bits joined '1'/'0'; a multi-table key is 't#bits' so tables
# can never collide in a bucket join.


def bits_key(signs_row) -> str:
    """Sign-bit row → bucket key string."""
    return "".join("1" if b else "0" for b in signs_row)


def multi_bucket_keys(signs_row, offset: int = 0) -> list[str]:
    """Sign-bit row (L·P wide starting at ``offset``) → the L table keys."""
    return [
        f"{t}#"
        + bits_key(
            signs_row[
                offset + t * LSH_MULTI_PLANES : offset + (t + 1) * LSH_MULTI_PLANES
            ]
        )
        for t in range(LSH_MULTI_TABLES)
    ]


def lsh_signature(vec: Column | str) -> Column:
    """Sign-bit signature string, e.g. '10110010' — the LSH bucket key
    (expression form, for composition; hot path = lsh_signature_udf)."""
    bits = [
        F.when(dot(vec, _plane_lit(p)) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for p in HYPERPLANES
    ]
    return F.concat(*bits)


_PLANES_MAT = np.array(HYPERPLANES, dtype=np.float64)  # (P, D)


@F.pandas_udf(T.StringType())
def lsh_signature_udf(vecs: pd.Series) -> pd.Series:
    """Arrow twin of lsh_signature: one numpy matmul per batch against the
    plane matrix. Sign decisions agree with the expression/oracle form —
    dots are O(0.1-10), float64 noise is ~1e-15, so no boundary flips."""
    mat = np.vstack(vecs.to_numpy()).astype(np.float64)  # (N, D)
    signs = (mat @ _PLANES_MAT.T) >= 0  # (N, P)
    return pd.Series([bits_key(row) for row in signs])


# (L·P, D) — all tables' planes stacked for one matmul per batch
_MULTI_MAT = np.array(
    [p for table in HYPERPLANES_MULTI for p in table], dtype=np.float64
)


@F.pandas_udf(T.ArrayType(T.StringType()))
def lsh_multi_signature_udf(vecs: pd.Series) -> pd.Series:
    """All L table signatures per vector in ONE matmul; each key is
    't#bits' so different tables can never collide in the bucket join."""
    mat = np.vstack(vecs.to_numpy()).astype(np.float64)  # (N, D)
    signs = (mat @ _MULTI_MAT.T) >= 0  # (N, L·P)
    return pd.Series([multi_bucket_keys(row) for row in signs])


def attach_signature(df: DataFrame, vec_col: str, multi: bool = False) -> DataFrame:
    """Append the LSH bucket column(s) via ONE mapInPandas pass.

    Why not the pandas_udf expression: a join key produced by a Python UDF
    expression gets re-extracted by ExtractPythonUDFs for the join's inferred
    isnotnull filter AND for the output projection — two ArrowEvalPython
    nodes, i.e. the whole side is signed twice (measured; the corpus side of
    an LSH join is the big side, so that's 2× the dominant cost). A
    mapInPandas node is a single unsplittable map: the optimizer filters on
    its output column instead of duplicating the kernel. Same numpy matmul
    kernel, same values, same oracle."""
    fields = [f'{f.name} {f.dataType.simpleString()}' for f in df.schema.fields]
    out_col = "buckets" if multi else "bucket"
    out_type = "array<string>" if multi else "string"
    schema = ", ".join([*fields, f"{out_col} {out_type}"])

    def add_sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                pdf[out_col] = []
                yield pdf
                continue
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            if multi:
                signs = mat @ _MULTI_MAT.T >= 0
                pdf[out_col] = [multi_bucket_keys(row) for row in signs]
            else:
                signs = mat @ _PLANES_MAT.T >= 0
                pdf[out_col] = [bits_key(row) for row in signs]
            yield pdf

    return df.mapInPandas(add_sig, schema)


def knn_exact(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Brute-force top-k: cross join → cosine → row_number ≤ k.

    The small side (queries) is broadcast so the cross join is a map-side
    nested loop over corpus partitions — no shuffle until the final window,
    which shuffles only |Q|·|C| scored pairs pruned by the window.
    """
    # norms are per-row — fold them once on each side BEFORE pairing, so each
    # pair evaluates only the dot product (3× less interpreted HOF work than
    # cosine() per pair; arithmetic is unchanged → identical values)
    qn = queries.withColumn("_qn", l2_norm(q_vec))
    cn = corpus.withColumn("_cn", l2_norm(c_vec))
    pairs = cn.crossJoin(F.broadcast(qn)).filter(F.col(q_id) != F.col(c_id))
    sim = F.when(
        F.col("_qn") * F.col("_cn") != 0,
        dot(q_vec, c_vec) / (F.col("_qn") * F.col("_cn")),
    )
    scored = pairs.select(q_id, c_id, F.round(sim, 6).alias("sim"))
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)



def _query_matrix(rows, q_id: str, q_vec: str):
    """(ids, row-normalized float64 matrix, zero-norm mask) from collected
    query rows — the shippable task-closure form of a bounded query set."""
    ids = np.array([r[q_id] for r in rows])
    qm = np.array([r[q_vec] for r in rows], dtype=np.float64)
    q_norm = np.linalg.norm(qm, axis=1, keepdims=True)
    q_zero = (q_norm == 0).ravel()
    qm = np.divide(qm, q_norm, out=np.zeros_like(qm), where=q_norm != 0)
    return ids, qm, q_zero


def _emit_batch_topk(sims, c_ids, q_ids, k):
    """Shared per-batch candidate emission (the knn_exact_blocked scoring
    tail): per query keep the group's top min(k+1, n) with the 1e-6 epsilon
    guard (one rounding ulp at 6dp — a candidate that would round-tie into
    the global top-k is never dropped), −inf (undefined cosine) rows kept
    as nulls tie-broken by smallest c_id, sims emitted with Spark's
    HALF_UP rounding rule."""
    out_q, out_c, out_s = [], [], []
    top = min(k + 1, len(c_ids))
    for j in range(sims.shape[1]):
        col = sims[:, j]
        finite = np.nonzero(np.isfinite(col))[0]
        if len(finite) >= top:
            vals = col[finite]
            kth = np.partition(vals, len(vals) - top)[len(vals) - top]
            idx = finite[vals >= kth - 1e-6]
        else:
            nulls = np.nonzero(~np.isfinite(col))[0]
            pick = nulls[np.argsort(c_ids[nulls])[: top - len(finite)]]
            idx = np.concatenate([finite, pick])
        out_q.extend([q_ids[j]] * len(idx))
        out_c.extend(c_ids[idx])
        out_s.extend(
            _round6_like_spark(v) if np.isfinite(v) else None for v in col[idx]
        )
    return out_q, out_c, out_s


def _blocked_candidates_by_part(
    corpus: DataFrame,
    per_part: dict,
    k: int,
    part_col: str,
    c_id: str,
    c_vec: str,
    q_id: str,
) -> DataFrame:
    """Per-partition twin of knn_exact_blocked's scoring pass: each Arrow
    batch of corpus vectors is grouped by its partition key and scored
    against THAT partition's query matrix with one numpy matmul, emitting
    per-batch top-(k+1) candidates (same pruning epsilon, zero-norm-null,
    and Spark-rule rounding as the exact kernel). per_part maps partition
    key -> (q_ids, normalized query matrix, zero mask)."""

    def score(batches):
        for pdf in batches:
            for part, sub in pdf.groupby(part_col, sort=False):
                qp = per_part.get(part)
                if qp is None:
                    continue
                q_ids, qm, q_zero = qp
                cm = np.vstack(sub[c_vec].to_numpy()).astype(np.float64)
                c_norm = np.linalg.norm(cm, axis=1, keepdims=True)
                c_zero = (c_norm == 0).ravel()
                cm = np.divide(
                    cm, c_norm, out=np.zeros_like(cm), where=c_norm != 0
                )
                sims = cm @ qm.T
                sims[c_zero, :] = -np.inf
                sims[:, q_zero] = -np.inf
                out_q, out_c, out_s = _emit_batch_topk(
                    sims, sub[c_id].to_numpy(), q_ids, k
                )
                yield pd.DataFrame({q_id: out_q, c_id: out_c, "sim": out_s})

    return corpus.select(part_col, c_id, c_vec).mapInPandas(
        score, schema=f"{q_id} long, {c_id} long, sim double"
    )


def _blocked_candidates_by_signature(
    corpus: DataFrame,
    per_part: dict,
    k: int,
    c_id: str,
    c_vec: str,
    q_id: str,
    multi: bool = False,
) -> DataFrame:
    """Fused sign-and-score pass for the LSH strategies (r12 opt, guide
    §4.2 + §2.4): ONE Arrow pass computes each corpus batch's signature(s)
    — the same stacked numpy matmul attach_signature runs — AND scores the
    batch against the colliding queries' matrices, so the corpus is
    touched exactly once, no signature column materializes, and the
    per-pair interpreted-HOF dot() the old plan evaluated is a blocked
    matmul (the knn_partitioned substitution, same documented ~1-ulp
    evaluation-order tolerance, same HALF_UP rounding).

    ``multi=True`` unions candidates over the L signature tables; a pair
    colliding in several tables scores identically, and batch-local dedup
    is complete because a corpus row lives in exactly one Arrow batch."""

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.vstack(pdf[c_vec].to_numpy()).astype(np.float64)
            c_norm = np.linalg.norm(mat, axis=1, keepdims=True)
            c_zero = (c_norm == 0).ravel()
            cm = np.divide(mat, c_norm, out=np.zeros_like(mat), where=c_norm != 0)
            c_ids_all = pdf[c_id].to_numpy()
            if multi:
                signs = mat @ _MULTI_MAT.T >= 0
                keys_rows = [multi_bucket_keys(row) for row in signs]
            else:
                signs = mat @ _PLANES_MAT.T >= 0
                keys_rows = [[bits_key(row)] for row in signs]
            groups: dict = {}
            for i, keys in enumerate(keys_rows):
                for key in keys:
                    if key in per_part:
                        groups.setdefault(key, []).append(i)
            seen: set = set()
            out_q, out_c, out_s = [], [], []
            for key, idxs in groups.items():
                q_ids, qm, q_zero = per_part[key]
                sub = np.asarray(idxs)
                sims = cm[sub] @ qm.T
                sims[c_zero[sub], :] = -np.inf
                sims[:, q_zero] = -np.inf
                oq, oc, os_ = _emit_batch_topk(sims, c_ids_all[sub], q_ids, k)
                if multi:
                    # OR over tables: a pair colliding in several tables
                    # scores once (the old dropDuplicates([q, c]))
                    for a, b, s in zip(oq, oc, os_):
                        if (a, b) not in seen:
                            seen.add((a, b))
                            out_q.append(a)
                            out_c.append(b)
                            out_s.append(s)
                else:
                    out_q.extend(oq)
                    out_c.extend(oc)
                    out_s.extend(os_)
            if out_q:
                yield pd.DataFrame({q_id: out_q, c_id: out_c, "sim": out_s})

    return corpus.select(c_id, c_vec).mapInPandas(
        score, schema=f"{q_id} long, {c_id} long, sim double"
    )



def knn_partitioned(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    part_col: str,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """IVF-style ANN: equi-join on a coarse partition key, then top-k within.

    Candidate count drops by the partition fan-out; recall is bounded by
    the coarse quantizer (exactly IVF with nprobe=1). Scoring is the
    blocked numpy-matmul kernel grouped by partition key (the
    knn_exact_blocked pass with one query matrix per partition) — the
    per-pair expression cosine it replaces evaluated interpreted and grew
    quadratically in wall time with cell size. Query side bounded by
    MAX_BLOCKED_QUERIES, the blocked-strategy contract; a LARGER query set
    falls back to the fully-distributed equi-join + expression-cosine path
    (result-identical, never leaves the cluster) instead of failing —
    slower per pair, but the right trade when the query side itself is
    data-sized."""
    q_rows = (
        queries.select(part_col, q_id, q_vec)
        .limit(MAX_BLOCKED_QUERIES + 1)
        .collect()
    )
    if len(q_rows) > MAX_BLOCKED_QUERIES:
        return _knn_part_distributed(
            queries.withColumn("_qn", l2_norm(q_vec)),
            corpus, k, part_col, q_id, c_id, q_vec, c_vec,
        )
    by_part: dict = {}
    for r in q_rows:
        by_part.setdefault(r[part_col], []).append(r)
    per_part = {p: _query_matrix(rows, q_id, q_vec) for p, rows in by_part.items()}
    candidates = _blocked_candidates_by_part(
        corpus, per_part, k, part_col, c_id, c_vec, q_id
    )
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc_nulls_last(), F.col(c_id))
    return (
        candidates.filter(F.col(q_id) != F.col(c_id))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def _knn_part_distributed(
    q_with_norm: DataFrame,
    corpus: DataFrame,
    k: int,
    part_col: str,
    q_id: str,
    c_id: str,
    q_vec: str,
    c_vec: str,
) -> DataFrame:
    """Fallback scoring when the query/probe side exceeds
    MAX_BLOCKED_QUERIES (too big for a task closure): shuffle-hash
    equi-join on the partition key + JVM expression cosine. shuffle_hash
    is hinted explicitly so Spark can never elect to broadcast a
    data-sized query side. Semantically identical to the blocked kernel —
    same 6dp HALF_UP rounding (F.round), null sims for zero norms ranked
    last, same (sim desc, c_id) tie-break — up to the documented ~1-ulp
    float evaluation-order tolerance: this path computes JVM
    dot/(|a|·|b|) then rounds, the blocked kernel a numpy normalized
    matmul then _round6_like_spark, so a value within ~1 ulp of a .5e-7
    rounding boundary at 6dp can round apart and flip a rank (the same
    tolerance vec_neardup_cosine documents at its 0.99 cutoff). No
    synthetic vector sits on a boundary; a future mismatch here is that
    known artifact, not a fallback bug."""
    cn = corpus.withColumn("_cn", l2_norm(c_vec))
    pairs = cn.join(q_with_norm.hint("shuffle_hash"), on=part_col).filter(
        F.col(q_id) != F.col(c_id)
    )
    sim = F.when(
        F.col("_qn") * F.col("_cn") != 0,
        dot(q_vec, c_vec) / (F.col("_qn") * F.col("_cn")),
    )
    scored = pairs.select(q_id, c_id, F.round(sim, 6).alias("sim"))
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc_nulls_last(), F.col(c_id))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def knn_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """LSH ANN: pair only vectors sharing the hyperplane sign signature.

    r12 opt (guide §4.2): the query side (tiny by the ANN contract) is
    signed and collected once; the corpus side runs the fused
    sign-and-score Arrow kernel (_blocked_candidates_by_signature) — one
    corpus pass, no per-pair interpreted-HOF dot(), no signature column
    shuffled. A query set above MAX_BLOCKED_QUERIES falls back to the
    broadcast bucket equi-join + expression cosine (result-identical up
    to the documented ~1-ulp evaluation-order tolerance, same as
    knn_partitioned's fallback)."""
    q = attach_signature(queries, q_vec)
    q_rows = q.select("bucket", q_id, q_vec).limit(MAX_BLOCKED_QUERIES + 1).collect()
    if len(q_rows) > MAX_BLOCKED_QUERIES:
        return _knn_lsh_joined(queries, corpus, k, q_id, c_id, q_vec, c_vec)
    by_part: dict = {}
    for r in q_rows:
        by_part.setdefault(r["bucket"], []).append(r)
    per_part = {p: _query_matrix(rows, q_id, q_vec) for p, rows in by_part.items()}
    candidates = _blocked_candidates_by_signature(
        corpus, per_part, k, c_id, c_vec, q_id
    )
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc_nulls_last(), F.col(c_id))
    return (
        candidates.filter(F.col(q_id) != F.col(c_id))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def _knn_lsh_joined(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str,
    c_id: str,
    q_vec: str,
    c_vec: str,
) -> DataFrame:
    """Distributed fallback for a data-sized query side: broadcast bucket
    equi-join + JVM expression cosine (the pre-r12 shape; never collects)."""
    q = attach_signature(queries, q_vec).withColumn("_qn", l2_norm(q_vec))
    c = attach_signature(corpus, c_vec).withColumn("_cn", l2_norm(c_vec))
    pairs = c.join(F.broadcast(q), on="bucket").filter(F.col(q_id) != F.col(c_id))
    sim = F.when(
        F.col("_qn") * F.col("_cn") != 0,
        dot(q_vec, c_vec) / (F.col("_qn") * F.col("_cn")),
    )
    scored = pairs.select(q_id, c_id, F.round(sim, 6).alias("sim"))
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def knn_lsh_multi(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """LSH ANN with OR-amplification over L signature tables: a pair is a
    candidate if it collides in ANY table, so recall compounds as
    1-(1-p^r)^L instead of p^r (single table). The recall-vs-candidates
    trade is measured in SCALE.md and property-tested against the exact
    kernel.

    r12 opt (guide §4.2): same fused sign-and-score corpus pass as
    knn_lsh with per-batch pair dedup across the L tables (complete — a
    corpus row lives in exactly one Arrow batch); oversized query sets
    fall back to the explode + broadcast equi-join shape, whose 100 TB
    story is the single-table one ×L, never quadratic."""
    q = attach_signature(queries, q_vec, multi=True)
    q_rows = (
        q.select(F.explode("buckets").alias("bucket"), q_id, q_vec)
        .limit(MAX_BLOCKED_QUERIES + 1)
        .collect()
    )
    if len(q_rows) > MAX_BLOCKED_QUERIES:
        return _knn_lsh_multi_joined(queries, corpus, k, q_id, c_id, q_vec, c_vec)
    by_part: dict = {}
    for r in q_rows:
        by_part.setdefault(r["bucket"], []).append(r)
    per_part = {p: _query_matrix(rows, q_id, q_vec) for p, rows in by_part.items()}
    candidates = _blocked_candidates_by_signature(
        corpus, per_part, k, c_id, c_vec, q_id, multi=True
    )
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc_nulls_last(), F.col(c_id))
    return (
        candidates.filter(F.col(q_id) != F.col(c_id))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def _knn_lsh_multi_joined(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str,
    c_id: str,
    q_vec: str,
    c_vec: str,
) -> DataFrame:
    """Distributed fallback for a data-sized query side (pre-r12 shape)."""
    q = (
        attach_signature(queries, q_vec, multi=True)
        .withColumn("bucket", F.explode("buckets"))
        .drop("buckets")
        .withColumn("_qn", l2_norm(q_vec))
    )
    c = (
        attach_signature(corpus, c_vec, multi=True)
        .withColumn("bucket", F.explode("buckets"))
        .drop("buckets")
        .withColumn("_cn", l2_norm(c_vec))
    )
    pairs = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col(q_id) != F.col(c_id))
        # OR over tables: a pair colliding in several tables scores once
        .dropDuplicates([q_id, c_id])
    )
    sim = F.when(
        F.col("_qn") * F.col("_cn") != 0,
        dot(q_vec, c_vec) / (F.col("_qn") * F.col("_cn")),
    )
    scored = pairs.select(q_id, c_id, F.round(sim, 6).alias("sim"))
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc(), F.col(c_id))
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def knn_ivf_probe(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    part_col: str,
    nprobe: int = 2,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """IVF with real centroid probing, nprobe ≥ 1: build per-partition
    centroids (exact decimal-mean per dimension, rounded 6dp so centroid
    values are combine-order-independent and oracle-stable), rank
    partitions per query by cosine to the centroid, probe the top
    ``nprobe``, then top-k within the probed candidates.

    Stage shapes: centroid build = explode(dims) + partial+final agg (tiny
    result: |partitions|·dims rows); probe ranking = broadcast of the
    centroid table against queries; candidate join = equi-join on the
    partition key, nprobe rows per query — linear everywhere, the knob
    between knn_partitioned (nprobe=1) and exact."""
    from nocouncil_etl_spark.functions.numeric import ravg

    cexp = corpus.select(
        F.col(part_col), F.posexplode(as_double(c_vec)).alias("pos", "x")
    )
    cent = (
        cexp.groupBy(part_col, "pos")
        .agg(ravg("x", 6).alias("m"))
        .groupBy(part_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
            ).alias("cv")
        )
    )
    probes = (
        queries.crossJoin(F.broadcast(cent.withColumnRenamed(part_col, "_probe")))
        .withColumn("_csim", F.round(cosine(q_vec, "cv"), 6))
        .withColumn(
            "_crk",
            F.row_number().over(
                Window.partitionBy(q_id).orderBy(
                    F.col("_csim").desc_nulls_last(), F.col("_probe")
                )
            ),
        )
        .filter(F.col("_crk") <= nprobe)
        .select(q_id, q_vec, F.col("_probe").alias(part_col))
        .withColumn("_qn", l2_norm(q_vec))
    )
    # probe rows are |Q| x nprobe — the same bounded contract as the
    # blocked kernels; scoring is the per-partition matmul pass (a query
    # appears in every partition it probes)
    p_rows = (
        probes.select(part_col, q_id, q_vec)
        .limit(MAX_BLOCKED_QUERIES + 1)
        .collect()
    )
    if len(p_rows) > MAX_BLOCKED_QUERIES:
        # |Q|·nprobe outgrew the task-closure contract: score the probe
        # assignments with the distributed equi-join path instead
        # (probes already carries part_col, q_vec, and _qn per probe row)
        return _knn_part_distributed(
            probes, corpus, k, part_col, q_id, c_id, q_vec, c_vec
        )
    by_part: dict = {}
    for r in p_rows:
        by_part.setdefault(r[part_col], []).append(r)
    per_part = {p: _query_matrix(rows, q_id, q_vec) for p, rows in by_part.items()}
    candidates = _blocked_candidates_by_part(
        corpus, per_part, k, part_col, c_id, c_vec, q_id
    )
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc_nulls_last(), F.col(c_id))
    return (
        candidates.filter(F.col(q_id) != F.col(c_id))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


# Driver-side cap for the blocked strategy's query matrix. 64k × 64 dims ×
# 8 B ≈ 32 MB — comfortably shippable in a task closure; beyond that the
# query side belongs in a distributed strategy, not on the driver.
MAX_BLOCKED_QUERIES = 65_536

_SIX = Decimal("0.000001")


def _round6_like_spark(x: float) -> float:
    """Twin of Spark's Round(double, 6): HALF_UP on the shortest decimal
    representation (BigDecimal.valueOf ≡ Python repr). np.round is half-even
    on the binary value — close, but not the same rule at .5e-7 boundaries."""
    return float(Decimal(repr(float(x))).quantize(_SIX, rounding=ROUND_HALF_UP))


def knn_exact_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "q_id",
    c_id: str = "c_id",
    q_vec: str = "q_vec",
    c_vec: str = "c_vec",
) -> DataFrame:
    """Brute-force top-k as blocked matrix multiply — the 100 TB exact-search
    shape: the (small) query matrix is captured once and shipped to every
    task; each Arrow batch of corpus vectors scores against ALL queries with
    one numpy matmul and emits only its per-batch top-k candidates, so the
    final window ranks ≤ (k+1)·|Q|·n_batches rows instead of |Q|·|C|.

    Result-identical to knn_exact (same oracle), including edges:
    - the query side is size-guarded (MAX_BLOCKED_QUERIES) — a larger query
      set fails fast with a pointer at knn_lsh/knn_partitioned instead of
      OOMing the driver;
    - zero-norm vectors score null (knn_exact's F.when), ranked last;
    - emitted sims use Spark's HALF_UP rounding rule, not np.round;
    - per-batch pruning keeps every candidate within 1e-6 (one rounding
      ulp at 6dp) of the batch's k-th best, so a candidate that would
      round-tie into the global top-k is never dropped: anything pruned
      rounds strictly below ≥ k same-batch survivors."""
    q_rows = queries.select(q_id, q_vec).limit(MAX_BLOCKED_QUERIES + 1).collect()
    if len(q_rows) > MAX_BLOCKED_QUERIES:
        raise ValueError(
            f"knn_exact_blocked materializes the query side on the driver and "
            f"got more than {MAX_BLOCKED_QUERIES} query rows; for large query "
            "sets use knn_lsh or knn_partitioned (bucketed equi-joins that "
            "never leave the cluster)."
        )
    q_ids = np.array([r[q_id] for r in q_rows])
    qm = np.array([r[q_vec] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(qm, axis=1, keepdims=True)
    q_zero = (q_norm == 0).ravel()
    qm = np.divide(qm, q_norm, out=np.zeros_like(qm), where=q_norm != 0)

    def score(batches):
        for pdf in batches:
            cm = np.vstack(pdf[c_vec].to_numpy()).astype(np.float64)
            c_norm = np.linalg.norm(cm, axis=1, keepdims=True)
            c_zero = (c_norm == 0).ravel()
            cm = np.divide(cm, c_norm, out=np.zeros_like(cm), where=c_norm != 0)
            sims = cm @ qm.T  # (batch, |Q|)
            # undefined cosines (zero norm) rank last, surface as null
            sims[c_zero, :] = -np.inf
            sims[:, q_zero] = -np.inf
            c_ids = pdf[c_id].to_numpy()
            out_q, out_c, out_s = [], [], []
            top = min(k + 1, len(c_ids))  # +1 absorbs the self-match
            for j in range(qm.shape[0]):
                col = sims[:, j]
                finite = np.nonzero(np.isfinite(col))[0]
                if len(finite) >= top:
                    vals = col[finite]
                    kth = np.partition(vals, len(vals) - top)[len(vals) - top]
                    idx = finite[vals >= kth - 1e-6]
                else:
                    # fewer than `top` defined sims: keep them all, plus the
                    # smallest-c_id null rows (the window's null tie-break)
                    nulls = np.nonzero(~np.isfinite(col))[0]
                    pick = nulls[np.argsort(c_ids[nulls])[: top - len(finite)]]
                    idx = np.concatenate([finite, pick])
                out_q.extend([q_ids[j]] * len(idx))
                out_c.extend(c_ids[idx])
                out_s.extend(
                    _round6_like_spark(s) if np.isfinite(s) else None
                    for s in col[idx]
                )
            yield pd.DataFrame({q_id: out_q, c_id: out_c, "sim": out_s})

    candidates = corpus.select(c_id, c_vec).mapInPandas(
        score, schema=f"{q_id} long, {c_id} long, sim double"
    )
    w = Window.partitionBy(q_id).orderBy(F.col("sim").desc_nulls_last(), F.col(c_id))
    return (
        candidates.filter(F.col(q_id) != F.col(c_id))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def perturb(vec: Column | str, delta: float, dim_expr: Column) -> Column:
    """Deterministically nudge one dimension — used to synthesize near-dups."""
    return F.transform(
        as_double(vec),
        lambda x, i: F.when(i == dim_expr, x + F.lit(delta)).otherwise(x),
    )
