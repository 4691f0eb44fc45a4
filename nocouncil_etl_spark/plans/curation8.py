"""Curation batch 8 (round 6): contrastive mining, curriculum, batching,
survivorship, bigram LM.

Five training-data-pipeline operators past the dedup/quality basics:

- ``sample_hard_negatives``  — contrastive-training triplet mining: per
  anchor, the positive and HARD negatives come from the anchor's LSH
  bucket (near in embedding space — the negatives that actually teach),
  easy negatives from a hash-ordered draw outside the bucket.
- ``curation_curriculum_order`` — competence-based curriculum: integer
  difficulty score → stage thresholds → deterministic within-stage
  shuffle order (the data-ordering half of curriculum learning).
- ``pack_length_buckets``    — inference/training batching by length
  bucket: padding waste per power-of-two bucket vs one global max-length
  pad — the arithmetic that motivates length-bucketed batching.
- ``dedup_golden_record``    — survivorship after clustering: per-field
  most-frequent-non-null merge across each duplicate cluster (the ER
  'golden record' step after dedup_cluster_components).
- ``model_bigram_lm_ppl``    — add-one-smoothed bigram LM trained
  in-engine, docs scored by average NLL in integer micro-nats (the
  bigram upgrade of curation_perplexity_filter, same one-rounding-per-
  distinct-ngram exactness discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.registry import query

# --------------------------------------------------------------------------
# 1. hard-negative mining for contrastive training
# --------------------------------------------------------------------------

ANCHOR_MOD = 50
N_HARD = 3     # in-bucket ranks 2..4 (rank 1 = the positive)
N_EASY = 3
EASY_POOL_MOD = 20  # easy negatives draw from a 5% hash-sampled pool

_COS_AC = (
    "round(list_dot_product(a.v, c.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(c.v, c.v))), 6)"
)


def _negatives_oracle() -> str:
    from nocouncil_etl_spark.plans.vectors_plans import _BUCKET_SQL

    return f"""
WITH b AS ({_BUCKET_SQL}),
anchors AS (SELECT * FROM b WHERE vec_id % {ANCHOR_MOD} = 0),
inbucket AS (
  SELECT a.vec_id AS anchor_id, c.vec_id AS cand_id, {_COS_AC} AS sim,
         row_number() OVER (
           PARTITION BY a.vec_id ORDER BY {_COS_AC} DESC, c.vec_id
         ) AS rnk
  FROM anchors a JOIN b c ON c.bucket = a.bucket AND c.vec_id <> a.vec_id
),
easy AS (
  SELECT a.vec_id AS anchor_id, c.vec_id AS cand_id, {_COS_AC} AS sim,
         row_number() OVER (
           PARTITION BY a.vec_id
           ORDER BY md5(CAST(a.vec_id AS VARCHAR) || '#' || CAST(c.vec_id AS VARCHAR)),
                    c.vec_id
         ) AS rnk
  FROM anchors a
  JOIN b c ON c.bucket <> a.bucket AND c.vec_id % {EASY_POOL_MOD} = 3
)
SELECT anchor_id, 'positive' AS role, cand_id, CAST(rnk AS BIGINT) AS rnk, sim
FROM inbucket WHERE rnk = 1
UNION ALL
SELECT anchor_id, 'hard_neg', cand_id, CAST(rnk AS BIGINT), sim
FROM inbucket WHERE rnk BETWEEN 2 AND {1 + N_HARD}
UNION ALL
SELECT anchor_id, 'easy_neg', cand_id, CAST(rnk AS BIGINT), sim
FROM easy WHERE rnk <= {N_EASY}
"""


@query("sample_hard_negatives", oracle=_negatives_oracle())
def sample_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training triplet mining: for each anchor (every
    {ANCHOR_MOD}th vector), the POSITIVE is its nearest in-bucket
    neighbor, HARD negatives are the next {N_HARD} in-bucket ranks (near
    misses — the gradient-rich negatives dense-retriever training needs),
    and EASY negatives are {N_EASY} hash-ordered draws from OUTSIDE the
    bucket (a deterministic stand-in for uniform sampling). Emits
    (anchor_id, role, cand_id, rnk, sim).

    Scale shape: the hard pool is a bucket-keyed equi-join (the LSH
    candidate shape — linear); the easy pool is broadcast(anchors) × a
    PRE-SAMPLED 1/{EASY_POOL_MOD} hash slice of the corpus (the
    production shape — uniform negatives never need the full corpus), so
    the ranked set is O(anchors·pool). The md5 presentation rank runs
    before any cosine: the interpreted fold-expression similarity is
    computed only for the {N_EASY} survivors per anchor (measured 17 s →
    2 s at sf1 the other way around)."""
    from nocouncil_etl_spark.functions.vectors import cosine
    from nocouncil_etl_spark.operators.similarity import attach_signature

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    b = attach_signature(e, "v")
    anchors = b.filter(F.col("vec_id") % ANCHOR_MOD == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("v").alias("av"),
        F.col("bucket").alias("abucket"),
    )
    sim = F.round(cosine("av", "v"), 6)

    hard_pool = (
        b.join(F.broadcast(anchors), F.col("bucket") == F.col("abucket"))
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select("anchor_id", F.col("vec_id").alias("cand_id"), sim.alias("sim"))
    )
    w_hard = Window.partitionBy("anchor_id").orderBy(
        F.desc("sim"), F.asc("cand_id")
    )
    ranked = hard_pool.withColumn("rnk", F.row_number().over(w_hard).cast("long"))
    pos = ranked.filter(F.col("rnk") == 1).withColumn("role", F.lit("positive"))
    hard = ranked.filter(F.col("rnk").between(2, 1 + N_HARD)).withColumn(
        "role", F.lit("hard_neg")
    )

    # easy pool: rank on the (codegen'd) md5 FIRST and compute the cosine
    # only for the N_EASY survivors — the fold-expression cosine is
    # interpreted (no codegen), so evaluating it on all anchors×corpus
    # pairs before the window was the round-5 "HOF cosine in the recall
    # evals" trap again (measured 17.3 s → ~2 s at sf1)
    easy_keys = (
        b.select("vec_id", "bucket")
        .filter(F.col("vec_id") % EASY_POOL_MOD == 3)
        .crossJoin(F.broadcast(anchors.select("anchor_id", "abucket")))
        .filter(F.col("bucket") != F.col("abucket"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("cand_id"),
            F.md5(
                F.concat(
                    F.col("anchor_id").cast("string"),
                    F.lit("#"),
                    F.col("vec_id").cast("string"),
                )
            ).alias("h"),
        )
    )
    w_easy = Window.partitionBy("anchor_id").orderBy("h", F.asc("cand_id"))
    easy = (
        easy_keys.withColumn("rnk", F.row_number().over(w_easy).cast("long"))
        .filter(F.col("rnk") <= N_EASY)
        .drop("h")
        .join(
            b.select(F.col("vec_id").alias("cand_id"), "v"), "cand_id"
        )
        .join(F.broadcast(anchors.select("anchor_id", "av")), "anchor_id")
        .select("anchor_id", "cand_id", sim.alias("sim"), "rnk")
        .withColumn("role", F.lit("easy_neg"))
    )
    cols = ["anchor_id", "role", "cand_id", "rnk", "sim"]
    return pos.select(cols).unionByName(hard.select(cols)).unionByName(
        easy.select(cols)
    )


# --------------------------------------------------------------------------
# 2. curriculum ordering
# --------------------------------------------------------------------------

CURR_T1 = 4_350_000   # avg token length in micro-chars — stage thresholds
CURR_T2 = 4_550_000
CURR_T3 = 4_750_000


@query(
    "curation_curriculum_order",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
diff AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tok,
         CAST((sum(len(term)) * 1000000) // count(*) AS BIGINT) AS difficulty_1e6
  FROM toks GROUP BY doc_id
),
staged AS (
  SELECT doc_id, n_tok, difficulty_1e6,
         CASE WHEN difficulty_1e6 <= {CURR_T1} THEN 1
              WHEN difficulty_1e6 <= {CURR_T2} THEN 2
              WHEN difficulty_1e6 <= {CURR_T3} THEN 3
              ELSE 4 END AS stage
  FROM diff
)
SELECT doc_id, n_tok, difficulty_1e6, stage,
       CAST(row_number() OVER (
         PARTITION BY stage
         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
       ) AS BIGINT) AS stage_order
FROM staged
""",
)
def curation_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Competence-based curriculum ordering: an integer difficulty score
    (average token length in micro-chars — a cheap proxy; swap in
    perplexity from curation_perplexity_filter for the real thing) maps
    each doc to a training stage by fixed VALUE thresholds (no global
    rank, so no global sort), and within a stage the presentation order
    is a deterministic md5 shuffle — the (stage, stage_order) pair is the
    exact feed order a curriculum dataloader would consume.

    Scale shape: one token agg per doc (map-side combined), a CASE, and a
    window PARTITIONED by stage. Value thresholds instead of quantile
    thresholds keep the plan shuffle-minimal; quantile staging would
    compose with curation_quantile_normalize_grid's sort-free grid."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    diff = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tok"),
        F.expr("CAST((sum(length(term)) * 1000000) div count(*) AS BIGINT)").alias(
            "difficulty_1e6"
        ),
    )
    staged = diff.withColumn(
        "stage",
        F.when(F.col("difficulty_1e6") <= CURR_T1, 1)
        .when(F.col("difficulty_1e6") <= CURR_T2, 2)
        .when(F.col("difficulty_1e6") <= CURR_T3, 3)
        .otherwise(4),
    )
    w = Window.partitionBy("stage").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return staged.select(
        "doc_id",
        "n_tok",
        "difficulty_1e6",
        "stage",
        F.row_number().over(w).cast("long").alias("stage_order"),
    )


# --------------------------------------------------------------------------
# 3. length-bucketed batching waste
# --------------------------------------------------------------------------

BUCKET_CAPS = [16, 32, 64, 128, 256, 512, 1024]


def _cap_case_sql() -> str:
    whens = " ".join(
        f"WHEN n_tok <= {c} THEN {c}" for c in BUCKET_CAPS
    )
    return f"CASE {whens} ELSE 2048 END"


@query(
    "pack_length_buckets",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
capped AS (SELECT doc_id, n_tok, {_cap_case_sql()} AS cap FROM toks),
bucketed AS (
  SELECT 'bucketed' AS strategy, CAST(cap AS BIGINT) AS cap,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS sum_tok
  FROM capped GROUP BY cap
),
singlecap AS (
  SELECT 'single' AS strategy,
         CAST((SELECT max(n_tok) FROM toks) AS BIGINT) AS cap,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tok) AS BIGINT) AS sum_tok
  FROM toks
)
SELECT strategy, cap, n_docs, sum_tok,
       cap * n_docs AS padded_tok,
       cap * n_docs - sum_tok AS waste_tok,
       CAST(((cap * n_docs - sum_tok) * 1000000) // (cap * n_docs) AS BIGINT)
         AS waste_pct_1e6
FROM (SELECT * FROM bucketed UNION ALL SELECT * FROM singlecap)
""",
)
def pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching arithmetic: docs land in the smallest
    power-of-two token bucket that fits; per bucket the query reports the
    padded token volume and the padding waste, next to the 'single'
    strategy (every doc padded to the global max) — the measured reason
    inference/training servers bucket by length before batching. Pure
    counting, exactly hash-checkable.

    Scale shape: one per-doc token count (narrow), one hash agg per
    strategy, one scalar global max. The bucket CASE is the same
    assignment a dataloader does per record — stateless, map-side."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    cap = F.lit(2048)
    for c in reversed(BUCKET_CAPS):
        cap = F.when(F.col("n_tok") <= c, c).otherwise(cap)
    capped = toks.withColumn("cap", cap.cast("long"))
    bucketed = capped.groupBy("cap").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_tok"),
    ).withColumn("strategy", F.lit("bucketed"))
    gmax = toks.agg(F.max("n_tok")).first()[0]  # one scalar
    single = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_tok"),
    ).select(
        F.lit("single").alias("strategy"),
        F.lit(int(gmax)).cast("long").alias("cap"),
        "n_docs",
        "sum_tok",
    )
    both = bucketed.select("strategy", "cap", "n_docs", "sum_tok").unionByName(
        single
    )
    return both.select(
        "strategy",
        "cap",
        "n_docs",
        "sum_tok",
        (F.col("cap") * F.col("n_docs")).alias("padded_tok"),
        (F.col("cap") * F.col("n_docs") - F.col("sum_tok")).alias("waste_tok"),
        F.expr(
            "CAST(((cap * n_docs - sum_tok) * 1000000) div (cap * n_docs) AS BIGINT)"
        ).alias("waste_pct_1e6"),
    )


# --------------------------------------------------------------------------
# 4. golden-record survivorship
# --------------------------------------------------------------------------

_GOLDEN_RECS = """
  SELECT doc_id AS rec_id, doc_id AS cluster_id, lang, source, n_chars
  FROM documents
  UNION ALL
  SELECT doc_id + 100000, doc_id, NULL, source, n_chars
  FROM documents
  UNION ALL
  SELECT doc_id + 200000, doc_id, lang, 'mirror', n_chars + 7
  FROM documents
"""


def _survive_sql(field: str) -> str:
    return f"""
SELECT cluster_id, {field} FROM (
  SELECT cluster_id, {field},
         row_number() OVER (
           PARTITION BY cluster_id ORDER BY count(*) DESC, {field}
         ) AS rn
  FROM recs WHERE {field} IS NOT NULL
  GROUP BY cluster_id, {field}
) WHERE rn = 1
"""


@query(
    "dedup_golden_record",
    oracle=f"""
WITH recs AS ({_GOLDEN_RECS}),
f_lang AS ({_survive_sql("lang")}),
f_source AS ({_survive_sql("source")}),
f_chars AS ({_survive_sql("n_chars")})
SELECT c.cluster_id, l.lang, s.source, n.n_chars,
       CAST(c.n_recs AS BIGINT) AS n_recs
FROM (SELECT cluster_id, count(*) AS n_recs FROM recs GROUP BY cluster_id) c
JOIN f_lang l USING (cluster_id)
JOIN f_source s USING (cluster_id)
JOIN f_chars n USING (cluster_id)
""",
)
def dedup_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship / golden-record merge — the step AFTER duplicate
    clustering (dedup_cluster_components finds the cluster;
    dedup_cluster_keep_best picks one ROW; this merges FIELDS): per
    cluster and per field, keep the most frequent non-null value, ties
    to the smallest. The synthesized feed has three versions per entity
    (original; a copy with lang lost; a mirror with altered source and
    n_chars+7), so majority voting provably restores the original field
    values. Emits one golden row per cluster.

    Scale shape: one hash agg per field keyed (cluster, value) with
    map-side combine, a window PARTITIONED by cluster, and keyed joins to
    reassemble — per-field cost is independent, no row-wise melt of the
    whole record."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    recs = (
        docs.select(
            F.col("doc_id").alias("rec_id"),
            F.col("doc_id").alias("cluster_id"),
            "lang",
            "source",
            "n_chars",
        )
        .unionByName(
            docs.select(
                (F.col("doc_id") + 100000).alias("rec_id"),
                F.col("doc_id").alias("cluster_id"),
                F.lit(None).cast("string").alias("lang"),
                "source",
                "n_chars",
            )
        )
        .unionByName(
            docs.select(
                (F.col("doc_id") + 200000).alias("rec_id"),
                F.col("doc_id").alias("cluster_id"),
                "lang",
                F.lit("mirror").alias("source"),
                (F.col("n_chars") + 7).alias("n_chars"),
            )
        )
    )

    def survive(field: str) -> DataFrame:
        w = Window.partitionBy("cluster_id").orderBy(
            F.desc("cnt"), F.asc(field)
        )
        return (
            recs.filter(F.col(field).isNotNull())
            .groupBy("cluster_id", field)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("cluster_id", field)
        )

    sizes = recs.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_recs")
    )
    return (
        sizes.join(survive("lang"), "cluster_id")
        .join(survive("source"), "cluster_id")
        .join(survive("n_chars"), "cluster_id")
        .select("cluster_id", "lang", "source", "n_chars", "n_recs")
    )


# --------------------------------------------------------------------------
# 5. bigram LM perplexity filter
# --------------------------------------------------------------------------

PPL2_FLAG_MICRO = 4_200_000  # flag docs with avg bigram NLL > 4.2 nats


@query(
    "model_bigram_lm_ppl",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, generate_subscripts(w, 1) AS pos, unnest(w) AS term
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
),
bigrams AS (
  SELECT a.doc_id, a.term AS w1, b.term AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n12 FROM bigrams GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1),
vocab AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS v FROM toks),
lm AS (
  SELECT c12.w1, c12.w2,
         CAST(round(-ln(CAST(n12 + 1 AS DOUBLE)
                        / (n1 + (SELECT v FROM vocab))) * 1000000) AS BIGINT)
           AS nll_micro
  FROM c12 JOIN c1 ON c12.w1 = c1.w1
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(l.nll_micro) AS BIGINT) AS nll_total_micro,
       CAST(sum(l.nll_micro) // count(*) AS BIGINT) AS avg_nll_micro,
       (sum(l.nll_micro) // count(*)) > {PPL2_FLAG_MICRO} AS flagged
FROM bigrams g JOIN lm l ON g.w1 = l.w1 AND g.w2 = l.w2
GROUP BY g.doc_id
""",
)
def model_bigram_lm_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-one-smoothed bigram LM trained on the corpus, scoring each doc
    by average bigram negative log-likelihood — the context-aware upgrade
    of curation_perplexity_filter's unigram filter (word-salad documents
    that pass a unigram filter fail a bigram one, because their
    TRANSITIONS are improbable). p(w2|w1) = (c(w1,w2)+1)/(c(w1)+V); each
    distinct bigram's −ln p quantizes ONCE to integer micro-nats, so
    per-doc sums are exact BIGINTs regardless of partitioning.

    Scale shape: bigram counts = one (doc,pos)-keyed self-join (or a
    2-shingle pass) + hash agg; the LM is bigram-vocab-sized and joins
    the instance stream broadcast; scoring is one per-doc integer agg.
    Linear end-to-end."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )
    a = toks.select("doc_id", "pos", F.col("term").alias("w1"))
    b = toks.select(
        "doc_id", (F.col("pos") - 1).alias("pos"), F.col("term").alias("w2")
    )
    bigrams = a.join(b, ["doc_id", "pos"]).select("doc_id", "w1", "w2")
    c12 = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n12")
    )
    c1 = c12.groupBy("w1").agg(F.sum("n12").cast("long").alias("n1"))
    v = toks.select("term").distinct().count()  # one scalar — vocab size
    lm = c12.join(c1, "w1").select(
        "w1",
        "w2",
        F.round(
            -F.log((F.col("n12") + 1).cast("double") / (F.col("n1") + v))
            * 1000000,
            0,
        )
        .cast("long")
        .alias("nll_micro"),
    )
    scored = bigrams.join(F.broadcast(lm), ["w1", "w2"])
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("nll_micro").cast("long").alias("nll_total_micro"),
        F.expr("CAST(sum(nll_micro) div count(*) AS BIGINT)").alias(
            "avg_nll_micro"
        ),
        (F.expr("sum(nll_micro) div count(*)") > PPL2_FLAG_MICRO).alias(
            "flagged"
        ),
    )
