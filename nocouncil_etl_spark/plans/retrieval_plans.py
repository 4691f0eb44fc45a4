"""Retrieval & trained-text-classifier batch: BM25 ranking and a
distributedly-trained Naive Bayes language classifier.

- ``text_bm25_search`` — Okapi BM25 (Lucene idf variant) for a fixed
  keyword query over the document corpus: the lexical half of hybrid
  retrieval (``pipeline_rag_e2e`` covers the dense half; production RAG
  fuses both). TF-IDF (text_corpus_plans) ranks terms per document; BM25
  ranks documents per query with length normalization and tf saturation.
- ``model_naive_bayes_lang`` — a multinomial Naive Bayes language
  classifier TRAINED inside the engine (vocabulary selection → per-class
  token counts → smoothed log-likelihoods) and evaluated on the corpus,
  emitting the confusion matrix. The companion to ``eval_lang_id_kappa``:
  that grades a fixed heuristic, this trains the model itself as
  distributed aggregates — the pattern for any bag-of-words scorer at
  100 TB (quality classifiers, topic gates, spam filters).

Exactness contract shared by both: every score is Σ (integer tf) ×
(6dp-quantized DECIMAL log term) — ln() runs on exact rationals (identical
doubles both engines → identical 6dp rounding, the established libm-parity
grid), and DECIMAL sums are combine-order-independent, so a 1000-way
shuffle cannot flicker a ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.registry import query

_TOK_SPARK = "filter(split(lower(text), '[^a-z0-9]+'), t -> t != '')"
_TOK_SQL = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),"
    " t -> length(t) > 0)"
)

QUERY_TERMS = ("spark", "query", "window", "stream", "vector")
K1, B = 1.2, 0.75
BM25_TOP = 20

NB_VOCAB = 50  # vocabulary size (top document-frequency terms)


# --------------------------------------------------------------------------
# 1. BM25
# --------------------------------------------------------------------------

_QT = ", ".join(f"'{t}'" for t in QUERY_TERMS)


def _bm25_per_doc(docs: DataFrame) -> DataFrame:
    """(doc_id, dl, tfs: array<struct<term,tf>>) — one row per non-empty
    doc, computed ROW-LOCALLY: dl = size(tokens), tf(term) =
    size(filter(tokens, = term)). Exactly the integers the explode +
    groupBy shape produced (a doc with zero tokens had no dl row there,
    so dl > 0 filters them identically), with zero shuffle. The token
    array is aliased once in its own projection; CollapseProject keeps
    multi-referenced non-trivial aliases, so tokenization runs once per
    row, not once per consumer expression."""
    toked = docs.select("doc_id", F.expr(_TOK_SPARK).alias("toks"))
    tfs = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.size(
                    F.filter(F.col("toks"), lambda x: x == F.lit(t))
                )
                .cast("long")
                .alias("tf"),
            )
            for t in QUERY_TERMS
        ]
    )
    return toked.select(
        "doc_id", F.size("toks").cast("long").alias("dl"), tfs.alias("tfs")
    ).filter(F.col("dl") > 0)


@query(
    "text_bm25_search",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK_SQL}) AS term FROM documents
),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
meta AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len
  FROM dl
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term IN ({_QT}) GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(round(
           ln(1.0 + ((SELECT n_docs FROM meta) - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * ({K1} + 1.0))
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.dl
              * (SELECT n_docs FROM meta) / CAST((SELECT total_len FROM meta) AS DOUBLE))),
           6) AS DECIMAL(18, 6)) AS part
  FROM tf JOIN df ON tf.term = df.term JOIN dl ON tf.doc_id = dl.doc_id
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hit_terms,
       CAST(sum(part) AS DOUBLE) AS bm25
FROM scored GROUP BY doc_id
ORDER BY sum(part) DESC, doc_id LIMIT {BM25_TOP}
""",
)
def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 over the corpus for the fixed query {QUERY_TERMS}:
    idf = ln(1 + (N − df + ½)/(df + ½)) (Lucene's non-negative variant),
    tf saturation k1={K1}, length normalization b={B} against the exact
    corpus mean length (kept as the rational dl·N/total_len so both engines
    divide identical integers). Per-(doc, term) parts quantize to
    DECIMAL(18,6) before the per-doc sum — order-independent, so ranking
    ties are impossible to flip by combine order; final order (score desc,
    doc_id) is total.

    Scale shape (r11 opt): tokenization is ONE narrow pass with NO explode
    and NO doc-keyed shuffle — dl is size(tokens) and each query term's tf
    is size(filter(tokens, = term)), all computed row-locally (guide §2.4:
    remove shuffles outright; the old shape exploded the full token stream
    twice and shuffled it by doc_id for dl and by (doc_id, term) for tf).
    The compact per-doc frame (doc_id, dl, ≤|Q| tf structs — no text) is
    pinned once and feeds meta, df and the scoring join, so the corpus is
    tokenized exactly once per run instead of once per consumer. df is |Q|
    rows (broadcast); TakeOrderedAndProject caps the result."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    # r12 (r11 verdict item 8): one-shot pin → recoverable persist (lineage
    # kept, so an executor loss recomputes the tokenize pass instead of
    # killing the job; localCheckpoint stays reserved for iterative graph
    # state). Materialized once so meta/df/scoring can't race the cache
    # fill; caller-owned cache, cleared per query by the harness.
    per_doc = _bm25_per_doc(docs).persist()
    per_doc.count()
    meta = per_doc.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    tf = (
        per_doc.select("doc_id", "dl", F.explode("tfs").alias("x"))
        .select("doc_id", "dl", "x.term", "x.tf")
        .filter(F.col("tf") > 0)
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    j = tf.join(F.broadcast(df), "term").crossJoin(F.broadcast(meta))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + K1 * (
        1.0
        - B
        + B
        * F.col("dl")
        * F.col("n_docs")
        / F.col("total_len").cast("double")
    )
    part = F.round(idf * (F.col("tf") * (K1 + 1.0)) / norm, 6).cast(
        "decimal(18,6)"
    )
    scored = j.select("doc_id", part.alias("part"))
    out = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
        F.sum("part").alias("bm25_dec"),
    )
    return (
        out.orderBy(F.desc("bm25_dec"), "doc_id")
        .limit(BM25_TOP)
        .select("doc_id", "n_hit_terms", F.col("bm25_dec").cast("double").alias("bm25"))
    )


# --------------------------------------------------------------------------
# 2. Naive Bayes language classifier (train + evaluate)
# --------------------------------------------------------------------------


@query(
    "model_naive_bayes_lang",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, lang, unnest({_TOK_SQL}) AS term FROM documents
),
vocab AS (
  SELECT term FROM (
    SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
  ) ORDER BY df DESC, term LIMIT {NB_VOCAB}
),
cls AS (SELECT lang AS c, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1),
meta AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM cls),
cnt AS (
  SELECT t.lang AS c, t.term, CAST(count(*) AS BIGINT) AS cf
  FROM tok t JOIN vocab v USING (term) GROUP BY 1, 2
),
tot AS (SELECT c, CAST(sum(cf) AS BIGINT) AS tot FROM cnt GROUP BY c),
model AS (
  SELECT cl.c, v.term,
         CAST(round(ln((coalesce(cnt.cf, 0) + 1.0)
                       / (tot.tot + {NB_VOCAB}.0)), 6) AS DECIMAL(18, 6)) AS logp
  FROM cls cl CROSS JOIN vocab v
  JOIN tot ON tot.c = cl.c
  LEFT JOIN cnt ON cnt.c = cl.c AND cnt.term = v.term
),
prior AS (
  SELECT c, CAST(round(ln(n_docs / CAST((SELECT n_total FROM meta) AS DOUBLE)), 6)
                 AS DECIMAL(18, 6)) AS logprior
  FROM cls
),
doctf AS (
  SELECT t.doc_id, any_value(t.lang) AS actual, t.term, CAST(count(*) AS BIGINT) AS tf
  FROM tok t JOIN vocab v USING (term) GROUP BY t.doc_id, t.term
),
docscore AS (
  SELECT d.doc_id, any_value(d.actual) AS actual, m.c,
         CAST(sum(d.tf * m.logp) AS DECIMAL(28, 6)) + any_value(p.logprior) AS score
  FROM doctf d JOIN model m ON m.term = d.term
  JOIN prior p ON p.c = m.c
  GROUP BY d.doc_id, m.c
),
pred AS (
  SELECT doc_id, actual,
         min(CASE WHEN rn = 1 THEN c END) AS predicted
  FROM (
    SELECT doc_id, actual, c,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, c) AS rn
    FROM docscore
  ) GROUP BY doc_id, actual
)
SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n_docs
FROM pred GROUP BY 1, 2
""",
)
def model_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained and evaluated inside the engine:
    top-{NB_VOCAB}-df vocabulary, Laplace-smoothed per-class token
    log-likelihoods, doc score = log prior + Σ tf·logp (all DECIMAL — see
    module contract), argmax with (score desc, class) tie-break, confusion
    matrix out. Docs with no vocabulary token drop (no evidence either
    engine could score).

    Scale shape: training is two hash-aggs (class-term counts: ≤|langs|·V
    groups) + a broadcast-sized model table (|langs|·V rows); scoring joins
    each doc's ≤V tf rows against the broadcast model — per-doc cost is
    O(hit terms · classes), never corpus×vocab. The same shape at 100 TB:
    the model is always broadcastable because V is chosen, not data-sized.

    r11 opt (guide §2.3/§2.4): the corpus is tokenized ONCE — the exploded
    token stream collapses immediately to the per-(doc, term) count table
    ``tokdf`` (one map-side-combined shuffle), which is pinned and then
    feeds all three former consumers: vocabulary df = count(*) per term
    over tokdf (≡ countDistinct(doc_id) over raw tokens), class-term
    counts cf = sum(tf) grouped by (lang, term) (≡ count(*) over raw
    tokens), and the per-doc scoring tf rows. The old shape ran the
    explode + shuffle three times."""
    # fan_out ONCE and pin: docs feed class counts, n_total and the token
    # pass — pinning the compact fanned docs costs one small shuffle +
    # cache instead of one repartition per consumer
    # r12 (r11 verdict item 8): both one-shot pins → recoverable persists
    # (lineage kept; docs.count() below materializes docs and n_total in
    # one job, tokdf materializes once before its three consumers)
    docs = fan_out(load(spark, sf_dir, "documents")).persist()
    tok = docs.select(
        "doc_id", "lang", F.explode(F.expr(_TOK_SPARK)).alias("term")
    )
    tokdf = (
        tok.groupBy("doc_id", "term")
        .agg(
            F.any_value("lang").alias("actual"),
            F.count(F.lit(1)).cast("long").alias("tf"),
        )
        .persist()
    )
    tokdf.count()
    vocab = (
        tokdf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "term")
        .limit(NB_VOCAB)
        .select("term")
    )
    cls = docs.groupBy(F.col("lang").alias("c")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    n_total = docs.count()
    cnt = (
        tokdf.join(F.broadcast(vocab), "term")
        .groupBy(F.col("actual").alias("c"), "term")
        .agg(F.sum("tf").cast("long").alias("cf"))
    )
    tot = cnt.groupBy("c").agg(F.sum("cf").cast("long").alias("tot"))
    model = (
        cls.crossJoin(F.broadcast(vocab))
        .join(tot, "c")
        .join(cnt, ["c", "term"], "left")
        .select(
            "c",
            "term",
            F.round(
                F.log(
                    (F.coalesce(F.col("cf"), F.lit(0)) + 1.0)
                    / (F.col("tot") + float(NB_VOCAB))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("logp"),
        )
    )
    prior = cls.select(
        "c",
        F.round(F.log(F.col("n_docs") / F.lit(float(n_total))), 6)
        .cast("decimal(18,6)")
        .alias("logprior"),
    )
    doctf = tokdf.join(F.broadcast(vocab), "term")
    docscore = (
        doctf.join(F.broadcast(model), "term")
        .join(F.broadcast(prior), "c")
        .groupBy("doc_id", "c")
        .agg(
            F.any_value("actual").alias("actual"),
            (
                F.sum(F.col("tf") * F.col("logp")).cast("decimal(28,6)")
                + F.any_value("logprior")
            ).alias("score"),
        )
    )
    # argmax by (score desc, c asc) as ONE partial-aggregable hash agg:
    # min(struct(-score, c)) picks the largest score, then the smallest
    # class — identical to the former row_number window + groupBy pair,
    # without the per-doc sort or the extra pass (guide §2.3: aggregate
    # before you shuffle; DECIMAL negation is exact)
    pred = docscore.groupBy("doc_id").agg(
        F.any_value("actual").alias("actual"),
        F.min(F.struct((-F.col("score")).alias("ns"), F.col("c")))["c"].alias(
            "predicted"
        ),
    )
    return pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
