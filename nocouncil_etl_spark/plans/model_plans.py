"""Model-op and multimodal queries (SURVEY.md §2.9 E1, E6-E9 + north-star
multimodal columns). Every model op runs its REAL Spark plumbing (Arrow
pandas_udf / mapInPandas, typed structs, error columns) with a deterministic
backend whose kernel the DuckDB oracle recomputes (SURVEY §5.2-2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import fan_out, load
from nocouncil_etl_spark.operators.models import (
    EMBED_DIM,
    MAX_QUOTES,
    QUOTE_MIN_LEN,
    SUMMARIZE_SCHEMA,
    SUMMARY_WORDS,
    TRANSCRIBE_SCHEMA,
    embed_text_udf,
    transcribe_map,
)
from nocouncil_etl_spark.operators.multimodal import (
    DECODE_SCHEMA,
    FEATURES_SCHEMA,
    FRAME_BYTES,
    RESIZE_MAX_DIM,
    RESIZE_SCHEMA,
    decode_map,
    features_map,
    frame_sample,
    resize_map,
    to_media_column,
)
from nocouncil_etl_spark.operators.treereduce import tree_reduce
from nocouncil_etl_spark.registry import query

EMBED_OUT_DIMS = 4  # report the first 4 dims; enough to pin the kernel


def _sql_embed_dim(d: int) -> str:
    comp = f"((('0x' || substr(md5('{d}|' || w), 1, 8))::BIGINT % 2000 - 1000) / 1000.0)"
    return f"list_reduce(list_transform(ws, w -> {comp}), (a, b) -> a + b)"


_EMBED_ORACLE = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
vec AS (
  SELECT doc_id, [{", ".join(_sql_embed_dim(d) for d in range(EMBED_DIM))}] AS v
  FROM t
),
n AS (
  SELECT doc_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS norm
  FROM vec
)
SELECT doc_id,
       {", ".join(f"round(v[{d + 1}] / norm, 6) AS e{d}" for d in range(EMBED_OUT_DIMS))}
FROM n
"""


@query("model_embed_hashproj", oracle=_EMBED_ORACLE)
def model_embed_hashproj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E1: batch text embedding through the REAL Arrow pandas_udf path with
    the deterministic hash-projection backend (prod backend = MiniLM
    per-executor singleton; reference vectorize.py:114-118). The oracle
    recomputes the kernel in SQL — this checks the UDF plumbing end-to-end."""
    docs = load(spark, sf_dir, "documents")
    emb = docs.select("doc_id", embed_text_udf("text").alias("v"))
    return emb.select(
        "doc_id",
        *[
            F.round(F.element_at("v", d + 1), 6).alias(f"e{d}")
            for d in range(EMBED_OUT_DIMS)
        ],
    )


@query(
    "model_summarize",
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
SELECT doc_id,
       array_to_string(ws[1:{SUMMARY_WORDS}], ' ') AS summary,
       coalesce(array_to_string(list_filter(ws, w -> length(w) >= {QUOTE_MIN_LEN})[1:{MAX_QUOTES}], '|'), '') AS quotes,
       CAST(len(ws) AS INT) AS n_words,
       CAST(NULL AS VARCHAR) AS error
FROM t
""",
)
def model_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: LLM-map summarize as mapInPandas with typed struct output and an
    error column (ChainOfThought(Summary) at summarize.py:77-89,131-133;
    skip-and-log at :185-186). Backend resolved from session conf
    (spark.nocouncil_etl_spark.llmBackend); the deterministic extractive stub
    is the default and the oracle path — the ollama production twin
    (summarize.py:160-163 surface) runs the identical plan."""
    from nocouncil_etl_spark.operators.backends import (
        LLM_STUB,
        llm_config,
        make_summarize_map,
        resolve_backend,
    )

    backend = resolve_backend(spark, "llmBackend", LLM_STUB)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = docs.mapInPandas(
        make_summarize_map(backend, llm_config(spark)), schema=SUMMARIZE_SCHEMA
    )
    return out.select(
        "doc_id",
        "summary",
        F.array_join("quotes", "|").alias("quotes"),
        "n_words",
        "error",
    )


@query(
    "model_extract_entities",
    oracle="""
WITH t AS (
  SELECT doc_id,
         text || ' docket ' || (doc_id % 50) || ' ref docket ' || (doc_id % 7) AS body
  FROM documents
)
SELECT doc_id,
       array_to_string(regexp_extract_all(body, 'docket ([0-9]+)', 1), ',') AS dockets
FROM t
""",
)
def model_extract_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7: entity extraction — deterministic regex fallback for the LLM
    signature extractors (docket/address patterns, summarize.py:27-55,122).
    Docket markers are synthesized so the extractor provably fires."""
    docs = load(spark, sf_dir, "documents")
    body = F.concat(
        "text",
        F.lit(" docket "),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(" ref docket "),
        (F.col("doc_id") % 7).cast("string"),
    )
    return docs.select(
        "doc_id",
        F.array_join(F.regexp_extract_all(body, F.lit("docket ([0-9]+)"), 1), ",").alias(
            "dockets"
        ),
    )


@query(
    "model_extract_entities_real",
    oracle="""
WITH t AS (
  SELECT doc_id,
         text || ' docket ' || (doc_id % 50) || ' ref docket ' || (doc_id % 7) AS body
  FROM documents
)
SELECT doc_id,
       array_to_string(regexp_extract_all(body, 'docket ([0-9]+)', 1), ',') AS dockets,
       CAST(NULL AS VARCHAR) AS error
FROM t
""",
)
def model_extract_entities_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7 through the REAL extraction seam: the same docket synthesis as
    model_extract_entities, but extraction runs in the mapInPandas kernel
    behind spark.nocouncil_etl_spark.llmBackend (stub = regex twin, the
    oracle path; ollama = LLM with regex-validated replies) — so the
    production swap is one conf flip with this query as its parity pin."""
    from nocouncil_etl_spark.operators.backends import (
        LLM_STUB,
        llm_config,
        make_extract_map,
        resolve_backend,
    )
    from nocouncil_etl_spark.operators.models import EXTRACT_SCHEMA

    backend = resolve_backend(spark, "llmBackend", LLM_STUB)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            "text",
            F.lit(" docket "),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(" ref docket "),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("text"),
    )
    return docs.mapInPandas(
        make_extract_map(backend, llm_config(spark)), schema=EXTRACT_SCHEMA
    )


@query(
    "model_tree_reduce",
    oracle="""
SELECT user_id, string_agg(event_type, ' ' ORDER BY ts, event_id) AS reduced
FROM events
GROUP BY user_id
""",
)
def model_tree_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8: hierarchical reduce with bounded fan-in (SURVEY §4.2-3) — the
    scale-safe form of summary-of-summaries (summarize.py:91-97,147). With an
    order-preserving associative combiner, levels of fan-in-4 reduces equal
    the single-pass ordered reduce, which is what the oracle computes."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    items = ev.select(
        "user_id",
        (F.row_number().over(w) - 1).alias("pos"),
        F.col("event_type").alias("val"),
    )
    return tree_reduce(items, key="user_id", pos="pos", value="val", fan_in=4).select(
        "user_id", F.col("val").alias("reduced")
    )


@query(
    "multimodal_decode",
    oracle=f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
       CAST(greatest(1, ceil(octet_length(encode(text)) / {FRAME_BYTES}.0)) AS INT) AS n_frames,
       lower(substr(hex(encode(text)), 1, 8)) AS head_hex,
       'decoded' AS status
FROM documents
""",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star multimodal: opaque binary column + typed metadata, decoded
    by an Arrow mapInPandas operator (real codecs stubbed — see
    operators/multimodal.py; the binaryFile analogue of .mp4 handling at
    transcribe_council.py:76-90)."""
    docs = load(spark, sf_dir, "documents")
    media = to_media_column(docs, "text", "doc_id")
    return media.select("doc_id", "content").mapInPandas(
        decode_map, schema=DECODE_SCHEMA
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         greatest(1, CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT)) AS nf
  FROM documents
)
SELECT doc_id, frame_id FROM (
  SELECT doc_id, CAST(unnest(range(0, nf)) AS INT) AS frame_id FROM m
) WHERE frame_id % 5 = 0
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star multimodal: frame sampling — explode frame indices from
    media metadata, keep every 5th. The explode/filter plan shape is the real
    video sampler; only the decode kernel is faked."""
    docs = fan_out(load(spark, sf_dir, "documents"))
    media = to_media_column(docs, "text", "doc_id")
    return frame_sample(media, every_n=5)


@query(
    "multimodal_transcribe",
    oracle=f"""
WITH m AS (
  SELECT doc_id, text,
         greatest(1, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT)) AS nseg
  FROM documents
),
segs AS (
  SELECT doc_id, text, CAST(unnest(range(0, nseg)) AS INT) AS seg_id FROM m
)
SELECT doc_id, seg_id,
       round(seg_id * CAST(2.5 AS DOUBLE), 2) AS start,
       round((seg_id + 1) * CAST(2.5 AS DOUBLE), 2) AS "end",
       substr(text, seg_id * 64 + 1, 64) AS seg_text
FROM segs
""",
)
def multimodal_transcribe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9: speech-to-text as a one-to-many mapInPandas over the binary media
    column → timed segment rows (Whisper at transcribe_council.py:86-90).
    Deterministic byte-window backend; ASCII-only corpus makes byte and char
    windows coincide for the oracle."""
    docs = load(spark, sf_dir, "documents")
    media = to_media_column(docs, "text", "doc_id")
    return media.select("doc_id", "content").mapInPandas(
        transcribe_map, schema=TRANSCRIBE_SCHEMA
    )


@query(
    "multimodal_resize",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS src_w,
         CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS src_h
  FROM documents
),
s AS (
  SELECT doc_id, src_w, src_h,
         greatest(src_w, src_h) AS long_side,
         least(greatest(src_w, src_h), {RESIZE_MAX_DIM}) AS scale_num
  FROM m
)
SELECT doc_id, src_w, src_h,
       CAST(greatest(1, (src_w * scale_num) // long_side) AS INT) AS out_w,
       CAST(greatest(1, (src_h * scale_num) // long_side) AS INT) AS out_h,
       'resized' AS status
FROM s
""",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star multimodal: aspect-preserving resize-to-fit as a
    mapInPandas op over binary media (the PIL-thumbnail contract with the
    pixel kernel stubbed — dims derive deterministically from the bytes so
    the oracle recomputes them). Integer math only."""
    docs = load(spark, sf_dir, "documents")
    media = to_media_column(docs, "text", "doc_id")
    return media.select("doc_id", "content").mapInPandas(
        resize_map, schema=RESIZE_SCHEMA
    )


@query(
    "multimodal_features",
    oracle=f"""
WITH b AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         list_transform(string_split(text, ''), c -> unicode(c)) AS codes
  FROM documents
)
SELECT doc_id, byte_len,
       round(CAST(list_aggregate(codes, 'sum') AS DOUBLE) / byte_len, 4) AS mean_byte,
       CAST(list_aggregate(codes, 'max') AS INT) AS max_byte,
       CAST(greatest(1, ceil(byte_len / {FRAME_BYTES}.0)) AS INT) AS n_frames
FROM b
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star multimodal: feature extraction over the binary column —
    exact integer byte stats leave the Arrow kernel; the derived mean is
    rounded JVM-side (the parity-tested engine pair). ASCII corpus ⇒ the
    oracle recomputes bytes as character codes."""
    docs = load(spark, sf_dir, "documents")
    media = to_media_column(docs, "text", "doc_id")
    feats = media.select("doc_id", "content").mapInPandas(
        features_map, schema=FEATURES_SCHEMA
    )
    return feats.select(
        "doc_id",
        "byte_len",
        F.round(F.col("sum_bytes").cast("double") / F.col("byte_len"), 4).alias(
            "mean_byte"
        ),
        "max_byte",
        "n_frames",
    )


PHASH_HAM_MAX = 4


@query(
    "multimodal_phash_neardup",
    oracle="""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 400000, substr(text, 1, 9) || 'z' || substr(text, 11)
  FROM documents WHERE doc_id % 9 = 0
),
bs AS (
  SELECT doc_id,
         list_transform(range(0, 32),
           i -> (unicode(substr(text,
                 CAST((i * length(text)) // 32 AS INT) + 1, 1)) * 131) % 256)
           AS b
  FROM aug
),
h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(1, 33),
           i -> CASE WHEN 32 * b[i] >= list_sum(b)
                     THEN (1::BIGINT << (i - 1)) ELSE 0 END)) AS BIGINT)
           AS ahash
  FROM bs
),
keyed AS (
  SELECT doc_id, ahash, k, (ahash >> (8 * k)) & 255 AS band
  FROM (SELECT doc_id, ahash, unnest([0, 1, 2, 3]) AS k FROM h)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
  FROM keyed a
  JOIN keyed b ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 4
""",
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-duplicate detection by perceptual hash: an Arrow kernel
    computes a 32-bit average-hash signature per media row (bit j = byte j
    ≥ mean — on real images this is the classic aHash over the resized
    gray grid; the fake backend hashes the raw bytes so the oracle can
    replay it), then hamming-LSH banding (4 × 8-bit bands) turns the
    all-pairs comparison into equi-joins and bit_count(xor) confirms
    hamming ≤ {PHASH_HAM_MAX}. Near-dup media are synthesized (one byte
    overwritten in every 9th doc) so the detector provably fires — the
    image sibling of dedup_simhash's text pipeline.

    Scale shape: one narrow Arrow pass for signatures; candidates only
    ever meet through a band bucket (no pair explosion); the hamming
    confirm is one codegen'd bit op per candidate pair."""
    from nocouncil_etl_spark.operators.multimodal import ahash_map, to_media_column

    docs = fan_out(load(spark, sf_dir, "documents")).select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 400000).alias("doc_id"),
        F.concat(
            F.substring("text", 1, 9), F.lit("z"), F.expr("substr(text, 11)")
        ).alias("text"),
    )
    aug = docs.unionByName(copies)
    media = to_media_column(aug, "text", "doc_id")
    h = media.select("doc_id", "content").mapInPandas(
        ahash_map, schema="doc_id long, ahash long"
    )
    keyed = h.select(
        "doc_id",
        "ahash",
        F.explode(F.array([F.lit(k) for k in range(4)])).alias("k"),
    ).withColumn("band", F.expr("(ahash >> (8 * k)) & 255"))
    a = keyed.select(
        F.col("doc_id").alias("id_a"), F.col("ahash").alias("ha"), "k", "band"
    )
    b = keyed.select(
        F.col("doc_id").alias("id_b"), F.col("ahash").alias("hb"),
        F.col("k").alias("k_b"), F.col("band").alias("band_b"),
    )
    pairs = (
        a.join(
            b,
            (F.col("k") == F.col("k_b"))
            & (F.col("band") == F.col("band_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int").alias(
                "hamming"
            ),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= PHASH_HAM_MAX)


@query(
    "multimodal_vad_segments",
    oracle="""
WITH pos AS (
  SELECT doc_id, unnest(range(1, length(text) + 1)) AS p, text FROM documents
),
fr AS (
  SELECT doc_id, CAST((p - 1) // 30 AS BIGINT) AS frame_id,
         CAST(sum((unicode(substr(text, p, 1)) * 131) % 256) AS BIGINT)
           AS energy,
         count(*) AS flen
  FROM pos GROUP BY doc_id, (p - 1) // 30
),
voiced AS (
  SELECT doc_id, frame_id,
         CASE WHEN energy >= 130 * flen THEN 1 ELSE 0 END AS v
  FROM fr
),
isl AS (
  SELECT doc_id, frame_id, v,
         CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) OVER (
           PARTITION BY doc_id ORDER BY frame_id
         ) AS BIGINT) AS grp
  FROM voiced
)
SELECT doc_id, grp AS seg_id,
       min(frame_id) AS start_frame, max(frame_id) AS end_frame,
       count(*) AS n_frames
FROM isl WHERE v = 1
GROUP BY doc_id, grp
""",
)
def multimodal_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection over media frames — the segmentation step
    that precedes transcription (the reference feeds whole .mp4s to
    Whisper; at scale you VAD first and transcribe only voiced segments):
    an Arrow kernel emits per-frame energies (short-time RMS on real
    audio; scrambled-byte sums under the fake backend so the oracle can
    replay them), a threshold marks voiced frames, and gaps-and-islands
    merges consecutive voiced frames into segments. Integer energies and
    the mean-threshold-as-product comparison (energy ≥ 130·flen) keep
    everything exact.

    Scale shape: one narrow Arrow pass fanning out to frames (bounded by
    payload bytes / {30}); one doc-keyed window for the islands; one
    segment agg. No shuffle carries more than one row per frame."""
    from nocouncil_etl_spark.operators.multimodal import (
        frame_energy_map,
        to_media_column,
    )
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    media = to_media_column(docs, "text", "doc_id")
    fr = media.select("doc_id", "content").mapInPandas(
        frame_energy_map,
        schema="doc_id long, frame_id long, energy long, flen long",
    )
    voiced = fr.select(
        "doc_id",
        "frame_id",
        F.when(F.col("energy") >= 130 * F.col("flen"), 1).otherwise(0).alias("v"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    isl = voiced.withColumn(
        "grp", F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).over(w)
    )
    return (
        isl.filter(F.col("v") == 1)
        .groupBy("doc_id", F.col("grp").alias("seg_id"))
        .agg(
            F.min("frame_id").alias("start_frame"),
            F.max("frame_id").alias("end_frame"),
            F.count(F.lit(1)).alias("n_frames"),
        )
    )


SHOT_DELTA = 400  # energy jump that counts as a cut


@query(
    "multimodal_shot_boundaries",
    oracle=f"""
WITH pos AS (
  SELECT doc_id, unnest(range(1, length(text) + 1)) AS p, text FROM documents
),
fr AS (
  SELECT doc_id, CAST((p - 1) // 30 AS BIGINT) AS frame_id,
         CAST(sum((unicode(substr(text, p, 1)) * 131) % 256) AS BIGINT)
           AS energy
  FROM pos GROUP BY doc_id, (p - 1) // 30
),
d AS (
  SELECT doc_id, frame_id,
         abs(energy - lag(energy) OVER (
           PARTITION BY doc_id ORDER BY frame_id)) AS delta
  FROM fr
)
SELECT doc_id,
       CAST(count(*) FILTER (WHERE delta > {SHOT_DELTA}) AS BIGINT)
         AS n_cuts,
       CAST(count(*) AS BIGINT) AS n_frames
FROM d GROUP BY doc_id
""",
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over media frames: a cut is a frame whose
    energy jumps by more than {SHOT_DELTA} from its predecessor — the
    frame-DELTA sibling of VAD's absolute threshold (on real video this
    is the histogram-difference detector feeding the frame sampler so
    keyframes land on shots, not mid-pan). Same Arrow frame-energy kernel,
    one lag window per doc, integer deltas throughout.

    Scale shape: frame fan-out bounded by payload/30; one doc-keyed
    window + agg."""
    from nocouncil_etl_spark.operators.multimodal import (
        frame_energy_map,
        to_media_column,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    media = to_media_column(docs, "text", "doc_id")
    fr = media.select("doc_id", "content").mapInPandas(
        frame_energy_map,
        schema="doc_id long, frame_id long, energy long, flen long",
    )
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    d = fr.select(
        "doc_id",
        F.abs(F.col("energy") - F.lag("energy").over(w)).alias("delta"),
    )
    return d.groupBy("doc_id").agg(
        F.count(F.when(F.col("delta") > SHOT_DELTA, 1)).cast("long").alias(
            "n_cuts"
        ),
        F.count(F.lit(1)).cast("long").alias("n_frames"),
    )
