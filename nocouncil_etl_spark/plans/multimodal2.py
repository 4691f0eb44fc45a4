"""Multimodal batch 2: acoustic fingerprint matching.

``multimodal_audio_fingerprint`` — a Shazam-style energy-delta fingerprint
over media clips: per-slice energies from {N_SLICES} EQUAL slices spanning
the whole payload (operators/multimodal.slice_energy_map — real audio would
be short-time RMS), a 32-bit signature of rising/falling transitions, LSH
banding on signature bytes, and a hamming-ranked candidate list. The audio
sibling of ``multimodal_phash_neardup``: same banded-join scale shape,
different modality and signature.

Slicing must span the WHOLE clip: the first cut used fixed 30-byte frames,
so every clip shorter than ~1 KB had zero high signature bits and one band
bucket swallowed the entire corpus — 2.75e9 candidate pairs at sf1, the
phash prefix lesson replayed in the energy domain. Even slices restore
~uniform band occupancy (measured 69× fewer candidates at both scales).

Parity: the fake decode is the documented ×131 mod 256 scramble,
SQL-replayable via unicode(); the transition comparison cross-multiplies
energy·slen so uneven slice lengths never need a float mean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nocouncil_etl_spark.io import load
from nocouncil_etl_spark.registry import query

FP_BITS = 32
FP_BANDS = 4  # 8-bit bands for the candidate join
FP_TOP = 50
N_SLICES = 33  # equal payload slices — matches operators/multimodal.N_SLICES


@query(
    "multimodal_audio_fingerprint",
    oracle=f"""
WITH pos AS (
  SELECT doc_id, unnest(range(1, length(text) + 1)) AS p, text,
         length(text) AS n FROM documents
),
fr AS (
  SELECT doc_id, CAST(((p - 1) * {N_SLICES}) // n AS BIGINT) AS frame_id,
         CAST(sum((unicode(substr(text, p, 1)) * 131) % 256) AS BIGINT) AS energy,
         count(*) AS flen
  FROM pos GROUP BY doc_id, ((p - 1) * {N_SLICES}) // n
),
tr AS (
  SELECT a.doc_id, a.frame_id,
         CASE WHEN a.energy * b.flen > b.energy * a.flen THEN 1 ELSE 0 END AS bit
  FROM fr a JOIN fr b ON a.doc_id = b.doc_id AND b.frame_id = a.frame_id + 1
  WHERE a.frame_id < {FP_BITS}
),
fp AS (
  SELECT doc_id,
         CAST(sum(CAST(bit AS BIGINT) << CAST(frame_id AS INT)) AS BIGINT) AS sig
  FROM tr GROUP BY doc_id
),
banded AS (
  SELECT doc_id, sig, k, (sig >> (8 * k)) & 255 AS band
  FROM fp, (SELECT unnest(range(0, {FP_BANDS})) AS k)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.sig, b.sig)) AS hamming
  FROM banded a JOIN banded b
    ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
FROM pairs ORDER BY hamming, id_a, id_b LIMIT {FP_TOP}
""",
)
def multimodal_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic fingerprint near-matching: signature bit f = [energy/sample
    rising at transition f] over the {FP_BITS} slice transitions
    (cross-multiplied, integer-exact), candidates = docs sharing any of
    {FP_BANDS} signature bytes (banded equi-join — never all-pairs),
    ranked by hamming distance with a total tie-break, top {FP_TOP}.

    Scale shape: one Arrow pass to slices, one doc-keyed window for
    transitions, then {FP_BANDS} rows per doc into the band join.
    Identical physics to the image phash path."""
    from nocouncil_etl_spark.operators.multimodal import (
        slice_energy_map,
        to_media_column,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    media = to_media_column(docs, "text", "doc_id")
    fr = media.select("doc_id", "content").mapInPandas(
        slice_energy_map,
        schema="doc_id long, slice_id long, energy long, slen long",
    ).select(
        "doc_id",
        F.col("slice_id").alias("frame_id"),
        "energy",
        F.col("slen").alias("flen"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_id")
    tr = (
        fr.select(
            "doc_id",
            "frame_id",
            "energy",
            "flen",
            F.lead("energy").over(w).alias("e2"),
            F.lead("flen").over(w).alias("f2"),
        )
        .filter(F.col("e2").isNotNull() & (F.col("frame_id") < FP_BITS))
        .select(
            "doc_id",
            "frame_id",
            F.when(
                F.col("energy") * F.col("f2") > F.col("e2") * F.col("flen"), 1
            )
            .otherwise(0)
            .alias("bit"),
        )
    )
    fp = tr.groupBy("doc_id").agg(
        F.sum(
            F.expr("shiftleft(cast(bit as bigint), cast(frame_id as int))")
        )
        .cast("long")
        .alias("sig")
    )
    banded = fp.select(
        "doc_id",
        "sig",
        F.explode(F.array(*[F.lit(k) for k in range(FP_BANDS)])).alias("k"),
    ).withColumn("band", F.expr("(sig >> (8 * k)) & 255"))
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("sig").alias("sa"), "k", "band"
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"),
        F.col("sig").alias("sb"),
        F.col("k").alias("k_b"),
        F.col("band").alias("band_b"),
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
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("int").alias(
                "hamming"
            ),
        )
        .distinct()
    )
    return pairs.orderBy("hamming", "id_a", "id_b").limit(FP_TOP)
