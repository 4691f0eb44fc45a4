"""Markdown + frontmatter corpus source (S3/S4, K3).

The reference writes one markdown file per article with a YAML-ish
frontmatter header (newscrawler.py:313-325,407-411) and re-parses the corpus
by globbing and string-splitting on '---' fences (article_vectorize.py:75-154).

Spark-first shape: `spark.read.text(..., wholetext=True)` + pure column
expressions (regex fence split + str_to_map) — the parse stays in codegen, no
Python per file. `input_file_name()` recovers the per-file identity the
reference keys on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from nocouncil_etl_spark.session import tune

# frontmatter: leading '---' fence, key: value lines, closing '---'
_FM_BLOCK = r"(?s)^---\n(.*?)\n---\n?"


def frontmatter_map(md: Column | str) -> Column:
    """Parse the frontmatter block into map<string,string>
    (article_vectorize.py:84-103: split on '---', then 'key: value' lines)."""
    block = F.regexp_extract(md, _FM_BLOCK, 1)
    # no frontmatter → empty block → str_to_map yields {'': null}; drop it
    return F.map_filter(
        F.str_to_map(block, F.lit("\n"), F.lit(": ")), lambda k, v: k != ""
    )


def frontmatter_body(md: Column | str) -> Column:
    """Document body = everything after the closing fence."""
    return F.regexp_replace(md, _FM_BLOCK, "")


def read_markdown_corpus(spark: SparkSession, glob: str) -> DataFrame:
    """S3: whole-file markdown scan → (path, frontmatter map, body).

    One row per file; at scale, millions of small files want
    spark.sql.files.maxPartitionBytes tuning or a compaction pass first."""
    tune(spark)
    raw = spark.read.text(glob, wholetext=True).withColumn(
        "path", F.input_file_name()
    )
    return raw.select(
        "path",
        frontmatter_map("value").alias("meta"),
        frontmatter_body("value").alias("body"),
    )


def render_markdown(meta_cols: dict[str, Column], body: Column) -> Column:
    """K3 inverse: render frontmatter + body back to markdown text
    (newscrawler.py:313-325). Write with df.write.partitionBy(...).text or a
    foreach writer for one-file-per-record layouts."""
    fm_lines = [F.concat(F.lit(f"{k}: "), v) for k, v in meta_cols.items()]
    return F.concat(
        F.lit("---\n"),
        F.concat_ws("\n", *fm_lines),
        F.lit("\n---\n"),
        body,
    )
