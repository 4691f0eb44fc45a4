"""Backend-switch seam (operators/backends.py): the production model paths
must build the SAME Spark plan as the deterministic defaults — only the
executor-side kernel differs — and must be constructible without the model
packages (import-guarded; execution tests skip when packages are absent).
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from nocouncil_etl_spark.operators.backends import (
    EMBED_HASH,
    EMBED_ST,
    TRANSCRIBE_FAKE,
    TRANSCRIBE_WHISPER,
    make_embed_udf,
    make_transcribe_map,
    resolve_backend,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    # strip the udf symbol names + plan ids; the shape is what must match
    p = re.sub(r"embed_\w+", "embed_X", buf.getvalue())
    return re.sub(r"\(\d+\)|#\d+[L]?", "", p)


def test_embed_plan_identity_across_backends(spark, sf_dir):
    """Stub↔real plan identity: swapping the backend changes zero plan nodes
    (one ArrowEvalPython over text → array<double>). Building the real
    backend's plan needs no model package — loading is lazy, per executor,
    at first batch."""
    from nocouncil_etl_spark.io import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    plans = {
        b: _plan(docs.select(make_embed_udf(b)("text").alias("v")))
        for b in (EMBED_HASH, EMBED_ST)
    }
    assert plans[EMBED_HASH] == plans[EMBED_ST]
    assert "ArrowEvalPython" in plans[EMBED_HASH]


def test_embed_unknown_backend_rejected():
    with pytest.raises(ValueError, match="unknown embed backend"):
        make_embed_udf("bert-but-misspelled")
    with pytest.raises(ValueError, match="unknown transcribe backend"):
        make_transcribe_map("wisper")


def test_backend_resolution_from_conf(spark):
    assert resolve_backend(spark, "embedBackend", EMBED_HASH) == EMBED_HASH
    spark.conf.set("spark.nocouncil_etl_spark.embedBackend", EMBED_ST)
    try:
        assert resolve_backend(spark, "embedBackend", EMBED_HASH) == EMBED_ST
    finally:
        spark.conf.unset("spark.nocouncil_etl_spark.embedBackend")


def test_transcribe_fake_backend_is_default_kernel(spark, sf_dir):
    from nocouncil_etl_spark.operators.models import transcribe_map

    assert make_transcribe_map(TRANSCRIBE_FAKE) is transcribe_map


def test_extract_html_fake_and_cascade(spark):
    """The stdlib rung extracts deterministically; the cascade degrades to
    the first AVAILABLE extractor (trafilatura/bs4 absent in this image →
    'builtin' wins) with per-row quarantine instead of stage failure. Plan
    identity fake↔cascade: one MapInPandas either way."""
    from nocouncil_etl_spark.operators.backends import (
        HTML_EXTRACT_CASCADE,
        HTML_EXTRACT_FAKE,
        HTML_EXTRACT_SCHEMA,
        make_extract_html_map,
        strip_tags,
    )

    html = (
        "<html><head><style>p{color:red}</style></head>"
        "<body><script>var x=1;</script><p>Hello &amp; <b>world</b></p>"
        "<!-- c --></body></html>"
    )
    assert strip_tags(html) == "Hello & world"

    df = spark.createDataFrame(
        [(1, html), (2, None), (3, "")], "doc_id long, html string"
    )
    for backend in (HTML_EXTRACT_FAKE, HTML_EXTRACT_CASCADE):
        rows = {
            r.doc_id: r
            for r in df.mapInPandas(
                make_extract_html_map(backend), HTML_EXTRACT_SCHEMA
            ).collect()
        }
        if backend == HTML_EXTRACT_FAKE:
            # the stdlib rung is fully deterministic
            assert rows[1].extractor == "builtin"
            assert rows[1].content == "Hello & world"
        else:
            # cascade: whichever rung is installed wins (trafilatura may
            # decline short fragments and fall through); the contract is
            # first-SUCCESS-wins with non-empty output
            assert rows[1].extractor in ("trafilatura", "bs4", "builtin")
            assert rows[1].content
        assert rows[1].error is None
        assert rows[2].extractor == "none" and rows[2].error is None

    plans = {
        b: _plan(df.mapInPandas(make_extract_html_map(b), HTML_EXTRACT_SCHEMA))
        for b in (HTML_EXTRACT_FAKE, HTML_EXTRACT_CASCADE)
    }
    assert plans[HTML_EXTRACT_FAKE] == plans[HTML_EXTRACT_CASCADE]

    with pytest.raises(ValueError, match="unknown html extract backend"):
        make_extract_html_map("lynx")


def test_embed_st_execution_matches_contract(spark):
    """Real-model execution: normalized 384-d vectors. Skips unless
    sentence-transformers is installed (not in this image)."""
    st = pytest.importorskip("sentence_transformers")  # noqa: F841
    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    row = df.select(make_embed_udf(EMBED_ST)("text").alias("v")).first()
    assert len(row.v) == 384
    assert abs(sum(x * x for x in row.v) - 1.0) < 1e-6


def test_transcribe_whisper_builds_without_package(spark):
    """Constructing the whisper mapInPandas (and its plan) must not import
    whisper; only execution does."""
    fn = make_transcribe_map(TRANSCRIBE_WHISPER)
    df = spark.createDataFrame([(1, b"bytes")], "doc_id long, content binary")
    from nocouncil_etl_spark.operators.models import TRANSCRIBE_SCHEMA

    out = df.mapInPandas(fn, schema=TRANSCRIBE_SCHEMA)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "seg_id", "start", "end", "seg_text",
    ]
