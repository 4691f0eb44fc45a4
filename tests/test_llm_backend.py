"""LLM backend seam (E6/E7/E8, operators/backends.py): the ollama production
twin must build the SAME Spark plan as the deterministic stub, be
constructible with no server running, quarantine per-row on failure, and —
exercised against a local fake ollama HTTP server — speak the reference's
config surface (summarize.py:160-163: model, temperature, max_tokens, base
URL) correctly.
"""

from __future__ import annotations

import contextlib
import io
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from nocouncil_etl_spark.operators.backends import (
    LLM_OLLAMA,
    LLM_STUB,
    LlmConfig,
    llm_config,
    make_extract_map,
    make_reduce_combine,
    make_summarize_map,
    ollama_chat,
)
from nocouncil_etl_spark.operators.models import (
    EXTRACT_SCHEMA,
    SUMMARIZE_SCHEMA,
    extract_map,
    summarize_map,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = re.sub(r"(summarize|extract|llm)_\w+", "kernel_X", buf.getvalue())
    return re.sub(r"\(\d+\)|#\d+[L]?", "", p)


# --- fake ollama server -------------------------------------------------------


class _FakeOllama(BaseHTTPRequestHandler):
    """Minimal /api/chat: echoes a canned reply and records request bodies."""

    protocol_version = "HTTP/1.1"  # keep-alive, like real ollama
    requests: list[dict] = []
    fail_next = 0

    def _reply(self, status: int, payload: bytes):
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_POST(self):  # noqa: N802
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).requests.append(body)
        if type(self).fail_next > 0:
            type(self).fail_next -= 1
            self._reply(500, b"boom")
            return
        prompt = body["messages"][0]["content"]
        if "docket" in prompt.split("\n")[0]:
            content = "The dockets are 42 and 7."
        else:
            content = json.dumps(
                {"summary": "a fine document", "quotes": ["q1", "q2"]}
            )
        self._reply(
            200,
            json.dumps(
                {"message": {"role": "assistant", "content": content}}
            ).encode(),
        )

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def fake_ollama():
    _FakeOllama.requests = []
    _FakeOllama.fail_next = 0
    # threading server: each executor worker keeps its own live connection
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeOllama)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield LlmConfig(base_url=f"http://127.0.0.1:{srv.server_port}", timeout=5.0)
    finally:
        srv.shutdown()


# --- seam contract ------------------------------------------------------------


def test_stub_is_default_kernel():
    assert make_summarize_map(LLM_STUB) is summarize_map
    assert make_extract_map(LLM_STUB) is extract_map


def test_unknown_backend_rejected():
    for fn in (make_summarize_map, make_extract_map, make_reduce_combine):
        with pytest.raises(ValueError, match="unknown llm backend"):
            fn("lama")


def test_llm_config_from_conf(spark):
    base = llm_config(spark)
    assert base == LlmConfig()  # reference defaults: summarize.py:160-163
    spark.conf.set("spark.nocouncil_etl_spark.llm.model", "llama3.1")
    spark.conf.set("spark.nocouncil_etl_spark.llm.temperature", "0.7")
    try:
        cfg = llm_config(spark)
        assert cfg.model == "llama3.1" and cfg.temperature == 0.7
        assert cfg.max_tokens == 20000
    finally:
        spark.conf.unset("spark.nocouncil_etl_spark.llm.model")
        spark.conf.unset("spark.nocouncil_etl_spark.llm.temperature")


def test_summarize_plan_identity_across_backends(spark, sf_dir):
    """Swapping stub↔ollama changes zero plan nodes (one MapInPandas);
    building the ollama plan needs no server."""
    from nocouncil_etl_spark.io import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    plans = {
        b: _plan(
            docs.mapInPandas(make_summarize_map(b), schema=SUMMARIZE_SCHEMA)
        )
        for b in (LLM_STUB, LLM_OLLAMA)
    }
    assert plans[LLM_STUB] == plans[LLM_OLLAMA]
    assert "MapInPandas" in plans[LLM_STUB]


def test_extract_stub_matches_jvm_regex_query(spark):
    """The stub extract kernel is the deterministic twin of the JVM regex
    path used by the model_extract_entities oracle."""
    df = spark.createDataFrame(
        [(1, "see docket 42 and docket 7"), (2, "no numbers here"), (3, None)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.dockets, r.error)
        for r in df.mapInPandas(make_extract_map(LLM_STUB), EXTRACT_SCHEMA).collect()
    }
    assert got == {1: ("42,7", None), 2: ("", None), 3: ("", None)}


# --- HTTP execution against the fake server -----------------------------------


def test_ollama_chat_speaks_reference_config_surface(fake_ollama):
    cfg = LlmConfig(
        base_url=fake_ollama.base_url, model="llama3.2",
        temperature=0.001, max_tokens=20000, timeout=5.0,
    )
    out = ollama_chat(cfg, "hello")
    assert "summary" in out
    req = _FakeOllama.requests[-1]
    assert req["model"] == "llama3.2"
    assert req["stream"] is False
    assert req["options"] == {"temperature": 0.001, "num_predict": 20000}


def test_ollama_summarize_execution_and_parse(spark, fake_ollama):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "four five")], "doc_id long, text string"
    )
    rows = {
        r.doc_id: r
        for r in df.mapInPandas(
            make_summarize_map(LLM_OLLAMA, fake_ollama), SUMMARIZE_SCHEMA
        ).collect()
    }
    assert rows[1].summary == "a fine document"
    assert rows[1].quotes == ["q1", "q2"]
    assert rows[1].n_words == 3
    assert rows[1].error is None


def test_ollama_extract_regex_validates_reply(spark, fake_ollama):
    df = spark.createDataFrame([(1, "about docket stuff")], "doc_id long, text string")
    row = df.mapInPandas(
        make_extract_map(LLM_OLLAMA, fake_ollama), EXTRACT_SCHEMA
    ).first()
    # the fake replies "The dockets are 42 and 7." — regex-validated to ints
    assert row.dockets == "42,7"
    assert row.error is None


def test_ollama_failure_quarantines_per_row(spark, fake_ollama):
    """HTTP 500 rows land in the error column; later rows still succeed.
    A dead server (no listener at all) quarantines too, never fails the stage."""
    _FakeOllama.fail_next = 1  # non-2xx is not retried — it fails row 1 only
    df = spark.createDataFrame(
        [(1, "fails"), (2, "works")], "doc_id long, text string"
    ).coalesce(1)
    rows = {
        r.doc_id: r
        for r in df.mapInPandas(
            make_summarize_map(LLM_OLLAMA, fake_ollama), SUMMARIZE_SCHEMA
        ).collect()
    }
    assert rows[1].error is not None and "500" in rows[1].error
    assert rows[2].error is None

    dead = LlmConfig(base_url="http://127.0.0.1:1", timeout=2.0)
    row = (
        spark.createDataFrame([(9, "x")], "doc_id long, text string")
        .mapInPandas(make_summarize_map(LLM_OLLAMA, dead), SUMMARIZE_SCHEMA)
        .first()
    )
    assert row.error is not None


def test_ollama_tree_reduce_combiner_merges(spark, fake_ollama):
    """E8: the LLM combiner merges ≤fan_in partials per call (bounded
    prompts); LLM failure degrades to the deterministic join."""
    from nocouncil_etl_spark.operators.treereduce import tree_reduce

    df = spark.createDataFrame(
        [("k", i, f"part{i}") for i in range(6)], "key string, pos long, val string"
    )
    out = tree_reduce(
        df, key="key", pos="pos", value="val", fan_in=4,
        combine=make_reduce_combine(LLM_OLLAMA, fake_ollama),
    ).first()
    assert out.val  # merged summary (fake server returns the canned JSON text)
    merge_reqs = [
        r for r in _FakeOllama.requests
        if "Merge these partial summaries" in r["messages"][0]["content"]
    ]
    assert merge_reqs, "combiner never called the LLM"
    # bounded fan-in: no merge prompt carries more than fan_in parts
    for r in merge_reqs:
        n_parts = len(re.findall(r"part\d", r["messages"][0]["content"]))
        assert n_parts <= 4
