"""round_close.advice_dispositions matching rules (round-10 ADVICE #3):
the old path-substring rule let ONE status line satisfy TWO advisor items
anchored in the same file, so the gate could false-pass an undispositioned
item. The fixed matcher consumes each status line at most once — exact
path:line anchors first, then path-only for drifted line numbers.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_round_close(monkeypatch, tmp_path, advice: str, status: str | None):
    spec = importlib.util.spec_from_file_location(
        "round_close_under_test", os.path.join(REPO, "scripts", "round_close.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = spec.loader.exec_module(mod) or mod
    (tmp_path / "ADVICE.md").write_text(advice, encoding="utf-8")
    if status is not None:
        (tmp_path / "ADVICE_STATUS.md").write_text(status, encoding="utf-8")
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    return mod


TWO_SAME_FILE = (
    "# ADVICE\n"
    "- **low** pkg/io.py:10 — first problem.\n"
    "  _fix one._\n"
    "- **low** pkg/io.py:55 — second problem.\n"
    "  _fix two._\n"
)


def test_one_line_cannot_satisfy_two_items_in_same_file(monkeypatch, tmp_path):
    mod = _load_round_close(
        monkeypatch,
        tmp_path,
        TWO_SAME_FILE,
        "- `pkg/io.py` (first problem) — **FIXED**: done.\n",
    )
    problems = mod.advice_dispositions()
    assert len(problems) == 1
    assert "pkg/io.py:55" in problems[0] or "pkg/io.py:10" in problems[0]


def test_two_lines_satisfy_two_items_in_same_file(monkeypatch, tmp_path):
    mod = _load_round_close(
        monkeypatch,
        tmp_path,
        TWO_SAME_FILE,
        "- `pkg/io.py` (first problem) — **FIXED**: done.\n"
        "- `pkg/io.py` (second problem) — **ACCEPTED**: documented.\n",
    )
    assert mod.advice_dispositions() == []


def test_exact_anchor_wins_over_path_fallback(monkeypatch, tmp_path):
    """A status line carrying the exact path:line anchor is consumed by
    THAT bullet, so the path-only fallback still has a line left for the
    other item."""
    mod = _load_round_close(
        monkeypatch,
        tmp_path,
        TWO_SAME_FILE,
        "- `pkg/io.py:55` — **STALE**: superseded.\n"
        "- `pkg/io.py` (drifted line) — **FIXED**: done.\n",
    )
    assert mod.advice_dispositions() == []


def test_missing_status_file_reports(monkeypatch, tmp_path):
    mod = _load_round_close(monkeypatch, tmp_path, TWO_SAME_FILE, None)
    problems = mod.advice_dispositions()
    assert len(problems) == 1 and "missing" in problems[0]


def test_continuation_lines_without_keyword_do_not_count(monkeypatch, tmp_path):
    """Only lines carrying FIXED/STALE/ACCEPTED participate — prose lines
    mentioning the path must not satisfy a bullet."""
    mod = _load_round_close(
        monkeypatch,
        tmp_path,
        TWO_SAME_FILE,
        "- `pkg/io.py` — **FIXED**: done.\n"
        "  see pkg/io.py for the helper this replaced.\n",
    )
    assert len(mod.advice_dispositions()) == 1
