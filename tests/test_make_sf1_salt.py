"""scripts/make_sf1.py replica-salt properties (round-10 ADVICE #2 +
verdict #3): the Caesar letter shift must be non-identity and
pairwise-distinct across every replica index the script accepts, and the
customer linkage-key salt must perturb the blocking suffix while
preserving length and the prefix-5 agreement zone.

The r10 formula (effective shift 3i+22 mod 26) was ≡0 at i=10: running
with copies > 10 silently reintroduced bit-identical text replicas —
exactly the quadratic near-dup-pair artifact the salting exists to remove.
These tests read the SHIFT expression out of the script itself so a future
edit can't drift away from the pinned properties.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import duckdb
import pytest

SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "make_sf1.py",
)


def _shift_expr() -> str:
    with open(SCRIPT, encoding="utf-8") as fh:
        src = fh.read()
    m = re.search(r'SHIFT = "([^"]+)"', src)
    assert m, "make_sf1.py no longer defines the SHIFT salt expression"
    return m.group(1)


def test_salt_shift_injective_and_nonzero_over_accepted_range():
    """Effective letter shift for i in 1..25: never identity (every ≥2-char
    word differs from the source) and pairwise-distinct (replicas differ
    from EACH OTHER — cross-replica near-dup pairs stay organic)."""
    shift = _shift_expr()
    rows = duckdb.connect().execute(
        f"SELECT chr(CAST(97 + (ord('a') + {shift}) % 26 AS INTEGER)) "
        "FROM (SELECT unnest(range(1, 26)) AS i) i"
    ).fetchall()
    chars = [r[0] for r in rows]
    assert "a" not in chars, "identity shift: a replica equals the source"
    assert len(set(chars)) == 25, "colliding shifts: two replicas identical"


def test_salt_customer_name_perturbs_blocking_suffix_only():
    """c_name salt (verdict #3): length-preserving, prefix-5 intact, last
    char (inside join_record_linkage_fs's name-4-suffix blocking key)
    differs per replica — so sf1 linkage blocks are per-replica instead of
    10× verbatim-copy inflated."""
    shift = _shift_expr()
    expr = (
        "substr(c_name, 1, len(c_name) - 1) || "
        f"chr(CAST(97 + (ord(substr(c_name, len(c_name), 1)) + {shift}) "
        "% 26 AS INTEGER))"
    )
    rows = duckdb.connect().execute(
        f"SELECT i.i, {expr} FROM (SELECT 'Customer#000000001' AS c_name), "
        "(SELECT unnest(range(1, 26)) AS i) i"
    ).fetchall()
    names = [r[1] for r in rows]
    assert all(len(n) == 18 for n in names)
    assert all(n.startswith("Customer#") for n in names)
    assert all(n != "Customer#000000001" for n in names)
    assert len(set(n[-1] for n in names)) == 25


def test_copies_over_cap_fails_fast(tmp_path):
    """copies > 26 exhausts the 25 distinct nonzero Caesar shifts; the
    script must refuse instead of silently emitting duplicate replicas."""
    proc = subprocess.run(
        [sys.executable, SCRIPT, str(tmp_path / "out"), "27"],
        capture_output=True,
        text=True,
    )
    assert proc.returncode != 0
    assert "26 copies" in proc.stderr or "26 copies" in proc.stdout


@pytest.mark.skipif(
    not os.path.exists("/root/testdata/sf0.1"), reason="sf0.1 source absent"
)
def test_shift_matches_script_usage():
    """The SHIFT expression is actually interpolated into both SALTED
    entries (documents.text and customer.c_name) — a refactor that inlines
    a divergent copy would silently decouple the two salts."""
    with open(SCRIPT, encoding="utf-8") as fh:
        src = fh.read()
    assert src.count("{SHIFT}") == 2
