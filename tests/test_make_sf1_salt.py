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


def _cname_expr() -> str:
    """The customer-name salt expression as the script interpolates it."""
    with open(SCRIPT, encoding="utf-8") as fh:
        src = fh.read()
    m = re.search(r'V = "([^"]+)"', src)
    assert m, "make_sf1.py no longer defines the V tail expression"
    v = m.group(1)
    return (
        "CASE WHEN i.i = 0 THEN c_name ELSE "
        "substr(c_name, 1, len(c_name) - 4) || "
        f"chr(CAST(97 + ({v} // 17576) % 26 AS INTEGER)) || "
        f"chr(CAST(97 + ({v} // 676) % 26 AS INTEGER)) || "
        f"chr(CAST(97 + ({v} // 26) % 26 AS INTEGER)) || "
        f"chr(CAST(97 + {v} % 26 AS INTEGER)) END"
    )


def test_salt_customer_name_is_injective_over_names_and_replicas():
    """c_name salt (verdict #3): length-preserving, prefix untouched
    through the dirty-twin mutation zone, and INJECTIVE over
    (name, replica) — a single-char Caesar left only 54k distinct of 150k
    at sf1 (100 digit×replica combos can't fit 26 letters), which planted
    spurious exact-name agreements in join_record_linkage_fs. The 4-digit
    tail → base-26(tail + 10000·i) encoding never collides for i ≤ 25."""
    expr = _cname_expr()
    rows = duckdb.connect().execute(
        f"SELECT c_name AS src, i.i, {expr} AS salted "
        "FROM (SELECT 'Customer#' || lpad(CAST(k AS VARCHAR), 9, '0') AS c_name "
        "      FROM (SELECT unnest(range(990, 1010)) AS k)), "
        "(SELECT unnest(range(0, 26)) AS i) i"
    ).fetchall()
    salted = [r[2] for r in rows]
    assert len(set(salted)) == len(salted)  # fully injective
    for src, i, s in rows:
        assert len(s) == 18
        assert s[:14] == src[:14]  # mutation zone + prefix untouched
        if i == 0:
            assert s == src
        else:
            assert s[-4:].isalpha()  # never collides with replica 0 digits


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
def test_salt_expressions_actually_interpolated():
    """The SHIFT (documents.text) and V (customer.c_name) expressions are
    actually interpolated into the SALTED entries — a refactor that inlines
    a divergent copy would silently decouple the salts from these tests."""
    with open(SCRIPT, encoding="utf-8") as fh:
        src = fh.read()
    assert src.count("{SHIFT}") == 1
    assert src.count("{V}") == 4
