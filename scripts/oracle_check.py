"""Driver-contract simulator: run entry() + every queries() entry against
oracle_sql() via DuckDB, exactly like the verification driver.

Usage: python scripts/oracle_check.py [sf_dir] [query_name ...]
(default sf0.01, all queries; name args filter to a subset for fast iteration)
Prints per-query status only on failure; final line is ALL MATCH or FAILED.
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def c(v):
        if v is None:
            return "N"
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(c(x) for x in v) + "]"
        return str(v)

    lines = sorted("|".join(c(r[i]) for i in order) for r in rows)
    return sorted(cols), hashlib.sha256("\n".join(lines).encode()).hexdigest()[:12]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    # deliberately a plain session (the driver owns its own; tune() must
    # cope) — except for driver heap: a single session running the FULL
    # 370+-query catalog accumulates the documented caller-owned caches
    # (pagerank/HITS/LPA/etc.) and broadcast remnants, and the 1g default
    # heap OOMs ~270 queries in. The per-query clearCache below is the
    # structural fix; the heap bump is insurance for the marathon run.
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    smoke = entrymod.entry(spark).collect()
    print(f"smoke: {len(smoke)} rows")
    assert len(smoke) > 0

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    if only:
        missing = only - set(qs)
        assert not missing, f"unknown queries: {missing}"
        qs = {k: v for k, v in qs.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = []
    for name, fn in qs.items():
        try:
            sdf = fn(spark, sf_dir)
            scols, sh = digest(list(sdf.columns), [tuple(r) for r in sdf.collect()])
            if name in osql:
                res = con.execute(osql[name])
                dcols, dh = digest([d[0] for d in res.description], res.fetchall())
                ok = sh == dh and scols == dcols
                if not ok:
                    print(f"{name}: MISMATCH spark={sh} oracle={dh} cols={scols == dcols}")
            else:
                ok = sdf.count() >= 0
        except Exception as exc:  # noqa: BLE001
            ok = False
            print(f"{name}: EXC {str(exc)[:140]}")
        if not ok:
            bad.append(name)
        # queries are independent: drop any cache a query left behind
        # (several iterative operators hand a persisted frame to the
        # caller by contract) so session memory stays flat across the
        # whole catalog
        spark.catalog.clearCache()

    if bad:
        print("FAILED:", bad)
        return 1
    print(f"ALL MATCH — {len(qs)} queries at {sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
