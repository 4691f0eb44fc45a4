"""Order-independent numeric aggregation kernels.

Floating-point addition is not associative: Spark's partial+final aggregation
combines partition sums in a nondeterministic order, so ``round(sum(double),
2)`` can land on either side of a .005 boundary run-to-run (observed as the
``rollup_timeseries`` driver hash flake in round 1). The fix: quantize each
addend to DECIMAL before summing — decimal addition is exact, hence
order-independent — then round and cast back to DOUBLE for a stable,
oracle-comparable value. The DuckDB oracle applies the identical quantization
(``rsum_sql`` et al.) so both engines fold bit-identical sums.

At 100 TB this matters more, not less: more partitions → more combine orders →
more chances for a float sum to straddle a rounding boundary. Decimal sums are
still partial+final hash aggregates under whole-stage codegen (Spark's
Decimal(≤18+10 digits) arithmetic is long-backed), so the plan shape is
unchanged — only the accumulator type widens.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Quantization grid: 6 fractional digits, |x| < 1e12 per addend. Spark widens
# the sum accumulator to DECIMAL(28,6) automatically (no overflow until 1e22).
DEC = "decimal(18,6)"


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def exact_sum(col) -> Column:
    """sum(x) with each addend quantized to DECIMAL(18,6) — exact and
    order-independent. Returns the decimal sum (callers round + cast)."""
    return F.sum(_col(col).cast(DEC))


def rsum(col, digits: int = 2) -> Column:
    """round(sum(x), digits) with order-independent accumulation; DOUBLE out.
    SQL twin: rsum_sql."""
    return F.round(exact_sum(col), digits).cast("double")


def ravg(col, digits: int = 4) -> Column:
    """round(avg(x), digits) where the numerator is the exact decimal sum, so
    both engines divide identical doubles. count(x) matches avg's null
    semantics. SQL twin: ravg_sql."""
    c = _col(col)
    return F.round(exact_sum(c).cast("double") / F.count(c), digits)


def rstddev(col, digits: int = 4) -> Column:
    """round(stddev_samp(x), digits) from exact decimal moments
    (sum x, sum x², n): both engines evaluate the same closed form over
    identical exact sums, so the result is order-independent. SQL twin:
    rstddev_sql."""
    c = _col(col)
    n = F.count(c).cast("double")
    s1 = exact_sum(c).cast("double")
    s2 = F.sum((c * c).cast(DEC)).cast("double")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1.0))
    return F.round(F.sqrt(var), digits)


def rsum_sql(expr: str, digits: int = 2) -> str:
    """DuckDB twin of rsum (same quantization grid)."""
    return f"CAST(round(sum(CAST(({expr}) AS DECIMAL(18,6))), {digits}) AS DOUBLE)"


def ravg_sql(expr: str, digits: int = 4) -> str:
    """DuckDB twin of ravg."""
    return (
        f"round(CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
        f" / count({expr}), {digits})"
    )


def rstddev_sql(expr: str, digits: int = 4) -> str:
    """DuckDB twin of rstddev (same moment formula over the same exact sums)."""
    n = f"CAST(count({expr}) AS DOUBLE)"
    s1 = f"CAST(sum(CAST(({expr}) AS DECIMAL(18,6))) AS DOUBLE)"
    s2 = f"CAST(sum(CAST((({expr}) * ({expr})) AS DECIMAL(18,6))) AS DOUBLE)"
    return f"round(sqrt((({s2}) - ({s1}) * ({s1}) / ({n})) / (({n}) - 1.0)), {digits})"
