"""Bounded-fan-in tree reduce (SURVEY.md §4.2-3, E8).

The reference's summary-of-summaries concatenates ALL chunk summaries into
one LLM call (summarize.py:91-97,147) — unbounded fan-in that breaks on long
meetings. The engine reduces in levels: each level groups at most ``fan_in``
items per key and combines them (order-preserving), iterating until one row
per key. Each level is a standard groupBy plan; the loop lives in driver
code, not in a custom operator.

For an associative, order-preserving combiner (string concat here; an LLM
reduce in production) the result equals the single-pass reduce, which is what
the SQL oracle computes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tree_reduce(
    df: DataFrame,
    key: str,
    pos: str,
    value: str,
    fan_in: int = 4,
    combine: Callable[[Column], Column] | None = None,
    max_levels: int = 30,
) -> DataFrame:
    """Reduce ``value`` per ``key`` in ``pos`` order, ≤ ``fan_in`` per call.

    ``combine`` maps an ordered array column of values to one value; the
    default joins with a single space.
    """
    if combine is None:
        combine = lambda arr: F.array_join(arr, " ")  # noqa: E731

    # level count is known up front: ceil(log_fan_in(max group size)). One
    # cheap count job here replaces an isEmpty() driver round-trip per level.
    max_n = (
        df.groupBy(key).count().agg(F.max("count").alias("m")).first()["m"] or 0
    )
    levels, n = 0, int(max_n)
    while n > 1 and levels < max_levels:
        n = -(-n // fan_in)  # ceil-div
        levels += 1

    out = df.select(key, F.col(pos).cast("long").alias(pos), value)
    for _ in range(levels):
        # one reduce level: bucket consecutive items, combine each bucket
        w = Window.partitionBy(key).orderBy(pos)
        leveled = out.withColumn("_rn", F.row_number().over(w) - 1).withColumn(
            "_bucket", F.floor(F.col("_rn") / fan_in)
        )
        ordered_vals = F.transform(
            F.array_sort(F.collect_list(F.struct(pos, value))), lambda s: s[value]
        )
        out = leveled.groupBy(key, "_bucket").agg(
            combine(ordered_vals).alias(value), F.min(pos).alias(pos)
        ).select(key, pos, value)
    return out.select(key, value)
