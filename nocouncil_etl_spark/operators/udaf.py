"""Custom aggregate surface (SURVEY.md §2.11): vector mean-pooling as an
applyInPandas UDAF, plus a Python UDTF for frontmatter parsing.

Mean-pooling chunk embeddings into a document embedding is the grouped
aggregate the reference implies when it embeds per-chunk summaries and
queries at meeting granularity. GROUPED_AGG pandas UDFs cannot return
arrays, so the canonical shape is applyInPandas: one group in → one pooled
row out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mean_pool(
    df: DataFrame, key: str, vec_col: str, out_dims: int
) -> DataFrame:
    """Per-key mean of vector columns, order-independent: components are
    quantized to the DECIMAL(18,6) grid (×1e6 → int64) and summed exactly,
    so the pooled mean is identical whatever order rows reach the group —
    the applyInPandas analogue of functions.numeric's decimal sums, and the
    same grid the SQL oracle uses. Quantization is HALF_UP like the oracle's
    DECIMAL cast (np.round is half-even: a component landing on a .5e-6
    boundary would pool differently from the oracle)."""
    schema = f"{key} long, " + ", ".join(f"p{i} double" for i in range(out_dims))

    def pool(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
        # exact integer micro-grid, HALF_UP (away from zero) at .5 boundaries
        q = (np.sign(mat) * np.floor(np.abs(mat) * 1e6 + 0.5)).astype(np.int64)
        pooled = (q.sum(axis=0) / 1e6) / len(q)
        row = {key: pdf[key].iloc[0]}
        row.update({f"p{i}": float(pooled[i]) for i in range(out_dims)})
        return pd.DataFrame([row])

    return df.select(F.col(key), F.col(vec_col)).groupBy(key).applyInPandas(
        pool, schema=schema
    )


try:  # Python UDTF (Spark 3.5+): one markdown blob in → (key, value) rows out
    from pyspark.sql.functions import udtf

    @udtf(returnType="key string, value string")
    class FrontmatterUDTF:
        """S4 as a table function (SURVEY §2.11): yields one row per
        frontmatter key — the UDTF twin of sources/markdown.frontmatter_map."""

        def eval(self, md: str):  # noqa: D102
            if not md or not md.startswith("---\n"):
                return
            end = md.find("\n---", 4)
            if end < 0:
                return
            for line in md[4:end].split("\n"):
                if ": " in line:
                    k, v = line.split(": ", 1)
                    yield k, v

    HAS_UDTF = True
except Exception:  # pragma: no cover - older Spark
    FrontmatterUDTF = None
    HAS_UDTF = False
