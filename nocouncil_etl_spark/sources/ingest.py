"""Edge-ingestion framework (SURVEY.md §2.1 S5-S8).

Network boundaries (RSS polling at newscrawler.py:153-185, HTML scraping at
transcribe_council.py:28-73, article fetch at newscrawler.py:187-299, chunked
video download at transcribe_council.py:76-83) live in mapInPandas operators
over a seed table: one partition of seeds per task, fetcher runs inside the
executor, output is relational from there on. The fetcher is injected so
tests (and the oracle) use a deterministic fake; a production fetcher adds
retries + a token-bucket rate limit (the reference's time.sleep politeness,
T4) without changing the plan.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

FEED_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("published", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)

Fetcher = Callable[[str], list[dict]]


def fake_feed_fetcher(feed_url: str) -> list[dict]:
    """Deterministic RSS stand-in: N entries derived from the url."""
    n = (len(feed_url) % 3) + 2
    return [
        {
            "url": f"{feed_url}/article/{i}",
            "title": f"entry {i} of {feed_url}",
            "published": f"0{i + 1} Jan 2024 00:00:00 +0000",
        }
        for i in range(n)
    ]


def ingest_feeds(seeds: DataFrame, fetcher: Fetcher = fake_feed_fetcher) -> DataFrame:
    """S6: seed table (feed_url, source) → one row per feed entry.

    mapInPandas: each executor task fetches its partition of feeds; failures
    become error rows (skip-and-log, newscrawler.py:436-440), never stage
    failures. Politeness/rate limiting belongs inside the fetcher."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, seed in pdf.iterrows():
                try:
                    for e in fetcher(seed["feed_url"]):
                        rows.append(
                            (seed["source"], e["url"], e["title"], e["published"], None)
                        )
                except Exception as exc:
                    rows.append((seed["source"], seed["feed_url"], None, None, str(exc)))
            yield pd.DataFrame(
                rows, columns=["source", "url", "title", "published", "error"]
            )

    return seeds.mapInPandas(run, schema=FEED_SCHEMA)
