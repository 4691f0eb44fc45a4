"""Edge sources & sinks (SURVEY.md §2.1 S1-S10, §2.2 K1-K6).

Network-edge ingestion (RSS, HTML scrape, HTTP fetch — S5-S8) is modeled as
mapInPandas UDFs over a seed table; everything downstream of the edge is
relational. File formats (JSONL, JSON array, markdown corpus, binary) are
first-class readers here.
"""
