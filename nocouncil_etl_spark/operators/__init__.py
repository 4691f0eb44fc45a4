"""Composite DataFrame operators — reusable building blocks behind the query
catalog (top-k similarity, LSH bucketing, minhash dedup, tree reduce, ...)."""
