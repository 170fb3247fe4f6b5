"""Pipelines: the crawl round loop, the sequential reference-semantics
simulator (oracle), and the training-data pipelines (dedup, similarity,
text stats)."""
