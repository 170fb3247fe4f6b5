"""newslookout_ray — a Ray-Data-native crawl / extract / NLP data engine.

A from-scratch reimplementation of the capabilities of
``sandeep-sandhu/NewsLookout`` (reference at ``/root/reference``) on top of
``ray.data.Dataset``: a sharded URL frontier with a cuckoo-filter URL-seen
set, per-host politeness scheduling, fetch simulation against a Parquet
"web" (Common-Crawl-style pages table), article extraction and text
cleaning expressed as ``map_batches`` transforms over zero-copy Arrow
batches, plus the large-scale training-data operators (dedup, similarity
search, text analysis) such an engine needs at 100 TB scale.

Layout:
  functions/  pure scalar kernel libraries (byte-exact text + URL ops)
  sources/    synthetic pages corpus, RSS/CSV/date-pattern URL sources
  stages/     map_batches stages (filters, extraction, fingerprints)
  state/      stateful actors (cuckoo seen-set shards)
  pipelines/  crawl round loop, reference-semantics simulator, dedup,
              similarity, text-stats pipelines

None of this package calls ``ray.init`` — the caller owns the session.
"""

__version__ = "0.1.0"
