"""Sources: the synthetic Common-Crawl-style pages corpus and the
reference's auxiliary URL sources (RSS, date-pattern generators,
aggregator CSV)."""
