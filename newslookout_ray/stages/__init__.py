"""map_batches stages: URL filtering, article extraction, fingerprints."""
