"""Pure-kernel tests for the frontier scale demo's lazy synthesizer
(scripts/frontier_scale_demo.py) — determinism, schema, skew shape.
No Ray session needed: the synth is a plain batch fn."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from frontier_scale_demo import synth_frontier_batch  # noqa: E402

from newslookout_ray.pipelines.crawl import FRONTIER_SCHEMA  # noqa: E402


def _batch(ids):
    return pa.table({"id": pa.array(ids, pa.int64())})


def test_schema_matches_frontier():
    out = synth_frontier_batch(_batch(range(100)), n_hosts=50, zipf_a=1.5)
    assert out.schema.names == list(FRONTIER_SCHEMA.names)
    for name in FRONTIER_SCHEMA.names:
        assert out[name].type == FRONTIER_SCHEMA.field(name).type, name


def test_deterministic_and_partition_independent():
    # the same id yields the same row regardless of which partition
    # (batch grouping) delivers it — the whole point of the lazy synth
    whole = synth_frontier_batch(_batch(range(0, 200)), 50, 1.5)
    a = synth_frontier_batch(_batch(range(0, 117)), 50, 1.5)
    b = synth_frontier_batch(_batch(range(117, 200)), 50, 1.5)
    assert pa.concat_tables([a, b]).equals(whole)


def test_zipf_skew_has_a_hot_host():
    out = synth_frontier_batch(_batch(range(20000)), 1000, 1.5)
    hosts, counts = np.unique(np.asarray(out["host"]), return_counts=True)
    top = counts.max() / 20000
    assert 0.15 < top < 0.45  # ~29% expected on the hottest host
    assert len(hosts) > 100  # and a long tail of cold hosts


def test_urls_unique_and_host_consistent():
    out = synth_frontier_batch(_batch(range(5000)), 200, 1.5)
    urls = out["url"].to_pylist()
    assert len(set(urls)) == len(urls)
    for u, h in zip(urls[:100], out["host"].to_pylist()[:100]):
        assert u.startswith(f"https://{h}/")
