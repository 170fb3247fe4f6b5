"""Cuckoo filter + seen-shard unit tests (no Ray needed)."""

from __future__ import annotations

import numpy as np
import pytest

from newslookout_ray.state.cuckoo import CuckooFilter, SeenShardState


def _keys(n, seed=1):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(0, 2**63, size=n, dtype=np.int64).astype(np.uint64))


class TestCuckooFilter:
    def test_no_false_negatives(self):
        keys = _keys(20000)
        cf = CuckooFilter(len(keys))
        cf.insert(keys)
        assert cf.contains(keys).all()

    def test_false_positive_rate_bounded(self):
        keys = _keys(20000, seed=2)
        cf = CuckooFilter(len(keys))
        cf.insert(keys)
        other = np.setdiff1d(_keys(20000, seed=3), keys)
        assert cf.contains(other).mean() < 0.01

    def test_overfill_goes_to_stash_not_lost(self):
        keys = _keys(3000, seed=4)
        cf = CuckooFilter(64)  # tiny — forces kicks/stash
        cf.insert(keys)
        assert cf.contains(keys).all()


class TestSeenShard:
    def test_check_add_idempotent(self):
        s = SeenShardState(0, capacity=4096)
        h = _keys(500, seed=5)
        urls = [f"u{i}" for i in range(len(h))]
        assert s.contains_many(h).sum() == 0
        assert s.add_many(h, urls, np.ones(len(h)), 0) == len(h)
        assert s.contains_many(h).all()
        assert s.add_many(h, urls, np.ones(len(h)), 1) == 0  # re-add no-op

    def test_filter_positive_confirmed_exactly(self):
        """A cuckoo false positive must NOT report seen (north rule)."""
        s = SeenShardState(0, capacity=64)
        h = _keys(2000, seed=6)
        s.add_many(h[:1000], [f"u{i}" for i in range(1000)], np.ones(1000), 0)
        novel = h[1000:]
        assert s.contains_many(novel).sum() == 0  # exact backing kills FPs

    def test_snapshot_restore_roundtrip(self, tmp_path):
        s = SeenShardState(3, capacity=4096)
        h = _keys(300, seed=7)
        s.add_many(h, [f"u{i}" for i in range(len(h))], np.full(len(h), 2), 0)
        s.snapshot(str(tmp_path), 0)
        h2 = _keys(100, seed=8)
        s.add_many(h2, [f"v{i}" for i in range(len(h2))], np.ones(len(h2)), 1)
        s.snapshot(str(tmp_path), 1)

        r = SeenShardState(3, capacity=4096)
        assert r.restore(str(tmp_path), 0) == len(h)
        assert r.contains_many(h).all()
        assert r.contains_many(h2).sum() == 0  # round 1 not restored
        r2 = SeenShardState(3, capacity=4096)
        r2.restore(str(tmp_path), 1)
        assert r2.size() == len(h) + len(np.setdiff1d(h2, h))

    def test_restore_idempotent(self, tmp_path):
        s = SeenShardState(0, capacity=1024)
        h = _keys(50, seed=9)
        s.add_many(h, [f"u{i}" for i in range(len(h))], np.ones(len(h)), 0)
        s.snapshot(str(tmp_path), 0)
        r = SeenShardState(0, capacity=1024)
        r.restore(str(tmp_path), 0)
        assert r.restore(str(tmp_path), 0) == 0  # second restore adds nothing
        assert r.size() == len(h)
