"""Sharded URL-seen set: cuckoo filter fast path + exact backing store.

The reference's seen-set is SQLite: URL_LIST ∪ FAILED_URLS ∪ HTTP_ERRORS,
anti-joined against candidates in 5k chunks (session_hist.py:350-422) —
its flagged bottleneck (">10000 URLs … this is slow!"). Here it is a pool
of ``SeenShard`` actors, each owning ``hash(url) % num_shards``:

  - a **cuckoo filter** (numpy bucket table, 4 slots × 16-bit
    fingerprints) answers membership in O(2 bucket reads), vectorized
    per batch — the fast path a 10^10-URL frontier needs (~1 byte/url);
  - an **exact uint64-hash set** backs it, so a positive filter answer
    is confirmed exactly and false positives can NEVER drop a never-seen
    URL (north-rule requirement), and deletions/audits are exact;
  - per-round Parquet snapshots (``seen/shard=K/round=R.parquet``) make
    the state restorable for checkpoint resume; restore is idempotent.

At 10^10 URLs / 256 shards each shard holds ~4·10^7 entries: filter
~40 MB + exact set — the exact set is the memory ceiling; the design
intent at that scale is filter + per-shard Parquet audit (the filter
alone gates the hot path, the exact confirmation becomes a second-level
probe into the shard's Arrow table). The actor interface is unchanged.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class CuckooFilter:
    """Vectorized cuckoo filter over uint64 keys.

    bucket_count is a power of two; fingerprints are 16-bit (0 reserved
    for "empty"). Inserts use the standard partial-key cuckoo kick loop
    (Fan et al., CoNEXT'14 public design).
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int, seed: int = 0x5EED):
        want = max(16, int(capacity / (self.SLOTS * 0.84)))
        self.nbuckets = 1 << (want - 1).bit_length()
        self.table = np.zeros((self.nbuckets, self.SLOTS), dtype=np.uint16)
        self.mask = np.uint64(self.nbuckets - 1)
        self.seed = np.uint64(seed)
        #: overflow safety valve: (bucket, fingerprint) pairs left "in
        #: hand" after a failed kick chain. Either of an item's two
        #: buckets identifies it ((b, fp) matches lookups from both sides
        #: because b2 = b1 ^ h(fp)). Rare when capacity is sized right.
        self.stash = set()
        self.count = 0

    # -- key → (fingerprint, bucket1, bucket2) ---------------------------
    def _fp(self, keys: np.ndarray) -> np.ndarray:
        fp = ((keys >> np.uint64(48)) ^ (keys >> np.uint64(16))).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _b1(self, keys: np.ndarray) -> np.ndarray:
        return (keys & self.mask).astype(np.int64)

    def _b2(self, b1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # standard partial-key alternate bucket: b ^ hash(fp)
        h = (fp.astype(np.uint64) * np.uint64(0x5BD1E9955BD1E995)) ^ self.seed
        return ((b1.astype(np.uint64) ^ h) & self.mask).astype(np.int64)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        """Vectorized membership (may yield false positives, never false
        negatives for inserted keys)."""
        keys = keys.astype(np.uint64, copy=False)
        fp = self._fp(keys)
        b1 = self._b1(keys)
        b2 = self._b2(b1, fp)
        hit = (self.table[b1] == fp[:, None]).any(axis=1)
        hit |= (self.table[b2] == fp[:, None]).any(axis=1)
        if self.stash:
            for i in np.nonzero(~hit)[0]:
                if (int(b1[i]), int(fp[i])) in self.stash or (
                    int(b2[i]), int(fp[i])
                ) in self.stash:
                    hit[i] = True
        return hit

    def insert(self, keys: np.ndarray) -> None:
        keys = keys.astype(np.uint64, copy=False)
        fp = self._fp(keys)
        b1 = self._b1(keys)
        b2 = self._b2(b1, fp)
        for i in range(len(keys)):
            self._insert_one(int(b1[i]), int(b2[i]), int(fp[i]), int(keys[i]))
        self.count += len(keys)

    def _insert_one(self, b1: int, b2: int, fp: int, key: int) -> None:
        for b in (b1, b2):
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return
        # kick loop
        b = b1
        rng_state = key
        for _ in range(self.MAX_KICKS):
            rng_state = (rng_state * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
            slot = rng_state % self.SLOTS
            fp, self.table[b][slot] = int(self.table[b][slot]), fp
            h = ((fp * 0x5BD1E9955BD1E995) & 0xFFFFFFFFFFFFFFFF) ^ int(self.seed)
            b = int((b ^ h) & int(self.mask))
            row = self.table[b]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return
        # chain failed: the fp in hand belongs to a (possibly different)
        # previously-inserted item whose alternate bucket is b — stash it
        self.stash.add((b, fp))


class SeenShardState:
    """Plain-python shard state (wrapped by the Ray actor; also used
    directly by the sequential simulator and unit tests)."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)
        self.exact: set = set()
        # pending snapshot rows since the last flush
        self._delta_hash: list = []
        self._delta_url: list = []
        self._delta_state: list = []
        self._delta_round: list = []

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        maybe = self.filter.contains(hashes)
        out = np.zeros(len(hashes), dtype=bool)
        idx = np.nonzero(maybe)[0]
        for i in idx:  # confirm filter positives exactly (no FP drops)
            out[i] = int(hashes[i]) in self.exact
        return out

    def add_many(self, hashes: np.ndarray, urls, states, round_no: int) -> int:
        fresh = [i for i, h in enumerate(hashes) if int(h) not in self.exact]
        if fresh:
            arr = np.asarray([int(hashes[i]) for i in fresh], dtype=np.uint64)
            self.filter.insert(arr)
            for i in fresh:
                h = int(hashes[i])
                self.exact.add(h)
                self._delta_hash.append(h)
                self._delta_url.append(urls[i])
                self._delta_state.append(int(states[i]))
                self._delta_round.append(round_no)
        return len(fresh)

    def size(self) -> int:
        return len(self.exact)

    def snapshot(self, root: str, round_no: int) -> str:
        """Write this round's delta (FIXTURES.md §6 schema); idempotent
        per (shard, round)."""
        out_dir = os.path.join(root, f"shard={self.shard_id}")
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"round={round_no}.parquet")
        table = pa.table(
            {
                "url_hash": pa.array(self._delta_hash, pa.uint64()),
                "url": pa.array(self._delta_url, pa.string()),
                "state": pa.array(self._delta_state, pa.int8()),
                "round": pa.array(self._delta_round, pa.int32()),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        self._delta_hash, self._delta_url = [], []
        self._delta_state, self._delta_round = [], []
        return path

    def restore(self, root: str, upto_round: int) -> int:
        """Rebuild filter+exact set from snapshots of rounds <= upto_round."""
        shard_dir = os.path.join(root, f"shard={self.shard_id}")
        if not os.path.isdir(shard_dir):
            return 0
        n = 0
        for fname in sorted(os.listdir(shard_dir)):
            if not fname.endswith(".parquet"):
                continue
            rnd = int(fname.split("=")[1].split(".")[0])
            if rnd > upto_round:
                continue
            t = pq.read_table(os.path.join(shard_dir, fname))
            hashes = t["url_hash"].to_numpy().astype(np.uint64)
            fresh = np.fromiter(
                (int(h) not in self.exact for h in hashes), dtype=bool, count=len(hashes)
            )
            if fresh.any():
                self.filter.insert(hashes[fresh])
                self.exact.update(int(h) for h in hashes[fresh])
                n += int(fresh.sum())
        return n

    def dump_table(self) -> pa.Table:
        """Exact audit view: full (url_hash,) membership as Arrow."""
        return pa.table({"url_hash": pa.array(sorted(self.exact), pa.uint64())})


def make_seen_actors(num_shards: int, capacity_per_shard: int = 1 << 16):
    """Create the shard actor pool. Import-time ray dependency is kept out
    of module scope so the simulator can use SeenShardState without ray."""
    import ray

    shard_actor = ray.remote(num_cpus=0.1)(SeenShardState)
    return [
        shard_actor.remote(i, capacity_per_shard) for i in range(num_shards)
    ]


class SeenSetClient:
    """Batch client used inside map_batches stages and on the driver.

    Routes each uint64 hash to ``hash % num_shards`` and issues one RPC
    per touched shard per batch (not per url).
    """

    def __init__(self, actors):
        self.actors = actors
        self.n = len(actors)

    def _route(self, hashes: np.ndarray):
        shard_of = (hashes % np.uint64(self.n)).astype(np.int64)
        for s in np.unique(shard_of):
            yield int(s), np.nonzero(shard_of == s)[0]

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        import ray

        out = np.zeros(len(hashes), dtype=bool)
        pending = []
        for s, idx in self._route(hashes):
            pending.append((idx, self.actors[s].contains_many.remote(hashes[idx])))
        for idx, ref in pending:
            out[idx] = ray.get(ref)
        return out

    def add_many(self, hashes: np.ndarray, urls, states, round_no: int) -> int:
        import ray

        urls = np.asarray(urls, dtype=object)
        states = np.asarray(states)
        refs = [
            self.actors[s].add_many.remote(
                hashes[idx], list(urls[idx]), states[idx], round_no
            )
            for s, idx in self._route(hashes)
        ]
        return sum(ray.get(refs))

    def snapshot_all(self, root: str, round_no: int):
        import ray

        return ray.get([a.snapshot.remote(root, round_no) for a in self.actors])

    def restore_all(self, root: str, upto_round: int) -> int:
        import ray

        return sum(ray.get([a.restore.remote(root, upto_round) for a in self.actors]))

    def total_size(self) -> int:
        import ray

        return sum(ray.get([a.size.remote() for a in self.actors]))

    def dump(self) -> pa.Table:
        import ray

        return pa.concat_tables(ray.get([a.dump_table.remote() for a in self.actors]))
