"""Deduplication operators over a documents table.

Five families (driver brief; M2/U8 reference analogues, SURVEY.md §2.8):

  exact        — first-occurrence-wins on content hash (U8 semantics at
                 dataset scale: combiner min-in-batch → groupby min)
  minhash-LSH  — word-shingle MinHash signatures → banded LSH buckets →
                 candidate pairs → exact Jaccard verification
  simhash      — 64-bit token simhash per doc + banded near-pair search
  ngram-exact  — exact all-pairs n-gram Jaccard (the oracle-checkable
                 ground truth the LSH path approximates)
  embedding    — cosine near-duplicate pairs over an embedding column

Scale notes: the exact path shuffles one (hash, min_id, count) row per
batch per key; MinHash/simhash signatures are fixed-width columns and the
only shuffle is the (band, key) groupby; the exact all-pairs path is
bucketed block-cross-join — quadratic by nature, used as small-scale
oracle and within LSH buckets at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import (
    collect_rows,
    collect_table,
    fb_buckets as _fb_buckets,
    table_from_pandas as _table_from_pandas,
)

NGRAM = 3
MINHASH_PERMS = 128
LSH_BANDS = 32  # rows per band = 128/32 = 4

_MERSENNE = (1 << 61) - 1


def char_shingles(text: str, n: int = NGRAM) -> set:
    """Distinct character n-grams."""
    if text is None or len(text) < n:
        return set()
    return {text[i : i + n] for i in range(len(text) - n + 1)}


def word_shingles(text: str, n: int = NGRAM) -> set:
    """Distinct word n-grams over single-space-split tokens — the default
    shingling for text near-dup (char shingles give word-salad corpora a
    ~0.5 baseline jaccard, exploding LSH candidate sets; word shingles
    have near-zero baseline with the same true near-dup pairs). Matches
    the oracle SQL: string_split(text,' ') → toks[i]||' '||...||toks[i+n-1].
    """
    if text is None:
        return set()
    toks = text.split(" ")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


def floor_round(x: float, digits: int = 6) -> float:
    """floor-based truncation — Python round() is half-to-even while SQL
    round() is half-away; floor(x*10^d)/10^d is identical in both."""
    import math

    scale = 10 ** digits
    return math.floor(x * scale) / scale


# ---------------------------------------------------------------------------
# exact dedup (U8 at scale)
# ---------------------------------------------------------------------------


# second independent 64-bit key (pandas hash_array takes a 16-byte seed):
# grouping on (h, h2) gives an effective 128-bit content key — at the
# 10^10-doc design point a single 64-bit key expects a few birthday
# collisions (n²/2^65 ≈ 2.7), which would silently merge distinct texts
_HASH_KEY_2 = "nlray-exact-dup2"


def exact_dedup(docs):
    """→ (keeper_id, n_dups) per distinct text: keeper = min doc_id.

    Combiner: per-batch partials (h, h2, min_id, count) so the groupby
    shuffle moves one row per key per batch, never the text itself.
    Hashing is two vectorized pandas hash_array passes (cythonized
    siphash) — the round-2 bench showed the previous per-row
    ``str.map(sha1)`` at ~1 µs/row dominating the partial stage.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].to_numpy(dtype=object)
        df = df.assign(
            h=pd.util.hash_array(texts),
            h2=pd.util.hash_array(texts, hash_key=_HASH_KEY_2),
        )
        g = df.groupby(["h", "h2"], as_index=False).agg(
            keeper_id=("doc_id", "min"), n_dups=("doc_id", "size")
        )
        return g

    from ray.data.aggregate import Min, Sum

    agg = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["h", "h2"])
        .aggregate(Min("keeper_id", alias_name="keeper_id"), Sum("n_dups", alias_name="n_dups"))
    )
    return agg.map_batches(
        lambda t: t.select(["keeper_id", "n_dups"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHashStage:
    """doc → 128-perm MinHash signature (universal-hash permutations with
    fixed seeds, so signatures are deterministic across runs/processes).

    The batch path computes signatures for ALL docs in slab-bounded
    vectorized passes: one cythonized hash pass over every shingle in
    the slab, one broadcast (perms × shingles) permutation product, and
    one ``np.minimum.reduceat`` segment-min per slab — the per-doc
    Python is only the shingling itself. Min over shingles is
    order-independent, so the slab path is value-identical to the
    original per-doc formulation."""

    #: max perms × shingles uint64 cells per vectorized slab (~32 MB)
    _SLAB_CELLS = 1 << 22

    def __init__(self, perms: int = MINHASH_PERMS, ngram: int = NGRAM):
        rng = np.random.RandomState(0xC0FFEE)
        self.a = rng.randint(1, _MERSENNE, size=perms, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=perms, dtype=np.int64).astype(np.uint64)
        self.perms = perms
        self.ngram = ngram

    def signatures(self, texts) -> np.ndarray:
        """(n, perms) uint64 signature matrix, slab-vectorized."""
        n = len(texts)
        out = np.full((n, self.perms), _MERSENNE, dtype=np.uint64)
        sh_lists = [list(word_shingles(t, self.ngram)) for t in texts]
        lens = np.array([len(s) for s in sh_lists], dtype=np.int64)
        nonempty = np.flatnonzero(lens)
        max_sh = self._SLAB_CELLS // self.perms
        i = 0
        while i < len(nonempty):
            # greedily extend the slab until its shingle total hits budget
            j, m = i, 0
            while j < len(nonempty) and (m == 0 or m + lens[nonempty[j]] <= max_sh):
                m += int(lens[nonempty[j]])
                j += 1
            idx = nonempty[i:j]
            flat = np.concatenate(
                [np.array(sh_lists[k], dtype=object) for k in idx]
            )
            # stable default hash key, folded below 2^32 so a*x+b stays
            # within uint64 headroom
            base = pd.util.hash_array(flat) >> np.uint64(32)
            prod = (self.a[:, None] * base[None, :] + self.b[:, None]) % np.uint64(
                _MERSENNE
            )
            starts = np.zeros(len(idx), dtype=np.int64)
            np.cumsum(lens[idx][:-1], out=starts[1:])
            out[idx] = np.minimum.reduceat(prod, starts, axis=1).T
            i = j
        return out

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self.signatures(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1), pa.uint64()), self.perms
                ),
            }
        )


#: process-level stage cache (the crawl/chain pattern): MinHash runs as
#: STATELESS tasks on the warm worker pool — the permutation constants
#: build once per worker process, no actor pool to spawn per query
_MINHASH_STAGE: MinHashStage | None = None


def minhash_signature_stage(batch: pa.Table) -> pa.Table:
    global _MINHASH_STAGE
    if _MINHASH_STAGE is None:
        _MINHASH_STAGE = MinHashStage()
    return _MINHASH_STAGE(batch)


#: odd 64-bit lane constants + a murmur-style finalizer for the band-key
#: fold. Equal band slices ALWAYS map to equal keys (determinism), so
#: LSH recall is unchanged; unequal slices colliding (~2^-64) only add a
#: candidate that the exact-Jaccard verify rejects — output-invariant.
_BAND_LANE_CACHE: dict = {}


def _band_lane_c(rows: int) -> np.ndarray:
    c = _BAND_LANE_CACHE.get(rows)
    if c is None:
        rng = np.random.RandomState(0xBA2D)
        c = (
            rng.randint(0, np.iinfo(np.int64).max, size=rows, dtype=np.int64).astype(
                np.uint64
            )
            | np.uint64(1)  # odd multipliers
        )
        _BAND_LANE_CACHE[rows] = c
    return c


def _band_rows(batch: pa.Table, bands: int = LSH_BANDS) -> pa.Table:
    """Explode signatures to (band, band_key, doc_id) rows for the LSH
    groupby — band_key is a stable hash of the band's signature slice,
    computed for the whole batch in one vectorized fold (lane linear
    combination + xor-shift finalizer + band-salt), no per-doc Python."""
    n = batch.num_rows
    rows = MINHASH_PERMS // bands
    if n == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "band": pa.array([], pa.int32()),
                "band_key": pa.array([], pa.int64()),
            }
        )
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch["sig"].combine_chunks()
    mat = col.flatten().to_numpy(zero_copy_only=False).reshape(n, MINHASH_PERMS)
    sl = mat.reshape(n, bands, rows)
    with np.errstate(over="ignore"):  # wrapping uint64 arithmetic is the point
        mix = (sl * _band_lane_c(rows)[None, None, :]).sum(axis=2, dtype=np.uint64)
        mix ^= mix >> np.uint64(33)
        mix *= np.uint64(0xFF51AFD7ED558CCD)
        mix ^= mix >> np.uint64(29)
        mix ^= (np.arange(bands, dtype=np.uint64) + np.uint64(1))[None, :] * np.uint64(
            0x9E3779B97F4A7C15
        )
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
            "band": pa.array(
                np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()
            ),
            "band_key": pa.array(mix.reshape(-1).view(np.int64), pa.int64()),
        }
    )


def minhash_lsh_pairs(docs, threshold: float = 0.8, concurrency=(1, 8),
                      band_limit: int = 5_000_000, pair_limit: int = 500_000):
    # NB: two actor-pool stages run in this pipeline (signature + verify);
    # min replicas MUST stay below cpus/2 or the streaming executor
    # deadlocks with both pools reserved and the upstream read starved
    # (observed live at 4 cpus with min 2+2).
    """Near-duplicate pairs (a<b, jaccard>=threshold) via MinHash+LSH.

    shingle→minhash (stateless slab-vectorized tasks, permutation
    constants cached per worker process) → band explode → band-key
    SELF-JOIN
    (the within-bucket pair generation as one vectorized hash join — no
    per-bucket Python, singleton buckets cost one self-row filtered out)
    → per-block pair dedup → exact Jaccard verify against the texts
    re-joined on doc_id.
    """
    import ray

    sigs = docs.map_batches(minhash_signature_stage, batch_format="pyarrow")
    bands_ds = sigs.map_batches(_band_rows, batch_format="pyarrow").select_columns(
        ["doc_id", "band_key"]
    )
    # Hash joins spawn num_partitions aggregator actors EACH; with up to
    # three joins in one streaming execution, partitions must scale with
    # the CLUSTER (3×8 aggregators wedge a 4-cpu session; cpus/4 is safe).
    cpus = int(ray.cluster_resources().get("CPU", 8))
    num_partitions = max(2, min(16, cpus // 4))

    # Band rows are two int64s per (doc, band) — 32 ints per doc. Under
    # `band_limit` rows (probed with limit(N+1), so an over-limit corpus
    # never lands on the driver) the bucket pair-generation is driver-side
    # numpy over the collected ints; past it, a distributed band-key
    # SELF-JOIN generates within-bucket pairs as one vectorized hash join
    # (no per-bucket Python; singleton buckets cost one filtered self-row).
    # band_limit default ≈ 80 MB of ints driver-side
    probe = collect_table(bands_ds.limit(band_limit + 1))

    if probe.num_rows <= band_limit:
        ids = probe["doc_id"].to_numpy(zero_copy_only=False)
        keys = probe["band_key"].to_numpy(zero_copy_only=False)
        order = np.argsort(keys, kind="stable")
        keys_s, ids_s = keys[order], ids[order]
        run_starts = np.flatnonzero(np.r_[True, keys_s[1:] != keys_s[:-1]])
        run_ends = np.r_[run_starts[1:], len(keys_s)]
        packed_parts = []
        for s, e in zip(run_starts, run_ends):
            if e - s < 2:
                continue
            members = np.sort(ids_s[s:e])
            ii, jj = np.triu_indices(len(members), k=1)
            packed_parts.append((members[ii] << np.int64(32)) | members[jj])
        if packed_parts:
            packed = np.unique(np.concatenate(packed_parts))
            cand_tbl = pa.table(
                {
                    "a": pa.array(packed >> np.int64(32), pa.int64()),
                    "b": pa.array(packed & np.int64(0xFFFFFFFF), pa.int64()),
                }
            )
        else:
            cand_tbl = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        import ray.data as _rd

        cand = _rd.from_arrow(cand_tbl)
    else:
        bands = bands_ds.materialize()  # both join sides
        joined = bands.join(
            bands,
            join_type="inner",
            num_partitions=num_partitions,
            on=("band_key",),
            left_suffix="_l",
            right_suffix="_r",
        )

        def pair_filter(batch: pa.Table) -> pa.Table:
            # keep a<b (drops self-pairs and mirror orders), local dedup
            t = pa.table({"a": batch["doc_id_l"], "b": batch["doc_id_r"]})
            t = t.filter(pa.compute.less(t["a"], t["b"]))
            df = t.to_pandas().drop_duplicates(["a", "b"])
            return _table_from_pandas(df)

        cand = joined.map_batches(pair_filter, batch_format="pyarrow", batch_size=None)

    # Verify against candidate texts only. Candidate pairs are two int64s
    # each — bounded by near-dup density, a sliver of the corpus — so the
    # SMALL case (≤ pair_limit, probed with limit(N+1)) collects the
    # pairs, filters the texts Dataset to the candidate doc_ids (one
    # streaming pass — only candidate docs' text ever reaches the driver)
    # and verifies with a driver-side shingle cache: zero extra dataset
    # executions beyond the filter pass. Past pair_limit the pairs stay
    # distributed and texts are re-joined on doc_id (two hash joins) with
    # an actor-pool verifier — the huge-candidate-set path.
    import ray as _ray

    thr = threshold
    texts = docs.select_columns(["doc_id", "text"])
    probe = collect_table(cand.limit(pair_limit + 1))

    if probe.num_rows <= pair_limit:
        a_ids = probe["a"].to_numpy(zero_copy_only=False)
        b_ids = probe["b"].to_numpy(zero_copy_only=False)
        cand_ids = set(np.unique(np.concatenate([a_ids, b_ids])).tolist())
        ids_ref = _ray.put(cand_ids)

        def only_cand(batch: pa.Table) -> pa.Table:
            wanted = _ray.get(ids_ref)
            mask = pa.array([i in wanted for i in batch["doc_id"].to_pylist()])
            return batch.filter(mask)

        cand_texts = collect_table(texts.map_batches(only_cand, batch_format="pyarrow"))
        text_of = dict(zip(cand_texts["doc_id"].to_pylist(), cand_texts["text"].to_pylist()))
        sh_cache: dict = {}

        def _sh(doc_id):
            s = sh_cache.get(doc_id)
            if s is None:
                s = word_shingles(text_of[doc_id])
                sh_cache[doc_id] = s
            return s

        keep_a, keep_b, jac = [], [], []
        for a, b in zip(a_ids.tolist(), b_ids.tolist()):
            j = jaccard(_sh(a), _sh(b))
            if j >= thr:
                keep_a.append(a)
                keep_b.append(b)
                jac.append(floor_round(j, 6))
        verified = (
            pd.DataFrame(
                {
                    "a": pd.array(keep_a, dtype="int64"),
                    "b": pd.array(keep_b, dtype="int64"),
                    "jaccard": pd.array(jac, dtype="float64"),
                }
            )
            .drop_duplicates(["a", "b"])
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        import ray.data as _rd

        return _rd.from_arrow(_table_from_pandas(verified))
    else:
        j1 = cand.join(
            texts,
            join_type="inner",
            num_partitions=num_partitions,
            on=("a",),
            right_on=("doc_id",),
        ).rename_columns({"text": "text_a"})
        # join1 co-partitions duplicates of a pair by `a` → whole-block
        # dedup bounds join2's shuffle volume
        j1 = j1.map_batches(
            lambda df: df.drop_duplicates(["a", "b"]), batch_format="pandas", batch_size=None
        )
        j2 = j1.join(
            texts,
            join_type="inner",
            num_partitions=num_partitions,
            on=("b",),
            right_on=("doc_id",),
        ).rename_columns({"text": "text_b"})

        class VerifyJoined:
            def __init__(self):
                self.cache: dict = {}

            def _sh(self, doc_id, text):
                s = self.cache.get(doc_id)
                if s is None:
                    s = word_shingles(text)
                    self.cache[doc_id] = s
                return s

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                keep_a, keep_b, jac = [], [], []
                for a, b, ta, tb in zip(df["a"], df["b"], df["text_a"], df["text_b"]):
                    j = jaccard(self._sh(a, ta), self._sh(b, tb))
                    if j >= thr:
                        keep_a.append(a)
                        keep_b.append(b)
                        jac.append(floor_round(j, 6))
                return pd.DataFrame(
                    {
                        "a": pd.array(keep_a, dtype="int64"),
                        "b": pd.array(keep_b, dtype="int64"),
                        "jaccard": pd.array(jac, dtype="float64"),
                    }
                )

        verified_ds = j2.map_batches(
            VerifyJoined, batch_format="pandas", batch_size=8192, concurrency=concurrency
        )
        # Finalize distributed: the same pair may survive in multiple j2
        # blocks (per-block dedup only bounds, not eliminates, repeats) —
        # dedup with a (a,b) groupby (jaccard is identical per pair, Min is
        # a no-op combiner) and a distributed sort. Nothing lands on the
        # driver; an adversarial mirror corpus with O(n) pairs stays in
        # the object store for the caller to write or stream.
        from ray.data.aggregate import Min

        return (
            verified_ds.groupby(["a", "b"])
            .aggregate(Min("jaccard", alias_name="jaccard"))
            .sort(["a", "b"])
        )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHashStage:
    """64-bit token simhash per doc, vectorized per batch: every token in
    the batch is hashed in one cythonized pass (pandas hash_array, fixed
    key → deterministic across runs/processes), bits unpacked with a
    single numpy broadcast, and per-doc ±1 bit sums computed with one
    segment-reduce (tokens are emitted in doc order, so doc boundaries
    are reduceat offsets). No per-token Python in the hot path."""

    _BITPOS = np.arange(64, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        token_lists = [(t or "").split() for t in texts]
        lens = np.array([len(tl) for tl in token_lists], dtype=np.int64)
        acc = np.zeros((len(texts), 64), dtype=np.int64)
        if lens.sum() > 0:
            flat = np.concatenate([np.asarray(tl, dtype=object) for tl in token_lists if tl])
            h = pd.util.hash_array(flat)  # uint64, deterministic default key
            # (n_tokens, 64) 0/1 bit matrix as uint8 (unpackbits on the
            # little-endian byte view: column k == bit k of the hash) —
            # 64 bytes/token, no wide intermediate
            bits = np.unpackbits(
                h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )
            nonempty = lens > 0
            starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
            np.cumsum(lens[nonempty][:-1], out=starts[1:])
            set_counts = np.add.reduceat(bits.astype(np.int32), starts, axis=0)
            # ±1 sum = 2*set_bits - n_tokens
            acc[nonempty] = 2 * set_counts.astype(np.int64) - lens[nonempty][:, None]
        bits = (acc > 0).astype(np.uint64)
        out = (bits << self._BITPOS).sum(axis=1, dtype=np.uint64)
        return pa.table({"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.uint64())})


_SIMHASH_STAGE = SimHashStage()  # stateless (class constant only)


def simhash_table(docs, concurrency=None):
    """Stateless-task simhash; ``concurrency`` kept for API compat
    (unused — no actor pool to size). batch_size bounds the per-batch
    (n_tokens, 64) bit matrix."""
    return docs.map_batches(
        _SIMHASH_STAGE, batch_format="pyarrow", batch_size=1024
    )


def simhash_near_pairs(docs, max_hamming: int = 12, concurrency: int = 2):
    """Near pairs by simhash hamming distance via 4×16-bit band blocking.

    Recall guarantee is exact only for hamming <= 3 (pigeonhole: 4 bands,
    <=3 differing bits leaves >=1 band identical); above that the search
    is approximate — pairs whose differing bits spread across all 4 bands
    are missed. Exact hamming is verified per candidate, so precision is
    exact. For guaranteed recall at larger radii use more/narrower bands
    or multi-probe."""
    sig = simhash_table(docs, concurrency=concurrency)
    num_buckets = _fb_buckets()

    _POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    _PAIR_SLAB = 4_000_000  # max candidate pairs materialized at once

    def band_rows(batch: pa.Table) -> pa.Table:
        # vectorized band explode: each doc → 4 rows (band_key, simhash);
        # __fb = hash(band_key) % ~2×cpus so the downstream groupby makes
        # O(cpus) groups (each holding many whole bands), not O(bands)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = np.arange(4, dtype=np.uint64)
        keys = (((hs[:, None] >> (np.uint64(16) * b)) & np.uint64(0xFFFF)) | (b << np.uint64(16)))
        flat = keys.reshape(-1).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, 4), pa.int64()),
                "band_key": pa.array(flat, pa.int64()),
                "simhash": pa.array(np.repeat(hs, 4), pa.uint64()),
                "__fb": pa.array(
                    (pd.util.hash_array(flat) % num_buckets).astype(np.int32)
                ),
            }
        )

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame(
            {
                "a": np.array([], dtype=np.int64),
                "b": np.array([], dtype=np.int64),
                "hamming": np.array([], dtype=np.int64),
                "__fb2": np.array([], dtype=np.int32),
            }
        )

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over ALL band groups in this fb bucket:
        # sort by (band_key, doc_id), then generate every within-band
        # (a<b) pair with repeat/cumsum index algebra — no per-band or
        # per-row Python. Candidate-pair index arrays are slab-bounded.
        rows = df.drop_duplicates(["band_key", "doc_id"]).sort_values(
            ["band_key", "doc_id"], kind="mergesort"
        )
        n = len(rows)
        if n == 0:
            return _empty_pairs()
        ids = rows["doc_id"].to_numpy()
        hs = rows["simhash"].to_numpy(dtype=np.uint64)
        bk = rows["band_key"].to_numpy()
        new = np.ones(n, dtype=bool)
        new[1:] = bk[1:] != bk[:-1]
        grp_start = np.flatnonzero(new)  # first row index of each band group
        grp_id = np.cumsum(new) - 1
        local = np.arange(n, dtype=np.int64) - grp_start[grp_id]
        cum = np.cumsum(local)  # pairs contributed by rows[0..r]
        frames = []
        start_row, base = 0, 0
        while start_row < n:
            end_row = int(np.searchsorted(cum, base + _PAIR_SLAB, side="left")) + 1
            end_row = min(max(end_row, start_row + 1), n)
            loc = local[start_row:end_row]
            m = int(loc.sum())
            base = int(cum[end_row - 1])
            if m:
                # row r is the "b" side of loc[r] pairs whose "a" side is
                # the rows before it in its band group (doc_id-sorted ⇒ a<b)
                b_idx = np.repeat(np.arange(start_row, end_row), loc)
                seg_start = np.repeat(grp_start[grp_id[start_row:end_row]], loc)
                excl = np.concatenate(([0], np.cumsum(loc)[:-1]))
                offset = np.arange(m, dtype=np.int64) - np.repeat(excl, loc)
                a_idx = seg_start + offset
                x = hs[a_idx] ^ hs[b_idx]
                ham = _POP8[x.view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)
                hit = ham <= max_hamming
                if hit.any():
                    a = ids[a_idx[hit]]
                    frames.append(
                        pd.DataFrame(
                            {
                                "a": a,
                                "b": ids[b_idx[hit]],
                                "hamming": ham[hit],
                                "__fb2": (
                                    pd.util.hash_array(a) % num_buckets
                                ).astype(np.int32),
                            }
                        )
                    )
            start_row = end_row
        if not frames:
            return _empty_pairs()
        return pd.concat(frames, ignore_index=True)

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # cross-band duplicate pairs collide here (same a ⇒ same bucket);
        # one vectorized drop_duplicates per fb2 bucket
        return df.drop_duplicates(["a", "b"])[["a", "b", "hamming"]]

    pairs = (
        sig.map_batches(band_rows, batch_format="pyarrow")
        .groupby("__fb")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    return pairs.groupby("__fb2").map_groups(dedup_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (oracle-checkable ground truth)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(docs, threshold: float = 0.8, num_blocks: int = 4):
    """Exact all-pairs word-3-gram Jaccard >= threshold (a<b).

    Block cross-join: docs assigned to B blocks by doc_id; every block
    PAIR (bi<=bj) is one task comparing its two blocks — O(B²/2) tasks,
    each quadratic only in block size. The distributed shape of the
    quadratic oracle; the LSH path above is the sub-quadratic scale path.
    """
    import itertools

    import ray

    rows = collect_rows(docs.select_columns(["doc_id", "text"]))
    blocks = [[] for _ in range(num_blocks)]
    for r in rows:
        blocks[r["doc_id"] % num_blocks].append((r["doc_id"], r["text"]))
    block_refs = [ray.put(b) for b in blocks]
    thr = threshold

    @ray.remote
    def compare(left, right, same):
        out = []
        lsh = [(i, word_shingles(t)) for i, t in left]
        rsh = lsh if same else [(i, word_shingles(t)) for i, t in right]
        for xi, (ai, aset) in enumerate(lsh):
            start = xi + 1 if same else 0
            for bi, bset in (rsh[start:] if same else rsh):
                a_, b_ = (ai, bi) if ai < bi else (bi, ai)
                j = jaccard(aset, bset)
                if j >= thr:
                    out.append((a_, b_, floor_round(j, 6)))
        return out

    tasks = []
    for bi, bj in itertools.combinations_with_replacement(range(num_blocks), 2):
        tasks.append(compare.remote(block_refs[bi], block_refs[bj], bi == bj))
    pairs = sorted(set(p for t in ray.get(tasks) for p in t))
    return pa.table(
        {
            "a": pa.array([p[0] for p in pairs], pa.int64()),
            "b": pa.array([p[1] for p in pairs], pa.int64()),
            "jaccard": pa.array([p[2] for p in pairs], pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_near_pairs(embeddings, threshold: float = 0.4):
    """Cosine >= threshold pairs (a<b) over an embedding column.

    SMALL-SCALE ORACLE BASELINE ONLY: collects the full embedding table
    driver-side and broadcasts the normalized matrix (exact all-pairs,
    DuckDB-checkable). This deliberately does NOT scale past what fits in
    one object-store copy — at 100 TB use the LSH-bucketed pair
    generation in similarity.lsh_topk, whose corpus side streams and
    whose buckets bound the pairwise work.
    """
    import ray

    rows = collect_rows(embeddings.select_columns(["vec_id", "embedding"]))
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]
    ref = ray.put((ids, matn))
    thr = threshold

    def stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        all_ids, all_mat = ray.get(ref)
        from .similarity import id_column_array, list_column_matrix

        bids = id_column_array(batch["vec_id"])
        bmat = list_column_matrix(batch["embedding"])
        bn = np.linalg.norm(bmat, axis=1)
        bn[bn == 0] = 1.0
        sims = (bmat / bn[:, None]) @ all_mat.T
        out_a, out_b, cos = [], [], []
        for i in range(len(bids)):
            hit = np.nonzero(sims[i] >= thr)[0]
            for j in hit:
                if bids[i] < all_ids[j]:
                    out_a.append(int(bids[i]))
                    out_b.append(int(all_ids[j]))
                    cos.append(floor_round(float(sims[i, j]), 4))
        return pa.table(
            {
                "a": pa.array(out_a, pa.int64()),
                "b": pa.array(out_b, pa.int64()),
                "cosine": pa.array(cos, pa.float64()),
            }
        )

    return embeddings.map_batches(stage, batch_format="pyarrow", batch_size=512)


def embedding_near_pairs_lsh(
    embeddings,
    threshold: float = 0.9,
    bits: int = 8,
    tables: int = 6,
):
    """Distributed embedding near-duplicate pairs: LSH-bucketed pair
    generation — the SCALE PATH whose exact-all-pairs oracle is
    ``embedding_near_pairs`` (which broadcasts the whole matrix and is
    labeled small-scale-only).

    Shape (everything streams; nothing driver-side):
      1. ``map_batches``: L2-normalize each vector, hash it into
         ``tables`` independent hyperplane tables → emit one
         (bkt, vec_id, vec) row per table (the classic L-tables
         replication; shuffle volume = tables × corpus);
      2. ``groupby(bkt).map_groups``: EXACT pairwise cosine inside each
         bucket (GEMM), emit (a, b, cosine) for cosine ≥ threshold —
         so precision is exact by construction; only recall is
         approximate (a pair is found iff it co-buckets in ≥1 table);
      3. ``groupby(a, b)``: first-row dedup of pairs found in several
         tables.

    Partitioning assumptions (documented per the operator contract):
    bucket population ~ corpus/2^bits per table — random hyperplanes on
    spread-out embeddings keep buckets bounded; a pathological hot
    bucket degrades to the exact kernel on that bucket only (O(b²)).
    Defaults target the near-dup regime (high threshold): per-bit
    collision p = 1 − θ/π ≈ 0.86 at cosine 0.9, so 8 bits × 6 tables
    gives ~0.98 recall. For LOW thresholds p falls toward 0.6 and LSH
    stops pruning — use fewer bits / more tables (recall measured in
    tests/test_dedup.py against the exact baseline).

    Reference anchor: mod_dedupe.py:204-242 decides duplicates by a
    cosine threshold over document vectors; this operator is that
    decision rule's pair-generation stage at corpus scale.
    """
    from .similarity import HyperplaneLSH, _normalized

    def expand(batch: pa.Table) -> pa.Table:
        from .similarity import id_column_array, list_column_matrix

        ids = id_column_array(batch["vec_id"])
        mat = _normalized(list_column_matrix(batch["embedding"]))
        d = mat.shape[1]
        if batch.num_rows == 0:
            # d is unknowable on an empty variable-list batch; a
            # variable list<double> vec keeps the schema consistent
            return pa.table(
                {
                    "bkt": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "vec": pa.array([], pa.list_(pa.float64())),
                }
            )
        out_ids = np.tile(ids, tables)
        out_bkt = np.concatenate(
            [
                t * (1 << bits)
                + HyperplaneLSH(dim=d, bits=bits, seed=0xA11CE + t).bucket(mat)
                for t in range(tables)
            ]
        ).astype(np.int64)
        flat = np.tile(mat.reshape(-1), tables)
        # variable list<double> (offsets arange·d) so empty blocks emit
        # the SAME schema — a fixed_size_list(d) block cannot unify with
        # an empty block whose d is unknowable
        from ..util import list_offsets32

        vec = pa.ListArray.from_arrays(
            list_offsets32(len(out_ids), d), pa.array(flat, pa.float64())
        )
        return pa.table(
            {
                "bkt": pa.array(out_bkt, pa.int64()),
                "vec_id": pa.array(out_ids, pa.int64()),
                "vec": vec,
            }
        )

    thr = threshold

    def _empty_pairs() -> pa.Table:
        return pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )

    def bucket_pairs(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n < 2:
            return _empty_pairs()
        ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
        d = len(tbl["vec"][0])
        mat = (
            tbl["vec"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .reshape(n, d)
        )
        # chunked slabs like the near-dedup screen: memory O(chunk·n)
        chunk = max(64, (1 << 21) // max(1, n))
        out_a, out_b, out_c = [], [], []
        for s in range(0, n, chunk):
            e = min(n, s + chunk)
            sims = mat[s:e] @ mat.T
            ii, jj = np.nonzero(sims >= thr)
            keep = (ii + s) < jj  # upper triangle, drops self-pairs
            ci, cj = ii[keep], jj[keep]
            if len(ci):
                a = np.minimum(ids[ci + s], ids[cj])
                b = np.maximum(ids[ci + s], ids[cj])
                out_a.append(a)
                out_b.append(b)
                out_c.append(sims[ci, cj])
        if not out_a:
            return _empty_pairs()
        cos = [floor_round(float(c), 4) for c in np.concatenate(out_c)]
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), pa.int64()),
                "b": pa.array(np.concatenate(out_b), pa.int64()),
                "cosine": pa.array(cos, pa.float64()),
            }
        )

    def first_row(df: pd.DataFrame) -> pd.DataFrame:
        return df.head(1)

    pairs = (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(expand, batch_format="pyarrow", batch_size=1024)
        .groupby("bkt")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .map_groups(first_row, batch_format="pandas")
    )
    return pairs


# ---------------------------------------------------------------------------
# duplicate clustering: connected components over near-dup pairs
# ---------------------------------------------------------------------------


def duplicate_clusters(pairs, max_iters: int = 50):
    """Connected components over an (a, b) duplicate-pair table →
    (doc_id, cluster_id) with cluster_id = the component's minimum id —
    the "keep one representative per duplicate CLUSTER" step that
    follows any pairwise near-dup stage (pairs from minhash_lsh_pairs /
    simhash_near_pairs / embedding_near_pairs all fit).

    Algorithm: iterative min-label propagation. labels start as each
    member's own id; every iteration joins labels across the undirected
    edge set and keeps the per-node minimum. Each iteration is ONE
    hash-partitioned Dataset.join + one combiner-fed groupby-min (both
    keyed on node) and converges in O(component diameter) iterations —
    dup clusters are shallow (diameter ≪ 10 even at 10^10 docs), and
    the label sum is strictly decreasing until fixpoint, so the loop
    exits on the first unchanged sum. Nothing driver-side but the
    per-iteration 16-byte (sum, count) probe.
    """
    import ray
    from ray.data.aggregate import Min, Sum

    def undirected(batch: pa.Table) -> pa.Table:
        a = batch["a"].combine_chunks() if isinstance(batch["a"], pa.ChunkedArray) else batch["a"]
        b = batch["b"].combine_chunks() if isinstance(batch["b"], pa.ChunkedArray) else batch["b"]
        return pa.table(
            {
                "u": pa.concat_arrays([pc.cast(a, pa.int64()), pc.cast(b, pa.int64())]),
                "v": pa.concat_arrays([pc.cast(b, pa.int64()), pc.cast(a, pa.int64())]),
            }
        )

    edges = pairs.select_columns(["a", "b"]).map_batches(
        undirected, batch_format="pyarrow"
    ).materialize()  # reused every iteration — materialize once

    if edges.count() == 0:
        # A corpus with no near-dup pairs is a normal input. The
        # materialized empty edge set yields zero-column blocks that the
        # first Dataset.join rejects inside acero ("No match or multiple
        # matches for key field reference FieldRef.Name(u)" on Ray
        # 2.49.2), so short-circuit with an explicit-schema empty result.
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                }
            )
        )

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["u"], "label": batch["u"]})

    _EMPTY_LABELS = pa.table(
        {"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
    )

    def min_partial(batch: pa.Table) -> pa.Table:
        # hash-shuffle stages (join finalize, union+aggregate) emit
        # ZERO-COLUMN empty blocks; normalize them or acero's next join
        # dies with "No match for FieldRef(node) on right side"
        if batch.num_rows == 0 or "node" not in batch.schema.names:
            return _EMPTY_LABELS
        df = (
            pd.DataFrame(
                {
                    "node": batch["node"].to_numpy(zero_copy_only=False),
                    "label": batch["label"].to_numpy(zero_copy_only=False),
                }
            )
            .groupby("node", as_index=False)
            .agg(label=("label", "min"))
        )
        return _table_from_pandas(df)

    def group_min(ds):
        # the trailing repartition is load-bearing: the hash aggregate
        # emits ZERO-COLUMN blocks for empty partitions, map_batches
        # SKIPS empty blocks (so they cannot be normalized by a UDF),
        # and a later Dataset.join over such a block dies inside acero
        # ("No match for FieldRef(node) on right side"). repartition is
        # a split/coalesce (no shuffle) that concatenates them away.
        return (
            ds.map_batches(min_partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .repartition(max(4, _fb_buckets()))
        )

    labels = group_min(edges.map_batches(seed, batch_format="pyarrow")).materialize()

    def checksum(ds) -> tuple:
        row = ds.aggregate(Sum("label", alias_name="s"))
        return (row["s"], ds.count())

    prev = checksum(labels)
    converged = False
    for _ in range(max_iters):
        # neighbor labels: edges (u,v) ⋈ labels(node=u) → candidate (v, label(u)).
        # The projection+rename is an opaque map_batches on purpose: a
        # select_columns+rename_columns chain here gets PUSHED BELOW the
        # join by the logical optimizer, renaming left 'v'→'node' before
        # the join runs and making the right key FieldRef ambiguous
        # (ArrowInvalid: multiple matches for 'node').
        neigh = edges.join(
            labels,
            join_type="inner",
            num_partitions=max(4, _fb_buckets()),
            on=("u",),
            right_on=("node",),
        ).map_batches(
            lambda t: (
                _EMPTY_LABELS
                if t.num_rows == 0 or "v" not in t.schema.names
                else pa.table({"node": t["v"], "label": t["label"]})
            ),
            batch_format="pyarrow",
        )
        labels = group_min(labels.union(neigh)).materialize()
        cur = checksum(labels)
        if cur == prev:
            converged = True
            break
        prev = cur

    if not converged:
        # labels were still changing when max_iters ran out: a component
        # with diameter > max_iters would silently get split into several
        # cluster_ids. Surface it rather than returning wrong clusters.
        raise RuntimeError(
            f"duplicate_clusters did not converge within max_iters={max_iters} "
            "iterations (a duplicate component's diameter exceeds it); "
            "re-run with a larger max_iters"
        )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pc.cast(batch["node"], pa.int64()),
                "cluster_id": pc.cast(batch["label"], pa.int64()),
            }
        )

    return labels.map_batches(finish, batch_format="pyarrow")
