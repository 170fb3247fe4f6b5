"""Approximate-nearest-neighbor similarity search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``) and every batch of the corpus does one float64 matmul
against it, emitting per-(query, corpus-row) partial top-k rows that a
final small groupby reduces. Scale path: an LSH-bucketed variant
(random-hyperplane signatures) that only compares within matching
buckets — sub-linear candidate sets at the cost of recall, measured
against the brute-force baseline in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import floor_round  # noqa: F401  (re-export; scalar twin of the
# vectorized np.floor(x*1e6)/1e6 used in the score stages)
from ..util import collect_rows, fb_buckets as _fb_buckets


def _normalized(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def _rows_to_matrix(rows, id_col="vec_id", vec_col="embedding"):
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    return ids, mat


def list_column_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, d) matrix from a fixed-width list<float> Arrow column in one
    flatten + one astype — replaces per-row ``to_pylist`` conversions in
    GEMM stages (they were the only per-row Python left in otherwise
    vectorized scoring batches)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:  # reshape(0, -1) cannot infer a width
        d = col.type.list_size if pa.types.is_fixed_size_list(col.type) else 0
        return np.empty((0, d), dtype=dtype)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(len(col), -1).astype(dtype, copy=False)


def id_column_array(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _empty_scores() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )


def _reduce_topk_bucketed(partials, k: int):
    """Global (query, neighbor) dedup + per-query top-k as a hash(query)
    bucket groupby: ONE vectorized sort + cythonized groupby.head/cumcount
    per bucket (~2×cpus buckets) — no per-query Python calls."""
    num_buckets = _fb_buckets()

    def add_fb(t: pa.Table) -> pa.Table:
        q = t["query_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__fb", pa.array((pd.util.hash_array(q) % num_buckets).astype(np.int32))
        )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["query_id", "neighbor_id"])
        df = df.sort_values(
            ["query_id", "cosine", "neighbor_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df = df.groupby("query_id", sort=False).head(k)
        df = df.assign(rank=(df.groupby("query_id", sort=False).cumcount() + 1))
        return df[["query_id", "neighbor_id", "cosine", "rank"]]

    return (
        partials.map_batches(add_fb, batch_format="pyarrow")
        .groupby("__fb")
        .map_groups(pick, batch_format="pandas")
    )


def brute_force_topk(embeddings, query_ids, k: int = 5):
    """Top-k cosine neighbors (excluding self) for each query id.

    → (query_id, neighbor_id, rank, cosine) with rank 1..k; deterministic
    tie-break on neighbor_id ascending.
    """
    import ray

    q_rows = collect_rows(
        embeddings.map_batches(
            lambda t: t.filter(pa.compute.is_in(t["vec_id"], value_set=pa.array(query_ids))),
            batch_format="pyarrow",
        )
    )
    qids, qmat = _rows_to_matrix(q_rows)
    qref = ray.put((qids, _normalized(qmat)))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        ids, qm = ray.get(qref)
        bids = id_column_array(batch["vec_id"])
        bmat = _normalized(list_column_matrix(batch["embedding"]))
        sims = qm @ bmat.T  # (n_queries, batch)
        # self-exclusion, then a per-query numpy top-k: argpartition for
        # the k best by RAW sim, widened to include boundary ties so the
        # (-sim, neighbor_id) order is reproduced exactly — no
        # per-candidate Python in the combiner
        sims[np.equal(ids[:, None], bids[None, :])] = -np.inf
        k2 = min(k, sims.shape[1])
        out_q, out_n, out_c = [], [], []
        for qi in range(len(ids)):
            s = sims[qi]
            if k2 < len(s):
                kth = s[np.argpartition(-s, k2 - 1)[:k2]].min()
                cand = np.flatnonzero(s >= kth)
            else:
                cand = np.flatnonzero(s > -np.inf)
            order = np.lexsort((bids[cand], -s[cand]))[:k2]
            take = cand[order]
            out_q.append(np.full(len(take), ids[qi], dtype=np.int64))
            out_n.append(bids[take])
            out_c.append(s[take])
        if out_q:
            cos = np.concatenate(out_c)
            # floor-truncate to 6 digits, vectorized (matches floor_round)
            cos = np.floor(cos * 1e6) / 1e6
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                    "cosine": pa.array(cos, pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )

    partials = embeddings.map_batches(score, batch_format="pyarrow", batch_size=1024)
    return _reduce_topk_bucketed(partials, k)


class HyperplaneLSH:
    """Random-hyperplane signatures (fixed seed) for cosine LSH bucketing."""

    def __init__(self, dim: int = 64, bits: int = 12, seed: int = 0xA11CE):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(bits, dim))
        self.bits = bits

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        proj = mat @ self.planes.T > 0
        weights = (1 << np.arange(self.bits, dtype=np.int64))
        return (proj.astype(np.int64) * weights[None, :]).sum(axis=1)


def kmeans_fit(mat: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 0xC3) -> np.ndarray:
    """Deterministic spherical k-means over unit vectors (seeded init,
    fixed iteration count, cosine assignment). IVF coarse quantizer
    training — always on a driver-side SAMPLE, as in any IVF build."""
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)
    cent = mat[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(
    embeddings,
    query_ids,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_limit: int = 4096,
):
    """IVF-flat ANN: a coarse quantizer (spherical k-means, trained on a
    deterministic hash-sample of the corpus) partitions vectors into
    ``n_centroids`` inverted lists; each query is compared only against
    corpus rows whose nearest centroid is among the query's ``nprobe``
    closest centroids. The corpus STREAMS — every batch does one
    assignment matmul vs the broadcast centroids and one scoring matmul
    per probed centroid present in the batch; only centroids + queries
    are broadcast. Same output schema as brute_force_topk; recall < 1 by
    design, measured against brute force in tests.

    100-TB shape: at scale the assignment pass would be materialized
    once as a partition column (write_parquet partition_cols=[list_id])
    so probes prune whole files; here assignment is fused into scoring.
    """
    import ray

    # deterministic hash-sample for training (streaming filter, no sort;
    # shared with ivf_build_index so a materialized index is bit-equal)
    cent = _ivf_train(embeddings, n_centroids, train_limit)

    q_rows = collect_rows(
        embeddings.map_batches(
            lambda t: t.filter(pa.compute.is_in(t["vec_id"], value_set=pa.array(query_ids))),
            batch_format="pyarrow",
        )
    )
    qids, qmat = _rows_to_matrix(q_rows)
    qn = _normalized(qmat)
    # per-query probe set → inverted: centroid -> query indices
    order = np.argsort(-(qn @ cent.T), axis=1)[:, : min(nprobe, len(cent))]
    probe_sets: dict = {}
    for qi, cents in enumerate(order):
        for c in cents:
            probe_sets.setdefault(int(c), []).append(qi)
    probe_sets = {c: np.asarray(v, dtype=np.int64) for c, v in probe_sets.items()}
    ref = ray.put((qids, qn, cent, probe_sets))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        ids, qm, centroids, probes = ray.get(ref)
        bids = id_column_array(batch["vec_id"])
        bmat = _normalized(list_column_matrix(batch["embedding"]))
        assign = np.argmax(bmat @ centroids.T, axis=1)
        # per-CENTROID loop (<= n_centroids iterations), vectorized emit:
        # one GEMM + repeat/tile flatten per inverted list — no per-pair
        # Python
        frames_q, frames_n, frames_c = [], [], []
        for c in np.unique(assign):
            q_idx = probes.get(int(c))
            if q_idx is None or not len(q_idx):
                continue
            qsel = np.asarray(q_idx, dtype=np.int64)
            rows = np.flatnonzero(assign == c)
            sims = qm[qsel] @ bmat[rows].T  # (probing queries, list rows)
            qq = np.repeat(ids[qsel], len(rows))
            nn = np.tile(bids[rows], len(qsel))
            keep = qq != nn  # self-exclusion
            frames_q.append(qq[keep])
            frames_n.append(nn[keep])
            frames_c.append(np.floor(sims.reshape(-1)[keep] * 1e6) / 1e6)
        if not frames_q:
            return _empty_scores()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(frames_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(frames_n), pa.int64()),
                "cosine": pa.array(np.concatenate(frames_c), pa.float64()),
            }
        )

    partials = embeddings.map_batches(score, batch_format="pyarrow", batch_size=1024)
    return _reduce_topk_bucketed(partials, k)


def lsh_topk(embeddings, query_ids, k: int = 5, bits: int = 8, tables: int = 4):
    """LSH-bucketed ANN: ``tables`` independent hyperplane hash tables;
    a query is compared only against corpus rows sharing its bucket (or a
    Hamming-1 neighbor bucket) in ANY table — the classic L-tables
    recall/candidate-count trade-off.

    Returns the same schema as brute_force_topk; recall < 1 by design —
    tests measure recall against the brute-force baseline.
    """
    import ray

    q_rows = collect_rows(
        embeddings.map_batches(
            lambda t: t.filter(pa.compute.is_in(t["vec_id"], value_set=pa.array(query_ids))),
            batch_format="pyarrow",
        )
    )
    qids, qmat = _rows_to_matrix(q_rows)
    qn = _normalized(qmat)
    dim = qmat.shape[1]
    lshs = [HyperplaneLSH(dim=dim, bits=bits, seed=0xA11CE + t) for t in range(tables)]
    # probe map: (table, bucket) → query indices; query probes its bucket
    # plus all hamming-1 buckets in every table
    probe = {}
    for t, lsh in enumerate(lshs):
        qbuckets = lsh.bucket(qn)
        for i, b in enumerate(qbuckets):
            for tb in [int(b)] + [int(b) ^ (1 << j) for j in range(bits)]:
                probe.setdefault((t, tb), []).append(i)
    probe = {key: np.asarray(v, dtype=np.int64) for key, v in probe.items()}
    qref = ray.put((qids, qn, probe))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        ids, qm, probe_map = ray.get(qref)
        bids = id_column_array(batch["vec_id"])
        bmat = _normalized(list_column_matrix(batch["embedding"]))
        # candidate (query, row) pairs built per unique BUCKET (<= 2^bits
        # tiny iterations per table, each pure repeat/tile), then one
        # np.unique pair-dedup and ONE row-gathered einsum for every
        # cosine — no per-row or per-pair Python
        pair_q, pair_j = [], []
        for t in range(tables):
            buckets = HyperplaneLSH(
                dim=bmat.shape[1], bits=bits, seed=0xA11CE + t
            ).bucket(bmat)  # one matmul per table for the whole batch
            uniq, inv = np.unique(buckets, return_inverse=True)
            for u_i, u in enumerate(uniq):
                q_idx = probe_map.get((t, int(u)))
                if q_idx is None or not len(q_idx):
                    continue
                rows = np.flatnonzero(inv == u_i)
                pair_q.append(np.repeat(q_idx, len(rows)))
                pair_j.append(np.tile(rows, len(q_idx)))
        if not pair_q:
            return _empty_scores()
        qi_arr = np.concatenate(pair_q)
        j_arr = np.concatenate(pair_j)
        key = qi_arr * np.int64(len(bids)) + j_arr  # dedup cross-table hits
        _, first = np.unique(key, return_index=True)
        qi_arr, j_arr = qi_arr[first], j_arr[first]
        keep = ids[qi_arr] != bids[j_arr]  # self-exclusion
        qi_arr, j_arr = qi_arr[keep], j_arr[keep]
        if not len(qi_arr):
            return _empty_scores()
        cos = np.einsum("ij,ij->i", qm[qi_arr], bmat[j_arr])
        return pa.table(
            {
                "query_id": pa.array(ids[qi_arr], pa.int64()),
                "neighbor_id": pa.array(bids[j_arr], pa.int64()),
                "cosine": pa.array(np.floor(cos * 1e6) / 1e6, pa.float64()),
            }
        )

    partials = embeddings.map_batches(score, batch_format="pyarrow", batch_size=1024)
    return _reduce_topk_bucketed(partials, k)


# ---------------------------------------------------------------------------
# materialized IVF index: assignment as a partition column, probe-pruned read
# ---------------------------------------------------------------------------


def _ivf_sample_mask_bits(n: int, train_limit: int) -> int:
    """Mask width m (filter: vec_id & (2^m − 1) == 0) sizing the training
    sample to O(train_limit) instead of a fixed 25% of the corpus — at
    10^10 embeddings a fixed-fraction sample is a driver OOM in the
    index-build path. Starts at the historical m=2 (so small corpora keep
    the exact same sample/centroids as before) and widens the mask while
    the halved sample would still hold ≥ 4·train_limit rows, so the
    driver-held sample is bounded by ~8·train_limit regardless of n."""
    m = 2
    while (n >> (m + 1)) >= 4 * train_limit:
        m += 1
    return m


def _ivf_train(embeddings, n_centroids: int, train_limit: int) -> np.ndarray:
    """The deterministic hash-sample + spherical-kmeans training shared by
    ivf_topk and ivf_build_index (identical centroids by construction).

    The sample stays O(train_limit) on the driver: the vec_id hash mask
    is tightened from a cheap count() before anything is collected
    (deterministic — sequential ids hit every 2^m-th row), then sorted
    by vec_id and capped, so centroids depend only on (corpus, limit)."""
    mask = (1 << _ivf_sample_mask_bits(embeddings.count(), train_limit)) - 1
    sample_rows = collect_rows(
        embeddings.map_batches(
            lambda t: t.filter(
                pa.compute.equal(pa.compute.bit_wise_and(t["vec_id"], mask), 0)
            ),
            batch_format="pyarrow",
        )
    )
    sample_rows.sort(key=lambda r: r["vec_id"])
    _, smat = _rows_to_matrix(sample_rows[:train_limit])
    return kmeans_fit(_normalized(smat), n_centroids)


def ivf_build_index(embeddings, path: str, n_centroids: int = 16, train_limit: int = 4096):
    """Materialize the IVF index ivf_topk's docstring promises at scale:
    centroids.parquet + the corpus hive-partitioned by ``list_id``.

    Assignment is one matmul per batch against the broadcast centroids;
    ``write_parquet(partition_cols=["list_id"])`` fans each block into
    its partition files locally — no shuffle. A probe-pruned search then
    skips whole partition DIRECTORIES at the read (ivf_topk_indexed)."""
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray

    cent = _ivf_train(embeddings, n_centroids, train_limit)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "centroid_id": pa.array(np.arange(len(cent)), pa.int64()),
                "vec": pa.array([list(v) for v in cent], pa.list_(pa.float64())),
            }
        ),
        os.path.join(path, "centroids.parquet"),
    )
    cref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        bmat = _normalized(list_column_matrix(batch["embedding"]))
        lid = (
            np.argmax(bmat @ c.T, axis=1).astype(np.int64)
            if len(bmat)
            else np.array([], np.int64)
        )
        return batch.append_column("list_id", pa.array(lid))

    embeddings.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(path, "lists"), partition_cols=["list_id"]
    )
    return path


def ivf_topk_indexed(path: str, query_ids, k: int = 5, nprobe: int = 4):
    """ANN top-k against a materialized IVF index (ivf_build_index):
    each query probes its ``nprobe`` closest centroids and ONLY those
    hive partition directories are read — file-level pruning at the
    read, skipping ≈ (1 - nprobe/n_centroids) of corpus bytes at scale.

    Same output as ivf_topk with identical params (same training sample,
    same centroids, same candidate lists — asserted in tests). The query
    vectors here come from one column-pruned scan of the index (a real
    deployment passes them in directly)."""
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data

    cent = np.array(
        pq.read_table(os.path.join(path, "centroids.parquet"))["vec"].to_pylist(),
        dtype=np.float64,
    )
    lists_dir = os.path.join(path, "lists")
    q_rows = collect_rows(
        ray.data.read_parquet(lists_dir, columns=["vec_id", "embedding"]).map_batches(
            lambda t: t.filter(
                pa.compute.is_in(t["vec_id"], value_set=pa.array(query_ids))
            ),
            batch_format="pyarrow",
        )
    )
    qids, qmat = _rows_to_matrix(q_rows)
    qn = _normalized(qmat)
    order = np.argsort(-(qn @ cent.T), axis=1)[:, : min(nprobe, len(cent))]
    probe_sets: dict = {}
    for qi, cents in enumerate(order):
        for c in cents:
            probe_sets.setdefault(int(c), []).append(qi)
    probe_sets = {c: np.asarray(v, dtype=np.int64) for c, v in probe_sets.items()}
    # THE index payoff: read only the probed partitions' files
    # (read_parquet takes one root dir or a list of FILES, not a list of
    # hive dirs — expand explicitly; the skipped directories are never
    # listed, let alone scanned)
    import glob as _glob

    probed_files = [
        f
        for c in sorted(probe_sets)
        for f in sorted(
            _glob.glob(os.path.join(lists_dir, f"list_id={c}", "*.parquet"))
        )
    ]
    if not probed_files:
        import pandas as _pd

        return ray.data.from_pandas(
            _pd.DataFrame(
                {
                    "query_id": _pd.Series([], dtype="int64"),
                    "neighbor_id": _pd.Series([], dtype="int64"),
                    "cosine": _pd.Series([], dtype="float64"),
                    "rank": _pd.Series([], dtype="int64"),
                }
            )
        )
    pruned = ray.data.read_parquet(probed_files, columns=["vec_id", "embedding"])
    ref = ray.put((qids, qn, cent, probe_sets))

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_scores()
        ids, qm, centroids, probes = ray.get(ref)
        bids = id_column_array(batch["vec_id"])
        bmat = _normalized(list_column_matrix(batch["embedding"]))
        # re-derive the list id (same centroids + same argmax as the
        # build's assignment — bit-identical), since reading a partition
        # dir directly drops the hive column
        assign = np.argmax(bmat @ centroids.T, axis=1)
        frames_q, frames_n, frames_c = [], [], []
        for c in np.unique(assign):
            q_idx = probes.get(int(c))
            if q_idx is None or not len(q_idx):
                continue
            rows = np.flatnonzero(assign == c)
            sims = qm[q_idx] @ bmat[rows].T
            qq = np.repeat(ids[q_idx], len(rows))
            nn = np.tile(bids[rows], len(q_idx))
            keep = qq != nn
            frames_q.append(qq[keep])
            frames_n.append(nn[keep])
            frames_c.append(np.floor(sims.reshape(-1)[keep] * 1e6) / 1e6)
        if not frames_q:
            return _empty_scores()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(frames_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(frames_n), pa.int64()),
                "cosine": pa.array(np.concatenate(frames_c), pa.float64()),
            }
        )

    partials = pruned.map_batches(score, batch_format="pyarrow", batch_size=1024)
    return _reduce_topk_bucketed(partials, k)
