"""ANN similarity search: brute-force correctness vs numpy, LSH recall."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from newslookout_ray.pipelines import similarity

N, DIM = 200, 32


def _corpus():
    rng = np.random.default_rng(9)
    return rng.normal(size=(N, DIM))


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data

    mat = _corpus()
    return ray.data.from_items(
        [{"vec_id": i, "embedding": list(map(float, mat[i]))} for i in range(N)]
    )


@pytest.mark.usefixtures("ray_session")
class TestBruteForce:
    def test_matches_numpy_ground_truth(self, emb_ds):
        mat = _corpus()
        norm = mat / np.linalg.norm(mat, axis=1)[:, None]
        sims = norm @ norm.T
        queries = [0, 7, 33]
        got = similarity.brute_force_topk(emb_ds, queries, k=5).to_pandas()
        for q in queries:
            order = sorted(
                ((float(sims[q, j]), j) for j in range(N) if j != q),
                key=lambda t: (-t[0], t[1]),
            )[:5]
            expect = [j for _, j in order]
            mine = got[got["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
            assert mine == expect, q

    def test_rank_dense(self, emb_ds):
        got = similarity.brute_force_topk(emb_ds, [1, 2], k=5).to_pandas()
        for q, grp in got.groupby("query_id"):
            assert sorted(grp["rank"]) == [1, 2, 3, 4, 5]


@pytest.mark.usefixtures("ray_session")
class TestLSH:
    def test_recall_against_brute_force(self, emb_ds):
        queries = list(range(10))
        bf = similarity.brute_force_topk(emb_ds, queries, k=5).to_pandas()
        lsh = similarity.lsh_topk(emb_ds, queries, k=5, bits=6).to_pandas()
        bf_set = set(zip(bf["query_id"], bf["neighbor_id"]))
        lsh_set = set(zip(lsh["query_id"], lsh["neighbor_id"]))
        recall = len(bf_set & lsh_set) / len(bf_set)
        assert recall >= 0.5, recall  # approximate by design; recall bounded

    def test_ivf_recall_against_brute_force(self, emb_ds):
        queries = list(range(10))
        bf = similarity.brute_force_topk(emb_ds, queries, k=5).to_pandas()
        ivf = similarity.ivf_topk(emb_ds, queries, k=5, n_centroids=8, nprobe=3).to_pandas()
        bf_set = set(zip(bf["query_id"], bf["neighbor_id"]))
        ivf_set = set(zip(ivf["query_id"], ivf["neighbor_id"]))
        recall = len(bf_set & ivf_set) / len(bf_set)
        assert recall >= 0.5, recall  # nprobe/n_centroids trade-off

    def test_train_mask_keeps_small_corpora_identical(self):
        # m stays at the historical 2 (25% sample) whenever tightening
        # would dip under 4*train_limit — sf-scale centroids/goldens
        # unchanged by the driver-bound fix
        assert similarity._ivf_sample_mask_bits(5000, 4096) == 2
        assert similarity._ivf_sample_mask_bits(0, 4096) == 2

    def test_train_sample_bounded_on_100x_corpus(self, monkeypatch):
        # the index-build path must never collect O(corpus) rows on the
        # driver: on a corpus 100x train_limit the hash mask tightens so
        # the collected sample stays within [train_limit, 8*train_limit]
        import ray.data

        train_limit = 32
        n = 100 * train_limit
        rng = np.random.default_rng(1)
        mat = rng.normal(size=(n, 4))
        ds = ray.data.from_items(
            [{"vec_id": i, "embedding": list(map(float, mat[i]))} for i in range(n)]
        )
        seen = {}
        real = similarity.collect_rows

        def spy(d):
            rows = real(d)
            seen["n"] = len(rows)
            return rows

        monkeypatch.setattr(similarity, "collect_rows", spy)
        cent = similarity._ivf_train(ds, n_centroids=4, train_limit=train_limit)
        assert cent.shape[0] == 4
        assert train_limit <= seen["n"] <= 8 * train_limit

    def test_ivf_deterministic_and_true_cosines(self, emb_ds):
        mat = _corpus()
        norm = mat / np.linalg.norm(mat, axis=1)[:, None]
        a = similarity.ivf_topk(emb_ds, [3], k=5, n_centroids=8, nprobe=3).to_pandas()
        b = similarity.ivf_topk(emb_ds, [3], k=5, n_centroids=8, nprobe=3).to_pandas()
        assert a.equals(b)
        for _, row in a.iterrows():
            true_c = float(norm[int(row["query_id"])] @ norm[int(row["neighbor_id"])])
            assert true_c - row["cosine"] < 1e-5 and row["cosine"] <= true_c + 1e-9

    def test_lsh_results_are_true_cosines(self, emb_ds):
        mat = _corpus()
        norm = mat / np.linalg.norm(mat, axis=1)[:, None]
        lsh = similarity.lsh_topk(emb_ds, [3], k=5, bits=6).to_pandas()
        for _, row in lsh.iterrows():
            true_c = float(norm[int(row["query_id"])] @ norm[int(row["neighbor_id"])])
            assert abs(true_c - row["cosine"]) < 1e-5


class TestEmptyBatches:
    """Empty Arrow blocks (post-filter) must not crash the vectorized
    kernels or emit schema-incompatible tables."""

    def test_list_column_matrix_empty_fixed_and_variable(self):
        from newslookout_ray.pipelines.similarity import list_column_matrix

        fixed = pa.array([], pa.list_(pa.float32(), 4))
        var = pa.array([], pa.list_(pa.float64()))
        assert list_column_matrix(fixed).shape == (0, 4)
        assert list_column_matrix(var).shape == (0, 0)

    def test_featurize_embedding_empty_batch_schema(self):
        from newslookout_ray.pipelines.processors import make_featurize_for_dedup

        feat = make_featurize_for_dedup("embedding")
        schema = pa.schema(
            [
                ("url", pa.string()),
                ("module", pa.string()),
                ("pubdate", pa.date32()),
                ("text", pa.string()),
                ("embedding", pa.list_(pa.float64())),
            ]
        )
        empty = pa.table(
            {n: pa.array([], t) for n, t in zip(schema.names, schema.types)}
        )
        full = pa.table(
            {
                "url": ["u1"],
                "module": ["m"],
                "pubdate": pa.array([0], pa.date32()),
                "text": ["hello world"],
                "embedding": pa.array([[1.0, 0.0, 0.0]], pa.list_(pa.float64())),
            }
        )
        out_e, out_f = feat(empty), feat(full)
        assert out_e.num_rows == 0 and out_f.num_rows == 1
        # the empty block's schema must unify with the non-empty one
        assert out_e.schema.field("vec").type == out_f.schema.field("vec").type


@pytest.mark.usefixtures("ray_session")
class TestIvfIndexed:
    def test_equals_ivf_topk_and_prunes_the_read(self, emb_ds, tmp_path, monkeypatch):
        import os
        import re

        import ray.data

        from newslookout_ray.pipelines import similarity as sim

        path = str(tmp_path / "ivf")
        sim.ivf_build_index(emb_ds, path, n_centroids=8)
        queries = [3, 17]
        nprobe = 2

        # capture every read_parquet path list the indexed search issues
        read_calls = []
        real_read = ray.data.read_parquet

        def spy(paths, *a, **kw):
            read_calls.append(paths)
            return real_read(paths, *a, **kw)

        monkeypatch.setattr(ray.data, "read_parquet", spy)
        got = (
            sim.ivf_topk_indexed(path, queries, k=5, nprobe=nprobe)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        monkeypatch.undo()
        want = (
            sim.ivf_topk(emb_ds, queries, k=5, n_centroids=8, nprobe=nprobe)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        import pandas as pd

        pd.testing.assert_frame_equal(got, want)
        # pruning asserted DIRECTLY: the candidate scan (the read that got
        # an explicit file list) touches only <= len(queries)*nprobe of
        # the written list_id= partition dirs — a strict subset
        all_dirs = {
            d
            for d in os.listdir(os.path.join(path, "lists"))
            if d.startswith("list_id=")
        }
        assert len(all_dirs) > len(queries) * nprobe  # something to prune
        file_lists = [p for p in read_calls if isinstance(p, list)]
        assert len(file_lists) == 1  # exactly one pruned candidate scan
        probed_dirs = {
            re.search(r"list_id=\d+", f).group(0) for f in file_lists[0]
        }
        assert probed_dirs <= all_dirs
        assert 0 < len(probed_dirs) <= len(queries) * nprobe
        # centroids sidecar exists
        assert os.path.exists(os.path.join(path, "centroids.parquet"))
