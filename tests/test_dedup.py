"""Dedup pipeline tests on small hermetic datasets."""

from __future__ import annotations

import numpy as np
import pytest

from newslookout_ray.pipelines import dedup

DOCS = [
    {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog again and again"},
    {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog again and again"},  # exact dup of 1
    {"doc_id": 3, "text": "the quick brown fox jumps over the lazy dog again and agaim"},  # near dup
    {"doc_id": 4, "text": "completely different content about databases and query engines"},
    {"doc_id": 5, "text": "yet another unrelated string mentioning distributed execution"},
]


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data

    return ray.data.from_items(DOCS)


@pytest.mark.usefixtures("ray_session")
class TestExactDedup:
    def test_keeper_min_id_and_counts(self, docs_ds):
        out = {r["keeper_id"]: r["n_dups"] for r in dedup.exact_dedup(docs_ds).take_all()}
        assert out[1] == 2  # doc 2 collapsed into doc 1
        assert 2 not in out
        assert out[3] == out[4] == out[5] == 1


@pytest.mark.usefixtures("ray_session")
class TestNearDup:
    def test_exact_ngram_pairs(self, docs_ds):
        # word-3-gram jaccard: identical docs = 1.0; the one-word edit in
        # doc 3 breaks 3 of its 10 trigrams (j ≈ 0.54) → threshold 0.5
        t = dedup.ngram_jaccard_pairs(docs_ds, threshold=0.5)
        pairs = set(zip(t["a"].to_pylist(), t["b"].to_pylist()))
        assert (1, 2) in pairs  # identical
        assert (1, 3) in pairs and (2, 3) in pairs  # near dup
        assert all(a < b for a, b in pairs)
        assert not any(4 in p or 5 in p for p in pairs)

    def test_minhash_lsh_finds_same_pairs(self, docs_ds):
        exact = dedup.ngram_jaccard_pairs(docs_ds, threshold=0.5)
        exact_pairs = set(zip(exact["a"].to_pylist(), exact["b"].to_pylist()))
        lsh = dedup.minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()
        lsh_pairs = set(zip(lsh["a"], lsh["b"]))
        assert lsh_pairs == exact_pairs

    def test_minhash_distributed_paths_equal(self, docs_ds, monkeypatch):
        """Force the scale paths (band self-join + text re-joins via
        band_limit=0 / pair_limit=0): identical result to the
        driver-side small path, and NO unbounded driver collection —
        every collect_table call on the forced path is a limit-probe
        of at most limit+1 rows (here 1)."""
        small = dedup.minhash_lsh_pairs(docs_ds, threshold=0.5).to_pandas()

        collected_rows = []
        real_collect = dedup.collect_table

        def spying_collect(ds):
            t = real_collect(ds)
            collected_rows.append(t.num_rows)
            return t

        monkeypatch.setattr(dedup, "collect_table", spying_collect)
        big_ds = dedup.minhash_lsh_pairs(
            docs_ds, threshold=0.5, band_limit=0, pair_limit=0
        )
        # the two limit(N+1) probes are the only driver materializations
        assert collected_rows == [1, 1]
        big = big_ds.to_pandas()
        assert list(map(tuple, small.values)) == list(map(tuple, big.values))

    def test_minhash_signature_deterministic(self):
        stage = dedup.MinHashStage()
        s1 = stage.signature(DOCS[0]["text"])
        s2 = dedup.MinHashStage().signature(DOCS[0]["text"])
        assert (s1 == s2).all()

    def test_simhash_identical_and_near(self, docs_ds):
        t = dedup.simhash_table(docs_ds).to_pandas().set_index("doc_id")["simhash"]
        assert t[1] == t[2]
        ham13 = bin(int(t[1]) ^ int(t[3])).count("1")
        ham14 = bin(int(t[1]) ^ int(t[4])).count("1")
        assert ham13 < ham14  # near-dup closer than unrelated

    def test_simhash_near_pairs(self, docs_ds):
        pairs = dedup.simhash_near_pairs(docs_ds, max_hamming=8).to_pandas()
        got = set(zip(pairs["a"], pairs["b"]))
        assert (1, 2) in got
        assert all(h <= 8 for h in pairs["hamming"])

    def test_simhash_banded_vs_exact_allpairs(self, ray_session):
        """Ground-truth check of the banded search: vs exact all-pairs
        hamming on a 200-doc corpus, recall at hamming<=3 must be 100%
        (pigeonhole guarantee of 4x16-bit bands) and every reported
        pair's hamming must be exact and within the radius."""
        import ray.data

        rng = np.random.RandomState(7)
        words = [f"w{i}" for i in range(50)]
        docs = []
        for i in range(100):
            base = list(rng.choice(words, size=30))
            docs.append({"doc_id": 2 * i, "text": " ".join(base)})
            mut = list(base)
            mut[int(rng.randint(30))] = str(rng.choice(words))  # near-dup twin
            docs.append({"doc_id": 2 * i + 1, "text": " ".join(mut)})
        ds = ray.data.from_items(docs)

        sig = dedup.simhash_table(ds).to_pandas().set_index("doc_id")["simhash"]
        ids = sorted(sig.index)
        exact = {}
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                h = bin(int(sig[ids[x]]) ^ int(sig[ids[y]])).count("1")
                exact[(ids[x], ids[y])] = h

        out = dedup.simhash_near_pairs(ds, max_hamming=3).to_pandas()
        got = {(int(r.a), int(r.b)): int(r.hamming) for r in out.itertuples()}
        # precision: every reported hamming is the true hamming, <= radius
        for pair, h in got.items():
            assert exact[pair] == h and h <= 3
        # recall: every true pair within hamming<=3 was found
        truth = {p for p, h in exact.items() if h <= 3}
        assert truth and truth == set(got)


@pytest.mark.usefixtures("ray_session")
class TestEmbeddingNearDup:
    def test_threshold_pairs(self):
        import ray.data

        rng = np.random.default_rng(4)
        base = rng.normal(size=16)
        rows = [
            {"vec_id": 0, "embedding": list(base)},
            {"vec_id": 1, "embedding": list(base + rng.normal(scale=0.01, size=16))},  # near dup
            {"vec_id": 2, "embedding": list(rng.normal(size=16))},
        ]
        ds = ray.data.from_items(rows)
        out = dedup.embedding_near_pairs(ds, threshold=0.95).to_pandas()
        assert set(zip(out["a"], out["b"])) == {(0, 1)}
        assert out["cosine"].iloc[0] > 0.99

    def test_lsh_high_sim_regime(self, ray_session):
        """Design regime: clusters of near-identical vectors (cosine
        >= 0.95). Precision must be exact (every emitted pair is a true
        pair with the true cosine); recall deterministic-high."""
        import ray.data

        rng = np.random.default_rng(7)
        rows, truth = [], set()
        vid = 0
        for c in range(12):
            base = rng.normal(size=64)
            members = []
            for _ in range(3):
                rows.append(
                    {"vec_id": vid, "embedding": list(base + rng.normal(scale=0.02, size=64))}
                )
                members.append(vid)
                vid += 1
            truth |= {(a, b) for i, a in enumerate(members) for b in members[i + 1 :]}
        for _ in range(40):  # background noise vectors
            rows.append({"vec_id": vid, "embedding": list(rng.normal(size=64))})
            vid += 1
        ds = ray.data.from_items(rows)
        exact = dedup.embedding_near_pairs(ds, threshold=0.95).to_pandas()
        exact_pairs = set(zip(exact["a"], exact["b"]))
        assert exact_pairs == truth  # sanity: clusters are the truth
        got = dedup.embedding_near_pairs_lsh(
            ds, threshold=0.95, bits=8, tables=6
        ).to_pandas()
        got_pairs = set(zip(got["a"], got["b"]))
        assert got_pairs <= exact_pairs  # exact precision by construction
        assert len(got_pairs) / len(exact_pairs) >= 0.9  # deterministic seeds
        # cosines of recalled pairs equal the exact kernel's values
        em = {(a, b): c for a, b, c in zip(exact["a"], exact["b"], exact["cosine"])}
        for a, b, c in zip(got["a"], got["b"], got["cosine"]):
            assert abs(em[(a, b)] - c) < 1e-9

    def test_lsh_low_threshold_wide_recall(self, ray_session):
        """The sf-testdata regime (all true pairs at cosine 0.4-0.6):
        wide-recall params (3 bits x 12 tables) must recover >= 90% of
        the exact pairs, with no false pairs."""
        import ray.data

        sf = "/root/testdata/sf0.001"
        ds = ray.data.read_parquet(f"{sf}/embeddings.parquet")
        exact = dedup.embedding_near_pairs(ds, threshold=0.4).to_pandas()
        exact_pairs = set(zip(exact["a"], exact["b"]))
        got = dedup.embedding_near_pairs_lsh(
            ds, threshold=0.4, bits=3, tables=12
        ).to_pandas()
        got_pairs = set(zip(got["a"], got["b"]))
        assert got_pairs <= exact_pairs
        if exact_pairs:
            assert len(got_pairs) / len(exact_pairs) >= 0.9


@pytest.mark.usefixtures("ray_session")
class TestDuplicateClusters:
    def _truth(self, n_nodes, edges):
        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        members = {x for e in edges for x in e}
        return {x: find(x) for x in members}

    def test_min_label_matches_union_find(self):
        import ray.data

        # two transitive chains (0-1-2-3, 10-11), one triangle with a
        # long bridge (20-21, 21-22, 22-99), plus an isolated pair
        edges = [(0, 1), (1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 99), (50, 51)]
        pairs = ray.data.from_items([{"a": a, "b": b} for a, b in edges])
        got = (
            dedup.duplicate_clusters(pairs)
            .to_pandas()
            .set_index("doc_id")["cluster_id"]
            .to_dict()
        )
        assert got == self._truth(100, edges)

    def test_single_edge_and_idempotent(self):
        import ray.data

        pairs = ray.data.from_items([{"a": 7, "b": 3}])
        got = dedup.duplicate_clusters(pairs).to_pandas()
        got = got.sort_values("doc_id").reset_index(drop=True)
        assert list(got["doc_id"]) == [3, 7]
        assert list(got["cluster_id"]) == [3, 3]

    def test_empty_pairs_returns_empty_clusters(self):
        # A corpus with no near-dup pairs must yield an empty result with
        # the full (doc_id, cluster_id) schema, not an acero join crash.
        import pyarrow as pa
        import ray.data

        pairs = ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        )
        got = dedup.duplicate_clusters(pairs)
        # Ray's to_pandas() drops columns on a 0-row dataset; the Dataset
        # schema is the contract the driver compares against.
        assert got.schema().names == ["doc_id", "cluster_id"]
        assert got.count() == 0

    def test_non_convergence_raises(self):
        import ray.data

        # a path graph of diameter 6; min-label propagation needs ~6
        # iterations, so max_iters=2 must be detected as non-converged
        edges = [(i, i + 1) for i in range(6)]
        pairs = ray.data.from_items([{"a": a, "b": b} for a, b in edges])
        with pytest.raises(RuntimeError, match="did not converge"):
            dedup.duplicate_clusters(pairs, max_iters=2)


@pytest.mark.usefixtures("ray_session")
class TestSimhashGolden:
    def test_sf0001_content_hash_pinned(self):
        """dedup_simhash is deterministic (fixed seed hyperplanes), just
        not SQL-expressible — the driver's check is rows-only, so this
        pin is the regression lock for the signature math."""
        from newslookout_ray import api

        from _golden import canon_hash

        got = api.queries()["dedup_simhash"]("/root/testdata/sf0.001").to_pandas()
        assert canon_hash(got) == "d390f2b4d4dbee5b"
