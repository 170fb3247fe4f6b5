"""The data-processor chain: priority-ordered post-extraction stages.

The reference runs each DATA_PROCESSOR plugin over every article in
ascending priority order (O1 — queue_manager.py:416-423,
worker.py:504-523). Here the chain is an ordered list of
map_batches-compatible stages applied to the articles Dataset — the
user-extension surface is "register a stage with a priority"
(SURVEY.md §2.11).

Built-in processors (reference analogues):
  T14 dataprep          — mod_dataprep.py:74-108 (strip text)
  T13 keyword_flags     — mod_keywordflags.py:57-133 (20 trigger-word
      0/1 flag columns over lowercased text)
  M1  sentiment stub    — mod_eventclass.py:104-236 (FinBERT-shaped
      scorer: model state loaded once per actor, per-sentence batched
      scoring, per-article probability sums). The real model is not in
      this sandbox; the stub keeps the exact actor/batch interface and
      produces deterministic pseudo-probabilities, so swapping in a real
      model is a one-class change.
  M2  near-dedup        — mod_dedupe.py:83-281 (within publish-date
      groups ±0 days here: pairwise similarity >= 0.99 AND size
      difference <= 15% ⇒ the smaller/older article is marked duplicate)
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# T14 — dataprep
# ---------------------------------------------------------------------------


def dataprep_stage(batch: pa.Table) -> pa.Table:
    """Strip whitespace around the text (reference mod_dataprep semantics)."""
    idx = batch.schema.get_field_index("text")
    return batch.set_column(idx, "text", pc.utf8_trim_whitespace(batch["text"]))


# ---------------------------------------------------------------------------
# T13 — keyword flags processor
# ---------------------------------------------------------------------------


class KeywordFlagsStage:
    """Adds the 20 trigger-word flag columns. Vectorized RE2 pack
    (keyword_flags_batch_arrow — ~10× the Python re loop, equality
    property-tested vs the scalar kernel)."""

    def __init__(self):
        from ..functions.textkit import keyword_flags_batch_arrow

        self._kernel = keyword_flags_batch_arrow
        self._kernel(pa.array([""]))  # warm the RE2 compile

    def __call__(self, batch: pa.Table) -> pa.Table:
        flags = self._kernel(batch["text"])
        for name, arr in flags.items():
            batch = batch.append_column(name.lower(), pa.array(arr, pa.int8()))
        return batch


# ---------------------------------------------------------------------------
# M1 — sentiment scorer (model-actor stub with the FinBERT interface)
# ---------------------------------------------------------------------------

class SentimentStage:
    """FinBERT-shaped scorer stub.

    Interface parity with the reference (mod_eventclass.py):
      - model state built ONCE per actor in __init__ (the real version
        loads BertClassification weights here; the punkt segmenter —
        the analogue of its vendored nltk punkt model load,
        mod_eventclass.py:36-40 — is built here too);
      - sentences come from punkt-parity segmentation of the LOWERCASED
        text, matching ``sent_tokenize(textValue.lower())``
        (mod_eventclass.py:165) — abbreviation-heavy news text gets the
        same boundaries (and thus the same per-article sums once a real
        model is plugged in) as the reference;
      - __call__ scores a batch: "inference" runs batched over all
        sentences of the batch, per-article class probabilities are the
        sums over its sentences (the reference's pandas
        groupby('url').agg(sum), mod_eventclass.py:177-184).

    The stub's per-sentence logits are a deterministic hash of the
    sentence (seeded) pushed through a softmax — NOT a model; the
    surrounding plumbing (actor pool, batch shapes, output schema) is
    the real, tested contract.
    """

    def __init__(self, seed: int = 7):
        from ..functions.sentkit import _default_tokenize

        self.seed = seed
        # stand-in for model weights; deterministic
        rng = np.random.RandomState(seed)
        self.proj = rng.normal(size=(3,)).astype(np.float64)
        # punkt segmenter state: built once per actor, like the model
        # (real nltk when importable, vendored-parameter engine else)
        self._segment = _default_tokenize()

    def _sentence_logits(self, sentences) -> np.ndarray:
        out = np.empty((len(sentences), 3), dtype=np.float64)
        for i, s in enumerate(sentences):
            h = zlib.crc32(s.encode("utf-8")) ^ self.seed
            out[i, 0] = ((h >> 0) & 0xFF) / 255.0
            out[i, 1] = ((h >> 8) & 0xFF) / 255.0
            out[i, 2] = ((h >> 16) & 0xFF) / 255.0
        return out + self.proj[None, :]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        # flatten: all sentences of the batch scored in one "inference";
        # lowercased first, exactly like the reference's classifyText
        sentences, owner = [], []
        for i, t in enumerate(texts):
            for s in self._segment((t or "").lower()):
                if s:
                    sentences.append(s)
                    owner.append(i)
        pos = np.zeros(len(texts))
        neu = np.zeros(len(texts))
        neg = np.zeros(len(texts))
        if sentences:
            logits = self._sentence_logits(sentences)
            exp = np.exp(logits - logits.max(axis=1, keepdims=True))
            probs = exp / exp.sum(axis=1, keepdims=True)
            np.add.at(pos, owner, probs[:, 0])
            np.add.at(neu, owner, probs[:, 1])
            np.add.at(neg, owner, probs[:, 2])
        batch = batch.append_column("sent_positive", pa.array(np.round(pos, 6)))
        batch = batch.append_column("sent_neutral", pa.array(np.round(neu, 6)))
        batch = batch.append_column("sent_negative", pa.array(np.round(neg, 6)))
        return batch


# ---------------------------------------------------------------------------
# M2 — near-duplicate article marking (within publish-date groups)
# ---------------------------------------------------------------------------


def _bag_vectors(texts, dim: int = 128) -> np.ndarray:
    """Normalized token-bag vectors for a whole group, vectorized: one
    cythonized hash pass over every token (pandas hash_array), then one
    bincount over (doc_idx · dim + bucket) for all histograms at once —
    no per-token Python in the hot path."""
    token_lists = [(t or "").split() for t in texts]
    lens = np.array([len(tl) for tl in token_lists], dtype=np.int64)
    vecs = np.zeros((len(texts), dim), dtype=np.float64)
    if lens.sum():
        flat = np.concatenate([np.asarray(tl, dtype=object) for tl in token_lists if tl])
        buckets = (pd.util.hash_array(flat) % np.uint64(dim)).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        counts = np.bincount(doc_idx * dim + buckets, minlength=len(texts) * dim)
        vecs = counts.reshape(len(texts), dim).astype(np.float64)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    return vecs / norms[:, None]


def _bag_vector(text: str, dim: int = 128) -> np.ndarray:
    return _bag_vectors([text], dim)[0]


def _chunked_candidates(
    vecs: np.ndarray, sizes: np.ndarray, modules: np.ndarray, threshold: float = 0.99
) -> np.ndarray:
    """Exact candidate (i, j) pairs (i<j, lexicographic order) with
    cosine >= threshold AND passing the reference's per-pair skip
    predicates (different module, <=15% size gap), computed in row
    CHUNKS so peak memory is O(chunk·n) — never the n×n matrix. Compute
    is O(n²·d) vectorized matmul, which is what the reference's
    all-pairs rule inherently costs; memory is what used to OOM a hot
    publish date, and that is now bounded. (A sub-quadratic LSH screen
    was tried and rejected: token-bag vectors of same-corpus docs are
    heavily correlated, so SRP bands over-collide and generate MORE work
    than the screen itself on realistic dates.)

    Filtering pairs the greedy loop would only have SKIPPED (same
    module / size gap) cannot change its dup_of evolution, so applying
    those masks vectorized here is outcome-identical to the reference's
    per-iteration checks."""
    n = len(vecs)
    if n < 2:
        return np.empty((0, 2), dtype=np.int64)
    # ~8 MB float32 sims slab: large slabs (64 MB+) measured up to 40x
    # slower AND 40x more variable on a loaded host (page-fault churn on
    # the output buffer dominates the GEMM); small slabs stay in cache
    chunk = max(64, (1 << 21) // max(1, n))
    out = []
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        sims = vecs[s:e] @ vecs.T  # (chunk, n)
        ii, jj = np.nonzero(sims >= threshold)
        ii = ii + s
        keep = ii < jj  # i<j, dedups the symmetric/self hits
        ii, jj = ii[keep], jj[keep]
        if len(ii):
            big = np.maximum(sizes[ii], sizes[jj])
            small = np.minimum(sizes[ii], sizes[jj])
            ok = (modules[ii] != modules[jj]) & (big > 0) & ((big - small) <= 0.15 * big)
            if ok.any():
                out.append(np.column_stack((ii[ok], jj[ok])))
    if not out:
        return np.empty((0, 2), dtype=np.int64)
    return np.concatenate(out)  # chunks ascend in i → already lex sorted


#: Degenerate-window switch for the near-dedup screen: when the
#: size-sorted sliding window spans more than this many rows (a uniform
#: size plateau on a hot date), the windowed GEMM degrades to O(w²·d);
#: past the cutoff an SRP band pre-block bounds the quadratic. Below it
#: the exact windowed GEMM always wins (SRP over-collides on correlated
#: same-corpus bag vectors — measured in round 2), so the switch applies
#: ONLY where quadratic cost exceeds the over-collision cost.
NEAR_DEDUP_SRP_WINDOW_CUTOFF = 50_000
_SRP_BITS = 12  # buckets/band = 4096
_SRP_BANDS = 20  # P(miss | cos>=0.99) = (1 - 0.971^12)^20 ≈ 3e-11 per pair
_SRP_SEED = 0x5EED5
_PAIR_SLAB = 1 << 22  # candidate index pairs materialized at once
_VERIFY_SLAB = 1 << 19  # pairs per cosine-verify gather (2×512k×d floats)


def _srp_candidates(
    vecs: np.ndarray, sizes: np.ndarray, modules: np.ndarray, threshold: float = 0.99
) -> np.ndarray:
    """Candidate pairs via signed-random-projection band pre-blocking —
    the degenerate-window escape hatch (see NEAR_DEDUP_SRP_WINDOW_CUTOFF).

    20 bands × 12 seeded hyperplane bits; rows sharing a band key are
    paired (within-bucket pair generation is the same repeat/cumsum
    index algebra as simhash's bucket_pairs, slab-bounded), pairs are
    unioned across bands, and EVERY surviving pair is exact-verified
    (cosine, cross-module, ≤15% size gap), so precision is exact.
    Recall is probabilistic: P(a cosine≥0.99 pair misses all 20 bands)
    ≈ 3e-11 — ~0.005 expected misses even at 10^7.5 qualifying pairs —
    versus the windowed GEMM's exactness; that trade only engages where
    the GEMM is O(w²·d) with w > the cutoff. Output format matches
    ``_chunked_candidates``: lexicographically sorted (i, j), i<j."""
    n = len(vecs)
    if n < 2:
        return np.empty((0, 2), dtype=np.int64)
    rng = np.random.RandomState(_SRP_SEED)
    planes = rng.normal(size=(vecs.shape[1], _SRP_BITS * _SRP_BANDS)).astype(
        vecs.dtype
    )
    bits = vecs @ planes > 0  # (n, bits*bands), one GEMM
    weights = 1 << np.arange(_SRP_BITS, dtype=np.int64)
    cand_keys: list = []
    for band in range(_SRP_BANDS):
        keys = (
            bits[:, band * _SRP_BITS : (band + 1) * _SRP_BITS].astype(np.int64)
            @ weights
        )
        srt = np.argsort(keys, kind="stable")
        ks = keys[srt]
        new = np.ones(n, dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        grp_start = np.flatnonzero(new)
        grp_id = np.cumsum(new) - 1
        local = np.arange(n, dtype=np.int64) - grp_start[grp_id]
        cum = np.cumsum(local)
        start_row, base = 0, 0
        while start_row < n:
            end_row = int(np.searchsorted(cum, base + _PAIR_SLAB, side="left")) + 1
            end_row = min(max(end_row, start_row + 1), n)
            loc = local[start_row:end_row]
            m = int(loc.sum())
            base = int(cum[end_row - 1])
            if m:
                b_idx = np.repeat(np.arange(start_row, end_row), loc)
                seg_start = np.repeat(grp_start[grp_id[start_row:end_row]], loc)
                excl = np.concatenate(([0], np.cumsum(loc)[:-1]))
                offset = np.arange(m, dtype=np.int64) - np.repeat(excl, loc)
                a_idx = seg_start + offset
                a = srt[a_idx]
                b = srt[b_idx]
                lo = np.minimum(a, b)
                hi_ = np.maximum(a, b)
                # cheap predicates first (module / size) so the union and
                # the cosine verify only see pairs the rule could accept
                big = np.maximum(sizes[lo], sizes[hi_])
                small = np.minimum(sizes[lo], sizes[hi_])
                ok = (
                    (modules[lo] != modules[hi_])
                    & (big > 0)
                    & ((big - small) <= 0.15 * big)
                )
                if ok.any():
                    cand_keys.append(lo[ok] * np.int64(n) + hi_[ok])
            start_row = end_row
    if not cand_keys:
        return np.empty((0, 2), dtype=np.int64)
    keys = np.unique(np.concatenate(cand_keys))  # cross-band dedup + lex sort
    out = []
    for s in range(0, len(keys), _VERIFY_SLAB):
        ks = keys[s : s + _VERIFY_SLAB]
        ii = ks // n
        jj = ks % n
        cos = np.einsum("ij,ij->i", vecs[ii], vecs[jj])
        hit = cos >= threshold
        if hit.any():
            out.append(np.column_stack((ii[hit], jj[hit])))
    if not out:
        return np.empty((0, 2), dtype=np.int64)
    return np.concatenate(out)  # keys ascend ⇒ already lex sorted


def _windowed_candidates(
    vecs: np.ndarray, sizes: np.ndarray, modules: np.ndarray, threshold: float = 0.99
) -> np.ndarray:
    """Exact candidate pairs via the rule's OWN pruning algebra — same
    output set as ``_chunked_candidates`` with the quadratic work cut to
    the pairs the rule could ever accept:

    * cross-module only: a single-module group provably has NO
      candidates (the reference skips same-module pairs,
      mod_dedupe.py:204-242) — the GEMM short-circuits to empty without
      touching the vectors;
    * ≤15% size gap: rows sorted by size pair only within a sliding
      size window (s_j ≤ s_i/0.85), so the GEMM runs chunk × window
      over CONTIGUOUS slices of the size-sorted matrix instead of
      chunk × n. The window bound is slightly loose (/0.84) and the
      exact float predicate is re-applied per surviving pair, so the
      output set is bit-identical to the all-pairs formulation.

    Compute is O(n·w·d) where w = rows within 15% of each size —
    measured 4× under the full GEMM on the bench corpus's narrow size
    distribution, and far more on spread distributions. Degenerate case
    (a uniform-size plateau wider than NEAR_DEDUP_SRP_WINDOW_CUTOFF,
    where the window IS the group) threshold-switches to the SRP band
    pre-block (``_srp_candidates``: exact precision, ~1-3e-11 per-pair
    miss probability) instead of degrading to O(n²·d). Output pairs
    are lexicographically sorted positional indices, as the greedy
    loop requires."""
    n = len(vecs)
    empty = np.empty((0, 2), dtype=np.int64)
    if n < 2:
        return empty
    first = modules[0]
    if (modules == first).all():  # single-module group: rule can't fire
        return empty
    order = np.argsort(sizes, kind="stable")
    vs, ss, ms = vecs[order], np.asarray(sizes)[order], modules[order]
    hi = np.searchsorted(ss, ss / 0.84, side="right")
    if int((hi - np.arange(n)).max()) > NEAR_DEDUP_SRP_WINDOW_CUTOFF:
        # degenerate window (uniform-size plateau): the windowed GEMM is
        # O(w²·d) — switch to the SRP band pre-block + exact verify
        return _srp_candidates(vecs, np.asarray(sizes), modules, threshold)
    out = []
    budget = 1 << 21  # float32 slab cells ⇒ ~8 MB
    i = 0
    while i < n:
        # hi is nondecreasing (sizes sorted), so the slab for rows
        # [i, e) is (e-i) × (hi[e-1]-i) cells; binary-search the largest
        # e that fits the budget. Sizing from hi[i] alone under-counted:
        # one small outlier followed by a dense plateau made the realized
        # window arbitrarily wider than the first row's.
        lo, top = i + 1, n
        while lo < top:
            mid = (lo + top + 1) // 2
            if (mid - i) * (int(hi[mid - 1]) - i) <= budget:
                lo = mid
            else:
                top = mid - 1
        e = lo
        wend = int(hi[e - 1])
        if wend - i >= 2:
            sims = vs[i:e] @ vs[i:wend].T
            ii, jj = np.nonzero(sims >= threshold)
            ii = ii + i
            jj = jj + i
            keep = jj > ii
            ii, jj = ii[keep], jj[keep]
            if len(ii):
                big = np.maximum(ss[ii], ss[jj])
                small = np.minimum(ss[ii], ss[jj])
                ok = (ms[ii] != ms[jj]) & (big > 0) & ((big - small) <= 0.15 * big)
                if ok.any():
                    a = order[ii[ok]]
                    b = order[jj[ok]]
                    out.append(
                        np.column_stack((np.minimum(a, b), np.maximum(a, b)))
                    )
        i = e
    if not out:
        return empty
    pairs = np.concatenate(out)
    return pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]


def near_dedup_articles_stage(df: pd.DataFrame) -> pd.DataFrame:
    """Per publish-date group: mark near-duplicate articles.

    Reference decision rule (mod_dedupe.compareTwoArticles,
    mod_dedupe.py:204-242): similarity >= 0.99 AND size difference <=
    15% AND different module ⇒ the SMALLER article is the duplicate
    (removeArticle drops it). Embedding here is a deterministic
    token-bag vector (the spaCy doc-vector slot). Use with
    ``groupby("pubdate").map_groups`` — the reference compares within a
    date directory (base_plugin.py:449-488).
    """
    df = df.reset_index(drop=True)
    vecs = _bag_vectors(list(df["text"])).astype(np.float32)
    sizes = df["text"].str.len().to_numpy()
    # url is the deterministic processing order; positional fallback for
    # url-less frames (unit tests / ad-hoc use)
    order = df["url"].to_numpy() if "url" in df.columns else np.arange(len(df))
    df["is_duplicate"] = _greedy_dup_flags(order, vecs, sizes, df["module"].to_numpy())
    return df


def _greedy_dup_flags(
    urls: np.ndarray, vecs: np.ndarray, sizes: np.ndarray, modules: np.ndarray
) -> np.ndarray:
    """Greedy duplicate marking over the exact chunked screen.

    Rows are processed in URL-sorted order so the outcome is
    deterministic regardless of how the shuffle delivered the group
    (the reference visits its date-directory listing — a fixed order;
    url order is the engine's fixed order). The chunked screen yields
    the same candidate set as the reference's all-pairs loop with its
    skip predicates pre-applied as vectorized masks; survivors are
    visited in (i, j) lexicographic order, so greedy marking matches
    the all-pairs formulation exactly."""
    n = len(urls)
    perm = np.argsort(urls, kind="stable")
    cand = _windowed_candidates(vecs[perm], sizes[perm], modules[perm])
    sizes_s = sizes[perm]
    dup_sorted = np.zeros(n, dtype=bool)
    for i, j in cand:
        # skip pairs touching an already-marked duplicate; the winner of
        # a comparison stays eligible (reference loop's dup_of check)
        if dup_sorted[i] or dup_sorted[j]:
            continue
        dup_sorted[i if sizes_s[i] < sizes_s[j] else j] = True
    out = np.zeros(n, dtype=bool)
    out[perm] = dup_sorted
    return out


# ---------------------------------------------------------------------------
# the chain
# ---------------------------------------------------------------------------

#: process-level stage cache: compiled regex packs / stub "weights" are
#: built once per worker PROCESS, so the chain runs as stateless tasks
#: on the warm worker pool — per-run actor-pool spawns were ~10 s of
#: parallelism-independent latency per chain invocation (the same
#: task-not-pool choice the crawl makes for its per-round stages).
_STAGE_CACHE: dict = {}


def _cached_stage(cls):
    inst = _STAGE_CACHE.get(cls)
    if inst is None:
        inst = cls()
        _STAGE_CACHE[cls] = inst
    return inst


def keyword_flags_fn(batch: pa.Table) -> pa.Table:
    return _cached_stage(KeywordFlagsStage)(batch)


def sentiment_fn(batch: pa.Table) -> pa.Table:
    return _cached_stage(SentimentStage)(batch)


class HeavySentimentStage(SentimentStage):
    """M1's heavy-state actor-pool variant: identical OUTPUTS to
    SentimentStage, but __init__ builds ~100 MB of real, consulted state
    — a 2M-entry sentence-hash → logits memo table — standing in for a
    BERT checkpoint load. Run it with ``kind='actor'`` so the pool pays
    the state build ONCE per actor (a per-task build would dominate the
    stage); bench --actor-stage drives it over the full crawled corpus
    to prove the autoscaling-pool sizing in run_processor_chain's
    docstring holds at bench scale (no executor stall, chain completes).
    """

    MEMO_BUCKETS = 2_000_000

    def __init__(self, seed: int = 7):
        super().__init__(seed)
        # heavy state, genuinely consulted per sentence below: logits
        # for every hash bucket, precomputed (8 B × 3 × 2M ≈ 48 MB plus
        # the bucket keys) — the actor-pool contract under test is
        # "expensive __init__, cheap __call__"
        h = np.arange(self.MEMO_BUCKETS, dtype=np.uint32) ^ np.uint32(seed)
        memo = np.empty((self.MEMO_BUCKETS, 3), dtype=np.float64)
        memo[:, 0] = ((h >> 0) & 0xFF) / 255.0
        memo[:, 1] = ((h >> 8) & 0xFF) / 255.0
        memo[:, 2] = ((h >> 16) & 0xFF) / 255.0
        self.memo = memo + self.proj[None, :]

    def _sentence_logits(self, sentences) -> np.ndarray:
        # crc32(s) ^ seed == bucket key when crc32(s) < MEMO_BUCKETS:
        # consult the memo (vectorized gather); else compute inline.
        crcs = np.fromiter(
            (zlib.crc32(s.encode("utf-8")) for s in sentences),
            dtype=np.uint32,
            count=len(sentences),
        )
        out = np.empty((len(sentences), 3), dtype=np.float64)
        hit = crcs < self.MEMO_BUCKETS
        if hit.any():
            out[hit] = self.memo[crcs[hit]]
        miss = ~hit
        if miss.any():
            h = crcs[miss] ^ np.uint32(self.seed)
            sub = np.empty((int(miss.sum()), 3), dtype=np.float64)
            sub[:, 0] = ((h >> 0) & 0xFF) / 255.0
            sub[:, 1] = ((h >> 8) & 0xFF) / 255.0
            sub[:, 2] = ((h >> 16) & 0xFF) / 255.0
            out[miss] = sub + self.proj[None, :]
        return out


_DEDUP_DIM = 128


def make_featurize_for_dedup(embedding_col: str | None = None):
    """Compact per-article projection for the near-dedup shuffle: the
    decision rule needs only (url, module, pubdate, size, vector) —
    shuffling these ~0.6 KB rows instead of full article text keeps the
    date groupby's exchange and group materialization cheap.

    ``embedding_col`` is the M2 swap point (mod_dedupe.py:244-257 uses
    spaCy doc vectors): when articles carry a real embedding column
    (list<float>, any fixed dim), the marks pipeline uses it —
    normalized — in place of the token-bag stand-in. The decision rule
    (threshold, module/size-gap skips, greedy smaller-loses) is
    unchanged; size stays the text length, as in the reference."""

    def featurize(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        if embedding_col is None:
            vecs = _bag_vectors(texts, _DEDUP_DIM).astype(np.float32)
        else:
            from .similarity import list_column_matrix

            mat = list_column_matrix(batch[embedding_col])
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            vecs = (mat / norms[:, None]).astype(np.float32)
        dim = vecs.shape[1]
        sizes = pa.array([len(t or "") for t in texts], pa.int64())
        if embedding_col is None:
            vec_col = pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), pa.float32()), dim
            )
        else:
            # variable list<float> so an EMPTY block (whose dim is
            # unknowable for a variable-width embedding column) emits a
            # schema that unifies with the non-empty blocks'
            from ..util import list_offsets32

            vec_col = pa.ListArray.from_arrays(
                list_offsets32(len(texts), dim),
                pa.array(vecs.reshape(-1), pa.float32()),
            )
        return pa.table(
            {
                "url": batch["url"],
                "module": batch["module"],
                "pubdate": batch["pubdate"],
                "size": sizes,
                "vec": vec_col,
            }
        )

    return featurize


featurize_for_dedup = make_featurize_for_dedup()


def near_dedup_marks_group(tbl: pa.Table) -> pa.Table:
    """Per-pubdate group over the compact projection → (url, is_duplicate)."""
    urls = np.asarray(tbl["url"].to_pylist(), dtype=object)
    vec_col = tbl["vec"].combine_chunks()
    flat = vec_col.flatten().to_numpy(zero_copy_only=False)
    dim = (
        vec_col.type.list_size
        if pa.types.is_fixed_size_list(vec_col.type)
        else (len(flat) // max(1, len(vec_col)))
    )
    vecs = flat.reshape(-1, max(1, dim)).astype(np.float32)
    sizes = tbl["size"].to_numpy(zero_copy_only=False)
    modules = np.asarray(tbl["module"].to_pylist(), dtype=object)
    dup = _greedy_dup_flags(urls, vecs, sizes, modules)
    return pa.table({"url": tbl["url"], "is_duplicate": pa.array(dup)})


#: (priority, name, stage, kind): kind 'fn' = stateless map_batches
#: (process-cached state), 'actor' = actor-pool map_batches (for stages
#: whose state is too expensive to build once per process — a real model
#: checkpoint would use this), 'dedup_marks' = the compact-projection
#: near-dedup (featurize → date groupby over vectors → marks attached
#: back), 'group_pubdate' = generic per-date map_groups over full rows.
DEFAULT_CHAIN = [
    (1, "dataprep", dataprep_stage, "fn"),
    (2, "keyword_flags", keyword_flags_fn, "fn"),
    (3, "sentiment", sentiment_fn, "fn"),
    (4, "near_dedup", near_dedup_marks_group, "dedup_marks"),
]

#: DEFAULT_CHAIN with the sentiment slot as a heavy-state ACTOR POOL
#: (HeavySentimentStage: ~100 MB built once per actor) — output
#: identical to DEFAULT_CHAIN; used to exercise the autoscaling-pool
#: path at bench scale (bench.py --actor-stage / BENCH_ACTOR_STAGE=1).
ACTOR_CHAIN = [
    (1, "dataprep", dataprep_stage, "fn"),
    (2, "keyword_flags", keyword_flags_fn, "fn"),
    (3, "sentiment", HeavySentimentStage, "actor"),
    (4, "near_dedup", near_dedup_marks_group, "dedup_marks"),
]


def run_processor_chain(
    articles,
    chain=None,
    concurrency: int = 2,
    marks_broadcast_limit: int = 5_000_000,
    overlap_marks: bool = False,
    dedup_embedding_col: str | None = None,
):
    """Apply the processor stages in ascending priority order (O1).

    If you add 'actor' stages: use AUTOSCALING pools ``(1, concurrency)``
    — two chained fixed-size pools that together reserve every CPU starve
    the upstream read tasks and deadlock the streaming executor (observed
    live at 2×24 pools on 32 CPUs). Size ``concurrency`` ≤ cpus // pools.

    ``overlap_marks`` (OPT-IN): when the near-dedup marks fit the
    broadcast limit, compute them in a background thread so the marks
    execution and the enriched main stream run CONCURRENTLY (the attach
    stage blocks its first batches on a zero-CPU rendezvous actor) —
    measured ~30% off chain wall on the bench corpus. Opt in ONLY when
    the duplicate-url count is provably under ``marks_broadcast_limit``
    (e.g. total article count is below it): the overlapped graph is
    wired before the marks size is known, so an overflow RAISES
    mid-pipeline instead of degrading. The default (False) path
    auto-falls back from broadcast attach to a distributed hash-join
    attach when the dup set overflows — safe on unknown/dup-heavy data.
    Pass ``marks_broadcast_limit=0`` to force the hash-join attach (the
    scale path when even the duplicate-url subset is too big to
    broadcast).

    ``dedup_embedding_col``: name of a list<float> column to use as the
    near-dedup vector (the M2 swap point — the reference uses spaCy doc
    vectors, mod_dedupe.py:244-257). Default None = the deterministic
    token-bag stand-in. The decision rule (>=0.99 cosine, cross-module,
    <=15% size gap, smaller loses) is identical either way.
    """
    if chain is None:
        chain = DEFAULT_CHAIN
    out = articles
    # cheap recompute lineage for the dedup featurize: only stages that
    # MUTATE the text column matter for the marks (column-appending
    # stages like flags/sentiment don't change the dedup input) — list
    # any new text-mutating stage name here
    text_state = articles
    text_mutating = {"dataprep"}
    for _prio, name, stage, kind in sorted(chain, key=lambda c: c[0]):
        if kind == "fn":
            out = out.map_batches(stage, batch_format="pyarrow")
            if name in text_mutating:
                text_state = text_state.map_batches(stage, batch_format="pyarrow")
        elif kind == "actor":
            out = out.map_batches(
                stage, batch_format="pyarrow", concurrency=(1, max(1, concurrency))
            )
        elif kind == "dedup_marks":
            # module-level default resolves at call time (testable); the
            # embedding variant is built per-chain
            featurize = (
                featurize_for_dedup
                if dedup_embedding_col is None
                else make_featurize_for_dedup(dedup_embedding_col)
            )
            if overlap_marks and marks_broadcast_limit > 0:
                out = _attach_dedup_marks_overlapped(
                    out, stage, marks_broadcast_limit, marks_input=text_state,
                    featurize=featurize,
                )
            else:
                out = _attach_dedup_marks(
                    out, stage, marks_broadcast_limit, marks_input=text_state,
                    featurize=featurize,
                )
        elif kind == "group_pubdate":
            out = out.groupby("pubdate").map_groups(stage, batch_format="pandas")
        else:
            raise ValueError(kind)
    return out


_FLAGS_CACHE: dict = {}


def _cached_dup_urls(dup_ref):
    """Per-worker view of the broadcast duplicate-url array (plasma
    zero-copy; cached so ray.get runs once per worker per chain)."""
    import ray

    key = dup_ref.hex() if hasattr(dup_ref, "hex") else id(dup_ref)
    cached = _FLAGS_CACHE.get(key)
    if cached is None:
        cached = ray.get(dup_ref)
        _FLAGS_CACHE.clear()  # one live chain at a time
        _FLAGS_CACHE[key] = cached
    return cached


def _marks_dataset(marks_input, group_stage, featurize=featurize_for_dedup):
    """featurize → date groupby → per-date marks (url, is_duplicate)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    return (
        marks_input.map_batches(featurize, batch_format="pyarrow")
        # spread the compact rows over >=2x-cpu blocks so the sort-based
        # groupby emits that many range partitions and the per-date
        # kernels run as parallel tasks (measured 2x on the bench corpus)
        .repartition(max(32, cpus * 2))
        .groupby("pubdate")
        .map_groups(group_stage, batch_format="pyarrow")
    )


_MARKS_BOX_CLS = None


def _marks_box_cls():
    """Zero-CPU async rendezvous actor: the overlapped marks thread
    put()s the duplicate-url array once; attach tasks await get()."""
    global _MARKS_BOX_CLS
    if _MARKS_BOX_CLS is None:
        import ray

        @ray.remote(num_cpus=0)
        class _MarksBox:
            def __init__(self):
                import asyncio

                self._event = asyncio.Event()
                self._val = None

            async def put(self, val):
                self._val = val
                self._event.set()

            async def get(self):
                await self._event.wait()
                return self._val

        _MARKS_BOX_CLS = _MarksBox
    return _MARKS_BOX_CLS


def _cached_box_value(box):
    """Per-worker one-time fetch of the rendezvous value (blocks until
    the marks thread put() it)."""
    import ray

    key = box._actor_id.hex()
    if key not in _FLAGS_CACHE:
        val = ray.get(box.get.remote())
        _FLAGS_CACHE.clear()  # one live chain at a time
        _FLAGS_CACHE[key] = val
    return _FLAGS_CACHE[key]


def _attach_dedup_marks_overlapped(
    out, group_stage, marks_broadcast_limit: int, marks_input,
    featurize=featurize_for_dedup
):
    """Overlapped near-dedup attach: the marks branch runs in a driver
    background thread as its OWN Dataset execution while the enriched
    main stream executes; the attach stage parks its first batches on a
    zero-CPU rendezvous actor until the duplicate-url array arrives.

    Streaming contract notes:
      - the enriched stream is NOT materialized — the executor's
        backpressure bounds how many pre-attach blocks buffer while the
        marks compute, and upstream simply pauses (freeing CPUs for the
        marks execution) when the buffer fills;
      - only the DUPLICATE urls travel (filtered inside the marks
        dataset — the driver never holds the full marks table, unlike
        the sequential path's probe);
      - attach tasks briefly BLOCK on the rendezvous: they are capped at
        4 concurrent tasks × 0.25 CPU so at most one CPU-equivalent sits
        parked — everything else keeps streaming (a full-width blocking
        stage would deadlock the executor);
      - if the duplicate set overflows ``marks_broadcast_limit`` the
        attach raises with guidance to re-run with
        ``marks_broadcast_limit=0`` (the hash-join path). Duplicates are
        a sparse subset of articles, so this bound scales ~10× past the
        old all-marks probe.
    """
    import threading

    import ray

    from ..util import collect_table

    box = _marks_box_cls().remote()

    def compute_marks():
        try:
            dups = _marks_dataset(marks_input, group_stage, featurize).map_batches(
                lambda t: t.filter(t["is_duplicate"]).select(["url"]),
                batch_format="pyarrow",
            )
            probe = collect_table(dups.limit(marks_broadcast_limit + 1))
            if probe.num_rows > marks_broadcast_limit:
                ray.get(box.put.remote(("overflow", None)))
            else:
                ray.get(box.put.remote(("ok", probe["url"].combine_chunks())))
        except BaseException:
            # surface the TRUE failure through the rendezvous so attach
            # tasks raise the real cause instead of a misleading
            # over-limit error (the traceback tail keeps the innermost
            # cause, which Ray's wrapper reprs drop); guard the signal
            # itself so a dead actor/shutdown during the except path
            # doesn't leave attach tasks parked forever
            import traceback

            try:
                ray.get(box.put.remote(("error", traceback.format_exc()[-2000:])))
            except BaseException:
                pass
            raise

    threading.Thread(target=compute_marks, daemon=True).start()

    def attach(batch: pa.Table) -> pa.Table:
        tag, val = _cached_box_value(box)
        if tag == "overflow":
            raise RuntimeError(
                "near-dedup duplicate set exceeded marks_broadcast_limit "
                "in overlapped mode; re-run with overlap_marks=False "
                "(auto hash-join fallback) or marks_broadcast_limit=0 "
                "to force the hash-join attach"
            )
        if tag == "error":
            raise RuntimeError(f"overlapped marks branch failed: {val}")
        col = pc.is_in(batch["url"].combine_chunks(), value_set=val)
        return batch.append_column("is_duplicate", pc.fill_null(col, False))

    return out.map_batches(
        attach, batch_format="pyarrow", num_cpus=0.25, concurrency=4
    )


def _attach_dedup_marks(out, group_stage, marks_broadcast_limit: int, marks_input=None,
                        featurize=featurize_for_dedup):
    """Compact near-dedup flow: shuffle only (url, module, pubdate,
    size, vec) through the date groupby, then attach the
    (url, is_duplicate) marks back — broadcast when the marks table fits
    (probed with limit(N+1)), hash-join on url otherwise. Shuffling full
    article text through the date groupby and converting it to pandas
    per group was the chain's dominant cost.

    ``marks_input`` is a cheap recompute lineage for the featurize
    (source → text-mutating stages only): with it, the enriched stream
    ``out`` is NEVER materialized mid-pipeline — the marks branch reads
    the source again (parquet re-read + trim ≪ pinning the whole
    enriched corpus in the object store at 100-TB scale) and the final
    attach is one streaming pass over ``out``."""
    import ray

    from ..util import collect_table

    if marks_input is None:
        out = marks_input = out.materialize()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    marks = _marks_dataset(marks_input, group_stage, featurize)
    probe = collect_table(marks.limit(marks_broadcast_limit + 1))
    if probe.num_rows <= marks_broadcast_limit:
        # only the DUPLICATE urls need to travel (marks are sparse): the
        # attach is a vectorized pc.is_in against a broadcast Arrow string
        # array — no per-worker url->flag dict build, no Python row loop
        # (the 259k-entry dict per worker was ~half the old attach cost,
        # and it grew with worker count)
        dup_urls = probe.filter(probe["is_duplicate"])["url"].combine_chunks()
        dup_ref = ray.put(dup_urls)

        def attach(batch: pa.Table) -> pa.Table:
            dup = _cached_dup_urls(dup_ref)
            col = pc.is_in(batch["url"].combine_chunks(), value_set=dup)
            return batch.append_column("is_duplicate", pc.fill_null(col, False))

        return out.map_batches(attach, batch_format="pyarrow")
    return out.join(
        marks,
        join_type="left_outer",
        num_partitions=max(2, min(16, cpus // 4)),
        on=("url",),
    ).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("is_duplicate"),
            "is_duplicate",
            pa.compute.fill_null(t["is_duplicate"], False),
        ),
        batch_format="pyarrow",
    )
