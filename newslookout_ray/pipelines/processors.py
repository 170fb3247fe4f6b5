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
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.textkit import keyword_flags_batch

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
    """Adds the 20 trigger-word flag columns (compiled once per actor)."""

    def __init__(self):
        keyword_flags_batch([""])  # force-compile the pattern cache

    def __call__(self, batch: pa.Table) -> pa.Table:
        flags = keyword_flags_batch(batch["text"].to_pylist())
        for name, arr in flags.items():
            batch = batch.append_column(name.lower(), pa.array(arr, pa.int8()))
        return batch


# ---------------------------------------------------------------------------
# M1 — sentiment scorer (model-actor stub with the FinBERT interface)
# ---------------------------------------------------------------------------

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


class SentimentStage:
    """FinBERT-shaped scorer stub.

    Interface parity with the reference (mod_eventclass.py):
      - model state built ONCE per actor in __init__ (the real version
        loads BertClassification weights here);
      - __call__ scores a batch: sentences are split, "inference" runs
        batched over all sentences of the batch, per-article class
        probabilities are the sums over its sentences (the reference's
        pandas groupby('url').agg(sum), mod_eventclass.py:177-184).

    The stub's per-sentence logits are a deterministic hash of the
    sentence (seeded) pushed through a softmax — NOT a model; the
    surrounding plumbing (actor pool, batch shapes, output schema) is
    the real, tested contract.
    """

    def __init__(self, seed: int = 7):
        self.seed = seed
        # stand-in for model weights; deterministic
        rng = np.random.RandomState(seed)
        self.proj = rng.normal(size=(3,)).astype(np.float64)

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
        # flatten: all sentences of the batch scored in one "inference"
        sentences, owner = [], []
        for i, t in enumerate(texts):
            for s in _SENT_SPLIT.split(t or ""):
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


def _bag_vector(text: str, dim: int = 128) -> np.ndarray:
    vec = np.zeros(dim, dtype=np.float64)
    for tok in (text or "").split():
        vec[zlib.crc32(tok.encode("utf-8")) % dim] += 1.0
    n = np.linalg.norm(vec)
    return vec / n if n else vec


_SRP_PROJ = np.random.RandomState(0x5EED).normal(size=(128, 64)).astype(np.float32)


def _srp_band_candidates(vecs: np.ndarray, bands: int = 8) -> np.ndarray:
    """Candidate (i, j) pairs (i<j, lexicographically sorted) whose SRP
    signatures collide in >=1 of `bands` 8-bit bands. O(n·64) memory plus
    the candidate list — no pairwise matrix."""
    n = len(vecs)
    if n < 2:
        return np.empty((0, 2), dtype=np.int64)
    bits = (vecs @ _SRP_PROJ) > 0  # (n, 64) bool
    keys = np.packbits(bits, axis=1)  # (n, 8) uint8 — one byte per band
    pair_keys: set = set()
    for b in range(bands):
        order = np.argsort(keys[:, b], kind="stable")
        col = keys[order, b]
        run_starts = np.flatnonzero(np.r_[True, col[1:] != col[:-1]])
        run_ends = np.r_[run_starts[1:], len(col)]
        for s, e in zip(run_starts, run_ends):
            if e - s < 2:
                continue
            members = np.sort(order[s:e])
            for x in range(len(members)):
                base = int(members[x]) << 32
                for y in range(x + 1, len(members)):
                    pair_keys.add(base | int(members[y]))
    if not pair_keys:
        return np.empty((0, 2), dtype=np.int64)
    packed = np.sort(np.fromiter(pair_keys, dtype=np.int64, count=len(pair_keys)))
    return np.column_stack((packed >> 32, packed & 0xFFFFFFFF))


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
    n = len(df)
    vecs = np.stack([_bag_vector(t) for t in df["text"]]).astype(np.float32)
    sizes = df["text"].str.len().to_numpy()
    modules = df["module"].to_numpy()
    # Candidate generation by signed-random-projection banding — never
    # builds the n×n similarity matrix (one hot publish date at scale
    # would OOM the group). 64 SRP bits per article, 8 bands × 8 bits:
    # a cosine>=0.99 pair disagrees on a given bit with p≈0.045, so it
    # misses all 8 bands with p≈(1-0.955^8)^8 < 1e-4 — recall is
    # approximate but near-exact at the 0.99 threshold; precision is
    # exact because every candidate is verified with a true dot product.
    # Survivors are processed in (i, j) lexicographic order — the same
    # order the reference's all-pairs loop visits them, so the greedy
    # marking outcome is identical for any pair set the bands recover.
    cand = _srp_band_candidates(vecs)
    if len(cand):
        sims = np.einsum("ij,ij->i", vecs[cand[:, 0]], vecs[cand[:, 1]])
        cand = cand[sims >= 0.99]
    dup_of = np.full(n, -1, dtype=np.int64)
    for i, j in cand:
        if dup_of[i] >= 0 or dup_of[j] >= 0 or modules[i] == modules[j]:
            continue
        big, small = max(sizes[i], sizes[j]), min(sizes[i], sizes[j])
        if big == 0 or (big - small) > 0.15 * big:
            continue
        loser = i if sizes[i] < sizes[j] else j
        dup_of[loser] = j if loser == i else i
    df["is_duplicate"] = dup_of >= 0
    return df


# ---------------------------------------------------------------------------
# the chain
# ---------------------------------------------------------------------------

#: (priority, name, stage, kind): kind 'fn' = stateless map_batches,
#: 'actor' = actor-pool map_batches, 'group_pubdate' = per-date map_groups.
DEFAULT_CHAIN = [
    (1, "dataprep", dataprep_stage, "fn"),
    (2, "keyword_flags", KeywordFlagsStage, "actor"),
    (3, "sentiment", SentimentStage, "actor"),
    (4, "near_dedup", near_dedup_articles_stage, "group_pubdate"),
]


def run_processor_chain(articles, chain=None, concurrency: int = 2):
    """Apply the processor stages in ascending priority order (O1).

    Actor stages use AUTOSCALING pools ``(1, concurrency)`` — two chained
    fixed-size pools that together reserve every CPU starve the upstream
    read tasks and deadlock the streaming executor (observed live at
    2×24 pools on 32 CPUs). Size ``concurrency`` ≤ cpus // n_actor_stages.
    """
    if chain is None:
        chain = DEFAULT_CHAIN
    out = articles
    for _prio, _name, stage, kind in sorted(chain, key=lambda c: c[0]):
        if kind == "fn":
            out = out.map_batches(stage, batch_format="pyarrow")
        elif kind == "actor":
            out = out.map_batches(
                stage, batch_format="pyarrow", concurrency=(1, max(1, concurrency))
            )
        elif kind == "group_pubdate":
            out = out.groupby("pubdate").map_groups(stage, batch_format="pandas")
        else:
            raise ValueError(kind)
    return out
