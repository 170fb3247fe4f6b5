"""Text-analysis operators over a documents table: token counting,
quality scoring, language-ID, document fingerprinting.

These are the text-side operators a 100 TB training-data pipeline needs
(driver brief) plus the reference's text-statistics analogues. Every
operator is a vectorized ``map_batches`` stage over Arrow/pandas
batches; the scoring arithmetic is deliberately SQL-replicable so the
DuckDB oracle can verify it exactly (integer/ratio math, shared regex
constants).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

#: BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space
#: symbols (RE2-compatible — shared with the oracle SQL).
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Whitespace split pattern (Python re.split / DuckDB string_split_regex).
WS_SPLIT_PATTERN = r"\s+"

#: Tiny per-language stopword inventories for the n-gram/stopword
#: language-ID heuristic. Shared verbatim with the oracle SQL.
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "for"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "es": ("el", "los", "de", "que", "y", "una", "por", "con"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不"),
}
LANG_ORDER = tuple(sorted(LANG_STOPWORDS))  # deterministic argmax tie-break


def token_count_stage(batch: pa.Table) -> pa.Table:
    """doc_id → whitespace-token and BPE-ish token counts (vectorized)."""
    text = batch["text"]
    ws = pc.count_substring_regex(pc.utf8_trim_whitespace(text), WS_SPLIT_PATTERN)
    nonempty = pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(text)), 0)
    n_ws = pc.if_else(nonempty, pc.add(ws, 1), 0)
    n_bpe = pc.count_substring_regex(text, BPE_TOKEN_PATTERN)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ws_tokens": pc.cast(n_ws, pa.int64()),
            "n_bpe_tokens": pc.cast(n_bpe, pa.int64()),
        }
    )


def quality_score_stage(batch: pa.Table) -> pa.Table:
    """Length/digit/symbol-ratio quality features + a 0-100 integer score.

    score = clamp(0,100, 60
                  + min(n_ws_tokens, 200)//5         (length credit)
                  - (digit_chars*100)//n_chars        (digit penalty)
                  - (symbol_chars*100)//n_chars)      (symbol penalty)
    Integer arithmetic only — exactly replicable in SQL.
    """
    text = batch["text"]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    digits = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64())
    symbols = pc.cast(pc.count_substring_regex(text, r"[^A-Za-z0-9\s]"), pa.int64())
    ws = pc.count_substring_regex(pc.utf8_trim_whitespace(text), WS_SPLIT_PATTERN)
    nonempty = pc.greater(pc.utf8_length(pc.utf8_trim_whitespace(text)), 0)
    n_ws = pc.cast(pc.if_else(nonempty, pc.add(ws, 1), 0), pa.int64())

    safe_chars = pc.max_element_wise(n_chars, 1)
    length_credit = pc.divide(pc.min_element_wise(n_ws, 200), 5)
    digit_pen = pc.divide(pc.multiply(digits, 100), safe_chars)
    sym_pen = pc.divide(pc.multiply(symbols, 100), safe_chars)
    raw = pc.subtract(pc.subtract(pc.add(length_credit, 60), digit_pen), sym_pen)
    score = pc.max_element_wise(pc.min_element_wise(raw, 100), 0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": n_chars,
            "n_tokens": n_ws,
            "digit_chars": digits,
            "symbol_chars": symbols,
            "quality": pc.cast(score, pa.int64()),
        }
    )


#: Per-language Arrow value-set arrays for ``pc.is_in`` — built once per
#: process (module-level cache), shared by every stateless task invocation.
_LANG_VALUE_SETS: list | None = None


def _lang_value_sets() -> list:
    global _LANG_VALUE_SETS
    if _LANG_VALUE_SETS is None:
        _LANG_VALUE_SETS = [
            pa.array(LANG_STOPWORDS[lang], pa.string()) for lang in LANG_ORDER
        ]
    return _LANG_VALUE_SETS


def lang_id_stage(batch: pa.Table) -> pa.Table:
    """Stopword-hit language ID, fully vectorized (stateless task).

    predicted = argmax over languages of exact-token stopword hits
    (space-split tokens), ties broken by LANG_ORDER; no hits → 'und'.

    One ``split_pattern`` pass over the batch, one C-level ``is_in``
    per language over the flattened token array, and one
    ``np.add.reduceat`` segment-sum per language — no per-row Python.
    Splitting "" yields [""], so every doc owns ≥1 flattened slot and
    the reduceat segment starts are strictly increasing and in range.
    """
    n = batch.num_rows
    if n == 0:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "predicted_lang": pa.array([], pa.string()),
            }
        )
    toks = pc.split_pattern(pc.fill_null(batch["text"], ""), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    values = pc.list_flatten(toks)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    hits = np.zeros((n, len(LANG_ORDER)), dtype=np.int64)
    if len(values):
        for j, vs in enumerate(_lang_value_sets()):
            m = pc.is_in(values, value_set=vs).to_numpy(zero_copy_only=False)
            hits[:, j] = np.add.reduceat(m.astype(np.int64), starts)
    best = hits.argmax(axis=1)  # first max in LANG_ORDER == reference tie-break
    maxh = hits.max(axis=1)
    langs = np.asarray(LANG_ORDER, dtype=object)
    pred = np.where(maxh > 0, langs[best], "und")
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "predicted_lang": pa.array(pred.tolist(), pa.string()),
        }
    )


_FP_MOD = np.uint64((1 << 31) - 1)  # Mersenne prime: products fit uint64
_FP_BASE = 1_000_003
_FP_POW = np.ones(1, dtype=np.uint64)  # grown on demand, cached per process


def _fp_powers(n: int) -> np.ndarray:
    global _FP_POW
    if len(_FP_POW) < n:
        old = len(_FP_POW)
        grown = np.empty(n, dtype=np.uint64)
        grown[:old] = _FP_POW
        for k in range(old, n):  # once per process per new max length
            grown[k] = (grown[k - 1] * np.uint64(_FP_BASE)) % _FP_MOD
        _FP_POW = grown
    return _FP_POW


def fingerprint_stage(batch: pa.Table) -> pa.Table:
    """Rolling polynomial fingerprint over whitespace tokens, fully
    batch-vectorized: one cythonized hash pass over every token
    (pandas hash_array), a power table (cached, grown on demand), and a
    single segment-reduce per batch. h = Σ c_j · B^(n-1-j) mod M with
    M = 2^31-1 so per-token products fit in uint64 with no Python loop."""
    import pandas as pd

    texts = batch["text"].to_pylist()
    token_lists = [(t or "").split() for t in texts]
    lens = np.array([len(tl) for tl in token_lists], dtype=np.int64)
    out = np.zeros(len(texts), dtype=np.uint64)
    total = int(lens.sum())
    if total:
        flat = np.concatenate([np.asarray(tl, dtype=object) for tl in token_lists if tl])
        c = (pd.util.hash_array(flat) % _FP_MOD) + np.uint64(1)
        pows = _fp_powers(int(lens.max()))
        nonempty = lens > 0
        starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
        np.cumsum(lens[nonempty][:-1], out=starts[1:])
        # exponent of token j in doc of n tokens is n-1-j
        n_rep = np.repeat(lens[nonempty], lens[nonempty])
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens[nonempty])
        vals = (c * pows[n_rep - 1 - pos]) % _FP_MOD  # < 2^31 each
        sums = np.add.reduceat(vals, starts) % _FP_MOD  # safe: Σ < 2^31·n
        out[nonempty] = sums
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(out, pa.uint64())})


def run_token_count(docs):
    return docs.map_batches(token_count_stage, batch_format="pyarrow")


def run_quality(docs):
    return docs.map_batches(quality_score_stage, batch_format="pyarrow")


def run_lang_id(docs, concurrency=None):
    """Stateless-task lang ID; ``concurrency`` kept for API compat (unused —
    the stage no longer needs an actor pool, Ray sizes tasks itself)."""
    return docs.map_batches(lang_id_stage, batch_format="pyarrow")


def run_fingerprint(docs):
    return docs.map_batches(fingerprint_stage, batch_format="pyarrow")
