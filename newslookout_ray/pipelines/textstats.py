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

from ..util import table_from_pandas as _table_from_pandas

#: per-worker cache for boilerplate_ngrams' broadcast hot-gram index
_HOT_GRAM_CACHE: dict = {}

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


#: PII redaction inventory: (name, RE2 pattern, replacement), applied in
#: order. Both Arrow's replace_substring_regex and DuckDB's regexp_replace
#: are RE2, and the oracle SQL is GENERATED from this same tuple, so the
#: two sides cannot drift. Patterns are deliberately conservative (no
#: whitespace inside the phone class — a run of space-separated numbers in
#: prose is not a phone number). Counts are measured on the ORIGINAL text;
#: replacements apply sequentially (email first so phone cannot eat the
#: digits of an address's local part, IP before phone for dotted quads).
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\b\d[\d().\-]{6,}\d\b", "<PHONE>"),
)


def _utf8_col(batch: pa.Table, name: str) -> pa.Array:
    """Column as a non-null utf8 array. The cast covers the null-typed
    column an all-None ``from_items`` block infers; parquet inputs are
    already utf8 and the cast is then a no-op."""
    col = batch[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
        col = pc.cast(col, pa.string())
    return pc.fill_null(col, "")


def pii_redact_stage(batch: pa.Table) -> pa.Table:
    """PII scrub (training-data hygiene op): per-pattern match counts over
    the original text + the sequentially redacted text. One RE2 count pass
    and one RE2 replace pass per pattern over the whole batch column — no
    per-row Python."""
    text = _utf8_col(batch, "text")
    cols: dict = {"doc_id": batch["doc_id"]}
    for name, pat, _ in PII_PATTERNS:
        cols[f"n_{name}"] = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
    red = text
    for _, pat, repl in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pat, repl)
    cols["redacted"] = red
    return pa.table(cols)


def repetition_stage(batch: pa.Table) -> pa.Table:
    """Within-document repeated-3-gram fraction (the Gopher-style
    repetition quality signal): n_ngrams, n_distinct, and
    dup_ppm = floor((n_ngrams - n_distinct) * 1e6 / n_ngrams).

    Vectorized: one split over the batch, three ``pc.take`` gathers + one
    ``binary_join_element_wise`` build every 3-gram string, one pandas
    ``factorize`` (C-level exact string interning — no hash-collision
    risk vs the SQL oracle's exact list_distinct), and one ``np.unique``
    over (doc, code) keys for the per-doc distinct counts."""
    n = batch.num_rows
    empty = pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ngrams": pa.array([0] * n, pa.int64()),
            "n_distinct": pa.array([0] * n, pa.int64()),
            "dup_ppm": pa.array([0] * n, pa.int64()),
        }
    )
    if n == 0:
        return empty
    toks = pc.split_pattern(_utf8_col(batch, "text"), " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
    values = pc.list_flatten(toks)
    ng_counts = np.maximum(lens - 2, 0)
    total = int(ng_counts.sum())
    if total == 0:
        return empty
    tok_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=tok_starts[1:])
    nz = np.flatnonzero(ng_counts > 0)
    cnt = ng_counts[nz]
    ng_starts = np.zeros(len(nz), dtype=np.int64)
    np.cumsum(cnt[:-1], out=ng_starts[1:])
    # global token index of each 3-gram's first token (never crosses a doc)
    idx0 = (
        np.arange(total, dtype=np.int64)
        - np.repeat(ng_starts, cnt)
        + np.repeat(tok_starts[nz], cnt)
    )
    grams = pc.binary_join_element_wise(
        pc.take(values, pa.array(idx0)),
        pc.take(values, pa.array(idx0 + 1)),
        pc.take(values, pa.array(idx0 + 2)),
        " ",
    )
    codes, uniques = pd.factorize(grams.to_numpy(zero_copy_only=False))
    ncodes = np.int64(len(uniques))
    doc_idx = np.repeat(np.arange(len(nz), dtype=np.int64), cnt)
    # (doc, code) → one key; len(nz)·ncodes ≤ total² per batch ≪ 2^63
    uniq_keys = np.unique(doc_idx * ncodes + codes)
    n_distinct = np.zeros(n, dtype=np.int64)
    n_distinct[nz] = np.bincount(
        (uniq_keys // ncodes).astype(np.int64), minlength=len(nz)
    )
    dup_ppm = np.where(
        ng_counts > 0,
        (ng_counts - n_distinct) * 1_000_000 // np.maximum(ng_counts, 1),
        0,
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_ngrams": pa.array(ng_counts, pa.int64()),
            "n_distinct": pa.array(n_distinct, pa.int64()),
            "dup_ppm": pa.array(dup_ppm.astype(np.int64), pa.int64()),
        }
    )


def _term_partial_counts(batch: pa.Table) -> pa.Table:
    """Combiner for term_topk: per-batch term counts (one split, one
    np.unique) so the global groupby shuffles VOCABULARY-sized partials,
    not one row per token occurrence."""
    toks = pc.split_pattern(_utf8_col(batch, "text"), " ")
    values = pc.list_flatten(toks)
    values = values.filter(pc.not_equal(values, ""))
    if len(values) == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    uniq, counts = np.unique(values.to_numpy(zero_copy_only=False), return_counts=True)
    return pa.table(
        {
            "term": pa.array(uniq.tolist(), pa.string()),
            "n": pa.array(counts, pa.int64()),
        }
    )


def term_topk(docs, k: int = 50):
    """Corpus-wide top-k term frequencies, ranked (n desc, term asc).

    Shape: per-batch partial counts (combiner) → groupby-term sum over
    vocabulary-sized partials → per-block partial top-k → driver merge of
    ≤ k×blocks rows. At 100 TB the only all-to-all is over the distinct
    vocabulary (× #blocks partials), never the token stream."""
    from ray.data.aggregate import Sum

    agg = (
        docs.select_columns(["text"])
        .map_batches(_term_partial_counts, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n"))
    )

    def topk_block(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["n", "term"], ascending=[False, True], kind="mergesort"
        ).head(k)

    partials = agg.map_batches(topk_block, batch_format="pandas").to_pandas()
    out = (
        partials.sort_values(["n", "term"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out[["rank", "term", "n"]]


def _distinct_gram_pairs_stage(n: int):
    """Per-batch (doc_id, gram) DISTINCT pairs for n-token grams —
    the combiner feeding the corpus-wide doc-frequency groupby. Same
    vectorized build as repetition_stage (takes + join + factorize);
    distinctness within a doc comes from the (doc, code) np.unique."""

    def stage(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "gram": pa.array([], pa.string())}
        )
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(_utf8_col(batch, "text"), " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        values = pc.list_flatten(toks)
        ng_counts = np.maximum(lens - (n - 1), 0)
        total = int(ng_counts.sum())
        if total == 0:
            return empty
        tok_starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=tok_starts[1:])
        nz = np.flatnonzero(ng_counts > 0)
        cnt = ng_counts[nz]
        ng_starts = np.zeros(len(nz), dtype=np.int64)
        np.cumsum(cnt[:-1], out=ng_starts[1:])
        idx0 = (
            np.arange(total, dtype=np.int64)
            - np.repeat(ng_starts, cnt)
            + np.repeat(tok_starts[nz], cnt)
        )
        grams = pc.binary_join_element_wise(
            *(pc.take(values, pa.array(idx0 + j)) for j in range(n)), " "
        )
        codes, uniques = pd.factorize(grams.to_numpy(zero_copy_only=False))
        ncodes = np.int64(len(uniques))
        doc_pos = np.repeat(np.arange(len(nz), dtype=np.int64), cnt)
        uniq_keys = np.unique(doc_pos * ncodes + codes)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)[nz]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[uniq_keys // ncodes], pa.int64()),
                "gram": pa.array(uniques[uniq_keys % ncodes].tolist(), pa.string()),
            }
        )

    return stage


def boilerplate_ngrams(docs, n: int = 5, min_df: int = 2, broadcast_limit: int = 200_000):
    """Cross-document boilerplate n-gram marking (CCNet-style): for each
    doc, how many of its DISTINCT n-grams occur in ≥ ``min_df`` docs
    corpus-wide. → doc_id, n_distinct, n_boiler, boiler_ppm (docs with
    zero n-grams are dropped, matching the oracle's join semantics).

    Shape: distinct (doc, gram) pairs per batch (combiner) → groupby-gram
    doc-frequency over per-batch partials → hot-gram set, then
    threshold-switched join-back: hot grams under ``broadcast_limit``
    are broadcast (``ray.put`` + one is_in probe per batch — boilerplate
    is rare, so this is the common case); past the limit a distributed
    LEFT OUTER ``Dataset.join`` on gram does the same annotation with no
    driver-side state. Tests force both paths."""
    import ray
    from ray.data.aggregate import Sum

    pairs = docs.select_columns(["doc_id", "text"]).map_batches(
        _distinct_gram_pairs_stage(n), batch_format="pyarrow"
    )

    def df_partial(batch: pa.Table) -> pa.Table:
        # pairs are distinct per doc and docs never span input batches,
        # but partial counts sum correctly even if they did not collide
        g = (
            pd.DataFrame({"gram": batch["gram"].to_pylist()})
            .groupby("gram", as_index=False)
            .size()
            .rename(columns={"size": "df"})
        )
        return _table_from_pandas(g)

    df_t = (
        pairs.map_batches(df_partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("df", alias_name="df"))
    )
    hot = df_t.map_batches(
        lambda t: t.filter(pc.greater_equal(t["df"], min_df)), batch_format="pyarrow"
    )

    def totals(annotated):
        def partial(batch: pa.Table) -> pa.Table:
            g = (
                pd.DataFrame(
                    {
                        "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
                        "hit": batch["hit"].to_numpy(zero_copy_only=False).astype(np.int64),
                    }
                )
                .groupby("doc_id", as_index=False)
                .agg(n_distinct=("hit", "size"), n_boiler=("hit", "sum"))
            )
            return _table_from_pandas(g)

        agg = (
            annotated.map_batches(partial, batch_format="pyarrow")
            .groupby("doc_id")
            .aggregate(
                Sum("n_distinct", alias_name="n_distinct"),
                Sum("n_boiler", alias_name="n_boiler"),
            )
        )

        def finish(batch: pa.Table) -> pa.Table:
            nd = pc.cast(batch["n_distinct"], pa.int64())
            nb = pc.cast(batch["n_boiler"], pa.int64())
            # int64 divide == floor for nonnegatives; nb·1e6 ≪ 2^63
            ppm = pc.divide(pc.multiply(nb, 1_000_000), nd)
            return pa.table(
                {"doc_id": batch["doc_id"], "n_distinct": nd, "n_boiler": nb,
                 "boiler_ppm": ppm}
            )

        return agg.map_batches(finish, batch_format="pyarrow")

    probe = hot.limit(broadcast_limit + 1).take_all()
    if len(probe) <= broadcast_limit:
        ref = ray.put(np.asarray(sorted(r["gram"] for r in probe), dtype=object))

        def annotate(batch: pa.Table) -> pa.Table:
            # per-worker cached hash index over the broadcast hot set —
            # one get_indexer probe per batch, no per-batch hash-table
            # build (the _cached_sel_map lesson, crawl.py)
            key = ref.hex() if hasattr(ref, "hex") else id(ref)
            idx = _HOT_GRAM_CACHE.get(key)
            if idx is None:
                _HOT_GRAM_CACHE.clear()
                idx = pd.Index(ray.get(ref))
                _HOT_GRAM_CACHE[key] = idx
            pos = idx.get_indexer(
                np.asarray(batch["gram"].to_pylist(), dtype=object)
            )
            return pa.table(
                {"doc_id": batch["doc_id"], "hit": pa.array(pos >= 0)}
            )

        return totals(pairs.map_batches(annotate, batch_format="pyarrow"))

    def add_flag(t: pa.Table) -> pa.Table:
        return t.append_column("hot", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    joined = pairs.join(
        hot.map_batches(add_flag, batch_format="pyarrow"),
        join_type="left_outer",
        num_partitions=16,
        on=("gram",),
    )

    def to_hit(batch: pa.Table) -> pa.Table:
        hit = pc.is_valid(batch["hot"])
        return pa.table({"doc_id": batch["doc_id"], "hit": hit})

    return totals(joined.map_batches(to_hit, batch_format="pyarrow"))


def run_pii_redact(docs):
    return docs.map_batches(pii_redact_stage, batch_format="pyarrow")


def run_repetition(docs):
    return docs.map_batches(repetition_stage, batch_format="pyarrow")


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
