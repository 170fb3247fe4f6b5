"""Deterministic tf-keyword ranking — the newspaper ``Article.nlp()``
analogue (T12).

The reference imports the article through newspaper and takes
``newspaperArticle.keywords`` ahead of the meta keyword slices
(news_event.py:378-385); those keywords come from newspaper's public
``nlp.keywords`` routine: split words, drop stopwords, count term
frequency, keep the top 10 by (count, word) descending. This module
follows that algorithm's STRUCTURE deterministically with no model or
download dependency — but NOT its exact stopword inventory (see the
last paragraph), so keyword SETS can differ from a real newspaper run
on pages whose top terms include words only one of the two lists
contains (e.g. 'also', 'one', 'would' are stopwords to newspaper's
larger list but keywords candidates here):

  * ``split_words``: strip every char that is not ``\\w`` or space,
    split on whitespace, strip trailing dots, lowercase (newspaper
    nlp.py's regex semantics);
  * frequency ranking over non-stopword tokens, top ``NUM_KEYWORDS``
    sorted by (count, token) in reverse — ties break toward the
    lexicographically larger token, exactly as ``sorted(...,
    key=lambda x: (x[1], x[0]), reverse=True)`` does;
  * article keywords = title keywords ∪ text keywords. newspaper uses
    ``list(set(title) + set(text))`` whose order is interpreter-salt
    dependent; a distributed engine needs stable output, so the union
    here is first-occurrence ordered (title ranking first, then text
    ranking) — same SET, deterministic ORDER (documented deviation).

The stopword inventory is the classic public English stopword list
(the NLTK English set), embedded so workers never touch the
filesystem; newspaper ships a larger file-based list, which is not
available in this environment — golden outputs in
tests/test_profiles_reference.py lock the behavior of THIS list.
"""

from __future__ import annotations

import re

NUM_KEYWORDS = 10

#: public-domain classic English stopword list (NLTK english set)
STOPWORDS = frozenset(
    """a about above after again against ain all am an and any are aren
    aren't as at be because been before being below between both but by
    can couldn couldn't d did didn didn't do does doesn doesn't doing don
    don't down during each few for from further had hadn hadn't has hasn
    hasn't have haven haven't having he her here hers herself him himself
    his how i if in into is isn isn't it it's its itself just ll m ma me
    mightn mightn't more most mustn mustn't my myself needn needn't no
    nor not now o of off on once only or other our ours ourselves out
    over own re s same shan shan't she she's should should've shouldn
    shouldn't so some such t than that that'll the their theirs them
    themselves then there these they this those through to too under
    until up ve very was wasn wasn't we were weren weren't what when
    where which while who whom why will with won won't wouldn wouldn't y
    you you'd you'll you're you've your yours yourself yourselves""".split()
)

_NON_WORD = re.compile(r"[^\w ]", re.UNICODE)


def split_words(text: str) -> list:
    """newspaper nlp.py split_words: drop non-word/non-space chars,
    whitespace-split, strip trailing/leading dots, lowercase."""
    if not text:
        return []
    # lowercase the whole string once (C pass) instead of per word;
    # strip('.') commutes with lower() so the output is unchanged
    cleaned = _NON_WORD.sub("", text).lower()
    return [w.strip(".") for w in cleaned.split()]


def keyword_scores(text: str, num_keywords: int = NUM_KEYWORDS) -> dict:
    """Top-N (token → score) by term frequency, newspaper's formula:
    score = tf/num_words * 1.5 + 1 (num_words counted BEFORE the
    stopword filter). Ranking key: (count, token) descending."""
    words = split_words(text)
    if not words:
        return {}
    num_words = len(words)
    freq: dict = {}
    for w in words:
        if w and w not in STOPWORDS:
            freq[w] = freq.get(w, 0) + 1
    top = sorted(freq.items(), key=lambda kv: (kv[1], kv[0]), reverse=True)
    top = top[: min(num_keywords, len(top))]
    return {w: (c * 1.0 / max(num_words, 1)) * 1.5 + 1 for w, c in top}


def article_keywords(title: str, text: str) -> list:
    """Deterministic ``Article.keywords`` analogue: the union of title
    and text top-10 keyword sets, first-occurrence ordered (title rank
    order first, then text rank order)."""
    out, seen = [], set()
    for w in list(keyword_scores(title)) + list(keyword_scores(text)):
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def merge_keywords(nlp_keywords: list, meta_keywords: list) -> list:
    """allKeywords = article.keywords + meta keywords + news_keywords
    (news_event.py:378-385) with first-occurrence dedup, preserving the
    reference's concatenation order."""
    out, seen = [], set()
    for w in list(nlp_keywords) + list(meta_keywords):
        k = w.strip()
        if k and k not in seen:
            seen.add(k)
            out.append(k)
    return out
