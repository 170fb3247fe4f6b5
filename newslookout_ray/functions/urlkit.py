"""URL kernels: canonicalization, validity, filtering, identity, hashing.

Reimplements the reference's URL operator battery (SURVEY.md §2.2):

  U1  normalize_url            — reference scraper_utils.py:477-490 (lowercase)
  U2  is_valid_url             — reference scraper_utils.py:399-412 (tld-parse)
  U3  retain_valid_articles    — reference scraper_utils.py:78-105
  U4  remove_invalid_articles  — reference scraper_utils.py:108-129
  U7  url_key / same_url_without_query — reference scraper_utils.py:415-434
  U9  get_host                 — reference scraper_utils.py:388-396
  U10 extract_unique_id        — reference base_plugin.py:1063-1102
  U13 (crc32_hex lives in textkit)

The reference resolves hosts/TLDs with the ``tld`` package (full public
suffix list). That package is not in this sandbox, so validity here is:
http(s) scheme + a dotted netloc whose final label is in a compact
public-suffix subset covering the reference's domains and the synthetic
corpus. Semantics differences only arise for exotic TLDs, which neither
the fixtures nor the synthetic web contain.

``url_hash64`` is the stable 64-bit identity used by the seen-set shards
and for deterministic fetch-status simulation. blake2b(8B) is stable
across processes/machines (required for checkpoint resume); at 10^10-URL
scale this per-url digest is the natural C-extension/xxhash swap point —
the interface (uint64) would not change.
"""

from __future__ import annotations

import re
from hashlib import blake2b
from urllib.parse import urlsplit

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Compact public-suffix subset: enough for the reference's sites
# (.com/.in/.co.in/.org) and the synthetic corpus.
_TLD_SUFFIXES = {
    "com", "org", "net", "in", "io", "co", "gov", "edu", "info", "biz",
    "news", "media", "tv", "uk", "us", "de", "fr", "jp", "cn", "au",
}

#: Link prefixes the reference's extractLinks drops (scraper_utils.py:459-469).
BAD_LINK_PREFIXES = (
    "javascript:", "JavaScript:", "mailto:", "#", "?", "../", "tel:",
    "{{link}}", "{{showcmturl}}", "http://http://", "whatsapp:",
)

#: Default 3-group unique-ID regexes of the base plugin
#: (reference base_plugin.py:131-138); group(3) is the ID.
DEFAULT_URL_ID_REGEXES = [
    r"(http.+\/\/)(www\..+\.com\/.+\-)([0-9]{5,})",
    r"(http.+\/\/)(www\..+\.com\/.+\-)([0-9]{5,})(\.html)",
    r"(http.+\/\/)(www\..+\.in\/.+\/)([0-9]{5,})(\.html)",
    r"(http.+\/\/)(www\..+\.in\/.+\-)([0-9]{5,})",
    r"(http.+\/\/)(www\..+\.in\/.+\/)([0-9]{5,})",
    r"(http.+\/\/)(www\..+\.com\/.+=)([0-9]{5,})",
]


class ScrapeError(Exception):
    """Raised when a URL has no extractable unique identifier
    (reference data_structs.py ScrapeError analogue)."""


# ---------------------------------------------------------------------------
# U1 / U2 / U9 / U7
# ---------------------------------------------------------------------------


def normalize_url(article_url: str) -> str:
    """Canonicalize: lowercase (exact reference semantics, scraper_utils.py:477-490)."""
    return article_url.lower()


def get_host(url_str: str) -> str:
    """netloc of the URL ('' when unparsable) — reference scraper_utils.py:388-396."""
    try:
        return urlsplit(url_str).netloc
    except ValueError:
        return ""


def is_valid_url(url_to_check) -> bool:
    """True iff the URL parses with a recognized TLD (reference semantics:
    tld.get_tld succeeds ⇒ valid; scraper_utils.py:399-412)."""
    if url_to_check is None or url_to_check == "":
        return False
    try:
        parts = urlsplit(url_to_check)
    except ValueError:
        return False
    if parts.scheme not in ("http", "https", "ftp"):
        return False
    host = parts.netloc.rsplit("@", 1)[-1].split(":", 1)[0]
    if "." not in host:
        return False
    return host.rsplit(".", 1)[-1].lower() in _TLD_SUFFIXES


def url_key(url_str: str) -> str:
    """Canonical identity ignoring query/fragment: ``netloc + path``.

    Two URLs are "the same" in the reference when netloc and path match
    (sameURLWithoutQueryParams, scraper_utils.py:415-434).
    """
    try:
        parts = urlsplit(url_str)
        return parts.netloc + parts.path
    except ValueError:
        return url_str


def same_url_without_query(url1: str, url2: str) -> bool:
    """Reference U7 semantics — note the reference returns True when either
    URL fails to parse (the except path leaves the True default)."""
    try:
        p1, p2 = urlsplit(url1), urlsplit(url2)
    except ValueError:
        return True
    return p1.netloc == p2.netloc and p1.path == p2.path


# ---------------------------------------------------------------------------
# U3 / U4 — substring retain / remove filters
# ---------------------------------------------------------------------------


def retain_valid_articles(article_list, valid_patterns) -> list:
    """Keep URLs containing ANY valid substring (and len>9); pass-through
    when either list is empty. Exact reference scraper_utils.py:78-105."""
    if len(valid_patterns) < 1 or len(article_list) < 1:
        return list(article_list)
    out = []
    for article in article_list:
        for pat in valid_patterns:
            if article.find(pat) > -1 and len(article) > 9:
                out.append(article)
                break
    return out


def remove_invalid_articles(article_list, invalid_patterns) -> list:
    """Drop URLs containing ANY invalid substring. Exact reference
    scraper_utils.py:108-129."""
    out = []
    for article in article_list:
        if all(article.find(pat) == -1 for pat in invalid_patterns):
            out.append(article)
    return out


# ---------------------------------------------------------------------------
# U10 — unique-ID extraction from URL
# ---------------------------------------------------------------------------


def extract_unique_id(url: str, compiled_patterns) -> str:
    """First pattern whose group(3) matches wins; otherwise ScrapeError.

    Exact decision structure of reference base_plugin.py:1063-1102: URLs
    of length <= 6 raise; a URL matching no pattern raises (the caller
    falls back to CRC32 — base_plugin.py:1372-1380).
    """
    if len(url) <= 6:
        raise ScrapeError("Invalid article since it does not have a unique identifier.")
    for pat in compiled_patterns:
        m = pat.search(url)
        if m is not None:
            return m.group(3)
    raise ScrapeError("Invalid article since it does not have a unique identifier.")


def compile_id_patterns(patterns=None):
    if patterns is None:
        patterns = DEFAULT_URL_ID_REGEXES
    return [re.compile(p) for p in patterns]


# ---------------------------------------------------------------------------
# Stable 64-bit URL hash (seen-set identity, shard routing, status sim)
# ---------------------------------------------------------------------------


def url_hash64(url: str) -> int:
    """Stable unsigned 64-bit hash of the canonical URL string."""
    return int.from_bytes(blake2b(url.encode("utf-8"), digest_size=8).digest(), "big")


def url_hash64_batch(urls) -> np.ndarray:
    """Vectorized-enough batch form: one C-speed blake2b per url."""
    out = np.empty(len(urls), dtype=np.uint64)
    frombytes = int.from_bytes
    for i, u in enumerate(urls):
        out[i] = frombytes(blake2b(u.encode("utf-8"), digest_size=8).digest(), "big")
    return out


# ---------------------------------------------------------------------------
# Vectorized Arrow forms for the map_batches hot path
# ---------------------------------------------------------------------------

_HOST_RE = r"^[a-z][a-z0-9+.\-]*://([^/?#]*).*$"


def normalize_url_arrow(arr: pa.Array) -> pa.Array:
    return pc.utf8_lower(arr)


def host_arrow(arr: pa.Array) -> pa.Array:
    """Extract netloc with a single RE2 pass (lowercased absolute URLs)."""
    return pc.replace_substring_regex(arr, pattern=_HOST_RE, replacement=r"\1")


def contains_any_arrow(arr: pa.Array, substrings) -> pa.Array:
    """Boolean mask: string contains any of the substrings (OR-reduction)."""
    if not substrings:
        return pa.array(np.zeros(len(arr), dtype=bool))
    mask = pc.match_substring(arr, substrings[0])
    for s in substrings[1:]:
        mask = pc.or_kleene(mask, pc.match_substring(arr, s))
    return mask


def filter_urls_mask(arr: pa.Array, valid_substrings, invalid_substrings) -> pa.Array:
    """U5 filterInvalidURLs as one vectorized mask: (U3 then U4).

    Reference base_plugin.py:510-526: retainValidArticles (keep if any
    valid substring AND len>9; pass-through if list empty) then
    removeInValidArticles (drop if any invalid substring).
    """
    if valid_substrings:
        keep = pc.and_kleene(
            contains_any_arrow(arr, list(valid_substrings)),
            pc.greater(pc.utf8_length(arr), 9),
        )
    else:
        keep = pa.array(np.ones(len(arr), dtype=bool))
    if invalid_substrings:
        keep = pc.and_kleene(
            keep, pc.invert(contains_any_arrow(arr, list(invalid_substrings)))
        )
    return keep
