"""Fetched-page processing: the reference's fetchDataFromURL semantics as
a pure per-page core + an actor-pool map_batches stage.

``process_fetched_page`` replicates the decision structure of reference
``BasePlugin.fetchDataFromURL`` (base_plugin.py:1149-1296) +
``parseFetchedData`` (base_plugin.py:1301-1392) for the deterministic
(non-newspaper) path:

  raw html (utf-8)                    base_plugin.py:1241
  → cleanText(html)                   base_plugin.py:1245  [T2 on raw HTML]
  → links = filterInvalidURLs(extractLinks(cleaned)) capped at 500
                                      base_plugin.py:1246-1251 [S5+U5, O2]
  → body  = extractArticleBody(cleaned)  via checkAndCleanText since the
    initial text is empty/short       mod_en_in_ecotimes.py:764-785 [T7/T8]
  → body  = filterRepeatedchars(body, [' ','\\t','\\n','\\r\\n','-','_','.'])
    then subStringsToFilter → ' '     [T8]
  → pubdate = extractPublishedDate(cleaned)  (failure ⇒ whole page
    rejected and its links dropped — the reference raises out of
    parseFetchedData into the outer try, base_plugin.py:1342-1346) [T9]
  → unique_id = group(3) of url regexes, CRC32 fallback
                                      base_plugin.py:1063-1102, 1372-1380 [U10/U13]
  → text = cleanText(body)            news_event.py:220 setText [T2]
  → article kept iff len(text) > min_article_len (links kept with it,
    base_plugin.py:1264-1287); shorter ⇒ fetched-empty, links dropped.

Hub pages (profile.is_hub) are the reference's discovery fetches: links
are harvested unconditionally (extr_links_from_main_noncont,
base_plugin.py:1001-1013), no article is produced.

Page states (the seen-set state column):
  1 = article extracted   2 = http/fetch error   3 = fetched, no article
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa

from ..functions import htmlkit, textkit
from ..functions import keywords as keywords_mod
from ..functions.datekit import DateExtractError, extract_published_date
from ..functions.textkit import REPEAT_CHAR_LIST, clean_text, crc32_hex, filter_repeated_chars
from ..functions.urlkit import ScrapeError, extract_unique_id, remove_invalid_articles, retain_valid_articles
from .profiles import DEFAULT_PROFILE, CompiledProfile, SiteProfile

STATE_ARTICLE = 1
STATE_ERROR = 2
STATE_EMPTY = 3

#: pipeline reference clock for the future-date guard (deterministic runs)
REFERENCE_NOW = datetime(2026, 1, 1)


def _filter_links(profile: SiteProfile, links: list) -> list:
    """U5 filterInvalidURLs composition (base_plugin.py:510-526)."""
    kept = retain_valid_articles(links, list(profile.valid_url_substrings))
    return remove_invalid_articles(kept, list(profile.invalid_url_substrings))


def process_fetched_page(cp: CompiledProfile, url: str, html: bytes, now=REFERENCE_NOW) -> dict:
    """Pure per-page core — used by the Ray stage AND the sequential
    reference-semantics simulator, so both agree by construction."""
    profile = cp.profile
    html_str = textkit.clean_non_utf8(html)

    if profile.is_hub(url):
        links = _filter_links(profile, htmlkit.extract_links_from_html(url, html_str))
        return {"state": STATE_EMPTY, "links": links, "is_hub": True,
                "title": "", "text": "", "unique_id": "", "pubdate": None,
                "raw_size": len(html_str), "text_size": 0,
                "keywords": [], "authors": [], "industries": []}

    if len(html_str) <= profile.min_article_len:
        return {"state": STATE_EMPTY, "links": [], "is_hub": False,
                "title": "", "text": "", "unique_id": "", "pubdate": None,
                "raw_size": len(html_str), "text_size": 0,
                "keywords": [], "authors": [], "industries": []}

    cleaned_html = clean_text(html_str)
    links = _filter_links(profile, htmlkit.extract_links_from_html(url, cleaned_html))
    if len(links) > profile.link_cap:
        links = links[: profile.link_cap]

    # T7/T8 checkAndCleanText path (initial text empty → re-extract)
    body = cp.body_extract(cleaned_html)
    # checkAndCleanText re-extraction rule (mod_en_in_business_std.py:
    # 193-205): invalid marker present OR body too short → alternate
    # extractor, when the profile declares one
    if cp.body_fallback is not None and (
        len(body) < profile.min_article_len
        or any(s in body for s in profile.invalid_text_strings)
    ):
        body = cp.body_fallback(cleaned_html)
    body = filter_repeated_chars(body, textkit.dedupe_list(list(REPEAT_CHAR_LIST)))
    for sub in textkit.dedupe_list(list(profile.substrings_to_filter)):
        body = body.replace(sub, " ")

    try:
        pubdate = extract_published_date(cleaned_html, cp.date_patterns, now=now)
    except DateExtractError:
        # reference: raises out of parseFetchedData → page ignored, links lost
        return {"state": STATE_EMPTY, "links": [], "is_hub": False,
                "title": "", "text": "", "unique_id": "", "pubdate": None,
                "raw_size": len(html_str), "text_size": 0,
                "keywords": [], "authors": [], "industries": []}

    try:
        unique_id = extract_unique_id(url, cp.id_patterns)
    except ScrapeError:
        # U11: content regexes before the CRC fallback
        # (mod_en_in_trak.py:144-185 extractUniqueIDFromContent)
        unique_id = cp.extract_content_id(html_str)
        if unique_id is None:
            unique_id = crc32_hex(url)  # base_plugin.py:1372-1380 fallback

    text = clean_text(body)
    if text is None:
        text = ""
    if len(text) > profile.min_article_len:
        title = htmlkit.extract_title(cleaned_html)
        return {"state": STATE_ARTICLE, "links": links, "is_hub": False,
                "title": title, "text": text,
                "unique_id": unique_id, "pubdate": pubdate.date(),
                "raw_size": len(html_str), "text_size": len(text),
                # T12/T10/T11 enrichment columns: allKeywords =
                # article.keywords (deterministic tf ranking, the
                # newspaper .nlp() analogue) + meta keywords +
                # news_keywords, first-occurrence deduped — the full
                # news_event.py:378-385 merge
                "keywords": keywords_mod.merge_keywords(
                    keywords_mod.article_keywords(title, text),
                    htmlkit.extract_meta_keywords(html_str),
                ),
                "authors": cp.extract_authors(html_str),
                "industries": cp.extract_industries(url, html_str)}
    return {"state": STATE_EMPTY, "links": [], "is_hub": False,
            "title": "", "text": "", "unique_id": "", "pubdate": None,
            "raw_size": len(html_str), "text_size": 0,
            "keywords": [], "authors": [], "industries": []}


ARTICLE_FIELDS = [
    ("url", pa.string()),
    ("host", pa.string()),
    ("unique_id", pa.string()),
    ("pubdate", pa.date32()),
    ("title", pa.string()),
    ("text", pa.large_string()),
    ("module", pa.string()),
    ("state", pa.int8()),
    ("raw_size", pa.int64()),
    ("text_size", pa.int64()),
    ("links", pa.list_(pa.string())),
    ("keywords", pa.list_(pa.string())),
    ("authors", pa.list_(pa.string())),
    ("industries", pa.list_(pa.string())),
    ("pseq", pa.int64()),
    ("lidx", pa.int64()),
    ("depth", pa.int32()),
    ("order_in_host", pa.int64()),
    ("status", pa.int16()),
    # frontier provenance carried through so transient-retry rows can be
    # re-enqueued with their ORIGINAL order key and attempt count
    ("birth_round", pa.int32()),
    ("attempts", pa.int32()),
]
EXTRACT_SCHEMA = pa.schema(ARTICLE_FIELDS)


class PageExtractor:
    """Actor-pool map_batches stage: fetched pages → article/link records.

    State (compiled regex packs, the body-format dispatch) is built once
    per actor in __init__ — the reference loads the same state once per
    plugin object (base_plugin.py:210-246). HTML parsing is inherently
    per-document; columns are assembled back into Arrow.

    Input batch columns: url, host, html(binary, nullable), status(int16),
    pseq, lidx, depth. Output: EXTRACT_SCHEMA (state=2 rows for HTTP
    errors / missing pages carry no links/text).
    """

    def __init__(self, profile: SiteProfile = DEFAULT_PROFILE, now=REFERENCE_NOW):
        self.cp = CompiledProfile(profile)
        self.now = now
        self.module = profile.name

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        statuses = batch["status"].to_pylist()
        out = {name: [] for name, _ in ARTICLE_FIELDS}
        for i, url in enumerate(urls):
            if statuses[i] != 200 or htmls[i] is None:
                rec = {"state": STATE_ERROR, "links": [], "title": "", "text": "",
                       "unique_id": "", "pubdate": None, "raw_size": 0, "text_size": 0}
            else:
                rec = process_fetched_page(self.cp, url, htmls[i], now=self.now)
            out["url"].append(url)
            out["host"].append(batch["host"][i].as_py())
            out["unique_id"].append(rec["unique_id"])
            out["pubdate"].append(rec["pubdate"])
            out["title"].append(rec["title"])
            out["text"].append(rec["text"])
            out["module"].append(self.module)
            out["state"].append(rec["state"])
            out["raw_size"].append(rec["raw_size"])
            out["text_size"].append(rec["text_size"])
            out["links"].append(rec["links"])
            out["keywords"].append(rec.get("keywords", []))
            out["authors"].append(rec.get("authors", []))
            out["industries"].append(rec.get("industries", []))
            out["pseq"].append(batch["pseq"][i].as_py())
            out["lidx"].append(batch["lidx"][i].as_py())
            out["depth"].append(batch["depth"][i].as_py())
            out["order_in_host"].append(batch["order_in_host"][i].as_py())
            out["status"].append(statuses[i])
            out["birth_round"].append(
                batch["birth_round"][i].as_py() if "birth_round" in batch.column_names else 0
            )
            out["attempts"].append(
                batch["attempts"][i].as_py() if "attempts" in batch.column_names else 0
            )
        arrays = [pa.array(out[name], type=typ) for name, typ in ARTICLE_FIELDS]
        return pa.Table.from_arrays(arrays, schema=EXTRACT_SCHEMA)
