"""SiteProfile — the engine's user-extension surface.

The reference's extension unit is a BasePlugin subclass with required
attributes/methods enforced at init (base_plugin.py:210-234):
``mainURL, validURLStringsToCheck, invalidURLSubStrings, allowedDomains,
urlUniqueRegexps, nonContentURLs, nonContentStrings,
minArticleLengthInChars`` + ``extractArticleBody`` etc. Here the same
surface is a frozen dataclass of data (regex packs, filter lists) plus
an optional body-extractor callable, registered in ``PROFILES``; every
pipeline stage takes a profile, so "support a new site" is "register a
profile" — no engine changes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.datekit import ARTICLE_DATE_REGEXES, compile_date_patterns
from ..functions.htmlkit import extract_article_body
from ..functions.urlkit import DEFAULT_URL_ID_REGEXES, compile_id_patterns, urlsplit


@dataclass(frozen=True)
class SiteProfile:
    name: str = "synthetic"
    #: U3 retain list (empty → pass-through, scraper_utils.py:86-87)
    valid_url_substrings: tuple = ()
    #: U4 removal list
    invalid_url_substrings: tuple = ("/videos/", "/slideshows/")
    #: U6 nonContentStrings — substring ⇒ not a content URL
    non_content_strings: tuple = ()
    #: 3-group unique-ID regexes (group(3) = id), base_plugin.py:131-138
    url_id_regexes: tuple = tuple(DEFAULT_URL_ID_REGEXES)
    #: ordered (regex, strptime fmt) date pack, base_plugin.py:143-194
    date_regexes: tuple = tuple(ARTICLE_DATE_REGEXES)
    #: minimum html AND text length for an article (reference config)
    min_article_len: int = 150
    #: T8 invalid-text markers forcing re-extraction
    invalid_text_strings: tuple = ()
    #: T8 substrings scrubbed (→ ' ') after repeat-collapse
    substrings_to_filter: tuple = ()
    #: discovered-links cap per content page (base_plugin.py:1249-1251)
    link_cap: int = 500
    #: body extractor name (BODY_FORMATS chain by default)
    body_extractor: str = "five_format_chain"

    def is_hub(self, url: str) -> bool:
        """Hub/discovery page ⇔ reference nonContentURL (mainURL,
        section fronts): fetched for links, never for content
        (base_plugin.py:1185-1189 early return; link harvest at
        base_plugin.py:1001-1013)."""
        try:
            path = urlsplit(url).path
        except ValueError:
            return False
        if path in ("", "/"):
            return True
        return any(s in url for s in self.non_content_strings)


class CompiledProfile:
    """Profile with regexes compiled once — built per actor in __init__."""

    def __init__(self, profile: SiteProfile):
        self.profile = profile
        self.id_patterns = compile_id_patterns(list(profile.url_id_regexes))
        self.date_patterns = compile_date_patterns(list(profile.date_regexes))
        self.body_extract = extract_article_body


DEFAULT_PROFILE = SiteProfile()

PROFILES = {"synthetic": DEFAULT_PROFILE}
