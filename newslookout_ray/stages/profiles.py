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
    #: body extractor name (SITE_BODY_EXTRACTORS registry in htmlkit)
    body_extractor: str = "five_format_chain"
    #: fallback extractor when the primary body is too short or carries
    #: an invalid-text marker — mirrors checkAndCleanText's re-extract
    #: (base_plugin pattern, e.g. mod_en_in_business_std.py:193-205)
    body_fallback_extractor: str = ""
    #: T10 author regexes — group(2) = author string, comma-split
    #: (base_plugin authorRegexps convention)
    author_regexes: tuple = ()
    #: tag-based author fallback name (AUTHOR_TAG_FALLBACKS registry)
    author_tag_fallback: str = ""
    #: T11 industry regexes — group(2) = industry (mod_en_in_trak.py:186-200)
    industry_regexes: tuple = ()
    #: T11 ecotimes rule: industry = smallest subdomain of the url's
    #: netloc when it isn't the bare site name (mod_en_in_ecotimes.py:575-593)
    industries_from_subdomain: str = ""
    #: U11 content-ID regexes — group(2) = id searched in the page HTML
    #: when the URL regexes fail (mod_en_in_trak.py:144-185)
    content_id_regexes: tuple = ()

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
        import re

        from ..functions.htmlkit import AUTHOR_TAG_FALLBACKS, SITE_BODY_EXTRACTORS

        self.profile = profile
        self.id_patterns = compile_id_patterns(list(profile.url_id_regexes))
        self.date_patterns = compile_date_patterns(list(profile.date_regexes))
        self.body_extract = SITE_BODY_EXTRACTORS[profile.body_extractor]
        self.body_fallback = (
            SITE_BODY_EXTRACTORS[profile.body_fallback_extractor]
            if profile.body_fallback_extractor
            else None
        )
        self.author_patterns = [re.compile(p) for p in profile.author_regexes]
        self.industry_patterns = [re.compile(p) for p in profile.industry_regexes]
        self.content_id_patterns = [re.compile(p) for p in profile.content_id_regexes]
        self.author_tag_fallback = (
            AUTHOR_TAG_FALLBACKS[profile.author_tag_fallback]
            if profile.author_tag_fallback
            else None
        )

    def extract_authors(self, html_text: str) -> list:
        """T10 (mod_en_in_ecotimes.py:595-614 / mod_en_in_hindu.py
        authorRegexps): first matching regex's group(2), comma-split;
        tag fallback when no regex hits."""
        for pat in self.author_patterns:
            m = pat.search(html_text)
            if m is not None:
                return m.group(2).split(",")
        if self.author_tag_fallback is not None:
            return self.author_tag_fallback(html_text)
        return []

    def extract_industries(self, url: str, html_text: str) -> list:
        """T11: subdomain rule (ecotimes) and/or regex pack (trak)."""
        from ..functions.urlkit import get_host

        industries = []
        if self.profile.industries_from_subdomain:
            sub = get_host(url).split(".")[0]
            if sub != self.profile.industries_from_subdomain:
                industries.append(sub)
        for pat in self.industry_patterns:
            # findall, not search: the reference appends EVERY match of
            # the pattern (mod_en_in_trak.py:195-197 loops re.findall)
            for m in pat.findall(html_text):
                industries.append(m[1] if isinstance(m, tuple) else m)
        return industries

    def extract_content_id(self, html_text: str):
        """U11: unique ID from the page content (group(2)), or None."""
        for pat in self.content_id_patterns:
            m = pat.search(html_text)
            if m is not None:
                return m.group(2)
        return None


DEFAULT_PROFILE = SiteProfile()


# ---------------------------------------------------------------------------
# real site profiles — data packs transcribed from the reference plugins
# (constants, not code: the byte-identical extraction contract requires
# these exact regex/filter strings)
# ---------------------------------------------------------------------------

ECOTIMES_PROFILE = SiteProfile(
    name="mod_en_in_ecotimes",
    valid_url_substrings=("economictimes.indiatimes.com/",),
    # subset of mod_en_in_ecotimes.py:85-161 invalidURLSubStrings
    invalid_url_substrings=(
        "//www.indiatimes.com/",
        "/videos/",
        "/slideshows/",
        "/podcast/",
        "/panache/",
        "/multimedia/",
    ),
    url_id_regexes=(
        r"(http.+\/economictimes\.indiatimes\.com)(.*\/)([0-9]+)(\.cms)",
        r"(\.economictimes\.indiatimes\.com\/)(.+\/)([0-9]+)",
        r"(http.+\/\/)(.+economictimes\.indiatimes\.com\/.+\/)([0-9]{5,})",
    )
    + tuple(DEFAULT_URL_ID_REGEXES),
    # plugin pack (Last-Modified meta, mod_en_in_ecotimes.py:484-488)
    # merged with the base pack, as the plugin's __init__ does (:532)
    date_regexes=(
        (
            r"(<meta http-equiv=\"Last-Modified\" content=\"[a-zA-Z]{3,}, )"
            r"([a-zA-Z]{3}[ ]+[0-9]{1,2},[ ]+20[0-9]{2}[ ]+[0-9]{1,2}:[0-9]{2}:[0-9]{2})( [AMPamp]{2}\"\/>)",
            "%b %d, %Y  %H:%M:%S",
        ),
    )
    + tuple(ARTICLE_DATE_REGEXES),
    min_article_len=400,
    invalid_text_strings=(
        "If you choose to ignore this message, we'll assume that you are happy to receive all cookies",
    ),
    body_extractor="five_format_chain",
    author_regexes=(
        r"(agency:')([a-zA-Z0-9]+)(')",
        r"(channel :  ')([a-zA-Z0-9]+)(',)",
        r"(agename = ')([a-zA-Z0-9]+)(';)",
        r"(<div class = \"ag tac\">)([a-zA-Z0-9]+)(<\/div>)",
        r"(\"publisher\":{\"@type\":\"Organization\",\"name\":\")([a-zA-Z0-9]+)(\")",
        r"(\.economictimes\.indiatimes\.com\/agency\/.+\" target = \"_blank\">)([a-zA-Z0-9]+)(<\/a>)",
    ),
    author_tag_fallback="ecotimes_span_ag",
    industries_from_subdomain="economictimes",
)

HINDU_PROFILE = SiteProfile(
    name="mod_en_in_hindu",
    valid_url_substrings=("thehindu.com/",),
    url_id_regexes=(
        r"(https\:\/\/)(www.thehindu.com\/business\/.*\-)([0-9]+)(\.ece$)",
        r"(https\:\/\/www.thehindu.com\/business\/.*)(\-)([0-9]+)(/$)",
        r"(https\:\/\/www.thehindu.com\/business\/.*)(article)([0-9]+)(\.ece)",
        r"(https:\/\/)(www.thehindu.com\/news\/.+\/article)([0-9]{3,})(\.ece)",
    )
    + tuple(DEFAULT_URL_ID_REGEXES),
    date_regexes=(
        (
            r"(<meta name=\"publish-date\" content=\")"
            r"(20[0-9]{2}\-[0-9]{2}\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\+05:30\")",
            "%Y-%m-%dT%H:%M:%S",
        ),
        (
            r"(<none>\n)([a-zA-Z]{3,} [0-9]{1,2}, 20[0-9]{2} [0-9]{1,2}:[0-9]{2})( IST)",
            "%B %d, %Y %H:%M",
        ),
    )
    + tuple(ARTICLE_DATE_REGEXES),
    min_article_len=200,
    body_extractor="hindu",
    author_regexes=(
        r"(tp.push\(\[\"setContentAuthor\", \")([a-zA-Z.\- ]{3,})(\"\]\))",
        r"(<meta property=\"article:author\" content=\")([a-zA-Z_\-.\ ]{3,})(\" \/>)",
        r"('Author':')([a-zA-Z_\-.\ ]{3,})(',)",
        r"('authorName' : ')([a-zA-Z.\- ]{3,})(')",
    ),
)

NDTV_PROFILE = SiteProfile(
    name="mod_en_in_ndtv",
    valid_url_substrings=("ndtv.com/",),
    url_id_regexes=(
        r"(^http.+\/\/)(www.ndtv.com\/.+\-)([0-9]{5,})",
        r"(^http.+\/\/)(www.ndtv.com\/.+\-)([0-9]{5,})(\?)",
    )
    + tuple(DEFAULT_URL_ID_REGEXES),
    date_regexes=(
        (
            r"(content = \")(20[0-9]{2}\-[0-9]{2}\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\+05:30\")",
            "%Y-%m-%dT%H:%M:%S",
        ),
        (
            r"(Updated: )([a-zA-Z]+ [0-9]{1,2}, 20[0-9]{2} [0-9]{1,2}:[0-9]{2})( [a-zA-Z]{2} IST)",
            "%B %d, %Y %H:%M",
        ),
        (
            r"(\"datePublished\":\")([0-9]{4}-[0-9]{2}-[0-9]{2})(T[0-9]{2}:[0-9]{2}:[0-9]{2}\+05:30\")",
            "%Y-%m-%d",
        ),
    )
    + tuple(ARTICLE_DATE_REGEXES),
    min_article_len=250,
    body_extractor="ndtv",
)

TRAK_CONTENT_ID_REGEXES = (
    r"(<link rel='shortlink' href='https://trak.in/\?p=)([0-9]{4,})(' />)",
)

BUSINESS_STD_PROFILE = SiteProfile(
    name="mod_en_in_business_std",
    valid_url_substrings=("www.business-standard.com/article/",),
    invalid_url_substrings=("hindi.business-standard.com", "/sports"),
    non_content_strings=("/article/opinion/",),
    # mod_en_in_business_std.py:127-129 (+ base pack, :161)
    url_id_regexes=(
        r"(^http.+\/\/)(www.business\-standard.com\/.+\-)([0-9]{5,})",
        r"(^http.+\/\/)(www.business\-standard.com\/article.+\-)([0-9]{5,})(_1.html)",
        r"(^http.+\/\/)(www.business\-standard.com\/article.+article_id=)([0-9]{5,})(_*[0-9]*)",
    )
    + tuple(DEFAULT_URL_ID_REGEXES),
    # mod_en_in_business_std.py:131-139 (+ base pack, :160)
    date_regexes=(
        (
            r"(\"datePublished\": \")(20[0-9]{2}\-[0-9]{2}\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\+05:30\")",
            "%Y-%m-%dT%H:%M:%S",
        ),
        (
            r"(content = \")([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \+0530)(\">)",
            "%a, %d %b %Y %H:%M:%S %z",
        ),
        (r"(<strong>)([a-zA-Z]{3} [0-9]{1,2}, 20[0-9]{2})(<\/strong>)", "%b %d, %Y"),
    )
    + tuple(ARTICLE_DATE_REGEXES),
    min_article_len=400,
    invalid_text_strings=(
        "Support quality journalism and subscribe to Business Standard",
        "Business Standard has always strived hard to provide up-to-date information",
    ),
    substrings_to_filter=(
        "(Only the headline and picture of this report may have been reworked"
        " by the Business Standard staff;"
        " the rest of the content is auto-generated from a syndicated feed.)",
    ),
    body_extractor="generic_paragraphs",
    # extractAuthors meta pattern (mod_en_in_business_std.py:178)
    author_regexes=(r'(<meta name="author" content=")([a-zA-Z0-9 _\-]+)(">)',),
)

LIVEMINT_PROFILE = SiteProfile(
    name="mod_en_in_livemint",
    valid_url_substrings=("www.livemint.com",),
    # subset of mod_en_in_livemint.py:69-205 invalidURLSubStrings
    invalid_url_substrings=(
        "www.livemint.com/politics/news/",
        "www.livemint.com/sports/",
        "www.livemint.com/videos/",
        "www.livemint.com/food/",
        "www.livemint.com/how-to-lounge/",
        "www.livemint.com/relationships/",
        "livemint.com/fashion/",
        "livemint.com/smart-living/",
    ),
    url_id_regexes=(r"(https:\/\/)(www\.livemint\.com\/.+\-)([0-9]{5,})(\.html)",)
    + tuple(DEFAULT_URL_ID_REGEXES),
    # plugin adds no own date regexes (articleDateRegexps = dict(), :212)
    min_article_len=400,
    substrings_to_filter=(
        "Subscribe to Mint Newsletters",
        "Enter a valid email",
        "Thank you for subscribing to our newsletter.",
    ),
    body_extractor="generic_paragraphs",
)

MONEYCONTROL_PROFILE = SiteProfile(
    name="mod_en_in_moneycontrol",
    valid_url_substrings=("https://www.moneycontrol.com/",),
    url_id_regexes=(
        r"(^https\:\/\/www.moneycontrol.com\/.+)(_)([0-9]{6,})(\.html$)",
        r"(https\:\/\/www.moneycontrol.com\/.+)(_)([0-9]{6,})(\.html)",
    )
    + tuple(DEFAULT_URL_ID_REGEXES),
    date_regexes=(
        (
            r'(<input type=\"hidden\" id=\"to_timestamp\" value=\")'
            r"(20[0-9]{2}[0-9]{2}[0-9]{2}[0-9]{2}[0-9]{2}[0-9]{2})(\">)",
            "%Y%m%d%H%M%S",
        ),
    )
    + tuple(ARTICLE_DATE_REGEXES),
    min_article_len=400,
    body_extractor="generic_paragraphs",
    body_fallback_extractor="moneycontrol",
)

TOI_PROFILE = SiteProfile(
    name="mod_en_in_timesofindia",
    valid_url_substrings=("https://timesofindia.indiatimes.com/blogs/",),
    # plugin has no own url regexes; ID comes from page content
    # (mod_en_in_timesofindia.py:177-219 extractUniqueIDFromContent)
    url_id_regexes=tuple(DEFAULT_URL_ID_REGEXES),
    content_id_regexes=(r"(data\-articlemsid=\")([0-9]{3,})(\")",),
    min_article_len=400,
    body_extractor="toi",
    author_regexes=(
        r"(\"author\":{\"@type\":\"Person\",\"name\":\")([a-zA-Z0-9 ]+)(\"})",
    ),
)

FORBES_PROFILE = SiteProfile(
    name="mod_en_in_forbes",
    valid_url_substrings=("https://www.forbesindia.com/",),
    url_id_regexes=(
        r"(https\:\/\/www\.forbesindia\.com\/.+)(\/)([0-9]{4,})(/[0-9]+)",
        r"(https\:\/\/www\.forbesindia\.com\/.+)(\/)([0-9]{4,})",
        r"(https\:\/\/www\.forbesindia\.com/article/.*)(\-)([0-9]+)(\.html)",
    )
    + tuple(DEFAULT_URL_ID_REGEXES),
    date_regexes=(
        (
            r"(\"datePublished\": \"[0-9]{1,2}:[0-9]{2}:[0-9]{2} [AMP]{2} IST )([a-zA-Z]{3} [0-9]{1,2}, [0-9]{4})(\")",
            "%b %d, %Y",
        ),
    )
    + tuple(ARTICLE_DATE_REGEXES),
    min_article_len=400,
    body_extractor="generic_paragraphs",
    body_fallback_extractor="articlestorycontent",
)

INDIAKANOON_PROFILE = SiteProfile(
    name="mod_en_in_indiakanoon",
    invalid_url_substrings=("https://indiankanoon.org/search/?",),
    url_id_regexes=(
        r"(https:\/\/)(indiankanoon.org\/doc\/)([0-9]{5,})(\/)",
        r"(https:\/\/)(indiankanoon.org\/.+)([0-9]{5,})(\.html)",
    )
    + tuple(DEFAULT_URL_ID_REGEXES),
    # mod_en_in_indiakanoon.py:148-164 (judgment-title date styles)
    date_regexes=(
        (
            r"(<TITLE>.* )([0-9]{1,2} [January|February|March|April|May|June|July|August|September|October|November"
            r"|December]{3,}, [2|1][0|1][0-9]{2})",
            "%d %B, %Y",
        ),
        (
            r"(on )([0-9]+ [a-zA-Z]{3}, [0-9]{4})(<\/TITLE>)",
            "%d %b, %Y",
        ),
        (
            r"(on )([0-9]+ [a-zA-Z]{3,}, [0-9]{4})(<\/TITLE>)",
            "%d %B, %Y",
        ),
        (r"(Date: )([0-9]{2}\/[0-9]{2}\/20[0-9]{2})", "%d/%m/%Y"),
    )
    + tuple(ARTICLE_DATE_REGEXES),
    min_article_len=400,
    substrings_to_filter=(
        "<p>Try out our <b>Premium Member</b> services: <b>Virtual Legal Assistant</b>"
        ", <b>Query Alert Service</b> and an ad-free experience. "
        '<a href="/members/">Free for one month</a> and pay only if you like it.</p>',
    ),
    body_extractor="indiakanoon",
)

INEXP_BUSINESS_PROFILE = SiteProfile(
    name="mod_en_in_inexp_business",
    valid_url_substrings=("https://www.newindianexpress.com/",),
    # base pack FIRST for this plugin (mod_en_in_inexp_business.py:114)
    url_id_regexes=tuple(DEFAULT_URL_ID_REGEXES)
    + (
        r"(^https.*)(\-)([0-9]+)(\.html$)",
        r"(^https\://indianexpress.com/article/.*)(\-)([0-9]+)(/$)",
        r"(^https\://indianexpress.com/article/.*)(\-)([0-9]+)(\.html$)",
        r"(^https\:\/\/indianexpress.com\/.*)(\-)([0-9]{4,})(\/)",
    ),
    date_regexes=(
        (
            r'("datePublished":")(20[0-9]{2}\-[0-9]{2}\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\+05:30","dateModified")',
            "%Y-%m-%dT%H:%M:%S",
        ),
        (
            r"(Published: <span>)([0-9]{1,}th[ ]+[A-Za-z]{3,} 20[0-9]{2} [0-9]{2}:[0-9]{2})( .M<\/span>)",
            "%dth  %B %Y %H:%M",
        ),
    )
    + tuple(ARTICLE_DATE_REGEXES),
    min_article_len=250,
    body_extractor="articlestorycontent",
    author_regexes=(
        r"(\"author\":{\"\@type\":\"Person\",\"name\":\")([a-zA-Z_\-\. ]{2,})(\"\})",
        r"(<span class=\"author_des\"> By <span>)([a-zA-Z_\-\. ]{2,})(<\/span>)",
    ),
)

TRAK_PROFILE = SiteProfile(
    name="mod_en_in_trak",
    valid_url_substrings=("https://trak.in/",),
    invalid_url_substrings=(),  # mod_en_in_trak.py:109 (empty)
    non_content_strings=(
        "trak.in/cdn-cgi/l/email-protection",
        "trak.in/wp-login.php",
    ),
    # base pack FIRST (mod_en_in_trak.py:140 prepends super's regexes)
    url_id_regexes=tuple(DEFAULT_URL_ID_REGEXES)
    + (r"(http.+\/\/)(trak.in\/.+\-)([0-9]{5,})(/)",),
    # mod_en_in_trak.py:117-121 articleDateRegexps (own key first, base
    # pack merged in by the dict update at :139)
    date_regexes=(
        (
            r"(<meta property=\"article:published_time\" content=\")"
            r"(20[0-9]{2}\-[0-9]{1,2}\-[0-9]{1,2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\+00:00\")",
            "%Y-%m-%dT%H:%M:%S",
        ),
    )
    + tuple(ARTICLE_DATE_REGEXES),
    min_article_len=400,
    # trak's own extractArticleBody returns "" (mod_en_in_trak.py:227-232)
    # → the newspaper-parse path carries the body; generic_paragraphs is
    # the engine's deterministic analogue of that path
    body_extractor="generic_paragraphs",
    author_regexes=(
        r"(<span class=\"post-author-name\">By <b>)([a-zA-Z0-9 _\-\.]{3,})(<\/b><\/span>)",
    ),
    # mod_en_in_trak.py:186-200 extractIndustries (hardcoded article:tag
    # pattern, every match appended)
    industry_regexes=(
        r"(<meta property=\"article:tag\" content=\")([a-zA-Z0-9 \-_\.]{2,})(\" \/>)",
    ),
    content_id_regexes=TRAK_CONTENT_ID_REGEXES,
)

PROFILES = {
    "synthetic": DEFAULT_PROFILE,
    "mod_en_in_ecotimes": ECOTIMES_PROFILE,
    "mod_en_in_hindu": HINDU_PROFILE,
    "mod_en_in_ndtv": NDTV_PROFILE,
    "mod_en_in_business_std": BUSINESS_STD_PROFILE,
    "mod_en_in_livemint": LIVEMINT_PROFILE,
    "mod_en_in_moneycontrol": MONEYCONTROL_PROFILE,
    "mod_en_in_timesofindia": TOI_PROFILE,
    "mod_en_in_forbes": FORBES_PROFILE,
    "mod_en_in_indiakanoon": INDIAKANOON_PROFILE,
    "mod_en_in_inexp_business": INEXP_BUSINESS_PROFILE,
    "mod_en_in_trak": TRAK_PROFILE,
}
