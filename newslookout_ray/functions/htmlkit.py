"""Minimal HTML DOM + link extraction + article-body extraction.

The reference uses BeautifulSoup/lxml (absent here); this module provides
a stdlib ``html.parser`` based mini-DOM with exactly the query surface the
reference's extraction code needs:

  - find_all(tag, attrs) with bs4-style class matching
  - get_text() — concatenation of text descendants in document order
  - S5 extract_links            — reference scraper_utils.py:437-474
  - T7 extract_article_body     — reference plugins/mod_en_in_ecotimes.py:637-762
    (the five-format fallback chain; the per-site format table is the
    SiteProfile extension surface, see stages/extract.py)

bs4 class-attr matching semantics replicated: a wanted class string with
whitespace matches the element's full ``class`` attribute string exactly
(including trailing spaces — the reference relies on "artData clr " vs
"artData clr paywall"); a single token matches any one of the element's
classes.
"""

from __future__ import annotations

from html.parser import HTMLParser

from .urlkit import BAD_LINK_PREFIXES, is_valid_url, urlsplit

_VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag, attrs=None, parent=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children = []  # Node or str (text)
        self.parent = parent

    def get_text(self) -> str:
        """All text descendants concatenated in document order (bs4 getText())."""
        parts = []
        stack = [iter(self.children)]
        while stack:
            try:
                child = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if isinstance(child, str):
                parts.append(child)
            else:
                stack.append(iter(child.children))
        return "".join(parts)

    def _matches(self, tag, attrs) -> bool:
        if tag is not None and self.tag != tag:
            return False
        if attrs:
            for key, wanted in attrs.items():
                mine = self.attrs.get(key)
                if mine is None:
                    return False
                if key == "class":
                    # bs4 semantics: multi-token wanted string → exact attr
                    # string match; single token → membership in class list
                    if (" " in wanted or wanted.endswith(" ")):
                        if mine != wanted:
                            return False
                    elif wanted not in mine.split():
                        return False
                elif mine != wanted:
                    return False
        return True

    def find_all(self, tag=None, attrs=None):
        """Matching descendants in document order (like soup.find_all)."""
        out = []
        stack = [iter(self.children)]
        while stack:
            try:
                child = next(stack[-1])
            except StopIteration:
                stack.pop()
                continue
            if isinstance(child, str):
                continue
            if child._matches(tag, attrs):
                out.append(child)
            stack.append(iter(child.children))
        return out

    def find(self, tag=None, attrs=None):
        found = self.find_all(tag, attrs)
        return found[0] if found else None


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, dict(attrs), self.stack[-1]))

    def handle_endtag(self, tag):
        # close the nearest matching open tag (lenient, like html parsers)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def _parse_html_uncached(html_text: str) -> Node:
    builder = _TreeBuilder()
    builder.feed(html_text)
    builder.close()
    return builder.root


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=2)
def parse_html(html_text: str) -> Node:
    """Parse HTML into a mini-DOM root node.

    Memoized (2 entries per process): one extraction pass parses the
    SAME cleaned-html string for links, body, and title — profiling the
    crawl's fused fetch+extract stage showed the stdlib parse was 40% of
    per-page cpu at 3 parses/page. The same interned string object hits
    the cache (str hash is object-cached; equality short-circuits on
    identity), so the three parses collapse to one. Callers never
    mutate the returned tree (find_all/get_text are read-only)."""
    return _parse_html_uncached(html_text)


# ---------------------------------------------------------------------------
# S5 — link extraction
# ---------------------------------------------------------------------------


def extract_links(url: str, doc_root: Node) -> list:
    """All <a href> links, relative '/'-links resolved against the page's
    scheme+netloc, junk schemes dropped, each candidate validity-checked.

    Exact decision structure of reference scraper_utils.py:437-474,
    preserving document order (duplicates retained — dedup happens later,
    as in the reference).
    """
    all_links = []
    anchors = doc_root.find_all("a")
    try:
        page = urlsplit(url)
    except ValueError:
        return all_links
    for tag in anchors:
        if "href" not in tag.attrs:
            continue
        link = tag.attrs["href"]
        if link.startswith("/"):
            proper = page.scheme + "://" + page.netloc + link
            if is_valid_url(proper):
                all_links.append(proper)
        elif not any(link.startswith(p) for p in BAD_LINK_PREFIXES):
            if is_valid_url(link):
                all_links.append(link)
    return all_links


def extract_links_from_html(url: str, html_text: str) -> list:
    return extract_links(url, parse_html(html_text))


# ---------------------------------------------------------------------------
# T7 — article-body extraction (five-format fallback chain)
# ---------------------------------------------------------------------------


def _format1(root: Node) -> str:
    """div.article-body[itemprop=mainContentOfPage] → div.post-text artcle-txt
    article-type-news → first div.Normal text (ecotimes Format1, :663-686)."""
    body = root.find_all("div", {"itemprop": "mainContentOfPage", "class": "article-body"})
    if body:
        sub = body[0].find_all("div", {"class": "post-text artcle-txt article-type-news"})
        if sub:
            subsub = sub[0].find_all("div", {"class": "Normal"})
            if subsub:
                return subsub[0].get_text()
    return ""


def _format2(root: Node) -> str:
    """article.'artData clr paywall' → first div with class token artText (:688-708)."""
    body = root.find_all("article", {"class": "artData clr paywall"})
    if body:
        sub = body[0].find_all("div", {"class": "artText"})
        if sub:
            return sub[0].get_text()
    return ""


def _format3(root: Node) -> str:
    """div.main-content → concat of direct <p> children texts (:710-728)."""
    body = root.find_all("div", {"class": "main-content"})
    text = ""
    if body:
        for child in body[0].children:
            if not isinstance(child, str) and child.tag == "p":
                text += child.get_text()
    return text


def _format4(root: Node) -> str:
    """article with exact class string 'artData clr ' (trailing space) (:730-744)."""
    body = root.find_all("article", {"class": "artData clr "})
    if body:
        return body[0].get_text()
    return ""


def _format5(root: Node) -> str:
    """first div with class token artText (:746-761)."""
    body = root.find_all("div", {"class": "artText"})
    if body:
        return body[0].get_text()
    return ""


BODY_FORMATS = {
    "format1": _format1,
    "format2": _format2,
    "format3": _format3,
    "format4": _format4,
    "format5": _format5,
}


# ---------------------------------------------------------------------------
# per-site body extractors (the SiteProfile body_extractor registry)
# ---------------------------------------------------------------------------


def hindu_article_body(html_content: str) -> str:
    """The Hindu body chain (mod_en_in_hindu.py:175-192): concat of
    <p class="body"> texts, overridden by div.articlestorycontent when
    present. Neither selector exists on 2020-era pages (the reference
    relied on newspaper's generic extraction there), so the last resort
    replicates that generic pull deterministically: the text of the
    div whose id starts with 'content-body-' (the page's article
    container, verified against test-data/mod_en_in_hindu_30713792)."""
    root = parse_html(html_content)
    text = ""
    for para in root.find_all("p", {"class": "body"}):
        text += para.get_text()
    story = root.find_all("div", {"class": "articlestorycontent"})
    if story:
        text = story[0].get_text()
    if len(text) < 5:
        for node in root.find_all("div"):
            if node.attrs.get("id", "").startswith("content-body-"):
                text = node.get_text()
                break
    return text


def ndtv_article_body(html_content: str) -> str:
    """NDTV body chain (mod_en_in_ndtv.py:259-284): paragraphs with a
    single direct text child under the ins_storybody /
    'content_text row description' / fullstoryCtrl_fulldetails
    containers (bs4 find_all('p', text=True) semantics), then any
    span/div[itemprop=articleBody] texts appended."""
    root = parse_html(html_content)
    body_text = ""
    for cls in ("ins_storybody", "content_text row description", "fullstoryCtrl_fulldetails"):
        for node in root.find_all(None, {"class": cls}):
            for p in node.find_all("p"):
                if len(p.children) == 1 and isinstance(p.children[0], str):
                    body_text += p.get_text()
    for tag in ("span", "div"):
        for node in root.find_all(tag, {"itemprop": "articleBody"}):
            body_text += node.get_text()
    return body_text


_NON_CONTENT_TAGS = frozenset(("script", "style", "noscript", "iframe", "svg"))


def generic_article_body(html_content: str) -> str:
    """Deterministic analogue of the reference's newspaper-library
    generic extraction (base_plugin.py:1330-1345 parses with newspaper
    and uses its .text as the primary body for every plugin): collect
    all <p> elements outside script/style, group them by parent, and
    return the texts of the parent holding the most paragraph text, in
    document order — readability's core heuristic without its model.
    Used by profiles whose reference plugin has no (or an empty)
    extractArticleBody and relies wholly on the newspaper parse
    (mod_en_in_business_std.py:185-191, mod_en_in_livemint.py)."""
    root = parse_html(html_content)
    candidates: dict = {}  # id(node) -> list of text pieces
    order: dict = {}
    stack = [(root, False)]
    seq = 0
    while stack:
        node, blocked = stack.pop()
        seq += 1
        if not blocked and not isinstance(node, str):
            # a container's own content: direct text runs + direct <p>
            # children (covers both p-based articles and sites that put
            # the body as raw text inside one div, e.g. forbes storydiv)
            pieces = []
            for child in node.children:
                if isinstance(child, str):
                    if child.strip():
                        pieces.append(child)
                elif child.tag == "p" and child.tag not in _NON_CONTENT_TAGS:
                    text = child.get_text()
                    if text.strip():
                        pieces.append(text)
            if pieces:
                candidates[id(node)] = pieces
                order[id(node)] = seq
        for child in reversed(node.children):
            if isinstance(child, str):
                continue
            stack.append((child, blocked or child.tag in _NON_CONTENT_TAGS))
    if not candidates:
        return ""
    best = max(
        candidates,
        key=lambda nid: (sum(len(t.strip()) for t in candidates[nid]), -order[nid]),
    )
    return "".join(candidates[best])


def moneycontrol_article_body(html_content: str) -> str:
    """Moneycontrol body (mod_en_in_moneycontrol.py extractArticleBody):
    div.text_block containers → paragraphs with a single direct text
    child (bs4 find_all('p', text=True) semantics), texts concatenated."""
    root = parse_html(html_content)
    body_text = ""
    for node in root.find_all("div", {"class": "text_block"}):
        for p in node.find_all("p"):
            if len(p.children) == 1 and isinstance(p.children[0], str):
                body_text += p.get_text()
    return body_text


def storycontent_article_body(html_content: str) -> str:
    """Forbes / New Indian Express body (mod_en_in_forbes.py /
    mod_en_in_inexp_business.py extractArticleBody): the first
    div.articlestorycontent's full text."""
    root = parse_html(html_content)
    nodes = root.find_all("div", {"class": "articlestorycontent"})
    return nodes[0].get_text() if nodes else ""


def toi_article_body(html_content: str) -> str:
    """Times of India blogs body (mod_en_in_timesofindia.py:221-236):
    paragraphs under div 'main-content single-article-content', direct
    string children stripped and concatenated. The reference's
    checkAndCleanText ALWAYS uses this extraction (ignores the
    newspaper-parsed text), so this is the site's primary body path."""
    root = parse_html(html_content)
    body_text = ""
    for node in root.find_all("div", {"class": "main-content single-article-content"}):
        for p in node.find_all("p"):
            for child in p.children:
                if isinstance(child, str):
                    body_text += child.strip()
    return body_text


def indiakanoon_article_body(html_content: str) -> str:
    """IndianKanoon judgments body (mod_en_in_indiakanoon.py:206-249):
    the reference walks div.docsource_main's PARENT's children through
    get_child_tags (a bs4-specific traversal); the deterministic
    equivalent here is that parent container's full text with newlines
    spaced — same content, same ordering, no bs4 dependency."""
    root = parse_html(html_content)
    node = root.find("div", {"class": "docsource_main"})
    if node is None:
        return ""
    container = node.parent if node.parent is not None else node
    return container.get_text().replace("\n", " ")


def ecotimes_authors_from_tags(html_content: str) -> list:
    """extractAuthorsFromTags (mod_en_in_ecotimes.py:616-635): the first
    span with class token 'ag' — its text, or its img's alt when the
    text is empty."""
    root = parse_html(html_content)
    span = root.find("span", {"class": "ag"})
    if span is None:
        return []
    text = span.get_text()
    if len(text) < 1:
        img = span.find("img")
        if img is None:
            return []
        alt = img.attrs.get("alt")
        return [alt] if alt else []
    return [text]


AUTHOR_TAG_FALLBACKS = {"ecotimes_span_ag": ecotimes_authors_from_tags}


def extract_meta_keywords(html_content: str) -> list:
    """T12 keyword slot: the deterministic portion of the reference's
    keyword merge (news_event.py:378-385) — the comma-split contents of
    <meta name="keywords"> and <meta name="news_keywords"> in document
    order. (The newspaper-NLP keyword list the reference prepends needs
    a model; that slot belongs to an ML actor stage, like M1.)"""
    import re as _re

    out = []
    for name in ("keywords", "news_keywords"):
        m = _re.search(
            r'<meta[^>]+name=["\']' + name + r'["\'][^>]+content=["\']([^"\']*)["\']',
            html_content,
        ) or _re.search(
            r'<meta[^>]+content=["\']([^"\']*)["\'][^>]+name=["\']' + name + r'["\']',
            html_content,
        )
        if m and m.group(1):
            out.extend(k.strip() for k in m.group(1).split(",") if k.strip())
    # deDupeList semantics: first occurrence wins
    seen, dedup = set(), []
    for k in out:
        if k not in seen:
            seen.add(k)
            dedup.append(k)
    return dedup


def extract_article_body(html_content: str) -> str:
    """Five-format fallback chain, exact gating of ecotimes
    extractArticleBody (mod_en_in_ecotimes.py:637-662): format N+1 is only
    tried when the text so far is shorter than 5 chars AND the gating
    selector for that format is present (formats 2-4); format 5 is the
    unconditional last resort.
    """
    root = parse_html(html_content)
    body_text = _format1(root)
    if len(body_text) < 5 and root.find_all("article", {"class": "artData clr paywall"}):
        body_text = _format2(root)
    if len(body_text) < 5 and root.find_all("div", {"class": "blog-show"}):
        body_text = _format3(root)
    if len(body_text) < 5 and root.find_all("article", {"class": "artData clr "}):
        body_text = _format4(root)
    if len(body_text) < 5:
        body_text = _format5(root)
    return body_text


def extract_title(html_text: str) -> str:
    """<title> text (newspaper-analogue title extraction, best effort)."""
    root = parse_html(html_text)
    node = root.find("title")
    return node.get_text() if node else ""


#: SiteProfile.body_extractor registry (resolved in CompiledProfile)
SITE_BODY_EXTRACTORS = {
    "five_format_chain": extract_article_body,
    "generic_paragraphs": generic_article_body,
    "hindu": hindu_article_body,
    "ndtv": ndtv_article_body,
    "moneycontrol": moneycontrol_article_body,
    "articlestorycontent": storycontent_article_body,
    "toi": toi_article_body,
    "indiakanoon": indiakanoon_article_body,
}
