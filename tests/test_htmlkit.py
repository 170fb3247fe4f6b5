"""Mini-DOM, link extraction (S5), body-format chain (T7) tests."""

from __future__ import annotations

from newslookout_ray.functions import htmlkit as hk

PAGE_URL = "https://www.host1.com/news/some-page-12345"

LINK_HTML = """
<html><body>
<a href="https://www.other.com/article-56789">abs</a>
<a href="/relative/path-11111">rel</a>
<a href="javascript:void(0)">junk1</a>
<a href="mailto:x@y.com">junk2</a>
<a href="#frag">junk3</a>
<a href="?q=1">junk4</a>
<a href="../up">junk5</a>
<a href="tel:123">junk6</a>
<a href="whatsapp:send">junk7</a>
<a href="https://www.other.com/article-56789">dup</a>
<a name="nohref">skip</a>
<a href="https://bad">invalid-tld</a>
</body></html>
"""


class TestExtractLinks:
    def test_filters_and_resolution(self):
        links = hk.extract_links_from_html(PAGE_URL, LINK_HTML)
        assert links == [
            "https://www.other.com/article-56789",
            "https://www.host1.com/relative/path-11111",
            "https://www.other.com/article-56789",  # duplicates retained (dedup is U8's job)
        ]


def _wrap(fmt: str, body: str) -> str:
    if fmt == "format1":
        return (
            '<html><body><div class="article-body" itemprop="mainContentOfPage">'
            '<div class="post-text artcle-txt article-type-news">'
            f'<div class="Normal">{body}</div></div></div></body></html>'
        )
    if fmt == "format2":
        return (
            '<html><body><article class="artData clr paywall">'
            f'<div class="artText medium">{body}</div></article></body></html>'
        )
    if fmt == "format3":
        return (
            '<html><body><div class="blog-show"></div><div class="main-content">'
            f"<p>{body}</p><span>skipped</span><p> tail</p></div></body></html>"
        )
    if fmt == "format4":
        return f'<html><body><article class="artData clr ">{body}</article></body></html>'
    if fmt == "format5":
        return f'<html><body><div class="artText">{body}</div></body></html>'
    raise ValueError(fmt)


class TestBodyFormats:
    def test_format1(self):
        assert hk.extract_article_body(_wrap("format1", "Body one.")) == "Body one."

    def test_format2(self):
        assert hk.extract_article_body(_wrap("format2", "Paywall body.")) == "Paywall body."

    def test_format3_only_p_children(self):
        assert hk.extract_article_body(_wrap("format3", "Blog body.")) == "Blog body. tail"

    def test_format4_trailing_space_class(self):
        assert hk.extract_article_body(_wrap("format4", "Art body.")) == "Art body."

    def test_format5_fallback(self):
        assert hk.extract_article_body(_wrap("format5", "Fallback body.")) == "Fallback body."

    def test_format1_wins_over_format5(self):
        html = (
            '<html><body><div class="article-body" itemprop="mainContentOfPage">'
            '<div class="post-text artcle-txt article-type-news">'
            '<div class="Normal">Primary.</div></div></div>'
            '<div class="artText">Secondary.</div></body></html>'
        )
        assert hk.extract_article_body(html) == "Primary."

    def test_paywall_class_is_exact_string_match(self):
        # 'artData clr ' (format4) must not match the paywall selector
        html = _wrap("format4", "Short")
        root = hk.parse_html(html)
        assert root.find_all("article", {"class": "artData clr paywall"}) == []
        assert len(root.find_all("article", {"class": "artData clr "})) == 1

    def test_nested_get_text_document_order(self):
        root = hk.parse_html("<div>a<span>b<i>c</i></span>d</div>")
        assert root.find("div").get_text() == "abcd"

    def test_no_body_empty(self):
        assert hk.extract_article_body("<html><body><p>x</p></body></html>") == ""


class TestTitle:
    def test_title(self):
        assert hk.extract_title("<html><head><title>T1 &amp; T2</title></head></html>") == "T1 & T2"
        assert hk.extract_title("<html></html>") == ""
