"""URL kernel tests: parity with reference pure functions where they are
dependency-free (U3/U4), semantic unit tests elsewhere, scalar↔Arrow
equivalence."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import reference_oracle as ro
from newslookout_ray.functions import textkit as tk
from newslookout_ray.functions import urlkit as uk

URLS = [
    "https://www.host7.com/news/markets/some-slug-1234567",
    "https://www.host7.com/news/markets/some-slug-1234567?ref=rss",
    "http://www.example.in/economy/policy/9876543.html",
    "https://www.example.in/x/99",
    "short",
    "",
    "javascript:void(0)",
    "https://nodot",
    "https://www.weird.zz9/path",
]


class TestValidityAndHost:
    def test_is_valid_url(self):
        assert uk.is_valid_url(URLS[0])
        assert uk.is_valid_url(URLS[2])
        assert not uk.is_valid_url("")
        assert not uk.is_valid_url(None)
        assert not uk.is_valid_url("javascript:void(0)")
        assert not uk.is_valid_url("https://nodot")
        assert not uk.is_valid_url("https://www.weird.zz9/path")

    def test_get_host(self):
        assert uk.get_host(URLS[0]) == "www.host7.com"
        assert uk.get_host("https://a.b.co.in:8080/x") == "a.b.co.in:8080"

    def test_url_key_ignores_query(self):
        assert uk.url_key(URLS[0]) == uk.url_key(URLS[1])
        assert uk.same_url_without_query(URLS[0], URLS[1])
        assert not uk.same_url_without_query(URLS[0], URLS[2])

    def test_normalize(self):
        assert uk.normalize_url("HTTPS://WWW.X.COM/A-B") == "https://www.x.com/a-b"


class TestSubstringFilters:
    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.text(alphabet=list("abc/:.-123xyz"), min_size=0, max_size=20), max_size=10),
        st.lists(st.text(alphabet=list("abc-1"), min_size=1, max_size=4), max_size=3),
    )
    def test_retain_parity(self, urls, pats):
        ref = ro.reference_scraper_utils()["retainValidArticles"]
        assert uk.retain_valid_articles(urls, pats) == ref(list(urls), list(pats))

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.text(alphabet=list("abc/:.-123xyz"), min_size=0, max_size=20), max_size=10),
        st.lists(st.text(alphabet=list("abc-1"), min_size=1, max_size=4), max_size=3),
    )
    def test_remove_parity(self, urls, pats):
        ref = ro.reference_scraper_utils()["removeInValidArticles"]
        assert uk.remove_invalid_articles(urls, pats) == ref(list(urls), list(pats))

    def test_filter_urls_mask_matches_scalar_composition(self):
        urls = [
            "https://www.h.com/news/article-12345",
            "https://www.h.com/videos/clip-99999",
            "https://www.h.com/n/a-1",
            "x",
        ]
        valid, invalid = ["/news/"], ["/videos/"]
        arr = pa.array(urls)
        mask = uk.filter_urls_mask(arr, valid, invalid).to_pylist()
        expected_kept = uk.remove_invalid_articles(
            uk.retain_valid_articles(urls, valid), invalid
        )
        assert [u for u, m in zip(urls, mask) if m] == expected_kept

    def test_empty_lists_pass_through(self):
        urls = ["https://a.com/x", "b"]
        assert uk.retain_valid_articles(urls, []) == urls
        mask = uk.filter_urls_mask(pa.array(urls), [], []).to_pylist()
        assert mask == [True, True]


class TestUniqueId:
    def test_default_patterns_extract_group3(self):
        pats = uk.compile_id_patterns()
        assert uk.extract_unique_id(URLS[0], pats) == "1234567"
        assert uk.extract_unique_id(URLS[2], pats) == "9876543"

    def test_no_match_raises(self):
        pats = uk.compile_id_patterns()
        with pytest.raises(uk.ScrapeError):
            uk.extract_unique_id("https://www.example.in/x/99", pats)
        with pytest.raises(uk.ScrapeError):
            uk.extract_unique_id("x.com", pats)

    def test_crc_fallback_value_matches_reference(self):
        # the caller-side fallback is CRC32 hex of the URL (base_plugin.py:1372-1380)
        ref = ro.reference_scraper_utils()["calculateCRC32"]
        assert tk.crc32_hex(URLS[3]) == ref(URLS[3])


class TestHashing:
    def test_stable_and_64bit(self):
        h1 = uk.url_hash64("https://www.a.com/x")
        assert h1 == uk.url_hash64("https://www.a.com/x")
        assert 0 <= h1 < 2**64
        assert uk.url_hash64("https://www.a.com/y") != h1

    def test_batch_matches_scalar(self):
        urls = ["https://a.com/%d" % i for i in range(100)]
        batch = uk.url_hash64_batch(urls)
        assert batch.dtype.name == "uint64"
        assert [int(x) for x in batch] == [uk.url_hash64(u) for u in urls]


class TestArrowForms:
    def test_host_arrow(self):
        urls = ["https://www.a.com/x/y?q=1", "http://b.in/z", "https://c.co.in"]
        assert uk.host_arrow(pa.array(urls)).to_pylist() == [uk.get_host(u) for u in urls]

    def test_normalize_arrow(self):
        arr = pa.array(["HTTP://A.COM/B"])
        assert uk.normalize_url_arrow(arr).to_pylist() == ["http://a.com/b"]
