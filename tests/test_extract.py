"""Extraction stage semantics: fetchDataFromURL decision structure."""

from __future__ import annotations

import pyarrow as pa
import pytest

from newslookout_ray.functions.textkit import (
    REPEAT_CHAR_LIST,
    clean_text,
    dedupe_list,
    filter_repeated_chars,
)
from newslookout_ray.sources import pages as pg
from newslookout_ray.stages.extract import (
    STATE_ARTICLE,
    STATE_EMPTY,
    PageExtractor,
    process_fetched_page,
)
from newslookout_ray.stages.profiles import DEFAULT_PROFILE, CompiledProfile, SiteProfile

SPEC = pg.PagesSpec(n_pages=150, n_hosts=6, seed=3)
CP = CompiledProfile(DEFAULT_PROFILE)


def expected_text(raw_body: str) -> str:
    """The byte-identical contract, derived analytically:
    cleanText(html) → body extract → filterRepeatedchars → cleanText."""
    return clean_text(
        filter_repeated_chars(clean_text(raw_body), dedupe_list(list(REPEAT_CHAR_LIST)))
    )


class TestProcessFetchedPage:
    def test_article_text_byte_identical_all_formats(self):
        seen_formats = set()
        for pid in range(SPEC.n_hosts, SPEC.n_pages):
            rec = pg.page_record(SPEC, pid)
            r = process_fetched_page(CP, rec["url"], rec["html"])
            seen_formats.add(pg.article_format(SPEC, pid))
            assert r["state"] == STATE_ARTICLE
            assert r["text"] == expected_text(rec["text"])
            assert r["unique_id"] == pg.article_unique_id(SPEC, pid)
            assert str(r["pubdate"]) == pg.article_pubdate(SPEC, pid)
        assert seen_formats == {"format1", "format2", "format3", "format4", "format5"}

    def test_hub_harvests_links_no_article(self):
        rec = pg.page_record(SPEC, 2)
        r = process_fetched_page(CP, rec["url"], rec["html"])
        assert r["is_hub"] and r["state"] == STATE_EMPTY
        assert len(r["links"]) > 0
        assert all(l.startswith("https://www.host") for l in r["links"])

    def test_short_html_rejected(self):
        r = process_fetched_page(CP, "https://www.h.com/news/x/story-1234567", b"<html>tiny</html>")
        assert r["state"] == STATE_EMPTY and r["links"] == []

    def test_no_date_drops_page_and_links(self):
        body = "word " * 200
        html = (
            '<html><body><div class="artText">' + body + "</div>"
            '<a href="https://www.other.com/news/x/story-1111111">x</a></body></html>'
        ).encode()
        r = process_fetched_page(CP, "https://www.h.com/news/x/story-1234567", html)
        assert r["state"] == STATE_EMPTY
        assert r["links"] == []  # reference: date failure raises → links lost

    def test_link_cap(self):
        profile = SiteProfile(link_cap=3)
        cp = CompiledProfile(profile)
        links = "".join(
            f'<a href="https://www.h.com/news/x/story-{1000000+i}">l</a>' for i in range(10)
        )
        html = (
            '<html><body><span data-date="2021-01-05">'
            '<div class="artText">' + ("word " * 200) + "</div>" + links + "</body></html>"
        ).encode()
        r = process_fetched_page(cp, "https://www.h.com/news/x/story-1234567", html)
        assert r["state"] == STATE_ARTICLE and len(r["links"]) == 3

    def test_invalid_url_substring_filtered_from_links(self):
        html = (
            '<html><body><span data-date="2021-01-05">'
            '<div class="artText">' + ("word " * 200) + "</div>"
            '<a href="https://www.h.com/videos/story-1111111">v</a>'
            '<a href="https://www.h.com/news/x/story-2222222">n</a></body></html>'
        ).encode()
        r = process_fetched_page(CP, "https://www.h.com/news/x/story-1234567", html)
        assert r["links"] == ["https://www.h.com/news/x/story-2222222"]


class TestPageExtractorBatch:
    def test_batch_matches_scalar_and_error_rows(self):
        ex = PageExtractor()
        recs = [pg.page_record(SPEC, pid) for pid in (0, 20, 21)]
        batch = pa.table(
            {
                "url": [r["url"] for r in recs] + ["https://www.gone.com/news/x/story-1999999"],
                "host": ["h"] * 4,
                "html": [r["html"] for r in recs] + [None],
                "status": pa.array([200, 200, 503, 404], pa.int16()),
                "pseq": pa.array([0] * 4, pa.int64()),
                "lidx": pa.array(list(range(4)), pa.int64()),
                "depth": pa.array([0] * 4, pa.int32()),
                "order_in_host": pa.array(list(range(4)), pa.int64()),
            }
        )
        out = ex(batch)
        states = out["state"].to_pylist()
        assert states[0] == STATE_EMPTY  # hub
        assert states[1] == STATE_ARTICLE
        assert states[2] == 2 and states[3] == 2  # http error rows
        scalar = process_fetched_page(CP, recs[1]["url"], recs[1]["html"])
        assert out["text"].to_pylist()[1] == scalar["text"]
        assert out["links"].to_pylist()[2] == []
