"""Per-site profile parity against the reference's OWN test fixtures.

Mirrors what every test/test_mod_en_in_*.py in the reference asserts on
its bz2 fixture page (unique id, publish date, text-size floor, link
count, authors, industries, keywords), driven through the SAME
process_fetched_page kernel the crawl pipeline uses — e.g.
test_mod_en_in_ecotimes.py:102-140, test_mod_en_in_hindu.py:104-123,
test_mod_en_in_ndtv.py:104-122. The reference's newspaper/bs4 stack is
not installed here, so parity is to the reference tests' asserted
values, plus a determinism check (two extractions byte-identical).
"""

from __future__ import annotations

import bz2
import datetime
import os

import pytest

from newslookout_ray.stages.extract import STATE_ARTICLE, process_fetched_page
from newslookout_ray.stages.profiles import (
    ECOTIMES_PROFILE,
    HINDU_PROFILE,
    NDTV_PROFILE,
    CompiledProfile,
)

FIXTURE_DIR = "/root/reference/test-data"

CASES = [
    # (profile, fixture, url, expected_id, expected_date, text_floor, link_floor)
    (
        ECOTIMES_PROFILE,
        "mod_en_in_ecotimes_73837853.html.bz2",
        "https://economictimes.indiatimes.com/markets/expert-view/"
        "a-reasonable-budget-but-still-unclear-on-fiscal-deficit-front-swaminathan-aiyar/"
        "articleshow/73837853.cms",
        "73837853",
        datetime.date(2020, 2, 1),  # test_mod_en_in_ecotimes.py:129-130
        2687,  # textSize >= 2687 (:133)
        40,  # additionalLinks >= 40 (:136)
    ),
    (
        HINDU_PROFILE,
        "mod_en_in_hindu_30713792.html.bz2",
        "https://www.thehindu.com/business/budget/"
        "16-point-action-plan-for-agriculture-evokes-mixed-response/article30713792.ece",
        "30713792",
        datetime.date(2020, 2, 1),  # test_mod_en_in_hindu.py:117-118
        2000,  # textSize > 2000 (:120)
        0,
    ),
    (
        NDTV_PROFILE,
        "mod_en_in_ndtv_2373245.html.bz2",
        "https://www.ndtv.com/business/"
        "dollar-rises-on-us-recovery-hopes-bitcoin-hits-near-record-52-640-2373245",
        "2373245",
        datetime.date(2021, 2, 18),  # test_mod_en_in_ndtv.py:117-118
        3000,  # textSize > 3000 (:120)
        0,
    ),
]


def _load(fixture: str) -> bytes:
    with bz2.open(os.path.join(FIXTURE_DIR, fixture), "rb") as fh:
        return fh.read()


@pytest.mark.parametrize(
    "profile,fixture,url,want_id,want_date,text_floor,link_floor",
    CASES,
    ids=[c[0].name for c in CASES],
)
def test_reference_fixture_extraction(
    profile, fixture, url, want_id, want_date, text_floor, link_floor
):
    html = _load(fixture)
    cp = CompiledProfile(profile)
    rec = process_fetched_page(cp, url, html)
    assert rec["state"] == STATE_ARTICLE
    assert rec["unique_id"] == want_id
    assert rec["pubdate"] == want_date
    assert rec["text_size"] > text_floor
    assert len(rec["links"]) >= link_floor
    # determinism: the byte-identical contract within this engine
    rec2 = process_fetched_page(cp, url, html)
    assert rec2["text"] == rec["text"]
    assert rec2["text"].encode("utf-8") == rec["text"].encode("utf-8")


def test_ecotimes_author_and_industry():
    """T10 tag-fallback author (span.ag img alt — ET Now, the value the
    reference's extractAuthorsFromTags pulls from this page) and T11
    subdomain industry rule (plain economictimes → no industry)."""
    html = _load("mod_en_in_ecotimes_73837853.html.bz2")
    cp = CompiledProfile(ECOTIMES_PROFILE)
    assert cp.extract_authors(html.decode("utf-8", "replace")) == ["ET Now"]
    assert (
        cp.extract_industries(CASES[0][2], html.decode("utf-8", "replace")) == []
    )
    # subdomain rule fires for vertical sites (mod_en_in_ecotimes.py:575-593)
    assert cp.extract_industries(
        "https://telecom.economictimes.indiatimes.com/news/story-1234567.cms", ""
    ) == ["telecom"]


def test_hindu_author_regex():
    """T10 regex path: tp.push(["setContentAuthor", ...]) →
    'Special Correspondent' on the hindu fixture."""
    html = _load("mod_en_in_hindu_30713792.html.bz2").decode("utf-8", "replace")
    cp = CompiledProfile(HINDU_PROFILE)
    assert cp.extract_authors(html) == ["Special Correspondent"]


def test_keywords_extracted_from_meta():
    """T12: meta keywords + news_keywords merged, first-occurrence
    deduped (news_event.py:378-385 deterministic portion)."""
    html = _load("mod_en_in_hindu_30713792.html.bz2")
    cp = CompiledProfile(HINDU_PROFILE)
    rec = process_fetched_page(cp, CASES[1][2], html)
    assert rec["state"] == STATE_ARTICLE
    assert "Union Budget 2020" in rec["keywords"]
    assert len(rec["keywords"]) == len(set(rec["keywords"]))  # deduped


def test_content_id_fallback():
    """U11: when the url regexes fail, the content-ID pack
    (trak shortlink pattern) supplies the id before the CRC fallback."""
    from newslookout_ray.stages.profiles import TRAK_CONTENT_ID_REGEXES, SiteProfile

    profile = SiteProfile(
        name="mod_en_in_trak",
        url_id_regexes=(r"(https://nomatch)(/)([0-9]+)",),
        content_id_regexes=TRAK_CONTENT_ID_REGEXES,
        min_article_len=10,
    )
    cp = CompiledProfile(profile)
    assert (
        cp.extract_content_id("<link rel='shortlink' href='https://trak.in/?p=119415' />")
        == "119415"
    )
