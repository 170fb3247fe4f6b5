"""Publish-date extraction (T9) tests against the reference regex packs."""

from __future__ import annotations

from datetime import datetime

import pytest

from newslookout_ray.functions import datekit as dk

NOW = datetime(2021, 6, 1)


class TestExtractPublishedDate:
    def setup_method(self):
        self.packs = dk.compile_date_patterns()

    def test_data_date_pattern(self):
        html = '<span data-date="2021-02-26">x</span>'
        assert dk.extract_published_date(html, self.packs, now=NOW) == datetime(2021, 2, 26)

    def test_meta_created_date(self):
        html = '<meta name="created-date" content="Thu, 23 Jan 2020 11:00:00 +0530" />'
        assert dk.extract_published_date(html, self.packs, now=NOW) == datetime(2020, 1, 23, 11, 0, 0)

    def test_json_ld_date_published(self):
        html = '{"datePublished": "2021-02-25T22:59:00+05:30"}'
        assert dk.extract_published_date(html, self.packs, now=NOW) == datetime(2021, 2, 25, 22, 59, 0)

    def test_bytes_input(self):
        html = b'<span data-date="2020-05-05">'
        assert dk.extract_published_date(html, self.packs, now=NOW) == datetime(2020, 5, 5)

    def test_scan_order_first_match_wins(self):
        html = (
            '<meta name="created-date" content="Thu, 23 Jan 2020 11:00:00 +0530" />'
            '<span data-date="2019-01-01">'
        )
        assert dk.extract_published_date(html, self.packs, now=NOW) == datetime(2020, 1, 23, 11, 0)

    def test_future_date_skipped_then_raises(self):
        html = '<span data-date="2030-01-01">'
        with pytest.raises(dk.DateExtractError):
            dk.extract_published_date(html, self.packs, now=NOW)

    def test_future_date_skipped_but_later_pattern_matches(self):
        html = '<span data-date="2030-01-01"><span data-article-date=\'2020-03-03\'>'
        assert dk.extract_published_date(html, self.packs, now=NOW) == datetime(2020, 3, 3)

    def test_no_date_raises(self):
        with pytest.raises(dk.DateExtractError):
            dk.extract_published_date("<html></html>", self.packs, now=NOW)


class TestDateHelpers:
    def test_check_and_parse(self):
        assert dk.check_and_parse_date("2020-01-05", now=NOW) == datetime(2020, 1, 5)
        assert dk.check_and_parse_date("2099-01-01", now=NOW) == NOW
        assert dk.check_and_parse_date("garbage", now=NOW) == NOW

    def test_prev_next(self):
        assert dk.next_days_date(datetime(2020, 1, 31)) == datetime(2020, 2, 1)
        assert dk.previous_days_date("2020-03-01") == datetime(2020, 2, 29)
