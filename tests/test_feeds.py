"""RSS / date-pattern / aggregator source kernels (S1/S4/S6/U14)."""

from __future__ import annotations

import bz2
import glob

from newslookout_ray.sources import feeds


class TestRSS:
    def test_roundtrip(self):
        links = [
            "https://www.host1.com/news/markets/story-1000001",
            "https://www.host2.com/news/tech/story-1000002",
            "https://www.host1.com/news/markets/story-1000001",  # dup
        ]
        xml = feeds.build_rss_xml("feed", links)
        assert feeds.parse_rss_links(xml) == links[:2]  # deduped, order kept

    def test_invalid_links_dropped(self):
        xml = feeds.build_rss_xml("feed", ["not-a-url", "https://www.ok.com/x"])
        assert feeds.parse_rss_links(xml) == ["https://www.ok.com/x"]

    def test_bad_xml(self):
        assert feeds.parse_rss_links("<rss><broken") == []

    def test_reference_fixture_feeds(self):
        """The reference's real RSS fixtures parse to non-empty link lists."""
        fixtures = sorted(glob.glob("/root/reference/test-data/*_rss.xml"))
        assert fixtures
        parsed_any = 0
        for path in fixtures:
            with open(path, encoding="utf-8", errors="replace") as fh:
                links = feeds.parse_rss_links(fh.read())
            parsed_any += bool(links)
            assert all(l.startswith("http") for l in links)
        assert parsed_any >= len(fixtures) * 0.7


class TestBusinessDayUrls:
    def test_skips_weekends_newest_first(self):
        # 2021-01-08 was a Friday
        urls = feeds.business_day_urls(
            "https://www.example.in/content/PR%d%m%y.zip", "2021-01-08", 7
        )
        assert urls == [
            "https://www.example.in/content/PR080121.zip",  # Fri
            "https://www.example.in/content/PR070121.zip",  # Thu
            "https://www.example.in/content/PR060121.zip",  # Wed
            "https://www.example.in/content/PR050121.zip",  # Tue
            "https://www.example.in/content/PR040121.zip",  # Mon
        ]  # Sat 2nd / Sun 3rd skipped


class TestAggregator:
    def test_filter_project_dedupe(self):
        rows = [
            {"c": "IN", "u": "https://www.a.com/x"},
            {"c": "US", "u": "https://www.b.com/y"},
            {"c": "IN", "u": "https://www.a.com/x"},
            {"c": "IN", "u": "junk"},
        ]
        assert feeds.aggregator_urls(rows, "c", "u", "IN") == ["https://www.a.com/x"]

    def test_routing(self):
        dmap = {"www.a.com": "profile_a"}
        out = feeds.route_urls_to_profiles(
            ["https://www.a.com/x", "https://www.z.com/y"], dmap
        )
        assert out == [("https://www.a.com/x", "profile_a")]
