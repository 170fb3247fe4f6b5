"""robots.txt kernel + crawl enforcement tests."""

from __future__ import annotations

from newslookout_ray.functions import robotskit as rk
from newslookout_ray.sources import pages as pg


class TestParseRobots:
    def test_star_group(self):
        body = "User-agent: *\nDisallow: /news/tech/\nDisallow: /private/\n"
        assert rk.parse_robots(body) == ["/news/tech/", "/private/"]

    def test_other_agent_ignored(self):
        body = "User-agent: SomeBot\nDisallow: /all/\nUser-agent: *\nDisallow: /x/\n"
        assert rk.parse_robots(body) == ["/x/"]

    def test_comments_blank_empty_disallow(self):
        body = "# hi\nUser-agent: *\nDisallow:\n\nDisallow: /a/  # trailing\n"
        assert rk.parse_robots(body) == ["/a/"]

    def test_empty(self):
        assert rk.parse_robots("") == []
        assert rk.parse_robots(None) == []


class TestIsAllowed:
    def test_prefix_match(self):
        pre = ["/news/tech/"]
        assert not rk.is_allowed("https://h.com/news/tech/story-1", pre)
        assert rk.is_allowed("https://h.com/news/markets/story-1", pre)
        assert rk.is_allowed("https://h.com/news/tech/story-1", [])
        assert rk.is_allowed("https://h.com/news/tech/story-1", None)


class TestCorpusRobots:
    def test_robots_rows_appended(self):
        spec = pg.PagesSpec(n_pages=50, n_hosts=4, seed=9)
        assert spec.n_total_rows == 54
        rec = pg.page_record(spec, 51)
        assert rec["url"] == "https://www.host1.com/robots.txt"
        assert rec["html"].startswith(b"User-agent: *")
        assert rec["text"] == ""

    def test_policy_deterministic_and_mixed(self):
        spec = pg.PagesSpec(n_pages=50, n_hosts=8, seed=9)
        pols = [pg.robots_disallow_sections(spec, h) for h in range(8)]
        assert pols == [pg.robots_disallow_sections(spec, h) for h in range(8)]
        assert any(pols) and not all(pols)  # some hosts restrict, some don't
