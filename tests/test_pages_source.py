"""Synthetic pages corpus: determinism, schema, structure."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from newslookout_ray.functions.urlkit import compile_id_patterns, extract_unique_id
from newslookout_ray.sources import pages as pg


SPEC = pg.PagesSpec(n_pages=120, n_hosts=8, seed=5)


class TestDeterminism:
    def test_records_reproducible(self):
        a = pg.page_record(SPEC, 57)
        b = pg.page_record(SPEC, 57)
        assert a == b

    def test_seed_changes_content(self):
        other = pg.PagesSpec(n_pages=120, n_hosts=8, seed=6)
        assert pg.page_html(SPEC, 57) != pg.page_html(other, 57)


class TestStructure:
    def test_hub_vs_article_urls(self):
        assert pg.page_url(SPEC, 3) == "https://www.host3.com/"
        url = pg.page_url(SPEC, 50)
        assert "/news/" in url and "story-" in url

    def test_article_id_matches_reference_regexes(self):
        pats = compile_id_patterns()
        for pid in range(SPEC.n_hosts, SPEC.n_hosts + 20):
            url = pg.article_url(SPEC, pid)
            assert extract_unique_id(url, pats) == pg.article_unique_id(SPEC, pid)

    def test_hot_host_skew(self):
        counts = {}
        for pid in range(SPEC.n_hosts, SPEC.n_pages):
            host = pg.page_url(SPEC, pid).split("/")[2]
            counts[host] = counts.get(host, 0) + 1
        # log-uniform assignment ⇒ rank-0 host clearly hotter than median
        ordered = sorted(counts.values(), reverse=True)
        assert ordered[0] >= 2 * ordered[len(ordered) // 2]
        assert ordered[0] >= 4 * ordered[-1]

    def test_text_pool_used(self):
        spec = pg.PagesSpec(n_pages=30, n_hosts=2, seed=1, text_pool=("alpha beta gamma",))
        body = pg.article_body_text(spec, 10)
        # pool words present (dirty tokens are spliced between them by design)
        assert all(w in body.split() for w in ("alpha", "beta", "gamma"))


@pytest.mark.usefixtures("ray_session")
class TestCorpusWrite:
    def test_write_and_schema(self, tmp_path):
        path = str(tmp_path / "pages")
        spec = pg.PagesSpec(n_pages=60, n_hosts=4, seed=2)
        pg.write_pages_corpus(spec, path, n_buckets=4)
        t = pq.read_table(path)
        assert {"url", "warc_ts", "html", "text", "lang", "b"} <= set(t.schema.names)
        assert t.num_rows == spec.n_total_rows == 64  # 60 pages + 4 robots
        assert len(set(t["url"].to_pylist())) == 64
