"""Live status HTTP endpoint (newslookout_ray/status_server.py): the
reference StatusAPIServer analogue must serve round stats NEXT TO a
running crawl — new rounds appear without restart — plus JSON shapes,
text dashboard, health and 404 behavior."""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.request

import pytest

from newslookout_ray.pipelines.crawl import CrawlConfig, run_crawl
from newslookout_ray.sources.pages import PagesSpec, write_pages_corpus
from newslookout_ray.status_server import StatusServer

SPEC = PagesSpec(n_pages=220, n_hosts=8, seed=13)


def _get(port: int, path: str):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.status, r.read()


def _get_json(port: int, path: str) -> dict:
    status, body = _get(port, path)
    assert status == 200
    return json.loads(body)


@pytest.mark.usefixtures("ray_session")
class TestStatusServer:
    def test_rounds_appear_live_while_crawl_runs(self, tmp_path):
        root = str(tmp_path)
        pages = os.path.join(root, "pages")
        write_pages_corpus(SPEC, pages, n_buckets=4)
        cfg = CrawlConfig(
            rounds=2,
            per_host_budget=6,
            num_seen_shards=4,
            checkpoint_dir=os.path.join(root, "ckpt"),
            n_page_buckets=4,
            extract_concurrency=2,
            join_partitions=2,
        )

        with StatusServer(cfg.checkpoint_dir) as srv:
            # before any round: empty but serving
            empty = _get_json(srv.port, "/status")
            assert empty["totals"]["rounds"] == 0

            result: dict = {}
            t = threading.Thread(
                target=lambda: result.update(run_crawl(pages, SPEC, cfg))
            )
            t.start()
            # poll mid-run: a completed round's stats must appear while
            # the crawl is still going (manifest is each round's LAST
            # write, so anything listed is complete and consistent)
            saw_mid_run = False
            deadline = time.time() + 120
            while time.time() < deadline:
                payload = _get_json(srv.port, "/status")
                n = payload["totals"]["rounds"]
                if n >= 1 and t.is_alive():
                    saw_mid_run = True
                    assert payload["rounds"][0]["selected"] > 0
                if n >= 2 or not t.is_alive():
                    break
                time.sleep(0.05)
            t.join(timeout=120)
            assert not t.is_alive()
            assert saw_mid_run, "no round became visible while the crawl ran"

            # final state: both rounds served, totals consistent
            final = _get_json(srv.port, "/status")
            assert final["totals"]["rounds"] == 2
            total_selected = sum(r["selected"] for r in result["rounds"])
            assert final["totals"]["selected"] == total_selected

            # /metrics rollup agrees with the manifest totals
            metrics = _get_json(srv.port, "/metrics")["rounds"]
            assert sum(m["fetched"] for m in metrics.values()) == total_selected

            # text dashboard + health + 404
            status, body = _get(srv.port, "/")
            assert status == 200 and b"TOTAL" in body
            assert _get_json(srv.port, "/healthz") == {"ok": True}
            try:
                _get(srv.port, "/nope")
                raise AssertionError("expected 404")
            except urllib.error.HTTPError as e:
                assert e.code == 404

    def test_ephemeral_port_and_stop_releases(self, tmp_path):
        srv = StatusServer(str(tmp_path)).start()
        port = srv.port
        assert port > 0
        assert _get_json(port, "/healthz") == {"ok": True}
        srv.stop()
        with pytest.raises(Exception):
            _get(port, "/healthz")
