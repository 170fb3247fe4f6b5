"""Crawl-engine equivalence vs the sequential reference-semantics
simulator: per-host fetch order, final seen set, byte-identical article
text, resume-from-checkpoint without re-fetching."""

from __future__ import annotations

import dataclasses
import glob
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest

from newslookout_ray.pipelines.crawl import CrawlConfig, CrawlRun, read_crawl_order, run_crawl
from newslookout_ray.pipelines.simulator import simulate_crawl
from newslookout_ray.sources.pages import PagesSpec, write_pages_corpus

SPEC = PagesSpec(n_pages=220, n_hosts=8, seed=13)


def _cfg(tmp: str, rounds: int = 2) -> CrawlConfig:
    return CrawlConfig(
        rounds=rounds,
        per_host_budget=6,
        num_seen_shards=4,
        checkpoint_dir=os.path.join(tmp, "ckpt"),
        n_page_buckets=4,
        extract_concurrency=2,
        join_partitions=2,
    )


def _read_seen(ckpt: str) -> dict:
    files = glob.glob(os.path.join(ckpt, "seen", "shard=*", "round=*.parquet"))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    return dict(zip(df["url"], df["state"]))


def _read_articles(ckpt: str) -> dict:
    from newslookout_ray.pipelines.crawl import read_articles

    t = read_articles(ckpt)
    if t.num_rows == 0:
        return {}
    return dict(zip(t["url"].to_pylist(), t["text"].to_pylist()))


@pytest.fixture(scope="module")
def corpus(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("crawl"))
    pages = os.path.join(root, "pages")
    write_pages_corpus(SPEC, pages, n_buckets=4)
    return root, pages


@pytest.mark.usefixtures("ray_session")
class TestCrawlEquivalence:
    def test_order_seen_articles_match_simulator(self, corpus):
        root, pages = corpus
        cfg = _cfg(os.path.join(root, "eq"), rounds=3)
        summary = run_crawl(pages, SPEC, cfg)
        assert summary["rounds"][0]["selected"] == SPEC.n_hosts  # all seeds

        sim = simulate_crawl(SPEC, cfg)

        got = read_crawl_order(cfg)
        got_t = sorted(
            tuple(x)
            for x in got[["host", "round", "order_in_host", "url", "state", "status"]]
            .itertuples(index=False)
        )
        assert got_t == sorted(sim.order)

        assert _read_seen(cfg.checkpoint_dir) == sim.seen

        arts = _read_articles(cfg.checkpoint_dir)
        assert set(arts) == set(sim.articles)
        for url, text in arts.items():
            assert text == sim.articles[url], url  # byte-identical contract

    @pytest.mark.parametrize("fetch_join", ["bucket", "hash"])
    def test_join_path_matches_simulator(self, corpus, fetch_join):
        """Force the distributed fetch (broadcast_limit=0): the selected
        frontier is never collected on the driver, and BOTH over-limit
        strategies — the bucketed co-partitioned fetch (default) and the
        acero hash-join fallback — must reproduce the exact same
        order/seen/articles as the broadcast path and the sequential
        simulator."""
        root, pages = corpus
        cfg = _cfg(os.path.join(root, f"joinpath_{fetch_join}"), rounds=3)
        cfg.broadcast_limit = 0
        cfg.fetch_join = fetch_join
        run_crawl(pages, SPEC, cfg)

        sim = simulate_crawl(SPEC, cfg)
        got = read_crawl_order(cfg)
        got_t = sorted(
            tuple(x)
            for x in got[["host", "round", "order_in_host", "url", "state", "status"]]
            .itertuples(index=False)
        )
        assert got_t == sorted(sim.order)
        assert _read_seen(cfg.checkpoint_dir) == sim.seen
        arts = _read_articles(cfg.checkpoint_dir)
        assert set(arts) == set(sim.articles)
        for url, text in arts.items():
            assert text == sim.articles[url], url
        # the bucketed path's transient co-partitioned shards are cleaned
        # up after each round
        assert not glob.glob(
            os.path.join(cfg.checkpoint_dir, "selected", "round=*", "pb=*")
        )

    def test_legacy_frontier_matches_simulator(self, corpus):
        """frontier_buckets=0 (single-dir frontier write + shuffle-based
        politeness — the pre-bucketed legacy path) must reproduce the
        exact same order/seen/articles as the default bucketed path."""
        root, pages = corpus
        cfg = _cfg(os.path.join(root, "legacyfrontier"), rounds=3)
        cfg.frontier_buckets = 0
        run_crawl(pages, SPEC, cfg)

        sim = simulate_crawl(SPEC, cfg)
        got = read_crawl_order(cfg)
        got_t = sorted(
            tuple(x)
            for x in got[["host", "round", "order_in_host", "url", "state", "status"]]
            .itertuples(index=False)
        )
        assert got_t == sorted(sim.order)
        assert _read_seen(cfg.checkpoint_dir) == sim.seen
        arts = _read_articles(cfg.checkpoint_dir)
        assert set(arts) == set(sim.articles)
        for url, text in arts.items():
            assert text == sim.articles[url], url

    def test_salted_politeness_matches_simulator(self, corpus):
        """politeness_salt_k=4 (two-phase skew-safe selection): same
        order/seen/articles as the unsalted path and the simulator."""
        root, pages = corpus
        cfg = _cfg(os.path.join(root, "saltpath"), rounds=3)
        cfg.politeness_salt_k = 4
        run_crawl(pages, SPEC, cfg)

        sim = simulate_crawl(SPEC, cfg)
        got = read_crawl_order(cfg)
        got_t = sorted(
            tuple(x)
            for x in got[["host", "round", "order_in_host", "url", "state", "status"]]
            .itertuples(index=False)
        )
        assert got_t == sorted(sim.order)
        assert _read_seen(cfg.checkpoint_dir) == sim.seen

    def test_transient_retry_semantics(self, corpus):
        """429/5xx fetches re-enter the frontier with attempts+1 instead
        of being marked seen; they are re-fetched in a later round and
        only retired into the seen set after the attempt cap."""
        from newslookout_ray.pipelines.fetchsim import is_transient

        root, pages = corpus
        cfg = _cfg(os.path.join(root, "eq"), rounds=3)  # reuse prior run
        got = read_crawl_order(cfg)
        transient = got[[is_transient(s) for s in got["status"]]]
        assert len(transient), "corpus produced no transient statuses"
        seen = _read_seen(cfg.checkpoint_dir)
        by_url = transient.groupby("url")
        refetched = 0
        for url, grp in by_url:
            rounds = sorted(grp["round"])
            if len(rounds) > 1:
                refetched += 1
                assert rounds == sorted(set(rounds))  # once per round max
            # a transient url is seen only if it exhausted its attempts
            # within the horizon; if seen, its state is error (2)
            if url in seen:
                assert seen[url] == 2
        assert refetched > 0, "no transient url was actually re-fetched"

    def test_robots_enforced(self, corpus):
        from newslookout_ray.functions.robotskit import is_allowed, parse_robots
        from newslookout_ray.sources.pages import host_name, robots_body

        root, pages = corpus
        cfg = _cfg(os.path.join(root, "eq"), rounds=3)  # reuse prior run's output
        robots = {
            host_name(SPEC, i): parse_robots(robots_body(SPEC, i))
            for i in range(SPEC.n_hosts)
        }
        assert any(robots.values())  # the corpus actually restricts something
        got = read_crawl_order(cfg)
        for _, row in got.iterrows():
            assert is_allowed(row["url"], robots.get(row["host"])), row["url"]

    def test_salted_split_equals_unsalted(self, ray_session):
        """Unit equality on a skewed frontier (one hot host with 5000
        pending urls, two cold ones): salted two-phase output ==
        unsalted output row for row."""
        import ray.data

        from newslookout_ray.pipelines.crawl import (
            politeness_split,
            politeness_split_salted,
        )

        rows = []
        for i in range(5000):
            rows.append({"url": f"http://hot.test/p{i:05d}", "host": "hot.test",
                         "birth_round": i % 3, "pseq": i % 7, "lidx": i % 11,
                         "depth": 1, "attempts": i % 2})
        for h in ("cold-a.test", "cold-b.test"):
            for i in range(12):
                rows.append({"url": f"http://{h}/p{i}", "host": h,
                             "birth_round": 0, "pseq": i, "lidx": 0,
                             "depth": 1, "attempts": 0})
        import pandas as pd

        df = pd.DataFrame(rows)
        cols = ["url", "selected", "order_in_host", "attempts"]
        a = (
            politeness_split(ray.data.from_pandas(df), budget=10, max_attempts=3)
            .to_pandas()[cols].sort_values("url").reset_index(drop=True)
        )
        b = (
            politeness_split_salted(
                ray.data.from_pandas(df), budget=10, max_attempts=3, salt_k=4
            )
            .to_pandas()[cols].sort_values("url").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
        assert a["selected"].sum() == 30  # 3 hosts x budget 10

    def test_politeness_budget_enforced(self, corpus):
        root, pages = corpus
        cfg = _cfg(os.path.join(root, "eq"), rounds=3)  # reuse prior run's output
        got = read_crawl_order(cfg)
        per = got.groupby(["round", "host"]).size()
        assert (per <= cfg.per_host_budget).all()
        # order_in_host is dense 0..k-1 per (round, host)
        for (_, _), grp in got.groupby(["round", "host"]):
            assert sorted(grp["order_in_host"]) == list(range(len(grp)))


@pytest.mark.usefixtures("ray_session")
class TestResume:
    def test_resume_skips_completed_rounds_and_matches_fresh(self, corpus):
        root, pages = corpus
        part = _cfg(os.path.join(root, "resume"), rounds=2)
        run_crawl(pages, SPEC, part)
        fetched_before = {
            f: os.path.getmtime(f)
            for f in glob.glob(os.path.join(part.checkpoint_dir, "fetched", "round=*", "*.parquet"))
        }

        # resume with a larger horizon: rounds 0-1 must be skipped
        cont = _cfg(os.path.join(root, "resume"), rounds=4)
        summary = run_crawl(pages, SPEC, cont)
        assert summary["resumed_at"] == 2
        assert summary["rounds"][0] == {"round": 0, "skipped": True}
        assert summary["rounds"][1] == {"round": 1, "skipped": True}
        assert summary["seen_restored"] > 0

        # completed rounds' outputs untouched (no re-fetch of seen URLs)
        for f, mtime in fetched_before.items():
            assert os.path.getmtime(f) == mtime

        # final state identical to an uninterrupted 4-round run
        fresh = _cfg(os.path.join(root, "fresh"), rounds=4)
        run_crawl(pages, SPEC, fresh)
        assert _read_seen(cont.checkpoint_dir) == _read_seen(fresh.checkpoint_dir)
        assert _read_articles(cont.checkpoint_dir) == _read_articles(fresh.checkpoint_dir)

        # and to the simulator at 4 rounds
        sim = simulate_crawl(SPEC, fresh)
        assert _read_seen(fresh.checkpoint_dir) == sim.seen


@pytest.mark.usefixtures("ray_session")
class TestCsvSink:
    def test_write_articles_csv(self, corpus, tmp_path):
        """S12: distributed CSV export — no text body, list columns
        pipe-joined, url-deduped, readable back with the same rows."""
        from newslookout_ray.pipelines.crawl import (
            read_articles,
            read_articles_ds,
            run_crawl,
            write_articles_csv,
        )

        root, pages = corpus
        cfg = _cfg(os.path.join(root, "csv_run"))
        run_crawl(pages, SPEC, cfg)
        arts = read_articles(cfg.checkpoint_dir)
        assert arts.num_rows > 0

        out = str(tmp_path / "csv_out")
        # the production route: streaming Dataset view -> sink (no
        # driver materialization of the crawl output)
        write_articles_csv(read_articles_ds(cfg.checkpoint_dir), out)

        back = pd.concat(
            [pd.read_csv(f) for f in glob.glob(os.path.join(out, "*.csv"))],
            ignore_index=True,
        )
        assert len(back) == len(set(back["url"])) == arts.num_rows
        assert "text" not in back.columns and "links" not in back.columns
        # list columns flattened to strings
        assert back["keywords"].dtype == object


@pytest.mark.usefixtures("ray_session")
class TestCooperativeShutdown:
    def test_stop_file_ends_at_round_boundary_and_resume_is_identical(self, corpus):
        """Reference GracefulShutdownHandler analogue: a stop requested
        mid-run ends AFTER the current round with a clean manifest, and
        a later resume completes byte-identically to an uninterrupted
        run."""
        import threading

        from newslookout_ray.pipelines.crawl import clear_stop, request_stop

        root, pages = corpus

        # uninterrupted 3-round reference run
        full = _cfg(os.path.join(root, "stop_full"), rounds=3)
        run_crawl(pages, SPEC, full)

        stopped = _cfg(os.path.join(root, "stop_run"), rounds=3)

        # drop the STOP file the moment round 0's manifest lands — i.e.
        # genuinely mid-run, between rounds 0 and 2 finishing
        manifest0 = os.path.join(stopped.checkpoint_dir, "manifest", "round=0.json")

        def stopper():
            import time

            while not os.path.exists(manifest0):
                time.sleep(0.01)
            request_stop(stopped.checkpoint_dir, "test stop")

        t = threading.Thread(target=stopper)
        t.start()
        summary = run_crawl(pages, SPEC, stopped)
        t.join()
        assert "stopped_early" in summary
        done_rounds = len(summary["rounds"])
        assert 1 <= done_rounds < 3
        assert summary["stopped_early"]["before_round"] == done_rounds
        # every completed round has its manifest (clean boundary)
        for r in range(done_rounds):
            assert os.path.exists(
                os.path.join(stopped.checkpoint_dir, "manifest", f"round={r}.json")
            )

        # a resume with the STOP file still present refuses to proceed
        again = run_crawl(pages, SPEC, stopped)
        assert again["stopped_early"]["before_round"] == done_rounds
        assert all(r.get("skipped") for r in again["rounds"])

        # clear + resume completes, identical to the uninterrupted run
        clear_stop(stopped.checkpoint_dir)
        run_crawl(pages, SPEC, stopped)
        assert _read_articles(stopped.checkpoint_dir) == _read_articles(
            full.checkpoint_dir
        )
        assert _read_seen(stopped.checkpoint_dir) == _read_seen(full.checkpoint_dir)

    def test_max_runtime_stops_before_next_round(self, corpus):
        root, pages = corpus
        cfg = _cfg(os.path.join(root, "runtime_run"), rounds=2)
        cfg = dataclasses.replace(cfg, max_runtime_sec=1e-9)
        summary = run_crawl(pages, SPEC, cfg)
        assert summary["rounds"] == []
        assert "max_runtime" in summary["stopped_early"]["reason"]

    def test_pid_lock_blocks_live_holder_reclaims_dead(self, corpus, tmp_path):
        from newslookout_ray.pipelines.crawl import _PidLock

        root, pages = corpus
        cfg = _cfg(os.path.join(root, "lock_run"))

        # a LIVE holder (this very process) blocks a second run
        lock = _PidLock(cfg.checkpoint_dir)
        lock.acquire()
        try:
            other = _PidLock(cfg.checkpoint_dir)
            other.path = lock.path
            # simulate a different process by lying about our pid via a
            # foreign live pid in the file: pid 1 is always alive
            with open(lock.path, "w") as fp:
                fp.write("1")
            with pytest.raises(RuntimeError, match="locked by live pid"):
                run_crawl(pages, SPEC, cfg)
        finally:
            lock.release()

        # a STALE holder (dead pid) is reclaimed and the run proceeds
        os.makedirs(cfg.checkpoint_dir, exist_ok=True)
        with open(os.path.join(cfg.checkpoint_dir, "LOCK.pid"), "w") as fp:
            fp.write("999999999")
        summary = run_crawl(pages, SPEC, cfg)
        assert len(summary["rounds"]) == 2
        assert not os.path.exists(os.path.join(cfg.checkpoint_dir, "LOCK.pid"))


@pytest.mark.usefixtures("ray_session")
class TestArticlesDsView:
    def test_matches_arrow_view_prunes_and_handles_empty(self, corpus):
        """read_articles_ds (the streaming production read of a crawl's
        output) returns exactly read_articles' rows, pushes the column
        projection into the read, and yields an empty dataset for a
        checkpoint with no fetched rounds."""
        from newslookout_ray.pipelines.crawl import (
            read_articles,
            read_articles_ds,
            run_crawl,
        )

        root, pages = corpus
        cfg = _cfg(os.path.join(root, "ds_view_run"))
        run_crawl(pages, SPEC, cfg)

        want = (
            read_articles(cfg.checkpoint_dir)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        got = (
            read_articles_ds(cfg.checkpoint_dir)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)[want.columns.tolist()]
        )
        assert len(want) > 0
        pd.testing.assert_frame_equal(got, want)

        pruned = read_articles_ds(cfg.checkpoint_dir, columns=["url", "state"])
        assert pruned.schema().names == ["url", "state"]
        assert pruned.count() == len(want)

        empty = read_articles_ds(os.path.join(root, "no_such_ckpt"))
        assert empty.count() == 0


@pytest.mark.usefixtures("ray_session")
class TestStatusView:
    def test_read_metrics_and_status(self, corpus, tmp_path):
        """A3 operational surface: read_metrics Dataset + manifest tail
        (scripts/status.py) agree with the crawl summary."""
        import sys

        from newslookout_ray.pipelines.crawl import (
            read_metrics,
            read_round_manifests,
            run_crawl,
        )

        root, pages = corpus
        cfg = _cfg(os.path.join(root, "status_run"))
        summary = run_crawl(pages, SPEC, cfg)

        m = read_metrics(cfg.checkpoint_dir).to_pandas()
        assert {"partition", "fetched", "articles_out", "round"} <= set(m.columns)
        total_selected = sum(r["selected"] for r in summary["rounds"])
        assert int(m["fetched"].sum()) == total_selected

        manifests = read_round_manifests(cfg.checkpoint_dir)
        assert [mm["round"] for mm in manifests] == list(range(len(manifests)))
        assert sum(mm["selected"] for mm in manifests) == total_selected

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
        import status as status_mod

        text = status_mod.render(cfg.checkpoint_dir, with_metrics=True)
        assert f"selected={total_selected}" in text and "TOTAL" in text


@pytest.mark.usefixtures("ray_session")
class TestSolrSink:
    def test_write_solr_payloads(self, corpus, tmp_path):
        """S13: index-payload export — one JSON doc per article with
        (id, url, date, module, content), min-length filter applied,
        readable back as the submit queue a deployment would drain."""
        import json as _json

        from newslookout_ray.pipelines.crawl import (
            SOLR_MIN_ARTICLE_CHARS,
            read_articles,
            read_articles_ds,
            run_crawl,
            write_solr_payloads,
        )

        root, pages = corpus
        cfg = _cfg(os.path.join(root, "solr_run"))
        run_crawl(pages, SPEC, cfg)
        arts = read_articles(cfg.checkpoint_dir)
        assert arts.num_rows > 0

        out = str(tmp_path / "solr_out")
        # the production route: streaming Dataset view -> sink
        write_solr_payloads(read_articles_ds(cfg.checkpoint_dir), out)

        docs = []
        for f in glob.glob(os.path.join(out, "*.json")):
            with open(f) as fh:
                docs.extend(_json.loads(line) for line in fh if line.strip())

        texts = {
            r["url"]: (r["text"] or "").strip()
            for r in arts.select(["url", "text"]).to_pylist()
        }
        expect = {u for u, t in texts.items() if len(t) >= SOLR_MIN_ARTICLE_CHARS}
        assert {d["url"] for d in docs} == expect
        assert len(docs) == len(expect)
        for d in docs[:5]:
            assert set(d) == {"id", "url", "date", "module", "content"}
            assert d["content"] == texts[d["url"]]
            assert d["id"]
