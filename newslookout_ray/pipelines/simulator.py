"""Sequential reference-semantics crawl simulator — the oracle.

A pure-Python, single-threaded implementation of the crawl contract
(SURVEY.md §2.10/§3, FIXTURES.md §4): per-host FIFO by
(birth_round, pseq, lidx, url), first-occurrence dedup, seen-set
anti-join, per-host politeness budget with next-round deferral, links
deferred one round (the reference's pending_urls epoch design,
worker.py:1057-1070), deterministic fetch statuses.

It shares the *kernels* (process_fetched_page, simulate_status) with the
Ray pipeline — so the equivalence test in tests/test_crawl.py proves the
DISTRIBUTED ORCHESTRATION (shuffles, actor state, round checkpoints)
reproduces sequential semantics: same per-host fetch order, same final
seen set, same articles.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.urlkit import get_host
from ..sources.pages import PagesSpec, page_record, seed_frontier
from ..stages.extract import (
    REFERENCE_NOW,
    STATE_ARTICLE,
    STATE_EMPTY,
    STATE_ERROR,
    process_fetched_page,
)
from ..stages.profiles import CompiledProfile
from .crawl import CrawlConfig
from .fetchsim import simulate_status


@dataclass
class SimResult:
    #: [(host, round, order_in_host, url, state, status), ...]
    order: list = field(default_factory=list)
    #: url → state (1 article, 2 error, 3 fetched-empty)
    seen: dict = field(default_factory=dict)
    #: url → extracted text (byte-identical contract)
    articles: dict = field(default_factory=dict)
    #: url → attempts of still-pending candidates after the last round
    pending: dict = field(default_factory=dict)


def build_web(spec: PagesSpec) -> dict:
    """url → html bytes for the whole synthetic corpus (incl. robots rows)."""
    web = {}
    for pid in range(spec.n_total_rows):
        rec = page_record(spec, pid)
        web[rec["url"]] = rec["html"]
    return web


def simulate_crawl(spec: PagesSpec, cfg: CrawlConfig, web: dict | None = None) -> SimResult:
    if web is None:
        web = build_web(spec)
    cp = CompiledProfile(cfg.profile)
    res = SimResult()

    # robots prologue (out-of-band, mirrors CrawlRun._load_robots)
    from ..functions.robotskit import is_allowed, parse_robots, robots_url
    from ..sources.pages import host_name

    robots = {}
    for i in range(spec.n_hosts):
        host = host_name(spec, i)
        body = web.get(robots_url(host))
        robots[host] = parse_robots(body.decode("utf-8")) if body is not None else []

    # frontier rows: dict(url, host, birth_round, pseq, lidx, depth, attempts)
    frontier = [dict(r, birth_round=0) for r in seed_frontier(spec)]

    for r in range(cfg.rounds):
        # ---- dedup first-occurrence: min (birth_round, pseq, lidx, depth)
        # per url, keep max attempts — the same total order as the crawl
        # pipeline's packed int64 key (crawl._pack_order)
        by_url = {}
        for row in frontier:
            key = (row["birth_round"], row["pseq"], row["lidx"], row["depth"])
            cur = by_url.get(row["url"])
            if cur is None:
                by_url[row["url"]] = (key, dict(row))
            else:
                cur_key, cur_row = cur
                attempts = max(cur_row["attempts"], row["attempts"])
                winner = dict(row) if key < cur_key else cur_row
                winner["attempts"] = attempts
                by_url[row["url"]] = (min(key, cur_key), winner)
        candidates = [v[1] for v in by_url.values()]

        # ---- robots filter then seen anti-join
        unseen = [
            c
            for c in candidates
            if is_allowed(c["url"], robots.get(c["host"])) and c["url"] not in res.seen
        ]

        # ---- politeness: per-host FIFO, budget B
        hosts: dict = {}
        for c in unseen:
            hosts.setdefault(c["host"], []).append(c)
        selected, deferred = [], []
        for host in hosts:
            rows = sorted(
                hosts[host],
                key=lambda c: (c["birth_round"], c["pseq"], c["lidx"], c["url"]),
            )
            take = rows[: cfg.per_host_budget]
            for order, c in enumerate(take):
                selected.append((host, order, c))
            for c in rows[cfg.per_host_budget:]:
                c = dict(c, attempts=c["attempts"] + 1)
                if c["attempts"] <= cfg.max_pending_attempts:
                    deferred.append(c)

        # ---- fetch + extract
        from .fetchsim import is_transient

        new_links = []
        for host, order, c in selected:
            url = c["url"]
            html = web.get(url)
            if html is None:
                status = 404
            else:
                status = simulate_status(url, cfg.status_seed, is_hub=cfg.profile.is_hub(url))
            if status != 200 or html is None:
                state = STATE_ERROR
                rec = None
            else:
                rec = process_fetched_page(cp, url, html, now=REFERENCE_NOW)
                state = rec["state"]
            res.order.append((host, r, order, url, state, status))
            # transient failure under the attempt cap: NOT seen — re-enter
            # the frontier with attempts+1 and the original order key
            # (pending_urls re-attempt semantics, session_hist.py:114)
            if is_transient(status) and c["attempts"] + 1 <= cfg.max_pending_attempts:
                new_links.append(dict(c, attempts=c["attempts"] + 1))
                continue
            res.seen[url] = state
            if state == STATE_ARTICLE:
                res.articles[url] = rec["text"]
            if rec is not None:
                for j, link in enumerate(rec["links"]):
                    lurl = link.lower()
                    new_links.append(
                        {
                            "url": lurl,
                            "host": get_host(lurl),
                            "birth_round": r + 1,
                            "pseq": order,
                            "lidx": j,
                            "depth": c["depth"] + 1,
                            "attempts": 0,
                        }
                    )

        frontier = deferred + new_links

    # final pending state (carryover the next round would consume)
    by_url = {}
    for row in frontier:
        key = (row["birth_round"], row["pseq"], row["lidx"], row["url"])
        if row["url"] not in by_url or key < by_url[row["url"]][0]:
            by_url[row["url"]] = (key, row)
    res.pending = {
        u: v[1]["attempts"]
        for u, v in by_url.items()
        if u not in res.seen and is_allowed(u, robots.get(v[1]["host"]))
    }
    return res
