"""The crawl round loop: frontier → dedup → seen-filter → politeness →
fetch-sim → extract → articles/links → next frontier, with per-round
checkpoints, per-partition lineage metrics, and idempotent resume.

Reference lifecycle being reproduced (SURVEY.md §3): the reference runs
one "epoch" per run date — URL discovery (hub fetches) feeds per-plugin
FIFO queues, content fetch is serial per plugin with politeness sleeps,
and links discovered during content fetch are deferred to the NEXT run
via the pending_urls table (worker.py:753-817, 1057-1070). A crawl
*round* here is exactly that epoch:

  - per-host FIFO = per-host ordering by (birth_round, pseq, lidx, url)
    where pseq is the parent page's politeness order and lidx the link's
    position on the parent page (queue insertion order made explicit);
  - the per-host politeness budget caps fetches per host per round (the
    reference's serial fetch thread + fetchCycleTime budget,
    queue_manager.py:141-146) — unselected candidates defer to the next
    round with attempts+1 (pending_urls.attempts, session_hist.py:114);
  - the URL-seen set (completed ∪ failed ∪ errored — session_hist.py:401-406)
    is consulted before scheduling (J1 anti-join) and updated after
    fetching.

Scale design notes (10^10-URL frontier, multi-node):
  - the pages table is NEVER fully materialized: the fetch join reads
    only the url-hash buckets the round's selected frontier touches
    (partition-column pushdown), then hash-joins on url;
  - per-round working state (the selected frontier) is bounded by
    hosts × budget; candidate dedup/politeness use combiner-style
    pre-aggregation inside map_batches before the one groupby shuffle;
  - the seen set is sharded actors (state/cuckoo.py), queried per-batch;
  - every round's outputs land in round-partitioned Parquet and a
    manifest is written LAST — a killed run resumes at the first round
    without a manifest, rebuilding seen shards from their snapshots,
    and never re-fetches a seen URL.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.urlkit import get_host, url_hash64, url_hash64_batch
from ..sources.pages import PagesSpec, seed_frontier
from ..stages.extract import (
    EXTRACT_SCHEMA,
    REFERENCE_NOW,
    STATE_ARTICLE,
    STATE_EMPTY,
    STATE_ERROR,
    PageExtractor,
)
from ..stages.profiles import DEFAULT_PROFILE, SiteProfile
from ..state.cuckoo import SeenSetClient, make_seen_actors
from .fetchsim import simulate_status

FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("birth_round", pa.int32()),
        ("pseq", pa.int64()),
        ("lidx", pa.int64()),
        ("depth", pa.int32()),
        ("attempts", pa.int32()),
    ]
)

ORDER_KEY = ["birth_round", "pseq", "lidx", "url"]


@dataclass
class CrawlConfig:
    rounds: int = 3
    per_host_budget: int = 20
    num_seen_shards: int = 8
    seen_capacity: int = 1 << 16
    max_pending_attempts: int = 3
    status_seed: int = 42
    n_page_buckets: int = 16
    checkpoint_dir: str = "/tmp/newslookout_ray/crawl"
    extract_concurrency: int = 4
    extract_batch_size: int = 256
    join_partitions: int = 8
    metrics_partitions: int = 8
    profile: SiteProfile = field(default_factory=lambda: DEFAULT_PROFILE)


# ---------------------------------------------------------------------------
# frontier stages
# ---------------------------------------------------------------------------


def dedup_first_occurrence(frontier_ds):
    """U8 semantics at dataset scale: first occurrence (min ORDER_KEY) wins.

    Combiner pattern: within-batch min per url first (map_batches), then
    the groupby('url') shuffle sees at most one row per url per input
    block.
    """

    def batch_min(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(ORDER_KEY, kind="mergesort").drop_duplicates("url", keep="first")

    def group_min(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(ORDER_KEY, kind="mergesort").head(1)
        # keep the max attempts seen for the url so deferral counting
        # survives re-discovery (matches pending_urls attempt tracking)
        out = out.assign(attempts=np.int32(df["attempts"].max()))
        return out

    return (
        frontier_ds.map_batches(batch_min, batch_format="pandas")
        .groupby("url")
        .map_groups(group_min, batch_format="pandas")
    )


class SeenFilter:
    """map_batches stage: drop rows whose url is in the seen set (J1)."""

    def __init__(self, actors):
        self.client = SeenSetClient(actors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        hashes = url_hash64_batch(batch["url"].to_pylist())
        seen = self.client.contains_many(hashes)
        return batch.filter(pa.array(~seen))


def politeness_select(frontier_ds, budget: int):
    """Per-host FIFO selection under the politeness budget.

    Phase 1 (combiner, no shuffle): each batch keeps at most ``budget``
    smallest-key rows per host. Phase 2 (the one host shuffle): exact
    top-``budget`` per host, assigned order_in_host 0..B-1 — the per-host
    serial fetch order (deterministic politeness schedule; the
    reference's randomized sleeps do not affect ordering, which is queue
    FIFO — SURVEY.md §7.5).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(ORDER_KEY, kind="mergesort")
            .groupby("host", sort=False)
            .head(budget)
        )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(ORDER_KEY, kind="mergesort").head(budget).reset_index(drop=True)
        g["order_in_host"] = np.arange(len(g), dtype=np.int64)
        return g

    return (
        frontier_ds.map_batches(partial, batch_format="pandas")
        .groupby("host")
        .map_groups(pick, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# fetch simulation (join against the pages corpus)
# ---------------------------------------------------------------------------


def fetch_join(selected_ds, pages_path: str, cfg: CrawlConfig, buckets):
    """Hash-join the selected frontier with the pages corpus on url.

    Reads ONLY the url-hash buckets present in the frontier (partition
    pushdown on the bucket column — ``buckets`` is computed driver-side
    from the small selected set), then Dataset.join. Missing pages (no
    such url on "the web") surface as null html → 404.
    """
    import ray.data

    pages = ray.data.read_parquet(
        pages_path,
        columns=["url", "html"],
        filter=pc.field("b").isin(sorted(int(b) for b in buckets)),
    )
    joined = selected_ds.join(
        pages,
        join_type="left_outer",
        num_partitions=max(2, cfg.join_partitions),
        on=("url",),
    )

    profile, seed = cfg.profile, cfg.status_seed

    def status_stage(batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        statuses = np.empty(len(urls), dtype=np.int16)
        for i, u in enumerate(urls):
            if htmls[i] is None:
                statuses[i] = 404
            else:
                statuses[i] = simulate_status(u, seed, is_hub=profile.is_hub(u))
        return batch.append_column("status", pa.array(statuses, pa.int16()))

    return joined.map_batches(status_stage, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# round loop
# ---------------------------------------------------------------------------


def _frontier_from_rows(rows):
    import ray.data

    cols = {name: [r[name] for r in rows] for name in FRONTIER_SCHEMA.names}
    table = pa.table(
        {n: pa.array(cols[n], FRONTIER_SCHEMA.field(n).type) for n in FRONTIER_SCHEMA.names}
    )
    return ray.data.from_arrow(table)


def _manifest_path(cfg: CrawlConfig, r: int) -> str:
    return os.path.join(cfg.checkpoint_dir, "manifest", f"round={r}.json")


def _frontier_dir(cfg: CrawlConfig, r: int) -> str:
    return os.path.join(cfg.checkpoint_dir, "frontier", f"round={r}")


class CrawlRun:
    """Drives a (possibly resumed) crawl over a pages corpus."""

    def __init__(self, pages_path: str, spec: PagesSpec, cfg: CrawlConfig):
        self.pages_path = pages_path
        self.spec = spec
        self.cfg = cfg
        self.actors = make_seen_actors(cfg.num_seen_shards, cfg.seen_capacity)
        self.client = SeenSetClient(self.actors)
        self.metrics = []

    # -- checkpoint helpers ---------------------------------------------
    def _last_complete_round(self) -> int:
        r = -1
        while os.path.exists(_manifest_path(self.cfg, r + 1)):
            r += 1
        return r

    def _write_frontier(self, ds_or_rows, r: int) -> None:
        path = _frontier_dir(self.cfg, r)
        if isinstance(ds_or_rows, list):
            ds = _frontier_from_rows(ds_or_rows)
        else:
            ds = ds_or_rows
        ds.write_parquet(path)

    def _read_frontier(self, r: int):
        import ray.data

        # select_columns drops the spurious `round` hive-partition column
        # the round=N directory name would otherwise inject
        return ray.data.read_parquet(_frontier_dir(self.cfg, r)).select_columns(
            FRONTIER_SCHEMA.names
        )

    # -- the round ------------------------------------------------------
    def run(self) -> dict:
        cfg = self.cfg
        os.makedirs(os.path.join(cfg.checkpoint_dir, "manifest"), exist_ok=True)

        last_done = self._last_complete_round()
        if last_done >= 0:
            restored = self.client.restore_all(
                os.path.join(cfg.checkpoint_dir, "seen"), last_done
            )
        else:
            restored = 0
            if not os.path.isdir(_frontier_dir(cfg, 0)):
                self._write_frontier(
                    [dict(r, birth_round=0) for r in seed_frontier(self.spec)], 0
                )

        summary = {"rounds": [], "resumed_at": last_done + 1, "seen_restored": restored}
        for r in range(cfg.rounds):
            if r <= last_done:
                summary["rounds"].append({"round": r, "skipped": True})
                continue
            summary["rounds"].append(self._run_round(r))
        summary["seen_total"] = self.client.total_size()
        return summary

    def _run_round(self, r: int) -> dict:
        import ray

        cfg = self.cfg
        t0 = time.time()
        frontier = self._read_frontier(r)

        candidates = dedup_first_occurrence(frontier)
        # materialize BEFORE this round's fetches mutate the seen set, so
        # the deferred branch below re-reads a frozen snapshot
        unseen = candidates.map_batches(
            SeenFilter,
            batch_format="pyarrow",
            concurrency=2,
            fn_constructor_args=(self.actors,),
        ).materialize()
        selected = politeness_select(unseen, cfg.per_host_budget).materialize()
        sel_count = selected.count()

        # deferred = unseen candidates not selected this round (anti-join
        # via broadcast of the small selected url set: hosts × budget)
        sel_urls = set(row["url"] for row in selected.select_columns(["url"]).take_all())
        sel_ref = ray.put(sel_urls)
        max_attempts = cfg.max_pending_attempts

        def defer_stage(batch: pa.Table) -> pa.Table:
            sel = ray.get(sel_ref)
            mask = pa.array([u not in sel for u in batch["url"].to_pylist()])
            out = batch.filter(mask)
            attempts = pc.add(out["attempts"], pa.scalar(1, pa.int32())).cast(pa.int32())
            out = out.set_column(
                out.schema.get_field_index("attempts"), "attempts", attempts
            )
            return out.filter(pc.less_equal(out["attempts"], max_attempts))

        deferred = unseen.map_batches(defer_stage, batch_format="pyarrow")

        # fetch + extract (read only the url-hash buckets this round touches)
        buckets = {url_hash64(u) % cfg.n_page_buckets for u in sel_urls}
        fetched = fetch_join(selected, self.pages_path, cfg, buckets)
        extracted = fetched.map_batches(
            PageExtractor,
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
            concurrency=cfg.extract_concurrency,
            fn_constructor_args=(cfg.profile, REFERENCE_NOW),
        ).materialize()

        # articles sink (round-partitioned, resumable layout)
        articles = extracted.map_batches(
            lambda t: t.filter(pc.equal(t["state"], STATE_ARTICLE)),
            batch_format="pyarrow",
        )
        articles.drop_columns(["links"]).write_parquet(
            os.path.join(cfg.checkpoint_dir, "articles", f"round={r}")
        )
        # realized fetch order (golden-order comparison + lineage)
        extracted.select_columns(
            ["host", "order_in_host", "url", "state", "status"]
        ).write_parquet(os.path.join(cfg.checkpoint_dir, "fetched", f"round={r}"))

        # mark fetched urls seen (streamed, per-batch shard RPCs)
        n_articles = n_errors = 0
        for batch in extracted.select_columns(["url", "state"]).iter_batches(
            batch_size=4096, batch_format="pyarrow"
        ):
            urls = batch["url"].to_pylist()
            states = batch["state"].to_numpy()
            self.client.add_many(url_hash64_batch(urls), urls, states, r)
            n_articles += int((states == STATE_ARTICLE).sum())
            n_errors += int((states == STATE_ERROR).sum())

        # next frontier: deferred ∪ links born this round
        def explode_links(batch: pa.Table) -> pa.Table:
            out = {n: [] for n in FRONTIER_SCHEMA.names}
            links_col = batch["links"].to_pylist()
            orders = batch["order_in_host"].to_pylist()
            depths = batch["depth"].to_pylist()
            for i, links in enumerate(links_col):
                if not links:
                    continue
                for j, link in enumerate(links):
                    url = link.lower()
                    out["url"].append(url)
                    out["host"].append(get_host(url))
                    out["birth_round"].append(r + 1)
                    out["pseq"].append(orders[i])
                    out["lidx"].append(j)
                    out["depth"].append(depths[i] + 1)
                    out["attempts"].append(0)
            return pa.table(
                {n: pa.array(out[n], FRONTIER_SCHEMA.field(n).type) for n in FRONTIER_SCHEMA.names}
            )

        # carry order_in_host through extract for child pseq
        with_order = extracted  # order_in_host column survives the stages
        new_links = with_order.map_batches(explode_links, batch_format="pyarrow")
        next_frontier = deferred.select_columns(FRONTIER_SCHEMA.names).union(
            new_links.select_columns(FRONTIER_SCHEMA.names)
        )
        self._write_frontier(next_frontier, r + 1)

        # lineage metrics: one row per url-hash partition
        self._write_metrics(extracted, r, time.time() - t0)

        # seen snapshots then manifest (LAST — presence ⇒ round complete)
        self.client.snapshot_all(os.path.join(cfg.checkpoint_dir, "seen"), r)
        stats = {
            "round": r,
            "selected": sel_count,
            "articles": n_articles,
            "errors": n_errors,
            "wall_sec": round(time.time() - t0, 3),
        }
        with open(_manifest_path(cfg, r) + ".tmp", "w") as fh:
            json.dump(stats, fh)
        os.replace(_manifest_path(cfg, r) + ".tmp", _manifest_path(cfg, r))
        return stats

    def _write_metrics(self, extracted, r: int, wall: float) -> None:
        cfg = self.cfg
        parts = cfg.metrics_partitions

        def part_metrics(batch: pa.Table) -> pa.Table:
            # combiner: partial aggregates per (partition, host); the tiny
            # roll-up below makes host_count exact (no nunique-of-partials)
            hashes = url_hash64_batch(batch["url"].to_pylist())
            part = (hashes % np.uint64(parts)).astype(np.int32)
            df = pd.DataFrame(
                {
                    "partition": part,
                    "host": batch["host"].to_pylist(),
                    "state": batch["state"].to_numpy(),
                    "raw_size": batch["raw_size"].to_numpy(),
                }
            )
            g = df.groupby(["partition", "host"]).agg(
                fetched=("state", "size"),
                errors_permanent=("state", lambda s: int((s == STATE_ERROR).sum())),
                articles_out=("state", lambda s: int((s == STATE_ARTICLE).sum())),
                bytes_html=("raw_size", "sum"),
            )
            return pa.Table.from_pandas(g.reset_index())

        partials = extracted.map_batches(part_metrics, batch_format="pyarrow").to_pandas()
        if len(partials):
            by_host = partials.groupby(["partition", "host"], as_index=False).sum()
            rolled = by_host.groupby("partition", as_index=False).agg(
                host_count=("host", "nunique"),
                fetched=("fetched", "sum"),
                errors_permanent=("errors_permanent", "sum"),
                articles_out=("articles_out", "sum"),
                bytes_html=("bytes_html", "sum"),
            )
        else:
            rolled = partials
        rolled["round"] = np.int32(r)
        rolled["wall_ms"] = int(wall * 1000)
        out_dir = os.path.join(cfg.checkpoint_dir, "metrics", f"round={r}")
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(rolled, preserve_index=False),
            os.path.join(out_dir, "part.parquet"),
        )


def run_crawl(pages_path: str, spec: PagesSpec, cfg: CrawlConfig) -> dict:
    return CrawlRun(pages_path, spec, cfg).run()


def read_crawl_order(cfg: CrawlConfig) -> pd.DataFrame:
    """The realized fetch order: (host, round, order_in_host, url, state,
    status) from the per-round fetched tables — compared against the
    simulator's golden order in tests."""
    import glob

    frames = []
    for rdir in sorted(
        glob.glob(os.path.join(cfg.checkpoint_dir, "fetched", "round=*")),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    ):
        df = pq.read_table(rdir).to_pandas()
        df["round"] = int(rdir.rsplit("=", 1)[1])
        frames.append(df)
    if not frames:
        return pd.DataFrame(columns=["host", "round", "order_in_host", "url", "state", "status"])
    out = pd.concat(frames, ignore_index=True)
    return out.sort_values(["round", "host", "order_in_host"]).reset_index(drop=True)
