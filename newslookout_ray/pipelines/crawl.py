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
  - the pages table is NEVER fully materialized: the fetch reads only
    the url-hash buckets the round's selected frontier touches (in-file
    bucket column pruning) and streams them through ONE stateless task
    stage that probes the broadcast selected-frontier table (a broadcast
    semi-join — sound because the politeness budget bounds the selected
    set to hosts × budget; `fetch_join` keeps the hash-join form for
    frontiers too large to broadcast);
  - dedup + politeness fuse into ONE host-keyed shuffle that emits the
    selected AND deferred streams together (politeness_split);
  - the seen set is sharded cuckoo-filter actors (state/cuckoo.py),
    probed and updated by distributed per-batch RPCs (idempotent adds);
  - worker processes cache compiled regex packs and deserialized
    broadcasts across rounds (stages are tasks, not per-round actor
    pools — state is cheap to rebuild, so warm workers beat pool spawns);
  - every round's outputs land in round-partitioned Parquet and a
    manifest is written LAST — a killed run resumes at the first round
    without a manifest, rebuilding seen shards from their snapshots,
    and never re-fetches a seen URL.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions.urlkit import get_host, host_arrow, url_hash64, url_hash64_batch
from ..util import collect_rows, collect_table, table_from_pandas as _table_from_pandas
from ..sources.pages import (
    KIND_ROBOTS,
    PagesSpec,
    seed_frontier,
    url_kind_batch,
)
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
    seen_filter_concurrency: int = 2
    join_partitions: int = 8
    #: over-limit fetch strategy: "bucket" (default) co-partitions the
    #: selected frontier by the pages corpus's url-hash bucket and probes
    #: each bucket's pages partition independently — the html payload is
    #: never shuffled (measured 4.1x faster than "hash" at the 12.8M-page
    #: bench workload). "hash" is the acero LEFT OUTER Dataset.join on
    #: url (join_partitions-way) — the fallback when the corpus has no
    #: kind=*/bucket=* hive layout to co-partition against (auto-detected).
    fetch_join: str = "bucket"
    #: selected sets up to this many rows use the broadcast semi-join
    #: fetch (no shuffle); larger frontiers switch to the distributed
    #: fetch_join strategy above and never touch the driver
    broadcast_limit: int = 200_000
    #: >1 enables two-phase salted politeness (hot-host skew safety):
    #: phase-1 groups on host#salt so no task holds a whole hot host
    politeness_salt_k: int = 1
    #: frontier parquet is written hive-partitioned by fb =
    #: hash(host) % frontier_buckets, so the NEXT round's politeness
    #: needs NO shuffle at all — each fb directory already holds every
    #: row of its hosts (a url's duplicates included), and the exact
    #: per-host pick runs as one task per directory. The ~5-9 s/round
    #: sort-shuffle this replaces was the crawl's largest
    #: parallelism-independent cost (the write-side split is free: each
    #: sink task fans its block into per-fb files locally). Set to 0 to
    #: restore the single-dir write + shuffle-based politeness (always
    #: used when politeness_salt_k > 1 — the salted two-phase needs its
    #: own grouping).
    frontier_buckets: int = 64
    metrics_partitions: int = 8
    #: cooperative shutdown (reference GracefulShutdownHandler +
    #: run(max_runtime) analogue, queue_manager.py:722-778 /
    #: scraper_app.py:293-427): >0 stops AFTER the round in flight once
    #: the wall-clock budget is exhausted — the round completes and
    #: writes its manifest, so a resume continues exactly where it
    #: stopped. The stop FILE ({checkpoint}/STOP, see request_stop) is
    #: the cross-process form: touch it (or let a SIGTERM handler touch
    #: it) and the run ends at the next round boundary.
    max_runtime_sec: float = 0.0
    #: refuse to start when another live process holds this checkpoint
    #: (reference PID-lock analogue, scraper_app.py:256-280); stale
    #: locks from dead pids are reclaimed automatically
    pid_lock: bool = True
    profile: SiteProfile = field(default_factory=lambda: DEFAULT_PROFILE)


# ---------------------------------------------------------------------------
# frontier stages
# ---------------------------------------------------------------------------


#: order-key packing bounds (bits): the lexicographic ORDER_KEY restricted
#: to one url is equivalent to the numeric order of this packed int64,
#: because each field stays within its bit budget: birth_round < 2^13,
#: pseq < 2^16 (politeness budget cap), lidx < 2^16 (link cap 500),
#: depth < 2^10 (the url tie-break only matters ACROSS urls).
_PACK_ROUND = 1 << 42
_PACK_PSEQ = 1 << 26
_PACK_LIDX = 1 << 10


def _pack_order(df: pd.DataFrame) -> np.ndarray:
    return (
        df["birth_round"].to_numpy(np.int64) * _PACK_ROUND
        + np.minimum(df["pseq"].to_numpy(np.int64), (1 << 16) - 1) * _PACK_PSEQ
        + np.minimum(df["lidx"].to_numpy(np.int64), (1 << 16) - 1) * _PACK_LIDX
        + np.minimum(df["depth"].to_numpy(np.int64), (1 << 10) - 1)
    )


def _unpack_order(packed: np.ndarray) -> dict:
    return {
        "birth_round": (packed // _PACK_ROUND).astype(np.int32),
        "pseq": ((packed % _PACK_ROUND) // _PACK_PSEQ).astype(np.int64),
        "lidx": ((packed % _PACK_PSEQ) // _PACK_LIDX).astype(np.int64),
        "depth": (packed % _PACK_LIDX).astype(np.int32),
    }


def dedup_first_occurrence(frontier_ds):
    """U8 semantics at dataset scale: first occurrence (min ORDER_KEY) wins.

    The order key is packed into one int64 so the whole dedup is a
    combiner (per-batch min per url) + ONE native vectorized
    ``groupby('url').aggregate(Min, Max)`` — no per-group Python. host
    and the order fields are reconstructed from the url / packed key.
    """
    from ray.data.aggregate import Max, Min

    def batch_min(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(pack=_pack_order(df))
        return df.groupby("url", as_index=False).agg(
            pack=("pack", "min"), attempts=("attempts", "max")
        )

    agg = (
        frontier_ds.map_batches(batch_min, batch_format="pandas")
        .groupby("url")
        .aggregate(Min("pack", alias_name="pack"), Max("attempts", alias_name="attempts"))
    )

    def unpack(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.urlkit import get_host

        fields = _unpack_order(df["pack"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "url": df["url"],
                "host": df["url"].map(get_host),
                "birth_round": fields["birth_round"],
                "pseq": fields["pseq"],
                "lidx": fields["lidx"],
                "depth": fields["depth"],
                "attempts": df["attempts"].astype(np.int32),
            }
        )

    return agg.map_batches(unpack, batch_format="pandas")


def _dedup_sort(df: pd.DataFrame) -> pd.DataFrame:
    df = df.assign(pack=_pack_order(df))
    df = df.sort_values(["pack", "url"], kind="mergesort").drop_duplicates(
        "url", keep="first"
    )
    return df.sort_values(ORDER_KEY, kind="mergesort").drop(columns=["pack"])


def politeness_select(frontier_ds, budget: int):
    """Fused first-occurrence dedup (U8) + per-host FIFO politeness
    selection in ONE host-keyed shuffle (selected rows only — see
    politeness_split when the deferred stream is also needed).

    Correctness of the fusion: every row of a url shares the url's host,
    so per-url dedup can happen inside the host group. The dedup winner
    (min packed order key) provably carries the max attempts — attempts
    only accrue on deferral, and a deferred row keeps its original
    (earliest) order key, so the min-key incarnation of a url IS its
    most-deferred one. Combiner phase 1 (no shuffle): per-batch per-url
    dedup + per-host head(budget) — sound because any globally-selected
    row is also among the best ``budget`` of its batch. Phase 2 (the one
    shuffle): exact per-url dedup + top-``budget`` per host, assigned
    order_in_host 0..B-1 — the per-host serial fetch order
    (deterministic politeness; the reference's randomized sleeps do not
    affect ordering, which is queue FIFO — SURVEY.md §7.5).
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return _dedup_sort(df).groupby("host", sort=False).head(budget)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        g = _dedup_sort(df).head(budget).reset_index(drop=True)
        g["order_in_host"] = np.arange(len(g), dtype=np.int64)
        return g

    return (
        frontier_ds.map_batches(partial, batch_format="pandas")
        .groupby("host")
        .map_groups(pick, batch_format="pandas")
    )


def _politeness_pick_block(
    df: pd.DataFrame, budget: int, max_attempts: int
) -> pd.DataFrame:
    """Exact politeness over one co-located block of hosts: every row of
    each present host (and hence every duplicate of each url) must be in
    ``df``. The per-host _pick_group, vectorized across every host in
    the block: _dedup_sort orders by ORDER_KEY (total order), so a
    per-host cumcount over it reproduces each host's FIFO rank."""
    g = _dedup_sort(df).reset_index(drop=True)
    rank = g.groupby("host", sort=False).cumcount().to_numpy(np.int64)
    sel = rank < budget
    g["order_in_host"] = np.where(sel, rank, -1)
    g["selected"] = sel
    att = g["attempts"].to_numpy(np.int32).copy()
    att[~sel] += 1
    g["attempts"] = att
    return g[sel | (att <= max_attempts)]


def politeness_split(frontier_ds, budget: int, max_attempts: int):
    """politeness_select variant emitting BOTH streams from ONE shuffle:
    selected rows get ``order_in_host`` 0..B-1 and ``selected=True``; the
    rest are the deferred carryover (attempts+1, rows over the attempt
    cap dropped — pending_urls retry semantics, session_hist.py:114).
    Phase 1 only dedups per url within the batch — no head() truncation,
    since deferred rows must survive to the next round.

    The shuffle key is ``fb = hash(host) % ~2x-cpus``, not host: a host's
    rows (and therefore a url's duplicates) all land in one partition, so
    the per-partition pick is exact, while the reduce side runs one
    vectorized pandas pass per PARTITION (sort + cumcount across all its
    hosts) instead of one Python ``map_groups`` call per host —
    host-cardinality Python calls dominated this stage's wall time."""
    import ray

    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(pack=_pack_order(df))
        df = (
            df.sort_values(["pack", "url"], kind="mergesort")
            .drop_duplicates("url", keep="first")
            .drop(columns=["pack"])
        )
        fb = pd.util.hash_array(df["host"].to_numpy(object)) % np.uint64(num_parts)
        return df.assign(fb=fb.astype(np.int64))

    def pick_part(df: pd.DataFrame) -> pd.DataFrame:
        return _politeness_pick_block(df.drop(columns=["fb"]), budget, max_attempts)

    return (
        frontier_ds.map_batches(partial, batch_format="pandas")
        .groupby("fb")
        .map_groups(pick_part, batch_format="pandas")
    )


def _frontier_fb(hosts: np.ndarray, n_buckets: int) -> np.ndarray:
    """Write-side frontier bucket: same-host rows (hence all duplicates
    of a url) always share fb, which is the whole correctness contract of
    the shuffle-free politeness read."""
    return (
        pd.util.hash_array(np.asarray(hosts, dtype=object)) % np.uint64(n_buckets)
    ).astype(np.int64)


_POLITENESS_COLS = list(FRONTIER_SCHEMA.names) + ["order_in_host", "selected"]


def _empty_politeness_table() -> pa.Table:
    cols = {n: pa.array([], FRONTIER_SCHEMA.field(n).type) for n in FRONTIER_SCHEMA.names}
    cols["order_in_host"] = pa.array([], pa.int64())
    cols["selected"] = pa.array([], pa.bool_())
    return pa.table(cols)


_ROBOTS_BUCKET_CACHE: dict = {}


def _robots_bucket_map(robots_dir: str, fb: int) -> dict:
    """host → disallow-prefixes for ONE robots bucket, loaded from the
    hive-bucketed robots side table and cached per worker process. Each
    politeness task touches only its own fb slice — driver memory and
    broadcast volume stay O(hosts / frontier_buckets) per task instead
    of O(hosts) globally."""
    # generation = the side table's root mtime: a second run_crawl() in
    # the same Ray session (shared checkpoint_dir, updated corpus)
    # rmtree+rewrites the table, and warm workers must not keep serving
    # the previous corpus's rules (one stat per task — cheap).
    # INVARIANT (see the _load_robots write site): the root mtime only
    # changes because the writer ALWAYS rmtree+recreates the directory;
    # an in-place rewrite of fb=N files would NOT bump the root mtime
    # and warm workers would serve stale rules — never rewrite in place.
    try:
        gen = os.stat(robots_dir).st_mtime_ns
    except OSError:
        gen = 0
    key = (robots_dir, fb, gen)
    cached = _ROBOTS_BUCKET_CACHE.get(key)
    if cached is None:
        import pyarrow.dataset as pads

        path = os.path.join(robots_dir, f"fb={fb}")
        if os.path.isdir(path):
            t = pads.dataset(path).to_table(columns=["host", "prefixes"])
            cached = dict(zip(t["host"].to_pylist(), t["prefixes"].to_pylist()))
        else:
            cached = {}
        if len(_ROBOTS_BUCKET_CACHE) > 64:
            _ROBOTS_BUCKET_CACHE.clear()
        _ROBOTS_BUCKET_CACHE[key] = cached
    return cached


def make_bucketed_politeness(
    actors, robots_ref, budget: int, max_attempts: int, robots_dir: str = None
):
    """Shuffle-free politeness over a bucketed frontier: one task per
    fb directory — load the whole partition, seen/robots-filter it, run
    the exact per-host pick. Correct because the write partitioned by
    hash(host): a batch holds WHOLE fb partitions, so every row of every
    present host is in the batch (grouping several whole partitions into
    one batch stays exact — hosts never span fb values).

    Robots state arrives either as a broadcast dict ref (legacy /
    small host sets) or, preferably, as ``robots_dir`` — a parquet side
    table hive-bucketed by the SAME fb = hash(host) % frontier_buckets
    as the frontier, so each task loads only its own bucket's slice
    (no O(hosts) driver dict, no fat broadcast at 10^7-host scale)."""
    seen_fn = make_seen_filter(actors, None if robots_dir else robots_ref)

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.dataset as pads

        # one pads.dataset per directory (pyarrow rejects dir lists);
        # batches normally hold one fb dir each (batch_size=1)
        paths = batch["path"].to_pylist()
        parts = [
            pads.dataset(p).to_table(columns=list(FRONTIER_SCHEMA.names))
            for p in paths
        ]
        if robots_dir is not None and parts:
            filtered = []
            for p, t in zip(paths, parts):
                fb = int(os.path.basename(os.path.normpath(p)).split("=", 1)[1])
                filtered.append(_apply_robots(t, _robots_bucket_map(robots_dir, fb)))
            parts = filtered
        tbl = pa.concat_tables(parts) if parts else _empty_politeness_table()
        if tbl.num_rows:
            tbl = seen_fn(tbl)
        if tbl.num_rows == 0:
            return _empty_politeness_table()
        out = _politeness_pick_block(tbl.to_pandas(), budget, max_attempts)
        return _table_from_pandas(out[_POLITENESS_COLS])

    return fn


def _pick_group(df: pd.DataFrame, budget: int, max_attempts: int) -> pd.DataFrame:
    """Per-host selection core: first ``budget`` rows in packed FIFO
    order get order_in_host 0..B-1 / selected=True; the rest carry over
    with attempts+1, dropped past the cap."""
    g = _dedup_sort(df).reset_index(drop=True)
    n_sel = min(budget, len(g))
    order = np.full(len(g), -1, dtype=np.int64)
    order[:n_sel] = np.arange(n_sel)
    g["order_in_host"] = order
    g["selected"] = order >= 0
    att = g["attempts"].to_numpy(np.int32).copy()
    att[n_sel:] += 1
    g["attempts"] = att
    keep = g["selected"] | (g["attempts"] <= max_attempts)
    return g[keep]


def politeness_split_salted(frontier_ds, budget: int, max_attempts: int, salt_k: int = 8):
    """Skew-safe politeness_split: exact two-phase selection so no task
    ever materializes a whole hot host's pending set (SURVEY §2 M4 /
    'hot hosts salted host#k'; reference has no equivalent — its
    per-plugin thread just runs longer, worker.py:908-1000).

    Phase 1 groups on host#salt (salt = stable url-hash % k) and marks
    each shard's first ``budget`` rows as candidates; a row outranked by
    ``budget`` peers in its own shard is outranked by at least that many
    in the whole host, so the global top-B is always a subset of the
    per-shard top-Bs — non-candidates defer (attempts+1) immediately.
    Phase 2 re-groups ONLY the <= budget*salt_k candidate rows per host
    and applies the exact per-host pick, so selected set, order_in_host
    and attempts are identical to politeness_split. Group memory:
    phase 1 ~ host_pending/salt_k, phase 2 <= budget*salt_k rows."""
    import pyarrow.compute as pc

    import ray

    # Shuffle groups are hash-BUCKETED into ~2x-cpu partitions and each
    # partition processes ALL its key groups in one vectorized pandas
    # pass (cumcount / in-process groupby): a host#salt cardinality of
    # tens of thousands otherwise costs one Python map_groups call per
    # group, which dominated the politeness stage wall time. Same url →
    # same hs → same partition, so the global per-url dedup inside a
    # partition is exact.
    num_parts = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(pack=_pack_order(df))
        df = (
            df.sort_values(["pack", "url"], kind="mergesort")
            .drop_duplicates("url", keep="first")
            .drop(columns=["pack"])
        )
        salt = pd.util.hash_array(df["url"].to_numpy(object)) % np.uint64(salt_k)
        hs = df["host"] + "#" + salt.astype(np.int64).astype(str)
        p1 = (pd.util.hash_array(hs.to_numpy(object)) % np.uint64(num_parts)).astype(
            np.int64
        )
        return df.assign(hs=hs, p1=p1)

    def local_pick_part(df: pd.DataFrame) -> pd.DataFrame:
        # per-shard first-`budget` marking, vectorized across every hs
        # shard in the partition (cumcount over the packed order)
        g = _dedup_sort(df).reset_index(drop=True)
        g["cand"] = g.groupby("hs", sort=False).cumcount() < budget
        return g.drop(columns=["p1"])

    phase1 = (
        frontier_ds.map_batches(partial, batch_format="pandas")
        .groupby("p1")
        .map_groups(local_pick_part, batch_format="pandas")
        .materialize()
    )
    deferred = phase1.map_batches(
        lambda t: _defer_non_candidates(t, max_attempts), batch_format="pyarrow"
    )

    def add_p2(t: pa.Table) -> pa.Table:
        t = t.filter(t["cand"]).drop_columns(["hs", "cand"])
        p2 = pd.util.hash_array(
            np.asarray(t["host"].to_pylist(), dtype=object)
        ) % np.uint64(num_parts)
        return t.append_column("p2", pa.array(p2.astype(np.int64), pa.int64()))

    def pick_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["p2"])
        parts = [
            _pick_group(g, budget, max_attempts)
            for _, g in df.groupby("host", sort=True)
        ]
        return pd.concat(parts, ignore_index=True)

    picked = (
        phase1.map_batches(add_p2, batch_format="pyarrow")
        .groupby("p2")
        .map_groups(pick_part, batch_format="pandas")
    )
    return picked.union(deferred)


def _defer_non_candidates(t: "pa.Table", max_attempts: int) -> "pa.Table":
    """Phase-1 non-candidates are provably non-selected: defer in place
    (attempts+1, cap filter) with the politeness_split output schema."""
    import pyarrow.compute as pc

    t = t.filter(pc.invert(t["cand"])).drop_columns(["hs", "cand"])
    att = pc.add(t["attempts"], 1)
    t = t.set_column(t.schema.get_field_index("attempts"), "attempts", att)
    t = t.filter(pc.less_equal(att, max_attempts))
    t = t.append_column(
        "order_in_host", pa.array(np.full(t.num_rows, -1, dtype=np.int64))
    )
    return t.append_column("selected", pa.array(np.zeros(t.num_rows, dtype=bool)))


def _apply_robots(batch: pa.Table, robots: dict) -> pa.Table:
    """Drop robots-disallowed rows. Path extraction via ONE Arrow regex
    pass (C++), then a thin dict.get + startswith loop — urlsplit per
    row was ~4x this."""
    if not robots or batch.num_rows == 0:
        return batch
    paths = pc.replace_substring_regex(
        batch["url"], pattern=r"^[a-z][a-z0-9+.\-]*://[^/]*", replacement=""
    ).to_pylist()
    hosts = batch["host"].to_pylist()
    get = robots.get
    allowed = pa.array(
        [
            not ps or not any(map((pt or "/").startswith, ps))
            for pt, ps in zip(paths, (get(h) for h in hosts))
        ]
    )
    return batch.filter(allowed)


def make_seen_filter(actors, robots_ref):
    """The J1 seen anti-join as a map_batches stage: drop
    robots-disallowed rows (vectorized _apply_robots; ``robots_ref`` is a
    broadcast {host: [disallow-prefixes]} built once per run — north
    rule: robots enforced in the frontier; unknown hosts pass), then
    rows whose url hash is in the sharded seen set. A stateless task,
    not an actor: client construction is trivial (actor handles), so
    plain tasks reuse warm worker processes with no per-round
    actor-pool spawn."""
    import ray

    def stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        robots = ray.get(robots_ref) if robots_ref is not None else {}
        batch = _apply_robots(batch, robots)
        if batch.num_rows == 0:
            return batch
        client = SeenSetClient(actors)
        hashes = url_hash64_batch(batch["url"].to_pylist())
        seen = client.contains_many(hashes)
        return batch.filter(pa.array(~seen))

    return stage


# process-level caches: compiled profiles and deserialized broadcast
# objects survive across rounds/executions inside each worker process
# (a python-dict broadcast is re-unpickled on EVERY ray.get — caching
# the built lookup per worker turns ~30 MB × n_tasks of deserialization
# into once-per-worker; the broadcast itself is an Arrow table, which
# plasma shares zero-copy)
_CP_CACHE: dict = {}
_BCAST_CACHE: dict = {}


def _cached_sel_map(sel_ref):
    """Per-worker deserialized view of the broadcast selected table:
    (column pylists, url → row index). Building column lists + one flat
    index dict is ~10× cheaper than materializing a dict-of-dicts per
    row, and the build runs once per worker per round."""
    import ray

    key = sel_ref.hex() if hasattr(sel_ref, "hex") else id(sel_ref)
    cached = _BCAST_CACHE.get(key)
    if cached is None:
        table = ray.get(sel_ref)
        cols = {name: table[name].to_pylist() for name in table.schema.names}
        # Prebuilt hash index for the vectorized membership probe: the
        # per-batch lookup must NOT rebuild a |selected|-sized hash table
        # per batch (pc.is_in(value_set=...) does exactly that — measured
        # +70% crawl wall at 512-row batches × 328k selected); a
        # pd.Index built ONCE per worker probes each batch in one
        # C-level get_indexer pass.
        sel_index = pd.Index(cols["url"])
        # get_indexer RAISES InvalidIndexError on a non-unique index; url
        # uniqueness is guaranteed by _dedup_sort inside the politeness
        # pick — assert the invariant here so a future politeness change
        # fails with a clear message instead of a deep pandas error
        assert sel_index.is_unique, (
            "selected-url broadcast must be unique (politeness _dedup_sort invariant)"
        )
        cached = (cols, sel_index)
        _BCAST_CACHE.clear()  # one live round at a time
        _BCAST_CACHE[key] = cached
    return cached


#: per-worker probe maps for the bucketed fetch, keyed by the round's
#: pb=N selected directory. Unlike _BCAST_CACHE (one live object per
#: round) a worker legitimately holds SEVERAL buckets' maps at once —
#: eviction drops entries of OTHER round directories on insert, bounding
#: the cache to one round's buckets. Per-worker memory is bounded by
#: (selected rows / n_page_buckets) × buckets-touched; operators raise
#: n_page_buckets with corpus size so a single bucket's map stays small.
_SELPB_CACHE: dict = {}


def _cached_sel_map_dir(sel_pb_dir: str):
    """Per-worker selected-url probe map for ONE page bucket, loaded from
    the round's co-partitioned selected parquet (the bucketed fetch
    path's analogue of _cached_sel_map — same (column pylists, url
    index) shape, sourced from shared storage instead of a plasma
    broadcast)."""
    cached = _SELPB_CACHE.get(sel_pb_dir)
    if cached is None:
        files = sorted(glob.glob(os.path.join(sel_pb_dir, "*.parquet")))
        tables = [pq.read_table(f) for f in files]
        table = pa.concat_tables(tables) if tables else None
        if table is None:
            cols: dict = {}
            sel_index = pd.Index([], dtype=object)
        else:
            cols = {name: table[name].to_pylist() for name in table.schema.names}
            sel_index = pd.Index(cols["url"])
            assert sel_index.is_unique, (
                "selected-url bucket shard must be unique (politeness "
                "_dedup_sort invariant)"
            )
        round_dir = os.path.dirname(sel_pb_dir.rstrip("/"))
        stale = [
            k for k in _SELPB_CACHE if os.path.dirname(k.rstrip("/")) != round_dir
        ]
        for k in stale:
            del _SELPB_CACHE[k]
        cached = (cols, sel_index)
        _SELPB_CACHE[sel_pb_dir] = cached
    return cached


def _compiled(profile: SiteProfile):
    from ..stages.profiles import CompiledProfile

    cp = _CP_CACHE.get(profile)
    if cp is None:
        cp = CompiledProfile(profile)
        _CP_CACHE[profile] = cp
    return cp


def make_fetch_extract(sel_ref, profile: SiteProfile, status_seed: int, now):
    """Fused fetch-match + extraction over the pages stream.

    One task stage: each pages batch probes the selected-row map,
    simulates the HTTP status, and extracts matching pages — eliminating
    the separate join materialization + actor-pool handoff. ``sel_ref``
    is either a plasma ObjectRef of the whole selected table (broadcast
    path) or a ``pb=N`` directory path of the round's co-partitioned
    selected parquet (bucketed fetch path — the stage then probes only
    its own bucket's slice, loaded once per worker)."""
    import ray

    def stage(batch: pa.Table) -> pa.Table:
        sel_cols, sel_index = (
            _cached_sel_map_dir(sel_ref)
            if isinstance(sel_ref, str)
            else _cached_sel_map(sel_ref)
        )
        return _probe_extract_table(
            batch["url"].to_pylist(), batch["html"], sel_cols, sel_index,
            profile, status_seed, now,
        )

    return stage


def _probe_extract_table(
    urls, html_col, sel_cols, sel_index, profile, status_seed, now
) -> pa.Table:
    """The fused fetch+extract kernel shared by the broadcast and
    bucketed paths. Vectorized membership probe against the worker-cached
    hash index: one C-level get_indexer pass per batch (pages ≫
    selected, so most rows miss and never reach the per-row extraction
    loop — extraction is inherently per-row Python, the probe is not)."""
    from .fetchsim import simulate_status as _status
    from ..stages.extract import ARTICLE_FIELDS, process_fetched_page

    cp = _compiled(profile)
    pos = sel_index.get_indexer(np.asarray(urls, dtype=object))
    out = {name: [] for name, _ in ARTICLE_FIELDS}
    for i in np.flatnonzero(pos >= 0).tolist():
        url = urls[i]
        ri = int(pos[i])
        row = {name: col[ri] for name, col in sel_cols.items()}
        status = _status(url, status_seed, is_hub=profile.is_hub(url))
        if status != 200:
            rec = {"state": STATE_ERROR, "links": [], "title": "", "text": "",
                   "unique_id": "", "pubdate": None, "raw_size": 0, "text_size": 0}
        else:
            rec = process_fetched_page(cp, url, html_col[i].as_py(), now=now)
        out["url"].append(url)
        out["host"].append(row["host"])
        out["unique_id"].append(rec["unique_id"])
        out["pubdate"].append(rec["pubdate"])
        out["title"].append(rec["title"])
        out["text"].append(rec["text"])
        out["module"].append(profile.name)
        out["state"].append(rec["state"])
        out["raw_size"].append(rec["raw_size"])
        out["text_size"].append(rec["text_size"])
        out["links"].append(rec["links"])
        out["keywords"].append(rec.get("keywords", []))
        out["authors"].append(rec.get("authors", []))
        out["industries"].append(rec.get("industries", []))
        out["pseq"].append(row["pseq"])
        out["lidx"].append(row["lidx"])
        out["depth"].append(row["depth"])
        out["order_in_host"].append(row["order_in_host"])
        out["status"].append(status)
        out["birth_round"].append(row["birth_round"])
        out["attempts"].append(row["attempts"])
    arrays = [pa.array(out[name], type=typ) for name, typ in ARTICLE_FIELDS]
    return pa.Table.from_arrays(arrays, schema=EXTRACT_SCHEMA)


def make_fetch_extract_bucketed(
    sel_dir: str, profile: SiteProfile, status_seed: int, now
):
    """Bucketed-fetch variant of the fused fetch+extract: ONE stage over
    the whole pruned pages read (same operator shape as the broadcast
    path — a per-bucket branch fan-out measured 2.3× slower: the
    streaming executor starves 30+ operators). Each batch carries the
    corpus's ``b`` mirror column; rows are grouped by it (a batch is
    usually a single bucket — blocks come from hive partition files) and
    probed against that bucket's worker-cached selected map."""

    def stage(batch: pa.Table) -> pa.Table:
        bvals = batch["b"].to_numpy()
        parts = []
        for b in np.unique(bvals):
            idx = np.nonzero(bvals == b)[0]
            sub = batch if len(idx) == len(bvals) else batch.take(pa.array(idx))
            sel_cols, sel_index = _cached_sel_map_dir(
                os.path.join(sel_dir, f"pb={int(b)}")
            )
            if len(sel_index) == 0:
                continue
            parts.append(
                _probe_extract_table(
                    sub["url"].to_pylist(), sub["html"], sel_cols, sel_index,
                    profile, status_seed, now,
                )
            )
        if not parts:
            return _empty_extract_table()
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)

    return stage


def make_fetch_extract_joined(profile: SiteProfile, status_seed: int, now):
    """Join-path variant of the fused fetch+extract: input rows come from
    ``selected LEFT OUTER JOIN pages ON url`` (html is NULL for urls with
    no page on "the web" → status-404 error rows), so no broadcast map
    and no driver-side missing-url bookkeeping is needed. Used when the
    selected set is too large to broadcast (see CrawlConfig.broadcast_limit)."""
    from ..stages.extract import PageExtractor

    def stage(batch: pa.Table) -> pa.Table:
        from .fetchsim import simulate_status as _status

        key = ("extractor", profile)
        ex = _CP_CACHE.get(key)
        if ex is None:
            ex = PageExtractor(profile, now=now)
            _CP_CACHE[key] = ex
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        status = pa.array(
            [
                404 if h is None else _status(u, status_seed, is_hub=profile.is_hub(u))
                for u, h in zip(urls, htmls)
            ],
            pa.int16(),
        )
        return ex(batch.append_column("status", status))

    return stage


def _missing_rows_table(sub: pa.Table, module: str) -> pa.Table:
    """status-404 extract rows for selected urls absent from the corpus.
    ``sub`` is the missing slice of the (Arrow) selected frontier table —
    carried columns are taken vectorized, the rest are constants."""
    from ..stages.extract import ARTICLE_FIELDS

    n = sub.num_rows
    const = {
        "unique_id": "", "pubdate": None, "title": "", "text": "",
        "module": module, "state": STATE_ERROR, "raw_size": 0,
        "text_size": 0, "links": None, "keywords": None, "authors": None,
        "industries": None, "status": 404,
    }
    empty_list = [[] for _ in range(n)]
    arrays = []
    for name, typ in ARTICLE_FIELDS:
        if name in sub.schema.names:
            arrays.append(sub[name].combine_chunks().cast(typ))
        elif name in ("links", "keywords", "authors", "industries"):
            arrays.append(pa.array(empty_list, type=typ))
        else:
            arrays.append(pa.array([const[name]] * n, type=typ))
    return pa.Table.from_arrays(arrays, schema=EXTRACT_SCHEMA)


def _empty_extract_table() -> pa.Table:
    return pa.Table.from_arrays(
        [pa.array([], f.type) for f in EXTRACT_SCHEMA], schema=EXTRACT_SCHEMA
    )


def make_selected_bucket_writer(sel_dir: str, n_page_buckets: int):
    """Co-partitioning write for the bucketed fetch: fans each politeness
    block's SELECTED rows into per-page-bucket parquet shards
    (pb = url_hash64 % n_page_buckets — the SAME function that bucketed
    the pages corpus), named by the block's content fingerprint so task
    retries overwrite idempotently. Output is a tiny per-(pb, kind)
    stats table: bucket/kind discovery AND per-bucket row counts come
    out of the same pass, so no separate aggregation execution runs.
    The selected frontier never lands on the driver — only these counts
    do (≤ n_page_buckets × n_kinds rows per block)."""
    import hashlib

    empty = pa.table(
        {
            "pb": pa.array([], pa.int64()),
            "kind": pa.array([], pa.int64()),
            "rows": pa.array([], pa.int64()),
        }
    )

    def stage(batch: pa.Table) -> pa.Table:
        sel = batch.filter(batch["selected"]).drop_columns(
            ["selected"]
        ) if "selected" in batch.schema.names else batch
        if sel.num_rows == 0:
            return empty
        urls = sel["url"].to_pylist()
        pb = (url_hash64_batch(urls) % np.uint64(n_page_buckets)).astype(np.int64)
        kinds = url_kind_batch(urls).astype(np.int64)
        fp = hashlib.sha1("\n".join(urls).encode("utf-8")).hexdigest()[:16]
        for b in np.unique(pb):
            sub = sel.take(pa.array(np.nonzero(pb == b)[0]))
            d = os.path.join(sel_dir, f"pb={int(b)}")
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"part-{fp}.parquet")
            tmp = path + f".tmp-{os.getpid()}"
            pq.write_table(sub, tmp)
            os.replace(tmp, path)
        key = pb * np.int64(64) + kinds  # kind values are tiny (<64)
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table(
            {
                "pb": pa.array(uniq // 64),
                "kind": pa.array(uniq % 64),
                "rows": pa.array(counts.astype(np.int64)),
            }
        )

    return stage


def make_bucket_missing(sel_dir: str, pages_path: str, kinds, module: str):
    """One task per page bucket: emits status-404 extract rows for
    selected urls with no page in the corpus ("the web"). The anti-join
    runs INSIDE the bucket — the task loads its bucket's selected shard
    (small) plus only the url COLUMN of its pages partition, so per-task
    work stays bounded by bucket size however large the frontier is
    (raise n_page_buckets with corpus scale)."""
    kinds = sorted(int(k) for k in kinds)

    def stage(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch["pb"].to_pylist():
            pb_dir = os.path.join(sel_dir, f"pb={int(b)}")
            files = sorted(glob.glob(os.path.join(pb_dir, "*.parquet")))
            if not files:
                continue
            sel = pa.concat_tables([pq.read_table(f) for f in files])
            page_files = [
                f
                for f in _pruned_dirs(pages_path, kinds, [int(b)])
                if os.path.isfile(f)
            ]
            if page_files:
                url_set = pa.chunked_array(
                    [
                        pq.read_table(f, columns=["url"])["url"].combine_chunks()
                        for f in page_files
                    ]
                )
                mask = pc.invert(
                    pc.is_in(sel["url"].combine_chunks(), value_set=url_set)
                )
                sub = sel.filter(mask)
            else:
                sub = sel  # bucket absent from the corpus: all missing
            if sub.num_rows:
                out.append(_missing_rows_table(sub, module))
        return pa.concat_tables(out) if out else _empty_extract_table()

    return stage


# ---------------------------------------------------------------------------
# the fused round sink: write + mark-seen + metrics + link explode in ONE
# consumer execution of the extract stream
# ---------------------------------------------------------------------------


class _RoundCollector:
    """Tiny per-round actor accumulating (a) per-batch metric partials,
    (b) the matched url lists (broadcast path's missing-url detection),
    and (c) the politeness pass's selected rows — so the selected set
    reaches the driver DURING the politeness execution instead of via a
    separate filter+collect execution per round. Entries are keyed by
    the batch's content fingerprint, so Ray task retries overwrite
    rather than double-count. Selected storage is capped: past
    ``sel_cap`` rows the tables are dropped and overflow is flagged —
    the round then switches to the distributed join path and the driver
    never holds an over-limit frontier."""

    def __init__(self, sel_cap: int = 1 << 62):
        self.metrics: dict = {}
        self.matched: dict = {}
        self.selected: dict = {}
        self.sel_cap = sel_cap
        self.sel_rows_total = 0
        self.overflow = False

    def add(self, fp: str, metrics_df, url_arr) -> bool:
        # url_arr: the block's matched-url Arrow array, BY VALUE in a
        # 1-element list. Per-batch payloads are ~40 KB — under Ray's
        # 100 KB inline threshold, so they ride inside the actor call
        # with no plasma round-trip at all (a per-batch ray.put here
        # measured +12 s/run of object-store churn; refs only pay off
        # for the big selected tables, see add_selected).
        self.metrics[fp] = metrics_df
        self.matched[fp] = url_arr
        return True

    def add_selected(self, fp: str, num_rows: int, table_ref) -> bool:
        if self.overflow:
            return True
        if fp not in self.selected:
            self.sel_rows_total += num_rows
        self.selected[fp] = table_ref  # [ObjectRef], never deserialized here
        if self.sel_rows_total > self.sel_cap:
            self.selected = {}
            self.overflow = True
        return True

    def selected_result(self):
        return (None, True) if self.overflow else (list(self.selected.values()), False)

    def results(self):
        return list(self.metrics.values()), list(self.matched.values())


def make_selected_reporter(collector):
    """Pass-through stage after the politeness split: ships each block's
    SELECTED rows to the round collector (fingerprint-keyed, retry-safe)
    while the split stream continues to the materialize — the selected
    set costs no extra dataset execution."""
    import hashlib

    def stage(batch: pa.Table) -> pa.Table:
        import ray

        sel = batch.filter(batch["selected"])
        if sel.num_rows:
            fp = hashlib.sha1("\n".join(sel["url"].to_pylist()).encode("utf-8")).hexdigest()[:16]
            # ship a plasma REF (acked, retry-safe): the selected rows
            # are written to the object store once here and read
            # zero-copy by the driver — not serialized through the
            # collector actor
            ref = ray.put(sel.drop_columns(["selected"]))
            ray.get(collector.add_selected.remote(fp, sel.num_rows, [ref]))
        return batch

    return stage


def _partial_metrics_df(batch: pa.Table, parts: int) -> pd.DataFrame:
    """Per-(url-hash-partition, host) partial aggregates for one batch."""
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
    return (
        df.groupby(["partition", "host"])
        .agg(
            fetched=("state", "size"),
            errors_permanent=("state", lambda s: int((s == STATE_ERROR).sum())),
            articles_out=("state", lambda s: int((s == STATE_ARTICLE).sum())),
            bytes_html=("raw_size", "sum"),
        )
        .reset_index()
    )


def make_sink_stage(
    actors, collector, fetched_dir: str, r: int, parts: int, max_attempts: int
):
    """ONE consumer stage over the extract stream that per block:
      1. writes the block (minus links) as a parquet shard — filename is
         the block's content fingerprint, so task retries overwrite
         idempotently instead of duplicating rows;
      2. marks the fetched urls seen (idempotent shard-actor RPCs) —
         EXCEPT transient-status rows still under the attempt cap, which
         re-enter the frontier with attempts+1 instead (the reference's
         pending_urls re-attempt semantics, session_hist.py:114);
      3. ships a per-(partition, host) metric partial + the matched url
         list to the round collector (fingerprint-keyed, retry-safe);
      4. emits the exploded link rows PLUS the transient-retry rows
         (FRONTIER_SCHEMA) as its output — the next frontier's
         "born this round" stream.
    Folding what were four separate dataset executions (write, mark,
    metrics, explode) into the single fetch+extract execution."""
    import hashlib

    from .fetchsim import TRANSIENT_STATUSES

    transient_list = sorted(TRANSIENT_STATUSES)

    def stage(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {n: pa.array([], FRONTIER_SCHEMA.field(n).type) for n in FRONTIER_SCHEMA.names}
        )
        if batch.num_rows == 0:
            return empty
        import ray

        urls = batch["url"].to_pylist()
        fp = hashlib.sha1("\n".join(urls).encode("utf-8")).hexdigest()[:16]

        # 1. parquet shard (atomic, deterministic name)
        path = os.path.join(fetched_dir, f"part-{fp}.parquet")
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(batch.drop_columns(["links"]), tmp)
        os.replace(tmp, path)

        # 2. seen marking — transient rows under the attempt cap stay
        #    UNSEEN so the next round can re-fetch them
        states = batch["state"].to_numpy()
        statuses = batch["status"].to_numpy()
        attempts = batch["attempts"].to_numpy()
        retryable = np.isin(statuses, transient_list) & (attempts + 1 <= max_attempts)
        keep = ~retryable
        if keep.any():
            kept_urls = [u for u, k in zip(urls, keep) if k]
            SeenSetClient(actors).add_many(
                url_hash64_batch(kept_urls), kept_urls, states[keep], r
            )

        # 3. metrics + matched urls (block until the actor records them —
        #    the driver reads the collector right after the execution;
        #    the ~40 KB per-batch url array rides INLINE in the actor
        #    call — a per-batch ray.put measured +12 s/run of plasma
        #    churn; refs are reserved for the big selected tables)
        ray.get(
            collector.add.remote(
                fp, _partial_metrics_df(batch, parts), [batch["url"].combine_chunks()]
            )
        )

        # 4. link explode + transient retries → next-round frontier rows
        #    (Arrow list kernels end to end — a per-link Python loop here
        #    costs seconds per round at millions of discovered links)
        la = batch["links"].combine_chunks()
        flat = pc.list_flatten(la)
        parent = pc.list_parent_indices(la).to_numpy().astype(np.int64)
        lens = pc.list_value_length(la).fill_null(0).to_numpy().astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(lens)))
        lidx = np.arange(len(flat), dtype=np.int64) - np.repeat(offsets[:-1], lens)
        url_l = pc.utf8_lower(flat)
        exploded = pa.table(
            {
                "url": url_l,
                "host": host_arrow(url_l),
                "birth_round": pa.array(
                    np.full(len(flat), r + 1, dtype=np.int32), pa.int32()
                ),
                "pseq": pa.array(
                    batch["order_in_host"].to_numpy().astype(np.int64)[parent]
                ),
                "lidx": pa.array(lidx),
                "depth": pa.array(
                    batch["depth"].to_numpy().astype(np.int32)[parent] + 1, pa.int32()
                ),
                "attempts": pa.array(np.zeros(len(flat), dtype=np.int32), pa.int32()),
            },
            schema=FRONTIER_SCHEMA,
        )
        if retryable.any():
            # keep the ORIGINAL order key → the retry sorts ahead of
            # younger urls in the next round's per-host FIFO
            idx = pa.array(np.nonzero(retryable)[0])
            retry = batch.select(FRONTIER_SCHEMA.names).take(idx)
            att = pc.add(retry["attempts"], 1).cast(pa.int32())
            retry = retry.set_column(
                retry.schema.get_field_index("attempts"), "attempts", att
            ).cast(FRONTIER_SCHEMA)
            return pa.concat_tables([exploded, retry])
        return exploded

    return stage


# ---------------------------------------------------------------------------
# round loop
# ---------------------------------------------------------------------------


def _pruned_bytes(pages_path: str, kinds, buckets) -> int:
    """On-disk bytes of the (kind, bucket) partitions a fetch will read —
    filesystem metadata only, used to size execution block targets."""
    total = 0
    for f in _pruned_dirs(pages_path, kinds, buckets):
        if os.path.isfile(f):  # fallback returns the corpus root dir
            try:
                total += os.path.getsize(f)
            except OSError:
                pass
    return total


def _pruned_dirs(pages_path: str, kinds, buckets) -> list:
    """Partition directories a (kind, bucket) selection touches. Passing
    these as the read paths (instead of the corpus root) keeps the read's
    file listing AND task count proportional to the pruned set — reading
    the root schedules one task per corpus file even when the filter
    empties most of them, a driver-side cost independent of cluster
    size. Falls back to the root for non-hive layouts. The in-file
    ``b``/``k`` mirror columns keep the row filter valid without the
    hive-inferred partition columns."""
    files = []
    for k in kinds:
        for b in buckets:
            d = os.path.join(pages_path, f"kind={int(k)}", f"bucket={int(b)}")
            if os.path.isdir(d):
                files.extend(
                    os.path.join(d, n)
                    for n in sorted(os.listdir(d))
                    if n.endswith(".parquet")
                )
    return files if files else [pages_path]


def _frontier_from_rows(rows):
    import ray.data

    cols = {name: [r[name] for r in rows] for name in FRONTIER_SCHEMA.names}
    table = pa.table(
        {n: pa.array(cols[n], FRONTIER_SCHEMA.field(n).type) for n in FRONTIER_SCHEMA.names}
    )
    return ray.data.from_arrow(table)


def _manifest_path(cfg: CrawlConfig, r: int) -> str:
    return os.path.join(cfg.checkpoint_dir, "manifest", f"round={r}.json")


# ---------------------------------------------------------------------------
# cooperative shutdown + pid lock (reference queue_manager.py:722-778
# GracefulShutdownHandler / scraper_app.py:256-280 pid lock /
# scraper_app.py:293-427 max_runtime — re-expressed for a round-based
# engine: stops land on ROUND boundaries, where the manifest-last
# checkpoint makes them free)
# ---------------------------------------------------------------------------


def stop_file_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "STOP")


def request_stop(checkpoint_dir: str, reason: str = "requested") -> str:
    """Ask a (possibly remote-process) crawl on this checkpoint to end
    after its current round. Idempotent; the file persists until
    clear_stop so an accidental resume cannot blow past an operator's
    stop. Wire it to SIGTERM with install_stop_signal_handler."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = stop_file_path(checkpoint_dir)
    with open(path, "w", encoding="utf-8") as fp:
        fp.write(reason)
    return path


def clear_stop(checkpoint_dir: str) -> None:
    try:
        os.remove(stop_file_path(checkpoint_dir))
    except FileNotFoundError:
        pass


def install_stop_signal_handler(checkpoint_dir: str, signals=None):
    """Route SIGTERM/SIGINT to request_stop so a kill ends the run at
    the next round boundary with a clean manifest instead of wasting the
    round. Main-thread only (signal module constraint); returns the
    previous handlers for restoration."""
    import signal as _signal

    sigs = signals if signals is not None else (_signal.SIGTERM, _signal.SIGINT)
    prev = {}
    for s in sigs:
        prev[s] = _signal.signal(
            s, lambda signum, frame: request_stop(checkpoint_dir, f"signal {signum}")
        )
    return prev


class _PidLock:
    """{checkpoint}/LOCK.pid: one live crawl per checkpoint dir."""

    def __init__(self, checkpoint_dir: str):
        self.path = os.path.join(checkpoint_dir, "LOCK.pid")

    def acquire(self) -> None:
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        try:
            with open(self.path, encoding="utf-8") as fp:
                holder = int(fp.read().strip() or 0)
        except (FileNotFoundError, ValueError):
            holder = 0
        if holder and holder != os.getpid():
            try:
                os.kill(holder, 0)  # probe only: is the holder alive?
            except (ProcessLookupError, PermissionError):
                holder = 0  # stale lock from a dead run — reclaim
            if holder:
                raise RuntimeError(
                    f"checkpoint {os.path.dirname(self.path)} is locked by "
                    f"live pid {holder} (LOCK.pid); a second concurrent "
                    "crawl on one checkpoint would corrupt rounds"
                )
        with open(self.path, "w", encoding="utf-8") as fp:
            fp.write(str(os.getpid()))

    def release(self) -> None:
        try:
            os.remove(self.path)
        except FileNotFoundError:
            pass


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
        self.robots_ref = None  # set in run(): broadcast {host: prefixes}
        self.robots_dir = None  # set in run(): bucketed robots side table
        self._prev_block_target = None  # DataContext restore slot
        # the bucketed fetch co-partitions against the corpus's
        # kind=*/bucket=* hive layout; without it, over-limit rounds fall
        # back to the acero hash join
        self._pages_hive = bool(
            glob.glob(os.path.join(pages_path, "kind=*", "bucket=*"))
        )

    def _tune_block_target(self, kinds, buckets) -> None:
        """Scale the execution's target block size to the PRUNED read.

        Ray Data bundles map-task inputs up to target_max_block_size, so
        a small pruned read (the hub-seed round: tens of MB of link-farm
        pages, ~7 ms extract cost per page) collapses into a handful of
        fat tasks whose longest member is the round's wall time at ANY
        cluster size. Sizing the target so the read fans out to ~3 tasks
        per CPU keeps small rounds parallel; big rounds keep the default.
        Restored after the round's execution (_restore_block_target)."""
        import ray
        from ray.data import DataContext

        ctx = DataContext.get_current()
        if self._prev_block_target is None:
            self._prev_block_target = ctx.target_max_block_size
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        disk = _pruned_bytes(self.pages_path, kinds, buckets)
        if disk <= 0:
            return
        mem_est = disk * 4  # decompression / Arrow expansion factor
        tgt = max(2 << 20, mem_est // (3 * n_cpus))
        ctx.target_max_block_size = int(min(self._prev_block_target, tgt))

    def _restore_block_target(self) -> None:
        if self._prev_block_target is not None:
            from ray.data import DataContext

            DataContext.get_current().target_max_block_size = self._prev_block_target

    def _load_robots(self):
        """Fetch robots.txt bodies from the corpus (out-of-band prologue
        — the reference's robotparser fetch is likewise outside the
        politeness budget).

        Default (bucketed frontier): parse + write a parquet side table
        ``{checkpoint}/robots/fb=N`` hive-bucketed by the SAME
        fb = hash(host) % frontier_buckets as the frontier, fully
        distributed — the driver never holds a host→prefixes dict, so
        robots state scales to 10^7 hosts (each bucketed-politeness
        task reads only its own slice). Legacy shuffle/salted paths
        keep the broadcast dict (their tasks aren't bucket-aligned)."""
        import ray
        import ray.data

        from ..functions.robotskit import parse_robots

        cfg = self.cfg
        # kind pruning: robots bodies live in their own (tiny) partition —
        # without the k filter this prologue scans the whole corpus
        all_buckets = list(range(cfg.n_page_buckets))
        pages = ray.data.read_parquet(
            _pruned_dirs(self.pages_path, [KIND_ROBOTS], all_buckets),
            columns=["url", "html"],
            filter=(pc.field("k") == KIND_ROBOTS),
        )
        bucketed = cfg.frontier_buckets > 1 and cfg.politeness_salt_k <= 1
        if bucketed:
            fb_n = cfg.frontier_buckets

            def to_rows(batch: pa.Table) -> pa.Table:
                hosts = [get_host(u) for u in batch["url"].to_pylist()]
                prefixes = [
                    parse_robots(
                        h.decode("utf-8", "replace")
                        if isinstance(h, bytes)
                        else (h or "")
                    )
                    for h in batch["html"].to_pylist()
                ]
                fb = _frontier_fb(np.asarray(hosts, dtype=object), fb_n)
                return pa.table(
                    {
                        "host": pa.array(hosts, pa.string()),
                        "prefixes": pa.array(prefixes, pa.list_(pa.string())),
                        "fb": pa.array(fb),
                    }
                )

            robots_dir = os.path.join(cfg.checkpoint_dir, "robots")
            # rmtree BEFORE rewrite is load-bearing, not just cleanup:
            # _robots_bucket_map keys its per-worker cache generation on
            # this directory's root mtime, which only changes because the
            # directory is recreated here. Replacing this with an
            # in-place rewrite of fb=N files would leave warm workers
            # serving the previous corpus's robots rules.
            shutil.rmtree(robots_dir, ignore_errors=True)
            pages.map_batches(to_rows, batch_format="pyarrow").write_parquet(
                robots_dir, partition_cols=["fb"]
            )
            self.robots_dir = robots_dir
            self.robots_ref = None
            return None

        robots = {}
        for row in collect_rows(pages):
            host = get_host(row["url"])
            body = row["html"].decode("utf-8") if row["html"] is not None else ""
            robots[host] = parse_robots(body)
        self.robots_ref = ray.put(robots)
        return robots

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
        fb_n = self.cfg.frontier_buckets
        if fb_n > 1 and self.cfg.politeness_salt_k <= 1:
            # hive-partition by host bucket: each sink task fans its
            # block into per-fb files locally (no shuffle), and the next
            # round's politeness reads per-directory with no shuffle
            ds = ds.map_batches(
                lambda t: t.append_column(
                    "fb",
                    pa.array(
                        _frontier_fb(np.asarray(t["host"].to_pylist()), fb_n)
                    ),
                ),
                batch_format="pyarrow",
            )
            ds.write_parquet(path, partition_cols=["fb"])
        else:
            ds.write_parquet(path)
        # the executed handle (not the caller's pre-derivation one) is
        # what carries stats() after the write — kept for CRAWL_STAGE_STATS
        self._last_written = ds

    def _read_frontier(self, r: int):
        import ray.data

        # select_columns drops the spurious `round` hive-partition column
        # the round=N directory name would otherwise inject
        return ray.data.read_parquet(_frontier_dir(self.cfg, r)).select_columns(
            FRONTIER_SCHEMA.names
        )

    def _stop_reason(self, t_start: float):
        """Round-boundary cooperative-shutdown probe: the operator's
        STOP file or an exhausted max_runtime budget (both leave the
        finished rounds' manifests intact — resume continues from the
        next round)."""
        path = stop_file_path(self.cfg.checkpoint_dir)
        if os.path.exists(path):
            try:
                with open(path, encoding="utf-8") as fp:
                    return f"stop file: {fp.read().strip() or 'requested'}"
            except OSError:
                return "stop file"
        if self.cfg.max_runtime_sec > 0 and time.time() - t_start >= self.cfg.max_runtime_sec:
            return f"max_runtime {self.cfg.max_runtime_sec}s exhausted"
        return None

    # -- the round ------------------------------------------------------
    def run(self) -> dict:
        cfg = self.cfg
        os.makedirs(os.path.join(cfg.checkpoint_dir, "manifest"), exist_ok=True)
        lock = _PidLock(cfg.checkpoint_dir) if cfg.pid_lock else None
        if lock is not None:
            lock.acquire()
        try:
            return self._run_locked()
        finally:
            if lock is not None:
                lock.release()

    def _run_locked(self) -> dict:
        cfg = self.cfg
        t_start = time.time()

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

        self._load_robots()
        summary = {"rounds": [], "resumed_at": last_done + 1, "seen_restored": restored}
        for r in range(cfg.rounds):
            if r <= last_done:
                summary["rounds"].append({"round": r, "skipped": True})
                continue
            reason = self._stop_reason(t_start)
            if reason is not None:
                summary["stopped_early"] = {"before_round": r, "reason": reason}
                break
            summary["rounds"].append(self._run_round(r))
        summary["seen_total"] = self.client.total_size()
        return summary

    def _run_round(self, r: int) -> dict:
        import shutil

        import ray
        import ray.data

        cfg = self.cfg
        t0 = time.time()
        stage_sec = {}

        def _mark(name, since=[t0]):
            now = time.time()
            stage_sec[name] = round(now - since[0], 3)
            since[0] = now

        # wipe stale outputs of a crashed prior attempt of this round
        # (manifest-last: no manifest ⇒ the round's files are garbage)
        fetched_dir = os.path.join(cfg.checkpoint_dir, "fetched", f"round={r}")
        shutil.rmtree(fetched_dir, ignore_errors=True)
        os.makedirs(fetched_dir, exist_ok=True)
        shutil.rmtree(_frontier_dir(cfg, r + 1), ignore_errors=True)

        # Execution 1 — politeness: seen/robots filter feeding the fused
        # dedup + politeness split (selected AND deferred rows together);
        # a pass-through reporter ships each block's selected rows to the
        # round collector IN the same execution (capped at
        # broadcast_limit — an over-limit frontier never lands on the
        # driver); materialized once (frozen before this round's fetches
        # mutate the seen set). With a bucketed frontier
        # (frontier_buckets > 1) this execution is SHUFFLE-FREE: one
        # task per fb directory runs load → filter → exact pick; the
        # legacy path is ONE host-keyed shuffle.
        collector = ray.remote(num_cpus=0)(_RoundCollector).remote(cfg.broadcast_limit)
        fb_dirs = (
            sorted(glob.glob(os.path.join(_frontier_dir(cfg, r), "fb=*")))
            if cfg.frontier_buckets > 1 and cfg.politeness_salt_k <= 1
            else []
        )
        if fb_dirs:
            core = ray.data.from_items(
                [{"path": d} for d in fb_dirs], override_num_blocks=len(fb_dirs)
            ).map_batches(
                make_bucketed_politeness(
                    self.actors, self.robots_ref,
                    cfg.per_host_budget, cfg.max_pending_attempts,
                    robots_dir=self.robots_dir,
                ),
                batch_format="pyarrow",
                batch_size=1,
            )
        elif cfg.frontier_buckets > 1 and cfg.politeness_salt_k <= 1 and not os.path.isdir(
            _frontier_dir(cfg, r)
        ):
            core = ray.data.from_arrow(_empty_politeness_table())
        else:
            frontier = self._read_frontier(r)
            unseen = frontier.map_batches(
                make_seen_filter(self.actors, self.robots_ref), batch_format="pyarrow"
            )
            split_fn = (
                (lambda ds: politeness_split_salted(
                    ds, cfg.per_host_budget, cfg.max_pending_attempts, cfg.politeness_salt_k))
                if cfg.politeness_salt_k > 1
                else (lambda ds: politeness_split(
                    ds, cfg.per_host_budget, cfg.max_pending_attempts))
            )
            core = split_fn(unseen)
        split = (
            core
            .map_batches(
                make_selected_reporter(collector), batch_format="pyarrow", batch_size=None
            )
            .materialize()
        )
        _mark("politeness")

        deferred = split.map_batches(
            lambda t: t.filter(pc.invert(t["selected"])).drop_columns(
                ["selected", "order_in_host"]
            ),
            batch_format="pyarrow",
        )

        sel_ref_lists, overflow = ray.get(collector.selected_result.remote())
        broadcast = not overflow
        selected_tbl = None
        sel_dir = None  # set by the bucketed fetch; cleaned post-round

        if broadcast:
            # zero-copy plasma reads of the politeness tasks' refs.
            # Fault note: these objects are owned by the (reusable) map
            # workers that put() them — a worker dying between the
            # politeness barrier and this get raises OwnerDiedError and
            # fails the round, which is recovered by the manifest-last
            # resume (the round re-runs from its frontier; nothing was
            # committed). Serializing the tables through the collector
            # actor would survive worker death but re-copies the whole
            # selected set per round — resume is the cheaper contract.
            sel_tables = ray.get([rl[0] for rl in sel_ref_lists]) if sel_ref_lists else []
            selected_tbl = (
                pa.concat_tables(sel_tables)
                if sel_tables
                else pa.Table.from_arrays(
                    [pa.array([], FRONTIER_SCHEMA.field(n).type) for n in FRONTIER_SCHEMA.names]
                    + [pa.array([], pa.int64())],
                    names=list(FRONTIER_SCHEMA.names) + ["order_in_host"],
                )
            )
            sel_count = selected_tbl.num_rows
            # urls stay Arrow/numpy on the driver; the full selected
            # table is a plasma-shared broadcast (workers build their
            # lookup once per process)
            sel_url_arr = selected_tbl["url"].combine_chunks()
            sel_urls_np = sel_url_arr.to_numpy(zero_copy_only=False)
            sel_ref = ray.put(selected_tbl)
            # bucket pruning only prunes when few of the n_page_buckets
            # are hit; past ~50 urls/bucket every bucket is hit w.h.p.,
            # so skip the per-url blake2b loop and use the (always
            # correct) superset — a fixed driver cost that grew with the
            # selected count and bought nothing
            if sel_count > 50 * cfg.n_page_buckets:
                buckets = list(range(cfg.n_page_buckets))
            elif sel_count:
                buckets = (
                    np.unique(
                        url_hash64_batch(sel_urls_np) % np.uint64(cfg.n_page_buckets)
                    ).astype(np.int64).tolist()
                )
            else:
                buckets = []
            # kind pruning: a hub-only round (the seed round) or an
            # article-only round reads just its own corpus partition —
            # url-hash buckets can't prune a spread selection, kind can
            kinds = np.unique(url_kind_batch(sel_urls_np)).tolist() if sel_count else []
            self._tune_block_target(kinds, buckets)
            pages = ray.data.read_parquet(
                _pruned_dirs(self.pages_path, kinds, buckets),
                columns=["url", "html"],
                filter=pc.field("b").isin(buckets) & pc.field("k").isin(kinds),
            )
            # batch size adapts to the selected count: a small round (the
            # hub-seed round especially — link-farm pages are ~100x the
            # extract cost of an article) must still fan out across the
            # cluster, not coalesce into a handful of fat batches whose
            # longest task IS the round's wall time
            n_cpus = int(ray.cluster_resources().get("CPU", 8))
            eb = max(8, min(cfg.extract_batch_size, sel_count // (4 * n_cpus) or 8))
            extracted = pages.map_batches(
                make_fetch_extract(sel_ref, cfg.profile, cfg.status_seed, REFERENCE_NOW),
                batch_format="pyarrow",
                batch_size=eb,
            )
        elif cfg.fetch_join == "bucket" and self._pages_hive:
            # Bucketed co-partitioned fetch (the 100×-scale path): the
            # selected frontier is written per page-bucket (pb =
            # url_hash64 % n_page_buckets, the SAME function that
            # bucketed the corpus), then each bucket fetches as an
            # independent probe branch over ONLY its pages partition —
            # the html payload (~99% of round bytes) is never shuffled
            # and the driver only ever holds per-bucket row counts.
            # Measured 4.1× faster than the acero hash join at the
            # 12.8M-page bench workload (BASELINE.md round 5).
            sel_dir = os.path.join(cfg.checkpoint_dir, "selected", f"round={r}")
            shutil.rmtree(sel_dir, ignore_errors=True)
            stats = collect_table(
                split.map_batches(
                    make_selected_bucket_writer(sel_dir, cfg.n_page_buckets),
                    batch_format="pyarrow",
                )
            )
            per_pb: dict = {}
            for b, n in zip(stats["pb"].to_pylist(), stats["rows"].to_pylist()):
                per_pb[b] = per_pb.get(b, 0) + n
            buckets = sorted(per_pb)
            kinds = sorted({int(k) for k in stats["kind"].to_pylist()})
            sel_count = int(sum(per_pb.values()))
            self._tune_block_target(kinds, buckets)
            n_cpus = int(ray.cluster_resources().get("CPU", 8))
            branches = []
            page_files = [
                f
                for f in _pruned_dirs(self.pages_path, kinds, buckets)
                if os.path.isfile(f)
            ]
            if page_files:
                # ONE read + ONE probe stage over every selected bucket
                # (the b mirror column routes each batch's rows to its
                # bucket's probe map inside the stage) — same operator
                # shape and adaptive batch size as the broadcast path
                pages = ray.data.read_parquet(
                    page_files,
                    columns=["url", "html", "b"],
                    filter=pc.field("b").isin(buckets) & pc.field("k").isin(kinds),
                )
                eb = max(
                    8, min(cfg.extract_batch_size, sel_count // (4 * n_cpus) or 8)
                )
                branches.append(
                    pages.map_batches(
                        make_fetch_extract_bucketed(
                            sel_dir, cfg.profile, cfg.status_seed, REFERENCE_NOW
                        ),
                        batch_format="pyarrow",
                        batch_size=eb,
                    )
                )
            # the missing-url anti-join runs as its OWN tiny execution
            # AFTER the round body (see below) — keeping it out of the
            # union keeps the round body at the broadcast path's operator
            # count (the streaming executor reserves resources PER
            # operator, and an extra side branch starves the hot probe
            # operator at low CPU counts)
            extracted = (
                branches[0]
                if branches
                else ray.data.from_arrow(_empty_extract_table())
            )
        else:
            # hash-join path: the selected frontier stays distributed.
            # Bucket pruning still applies — the distinct bucket set is
            # tiny (≤ n_page_buckets) however large the frontier.
            selected = split.map_batches(
                lambda t: t.filter(t["selected"]).drop_columns(["selected"]),
                batch_format="pyarrow",
            )
            n_buckets = cfg.n_page_buckets

            def batch_buckets(t: pa.Table) -> pa.Table:
                urls = t["url"].to_pylist()
                b = np.unique(url_hash64_batch(urls) % np.uint64(n_buckets))
                k = np.unique(url_kind_batch(urls))
                n = max(len(b), len(k))
                return pa.table({
                    "b": pa.array(
                        np.pad(b.astype(np.int64), (0, n - len(b)), mode="edge")
                    ),
                    "k": pa.array(np.pad(k, (0, n - len(k)), mode="edge")),
                })

            bk = collect_table(
                selected.map_batches(batch_buckets, batch_format="pyarrow")
            )
            buckets = sorted(set(bk["b"].to_pylist()))
            kinds = sorted(set(bk["k"].to_pylist()))
            self._tune_block_target(kinds, buckets)
            pages = ray.data.read_parquet(
                _pruned_dirs(self.pages_path, kinds, buckets),
                columns=["url", "html"],
                filter=pc.field("b").isin(buckets) & pc.field("k").isin(kinds),
            )
            joined = selected.join(
                pages,
                join_type="left_outer",
                num_partitions=cfg.join_partitions,
                on=("url",),
            )
            extracted = joined.map_batches(
                make_fetch_extract_joined(cfg.profile, cfg.status_seed, REFERENCE_NOW),
                batch_format="pyarrow",
                batch_size=cfg.extract_batch_size,
            )
            sel_count = None  # derived from metric partials below
        _mark("select")

        # Execution 2 — the fused round body: pages stream → fetch+extract
        # → sink (parquet shard + seen-mark + metrics partial + link
        # explode) → union deferred → next-frontier parquet. ONE streaming
        # execution end to end.
        links = extracted.map_batches(
            make_sink_stage(
                self.actors, collector, fetched_dir, r,
                cfg.metrics_partitions, cfg.max_pending_attempts,
            ),
            batch_format="pyarrow",
            batch_size=None,
        )
        next_frontier = deferred.select_columns(FRONTIER_SCHEMA.names).union(
            links.select_columns(FRONTIER_SCHEMA.names)
        )
        try:
            self._write_frontier(next_frontier, r + 1)
        finally:
            self._restore_block_target()
        if os.environ.get("CRAWL_STAGE_STATS"):
            # post-execution operator wall-times of the fused round body
            # (diagnostic only — stats() on the consumed plan is free)
            import sys as _sys

            print(
                f"\n===== round {r} fetch_extract_sink stats =====\n"
                + getattr(self, "_last_written", next_frontier).stats(),
                file=_sys.stderr,
            )
        _mark("fetch_extract_sink")

        if sel_dir is not None and buckets:
            # bucketed path: per-bucket anti-join (selected urls with no
            # page on "the web" → status-404 rows) pushed through the
            # SAME sink stage (shard write + seen mark + metrics
            # partial + empty links) as its own tiny n_buckets-task
            # execution AFTER the round body — inside the body's union
            # it inflated the operator count and starved the probe
            # operator's resource budget at low CPU counts
            ray.data.from_items(
                [{"pb": int(b)} for b in buckets],
                override_num_blocks=len(buckets),
            ).map_batches(
                make_bucket_missing(
                    sel_dir, self.pages_path, kinds, cfg.profile.name
                ),
                batch_format="pyarrow",
                batch_size=1,
            ).map_batches(
                make_sink_stage(
                    self.actors, collector, fetched_dir, r,
                    cfg.metrics_partitions, cfg.max_pending_attempts,
                ),
                batch_format="pyarrow",
                batch_size=None,
            ).materialize()

        partials, matched_lists = ray.get(collector.results.remote())
        if broadcast:
            # selected urls with no page on "the web" → status-404 rows,
            # handled entirely driver-side (they produce no links).
            # Arrow is_in instead of a Python set + listcomp — the old
            # form was ~0.5 s of driver time per round at 500k selections
            matched_arrays = [
                a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                for rl in matched_lists
                for a in rl
            ]
            matched_set = (
                pa.concat_arrays(matched_arrays)
                if matched_arrays
                else pa.array([], pa.string())
            )
            missing_mask = pc.invert(pc.is_in(sel_url_arr, value_set=matched_set))
            missing = sel_url_arr.filter(missing_mask).to_pylist()
            if missing:
                sub = selected_tbl.filter(missing_mask)
                tbl = _missing_rows_table(sub, cfg.profile.name)
                pq.write_table(
                    tbl.drop_columns(["links"]),
                    os.path.join(fetched_dir, "part-missing.parquet"),
                )
                self.client.add_many(
                    url_hash64_batch(missing), missing, tbl["state"].to_numpy(), r
                )
                partials.append(_partial_metrics_df(tbl, cfg.metrics_partitions))
        elif sel_count is None:  # hash-join path: derive from partials
            sel_count = int(sum(p["fetched"].sum() for p in partials)) if partials else 0
        _mark("missing")

        # lineage metrics roll-up (driver-side over the tiny partials),
        # seen snapshots, then manifest (LAST — presence ⇒ round complete)
        n_articles, n_errors = self._finalize_metrics(partials, r, time.time() - t0)
        self.client.snapshot_all(os.path.join(cfg.checkpoint_dir, "seen"), r)
        if sel_dir is not None:
            # transient co-partitioned selected shards: garbage once the
            # round's fetched parquet exists (a crashed attempt's dir is
            # also rmtree'd at round start before reuse)
            shutil.rmtree(sel_dir, ignore_errors=True)
        _mark("metrics_snapshot")
        stats = {
            "round": r,
            "selected": sel_count,
            "articles": n_articles,
            "errors": n_errors,
            "wall_sec": round(time.time() - t0, 3),
            "stage_sec": stage_sec,
        }
        with open(_manifest_path(cfg, r) + ".tmp", "w") as fh:
            json.dump(stats, fh)
        os.replace(_manifest_path(cfg, r) + ".tmp", _manifest_path(cfg, r))
        return stats

    def _finalize_metrics(self, partials: list, r: int, wall: float) -> tuple:
        """Roll the sink's per-block partials into one row per url-hash
        partition. Partials are per-(partition, host), so host_count is
        exact; at extreme host cardinality switch the sink to
        partition-level partials and drop exact host_count."""
        cfg = self.cfg
        cols = ["partition", "host", "fetched", "errors_permanent", "articles_out", "bytes_html"]
        allp = (
            pd.concat(partials, ignore_index=True)
            if partials
            else pd.DataFrame(columns=cols)
        )
        if len(allp):
            by_host = allp.groupby(["partition", "host"], as_index=False).sum()
            rolled = by_host.groupby("partition", as_index=False).agg(
                host_count=("host", "nunique"),
                fetched=("fetched", "sum"),
                errors_permanent=("errors_permanent", "sum"),
                articles_out=("articles_out", "sum"),
                bytes_html=("bytes_html", "sum"),
            )
        else:
            rolled = pd.DataFrame(
                columns=["partition", "host_count", "fetched", "errors_permanent",
                         "articles_out", "bytes_html"]
            )
        rolled["round"] = np.int32(r)
        rolled["wall_ms"] = int(wall * 1000)
        out_dir = os.path.join(cfg.checkpoint_dir, "metrics", f"round={r}")
        os.makedirs(out_dir, exist_ok=True)
        pq.write_table(
            _table_from_pandas(rolled),
            os.path.join(out_dir, "part.parquet"),
        )
        if len(rolled):
            return int(rolled["articles_out"].sum()), int(rolled["errors_permanent"].sum())
        return 0, 0


def run_crawl(pages_path: str, spec: PagesSpec, cfg: CrawlConfig) -> dict:
    return CrawlRun(pages_path, spec, cfg).run()


def read_articles(checkpoint_dir: str) -> pa.Table:
    """Articles view over the per-round fetched tables (state==1 rows) as
    one driver-side Arrow table — the TEST/CONTRACT form for sf-scale
    corpora (byte-identity asserts want a whole table). Production reads
    go through :func:`read_articles_ds`, which streams."""
    import glob

    import pyarrow.dataset as pads

    files = sorted(
        glob.glob(os.path.join(checkpoint_dir, "fetched", "round=*", "*.parquet"))
    )
    if not files:
        return pa.table({})
    dataset = pads.dataset(files, format="parquet")
    return dataset.to_table(filter=pads.field("state") == STATE_ARTICLE)


def read_articles_ds(checkpoint_dir: str, columns: list | None = None):
    """S10 read path at scale: the articles view as a streaming
    ``ray.data.Dataset`` (mirror of read_metrics) — the public way to
    read a crawl's output into a downstream pipeline (processor chain,
    CSV/SOLR sinks, dedup) WITHOUT materializing every round on the
    driver. The state==ARTICLE predicate and the column projection are
    pushed into the parquet read (row-group pruning); explicit file list
    so the round=N directory name is not re-injected as a duplicate hive
    column. Returns an empty dataset if no round has been fetched yet."""
    import glob

    import pyarrow.dataset as pads
    import ray.data

    files = sorted(
        glob.glob(os.path.join(checkpoint_dir, "fetched", "round=*", "*.parquet"))
    )
    if not files:
        return ray.data.from_items([])
    return ray.data.read_parquet(
        files, columns=columns, filter=pads.field("state") == STATE_ARTICLE
    )


def read_metrics(checkpoint_dir: str):
    """A3 operational view (the reference's StatusAPIServer /status
    analogue, worker.py:1256-1573, minus the HTTP server): the
    per-(partition, host-rollup) crawl metrics as a ray Dataset —
    columns (partition, host_count, fetched, errors_permanent,
    articles_out, bytes_html, round, wall_ms). One row per url-hash
    partition per round; sum across partitions for per-round totals.
    Explicit file list (like read_articles) so the round=N directory
    name is not re-injected as a duplicate hive column."""
    import glob

    import ray.data

    files = sorted(
        glob.glob(os.path.join(checkpoint_dir, "metrics", "round=*", "*.parquet"))
    )
    if not files:
        return ray.data.from_items([])
    return ray.data.read_parquet(files)


def read_round_manifests(checkpoint_dir: str) -> list:
    """Round manifests (selected / articles / errors / wall_sec /
    stage_sec) in round order — the crawl's driver-side lineage."""
    import glob
    import json

    out = []
    for p in sorted(
        glob.glob(os.path.join(checkpoint_dir, "manifest", "round=*.json")),
        key=lambda p: int(p.rsplit("=", 1)[1].split(".")[0]),
    ):
        with open(p, encoding="utf-8") as fp:
            out.append(json.load(fp))
    return out


def write_articles_csv(articles, out_dir: str):
    """S12 (mod_json_to_csv.py:113-130 — a TODO stub in the reference;
    its docstring states the intent: per-date CSV rows of every event
    attribute WITHOUT the text body, deduped): distributed CSV export
    of an articles Dataset — drop the body, join list columns to
    pipe-separated strings (CSV has no list type, vectorized
    ``binary_join``), dedupe per url GLOBALLY (in-block
    ``drop_duplicates`` as the combiner, then a hash(url)-bucket
    groupby with ONE vectorized ``drop_duplicates`` per bucket — ~2×cpu
    buckets, so the Python-call count is O(cpus), not O(urls)), write
    one CSV shard per output block under ``out_dir``. No locks needed —
    shards are independent files, unlike the reference's single locked
    CSV."""

    import ray

    import pyarrow.compute as pc

    # ~2× CPUs buckets: enough parallelism for the dedup shuffle, few
    # enough that the per-bucket Python-call count is O(cpus), not
    # O(distinct urls) — the politeness fb pattern (see politeness_split).
    num_buckets = max(8, 2 * int(ray.cluster_resources().get("CPU", 16)))

    def flatten(batch: pa.Table) -> pa.Table:
        drop = [c for c in ("text", "html", "links") if c in batch.schema.names]
        batch = batch.drop_columns(drop)
        cols = {}
        for name in batch.schema.names:
            col = batch[name]
            if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                # vectorized pipe-join; null list -> "" like "|".join([])
                cols[name] = pc.fill_null(
                    pc.binary_join(col, "|"), ""
                ).cast(pa.string())
            else:
                cols[name] = col
        # in-block combiner: vectorized first-occurrence per url
        df = pa.table(cols).to_pandas().drop_duplicates("url")
        df["__fb"] = (
            pd.util.hash_array(df["url"].to_numpy(dtype=object)) % num_buckets
        ).astype(np.int32)
        return _table_from_pandas(df)

    def bucket_dedup(df: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per fb bucket (<= num_buckets Python calls
        # total), NOT one call per distinct url
        return df.drop_duplicates("url").drop(columns="__fb")

    (
        articles.map_batches(flatten, batch_format="pyarrow")
        .groupby("__fb")
        .map_groups(bucket_dedup, batch_format="pandas")
        .write_csv(out_dir)
    )
    return out_dir


SOLR_MIN_ARTICLE_CHARS = 400


def write_solr_payloads(articles, out_dir: str):
    """S13 (mod_solrsubmit.py:74-102 — a TODO stub in the reference: its
    processDataObj strips the text and would HTTP-POST an add-document
    to a SOLR core; the class pins minArticleLengthInChars=400): build
    the index-ready JSON documents distributedly and write them as
    JSON-lines shards under ``out_dir`` — the submit itself is the
    network call this sandbox (and the reference) never implements, so
    the payload directory IS the submit queue a real deployment would
    drain with one POST per shard.

    Payload schema per doc: id (the article's unique id if present,
    else its url), url, date (pubdate), module, content (stripped
    text). Articles shorter than SOLR_MIN_ARTICLE_CHARS are filtered
    out, matching the plugin's threshold.
    """
    import pyarrow.compute as pc

    def to_payload(batch: pa.Table) -> pa.Table:
        text = pc.utf8_trim_whitespace(
            pc.cast(batch["text"], pa.string(), safe=False)
        )
        keep = pc.greater_equal(
            pc.utf8_length(text), SOLR_MIN_ARTICLE_CHARS
        )
        batch = batch.append_column("content", text).filter(keep)
        names = batch.schema.names
        # the article schema's identifier column is unique_id (U10/U11);
        # fall back to url for tables that don't carry one
        if "unique_id" in names:
            ids = batch["unique_id"]
        elif "id" in names:
            ids = batch["id"]
        else:
            ids = batch["url"]
        cols = {
            "id": pc.cast(ids, pa.string(), safe=False),
            "url": batch["url"],
            "date": pc.cast(batch["pubdate"], pa.string(), safe=False)
            if "pubdate" in names
            else pa.nulls(batch.num_rows, pa.string()),
            "module": batch["module"]
            if "module" in names
            else pa.nulls(batch.num_rows, pa.string()),
            "content": batch["content"],
        }
        return pa.table(cols)

    articles.map_batches(to_payload, batch_format="pyarrow").write_json(out_dir)
    return out_dir


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
