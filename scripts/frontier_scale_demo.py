"""Frontier-only scale demo: the 10^10-URL extrapolation evidence.

The north rule targets a 10^10-URL frontier. No disk in this sandbox (or
most) holds 10^10 frontier rows, and none is needed: the frontier is
GENERATOR-BACKED — ``ray.data.range(n, override_num_blocks=B)`` →
``map_batches(synthesize)`` materializes each partition's URLs lazily
inside the task that consumes them, so the only bound is per-partition
memory (n/B rows), never total corpus size. This script drives the REAL
politeness stage (the crawl's widest shuffle) over such a frontier with
a Zipf-skewed host distribution (hot hosts exercise the salted path) and
prints one JSON line:

    python scripts/frontier_scale_demo.py [--urls 8000000] [--cpus 32]
           [--hosts 200000] [--budget 50] [--plain]

Extrapolation math (documented in BASELINE.md §"10^10 scale math"):
frontier row ≈ 95 B on the wire (url ~60 B + host ~20 B + 4 int keys);
10^10 rows ≈ 0.95 TB per round of shuffle — at 256 nodes that is
~3.7 GB/node/round, far under object-store budgets, and the politeness
shuffle's partition count scales as 2×total-cores independent of row
count. The demo's measured rows/sec/core × a cluster's core count is the
projected frontier-stage throughput at any scale, because every stage is
per-partition work + one hash exchange (no driver materialization, no
O(corpus) state).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_frontier_batch(batch: pa.Table, n_hosts: int, zipf_a: float) -> pa.Table:
    """Deterministic per-partition frontier synthesis: seq ids → urls.

    Host assignment is Zipf-skewed via a seeded hash-mix of the id so
    hot hosts exist (host 0 gets ~zipf mass) without any cross-partition
    coordination — each task derives its rows from its id range alone.
    """
    ids = batch["id"].to_numpy()
    # seeded per-row uniform in (0,1] from a splitmix-style integer mix
    z = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ np.uint64(0xD1B54A32D192ED03)
    z = (z ^ (z >> np.uint64(31))) * np.uint64(0xBF58476D1CE4E5B9)
    u = ((z >> np.uint64(11)).astype(np.float64) + 1.0) / float(1 << 53)
    # inverse-CDF Zipf over n_hosts ranks: rank ~ u^(-1/(a-1)) truncated
    rank = np.minimum(
        (u ** (-1.0 / (zipf_a - 1.0))).astype(np.int64) - 1, n_hosts - 1
    )
    hosts = np.char.add("h", rank.astype("U10"))
    hosts = np.char.add(hosts, ".example.com")
    urls = np.char.add(
        np.char.add("https://", hosts), np.char.add("/article/", ids.astype("U20"))
    )
    n = len(ids)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "host": pa.array(hosts, pa.string()),
            "birth_round": pa.array(np.zeros(n, np.int32)),
            "pseq": pa.array(ids.astype(np.int64)),
            "lidx": pa.array(np.zeros(n, np.int64)),
            "depth": pa.array(np.zeros(n, np.int32)),
            "attempts": pa.array(np.zeros(n, np.int32)),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=8_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--hosts", type=int, default=200_000)
    ap.add_argument("--budget", type=int, default=50)
    ap.add_argument("--zipf", type=float, default=1.5)
    ap.add_argument(
        "--plain",
        action="store_true",
        help="use the single-phase politeness (default is the skew-safe "
        "salted two-phase: the Zipf synth puts ~29%% of all URLs on one "
        "host, exactly the hot-host case salting exists for)",
    )
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    from newslookout_ray.pipelines.crawl import politeness_split, politeness_split_salted

    blocks = max(args.cpus * 4, 64)
    n_hosts, zipf_a = args.hosts, args.zipf
    frontier = rd.range(args.urls, override_num_blocks=blocks).map_batches(
        lambda b: synth_frontier_batch(b, n_hosts, zipf_a), batch_format="pyarrow"
    )

    # warm the worker pool (one-time spawn cost is not frontier work)
    rd.range(args.cpus * 2, override_num_blocks=args.cpus * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()

    t0 = time.time()
    split = (
        politeness_split(frontier, args.budget, max_attempts=3)
        if args.plain
        else politeness_split_salted(frontier, args.budget, max_attempts=3)
    )
    # consume with a streaming aggregate — no take_all / materialize
    counts = (
        split.map_batches(
            lambda t: pa.table(
                {
                    "selected": pa.array([int(pa.compute.sum(t["selected"]).as_py() or 0)]),
                    "total": pa.array([t.num_rows]),
                }
            ),
            batch_format="pyarrow",
        )
        .sum(["selected", "total"])
    )
    sec = time.time() - t0
    selected = counts["sum(selected)"]
    urls_per_sec = args.urls / sec
    print(
        json.dumps(
            {
                "metric": "frontier_urls_per_sec",
                "value": round(urls_per_sec, 1),
                "unit": "urls/sec",
                "urls": args.urls,
                "hosts": args.hosts,
                "budget": args.budget,
                "salted": not args.plain,
                "selected": int(selected),
                "deferred": int(counts["sum(total)"] - selected),
                "sec": round(sec, 3),
                "num_cpus": args.cpus,
                "urls_per_sec_per_core": round(urls_per_sec / args.cpus, 1),
                "projected_sec_per_round_1e10_on_256x32cores": round(
                    1e10 / (urls_per_sec / args.cpus * 256 * 32), 1
                ),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
