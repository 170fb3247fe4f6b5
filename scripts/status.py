"""Crawl status view — the reference's /status analogue
(worker.py:1256-1573 StatusAPIServer exposes queue depths and plugin
states over FastAPI; this engine's equivalent operational surface is
the checkpoint's round manifests + metrics parquet, which carry MORE
lineage than the reference's live counters).

Usage: python scripts/status.py <checkpoint_dir> [--metrics]
       python scripts/status.py <checkpoint_dir> --serve [PORT]

Prints one line per completed round (selected, articles, errors, wall,
stage breakdown) plus totals; --metrics additionally rolls up the
per-partition metrics parquet (fetched / bytes / hosts per round) with
plain pyarrow — no Ray session needed, so it can run NEXT TO a live
crawl and observe rounds as their manifests land (the manifest is the
last artifact a round writes, so every listed round is complete).

--serve starts the live HTTP endpoint instead (default port 8314):
/status and /metrics as JSON, / as this text rendering — the
reference's StatusAPIServer + dashboard analogue
(newslookout_ray.status_server).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from newslookout_ray.status_server import (  # noqa: E402 (path setup first)
    metrics_rollup,
    render,
    round_manifests,
    serve,
)

__all__ = ["metrics_rollup", "render", "round_manifests", "serve"]


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        raise SystemExit(2)
    if "--serve" in sys.argv:
        port = int(args[1]) if len(args) > 1 else 8314
        serve(args[0], port=port)
    else:
        print(render(args[0], with_metrics="--metrics" in sys.argv))
