"""Crawl status view — the reference's /status analogue without the
HTTP server (worker.py:1256-1573 StatusAPIServer exposes queue depths
and plugin states over FastAPI; this engine's equivalent operational
surface is the checkpoint's round manifests + metrics parquet, which
carry MORE lineage than the reference's live counters).

Usage: python scripts/status.py <checkpoint_dir> [--metrics]

Prints one line per completed round (selected, articles, errors, wall,
stage breakdown) plus totals; --metrics additionally rolls up the
per-partition metrics parquet (fetched / bytes / hosts per round)
with plain pyarrow — no Ray session needed, so it can run NEXT TO a
live crawl and observe rounds as their manifests land (the manifest is
the last artifact a round writes, so every listed round is complete).
"""

from __future__ import annotations

import glob
import json
import os
import sys


def round_manifests(checkpoint_dir: str) -> list:
    out = []
    for p in sorted(
        glob.glob(os.path.join(checkpoint_dir, "manifest", "round=*.json")),
        key=lambda p: int(p.rsplit("=", 1)[1].split(".")[0]),
    ):
        with open(p, encoding="utf-8") as fp:
            out.append(json.load(fp))
    return out


def metrics_rollup(checkpoint_dir: str) -> dict:
    """round -> {fetched, articles_out, errors_permanent, bytes_html,
    host_count} summed across url-hash partitions."""
    import pyarrow.dataset as pads

    files = sorted(
        glob.glob(os.path.join(checkpoint_dir, "metrics", "round=*", "*.parquet"))
    )
    if not files:
        return {}
    t = pads.dataset(files).to_table()
    rounds = {}
    cols = ("fetched", "articles_out", "errors_permanent", "bytes_html", "host_count")
    rs = t["round"].to_pylist()
    data = {c: t[c].to_pylist() for c in cols}
    for i, r in enumerate(rs):
        agg = rounds.setdefault(int(r), dict.fromkeys(cols, 0))
        for c in cols:
            agg[c] += data[c][i]
    return rounds


def render(checkpoint_dir: str, with_metrics: bool = False) -> str:
    lines = [f"checkpoint: {checkpoint_dir}"]
    manifests = round_manifests(checkpoint_dir)
    if not manifests:
        lines.append("no completed rounds yet")
        return "\n".join(lines)
    rollup = metrics_rollup(checkpoint_dir) if with_metrics else {}
    tot_sel = tot_art = tot_err = 0
    tot_wall = 0.0
    for m in manifests:
        r = m["round"]
        tot_sel += m["selected"]
        tot_art += m["articles"]
        tot_err += m["errors"]
        tot_wall += m["wall_sec"]
        stages = " ".join(f"{k}={v:.2f}s" for k, v in m.get("stage_sec", {}).items())
        line = (
            f"round {r}: selected={m['selected']} articles={m['articles']} "
            f"errors={m['errors']} wall={m['wall_sec']:.2f}s  [{stages}]"
        )
        if r in rollup:
            mr = rollup[r]
            line += (
                f"  metrics: fetched={mr['fetched']} hosts={mr['host_count']} "
                f"bytes={mr['bytes_html']}"
            )
        lines.append(line)
    lines.append(
        f"TOTAL rounds={len(manifests)} selected={tot_sel} articles={tot_art} "
        f"errors={tot_err} wall={tot_wall:.2f}s "
        f"({tot_sel / tot_wall:.0f} pages/sec)" if tot_wall else "TOTAL wall=0"
    )
    return "\n".join(lines)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        print(__doc__)
        raise SystemExit(2)
    print(render(args[0], with_metrics="--metrics" in sys.argv))
