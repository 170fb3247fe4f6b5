"""Live crawl status over HTTP — the reference's StatusAPIServer
analogue (worker.py:1256-1573 serves queue depths and plugin states via
FastAPI next to the running crawl; dashboard.html renders it).

This engine's equivalent data plane is the checkpoint directory: round
manifests (written LAST per round, so every listed round is complete)
and the per-partition metrics parquet. The server reads them with plain
glob/json/pyarrow — NO Ray session — so it can run inside the driver
process beside a live crawl, or as a separate process pointed at the
same checkpoint dir (``python scripts/status.py <ckpt> --serve``), and
it observes new rounds the moment their manifests land.

Endpoints (JSON unless noted):
  /status   -> {"checkpoint", "rounds": [manifests...], "totals": {...}}
  /metrics  -> {"rounds": {round: {fetched, articles_out, ...}}}
  /healthz  -> {"ok": true}
  /         -> the scripts/status.py text rendering (text/plain)
"""

from __future__ import annotations

import glob
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def round_manifests(checkpoint_dir: str) -> list:
    """Completed-round manifests in round order (pure file reads)."""
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
    host_count} summed across url-hash partitions. Plain pyarrow — the
    per-round rollups are tiny (one row per partition)."""
    import pyarrow.dataset as pads

    files = sorted(
        glob.glob(os.path.join(checkpoint_dir, "metrics", "round=*", "*.parquet"))
    )
    if not files:
        return {}
    t = pads.dataset(files).to_table()
    rounds: dict = {}
    cols = ("fetched", "articles_out", "errors_permanent", "bytes_html", "host_count")
    rs = t["round"].to_pylist()
    data = {c: t[c].to_pylist() for c in cols}
    for i, r in enumerate(rs):
        agg = rounds.setdefault(int(r), dict.fromkeys(cols, 0))
        for c in cols:
            agg[c] += data[c][i]
    return rounds


def status_payload(checkpoint_dir: str) -> dict:
    manifests = round_manifests(checkpoint_dir)
    totals = {
        "rounds": len(manifests),
        "selected": sum(m["selected"] for m in manifests),
        "articles": sum(m["articles"] for m in manifests),
        "errors": sum(m["errors"] for m in manifests),
        "wall_sec": round(sum(m["wall_sec"] for m in manifests), 3),
    }
    if totals["wall_sec"]:
        totals["pages_per_sec"] = round(totals["selected"] / totals["wall_sec"], 1)
    return {"checkpoint": checkpoint_dir, "rounds": manifests, "totals": totals}


def render(checkpoint_dir: str, with_metrics: bool = False) -> str:
    """One line per completed round plus totals (the CLI/dashboard text)."""
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


class StatusServer:
    """Threaded stdlib HTTP server over a checkpoint dir.

    Stateless per request (re-reads the checkpoint), so it needs no
    coordination with the crawl — manifests are atomic last-writes.
    ``port=0`` binds an ephemeral port (tests); ``.port`` reports it.

    Usage::

        with StatusServer(ckpt_dir, port=8314):
            run_crawl(...)         # poll http://127.0.0.1:8314/status
    """

    def __init__(self, checkpoint_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.checkpoint_dir = checkpoint_dir
        ckpt = checkpoint_dir

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet: no per-request stderr spam
                pass

            def _send(self, code: int, body: bytes, ctype: str):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802 (http.server API)
                try:
                    if self.path == "/healthz":
                        body, ctype = b'{"ok": true}', "application/json"
                    elif self.path == "/status":
                        body = json.dumps(status_payload(ckpt)).encode()
                        ctype = "application/json"
                    elif self.path == "/metrics":
                        body = json.dumps(
                            {"rounds": metrics_rollup(ckpt)}
                        ).encode()
                        ctype = "application/json"
                    elif self.path == "/":
                        body = render(ckpt, with_metrics=True).encode()
                        ctype = "text/plain; charset=utf-8"
                    else:
                        self._send(404, b'{"error": "not found"}', "application/json")
                        return
                    self._send(200, body, ctype)
                except BrokenPipeError:
                    pass
                except Exception as exc:  # noqa: BLE001 — surface as 500
                    self._send(
                        500,
                        json.dumps({"error": repr(exc)}).encode(),
                        "application/json",
                    )

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host = host
        self.port = self._httpd.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "StatusServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="status-server", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "StatusServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def serve(checkpoint_dir: str, host: str = "127.0.0.1", port: int = 8314) -> None:
    """Blocking CLI form (scripts/status.py --serve)."""
    srv = StatusServer(checkpoint_dir, host=host, port=port)
    print(f"status server on http://{srv.host}:{srv.port}/ (ctrl-c to stop)")
    try:
        srv.start()._thread.join()
    except KeyboardInterrupt:
        srv.stop()
