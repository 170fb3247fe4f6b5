"""Deterministic fetch-status simulation.

The sandbox has no network; "the web" is the pages Parquet table and
HTTP outcomes are a pure function of (seed, url), reproducing the
reference's error-classification semantics (network.py:57-68):
permanent statuses {400,401,403,404,405,410,451} are never retried and
enter the seen set immediately; transient ones (429/5xx) re-enter the
frontier with attempts+1 (pending_urls re-attempt semantics) and are
only retired into the seen set as errors once attempts exceed the cap.

Hub/front pages always succeed so every host's crawl tree is reachable —
the interesting error mix lands on article fetches.
"""

from __future__ import annotations

from ..functions.urlkit import url_hash64

PERMANENT_STATUSES = frozenset({400, 401, 403, 404, 405, 410, 451})

#: cumulative per-mille thresholds → status
_STATUS_BANDS = [
    (850, 200),
    (880, 404),
    (900, 403),
    (910, 410),
    (950, 500),
    (1000, 503),
]


def simulate_status(url: str, seed: int, is_hub: bool = False) -> int:
    """Deterministic HTTP status for a fetch of ``url`` under ``seed``."""
    if is_hub:
        return 200
    roll = url_hash64(f"{seed}|{url}") % 1000
    for threshold, status in _STATUS_BANDS:
        if roll < threshold:
            return status
    return 503


def is_permanent(status: int) -> bool:
    return status in PERMANENT_STATUSES


#: transient failures re-enter the frontier with attempts+1 instead of
#: being marked seen — the reference's pending_urls re-attempt semantics
#: (session_hist.py:114 attempts counter, network.py:222-304 retry
#: classification); only when attempts exceed the cap is the url retired
#: into the seen set as an error.
TRANSIENT_STATUSES = frozenset({429, 500, 502, 503, 504})


def is_transient(status: int) -> bool:
    return status in TRANSIENT_STATUSES
