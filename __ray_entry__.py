"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Implementations live in ``newslookout_ray.api`` — see that module for
the determinism rules that make the Ray results hash-match the SQL.
Neither this module nor the library calls ``ray.init``/``ray.shutdown``;
the caller owns the session. Run from /root/repo (workers resolve the
package via cwd).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from newslookout_ray import api


def entry() -> Any:
    """Flagship pipeline: deterministic crawl (frontier → seen-filter →
    politeness → fetch-sim join → extract) over synthetic pages wrapping
    the sf0.001 documents; returns the extracted articles table."""
    return api.entry()


def queries() -> dict[str, Callable[[str], Any]]:
    return api.queries()


def oracle_sql() -> dict[str, str]:
    return api.oracle_sql()
