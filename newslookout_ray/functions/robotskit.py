"""robots.txt parsing and URL-allow checks.

The reference delegates robots handling to the newspaper library's
internals; the north rule requires explicit robots enforcement in the
frontier, so this kernel implements the minimal standard subset the
synthetic web exercises: ``User-agent: *`` groups with ``Disallow:``
path prefixes (empty Disallow ⇒ allow all). Matching is prefix-based on
the URL path, per the original robots.txt convention.
"""

from __future__ import annotations

from urllib.parse import urlsplit


def parse_robots(body: str) -> list:
    """Disallow path-prefixes that apply to ``User-agent: *``.

    Groups are honored: a ``User-agent`` line opens a group; Disallow
    lines bind to the most recent group. Only the ``*`` group applies
    (the engine sends no specific agent). Comments (#) and blank lines
    ignored; empty Disallow values ignored (allow-all marker).
    """
    prefixes = []
    applies = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            applies = value == "*"
        elif field == "disallow" and applies and value:
            prefixes.append(value)
    return prefixes


def is_allowed(url: str, prefixes) -> bool:
    """True iff the URL's path starts with none of the disallow prefixes."""
    if not prefixes:
        return True
    try:
        path = urlsplit(url).path or "/"
    except ValueError:
        return False
    return not any(path.startswith(p) for p in prefixes)


def robots_url(host: str, scheme: str = "https") -> str:
    return f"{scheme}://{host}/robots.txt"
