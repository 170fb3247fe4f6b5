"""Publish-date extraction (T9) and date helpers.

The date regex→strptime-format packs are transcribed as data from the
reference (base_plugin.py:143-194 ``articleDateRegexps``): group(2) of
each regex is the date string, the dict value is its strptime format.
``extract_published_date`` replicates the reference's ordered-scan
decision structure (base_plugin.py:953-999) including the future-date
guard (a future parse does NOT clear the error flag — the scan keeps
going and raises if nothing else matches).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta


class DateExtractError(Exception):
    """No publish date identified (reference ScrapeError analogue)."""


#: (regex, strptime format) in reference scan order (base_plugin.py:143-194).
ARTICLE_DATE_REGEXES = [
    (
        r"(<meta name=\"created-date\" content=\")"
        r"([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \+0530)(\" \/>)",
        "%a, %d %b %Y %H:%M:%S %z",
    ),
    (
        r"(<meta http-equiv=\"Last-Modified\" content=\")"
        r"([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2})( [AMPamp]{2}\"\/>)",
        "%a, %d %b %Y %H:%M:%S",
    ),
    (
        r"(<meta name = \"publish-date\" content = \")"
        r"([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \+0530)(\" \/>)",
        "%a, %d %b %Y %H:%M:%S %z",
    ),
    (
        r"(<meta name=\"publish-date\" content=\")"
        r"([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \+0530)(\" \/>)",
        "%a, %d %b %Y %H:%M:%S %z",
    ),
    (
        r"(\"datePublished\":\")"
        r"([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \+0530)(\")",
        "%a, %d %b %Y %H:%M:%S %z",
    ),
    (
        r"(\"dateModified\":\")"
        r"([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \+0530)(\")",
        "%a, %d %b %Y %H:%M:%S %z",
    ),
    (
        r"(\"dateModified\": \")(20[0-9]{2}\-[0-9]{2}\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\+05:30\")",
        "%Y-%m-%dT%H:%M:%S",
    ),
    (
        r"('publishedDate': ')(20[0-9]{2}\-[0-9]{2}\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\+05:30')",
        "%Y-%m-%dT%H:%M:%S",
    ),
    (
        r"(\"datePublished\": \")(20[0-9]{2}\-[0-9]{2}\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\+05:30\")",
        "%Y-%m-%dT%H:%M:%S",
    ),
    (
        r"(content=\")([a-zA-Z]{3}, [0-9]{1,2} [a-zA-Z]{3} 20[0-9]{2} [0-9]{1,2}:[0-9]{2}:[0-9]{2} \+0530)(\">)",
        "%a, %d %b %Y %H:%M:%S %z",
    ),
    (
        r"(content=\")(20[0-9]{2}\-[0-9]{2}\-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2})(\+05:30\")",
        "%Y-%m-%dT%H:%M:%S",
    ),
    (
        r"(Updated: )([a-zA-Z]+ [0-9]{1,2}, 20[0-9]{2} [0-9]{1,2}:[0-9]{2})( [a-zA-Z]{2} IST)",
        "%B %d, %Y %H:%M",
    ),
    (
        r"(<li class=\"date\">Updated: )([a-zA-Z]+ [0-9]{1,2}, 20[0-9]{2}, [0-9]{1,2}:[0-9]{2})( IST<\/li>)",
        "%B %d, %Y, %H:%M",
    ),
    (r"(data\-date=\")([0-9]{4}\-[0-9]{2}\-[0-9]{2})(\">)", "%Y-%m-%d"),
    (r"(data\-article\-date=')([0-9]{4}\-[0-9]{2}\-[0-9]{2})(')", "%Y-%m-%d"),
]


def compile_date_patterns(packs=None):
    """[(compiled regex, strptime format), ...] in scan order."""
    if packs is None:
        packs = ARTICLE_DATE_REGEXES
    return [(re.compile(rx), fmt) for rx, fmt in packs]


def extract_published_date(html_text, compiled_packs, now=None) -> datetime:
    """Ordered regex scan → group(2) → strptime; tz stripped.

    Exact decision structure of reference base_plugin.py:953-999. ``now``
    is injectable so the pipeline can use a deterministic reference clock
    (the reference uses wall-clock datetime.now()).
    """
    if isinstance(html_text, bytes):
        html_text = html_text.decode("UTF-8")
    if now is None:
        now = datetime.now()
    for pattern, fmt in compiled_packs:
        m = pattern.search(html_text)
        if m is None:
            continue
        try:
            date_obj = datetime.strptime(m.group(2), fmt).replace(tzinfo=None)
        except ValueError:
            continue
        if date_obj > now:
            continue  # future date: keep scanning (reference keeps errorFlag)
        return date_obj
    raise DateExtractError(
        "Invalid article since the publish date of article could not be identified."
    )


def check_and_parse_date(date_str, now=None) -> datetime:
    """'YYYY-MM-DD' → datetime; future or invalid → now
    (reference scraper_utils.py:315-334 checkAndParseDate)."""
    if now is None:
        now = datetime.now()
    run_date = now
    if isinstance(date_str, datetime):
        run_date = date_str
    elif isinstance(date_str, str):
        try:
            run_date = datetime.strptime(date_str, "%Y-%m-%d")
        except ValueError:
            run_date = now
    if run_date.date() > now.date():
        run_date = now
    return run_date


def next_days_date(run_date: datetime) -> datetime:
    """reference scraper_utils.py:337-353."""
    return run_date + timedelta(days=1)


def previous_days_date(run_date) -> datetime:
    """reference scraper_utils.py:356-371 (str input parsed first)."""
    if isinstance(run_date, str):
        run_date = datetime.strptime(run_date, "%Y-%m-%d")
    return run_date - timedelta(days=1)
