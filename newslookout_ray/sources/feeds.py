"""Auxiliary URL sources: RSS feeds (S1), date-pattern URL generators
(S4), and aggregator CSV routing (S6 + U14).

These are the reference's URL-discovery sources re-expressed as pure
kernels + Dataset constructors:

  S1  parse_rss_links        — reference base_plugin.py:708-773
      (getArticlesListFromRSS: <channel><item><link> texts, deduped,
      order preserving; invalid URLs dropped)
  S4  business_day_urls      — reference mod_in_nse.py:114-142 /
      mod_in_bse.py:89-118 (one URL per business day for the last K
      days, formatted from a strftime template)
  S6  aggregator flow        — reference mod_in_gdelt.py:118-202
      (headerless TSV → filter country column → project URL column →
      dedupe) + U14 routing (worker.py:156-187: host → owning profile
      via a broadcast domain map)
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from datetime import datetime, timedelta

from ..functions.textkit import dedupe_list
from ..functions.urlkit import get_host, is_valid_url

# ---------------------------------------------------------------------------
# S1 — RSS
# ---------------------------------------------------------------------------


def parse_rss_links(xml_text: str) -> list:
    """<channel><item><link> texts in document order, validity-filtered
    and order-preserving-deduped (reference S1 semantics)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return []
    links = []
    # rss → channel → item → link (namespace-agnostic local-name match)
    for channel in root.iter():
        if channel.tag.rsplit("}", 1)[-1] != "channel":
            continue
        for item in channel:
            if item.tag.rsplit("}", 1)[-1] != "item":
                continue
            for el in item:
                if el.tag.rsplit("}", 1)[-1] == "link" and el.text:
                    link = el.text.strip()
                    if is_valid_url(link):
                        links.append(link)
    return dedupe_list(links)


def build_rss_xml(channel_title: str, links) -> str:
    """Deterministic RSS document wrapping the given links (the synthetic
    feed generator — the inverse of parse_rss_links for round-trips)."""
    items = "".join(
        f"<item><title>item {i}</title><link>{link}</link></item>"
        for i, link in enumerate(links)
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f"<rss version=\"2.0\"><channel><title>{channel_title}</title>{items}</channel></rss>"
    )


# ---------------------------------------------------------------------------
# S4 — date-pattern URL generator
# ---------------------------------------------------------------------------


def business_day_urls(template: str, run_date, days_back: int) -> list:
    """One URL per business day (Mon-Fri), newest first, for the last
    ``days_back`` calendar days ending at ``run_date``.

    ``template`` is a strftime pattern, e.g.
    ``https://www.example.in/content/PR%d%m%y.zip`` (reference bhavcopy
    shape, mod_in_nse.py:114-142).
    """
    if isinstance(run_date, str):
        run_date = datetime.strptime(run_date, "%Y-%m-%d")
    out = []
    for back in range(days_back):
        day = run_date - timedelta(days=back)
        if day.weekday() < 5:  # Mon..Fri
            out.append(day.strftime(template))
    return dedupe_list(out)


# ---------------------------------------------------------------------------
# S6 — aggregator CSV → URL routing (U14)
# ---------------------------------------------------------------------------


def route_urls_to_profiles(urls, domain_map: dict) -> list:
    """(url, profile) per url whose host has an owning profile
    (reference aggregator_url2domain_map, worker.py:156-187: urls whose
    domain matches no plugin are dropped)."""
    out = []
    for url in urls:
        profile = domain_map.get(get_host(url))
        if profile is not None:
            out.append((url, profile))
    return out


def aggregator_urls(rows, country_col: str, url_col: str, country: str) -> list:
    """Filter rows on the country column, project the URL column, dedupe
    preserving order (reference extract_urls_from_csv,
    mod_in_gdelt.py:184-202)."""
    urls = [r[url_col] for r in rows if r.get(country_col) == country]
    return dedupe_list([u for u in urls if is_valid_url(u)])
