"""Archive sources: GDELT zipped-TSV aggregator ingestion (S6) and the
NSE-style zip data-archive expander (S7).

Reference behavior reproduced:
  - S6 ``mod_in_gdelt.py:118-202``: download <date>.export.CSV.zip →
    expand members → read each TSV with pandas (no header) → keep rows
    whose column 51 equals the country code → column 57 is the URL →
    strip + first-occurrence dedup.
  - S7 ``mod_in_nse.py:336-488``: expand the fetched zip, skipping
    Readme.txt, renaming members by prefix map (An→equity_nse_announce_,
    Bm→equity_nse_boardmeet_, Bc→equity_nse_corp_action_,
    Pd→equity_nse_, corpbond→debt_nse_), and parsing An* members'
    announcement records (key-prefix regex, continuation-line join,
    excluded-phrase filter) into article-shaped rows.
  - S7/U12 BSE variant ``mod_in_bse.py:89-233``: same expander with the
    ``EQ_ISINCODE_* → equity_bse_<date>.csv`` rename rule, and the
    bhavcopy URL → (ddmmyy date, unique id) extractor shared with NSE.

Ray-Data shape: archives are rows of a Dataset (path or payload); each
archive is one task (``flat_map``-style map_batches) — at 100 TB the
archive list shards across the cluster and no archive is held on the
driver. URL dedup is the packed-order Min-aggregate combiner (same
first-occurrence pattern as the crawl frontier dedup).
"""

from __future__ import annotations

import io
import os
import re
import zipfile

import numpy as np
import pandas as pd
import pyarrow as pa

GDELT_COUNTRY_COL = 51
GDELT_URL_COL = 57

#: mod_in_nse.py:378-399 calculateFileNamePrefix
NSE_PREFIX_MAP = [
    ("An", "equity_nse_announce_"),
    ("Bm", "equity_nse_boardmeet_"),
    ("Bc", "equity_nse_corp_action_"),
    ("Pd", "equity_nse_"),
    ("corpbond", "debt_nse_"),
]

#: mod_in_nse.py:434 record-prefix pattern (entity, symbol)
_RECORD_PREFIX = re.compile(r"([a-zA-Z0-9\(\)¿ \-.^:]{3,})([ ]+[a-zA-Z0-9\-]{2,})([ ]+:)")

#: mod_in_nse.py:441-449 excluded multi-line phrases
_EXCLUDED_PHRASES = (
    "declaration of nav ",
    "recommended final dividend",
    "about investor presentation",
    "that the record date has been fixed on",
    "the maturity date of the scheme is",
    "suspension of trading",
    "postal ballot",
)


# ---------------------------------------------------------------------------
# S6 — GDELT zipped-TSV URL extraction
# ---------------------------------------------------------------------------


def extract_urls_from_gdelt_zip(payload: bytes, country_code: str = "IN") -> list:
    """One archive's URLs in row order (strip + within-archive first-
    occurrence dedup — deDupeList semantics, mod_in_gdelt.py:185-202)."""
    urls, seen = [], set()
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for info in zf.infolist():
            df = pd.read_csv(
                io.BytesIO(zf.read(info)), delimiter="\t", header=None, low_memory=False
            )
            hit = df[df.iloc[:, GDELT_COUNTRY_COL] == country_code].iloc[:, GDELT_URL_COL]
            for u in hit.values:
                u = u.strip()
                if u not in seen:
                    seen.add(u)
                    urls.append(u)
    return urls


def gdelt_urls(archive_paths: list, country_code: str = "IN"):
    """Distributed S6 flow: one task per archive file → (url, pack) rows →
    global first-occurrence dedup via a single Min aggregate, ordered by
    first appearance (archive index, row index)."""
    import ray.data
    from ray.data.aggregate import Min

    items = [{"archive_idx": i, "path": p} for i, p in enumerate(archive_paths)]
    cc = country_code

    def read_archive(batch: pa.Table) -> pa.Table:
        out_urls, out_pack = [], []
        for idx, path in zip(batch["archive_idx"].to_pylist(), batch["path"].to_pylist()):
            with open(path, "rb") as fh:
                payload = fh.read()
            for j, u in enumerate(extract_urls_from_gdelt_zip(payload, cc)):
                out_urls.append(u)
                out_pack.append(idx * (1 << 32) + j)
        return pa.table(
            {"url": pa.array(out_urls, pa.string()), "pack": pa.array(out_pack, pa.int64())}
        )

    agg = (
        ray.data.from_items(items)
        .map_batches(read_archive, batch_format="pyarrow")
        .groupby("url")
        .aggregate(Min("pack", alias_name="pack"))
    )
    return agg.sort("pack")


# ---------------------------------------------------------------------------
# S7 — zip data-archive expander + announcement records
# ---------------------------------------------------------------------------


def nse_member_filename(member_name: str, publish_date_str: str, module: str) -> str:
    """calculateFileNamePrefix (mod_in_nse.py:378-399): prefix-mapped
    rename keyed on the member's name prefix; unknown prefixes keep the
    member name behind the module prefix."""
    _, ext = os.path.splitext(member_name)
    for prefix, mapped in NSE_PREFIX_MAP:
        if member_name.startswith(prefix):
            return mapped + publish_date_str + ext
    return module + "_" + member_name


def bse_member_filename(member_name: str, publish_date_str: str, module: str) -> str:
    """mod_in_bse.py:192-206 rename rule: the bhavcopy member
    ``EQ_ISINCODE_*`` becomes ``equity_bse_<date>.csv``; every other
    member keeps its name behind the module prefix."""
    if member_name.startswith("EQ_ISINCODE_"):
        return "equity_bse_" + publish_date_str + ".csv"
    return module + "_" + member_name


#: urlUniqueRegexps — mod_in_nse.py:87, mod_in_bse.py:70
BHAVCOPY_URL_PATTERNS = {
    "mod_in_nse": (
        re.compile(r"(^https://www1.nseindia.com/archives/equities/bhavcopy/pr/PR)([0-9]+)(.zip$)"),
    ),
    "mod_in_bse": (
        re.compile(r"(^https://www.bseindia.com/download/BhavCopy/Equity/EQ_ISINCODE_)([0-9]+)(.zip$)"),
    ),
}


def bhavcopy_unique_id_from_url(url: str, module: str = "mod_in_nse", now=None):
    """U12 — extractUniqueIDFromURL (mod_in_nse.py:399-418,
    mod_in_bse.py:213-233): try each url pattern's group(2) as a
    ``ddmmyy`` date; on success return (date, id). The reference
    defaults the id to *today's* ddmmyy with a None date when nothing
    matches — ``now`` injects that clock deterministically."""
    import datetime as _dt

    default = (now or _dt.datetime.now()).strftime("%d%m%y")
    if len(url) > 6:
        for pat in BHAVCOPY_URL_PATTERNS.get(module, ()):
            m = pat.search(url)
            if m is None:
                continue
            # reference ordering: the id is overwritten BEFORE the date
            # parse, so a matching-but-undateable group still replaces
            # the default id even though the date stays None
            default = m.group(2)
            try:
                return _dt.datetime.strptime(default, "%d%m%y"), default
            except ValueError:
                continue
    return None, default


def parse_announcements(text: str, archive_url: str, module: str, publish_date) -> list:
    """processAnnouncements (mod_in_nse.py:425-488): records are
    key-value lines; index 0 is the header; lines lacking ':' or hitting
    an excluded phrase are skipped; a following line with no ':' is a
    continuation joined with a space; the prefix regex yields
    (entity, symbol) and the article row mirrors the reference's
    NewsEvent fields (unique id = symbol[:10])."""
    records = text.splitlines(keepends=True)
    out = []
    for index, line in enumerate(records):
        if index == 0 or line.find(":") == -1:
            continue
        low = line.lower()
        if any(p in low for p in _EXCLUDED_PHRASES):
            continue
        prefix = line[: line.find(":") + 1]
        content = line[line.find(":") + 1 :]
        if index + 1 < len(records) and records[index + 1].find(":") == -1:
            content = content + " " + records[index + 1]
        m = _RECORD_PREFIX.search(prefix)
        if m is None:
            continue
        entity = m.group(1)
        symbol = m.group(2).strip()
        out.append(
            {
                "url": archive_url,
                "unique_id": symbol[:10],
                "pubdate": publish_date,
                "title": "NSE Announcement for " + entity.strip(),
                "text": content,
                "module": module,
                "source": "NSE",
                "keywords": [entity.strip()],
                "industries": [symbol],
            }
        )
    return out


def expand_zip_archive(
    payload: bytes,
    out_dir: str,
    publish_date_str: str,
    archive_url: str = "",
    module: str = "mod_in_nse",
    publish_date=None,
) -> tuple:
    """Expand one archive: write renamed members under ``out_dir``
    (skipping Readme.txt; idempotent — existing files untouched, like
    the reference's isfile guards) and parse An* members into
    announcement rows. Returns (written_paths, announcement_rows,
    uncompressed_size)."""
    os.makedirs(out_dir, exist_ok=True)
    rename = bse_member_filename if module == "mod_in_bse" else nse_member_filename
    written, announcements, size = [], [], 0
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        for info in zf.infolist():
            if info.filename.find("Readme.txt") >= 0:
                continue
            new_name = os.path.join(
                out_dir, rename(info.filename, publish_date_str, module)
            )
            data = zf.read(info)
            if not os.path.isfile(new_name):
                with open(new_name, "wb") as fh:
                    fh.write(data)
                size += info.file_size
            written.append(new_name)
            if info.filename.startswith("An"):
                announcements.extend(
                    parse_announcements(
                        data.decode("utf-8", errors="replace"),
                        archive_url,
                        module,
                        publish_date,
                    )
                )
    return written, announcements, size


def expand_archives(archive_rows: list, out_root: str, module: str = "mod_in_nse"):
    """Distributed S7 flow: Dataset of archive descriptors
    ``{path, publish_date_str, url}`` → one expand task per archive →
    announcement rows as the output stream (the expander's file writes
    land under out_root/<publish_date_str>/, one dir per date —
    resumable: already-written members are skipped)."""
    import ray.data

    def expand(batch: pa.Table) -> pa.Table:
        rows = []
        for path, date_str, url in zip(
            batch["path"].to_pylist(),
            batch["publish_date_str"].to_pylist(),
            batch["url"].to_pylist(),
        ):
            with open(path, "rb") as fh:
                payload = fh.read()
            _, recs, _ = expand_zip_archive(
                payload, os.path.join(out_root, date_str), date_str, url, module
            )
            for r in recs:
                rows.append(r)
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "unique_id": pa.array([r["unique_id"] for r in rows], pa.string()),
                "title": pa.array([r["title"] for r in rows], pa.string()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
                "module": pa.array([r["module"] for r in rows], pa.string()),
                "source": pa.array([r["source"] for r in rows], pa.string()),
                "keywords": pa.array([r["keywords"] for r in rows], pa.list_(pa.string())),
                "industries": pa.array([r["industries"] for r in rows], pa.list_(pa.string())),
            }
        )

    return ray.data.from_items(archive_rows).map_batches(expand, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# S8 — master-data loader (broadcast side tables)
# ---------------------------------------------------------------------------

_MASTER_CACHE: dict = {}


def load_master_data(master_dir: str):
    """S8 master-data fetcher, engine side (mod_in_nse.py:318-334
    fetchMasterData + the masterData name map at :67-78): the reference
    downloads ~9 NSE master CSVs to ``master_data_dir`` ONCE per run and
    plugins look rows up locally. Here the once-per-run step is: read
    each ``*.csv`` in ``master_dir`` with ``ray.data.read_csv`` (Arrow
    CSV under the hood), materialize the small side table, and broadcast
    it via ``ray.put`` — returns {file-stem: ObjectRef}. Stages look up
    via ``master_lookup`` (per-worker deserialization cache), never a
    shuffle join: master tables are small-side by construction.
    """
    import glob as _glob

    import ray
    import ray.data

    from ..util import collect_table

    refs = {}
    for path in sorted(_glob.glob(os.path.join(master_dir, "*.csv"))):
        name = os.path.splitext(os.path.basename(path))[0]
        tbl = collect_table(ray.data.read_csv(path))
        refs[name] = ray.put(tbl)
    return refs


def master_lookup(ref, key_col: str, value_col: str) -> dict:
    """Per-worker cached {key: value} view of one broadcast master table
    (same pattern as crawl._cached_sel_map — an Arrow table broadcast is
    plasma-shared zero-copy; the dict is built once per worker)."""
    import ray

    key = (ref.hex() if hasattr(ref, "hex") else id(ref), key_col, value_col)
    cached = _MASTER_CACHE.get(key)
    if cached is None:
        tbl = ray.get(ref)
        cached = dict(zip(tbl[key_col].to_pylist(), tbl[value_col].to_pylist()))
        _MASTER_CACHE[key] = cached
    return cached
