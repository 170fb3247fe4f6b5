"""Deterministic synthetic web — the Parquet ``pages`` table.

Authoritative input shape (BASELINE.json input_hint):
    url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string

Every attribute of page *i* is a pure function of ``(seed, i)`` via
counter-based hashing (no RNG state), so the corpus is byte-reproducible
at any scale and any partitioning, and the 10^10-URL frontier case is
served by generator-backed partitions (``ray.data.range(n) →
map_batches``) — the corpus is never materialized driver-side.

Corpus structure (mirrors the reference's crawl surface):
  - page ids [0, n_hosts): **hub pages** — one front page per host
    (reference analogue: mainURL / nonContentURLs fetched for link
    discovery, base_plugin.py:1001-1013). Their HTML is a link farm
    (absolute, relative and junk links — exercising scraper_utils
    extractLinks semantics, scraper_utils.py:437-474).
  - page ids [n_hosts, n): **article pages** — body text wrapped in one
    of the five reference body formats (mod_en_in_ecotimes.py:637-762),
    a ``data-date`` publish-date marker (base_plugin.py:190-191 pattern),
    a numeric URL id matching the base 3-group unique-ID regexes
    (base_plugin.py:131-138), plus a handful of onward article links.

Host assignment is log-uniform (Zipf-ish): rank-0 hosts receive a large
multiple of the median host's pages, so hot-host handling (politeness
budgets, salting) is actually exercised.

An optional text pool (e.g. the testdata ``documents.text`` column) seeds
the body text; dirty tokens from the cleanText replacement table are
injected deterministically so text cleaning is non-trivial.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from hashlib import blake2b

import numpy as np
import pyarrow as pa

from ..functions.robotskit import robots_url
from ..functions.urlkit import url_hash64

_WORDS = (
    "market shares rally investors quarterly earnings outlook policy bank "
    "rates growth exports sector industry revenue profit margin deal merger "
    "board directors announcement capital infra energy steel auto tech"
).split()

#: Dirty tokens injected into article bodies (drawn from the cleanText
#: replacement table so cleaning changes bytes): see textkit.clean_text.
_DIRTY_TOKENS = [" Rs.", "₹", "$", "—", "’", "â€™", "\t", "“quoted”", "🙂"]

#: Junk hrefs hubs embed to exercise the extractLinks filter battery.
_JUNK_LINKS = ["javascript:void(0)", "mailto:ed@example.com", "#top", "?page=2",
               "../up", "tel:555", "whatsapp:share"]

_SECTIONS = ["markets", "economy", "industry", "tech", "policy"]

_FORMATS = ["format1", "format2", "format3", "format4", "format5"]


def _h(seed: int, page_id: int, field_tag: bytes) -> int:
    """Stable uint64 from (seed, page_id, field)."""
    key = seed.to_bytes(8, "big") + page_id.to_bytes(8, "big") + field_tag
    return int.from_bytes(blake2b(key, digest_size=8).digest(), "big")


@dataclass(frozen=True)
class PagesSpec:
    """Deterministic corpus parameters. ``n_pages`` includes the
    ``n_hosts`` hub pages."""

    n_pages: int = 2000
    seed: int = 42
    n_hosts: int = 20
    base_date: str = "2021-01-04"
    links_per_hub: int = 40
    links_per_article: int = 4
    body_sentences: int = 12
    text_pool: tuple = ()  # optional body-text pool (e.g. documents.text)
    lang_mix: tuple = (("en", 85), ("hi", 5), ("fr", 4), ("de", 3), ("zh", 3))

    @property
    def n_articles(self) -> int:
        return max(0, self.n_pages - self.n_hosts)

    @property
    def n_total_rows(self) -> int:
        """pages + one robots.txt page per host (ids [n_pages, n_pages+n_hosts))."""
        return self.n_pages + self.n_hosts


def host_name(spec: PagesSpec, host_idx: int) -> str:
    return f"www.host{host_idx}.com"


def _host_of_article(spec: PagesSpec, page_id: int) -> int:
    """Log-uniform host rank (Zipf-ish): rank 0 is the hot host."""
    u = _h(spec.seed, page_id, b"host") / 2.0**64
    return min(spec.n_hosts - 1, max(0, int(spec.n_hosts**u) - 1))


def article_url(spec: PagesSpec, page_id: int) -> str:
    host = host_name(spec, _host_of_article(spec, page_id))
    section = _SECTIONS[_h(spec.seed, page_id, b"sect") % len(_SECTIONS)]
    return f"https://{host}/news/{section}/story-{1000000 + page_id}"


def hub_url(spec: PagesSpec, host_idx: int) -> str:
    return f"https://{host_name(spec, host_idx)}/"


def page_url(spec: PagesSpec, page_id: int) -> str:
    if page_id < spec.n_hosts:
        return hub_url(spec, page_id)
    if page_id >= spec.n_pages:  # robots.txt rows appended after articles
        return robots_url(host_name(spec, page_id - spec.n_pages))
    return article_url(spec, page_id)


#: corpus partition kinds — the second hive level. A real 100-TB page
#: store keys its shards the same way (seed/hub lists and robots files
#: are tiny, article WARCs are the bulk), so a fetch for an all-hub or
#: all-article selection prunes to its own partition instead of
#: scanning the whole web.
KIND_ARTICLE, KIND_HUB, KIND_ROBOTS = 0, 1, 2


def page_kind(spec: PagesSpec, page_id: int) -> int:
    if page_id < spec.n_hosts:
        return KIND_HUB
    if page_id >= spec.n_pages:
        return KIND_ROBOTS
    return KIND_ARTICLE


def url_kind(url: str) -> int:
    """Partition-routing classifier: which corpus kind can hold ``url``.
    Pure function of URL shape (the same rule ``page_kind`` encodes by
    id), so the fetch join can push a kind filter without consulting any
    index."""
    if url.endswith("/robots.txt"):
        return KIND_ROBOTS
    if url.endswith("/"):
        return KIND_HUB
    return KIND_ARTICLE


def url_kind_batch(urls) -> np.ndarray:
    """Vectorized ``url_kind`` over a sequence/array of URLs — Arrow
    ends_with kernels (np.char copied every string twice and was ~2 s
    of serial driver time per round at 600k selections)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(urls, (pa.Array, pa.ChunkedArray)):
        arr = urls
    else:
        seq = np.asarray(urls, dtype=object)
        if len(seq) == 0:
            return np.zeros(0, dtype=np.int64)
        arr = pa.array(seq, pa.string())
    out = np.zeros(len(arr), dtype=np.int64)
    if len(arr) == 0:
        return out
    out[pc.ends_with(arr, pattern="/").to_numpy(zero_copy_only=False)] = KIND_HUB
    out[
        pc.ends_with(arr, pattern="/robots.txt").to_numpy(zero_copy_only=False)
    ] = KIND_ROBOTS
    return out


def robots_disallow_sections(spec: PagesSpec, host_idx: int) -> list:
    """Deterministic per-host robots policy: ~1 in 4 sections disallowed."""
    return [
        s
        for s in _SECTIONS
        if _h(spec.seed, host_idx, b"robots-" + s.encode()) % 4 == 0
    ]


def robots_body(spec: PagesSpec, host_idx: int) -> str:
    lines = ["User-agent: *"]
    for s in robots_disallow_sections(spec, host_idx):
        lines.append(f"Disallow: /news/{s}/")
    lines.append("")
    return "\n".join(lines)


def article_unique_id(spec: PagesSpec, page_id: int) -> str:
    return str(1000000 + page_id)


def _article_ids_linked_from(spec: PagesSpec, page_id: int, count: int) -> list:
    """Deterministic onward links: article page ids derived per slot."""
    if spec.n_articles <= 0:
        return []
    out = []
    for slot in range(count):
        target = spec.n_hosts + _h(spec.seed, page_id, b"lnk%d" % slot) % spec.n_articles
        if target != page_id:
            out.append(target)
    return out


def article_body_text(spec: PagesSpec, page_id: int) -> str:
    """Raw (pre-clean) body text — the generator-known ground truth."""
    if spec.text_pool:
        base = spec.text_pool[_h(spec.seed, page_id, b"pool") % len(spec.text_pool)]
    else:
        rng_words = [
            _WORDS[_h(spec.seed, page_id, b"w%d" % i) % len(_WORDS)]
            for i in range(spec.body_sentences * 8)
        ]
        base = " ".join(rng_words)
    # deterministic dirt: 3 dirty tokens spliced at hash-chosen word gaps,
    # plus a glued sentence boundary to exercise fixSentenceGaps
    words = base.split(" ")
    for j in range(3):
        tok = _DIRTY_TOKENS[_h(spec.seed, page_id, b"d%d" % j) % len(_DIRTY_TOKENS)]
        pos = _h(spec.seed, page_id, b"dp%d" % j) % (len(words) + 1)
        words.insert(pos, tok)
    text = " ".join(words)
    return text + f" closing line {page_id}.Next sentence follows id {page_id}."


def article_pubdate(spec: PagesSpec, page_id: int) -> str:
    base = datetime.strptime(spec.base_date, "%Y-%m-%d")
    return (base + timedelta(days=_h(spec.seed, page_id, b"date") % 28)).strftime("%Y-%m-%d")


def article_lang(spec: PagesSpec, page_id: int) -> str:
    total = sum(w for _, w in spec.lang_mix)
    pick = _h(spec.seed, page_id, b"lang") % total
    acc = 0
    for code, w in spec.lang_mix:
        acc += w
        if pick < acc:
            return code
    return spec.lang_mix[0][0]


def _wrap_body(fmt: str, body: str) -> str:
    if fmt == "format1":
        return (
            '<div class="article-body" itemprop="mainContentOfPage">'
            '<div class="post-text artcle-txt article-type-news">'
            f'<div class="Normal">{body}</div></div></div>'
        )
    if fmt == "format2":
        return (
            '<article class="artData clr paywall">'
            f'<div class="artText medium">{body}</div></article>'
        )
    if fmt == "format3":
        return (
            '<div class="blog-show"></div>'
            f'<div class="main-content"><p>{body}</p></div>'
        )
    if fmt == "format4":
        return f'<article class="artData clr ">{body}</article>'
    return f'<div class="artText">{body}</div>'


def article_format(spec: PagesSpec, page_id: int) -> str:
    return _FORMATS[_h(spec.seed, page_id, b"fmt") % len(_FORMATS)]


def page_html(spec: PagesSpec, page_id: int) -> str:
    """Full page HTML (str; stored utf-8 encoded in the binary column)."""
    url = page_url(spec, page_id)
    if page_id >= spec.n_pages:
        return robots_body(spec, page_id - spec.n_pages)
    if page_id < spec.n_hosts:
        # hub page: link farm + junk links + one relative link
        targets = _article_ids_linked_from(spec, page_id, spec.links_per_hub)
        anchors = [f'<a href="{article_url(spec, t)}">story {t}</a>' for t in targets]
        junk = [f'<a href="{j}">junk</a>' for j in _JUNK_LINKS]
        rel_target = targets[0] if targets else None
        rel = ""
        if rel_target is not None:
            rel_path = article_url(spec, rel_target).split(".com", 1)[1]
            rel = f'<a href="{rel_path}">rel</a>'
        filler = " ".join(
            _WORDS[_h(spec.seed, page_id, b"f%d" % i) % len(_WORDS)] for i in range(60)
        )
        return (
            f"<html><head><title>Front {host_name(spec, page_id)}</title></head>"
            f'<body><span data-date="{spec.base_date}"><nav>{"".join(anchors)}'
            f'{"".join(junk)}{rel}</nav><p>{filler}</p></body></html>'
        )
    body = article_body_text(spec, page_id)
    fmt = article_format(spec, page_id)
    targets = _article_ids_linked_from(spec, page_id, spec.links_per_article)
    anchors = "".join(f'<a href="{article_url(spec, t)}">more {t}</a>' for t in targets)
    title = f"Story {page_id} on {host_name(spec, _host_of_article(spec, page_id))}"
    return (
        f"<html><head><title>{title}</title></head><body>"
        f'<span data-date="{article_pubdate(spec, page_id)}">'
        f"{_wrap_body(fmt, body)}<footer>{anchors}</footer></body></html>"
    )


def page_record(spec: PagesSpec, page_id: int) -> dict:
    """One pages-table row (pure function — shared with the simulator)."""
    url = page_url(spec, page_id)
    base = datetime.strptime(spec.base_date, "%Y-%m-%d")
    is_article = spec.n_hosts <= page_id < spec.n_pages
    return {
        "url": url,
        "warc_ts": base + timedelta(seconds=int(page_id)),
        "html": page_html(spec, page_id).encode("utf-8"),
        "text": article_body_text(spec, page_id) if is_article else "",
        "lang": article_lang(spec, page_id) if is_article else "en",
    }


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("bucket", pa.int32()),  # hash(url) % n_buckets — hive partition dir
        ("b", pa.int32()),  # same value duplicated IN-file: ray's parquet
        # filter binds against the file schema only, so row-group/file
        # pruning needs the column physically present
        ("kind", pa.int32()),  # page kind (article/hub/robots) — hive dir
        ("k", pa.int32()),  # kind duplicated in-file (same reason as b)
    ]
)


def _records_to_table(spec: PagesSpec, ids, n_buckets: int) -> pa.Table:
    recs = [page_record(spec, int(i)) for i in ids]
    cols = {
        "url": pa.array([r["url"] for r in recs], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in recs], pa.timestamp("us")),
        "html": pa.array([r["html"] for r in recs], pa.binary()),
        "text": pa.array([r["text"] for r in recs], pa.string()),
        "lang": pa.array([r["lang"] for r in recs], pa.string()),
        "bucket": pa.array(
            [url_hash64(r["url"]) % n_buckets for r in recs], pa.int32()
        ),
    }
    cols["b"] = cols["bucket"]
    cols["kind"] = pa.array([page_kind(spec, int(i)) for i in ids], pa.int32())
    cols["k"] = cols["kind"]
    return pa.table(cols, schema=PAGES_SCHEMA)


def make_pages_dataset(spec: PagesSpec, n_buckets: int = 16, parallelism: int = -1):
    """Generator-backed pages Dataset: range(n) → map_batches(materialize rows).

    The id space is the only thing that flows from the driver; HTML is
    synthesized inside tasks, so an arbitrarily large corpus streams.
    """
    import ray.data

    ds = ray.data.range(
        spec.n_total_rows, override_num_blocks=parallelism if parallelism > 0 else None
    )

    def gen(batch: pa.Table) -> pa.Table:
        return _records_to_table(spec, batch["id"].to_pylist(), n_buckets)

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=1024)


def write_pages_corpus(spec: PagesSpec, path: str, n_buckets: int = 16) -> str:
    """Materialize the corpus as hash-bucketed Parquet.

    Bucketing by ``hash(url) % n_buckets`` lets the fetch-simulation join
    read only the buckets the current frontier touches (filter pushdown
    on the partition column) instead of scanning the whole web each
    round — the on-disk analogue of routing a fetch to the shard that
    owns the URL. The outer ``kind`` level (article/hub/robots) prunes
    the hub-seed round and the robots prologue down to their own tiny
    partitions — without it both cost a full-corpus scan however few
    pages they fetch.
    """
    ds = make_pages_dataset(spec, n_buckets=n_buckets)
    ds.write_parquet(path, partition_cols=["kind", "bucket"])
    return path


def seed_frontier(spec: PagesSpec) -> list:
    """Initial frontier: every host's front page, in host order — the
    reference analogue of the configured mainURL seed list. ``seq`` is
    the FIFO discovery order (base_plugin.py:335-352)."""
    return [
        {
            "url": hub_url(spec, i),
            "host": host_name(spec, i),
            "pseq": 0,
            "lidx": i,
            "depth": 0,
            "attempts": 0,
        }
        for i in range(spec.n_hosts)
    ]
