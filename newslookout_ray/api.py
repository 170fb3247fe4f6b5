"""The driver contract surface: queries() + oracle_sql() + entry().

Each entry pairs a Ray-Data-first pipeline (newslookout_ray.pipelines.*)
with an ANSI-SQL oracle DuckDB runs on the same parquet tables. SQL that
mirrors a kernel's data tables (cleanText replacement chain, keyword-flag
regexes, stopword inventories) is GENERATED from the same Python
constants, so the two sides cannot drift.

Determinism rules (why results hash-match):
  - float reductions are avoided: money in half-up integer cents,
    similarity scores floor-truncated, counts/ids exact integers;
  - every computed column is named identically in Ray and SQL;
  - tie-breaks are explicit (id ascending) wherever ordering feeds a cut.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .functions import textkit
from .pipelines import dedup, relational, similarity, textstats

ANN_QUERY_IDS = list(range(10))  # first 10 vec_ids are the ANN query set
ANN_K = 5
JACCARD_THRESHOLD = 0.8
COSINE_THRESHOLD = 0.4


def _read(sf_dir: str, table: str):
    import pyarrow.parquet as pq
    import ray.data

    path = os.path.join(sf_dir, f"{table}.parquet")
    # schema= with the b'pandas' metadata stripped (one driver-side
    # footer read, zero per-block cost): the metadata's dict payload is
    # unhashable, which defeats Ray's schema dedup in unify_schemas and
    # spams "Failed to hash the schemas" from every consuming stage
    return ray.data.read_parquet(path, schema=pq.read_schema(path).remove_metadata())


# ---------------------------------------------------------------------------
# SQL fragment generators (shared-constant mirrors of the kernels)
# ---------------------------------------------------------------------------


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _clean_text_sql_expr(col: str) -> str:
    """The cleanText chain as nested replace()+regexp_replace(), generated
    from the SAME constant tables the kernel uses (textkit.clean_text)."""
    expr = col
    for tok in textkit.CLEAN_REPLACE_WITH_SPACE_1:
        expr = f"replace({expr}, {_sql_quote(tok)}, ' ')"
    for old, new in textkit.CLEAN_REPLACE_PAIRS:
        expr = f"replace({expr}, {_sql_quote(old)}, {_sql_quote(new)})"
    for tok in textkit.CLEAN_REPLACE_WITH_SPACE_2:
        expr = f"replace({expr}, {_sql_quote(tok)}, ' ')"
    expr = (
        f"regexp_replace({expr}, '(\\b[a-zA-Z]{{2,}})(\\.)([A-Z][a-zA-Z])', "
        "'\\1\\2 \\3', 'g')"
    )
    expr = (
        "trim(" + expr + ", ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12))"
    )
    return f"CASE WHEN {col} IS NULL OR length({col}) <= 1 THEN {col} ELSE {expr} END"


def _lang_id_sql() -> str:
    hit_cols = []
    for lang in textstats.LANG_ORDER:
        words = ", ".join(_sql_quote(w) for w in textstats.LANG_STOPWORDS[lang])
        hit_cols.append(
            f"len(list_filter(string_split(text, ' '), x -> x IN ({words}))) AS h_{lang}"
        )
    order = list(textstats.LANG_ORDER)
    m = "greatest(" + ", ".join(f"h_{l}" for l in order) + ")"
    case = f"CASE WHEN {m} = 0 THEN 'und'"
    for lang in order:
        case += f" WHEN h_{lang} = {m} THEN '{lang}'"
    case += " END"
    return f"""
        WITH h AS (SELECT doc_id, lang, {', '.join(hit_cols)} FROM documents)
        SELECT doc_id, lang, {case} AS predicted_lang FROM h
    """


def _keyword_flags_sql() -> str:
    cols = []
    for name, pat in textkit.KEYWORD_FLAG_REGEX.items():
        cols.append(
            f"sum(CASE WHEN regexp_matches(lower(text), {_sql_quote(pat.strip())}) "
            f"THEN 1 ELSE 0 END)::BIGINT AS {name.lower()}"
        )
    return "SELECT " + ", ".join(cols) + " FROM documents"


_SHINGLES_CTE = (
    "s AS (SELECT doc_id, list_distinct(list_transform(range(len(toks)-2), "
    "i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS sh "
    "FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) "
    "WHERE len(toks) >= 3)"
)


# ---------------------------------------------------------------------------
# queries()
# ---------------------------------------------------------------------------


def _q_token_count(sf):
    return textstats.run_token_count(_read(sf, "documents").select_columns(["doc_id", "text"]))


def _q_quality(sf):
    return textstats.run_quality(_read(sf, "documents").select_columns(["doc_id", "text"]))


def _q_lang_id(sf):
    return textstats.run_lang_id(_read(sf, "documents").select_columns(["doc_id", "text", "lang"]))


def _q_fingerprint(sf):
    return textstats.run_fingerprint(_read(sf, "documents").select_columns(["doc_id", "text"]))


def _q_pii_redact(sf):
    return textstats.run_pii_redact(
        _read(sf, "documents").select_columns(["doc_id", "text"])
    )


def _q_repetition(sf):
    return textstats.run_repetition(
        _read(sf, "documents").select_columns(["doc_id", "text"])
    )


def _q_term_topk(sf):
    return textstats.term_topk(
        _read(sf, "documents").select_columns(["text"]), k=50
    )


def _q_boilerplate(sf):
    return textstats.boilerplate_ngrams(
        _read(sf, "documents").select_columns(["doc_id", "text"]), n=5, min_df=2
    )


def _q_clean_text(sf):
    def stage(batch: pa.Table) -> pa.Table:
        cleaned = textkit.clean_text_arrow(batch["text"].combine_chunks())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "clean_text": cleaned,
                "clean_len": pa.compute.cast(pa.compute.utf8_length(cleaned), pa.int64()),
            }
        )

    return (
        _read(sf, "documents")
        .select_columns(["doc_id", "text"])
        .map_batches(stage, batch_format="pyarrow")
    )


def _q_keyword_flags(sf):
    docs = _read(sf, "documents").select_columns(["text"])

    def partial(batch: pa.Table) -> pa.Table:
        flags = textkit.keyword_flags_batch_arrow(batch["text"])
        return pa.table(
            {name.lower(): pa.array([int(arr.sum())], pa.int64()) for name, arr in flags.items()}
        )

    partials = docs.map_batches(partial, batch_format="pyarrow").to_pandas()
    total = partials.sum(axis=0).to_frame().T
    return total.astype("int64")


def _q_dedup_exact(sf):
    return dedup.exact_dedup(_read(sf, "documents").select_columns(["doc_id", "text"]))


def _q_ngram_jaccard(sf):
    return dedup.ngram_jaccard_pairs(
        _read(sf, "documents").select_columns(["doc_id", "text"]),
        threshold=JACCARD_THRESHOLD,
    )


def _q_minhash_lsh(sf):
    return dedup.minhash_lsh_pairs(
        _read(sf, "documents").select_columns(["doc_id", "text"]),
        threshold=JACCARD_THRESHOLD,
    )


def _q_dup_clusters(sf):
    """Duplicate clustering: connected components (min-label propagation)
    over the MinHash-LSH near-dup pairs — each clustered doc mapped to
    its component's minimum id."""
    pairs = dedup.minhash_lsh_pairs(
        _read(sf, "documents").select_columns(["doc_id", "text"]),
        threshold=JACCARD_THRESHOLD,
    )
    return dedup.duplicate_clusters(pairs)


def _q_simhash(sf):
    return dedup.simhash_table(_read(sf, "documents").select_columns(["doc_id", "text"]))


def _q_embedding_near(sf):
    return dedup.embedding_near_pairs(_read(sf, "embeddings"), threshold=COSINE_THRESHOLD)


def _q_ann_topk(sf):
    return similarity.brute_force_topk(_read(sf, "embeddings"), ANN_QUERY_IDS, k=ANN_K)


def _q_pricing(sf):
    return relational.pricing_summary(_read(sf, "lineitem"))


def _q_status_counts(sf):
    return relational.status_counts(_read(sf, "events").select_columns(["event_type"]))


def _q_user_value(sf):
    return relational.user_value_sum(_read(sf, "events").select_columns(["user_id", "value"]))


def _q_window(sf):
    return relational.windowed_counts(
        _read(sf, "events").select_columns(["event_type", "ts", "value"])
    )


def _q_session_windows(sf):
    """Gap-based session windows (30 min) per user over the event log."""
    return relational.session_windows(
        _read(sf, "events").select_columns(["user_id", "event_id", "ts", "value"])
    )


def _q_asof_join(sf):
    """Distributed as-of join: each event ⋈ the latest prior order of
    the same customer (bucketed co-group + pandas.merge_asof)."""
    return relational.asof_join_events_orders(
        _read(sf, "events").select_columns(["user_id", "event_id", "ts"]),
        _read(sf, "orders").select_columns(
            ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
        ),
    )


def _q_range_join(sf):
    """Distributed range join: same-type event pairs within 300 s of
    each other (bucket-replication interval join)."""
    return relational.range_join_event_pairs(
        _read(sf, "events").select_columns(["event_id", "ts", "event_type"]),
        tolerance_sec=300,
    )


def _q_region_rollup(sf):
    return relational.region_customer_rollup(
        _read(sf, "customer"), _read(sf, "nation"), _read(sf, "region")
    )


def _q_priority_revenue(sf):
    return relational.priority_revenue(_read(sf, "orders"), _read(sf, "lineitem"))


def _q_per_key_limit(sf):
    return relational.per_key_limit(_read(sf, "events"), k=5)


def _q_first_occurrence(sf):
    return relational.first_occurrence(_read(sf, "events"))


def _q_top_orders(sf):
    return relational.top_orders(_read(sf, "orders"), k=20)


def _q_url_kernels(sf):
    """U1/U9/U7 over URLs synthesized from documents (the same expression
    appears in the oracle SQL, so the kernels are cross-checked)."""
    from .functions import urlkit

    def stage(batch: pa.Table) -> pa.Table:
        pcm = pa.compute
        url_raw = pcm.binary_join_element_wise(
            pa.array(["HTTPS://WWW."] * len(batch)),
            pcm.utf8_upper(batch["source"].combine_chunks()),
            pa.array([".COM/News/Story-"] * len(batch)),
            pcm.cast(batch["doc_id"], pa.string()),
            "",
        )
        url = urlkit.normalize_url_arrow(url_raw)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "url": url,
                "host": urlkit.host_arrow(url),
            }
        )

    return _read(sf, "documents").select_columns(["doc_id", "source"]).map_batches(
        stage, batch_format="pyarrow"
    )


def _q_site_extracts(sf):
    """Per-site profile extraction over the reference's own bz2 fixture
    pages (ecotimes/hindu/ndtv) as a Ray pipeline: a 3-row dataset of
    (module, url, html) through a map_batches extraction stage keyed by
    module — the Ray form of the reference's test_mod_en_in_*.py runs.
    Rows-only check (expected values pinned in
    tests/test_profiles_reference.py)."""
    import bz2 as _bz2

    import ray.data

    from .stages.extract import process_fetched_page
    from .stages.profiles import PROFILES, CompiledProfile

    fixture_dir = "/root/reference/test-data"
    cases = [
        (
            "mod_en_in_ecotimes",
            "mod_en_in_ecotimes_73837853.html.bz2",
            "https://economictimes.indiatimes.com/markets/expert-view/"
            "a-reasonable-budget-but-still-unclear-on-fiscal-deficit-front-swaminathan-aiyar/"
            "articleshow/73837853.cms",
        ),
        (
            "mod_en_in_hindu",
            "mod_en_in_hindu_30713792.html.bz2",
            "https://www.thehindu.com/business/budget/"
            "16-point-action-plan-for-agriculture-evokes-mixed-response/article30713792.ece",
        ),
        (
            "mod_en_in_ndtv",
            "mod_en_in_ndtv_2373245.html.bz2",
            "https://www.ndtv.com/business/"
            "dollar-rises-on-us-recovery-hopes-bitcoin-hits-near-record-52-640-2373245",
        ),
        (
            "mod_en_in_business_std",
            "mod_en_in_business_std_119011800410.html.bz2",
            "https://www.business-standard.com/article/pti-stories/"
            "mukesh-ambani-urges-pm-to-take-steps-against-data-colonisation-119011800410_1.html",
        ),
        (
            "mod_en_in_livemint",
            "mod_en_in_livemint_11613646112891.html.bz2",
            "https://www.livemint.com/money/personal-finance/"
            "term-insurance-policy-premium-likely-to-get-costlier-11613646112891.html",
        ),
        (
            "mod_en_in_moneycontrol",
            "mod_en_in_moneycontrol_6541471.html.bz2",
            "https://www.moneycontrol.com/news/business/ipo/"
            "zomato-ipo-improving-economics-growth-plans-and-strong-investor-appetite-7173681.html",
        ),
        (
            "mod_en_in_timesofindia",
            "mod_en_in_timesofindia_0xa2097d6c.html.bz2",
            "https://timesofindia.indiatimes.com/blogs/toi-edit-page/"
            "as-communal-riots-exploded-in-delhi-elected-representatives-were-missing"
            "-on-the-ground-when-residents-needed-them-most/",
        ),
        (
            "mod_en_in_forbes",
            "mod_en_in_forbes_69073.html.bz2",
            "https://www.forbesindia.com/article/take-one-big-story-of-the-day/"
            "dbs-bank-india-gaining-muscle-with-lvb/69123/1",
        ),
        (
            "mod_en_in_indiakanoon",
            "mod_en_in_indiakanoon_49865912.html.bz2",
            "https://indiankanoon.org/doc/49865912/",
        ),
        (
            "mod_en_in_inexp_business",
            "mod_en_in_inexp_business_2238510.html.bz2",
            "https://www.newindianexpress.com/world/2021/feb/01/"
            "myanmar-coup-biden-demands-military-cede-power-orders-sanctions-review-2258178.html",
        ),
    ]
    rows = []
    for module, fixture, url in cases:
        with _bz2.open(f"{fixture_dir}/{fixture}", "rb") as fh:
            rows.append({"module": module, "url": url, "html": fh.read()})

    class SiteExtract:
        def __init__(self):
            self.cps = {name: CompiledProfile(p) for name, p in PROFILES.items()}

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = {
                "module": [], "url": [], "unique_id": [], "pubdate": [],
                "title_len": [], "text_size": [], "n_links": [],
                "authors": [], "industries": [], "n_keywords": [],
            }
            for i in range(batch.num_rows):
                module = batch["module"][i].as_py()
                url = batch["url"][i].as_py()
                rec = process_fetched_page(self.cps[module], url, batch["html"][i].as_py())
                out["module"].append(module)
                out["url"].append(url)
                out["unique_id"].append(rec["unique_id"])
                out["pubdate"].append(rec["pubdate"])
                out["title_len"].append(len(rec["title"]))
                out["text_size"].append(rec["text_size"])
                out["n_links"].append(len(rec["links"]))
                out["authors"].append(rec["authors"])
                out["industries"].append(rec["industries"])
                out["n_keywords"].append(len(rec["keywords"]))
            return pa.table(
                {
                    "module": pa.array(out["module"], pa.string()),
                    "url": pa.array(out["url"], pa.string()),
                    "unique_id": pa.array(out["unique_id"], pa.string()),
                    "pubdate": pa.array(out["pubdate"], pa.date32()),
                    "title_len": pa.array(out["title_len"], pa.int64()),
                    "text_size": pa.array(out["text_size"], pa.int64()),
                    "n_links": pa.array(out["n_links"], pa.int64()),
                    "authors": pa.array(out["authors"], pa.list_(pa.string())),
                    "industries": pa.array(out["industries"], pa.list_(pa.string())),
                    "n_keywords": pa.array(out["n_keywords"], pa.int64()),
                }
            )

    return ray.data.from_items(rows).map_batches(
        SiteExtract, batch_format="pyarrow", concurrency=1
    )


def _q_gdelt_urls(sf):
    """S6: GDELT zipped-TSV aggregator ingestion over the reference's own
    fixture archive (rows-only; kernel-vs-pandas parity is pinned in
    tests/test_archives.py)."""
    from .sources.archives import gdelt_urls

    return gdelt_urls(["/root/reference/test-data/mod_in_gdelt_20210203.zip"], "IN")


def _run_q_crawl(sf) -> str:
    """Run the deterministic flagship crawl over pages wrapping the sf
    dir's document texts; returns the checkpoint dir its output views
    (read_articles / read_articles_ds) read from."""
    from .pipelines.crawl import CrawlConfig, run_crawl
    from .sources.pages import PagesSpec, write_pages_corpus

    # sort by doc_id: take_all() block order is nondeterministic under the
    # streaming executor, and the corpus must be a pure function of the input
    from .util import collect_rows

    texts = tuple(
        r["text"]
        for r in sorted(
            collect_rows(_read(sf, "documents").select_columns(["doc_id", "text"])),
            key=lambda r: r["doc_id"],
        )
    )
    tag = os.path.basename(os.path.normpath(sf))
    root = f"/tmp/newslookout_ray/q_crawl_{tag}"
    spec = PagesSpec(n_pages=300, n_hosts=10, seed=42, text_pool=texts)
    cfg = CrawlConfig(
        rounds=2,
        per_host_budget=10,
        num_seen_shards=4,
        checkpoint_dir=os.path.join(root, "ckpt"),
        n_page_buckets=4,
        extract_concurrency=2,
        join_partitions=2,
    )
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    write_pages_corpus(spec, os.path.join(root, "pages"), n_buckets=4)
    run_crawl(os.path.join(root, "pages"), spec, cfg)
    return cfg.checkpoint_dir


def _q_crawl_articles(sf):
    """Flagship: a small deterministic crawl whose pages wrap the sf dir's
    document texts; returns the extracted articles (rows-only check —
    byte-identity vs the sequential simulator is proven in pytest)."""
    from .pipelines.crawl import read_articles

    table = read_articles(_run_q_crawl(sf))
    return table.select(["url", "host", "unique_id", "pubdate", "title", "text", "state"]).sort_by(
        "url"
    )


def _q_rss_links(sf):
    """S1 round-trip: build one RSS feed per source from the documents
    table (deterministic xml), parse with the RSS kernel → (source, url).
    The oracle regenerates the same links relationally."""
    from .sources.feeds import build_rss_xml, parse_rss_links

    def stage(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {"doc_id": batch["doc_id"].to_pylist(), "source": batch["source"].to_pylist()}
        )
        out_src, out_url = [], []
        for source, grp in df.groupby("source", sort=True):
            links = [
                f"https://www.{source}.com/news/story-{d}"
                for d in sorted(grp["doc_id"])
            ]
            xml = build_rss_xml(source, links)
            for link in parse_rss_links(xml):
                out_src.append(source)
                out_url.append(link)
        return pa.table(
            {"source": pa.array(out_src, pa.string()), "url": pa.array(out_url, pa.string())}
        )

    # repartition(1): each feed must be built from ALL of its source's
    # docs — source count is tiny, so a single builder task is the
    # broadcast-small-side choice, not a shuffle
    return _read(sf, "documents").select_columns(["doc_id", "source"]).repartition(
        1
    ).map_batches(stage, batch_format="pyarrow", batch_size=None)


def _q_date_urls(sf):
    """S4 kernel parity: business-day URL generation (pure function —
    oracle mirrors it with generate_series + weekday filter)."""
    from .sources.feeds import business_day_urls

    urls = business_day_urls(
        "https://www.example.in/content/PR%d%m%y.zip", "2021-02-26", 30
    )
    return pa.table({"url": pa.array(urls, pa.string())})


def _q_aggregator_route(sf):
    """S6+U14: synthesize aggregator URLs from documents, route each to
    its owning profile by host (broadcast domain map)."""
    import ray

    from .functions.urlkit import get_host
    from .sources.feeds import route_urls_to_profiles

    from .util import collect_table

    sources = sorted(
        set(collect_table(_read(sf, "documents").select_columns(["source"]))["source"].to_pylist())
    )
    domain_map = {
        f"www.{s}.com": ("profile_even" if int(s[3:]) % 2 == 0 else "profile_odd")
        for s in sources
    }
    ref = ray.put(domain_map)

    def stage(batch: pa.Table) -> pa.Table:
        dmap = ray.get(ref)
        urls = [
            f"https://www.{s}.com/news/story-{d}"
            for s, d in zip(batch["source"].to_pylist(), batch["doc_id"].to_pylist())
        ]
        routed = route_urls_to_profiles(urls, dmap)
        return pa.table(
            {
                "url": pa.array([u for u, _ in routed], pa.string()),
                "profile": pa.array([p for _, p in routed], pa.string()),
            }
        )

    return _read(sf, "documents").select_columns(["doc_id", "source"]).map_batches(
        stage, batch_format="pyarrow"
    )


def _q_lsh_ann_topk(sf):
    """ANN scale path: multi-table hyperplane-LSH bucketed top-k
    (approximate by design → rows-only; recall vs brute force is
    test-measured)."""
    return similarity.lsh_topk(_read(sf, "embeddings"), ANN_QUERY_IDS, k=ANN_K)


def _q_embedding_near_lsh(sf):
    """Distributed embedding near-dup scale path (LSH-bucketed pair
    generation; nothing driver-side). The sf testdata's true pairs all
    sit at cosine 0.4-0.6 — the hardest LSH regime — so the query runs
    wide-recall params (3 bits x 12 tables); precision is exact by
    construction and recall vs the exact baseline is test-measured
    (approximate by design → rows-only)."""
    return dedup.embedding_near_pairs_lsh(
        _read(sf, "embeddings"), threshold=COSINE_THRESHOLD, bits=3, tables=12
    )


def _q_ivf_ann_topk(sf):
    """ANN scale path #2: IVF-flat (spherical-kmeans coarse quantizer,
    nprobe inverted-list probing; approximate by design → rows-only;
    recall vs brute force is test-measured)."""
    return similarity.ivf_topk(_read(sf, "embeddings"), ANN_QUERY_IDS, k=ANN_K)


def _q_ivf_ann_topk_indexed(sf):
    """ANN scale path #3: the MATERIALIZED IVF index — assignment written
    as a hive partition column, probe-pruned read (only the probed
    list_id directories are scanned). Output equals ivf_topk with the
    same params (test-asserted); approximate by design → rows-only."""
    import shutil
    import tempfile

    tag = os.path.basename(os.path.normpath(sf))
    # per-run unique dir: a fixed world-writable /tmp path lets two
    # concurrent runs clobber each other's index mid-query (and rmtree
    # on a shared predictable path is a symlink hazard)
    path = tempfile.mkdtemp(prefix=f"ivf_index_{tag}_")
    try:
        similarity.ivf_build_index(_read(sf, "embeddings"), path)
        # materialize before cleanup: the top-k result is tiny but reads
        # lazily from the index files the finally below removes
        return similarity.ivf_topk_indexed(path, ANN_QUERY_IDS, k=ANN_K).materialize()
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _q_simhash_pairs(sf):
    """SimHash near-dup pairs (banded blocking + exact hamming verify)."""
    return dedup.simhash_near_pairs(
        _read(sf, "documents").select_columns(["doc_id", "text"]), max_hamming=12
    )


def _q_media_features(sf):
    """Multimodal plumbing: synthetic binary payloads → actor featurizer
    (decode is the documented stub slot)."""
    from .pipelines.multimodal import media_features

    return media_features(n=500, seed=42)


def _q_processed_articles(sf):
    """Flagship + processor chain: crawl articles → priority-ordered
    processors (dataprep, trigger-word flags, sentiment stub, within-date
    near-dedup). The chain is fed by the STREAMING articles view
    (read_articles_ds) — crawl output never materializes driver-side on
    the way into downstream pipelines; only the final small result does
    (for the deterministic sort the driver compare needs)."""
    from .pipelines.crawl import read_articles_ds
    from .pipelines.processors import run_processor_chain

    def add_module(t: pa.Table) -> pa.Table:
        return t.append_column(
            "module", pa.array(["synthetic"] * t.num_rows, pa.string())
        )

    ckpt = _run_q_crawl(sf)
    ds = read_articles_ds(
        ckpt, columns=["url", "host", "unique_id", "pubdate", "title", "text"]
    ).map_batches(add_module, batch_format="pyarrow")
    out = run_processor_chain(ds, concurrency=2)
    return out.to_pandas().sort_values("url").reset_index(drop=True)


QUERIES = {
    "token_count": _q_token_count,
    "quality_score": _q_quality,
    "lang_id": _q_lang_id,
    "fingerprint": _q_fingerprint,
    "clean_text": _q_clean_text,
    "pii_redact": _q_pii_redact,
    "repetition": _q_repetition,
    "term_topk": _q_term_topk,
    "boilerplate_ngrams": _q_boilerplate,
    "keyword_flags": _q_keyword_flags,
    "dedup_exact": _q_dedup_exact,
    "dedup_ngram_jaccard": _q_ngram_jaccard,
    "dedup_minhash_lsh": _q_minhash_lsh,
    "dedup_simhash": _q_simhash,
    "dup_clusters": _q_dup_clusters,
    "dedup_embedding": _q_embedding_near,
    "dedup_embedding_lsh": _q_embedding_near_lsh,
    "ann_topk": _q_ann_topk,
    "pricing_summary": _q_pricing,
    "status_counts": _q_status_counts,
    "user_value_sum": _q_user_value,
    "windowed_counts": _q_window,
    "session_windows": _q_session_windows,
    "asof_join": _q_asof_join,
    "range_join": _q_range_join,
    "region_rollup": _q_region_rollup,
    "priority_revenue": _q_priority_revenue,
    "per_key_limit": _q_per_key_limit,
    "first_occurrence": _q_first_occurrence,
    "top_orders": _q_top_orders,
    "url_kernels": _q_url_kernels,
    "crawl_articles": _q_crawl_articles,
    "site_extracts": _q_site_extracts,
    "gdelt_urls": _q_gdelt_urls,
    "rss_links": _q_rss_links,
    "date_urls": _q_date_urls,
    "aggregator_route": _q_aggregator_route,
    "lsh_ann_topk": _q_lsh_ann_topk,
    "ivf_ann_topk": _q_ivf_ann_topk,
    "ivf_ann_topk_indexed": _q_ivf_ann_topk_indexed,
    "simhash_pairs": _q_simhash_pairs,
    "media_features": _q_media_features,
    "processed_articles": _q_processed_articles,
}


# ---------------------------------------------------------------------------
# oracle_sql()
# ---------------------------------------------------------------------------


def _oracle_sql() -> dict:
    sql = {}
    sql["token_count"] = f"""
        SELECT doc_id,
          CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) = ''
               THEN 0
               ELSE len(string_split_regex(
                      trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                      '\\s+')) END::BIGINT AS n_ws_tokens,
          len(regexp_extract_all(text, {_sql_quote(textstats.BPE_TOKEN_PATTERN)}))::BIGINT
            AS n_bpe_tokens
        FROM documents
    """
    sql["quality_score"] = """
        WITH f AS (
          SELECT doc_id,
            length(text)::BIGINT AS n_chars,
            CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)) = ''
                 THEN 0
                 ELSE len(string_split_regex(
                        trim(text, ' ' || chr(9) || chr(10) || chr(13) || chr(11) || chr(12)),
                        '\\s+')) END::BIGINT AS n_tokens,
            len(regexp_extract_all(text, '[0-9]'))::BIGINT AS digit_chars,
            len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::BIGINT AS symbol_chars
          FROM documents)
        SELECT doc_id, n_chars, n_tokens, digit_chars, symbol_chars,
          greatest(0, least(100,
            60 + least(n_tokens, 200) // 5
               - digit_chars * 100 // greatest(n_chars, 1)
               - symbol_chars * 100 // greatest(n_chars, 1)))::BIGINT AS quality
        FROM f
    """
    sql["lang_id"] = _lang_id_sql()
    sql["clean_text"] = f"""
        SELECT doc_id,
          {_clean_text_sql_expr('text')} AS clean_text,
          length({_clean_text_sql_expr('text')})::BIGINT AS clean_len
        FROM documents
    """
    sql["keyword_flags"] = _keyword_flags_sql()
    pii_count_cols = ", ".join(
        f"len(regexp_extract_all(text, {_sql_quote(pat)}))::BIGINT AS n_{name}"
        for name, pat, _ in textstats.PII_PATTERNS
    )
    pii_expr = "text"
    for _, pat, repl in textstats.PII_PATTERNS:
        pii_expr = (
            f"regexp_replace({pii_expr}, {_sql_quote(pat)}, {_sql_quote(repl)}, 'g')"
        )
    sql["pii_redact"] = f"""
        SELECT doc_id, {pii_count_cols}, {pii_expr} AS redacted FROM documents
    """
    sql["repetition"] = """
        WITH g AS (
          SELECT doc_id,
            CASE WHEN len(toks) >= 3
                 THEN list_transform(range(len(toks)-2),
                                     i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])
                 ELSE [] END AS ng
          FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
        SELECT doc_id, len(ng)::BIGINT AS n_ngrams,
          len(list_distinct(ng))::BIGINT AS n_distinct,
          CASE WHEN len(ng) = 0 THEN 0
               ELSE (len(ng) - len(list_distinct(ng))) * 1000000 // len(ng)
          END::BIGINT AS dup_ppm
        FROM g
    """
    sql["boilerplate_ngrams"] = """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        g AS (SELECT doc_id,
                list_distinct(CASE WHEN len(toks) >= 5
                  THEN list_transform(range(len(toks)-4),
                       i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                            || ' ' || toks[i+4] || ' ' || toks[i+5])
                  ELSE [] END) AS ng
              FROM t),
        p AS (SELECT doc_id, unnest(ng) AS gram FROM g),
        df AS (SELECT gram, count(*)::BIGINT AS df FROM p GROUP BY gram),
        j AS (SELECT p.doc_id, count(*)::BIGINT AS n_distinct,
                     sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_boiler
              FROM p JOIN df USING (gram) GROUP BY p.doc_id)
        SELECT doc_id, n_distinct, n_boiler,
               (n_boiler * 1000000 // n_distinct)::BIGINT AS boiler_ppm
        FROM j
    """
    sql["term_topk"] = """
        WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        c AS (SELECT term, count(*)::BIGINT AS n FROM t WHERE term <> '' GROUP BY term),
        r AS (SELECT row_number() OVER (ORDER BY n DESC, term ASC) AS rank, term, n FROM c)
        SELECT rank::BIGINT AS rank, term, n FROM r WHERE rank <= 50
    """
    sql["dedup_exact"] = """
        SELECT min(doc_id) AS keeper_id, count(*)::BIGINT AS n_dups
        FROM documents GROUP BY text
    """
    sql["dedup_ngram_jaccard"] = f"""
        WITH {_SHINGLES_CTE}
        SELECT a.doc_id AS a, b.doc_id AS b,
          floor(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / len(list_distinct(list_concat(a.sh, b.sh))) * 1000000) / 1000000 AS jaccard
        FROM s a JOIN s b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
              / len(list_distinct(list_concat(a.sh, b.sh))) >= {JACCARD_THRESHOLD}
    """
    sql["dedup_minhash_lsh"] = sql["dedup_ngram_jaccard"]  # LSH must find the same pairs here
    sql["dup_clusters"] = f"""
        WITH RECURSIVE {_SHINGLES_CTE},
        e AS (
          SELECT a.doc_id AS a, b.doc_id AS b
          FROM s a JOIN s b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / len(list_distinct(list_concat(a.sh, b.sh))) >= {JACCARD_THRESHOLD}),
        und AS (SELECT a AS u, b AS v FROM e UNION SELECT b, a FROM e),
        reach(u, v) AS (
          SELECT u, v FROM und
          UNION
          SELECT r.u, d.v FROM reach r JOIN und d ON r.v = d.u)
        SELECT u AS doc_id, least(u, min(v))::BIGINT AS cluster_id
        FROM reach GROUP BY u
    """
    sql["dedup_embedding"] = f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        SELECT a.vec_id AS a, b.vec_id AS b,
          floor(list_cosine_similarity(a.v, b.v) * 10000) / 10000 AS cosine
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= {COSINE_THRESHOLD}
    """
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    sql["ann_topk"] = f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT * FROM e WHERE vec_id IN ({ids})),
        scored AS (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
            floor(list_cosine_similarity(q.v, e.v) * 1000000) / 1000000 AS cosine,
            row_number() OVER (PARTITION BY q.vec_id
              ORDER BY list_cosine_similarity(q.v, e.v) DESC, e.vec_id ASC) AS rank
          FROM q JOIN e ON q.vec_id != e.vec_id)
        SELECT query_id, neighbor_id, cosine, rank::BIGINT AS rank
        FROM scored WHERE rank <= {ANN_K}
    """
    sql["pricing_summary"] = """
        SELECT l_returnflag, l_linestatus,
          CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
          sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))::BIGINT AS sum_base_cents,
          sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT))::BIGINT
            AS sum_disc_cents,
          count(*)::BIGINT AS n_rows
        FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """
    sql["status_counts"] = (
        "SELECT event_type, count(*)::BIGINT AS n FROM events GROUP BY event_type"
    )
    sql["user_value_sum"] = """
        SELECT user_id,
          sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS value_cents,
          count(*)::BIGINT AS n
        FROM events GROUP BY user_id
    """
    sql["windowed_counts"] = """
        SELECT event_type, date_trunc('hour', ts) AS window_start,
          count(*)::BIGINT AS n,
          sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS value_cents
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    """
    sql["session_windows"] = """
        WITH e AS (
          SELECT user_id, event_id, ts,
            CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_c,
            CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                      > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
          FROM events),
        s AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM e)
        SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
               count(*)::BIGINT AS n_events, sum(value_c)::BIGINT AS value_cents
        FROM s GROUP BY user_id, sid
    """
    sql["asof_join"] = """
        WITH j AS (
          SELECT e.event_id, e.user_id, e.ts,
                 o.o_orderkey, o.o_orderdate, o.o_totalprice,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
          FROM events e JOIN orders o
            ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
        SELECT event_id, user_id, ts,
               o_orderkey AS asof_orderkey, o_orderdate AS asof_orderdate,
               o_totalprice AS asof_totalprice
        FROM j WHERE rn = 1
    """
    sql["range_join"] = """
        SELECT a.event_id AS left_id, b.event_id AS right_id, a.event_type,
               (epoch_us(b.ts) - epoch_us(a.ts))::BIGINT AS gap_us
        FROM events a JOIN events b
          ON a.event_type = b.event_type
         AND (a.ts < b.ts OR (a.ts = b.ts AND a.event_id < b.event_id))
         AND b.ts <= a.ts + INTERVAL 300 SECOND
    """
    sql["region_rollup"] = """
        SELECT r.r_name,
          count(*)::BIGINT AS customers,
          sum(CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT))::BIGINT AS acctbal_cents
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """
    sql["priority_revenue"] = """
        WITH li AS (
          SELECT l_orderkey,
            sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT))
              AS rev_c
          FROM lineitem GROUP BY l_orderkey)
        SELECT o.o_orderpriority,
          sum(li.rev_c)::BIGINT AS revenue_cents, count(*)::BIGINT AS orders
        FROM orders o JOIN li ON o.o_orderkey = li.l_orderkey
        GROUP BY o.o_orderpriority
    """
    sql["per_key_limit"] = """
        WITH ranked AS (
          SELECT user_id, event_id,
            row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rank
          FROM events)
        SELECT user_id, event_id, rank::BIGINT AS rank FROM ranked WHERE rank <= 5
    """
    sql["first_occurrence"] = """
        SELECT user_id, event_type, min(event_id) AS first_event
        FROM events GROUP BY user_id, event_type
    """
    sql["top_orders"] = """
        SELECT o_orderkey,
          CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
          o_orderpriority
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """
    sql["url_kernels"] = """
        SELECT doc_id,
          lower('HTTPS://WWW.' || upper(source) || '.COM/News/Story-' || doc_id) AS url,
          regexp_replace(
            lower('HTTPS://WWW.' || upper(source) || '.COM/News/Story-' || doc_id),
            '^[a-z][a-z0-9+.\\-]*://([^/?#]*).*$', '\\1') AS host
        FROM documents
    """
    sql["rss_links"] = """
        SELECT source, 'https://www.' || source || '.com/news/story-' || doc_id AS url
        FROM documents
    """
    sql["date_urls"] = """
        SELECT strftime(d::DATE, 'https://www.example.in/content/PR%d%m%y.zip') AS url
        FROM generate_series(DATE '2021-01-28', DATE '2021-02-26', INTERVAL 1 DAY) t(d)
        WHERE dayofweek(d::DATE) BETWEEN 1 AND 5
    """
    sql["aggregator_route"] = """
        SELECT 'https://www.' || source || '.com/news/story-' || doc_id AS url,
          CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
               THEN 'profile_even' ELSE 'profile_odd' END AS profile
        FROM documents
    """
    # fingerprint / simhash / crawl+processor / lsh-ann / media: not
    # SQL-expressible (iterative hashing, distributed crawl state,
    # approximate-by-design, stubbed decode) → rows-only checks.
    return sql


def queries() -> dict:
    return dict(QUERIES)


def oracle_sql() -> dict:
    return _oracle_sql()


def entry():
    """Flagship smoke: crawl over pages wrapping sf0.001 documents.

    Returns pandas (the driver contract is Dataset | DataFrame; the
    crawl's article view is a small checkpoint-backed Arrow table)."""
    return _q_crawl_articles("/root/testdata/sf0.001").to_pandas()
