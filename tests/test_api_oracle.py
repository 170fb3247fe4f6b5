"""Fast subset of the driver's oracle gate at sf0.001 (the full gate is
scripts/check_oracle.py at sf0.01 — run it before shipping)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
from check_oracle import TABLES, canon, to_pandas  # noqa: E402

from newslookout_ray import api

SF = "/root/testdata/sf0.001"

FAST_QUERIES = [
    "token_count",
    "clean_text",
    "lang_id",
    "dedup_exact",
    "pricing_summary",
    "status_counts",
    "region_rollup",
    "per_key_limit",
    "top_orders",
    "url_kernels",
    "session_windows",
    "asof_join",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(name, con):
    got = canon(to_pandas(api.queries()[name](SF)))
    want = canon(con.sql(api.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    neq = ~(got.eq(want) | (got.isna() & want.isna()))
    assert not neq.any().any(), got.compare(want).head()


@pytest.mark.usefixtures("ray_session")
def test_entry_smoke():
    out = api.entry()
    assert len(out) > 0
    assert {"url", "unique_id", "text", "pubdate"} <= set(out.columns)
