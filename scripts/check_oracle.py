"""Local mirror of the driver's CORRECTNESS gate: run every queries()
entry and its oracle_sql() side-by-side at sf0.01 (or --sf), compare
row count, schema (column names), and order-insensitive values.

The comparison sorts columns by name and rows by all columns, then
requires exact cell equality AND exact dtype equality (no dtype
normalization — a DuckDB HUGEINT->float64 vs Ray int64 mismatch, or a
timestamp[s] vs [us] mismatch, must FAIL here exactly as it fails the
driver's value hash).

Rows-only queries (no oracle_sql entry) are additionally locked against
golden content hashes pinned at sf0.01 in scripts/golden_sf001.json:
the driver's check is rows-only for them, so the pin is what turns
"returns rows" into "returns the SAME rows as when the operator was
verified". Regenerate pins with --pin after an intentional change.

Usage: python scripts/check_oracle.py [--sf DIR] [--pin] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

GOLDEN_PATH = Path(__file__).resolve().parent / "golden_sf001.json"
GOLDEN_SF = "/root/testdata/sf0.01"


def content_hash(df) -> str:
    """Deterministic content hash of a canonicalized frame: csv bytes
    with fixed float formatting (canon() already sorted rows/columns)."""
    payload = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result
    raise TypeError(type(result))


def canon(df):
    """Sort columns by name, rows by all columns. NO dtype coercion:
    dtypes are compared as-is so representation mismatches surface here."""
    import pandas as pd

    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import duckdb
    import ray

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = GOLDEN_SF
    pin = "--pin" in sys.argv
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf":
            sf = sys.argv[1:][i + 1]
            args = [x for x in args if x != sf]

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from newslookout_ray import api

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    queries = api.queries()
    oracles = api.oracle_sql()
    names = args or list(queries)
    golden = json.loads(GOLDEN_PATH.read_text()) if GOLDEN_PATH.exists() else {}
    new_pins = {}
    failures = []
    for name in names:
        t0 = time.time()
        try:
            got = canon(to_pandas(queries[name](sf)))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: ray side raised {exc!r}")
            failures.append(name)
            continue
        wall = time.time() - t0
        if name not in oracles:
            # golden-pin regression lock for rows-only queries (at the
            # pinned scale factor only — hashes are sf-specific)
            if sf == GOLDEN_SF:
                h = content_hash(got)
                if pin:
                    new_pins[name] = h
                    print(f"pin  {name}: {h} ({len(got)} rows, {wall:.1f}s)")
                elif name in golden:
                    if h == golden[name]:
                        print(f"ok   {name}: rows-only, golden hash {h} matches "
                              f"({len(got)} rows, {wall:.1f}s)")
                    else:
                        print(f"FAIL {name}: rows-only golden hash drifted "
                              f"(got {h}, pinned {golden[name]}) — intentional? "
                              f"re-pin with --pin")
                        failures.append(name)
                else:
                    print(f"ok   {name}: rows-only, UNPINNED ({len(got)} rows, "
                          f"{wall:.1f}s) — run --pin to lock")
            else:
                print(f"ok   {name}: rows-only ({len(got)} rows, {wall:.1f}s)")
            continue
        want = canon(con.sql(oracles[name]).df())
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"schema ray={list(got.columns)} sql={list(want.columns)}")
        elif not got.dtypes.equals(want.dtypes):
            diff = {
                c: (str(got.dtypes[c]), str(want.dtypes[c]))
                for c in got.columns
                if got.dtypes[c] != want.dtypes[c]
            }
            status.append(f"dtypes ray-vs-sql differ: {diff}")
        elif len(got) != len(want):
            status.append(f"rows ray={len(got)} sql={len(want)}")
        else:
            neq = ~(got.eq(want) | (got.isna() & want.isna()))
            if neq.any().any():
                bad_cols = [c for c in got.columns if neq[c].any()]
                idx = neq.any(axis=1).idxmax()
                status.append(
                    f"values differ in {bad_cols}; first row {idx}: "
                    f"ray={got.loc[idx].to_dict()} sql={want.loc[idx].to_dict()}"
                )
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"ok   {name}: {len(got)} rows match exactly ({wall:.1f}s)")
    print()
    if pin and new_pins:
        merged = {**golden, **new_pins}
        GOLDEN_PATH.write_text(json.dumps(merged, indent=1, sort_keys=True) + "\n")
        print(f"pinned {len(new_pins)} golden hashes -> {GOLDEN_PATH}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print(f"all {len(names)} queries match their oracles")


if __name__ == "__main__":
    main()
