"""Golden content-hash helper for deterministic rows-only queries.

Mirrors scripts/check_oracle.py's canon()+content_hash() exactly so a
pytest pin and a check_oracle pin of the same frame agree: sort columns
by name, stringify object cells, sort rows by all columns, hash the CSV
bytes with fixed float formatting.
"""

from __future__ import annotations

import hashlib


def canon_hash(df) -> str:
    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    payload = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha256(payload).hexdigest()[:16]
