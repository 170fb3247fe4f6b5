"""Small shared utilities."""

from __future__ import annotations

import pyarrow as pa


def collect_table(ds) -> pa.Table:
    """Materialize a (small) Dataset to one Arrow table on the driver.

    ``Dataset.take_all()`` converts row-by-row through Python dicts and is
    catastrophically slow on pandas-block outputs (hundreds of seconds
    for ~10^5 rows in Ray 2.49); pulling block refs and concatenating
    stays in Arrow (milliseconds). Use ONLY for results known to be small
    — this is a driver-side materialization.
    """
    import ray

    tables = []
    for ref in ds.to_arrow_refs():
        t = ray.get(ref)
        if not isinstance(t, pa.Table):
            # Ray hands back raw blocks; (empty) pandas blocks arrive
            # unconverted — normalize through Arrow
            import pandas as pd

            if isinstance(t, pd.DataFrame):
                if t.empty:
                    continue
                t = pa.Table.from_pandas(t, preserve_index=False)
            else:
                raise TypeError(f"unexpected block type {type(t)}")
        if t.num_rows:
            tables.append(t)
    if not tables:
        # preserve schema when possible
        try:
            return pa.Table.from_pylist([], schema=ds.schema().base_schema)
        except Exception:  # noqa: BLE001
            return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")


def table_from_pandas(df) -> pa.Table:
    """``pa.Table.from_pandas`` without the ``b'pandas'`` schema metadata.

    The metadata's dict payload defeats Ray's schema-hash dedup in
    ``unify_schemas`` (pyarrow can't hash a schema whose metadata holds a
    dict), spamming every downstream stage with "Failed to hash the
    schemas" warnings and forcing the slow unify path. Stripping is
    metadata-only (zero-copy) and the engine never round-trips through
    the pandas metadata."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def list_offsets32(n_rows: int, dim: int) -> pa.Array:
    """int32 ``ListArray`` offsets for ``n_rows`` fixed-``dim`` rows with
    an explicit overflow check: a bare ``astype(np.int32)`` on rows×dim
    past 2^31 silently wraps and corrupts the list array. Blocks that
    large must be split upstream (smaller batch_size), so raise loudly
    instead."""
    import numpy as np

    total = n_rows * dim
    if total > np.iinfo(np.int32).max:
        raise OverflowError(
            f"list offsets overflow int32: {n_rows} rows x dim {dim} = {total}"
            " values; reduce the stage's batch_size"
        )
    return pa.array((np.arange(n_rows + 1, dtype=np.int64) * dim).astype(np.int32))


def fb_buckets(default_cpus: int = 16) -> int:
    """~2× cluster CPUs: enough shuffle parallelism, few enough that a
    per-bucket Python call count is O(cpus), not O(keys) — the crawl's
    politeness fb pattern (crawl.py politeness_split)."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", default_cpus))
    except Exception:
        cpus = default_cpus
    return max(8, 2 * cpus)


def collect_rows(ds) -> list:
    """Row dicts via the fast Arrow path (see collect_table)."""
    return collect_table(ds).to_pylist()
