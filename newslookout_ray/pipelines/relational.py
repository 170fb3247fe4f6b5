"""Relational operator pipelines over the TPC-H-ish testdata tables —
the engine-competence surface (aggregations A1-A4, joins J2/J3, ordered
limits O2, first-occurrence U8, windowed aggregation).

Design rules applied throughout (scale notes):
  - money sums are computed in integer CENTS (``round(x*100)`` per row,
    int64 sums) so results are order-independent and bit-exact vs the
    DuckDB oracle — no floating-point reduction-order drift;
  - every groupby is fed by a combiner: per-batch partial aggregates in
    ``map_batches`` so the shuffle moves one row per key per batch;
  - small dimension tables are broadcast (``ray.put``) and joined with a
    per-batch pandas merge — no shuffle (J2);
  - the one genuinely wide join (orders ⋈ lineitem) uses the engine's
    hash-partitioned Dataset.join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..util import fb_buckets as _fb_buckets, table_from_pandas as _table_from_pandas


def _cents(col) -> pa.Array:
    """Half-up integer cents: floor(x*100 + 0.5). Arrow's round() is
    half-to-even while DuckDB's is half-away — floor(+0.5) is the one
    form both engines compute identically on the same doubles."""
    return pc.cast(pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)), pa.int64())


# ---------------------------------------------------------------------------
# A-series aggregates
# ---------------------------------------------------------------------------


def pricing_summary(lineitem, cutoff: str = "1998-09-01"):
    """TPC-H Q1-shaped pricing summary in integer cents.

    → l_returnflag, l_linestatus, sum_qty, sum_base_cents,
      sum_disc_cents, n_rows
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less(batch["l_shipdate"], pa.scalar(np.datetime64(cutoff, "us"))))
        base_c = _cents(batch["l_extendedprice"])
        disc_c = _cents(
            pc.multiply(batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"]))
        )
        df = pd.DataFrame(
            {
                "l_returnflag": batch["l_returnflag"].to_pylist(),
                "l_linestatus": batch["l_linestatus"].to_pylist(),
                "qty": batch["l_quantity"].to_numpy(),
                "base_c": base_c.to_numpy(),
                "disc_c": disc_c.to_numpy(),
            }
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"),
            sum_base_cents=("base_c", "sum"),
            sum_disc_cents=("disc_c", "sum"),
            n_rows=("qty", "size"),
        )
        return _table_from_pandas(g)

    from ray.data.aggregate import Sum

    agg = (
        lineitem.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_cents", alias_name="sum_disc_cents"),
            Sum("n_rows", alias_name="n_rows"),
        )
    )

    def cast_types(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("sum_qty"),
            "sum_qty",
            pc.cast(pc.round(t["sum_qty"]), pa.int64()),
        )

    return agg.map_batches(cast_types, batch_format="pyarrow")


def status_counts(events):
    """A2 analogue: count per event_type (combiner + groupby-sum)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"event_type": batch["event_type"].to_pylist()})
        g = df.groupby("event_type", as_index=False).size().rename(columns={"size": "n"})
        return _table_from_pandas(g)

    from ray.data.aggregate import Sum

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"))
    )


def user_value_sum(events):
    """A1 analogue: per-user sum(value) in cents."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "value_c": _cents(batch["value"]).to_numpy(),
            }
        )
        g = df.groupby("user_id", as_index=False).agg(value_cents=("value_c", "sum"), n=("value_c", "size"))
        return _table_from_pandas(g)

    from ray.data.aggregate import Sum

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("value_cents", alias_name="value_cents"), Sum("n", alias_name="n"))
    )


def windowed_counts(events):
    """Streaming-shaped tumbling window: per (event_type, hour) count +
    cents sum. Event time is a column; the window key is derived
    per-batch (no watermark machinery — the table is a closed log)."""

    def partial(batch: pa.Table) -> pa.Table:
        # Cast to [us] so the final dtype matches DuckDB's date_trunc output
        # (driver hash compares un-normalized dtypes; [s] vs [us] mismatches).
        hour = pc.cast(pc.floor_temporal(batch["ts"], unit="hour"), pa.timestamp("us"))
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pylist(),
                "window_start": hour.to_pandas(),
                "value_c": _cents(batch["value"]).to_numpy(),
            }
        )
        g = df.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("value_c", "size"), value_cents=("value_c", "sum")
        )
        return _table_from_pandas(g)

    from ray.data.aggregate import Sum

    def _to_us(batch: pa.Table) -> pa.Table:
        # Ray's hash-shuffle aggregate re-emits the key as timestamp[s];
        # recast so the final dtype matches DuckDB date_trunc ([us]).
        return batch.set_column(
            batch.schema.get_field_index("window_start"),
            "window_start",
            pc.cast(batch["window_start"], pa.timestamp("us")),
        )

    return (
        events.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Sum("n", alias_name="n"), Sum("value_cents", alias_name="value_cents"))
        .map_batches(_to_us, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


def region_customer_rollup(customer, nation, region):
    """J2 broadcast join: customer ⋈ nation ⋈ region (both dims tiny)
    → per region name: customer count + acctbal cents sum."""
    import ray

    nat = nation.to_pandas()
    reg = region.to_pandas()
    dim = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ]
    dim_ref = ray.put(dict(zip(dim["n_nationkey"], dim["r_name"])))

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(dim_ref)
        df = pd.DataFrame(
            {
                "nk": batch["c_nationkey"].to_numpy(),
                "bal_c": _cents(batch["c_acctbal"]).to_numpy(),
            }
        )
        df["r_name"] = df["nk"].map(lookup)
        g = df.groupby("r_name", as_index=False).agg(
            customers=("bal_c", "size"), acctbal_cents=("bal_c", "sum")
        )
        return _table_from_pandas(g)

    from ray.data.aggregate import Sum

    return (
        customer.map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Sum("customers", alias_name="customers"), Sum("acctbal_cents", alias_name="acctbal_cents"))
    )


def priority_revenue(orders, lineitem, num_partitions: int = 8):
    """J3 hash join: orders ⋈ lineitem on orderkey, revenue cents per
    o_orderpriority. Lineitem side is pre-aggregated per orderkey
    (combiner) BEFORE the join so the shuffle moves one row per order."""

    def li_partial(batch: pa.Table) -> pa.Table:
        rev_c = _cents(
            pc.multiply(batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"]))
        )
        df = pd.DataFrame(
            {"l_orderkey": batch["l_orderkey"].to_numpy(), "rev_c": rev_c.to_numpy()}
        )
        g = df.groupby("l_orderkey", as_index=False).agg(rev_c=("rev_c", "sum"))
        return _table_from_pandas(g)

    from ray.data.aggregate import Sum

    li_agg = (
        lineitem.map_batches(li_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev_c", alias_name="rev_c"))
    )
    joined = orders.select_columns(["o_orderkey", "o_orderpriority"]).join(
        li_agg,
        join_type="inner",
        num_partitions=num_partitions,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "o_orderpriority": batch["o_orderpriority"].to_pylist(),
                "rev_c": batch["rev_c"].to_numpy(),
            }
        )
        g = df.groupby("o_orderpriority", as_index=False).agg(
            revenue_cents=("rev_c", "sum"), orders=("rev_c", "size")
        )
        return _table_from_pandas(g)

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"), Sum("orders", alias_name="orders"))
    )


# ---------------------------------------------------------------------------
# ordered limits / first-occurrence / top-k
# ---------------------------------------------------------------------------


def per_key_limit(events, k: int = 5):
    """O2 analogue: first k events per user by (ts, event_id).

    Combiner: per-batch per-user head-k, then a hash(user)-bucket
    groupby with ONE vectorized pass per bucket (sort + cythonized
    groupby.head / cumcount — no per-user Python calls), same two-phase
    shape as the crawl's politeness budget.
    """
    num_buckets = _fb_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.sort_values(["ts", "event_id"], kind="mergesort")
            .groupby("user_id", sort=False)
            .head(k)
        )
        out = out.assign(
            __fb=(
                pd.util.hash_array(out["user_id"].to_numpy()) % num_buckets
            ).astype(np.int32)
        )
        return out

    def pick_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
            .groupby("user_id", sort=False)
            .head(k)
        )
        g = g.assign(rank=g.groupby("user_id", sort=False).cumcount() + 1)
        return g[["user_id", "event_id", "rank"]]

    return (
        events.select_columns(["user_id", "event_id", "ts"])
        .map_batches(partial, batch_format="pandas")
        .groupby("__fb")
        .map_groups(pick_bucket, batch_format="pandas")
    )


def first_occurrence(events):
    """U8 semantics on a log: min event_id per (user_id, event_type)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "event_type"], as_index=False).agg(
            first_event=("event_id", "min")
        )

    from ray.data.aggregate import Min

    return (
        events.select_columns(["user_id", "event_type", "event_id"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["user_id", "event_type"])
        .aggregate(Min("first_event", alias_name="first_event"))
    )


def top_orders(orders, k: int = 20):
    """Global top-k by (o_totalprice desc, o_orderkey asc): per-batch
    partial top-k (combiner) then a driver-side merge of ≤ k×blocks rows."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)

    partials = (
        orders.select_columns(["o_orderkey", "o_totalprice", "o_orderpriority"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    out = partials.sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
    ).head(k)
    out = out.reset_index(drop=True)
    out["price_cents"] = np.floor(out["o_totalprice"] * 100.0 + 0.5).astype(np.int64)
    return out[["o_orderkey", "price_cents", "o_orderpriority"]]


# ---------------------------------------------------------------------------
# streaming-shaped window + as-of join operators (beyond-reference; the
# tumbling variant above is windowed_counts)
# ---------------------------------------------------------------------------


def session_windows(events, gap_minutes: int = 30):
    """Gap-based session windows per user: a new session starts when the
    user's inter-event gap exceeds ``gap_minutes``. Per session:
    (user_id, session_start, session_end, n_events, value_cents).

    Shape: one single-key hash shuffle (groupby a ~2×cpu hash(user)
    bucket) colocates each user's events; inside a bucket the session
    assignment for EVERY user is one vectorized pass — sort by
    (user_id, ts, event_id), boundary = user change OR gap > threshold,
    session id = cumsum(boundary), then one cythonized groupby(sid)
    aggregate. Python-call count is O(buckets), not O(users).
    Partitioning assumption: one user's events fit one bucket (sessions
    never span buckets); salt by coarse time range if a single user
    exceeds bucket memory at scale."""
    gap = np.timedelta64(gap_minutes * 60 * 1_000_000, "us")
    num_buckets = _fb_buckets()

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch["user_id"],
                "event_id": batch["event_id"],
                "ts": batch["ts"],
                "value_c": _cents(batch["value"]),
                "__fb": pa.array(
                    (pd.util.hash_array(uid) % num_buckets).astype(np.int32)
                ),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = df["ts"].to_numpy()
        uid = df["user_id"].to_numpy()
        brk = np.ones(len(df), dtype=np.int64)
        if len(df) > 1:
            brk[1:] = ((uid[1:] != uid[:-1]) | (np.diff(ts) > gap)).astype(np.int64)
        g = df.assign(sid=np.cumsum(brk)).groupby("sid", as_index=False).agg(
            user_id=("user_id", "first"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
            n_events=("event_id", "size"),
            value_cents=("value_c", "sum"),
        )
        return g[["user_id", "session_start", "session_end", "n_events", "value_cents"]]

    return (
        events.map_batches(prep, batch_format="pyarrow")
        .groupby("__fb")
        .map_groups(per_bucket, batch_format="pandas")
    )


def asof_join_events_orders(events, orders, num_buckets: int = 64):
    """Distributed as-of join — an operator Ray Data lacks: each event
    joins the latest order of the same customer with
    ``o_orderdate <= ts`` (ties on o_orderdate resolve to the max
    o_orderkey); events with no prior order drop (inner as-of).

    Shape: both sides are bucketed on the join key and co-grouped with
    ONE single-key groupby over their union (sides tagged by ``src``);
    each bucket runs ``pandas.merge_asof`` (C-vectorized backward
    search over both sorted frames). Partitioning assumption: all rows
    of a key land in one bucket, so bucket count × key skew bounds
    group size — raise ``num_buckets`` (and salt hot keys by event-time
    range, re-merging boundaries) at scale."""

    def prep_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "b": pa.array(t["user_id"].to_numpy() % num_buckets, pa.int32()),
                "user_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "o_orderkey": pa.nulls(n, pa.int64()),
                "o_orderdate": pa.nulls(n, pa.timestamp("us")),
                "o_totalprice": pa.nulls(n, pa.float64()),
                "src": pa.array(np.ones(n, dtype=np.int8)),
            }
        )

    def prep_orders(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                "b": pa.array(t["o_custkey"].to_numpy() % num_buckets, pa.int32()),
                "user_id": t["o_custkey"],
                "event_id": pa.nulls(n, pa.int64()),
                "ts": pa.nulls(n, pa.timestamp("us")),
                "o_orderkey": t["o_orderkey"],
                "o_orderdate": pc.cast(t["o_orderdate"], pa.timestamp("us")),
                "o_totalprice": t["o_totalprice"],
                "src": pa.array(np.zeros(n, dtype=np.int8)),
            }
        )

    unioned = events.map_batches(prep_events, batch_format="pyarrow").union(
        orders.map_batches(prep_orders, batch_format="pyarrow")
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df["src"] == 1].sort_values(["ts", "event_id"], kind="mergesort")
        od = df[df["src"] == 0].sort_values(
            ["o_orderdate", "o_orderkey"], kind="mergesort"
        )
        m = pd.merge_asof(
            ev[["user_id", "event_id", "ts"]],
            od[["user_id", "o_orderkey", "o_orderdate", "o_totalprice"]],
            left_on="ts",
            right_on="o_orderdate",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m[m["o_orderkey"].notna()]
        return pd.DataFrame(
            {
                "event_id": m["event_id"].astype("int64"),
                "user_id": m["user_id"].astype("int64"),
                "ts": m["ts"],
                "asof_orderkey": m["o_orderkey"].astype("int64"),
                "asof_orderdate": m["o_orderdate"],
                "asof_totalprice": m["o_totalprice"].astype("float64"),
            }
        )

    return unioned.groupby("b").map_groups(per_bucket, batch_format="pandas")


def range_join_event_pairs(events, tolerance_sec: int = 300):
    """Distributed range (interval-proximity) join — an operator Ray
    Data lacks: all pairs of same-type events whose timestamps lie
    within ``tolerance_sec`` of each other. The earlier event is the
    left side; ts ties order by event_id.

    Shape: the classic bucket-replication interval join. Time is split
    into buckets of width == tolerance; every event lands in its home
    bucket and a replica lands in the NEXT bucket, so any in-range pair
    co-locates in the later event's home bucket and is emitted there
    (and only there — replication never duplicates output). ONE
    single-key shuffle on the exact (event_type, time_bucket) string
    key; inside a group one sort + one vectorized searchsorted pass
    emits exactly the in-range pairs — O(group log group + matches),
    never the bucket cross-product. Partitioning assumption: the events
    of one (type, tolerance-window) bucket fit in one group; at scale a
    hot window is split by salting the bucket key with k sub-windows of
    width tol/k (each event then replicates to k+1 sub-buckets).
    """
    tol_us = np.int64(tolerance_sec) * 1_000_000

    def replicate(batch: pa.Table) -> pa.Table:
        # SQL semantics: `a.event_type = b.event_type` never matches a
        # null, so null-type events pair with nothing — drop them before
        # keying (they'd otherwise need a sentinel that either collapses
        # all null rows into one hot shuffled group or, worse, pairs
        # nulls with each other, diverging from the oracle).
        batch = batch.filter(pc.is_valid(batch["event_type"]))
        ts_us = pc.cast(batch["ts"], pa.int64()).to_numpy()
        bucket = ts_us // tol_us
        etype = pc.cast(batch["event_type"].combine_chunks(), pa.string())
        # key = event_type '#' bucket, composed fully vectorized (one
        # binary_join_element_wise kernel per replica side — no per-row
        # Python in the map side of the shuffle)
        home_keys = pc.binary_join_element_wise(
            etype, pc.cast(pa.array(bucket), pa.string()), "#"
        )
        next_keys = pc.binary_join_element_wise(
            etype, pc.cast(pa.array(bucket + 1), pa.string()), "#"
        )
        n = batch.num_rows
        ids = batch["event_id"]
        return pa.table(
            {
                "k": pa.concat_arrays([home_keys, next_keys]),
                "event_id": pa.concat_arrays([ids.combine_chunks()] * 2),
                "ts_us": pa.array(np.concatenate([ts_us, ts_us])),
                "home": pa.array(
                    np.concatenate([np.ones(n, bool), np.zeros(n, bool)])
                ),
            }
        )

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts_us", "event_id"], kind="mergesort")
        ts = df["ts_us"].to_numpy()
        ids = df["event_id"].to_numpy()
        home = df["home"].to_numpy()
        pos = np.arange(len(ts))
        lo = np.searchsorted(ts, ts - tol_us, side="left")
        cnt = np.where(home, pos - lo, 0)
        total = int(cnt.sum())
        if total == 0:
            return pd.DataFrame(
                {
                    "left_id": pd.Series([], dtype="int64"),
                    "right_id": pd.Series([], dtype="int64"),
                    "event_type": pd.Series([], dtype="object"),
                    "gap_us": pd.Series([], dtype="int64"),
                }
            )
        right = np.repeat(pos, cnt)
        offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        left = np.arange(total) - np.repeat(offs, cnt) + np.repeat(lo, cnt)
        etype = df["k"].iloc[0].rsplit("#", 1)[0]
        return pd.DataFrame(
            {
                "left_id": ids[left],
                "right_id": ids[right],
                "event_type": etype,
                "gap_us": ts[right] - ts[left],
            }
        )

    return (
        events.map_batches(replicate, batch_format="pyarrow")
        .groupby("k")
        .map_groups(per_group, batch_format="pandas")
    )
