"""Semantic tests for the streaming-shaped operators: gap-session
windows and the distributed as-of join (tie-break + partitioning
behavior on hand-built inputs; the DuckDB parity gate is
test_api_oracle / scripts/check_oracle)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pytest

from newslookout_ray.pipelines import relational


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


@pytest.mark.usefixtures("ray_session")
class TestSessionWindows:
    def test_gap_boundaries_and_sums(self):
        import ray.data

        events = pa.table(
            {
                "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
                "event_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
                # user 1: 10:00, 10:29, 11:10 (gap 41m -> new session), 11:20
                "ts": pa.array(
                    [_ts(0), _ts(29), datetime.datetime(2024, 1, 1, 11, 10),
                     datetime.datetime(2024, 1, 1, 11, 20), _ts(5)],
                    pa.timestamp("us"),
                ),
                "value": pa.array([1.0, 2.0, 3.0, 4.0, 9.995], pa.float64()),
            }
        )
        out = (
            relational.session_windows(ray.data.from_arrow(events))
            .to_pandas()
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )
        assert len(out) == 3
        u1 = out[out.user_id == 1]
        assert list(u1["n_events"]) == [2, 2]
        assert list(u1["value_cents"]) == [300, 700]
        assert u1.iloc[0]["session_end"] == _ts(29)
        # cents on the .995 boundary: 9.995 is 9.99499... as a double, so
        # floor(x*100+0.5) = 999 — the same answer DuckDB computes on the
        # same double (cross-engine consistency is the point of this form)
        assert int(out[out.user_id == 2]["value_cents"].iloc[0]) == 999

    def test_exact_gap_is_same_session(self):
        import ray.data

        events = pa.table(
            {
                "user_id": pa.array([7, 7], pa.int64()),
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array([_ts(0), _ts(30)], pa.timestamp("us")),  # == gap
                "value": pa.array([0.0, 0.0], pa.float64()),
            }
        )
        out = relational.session_windows(ray.data.from_arrow(events)).to_pandas()
        assert len(out) == 1 and int(out["n_events"].iloc[0]) == 2


@pytest.mark.usefixtures("ray_session")
class TestAsofJoin:
    def test_backward_match_and_tiebreak(self):
        import ray.data

        events = pa.table(
            {
                "user_id": pa.array([1, 1, 2], pa.int64()),
                "event_id": pa.array([100, 101, 102], pa.int64()),
                "ts": pa.array(
                    [_ts(0), _ts(30), _ts(0)], pa.timestamp("us")
                ),
            }
        )
        d = datetime.datetime
        orders = pa.table(
            {
                "o_custkey": pa.array([1, 1, 1, 3], pa.int64()),
                "o_orderkey": pa.array([5, 9, 7, 8], pa.int64()),
                # two orders share the max eligible date for event 101 ->
                # tie resolves to max o_orderkey (9)
                "o_orderdate": pa.array(
                    [d(2024, 1, 1, 9), d(2024, 1, 1, 10, 15), d(2024, 1, 1, 10, 15),
                     d(2024, 1, 1, 9)],
                    pa.timestamp("us"),
                ),
                "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
            }
        )
        out = (
            relational.asof_join_events_orders(
                ray.data.from_arrow(events), ray.data.from_arrow(orders), num_buckets=4
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # event 102's user has no orders -> dropped (inner as-of)
        assert list(out["event_id"]) == [100, 101]
        assert list(out["asof_orderkey"]) == [5, 9]
        assert list(out["asof_totalprice"]) == [10.0, 20.0]

    def test_exact_timestamp_match_included(self):
        import ray.data

        events = pa.table(
            {
                "user_id": pa.array([4], pa.int64()),
                "event_id": pa.array([1], pa.int64()),
                "ts": pa.array([_ts(0)], pa.timestamp("us")),
            }
        )
        orders = pa.table(
            {
                "o_custkey": pa.array([4], pa.int64()),
                "o_orderkey": pa.array([11], pa.int64()),
                "o_orderdate": pa.array([_ts(0)], pa.timestamp("us")),
                "o_totalprice": pa.array([1.0], pa.float64()),
            }
        )
        out = relational.asof_join_events_orders(
            ray.data.from_arrow(events), ray.data.from_arrow(orders), num_buckets=2
        ).to_pandas()
        assert list(out["asof_orderkey"]) == [11]


@pytest.mark.usefixtures("ray_session")
class TestRangeJoin:
    def _run(self, ids, ts, types, tol):
        import ray.data

        events = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(types, pa.string()),
            }
        )
        out = relational.range_join_event_pairs(
            ray.data.from_arrow(events), tolerance_sec=tol
        ).to_pandas()
        if out.empty:  # Ray drops columns on a 0-row to_pandas()
            return set(), out
        return set(zip(out["left_id"], out["right_id"])), out

    def test_null_event_type_never_pairs(self):
        """SQL semantics: `a.event_type = b.event_type` never matches a
        null, so null-type events pair with nothing — not even with each
        other — while non-null events around them pair normally."""
        pairs, out = self._run(
            [1, 2, 3, 4, 5],
            [_ts(0), _ts(1, 0), _ts(1, 30), _ts(2, 0), _ts(40, 0)],
            [None, None, "click", "click", None],
            300,
        )
        # 1-2 are nulls 60s apart: no pair. 3-4 are clicks 30s apart:
        # pair. 5 is a lone null far away: no pair, no crash.
        assert pairs == {(3, 4)}

    def test_all_null_types_empty_result(self):
        pairs, out = self._run(
            [1, 2], [_ts(0), _ts(0, 10)], [None, None], 300
        )
        assert pairs == set()

    def test_exact_tolerance_included_and_cross_bucket_once(self):
        # 10:00:00 / 10:04:59 straddle no bucket edge; 10:04:59 /
        # 10:09:59 (gap == 300 s) straddles the 10:05 bucket boundary —
        # the replication must find it exactly once
        pairs, out = self._run(
            [1, 2, 3],
            [_ts(0), _ts(4, 59), _ts(9, 59)],
            ["click"] * 3,
            300,
        )
        assert pairs == {(1, 2), (2, 3)}  # (1,3) gap 599s > 300s
        assert len(out) == 2  # no duplicate emission from replicas
        assert sorted(out["gap_us"]) == [299_000_000, 300_000_000]

    def test_type_isolation_and_ts_ties(self):
        # same timestamp, same type: tie orders by event_id (5 < 9);
        # different type never pairs however close
        pairs, out = self._run(
            [9, 5, 7],
            [_ts(0), _ts(0), _ts(0, 30)],
            ["view", "view", "error"],
            300,
        )
        assert pairs == {(5, 9)}
        assert list(out["gap_us"]) == [0]

    def test_pair_never_duplicated_when_both_replicate(self):
        # both events inside one bucket: their replicas co-exist in the
        # next bucket but must not re-emit the pair there
        pairs, out = self._run(
            [1, 2], [_ts(0, 10), _ts(0, 20)], ["click", "click"], 300
        )
        assert pairs == {(1, 2)} and len(out) == 1
