"""Stream-shaped operators over the bounded ``events`` table.

Ray Data has no event-time watermarks (SURVEY.md §2.5 — neither does
the reference; its time-based bucket flush is a processing-time
timeout, reference message_queue/message_process/hybrid.py:30-43).
Stream semantics are expressed batch-first: partition by key, sort by
``ts`` within the group, window with pandas inside ``map_groups``.
The partitioning assumption: one key's events fit one worker (salt
hot keys into (key, ts-day) sub-groups if they don't).
"""

from __future__ import annotations

import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from ocr_pipeline_ray.pipelines.relational import ROUND_DECIMALS, _read, broadcast_join

SESSION_GAP_MIN = 30


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type: count + value sum.

    The window key is computed vectorized per batch (floor to hour) so
    the shuffle groups by (event_type, hour) directly — a pre-keyed
    tumbling window, not a driver loop.
    """
    ds = _read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_hour(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hour"] = df["ts"].dt.floor("h")
        return df.drop(columns=["ts"])

    out = (
        ds.map_batches(add_hour, batch_format="pandas")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
        .sort_values(["event_type", "hour"])
        .reset_index(drop=True)
    )
    out["sum_value"] = out["sum_value"].round(ROUND_DECIMALS)
    return out


EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM events GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, hour
"""


def sessionize(sf_dir: str) -> pd.DataFrame:
    """Gap-based sessionization per user (30-min inactivity closes a
    session): ``groupby(user_id).map_groups`` over ts-sorted events.

    Returns one row per session: (user_id, session_id, n_events,
    session_start, session_end). session_id is the 0-based session
    index within the user — deterministic, replayable (no uuids;
    SURVEY.md M12)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gap = g["ts"].diff() > pd.Timedelta(minutes=SESSION_GAP_MIN)
        sid = gap.cumsum().astype("int64")
        out = (
            g.assign(session_id=sid)
            .groupby("session_id", as_index=False)
            .agg(
                user_id=("user_id", "first"),
                n_events=("ts", "size"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
            )
        )
        return out[["user_id", "session_id", "n_events", "session_start", "session_end"]]

    return (
        ds.groupby("user_id")
        .map_groups(_sessions, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )


SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sess AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def asof_latest_order(sf_dir: str) -> pd.DataFrame:
    """As-of join: for each event, the most recent order of that
    customer with o_orderdate <= ts (backward as-of).

    Implementation: broadcast the (small) orders side sorted by date,
    then ``pd.merge_asof`` per ts-sorted batch group inside
    ``map_groups`` keyed by user. Both-sides-large variant: bucket by
    key then merge_asof per bucket (same shape as shuffle_hash_join).
    """
    events = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    orders = (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .to_pandas()
        .sort_values(["o_orderdate", "o_orderkey"])  # ties -> merge_asof takes the last row = max o_orderkey
    )
    ref = ray.put(orders.rename(columns={"o_custkey": "user_id"}))

    def _asof(g: pd.DataFrame) -> pd.DataFrame:
        orders_local = ray.get(ref)  # zero-copy from the local object store
        g = g.sort_values("ts")
        out = pd.merge_asof(
            g,
            orders_local,
            left_on="ts",
            right_on="o_orderdate",
            by="user_id",
            direction="backward",
        )
        # deterministic pick among same-date orders: orders pre-sorted
        # by (date, orderkey) and merge_asof takes the last row = max key
        return out[["event_id", "user_id", "o_orderkey"]]

    out = (
        events.groupby("user_id")
        .map_groups(_asof, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    out["o_orderkey"] = out["o_orderkey"].astype("float64")
    return out


def props_k_by_type(sf_dir: str) -> pd.DataFrame:
    """JSON-payload parser operator: extract ``props.k`` per event
    (vectorized json parse per batch) and aggregate per event_type —
    the semi-structured-parsing capability (events.props is a JSON
    string column)."""
    import json

    import pyarrow as pa

    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def parse(t: pa.Table) -> pa.Table:
        ks = []
        for p in t["props"].to_pylist():
            try:
                v = json.loads(p).get("k")
                ks.append(int(v) if v is not None else None)
            except (ValueError, TypeError, AttributeError):
                ks.append(None)  # malformed JSON -> NULL (SQL semantics)
        return pa.Table.from_arrays(
            [t["event_type"], pa.array(ks, pa.int64())], names=["event_type", "k"]
        )

    from ray.data.aggregate import Count, Sum

    df = (
        ds.map_batches(parse, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k", alias_name="sum_k"), Count(alias_name="n_events"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    df["sum_k"] = df["sum_k"].astype("Int64")  # nullable: all-NULL group -> <NA> (SQL parity)
    return df


PROPS_K_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(*) AS n_events
FROM events GROUP BY event_type ORDER BY event_type
"""


def rolling_user_value(sf_dir: str, window: int = 5) -> pd.DataFrame:
    """Per-user rolling mean over the last ``window`` events (row-based
    sliding window): ``groupby(user).map_groups`` over ts-sorted events
    — the bounded-log window pattern (ray_guide streaming section).
    Tie-safe ordering: (ts, event_id)."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def _roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        g = g.assign(
            rolling_mean=g["value"].rolling(window, min_periods=1).mean().round(ROUND_DECIMALS)
        )
        return g[["event_id", "user_id", "rolling_mean"]]

    return (
        ds.groupby("user_id")
        .map_groups(_roll, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )


ROLLING_SQL = """
SELECT event_id, user_id,
       round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS rolling_mean
FROM events ORDER BY event_id
"""


ASOF_SQL = """
WITH ranked AS (
  SELECT e.event_id, o.o_orderkey,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT e.event_id, e.user_id, CAST(r.o_orderkey AS DOUBLE) AS o_orderkey
FROM events e LEFT JOIN ranked r ON r.event_id = e.event_id AND r.rn = 1
ORDER BY e.event_id
"""
