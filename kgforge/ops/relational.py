"""General relational operators on the Ray engine — grouped aggregates
with batch-level pre-aggregation, broadcast hash joins, session windows.

These generalize the reference's aggregation surface (it only has
set-dedup + counts, SURVEY.md §2.6) to the operations a large pipeline
needs. Money sums are emitted as integer cents (each addend is a
2-decimal value, so the true sum is an exact integer of cents —
float-order drift stays ≪ 0.5 and CAST(round(...)) is engine-stable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum


# ----------------------------------------------------- Q1-style summary
def pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """Grouped pricing rollup over lineitem with per-batch partial
    aggregation (combiner) before the small groupby shuffle."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        qty = batch["l_quantity"]
        price = batch["l_extendedprice"]
        disc = batch["l_discount"]
        rev = pc.multiply(price, pc.subtract(pa.scalar(1.0), disc))
        t = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty": qty, "price": price, "rev": rev,
        })
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("price", "sum"), ("rev", "sum"),
             ("qty", "count")])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("qty_sum", alias_name="sum_qty_f"),
                      Sum("price_sum", alias_name="sum_price_f"),
                      Sum("rev_sum", alias_name="sum_rev_f"),
                      Sum("qty_count", alias_name="n_rows")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "sum_qty": pc.round(batch["sum_qty_f"]).cast(pa.int64()),
            "sum_price_cents": pc.round(
                pc.multiply(batch["sum_price_f"], pa.scalar(100.0))
            ).cast(pa.int64()),
            "sum_rev_cents": pc.round(
                pc.multiply(batch["sum_rev_f"], pa.scalar(100.0))
            ).cast(pa.int64()),
            "n_rows": batch["n_rows"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty,
       CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_price_cents,
       CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT)
           AS sum_rev_cents,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------- broadcast join + top-k
def top_revenue_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10
                       ) -> "ray.data.Dataset":
    """Q3-shaped: customers of one segment (broadcast semi-join) ⋈
    orders (broadcast of qualifying order keys) ⋈ lineitem (groupby
    revenue) → top-k. Both small sides ship once via ray.put; the only
    shuffle is the groupby on l_orderkey."""
    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    cust_keys = set()
    for b in cust.iter_batches(batch_format="pyarrow"):
        seg = b["c_mktsegment"].to_pylist()
        for ck, s in zip(b["c_custkey"].to_pylist(), seg):
            if s == segment:
                cust_keys.add(ck)
    cust_ref = ray.put(cust_keys)

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    def order_filter(batch: pa.Table) -> pa.Table:
        keys = ray.get(cust_ref)
        mask = pa.array([c in keys for c in batch["o_custkey"].to_pylist()])
        return batch.filter(mask)

    okeys = set()
    for b in orders.map_batches(order_filter,
                                batch_format="pyarrow").iter_batches(
                                    batch_format="pyarrow"):
        okeys.update(b["o_orderkey"].to_pylist())
    okey_ref = ray.put(okeys)

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(batch: pa.Table) -> pa.Table:
        keep = ray.get(okey_ref)
        mask = pa.array([k_ in keep for k_ in batch["l_orderkey"].to_pylist()])
        t = batch.filter(mask)
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t2 = pa.table({"l_orderkey": t["l_orderkey"], "rev": rev})
        return t2.group_by(["l_orderkey"]).aggregate([("rev", "sum")])

    agg = (li.map_batches(li_partial, batch_format="pyarrow")
           .groupby("l_orderkey").aggregate(Sum("rev_sum", alias_name="rev_f")))

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["l_orderkey"].cast(pa.int64()),
            "revenue_cents": pc.round(
                pc.multiply(batch["rev_f"], pa.scalar(100.0))).cast(pa.int64()),
        })

    out = agg.map_batches(cents, batch_format="pyarrow")
    # over-fetch beyond k so boundary ties can be broken deterministically
    top = out.sort("revenue_cents", descending=True).limit(k + 50).to_pandas()
    top = top.sort_values(["revenue_cents", "o_orderkey"],
                          ascending=[False, True]).head(k)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return ray.data.from_pandas(top.reset_index(drop=True))


def top_revenue_orders_sql(segment: str = "BUILDING", k: int = 10) -> str:
    return f"""
WITH rev AS (
  SELECT l.l_orderkey AS o_orderkey,
         CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100) AS BIGINT)
             AS revenue_cents
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  WHERE c.c_mktsegment = '{segment}'
  GROUP BY l.l_orderkey
)
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, revenue_cents,
       CAST(row_number() OVER (ORDER BY revenue_cents DESC, o_orderkey ASC)
            AS BIGINT) AS rank
FROM rev
ORDER BY revenue_cents DESC, o_orderkey ASC
LIMIT {k}
"""


# ----------------------------------------------------- session windows
SESSION_GAP_S = 1800


def sessionize(sf_dir: str, gap_s: int = SESSION_GAP_S) -> "ray.data.Dataset":
    """Per-user session stats from the events stream: partition by
    user_id (groupby shuffle), sort by ts inside the group, close a
    session when the gap exceeds ``gap_s``. Ordering assumption
    (documented per the streaming-shaped-workload rule): ts order is
    established INSIDE each group by the sort, so input block order is
    irrelevant."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_id"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gaps = g["ts"].diff().dt.total_seconds().fillna(np.inf)
        starts = (gaps > gap_s).cumsum()  # first row opens session 1
        n_sessions = int(starts.iloc[-1]) if len(g) else 0
        sizes = starts.value_counts()
        return pd.DataFrame({
            "user_id": [int(g["user_id"].iloc[0])],
            "n_events": [len(g)],
            "n_sessions": [n_sessions],
            "max_session_events": [int(sizes.max())],
        })

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


SESSIONIZE_SQL = f"""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_S} SECONDS
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM gaps
),
per_session AS (
  SELECT user_id, session_no, count(*) AS n FROM sess
  GROUP BY user_id, session_no
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(n) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n) AS BIGINT) AS max_session_events
FROM per_session GROUP BY user_id
"""


def tumbling_counts(sf_dir: str, window_s: int = 3600) -> "ray.data.Dataset":
    """Tumbling event-time windows: count + value cents per (event_type,
    hour window). Window assignment is a pure vectorized map
    (epoch // window), so no ordering assumption at all — the groupby
    key IS the window; pre-aggregated per batch before the shuffle."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        epoch = pc.divide(batch["ts"].cast(pa.int64()),
                          pa.scalar(1_000_000, type=pa.int64()))
        win = pc.multiply(pc.floor(pc.divide(epoch.cast(pa.float64()),
                                             pa.scalar(float(window_s)))),
                          pa.scalar(float(window_s))).cast(pa.int64())
        t = pa.table({"event_type": batch["event_type"], "window_start": win,
                      "value": batch["value"]})
        return t.group_by(["event_type", "window_start"]).aggregate(
            [("value", "sum"), ("value", "count")])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["event_type", "window_start"])
           .aggregate(Sum("value_sum", alias_name="v"),
                      Sum("value_count", alias_name="n_events")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "window_start": batch["window_start"].cast(pa.int64()),
            "n_events": batch["n_events"].cast(pa.int64()),
            "value_cents": pc.round(pc.multiply(batch["v"],
                                                pa.scalar(100.0))
                                    ).cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


TUMBLING_COUNTS_SQL = """
SELECT event_type,
       CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(value) * 100) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2
"""


def event_type_counts(sf_dir: str) -> "ray.data.Dataset":
    """Pre-aggregated groupby count by event_type."""
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type"]).aggregate([("event_type", "count")])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("event_type_count", alias_name="n")))


EVENT_TYPE_COUNTS_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY event_type
"""
