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

from ..sources.readers import read_table
from ray.data.aggregate import Sum


# ----------------------------------------------------- Q1-style summary
def pricing_summary(sf_dir: str) -> "ray.data.Dataset":
    """Grouped pricing rollup over lineitem with per-batch partial
    aggregation (combiner) before the small groupby shuffle."""
    ds = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity",
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


# ----------------------------------------- partitioned joins + top-k
def topk_rows(ds: "ray.data.Dataset", k: int, sort_cols: list[str],
              ascending: list[bool]) -> pd.DataFrame:
    """Distributed top-k: per-batch top-k combiner (each batch emits at
    most k rows) → tiny driver reduce over ≤ num_batches × k rows. No
    global sort."""
    from ..stages.canonicalize import SANITIZE_BATCH

    def local_topk(batch: pa.Table) -> pa.Table:
        df = (batch.to_pandas()
              .sort_values(sort_cols, ascending=ascending, kind="mergesort")
              .head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    # tree combine: a second top-k pass over coalesced partials (large
    # batch_size) bounds the driver reduce at ≤ k × (a few) rows even
    # when the corpus has 100k+ blocks
    parts = (ds.map_batches(local_topk, batch_format="pyarrow",
                            batch_size=SANITIZE_BATCH)
             .map_batches(local_topk, batch_format="pyarrow",
                          batch_size=65536))
    frames = [b.to_pandas() for b in parts.iter_batches(batch_format="pyarrow")]
    if not frames:
        return pd.DataFrame()
    top = pd.concat(frames, ignore_index=True)
    return (top.sort_values(sort_cols, ascending=ascending, kind="mergesort")
            .head(k).reset_index(drop=True))


def top_revenue_orders(sf_dir: str, segment: str = "BUILDING", k: int = 10
                       ) -> "ray.data.Dataset":
    """Q3-shaped: segment customers ⋈ orders ⋈ lineitem → top-k revenue.

    Both joins are hash-partitioned (no broadcast side: one segment is
    ~20% of customers and its orders ~30% of orders — at 100 TB neither
    is a "small side"). lineitem pre-aggregates per batch (combiner)
    before anything shuffles; the order-key join then prunes
    non-qualifying partials BEFORE the global groupby; the final top-k
    is a per-batch combiner + tiny driver reduce, not a global sort."""
    from ..stages.canonicalize import (SANITIZE_BATCH,
                                      default_shuffle_partitions)
    nparts = default_shuffle_partitions()
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])

    def seg_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["c_mktsegment"], segment)).select(
            ["c_custkey"])

    # batch_size coalesces away EMPTY read blocks — those skip the map
    # fn entirely and would reach the join with their original 2-column
    # schema, poisoning the key resolution (seen at tiny scales)
    seg_cust = cust.map_batches(seg_only, batch_format="pyarrow",
                                batch_size=SANITIZE_BATCH)
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    qual = orders.join(seg_cust, join_type="inner", num_partitions=nparts,
                       on=("o_custkey",), right_on=("c_custkey",))
    qual = qual.map_batches(lambda t: t.select(["o_orderkey"]),
                            batch_format="pyarrow",
                            batch_size=SANITIZE_BATCH)

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        t2 = pa.table({"l_orderkey": batch["l_orderkey"], "rev": rev})
        return t2.group_by(["l_orderkey"]).aggregate([("rev", "sum")])

    partials = li.map_batches(li_partial, batch_format="pyarrow",
                              batch_size=SANITIZE_BATCH)
    pruned = partials.join(qual, join_type="inner", num_partitions=nparts,
                           on=("l_orderkey",), right_on=("o_orderkey",))
    agg = (pruned.map_batches(lambda t: t, batch_format="pyarrow",
                              batch_size=SANITIZE_BATCH)
           .groupby("l_orderkey").aggregate(Sum("rev_sum", alias_name="rev_f")))

    def cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch["l_orderkey"].cast(pa.int64()),
            "revenue_cents": pc.round(
                pc.multiply(batch["rev_f"], pa.scalar(100.0))).cast(pa.int64()),
        })

    out = agg.map_batches(cents, batch_format="pyarrow")
    top = topk_rows(out, k, ["revenue_cents", "o_orderkey"], [False, True])
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


SESSION_BUCKETS = 64


def sessionize(sf_dir: str, gap_s: int = SESSION_GAP_S,
               num_buckets: int | None = None) -> "ray.data.Dataset":
    """Per-user session stats from the events stream.

    Users shuffle by ``user_id % num_buckets`` and each bucket runs ONE
    vectorized callback over all its users (sort by user/ts/event, numpy
    diff + cumsum for session breaks, C-level pandas groupby for the
    rollup) — not one Python callback per user, which is the known
    Ray-groupby trap at high user cardinality. Ordering assumption
    (documented per the streaming-shaped-workload rule): ts order is
    established INSIDE each bucket by the sort, so input block order is
    irrelevant. ``num_buckets`` defaults to max(64, 2×cluster CPUs)
    (env KGFORGE_SESSION_BUCKETS), so reduce parallelism tracks cluster
    width instead of capping at 64 tasks."""
    if num_buckets is None:
        import os
        env = os.environ.get("KGFORGE_SESSION_BUCKETS")
        if env:
            num_buckets = int(env)
        else:
            from ..stages.dedup import default_num_buckets
            num_buckets = default_num_buckets()
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def bucketize(batch: pa.Table) -> pa.Table:
        uid = (batch["user_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        return batch.append_column(
            "_bucket", pa.array((uid % num_buckets).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        user = g["user_id"].to_numpy(dtype=np.int64)
        tsv = g["ts"].to_numpy(dtype="datetime64[ns]").astype(np.int64)
        if not len(g):
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "n_events": pd.Series(dtype=np.int64),
                                 "n_sessions": pd.Series(dtype=np.int64),
                                 "max_session_events": pd.Series(dtype=np.int64)})
        new_user = np.empty(len(g), dtype=bool)
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
        gap = np.empty(len(g), dtype=np.float64)
        gap[0] = np.inf
        gap[1:] = (tsv[1:] - tsv[:-1]) / 1e9
        new_session = new_user | (gap > gap_s)
        sid = np.cumsum(new_session)          # globally increasing ids
        per_sess = (pd.DataFrame({"user_id": user, "sid": sid})
                    .groupby(["user_id", "sid"], sort=False).size()
                    .rename("n").reset_index())
        res = per_sess.groupby("user_id", sort=False)["n"].agg(
            n_events="sum", n_sessions="count", max_session_events="max")
        res = res.reset_index().astype(np.int64)
        return res

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_bucket").map_groups(per_bucket, batch_format="pandas"))


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
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

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


def hopping_counts(sf_dir: str, window_s: int = 3600,
                   hop_s: int = 900) -> "ray.data.Dataset":
    """Hopping (sliding) event-time windows: every event belongs to
    ``window_s/hop_s`` overlapping windows. Pure vectorized window
    assignment (np repeat/tile over floor(epoch/hop) − k), pre-aggregated
    per batch before the groupby shuffle — like ``tumbling_counts``, no
    ordering assumption at all."""
    assert window_s % hop_s == 0
    n_hops = window_s // hop_s
    ds = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        epoch = (batch["ts"].combine_chunks().cast(pa.int64())
                 .to_numpy(zero_copy_only=False) // 1_000_000)
        base = epoch // hop_s * hop_s
        ws = (np.repeat(base, n_hops)
              - np.tile(np.arange(n_hops, dtype=np.int64) * hop_s,
                        len(base)))
        et = batch["event_type"].combine_chunks().cast(pa.string())
        val = (batch["value"].combine_chunks().cast(pa.float64())
               .to_numpy(zero_copy_only=False))
        t = pa.table({
            "event_type": et.take(pa.array(
                np.repeat(np.arange(len(base)), n_hops))),
            "window_start": pa.array(ws, type=pa.int64()),
            "value": pa.array(np.repeat(val, n_hops)),
        })
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


def hopping_counts_sql(window_s: int = 3600, hop_s: int = 900) -> str:
    n = window_s // hop_s
    return f"""
SELECT event_type,
       CAST((CAST(floor(epoch(ts) / {hop_s}) AS BIGINT) - k.k) * {hop_s}
            AS BIGINT) AS window_start,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(round(sum(value) * 100) AS BIGINT) AS value_cents
FROM events CROSS JOIN (SELECT unnest(range(0, {n})) AS k) k
GROUP BY 1, 2
"""


def event_type_counts(sf_dir: str) -> "ray.data.Dataset":
    """Pre-aggregated groupby count by event_type."""
    ds = read_table(sf_dir, "events", columns=["event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type"]).aggregate([("event_type", "count")])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("event_type_count", alias_name="n")))


EVENT_TYPE_COUNTS_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY event_type
"""


# ------------------------------------------------------------ as-of join
def asof_last_purchase(sf_dir: str, event_type: str = "purchase",
                       num_buckets: int | None = None
                       ) -> "ray.data.Dataset":
    """AS-OF JOIN: every event picks up the ts/value of its user's most
    recent STRICTLY-PRIOR ``event_type`` event (nulls when none) —
    the canonical point-in-time feature-attach step Ray Data has no
    primitive for.

    Composition (documented partitioning assumption): users shuffle by
    ``user_id % num_buckets`` so one user's events co-locate, then each
    bucket runs ONE vectorized ``pd.merge_asof`` (C-level backward
    search, exact matches excluded) over its ts-sorted slice — never a
    Python loop per row/user. The right side pre-aggregates to one row
    per (user_id, ts) keeping the max-event_id value, so tie behavior
    is pinned identically on the engine and the DuckDB ASOF mirror."""
    if num_buckets is None:
        import os
        env = os.environ.get("KGFORGE_SESSION_BUCKETS")
        if env:
            num_buckets = int(env)
        else:
            from ..stages.dedup import default_num_buckets
            num_buckets = default_num_buckets()
    ds = read_table(sf_dir, "events",
                    columns=["event_id", "ts", "user_id", "event_type",
                             "value"])

    def bucketize(batch: pa.Table) -> pa.Table:
        uid = (batch["user_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        return batch.append_column(
            "_bucket", pa.array((uid % num_buckets).astype(np.int32)))

    out_schema = pa.schema([("event_id", pa.int64()),
                            ("last_purchase_ts_us", pa.int64()),
                            ("last_purchase_value", pa.float64())])

    def bucket_asof(group: pa.Table) -> pa.Table:
        df = group.to_pandas()
        right = (df[df["event_type"] == event_type]
                 .sort_values(["user_id", "ts", "event_id"],
                              kind="mergesort")
                 .groupby(["user_id", "ts"], as_index=False)
                 .last()[["user_id", "ts", "value"]])
        if not len(right):
            n = len(df)
            return pa.table({
                "event_id": pa.array(df["event_id"], type=pa.int64()),
                "last_purchase_ts_us": pa.nulls(n, pa.int64()),
                "last_purchase_value": pa.nulls(n, pa.float64()),
            }).cast(out_schema)
        right = right.rename(columns={"value": "last_purchase_value"})
        right["p_ts"] = right["ts"]
        left = df[["event_id", "ts", "user_id"]].sort_values(
            ["ts", "event_id"], kind="mergesort")
        right = right.sort_values("ts", kind="mergesort")
        m = pd.merge_asof(left, right, on="ts", by="user_id",
                          direction="backward",
                          allow_exact_matches=False)
        ts_us = m["p_ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        null_mask = m["p_ts"].isna().to_numpy()
        return pa.table({
            "event_id": pa.array(m["event_id"].to_numpy(), type=pa.int64()),
            "last_purchase_ts_us": pa.array(ts_us, type=pa.int64(),
                                            mask=null_mask),
            "last_purchase_value": pa.array(
                m["last_purchase_value"].to_numpy(), type=pa.float64(),
                mask=null_mask),
        }).cast(out_schema)

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(bucket_asof, batch_format="pyarrow"))


def asof_last_purchase_sql(event_type: str = "purchase") -> str:
    return f"""
WITH p AS (
  SELECT user_id, ts, arg_max(value, event_id) AS last_purchase_value
  FROM events WHERE event_type = '{event_type}' GROUP BY user_id, ts
)
SELECT e.event_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS last_purchase_ts_us,
       p.last_purchase_value
FROM events e ASOF LEFT JOIN p
  ON e.user_id = p.user_id AND e.ts > p.ts
"""


# ------------------------------------------------------ range/interval join
# A RANGE JOIN (attach the interval [lo, hi) containing a value) is a
# non-equi join Ray Data has no operator for. Two regimes:
#   * interval table small (tier tables, SLA bands, histogram edges —
#     the overwhelmingly common case): broadcast the SORTED bounds once
#     and resolve per batch with one vectorized searchsorted. No
#     shuffle at all; the corpus streams.
#   * interval table large: range-partition BOTH sides by the interval
#     boundaries (the same sample-boundary machinery as
#     stages/rangesort) so each partition joins locally — not needed by
#     any current gate, documented for the 100 TB path.
PRICE_TIERS: tuple[tuple[float, str], ...] = (
    (0.0, "low"), (100000.0, "mid"), (250000.0, "high"), (400000.0, "lux"))


def range_lookup(ds: "ray.data.Dataset", col: str,
                 bounds_labels: tuple[tuple[float, str], ...],
                 out_col: str = "tier") -> "ray.data.Dataset":
    """Attach the label of the half-open interval [bound_i, bound_i+1)
    containing ``col`` (last interval unbounded above; rows below the
    first bound get a null label). Broadcast + searchsorted path."""
    lo = np.array([b for b, _ in bounds_labels], dtype=np.float64)
    labels = pa.array([l for _, l in bounds_labels], pa.string())

    def assign(batch: pa.Table) -> pa.Table:
        x = batch[col].combine_chunks().cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        idx = np.searchsorted(lo, x, side="right") - 1
        tier = pc.take(labels,
                       pa.array(np.where(idx >= 0, idx, None)))
        return batch.append_column(out_col, tier)

    return ds.map_batches(assign, batch_format="pyarrow")


def order_price_tiers(sf_dir: str) -> "ray.data.Dataset":
    """Gate: range-join orders onto price-tier intervals, then per-tier
    order count + total value in integer cents (sum in double, round
    once — see module docstring). Output (tier, n_orders, total_cents)."""
    ds = read_table(sf_dir, "orders", columns=["o_totalprice"])
    tiered = range_lookup(ds, "o_totalprice", PRICE_TIERS)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("tier").aggregate(
            [("o_totalprice", "sum"), ([], "count_all")])
        return pa.table({"tier": g["tier"],
                         "s": g["o_totalprice_sum"],
                         "n": g["count_all"].cast(pa.int64())})

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "tier": batch["tier"],
            "n_orders": batch["n"].combine_chunks().cast(pa.int64()),
            "total_cents": pc.round(pc.multiply(
                batch["s"].combine_chunks(),
                pa.scalar(100.0))).cast(pa.int64()),
        })

    return (tiered.map_batches(partial, batch_format="pyarrow")
            .groupby("tier").aggregate(Sum("s", alias_name="s"),
                                       Sum("n", alias_name="n"))
            .map_batches(finish, batch_format="pyarrow"))


def order_price_tiers_sql(
        tiers: tuple[tuple[float, str], ...] = PRICE_TIERS) -> str:
    rows = []
    for i, (lo, label) in enumerate(tiers):
        hi = tiers[i + 1][0] if i + 1 < len(tiers) else None
        hi_sql = "" if hi is None else f" AND o_totalprice < {hi!r}"
        rows.append(f"SELECT '{label}' AS tier, o_totalprice FROM orders"
                    f" WHERE o_totalprice >= {lo!r}{hi_sql}")
    union = "\n  UNION ALL\n  ".join(rows)
    return f"""
WITH tiered AS (
  {union}
)
SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(round(SUM(o_totalprice) * 100) AS BIGINT) AS total_cents
FROM tiered
GROUP BY tier
"""


# --------------------------------------------------------- anti join
def hash_anti_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                   left_key: str, right_key: str,
                   num_buckets: int | None = None) -> "ray.data.Dataset":
    """Left rows whose key has NO match in right (NOT EXISTS) — a join
    type Ray Data lacks. ONE bucket-hash shuffle of the tagged union:
    the right side is reduced to per-batch DISTINCT keys first (a
    combiner — at most one row per key per block crosses the wire), the
    left streams with payload; each bucket filters its left slice
    against its right key slice with a vectorized ``is_in``. A hot
    probe key is harmless: left rows spread over blocks, and the right
    side is distinct per key."""
    from ..stages.dedup import default_num_buckets
    if num_buckets is None:
        num_buckets = default_num_buckets()
    lschema = left.schema()
    cols = lschema.names
    union_schema = pa.schema(
        [(f"_l_{c}", lschema.base_schema.field(c).type) for c in cols] +
        [("_k", pa.string()), ("_side", pa.int8()),
         ("_bucket", pa.int32())])

    def _bucket_of(keys: pa.Array) -> pa.Array:
        import polars as pl
        b = (pl.from_arrow(pa.table({"k": keys})).hash_rows(seed=0)
             % num_buckets)
        return pa.array(b.cast(pl.Int32).to_numpy(), pa.int32())

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch[left_key].combine_chunks().cast(pa.string())
        arrays = [batch[c].combine_chunks() for c in cols]
        arrays += [k, pa.array([0] * batch.num_rows, pa.int8()),
                   _bucket_of(k)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def tag_right(batch: pa.Table) -> pa.Table:
        k = pc.unique(batch[right_key].combine_chunks().cast(pa.string()))
        arrays = [pa.nulls(len(k), lschema.base_schema.field(c).type)
                  for c in cols]
        arrays += [k, pa.array([1] * len(k), pa.int8()), _bucket_of(k)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    out_schema = pa.schema([(c, lschema.base_schema.field(c).type)
                            for c in cols])

    def bucket_anti(group: pa.Table) -> pa.Table:
        side = group["_side"].combine_chunks()
        rkeys = pc.unique(group.filter(pc.equal(side, 1))["_k"]
                          .combine_chunks())
        lrows = group.filter(pc.equal(side, 0))
        if len(rkeys) == 0:
            keep = lrows
        else:
            keep = lrows.filter(pc.invert(pc.is_in(
                lrows["_k"].combine_chunks(), value_set=rkeys)))
        return pa.table(
            {c: keep[f"_l_{c}"] for c in cols}).cast(out_schema)

    from ..stages.canonicalize import SANITIZE_BATCH
    # batch_size coalesces empty blocks (e.g. from a filtered probe
    # side) that would otherwise skip the tag fn and reach the union
    # with their upstream schema
    tagged = (left.map_batches(tag_left, batch_format="pyarrow",
                               batch_size=SANITIZE_BATCH)
              .union(right.map_batches(tag_right, batch_format="pyarrow",
                                       batch_size=SANITIZE_BATCH)))
    return (tagged.groupby("_bucket")
            .map_groups(bucket_anti, batch_format="pyarrow"))


BIG_ORDER_THRESHOLD = 300000.0


def customers_without_big_orders(
        sf_dir: str,
        threshold: float = BIG_ORDER_THRESHOLD) -> "ray.data.Dataset":
    """Gate: anti-join customers against their high-value orders
    (TPC-H Q22 shape). The probe side is filtered AT THE READ (predicate
    before the key combiner) so only qualifying keys cross the wire.
    Output (c_custkey, c_mktsegment)."""
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"])

    def big_only(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater(b["o_totalprice"],
                                   threshold)).select(["o_custkey"])

    big = orders.map_batches(big_only, batch_format="pyarrow")
    return hash_anti_join(cust, big, "c_custkey", "o_custkey")


CUSTOMERS_WITHOUT_BIG_ORDERS_SQL = f"""
SELECT c_custkey, c_mktsegment
FROM customer c
ANTI JOIN (SELECT o_custkey FROM orders
           WHERE o_totalprice > {BIG_ORDER_THRESHOLD!r}) o
  ON o.o_custkey = c.c_custkey
"""


# ------------------------------------------------ LAG window (per-key)
def event_time_deltas(sf_dir: str,
                      num_buckets: int | None = None) -> "ray.data.Dataset":
    """Per-event time since the user's PREVIOUS event (the LAG window
    function — per-row output, unlike the sessionize rollup). Users
    shuffle by ``user_id % B``; each bucket sorts its slice once and
    computes every user's deltas with one numpy diff (the user-boundary
    mask voids the first row per user). Output
    (event_id, delta_us:int64|null). Same ordering contract as
    sessionize: order is established inside the bucket, input block
    order is irrelevant; ts ties break by event_id."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])

    def bucketize(batch: pa.Table) -> pa.Table:
        uid = (batch["user_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        return batch.append_column(
            "_bucket", pa.array((uid % num_buckets).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "event_id": pd.Series(dtype=np.int64),
                "delta_us": pd.Series(dtype=np.float64)})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        user = g["user_id"].to_numpy(dtype=np.int64)
        tsv = (g["ts"].to_numpy(dtype="datetime64[us]")
               .astype(np.int64))
        # float64 with NaN-for-first, the same nullable-number
        # convention as asof_last_purchase: deltas are << 2**53 us so
        # the doubles are exact, and both engine and DuckDB render
        # identically for the value-hash gate
        delta = np.empty(len(g), dtype=np.float64)
        delta[0] = np.nan
        delta[1:] = (tsv[1:] - tsv[:-1]).astype(np.float64)
        first = np.empty(len(g), dtype=bool)
        first[0] = True
        first[1:] = user[1:] != user[:-1]
        delta[first] = np.nan
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(dtype=np.int64),
            "delta_us": delta})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_bucket").map_groups(per_bucket,
                                           batch_format="pandas"))


EVENT_TIME_DELTAS_SQL = """
SELECT event_id,
       CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
           AS delta_us
FROM events
"""


# -------------------------------------------------- grouped top-k counts
def grouped_topk_counts(ds: "ray.data.Dataset", key: str, value: str,
                        k: int, num_buckets: int | None = None
                        ) -> "ray.data.Dataset":
    """Per-key top-k most frequent values with deterministic tie order
    (count desc, value asc). Per-batch ``(key, value)`` count combiner
    → one hash(key) bucket shuffle of histogram-sized partials →
    per-bucket vectorized rank. Output (key, value, cnt, rank). A
    hot KEY is safe (its partials are one row per value per block);
    a web-scale VALUE DOMAIN per key is where you switch to the
    two-pass bounded-memory path (ops/sketch.heavy_hitters) per key."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        g = (batch.select([key, value])
             .group_by([key, value]).aggregate([([], "count_all")]))
        t = pa.table({key: g[key].cast(pa.string()),
                      "v": g[value].cast(pa.string()),
                      "cnt": g["count_all"].cast(pa.int64())})
        df = pl.from_arrow(t)
        bucket = ((df.select(key).hash_rows(seed=0) % num_buckets)
                  .cast(pl.Int32).rename("_bucket"))
        return df.with_columns(bucket).to_arrow().cast(
            pa.schema([(key, pa.string()), ("v", pa.string()),
                       ("cnt", pa.int64()), ("_bucket", pa.int32())]))

    def per_bucket(group: pa.Table) -> pa.Table:
        import polars as pl
        top = (pl.from_arrow(group.select([key, "v", "cnt"]))
               .group_by([key, "v"]).agg(pl.col("cnt").sum())
               .sort([key, "cnt", "v"], descending=[False, True, False])
               .with_columns(rank=pl.int_range(1, pl.len() + 1).over(key))
               .filter(pl.col("rank") <= k))
        return top.rename({"v": value}).to_arrow().cast(
            pa.schema([(key, pa.string()), (value, pa.string()),
                       ("cnt", pa.int64()), ("rank", pa.int64())]))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket").map_groups(per_bucket,
                                           batch_format="pyarrow"))


def top_tokens_per_lang(sf_dir: str, k: int = 5) -> "ray.data.Dataset":
    """Gate: per-language top-k tokens over the documents corpus.
    Output (lang, token, cnt, rank)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text"])

    def tokens(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks().cast(pa.string())
        lang = batch["lang"].combine_chunks().cast(pa.string())
        split = pc.split_pattern(text, pattern=" ")
        flat = split.flatten()
        parents = pc.list_parent_indices(split)
        mask = pc.greater(pc.utf8_length(flat), 0)
        return pa.table({"lang": lang.take(parents.filter(mask)),
                         "token": flat.filter(mask)})

    tok = ds.map_batches(tokens, batch_format="pyarrow")
    return grouped_topk_counts(tok, "lang", "token", k)


def top_tokens_per_lang_sql(k: int = 5) -> str:
    return f"""
WITH tok AS (
  SELECT lang, UNNEST(string_split(text, ' ')) AS token FROM documents
),
cnt AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS cnt
  FROM tok WHERE len(token) > 0 GROUP BY lang, token
)
SELECT lang, token, cnt,
       CAST(rk AS BIGINT) AS rank
FROM (SELECT *, row_number() OVER
        (PARTITION BY lang ORDER BY cnt DESC, token ASC) AS rk
      FROM cnt)
WHERE rk <= {k}
"""


# ------------------------------------------------------- rolling window
ROLLING_WINDOW_S = 3600


def rolling_user_counts(sf_dir: str, window_s: int = ROLLING_WINDOW_S,
                        num_buckets: int | None = None
                        ) -> "ray.data.Dataset":
    """Per-event rolling count: how many events the same user emitted in
    the inclusive window ``[ts - window_s, ts]`` (SQL ``RANGE BETWEEN
    INTERVAL w SECONDS PRECEDING AND CURRENT ROW`` — peers at equal ts
    count for every peer row).

    Shape: users shuffle once by ``user_id % num_buckets`` (the
    sessionize partitioning — same key, reusable co-location) and each
    bucket runs ONE fully-vectorized callback: sort by (user, ts), map
    rows onto a composite monotone key ``seg_id * span + rel_ts`` so a
    single pair of ``np.searchsorted`` calls answers every row's window
    query at C speed — no per-user Python loop, no pandas
    ``.rolling`` (whose ``closed=`` semantics disagree with SQL RANGE
    on ties). The ``lo`` bound is clamped to the user's segment start,
    which is the only place the composite key could leak into the
    previous user's range."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "event_id"])
    w_us = int(window_s) * 1_000_000

    def bucketize(batch: pa.Table) -> pa.Table:
        uid = (batch["user_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        return batch.append_column(
            "_bucket", pa.array((uid % num_buckets).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "event_id": pd.Series(dtype=np.int64),
                "n_in_window": pd.Series(dtype=np.int64)})
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        user = g["user_id"].to_numpy(dtype=np.int64)
        tsu = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        n = len(g)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = user[1:] != user[:-1]
        seg_id = np.cumsum(new_user) - 1
        rel = tsu - tsu.min()
        span = np.int64(rel.max()) + w_us + 1
        # composite key bound: segments-per-bucket x time-span must fit
        # int64. At 100 TB this is the bucket-count knob, not a limit.
        assert int(seg_id[-1] + 1) * int(span) < (1 << 62), (
            "rolling_user_counts: raise num_buckets (composite key "
            "would overflow)")
        synth = seg_id * span + rel
        seg_start = np.maximum.accumulate(
            np.where(new_user, np.arange(n), 0))
        hi = np.searchsorted(synth, synth, side="right")
        lo = np.searchsorted(synth, synth - w_us, side="left")
        lo = np.maximum(lo, seg_start)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(dtype=np.int64),
            "n_in_window": (hi - lo).astype(np.int64)})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_bucket").map_groups(per_bucket,
                                           batch_format="pandas"))


def rolling_user_counts_sql(window_s: int = ROLLING_WINDOW_S) -> str:
    return f"""
SELECT event_id,
       CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL {window_s} SECONDS PRECEDING
         AND CURRENT ROW) AS BIGINT) AS n_in_window
FROM events
"""


# ------------------------------------------------------- grouping sets
def corpus_rollup(sf_dir: str) -> "ray.data.Dataset":
    """GROUPING SETS ((lang,source),(lang),(source),()) over documents:
    doc count + char volume at every aggregation level, the standard
    corpus-composition report. Scale shape: the fine (lang,source)
    cells are combiner-aggregated first (per-batch polars partials →
    one tiny groupby — the cell space is lexicon², corpus-independent);
    the three coarser levels are then derived FROM the cells on a
    single block, so the corpus is scanned exactly once and the
    rollup costs nothing extra. NULL group keys are rendered as 'ALL'
    on both sides (no engine-vs-SQL null-format risk)."""
    ds = read_table(sf_dir, "documents",
                    columns=["lang", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)
        out = df.group_by(["lang", "source"]).agg(
            pl.len().cast(pl.Int64).alias("n"),
            pl.col("n_chars").sum().alias("chars"))
        return out.to_arrow()

    from ray.data.aggregate import Sum
    cells = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby(["lang", "source"])
             .aggregate(Sum("n", alias_name="n"),
                        Sum("chars", alias_name="chars")))

    def expand(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)
        lvls = [
            df.select(pl.col("lang"), pl.col("source"),
                      pl.col("n"), pl.col("chars")),
            df.group_by("lang").agg(pl.col("n").sum(),
                                    pl.col("chars").sum())
              .with_columns(pl.lit("ALL").alias("source")),
            df.group_by("source").agg(pl.col("n").sum(),
                                      pl.col("chars").sum())
              .with_columns(pl.lit("ALL").alias("lang")),
            df.select(pl.col("n").sum(), pl.col("chars").sum())
              .with_columns(pl.lit("ALL").alias("lang"),
                            pl.lit("ALL").alias("source")),
        ]
        out = pl.concat([x.select(["lang", "source", "n", "chars"])
                         for x in lvls])
        return out.rename({"n": "n_docs", "chars": "total_chars"}) \
            .to_arrow().cast(pa.schema([
                ("lang", pa.string()), ("source", pa.string()),
                ("n_docs", pa.int64()), ("total_chars", pa.int64())]))

    return cells.repartition(1).map_batches(expand, batch_size=None,
                                            batch_format="pyarrow")


CORPUS_ROLLUP_SQL = """
WITH cells AS (
  SELECT lang, source, count(*) AS n, sum(n_chars) AS chars
  FROM documents GROUP BY 1, 2
)
SELECT COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(chars) AS BIGINT) AS total_chars
FROM cells
GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
"""


# ----------------------------------------------------- strict funnel
FUNNEL_STAGES = ("view", "click", "purchase")


def conversion_funnel(sf_dir: str,
                      stages: tuple[str, ...] = FUNNEL_STAGES,
                      num_buckets: int | None = None
                      ) -> "ray.data.Dataset":
    """Strictly-ordered funnel: stage k is reached when an event of
    type ``stages[k]`` exists STRICTLY AFTER the timestamp that reached
    stage k-1 (first-occurrence chaining — the textbook sequential
    funnel, not mere set membership). Output (user_id, funnel_stage).

    One user-bucket shuffle (the sessionize key — co-location reused);
    inside each bucket the chain is k C-level pandas merge+groupby
    passes over only that bucket's events. Nothing is per-user Python;
    stage count is a constant, corpus-independent."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    ds = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])

    def bucketize(batch: pa.Table) -> pa.Table:
        uid = (batch["user_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        return batch.append_column(
            "_bucket", pa.array((uid % num_buckets).astype(np.int32)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        users = pd.DataFrame({"user_id": g["user_id"].unique()})
        users["funnel_stage"] = np.int64(0)
        reached = None  # (user_id, t_prev) of users at stage k-1
        for k, ev in enumerate(stages, start=1):
            sub = g[g["event_type"] == ev][["user_id", "ts"]]
            if reached is not None:
                sub = sub.merge(reached, on="user_id")
                sub = sub[sub["ts"] > sub["t_prev"]]
                sub = sub.drop(columns=["t_prev"])
            if not len(sub):
                break
            reached = (sub.groupby("user_id", sort=False)["ts"].min()
                       .rename("t_prev").reset_index())
            users.loc[users["user_id"].isin(reached["user_id"]),
                      "funnel_stage"] = np.int64(k)
        users["user_id"] = users["user_id"].astype(np.int64)
        return users

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_bucket").map_groups(per_bucket,
                                           batch_format="pandas"))


def conversion_funnel_sql(stages: tuple[str, ...] = FUNNEL_STAGES) -> str:
    ctes = ["u AS (SELECT DISTINCT user_id FROM events)"]
    prev = None
    for k, ev in enumerate(stages, start=1):
        ev_sql = ev.replace("'", "''")
        if prev is None:
            ctes.append(
                f"s{k} AS (SELECT user_id, min(ts) AS t{k} FROM events "
                f"WHERE event_type = '{ev_sql}' GROUP BY 1)")
        else:
            ctes.append(
                f"s{k} AS (SELECT e.user_id, min(ts) AS t{k} FROM events e "
                f"JOIN {prev} USING (user_id) "
                f"WHERE event_type = '{ev_sql}' AND ts > {prev}.t{k-1} "
                f"GROUP BY 1)")
        prev = f"s{k}"
    case = "CASE " + " ".join(
        f"WHEN s{k}.user_id IS NOT NULL THEN {k}"
        for k in range(len(stages), 0, -1)) + " ELSE 0 END"
    joins = " ".join(f"LEFT JOIN s{k} USING (user_id)"
                     for k in range(1, len(stages) + 1))
    return (f"WITH {', '.join(ctes)}\n"
            f"SELECT u.user_id, CAST({case} AS BIGINT) AS funnel_stage\n"
            f"FROM u {joins}")


# ------------------------------------------ left-outer aggregate join
def customer_order_counts(sf_dir: str, num_buckets: int | None = None
                          ) -> "ray.data.Dataset":
    """(c_custkey, n_orders) INCLUDING zero-order customers — the
    LEFT-JOIN-aggregate Ray Data lacks natively. Orders pre-aggregate
    per batch (combiner), the customer side ships keys only; one
    tagged-union bucket shuffle merges them with fill-zero."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey"])
    schema = pa.schema([("k", pa.int64()), ("n", pa.int64()),
                        ("_side", pa.int8()), ("_bucket", pa.int32())])

    def _b(k: np.ndarray) -> pa.Array:
        return pa.array((k % num_buckets).astype(np.int32))

    def tag_orders(batch: pa.Table) -> pa.Table:
        import polars as pl
        agg = (pl.from_arrow(batch).group_by("o_custkey").len()
               .rename({"o_custkey": "k", "len": "n"})
               .with_columns(pl.col("n").cast(pl.Int64),
                             pl.col("k").cast(pl.Int64)))
        k = agg["k"].to_numpy()
        return pa.Table.from_arrays(
            [pa.array(k, pa.int64()), agg["n"].to_arrow(),
             pa.array([0] * len(k), pa.int8()), _b(k)], schema=schema)

    def tag_cust(batch: pa.Table) -> pa.Table:
        k = (batch["c_custkey"].combine_chunks().cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        return pa.Table.from_arrays(
            [pa.array(k, pa.int64()),
             pa.array(np.zeros(len(k), np.int64)),
             pa.array([1] * len(k), pa.int8()), _b(k)], schema=schema)

    def merge(group: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(group.drop_columns(["_bucket"]))
        counts = (df.filter(pl.col("_side") == 0).group_by("k")
                  .agg(pl.col("n").sum()))
        cust_k = df.filter(pl.col("_side") == 1).select("k").unique()
        out = (cust_k.join(counts, on="k", how="left")
               .with_columns(pl.col("n").fill_null(0))
               .rename({"k": "c_custkey", "n": "n_orders"}))
        return out.to_arrow().cast(pa.schema([
            ("c_custkey", pa.int64()), ("n_orders", pa.int64())]))

    from ..stages.canonicalize import SANITIZE_BATCH
    tagged = (orders.map_batches(tag_orders, batch_format="pyarrow",
                                 batch_size=SANITIZE_BATCH)
              .union(cust.map_batches(tag_cust, batch_format="pyarrow",
                                      batch_size=SANITIZE_BATCH)))
    return (tagged.groupby("_bucket")
            .map_groups(merge, batch_format="pyarrow"))


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


# ---------------------------------------------------------------------------
# Grouped top-k ROWS (per-group best records, not value histograms)
# ---------------------------------------------------------------------------

def grouped_topk_rows(ds: "ray.data.Dataset", group: str,
                      order_col: str, k: int,
                      descending: bool = True,
                      tie_col: str | None = None,
                      num_buckets: int | None = None
                      ) -> "ray.data.Dataset":
    """Top-k rows per group by (order_col, tie_col) — the per-domain
    quality-sampling primitive (e.g. best k docs per language). A
    per-BATCH top-k combiner caps the wire at k rows per (group, block)
    before ONE hash(group) bucket shuffle; per-bucket C-level sort+head
    finishes. No global sort, no barrier."""
    import polars as pl
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    by = [order_col] + ([tie_col] if tie_col else [])
    desc = [descending] + ([False] if tie_col else [])

    def topk(df: "pl.DataFrame") -> "pl.DataFrame":
        return (df.sort(by, descending=desc)
                .group_by(group, maintain_order=True).head(k))

    def partial(batch: pa.Table) -> pa.Table:
        df = topk(pl.from_arrow(batch))
        h = df.select(pl.col(group).cast(pl.Utf8)).hash_rows(seed=0)
        return df.with_columns(
            (h % num_buckets).cast(pl.Int32).alias("_tb")).to_arrow()

    def finish(g: pa.Table) -> pa.Table:
        return topk(pl.from_arrow(g.drop_columns(["_tb"]))).to_arrow()

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_tb").map_groups(finish, batch_format="pyarrow"))


def top_docs_per_lang(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """Gate: the k longest documents per language (ties: doc_id asc)."""
    from ..sources.readers import read_table
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "n_chars"])
    out = grouped_topk_rows(docs, "lang", "n_chars", k, tie_col="doc_id")
    return out.map_batches(
        lambda b: b.select(["lang", "doc_id", "n_chars"]).cast(
            pa.schema([("lang", pa.string()), ("doc_id", pa.int64()),
                       ("n_chars", pa.int64())])),
        batch_format="pyarrow")


def top_docs_per_lang_sql(k: int = 3) -> str:
    return f"""
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# Majority-vote conflict resolution (KG truth discovery)
# ---------------------------------------------------------------------------

def majority_vote(ds: "ray.data.Dataset", s: str, o: str,
                  num_buckets: int | None = None) -> "ray.data.Dataset":
    """One resolved object per subject from conflicting assertions:
    majority count wins, ties broken by object value asc — the basic
    truth-discovery step when fusing multi-source extractions into one
    KG. Per-batch (s, o) count combiner -> ONE hash(s) bucket shuffle
    of histogram-sized partials -> per-bucket merge + argmax. The wire
    carries value-domain-sized counts, never the assertion stream."""
    import polars as pl
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        df = (pl.from_arrow(batch.select([s, o]))
              .group_by([s, o]).agg(pl.len().cast(pl.Int64).alias("n")))
        h = df.select(pl.col(s).cast(pl.Utf8)).hash_rows(seed=0)
        return df.with_columns(
            (h % num_buckets).cast(pl.Int32).alias("_vb")).to_arrow()

    def finish(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g.drop_columns(["_vb"]))
        merged = df.group_by([s, o]).agg(pl.col("n").sum())
        return (merged.sort(["n", o], descending=[True, False])
                .group_by(s, maintain_order=True).head(1)
                .rename({"n": "n_votes"}).to_arrow())

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_vb").map_groups(finish, batch_format="pyarrow"))


def customer_status_vote(sf_dir: str) -> "ray.data.Dataset":
    """Gate: each customer's majority order status over their orders —
    planted conflicts everywhere (statuses vary per order)."""
    from ..sources.readers import read_table
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_orderstatus"])
    out = majority_vote(orders, "o_custkey", "o_orderstatus")
    return out.map_batches(
        lambda b: b.cast(pa.schema([
            ("o_custkey", pa.int64()), ("o_orderstatus", pa.string()),
            ("n_votes", pa.int64())])),
        batch_format="pyarrow")


CUSTOMER_STATUS_VOTE_SQL = """
SELECT o_custkey, o_orderstatus, n_votes FROM (
  SELECT o_custkey, o_orderstatus,
         CAST(count(*) AS BIGINT) AS n_votes,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY count(*) DESC, o_orderstatus ASC)
             AS rn
  FROM orders GROUP BY o_custkey, o_orderstatus
) WHERE rn = 1
"""
