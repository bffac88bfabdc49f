"""Non-equi join family (ops/relational.py): broadcast+searchsorted
range join and the bucket-hash anti-join, vs DuckDB and on planted
boundary cases."""

import duckdb
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _con(tables=("orders", "customer")):
    con = duckdb.connect()
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_range_lookup_boundaries(ray_session):
    """Half-open intervals: a value exactly on a bound belongs to the
    interval it opens; values below the first bound get null."""
    import ray
    from kgforge.ops.relational import range_lookup

    t = pa.table({"x": pa.array([-5.0, 0.0, 99999.99, 100000.0,
                                 250000.0, 1e9], pa.float64())})
    tiers = ((0.0, "low"), (100000.0, "mid"), (250000.0, "high"))
    out = range_lookup(ray.data.from_arrow(t), "x", tiers).take_all()
    assert [r["tier"] for r in out] == [None, "low", "low", "mid",
                                        "high", "high"]


def test_order_price_tiers_matches_sql(ray_session):
    from kgforge.ops.relational import (order_price_tiers,
                                        order_price_tiers_sql)

    con = _con()
    want = sorted(map(tuple, con.execute(order_price_tiers_sql())
                      .fetchall()))
    got = sorted((r["tier"], r["n_orders"], r["total_cents"])
                 for r in order_price_tiers(SF).take_all())
    assert got == want and len(got) >= 3


def test_anti_join_planted(ray_session):
    """Planted case: keys split across blocks, probe side with
    duplicates, one left key absent from probe."""
    import ray
    from kgforge.ops.relational import hash_anti_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "tag": ["a", "b", "c", "d", "e"]})).repartition(3)
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([2, 2, 4, 9, 9, 9], pa.int64())})).repartition(4)
    out = sorted((r["k"], r["tag"]) for r in
                 hash_anti_join(left, right, "k", "rk").take_all())
    assert out == [(1, "a"), (3, "c"), (5, "e")]


def test_anti_join_empty_probe(ray_session):
    """An empty probe side keeps every left row (and empty filtered
    probe blocks must not poison the union schema)."""
    import ray
    from kgforge.ops.relational import hash_anti_join

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([7, 8], pa.int64()), "tag": ["x", "y"]}))
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([], pa.int64())}))
    out = sorted((r["k"], r["tag"]) for r in
                 hash_anti_join(left, right, "k", "rk").take_all())
    assert out == [(7, "x"), (8, "y")]


def test_customers_without_big_orders_matches_sql(ray_session):
    from kgforge.ops.relational import (CUSTOMERS_WITHOUT_BIG_ORDERS_SQL,
                                        customers_without_big_orders)

    con = _con()
    want = sorted(map(tuple, con.execute(
        CUSTOMERS_WITHOUT_BIG_ORDERS_SQL).fetchall()))
    got = sorted((r["c_custkey"], r["c_mktsegment"]) for r in
                 customers_without_big_orders(SF).take_all())
    assert got == want and 0 < len(got)


def test_event_time_deltas_matches_sql(ray_session):
    from kgforge.ops.relational import (EVENT_TIME_DELTAS_SQL,
                                        event_time_deltas)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF}/events.parquet')")
    def norm(v):
        return -1.0 if v is None or v != v else float(v)

    want = sorted((e, norm(d)) for e, d in
                  con.execute(EVENT_TIME_DELTAS_SQL).fetchall())
    got = sorted((r["event_id"], norm(r["delta_us"]))
                 for r in event_time_deltas(SF).take_all())
    assert got == want and len(got) == 1000
    assert sum(1 for _, d in got if d < 0) > 0   # first-event NaNs exist


def test_grouped_topk_tie_order(ray_session):
    """Ties rank deterministically: count desc, then value asc."""
    import ray
    from kgforge.ops.relational import grouped_topk_counts

    t = pa.table({"g": ["x"] * 7,
                  "v": ["b", "a", "b", "a", "c", "c", "c"]})
    ds = ray.data.from_arrow(t).repartition(3)
    out = sorted((r["rank"], r["v"], r["cnt"]) for r in
                 grouped_topk_counts(ds, "g", "v", k=2).take_all())
    assert out == [(1, "c", 3), (2, "a", 2)]
