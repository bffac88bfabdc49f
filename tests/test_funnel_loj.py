"""Strict conversion funnel + left-outer aggregate join: oracle parity
and planted stage/zero-count cases the sf corpus doesn't exercise."""

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from kgforge.ops import relational

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def _oracle(sql: str, views: dict[str, str]) -> pd.DataFrame:
    con = duckdb.connect()
    for name, path in views.items():
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{path}')")
    return con.sql(sql).df()


def test_funnel_parity(ray_session):
    df = relational.conversion_funnel(SF).to_pandas()
    odf = _oracle(relational.conversion_funnel_sql(),
                  {"events": f"{SF}/events.parquet"})
    assert _norm(df) == _norm(odf)


def _ev(tmp_path, rows):
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    return str(tmp_path)


def test_funnel_planted_stages(ray_session, tmp_path):
    rows = [
        # user 1: full funnel in order -> stage 3
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: click BEFORE view, purchase before click -> stage 1
        (2, 10, "click"), (2, 20, "view"), (2, 15, "purchase"),
        # user 3: view+click same ts (strict > fails) -> stage 1
        (3, 10, "view"), (3, 10, "click"),
        # user 4: purchase only -> stage 0
        (4, 10, "purchase"),
        # user 5: view, click, purchase before click -> stage 2
        (5, 10, "view"), (5, 30, "click"), (5, 20, "purchase"),
    ]
    d = _ev(tmp_path, rows)
    df = (relational.conversion_funnel(d).to_pandas()
          .set_index("user_id")["funnel_stage"].to_dict())
    assert df == {1: 3, 2: 1, 3: 1, 4: 0, 5: 2}
    odf = _oracle(relational.conversion_funnel_sql(),
                  {"events": f"{d}/events.parquet"})
    assert {int(r.user_id): int(r.funnel_stage)
            for r in odf.itertuples()} == df


def test_customer_order_counts_parity(ray_session):
    df = relational.customer_order_counts(SF).to_pandas()
    odf = _oracle(relational.CUSTOMER_ORDER_COUNTS_SQL,
                  {"customer": f"{SF}/customer.parquet",
                   "orders": f"{SF}/orders.parquet"})
    assert len(df) == len(odf)
    assert _norm(df) == _norm(odf)


def test_customer_order_counts_zeros(ray_session, tmp_path):
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 3], pa.int64()),
        "o_orderkey": pa.array([10, 11, 12], pa.int64())}),
        tmp_path / "orders.parquet")
    df = (relational.customer_order_counts(str(tmp_path)).to_pandas()
          .set_index("c_custkey")["n_orders"].to_dict())
    assert df == {1: 2, 2: 0, 3: 1, 4: 0}
