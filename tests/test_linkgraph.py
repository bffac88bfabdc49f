"""Link-graph ops (ops/linkgraph.py): oracle parity + structural
invariants of the synthesized multigraph."""

import hashlib

import duckdb
import pandas as pd

from kgforge.ops import linkgraph

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    return con.sql(sql).df()


def test_degree_parity(ray_session):
    df = linkgraph.link_degree_stats(SF).to_pandas()
    odf = _oracle(linkgraph.link_degree_stats_sql())
    assert _norm(df) == _norm(odf)
    # multigraph invariants: every node emits 2 links; sums balance
    assert (df["out_degree"] == 2).all()
    assert df["in_degree"].sum() == df["out_degree"].sum()


def test_reciprocal_parity(ray_session):
    df = linkgraph.reciprocal_links(SF).to_pandas()
    odf = _oracle(linkgraph.reciprocal_links_sql())
    assert _norm(df) == _norm(odf)
    # the 7x+1 map mod 500 has exactly two reciprocal orbits
    got = {tuple(r) for r in df.values.tolist()}
    assert got == {(104, 229), (354, 479)}
    assert (df["a"] < df["b"]).all()
