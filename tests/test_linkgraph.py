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


def test_triangle_parity(ray_session):
    df = linkgraph.triangle_counts(SF).to_pandas()
    odf = _oracle(linkgraph.triangle_counts_sql())
    assert _norm(df) == _norm(odf)
    # ring chords i->i+1, i->i+2 plant triangle (i, i+1, i+2) at every
    # node, so all 500 nodes participate and the total is divisible by 3
    assert len(df) == 500
    assert df["triangles"].sum() % 3 == 0


def test_triangle_join_path_equals_broadcast(ray_session):
    links = linkgraph.build_links(SF, linkgraph.TRI_MULTS)
    bc = linkgraph.triangle_node_counts(links).to_pandas()
    jn = linkgraph.triangle_node_counts(
        linkgraph.build_links(SF, linkgraph.TRI_MULTS),
        force_join=True).to_pandas()
    assert _norm(bc) == _norm(jn)


def test_triangle_planted_graph(ray_session):
    """K4 on {0,1,2,3} plus a pendant edge: each K4 vertex sits on
    C(3,2)=3 triangles, the pendant vertices on none."""
    import ray.data
    src = [0, 0, 0, 1, 1, 2, 3, 2, 0]  # K4 edges (some reversed/dup) + 3-9, 0-2 dup
    dst = [1, 2, 3, 2, 3, 3, 9, 0, 2]
    links = ray.data.from_items(
        [{"src": s, "dst": d} for s, d in zip(src, dst)])
    df = (linkgraph.triangle_node_counts(links, num_buckets=8)
          .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert df["doc_id"].tolist() == [0, 1, 2, 3]
    assert df["triangles"].tolist() == [3, 3, 3, 3]


def test_clustering_coefficient_parity(ray_session):
    df = linkgraph.clustering_coefficient(SF).to_pandas()
    odf = _oracle(linkgraph.clustering_coefficient_sql())
    assert _norm(df) == _norm(odf)
    # every node has coeff in [0, 1000] and deg >= 1 in this graph
    assert df["coeff_permille"].between(0, 1000).all()
    assert (df["deg"] >= 1).all()


def test_kcore_parity_and_paths(ray_session):
    from kgforge import scalar_ref as SR
    df = linkgraph.kcore_nodes(SF, k=3).to_pandas()
    odf = _oracle(SR.kcore_oracle_sql(3))
    assert _norm(df) == _norm(odf)
    assert len(df) == 492          # 3 peel rounds drop 8 nodes
    assert (df["core_deg"] >= 3).all()
    jn = linkgraph.kcore_nodes(SF, k=3, force_join=True).to_pandas()
    assert _norm(jn) == _norm(df)


def test_kcore_empty_core(ray_session):
    """k above the max core number peels everything away; the result is
    an empty dataset with the declared schema."""
    df = linkgraph.kcore_nodes(SF, k=4).to_pandas()
    assert len(df) == 0
    # Ray's to_pandas drops columns on 0-row results (repo convention:
    # both-empty IS equality), so only the row count is asserted
