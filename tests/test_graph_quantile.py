"""Graph analytics (ops/graph.py) and exact grouped quantiles
(ops/quantile.py): integer-exact PageRank vs a scalar naive reference
and vs the unrolled-CTE DuckDB mirror; path equivalence under the
broadcast-limit flip; percentile_disc semantics pinned on the
boundary cases."""

import duckdb
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def scalar_pagerank(edges: list[tuple[str, str]], iterations: int):
    """Naive dict/loop mirror of ops/graph.pagerank's integer
    arithmetic (edges must already be symmetric)."""
    from kgforge.ops.graph import BASE, DAMP, DEN, SCALE

    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {n: SCALE for n in deg}
    for _ in range(iterations):
        insum = {n: 0 for n in deg}
        for s, d in edges:
            insum[d] += rank[s] // deg[s]
        rank = {n: BASE + (DAMP * insum[n]) // DEN for n in deg}
    return rank


def test_pagerank_matches_scalar_reference(ray_session):
    import ray
    from kgforge.ops.graph import pagerank

    pairs = [(d, m) for d in range(9) for m in ("x", "y", "z")
             if (d + len(m) * 3) % (d % 3 + 2) == 0] + [(0, "x")]
    sym = []
    for d, m in sorted(set(pairs)):
        sym.append((f"d:{d}", f"e:{m}"))
        sym.append((f"e:{m}", f"d:{d}"))
    t = pa.table({"src": [e[0] for e in sym], "dst": [e[1] for e in sym]})
    ds = ray.data.from_arrow(t).repartition(3)
    got = {r["node"]: r["pr"] for r in pagerank(ds, iterations=4).take_all()}
    assert got == scalar_pagerank(sym, 4)


def test_pagerank_gate_broadcast_equals_salted(ray_session, monkeypatch):
    """The salted replicated-join scale path must produce the same
    int64 ranks as the broadcast path on the same input."""
    from kgforge.ops.graph import entity_pagerank

    a = sorted((r["node"], r["pr"])
               for r in entity_pagerank(SF).take_all())
    monkeypatch.setenv("KGFORGE_GRAPH_BROADCAST_LIMIT", "0")
    b = sorted((r["node"], r["pr"])
               for r in entity_pagerank(SF).take_all())
    assert a == b and len(a) > 100


def test_pagerank_gate_matches_sql(ray_session):
    from kgforge.ops.graph import entity_pagerank, entity_pagerank_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    want = {n: r for n, r in con.execute(entity_pagerank_sql()).fetchall()}
    got = {r["node"]: r["pr"] for r in entity_pagerank(SF).take_all()}
    assert got == want


def test_pagerank_mass_is_plausible(ray_session):
    """Sanity bound: every rank ≥ BASE, and total mass stays within
    [nodes*BASE, nodes*SCALE] (damping contracts toward SCALE)."""
    from kgforge.ops.graph import BASE, SCALE, entity_pagerank

    rows = entity_pagerank(SF).take_all()
    assert all(r["pr"] >= BASE for r in rows)
    total = sum(r["pr"] for r in rows)
    assert len(rows) * BASE <= total <= len(rows) * SCALE * 2


def test_grouped_quantiles_percentile_disc_boundaries(ray_session):
    """Pin the CUME_DIST definition on the classic boundary case:
    [1,2,3,4] -> p25=1, p50=2, p75=3, p99=4 (an off-by-one or a
    floor((n-1)q) implementation returns 3 for p99)."""
    import ray
    from kgforge.ops.quantile import grouped_quantiles

    t = pa.table({"g": ["a"] * 4 + ["b"],
                  "v": pa.array([1, 2, 3, 4, 7], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(2)
    out = {r["g"]: r for r in grouped_quantiles(
        ds, "g", "v", pcts=(25, 50, 75, 99)).take_all()}
    a = out["a"]
    assert (a["p25"], a["p50"], a["p75"], a["p99"]) == (1, 2, 3, 4)
    b = out["b"]
    assert (b["n"], b["p25"], b["p99"]) == (1, 7, 7)


def test_grouped_quantiles_ties_and_split_blocks(ray_session):
    """Heavy ties split across blocks must aggregate exactly."""
    import ray
    from kgforge.ops.quantile import grouped_quantiles

    vals = [5] * 90 + [6] * 9 + [100]
    t = pa.table({"g": ["k"] * 100, "v": pa.array(vals, pa.int64())})
    ds = ray.data.from_arrow(t).repartition(7)
    r = grouped_quantiles(ds, "g", "v", pcts=(50, 90, 99)).take_all()[0]
    assert (r["n"], r["p50"], r["p90"], r["p99"]) == (100, 5, 5, 6)


def test_lang_length_quantiles_matches_sql(ray_session):
    from kgforge.ops.quantile import (lang_length_quantiles,
                                      lang_length_quantiles_sql)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    want = sorted(map(tuple, con.execute(
        lang_length_quantiles_sql()).fetchall()))
    got = sorted((r["lang"], r["n"], r["p25"], r["p50"], r["p90"],
                  r["p99"])
                 for r in lang_length_quantiles(SF).take_all())
    assert got == want


def test_entity_cooccurrence_matches_sql(ray_session):
    from kgforge.ops.graph import (entity_cooccurrence,
                                   entity_cooccurrence_sql)

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    want = sorted(map(tuple, con.execute(
        entity_cooccurrence_sql()).fetchall()))
    got = sorted((r["a"], r["b"], r["n_docs"])
                 for r in entity_cooccurrence(SF).take_all())
    assert got == want and len(got) > 10
    assert all(a < b for a, b, _ in got)


def test_cooccurrence_planted(ray_session):
    """Planted: doc facts split across blocks by DOC (never within a
    doc); cross-doc pair counts aggregate exactly."""
    import ray
    from kgforge.ops.graph import cooccurrence_counts

    t = pa.table({
        "d": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "m": ["x", "y", "z", "x", "y", "y", "z"]})
    out = sorted((r["a"], r["b"], r["n_docs"]) for r in
                 cooccurrence_counts(
                     ray.data.from_arrow(t).repartition(1), "d", "m")
                 .take_all())
    assert out == [("x", "y", 2), ("x", "z", 1), ("y", "z", 2)]


def test_hdr_bucket_scalar_matches_vector():
    import numpy as np
    from kgforge.ops.quantile import hdr_bucket_ids, hdr_bucket_lo

    import math

    def scalar_bucket(v, bits=7):
        if v == 0:
            return 0
        m, e = math.frexp(float(v))
        return ((e + 1200) << bits) | int((m - 0.5) * (1 << (bits + 1)))

    vals = np.array([0, 1, 2, 3, 127, 128, 129, 10**6, 2**52 + 1,
                     2**62], dtype=np.int64)
    got = hdr_bucket_ids(vals).tolist()
    assert got == [scalar_bucket(int(v)) for v in vals]
    # lower bound never exceeds the value; relative width < 2^-6
    for v, b in zip(vals.tolist(), got):
        lo = hdr_bucket_lo(b)
        assert lo <= v
        if v > 0:
            assert (v - lo) / v <= 2 ** -6


def test_hdr_quantiles_accuracy_vs_exact(ray_session):
    """Sketch percentiles within 2^-7 relative error of the exact op
    on the same corpus."""
    from kgforge.ops.quantile import (lang_length_quantiles,
                                      lang_length_quantiles_hdr)

    exact = {r["lang"]: r for r in lang_length_quantiles(SF).take_all()}
    approx = {r["lang"]: r
              for r in lang_length_quantiles_hdr(SF).take_all()}
    assert exact.keys() == approx.keys()
    for lang, e in exact.items():
        a = approx[lang]
        assert a["n"] == e["n"]
        for p in (25, 50, 90, 99):
            true, est = e[f"p{p}"], a[f"q{p}"]
            assert est <= true
            assert (true - est) / true <= 2 ** -7 + 1e-12, (lang, p)


def test_entity_ppr_parity_all_paths(ray_session, monkeypatch):
    """Personalized PageRank: broadcast and salted paths equal the
    unrolled-CTE oracle; doc nodes get NO teleport mass (their rank is
    pure flow), entity nodes keep it."""
    import duckdb
    import hashlib
    from kgforge.ops import graph as G

    def norm(df):
        cols = sorted(df.columns)
        df = (df[cols].astype(str).sort_values(cols)
              .reset_index(drop=True))
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    ora = con.sql(G.entity_ppr_sql()).df()
    bc = G.entity_ppr(SF).to_pandas()
    assert norm(bc) == norm(ora)
    monkeypatch.setenv("KGFORGE_GRAPH_BROADCAST_LIMIT", "0")
    salted = G.entity_ppr(SF).to_pandas()
    assert norm(salted) == norm(ora)
    # seeds ('e:') hold strictly more rank than any doc node: every doc
    # rank lacks the base term
    e_min = bc[bc.node.str.startswith("e:")]["pr"].min()
    d_max = bc[bc.node.str.startswith("d:")]["pr"].max()
    assert len(bc[bc.node.str.startswith("e:")]) > 0
    assert bc[bc.node.str.startswith("d:")]["pr"].gt(0).all()


# --------------------------------------------------- k-hop reachability

def _khop_rows(ds):
    df = ds.to_pandas()
    return sorted(map(tuple, df[["node", "depth"]].itertuples(index=False)))


def _planted_edges():
    import ray.data
    # chain 0->1->2->3->4, a cycle back-edge 2->0, and a hub 0->{10,11}
    src = [0, 1, 2, 3, 2, 0, 0]
    dst = [1, 2, 3, 4, 0, 10, 11]
    return ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))


def _planted_seeds():
    import ray.data
    return ray.data.from_arrow(pa.table({"node": pa.array([0], pa.int64())}))


def test_khop_planted_chain_cycle_hub(ray_session):
    """BFS min-depth: cycle does not re-discover the seed, hub fans out
    at depth 1, chain advances one hop per round, k bounds the walk."""
    from kgforge.ops.graph import khop_reachable
    got = _khop_rows(khop_reachable(_planted_edges(), _planted_seeds(), 2))
    assert got == [(0, 0), (1, 1), (2, 2), (10, 1), (11, 1)]
    got4 = _khop_rows(khop_reachable(_planted_edges(), _planted_seeds(), 4))
    assert got4 == [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4),
                    (10, 1), (11, 1)]
    # early exit: frontier dries up before k
    got9 = _khop_rows(khop_reachable(_planted_edges(), _planted_seeds(), 9))
    assert got9 == got4


def test_khop_paths_equal(ray_session, monkeypatch):
    """broadcast, force_join, and the one-way mid-run switch all yield
    identical (node, depth) sets."""
    from kgforge.ops.graph import khop_reachable
    base = _khop_rows(khop_reachable(_planted_edges(), _planted_seeds(), 3))
    fj = _khop_rows(khop_reachable(_planted_edges(), _planted_seeds(), 3,
                                   force_join=True))
    assert fj == base
    monkeypatch.setenv("KGFORGE_GRAPH_BROADCAST_LIMIT", "2")
    sw = _khop_rows(khop_reachable(_planted_edges(), _planted_seeds(), 3))
    assert sw == base


def test_crawl_frontier_matches_recursive_cte(ray_session):
    import hashlib
    from kgforge.ops.graph import crawl_frontier, crawl_frontier_sql

    def norm(df):
        cols = sorted(df.columns)
        df = (df[cols].astype(str).sort_values(cols)
              .reset_index(drop=True))
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    ora = con.sql(crawl_frontier_sql()).df()
    got = crawl_frontier(SF).to_pandas()
    assert len(got) == len(ora) > 0
    assert norm(got) == norm(ora)


# ------------------------------------------------- transitive closure

def test_transitive_pairs_paths_equal_with_cycle(ray_session):
    """Chain + 2-cycle: closure includes cycle self-reachability; the
    driver-BFS and semi-naive Dataset paths are identical."""
    import ray.data
    from kgforge.ops.graph import transitive_pairs
    e = ray.data.from_arrow(pa.table({
        "src": ["a", "b", "d", "e"], "dst": ["b", "c", "e", "d"]}))

    def rows(ds):
        return sorted(map(tuple, ds.to_pandas().itertuples(index=False)))

    want = [("a", "b"), ("a", "c"), ("b", "c"),
            ("d", "d"), ("d", "e"), ("e", "d"), ("e", "e")]
    assert rows(transitive_pairs(e)) == want
    assert rows(transitive_pairs(e, force_join=True)) == want


def test_transitive_pairs_diamond_dedup(ray_session):
    """Diamond a->{b,c}->d: (a, d) appears ONCE (solutions are a set)."""
    import ray.data
    from kgforge.ops.graph import transitive_pairs
    e = ray.data.from_arrow(pa.table({
        "src": ["a", "a", "b", "c"], "dst": ["b", "c", "d", "d"]}))
    got = sorted(map(tuple, transitive_pairs(e, force_join=True)
                     .to_pandas().itertuples(index=False)))
    assert got == [("a", "b"), ("a", "c"), ("a", "d"),
                   ("b", "d"), ("c", "d")]


# --------------------------------------------------- label propagation

def _naive_lpa(pairs, rounds):
    """Scalar reference: synchronous LPA, most-frequent neighbor label,
    ties -> smallest label."""
    from collections import Counter, defaultdict
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        nxt = {}
        for n in adj:
            cnt = Counter(lab[m] for m in adj[n])
            best = max(cnt.values())
            nxt[n] = min(l for l, c in cnt.items() if c == best)
        lab = nxt
    return lab


def test_label_propagation_matches_naive(ray_session):
    """Two triangles + a bridge, checked against a scalar reference
    (the bridge PULLS the min label across under sync min-tie LPA —
    subtle enough that the expectation must be computed, not guessed);
    both engine paths identical."""
    import ray.data
    from kgforge.ops.graph import label_propagation
    pairs = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12),
             (2, 10)]
    e = ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    }))
    for rounds in (1, 3):
        want = _naive_lpa(pairs, rounds)
        got = {r.node: r.label
               for r in label_propagation(e, rounds=rounds).to_pandas()
               .itertuples(index=False)}
        assert got == want
        fj = {r.node: r.label
              for r in label_propagation(e, rounds=rounds,
                                         force_join=True)
              .to_pandas().itertuples(index=False)}
        assert fj == want


def test_link_communities_gate_parity(ray_session):
    import hashlib
    from kgforge.ops.graph import link_communities, link_communities_sql
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = (df[cols].astype(str).sort_values(cols)
              .reset_index(drop=True))
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = link_communities(SF).to_pandas()
    odf = con.sql(link_communities_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)
    # labels coarsen: strictly fewer communities than nodes
    assert df.label.nunique() < len(df)


# --------------------------------------------------------------- HITS

def test_hits_matches_scalar_reference(ray_session):
    import ray.data
    from kgforge.ops.graph import SCALE, hits
    pairs = [(0, 1), (0, 2), (1, 2), (3, 2), (2, 4)]
    e = ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    }))
    nodes = sorted({x for p in pairs for x in p})
    hub = {n: SCALE for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(2):
        auth = {n: sum(hub[u] for u, v in pairs if v == n)
                for n in nodes}
        m = max(auth.values())
        auth = {n: (v * SCALE // m if m else v)
                for n, v in auth.items()}
        hub = {n: sum(auth[v] for u, v in pairs if u == n)
               for n in nodes}
        m = max(hub.values())
        hub = {n: (v * SCALE // m if m else v) for n, v in hub.items()}
    got = {r.node: (r.hub, r.auth)
           for r in hits(e, rounds=2).to_pandas().itertuples(index=False)}
    assert got == {n: (hub[n], auth[n]) for n in nodes}
    # node 2 is the authority (3 in-links); node 0 the top hub
    assert got[2][1] == SCALE and got[0][0] == SCALE
    # sink node 4 hubs nothing
    assert got[4][0] == 0


def test_link_hits_gate_parity(ray_session):
    import hashlib
    from kgforge.ops.graph import link_hits, link_hits_sql
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = (df[cols].astype(str).sort_values(cols)
              .reset_index(drop=True))
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = link_hits(SF).to_pandas()
    odf = con.sql(link_hits_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)


def test_hits_high_indegree_no_int64_overflow(ray_session):
    """ADVICE r4: with in-degree >= 10 the round-1 auth sum is
    in_deg*SCALE and the old int64 normalization (x*SCALE//m) wrapped
    silently (negative scores). Star graph, 12 leaves -> one hub."""
    import ray.data
    from kgforge.ops.graph import SCALE, hits
    pairs = [(i, 100) for i in range(1, 13)] + [(100, 200)]
    e = ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64()),
    }))
    nodes = sorted({x for p in pairs for x in p})
    hub = {n: SCALE for n in nodes}
    auth = {n: 0 for n in nodes}
    for _ in range(2):
        auth = {n: sum(hub[u] for u, v in pairs if v == n)
                for n in nodes}
        m = max(auth.values())
        auth = {n: (v * SCALE // m if m else v)   # unbounded ints
                for n, v in auth.items()}
        hub = {n: sum(auth[v] for u, v in pairs if u == n)
               for n in nodes}
        m = max(hub.values())
        hub = {n: (v * SCALE // m if m else v) for n, v in hub.items()}
    got = {r.node: (r.hub, r.auth)
           for r in hits(e, rounds=2).to_pandas().itertuples(index=False)}
    assert got == {n: (hub[n], auth[n]) for n in nodes}
    assert all(h >= 0 and a >= 0 for h, a in got.values())
    assert got[100][1] == SCALE   # the 12-in-degree authority
