"""Differential fuzz for the session-5 SPARQL features: randomized
small stores (mixed IRI / plain-literal / numeric-literal objects,
multiple predicates, planted chains and cycles) checked against
hand-written DuckDB mirrors for each query shape — chains, OPTIONAL,
numeric FILTER, p+ closure, VALUES, NOT EXISTS. Same data-fuzz
discipline as test_fuzz_session3/4."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kgforge.sparql import execute_sparql, parse_sparql

SEEDS = [3, 17, 41, 97]


def _rand_store(seed: int, tmp_path) -> tuple[str, "duckdb.DuckDBPyConnection"]:
    import ray.data

    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rng = np.random.RandomState(seed)
    subs = [f"http://e/s{i}" for i in range(8)]
    preds = [f"http://e/p{i}" for i in range(3)]
    objs = ([f"<http://e/s{i}>" for i in range(8)]          # IRIs (chainable)
            + [f'"text {i}"' for i in range(4)]              # plain literals
            + [f'"{v}"' for v in (5, 17, 17, 42, 900)])      # numeric lexicals
    rows = set()
    for _ in range(140):
        rows.add((subs[rng.randint(len(subs))],
                  preds[rng.randint(len(preds))],
                  objs[rng.randint(len(objs))]))
    rows = sorted(rows)
    tbl = pa.table({
        "s": pa.array([r[0] for r in rows], pa.string()),
        "p": pa.array([r[1] for r in rows], pa.string()),
        "o": pa.array([r[2] for r in rows], pa.string()),
    })
    store = str(tmp_path / f"fz{seed}")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(tbl), store)
    con = duckdb.connect()
    con.register("trip_arrow", tbl)
    con.sql("CREATE TABLE trip AS SELECT * FROM trip_arrow")
    return store, con


def _got(store, q):
    df = execute_sparql(store, parse_sparql(q)[0]).to_pandas()
    if len(df) == 0:
        return []
    df = df.fillna("NULL")
    return sorted(map(tuple, df[sorted(df.columns)]
                      .itertuples(index=False)))


def _want(con, sql):
    df = con.sql(sql).df()
    if len(df) == 0:
        return []
    df = df.fillna("NULL")
    return sorted(map(tuple, df[sorted(df.columns)]
                      .itertuples(index=False)))


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_chain_join(ray_session, tmp_path, seed):
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?x ?y ?z WHERE {
        ?x <http://e/p0> ?y . ?y <http://e/p1> ?z }""")
    want = _want(con, """
      SELECT a.s AS x, a.o AS y, b.o AS z FROM trip a
      JOIN trip b ON starts_with(a.o, '<')
                 AND b.s = trim(a.o, '<>')
      WHERE a.p = 'http://e/p0' AND b.p = 'http://e/p1'""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_optional(ray_session, tmp_path, seed):
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?x ?y ?z WHERE {
        ?x <http://e/p0> ?y .
        OPTIONAL { ?y <http://e/p1> ?z } }""")
    want = _want(con, """
      SELECT a.s AS x, a.o AS y, b.o AS z FROM trip a
      LEFT JOIN trip b ON starts_with(a.o, '<')
                      AND b.s = trim(a.o, '<>')
                      AND b.p = 'http://e/p1'
      WHERE a.p = 'http://e/p0'""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_numeric_filter(ray_session, tmp_path, seed):
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?x ?v WHERE {
        ?x <http://e/p1> ?v . FILTER(?v >= 17) FILTER(?v < 900) }""")
    want = _want(con, """
      SELECT s AS x, o AS v FROM trip
      WHERE p = 'http://e/p1'
        AND TRY_CAST(trim(o, '"') AS DOUBLE) >= 17
        AND TRY_CAST(trim(o, '"') AS DOUBLE) < 900""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_plus_path(ray_session, tmp_path, seed):
    """p0+ with cycles (random functional-ish graph over 8 subjects is
    cyclic often) and literal endpoints."""
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, "SELECT ?x ?y WHERE { ?x <http://e/p0>+ ?y }")
    want = _want(con, """
      WITH RECURSIVE
      ei AS (SELECT s, trim(o, '<>') AS t FROM trip
             WHERE p = 'http://e/p0' AND starts_with(o, '<')),
      et AS (SELECT s, o FROM trip WHERE p = 'http://e/p0'),
      clo(a, b) AS (
        SELECT s, t FROM ei
        UNION
        SELECT clo.a, ei.t FROM clo JOIN ei ON ei.s = clo.b),
      pairs AS (
        SELECT s AS x, o AS y FROM et
        UNION
        SELECT clo.a, et.o FROM clo JOIN et ON et.s = clo.b)
      SELECT DISTINCT x, y FROM pairs""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_values(ray_session, tmp_path, seed):
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?x ?v WHERE {
        VALUES ?x { <http://e/s1> <http://e/s3> <http://e/s5> }
        ?x <http://e/p2> ?v }""")
    want = _want(con, """
      SELECT s AS x, o AS v FROM trip
      WHERE p = 'http://e/p2'
        AND s IN ('http://e/s1', 'http://e/s3', 'http://e/s5')""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_not_exists(ray_session, tmp_path, seed):
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?x ?v WHERE {
        ?x <http://e/p0> ?v .
        FILTER NOT EXISTS { ?x <http://e/p2> ?w } }""")
    want = _want(con, """
      SELECT s AS x, o AS v FROM trip a
      WHERE p = 'http://e/p0' AND NOT EXISTS (
        SELECT 1 FROM trip b
        WHERE b.p = 'http://e/p2' AND b.s = a.s)""")
    assert got == want
