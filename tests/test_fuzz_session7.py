"""Differential fuzz for the round-5 session-4 SPARQL features:
randomized stores checked against DuckDB mirrors for term-identity
FILTER comparisons over string functions ('str' representation
class / term_cmp), IRI() constructor equality, string ordering,
UNION legs with differing variables, CONSTRUCT §16.2 instantiation
validity, and (p1/p2)+ sequence-group closures (cycle-safe recursive
CTE mirror). Same data-fuzz discipline as test_fuzz_session6."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kgforge.sparql import execute_sparql, parse_sparql

SEEDS = [11, 37, 71]

#: STR(?v) over a rendered term column in DuckDB (no datatyped /
#: lang-tagged literals in this fixture)
STR_SQL = "CASE WHEN starts_with({c}, '<') THEN trim({c}, '<>') " \
          "ELSE trim({c}, '\"') END"


def _rand_store(seed: int, tmp_path):
    import ray.data

    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rng = np.random.RandomState(seed)
    subs = [f"http://z/s{i}" for i in range(10)]
    preds = [f"http://z/p{i}" for i in range(3)]
    objs = ([f"<http://z/s{i}>" for i in range(10)]
            + [f'"word {i}"' for i in range(5)]
            + [f'"{v}"' for v in (3, 8, 21, 500)])
    rows = set()
    for _ in range(160):
        rows.add((subs[rng.randint(len(subs))],
                  preds[rng.randint(len(preds))],
                  objs[rng.randint(len(objs))]))
    rows = sorted(rows)
    tbl = pa.table({
        "s": pa.array([r[0] for r in rows], pa.string()),
        "p": pa.array([r[1] for r in rows], pa.string()),
        "o": pa.array([r[2] for r in rows], pa.string()),
    })
    store = str(tmp_path / f"fz7_{seed}")
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
def test_fuzz_ucase_eq(ray_session, tmp_path, seed):
    """UCASE(STR(?o)) = 'WORD 2' routes through term_cmp — the
    numeric path would return empty."""
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?s ?o WHERE {
        ?s <http://z/p0> ?o . FILTER(UCASE(STR(?o)) = "WORD 2") }""")
    want = _want(con, f"""
      SELECT s, o FROM trip WHERE p = 'http://z/p0'
      AND upper({STR_SQL.format(c='o')}) = 'WORD 2'""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_iri_constructor_eq(ray_session, tmp_path, seed):
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?s ?o WHERE {
        ?s <http://z/p1> ?o .
        FILTER(?s = IRI(CONCAT("http://z/", "s3"))) }""")
    want = _want(con, """
      SELECT s, o FROM trip
      WHERE p = 'http://z/p1' AND s = 'http://z/s3'""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_substr_ordering(ray_session, tmp_path, seed):
    """SUBSTR string ordering compares codepoints on both engines."""
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?o WHERE {
        ?s <http://z/p2> ?o .
        FILTER(SUBSTR(STR(?o), 1, 6) >= "word 2") }""")
    want = _want(con, f"""
      SELECT o FROM trip WHERE p = 'http://z/p2'
      AND substr({STR_SQL.format(c='o')}, 1, 6) >= 'word 2'""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_union_disjoint_vars(ray_session, tmp_path, seed):
    """UNION legs binding different vars pad with nulls; COUNT(?x)
    skips the padded side."""
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?s ?a ?b WHERE {
        { ?s <http://z/p0> ?a } UNION { ?s <http://z/p1> ?b } }""")
    want = _want(con, """
      SELECT s, o AS a, CAST(NULL AS VARCHAR) AS b FROM trip
      WHERE p = 'http://z/p0'
      UNION ALL
      SELECT s, CAST(NULL AS VARCHAR), o FROM trip
      WHERE p = 'http://z/p1'""")
    assert got == want
    cnt = _got(store, """
      SELECT (COUNT(?a) AS ?na) (COUNT(?b) AS ?nb) WHERE {
        { ?s <http://z/p0> ?a } UNION { ?s <http://z/p1> ?b } }""")
    wc = _want(con, """
      SELECT (SELECT COUNT(*) FROM trip WHERE p='http://z/p0') AS na,
             (SELECT COUNT(*) FROM trip WHERE p='http://z/p1') AS nb""")
    assert cnt == wc


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_construct_validity(ray_session, tmp_path, seed):
    """CONSTRUCT omits unbound-var instantiations and literal-subject
    triples (§16.2): ?o <inv> ?s over a mixed-object predicate keeps
    only the IRI-object rows."""
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      CONSTRUCT { ?o <http://z/inv> ?s }
      WHERE { ?s <http://z/p1> ?o }""")
    want = _want(con, """
      SELECT DISTINCT trim(o, '<>') AS s, 'http://z/inv' AS p,
             '<' || s || '>' AS o
      FROM trip WHERE p = 'http://z/p1' AND starts_with(o, '<')""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_seqgroup_closure(ray_session, tmp_path, seed):
    """(p0/p1)+ over a random (cyclic) graph vs a cycle-safe
    WITH RECURSIVE UNION mirror over the composed 2-hop relation."""
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?x ?y WHERE {
        ?x (<http://z/p0>/<http://z/p1>)+ ?y }""")
    want = _want(con, """
      WITH RECURSIVE
      e2 AS (
        SELECT DISTINCT a.s AS src, b.o AS dst
        FROM trip a JOIN trip b ON b.s = trim(a.o, '<>')
        WHERE a.p = 'http://z/p0' AND b.p = 'http://z/p1'
          AND starts_with(a.o, '<')),
      -- closure intermediates must be IRIs
      r(src, dst) AS (
        SELECT src, dst FROM e2
        UNION
        SELECT r.src, e2.dst FROM r
        JOIN e2 ON starts_with(r.dst, '<')
               AND e2.src = trim(r.dst, '<>')
      )
      SELECT DISTINCT src AS x, dst AS y FROM r""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_regex_flags(ray_session, tmp_path, seed):
    """REGEX 'i' flag vs DuckDB regexp_matches(..., 'i')."""
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?s ?o WHERE {
        ?s <http://z/p2> ?o . FILTER(REGEX(?o, "WORD [0-2]", "i")) }""")
    want = _want(con, f"""
      SELECT s, o FROM trip WHERE p = 'http://z/p2'
      AND regexp_matches({STR_SQL.format(c='o')}, 'WORD [0-2]', 'i')""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_eq_pushdown(ray_session, tmp_path, seed):
    """Group-level equality filters pushed into the pattern reads give
    the same rows as DuckDB's plain WHERE (?p partition prune, ?o
    parquet filter, mixed with a second free pattern)."""
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?s ?o WHERE {
        ?s ?p ?o . FILTER(?p = <http://z/p1>)
        FILTER(?o = "word 3") }""")
    want = _want(con, """
      SELECT s, o FROM trip
      WHERE p = 'http://z/p1' AND o = '"word 3"'""")
    assert got == want
    got2 = _got(store, """
      SELECT ?s ?b WHERE {
        ?s <http://z/p0> ?a . ?s <http://z/p2> ?b .
        FILTER(?a = <http://z/s4>) }""")
    want2 = _want(con, """
      SELECT a.s AS s, b.o AS b FROM trip a JOIN trip b ON a.s = b.s
      WHERE a.p = 'http://z/p0' AND b.p = 'http://z/p2'
        AND a.o = '<http://z/s4>'""")
    assert got2 == want2
