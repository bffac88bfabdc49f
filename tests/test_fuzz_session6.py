"""Differential fuzz for the round-5 session-3 SPARQL features:
randomized stores (mixed IRI / plain-literal / numeric-literal
objects) checked against hand-written DuckDB mirrors for BIND
arithmetic, ABS/FLOOR/ROUND, IF(), STRBEFORE/STRAFTER, isNumeric,
numeric ORDER BY pages, and negated property sets. Same data-fuzz
discipline as test_fuzz_session5."""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kgforge.sparql import execute_sparql, parse_sparql

SEEDS = [5, 23, 59, 83]

#: DuckDB rendering of STR(?v) over a rendered term column: IRIs drop
#: the angle brackets, literals drop the quotes (no datatypes/langtags
#: in this fixture's literal forms)
STR_SQL = "CASE WHEN starts_with({c}, '<') THEN trim({c}, '<>') " \
          "ELSE trim({c}, '\"') END"


def _rand_store(seed: int, tmp_path):
    import ray.data

    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rng = np.random.RandomState(seed)
    subs = [f"http://e/s{i}" for i in range(8)]
    preds = [f"http://e/p{i}" for i in range(3)]
    objs = ([f"<http://e/s{i}>" for i in range(8)]
            + [f'"text {i}"' for i in range(4)]
            + [f'"{v}"' for v in (5, 9, 10, 17, 42, 900)])
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


def _got(store, q, ordered=False):
    df = execute_sparql(store, parse_sparql(q)[0]).to_pandas()
    if len(df) == 0:
        return []
    df = df.fillna("NULL")
    rows = map(tuple, df[sorted(df.columns)].itertuples(index=False))
    return list(rows) if ordered else sorted(rows)


def _want(con, sql, ordered=False):
    df = con.sql(sql).df()
    if len(df) == 0:
        return []
    df = df.fillna("NULL")
    rows = map(tuple, df[sorted(df.columns)].itertuples(index=False))
    return list(rows) if ordered else sorted(rows)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_bind_arith(ray_session, tmp_path, seed):
    """ABS(?v*3 - 50): non-numeric terms unbind; FILTER prunes on the
    computed alias."""
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?x ?d WHERE {
        ?x <http://e/p0> ?v . BIND(ABS(?v * 3 - 50) AS ?d)
        FILTER(?d >= 10) }""")
    num = "TRY_CAST(trim(o, '\"') AS DOUBLE)"
    want = _want(con, f"""
      SELECT s AS x,
             CAST(CAST(ABS({num} * 3 - 50) AS BIGINT) AS VARCHAR) AS d
      FROM trip
      WHERE p = 'http://e/p0' AND NOT starts_with(o, '<')
        AND {num} IS NOT NULL AND ABS({num} * 3 - 50) >= 10""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_if_histogram(ray_session, tmp_path, seed):
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?t (COUNT(*) AS ?n) WHERE {
        ?x <http://e/p1> ?v . FILTER(isNumeric(?v))
        BIND(IF(?v < 20, "lo", "hi") AS ?t)
      } GROUP BY ?t""")
    num = "TRY_CAST(trim(o, '\"') AS DOUBLE)"
    want = _want(con, f"""
      SELECT CASE WHEN {num} < 20 THEN '"lo"' ELSE '"hi"' END AS t,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM trip
      WHERE p = 'http://e/p1' AND NOT starts_with(o, '<')
        AND {num} IS NOT NULL
      GROUP BY 1""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_strafter(ray_session, tmp_path, seed):
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?x ?t WHERE {
        ?x <http://e/p2> ?v . FILTER(isLiteral(?v))
        BIND(STRAFTER(STR(?v), "text ") AS ?t) }""")
    sv = STR_SQL.format(c="o")
    want = _want(con, f"""
      SELECT s AS x,
             CASE WHEN contains({sv}, 'text ')
                  THEN substr({sv}, position('text ' IN {sv}) + 5)
                  ELSE '' END AS t
      FROM trip WHERE p = 'http://e/p2' AND NOT starts_with(o, '<')""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_order_numeric_page(ray_session, tmp_path, seed):
    """Numeric ORDER BY with subject tiebreak: the top-7 page (in
    order) must match DuckDB's value sort, not a lexical sort."""
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?x ?v WHERE {
        ?x <http://e/p0> ?v . FILTER(isNumeric(?v))
      } ORDER BY DESC(?v) ?x LIMIT 7""", ordered=True)
    num = "TRY_CAST(trim(o, '\"') AS DOUBLE)"
    want = _want(con, f"""
      SELECT s AS x, o AS v FROM trip
      WHERE p = 'http://e/p0' AND NOT starts_with(o, '<')
        AND {num} IS NOT NULL
      ORDER BY {num} DESC, s ASC LIMIT 7""", ordered=True)
    # column sort puts v before x is false (v > x): columns are x, v
    # after sorted() -> (v, x); ordered compare keeps row order
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_negated_property_set(ray_session, tmp_path, seed):
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?x ?o WHERE { ?x !(<http://e/p0>|<http://e/p2>) ?o }""")
    want = _want(con, """
      SELECT s AS x, o FROM trip
      WHERE p NOT IN ('http://e/p0', 'http://e/p2')""")
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_select_expr_filter_arith(ray_session, tmp_path, seed):
    """SELECT expression + expression FILTER on random stores."""
    store, con = _rand_store(seed, tmp_path)
    got = _got(store, """
      SELECT ?x (?v * 2 + 1 AS ?d) WHERE {
        ?x <http://e/p1> ?v . FILTER(?v * 2 + 1 >= 20) }""")
    num = "TRY_CAST(trim(o, '\"') AS DOUBLE)"
    want = _want(con, f"""
      SELECT s AS x,
             CAST(CAST({num} * 2 + 1 AS BIGINT) AS VARCHAR) AS d
      FROM trip
      WHERE p = 'http://e/p1' AND NOT starts_with(o, '<')
        AND {num} IS NOT NULL AND {num} * 2 + 1 >= 20""")
    assert got == want
