"""Generative SPARQL differential fuzz: random star-shaped BGPs with
random filters / OPTIONAL / DISTINCT / ORDER+LIMIT over random stores,
checked against programmatically-built DuckDB SQL. Unlike the fixed
fuzz suites (sessions 5-7), both the DATA and the QUERY are drawn from
a seeded generator — the mirror builder shares nothing with the
engine's planner.

Shape family (kept within representations the SQL mirror can write
without re-implementing the engine's class system):

    ?x <p_i> ?a . ?x <p_j> ?b [. ?x <p_k> ?c]
    [OPTIONAL { ?x <p_m> ?d }]
    [FILTER(?a > n | ?a = "lit" | STRSTARTS(STR(?a), "w"))]
    SELECT [DISTINCT] <subset of vars> [ORDER BY ?x ?a LIMIT k]

Every object var binds in exactly one o-position (term class), ?x
stays s-position (raw-IRI class) — so the mirror is plain self-joins
on s with term-string columns.
"""

import os

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from kgforge.sparql import execute_sparql, parse_sparql

SEEDS = [3, 17, 41, 67]
CASES_PER_SEED = 12

PREDS = [f"http://g/p{i}" for i in range(4)]


def _rand_store(rng, tmp_path, tag):
    import ray.data

    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    subs = [f"http://g/s{i}" for i in range(12)]
    objs = ([f"<http://g/s{i}>" for i in range(6)]
            + [f'"w{i}"' for i in range(6)]
            + [f'"{v}"' for v in (1, 4, 9, 25, 70)])
    rows = set()
    for _ in range(220):
        rows.add((subs[rng.randint(len(subs))],
                  PREDS[rng.randint(len(PREDS))],
                  objs[rng.randint(len(objs))]))
    rows = sorted(rows)
    tbl = pa.table({
        "s": pa.array([r[0] for r in rows], pa.string()),
        "p": pa.array([r[1] for r in rows], pa.string()),
        "o": pa.array([r[2] for r in rows], pa.string()),
    })
    store = str(tmp_path / f"gen_{tag}")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(tbl), store)
    con = duckdb.connect()
    con.register("trip_arrow", tbl)
    con.sql("CREATE TABLE trip AS SELECT * FROM trip_arrow")
    return store, con


STR_SQL = ("CASE WHEN starts_with({c}, '<') THEN trim({c}, '<>') "
           "ELSE trim({c}, '\"') END")
NUM_SQL = ("TRY_CAST(CASE WHEN regexp_matches(trim({c}, '\"'), "
           "'^-?[0-9]+(\\.[0-9]+)?$') AND starts_with({c}, '\"') "
           "THEN trim({c}, '\"') END AS DOUBLE)")


def _gen_case(rng):
    """One random query + its SQL mirror pieces."""
    n_req = 2 + rng.randint(2)            # 2 or 3 required patterns
    req = [PREDS[rng.randint(len(PREDS))] for _ in range(n_req)]
    use_opt = bool(rng.randint(2))
    opt_pred = PREDS[rng.randint(len(PREDS))]
    vnames = ["a", "b", "c"][:n_req]

    pats = " . ".join(f"?x <{p}> ?{v}" for p, v in zip(req, vnames))
    sparql = "SELECT"
    distinct = bool(rng.randint(2))
    if distinct:
        sparql += " DISTINCT"
    sel = ["x"] + vnames
    if use_opt:
        sel.append("d")
    sparql += " " + " ".join(f"?{v}" for v in sel)
    sparql += " WHERE { " + pats
    if use_opt:
        sparql += f" OPTIONAL {{ ?x <{opt_pred}> ?d }}"

    filt_kind = rng.randint(4)
    fv = vnames[rng.randint(len(vnames))]
    where_extra = ""
    if filt_kind == 1:
        thr = int(rng.choice([2, 8, 30]))
        sparql += f" FILTER(?{fv} > {thr})"
        where_extra = f"AND {NUM_SQL.format(c=fv)} > {thr}"
    elif filt_kind == 2:
        lit = f"w{rng.randint(6)}"
        sparql += f' FILTER(?{fv} = "{lit}")'
        where_extra = f"AND {fv} = '\"{lit}\"'"
    elif filt_kind == 3:
        sparql += f' FILTER(STRSTARTS(STR(?{fv}), "w"))'
        where_extra = (f"AND starts_with({STR_SQL.format(c=fv)}, 'w')")
    sparql += " }"

    # mirror SQL: self-joins on s
    joins = "trip t0"
    conds = [f"t0.p = '{req[0]}'"]
    for i in range(1, n_req):
        joins += f" JOIN trip t{i} ON t{i}.s = t0.s"
        conds.append(f"t{i}.p = '{req[i]}'")
    sel_sql = ["t0.s AS x"] + [f"t{i}.o AS {v}"
                               for i, v in enumerate(vnames)]
    if use_opt:
        joins += (f" LEFT JOIN (SELECT s, o FROM trip WHERE "
                  f"p = '{opt_pred}') od ON od.s = t0.s")
        sel_sql.append("od.o AS d")
    inner = (f"SELECT {', '.join(sel_sql)} FROM {joins} "
             f"WHERE {' AND '.join(conds)}")
    outer = f"SELECT {'DISTINCT ' if distinct else ''}* FROM ({inner})"
    if where_extra:
        outer += " WHERE TRUE " + where_extra
    return sparql, outer


def _norm(df):
    if len(df) == 0:
        return []
    df = df.fillna("NULL").astype(str)
    return sorted(map(tuple, df[sorted(df.columns)]
                      .itertuples(index=False)))


def _got(store, q):
    return _norm(execute_sparql(store, parse_sparql(q)[0]).to_pandas())


def _want(con, sql):
    return _norm(con.sql(sql).df())


@pytest.mark.parametrize("seed", SEEDS)
def test_generative_bgp_fuzz(ray_session, tmp_path, seed):
    rng = np.random.RandomState(seed)
    store, con = _rand_store(rng, tmp_path, seed)
    for case in range(CASES_PER_SEED):
        sparql, sql = _gen_case(rng)
        got = _got(store, sparql)
        want = _want(con, sql)
        assert got == want, (f"seed={seed} case={case}\n"
                             f"SPARQL: {sparql}\nSQL: {sql}")


def _gen_agg_case(rng):
    """Random grouped-aggregate query + mirror: COUNT/SUM over the
    star join's bag multiplicities."""
    p1, p2 = (PREDS[rng.randint(len(PREDS))],
              PREDS[rng.randint(len(PREDS))])
    fn = ["count", "sum"][rng.randint(2)]
    if fn == "count":
        sparql = (f"SELECT ?x (COUNT(?a) AS ?n) WHERE {{ "
                  f"?x <{p1}> ?a . ?x <{p2}> ?b }} GROUP BY ?x")
        agg = "COUNT(t0.o)"
    else:
        sparql = (f"SELECT ?x (SUM(?a) AS ?n) WHERE {{ "
                  f"?x <{p1}> ?a . ?x <{p2}> ?b }} GROUP BY ?x")
        # engine SUM: numeric lexical values only, float64; a group
        # with NO numeric value is an aggregate type error -> the
        # alias stays unbound (NULL), matching SQL SUM-over-all-NULL
        agg = f"SUM({NUM_SQL.format(c='t0.o')})"
    sql = (f"SELECT t0.s AS x, {agg} AS n "
           f"FROM trip t0 JOIN trip t1 ON t1.s = t0.s "
           f"WHERE t0.p = '{p1}' AND t1.p = '{p2}' GROUP BY 1")
    return sparql, sql


def _gen_minus_case(rng):
    p1, p2 = (PREDS[rng.randint(len(PREDS))],
              PREDS[rng.randint(len(PREDS))])
    lit = f"w{rng.randint(6)}"
    sparql = (f"SELECT ?x ?a WHERE {{ ?x <{p1}> ?a "
              f"MINUS {{ ?x <{p2}> \"{lit}\" }} }}")
    sql = (f"SELECT s AS x, o AS a FROM trip WHERE p = '{p1}' "
           f"AND s NOT IN (SELECT s FROM trip WHERE p = '{p2}' "
           f"AND o = '\"{lit}\"')")
    return sparql, sql


@pytest.mark.parametrize("seed", SEEDS)
def test_generative_agg_minus_fuzz(ray_session, tmp_path, seed):
    rng = np.random.RandomState(seed + 1000)
    store, con = _rand_store(rng, tmp_path, f"am{seed}")
    for case in range(8):
        gen = _gen_agg_case if case % 2 == 0 else _gen_minus_case
        sparql, sql = gen(rng)
        got = _got(store, sparql)
        want = _want(con, sql)
        assert got == want, (f"seed={seed} case={case}\n"
                             f"SPARQL: {sparql}\nSQL: {sql}")
