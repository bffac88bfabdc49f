"""SPARQL text front-end (kgforge/sparql.py): parser subset, plan
parity with the programmatic store APIs, INSERT mutation, and byte
parity with the reference's own requests.sparql."""

import os

import pyarrow as pa
import pytest

from kgforge.sparql import (REQUESTS_SPARQL, Iri, SparqlError, Var,
                            execute_sparql, load_reference_requests,
                            parse_sparql, run_sparql_file, sparql_insert)

SF = "/root/testdata/sf0.001"
REF = "/root/reference/csv2rdf-v4/jena/requests.sparql"


# ------------------------------------------------------------ parser

def test_embedded_copy_matches_reference_file():
    if not os.path.exists(REF):
        pytest.skip("reference tree not mounted")
    with open(REF, encoding="utf-8") as f:
        assert f.read() == REQUESTS_SPARQL
    assert load_reference_requests() == REQUESTS_SPARQL


def test_parse_all_four_statements():
    qs = parse_sparql(load_reference_requests())
    assert [q.form for q in qs] == ["select", "construct", "insert",
                                    "select"]
    assert qs[0].select_vars == ["x", "y", "z"] and not qs[0].distinct
    assert qs[3].distinct and qs[3].select_vars == ["x", "z"]
    m = qs[3].where.minus[0]
    assert len(m.patterns) == 2 and m.filters[0].op == "!="
    assert m.filters[0].var == "r1"
    # prefixes resolved into full IRIs
    assert isinstance(m.patterns[1].o, Iri)
    assert m.patterns[1].o.value.endswith("/mipl/applicable_to")


def test_parse_predicate_object_lists():
    qs = parse_sparql("""
PREFIX ex: <http://e/>
SELECT ?a WHERE { ?a ex:p ex:b , ex:c ; ex:q "lit" . }
""")
    pats = qs[0].where.patterns
    assert [(p.p.value, getattr(p.o, "value", None)) for p in pats] == [
        ("http://e/p", "http://e/b"), ("http://e/p", "http://e/c"),
        ("http://e/q", "lit")]
    assert all(p.s == Var("a") for p in pats)


def test_parse_a_keyword_and_comments():
    qs = parse_sparql("""
# standalone comment with <brackets> and "quotes"
PREFIX ex: <http://e/>
SELECT ?a WHERE { ?a a ex:T }  # trailing comment
""")
    p = qs[0].where.patterns[0]
    assert p.p.value.endswith("22-rdf-syntax-ns#type")


def test_parser_errors():
    with pytest.raises(SparqlError):
        parse_sparql("SELECT ?x WHERE { ?x ex:p ?y }")   # undeclared prefix
    with pytest.raises(SparqlError):
        parse_sparql("COPY DEFAULT TO <http://g>")       # unsupported form
    with pytest.raises(SparqlError):
        parse_sparql("PREFIX e: <http://e/> SELECT ?x WHERE "
                     "{ FILTER(?x > e:n) ?x e:p ?y }")   # non-numeric order
    with pytest.raises(SparqlError):
        parse_sparql("PREFIX e: <http://e/> SELECT ?x WHERE "
                     "{ FILTER(langMatches(?x, \"en\")) "
                     "?x e:p ?y }")   # fn subset: needs LANG(?var)
    with pytest.raises(SparqlError):
        parse_sparql("PREFIX e: <http://e/> SELECT ?x WHERE "
                     "{ FILTER regex(?x, ?y) ?x e:p ?y }")  # pat not const


# ------------------------------------------------- plan parity (ray)

@pytest.fixture(scope="module")
def v4store(ray_session):
    from kgforge.pipelines.tabular import _v4_part_store
    return _v4_part_store(SF)


def _rows(ds):
    return sorted(map(tuple, ds.to_pandas().itertuples(index=False)))


def test_select_all_matches_store_scan(ray_session, v4store):
    from kgforge.sinks.store_query import query_triples
    q = parse_sparql(load_reference_requests())[0]
    got = execute_sparql(v4store, q)
    want = query_triples(v4store)
    assert _rows(got) == _rows(want)
    assert got.schema().names == ["x", "y", "z"]


def test_construct_matches_entailed_facts(ray_session, v4store):
    from kgforge.stages.entailment import entailed_facts
    q = parse_sparql(load_reference_requests())[1]
    got = execute_sparql(v4store, q)
    assert got.schema().names == ["s", "p", "o"]
    assert _rows(got) == _rows(entailed_facts(v4store))


def test_versioning_minus_matches_query_minus(ray_session):
    """The parsed MINUS plan must equal the programmatic query_minus
    with the closure-derived exclusion list."""
    from kgforge.pipelines.versioning import NS1, NS1V1, NS1V2, versioned_store
    from kgforge.sinks.store_query import query_minus
    store = versioned_store(SF)
    q = parse_sparql(load_reference_requests())[3]
    got = execute_sparql(store, q)
    want = query_minus(store, NS1V2 + "applicable_to",
                       [NS1V1 + "applicable_to"])
    got_rows = _rows(got)
    assert got_rows == _rows(want)
    assert len(got_rows) > 0


def test_versioning_minus_hash_join_path(ray_session, monkeypatch):
    """KGFORGE_BROADCAST_LIMIT=0 forces the hash-partitioned anti-join;
    result must be identical to the broadcast path."""
    from kgforge.pipelines.versioning import versioned_store
    store = versioned_store(SF)
    q = parse_sparql(load_reference_requests())[3]
    base = _rows(execute_sparql(store, q))
    monkeypatch.setenv("KGFORGE_BROADCAST_LIMIT", "0")
    forced = _rows(execute_sparql(store, q))
    assert forced == base


def test_insert_mutates_store_idempotently(ray_session, tmp_path):
    """INSERT..WHERE applied twice: first run asserts the derived
    facts, second run inserts nothing (graph is a set)."""
    import shutil

    from kgforge.pipelines.versioning import versioned_store
    from kgforge.sinks.store_query import query_triples
    from kgforge.stages.entailment import entailed_facts
    src = versioned_store(SF)
    store = str(tmp_path / "store")
    shutil.copytree(src, store)
    parent = "https://www.olivier.com/rdf/mipl/applicable_to"
    q = parse_sparql(load_reference_requests())[2]
    before = query_triples(store, p=parent).count()
    derived = entailed_facts(store).count()
    out1 = sparql_insert(store, q)
    assert out1.count() == derived
    after1 = query_triples(store, p=parent).count()
    assert after1 == before + derived
    # idempotent: nothing new on re-apply
    sparql_insert(store, q)
    assert query_triples(store, p=parent).count() == after1


def test_run_sparql_file_runs_all_statements(ray_session, v4store):
    outs = run_sparql_file(v4store, load_reference_requests())
    assert len(outs) == 4
    assert outs[0].schema().names == ["x", "y", "z"]
    assert outs[1].schema().names == ["s", "p", "o"]
    # CONSTRUCT and read-only INSERT derive the same graph
    assert _rows(outs[1]) == _rows(outs[2])


# ------------------------------------------------------------ aggregates

def test_parse_aggregates():
    from kgforge.sparql import parse_sparql
    q = parse_sparql("""
      SELECT ?y (COUNT(*) AS ?n) (MIN(?x) AS ?lo)
      WHERE { ?x ?y ?z } GROUP BY ?y ORDER BY DESC(?n) ?y LIMIT 7
    """)[0]
    assert [a.func for a in q.aggs] == ["count", "min"]
    assert q.aggs[0].var is None and q.aggs[1].var == "x"
    assert q.group_by == ["y"]
    assert q.order_by == [("n", True), ("y", False)]
    assert q.limit == 7


def test_parse_aggregate_errors():
    import pytest as _pt
    from kgforge.sparql import SparqlError, parse_sparql
    with _pt.raises(SparqlError):
        parse_sparql("SELECT (MEDIAN(?x) AS ?s) WHERE { ?x ?y ?z }")
    with _pt.raises(SparqlError):
        parse_sparql("SELECT (MIN(*) AS ?m) WHERE { ?x ?y ?z }")
    with _pt.raises(SparqlError):  # ?z not in GROUP BY
        parse_sparql(
            "SELECT ?z (COUNT(*) AS ?n) WHERE { ?x ?y ?z } GROUP BY ?y")


def test_aggregate_gate_parity(ray_session):
    import duckdb
    from kgforge.pipelines import versioning as V
    df = V.sparql_groupby_count(SF).to_pandas()
    con = duckdb.connect()
    for t in ("part",):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    odf = con.sql(V.sparql_groupby_count_sql()).df()
    assert len(df) == len(odf) == 5
    a = df.sort_values(["n", "y"]).reset_index(drop=True)
    b = odf.sort_values(["n", "y"]).reset_index(drop=True)
    assert a["y"].tolist() == b["y"].tolist()
    assert a["n"].astype("int64").tolist() == b["n"].astype("int64").tolist()


def test_aggregate_global_count(ray_session):
    from kgforge.pipelines.tabular import _v4_part_store
    from kgforge.sparql import execute_sparql, parse_sparql
    store = _v4_part_store(SF)
    total = execute_sparql(
        store,
        parse_sparql("SELECT (COUNT(*) AS ?total) WHERE { ?x ?y ?z }")[0]
    ).to_pandas()
    full = execute_sparql(
        store,
        parse_sparql("SELECT ?x ?y ?z WHERE { ?x ?y ?z }")[0]).count()
    assert int(total["total"].iloc[0]) == full > 0


def test_kg_snapshot_delta_parity_and_consistency(ray_session):
    """graph_delta == bidirectional EXCEPT, and its 'added' direction
    must equal the reference MINUS query's result exactly."""
    import duckdb
    from kgforge.pipelines import versioning as V
    df = V.kg_snapshot_delta(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")
    odf = con.sql(V.kg_snapshot_delta_sql()).df()
    key = ["change", "x", "z"]
    a = df[key].sort_values(key).reset_index(drop=True)
    b = odf[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    minus = con.sql(V.sparql_versioning_minus_sql()).df()
    added = df[df.change == "added"][["x", "z"]]
    assert (set(map(tuple, added.itertuples(index=False)))
            == set(map(tuple, minus.itertuples(index=False))))


def test_graph_delta_planted(ray_session):
    import ray.data
    from kgforge.ops.graph import graph_delta
    old = ray.data.from_items(
        [{"s": "a", "o": "1"}, {"s": "b", "o": "2"},
         {"s": "b", "o": "2"}])                       # dup collapses
    new = ray.data.from_items(
        [{"s": "b", "o": "2"}, {"s": "c", "o": "3"}])
    df = (graph_delta(old, new, ["s", "o"]).to_pandas()
          .sort_values(["change", "s"]).reset_index(drop=True))
    assert df.values.tolist() == [["c", "3", "added"],
                                  ["a", "1", "removed"]]


def test_kg_as_of_status_parity_and_cut(ray_session):
    import duckdb
    from kgforge.pipelines import versioning as V
    df = V.kg_as_of_status(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{SF}/orders.parquet')")
    odf = con.sql(V.kg_as_of_status_sql()).df()
    key = ["s", "p", "o", "valid_from"]
    assert (df[key].sort_values(key).reset_index(drop=True)
            .equals(odf[key].sort_values(key).reset_index(drop=True)))
    # every winner is at or before the cut; one row per subject
    assert (df["valid_from"] <= V.ASOF_DATE).all()
    assert df["s"].is_unique
    # a later cut covers at least as many subjects
    late = V.kg_as_of_status(SF, as_of="2005-01-01").to_pandas()
    assert len(late) >= len(df)


def test_parse_optional():
    from kgforge.sparql import parse_sparql
    q = parse_sparql("""
      SELECT ?x ?w WHERE {
        ?x <http://p/a> ?a .
        OPTIONAL { ?x <http://p/b> ?w }
      }
    """)[0]
    assert len(q.where.optionals) == 1
    assert len(q.where.optionals[0].patterns) == 1
    assert q.where.patterns[0].vars() == ["x", "a"]


def test_sparql_optional_gate_bound_and_unbound(ray_session):
    import duckdb
    from kgforge.pipelines import versioning as V
    df = V.sparql_optional_v2(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")
    odf = con.sql(V.sparql_optional_v2_sql()).df()
    key = ["x", "a", "w"]
    assert (df[key].sort_values(key).reset_index(drop=True)
            .equals(odf[key].sort_values(key).reset_index(drop=True)))
    # both OPTIONAL paths are genuinely exercised: odd part keys have
    # no carried v2 pair -> unbound; even keys bind the witness
    n_unbound = (df["w"] == "").sum()
    assert 0 < n_unbound < len(df)
    assert (df.loc[df.w != "", "w"] == df.loc[df.w != "", "a"]).all()


def test_sparql_union_gate_and_bag_semantics(ray_session):
    import duckdb
    from kgforge.pipelines import versioning as V
    df = V.sparql_union_versions(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")
    odf = con.sql(V.sparql_union_versions_sql()).df()
    key = ["x", "a"]
    a = df[key].sort_values(key).reset_index(drop=True)
    b = odf[key].sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    # bag semantics: carried (even-key) pairs appear in BOTH arms
    assert len(df) == 500
    assert df.duplicated().sum() == 100


def test_union_mismatched_vars_pad_or_reject():
    """UNION legs binding different vars pad the missing ones with
    nulls (spec semantics; see test_sparql_builtins union tests) —
    but a var bound OUTSIDE the union that a leg leaves unbound still
    raises (inner join on null would silently drop rows)."""
    import pytest as _pt
    from kgforge.sparql import SparqlError, execute_sparql, parse_sparql
    from kgforge.pipelines.tabular import _v4_part_store
    store = _v4_part_store("/root/testdata/sf0.001")
    q = parse_sparql("""
      SELECT ?x ?a ?b WHERE {
        { ?x <http://p/a> ?a } UNION { ?x <http://p/b> ?b }
      }
    """)[0]
    assert execute_sparql(store, q).count() == 0   # pads, runs, empty
    q2 = parse_sparql("""
      SELECT ?x WHERE {
        ?x <http://p/c> ?a .
        { ?x <http://p/a> ?a } UNION { ?x <http://p/b> ?b }
      }
    """)[0]
    with _pt.raises(SparqlError, match="bound outside the UNION"):
        execute_sparql(store, q2)


def test_cli_sparql_mode(ray_session, tmp_path):
    """--sparql runs the reference's own query file against a store and
    writes one CSV per statement."""
    import pandas as pd
    from kgforge.cli import main
    from kgforge.pipelines.tabular import _v4_part_store
    from kgforge.sparql import load_reference_requests
    store = _v4_part_store(SF)
    qfile = tmp_path / "req.sparql"
    qfile.write_text(load_reference_requests())
    out = tmp_path / "out"
    rc = main(["--sparql", str(qfile), "--store", store,
               "-o", str(out)])
    assert rc == 0
    files = sorted(p.name for p in out.iterdir())
    assert files == ["statement1_select.csv", "statement2_construct.csv",
                     "statement3_insert.csv", "statement4_select.csv"]
    df = pd.read_csv(out / "statement1_select.csv")
    assert len(df) > 0 and list(df.columns) == ["x", "y", "z"]


# ------------------------------------------------- FILTER expressions

def test_parse_filter_ops():
    from kgforge.sparql import Num
    q = parse_sparql("""
      PREFIX e: <http://e/>
      SELECT ?x ?c WHERE {
        ?x e:p ?c .
        FILTER(?c >= 905) FILTER(?c < 915.5) FILTER(?c != e:bad)
        FILTER regex(str(?c), "a+b")
        FILTER(strstarts(str(?x), "http://e/"))
        FILTER contains(?x, "frag")
      }
    """)[0]
    ops = [f.op for f in q.where.filters]
    assert ops == [">=", "<", "!=", "regex", "strstarts", "contains"]
    assert q.where.filters[0].term == Num("905")
    assert q.where.filters[1].term == Num("915.5")
    assert q.where.filters[3].term.value == "a+b"


def test_filter_numeric_matches_lexical_forms(ray_session, tmp_path):
    """Numeric FILTER compares the lexical VALUE: "900.00" matches
    = 900; non-numeric terms are eliminated, not errors."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": pa.array([f"http://e/s{i}" for i in range(4)]),
        "p": pa.array(["http://e/val"] * 4),
        "o": pa.array(['"900.00"', '"900.5"', '"free text"',
                       '"901"^^<http://www.w3.org/2001/XMLSchema#integer>']),
    })
    store = str(tmp_path / "store")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    got = execute_sparql(store, parse_sparql(
        "SELECT ?x ?v WHERE { ?x <http://e/val> ?v . FILTER(?v = 900) }"
    )[0]).to_pandas()
    assert got["v"].tolist() == ['"900.00"']
    got2 = execute_sparql(store, parse_sparql(
        "SELECT ?x ?v WHERE { ?x <http://e/val> ?v . FILTER(?v > 900) }"
    )[0]).to_pandas()
    assert sorted(got2["v"]) == ['"900.5"',
                                 '"901"^^<http://www.w3.org/2001/XMLSchema#integer>']


def test_filter_str_functions_strip_term_form(ray_session, tmp_path):
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": pa.array(["http://e/a", "http://e/b"]),
        "p": pa.array(["http://e/val"] * 2),
        "o": pa.array(['<http://e/obj_one>', '"plain two"']),
    })
    store = str(tmp_path / "store")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    # strstarts over STR() sees the IRI without <>
    got = execute_sparql(store, parse_sparql(
        'SELECT ?x ?v WHERE { ?x <http://e/val> ?v . '
        'FILTER strstarts(str(?v), "http://e/obj") }')[0]).to_pandas()
    assert got["v"].tolist() == ["<http://e/obj_one>"]
    # regex over STR() sees the literal without quotes
    got2 = execute_sparql(store, parse_sparql(
        'SELECT ?x ?v WHERE { ?x <http://e/val> ?v . '
        'FILTER regex(str(?v), "^plain t") }')[0]).to_pandas()
    assert got2["v"].tolist() == ['"plain two"']
    # contains on an s-position var (raw IRI, STR is identity)
    got3 = execute_sparql(store, parse_sparql(
        'SELECT ?x ?v WHERE { ?x <http://e/val> ?v . '
        'FILTER contains(?x, "/b") }')[0]).to_pandas()
    assert got3["x"].tolist() == ["http://e/b"]


def test_filter_gate_parity(ray_session):
    """The two FILTER gates hash-match their DuckDB mirrors at test SF."""
    import duckdb
    import hashlib
    from kgforge.pipelines import versioning as V
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    for fn, sql in ((V.sparql_filter_numeric, V.sparql_filter_numeric_sql()),
                    (V.sparql_filter_strfuncs,
                     V.sparql_filter_strfuncs_sql())):
        df = fn(SF).to_pandas()
        odf = con.sql(sql).df()
        assert sorted(df.columns) == sorted(odf.columns)
        assert norm(df) == norm(odf)


# ------------------------------------------- position-crossing chains

@pytest.fixture()
def chain_store(ray_session, tmp_path):
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": ["http://e/a", "http://e/b", "http://e/a"],
        "p": ["http://e/p1", "http://e/p2", "http://e/p1"],
        "o": ['<http://e/b>', '<http://e/c>', '"literal obj"'],
    })
    store = str(tmp_path / "chain")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    return store


def test_object_to_subject_chain(ray_session, chain_store):
    """?x p1 ?y . ?y p2 ?z — the o-position binding must join the
    s-position read in ONE representation (regression: this silently
    returned empty when o kept term form against raw s)."""
    q = parse_sparql("SELECT ?x ?y ?z WHERE "
                     "{ ?x <http://e/p1> ?y . ?y <http://e/p2> ?z }")[0]
    df = execute_sparql(chain_store, q).to_pandas()
    assert df.to_dict("records") == [
        {"x": "http://e/a", "y": "<http://e/b>", "z": "<http://e/c>"}]


def test_chain_literal_stays_unbound_under_optional(ray_session,
                                                    chain_store):
    """A literal ?y cannot match an s-position: dropped by the inner
    join, kept with unbound ?z under OPTIONAL (type-error semantics —
    the representation fix must not FILTER the outer side)."""
    q = parse_sparql(
        "SELECT ?x ?y ?z WHERE { ?x <http://e/p1> ?y . "
        "OPTIONAL { ?y <http://e/p2> ?z } }")[0]
    rows = sorted(execute_sparql(chain_store, q).to_pandas()
                  .fillna("NULL").itertuples(index=False))
    assert [tuple(r) for r in rows] == [
        ("http://e/a", '"literal obj"', "NULL"),
        ("http://e/a", "<http://e/b>", "<http://e/c>")]


def test_chain_into_schema_pattern(ray_session, tmp_path):
    """o-position var chained into a SCHEMA closure pattern: the
    closure's raw IRIs are wrapped to the var's term form."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    sc = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
    rows = pa.table({
        "s": ["http://e/x1", "http://e/T", "http://e/Mid"],
        "p": ["http://e/typed", sc, sc],
        "o": ['<http://e/T>', '<http://e/Mid>', '<http://e/Top>'],
    })
    store = str(tmp_path / "schchain")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    q = parse_sparql(
        "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> "
        "SELECT ?i ?t ?a WHERE { ?i <http://e/typed> ?t . "
        "?t rdfs:subClassOf ?a }")[0]
    got = sorted(execute_sparql(store, q).to_pandas()
                 .itertuples(index=False))
    # transitive closure: T -> Mid and T -> Top. ?t joins in term form
    # (o-position elsewhere); ?a is schema-closure-only and stays a raw
    # IRI, the module's convention for entailed schema bindings.
    assert [tuple(r) for r in got] == [
        ("http://e/x1", "<http://e/T>", "http://e/Mid"),
        ("http://e/x1", "<http://e/T>", "http://e/Top")]


# ------------------------------------------------- property paths (p+)

def test_parse_property_path():
    q = parse_sparql("PREFIX e: <http://e/> "
                     "SELECT ?x ?y WHERE { ?x e:p+ ?y }")[0]
    assert q.where.patterns[0].path == "+"
    with pytest.raises(SparqlError):   # variable predicate path
        parse_sparql("SELECT ?x ?y WHERE { ?x ?p+ ?y }")


def test_path_pairs_with_literal_endpoint(ray_session, tmp_path):
    """a -p-> b -p-> c -p-> "lit": p+ yields all 6 pairs — literals are
    valid ENDPOINTS (any depth) but never intermediates."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": ["http://e/a", "http://e/b", "http://e/c"],
        "p": ["http://e/p"] * 3,
        "o": ['<http://e/b>', '<http://e/c>', '"leaf lit"'],
    })
    store = str(tmp_path / "path")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    q = parse_sparql("SELECT ?x ?y WHERE { ?x <http://e/p>+ ?y }")[0]
    got = sorted(map(tuple, execute_sparql(store, q).to_pandas()
                     .itertuples(index=False)))
    assert got == [
        ("http://e/a", '"leaf lit"'), ("http://e/a", "<http://e/b>"),
        ("http://e/a", "<http://e/c>"), ("http://e/b", '"leaf lit"'),
        ("http://e/b", "<http://e/c>"), ("http://e/c", '"leaf lit"')]
    # constant start endpoint
    q2 = parse_sparql(
        "SELECT ?y WHERE { <http://e/a> <http://e/p>+ ?y }")[0]
    ys = sorted(execute_sparql(store, q2).to_pandas()["y"])
    assert ys == ['"leaf lit"', "<http://e/b>", "<http://e/c>"]
    # constant end endpoint (term form compare)
    q3 = parse_sparql(
        'SELECT ?x WHERE { ?x <http://e/p>+ "leaf lit" }')[0]
    xs = sorted(execute_sparql(store, q3).to_pandas()["x"])
    assert xs == ["http://e/a", "http://e/b", "http://e/c"]


def test_path_gate_parity(ray_session):
    import duckdb
    import hashlib
    from kgforge.pipelines import versioning as V
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = V.sparql_path_ancestors(SF).to_pandas()
    odf = con.sql(V.sparql_path_ancestors_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)


# ------------------------------------------------------------ ASK form

def test_ask_form(ray_session, chain_store):
    q = parse_sparql(
        "ASK { ?x <http://e/p1> ?y }")[0]
    assert q.form == "ask"
    got = execute_sparql(chain_store, q).to_pandas()
    assert got["ask"].tolist() == [True]
    q2 = parse_sparql(
        'ASK WHERE { ?x <http://e/p1> "nope" }')[0]
    got2 = execute_sparql(chain_store, q2).to_pandas()
    assert got2["ask"].tolist() == [False]


def test_ask_gate_parity(ray_session):
    import duckdb
    from kgforge.pipelines import versioning as V
    df = V.sparql_ask_pair(SF).sort_values("which").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")
    odf = (con.sql(V.sparql_ask_pair_sql()).df()
           .sort_values("which").reset_index(drop=True))
    assert df["which"].tolist() == odf["which"].tolist()
    assert df["ask"].tolist() == odf["ask"].astype(bool).tolist()


# ------------------------------------------------------------ VALUES

def test_parse_values_forms():
    q = parse_sparql("""
      PREFIX e: <http://e/>
      SELECT ?x ?y WHERE {
        VALUES ?x { e:a e:b }
        VALUES (?x ?y) { (e:a "1") (e:b "2") }
        ?x e:p ?y
      }""")[0]
    assert [v[0] for v in q.where.values] == [["x"], ["x", "y"]]
    assert len(q.where.values[1][1]) == 2
    with pytest.raises(SparqlError):   # row width mismatch
        parse_sparql('PREFIX e: <http://e/> SELECT ?x WHERE '
                     '{ VALUES (?x ?y) { (e:a) } ?x e:p ?y }')
    with pytest.raises(SparqlError):   # var in rows
        parse_sparql('PREFIX e: <http://e/> SELECT ?x WHERE '
                     '{ VALUES ?x { ?y } ?x e:p ?y }')


def test_values_restricts_bindings(ray_session, chain_store):
    q = parse_sparql("""
      SELECT ?x ?y WHERE {
        VALUES ?x { <http://e/a> }
        ?x <http://e/p1> ?y
      }""")[0]
    got = sorted(map(tuple, execute_sparql(chain_store, q).to_pandas()
                     .itertuples(index=False)))
    assert got == [("http://e/a", '"literal obj"'),
                   ("http://e/a", "<http://e/b>")]
    # o-position VALUES constant renders in term form
    q2 = parse_sparql("""
      SELECT ?x ?y WHERE {
        ?x <http://e/p1> ?y
        VALUES ?y { <http://e/b> }
      }""")[0]
    got2 = sorted(map(tuple, execute_sparql(chain_store, q2).to_pandas()
                      .itertuples(index=False)))
    assert got2 == [("http://e/a", "<http://e/b>")]


def test_values_gate_parity(ray_session):
    import duckdb
    import hashlib
    from kgforge.pipelines import versioning as V
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = V.sparql_values_brands(SF).to_pandas()
    odf = con.sql(V.sparql_values_brands_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)


# ----------------------------------------------------------- DESCRIBE

def test_describe_forms(ray_session, chain_store):
    q = parse_sparql("DESCRIBE <http://e/b>")[0]
    got = sorted(map(tuple, execute_sparql(chain_store, q).to_pandas()
                     .itertuples(index=False)))
    assert got == [("http://e/b", "http://e/p2", "<http://e/c>")]
    # var form: resources from the WHERE group; literal bindings are
    # skipped (a literal has no description)
    q2 = parse_sparql(
        "DESCRIBE ?y WHERE { <http://e/a> <http://e/p1> ?y }")[0]
    got2 = sorted(map(tuple, execute_sparql(chain_store, q2).to_pandas()
                      .itertuples(index=False)))
    assert got2 == [("http://e/b", "http://e/p2", "<http://e/c>")]
    with pytest.raises(SparqlError):
        parse_sparql("DESCRIBE ?x")       # var without WHERE
    with pytest.raises(SparqlError):
        parse_sparql("DESCRIBE")          # no terms


def test_describe_gate_parity(ray_session):
    import duckdb
    import hashlib
    from kgforge.pipelines import versioning as V
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = V.sparql_describe_brands(SF).to_pandas()
    odf = con.sql(V.sparql_describe_brands_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)


def test_describe_join_fallback_equals_broadcast(ray_session, monkeypatch):
    """KGFORGE_BROADCAST_LIMIT=0 forces the distributed semi-join path
    for the DESCRIBE resource set — identical triple set to the
    broadcast membership path (no more cliff above the limit)."""
    import hashlib
    from kgforge.pipelines import versioning as V

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    base = V.sparql_describe_brands(SF).to_pandas()
    monkeypatch.setenv("KGFORGE_BROADCAST_LIMIT", "0")
    joined = V.sparql_describe_brands(SF).to_pandas()
    assert len(joined) == len(base) > 0
    assert norm(joined) == norm(base)


# ------------------------------------------------- FILTER [NOT] EXISTS

@pytest.fixture()
def exists_store(ray_session, tmp_path):
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": ["http://e/a", "http://e/b", "http://e/a"],
        "p": ["http://e/p1", "http://e/p1", "http://e/p2"],
        "o": ['"1"', '"2"', '"x"'],
    })
    store = str(tmp_path / "ex")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    return store


def test_not_exists_correlated(ray_session, exists_store):
    q = parse_sparql("SELECT ?x WHERE { ?x <http://e/p1> ?v . "
                     "FILTER NOT EXISTS { ?x <http://e/p2> ?w } }")[0]
    assert sorted(execute_sparql(exists_store, q).to_pandas()["x"]) == \
        ["http://e/b"]
    q2 = parse_sparql("SELECT ?x WHERE { ?x <http://e/p1> ?v . "
                      "FILTER EXISTS { ?x <http://e/p2> ?w } }")[0]
    assert sorted(execute_sparql(exists_store, q2).to_pandas()["x"]) == \
        ["http://e/a"]


def test_not_exists_uncorrelated(ray_session, exists_store):
    """No shared vars: the inner group acts as an uncorrelated ASK."""
    q = parse_sparql("SELECT ?x WHERE { ?x <http://e/p1> ?v . "
                     "FILTER NOT EXISTS { ?y <http://e/p2> ?w } }")[0]
    assert len(execute_sparql(exists_store, q).to_pandas()) == 0
    q2 = parse_sparql("SELECT ?x WHERE { ?x <http://e/p1> ?v . "
                      "FILTER EXISTS { ?y <http://e/nope> ?w } }")[0]
    assert len(execute_sparql(exists_store, q2).to_pandas()) == 0
    q3 = parse_sparql("SELECT ?x WHERE { ?x <http://e/p1> ?v . "
                      "FILTER EXISTS { ?y <http://e/p2> ?w } }")[0]
    assert len(execute_sparql(exists_store, q3).to_pandas()) == 2


def test_not_exists_gate_parity(ray_session):
    import duckdb
    import hashlib
    from kgforge.pipelines import versioning as V
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = V.sparql_not_exists(SF).to_pandas()
    odf = con.sql(V.sparql_not_exists_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)


# ------------------------------------------- path syntax (/, ^, |)

def test_parse_path_syntax():
    q = parse_sparql("PREFIX e: <http://e/> "
                     "SELECT ?x ?z WHERE { ?x e:p1/e:p2+ ?z }")[0]
    pats = q.where.patterns
    assert len(pats) == 2
    assert pats[0].o == pats[1].s          # fresh chained var
    assert pats[0].o.name.startswith("_seq")
    assert pats[1].path == "+"
    q2 = parse_sparql("PREFIX e: <http://e/> "
                      "SELECT ?a ?b WHERE { ?a e:p|e:q ?b }")[0]
    assert len(q2.where.unions) == 1 and len(q2.where.unions[0]) == 2
    # '/' inside '|': sequence leg becomes a projected union leg
    q3 = parse_sparql("PREFIX e: <http://e/> SELECT ?a ?b WHERE "
                      "{ ?a e:p/e:q|e:r ?b }")[0]
    assert len(q3.where.unions) == 1 and len(q3.where.unions[0]) == 2
    seq_leg, simple_leg = q3.where.unions[0]
    assert seq_leg.project == ("a", "b") and len(seq_leg.patterns) == 2
    assert simple_leg.project == ("a", "b")   # all legs align
    with pytest.raises(SparqlError):   # var predicate inside '|'
        parse_sparql("PREFIX e: <http://e/> SELECT ?a ?b WHERE "
                     "{ ?a ?p/e:q|e:r ?b }")
    # parenthesized groups distribute at parse time: (p|q)/r -> two
    # two-pattern sequence legs
    q4 = parse_sparql("PREFIX e: <http://e/> SELECT ?a ?b WHERE "
                      "{ ?a (e:p|e:q)/e:r ?b }")[0]
    assert len(q4.where.unions) == 1 and len(q4.where.unions[0]) == 2
    assert all(len(leg.patterns) == 2 for leg in q4.where.unions[0])
    # ^(a/b) == ^b/^a: inverted-and-reversed plain sequence; inverse
    # elements swap subject/object at emit time
    q5 = parse_sparql("PREFIX e: <http://e/> "
                      "SELECT ?x ?z WHERE { ?x ^(e:a/e:b) ?z }")[0]
    p_b, p_a = q5.where.patterns
    assert (p_b.p.value, p_a.p.value) == ("http://e/b", "http://e/a")
    assert p_b.o.name == "x" and p_a.s.name == "z"      # swapped
    assert p_b.s == p_a.o and p_b.s.name.startswith("_seq")
    # modifier on a group parses to an AltSet closure pattern
    from kgforge.sparql import AltSet
    q6 = parse_sparql("PREFIX e: <http://e/> SELECT ?a ?b WHERE "
                      "{ ?a (e:p|e:q)+ ?b }")[0]
    assert isinstance(q6.where.patterns[0].p, AltSet)
    assert q6.where.patterns[0].path == "+"
    with pytest.raises(SparqlError):   # ^ needs a constant
        parse_sparql("SELECT ?a ?b WHERE { ?a ^?p ?b }")


def test_path_syntax_eval(ray_session, tmp_path):
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": ["http://e/a", "http://e/b", "http://e/a", "http://e/c"],
        "p": ["http://e/p1", "http://e/p2", "http://e/q", "http://e/p2"],
        "o": ['<http://e/b>', '"end"', '"qv"', '"c2"'],
    })
    store = str(tmp_path / "paths")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    seq = execute_sparql(store, parse_sparql(
        "SELECT ?x ?z WHERE { ?x <http://e/p1>/<http://e/p2> ?z }")[0]
    ).to_pandas()
    assert sorted(map(tuple, seq.itertuples(index=False))) == [
        ("http://e/a", '"end"')]
    inv = execute_sparql(store, parse_sparql(
        "SELECT ?y ?x WHERE { ?y ^<http://e/p1> ?x }")[0]).to_pandas()
    assert sorted(map(tuple, inv.itertuples(index=False))) == [
        ("<http://e/b>", "http://e/a")]
    alt = execute_sparql(store, parse_sparql(
        "SELECT ?x ?v WHERE { ?x <http://e/p2>|<http://e/q> ?v }")[0]
    ).to_pandas()
    assert sorted(map(tuple, alt.itertuples(index=False))) == [
        ("http://e/a", '"qv"'), ("http://e/b", '"end"'),
        ("http://e/c", '"c2"')]


def test_path_group_alternation_eval(ray_session, tmp_path):
    """Sequence legs inside '|' and parenthesized sub-paths evaluate:
    each sequence leg is projected down to the path endpoints before
    the union, so fresh chain vars never leak."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": ["http://e/a", "http://e/b", "http://e/a", "http://e/c"],
        "p": ["http://e/p1", "http://e/p2", "http://e/q", "http://e/p2"],
        "o": ['<http://e/b>', '"end"', '"qv"', '"c2"'],
    })
    store = str(tmp_path / "gpaths")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    # (p1/p2)|q : two-hop leg plus direct leg
    got = execute_sparql(store, parse_sparql(
        "SELECT ?x ?v WHERE { ?x (<http://e/p1>/<http://e/p2>)"
        "|<http://e/q> ?v }")[0]).to_pandas()
    assert sorted(map(tuple, got[["x", "v"]].itertuples(index=False))) \
        == [("http://e/a", '"end"'), ("http://e/a", '"qv"')]
    # group in the middle of a sequence: p1/(p2|q) distributes
    got2 = execute_sparql(store, parse_sparql(
        "SELECT ?x ?v WHERE { ?x <http://e/p1>/(<http://e/p2>"
        "|<http://e/q>) ?v }")[0]).to_pandas()
    assert sorted(map(tuple, got2[["x", "v"]].itertuples(index=False))) \
        == [("http://e/a", '"end"')]
    # inverse over a group: ^(p1/p2) goes object->subject two hops
    got3 = execute_sparql(store, parse_sparql(
        "SELECT ?v ?x WHERE { ?v ^(<http://e/p1>/<http://e/p2>) ?x }"
    )[0]).to_pandas()
    assert sorted(map(tuple, got3[["v", "x"]].itertuples(index=False))) \
        == [('"end"', "http://e/a")]


def test_modified_path_group_closure(ray_session, tmp_path):
    """(a|b)+ — AltSet closure over the UNION of two predicates' edge
    sets; subset rejections for inverse/sequence/inner-modifier
    members."""
    import ray.data
    from kgforge.sparql import AltSet
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    q = parse_sparql("PREFIX e: <http://e/> "
                     "SELECT ?x ?y WHERE { ?x (e:a|e:b)+ ?y }")[0]
    pat = q.where.patterns[0]
    assert isinstance(pat.p, AltSet) and pat.path == "+"
    assert pat.p.values == ("http://e/a", "http://e/b")
    rows = pa.table({
        "s": ["http://e/n1", "http://e/n2", "http://e/n3"],
        "p": ["http://e/a", "http://e/b", "http://e/c"],
        "o": ['<http://e/n2>', '<http://e/n3>', '<http://e/n4>'],
    })
    store = str(tmp_path / "altset")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    got = execute_sparql(store, q).to_pandas()
    # n1-a->n2-b->n3: closure crosses predicates; c edges excluded
    assert sorted(map(tuple, got[["x", "y"]].itertuples(index=False))) \
        == [("http://e/n1", "<http://e/n2>"),
            ("http://e/n1", "<http://e/n3>"),
            ("http://e/n2", "<http://e/n3>")]
    # (a|b)? = length-1 over the union + reflexive IRI node domain
    q2 = parse_sparql("PREFIX e: <http://e/> "
                      "SELECT ?x ?y WHERE { ?x (e:a|e:b)? ?y }")[0]
    assert len(execute_sparql(store, q2).to_pandas()) == 6
    # (e:a/e:b)+ is now a SeqSet (see test_sparql_builtins seq-group
    # tests); inverse members and inner modifiers stay rejected
    for bad in ("{ ?x (^e:a|e:b)+ ?y }",
                "{ ?x (e:a+|e:b)* ?y }"):
        with pytest.raises(SparqlError):
            parse_sparql("PREFIX e: <http://e/> SELECT ?x ?y WHERE "
                         + bad)


def test_group_closure_gate_parity(ray_session):
    import duckdb
    import hashlib
    from kgforge.pipelines import versioning as V
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = V.sparql_group_closure(SF).to_pandas()
    odf = con.sql(V.sparql_group_closure_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)


def test_inv_negated_path_gate_parity(ray_session):
    import duckdb
    import hashlib
    from kgforge.pipelines import versioning as V
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = V.sparql_inv_negated_path(SF).to_pandas()
    odf = con.sql(V.sparql_inv_negated_path_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)


def test_group_path_gate_parity(ray_session):
    import duckdb
    import hashlib
    from kgforge.pipelines import versioning as V
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = V.sparql_group_path(SF).to_pandas()
    odf = con.sql(V.sparql_group_path_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)


def test_seq_path_equals_explicit_chain(ray_session):
    """The /-rewrite must produce the same rows as the explicit
    two-pattern ancestor query on the category store."""
    from kgforge.pipelines.versioning import (PATH_QUERY_TEXT,
                                              SEQ_PATH_QUERY_TEXT,
                                              category_store)
    store = category_store(SF)
    a = _rows(execute_sparql(store, parse_sparql(PATH_QUERY_TEXT)[0]))
    b = _rows(execute_sparql(store, parse_sparql(SEQ_PATH_QUERY_TEXT)[0]))
    assert a == b and len(a) > 0


def test_sparql_over_webkg_store(ray_session):
    """End to end: flagship web-KG output published as a partitioned
    store and queried through the SPARQL front-end; histogram equals
    the independent SQL derivation."""
    import duckdb
    from kgforge.pipelines.webkg import (sparql_webkg_predicates,
                                         sparql_webkg_predicates_sql)
    df = sparql_webkg_predicates(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    odf = con.sql(sparql_webkg_predicates_sql()).df()
    a = df.sort_values(["n", "p"]).reset_index(drop=True)
    b = odf.sort_values(["n", "p"]).reset_index(drop=True)
    assert a["p"].tolist() == b["p"].tolist()
    assert a["n"].astype("int64").tolist() == \
        b["n"].astype("int64").tolist()
    assert len(a) > 3


def test_cli_inline_query(ray_session, tmp_path):
    import pandas as pd
    from kgforge.cli import main
    from kgforge.pipelines.tabular import _v4_part_store
    store = _v4_part_store(SF)
    out = tmp_path / "q"
    rc = main(["--query",
               "SELECT ?y (COUNT(*) AS ?n) WHERE { ?x ?y ?z } "
               "GROUP BY ?y ORDER BY DESC(?n) ?y LIMIT 3",
               "--store", store, "-o", str(out)])
    assert rc == 0
    df = pd.read_csv(out / "statement1_select.csv")
    assert list(df.columns) == ["y", "n"] and len(df) == 3


# ------------------------------------------- round-5 ADVICE regressions

@pytest.fixture()
def opt_filter_store(ray_session, tmp_path):
    """s1 has a p2 witness "5", s2 has none — exercises filters whose
    var binds only inside an OPTIONAL."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": ["http://e/s1", "http://e/s2", "http://e/s1"],
        "p": ["http://e/p1", "http://e/p1", "http://e/p2"],
        "o": ['<http://e/o1>', '<http://e/o2>', '"5"'],
    })
    store = str(tmp_path / "optflt")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    return store


def test_filter_on_optional_bound_var(ray_session, opt_filter_store):
    """ADVICE r4: a group FILTER whose var binds only in an OPTIONAL
    must be applied AFTER the left join — unbound (null) rows are
    eliminated (type-error semantics), not silently kept."""
    q = parse_sparql(
        "SELECT ?x ?w WHERE { ?x <http://e/p1> ?y . "
        "OPTIONAL { ?x <http://e/p2> ?w } FILTER(?w > 4) }")[0]
    df = execute_sparql(opt_filter_store, q).to_pandas()
    assert df.to_dict("records") == [
        {"x": "http://e/s1", "w": '"5"'}]
    # tighter bound: the bound witness fails the comparison too
    q2 = parse_sparql(
        "SELECT ?x ?w WHERE { ?x <http://e/p1> ?y . "
        "OPTIONAL { ?x <http://e/p2> ?w } FILTER(?w > 10) }")[0]
    assert len(execute_sparql(opt_filter_store, q2).to_pandas()) == 0


def test_filter_never_bound_var_raises(ray_session, opt_filter_store):
    """ADVICE r4: a FILTER referencing a variable absent from the
    group's final column set raises instead of being dropped."""
    q = parse_sparql(
        "SELECT ?x WHERE { ?x <http://e/p1> ?y . FILTER(?nosuch > 1) }"
    )[0]
    with pytest.raises(SparqlError, match="never bound"):
        execute_sparql(opt_filter_store, q).to_pandas()


def test_repeated_var_in_pattern_self_loops(ray_session, tmp_path):
    """ADVICE r4: {?x p ?x} crashed with a duplicate-schema KeyError;
    now it is an equality constraint between the positions."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": ["http://e/a", "http://e/b"],
        "p": ["http://e/p", "http://e/p"],
        "o": ['<http://e/a>', '<http://e/c>'],
    })
    store = str(tmp_path / "selfloop")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    q = parse_sparql("SELECT ?x WHERE { ?x <http://e/p> ?x }")[0]
    df = execute_sparql(store, q).to_pandas()
    # ?x appears in an o-position -> term-form canonical representation
    assert df["x"].tolist() == ["<http://e/a>"]
    # Kleene-plus cycles: a -> a via p+, b reaches only c
    q2 = parse_sparql("SELECT ?x WHERE { ?x <http://e/p>+ ?x }")[0]
    df2 = execute_sparql(store, q2).to_pandas()
    assert df2["x"].tolist() == ["<http://e/a>"]


def test_count_var_skips_unbound(ray_session, opt_filter_store):
    """ADVICE r4: COUNT(?v) must skip unbound (null) OPTIONAL bindings
    on BOTH aggregate paths; COUNT(*) still counts every solution."""
    q = parse_sparql(
        "SELECT (COUNT(?w) AS ?n) (COUNT(*) AS ?all) WHERE "
        "{ ?x <http://e/p1> ?y . OPTIONAL { ?x <http://e/p2> ?w } }")[0]
    df = execute_sparql(opt_filter_store, q).to_pandas()
    assert df["n"].tolist() == [1] and df["all"].tolist() == [2]


def test_parse_group_concat_sample_having():
    """Parser: GROUP_CONCAT with SEPARATOR, SAMPLE, and HAVING in both
    forms — an alias reference and an inline aggregate expression that
    synthesizes a hidden agg."""
    q = parse_sparql(
        'SELECT ?g (GROUP_CONCAT(?t; SEPARATOR="|") AS ?ts) '
        "(SAMPLE(?t) AS ?one) (COUNT(?t) AS ?n) WHERE "
        "{ ?x <http://e/t> ?t . ?x <http://e/g> ?g } "
        "GROUP BY ?g HAVING (?n > 2) (AVG(?t) <= 9) ORDER BY ?g")[0]
    assert [a.func for a in q.aggs] == [
        "group_concat", "sample", "count", "avg"]
    assert q.aggs[0].sep == "|" and not q.aggs[0].hidden
    assert q.aggs[3].hidden and q.aggs[3].alias == "_having1"
    assert q.having == [("n", ">", 2.0), ("_having1", "<=", 9.0)]


def test_parse_having_errors():
    with pytest.raises(SparqlError, match="not an aggregate alias"):
        parse_sparql("SELECT ?g (COUNT(?t) AS ?n) WHERE "
                     "{ ?x <http://e/t> ?t } GROUP BY ?g "
                     "HAVING (?zz > 2)")
    with pytest.raises(SparqlError, match="numeric constant"):
        parse_sparql("SELECT ?g (COUNT(?t) AS ?n) WHERE "
                     "{ ?x <http://e/t> ?t } GROUP BY ?g "
                     'HAVING (?n > "x")')
    with pytest.raises(SparqlError, match="takes no SEPARATOR"):
        parse_sparql('SELECT (SAMPLE(?t; SEPARATOR=",") AS ?s) '
                     "WHERE { ?x <http://e/t> ?t }")


@pytest.fixture()
def agg_store(ray_session, tmp_path):
    """4 parts in g0 (tags b,a,c,a), 2 in g1 (tags c,b)."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    tags = ["b", "a", "c", "a", "c", "b"]
    grps = ["g0", "g0", "g0", "g0", "g1", "g1"]
    rows = pa.table({
        "s": [f"http://e/s{i}" for i in range(6)] * 2,
        "p": ["http://e/tag"] * 6 + ["http://e/grp"] * 6,
        "o": [f'"{t}"' for t in tags] + [f'"{g}"' for g in grps],
    })
    store = str(tmp_path / "aggstore")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    return store


def test_group_concat_sample_having_semantics(ray_session, agg_store):
    """GROUP_CONCAT joins the group's terms SORTED (deterministic
    under any partitioning); SAMPLE is the minimum term; HAVING over a
    hidden COUNT drops g1."""
    q = parse_sparql(
        'SELECT ?g (GROUP_CONCAT(?t; SEPARATOR=",") AS ?ts) '
        "(SAMPLE(?t) AS ?one) WHERE "
        "{ ?x <http://e/tag> ?t . ?x <http://e/grp> ?g } "
        "GROUP BY ?g HAVING (COUNT(?t) > 2)")[0]
    df = execute_sparql(agg_store, q).to_pandas()
    assert df.to_dict("records") == [
        {"g": '"g0"', "ts": '"a","a","b","c"', "one": '"a"'}]
    # hidden alias never reaches the output schema
    assert list(df.columns) == ["g", "ts", "one"]


def test_group_concat_default_separator(ray_session, agg_store):
    """No SEPARATOR -> the SPARQL default, a single space."""
    q = parse_sparql(
        "SELECT ?g (GROUP_CONCAT(?t) AS ?ts) WHERE "
        "{ ?x <http://e/tag> ?t . ?x <http://e/grp> ?g } "
        "GROUP BY ?g")[0]
    df = (execute_sparql(agg_store, q).to_pandas()
          .sort_values("g").reset_index(drop=True))
    assert df["ts"].tolist() == ['"a" "a" "b" "c"', '"b" "c"']


def test_having_on_selected_alias(ray_session, agg_store):
    """HAVING may reference a SELECT aggregate alias directly."""
    q = parse_sparql(
        "SELECT ?g (COUNT(?t) AS ?n) WHERE "
        "{ ?x <http://e/tag> ?t . ?x <http://e/grp> ?g } "
        "GROUP BY ?g HAVING (?n = 2)")[0]
    df = execute_sparql(agg_store, q).to_pandas()
    assert df.to_dict("records") == [{"g": '"g1"', "n": 2}]


def test_parse_subquery():
    q = parse_sparql(
        "SELECT ?x ?mx WHERE { ?x <http://e/g> ?g . "
        "{ SELECT ?g (MAX(?w) AS ?mx) WHERE "
        "{ ?y <http://e/g> ?g . ?y <http://e/w> ?w } GROUP BY ?g } }"
    )[0]
    assert len(q.where.subqueries) == 1
    sq = q.where.subqueries[0]
    assert sq.select_vars == ["g"] and sq.aggs[0].alias == "mx"
    # a plain nested group is still a group, not a subquery
    q2 = parse_sparql(
        "SELECT ?x WHERE { { ?x <http://e/g> ?g } }")[0]
    assert not q2.where.subqueries and len(q2.where.patterns) == 1


@pytest.fixture()
def subq_store(ray_session, tmp_path):
    """Weights per item per group: g0 max 9 (two witnesses), g1 max
    7."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    vals = {("s0", "g0"): 5, ("s1", "g0"): 9, ("s2", "g0"): 9,
            ("s3", "g1"): 2, ("s4", "g1"): 7}
    s, p, o = [], [], []
    for (sid, g), w in vals.items():
        s += [f"http://e/{sid}"] * 2
        p += ["http://e/grp", "http://e/w"]
        o += [f'"{g}"', f'"{w}"']
    store = str(tmp_path / "subq")
    os.makedirs(store)
    write_graph_partitioned(
        ray.data.from_arrow(pa.table({"s": s, "p": p, "o": o})), store)
    return store


def test_subquery_group_max_join(ray_session, subq_store):
    """Items at their group's max weight: the subquery aggregate
    alias joins the outer bindings and feeds a var-var FILTER."""
    q = parse_sparql(
        "SELECT ?x ?g ?w WHERE { ?x <http://e/grp> ?g . "
        "?x <http://e/w> ?w . "
        "{ SELECT ?g (MAX(?w2) AS ?mx) WHERE { ?y <http://e/grp> ?g "
        ". ?y <http://e/w> ?w2 } GROUP BY ?g } FILTER(?w = ?mx) } "
        "ORDER BY ?x")[0]
    df = execute_sparql(subq_store, q).to_pandas()
    assert df["x"].tolist() == [
        "http://e/s1", "http://e/s2", "http://e/s4"]
    assert df["w"].tolist() == ['"9"', '"9"', '"7"']


def test_subquery_iri_alias_in_s_position(ray_session, subq_store):
    """A MAX over an iri-class var keeps the raw-IRI representation,
    so the alias can drive an outer s-position pattern read."""
    q = parse_sparql(
        "SELECT ?g ?m ?w WHERE { "
        "{ SELECT ?g (MAX(?y) AS ?m) WHERE { ?y <http://e/grp> ?g } "
        "GROUP BY ?g } ?m <http://e/w> ?w . } ORDER BY ?g")[0]
    df = execute_sparql(subq_store, q).to_pandas()
    assert df.to_dict("records") == [
        {"g": '"g0"', "m": "http://e/s2", "w": '"9"'},
        {"g": '"g1"', "m": "http://e/s4", "w": '"7"'}]


def test_subquery_count_alias_is_term_form(ray_session, subq_store):
    """A COUNT alias projected through the outer query surfaces as a
    term-form literal (quoted lexical value)."""
    q = parse_sparql(
        "SELECT ?g ?n WHERE { { SELECT ?g (COUNT(?y) AS ?n) WHERE "
        "{ ?y <http://e/grp> ?g } GROUP BY ?g } } ORDER BY ?g")[0]
    df = execute_sparql(subq_store, q).to_pandas()
    assert df.to_dict("records") == [
        {"g": '"g0"', "n": '"3"'}, {"g": '"g1"', "n": '"2"'}]


def test_subquery_inner_vars_scoped(ray_session, subq_store):
    """Non-projected inner vars (?y, ?w2) never leak to the outer
    group — an outer ?y is an unrelated variable."""
    q = parse_sparql(
        "SELECT ?y ?g WHERE { ?y <http://e/grp> ?g . "
        "{ SELECT ?g (COUNT(?y) AS ?n) WHERE { ?y <http://e/grp> ?g }"
        " GROUP BY ?g } FILTER(?n > 2) }")[0]
    df = execute_sparql(subq_store, q).to_pandas()
    # only g0 has count 3 > 2; outer ?y binds ALL THREE g0 items
    assert sorted(df["y"].tolist()) == [
        "http://e/s0", "http://e/s1", "http://e/s2"]


# --------------------------------- IN / BOUND filters, string BINDs

@pytest.fixture()
def measure_store(ray_session, tmp_path):
    """a/b/c each have a category + a weight; only a has a bonus."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": ["http://e/a", "http://e/b", "http://e/c",
              "http://e/a", "http://e/b", "http://e/c",
              "http://e/a"],
        "p": (["http://e/cat"] * 3 + ["http://e/w"] * 3
              + ["http://e/bonus"]),
        "o": ['<http://e/c1>', '<http://e/c2>', '<http://e/c1>',
              '"5"', '"11"', '"7"', '"1"'],
    })
    store = str(tmp_path / "measures")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    return store


def test_filter_in_iri_list(ray_session, measure_store):
    q = parse_sparql(
        "SELECT ?s ?c WHERE { ?s <http://e/cat> ?c . "
        "FILTER(?c IN (<http://e/c1>, <http://e/missing>)) }")[0]
    df = execute_sparql(measure_store, q).to_pandas()
    assert sorted(df["s"].tolist()) == ["http://e/a", "http://e/c"]


def test_filter_not_in_numeric(ray_session, measure_store):
    q = parse_sparql(
        "SELECT ?s ?w WHERE { ?s <http://e/w> ?w . "
        "FILTER(?w NOT IN (5, 7)) }")[0]
    df = execute_sparql(measure_store, q).to_pandas()
    assert df.to_dict("records") == [
        {"s": "http://e/b", "w": '"11"'}]


def test_filter_bound_vs_not_bound(ray_session, measure_store):
    base = ("SELECT ?s WHERE {{ ?s <http://e/w> ?w . "
            "OPTIONAL {{ ?s <http://e/bonus> ?x }} FILTER({pred}) }}")
    q = parse_sparql(base.format(pred="!BOUND(?x)"))[0]
    df = execute_sparql(measure_store, q).to_pandas()
    assert sorted(df["s"].tolist()) == ["http://e/b", "http://e/c"]
    q2 = parse_sparql(base.format(pred="BOUND(?x)"))[0]
    df2 = execute_sparql(measure_store, q2).to_pandas()
    assert df2["s"].tolist() == ["http://e/a"]


def test_bind_string_functions(ray_session, measure_store):
    q = parse_sparql(
        'SELECT ?s ?u ?l ?n ?t ?r WHERE { ?s <http://e/cat> ?c . '
        'FILTER(?s = <http://e/a>) '
        'BIND(UCASE(STR(?s)) AS ?u) BIND(LCASE(?u) AS ?l) '
        'BIND(STRLEN(STR(?s)) AS ?n) BIND(SUBSTR(STR(?s), 10) AS ?t) '
        'BIND(REPLACE(STR(?s), "http", "ftp") AS ?r) }')[0]
    df = execute_sparql(measure_store, q).to_pandas()
    assert df.to_dict("records") == [{
        "s": "http://e/a", "u": "HTTP://E/A", "l": "http://e/a",
        "n": "10", "t": "a", "r": "ftp://e/a"}]


def test_substr_with_length_and_term_object(ray_session, measure_store):
    q = parse_sparql(
        "SELECT ?s ?t WHERE { ?s <http://e/cat> ?c . "
        'BIND(SUBSTR(STR(?c), 8, 3) AS ?t) }')[0]
    df = execute_sparql(measure_store, q).to_pandas()
    # STR strips the <> decoration; chars 8..10 of http://e/cN = "e/c"
    assert set(df["t"]) == {"e/c"}


def test_numeric_object_constant_in_pattern(ray_session, measure_store):
    """A bare integer in the o position matches the store's rendered
    integer literal (exact lexical form)."""
    q = parse_sparql(
        "SELECT ?s WHERE { ?s <http://e/w> 11 }")[0]
    df = execute_sparql(measure_store, q).to_pandas()
    assert df["s"].tolist() == ["http://e/b"]


def test_parse_errors_in_bound_binds():
    for bad in [
        "SELECT ?s WHERE { ?s <http://e/p> ?o . FILTER(!LCASE(?o)) }",
        "SELECT ?s WHERE { ?s <http://e/p> ?o . FILTER(?o IN (?s)) }",
        "SELECT ?s WHERE { ?s <http://e/p> ?o . "
        "FILTER(?o IN (1, <http://e/x>)) FILTER(?o > 0) }",
        "SELECT ?s WHERE { ?s <http://e/p> ?o . "
        'BIND(SUBSTR(STR(?o), "x") AS ?t) }',
        "SELECT ?s WHERE { ?s <http://e/p> ?o . "
        "BIND(REPLACE(STR(?o), 1, 2) AS ?t) }",
        "SELECT ?s WHERE { ?s <http://e/p> ?o . "
        "BIND(STRLEN(STR(?o), STR(?o)) AS ?t) }",
    ]:
        with pytest.raises(SparqlError):
            q = parse_sparql(bad)[0]
            # the mixed-IN error surfaces at mask build time
            from kgforge.sparql import _filter_mask
            for f in q.where.filters:
                _filter_mask(pa.table({"o": pa.array(['"1"'])}), f,
                             {"o": "term"})


# ------------------------------------------------ DELETE update forms

def _store_lines(store):
    from kgforge.sinks.store_query import query_triples
    ds = query_triples(store)
    return sorted(tuple(r.values())
                  for r in ds.to_pandas().to_dict("records"))


@pytest.fixture()
def mutable_store(ray_session, tmp_path):
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": ["http://e/a", "http://e/b", "http://e/c",
              "http://e/a", "http://e/b"],
        "p": ["http://e/w"] * 3 + ["http://e/tag"] * 2,
        "o": ['"5"', '"11"', '"7"', '<http://e/t1>', '<http://e/t2>'],
    })
    store = str(tmp_path / "mut")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    return store


def test_delete_data_ground(ray_session, mutable_store):
    from kgforge.sparql import sparql_delete
    q = parse_sparql(
        'DELETE DATA { <http://e/a> <http://e/w> "5" . '
        "<http://e/a> <http://e/tag> <http://e/t1> }")[0]
    out = sparql_delete(mutable_store, q)
    assert out.count() == 2
    assert _store_lines(mutable_store) == [
        ("http://e/b", "http://e/tag", "<http://e/t2>"),
        ("http://e/b", "http://e/w", '"11"'),
        ("http://e/c", "http://e/w", '"7"'),
    ]
    # idempotent: a re-run deletes nothing further
    sparql_delete(mutable_store, q)
    assert len(_store_lines(mutable_store)) == 3


def test_delete_where_shorthand_with_filter(ray_session, mutable_store):
    from kgforge.sparql import sparql_delete
    q = parse_sparql(
        "DELETE WHERE { ?s <http://e/w> ?v . FILTER(?v > 6) }")[0]
    out = sparql_delete(mutable_store, q)
    assert out.count() == 2          # 11 and 7 match; 5 survives
    lines = _store_lines(mutable_store)
    assert ("http://e/a", "http://e/w", '"5"') in lines
    assert len([r for r in lines if r[1] == "http://e/w"]) == 1
    # tag partition untouched
    assert len([r for r in lines if r[1] == "http://e/tag"]) == 2


def test_delete_template_where(ray_session, mutable_store):
    """DELETE { tmpl } WHERE { group }: delete a's tag triple joined
    via its weight — the template predicate differs from the WHERE."""
    from kgforge.sparql import sparql_delete
    q = parse_sparql(
        "DELETE { ?s <http://e/tag> <http://e/t1> } "
        'WHERE { ?s <http://e/w> "5" }')[0]
    sparql_delete(mutable_store, q)
    lines = _store_lines(mutable_store)
    assert ("http://e/a", "http://e/tag", "<http://e/t1>") not in lines
    assert len(lines) == 4


def test_delete_preview_does_not_mutate(ray_session, mutable_store):
    from kgforge.sparql import run_sparql_file
    before = _store_lines(mutable_store)
    outs = run_sparql_file(
        mutable_store, "DELETE WHERE { ?s <http://e/w> ?v }",
        apply_updates=False)
    assert outs[0].count() == 3
    assert _store_lines(mutable_store) == before


def test_delete_whole_partition_removes_dir(ray_session, mutable_store):
    from kgforge.sparql import sparql_delete
    q = parse_sparql("DELETE WHERE { ?s <http://e/tag> ?o }")[0]
    sparql_delete(mutable_store, q)
    assert not os.path.isdir(os.path.join(
        mutable_store, "triples_by_predicate", "p_key=tag"))
    assert len(_store_lines(mutable_store)) == 3


def test_delete_parse_errors():
    with pytest.raises(SparqlError):
        parse_sparql("DELETE DATA { ?x <http://e/p> <http://e/o> }")
    with pytest.raises(SparqlError):
        parse_sparql("DELETE WHERE { FILTER(?v > 6) }")


def test_insert_data_ground(ray_session, mutable_store):
    from kgforge.sparql import sparql_insert
    q = parse_sparql(
        'INSERT DATA { <http://e/d> <http://e/w> "9" . '
        "<http://e/d> <http://e/tag> <http://e/t3> }")[0]
    out = sparql_insert(mutable_store, q)
    assert out.count() == 2
    lines = _store_lines(mutable_store)
    assert ("http://e/d", "http://e/w", '"9"') in lines
    assert ("http://e/d", "http://e/tag", "<http://e/t3>") in lines
    assert len(lines) == 7
    # set semantics: a re-run inserts nothing
    sparql_insert(mutable_store, q)
    assert len(_store_lines(mutable_store)) == 7


def test_construct_where_shorthand(ray_session, mutable_store):
    q = parse_sparql(
        "CONSTRUCT WHERE { ?s <http://e/tag> ?o }")[0]
    assert q.form == "construct" and len(q.template) == 1
    df = execute_sparql(mutable_store, q).to_pandas()
    assert sorted(df["o"].tolist()) == ["<http://e/t1>", "<http://e/t2>"]
    assert set(df["p"]) == {"http://e/tag"}


def test_insert_data_preview_does_not_mutate(ray_session, mutable_store):
    from kgforge.sparql import run_sparql_file
    before = _store_lines(mutable_store)
    outs = run_sparql_file(
        mutable_store,
        'INSERT DATA { <http://e/z> <http://e/w> "1" }',
        apply_updates=False)
    assert outs[0].count() == 1
    assert _store_lines(mutable_store) == before


def _spo(store):
    q = parse_sparql("SELECT ?s ?p ?o WHERE { ?s ?p ?o }")[0]
    df = execute_sparql(store, q).to_pandas()
    if df.empty:          # 0-row results drop columns (Ray convention)
        return []
    return sorted(map(tuple, df[["s", "p", "o"]].itertuples(index=False)))


def test_modify_delete_insert_where(ray_session, mutable_store):
    """Combined DELETE/INSERT: both templates instantiate from the
    SAME pre-state WHERE bindings; delete applies first."""
    from kgforge.sparql import run_sparql_file
    txt = ("DELETE { ?x <http://e/w> ?v } "
           "INSERT { ?x <http://e/grade> ?v } "
           "WHERE { ?x <http://e/w> ?v . FILTER(?v > 6) }")
    q = parse_sparql(txt)[0]
    assert q.form == "modify"
    assert len(q.template) == 1 and len(q.insert_template) == 1
    # preview: tagged union, no mutation
    before = _spo(mutable_store)
    prev = run_sparql_file(mutable_store, txt)[0].to_pandas()
    assert sorted(prev["action"].tolist()) == ["delete", "delete",
                                               "insert", "insert"]
    assert _spo(mutable_store) == before
    # apply: b(11) and c(7) move from w to grade, a(5) stays
    outs = run_sparql_file(mutable_store, txt, apply_updates=True)
    assert outs[0].count() == 4
    after = _spo(mutable_store)
    assert ("http://e/a", "http://e/w", '"5"') in after
    assert ("http://e/b", "http://e/grade", '"11"') in after
    assert ("http://e/c", "http://e/grade", '"7"') in after
    assert not any(p == "http://e/w" and s != "http://e/a"
                   for s, p, _ in after)
    # idempotent: WHERE no longer matches, nothing moves
    run_sparql_file(mutable_store, txt, apply_updates=True)
    assert _spo(mutable_store) == after


def test_modify_overlapping_templates(ray_session, mutable_store):
    """A row named by BOTH templates survives (delete first, insert
    second — SPARQL 1.1 Update §3.1.3)."""
    from kgforge.sparql import run_sparql_file
    txt = ("DELETE { ?x <http://e/w> ?v } "
           "INSERT { ?x <http://e/w> ?v } "
           "WHERE { ?x <http://e/w> ?v }")
    before = _spo(mutable_store)
    run_sparql_file(mutable_store, txt, apply_updates=True)
    assert _spo(mutable_store) == before


def test_subset_error_hygiene():
    """Accepted-elsewhere syntax that is out of this subset fails with
    an error that names the feature and the workaround."""
    with pytest.raises(SparqlError, match="UNDEF"):
        parse_sparql("SELECT ?x WHERE { VALUES (?b ?c) "
                     "{ (<http://e/p> UNDEF) } ?x ?b ?c }")
    # plain ORDER BY expressions now desugar to hidden BINDs (see
    # test_sparql_builtins); the GROUPED combination stays rejected
    # because BINDs evaluate pre-aggregation
    with pytest.raises(SparqlError, match="ORDER BY expressions"):
        parse_sparql("SELECT ?s (COUNT(?o) AS ?n) WHERE "
                     "{ ?s <http://e/p> ?o } GROUP BY ?s "
                     "ORDER BY (0 - ?n)")


def test_modify_parse_errors():
    with pytest.raises(SparqlError):   # USING out of subset
        parse_sparql("DELETE { ?x <http://e/p> ?v } "
                     "INSERT { ?x <http://e/q> ?v } "
                     "USING <http://e/g> WHERE { ?x <http://e/p> ?v }")
    with pytest.raises(SparqlError):   # WITH is not a form
        parse_sparql("WITH <http://e/g> DELETE { ?x <http://e/p> ?v } "
                     "WHERE { ?x <http://e/p> ?v }")
    # INSERT { } DELETE { } order is not in the grammar
    with pytest.raises(SparqlError):
        parse_sparql("INSERT { ?x <http://e/q> ?v } "
                     "DELETE { ?x <http://e/p> ?v } "
                     "WHERE { ?x <http://e/p> ?v }")


def test_update_load(ray_session, mutable_store, tmp_path):
    """SPARQL-Update LOAD: distributed bulk read + the INSERT append
    (set semantics, idempotent); SILENT turns a read failure into the
    empty graph; INTO GRAPH rejected."""
    from kgforge.sparql import run_sparql_file
    nt = tmp_path / "extra.nt"
    nt.write_text('<http://e/new> <http://e/w> "42" .\n'
                  '<http://e/a> <http://e/w> "5" .\n')   # already there
    before = _spo(mutable_store)
    # preview returns the parsed graph without mutating
    prev = run_sparql_file(mutable_store, f"LOAD <file://{nt}>")[0]
    assert prev.count() == 2 and _spo(mutable_store) == before
    run_sparql_file(mutable_store, f"LOAD <file://{nt}>",
                    apply_updates=True)
    after = _spo(mutable_store)
    assert ("http://e/new", "http://e/w", '"42"') in after
    assert len(after) == len(before) + 1          # set semantics
    run_sparql_file(mutable_store, f"LOAD <file://{nt}>",
                    apply_updates=True)
    assert _spo(mutable_store) == after           # idempotent
    g = run_sparql_file(mutable_store,
                        "LOAD SILENT <file:///nope/gone.nt>",
                        apply_updates=True)[0]
    assert g.count() == 0
    with pytest.raises(Exception):
        run_sparql_file(mutable_store, "LOAD <file:///nope/gone.nt>",
                        apply_updates=True)
    with pytest.raises(SparqlError):
        parse_sparql("LOAD <file:///x.nt> INTO GRAPH <http://e/g>")


def test_update_clear(ray_session, mutable_store):
    """CLEAR DEFAULT/ALL empties the store atomically; the cleared
    store stays valid (queryable, insertable); NAMED/GRAPH forms
    rejected."""
    from kgforge.sparql import run_sparql_file
    before = _spo(mutable_store)
    # preview streams the would-be-removed rows, store untouched
    pv = run_sparql_file(mutable_store, "CLEAR DEFAULT")[0]
    assert pv.count() == len(before) and _spo(mutable_store) == before
    run_sparql_file(mutable_store, "CLEAR ALL", apply_updates=True)
    assert _spo(mutable_store) == []
    run_sparql_file(mutable_store,
                    'INSERT DATA { <http://e/z> <http://e/w> "9" }',
                    apply_updates=True)
    assert _spo(mutable_store) == [("http://e/z", "http://e/w", '"9"')]
    for bad in ("CLEAR GRAPH <http://e/g>", "CLEAR NAMED",
                "DROP NAMED"):
        with pytest.raises(SparqlError):
            parse_sparql(bad)
    # DROP DEFAULT == CLEAR DEFAULT in a single-graph store
    assert parse_sparql("DROP SILENT DEFAULT")[0].form == "clear"


def test_modify_gate_parity(ray_session):
    import duckdb
    import hashlib
    from kgforge.pipelines import versioning as V
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = V.sparql_modify_tier(SF).to_pandas()
    odf = con.sql(V.sparql_modify_tier_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)


def test_count_distinct_grouped_and_global(ray_session, measure_store):
    # grouped: category c1 has subjects a and c; c2 has b
    q = parse_sparql(
        "SELECT ?c (COUNT(DISTINCT ?s) AS ?n) WHERE "
        "{ ?s <http://e/cat> ?c } GROUP BY ?c")[0]
    assert q.aggs[0].distinct
    df = (execute_sparql(measure_store, q).to_pandas()
          .sort_values("c").reset_index(drop=True))
    assert df.to_dict("records") == [
        {"c": "<http://e/c1>", "n": 2}, {"c": "<http://e/c2>", "n": 1}]
    # global: two distinct categories over three solutions
    q2 = parse_sparql(
        "SELECT (COUNT(DISTINCT ?c) AS ?nc) (COUNT(*) AS ?total) "
        "WHERE { ?s <http://e/cat> ?c }")[0]
    df2 = execute_sparql(measure_store, q2).to_pandas()
    assert df2.to_dict("records") == [{"nc": 2, "total": 3}]


def test_count_distinct_skips_unbound(ray_session, measure_store):
    """COUNT(DISTINCT ?b) over an OPTIONAL var counts distinct BOUND
    values only (a is the only subject with a bonus)."""
    q = parse_sparql(
        "SELECT (COUNT(DISTINCT ?b) AS ?nb) (COUNT(*) AS ?n) WHERE "
        "{ ?s <http://e/w> ?w . OPTIONAL { ?s <http://e/bonus> ?b } }")[0]
    df = execute_sparql(measure_store, q).to_pandas()
    assert df.to_dict("records") == [{"nb": 1, "n": 3}]


def test_count_distinct_parse_errors():
    with pytest.raises(SparqlError):
        parse_sparql("SELECT (COUNT(DISTINCT *) AS ?n) WHERE "
                     "{ ?s <http://e/p> ?o }")
    # every aggregate accepts DISTINCT (SPARQL 1.1 §18.5.1)
    q = parse_sparql("SELECT (SUM(DISTINCT ?v) AS ?n) WHERE "
                     "{ ?s <http://e/p> ?v }")[0]
    assert q.aggs[0].func == "sum" and q.aggs[0].distinct


@pytest.fixture()
def dup_measure_store(ray_session, tmp_path):
    """Weights with planted duplicates: group c1 holds 1,2,2; group c2
    holds 3,1,10 (duplicate only across groups)."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    subs = [f"http://e/d{i}" for i in range(6)]
    rows = pa.table({
        "s": subs + subs,
        "p": ["http://e/w"] * 6 + ["http://e/cat"] * 6,
        "o": ['"1"', '"2"', '"2"', '"3"', '"1"', '"10"',
              '<http://e/c1>', '<http://e/c1>', '<http://e/c1>',
              '<http://e/c2>', '<http://e/c2>', '<http://e/c2>'],
    })
    store = str(tmp_path / "dupmeasures")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    return store


SUM_DISTINCT_Q = (
    "SELECT ?c (SUM(DISTINCT ?w) AS ?sw) (AVG(DISTINCT ?w) AS ?aw) "
    "(SUM(?w) AS ?s) WHERE { ?x <http://e/w> ?w . "
    "?x <http://e/cat> ?c } GROUP BY ?c")
SUM_DISTINCT_WANT = [
    {"c": "<http://e/c1>", "sw": 3.0, "aw": 1.5, "s": 5.0},
    {"c": "<http://e/c2>", "sw": 14.0, "aw": 14.0 / 3, "s": 14.0},
]


def test_sum_avg_distinct_grouped(ray_session, dup_measure_store):
    q = parse_sparql(SUM_DISTINCT_Q)[0]
    df = (execute_sparql(dup_measure_store, q).to_pandas()
          .sort_values("c").reset_index(drop=True))
    assert df.to_dict("records") == SUM_DISTINCT_WANT


def test_sum_avg_distinct_grouped_dataset_path(
        ray_session, dup_measure_store, monkeypatch):
    """KGFORGE_BROADCAST_LIMIT=0 forces Dataset-sized bindings — the
    map_groups whole-group pass must agree with the polars path."""
    monkeypatch.setenv("KGFORGE_BROADCAST_LIMIT", "0")
    q = parse_sparql(SUM_DISTINCT_Q)[0]
    df = (execute_sparql(dup_measure_store, q).to_pandas()
          .sort_values("c").reset_index(drop=True))
    assert df.to_dict("records") == SUM_DISTINCT_WANT


@pytest.mark.parametrize("force", [False, True])
def test_sum_avg_distinct_global(ray_session, dup_measure_store,
                                 monkeypatch, force):
    """Global SUM/AVG(DISTINCT): one bucketed distinct pass over the
    numeric values; MIN(DISTINCT) is a no-op and rides the plain
    combiner pass."""
    if force:
        monkeypatch.setenv("KGFORGE_BROADCAST_LIMIT", "0")
    q = parse_sparql(
        "SELECT (SUM(DISTINCT ?w) AS ?sw) (AVG(DISTINCT ?w) AS ?aw) "
        "(COUNT(DISTINCT ?w) AS ?nc) (MIN(DISTINCT ?w) AS ?m) "
        "WHERE { ?x <http://e/w> ?w }")[0]
    df = execute_sparql(dup_measure_store, q).to_pandas()
    # values {1,2,3,10}: sum 16, avg 4, 4 distinct terms, min "1"
    assert df.to_dict("records") == [
        {"sw": 16.0, "aw": 4.0, "nc": 4, "m": '"1"'}]


def test_sum_distinct_gate_parity(ray_session):
    import duckdb
    import hashlib
    from kgforge.pipelines import versioning as V
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = V.sparql_sum_distinct(SF).to_pandas()
    odf = con.sql(V.sparql_sum_distinct_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)
    # the planted duplicates (k and k+1560 share category and bonus)
    # make DISTINCT non-vacuous once the part table is big enough —
    # true at the driver's sf0.01 gate scale, vacuous at sf0.001
    n_parts = con.sql("SELECT max(p_partkey) FROM part").fetchone()[0]
    if n_parts > 1560:
        assert (df["sv"] != df["s"]).any()


def test_bind_coalesce_optional_default(ray_session, measure_store):
    """COALESCE over an OPTIONAL-bound var fills unbound rows with the
    fallback, in term space (only a has a bonus)."""
    q = parse_sparql(
        "SELECT ?s ?v WHERE { ?s <http://e/w> ?w . "
        "OPTIONAL { ?s <http://e/bonus> ?b } "
        'BIND(COALESCE(?b, "none") AS ?v) }')[0]
    df = (execute_sparql(measure_store, q).to_pandas()
          .sort_values("s").reset_index(drop=True))
    assert df.to_dict("records") == [
        {"s": "http://e/a", "v": '"1"'},
        {"s": "http://e/b", "v": '"none"'},
        {"s": "http://e/c", "v": '"none"'}]


def test_bind_coalesce_wraps_iri_alternatives(ray_session,
                                              measure_store):
    """An iri-class var alternative wraps to term form so mixed
    representations align; an IRI constant fallback renders <...>."""
    q = parse_sparql(
        "SELECT ?s ?v WHERE { ?s <http://e/w> ?w . "
        "OPTIONAL { ?s <http://e/bonus> ?b } "
        "BIND(COALESCE(?b, ?s) AS ?v) }")[0]
    df = (execute_sparql(measure_store, q).to_pandas()
          .sort_values("s").reset_index(drop=True))
    assert df["v"].tolist() == [
        '"1"', "<http://e/b>", "<http://e/c>"]
    q2 = parse_sparql(
        "SELECT ?s ?v WHERE { ?s <http://e/w> ?w . "
        "OPTIONAL { ?s <http://e/bonus> ?b } "
        "BIND(COALESCE(?b, <http://e/unknown>) AS ?v) }")[0]
    df2 = execute_sparql(measure_store, q2).to_pandas()
    assert sorted(df2["v"]) == ['"1"', "<http://e/unknown>",
                                "<http://e/unknown>"]


def test_filter_isiri_isliteral(ray_session, chain_store):
    """p1's objects mix an IRI and a literal: isIRI/isLiteral split
    them; !isIRI equals isLiteral here (all rows bound)."""
    base = ("SELECT ?x ?y WHERE {{ ?x <http://e/p1> ?y . "
            "FILTER({pred}) }}")
    for pred, want in [("isIRI(?y)", ["<http://e/b>"]),
                       ("isURI(?y)", ["<http://e/b>"]),
                       ("isLiteral(?y)", ['"literal obj"']),
                       ("!isIRI(?y)", ['"literal obj"']),
                       ("!isLiteral(?y)", ["<http://e/b>"])]:
        q = parse_sparql(base.format(pred=pred))[0]
        df = execute_sparql(chain_store, q).to_pandas()
        assert df["y"].tolist() == want, pred


def test_filter_isiri_on_iri_class_var(ray_session, chain_store):
    """An s-position (raw IRI) variable is always an IRI: isLiteral
    keeps nothing, isIRI keeps all."""
    q = parse_sparql("SELECT ?x WHERE { ?x <http://e/p1> ?y . "
                     "FILTER(isLiteral(?x)) }")[0]
    assert execute_sparql(chain_store, q).count() == 0
    q2 = parse_sparql("SELECT ?x WHERE { ?x <http://e/p1> ?y . "
                      "FILTER(isIRI(?x)) }")[0]
    assert execute_sparql(chain_store, q2).count() == 2


def test_filter_or_and_combinators(ray_session, measure_store):
    # weights: a=5 b=11 c=7
    q = parse_sparql(
        "SELECT ?s WHERE { ?s <http://e/w> ?w . "
        "FILTER(?w = 5 || ?w > 10) }")[0]
    df = execute_sparql(measure_store, q).to_pandas()
    assert sorted(df["s"]) == ["http://e/a", "http://e/b"]
    q2 = parse_sparql(
        "SELECT ?s WHERE { ?s <http://e/w> ?w . "
        "FILTER(?w > 5 && ?w < 10) }")[0]
    df2 = execute_sparql(measure_store, q2).to_pandas()
    assert df2["s"].tolist() == ["http://e/c"]
    # IN participates in a disjunction
    q3 = parse_sparql(
        "SELECT ?s WHERE { ?s <http://e/w> ?w . "
        "FILTER(?w IN (5) || ?w IN (7)) }")[0]
    df3 = execute_sparql(measure_store, q3).to_pandas()
    assert sorted(df3["s"]) == ["http://e/a", "http://e/c"]
    with pytest.raises(SparqlError):
        parse_sparql("SELECT ?s WHERE { ?s <http://e/w> ?w . "
                     "FILTER(?w = 5 || ?w > 6 && ?w < 9) }")


@pytest.fixture()
def lang_store(ray_session, tmp_path):
    """Literals with a langtag, a datatype, plain, and an IRI object."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    xsd_int = "http://www.w3.org/2001/XMLSchema#integer"
    rows = pa.table({
        "s": [f"http://e/s{i}" for i in range(4)],
        "p": ["http://e/p"] * 4,
        "o": ['"bonjour"@fr', f'"5"^^<{xsd_int}>', '"plain"',
              '<http://e/x>'],
    })
    store = str(tmp_path / "langs")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    return store


def test_bind_lang_and_datatype(ray_session, lang_store):
    q = parse_sparql(
        "SELECT ?s ?l ?d WHERE { ?s <http://e/p> ?o . "
        "BIND(LANG(?o) AS ?l) BIND(DATATYPE(?o) AS ?d) }")[0]
    df = (execute_sparql(lang_store, q).to_pandas()
          .sort_values("s").reset_index(drop=True))
    assert df["l"].tolist() == ['"fr"', '""', '""', '""']
    assert df["d"].tolist() == [
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>",
        "<http://www.w3.org/2001/XMLSchema#integer>",
        "<http://www.w3.org/2001/XMLSchema#string>",
        None]
    # LANG composes with FILTER through the alias
    q2 = parse_sparql(
        "SELECT ?s WHERE { ?s <http://e/p> ?o . "
        'BIND(LANG(?o) AS ?l) FILTER(?l = "fr") }')[0]
    df2 = execute_sparql(lang_store, q2).to_pandas()
    assert df2["s"].tolist() == ["http://e/s0"]


def test_str_strips_langtag_and_datatype(ray_session, lang_store):
    q = parse_sparql(
        "SELECT ?s ?v WHERE { ?s <http://e/p> ?o . "
        "BIND(STR(?o) AS ?v) }")[0]
    df = (execute_sparql(lang_store, q).to_pandas()
          .sort_values("s").reset_index(drop=True))
    assert df["v"].tolist() == ["bonjour", "5", "plain", "http://e/x"]


def test_lang_of_iri_class_var(ray_session, lang_store):
    q = parse_sparql(
        "SELECT ?s ?l WHERE { ?s <http://e/p> ?o . "
        "BIND(LANG(?s) AS ?l) }")[0]
    df = execute_sparql(lang_store, q).to_pandas()
    assert set(df["l"]) == {'""'}
