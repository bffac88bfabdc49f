"""Triple-pattern store queries + RDFS entailment (S9 / Jena
inference hand-off re-expressed Ray-native)."""

import duckdb
import pyarrow as pa
import pytest

import ray

DOM = "https://ex.org/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"


def _graph() -> pa.Table:
    rows = [
        (f"{DOM}rex", RDF_TYPE, f"<{DOM}dog>"),
        (f"{DOM}dog", f"{RDFS}subClassOf", f"<{DOM}mammal>"),
        (f"{DOM}mammal", f"{RDFS}subClassOf", f"<{DOM}animal>"),
        (f"{DOM}rex", f"{DOM}owned_by", f"<{DOM}ann>"),
        (f"{DOM}owned_by", f"{RDFS}subPropertyOf", f"<{DOM}related_to>"),
        (f"{DOM}related_to", f"{RDFS}domain", f"<{DOM}thing>"),
        (f"{DOM}owned_by", f"{RDFS}range", f"<{DOM}person>"),
        (f"{DOM}rex", f"{RDFS}label", '"Rex"'),
    ]
    return pa.table({"s": pa.array([r[0] for r in rows]),
                     "p": pa.array([r[1] for r in rows]),
                     "o": pa.array([r[2] for r in rows])})


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    d = tmp_path_factory.mktemp("store")
    write_graph_partitioned(ray.data.from_arrow(_graph()), str(d))
    return str(d)


def test_query_bound_p_is_pruned_and_correct(store):
    from kgforge.sinks.store_query import _partition_paths, query_triples
    # bound p reads only its partition dir
    paths = _partition_paths(store, RDF_TYPE)
    assert paths and all("p_key=type" in p for p in paths)
    out = query_triples(store, p=RDF_TYPE).to_pandas()
    assert set(out["s"]) == {f"{DOM}rex"}
    assert set(out["o"]) == {f"<{DOM}dog>"}


def test_query_patterns_match_full_scan(store):
    from kgforge.sinks.store_query import query_triples, query_triples_sql
    con = duckdb.connect()
    for pat in ({"s": f"{DOM}rex"},
                {"p": f"{RDFS}subClassOf"},
                {"o": f"<{DOM}ann>"},
                {"s": f"{DOM}rex", "p": f"{RDFS}label"},
                {}):
        got = query_triples(store, **pat).to_pandas()
        exp = con.sql(query_triples_sql(store, **pat)).df()
        a = sorted(map(tuple, got[["s", "p", "o"]].itertuples(index=False)))
        b = sorted(map(tuple, exp[["s", "p", "o"]].itertuples(index=False)))
        assert a == b, pat


def test_entailed_types_closure(store):
    from kgforge.stages.entailment import entailed_types
    got = set(map(tuple, entailed_types(store).to_pandas()
                  [["s", "type_uri"]].itertuples(index=False)))
    assert got == {
        # base + subClassOf chain (transitive: dog -> mammal -> animal)
        (f"{DOM}rex", f"{DOM}dog"),
        (f"{DOM}rex", f"{DOM}mammal"),
        (f"{DOM}rex", f"{DOM}animal"),
        # domain of the SUPERproperty applies through subPropertyOf
        (f"{DOM}rex", f"{DOM}thing"),
        # range of owned_by types the object
        (f"{DOM}ann", f"{DOM}person"),
    }


def test_entailment_sql_mirror_matches(ray_session, store):
    """Engine closure == DuckDB recursive-CTE oracle over the same
    graph."""
    from kgforge.stages.entailment import (entailed_types,
                                           entailed_types_oracle_sql)
    con = duckdb.connect()
    con.register("g", _graph())
    odf = con.sql(entailed_types_oracle_sql("SELECT s, p, o FROM g")).df()
    got = entailed_types(store).to_pandas()
    a = sorted(map(tuple, got[["s", "type_uri"]].itertuples(index=False)))
    b = sorted(map(tuple, odf[["s", "type_uri"]].itertuples(index=False)))
    assert a == b


def test_transitive_closure_cycle_safe():
    from kgforge.stages.entailment import transitive_closure
    c = transitive_closure([("a", "b"), ("b", "a"), ("b", "c")])
    assert c["a"] == {"a", "b", "c"}
    assert c["b"] == {"a", "b", "c"}


def test_entailed_facts_construct_inference(ray_session, store):
    """The reference's CONSTRUCT rule (requests.sparql:10-13): facts
    derived through the subPropertyOf closure."""
    from kgforge.stages.entailment import (entailed_facts,
                                           entailed_facts_oracle_sql)
    got = set(map(tuple, entailed_facts(store).to_pandas()
                  [["s", "p", "o"]].itertuples(index=False)))
    assert got == {(f"{DOM}rex", f"{DOM}related_to", f"<{DOM}ann>")}
    con = duckdb.connect()
    con.register("g", _graph())
    odf = con.sql(entailed_facts_oracle_sql("SELECT s, p, o FROM g")).df()
    assert got == set(map(tuple,
                          odf[["s", "p", "o"]].itertuples(index=False)))


def test_query_minus_latest_version_pattern(ray_session, tmp_path):
    """requests.sparql:22-31: pairs via the v2 relation MINUS pairs
    also linked by another subproperty of the parent relation."""
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    from kgforge.sinks.store_query import query_minus
    rows = [
        # part1 linked via BOTH versions -> excluded; part2 only via v2
        (f"{DOM}part1", f"{DOM}applicable_v2", f"<{DOM}cfgA>"),
        (f"{DOM}part1", f"{DOM}applicable_v1", f"<{DOM}cfgA>"),
        (f"{DOM}part2", f"{DOM}applicable_v2", f"<{DOM}cfgB>"),
        (f"{DOM}part3", f"{DOM}applicable_v1", f"<{DOM}cfgC>"),
        (f"{DOM}applicable_v1", f"{RDFS}subPropertyOf",
         f"<{DOM}applicable>"),
        (f"{DOM}applicable_v2", f"{RDFS}subPropertyOf",
         f"<{DOM}applicable>"),
    ]
    tbl = pa.table({"s": pa.array([r[0] for r in rows]),
                    "p": pa.array([r[1] for r in rows]),
                    "o": pa.array([r[2] for r in rows])})
    d = tmp_path / "vstore"
    write_graph_partitioned(ray.data.from_arrow(tbl), str(d))
    out = query_minus(str(d), f"{DOM}applicable_v2",
                      [f"{DOM}applicable_v1"]).to_pandas()
    got = set(map(tuple, out[["s", "o"]].itertuples(index=False)))
    assert got == {(f"{DOM}part2", f"<{DOM}cfgB>")}
    # empty exclusion set -> identity
    out2 = query_minus(str(d), f"{DOM}applicable_v2", []).to_pandas()
    assert len(out2) == 2
