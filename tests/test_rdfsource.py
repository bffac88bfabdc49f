"""Bulk RDF ingestion (sources/rdfsource.py): Turtle/N-Triples parsing,
distributed round-trips against the engine's own sinks, store loading
for the reference's .ttl fixtures, and error shapes."""

from __future__ import annotations

import os
import shutil

import pytest

from kgforge.ntriples import RDF_TYPE, XSD_NS
from kgforge.sources.rdfsource import (
    load_rdf_store,
    parse_turtle_text,
    read_ntriples,
    read_turtle,
)

SF = "/root/testdata/sf0.001"
REF_TTL = "/root/reference/csv2rdf/tests_ttl"


def rows(t):
    return sorted(map(tuple, zip(t["s"].to_pylist(), t["p"].to_pylist(),
                                 t["o"].to_pylist())))


# ------------------------------------------------------------- tokenizer

def test_reference_fixtures_parse():
    """The reference's own ontology fixtures load (tabs, empty prefix,
    dotted qname-terminated statements, comments)."""
    counts = {}
    for f in ("csv2rdf.ttl", "grammar.ttl", "test1.ttl"):
        with open(os.path.join(REF_TTL, f)) as fh:
            counts[f] = parse_turtle_text(fh.read()).num_rows
    assert counts == {"csv2rdf.ttl": 20, "grammar.ttl": 4, "test1.ttl": 4}
    t = parse_turtle_text(open(os.path.join(REF_TTL, "test1.ttl")).read())
    got = rows(t)
    assert ("http://my.company.com/rdf#file1", RDF_TYPE,
            "<https://github.com/orey/data/csv2rdf.ttl#csvfile>") in got
    assert ("http://my.company.com/rdf#file1",
            "https://github.com/orey/data/csv2rdf.ttl#delimiter",
            '";"') in got


def test_literal_forms():
    t = parse_turtle_text("""
        @prefix ex: <http://ex.org/> .
        ex:s ex:plain "hi" ;
             ex:typed "5"^^<http://www.w3.org/2001/XMLSchema#int> ;
             ex:qdt "6"^^ex:mytype ;
             ex:lang "bonjour"@FR ;
             ex:long \"\"\"two
lines\"\"\" ;
             ex:esc "a\\tb\\"c\\\\d" ;
             ex:num 42 ;
             ex:dec 4.5 ;
             ex:dbl 1e3 ;
             ex:neg -7 ;
             ex:flag true .
    """)
    got = dict(((r[1].rsplit("/", 1)[-1], r[2]) for r in rows(t)))
    assert got["plain"] == '"hi"'
    assert got["typed"] == '"5"^^<http://www.w3.org/2001/XMLSchema#int>'
    assert got["qdt"] == '"6"^^<http://ex.org/mytype>'
    assert got["lang"] == '"bonjour"@fr'
    assert got["long"] == '"two\\nlines"'
    assert got["esc"] == '"a\\tb\\"c\\\\d"'
    assert got["num"] == f'"42"^^<{XSD_NS}integer>'
    assert got["dec"] == f'"4.5"^^<{XSD_NS}decimal>'
    assert got["dbl"] == f'"1e3"^^<{XSD_NS}double>'
    assert got["neg"] == f'"-7"^^<{XSD_NS}integer>'
    assert got["flag"] == f'"true"^^<{XSD_NS}boolean>'


def test_sparql_style_directives_and_base():
    t = parse_turtle_text("""
        PREFIX ex: <http://ex.org/>
        BASE <http://base.org/>
        ex:s ex:p <rel> .
        <a> a ex:T .
    """)
    got = rows(t)
    assert ("http://ex.org/s", "http://ex.org/p",
            "<http://base.org/rel>") in got
    assert ("http://base.org/a", RDF_TYPE, "<http://ex.org/T>") in got


def test_iri_uchar_escape_roundtrip():
    t = parse_turtle_text(
        "<http://ex.org/a\\u0020b> <http://ex.org/p> <http://ex.org/o> .")
    assert rows(t)[0][0] == "http://ex.org/a b"


def test_error_shapes():
    with pytest.raises(ValueError, match="blank nodes"):
        parse_turtle_text("@prefix ex: <http://ex.org/> .\n"
                          "ex:s ex:p [ ex:q 1 ] .")
    with pytest.raises(ValueError, match="undefined prefix"):
        parse_turtle_text("ex:s ex:p ex:o .")
    with pytest.raises(ValueError, match="cannot tokenize|expected"):
        parse_turtle_text("@prefix ex: <http://ex.org/> .\nex:s ex:p @@ .")


# ---------------------------------------------------- distributed readers

def test_roundtrip_turtle_and_ntriples(ray_session):
    """Engine-emitted Turtle and N-Triples shards re-read to the exact
    term set the direct pipeline yields (this is also the
    rdf_ingest_turtle / rdf_ingest_ntriples gate path)."""
    from kgforge.pipelines import tabular

    golden = sorted(tuple(r.values())
                    for r in tabular.table_kg_terms(SF, "nation").take_all())
    back_ttl = sorted(
        tuple(r.values())
        for r in tabular.rdf_ingest_roundtrip(SF, "nation", "ttl").take_all())
    assert back_ttl == golden
    golden_r = sorted(tuple(r.values())
                      for r in tabular.table_kg_terms(SF, "region").take_all())
    back_nt = sorted(
        tuple(r.values())
        for r in tabular.rdf_ingest_roundtrip(SF, "region", "nt").take_all())
    assert back_nt == golden_r


def test_load_reference_fixture_store_and_query(ray_session):
    """load_rdf_store over the reference's .ttl fixtures publishes a
    store the SPARQL front-end answers from."""
    from kgforge.sparql import execute_sparql, parse_sparql

    tmp = "/tmp/kgforge_test_rdfstore"
    shutil.rmtree(tmp, ignore_errors=True)
    load_rdf_store([os.path.join(REF_TTL, "csv2rdf.ttl"),
                    os.path.join(REF_TTL, "test1.ttl")], tmp)
    q = parse_sparql("""
        PREFIX c: <https://github.com/orey/data/csv2rdf.ttl#>
        SELECT ?f ?name WHERE {
            ?f a c:csvfile .
            OPTIONAL { ?f c:filename ?name }
        } ORDER BY ?f
    """)[0]
    got = execute_sparql(tmp, q).take_all()
    assert got == [{"f": "http://my.company.com/rdf#file1",
                    "name": '"test1.csv"'}]


def test_mixed_format_dir_load(ray_session):
    """A directory holding both .ttl and .nt shards loads as one deduped
    graph (the overlap collapses)."""
    from kgforge.sinks.store_query import query_triples

    tmp = "/tmp/kgforge_test_mixed"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp + "/src", exist_ok=True)
    with open(tmp + "/src/a.ttl", "w") as f:
        f.write("@prefix ex: <http://ex.org/> .\n"
                "ex:s1 ex:p ex:o1 ; ex:p ex:o2 .\n")
    with open(tmp + "/src/b.nt", "w") as f:
        f.write("<http://ex.org/s1> <http://ex.org/p> <http://ex.org/o2> .\n"
                '<http://ex.org/s2> <http://ex.org/q> "v" .\n')
    with open(tmp + "/src/c.rdf", "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n'
                '<rdf:RDF xmlns:rdf='
                '"http://www.w3.org/1999/02/22-rdf-syntax-ns#"\n'
                '         xmlns:ex="http://ex.org/">\n'
                '  <rdf:Description rdf:about="http://ex.org/s1">\n'
                '    <ex:p rdf:resource="http://ex.org/o1"/>\n'
                '    <ex:p rdf:resource="http://ex.org/o3"/>\n'
                '  </rdf:Description>\n'
                '</rdf:RDF>\n')
    load_rdf_store(tmp + "/src", tmp + "/store")
    got = sorted(tuple(r.values())
                 for r in query_triples(tmp + "/store").take_all())
    assert got == [
        ("http://ex.org/s1", "http://ex.org/p", "<http://ex.org/o1>"),
        ("http://ex.org/s1", "http://ex.org/p", "<http://ex.org/o2>"),
        ("http://ex.org/s1", "http://ex.org/p", "<http://ex.org/o3>"),
        ("http://ex.org/s2", "http://ex.org/q", '"v"'),
    ]


def test_ntriples_bad_line_raises(ray_session):
    tmp = "/tmp/kgforge_test_badnt"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    with open(tmp + "/bad.nt", "w") as f:
        f.write("# a comment line is fine\n"
                "<http://ex.org/s> <http://ex.org/p> nonsense .\n")
    with pytest.raises(Exception, match="unparseable"):
        read_ntriples(tmp + "/bad.nt").take_all()


def test_turtle_reader_is_per_file_parallel(ray_session):
    """Many shard files -> many parse tasks: the reader's unit of
    parallelism is the file (documented partitioning assumption)."""
    tmp = "/tmp/kgforge_test_shards"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    for i in range(8):
        with open(f"{tmp}/part{i}.ttl", "w") as f:
            f.write("@prefix ex: <http://ex.org/> .\n"
                    f"ex:s{i} ex:p ex:o{i} .\n")
    ds = read_turtle(tmp)
    assert ds.count() == 8
    assert sorted(r["s"] for r in ds.take_all()) == sorted(
        f"http://ex.org/s{i}" for i in range(8))


def test_roundtrip_jsonld(ray_session, tmp_path):
    """Engine-emitted JSON-LD shards re-read (read_jsonld +
    load_rdf_store auto-detect) to the exact term set of the source
    graph."""
    import ray.data
    from kgforge.pipelines import tabular
    from kgforge.sinks.jsonld_sink import write_graph_jsonld
    from kgforge.sinks.store_query import query_triples
    from kgforge.sources.rdfsource import read_jsonld

    golden = sorted(tuple(r.values())
                    for r in tabular.table_kg_terms(SF, "region")
                    .take_all())
    out = str(tmp_path / "g.jsonld")
    write_graph_jsonld(tabular.table_kg_triples(SF, "region"), out)
    back = sorted(tuple(r.values())
                  for r in read_jsonld(out).take_all())
    assert back == golden
    store = str(tmp_path / "store")
    load_rdf_store(out, store)
    loaded = sorted(tuple(r.values())
                    for r in query_triples(store).take_all())
    assert loaded == sorted(set(golden))


def test_blank_node_load(ray_session):
    """Labeled blank nodes (_:name) load through both line-split
    N-Triples and the Turtle parser, keep their raw form in the
    store, and answer isBlank() queries."""
    from kgforge.sources.rdfsource import read_ntriples, read_turtle
    from kgforge.sparql import execute_sparql, parse_sparql

    tmp = "/tmp/kgforge_test_blank"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp + "/src", exist_ok=True)
    with open(tmp + "/src/a.nt", "w") as f:
        f.write("_:b0 <http://ex.org/p> <http://ex.org/o> .\n"
                "<http://ex.org/s> <http://ex.org/p> _:b0 .\n")
    with open(tmp + "/src/b.ttl", "w") as f:
        f.write("@prefix ex: <http://ex.org/> .\n"
                "_:c1 ex:p ex:o ; ex:q _:c2 .\n")
    nt = sorted(tuple(r.values())
                for r in read_ntriples(tmp + "/src/a.nt").take_all())
    assert nt == [("_:b0", "http://ex.org/p", "<http://ex.org/o>"),
                  ("http://ex.org/s", "http://ex.org/p", "_:b0")]
    ttl = sorted(tuple(r.values())
                 for r in read_turtle(tmp + "/src/b.ttl").take_all())
    assert ttl == [("_:c1", "http://ex.org/p", "<http://ex.org/o>"),
                   ("_:c1", "http://ex.org/q", "_:c2")]
    load_rdf_store(tmp + "/src", tmp + "/store")
    q = parse_sparql("""
        SELECT ?s WHERE { ?s <http://ex.org/p> ?o .
                          FILTER(isBlank(?s)) }""")[0]
    got = sorted(r["s"] for r in execute_sparql(
        tmp + "/store", q).take_all())
    assert got == ["_:b0", "_:c1"]


def test_turtle_blank_predicate_rejected(ray_session):
    from kgforge.sources.rdfsource import parse_turtle_text
    with pytest.raises(ValueError, match="predicate"):
        parse_turtle_text("<http://e/s> _:b <http://e/o> .")
