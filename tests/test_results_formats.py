"""W3C SPARQL 1.1 results serializers (kgforge/sinks/results.py):
term decoding, the four streamed writers, and the CLI flag."""

import json
import os

import pyarrow as pa
import pytest

from kgforge.sinks.results import (_decode_term, _tsv_term,
                                   write_sparql_results)


def test_decode_term_shapes():
    assert _decode_term(None) == (None, None, None, None)
    assert _decode_term("http://e/a") == ("uri", "http://e/a",
                                          None, None)
    assert _decode_term("<http://e/a>") == ("uri", "http://e/a",
                                            None, None)
    assert _decode_term('"hi"') == ("literal", "hi", None, None)
    assert _decode_term('"5"^^<http://www.w3.org/2001/XMLSchema#int>'
                        ) == ("literal", "5",
                              "http://www.w3.org/2001/XMLSchema#int",
                              None)
    assert _decode_term('"bonjour"@fr') == ("literal", "bonjour",
                                            None, "fr")
    assert _decode_term('"a\\"b\\nc"') == ("literal", 'a"b\nc',
                                           None, None)


def test_tsv_term_forms():
    assert _tsv_term(None) == ""
    assert _tsv_term("http://e/a") == "<http://e/a>"
    assert _tsv_term("<http://e/a>") == "<http://e/a>"
    assert _tsv_term('"hi"') == '"hi"'


@pytest.fixture()
def result_store(ray_session, tmp_path):
    """Store with IRIs, plain/typed literals, and an OPTIONAL-unbound
    row (s2 lacks p2) — exercises every serializer branch."""
    import ray.data
    from kgforge.sinks.ntriples_sink import write_graph_partitioned
    rows = pa.table({
        "s": ["http://e/s1", "http://e/s2", "http://e/s1"],
        "p": ["http://e/p1", "http://e/p1", "http://e/p2"],
        "o": ['<http://e/o1>',
              '"x,\\"q\\""^^<http://www.w3.org/2001/XMLSchema#string>',
              '"5"'],
    })
    store = str(tmp_path / "resstore")
    os.makedirs(store)
    write_graph_partitioned(ray.data.from_arrow(rows), store)
    return store


QUERY = ("SELECT ?x ?y ?w WHERE { ?x <http://e/p1> ?y . "
         "OPTIONAL { ?x <http://e/p2> ?w } } ORDER BY ?x")


def _run(store):
    from kgforge.sparql import execute_sparql, parse_sparql
    return execute_sparql(store, parse_sparql(QUERY)[0])


def test_write_results_csv(ray_session, result_store, tmp_path):
    path = str(tmp_path / "r.csv")
    n = write_sparql_results(_run(result_store), path, "csv")
    assert n == 2
    lines = open(path, encoding="utf-8",
                 newline="").read().split("\r\n")
    assert lines[0] == "x,y,w"
    # plain values: IRIs bare, literal lexical forms unescaped,
    # RFC 4180 quoting for the comma/quote payload, unbound = empty
    assert lines[1] == 'http://e/s1,http://e/o1,5'
    assert lines[2] == 'http://e/s2,"x,""q""",'


def test_write_results_tsv(ray_session, result_store, tmp_path):
    path = str(tmp_path / "r.tsv")
    n = write_sparql_results(_run(result_store), path, "tsv")
    assert n == 2
    lines = open(path, encoding="utf-8").read().splitlines()
    assert lines[0] == "?x\t?y\t?w"
    assert lines[1] == '<http://e/s1>\t<http://e/o1>\t"5"'
    assert lines[2].startswith('<http://e/s2>\t"x,\\"q\\""^^<')
    assert lines[2].endswith("\t")  # unbound -> empty field


def test_write_results_json(ray_session, result_store, tmp_path):
    path = str(tmp_path / "r.json")
    n = write_sparql_results(_run(result_store), path, "json")
    assert n == 2
    doc = json.load(open(path, encoding="utf-8"))
    assert doc["head"]["vars"] == ["x", "y", "w"]
    b1, b2 = doc["results"]["bindings"]
    assert b1["x"] == {"type": "uri", "value": "http://e/s1"}
    assert b1["w"] == {"type": "literal", "value": "5"}
    assert b2["y"]["type"] == "literal"
    assert b2["y"]["value"] == 'x,"q"'
    assert b2["y"]["datatype"].endswith("#string")
    assert "w" not in b2      # unbound var omitted from the binding


def test_write_results_ask_json(ray_session, result_store, tmp_path):
    from kgforge.sparql import execute_sparql, parse_sparql
    q = parse_sparql(
        "ASK { <http://e/s1> <http://e/p2> ?w }")[0]
    ds = execute_sparql(result_store, q)
    path = str(tmp_path / "ask.json")
    write_sparql_results(ds, path, "json")
    assert json.load(open(path)) == {"head": {}, "boolean": True}


def test_cli_results_format_flag(ray_session, result_store, tmp_path):
    from kgforge.cli import _run_sparql

    class A:
        pass

    a = A()
    a.query = QUERY
    a.sparql = None
    a.store = result_store
    a.out = str(tmp_path / "out")
    a.results_format = "json"
    a.apply_updates = False
    assert _run_sparql(a) == 0
    files = os.listdir(a.out)
    assert files == ["statement1_select.json"]
    doc = json.load(open(os.path.join(a.out, files[0])))
    assert len(doc["results"]["bindings"]) == 2


def test_unknown_format_raises():
    with pytest.raises(ValueError, match="unknown results format"):
        write_sparql_results(None, "/tmp/x", "yaml")


def test_write_results_xml(ray_session, result_store, tmp_path):
    import xml.etree.ElementTree as ET
    path = str(tmp_path / "r.xml")
    n = write_sparql_results(_run(result_store), path, "xml")
    assert n == 2
    ns = {"s": "http://www.w3.org/2005/sparql-results#"}
    root = ET.parse(path).getroot()
    assert [v.get("name") for v in root.findall("s:head/s:variable",
                                                ns)] == ["x", "y", "w"]
    results = root.findall("s:results/s:result", ns)
    assert len(results) == 2
    b1 = {b.get("name"): b for b in results[0].findall("s:binding", ns)}
    assert b1["x"].find("s:uri", ns).text == "http://e/s1"
    assert b1["w"].find("s:literal", ns).text == "5"
    b2 = {b.get("name"): b for b in results[1].findall("s:binding", ns)}
    assert "w" not in b2                 # unbound binding omitted
    lit = b2["y"].find("s:literal", ns)
    assert lit.text == 'x,"q"'
    assert lit.get("datatype").endswith("#string")


def test_write_results_ask_xml(ray_session, result_store, tmp_path):
    import xml.etree.ElementTree as ET
    from kgforge.sparql import execute_sparql, parse_sparql
    q = parse_sparql("ASK { <http://e/s1> <http://e/p2> ?w }")[0]
    path = str(tmp_path / "ask.xml")
    write_sparql_results(execute_sparql(result_store, q), path, "xml")
    ns = {"s": "http://www.w3.org/2005/sparql-results#"}
    root = ET.parse(path).getroot()
    assert root.find("s:boolean", ns).text == "true"


def test_write_results_nt_construct(ray_session, result_store,
                                    tmp_path):
    """CONSTRUCT output serializes as N-Triples lines matching the
    graph sink's shape; non-triple results are rejected."""
    from kgforge.sparql import execute_sparql, parse_sparql
    q = parse_sparql(
        "CONSTRUCT WHERE { ?s <http://e/p1> ?o }")[0]
    ds = execute_sparql(result_store, q)
    path = str(tmp_path / "g.nt")
    n = write_sparql_results(ds, path, "nt")
    lines = sorted(open(path).read().splitlines())
    assert n == len(lines) > 0
    for ln in lines:
        assert ln.startswith("<http://e/") and ln.endswith(" .")
    qsel = parse_sparql("SELECT ?s WHERE { ?s <http://e/p1> ?o }")[0]
    with pytest.raises(ValueError):
        write_sparql_results(execute_sparql(result_store, qsel),
                             str(tmp_path / "bad.nt"), "nt")


def test_bare_plain_string_is_literal(ray_session, result_store, tmp_path):
    """A plain-string BIND alias column (bare values) serializes as a
    LITERAL, not an IRI — only scheme-shaped bare values read as IRIs."""
    from kgforge.sparql import execute_sparql, parse_sparql
    q = parse_sparql("""
SELECT ?s ?u WHERE { ?s <http://e/p2> ?w .
  BIND(UCASE(STR(?w)) AS ?u) }""")[0]
    ds = execute_sparql(result_store, q)
    path = str(tmp_path / "plain.json")
    write_sparql_results(ds, path, "json")
    doc = json.load(open(path))
    kinds = {b["u"]["type"] for b in doc["results"]["bindings"]}
    assert kinds == {"literal"}
    assert {b["s"]["type"] for b in doc["results"]["bindings"]} \
        == {"uri"}
    path2 = str(tmp_path / "plain.tsv")
    write_sparql_results(ds, path2, "tsv")
    body = open(path2).read().splitlines()[1:]
    assert all("\t\"" in ln for ln in body)   # quoted literal column
