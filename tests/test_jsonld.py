"""JSON-LD emitter (sinks/jsonld_sink.py): round-trip against the
golden catalog N-Triples, compact-form structure, and the sharded Ray
write path through the sink registry."""

import glob
import json
import os

import pyarrow as pa

from conftest import DOMAIN

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _catalog_triples(catalog, grammar_path) -> pa.Table:
    from kgforge.rules import compile_grammar
    from kgforge.stages.triples import TripleGenerator
    header, rows = catalog
    cols = list(zip(*rows))
    table = pa.table({h: pa.array(list(c), type=pa.string())
                      for h, c in zip(header, cols)})
    t = TripleGenerator(compile_grammar(grammar_path, DOMAIN))(table)
    return t.group_by(t.schema.names).aggregate([])


def test_jsonld_roundtrips_golden_catalog(catalog, grammar_path):
    from kgforge.sinks.jsonld_sink import jsonld_block, parse_jsonld
    from kgforge.sinks.turtle_sink import make_prefixes
    t = _catalog_triples(catalog, grammar_path)
    t = t.sort_by([(c, "ascending") for c in
                   ["s", "p", "o_kind", "o_lex", "o_dt"]])
    doc = jsonld_block(t, make_prefixes(DOMAIN))
    got = {f"<{s}> <{p}> {o} ." for s, p, o in parse_jsonld(doc)}
    want = set(open(os.path.join(GOLDEN, "catalog.nt")).read().splitlines())
    assert got == want
    # compact form actually happened: context + qname keys + @type
    parsed = json.loads(doc)
    assert parsed["@context"]["kg"] == DOMAIN
    assert any("@type" in n for n in parsed["@graph"])
    assert any(any(k.startswith("kg:") for k in n) for n in parsed["@graph"])


def test_jsonld_structure():
    """One node object per subject run; rdf:type folds into @type;
    typed literals become @value/@type; plain literals stay strings."""
    from kgforge.ntriples import RDF_TYPE, XSD_INTEGER
    from kgforge.sinks.jsonld_sink import jsonld_block, parse_jsonld
    from kgforge.sinks.turtle_sink import make_prefixes
    d = "https://ex.org/kg/"
    rows = [
        (d + "s1", RDF_TYPE, "u", d + "Thing", ""),
        (d + "s1", d + "p", "l", 'plain "quoted"', ""),
        (d + "s1", d + "p", "l", "42", XSD_INTEGER),
        (d + "s2", d + "p", "u", d + "s1", ""),
    ]
    t = pa.table({c: pa.array([r[i] for r in rows], type=pa.string())
                  for i, c in enumerate(["s", "p", "o_kind", "o_lex",
                                         "o_dt"])})
    doc = jsonld_block(t, make_prefixes(d))
    parsed = json.loads(doc)
    assert [n["@id"] for n in parsed["@graph"]] == ["kg:s1", "kg:s2"]
    n1 = parsed["@graph"][0]
    assert n1["@type"] == ["kg:Thing"]
    assert n1["kg:p"] == ['plain "quoted"',
                          {"@value": "42", "@type": "xsd:integer"}]
    assert parsed["@graph"][1]["kg:p"] == [{"@id": "kg:s1"}]
    got = parse_jsonld(doc)
    assert (d + "s1", RDF_TYPE, "<" + d + "Thing>") in got
    assert (d + "s1", d + "p", '"42"^^<' + XSD_INTEGER + ">") in got
    assert (d + "s1", d + "p", '"plain \\"quoted\\""') in got
    assert (d + "s2", d + "p", "<" + d + "s1>") in got
    assert len(got) == 4


def test_jsonld_sharded_write(ray_session, tmp_path, catalog, grammar_path):
    """write_graph_jsonld via the registry: every shard is a standalone
    JSON document; the union of shards equals the triple set."""
    import ray.data
    from kgforge.sinks import sink_format
    from kgforge.sinks.jsonld_sink import parse_jsonld

    t = _catalog_triples(catalog, grammar_path)
    ds = ray.data.from_arrow(t).repartition(4)
    sink_format("jsonld")(ds, str(tmp_path), DOMAIN)
    files = sorted(glob.glob(str(tmp_path / "graph.jsonld" / "*")))
    assert len(files) >= 1
    got = set()
    for f in files:
        got |= parse_jsonld(open(f).read())
    nt = {f"<{s}> <{p}> {o} ." for s, p, o in got}
    golden = set(open(os.path.join(GOLDEN, "catalog.nt")).read().splitlines())
    assert nt == golden


def test_jsonld_fuzz_roundtrip():
    """Property: ANY columnar triple set round-trips through the
    JSON-LD emitter+parser (same strategy as the Turtle fuzz)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kgforge.ntriples import RDF_TYPE, XSD_INTEGER
    from kgforge.sinks.jsonld_sink import jsonld_block, parse_jsonld
    from kgforge.sinks.turtle_sink import make_prefixes
    d = "https://ex.org/kg/"
    local = st.text(
        alphabet="abzAZ09_-.()% \t\n\"\\'é日", min_size=0, max_size=8)
    iri = local.map(lambda x: d + x)
    lit = st.tuples(local, st.sampled_from(["", XSD_INTEGER]))
    triple = st.one_of(
        st.tuples(iri, st.just(RDF_TYPE), st.just("u"), iri, st.just("")),
        st.tuples(iri, iri, st.just("u"), iri, st.just("")),
        st.tuples(iri, iri, st.just("l"),
                  lit.map(lambda x: x[0]), lit.map(lambda x: x[1])))

    @settings(max_examples=60, deadline=None)
    @given(st.lists(triple, min_size=0, max_size=12))
    def run(rows):
        rows = sorted(set(rows))
        t = pa.table({c: pa.array([r[i] for r in rows], type=pa.string())
                      for i, c in enumerate(["s", "p", "o_kind", "o_lex",
                                             "o_dt"])})
        doc = jsonld_block(t, make_prefixes(d))
        got = parse_jsonld(doc)
        from kgforge.ntriples import render_literal
        want = set()
        for s, p, k, lex, dt in rows:
            o = f"<{lex}>" if k == "u" else render_literal(lex, dt or None)
            want.add((s, p, o))
        assert got == want

    run()
