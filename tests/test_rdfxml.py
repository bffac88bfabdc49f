"""RDF/XML emitter (sinks/rdfxml_sink.py): round-trip against the
golden catalog N-Triples, structural form, escaping, the QName format
limit, and the sharded Ray write path through the sink registry."""

import glob
import os

import pyarrow as pa
import pytest

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


def test_rdfxml_roundtrips_golden_catalog(catalog, grammar_path):
    from kgforge.sinks.rdfxml_sink import parse_rdfxml, rdfxml_block
    from kgforge.sinks.turtle_sink import make_prefixes
    t = _catalog_triples(catalog, grammar_path)
    t = t.sort_by([(c, "ascending") for c in
                   ["s", "p", "o_kind", "o_lex", "o_dt"]])
    doc = rdfxml_block(t, make_prefixes(DOMAIN))
    got = {f"<{s}> <{p}> {o} ." for s, p, o in parse_rdfxml(doc)}
    want = set(open(os.path.join(GOLDEN, "catalog.nt")).read().splitlines())
    assert got == want
    # the document is well-formed XML with namespace declarations
    assert doc.startswith('<?xml version="1.0"')
    assert 'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"' in doc


def test_rdfxml_structure_and_escaping():
    """One Description per subject run; rdf:resource for IRIs;
    rdf:datatype for typed literals; XML special chars escape in both
    text and attribute positions; blank nodes use rdf:nodeID."""
    from kgforge.ntriples import RDF_TYPE, XSD_INTEGER
    from kgforge.sinks.rdfxml_sink import parse_rdfxml, rdfxml_block
    from kgforge.sinks.turtle_sink import make_prefixes
    d = "https://ex.org/kg/"
    rows = [
        (d + "s1", RDF_TYPE, "u", d + "Thing", ""),
        (d + "s1", d + "p", "l", 'a <b> & "c"', ""),
        (d + "s1", d + "p", "l", "42", XSD_INTEGER),
        (d + "s2", d + "p", "u", "_:b7", ""),
        ("_:b7", d + "p", "u", d + "s1", ""),
    ]
    t = pa.table({c: pa.array([r[i] for r in rows], type=pa.string())
                  for i, c in enumerate(["s", "p", "o_kind", "o_lex",
                                         "o_dt"])})
    doc = rdfxml_block(t, make_prefixes(d))
    assert "&lt;b&gt; &amp;" in doc
    assert 'rdf:nodeID="b7"' in doc
    got = parse_rdfxml(doc)
    assert (d + "s1", RDF_TYPE, "<" + d + "Thing>") in got
    assert (d + "s1", d + "p", '"42"^^<' + XSD_INTEGER + ">") in got
    assert (d + "s1", d + "p", '"a <b> & \\"c\\""') in got
    assert (d + "s2", d + "p", "_:b7") in got
    assert ("_:b7", d + "p", "<" + d + "s1>") in got
    assert len(got) == 5


def test_rdfxml_qname_limit():
    """A predicate with no NCName split raises the documented format
    error instead of emitting invalid XML."""
    from kgforge.sinks.rdfxml_sink import _split_pred, rdfxml_block
    from kgforge.sinks.turtle_sink import make_prefixes
    assert _split_pred("https://e/x#label") == ("https://e/x#", "label")
    t = pa.table({
        "s": pa.array(["https://e/s"], pa.string()),
        "p": pa.array(["https://e/p#123bad"], pa.string()),
        "o_kind": pa.array(["l"], pa.string()),
        "o_lex": pa.array(["v"], pa.string()),
        "o_dt": pa.array([""], pa.string()),
    })
    with pytest.raises(ValueError, match="QName"):
        rdfxml_block(t, make_prefixes("https://e/"))


def test_rdfxml_sharded_write(ray_session, tmp_path, catalog,
                              grammar_path):
    """write_graph_rdfxml via the registry: every shard is a standalone
    XML document; the union of shards equals the triple set; the
    distributed reader re-ingests them."""
    import ray.data

    from kgforge.ntriples import render_object
    from kgforge.sinks import sink_format
    from kgforge.sinks.rdfxml_sink import parse_rdfxml
    from kgforge.sources.rdfsource import read_rdfxml
    t = _catalog_triples(catalog, grammar_path)
    ds = ray.data.from_arrow(t).repartition(3)
    sink_format("rdfxml")(ds, str(tmp_path), DOMAIN)
    shards = sorted(glob.glob(str(tmp_path / "graph.rdf" / "*.rdf")))
    assert len(shards) >= 2
    got: set[tuple[str, str, str]] = set()
    for f in shards:
        got |= parse_rdfxml(open(f).read())
    want = {(s, p, render_object(k, lx, dt or None))
            for s, p, k, lx, dt in zip(
                t["s"].to_pylist(), t["p"].to_pylist(),
                t["o_kind"].to_pylist(), t["o_lex"].to_pylist(),
                t["o_dt"].to_pylist())}
    assert got == want
    rt = read_rdfxml(str(tmp_path / "graph.rdf"))
    assert sorted(map(tuple, rt.to_pandas().itertuples(index=False))) \
        == sorted((s, p, o) for s, p, o in want)
