"""Turtle emitter: round-trip against the golden catalog N-Triples, and
the sharded Ray write path."""

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
    # exact set semantics (the golden file is a distinct sorted graph)
    return t.group_by(t.schema.names).aggregate([])


def test_turtle_roundtrips_golden_catalog(catalog, grammar_path):
    from kgforge.sinks.turtle_sink import (make_prefixes, parse_turtle,
                                           turtle_block)
    t = _catalog_triples(catalog, grammar_path)
    t = t.sort_by([(c, "ascending") for c in
                   ["s", "p", "o_kind", "o_lex", "o_dt"]])
    ttl = turtle_block(t, make_prefixes(DOMAIN))
    got = {f"<{s}> <{p}> {o} ." for s, p, o in parse_turtle(ttl)}
    want = set(open(os.path.join(GOLDEN, "catalog.nt")).read().splitlines())
    assert got == want
    # prefix compaction actually happened (the doc isn't just <iri> soup)
    assert "@prefix kg:" in ttl and "\nkg:" in ttl and " a " in ttl


def test_turtle_grouping_syntax():
    """`;` for same-subject predicate change, `,` for same-predicate
    object lists, `a` for rdf:type, literal datatypes compacted."""
    from kgforge.ntriples import RDF_TYPE, XSD_INTEGER
    from kgforge.sinks.turtle_sink import (make_prefixes, parse_turtle,
                                           turtle_block)
    d = "https://ex.org/kg/"
    rows = [
        (d + "s1", RDF_TYPE, "u", d + "Thing", ""),
        (d + "s1", d + "p", "l", "plain \"quoted\"", ""),
        (d + "s1", d + "p", "l", "42", XSD_INTEGER),
        (d + "s2", d + "p", "u", d + "s1", ""),
    ]
    t = pa.table({c: pa.array([r[i] for r in rows], type=pa.string())
                  for i, c in enumerate(["s", "p", "o_kind", "o_lex",
                                         "o_dt"])})
    ttl = turtle_block(t, make_prefixes(d))
    assert " ;\n" in ttl and " ,\n" in ttl and " a " in ttl
    assert "^^xsd:integer" in ttl
    got = parse_turtle(ttl)
    assert (d + "s1", RDF_TYPE, "<" + d + "Thing>") in got
    assert (d + "s1", d + "p", '"42"^^<' + XSD_INTEGER + ">") in got
    assert (d + "s1", d + "p", '"plain \\"quoted\\""') in got
    assert (d + "s2", d + "p", "<" + d + "s1>") in got
    assert len(got) == 4


def test_turtle_roundtrip_fuzz():
    """Property: ANY columnar triple set round-trips through the
    emitter+parser (hostile locals fall back to <iri>, literals carry
    every escapable char)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kgforge.ntriples import RDF_TYPE, XSD_INTEGER, render_object
    from kgforge.sinks.turtle_sink import (make_prefixes, parse_turtle,
                                           turtle_block)
    d = "https://ex.org/kg/"
    local = st.text(
        alphabet="abzAZ09_-.()% \t\n\"\\'é日", min_size=0, max_size=8)
    iri = st.one_of(
        local.map(lambda x: d + x),
        st.just(RDF_TYPE),
        st.just("http://other.org/p"),
    )
    triple = st.tuples(
        iri, iri,
        st.sampled_from(["u", "l"]),
        st.one_of(local, iri),
        st.sampled_from(["", XSD_INTEGER]),
    )

    @settings(max_examples=60, deadline=None)
    @given(st.lists(triple, min_size=0, max_size=12))
    def check(rows):
        rows = sorted(set(rows))
        t = pa.table({c: pa.array([r[i] for r in rows], type=pa.string())
                      for i, c in enumerate(["s", "p", "o_kind", "o_lex",
                                             "o_dt"])})
        ttl = turtle_block(t, make_prefixes(d))
        got = {(s, p, o) for s, p, o in parse_turtle(ttl)}
        want = {(s, p, render_object(k, ol, dt or None))
                for s, p, k, ol, dt in rows}
        assert got == want

    check()


def test_orchestrator_turtle_matches_nt(ray_session, tmp_path,
                                        grammar_path):
    """run_sources(turtle=True): the Turtle shards parse back to exactly
    the triples of the N-Triples output written alongside them."""
    import csv
    import glob
    import shutil

    from conftest import catalog_rows
    from kgforge.pipelines.orchestrator import run_sources
    from kgforge.sinks.turtle_sink import parse_turtle
    header, rows = catalog_rows(60)
    with open(tmp_path / "cat.csv", "w", newline="") as f:
        w = csv.writer(f, delimiter=";")
        w.writerow(header)
        w.writerows(rows)
    shutil.copy(grammar_path, tmp_path / "grammar.ini")
    (tmp_path / "conf.ini").write_text(
        f"[catalog]\nfile = cat.csv\ndomain = {DOMAIN}\ndelimiter = ;\n"
        "semantics = grammar.ini\nactive = True\n")
    out = tmp_path / "out"
    run_sources(str(tmp_path / "conf.ini"), str(out), turtle=True)
    nt_lines = set()
    for f in sorted(glob.glob(f"{out}/catalog/graph.nt/*")):
        nt_lines |= set(open(f, encoding="utf-8").read().splitlines())
    ttl = set()
    for f in sorted(glob.glob(f"{out}/catalog/graph.ttl/*.ttl")):
        ttl |= parse_turtle(open(f, encoding="utf-8").read())
    assert {f"<{s}> <{p}> {o} ." for s, p, o in ttl} == nt_lines
    assert nt_lines


def test_write_graph_turtle_shards(ray_session, tmp_path, catalog,
                                   grammar_path):
    import glob

    import ray.data as rd

    from kgforge.sinks.turtle_sink import parse_turtle, write_graph_turtle
    t = _catalog_triples(catalog, grammar_path)
    ds = rd.from_arrow(t).repartition(3)
    write_graph_turtle(ds, str(tmp_path), DOMAIN)
    files = sorted(glob.glob(f"{tmp_path}/graph.ttl/*.ttl"))
    assert files
    got = set()
    for f in files:
        text = open(f, encoding="utf-8").read()
        assert text.startswith("@prefix")     # every shard standalone
        got |= parse_turtle(text)
    want = set(open(os.path.join(GOLDEN, "catalog.nt")).read().splitlines())
    assert {f"<{s}> <{p}> {o} ." for s, p, o in got} == want
