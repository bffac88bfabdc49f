"""Engine vs oracle parity — the P/R gate (target: exact equality).

The oracle (kgforge/oracle.py) is an independent literal transcription of
csv2rdf v5; the engine path here is the same TripleGenerator batch
function Ray runs, applied directly to pyarrow Tables (map_batches fns
are plain functions over Arrow batches — no cluster needed)."""

import pyarrow as pa

from kgforge.oracle import OracleGrammar, precision_recall, sorted_ntriples
from kgforge.rules import compile_grammar
from kgforge.stages.triples import (
    OntologyRequirements,
    TripleGenerator,
    triples_to_terms,
)
from conftest import DOMAIN


def _table_from_rows(header, rows):
    cols = list(zip(*rows))
    return pa.table({h: pa.array(list(c), type=pa.string())
                     for h, c in zip(header, cols)})


def _engine_triples(table, ruleset, batch_slices=1):
    """Run the engine batch fn over `batch_slices` slices (simulating
    multiple blocks) and return the rendered (s,p,o) term set."""
    gen = TripleGenerator(ruleset)
    out = set()
    n = table.num_rows
    step = max(1, n // batch_slices)
    for off in range(0, n, step):
        t = gen(table.slice(off, step))
        terms = triples_to_terms(t)
        for s, p, o in zip(terms["s"].to_pylist(), terms["p"].to_pylist(),
                           terms["o"].to_pylist()):
            out.add((f"<{s}>", f"<{p}>", o))
    return out


def test_engine_matches_oracle_exactly(catalog, grammar_path):
    header, rows = catalog
    og = OracleGrammar(grammar_path, DOMAIN)
    want, define = og.parse_rows(header, rows)
    got = _engine_triples(_table_from_rows(header, rows),
                         compile_grammar(grammar_path, DOMAIN))
    p, r = precision_recall(got, want)
    assert (p, r) == (1.0, 1.0), (
        f"P={p} R={r}; engine-only={sorted(got - want)[:5]} "
        f"oracle-only={sorted(want - got)[:5]}")


def test_engine_matches_oracle_across_batch_splits(catalog, grammar_path):
    header, rows = catalog
    og = OracleGrammar(grammar_path, DOMAIN)
    want, _ = og.parse_rows(header, rows)
    table = _table_from_rows(header, rows)
    rs = compile_grammar(grammar_path, DOMAIN)
    for slices in (2, 7, 30):
        got = _engine_triples(table, rs, batch_slices=slices)
        assert got == want, f"mismatch at {slices} slices"


def test_ontology_requirements_match(catalog, grammar_path):
    header, rows = catalog
    og = OracleGrammar(grammar_path, DOMAIN)
    _, define = og.parse_rows(header, rows)
    table = _table_from_rows(header, rows)
    req = OntologyRequirements(compile_grammar(grammar_path, DOMAIN))
    got = set(req(table)["requirement"].to_pylist())
    assert got == set(define)


def test_sorted_ntriples_deterministic(catalog, grammar_path):
    header, rows = catalog
    og = OracleGrammar(grammar_path, DOMAIN)
    store, _ = og.parse_rows(header, rows)
    lines1 = sorted_ntriples(store)
    store2, _ = OracleGrammar(grammar_path, DOMAIN).parse_rows(header, rows)
    assert lines1 == sorted_ntriples(store2)
    # canonical order: raw (s_iri, p_iri, o_term), brackets excluded
    keys = [(s[1:-1], p[1:-1], o) for s, p, o in
            sorted(store, key=lambda t: (t[0][1:-1], t[1][1:-1], t[2]))]
    assert keys == sorted(keys)
    assert all(l.endswith(" .") for l in lines1)


def test_oracle_csv_decode_errors_ignore(tmp_path, grammar_path):
    # utf-8 errors='ignore' parity (csv2rdf-v5.py:437): bad bytes dropped
    header = b"PNR;IPPN;CSN;SRV;VAPMOV;EFY;NSC;SUBJM;DESC;QTY;WEIGHT;FIRST_DATE;MOI;UNBOUND\n"
    row = b"P1;C1;CS1;FIF;AEX;00010002;0001;NON;d\xffesc;1;1.5;2024-01-02;x;y\n"
    f = tmp_path / "t.csv"
    f.write_bytes(header + row)
    og = OracleGrammar(grammar_path, DOMAIN)
    store, _ = og.parse_csv(str(f))
    objs = {o for (s, p, o) in store if "part_description" in p}
    # 0xff dropped -> lexical form 'desc', typed xsd:string
    assert any(o.startswith('"desc"^^') for o in objs), objs
