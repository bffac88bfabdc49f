"""v2 dialect quirks — sanitize-first, permutations, chains, descr."""

import duckdb
import pyarrow as pa
import pytest

from kgforge.functions.v2grammar import (V2TripleGenerator,
                                         compile_v2_grammar, v2_to_sql,
                                         v2_format_predicate)
from kgforge.rules import GrammarError
from kgforge.stages.triples import triples_to_terms

D = "https://v2.example.org/"

G = """
[K]
cell = pkey
celltypes = part,item,RDFS:RESOURCE

[A]
cell = subject
column = predicate
celltypes = widget,concept
columntypes = has_widget,rel,RDF:PROPERTY

[B]
cell = object,prefix(px_)
column = predicate
celltypes = code
columntypes = coded_as

[C]
cell = object
celltypes = string
column = predicate
columntypes = unused

[P]
cell = predicate
column = subject
celltypes = verb
columntypes = action
"""


def _terms(table, g):
    out = triples_to_terms(V2TripleGenerator(g)(table))
    return set(zip(out["s"].to_pylist(), out["p"].to_pylist(),
                   out["o"].to_pylist()))


def test_v2_sanitizer_charset():
    assert v2_format_predicate("a b-c/d(e)f,g\"h'i") == "a_b_c_d_e_f_g_h_i"
    # v5-only chars untouched in v2
    assert v2_format_predicate("x#y$z.w\\v") == "x#y$z.w\\v"


def test_v2_semantics():
    g = compile_v2_grammar(G, D)
    rdf_t = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    table = pa.table({
        "K": ["P 1"],          # sanitized-first → P_1 everywhere
        "A": ["wid get"],
        "B": ["7"],
        "C": ["  note  "],     # whitespace: sanitized to '__note__', kept!
        "P": ["owns"],
    })
    got = _terms(table, g)
    # pkey: sanitized cell + type chain via rdf:type incl. RDFS:RESOURCE
    assert (D + "P_1", rdf_t, f"<{D}part>") in got
    assert (D + "part", rdf_t, f"<{D}item>") in got
    assert (D + "item", rdf_t, f"<{rdfs}Resource>") in got
    # subject/predicate permutation (sanitize-first: 'wid get'→'wid_get')
    assert (D + "wid_get", D + "has_widget", f"<{D}P_1>") in got
    # columntypes chain: has_widget -> rel -> RDF:PROPERTY (via rdf:type)
    assert (D + "has_widget", rdf_t, f"<{D}rel>") in got
    assert (D + "rel", rdf_t,
            "<http://www.w3.org/1999/02/22-rdf-syntax-ns#Property>") in got
    # command case: prefix PREPENDS in v2 (px_ + cell, csv2rdf-v2.py:349)
    assert (D + "px_7", D + "coded_as", f"<{D}P_1>") not in got  # it's object role
    assert (D + "P_1", D + "coded_as", f"<{D}px_7>") in got
    # descr: rdfs:comment with the SANITIZED cell as literal
    assert (D + "P_1", rdfs + "comment", '"__note__"') in got
    # predicate/subject permutation: (coltype, cellvalue, pkey)
    assert (D + "action", D + "owns", f"<{D}P_1>") in got


def test_v2_crashing_permutations_rejected():
    bad = G.replace("cell = predicate\ncolumn = subject",
                    "cell = subject\ncolumn = object")
    with pytest.raises(GrammarError, match="crashes in the reference"):
        compile_v2_grammar(bad, D)


def test_v2_map_miss_raises():
    g2 = compile_v2_grammar(
        "[K]\ncell = pkey\ncelltypes = t\n"
        "[M]\ncell = object,map(all;*m*)\ncolumn = predicate\n"
        "celltypes = c\ncolumntypes = p\n"
        "[*m*]\nx = X\n", D)
    table = pa.table({"K": ["k"], "M": ["zz"]})
    with pytest.raises(GrammarError, match="map miss"):
        V2TripleGenerator(g2)(table)


def test_v2_sql_matches_engine():
    g = compile_v2_grammar(G, D)
    table = pa.table({
        "K": ["P 1", "P2"], "A": ["wid get", ""], "B": ["7", "8"],
        "C": ["note", ""], "P": ["owns", "likes"],
    })
    con = duckdb.connect()
    con.register("t", table)
    sql = v2_to_sql(g, "t", {s: f'"{c.source_column}"'
                             for s, c in g.columns.items()})
    got_sql = set(map(tuple, con.sql(sql).fetchall()))
    assert got_sql == _terms(table, g)
