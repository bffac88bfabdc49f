"""v4 dialect (csv2rdf-v4/csv2rdf-v4.py): STRANGE map fallback,
prepend-prefix, sanitize-first cells, v3-style chains, domain/range."""

import duckdb
import pyarrow as pa
import pytest

from kgforge.functions.v4grammar import (V4TripleGenerator,
                                         compile_v4_grammar,
                                         v4_apply_alteration,
                                         v4_format_predicate, v4_to_sql)
from kgforge.rules import GrammarError, parse_alteration

DOM = "https://ex.org/"


def test_v4_sanitizer_charset():
    # v2's 8 chars + backslash <>|{}^ (csv2rdf-v4.py:209-216)
    assert v4_format_predicate(' -/\\(),"\'<>|{}^x.#$') == "_" * 15 + "x.#$"


def test_v4_map_all_fallback_keeps_case():
    alt = parse_alteration("object,map(all;*m*)", {"*m*": {"hit": "H"}})
    out = v4_apply_alteration(
        alt, pa.array(["HIT", "Miss_Case", "\t"])).to_pylist()
    # hit -> mapped; miss -> ORIGINAL (not lowered); whitespace -> STRANGE
    assert out == ["H", "Miss_Case", "STRANGE"]


def test_v4_map_part_fallback_keeps_lowered_slice():
    alt = parse_alteration("object,map(0:3;*m*)", {"*m*": {"abc": "X"}})
    out = v4_apply_alteration(
        alt, pa.array(["ABCDEF", "ZZZZ", "ab"])).to_pylist()
    # miss keeps the LOWERED SLICE (csv2rdf-v4.py:380-384)
    assert out == ["X", "zzz", "ab"]


def test_v4_map_part_blank_slice_is_strange():
    alt = parse_alteration("object,map(5:8;*m*)", {"*m*": {"my": "X"}})
    out = v4_apply_alteration(
        alt, pa.array(["ECONOMY", "PROMO", "SMALL"])).to_pylist()
    assert out == ["X", "STRANGE", "STRANGE"]


def test_v4_prefix_prepends():
    alt = parse_alteration("object,prefix(p_)", {})
    assert v4_apply_alteration(alt, pa.array(["x"])).to_pylist() == ["p_x"]


def test_v4_predicate_role_rejected():
    with pytest.raises(GrammarError):
        compile_v4_grammar("""
[a]
cell = pkey
celltypes = t

[b]
cell = predicate
celltypes = x
columntypes = y
""", DOM)


def test_v4_unknown_role_is_type_only():
    """Non-predicate unknown roles compile and emit ONLY the step-1
    cell-typing triple (csv2rdf-v4.py:411 runs before the role
    dispatch :417-434, which matches nothing and falls through)."""
    g = compile_v4_grammar("""
[a]
cell = pkey
celltypes = t

[b]
cell = sideways
celltypes = x
columntypes = y
""", DOM)
    rows = pa.table({"a": pa.array(["k1"]), "b": pa.array(["v1"])})
    out = V4TripleGenerator(g)(rows)
    b_trips = [(s, p, l) for s, p, l in zip(
        out["s"].to_pylist(), out["p"].to_pylist(), out["o_lex"].to_pylist())
        if f"{DOM}v1" in (s, l)]
    assert b_trips == [(f"{DOM}v1",
                        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                        f"{DOM}x")]
    # no domain/range, no columntype chain for the unknown-role column
    assert not any(f"{DOM}y" in (s, l) for s, _, l in zip(
        out["s"].to_pylist(), out["p"].to_pylist(), out["o_lex"].to_pylist()))
    # SQL mirror agrees
    con = duckdb.connect()
    con.register("t", rows)
    sql = v4_to_sql(g, "t", {sec: c.source_column
                             for sec, c in g.columns.items()})
    odf = con.sql(sql).df()
    assert f"{DOM}v1" in set(odf["s"])
    assert f"{DOM}y" not in set(odf["p"])
    assert not any(f"{DOM}y" in o for o in set(odf["o"]))


GRAMMAR = """
[name]
cell = pkey
celltypes = part,item

[kind]
cell = object,map(5:8;*codes*)
celltypes = code,concept
columntypes = coded_as,relation

[brand]
cell = subject,prefix(br )
celltypes = brand
columntypes = branded

[note]
cell = object
celltypes = string

[*codes*]
my = econ
"""


def _rows():
    return pa.table({
        "name": pa.array(["widget one", "bolt"]),
        "kind": pa.array(["ECONOMY", "PROMO"]),
        "brand": pa.array(["Acme&Co", ""]),
        "note": pa.array(["a (note)", "plain"]),
    })


def test_v4_engine_matches_sql_mirror():
    g = compile_v4_grammar(GRAMMAR, DOM)
    from kgforge.stages.triples import triples_to_terms
    terms = triples_to_terms(V4TripleGenerator(g)(_rows())).to_pandas()
    terms = terms.drop_duplicates()
    con = duckdb.connect()
    con.register("t", _rows())
    sql = v4_to_sql(g, "t", {sec: c.source_column
                             for sec, c in g.columns.items()})
    odf = con.sql(sql).df()
    a = set(map(tuple, terms[["s", "p", "o"]].itertuples(index=False)))
    b = set(map(tuple, odf[["s", "p", "o"]].itertuples(index=False)))
    assert a == b, (sorted(a - b)[:3], sorted(b - a)[:3])
    # spot semantics: sanitize-first pkey; STRANGE cell typed; prepended
    # prefix is sanitized at mint ('br ' -> 'br_'); chains + domain/range
    assert (f"{DOM}widget_one",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            f"<{DOM}part>") in a
    assert any(s == f"{DOM}STRANGE" for s, _, _ in a)
    assert any(s.startswith(f"{DOM}br_Acme&Co") for s, _, _ in a)
    assert (f"{DOM}part",
            "http://www.w3.org/2000/01/rdf-schema#subClassOf",
            f"<{DOM}item>") in a
    # object role: domain = pkeytype, range = celltype (:423-425)
    assert (f"{DOM}coded_as",
            "http://www.w3.org/2000/01/rdf-schema#domain",
            f"<{DOM}part>") in a
    assert (f"{DOM}coded_as",
            "http://www.w3.org/2000/01/rdf-schema#range",
            f"<{DOM}code>") in a
    # descr: rdfs:comment with SANITIZED literal
    assert (f"{DOM}widget_one",
            "http://www.w3.org/2000/01/rdf-schema#comment",
            '"a__note_"') in a
