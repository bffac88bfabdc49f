"""v1 legacy grammar quirks — positional binding, A_ interposition,
FORGET, directions, space-split with empty tokens."""

import pyarrow as pa

from kgforge.functions.v1grammar import (V1TripleGenerator,
                                         compile_v1_grammar,
                                         v1_format_predicate, v1_to_sql)
from kgforge.stages.triples import triples_to_terms

D = "https://v1.example.org/"

GRAMMAR = """col one,subject1|part
col-two,subject2|supplier|S
c3,subject2|place|R|located at
c4,literal
c5,ignore
"""


def _terms(table, g):
    out = triples_to_terms(V1TripleGenerator(g)(table))
    return set(zip(out["s"].to_pylist(), out["p"].to_pylist(),
                   out["o"].to_pylist()))


def test_v1_quirks():
    g = compile_v1_grammar(GRAMMAR, D)
    table = pa.table({
        "a": ["P 1"],          # subject1 value with a space — NOT sanitized
        "b": ["S1 S2"],        # space-split: two supplier entities
        "c": ["NONE"],         # FORGET → skipped
        "d": ["desc-x"],       # literal, plain
        "e": ["junk"],         # ignore
    })
    got = _terms(table, g)
    rdf_t = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    # 'A_' interposition + raw (unsanitized) subject value incl. the space
    assert (D + "A_P 1", rdf_t, f"<{D}A_part>") in got
    # subject2 S-direction: (subj, A_<sanitized colname>, tok);
    # v1 sanitizer is only [' ', '-'] → 'col-two' → 'col_two'
    assert (D + "A_P 1", D + "A_" + v1_format_predicate("col-two"),
            f"<{D}A_S1>") in got
    assert (D + "A_S2", rdf_t, f"<{D}A_supplier>") in got
    # FORGET value: no triples for column c
    assert not any("place" in o for (_, _, o) in got)
    # literal: RAW column name in predicate ('c4')
    assert (D + "A_P 1", D + "A_c4", '"desc-x"') in got


def test_v1_direction_r_and_explicit_name():
    g = compile_v1_grammar(GRAMMAR, D)
    table = pa.table({
        "a": ["K"], "b": ["-"], "c": ["Paris"], "d": [""], "e": [""],
    })
    got = _terms(table, g)
    # R direction + explicit (RAW, unsanitized) predicate name
    assert (D + "A_Paris", D + "A_located at", f"<{D}A_K>") in got


def test_v1_empty_tokens_kept():
    # v1 splits on ' ' without dropping empties (csv2rdf.py:255-268):
    # 'a  b' yields an empty token minted as A_
    g = compile_v1_grammar(GRAMMAR, D)
    table = pa.table({
        "a": ["K"], "b": ["a  b"], "c": ["-"], "d": ["-"], "e": [""],
    })
    got = _terms(table, g)
    rdf_t = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert (D + "A_", rdf_t, f"<{D}A_supplier>") in got


def test_v1_sql_matches_engine():
    import duckdb
    g = compile_v1_grammar(GRAMMAR, D)
    table = pa.table({
        "a": ["P1", "P2"], "b": ["S1 S2", "NONE"], "c": ["X", "-"],
        "d": ["lit1", ""], "e": ["", ""],
    })
    con = duckdb.connect()
    con.register("t", table)
    sql = v1_to_sql(g, "t", ['"a"', '"b"', '"c"', '"d"', '"e"'])
    got_sql = set(map(tuple, con.sql(sql).fetchall()))
    assert got_sql == _terms(table, g)
