"""Fuzz the v1/v2 dialect mirrors: random dirty cell values through a
fixed grammar — engine batch fn must equal the generated DuckDB SQL."""

import duckdb
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from kgforge.functions.v1grammar import (V1TripleGenerator,
                                         compile_v1_grammar, v1_to_sql)
from kgforge.functions.v2grammar import (V2TripleGenerator,
                                         compile_v2_grammar, v2_to_sql)
from kgforge.stages.triples import triples_to_terms

D = "https://fz.example.org/"

# no NUL (DuckDB) — otherwise dirty: sanitizer chars, quotes, spaces,
# unicode, FORGET values land via sampled_from
CELL = st.one_of(
    st.text(alphabet=' ab-/(),"\'<>|.#xé ', max_size=10),
    st.sampled_from(["NONE", "-", "", "a b", "S1 S2 S3", "  "]),
)

V1G = """k,subject1|thing
m,subject2|member|S
r,subject2|place|R|at
l,literal
"""

V2G = """
[K]
cell = pkey
celltypes = thing,RDFS:RESOURCE

[A]
cell = subject
column = predicate
celltypes = widget
columntypes = has_widget

[C]
cell = object
celltypes = string
column = predicate
columntypes = unused
"""


def _eng_terms(gen, table):
    out = triples_to_terms(gen(table))
    return set(zip(out["s"].to_pylist(), out["p"].to_pylist(),
                   out["o"].to_pylist()))


@given(st.lists(st.tuples(CELL, CELL, CELL, CELL), min_size=0, max_size=6))
@settings(max_examples=40, deadline=None)
def test_v1_fuzz_engine_equals_sql(rows):
    g = compile_v1_grammar(V1G, D)
    table = pa.table({c: pa.array([r[i] for r in rows], type=pa.string())
                      for i, c in enumerate("kmrl")})
    con = duckdb.connect()
    con.register("t", table)
    sql = v1_to_sql(g, "t", ['"k"', '"m"', '"r"', '"l"'])
    got_sql = set(map(tuple, con.sql(sql).fetchall()))
    assert got_sql == _eng_terms(V1TripleGenerator(g), table)


@given(st.lists(st.tuples(CELL, CELL, CELL), min_size=0, max_size=6))
@settings(max_examples=40, deadline=None)
def test_v2_fuzz_engine_equals_sql(rows):
    g = compile_v2_grammar(V2G, D)
    table = pa.table({c: pa.array([r[i] for r in rows], type=pa.string())
                      for i, c in enumerate("KAC")})
    con = duckdb.connect()
    con.register("t", table)
    sql = v2_to_sql(g, "t", {s: f'"{c.source_column}"'
                             for s, c in g.columns.items()})
    got_sql = set(map(tuple, con.sql(sql).fetchall()))
    assert got_sql == _eng_terms(V2TripleGenerator(g), table)


V4G = """
[K]
cell = pkey
celltypes = thing,item

[A]
cell = subject,map(all;*m*)
celltypes = widget,cls
columntypes = has_widget,rel

[B]
cell = object,map(1:3;*m*)
celltypes = code
columntypes = coded,rel

[C]
cell = object,prefix(px )
celltypes = pref
columntypes = prefixed

[L]
cell = object
celltypes = string

[*m*]
hit = MAP VAL
ab = Wide(Val)
"""


@given(st.lists(st.tuples(CELL, CELL, CELL, CELL, CELL),
                min_size=0, max_size=6))
@settings(max_examples=40, deadline=None)
def test_v4_fuzz_engine_equals_sql(rows):
    from kgforge.functions.v4grammar import (V4TripleGenerator,
                                             compile_v4_grammar, v4_to_sql)
    g = compile_v4_grammar(V4G, D)
    table = pa.table({c: pa.array([r[i] for r in rows], type=pa.string())
                      for i, c in enumerate("KABCL")})
    con = duckdb.connect()
    con.register("t", table)
    sql = v4_to_sql(g, "t", {s: f'"{c.source_column}"'
                             for s, c in g.columns.items()})
    got_sql = set(map(tuple, con.sql(sql).fetchall()))
    assert got_sql == _eng_terms(V4TripleGenerator(g), table)
