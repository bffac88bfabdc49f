"""SQL oracle generator tests — 3-way consistency (SQL vs oracle) and
Python-slice parity of slice_sql."""

import duckdb
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from kgforge.oracle import OracleGrammar
from kgforge.rules import compile_grammar
from kgforge.sqlgen import ruleset_to_sql, slice_sql, sanitize_sql, sql_quote
from kgforge.rules import format_uri
from conftest import DOMAIN


# NUL excluded: DuckDB VARCHAR cannot hold \x00 (and it can't be embedded
# in a SQL literal); real data reaches SQL via registered Arrow tables.
@given(st.text(alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
               max_size=20),
       st.integers(-8, 8), st.integers(-8, 8))
@settings(max_examples=150, deadline=None)
def test_slice_sql_matches_python(s, lo, hi):
    con = duckdb.connect()
    got = con.sql(f"SELECT {slice_sql(sql_quote(s), lo, hi)}").fetchone()[0]
    want = s[lo:hi] if hi != 0 else ""
    assert (got or "") == want, (s, lo, hi, got, want)


@given(st.text(alphabet=st.characters(codec="utf-8", exclude_characters="\x00"),
               max_size=40))
@settings(max_examples=100, deadline=None)
def test_sanitize_sql_matches_python(s):
    con = duckdb.connect()
    got = con.sql(f"SELECT {sanitize_sql(sql_quote(s))}").fetchone()[0]
    assert (got or "") == format_uri(s)


def test_sql_matches_oracle_on_catalog(catalog, grammar_path):
    header, rows = catalog
    cols = list(zip(*rows))
    table = pa.table({h: pa.array(list(c), type=pa.string())
                      for h, c in zip(header, cols)})
    con = duckdb.connect()
    con.register("catalog", table)
    rs = compile_grammar(grammar_path, DOMAIN)
    colmap = {sec: f'"{rule.source_column}"' for sec, rule in rs.rules.items()}
    sql = ruleset_to_sql(rs, "catalog", colmap)
    got = {(f"<{s}>", f"<{p}>", o) for s, p, o in con.sql(sql).fetchall()}
    og = OracleGrammar(grammar_path, DOMAIN)
    want, _ = og.parse_rows(header, rows)
    assert got == want, (
        f"sql-only={sorted(got - want)[:5]} oracle-only={sorted(want - got)[:5]}")
