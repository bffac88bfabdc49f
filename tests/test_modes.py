"""Default (grammar-less) mode M13, FORGET null-values M5, v3 chains."""

import duckdb
import pyarrow as pa

from kgforge.rules import compile_grammar, default_ruleset
from kgforge.stages.triples import TripleGenerator, triples_to_terms
from conftest import DOMAIN


def _terms(table, rs):
    t = TripleGenerator(rs)(table)
    out = triples_to_terms(t)
    return set(zip(out["s"].to_pylist(), out["p"].to_pylist(),
                   out["o"].to_pylist()))


def test_default_mode_plain_literals_and_type():
    # v1 default parser (csv2rdf/csv2rdf.py:90-132): type triple +
    # PLAIN (untyped) literals, no labels
    rs = default_ruleset(DOMAIN, ["id", "name"], "id", pkey_type="thing")
    got = _terms(pa.table({"id": ["r1"], "name": ["Alice"]}), rs)
    assert got == {
        (DOMAIN + "r1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         f"<{DOMAIN}thing>"),
        (DOMAIN + "r1", DOMAIN + "name", '"Alice"'),
    }


def test_ordinal_default_mode_matches_reference_semantics(ray_session,
                                                          tmp_path):
    """Opt-in `ordinal = True` conformance mode: subjects are minted
    from the LINE NUMBER exactly like the reference's default parser
    (csv2rdf/csv2rdf.py:109-121) — domain + prefix + i with i counting
    from 1 over data rows; every non-empty original cell a plain
    literal; one type triple per row."""
    from kgforge.pipelines.orchestrator import source_triples
    from kgforge.rules import SourceConfig
    (tmp_path / "t.csv").write_text(
        "id;name;note\nx1;Alice;\nx2;Bob;hello\n")
    src = SourceConfig(name="t", file="t.csv", domain=DOMAIN,
                       delimiter=";", semantics="", active=True,
                       prefix="r", type_="thing", ordinal=True)
    triples, _ = source_triples(src, str(tmp_path))
    out = triples_to_terms(pa.concat_tables(
        list(triples.iter_batches(batch_format="pyarrow"))))
    got = set(zip(out["s"].to_pylist(), out["p"].to_pylist(),
                  out["o"].to_pylist()))
    # inline transcription of default_csv_parser over the same rows
    rows = [["x1", "Alice", ""], ["x2", "Bob", "hello"]]
    preds = [DOMAIN + c for c in ("id", "name", "note")]
    want = set()
    for i, row in enumerate(rows, start=1):
        s = DOMAIN + f"r{i}"
        want.add((s, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                  f"<{DOMAIN}thing>"))
        for p, cell in zip(preds, row):
            if cell:
                want.add((s, p, f'"{cell}"'))
    assert got == want


def test_null_values_forget_filter():
    # M5 (csv2rdf/csv2rdf.py:142,241-243): FORGET values skipped like empties
    rs = default_ruleset(DOMAIN, ["id", "v"], "id", pkey_type="t",
                         null_values=frozenset({"NONE", "-"}))
    got = _terms(pa.table({"id": ["a", "b", "c"],
                           "v": ["NONE", "-", "keep"]}), rs)
    v_triples = {g for g in got if "/v" in g[1]}
    assert v_triples == {(DOMAIN + "c", DOMAIN + "v", '"keep"')}


CHAIN_GRAMMAR = """
[K]
cellrole = pkey
celltype = part

[C]
cellrole = object
celltype = t1,t2,t3
columntype = p1,p2
"""


def test_v3_type_chains():
    rs = compile_grammar(CHAIN_GRAMMAR, DOMAIN, type_chains=True)
    r = rs.rules["C"]
    assert r.celltype == "t1" and r.columntype == "p1"
    got = _terms(pa.table({"K": ["k1"], "C": ["v1"]}), rs)
    rdf_t = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    # chain triples (raw, unsanitized — csv2rdf-v3.py:266-268)
    for t in ("t1", "t2", "t3"):
        assert (DOMAIN + t, rdf_t, f"<{rdfs}Class>") in got
    rdf_ns = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    for p in ("p1", "p2"):
        assert (DOMAIN + p, rdf_t, f"<{rdf_ns}Property>") in got
    assert (DOMAIN + "t1", rdfs + "subClassOf", f"<{DOMAIN}t2>") in got
    assert (DOMAIN + "t2", rdfs + "subClassOf", f"<{DOMAIN}t3>") in got
    assert (DOMAIN + "p1", rdfs + "subPropertyOf", f"<{DOMAIN}p2>") in got
    # v5-parity default: no chains, commas sanitized
    rs5 = compile_grammar(CHAIN_GRAMMAR, DOMAIN)
    got5 = _terms(pa.table({"K": ["k1"], "C": ["v1"]}), rs5)
    assert (DOMAIN + "t1", rdf_t, f"<{rdfs}Class>") not in got5
    assert any("t1_t2_t3" in g[0] for g in got5)


def test_v3_chain_sql_matches_engine():
    from kgforge.sqlgen import ruleset_to_sql
    rs = compile_grammar(CHAIN_GRAMMAR, DOMAIN, type_chains=True)
    table = pa.table({"K": ["k1", "k2"], "C": ["v1", ""]})
    con = duckdb.connect()
    con.register("t", table)
    sql = ruleset_to_sql(rs, "t", {"K": '"K"', "C": '"C"'})
    got_sql = {(f"{s}", f"{p}", o) for s, p, o in con.sql(sql).fetchall()}
    got_eng = {(s, p, o) for s, p, o in _terms(table, rs)}
    assert got_sql == got_eng
