"""Property-based parity: random v5 grammars × dirty cell values →
engine (vectorized batch fn) must equal the oracle (literal v5
transcription) exactly. This is the broadest net for rule-semantics
drift — roles, alterations, datatypes, multi-treatments, dirty chars,
empties all drawn at random."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from kgforge.oracle import OracleGrammar
from kgforge.rules import compile_grammar
from kgforge.stages.triples import TripleGenerator, triples_to_terms

DOMAIN = "https://fuzz.example.org/x/"

# cell alphabet: dirty chars from the sanitizer set + quotes/escapes +
# unicode + whitespace (NUL excluded: DuckDB/CSV-hostile, not
# representable in the reference's CSV inputs either)
CELL = st.text(
    alphabet=' ab-/\\(),"\'<>|{}^#$*.`+=%\t\né日',
    max_size=12,
)

TYPE_NAME = st.sampled_from(
    ["t1", "t x", "ty-pe", "string", "integer", "float", "date"])
COL_TYPE = st.sampled_from(["p1", "rel x", "has-thing"])


@st.composite
def grammars(draw):
    lists = {"*m*": {"aa": "Alpha A", "bb": "B(b)"}}
    n_cols = draw(st.integers(1, 4))
    sections = {}
    for i in range(n_cols):
        role = draw(st.sampled_from(
            ["subject", "object", "ignore",
             "object,map(all;*m*)", "subject,map(all;*m*)",
             "object,map(0:2;*m*)", "object,extract(1:3)",
             "object,extract(-3:)", "object,extract(-2:-1)",
             "object,prefix(px_)"]))
        ct = draw(TYPE_NAME)
        sections[f"C{i}X"] = (role, ct, draw(COL_TYPE))
    ini = ["[PK]", "cellrole = pkey", "celltype = pk_type", ""]
    for name, (role, ct, colt) in sections.items():
        ini += [f"[{name}]", f"cellrole = {role}", f"celltype = {ct}",
                f"columntype = {colt}", ""]
    # multi-treatment pair sharing one source column 'MT'
    mt1 = draw(st.sampled_from(["object", "object,extract(0:2)"]))
    mt2 = draw(st.sampled_from(["object,prefix(q_)", "subject"]))
    ini += ["[MT$1]", f"cellrole = {mt1}", "celltype = mt_a",
            "columntype = mta_of", "",
            "[MT$2]", f"cellrole = {mt2}", "celltype = integer",
            "columntype = mtb_of", ""]
    ini += ["[*m*]", "AA = Alpha A", "BB = B(b)", ""]
    return "\n".join(ini), ["PK"] + [n for n in sections] + ["MT"]


@given(grammars(), st.lists(st.tuples(CELL, CELL, CELL, CELL, CELL),
                            min_size=0, max_size=8))
@settings(max_examples=60, deadline=None)
def test_random_grammar_engine_equals_oracle(gram, rows):
    ini, cols = gram
    header = [c for c in cols]
    # pad/trim row tuples to header arity
    data = [list(r)[:len(header)] + [""] * max(0, len(header) - 5)
            for r in rows]
    # pkey cells must be non-degenerate enough to exercise rules; keep raw
    table = pa.table({h: pa.array([r[i] for r in data], type=pa.string())
                      for i, h in enumerate(header)})
    rs = compile_grammar(ini, DOMAIN)
    gen = TripleGenerator(rs)
    out = triples_to_terms(gen(table))
    got = set(zip((f"<{s}>" for s in out["s"].to_pylist()),
                  (f"<{p}>" for p in out["p"].to_pylist()),
                  out["o"].to_pylist()))
    og = OracleGrammar(ini, DOMAIN)
    want, _ = og.parse_rows(header, data)
    assert got == want, (sorted(got - want)[:3], sorted(want - got)[:3])
