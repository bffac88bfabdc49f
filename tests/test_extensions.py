"""User-extension surface (SURVEY §2.8): alteration-command registry,
pluggable cell splitter, output-format registry — the three TODOs the
reference's author left open (csv2rdf-v4/README.md:174-176,
csv2rdf/csv2rdf.py:254, csv2rdf-v5.py:148)."""

import csv
import glob
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from kgforge import rules as R
from kgforge.stages.triples import apply_alteration

DOMAIN = "http://example.test/"


@pytest.fixture()
def rot13_command():
    import codecs

    @R.register_alteration("rot13")
    def _rot13(argstr, lists):
        return R.Alteration(
            mode=R.ALTER_CUSTOM,
            scalar_fn=lambda c: codecs.encode(c, "rot13"))

    yield "rot13"
    R.ALTERATION_COMMANDS.pop("rot13", None)


def test_registered_alteration_scalar_and_vector(rot13_command):
    alt = R.parse_alteration("object,rot13()", {})
    assert alt.apply("Hello") == "Uryyb"
    # engine path without a vector_fn: per-unique dictionary fallback
    arr = pa.array(["abc", "abc", "nop"], pa.string())
    assert apply_alteration(alt, arr).to_pylist() == ["nop", "nop", "abc"]


def test_registered_alteration_vector_fn_takes_precedence():
    alt = R.Alteration(
        mode=R.ALTER_CUSTOM,
        scalar_fn=lambda c: c.upper(),
        vector_fn=lambda arr: pc.utf8_upper(arr))
    out = apply_alteration(alt, pa.array(["ab", "cd"]))
    assert out.to_pylist() == ["AB", "CD"]
    assert alt.apply("ab") == "AB"   # scalar path agrees


def test_unknown_command_still_raises(rot13_command):
    with pytest.raises(R.GrammarError):
        R.parse_alteration("object,nonsense(1)", {})


def camel_split(cell: str) -> list[str]:
    out, cur = [], ""
    for ch in cell:
        if ch.isupper() and cur:
            out.append(cur)
            cur = ch
        else:
            cur += ch
    if cur:
        out.append(cur)
    return out


def test_custom_splitter_engine_matches_scalar(ray_session):
    """MultiValueRule with splitter_fn: the per-unique engine expansion
    emits exactly the scalar tokens()."""
    from kgforge.stages.triples import TripleGenerator

    pkey = R.PKeyRule(DOMAIN, "id", "pkey", "ROW", "")
    mv = R.MultiValueRule(DOMAIN, "tags", "object", "TAG", "HAS_TAG",
                          splitter_fn=camel_split)
    rs = R.RuleSet(domain=DOMAIN, rules={"id": pkey, "tags": mv},
                   lists={}, pkey=pkey)
    t = pa.table({"id": ["r1", "r2"],
                  "tags": ["BigData", "SmallFastData"]})
    got = TripleGenerator(rs)(t)
    from kgforge.rules import KIND_LIT
    labels = set(
        got.filter(pc.equal(got["o_kind"], KIND_LIT))["o_lex"].to_pylist())
    toks = {tok for cell in ("BigData", "SmallFastData")
            for tok in camel_split(cell)}
    assert labels >= toks
    assert mv.tokens("SmallFastData") == ["Small", "Fast", "Data"]
    # separator fast path untouched when splitter_fn is None
    mv2 = R.MultiValueRule(DOMAIN, "tags", "object", "TAG", "HAS_TAG")
    assert mv2.tokens("a b  c") == ["a", "b", "c"]


def test_sink_format_registry(ray_session, tmp_path, grammar_path):
    """A registered TSV sink selected via run_sources(formats=...)
    writes the same triples as the built-in nt sink."""
    from kgforge.pipelines.orchestrator import run_sources
    from kgforge.sinks import register_sink_format, sink_format
    from tests.conftest import catalog_rows

    def write_tsv(triples, out_dir, domain):
        from kgforge.pipelines.webkg import triples_to_terms
        rows = (triples.map_batches(triples_to_terms,
                                    batch_format="pyarrow").take_all())
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "graph.tsv"), "w") as f:
            for r in sorted((r["s"], r["p"], r["o"]) for r in rows):
                f.write("\t".join(r) + "\n")

    register_sink_format("tsv", write_tsv)
    try:
        assert sink_format("tsv") is write_tsv
        assert sink_format("nt") and sink_format("ttl")
        with pytest.raises(KeyError):
            sink_format("no-such-format")

        header, rows = catalog_rows(40)
        with open(tmp_path / "cat.csv", "w", newline="") as f:
            w = csv.writer(f, delimiter=";")
            w.writerow(header)
            w.writerows(rows)
        shutil.copy(grammar_path, tmp_path / "grammar.ini")
        (tmp_path / "conf.ini").write_text(
            "[catalog]\nfile = cat.csv\n"
            f"domain = {DOMAIN}\ndelimiter = ;\n"
            "semantics = grammar.ini\nactive = True\n")
        out = run_sources(str(tmp_path / "conf.ini"),
                          str(tmp_path / "out"), formats=("tsv", "nt"))
        tsv = open(os.path.join(out[0], "graph.tsv")).read().splitlines()
        nt_lines = []
        for p in sorted(glob.glob(os.path.join(out[0], "graph.nt", "*"))):
            nt_lines += open(p).read().splitlines()
        assert len(tsv) > 100 and len(nt_lines) == len(tsv)
    finally:
        from kgforge import sinks as S
        S._FORMATS.pop("tsv", None)
