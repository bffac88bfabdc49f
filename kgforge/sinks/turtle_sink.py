"""Turtle serialization with prefix compaction — reference-artifact
parity for the rdflib Turtle writer (csv2rdf-v5/csv2rdf-v5.py:158-163,
``Graph.serialize(format='turtle')``).

Shape: the columnar triple Dataset is globally sorted (range shuffle) by
(s, p, o_kind, o_lex, o_dt), then each block serializes independently to
one ``.ttl`` shard with its own ``@prefix`` header — every shard is a
valid standalone Turtle document, and concatenating shards in filename
order yields the whole graph with subjects grouped (``;`` predicate
lists, ``,`` object lists, ``a`` for rdf:type). A subject whose sorted
run crosses a block boundary is re-opened in the next shard — allowed by
Turtle, identical triple set.

``parse_turtle`` is the matching minimal reader (exactly the subset this
emitter produces) used by the round-trip tests to prove emitted Turtle ≡
the golden N-Triples set.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.datasource import BlockBasedFileDatasink

from ..ntriples import (
    OWL_NS,
    RDF_NS,
    RDF_TYPE,
    RDFS_NS,
    XSD_NS,
    escape_literal,
)
from .ntriples_sink import _SortableNames

STANDARD_PREFIXES = {
    "rdf": RDF_NS,
    "rdfs": RDFS_NS,
    "xsd": XSD_NS,
    "owl": OWL_NS,
}

# conservative PN_LOCAL subset: anything outside falls back to <iri>
_PN_LOCAL_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_\-]*\Z")

# IRIREF forbids control chars, space and <>"{}|^`\ — \uXXXX-escape them
# (Turtle UCHAR), matching what rdflib's serializer does
_IRI_BAD_RE = re.compile(r'[\x00-\x20<>"{}|^`\\]')


def _iriref(iri: str) -> str:
    return "<" + _IRI_BAD_RE.sub(
        lambda m: "\\u%04X" % ord(m.group()), iri) + ">"


def _iri_unescape(iri: str) -> str:
    return re.sub(r"\\u([0-9A-Fa-f]{4})",
                  lambda m: chr(int(m.group(1), 16)), iri)


def make_prefixes(domain: str | None = None,
                  extra: dict[str, str] | None = None) -> dict[str, str]:
    p = dict(STANDARD_PREFIXES)
    if domain:
        p["kg"] = domain
    if extra:
        p.update(extra)
    return p


def _compactor(prefixes: dict[str, str]):
    # longest namespace wins (kg: domain usually nests under https://)
    order = sorted(prefixes.items(), key=lambda kv: -len(kv[1]))

    def qname(iri: str) -> str:
        for pfx, ns in order:
            if iri.startswith(ns):
                local = iri[len(ns):]
                if _PN_LOCAL_RE.match(local):
                    return f"{pfx}:{local}"
        return _iriref(iri)

    return qname


def prefix_header(prefixes: dict[str, str]) -> str:
    return "".join(f"@prefix {p}: <{ns}> .\n"
                   for p, ns in sorted(prefixes.items())) + "\n"


def turtle_block(t: pa.Table, prefixes: dict[str, str],
                 header: bool = True) -> str:
    """Serialize one (sorted) columnar TRIPLE_SCHEMA block to Turtle.
    QNames are computed once per UNIQUE IRI (dictionary encode); the
    assembly loop is per row, which is fine for a write sink (I/O
    bound, one call per output shard)."""
    qn = _compactor(prefixes)

    def compact_col(col: pa.ChunkedArray) -> list[str]:
        enc = pc.dictionary_encode(col.combine_chunks().cast(pa.string()))
        uniq = [qn(u) if u is not None else None
                for u in enc.dictionary.to_pylist()]
        return [uniq[i] if i is not None else None
                for i in enc.indices.to_pylist()]

    s_q = compact_col(t["s"])
    p_raw = t["p"].to_pylist()
    p_q = compact_col(t["p"])
    o_kind = t["o_kind"].to_pylist()
    o_lex = t["o_lex"].to_pylist()
    o_dt = t["o_dt"].to_pylist()

    out: list[str] = [prefix_header(prefixes)] if header else []
    prev_s = prev_p = None
    for i in range(t.num_rows):
        pred = "a" if p_raw[i] == RDF_TYPE else p_q[i]
        if o_kind[i] == "u":
            obj = qn(o_lex[i])
        else:
            obj = '"' + escape_literal(o_lex[i]) + '"'
            if o_dt[i]:
                obj += "^^" + qn(o_dt[i])
        if s_q[i] != prev_s:
            if prev_s is not None:
                out.append(" .\n")
            out.append(f"{s_q[i]} {pred} {obj}")
            prev_s, prev_p = s_q[i], pred
        elif pred != prev_p:
            out.append(f" ;\n    {pred} {obj}")
            prev_p = pred
        else:
            out.append(f" ,\n        {obj}")
    if prev_s is not None:
        out.append(" .\n")
    return "".join(out)


class TurtleDatasink(BlockBasedFileDatasink):
    """One valid Turtle document per sorted block."""

    def __init__(self, path: str, prefixes: dict[str, str], **kwargs):
        kwargs.setdefault("filename_provider", _SortableNames("ttl"))
        super().__init__(path, file_format="ttl", **kwargs)
        self.prefixes = prefixes

    def write_block_to_file(self, block, file) -> None:
        t = block.to_arrow() if hasattr(block, "to_arrow") else block
        file.write(turtle_block(t, self.prefixes).encode("utf-8"))


def write_graph_turtle(triples: "ray.data.Dataset", out_dir: str,
                       domain: str | None = None,
                       extra_prefixes: dict[str, str] | None = None) -> None:
    """Columnar triples -> ``out_dir/graph.ttl/`` sorted Turtle shards."""
    prefixes = make_prefixes(domain, extra_prefixes)
    srt = triples.sort(["s", "p", "o_kind", "o_lex", "o_dt"])
    srt.write_datasink(TurtleDatasink(f"{out_dir}/graph.ttl", prefixes))


# ------------------------------------------------------------ round-trip
_TOKEN_RE = re.compile(
    r'<[^>]*>'                       # IRI
    r'|"(?:[^"\\]|\\.)*"(?:\^\^(?:<[^>]*>|[A-Za-z_][\w\-]*:[A-Za-z_][\w\-]*))?'
    r'|[A-Za-z_][\w\-]*:[A-Za-z_][\w\-]*'   # qname
    r'|\ba\b|[;,.]')


def parse_turtle(text: str) -> set[tuple[str, str, str]]:
    """Minimal reader for the subset ``turtle_block`` emits. Returns
    (s_iri, p_iri, o_term) with o_term in N-Triples rendering — directly
    comparable against golden ``.nt`` lines."""
    prefixes: dict[str, str] = {}
    triples: set[tuple[str, str, str]] = set()
    statements = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        m = re.match(r"@prefix\s+([\w\-]*):\s*<([^>]*)>\s*\.", line)
        if m:
            prefixes[m.group(1)] = m.group(2)
            continue
        statements.append(line)

    def expand(tok: str) -> str:
        if tok.startswith("<"):
            return _iri_unescape(tok[1:-1])
        if tok == "a":
            return RDF_TYPE
        pfx, local = tok.split(":", 1)
        return prefixes[pfx] + local

    def obj_term(tok: str) -> str:
        if tok.startswith('"'):
            if "^^" in tok:
                lex, dt = tok.rsplit("^^", 1)
                return f"{lex}^^<{expand(dt)}>"
            return tok
        return f"<{expand(tok)}>"

    toks = _TOKEN_RE.findall(" ".join(statements))
    s = p = None
    i = 0
    while i < len(toks):
        if s is None:
            s, p, o = toks[i], toks[i + 1], toks[i + 2]
            i += 3
        elif p is None:
            p, o = toks[i], toks[i + 1]
            i += 2
        else:
            o = toks[i]
            i += 1
        triples.add((expand(s), expand(p), obj_term(o)))
        sep = toks[i]
        i += 1
        if sep == ".":
            s = p = None
        elif sep == ";":
            p = None
        elif sep != ",":
            raise ValueError(f"unexpected separator {sep!r}")
    return triples
