"""RDF/XML serialization — the reference's open TODO "Add more output
formats" (csv2rdf-v5/csv2rdf-v5.py:148) through the sink registry,
alongside Turtle and JSON-LD.

Shape mirrors the JSON-LD sink: the columnar triple Dataset is
globally sorted by (s, p, o_kind, o_lex, o_dt), then each block
serializes independently to one standalone ``.rdf`` document — one
``<rdf:Description rdf:about=...>`` element per subject run, property
elements in QName form (namespace split at the last ``#``/``/``),
``rdf:resource`` for IRI objects, ``rdf:datatype`` for typed literals.
A subject crossing a block boundary re-opens in the next shard —
RDF/XML node elements merge by subject, identical triple set.

``parse_rdfxml`` is the matching ElementTree-based reader used by the
round-trip tests and the distributed bulk loader
(sources/rdfsource.read_rdfxml).

RDF/XML constraint (inherent to the format, not this engine): a
predicate IRI must split into namespace + XML-NCName local part —
an IRI ending in a non-NCName character cannot be serialized and
raises a clear error instead of emitting invalid XML.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data
from ray.data.datasource import BlockBasedFileDatasink

from .ntriples_sink import _SortableNames
from .turtle_sink import make_prefixes

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

_NCNAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_.\-]*\Z")


def _split_pred(iri: str) -> tuple[str, str]:
    """Predicate IRI -> (namespace, NCName local part), split at the
    last ``#`` or ``/``. Raises when no valid split exists (an RDF/XML
    format limit — Turtle/N-Triples/JSON-LD carry such IRIs fine)."""
    cut = max(iri.rfind("#"), iri.rfind("/"))
    local = iri[cut + 1:]
    if cut < 0 or not _NCNAME_RE.match(local):
        raise ValueError(
            f"predicate {iri!r} has no XML-QName split; RDF/XML "
            "cannot serialize it (use nt/ttl/jsonld)")
    return iri[:cut + 1], local


def _xesc(s: str, attr: bool = False) -> str:
    s = (s.replace("&", "&amp;").replace("<", "&lt;")
         .replace(">", "&gt;"))
    if attr:
        s = s.replace('"', "&quot;")
    return s


def rdfxml_block(t: pa.Table, prefixes: dict[str, str]) -> str:
    """Serialize one (sorted) columnar TRIPLE_SCHEMA block to a
    standalone RDF/XML document. Known namespaces reuse the shared
    prefix table; others get deterministic ``n1..nK`` prefixes in
    first-seen (sorted-block) order."""
    by_ns = {v: k for k, v in sorted(prefixes.items(), reverse=True)}
    by_ns[RDF_NS] = "rdf"
    ns_used: dict[str, str] = {}

    def pfx(ns: str) -> str:
        if ns not in ns_used:
            ns_used[ns] = by_ns.get(ns, f"n{len(ns_used) + 1}")
        return ns_used[ns]

    body: list[str] = []
    prev_s = None
    s_col = t["s"].to_pylist()
    p_col = t["p"].to_pylist()
    o_kind = t["o_kind"].to_pylist()
    o_lex = t["o_lex"].to_pylist()
    o_dt = t["o_dt"].to_pylist()
    for i in range(t.num_rows):
        if s_col[i] != prev_s:
            if prev_s is not None:
                body.append("  </rdf:Description>")
            s = s_col[i]
            anchor = (f'rdf:nodeID="{_xesc(s[2:], attr=True)}"'
                      if s.startswith("_:")
                      else f'rdf:about="{_xesc(s, attr=True)}"')
            body.append(f"  <rdf:Description {anchor}>")
            prev_s = s
        ns, local = _split_pred(p_col[i])
        qn = f"{pfx(ns)}:{local}"
        if o_kind[i] == "u":
            o = o_lex[i]
            attr = (f'rdf:nodeID="{_xesc(o[2:], attr=True)}"'
                    if o.startswith("_:")
                    else f'rdf:resource="{_xesc(o, attr=True)}"')
            body.append(f"    <{qn} {attr}/>")
        elif o_dt[i]:
            body.append(
                f'    <{qn} rdf:datatype="{_xesc(o_dt[i], attr=True)}">'
                f"{_xesc(o_lex[i])}</{qn}>")
        else:
            body.append(f"    <{qn}>{_xesc(o_lex[i])}</{qn}>")
    if prev_s is not None:
        body.append("  </rdf:Description>")
    decls = [f'xmlns:rdf="{RDF_NS}"']
    decls += [f'xmlns:{p}="{_xesc(ns, attr=True)}"'
              for ns, p in sorted(ns_used.items(), key=lambda kv: kv[1])
              if p != "rdf"]
    head = "<rdf:RDF " + "\n         ".join(decls) + ">"
    return "\n".join(['<?xml version="1.0" encoding="UTF-8"?>',
                      head, *body, "</rdf:RDF>", ""])


class RdfXmlDatasink(BlockBasedFileDatasink):
    """One standalone RDF/XML document per sorted block."""

    def __init__(self, path: str, prefixes: dict[str, str], **kwargs):
        kwargs.setdefault("filename_provider", _SortableNames("rdf"))
        super().__init__(path, file_format="rdf", **kwargs)
        self.prefixes = prefixes

    def write_block_to_file(self, block, file) -> None:
        t = block.to_arrow() if hasattr(block, "to_arrow") else block
        file.write(rdfxml_block(t, self.prefixes).encode("utf-8"))


def write_graph_rdfxml(triples: "ray.data.Dataset", out_dir: str,
                       domain: str | None = None,
                       extra_prefixes: dict[str, str] | None = None
                       ) -> None:
    """Columnar triples -> ``out_dir/graph.rdf/`` sorted shards."""
    prefixes = make_prefixes(domain, extra_prefixes)
    srt = triples.sort(["s", "p", "o_kind", "o_lex", "o_dt"])
    srt.write_datasink(RdfXmlDatasink(f"{out_dir}/graph.rdf", prefixes))


# ------------------------------------------------------------ round-trip

def parse_rdfxml(text: str) -> set[tuple[str, str, str]]:
    """Reader for the emitter's subset (``rdf:Description`` node
    elements with about/nodeID anchors; resource/nodeID/datatype/plain
    property elements). Returns (s, p, o_term) with o_term in
    N-Triples rendering — directly comparable against golden ``.nt``
    lines."""
    import xml.etree.ElementTree as ET

    from ..ntriples import render_literal

    root = ET.fromstring(text)
    triples: set[tuple[str, str, str]] = set()
    for desc in root:
        about = desc.get(f"{{{RDF_NS}}}about")
        nid = desc.get(f"{{{RDF_NS}}}nodeID")
        if about is None and nid is None:
            raise ValueError("rdf:Description without about/nodeID")
        s = about if about is not None else "_:" + nid
        for child in desc:
            tag = child.tag
            if not tag.startswith("{"):
                raise ValueError(f"unprefixed property element {tag!r}")
            ns, local = tag[1:].split("}", 1)
            p = ns + local
            res = child.get(f"{{{RDF_NS}}}resource")
            onid = child.get(f"{{{RDF_NS}}}nodeID")
            if res is not None:
                o = "<" + res + ">"
            elif onid is not None:
                o = "_:" + onid
            else:
                dt = child.get(f"{{{RDF_NS}}}datatype")
                o = render_literal(child.text or "", dt)
            triples.add((s, p, o))
    return triples
