"""JSON-LD serialization — the reference's open TODO "Add more output
formats" (csv2rdf-v5/csv2rdf-v5.py:148) through the sink registry.

Shape mirrors the Turtle sink: the columnar triple Dataset is globally
sorted by (s, p, o_kind, o_lex, o_dt), then each block serializes
independently to one ``.jsonld`` shard — a standalone JSON-LD document
``{"@context": prefixes, "@graph": [node objects]}`` (compact form:
prefixed names via the same longest-namespace-wins compactor, rdf:type
folded into ``@type``, one node object per subject run). A subject
crossing a block boundary re-opens in the next shard — JSON-LD's
``@graph`` is set-semantics, identical triple set.

``parse_jsonld`` is the matching reader (the subset the emitter
produces plus ``@language``) used by the round-trip tests to prove
emitted JSON-LD ≡ the golden N-Triples set.
"""

from __future__ import annotations

import json

import pyarrow as pa

import ray.data
from ray.data.datasource import BlockBasedFileDatasink

from ..ntriples import RDF_TYPE
from .ntriples_sink import _SortableNames
from .turtle_sink import _compactor, make_prefixes


def jsonld_block(t: pa.Table, prefixes: dict[str, str]) -> str:
    """Serialize one (sorted) columnar TRIPLE_SCHEMA block to a compact
    JSON-LD document. QNames come from the shared Turtle compactor
    minus the <iri> fallback (JSON-LD wants the raw IRI, not an
    IRIREF)."""
    ttl_qn = _compactor(prefixes)

    def qn(iri: str) -> str:
        c = ttl_qn(iri)
        return iri if c.startswith("<") else c

    nodes: list[dict] = []
    node: dict | None = None
    prev_s = None
    s_col = t["s"].to_pylist()
    p_col = t["p"].to_pylist()
    o_kind = t["o_kind"].to_pylist()
    o_lex = t["o_lex"].to_pylist()
    o_dt = t["o_dt"].to_pylist()
    for i in range(t.num_rows):
        if s_col[i] != prev_s:
            node = {"@id": qn(s_col[i])}
            nodes.append(node)
            prev_s = s_col[i]
        if o_kind[i] == "u":
            val = ({"@id": qn(o_lex[i])} if p_col[i] != RDF_TYPE
                   else qn(o_lex[i]))
        elif o_dt[i]:
            val = {"@value": o_lex[i], "@type": qn(o_dt[i])}
        else:
            val = o_lex[i]
        key = "@type" if p_col[i] == RDF_TYPE else qn(p_col[i])
        node.setdefault(key, []).append(val)
    doc = {"@context": dict(sorted(prefixes.items())), "@graph": nodes}
    return json.dumps(doc, ensure_ascii=False, indent=1)


class JsonLdDatasink(BlockBasedFileDatasink):
    """One standalone JSON-LD document per sorted block."""

    def __init__(self, path: str, prefixes: dict[str, str], **kwargs):
        kwargs.setdefault("filename_provider", _SortableNames("jsonld"))
        super().__init__(path, file_format="jsonld", **kwargs)
        self.prefixes = prefixes

    def write_block_to_file(self, block, file) -> None:
        t = block.to_arrow() if hasattr(block, "to_arrow") else block
        file.write(jsonld_block(t, self.prefixes).encode("utf-8"))


def write_graph_jsonld(triples: "ray.data.Dataset", out_dir: str,
                       domain: str | None = None,
                       extra_prefixes: dict[str, str] | None = None
                       ) -> None:
    """Columnar triples -> ``out_dir/graph.jsonld/`` sorted shards."""
    prefixes = make_prefixes(domain, extra_prefixes)
    srt = triples.sort(["s", "p", "o_kind", "o_lex", "o_dt"])
    srt.write_datasink(JsonLdDatasink(f"{out_dir}/graph.jsonld", prefixes))


# ------------------------------------------------------------ round-trip

def parse_jsonld(text: str) -> set[tuple[str, str, str]]:
    """Reader for the emitter's subset (plus @language). Returns
    (s_iri, p_iri, o_term) with o_term in N-Triples rendering —
    directly comparable against golden ``.nt`` lines."""
    from ..ntriples import render_literal

    doc = json.loads(text)
    ctx = doc.get("@context", {})

    def expand(term: str) -> str:
        pfx, _, local = term.partition(":")
        if _ and pfx in ctx:
            return ctx[pfx] + local
        return term

    def obj_term(val) -> str:
        if isinstance(val, dict):
            if "@id" in val:
                return "<" + expand(val["@id"]) + ">"
            out = render_literal(val["@value"],
                                 expand(val["@type"]) if "@type" in val
                                 else None)
            if "@language" in val:
                out += "@" + val["@language"].lower()
            return out
        return render_literal(val)

    triples: set[tuple[str, str, str]] = set()
    for node in doc.get("@graph", []):
        s = expand(node["@id"])
        for key, vals in node.items():
            if key in ("@id",):
                continue
            if key == "@type":
                for v in vals:
                    triples.add((s, RDF_TYPE, "<" + expand(v) + ">"))
                continue
            p = expand(key)
            for v in vals:
                triples.add((s, p, obj_term(v)))
    return triples
