"""N-Triples term rendering — the single shared renderer for oracle + engine.

The reference (orey/csv2rdf v5) serializes through rdflib; we own both
sides of the comparison, so this module is the normative term syntax for
the whole repo (see /root/reference/csv2rdf-v5/csv2rdf-v5.py:311-341 for
which terms are URIs vs plain vs typed literals).

Rendering rules (N-Triples, RDF 1.1):
- IRI         -> ``<iri>``       (reference IRIs are pre-sanitized by
                                  ``rules.format_uri``; no %-encoding done)
- plain lit   -> ``"lex"``       (rdflib ``Literal(x)`` with no datatype)
- typed lit   -> ``"lex"^^<dt>`` (``Literal(x, datatype=...)``)

Escapes in literals: backslash, double quote, LF, CR, TAB — the set
rdflib's ntriples serializer emits.
"""

from __future__ import annotations

# Namespaces (public W3C vocabularies, same ones rdflib exposes as
# RDF/RDFS/XSD in csv2rdf-v5/csv2rdf-v5.py:18)
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
XSD_NS = "http://www.w3.org/2001/XMLSchema#"
OWL_NS = "http://www.w3.org/2002/07/owl#"

RDF_TYPE = RDF_NS + "type"
RDF_PROPERTY = RDF_NS + "Property"
RDFS_LABEL = RDFS_NS + "label"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"
RDFS_LITERAL = RDFS_NS + "Literal"
RDFS_CLASS = RDFS_NS + "Class"
RDFS_SUBCLASSOF = RDFS_NS + "subClassOf"
RDFS_SUBPROPERTYOF = RDFS_NS + "subPropertyOf"
OWL_SAMEAS = OWL_NS + "sameAs"

XSD_STRING = XSD_NS + "string"
XSD_INTEGER = XSD_NS + "integer"
XSD_FLOAT = XSD_NS + "float"
XSD_DATE = XSD_NS + "date"

# Object-kind tags used in the engine's columnar triple representation
KIND_URI = "u"
KIND_LIT = "l"

_LITERAL_ESCAPES = [
    ("\\", "\\\\"),
    ('"', '\\"'),
    ("\n", "\\n"),
    ("\r", "\\r"),
    ("\t", "\\t"),
]


def escape_literal(lex: str) -> str:
    for raw, esc in _LITERAL_ESCAPES:
        lex = lex.replace(raw, esc)
    return lex


def render_iri(iri: str) -> str:
    return "<" + iri + ">"


def render_literal(lex: str, datatype: str | None = None) -> str:
    out = '"' + escape_literal(lex) + '"'
    if datatype:
        out += "^^<" + datatype + ">"
    return out


def render_object(kind: str, lex: str, datatype: str | None = None) -> str:
    """kind: KIND_URI or KIND_LIT; datatype '' or None means plain literal."""
    if kind == KIND_URI:
        return render_iri(lex)
    return render_literal(lex, datatype or None)


def triple_line(s_iri: str, p_iri: str, o_term: str) -> str:
    """One N-Triples statement (no trailing newline)."""
    return f"{render_iri(s_iri)} {render_iri(p_iri)} {o_term} ."
