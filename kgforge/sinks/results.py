"""W3C SPARQL 1.1 Query Results serializers (CSV / TSV / JSON).

The reference's end users consume query results from a Fuseki
endpoint (csv2rdf-v4/jena/test-conf.ttl:1-34), whose HTTP layer
speaks exactly these three formats — a client migrating to this
engine's CLI gets the same bytes its tooling already parses:

- ``csv``  — https://www.w3.org/TR/sparql11-results-csv-tsv/ §3:
  header = variable names; every term is its PLAIN string value
  (IRIs bare, literals as their lexical form, no quoting beyond
  RFC 4180); unbound = empty field.
- ``tsv``  — same spec §4: header = ``?var`` names; terms in SPARQL
  syntax (``<iri>``, ``"literal"``, typed/lang literals verbatim).
- ``json`` — https://www.w3.org/TR/sparql11-results-json/:
  ``{"head": {"vars": [...]}, "results": {"bindings": [...]}}`` with
  per-binding ``{"type": "uri"|"literal", "value": ...}`` objects
  (plus ``datatype``/``xml:lang`` when the term carries them);
  ASK results serialize as ``{"head": {}, "boolean": b}``.
- ``xml``  — https://www.w3.org/TR/rdf-sparql-XMLres/: the
  ``<sparql><head/><results/>`` document (or ``<boolean>`` for ASK).

All three writers STREAM: chunked ``iter_batches`` over the result
Dataset, one vectorized decode per batch, constant driver memory —
a 100 TB-store SELECT never materializes driver-side. Term decoding
works from the engine's canonical representations: an iri-class
column holds bare IRIs; a term-class column holds the store's
rendered forms (``<iri>``, ``"lex"``, ``"lex"^^<dt>``, ``"lex"@lang``).
The decoders dispatch on the VALUE shape, so they need no cls map.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

__all__ = ["write_sparql_results", "RESULT_FORMATS"]

RESULT_FORMATS = ("csv", "tsv", "json", "xml", "nt")

# "lex"^^<dt> | "lex"@lang | "lex" | <iri> — anchored, non-greedy lex
_TYPED_RE = re.compile(r'^"(?P<lex>(?:[^"\\]|\\.)*)"'
                       r'(?:\^\^<(?P<dt>[^<>]*)>|@(?P<lang>[A-Za-z0-9-]+))?$')

#: bare (undecorated) values: iri-class columns hold bare IRIs, but
#: plain-string BIND aliases (UCASE/CONCAT/arith results) are bare
#: LITERALS — only a scheme-shaped value reads as an IRI
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:\S*$")


def _unescape(lex: str) -> str:
    """N-Triples-style escapes in a rendered literal -> raw text."""
    if "\\" not in lex:
        return lex
    return (lex.replace("\\\\", "\x00").replace('\\"', '"')
            .replace("\\n", "\n").replace("\\r", "\r")
            .replace("\\t", "\t").replace("\x00", "\\"))


def _decode_term(v):
    """One rendered term -> (kind, value, datatype, lang); kind is
    'uri' | 'literal' | None (unbound)."""
    if v is None:
        return None, None, None, None
    if v.startswith("<") and v.endswith(">"):
        return "uri", v[1:-1], None, None
    m = _TYPED_RE.match(v)
    if m is not None:
        return ("literal", _unescape(m.group("lex")),
                m.group("dt"), m.group("lang"))
    if _SCHEME_RE.match(v):
        # iri-class column: bare IRI
        return "uri", v, None, None
    # plain-string alias column: a bare simple literal
    return "literal", v, None, None


def _csv_field(s: str) -> str:
    if s is None:
        return ""
    if any(c in s for c in (",", '"', "\n", "\r")):
        return '"' + s.replace('"', '""') + '"'
    return s


def _tsv_term(v) -> str:
    if v is None:
        return ""
    if v.startswith("<") or v.startswith('"'):
        return v          # already SPARQL syntax
    if _SCHEME_RE.match(v):
        return f"<{v}>"   # bare iri-class value
    return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _json_binding(v):
    kind, value, dt, lang = _decode_term(v)
    if kind is None:
        return None
    out = {"type": kind, "value": value}
    if dt:
        out["datatype"] = dt
    if lang:
        out["xml:lang"] = lang
    return out


def _result_columns(ds) -> list[str]:
    schema = ds.schema(fetch_if_missing=True)
    return list(schema.names) if schema is not None else []


def _iter_tables(ds):
    for b in ds.iter_batches(batch_format="pyarrow"):
        if isinstance(b, pa.RecordBatch):
            b = pa.Table.from_batches([b])
        if b.num_rows:
            yield b


def write_sparql_results(ds, path: str, fmt: str) -> int:
    """Stream a SELECT/ASK result Dataset to ``path`` in one of the
    W3C formats. Returns the row count (1 for ASK)."""
    if fmt not in RESULT_FORMATS:
        raise ValueError(f"unknown results format {fmt!r}; "
                         f"pick one of {RESULT_FORMATS}")
    cols = _result_columns(ds)
    if cols == ["ask"]:
        if fmt == "nt":
            raise ValueError("nt results format needs a triple-shaped "
                             "(s, p, o) result, got an ASK boolean")
        return _write_ask(ds, path, fmt)
    if fmt == "nt":
        if sorted(cols) != ["o", "p", "s"]:
            raise ValueError("nt results format needs a triple-shaped "
                             f"(s, p, o) result, got columns {cols}")
        return _write_nt(ds, path)
    writer = {"csv": _write_csv, "tsv": _write_tsv,
              "json": _write_json, "xml": _write_xml}[fmt]
    return writer(ds, path, cols)


def _write_nt(ds, path: str) -> int:
    """CONSTRUCT/DESCRIBE (and update previews) as N-Triples: s/p are
    the engine's raw IRIs, o is already the rendered term — the same
    line shape the graph sink emits, streamed batch by batch."""
    rows = 0
    with open(path, "w", encoding="utf-8") as f:
        for t in _iter_tables(ds):
            s, p, o = (t[c].to_pylist() for c in ("s", "p", "o"))
            f.write("".join(f"<{si}> <{pi}> {oi} .\n"
                            for si, pi, oi in zip(s, p, o)))
            rows += t.num_rows
    return rows


def _write_ask(ds, path: str, fmt: str) -> int:
    val = bool(ds.take(1)[0]["ask"])
    with open(path, "w", encoding="utf-8") as f:
        if fmt == "json":
            json.dump({"head": {}, "boolean": val}, f)
            f.write("\n")
        elif fmt == "xml":
            f.write('<?xml version="1.0"?>\n'
                    '<sparql xmlns="http://www.w3.org/2005/sparql-'
                    'results#"><head/><boolean>%s</boolean></sparql>\n'
                    % ("true" if val else "false"))
        else:
            # the CSV/TSV spec has no ASK form; emit a 1-cell table
            f.write("ask\r\n" if fmt == "csv" else "?ask\n")
            f.write(("true" if val else "false") + ("\r\n" if fmt == "csv"
                                                    else "\n"))
    return 1


def _write_csv(ds, path: str, cols: list[str]) -> int:
    rows = 0
    with open(path, "w", encoding="utf-8", newline="") as f:
        f.write(",".join(_csv_field(c) for c in cols) + "\r\n")
        for t in _iter_tables(ds):
            col_vals = [t[c].to_pylist() for c in cols]
            for i in range(t.num_rows):
                f.write(",".join(
                    _csv_field(_decode_term(col_vals[j][i])[1] or "")
                    if col_vals[j][i] is not None else ""
                    for j in range(len(cols))) + "\r\n")
            rows += t.num_rows
    return rows


def _write_tsv(ds, path: str, cols: list[str]) -> int:
    rows = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write("\t".join(f"?{c}" for c in cols) + "\n")
        for t in _iter_tables(ds):
            col_vals = [t[c].to_pylist() for c in cols]
            for i in range(t.num_rows):
                f.write("\t".join(_tsv_term(col_vals[j][i])
                                  for j in range(len(cols))) + "\n")
            rows += t.num_rows
    return rows


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _write_xml(ds, path: str, cols: list[str]) -> int:
    rows = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0"?>\n<sparql xmlns='
                '"http://www.w3.org/2005/sparql-results#">\n<head>')
        for c in cols:
            f.write(f'<variable name="{_xml_escape(c)}"/>')
        f.write("</head>\n<results>\n")
        for t in _iter_tables(ds):
            col_vals = [t[c].to_pylist() for c in cols]
            for i in range(t.num_rows):
                f.write("<result>")
                for j, c in enumerate(cols):
                    kind, value, dt, lang = _decode_term(col_vals[j][i])
                    if kind is None:
                        continue
                    f.write(f'<binding name="{_xml_escape(c)}">')
                    if kind == "uri":
                        f.write(f"<uri>{_xml_escape(value)}</uri>")
                    else:
                        attr = (f' datatype="{_xml_escape(dt)}"' if dt
                                else f' xml:lang="{lang}"' if lang
                                else "")
                        f.write(f"<literal{attr}>"
                                f"{_xml_escape(value)}</literal>")
                    f.write("</binding>")
                f.write("</result>\n")
            rows += t.num_rows
        f.write("</results>\n</sparql>\n")
    return rows


def _write_json(ds, path: str, cols: list[str]) -> int:
    rows = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write('{"head": {"vars": %s}, "results": {"bindings": [\n'
                % json.dumps(cols))
        first = True
        for t in _iter_tables(ds):
            col_vals = [t[c].to_pylist() for c in cols]
            for i in range(t.num_rows):
                b = {}
                for j, c in enumerate(cols):
                    jb = _json_binding(col_vals[j][i])
                    if jb is not None:
                        b[c] = jb
                f.write(("" if first else ",\n") + json.dumps(b))
                first = False
            rows += t.num_rows
        f.write("\n]}}\n")
    return rows
