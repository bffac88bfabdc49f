"""Bulk RDF ingestion — distributed Turtle / N-Triples readers that
load pre-existing RDF into the predicate-partitioned store.

The reference ships ontology fixtures as Turtle
(/root/reference/csv2rdf/tests_ttl/{csv2rdf,grammar,test1}.ttl) and its
Fuseki hand-off consumes .ttl files (csv2rdf-v5/csv2rdf-v5.py:558
``output = source.name + ".ttl"``); a user switching engines arrives
with existing .ttl/.nt artifacts. These readers turn them into the same
(s, p, o) term rows every store/SPARQL component already consumes.

Parallelism model (documented partitioning assumption):

- **N-Triples is line-delimited** → ``ray.data.read_text`` splits
  WITHIN files, and each batch of lines parses independently with ONE
  vectorized ``pc.extract_regex`` call (no Python loop on the hot
  path). This is the scale format: a 100 TB .nt corpus streams through
  ``map_batches`` like any other source.
- **Turtle statements span lines** (``;``/``,`` continuation, shared
  ``@prefix`` header), so the parse unit is a whole FILE:
  ``read_binary_files`` → one tokenizer call per file. Engine-emitted
  stores are many self-contained shards (sinks/turtle_sink.py writes
  one valid document per block), so per-file parallelism matches the
  data layout; a single giant hand-written .ttl parses on one worker —
  convert to .nt for scale.

Supported Turtle subset (a superset of what turtle_block emits, wide
enough for every reference fixture): ``@prefix``/``@base`` and
SPARQL-style ``PREFIX``/``BASE`` directives, comments, IRIs, prefixed
names (incl. the empty prefix and dotted locals like ``rdfs:Class.``),
``a``, ``;``/``,`` lists, plain / typed / language-tagged string
literals (single- and triple-quoted), numeric and boolean shorthand.
Blank nodes and collections raise a clear error naming the shape —
the engine's data model is IRI-keyed (stages/triples.py TRIPLE_SCHEMA
has no bnode kind), consistent with the reference, which never mints
bnodes (csv2rdf-v5.py:311-341).
"""

from __future__ import annotations

import glob
import os
import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..ntriples import RDF_TYPE, XSD_NS, render_literal

TERM_SCHEMA = pa.schema([("s", pa.string()), ("p", pa.string()),
                         ("o", pa.string())])

# --------------------------------------------------------------- Turtle

_TTL_TOKEN = re.compile(
    r"""
      (?P<skip>\s+|\#[^\n]*)
    | (?P<iri><(?:[^<>"{}|^`\\\x00-\x20]
                 |\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>)
    | (?P<lstr>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|"(?:[^"\\\n]|\\.)*")
    | (?P<dt>\^\^)
    | (?P<lang>@[A-Za-z][A-Za-z0-9]*(?:-[A-Za-z0-9]+)*)
    | (?P<punct>[;,.\[\]()])
    | (?P<num>[+-]?(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<pname>(?:[A-Za-z_][\w.\-]*?)?:(?:%[0-9A-Fa-f]{2}|[\w\-])*
                (?:\.(?:%[0-9A-Fa-f]{2}|[\w\-])+)*
        |[A-Za-z_][\w\-]*)
    """,
    re.X,
)

_UCHAR_RE = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})")

_STR_ESCAPES = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
                '"': '"', "'": "'", "\\": "\\"}


def _unescape_string(body: str) -> str:
    out: list[str] = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        e = body[i + 1]
        if e == "u":
            out.append(chr(int(body[i + 2:i + 6], 16)))
            i += 6
        elif e == "U":
            out.append(chr(int(body[i + 2:i + 10], 16)))
            i += 10
        else:
            out.append(_STR_ESCAPES.get(e, e))
            i += 2
    return "".join(out)


def _iri_unescape(iri: str) -> str:
    return _UCHAR_RE.sub(
        lambda m: chr(int(m.group(1) or m.group(2), 16)), iri)


class _TurtleDoc:
    """Token-stream parser for one Turtle document."""

    def __init__(self, text: str, base: str = ""):
        self.toks: list[tuple[str, str]] = []
        pos = 0
        for m in _TTL_TOKEN.finditer(text):
            if m.start() != pos:
                raise ValueError(
                    f"turtle: cannot tokenize at offset {pos}: "
                    f"{text[pos:pos + 40]!r}")
            pos = m.end()
            if m.lastgroup != "skip":
                self.toks.append((m.lastgroup, m.group()))
        if pos != len(text):
            raise ValueError(
                f"turtle: trailing garbage at offset {pos}: "
                f"{text[pos:pos + 40]!r}")
        self.i = 0
        self.base = base
        self.prefixes: dict[str, str] = {}
        self.rows: list[tuple[str, str, str]] = []

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, kind: str, val: str | None = None):
        k, v = self._next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"turtle: expected {val or kind}, got {v!r}")
        return v

    def _iri(self, tok: str) -> str:
        body = _iri_unescape(tok[1:-1])
        if self.base and not re.match(r"[A-Za-z][A-Za-z0-9+.\-]*:", body):
            return self.base + body
        return body

    def _pname(self, tok: str) -> str:
        pfx, local = tok.split(":", 1)
        if pfx not in self.prefixes:
            raise ValueError(f"turtle: undefined prefix {pfx!r}:")
        return self.prefixes[pfx] + local

    def _resource(self, allow_blank: bool = False) -> str:
        k, v = self._next()
        if k == "iri":
            return self._iri(v)
        if k == "pname" and v.startswith("_:"):
            if not allow_blank:
                raise ValueError(
                    f"turtle: blank node {v!r} is not a valid "
                    "predicate/datatype")
            return v          # labeled blank, kept raw (store form)
        if k == "pname" and ":" in v:
            return self._pname(v)
        if k == "punct" and v in "[(":
            raise ValueError(
                "turtle: anonymous blank nodes / collections are not "
                "supported (use labeled _:name blanks)")
        raise ValueError(f"turtle: expected IRI or prefixed name, got {v!r}")

    def _object(self) -> str:
        k, v = self._next()
        if k == "iri":
            return "<" + self._iri(v) + ">"
        if k == "pname" and v.startswith("_:"):
            return v          # labeled blank object, kept raw
        if k == "lstr":
            body = v[3:-3] if v.startswith('"""') else v[1:-1]
            lex = _unescape_string(body)
            nk, nv = self._peek()
            if nk == "dt":
                self._next()
                return render_literal(lex, self._resource())
            if nk == "lang":
                self._next()
                return render_literal(lex) + nv.lower()
            return render_literal(lex)
        if k == "num":
            if "." in v or "e" in v or "E" in v:
                dt = XSD_NS + ("double" if "e" in v.lower() else "decimal")
            else:
                dt = XSD_NS + "integer"
            return render_literal(v, dt)
        if k == "pname":
            if v in ("true", "false"):
                return render_literal(v, XSD_NS + "boolean")
            if ":" in v:
                return "<" + self._pname(v) + ">"
        if k == "punct" and v in "[(":
            raise ValueError(
                "turtle: blank nodes / collections are not supported "
                "(the engine's data model is IRI-keyed)")
        raise ValueError(f"turtle: expected object term, got {v!r}")

    def _directive(self, word: str) -> None:
        low = word.lower().lstrip("@")
        if low == "prefix":
            k, v = self._next()
            if k != "pname" or not v.endswith(":"):
                raise ValueError(f"turtle: bad prefix name {v!r}")
            pfx = v[:-1]
            iri = self._iri(self._expect("iri"))
            self.prefixes[pfx] = iri
        elif low == "base":
            self.base = self._iri(self._expect("iri"))
        else:  # pragma: no cover - callers gate on the word
            raise ValueError(f"turtle: unknown directive {word!r}")
        if word.startswith("@"):
            self._expect("punct", ".")

    def parse(self) -> list[tuple[str, str, str]]:
        while True:
            k, v = self._peek()
            if k == "eof":
                return self.rows
            if (k == "lang" and v.lower() in ("@prefix", "@base")) or (
                    k == "pname" and v.lower() in ("prefix", "base")):
                self._next()
                self._directive(v)
                continue
            s = self._resource(allow_blank=True)
            while True:  # predicate-object list
                k, v = self._peek()
                if k == "pname" and v == "a":
                    self._next()
                    p = RDF_TYPE
                else:
                    p = self._resource()
                while True:  # object list
                    self.rows.append((s, p, self._object()))
                    k, v = self._next()
                    if not (k == "punct" and v == ","):
                        break
                if k == "punct" and v == ";":
                    # tolerate trailing ';' before '.' (rdflib emits it)
                    nk, nv = self._peek()
                    if nk == "punct" and nv == ".":
                        self._next()
                        break
                    continue
                if k == "punct" and v == ".":
                    break
                raise ValueError(
                    f"turtle: expected one of ';,.' after object, got {v!r}")


def parse_turtle_text(text: str, base: str = "") -> pa.Table:
    """One Turtle document → (s, p, o) term rows. s/p are raw IRIs, o
    is the repo's canonical N-Triples rendering (ntriples.py) — the
    exact shape ``write_graph_partitioned`` stores and SPARQL reads."""
    rows = _TurtleDoc(text, base).parse()
    return pa.table(
        {"s": pa.array([r[0] for r in rows], pa.string()),
         "p": pa.array([r[1] for r in rows], pa.string()),
         "o": pa.array([r[2] for r in rows], pa.string())})


def _expand_paths(path: str | list[str], exts: tuple[str, ...]) -> list[str]:
    if isinstance(path, (list, tuple)):
        out: list[str] = []
        for p in path:
            out.extend(_expand_paths(p, exts))
        return out
    if os.path.isdir(path):
        files = [f for f in sorted(glob.glob(os.path.join(path, "**", "*"),
                                             recursive=True))
                 if os.path.isfile(f) and f.endswith(exts)]
        if not files:
            raise FileNotFoundError(f"no {'/'.join(exts)} files under {path}")
        return files
    return [path]


def read_turtle(path: str | list[str],
                base: str = "") -> "ray.data.Dataset":
    """Distributed Turtle reader: one parse task per FILE (statements
    span lines, so the file is the split unit — engine-emitted stores
    are many standalone shards). Returns (s, p, o) term rows."""
    files = _expand_paths(path, (".ttl", ".turtle"))

    def parse_batch(b: pa.Table) -> pa.Table:
        tables = [parse_turtle_text(raw.decode("utf-8", errors="replace"),
                                    base)
                  for raw in b["bytes"].to_pylist()]
        if not tables:
            return TERM_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    ds = ray.data.read_binary_files(files)
    return ray.data.from_arrow(TERM_SCHEMA.empty_table()).union(
        ds.map_batches(parse_batch, batch_format="pyarrow"))


def read_jsonld(path: str | list[str]) -> "ray.data.Dataset":
    """Distributed JSON-LD reader for the engine's own emitter subset
    (sinks/jsonld_sink.py shards + @language): one parse task per FILE
    (a .jsonld file is one JSON document). Returns (s, p, o) term
    rows — s/p raw IRIs, o rendered."""
    from ..sinks.jsonld_sink import parse_jsonld
    files = _expand_paths(path, (".jsonld", ".json"))

    def parse_batch(b: pa.Table) -> pa.Table:
        rows: list[tuple[str, str, str]] = []
        for raw in b["bytes"].to_pylist():
            rows.extend(sorted(parse_jsonld(
                raw.decode("utf-8", errors="replace"))))
        if not rows:
            return TERM_SCHEMA.empty_table()
        s, p, o = zip(*rows)
        return pa.table({"s": pa.array(s, pa.string()),
                         "p": pa.array(p, pa.string()),
                         "o": pa.array(o, pa.string())})

    ds = ray.data.read_binary_files(files)
    return ray.data.from_arrow(TERM_SCHEMA.empty_table()).union(
        ds.map_batches(parse_batch, batch_format="pyarrow"))


def read_rdfxml(path: str | list[str]) -> "ray.data.Dataset":
    """Distributed RDF/XML reader for the engine's own emitter subset
    (sinks/rdfxml_sink.py shards): one parse task per FILE (an .rdf
    file is one XML document). Returns (s, p, o) term rows — s/p raw
    IRIs (``_:``-prefixed for blank nodes), o rendered."""
    from ..sinks.rdfxml_sink import parse_rdfxml
    files = _expand_paths(path, (".rdf", ".xml"))

    def parse_batch(b: pa.Table) -> pa.Table:
        rows: list[tuple[str, str, str]] = []
        for raw in b["bytes"].to_pylist():
            rows.extend(sorted(parse_rdfxml(
                raw.decode("utf-8", errors="replace"))))
        if not rows:
            return TERM_SCHEMA.empty_table()
        s, p, o = zip(*rows)
        return pa.table({"s": pa.array(s, pa.string()),
                         "p": pa.array(p, pa.string()),
                         "o": pa.array(o, pa.string())})

    ds = ray.data.read_binary_files(files)
    return ray.data.from_arrow(TERM_SCHEMA.empty_table()).union(
        ds.map_batches(parse_batch, batch_format="pyarrow"))


# ------------------------------------------------------------ N-Triples

# one vectorized regex over the whole line column: subject, predicate,
# then the object term verbatim (IRI / literal with optional ^^dt or
# @lang), trailing '.'
#: subject: IRI (captured without brackets) OR a blank-node label
#: (captured WITH its ``_:`` prefix — the store keeps blanks raw);
#: object: IRI / blank / literal with optional datatype or langtag
_NT_LINE = (
    r"^\s*(?:<(?P<s>[^>]*)>|(?P<sb>_:[A-Za-z0-9_][A-Za-z0-9_.\-]*))"
    r"\s+<(?P<p>[^>]*)>\s+"
    r'(?P<o><[^>]*>|_:[A-Za-z0-9_][A-Za-z0-9_.\-]*|"(?:[^"\\]|\\.)*"'
    r'(?:\^\^<[^>]*>|@[A-Za-z][A-Za-z0-9\-]*)?)\s*\.\s*$')


def _nt_batch(b: pa.Table) -> pa.Table:
    lines = b["text"].combine_chunks().cast(pa.string())
    hit = pc.extract_regex(lines, _NT_LINE)
    ok = hit.is_valid()
    if not pc.all(ok).as_py():
        bad = lines.filter(
            pc.and_(pc.invert(ok),
                    pc.invert(pc.match_substring_regex(
                        lines, r"^\s*(#|$)"))))
        if len(bad):
            raise ValueError(
                f"ntriples: {len(bad)} unparseable lines, first: "
                f"{bad[0].as_py()!r}")
        hit = hit.filter(ok)
    flat = hit.combine_chunks() if isinstance(hit, pa.ChunkedArray) else hit
    # exactly one of (s, sb) participates per row; the other group
    # extracts as "" — pick the blank label when the IRI side is empty
    raw_s = flat.field("s")
    s = pc.if_else(pc.equal(raw_s, ""), flat.field("sb"),
                   _iri_col(raw_s))
    return pa.table({"s": s,
                     "p": _iri_col(flat.field("p")),
                     "o": flat.field("o")})


def _iri_col(arr: pa.Array) -> pa.Array:
    # \uXXXX IRI escapes are rare; only pay the Python pass when present
    if pc.any(pc.match_substring(arr, "\\u")).as_py():
        return pa.array([_iri_unescape(v) for v in arr.to_pylist()],
                        pa.string())
    return arr


def read_ntriples(path: str | list[str]) -> "ray.data.Dataset":
    """Distributed N-Triples reader: line-split WITHIN files
    (``read_text``), one vectorized ``extract_regex`` per batch — the
    scale format for bulk RDF. Returns (s, p, o) term rows."""
    files = _expand_paths(path, (".nt", ".ntriples"))
    ds = ray.data.read_text(files)
    return ray.data.from_arrow(TERM_SCHEMA.empty_table()).union(
        ds.map_batches(_nt_batch, batch_format="pyarrow"))


def read_rdf_auto(src: str | list[str], fmt: str | None = None,
                  base: str = "") -> "ray.data.Dataset":
    """(s, p, o) term rows from any supported RDF serialization —
    format inferred from extensions unless given. The shared reader
    behind CLI ``--load`` and SPARQL-Update ``LOAD``."""
    if fmt is None:
        files = _expand_paths(src, (".ttl", ".turtle", ".nt",
                                    ".ntriples", ".jsonld", ".rdf"))
        ttl = [f for f in files if f.endswith((".ttl", ".turtle"))]
        nt = [f for f in files if f.endswith((".nt", ".ntriples"))]
        jl = [f for f in files if f.endswith(".jsonld")]
        rx = [f for f in files if f.endswith(".rdf")]
        parts = []
        if ttl:
            parts.append(read_turtle(ttl, base))
        if nt:
            parts.append(read_ntriples(nt))
        if jl:
            parts.append(read_jsonld(jl))
        if rx:
            parts.append(read_rdfxml(rx))
        if not parts:
            raise ValueError(f"no RDF files found under {src!r}")
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
    elif fmt in ("ttl", "turtle"):
        ds = read_turtle(src, base)
    elif fmt in ("nt", "ntriples"):
        ds = read_ntriples(src)
    elif fmt == "jsonld":
        ds = read_jsonld(src)
    elif fmt == "rdfxml":
        ds = read_rdfxml(src)
    else:
        raise ValueError(f"unknown RDF format {fmt!r}")
    return ds


def load_rdf_store(src: str | list[str], store_dir: str,
                   fmt: str | None = None, base: str = "") -> None:
    """Parse Turtle/N-Triples (format inferred from extensions unless
    given) and publish the predicate-partitioned store SPARQL reads.
    Triples are deduplicated (graph set semantics) before the write."""
    from ..sinks.ntriples_sink import write_graph_partitioned
    from ..stages.dedup import distinct
    ds = read_rdf_auto(src, fmt, base)
    write_graph_partitioned(distinct(ds, ["s", "p", "o"]), store_dir)
