"""Single-process reference oracle — literal transcription of csv2rdf v5.

Ground truth for the pytest suite: a straight, line-by-line transcription
of the reference converter's semantics
(/root/reference/csv2rdf-v5/csv2rdf-v5.py:168-178 format_URI, :199-341
triple generation, :433-499 semantic_parser, :74-87 ontology side output)
— deliberately INDEPENDENT of kgforge/rules.py (only the N-Triples
renderer is shared), so engine-vs-oracle comparisons can catch bugs in
the rule compiler as well as in the Ray stages. rdflib is not available
in the sandbox; ``rdflib.Graph``'s set semantics are modeled with a
Python ``set`` of rendered triples, its Literal/URIRef rendering with
kgforge.ntriples.

Intended for small fixtures only (O(rows × rules) Python loop).
"""

from __future__ import annotations

import configparser
import csv
import io
import os

from .ntriples import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_LABEL,
    RDFS_LITERAL,
    RDFS_RANGE,
    XSD_DATE,
    XSD_FLOAT,
    XSD_INTEGER,
    XSD_STRING,
    render_iri,
    render_literal,
)

_GRAMMAR_TYPES = {
    "string": XSD_STRING,
    "integer": XSD_INTEGER,
    "float": XSD_FLOAT,
    "date": XSD_DATE,
}

# modes (csv2rdf-v5.py:57-61)
_NONE, _MAP_ALL, _MAP_PART, _EXTRACT, _PREFIX = 0, 1, 2, 3, 4


def _format_uri(pred: str) -> str:
    # csv2rdf-v5.py:168-178, char list verbatim
    new = ""
    for i, c in enumerate(pred):
        if c in [' ', '-', '/', '\\', '(', ')', ',',
                 '"', "'", "<", ">", "|", "{", "}",
                 "^", "#", "$", "*", ".", "`", "+",
                 "=", "%"]:
            new += '_'
        else:
            new += pred[i]
    return new


class _Col:
    def __init__(self, domain, name, lists, cellrole, celltype, columntype, ispkey=False):
        self.domain = domain
        self.columnname = name
        self.lists = lists
        self.cellrole = cellrole
        self.celltype = celltype
        self.columntype = columntype
        self.ispkey = ispkey
        self.index = -1

    def generate(self, store, define, cell, pk, pkt):
        raise NotImplementedError


class _PKey(_Col):
    def generate(self, store, define, cell, pk, pkt):
        # csv2rdf-v5.py:201-214
        cv = render_iri(self.domain + _format_uri(cell))
        ct = render_iri(self.domain + _format_uri(self.celltype))
        store.add((cv, render_iri(RDFS_LABEL), render_literal(cell)))
        store.add((ct, render_iri(RDFS_LABEL), render_literal(self.celltype)))
        if "Cell type: " + ct not in define:
            define.append("Cell type: " + ct)
        store.add((cv, render_iri(RDF_TYPE), ct))


class _URICol(_Col):
    def __init__(self, domain, name, lists, cellrole, celltype, columntype):
        super().__init__(domain, name, lists, cellrole, celltype, columntype)
        # csv2rdf-v5.py:221-256
        self.altermode = _NONE
        self.maptable = None
        self.lo = -1
        self.hi = -1
        self.prefix = ""
        parts = cellrole.split(",")
        if len(parts) != 1:
            cmd = parts[1]
            if cmd.startswith("map("):
                args = (cmd[4:-1]).split(";")
                self.maptable = lists[args[1]]
                if args[0] == "all":
                    self.altermode = _MAP_ALL
                else:
                    lo, hi = args[0].split(":")
                    self.lo = int(lo) if lo != "" else 0
                    self.hi = int(hi) if hi != "" else 0
                    self.altermode = _MAP_PART
            elif cmd.startswith("extract("):
                lo, hi = cmd[8:-1].split(":")
                self.lo = int(lo) if lo != "" else 0
                self.hi = int(hi) if hi != "" else 0
                self.altermode = _EXTRACT
            elif cmd.startswith("prefix("):
                self.prefix = cmd[7:-1]
                self.altermode = _PREFIX
            else:
                raise SystemExit(f"Unknown command: '{cmd}'")

    def _alter(self, cell):
        # csv2rdf-v5.py:258-282
        if cell.strip() == "":
            return ""
        if self.altermode == _NONE:
            return cell
        if self.altermode == _MAP_ALL:
            if cell.lower() in self.maptable:
                return self.maptable[cell.lower()]
            return cell
        if self.altermode == _MAP_PART:
            temp = cell[self.lo:self.hi].lower()
            if temp in self.maptable:
                return self.maptable[temp]
            return cell
        if self.altermode == _EXTRACT:
            return cell[self.lo:self.hi]
        if self.altermode == _PREFIX:
            return cell + self.prefix

    def generate(self, store, define, cell, pk, pkt):
        # csv2rdf-v5.py:286-318
        new = self._alter(cell)
        cv = render_iri(self.domain + _format_uri(new))
        ct = render_iri(self.domain + _format_uri(self.celltype))
        colt = render_iri(self.domain + _format_uri(self.columntype))
        pkv = render_iri(self.domain + _format_uri(pk))
        pktu = render_iri(self.domain + _format_uri(pkt))
        store.add((cv, render_iri(RDFS_LABEL), render_literal(new)))
        store.add((ct, render_iri(RDFS_LABEL), render_literal(self.celltype)))
        store.add((colt, render_iri(RDFS_LABEL), render_literal(self.columntype)))
        for s in ("Cell type: " + ct, "Column type: " + colt):
            if s not in define:
                define.append(s)
        store.add((cv, render_iri(RDF_TYPE), ct))
        if self.cellrole == "subject":  # full-string test, csv2rdf-v5.py:311
            store.add((cv, colt, pkv))
            store.add((colt, render_iri(RDFS_DOMAIN), ct))
            store.add((colt, render_iri(RDFS_RANGE), pktu))
        else:
            store.add((pkv, colt, cv))
            store.add((colt, render_iri(RDFS_DOMAIN), pktu))
            store.add((colt, render_iri(RDFS_RANGE), ct))


class _LitCol(_Col):
    def generate(self, store, define, cell, pk, pkt):
        # csv2rdf-v5.py:323-341
        colt = render_iri(self.domain + _format_uri(self.columntype))
        pkv = render_iri(self.domain + _format_uri(pk))
        pktu = render_iri(self.domain + _format_uri(pkt))
        store.add((colt, render_iri(RDFS_LABEL), render_literal(self.columntype)))
        if "Column type: " + colt not in define:
            define.append("Column type: " + colt)
        store.add((pkv, colt, render_literal(cell, self.celltype)))
        store.add((colt, render_iri(RDFS_DOMAIN), pktu))
        store.add((colt, render_iri(RDFS_RANGE), render_iri(RDFS_LITERAL)))


class OracleGrammar:
    """Transcription of Grammar.__init__ (csv2rdf-v5.py:346-430)."""

    def __init__(self, text_or_path: str, domain: str, delim: str = ";"):
        self.domain = domain
        self.delim = delim
        self.columns: dict[str, _Col] = {}
        self.lists: dict[str, dict[str, str]] = {}
        self.pkey: _PKey | None = None
        config = configparser.ConfigParser()
        if os.path.isfile(text_or_path):
            config.read(text_or_path)
        else:
            config.read_file(io.StringIO(text_or_path))
        for elem in config.sections():
            if elem.startswith("*") and elem.endswith("*"):
                self.lists[elem] = dict(config[elem])
        for elem in config.sections():
            if elem.startswith("*"):
                continue
            opts = dict(config[elem])
            role = opts["cellrole"]
            if role == "ignore":
                continue
            if role == "pkey":
                self.pkey = _PKey(domain, elem, self.lists, role, opts["celltype"], "", True)
                self.columns[elem] = self.pkey
                continue
            if opts["celltype"] in _GRAMMAR_TYPES:
                self.columns[elem] = _LitCol(
                    domain, elem, self.lists, role,
                    _GRAMMAR_TYPES[opts["celltype"]], opts["columntype"])
            else:
                self.columns[elem] = _URICol(
                    domain, elem, self.lists, role,
                    opts["celltype"], opts["columntype"])
        if self.pkey is None:
            raise SystemExit("pkey not found in grammar file")

    def parse_rows(self, header: list[str], rows):
        """semantic_parser body (csv2rdf-v5.py:446-493) over in-memory rows.

        Returns (triples, define): ``triples`` is the deduped set of
        rendered (s, p, o) term strings (Graph set semantics),
        ``define`` the first-occurrence-ordered requirement list."""
        store: set[tuple[str, str, str]] = set()
        # set.add matches Graph.add dedup; wrap to keep call-site parity
        class _Store:
            def __init__(self, s): self._s = s
            def add(self, t): self._s.add(t)
        wrapped = _Store(store)
        define: list[str] = []
        pkeyindex = -1
        for col in self.columns:
            colobj = self.columns[col]
            if colobj.columnname[-2] == "$":  # csv2rdf-v5.py:458
                temp = colobj.columnname.split("$")[0]
            else:
                temp = colobj.columnname
            if temp not in header:
                raise SystemExit(f"grammar section name '{colobj.columnname}' not in header")
            for i, h in enumerate(header):
                if h == temp:
                    colobj.index = i
                    if colobj.ispkey:
                        pkeyindex = i
                    break
        if pkeyindex == -1:
            raise SystemExit("could not find pkey in CSV header")
        count = 0
        for row in rows:
            pkeyvalue = row[pkeyindex]
            for col in self.columns:
                colobj = self.columns[col]
                cellvalue = row[colobj.index]
                if cellvalue.strip() == "":
                    continue
                colobj.generate(wrapped, define, cellvalue, pkeyvalue,
                                self.pkey.celltype)
            count += 1
        return store, define

    def parse_csv(self, path: str):
        """CSV entry with the reference's decode behavior
        (utf-8, errors='ignore' — csv2rdf-v5.py:436-438)."""
        reader = csv.reader(open(path, "r", encoding="utf-8", errors="ignore"),
                            delimiter=self.delim)
        it = iter(reader)
        header = next(it)
        return self.parse_rows(header, it)


def sorted_ntriples(store: set[tuple[str, str, str]]) -> list[str]:
    """Deterministic serialization: N-Triples lines sorted by the RAW
    (s_iri, p_iri, o_term) key — the repo-wide canonical order (the
    engine sorts its columnar s/p before angle-bracket wrapping; '<'/'>'
    must not participate in the collation)."""
    return [f"{s} {p} {o} ."
            for s, p, o in sorted(store, key=lambda t: (t[0][1:-1], t[1][1:-1], t[2]))]


def precision_recall(got: set, want: set) -> tuple[float, float]:
    if not got and not want:
        return 1.0, 1.0
    inter = len(got & want)
    p = inter / len(got) if got else 0.0
    r = inter / len(want) if want else 0.0
    return p, r
