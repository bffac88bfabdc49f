"""Declarative column→RDF mapping rules — v5-exact semantics, engine-neutral.

This is the rule model + grammar compiler shared by the single-process
oracle (kgforge/oracle.py) and the Ray Data triple-generation stage
(kgforge/stages/triples.py). Semantics follow the reference's newest
converter byte-for-byte — orey/csv2rdf v5
(/root/reference/csv2rdf-v5/csv2rdf-v5.py) — including its quirks:

- sanitizer char set (csv2rdf-v5.py:171-174): 23 chars replaced by '_'
- ``prefix(p)`` APPENDS: ``cell + p`` (csv2rdf-v5.py:280-282)
- slice bounds parse ``int(x) if x != '' else 0`` so ``extract(-3:)``
  means ``cell[-3:0]`` == '' (csv2rdf-v5.py:239-247)
- map probes are lowercased; list keys already lowercase because
  configparser lowercases option keys (csv2rdf-v5.py:265-276,371-372)
- on map miss the UNMAPPED original value passes through
  (csv2rdf-v5.py:267-269,274-276)
- the subject/object branch tests the FULL cellrole string against
  'subject' (csv2rdf-v5.py:311), so 'subject,map(...)' behaves as
  OBJECT — replicated as ``effective_role``
- pkey value flows RAW into other columns' triples (sanitized only at
  URI mint time, csv2rdf-v5.py:481,295)
- empty/whitespace-only cells are skipped before triple generation
  (csv2rdf-v5.py:486-487)
- a cellrole of exactly 'pkey'/'ignore' is special; 'pkey,...' or
  'ignore,...' falls through to the URI-column path (csv2rdf-v5.py:390-392)

No Ray imports here — pure Python, unit-testable without a cluster.
"""

from __future__ import annotations

import configparser
import io
import os
from dataclasses import dataclass, field

from .ntriples import (
    KIND_LIT,
    KIND_URI,
    RDF_PROPERTY,
    RDF_TYPE,
    RDFS_CLASS,
    RDFS_DOMAIN,
    RDFS_LABEL,
    RDFS_LITERAL,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
    XSD_DATE,
    XSD_FLOAT,
    XSD_INTEGER,
    XSD_STRING,
    render_iri,
)

# --- grammar vocabulary (csv2rdf-v5.py:36-53) ---------------------------
MULTITREATMENT = "$"
CELLROLE = "cellrole"
CELLTYPE = "celltype"
COLUMNTYPE = "columntype"
IGNORE = "ignore"
PKEY = "pkey"
SUBJECT = "subject"
OBJECT = "object"

GRAMMAR_TYPES = {
    "string": XSD_STRING,
    "integer": XSD_INTEGER,
    "float": XSD_FLOAT,
    "date": XSD_DATE,
}

# Exact v5 char list, in source order (csv2rdf-v5.py:171-174)
SANITIZE_CHARS = [
    " ", "-", "/", "\\", "(", ")", ",",
    '"', "'", "<", ">", "|", "{", "}",
    "^", "#", "$", "*", ".", "`", "+",
    "=", "%",
]
_SANITIZE_SET = frozenset(SANITIZE_CHARS)

# RE2/Python-compatible char class for vectorized engines (pyarrow
# replace_substring_regex, DuckDB regexp_replace). '-' last, '\\' doubled.
SANITIZE_REGEX = r"""[ /\\(),"'<>|{}^#$*.`+=%-]"""


def format_uri(value: str) -> str:
    """v5 ``format_URI`` (csv2rdf-v5.py:168-178): each reserved char -> '_'."""
    return "".join("_" if c in _SANITIZE_SET else c for c in value)


class GrammarError(Exception):
    """Raised where the reference prints an error and exit()s."""


# --- alterations (csv2rdf-v5.py:57-61, 226-283) -------------------------
ALTER_NONE = 0
ALTER_MAP_ALL = 1
ALTER_MAP_PART = 2
ALTER_EXTRACT = 3
ALTER_PREFIX = 4
ALTER_CUSTOM = 5

# --- user-extension surface (SURVEY §2.8) --------------------------------
# The reference's author left "more alteration commands" as an explicit
# TODO (csv2rdf-v4/README.md:174-176); this registry makes the grammar
# `.ini` command vocabulary extensible without touching engine code. A
# factory receives the raw argument string inside the parens plus the
# grammar's *list* tables and returns an Alteration — usually
# mode=ALTER_CUSTOM carrying a scalar fn (reference/oracle path) and an
# optional vectorized Arrow fn (engine hot path; per-unique dictionary
# fallback when absent, so a scalar-only command is still not per-row).
ALTERATION_COMMANDS: dict = {}


def register_alteration(name: str):
    """Decorator: ``@register_alteration("rot13")`` registers
    ``factory(argstr, lists) -> Alteration`` for the grammar command
    ``role,rot13(...)``."""
    def deco(factory):
        ALTERATION_COMMANDS[name] = factory
        return factory
    return deco


@dataclass(frozen=True)
class Alteration:
    mode: int = ALTER_NONE
    maptable: dict[str, str] | None = None  # keys lowercase (configparser)
    lo: int = 0
    hi: int = 0
    prefix: str = ""
    # ALTER_CUSTOM (registered commands): scalar fn is normative,
    # vector fn an optional Arrow-native fast path
    scalar_fn: object = None
    vector_fn: object = None

    def apply(self, cell: str) -> str:
        """Exact transcription of alter_cell_value (csv2rdf-v5.py:258-282)."""
        if cell.strip() == "":
            return ""
        if self.mode == ALTER_NONE:
            return cell
        if self.mode == ALTER_MAP_ALL:
            return self.maptable.get(cell.lower(), cell)
        if self.mode == ALTER_MAP_PART:
            return self.maptable.get(cell[self.lo : self.hi].lower(), cell)
        if self.mode == ALTER_EXTRACT:
            return cell[self.lo : self.hi]
        if self.mode == ALTER_PREFIX:
            return cell + self.prefix  # v5 APPENDS (csv2rdf-v5.py:282)
        if self.mode == ALTER_CUSTOM:
            return self.scalar_fn(cell)
        raise AssertionError("unreachable")


def _parse_bounds(spec: str) -> tuple[int, int]:
    """'i:j' with v5's ``int(x) if x else 0`` quirk (csv2rdf-v5.py:239-247)."""
    lo_s, hi_s = spec.split(":")
    return (int(lo_s) if lo_s != "" else 0, int(hi_s) if hi_s != "" else 0)


def parse_alteration(cellrole: str, lists: dict[str, dict[str, str]]) -> Alteration:
    """Parse the optional ',command' suffix of cellrole (csv2rdf-v5.py:226-256)."""
    parts = cellrole.split(",")
    if len(parts) == 1:
        return Alteration()
    cmd = parts[1]  # v5 looks only at parts[1]; extras silently ignored
    if cmd.startswith("map("):
        args = cmd[4:-1].split(";")
        maptable = lists[args[1]]
        if args[0] == "all":
            return Alteration(mode=ALTER_MAP_ALL, maptable=maptable)
        lo, hi = _parse_bounds(args[0])
        return Alteration(mode=ALTER_MAP_PART, maptable=maptable, lo=lo, hi=hi)
    if cmd.startswith("extract("):
        lo, hi = _parse_bounds(cmd[8:-1])
        return Alteration(mode=ALTER_EXTRACT, lo=lo, hi=hi)
    if cmd.startswith("prefix("):
        return Alteration(mode=ALTER_PREFIX, prefix=cmd[7:-1])
    for name, factory in ALTERATION_COMMANDS.items():
        if cmd.startswith(name + "(") and cmd.endswith(")"):
            return factory(cmd[len(name) + 1:-1], lists)
    raise GrammarError(f"Unknown command: '{cmd}' in grammar file")


# --- triple model -------------------------------------------------------
# A triple is (s_iri, p_iri, o_kind, o_lex, o_dt) with o_dt == "" for
# URIs and plain literals. Object rendering goes through ntriples.py.
Triple = tuple[str, str, str, str, str]


@dataclass
class Rule:
    """One grammar section bound to one source column."""

    domain: str
    section: str          # grammar section name, incl. any $n suffix
    cellrole: str         # full cellrole string (role[,command])
    celltype: str         # raw celltype string (URI rules) or XSD IRI (literal)
    columntype: str
    alteration: Alteration = field(default_factory=Alteration)

    @property
    def source_column(self) -> str:
        """CSV/Arrow column this section binds to: '$n' suffix stripped
        (csv2rdf-v5.py:456-461: checks name[-2] == '$')."""
        if len(self.section) >= 2 and self.section[-2] == MULTITREATMENT:
            return self.section.split(MULTITREATMENT)[0]
        return self.section

    def uri(self, value: str) -> str:
        return self.domain + format_uri(value)

    # subclass API
    def row_triples(self, cell: str, pk: str, pkt: str) -> list[Triple]:
        raise NotImplementedError

    def constant_triples(self) -> list[Triple]:
        """Triples that do not depend on the cell value (schema triples).

        The reference re-adds these per row and relies on rdflib's set
        semantics to dedup (csv2rdf-v5.py:300-318); we emit them once —
        identical post-dedup, and it removes the hottest skew keys at
        the source (every row of a column re-emitting the same
        rdfs:domain/range/label)."""
        return []

    def ontology_requirements(self) -> list[str]:
        return []


@dataclass
class PKeyRule(Rule):
    """cellrole = pkey (csv2rdf-v5.py:199-214)."""

    def row_triples(self, cell, pk, pkt):
        cv = self.uri(cell)
        return [
            (cv, RDFS_LABEL, KIND_LIT, cell, ""),
            (cv, RDF_TYPE, KIND_URI, self.uri(self.celltype), ""),
        ]

    def constant_triples(self):
        ct = self.uri(self.celltype)
        return [(ct, RDFS_LABEL, KIND_LIT, self.celltype, "")]

    def ontology_requirements(self):
        return ["Cell type: " + render_iri(self.uri(self.celltype))]


@dataclass
class URIRule(Rule):
    """URI-valued column (csv2rdf-v5.py:218-318).

    ``chain_class`` / ``chain_prop``: v3's type-chain extension
    (csv2rdf-v3/csv2rdf-v3.py:263-281): the comma-separated
    celltypes/columntypes lists become ``x a rdfs:Class|rdf:Property``
    plus ``x_i rdfs:subClassOf|subPropertyOf x_{i+1}`` chains. Empty
    (the default) in v5-parity mode. v3 quirk preserved: chain URIs are
    minted from the RAW list entries — NO sanitizer
    (``URIRef(domain + lst[i])``, csv2rdf-v3.py:266-268)."""

    chain_class: tuple[str, ...] = ()
    chain_prop: tuple[str, ...] = ()

    @property
    def effective_role(self) -> str:
        # v5 compares the FULL cellrole string to 'subject'
        # (csv2rdf-v5.py:311) — any alteration command forces OBJECT.
        return SUBJECT if self.cellrole == SUBJECT else OBJECT

    def row_triples(self, cell, pk, pkt):
        v = self.alteration.apply(cell)
        cv = self.uri(v)
        ct = self.uri(self.celltype)
        colt = self.uri(self.columntype)
        pkv = self.uri(pk)
        out = [
            (cv, RDFS_LABEL, KIND_LIT, v, ""),
            (cv, RDF_TYPE, KIND_URI, ct, ""),
        ]
        if self.effective_role == SUBJECT:
            out.append((cv, colt, KIND_URI, pkv, ""))
        else:
            out.append((pkv, colt, KIND_URI, cv, ""))
        return out

    def constant_triples(self):
        # pkt (the pkey's celltype) is fixed per grammar, so domain/range
        # are constant — but they reference pkt, which the caller owns;
        # resolved in RuleSet.constant_triples().
        ct = self.uri(self.celltype)
        colt = self.uri(self.columntype)
        out = [
            (ct, RDFS_LABEL, KIND_LIT, self.celltype, ""),
            (colt, RDFS_LABEL, KIND_LIT, self.columntype, ""),
        ]
        # v3 chains (raw, unsanitized URIs — see class docstring)
        for lst, meta, sub in ((self.chain_class, RDFS_CLASS, RDFS_SUBCLASSOF),
                               (self.chain_prop, RDF_PROPERTY,
                                RDFS_SUBPROPERTYOF)):
            for t in lst:
                out.append((self.domain + t, RDF_TYPE, KIND_URI, meta, ""))
            for a, b in zip(lst, lst[1:]):
                out.append((self.domain + a, sub, KIND_URI,
                            self.domain + b, ""))
        return out

    def domain_range_triples(self, pkt: str) -> list[Triple]:
        ct = self.uri(self.celltype)
        colt = self.uri(self.columntype)
        pktu = self.uri(pkt)
        if self.effective_role == SUBJECT:
            return [
                (colt, RDFS_DOMAIN, KIND_URI, ct, ""),
                (colt, RDFS_RANGE, KIND_URI, pktu, ""),
            ]
        return [
            (colt, RDFS_DOMAIN, KIND_URI, pktu, ""),
            (colt, RDFS_RANGE, KIND_URI, ct, ""),
        ]

    def ontology_requirements(self):
        return [
            "Cell type: " + render_iri(self.uri(self.celltype)),
            "Column type: " + render_iri(self.uri(self.columntype)),
        ]


@dataclass
class LiteralRule(Rule):
    """Typed-literal column; celltype is the XSD IRI (csv2rdf-v5.py:322-341)."""

    def row_triples(self, cell, pk, pkt):
        colt = self.uri(self.columntype)
        pkv = self.uri(pk)
        return [(pkv, colt, KIND_LIT, cell, self.celltype)]

    def constant_triples(self):
        colt = self.uri(self.columntype)
        return [(colt, RDFS_LABEL, KIND_LIT, self.columntype, "")]

    def domain_range_triples(self, pkt: str) -> list[Triple]:
        colt = self.uri(self.columntype)
        return [
            (colt, RDFS_DOMAIN, KIND_URI, self.uri(pkt), ""),
            (colt, RDFS_RANGE, KIND_URI, RDFS_LITERAL, ""),
        ]

    def ontology_requirements(self):
        return ["Column type: " + render_iri(self.uri(self.columntype))]


@dataclass
class MultiValueRule(Rule):
    """Engine extension: multi-valued cell split into one entity per token
    — generalizes v1's space-split cell expansion
    (/root/reference/csv2rdf/csv2rdf.py:255-268, the author's own
    "should be parameterizable" TODO at :254) with the v5 object-column
    triple pattern per token. Programmatic-only (no ini syntax; the
    reference grammar cannot express it).

    ``separator`` splits the cell; empty tokens are dropped; when
    ``lexicon`` is set, only tokens in it survive (the web-pipeline's
    entity-mention gazetteer). Each surviving token t emits the OBJECT
    pattern: label(t), type(t, celltype), (pkey, columntype, t) +
    the same schema triples as a URIRule object column."""

    separator: str = " "
    lexicon: frozenset[str] | None = None
    # the author's "should be parameterizable" splitter TODO
    # (csv2rdf/csv2rdf.py:254): an arbitrary str -> list[str] callable;
    # the engine applies it per UNIQUE cell (dictionary-encoded), the
    # separator fast path stays fully vectorized when it is None
    splitter_fn: object = None

    @property
    def effective_role(self) -> str:
        return OBJECT

    def tokens(self, cell: str) -> list[str]:
        raw = (self.splitter_fn(cell) if self.splitter_fn is not None
               else cell.split(self.separator))
        toks = [t for t in raw if t != ""]
        if self.lexicon is not None:
            toks = [t for t in toks if t in self.lexicon]
        return toks

    def row_triples(self, cell, pk, pkt):
        out: list[Triple] = []
        ct = self.uri(self.celltype)
        colt = self.uri(self.columntype)
        pkv = self.uri(pk)
        for t in self.tokens(cell):
            tv = self.uri(t)
            out.append((tv, RDFS_LABEL, KIND_LIT, t, ""))
            out.append((tv, RDF_TYPE, KIND_URI, ct, ""))
            out.append((pkv, colt, KIND_URI, tv, ""))
        return out

    def constant_triples(self):
        ct = self.uri(self.celltype)
        colt = self.uri(self.columntype)
        return [
            (ct, RDFS_LABEL, KIND_LIT, self.celltype, ""),
            (colt, RDFS_LABEL, KIND_LIT, self.columntype, ""),
        ]

    def domain_range_triples(self, pkt: str) -> list[Triple]:
        colt = self.uri(self.columntype)
        return [
            (colt, RDFS_DOMAIN, KIND_URI, self.uri(pkt), ""),
            (colt, RDFS_RANGE, KIND_URI, self.uri(self.celltype), ""),
        ]

    def ontology_requirements(self):
        return [
            "Cell type: " + render_iri(self.uri(self.celltype)),
            "Column type: " + render_iri(self.uri(self.columntype)),
        ]


@dataclass
class DefaultTypeRule(Rule):
    """Grammar-less mode (M13): types the row subject —
    ``subject rdf:type U(type)`` (csv2rdf/csv2rdf.py:113-117). The
    reference mints subjects from the LINE NUMBER (order-dependent,
    unusable under parallelism); we key on an explicit pkey column,
    documented deviation."""

    def row_triples(self, cell, pk, pkt):
        return [(self.uri(cell), RDF_TYPE, KIND_URI, self.uri(self.celltype), "")]


@dataclass
class DefaultCellRule(Rule):
    """Grammar-less mode (M13): one ``(subject, U(header), "cell")``
    PLAIN literal per non-empty cell (csv2rdf/csv2rdf.py:118-121 — v1
    default literals carry no datatype)."""

    def row_triples(self, cell, pk, pkt):
        return [(self.uri(pk), self.uri(self.columntype), KIND_LIT, cell, "")]


@dataclass
class RuleSet:
    """Compiled grammar: ordered rules + mapping lists + the pkey rule.

    Mirrors Grammar.__init__ (csv2rdf-v5.py:346-430).

    ``null_values``: v1's FORGET list (csv2rdf/csv2rdf.py:142,241-243):
    cells whose exact value is in this set are skipped like empties —
    configurable generalization of the hardcoded ['NONE', '-', '']."""

    domain: str
    rules: dict[str, Rule]            # section -> rule, grammar order
    lists: dict[str, dict[str, str]]  # '*name*' -> {lowercase key: value}
    pkey: PKeyRule
    null_values: frozenset[str] = frozenset()

    @property
    def pkey_type(self) -> str:
        return self.pkey.celltype

    def bind(self, available_columns: list[str]) -> dict[str, str]:
        """section -> source column; GrammarError if a section has no
        matching column (csv2rdf-v5.py:453-477)."""
        out = {}
        for name, rule in self.rules.items():
            col = rule.source_column
            if col not in available_columns:
                raise GrammarError(
                    f"grammar section name '{name}' not found in input columns"
                )
            out[name] = col
        return out

    def constant_triples(self) -> list[Triple]:
        """All schema-level triples (labels of types, domain/range) —
        emitted once per run instead of once per row (see Rule docstring)."""
        out: list[Triple] = []
        pkt = self.pkey_type
        for rule in self.rules.values():
            out.extend(rule.constant_triples())
            if isinstance(rule, (URIRule, LiteralRule, MultiValueRule)):
                out.extend(rule.domain_range_triples(pkt))
        # de-dup preserving order
        seen: set[Triple] = set()
        uniq = []
        for t in out:
            if t not in seen:
                seen.add(t)
                uniq.append(t)
        return uniq

    def ontology_requirements(self) -> list[str]:
        """First-occurrence-ordered distinct requirement strings
        (to_define_in_ontology, csv2rdf-v5.py:77-87). The reference's
        order is per-row interleaved; post-distinct the SET is equal —
        consumers should sort for determinism."""
        seen: set[str] = set()
        out = []
        for rule in self.rules.values():
            for s in rule.ontology_requirements():
                if s not in seen:
                    seen.add(s)
                    out.append(s)
        return out


def _read_config(text_or_path: str) -> configparser.ConfigParser:
    # Plain ConfigParser like the reference (csv2rdf-v5.py:364) —
    # BasicInterpolation, option keys lowercased, section case preserved.
    config = configparser.ConfigParser()
    if os.path.isfile(text_or_path):
        config.read(text_or_path)
    else:
        config.read_file(io.StringIO(text_or_path))
    return config


def compile_grammar(text_or_path: str, domain: str,
                    type_chains: bool = False) -> RuleSet:
    """Grammar factory — transcription of Grammar.__init__
    (csv2rdf-v5.py:346-430). Accepts a path or inline ini text.

    ``type_chains=True`` enables the v3 extension: comma-separated
    celltype/columntype values become subClassOf/subPropertyOf chains
    (first element plays the v5 single-type role). Default False =
    exact v5 parity (v5 would sanitize the commas into '_')."""
    config = _read_config(text_or_path)
    lists: dict[str, dict[str, str]] = {}
    for section in config.sections():
        if section.startswith("*") and section.endswith("*"):
            lists[section] = dict(config[section])
    rules: dict[str, Rule] = {}
    pkey: PKeyRule | None = None
    for section in config.sections():
        if section.startswith("*"):
            continue
        opts = dict(config[section])
        if CELLROLE not in opts:
            raise GrammarError(f"'{CELLROLE}' is mandatory in grammar section {section}")
        role = opts[CELLROLE]
        if role == IGNORE:
            continue
        if role == PKEY:
            pkey = PKeyRule(domain, section, role, opts[CELLTYPE], "")
            rules[section] = pkey
            continue
        if CELLTYPE not in opts:
            raise GrammarError(f"'{CELLTYPE}' is mandatory in grammar section {section}")
        if opts[CELLTYPE] in GRAMMAR_TYPES:
            rules[section] = LiteralRule(
                domain, section, role, GRAMMAR_TYPES[opts[CELLTYPE]],
                opts[COLUMNTYPE],
            )
        else:
            celltype, columntype = opts[CELLTYPE], opts[COLUMNTYPE]
            chain_c: tuple[str, ...] = ()
            chain_p: tuple[str, ...] = ()
            if type_chains:
                cts = tuple(celltype.split(","))
                colts = tuple(columntype.split(","))
                celltype, columntype = cts[0], colts[0]
                if len(cts) > 1 or len(colts) > 1:
                    chain_c, chain_p = cts, colts
            rules[section] = URIRule(
                domain, section, role, celltype, columntype,
                alteration=parse_alteration(role, lists),
                chain_class=chain_c, chain_prop=chain_p,
            )
    if pkey is None:
        raise GrammarError("pkey not found in grammar file")
    return RuleSet(domain=domain, rules=rules, lists=lists, pkey=pkey)


@dataclass
class SourceConfig:
    """One [section] of the run-options file (csv2rdf-v5.py:91-137)."""

    name: str
    file: str
    domain: str
    delimiter: str
    semantics: str
    active: bool
    # grammar-less mode extras (v1/v2 default parser options):
    # ordinal=True restores the reference's line-number subjects
    # (csv2rdf/csv2rdf.py:116) for small conformance runs — the default
    # stays pkey-column subjects (order/parallelism-independent)
    prefix: str = ""
    type_: str = "row"
    ordinal: bool = False
    # opt-in v5/v4 date_stamp provenance (csv2rdf-v5.py:64-70 —
    # DISABLED at its reference call sites, so parity output omits it):
    # an ISO date string to stamp, or "" (off). Fed from run metadata,
    # never Date.now inside tasks.
    date_stamp: str = ""


def read_options(text_or_path: str) -> list[SourceConfig]:
    """Options reader — keeps only ``active = True`` sources
    (csv2rdf-v5.py:116-137)."""
    config = _read_config(text_or_path)
    out = []
    for section in config.sections():
        sec = config[section]
        if sec.get("active") == "True":
            out.append(
                SourceConfig(
                    name=section,
                    file=sec.get("file", ""),
                    domain=sec["domain"],
                    delimiter=sec.get("delimiter", ","),
                    semantics=sec.get("semantics", ""),
                    active=True,
                    prefix=sec.get("prefix", ""),
                    type_=sec.get("type", "row"),
                    ordinal=sec.get("ordinal") == "True",
                    date_stamp=sec.get("date_stamp", ""),
                )
            )
    return out


def default_ruleset(domain: str, columns: list[str], pkey_column: str,
                    pkey_type: str = "row",
                    null_values: frozenset[str] = frozenset()) -> RuleSet:
    """Grammar-less mode (M13) — the v1/v2 default parser
    (csv2rdf/csv2rdf.py:90-132): ``subject a U(pkey_type)`` + one
    ``(subject, U(header), "cell")`` PLAIN literal per non-empty cell.
    The reference mints subjects from the line number
    (csv2rdf/csv2rdf.py:116) — order-dependent and unusable at web
    scale, so our default keys on an explicit ``pkey_column``
    (documented deviation). ``null_values`` enables the v1 FORGET
    filter (M5)."""
    rules: dict[str, Rule] = {}
    pkey = PKeyRule(domain, pkey_column, PKEY, pkey_type, "")
    rules[pkey_column] = DefaultTypeRule(domain, pkey_column, PKEY,
                                         pkey_type, "")
    for col in columns:
        if col == pkey_column:
            continue
        rules[col] = DefaultCellRule(domain, col, OBJECT, "", col)
    return RuleSet(domain=domain, rules=rules, lists={}, pkey=pkey,
                   null_values=null_values)
