"""SPARQL text front-end for the predicate-partitioned store.

The reference's end-use artifact is a literal query file
(/root/reference/csv2rdf-v4/jena/requests.sparql:1-31) run against a
Fuseki endpoint with RDFS inference (jena/test-conf.ttl:34-44,
RDFSExptRuleReasoner over the published TDB graph). This module parses
that file's SPARQL subset and PLANS it onto the Ray-native store
machinery that already answers the same four shapes programmatically:

- basic graph patterns  -> partition-pruned ``query_triples`` reads
  (sinks/store_query.py) joined on shared variables;
- ``?q rdfs:subPropertyOf ?r`` / ``rdfs:subClassOf`` patterns -> the
  driver-side TRANSITIVE closure of the (ontology-sized) schema
  partition (stages/entailment.transitive_closure) — i.e. the pattern
  is matched against the RDFS-entailed schema, exactly what the
  reference's InfModel endpoint would expose.  The closure is
  non-reflexive: rdfs6-style ``p subPropertyOf p`` bindings are
  excluded, matching the intent of the reference's versioning query
  (a reflexive binding would MINUS away every pair);
- ``CONSTRUCT``/``INSERT .. WHERE`` -> template instantiation over the
  joined bindings (the inference-principle rule, requests.sparql:9-19);
- ``MINUS`` + ``FILTER(?v != t)`` -> size-adaptive anti-join on the
  shared variables (requests.sparql:22-31).

Plan shape at scale: schema patterns never leave the driver (they are
ontology-sized); instance patterns with a constant — or a
schema-bound — predicate read ONLY the matching ``p_key=`` partition
dirs; a predicate VARIABLE bound by a schema pattern expands to pruned
reads per closure value instead of a full scan.  Nothing materializes
the store driver-side.

Beyond the reference file's four shapes, the subset also covers:

- ``OPTIONAL`` (size-adaptive left join, unbound = null) and ``{A}
  UNION {B}`` (bag semantics; legs may bind DIFFERENT variables —
  missing vars pad as unbound, though a var bound outside the union
  must be bound by every leg);
- SPARQL 1.1 aggregates ``COUNT/MIN/MAX/SUM/AVG/SAMPLE/GROUP_CONCAT``
  with ``GROUP BY`` / ``HAVING`` / ``ORDER BY`` / ``LIMIT`` /
  ``OFFSET`` (SAMPLE is the deterministic minimum term; GROUP_CONCAT
  joins sorted terms, so both are stable under any partitioning);
- ``{ SELECT ... }`` subqueries (evaluated bottom-up, joined on the
  projected vars; inner vars are scoped by projection; aggregate
  aliases surface as term-form literals, except value-preserving
  MIN/MAX/SAMPLE which keep their source representation);
- a FILTER expression subset: ``=``/``!=`` on term form (constants,
  another variable, or a bare integer), ``<``/``>``/``<=``/``>=``
  against a numeric constant, variable, or ARITHMETIC expression
  (``FILTER(?w + ?c > 100)``; compared NUMERICALLY on the bound
  term's lexical value; non-numeric terms eliminated, SPARQL
  type-error semantics), ``?v [NOT] IN (...)`` constant lists,
  ``[!]BOUND`` / ``[!]isIRI`` / ``[!]isLiteral`` / ``[!]isNumeric``
  / ``[!]isBlank`` / ``[!]sameTerm`` unary/binary tests,
  ``langMatches(LANG(?v), "range")``, and
  ``regex`` (XPath ``i``/``s``/``m`` flags as RE2 inline groups) /
  ``strstarts``/``strends``/``contains`` over ``STR(?v)`` — vectorized
  Arrow kernels inside the streaming plan. ``=``/``!=`` with a
  string-producing expression side compares RENDERED TERMS
  (``term_cmp``): plain-string values ('str' representation class —
  BIND aliases of string/arith functions) re-quote losslessly, raw
  IRIs wrap, so ``FILTER(UCASE(?n) = "X")`` and
  ``FILTER(?s = IRI(CONCAT(...)))`` answer correctly; ordering over
  two definitely-string sides compares codepoint strings;
- ``BIND(expr AS ?alias)`` computed columns: numeric arithmetic
  (``+ - * /`` with precedence and parens; division by zero and
  non-numeric operands unbind), ``ABS``/``CEIL``/``FLOOR``/``ROUND``
  (xsd half-toward-+inf), ``IF(cmp, a, b)``, ``STR``/``CONCAT``/
  ``UCASE``/``LCASE``/``STRLEN``/``SUBSTR``/``REPLACE``/``COALESCE``/
  ``STRBEFORE``/``STRAFTER``/``ENCODE_FOR_URI``/``STRLANG``/
  ``STRDT``/``LANG``/``DATATYPE``/``IRI``/``URI``/``TZ``, dateTime
  accessors ``YEAR``..``SECONDS`` and hash digests ``MD5``/``SHA1``/
  ``SHA256``/``SHA384``/``SHA512`` (aliases may feed later BINDs in
  the same group); ``SELECT (expr AS ?alias)`` projection
  expressions desugar to trailing BINDs; ``SELECT *`` projects every
  bound variable (internal path-chain vars excluded); ``ORDER BY``
  accepts expressions (hidden per-solution BINDs, dropped post-sort),
  unprojected variables, and AGGREGATES (``ORDER BY DESC(COUNT(?x))``
  — hidden synthesized agg, the top-k-groups idiom); ``GROUP BY
  (expr AS ?alias)`` desugars the key the same way; lang-tagged and
  datatyped literal CONSTANTS (``"v"@en`` / ``"v"^^xsd:int``) carry
  their decoration into term-identity matching; group-level equality
  filters PUSH INTO the pattern reads (``?p = <iri>`` prunes to one
  partition, ``?s``/``?o`` equalities become parquet row-group
  filters);
- negated property sets ``!iri`` / ``!(iri1|^iri2)`` incl. inverse
  members (a ``p != v`` filtered scan; excluded single-predicate
  partitions prune at row-group stats); ``SELECT REDUCED``
  (implemented as DISTINCT);
  ORDER BY compares numeric literals by VALUE with non-null derived
  sort keys (Ray's range sort rejects nullable keys);
- ``DISTINCT`` inside every aggregate (COUNT/SUM/AVG deduplicate
  values, GROUP_CONCAT the terms; grouped: whole-group map_groups
  pass; global: one bucketed distinct pass per aggregated column);
  inline aggregate expressions ``SUM(?a * ?b)`` desugar to hidden
  BINDs;
- ``VALUES`` inline data (single- and multi-var), ``ASK`` (limit-1
  existence plan), ``DESCRIBE`` (subject-rooted description, one
  streamed scan with a broadcast membership filter or a distributed
  semi-join above the broadcast limit);
- property paths: ``p+``/``p*``/``p?`` over instance predicates
  (ops/graph.transitive_pairs: driver BFS for ontology-sized
  partitions, semi-naive bucket-join iteration at scale; zero-length
  legs pair the pattern's IRI node domain) and the parse-time
  rewrites ``/`` (sequence), ``^`` (inverse), ``|`` (alternation —
  sequence legs allowed: each leg projects to the path endpoints
  before the union) and parenthesized sub-paths (``(a|b)/c``
  distributes at parse time; ``^(a/b)`` inverts-and-reverses).
  Modified groups close over derived edge relations: ``(p1|p2)+``
  over the UNION of the members' reads (``AltSet``), ``(p1/p2)+`` /
  ``((p1/p2)|p3)*`` over each leg's COMPOSED o->s join chain
  (``SeqSet``), and ``^(G)mod`` swaps the endpoints (inverse of a
  closure == closure of the inverses);
- SPARQL-Update: ``INSERT DATA`` / ``INSERT .. WHERE`` (set-semantics
  append of genuinely new rows), ``DELETE DATA`` / ``DELETE WHERE`` /
  ``DELETE .. WHERE`` (partition-local anti-join rewrite with atomic
  p_key-directory swap), combined ``DELETE/INSERT WHERE`` (both
  templates instantiate from the SAME pre-state bindings,
  delete-then-insert), and ``LOAD`` / ``CLEAR`` / ``DROP`` graph
  management; ``CONSTRUCT WHERE`` shorthand. Template instantiation
  enforces §16.2 validity: unbound variables and literal subjects/
  predicates contribute no triple.

Position-crossing chains (``?x p ?y . ?y q ?z``) join correctly: every
variable gets ONE canonical representation across the whole query
(``_collect_cls``) — s/p-position reads wrap raw IRIs to term form for
o-bound variables, losslessly, so literal bindings fail inner joins
and stay unbound under OPTIONAL. Each feature is gated against a
DuckDB mirror (pipelines/versioning.py).

Semantics note: plain BGPs are answered over the ASSERTED graph;
entailment enters only through schema-pattern closure and the explicit
CONSTRUCT/INSERT rules — entailment-on-demand rather than a
materialized InfModel.  ``tests/test_sparql.py`` pins hash-equality of
the parsed plans against the programmatic ``query_triples`` /
``entailed_facts`` / ``query_minus`` results.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .ntriples import RDF_TYPE
from .stages.entailment import (RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF,
                                _schema_edges, transitive_closure)

# ------------------------------------------------------------ AST


@dataclass(frozen=True)
class Var:
    name: str


@dataclass(frozen=True)
class Iri:
    value: str


@dataclass(frozen=True)
class Lit:
    value: str
    #: rendered term-form decoration suffix: "" (simple literal),
    #: "@en" (language tag) or "^^<iri>" (datatype)
    tag: str = ""


@dataclass(frozen=True)
class Num:
    """Numeric constant in a FILTER comparison (lexical form kept —
    the planner compares NUMERICALLY against the bound term's lexical
    value, so ``"900.00"`` matches ``= 900``)."""
    value: str


@dataclass
class Pattern:
    s: object
    p: object
    o: object
    # property-path modifier: '+' (one-or-more), '*' (zero-or-more),
    # '?' (zero-or-one); None == plain predicate
    path: str | None = None

    def vars(self) -> list[str]:
        return [t.name for t in (self.s, self.p, self.o)
                if isinstance(t, Var)]


@dataclass
class Filter:
    var: str
    op: str        # '=' '!=' '<' '>' '<=' '>=' | 'regex' 'strstarts'
    term: object   # | 'contains' (term = Lit pattern/fragment)


@dataclass(frozen=True)
class Func:
    """BIND expression call node: ``concat`` (n-ary) or ``str``
    (unary); leaves are Var / Iri / Lit / Num terms."""
    name: str
    args: tuple


@dataclass(frozen=True)
class Arith:
    """Numeric BIND expression node: ``l op r`` with op one of
    ``+ - * /`` — operands coerce via the lexical numeric parse
    (non-numeric terms become null, SPARQL type-error semantics)."""
    op: str
    l: object
    r: object


@dataclass(frozen=True)
class IfExpr:
    """``IF(cond, then, else)`` BIND node — cond is one comparison
    (the FILTER cmp subset); a null mask (type error) yields an
    unbound result, per spec."""
    cond: "Filter"
    then: object
    els: object


@dataclass(frozen=True)
class NegSet:
    """Negated property set ``!iri`` / ``!(iri1|iri2)`` in a path
    position: matches every triple whose predicate is NOT in the
    set (SPARQL 1.1 §9.1; forward direction only in this subset)."""
    values: tuple


@dataclass(frozen=True)
class AltSet:
    """Modified alternation group ``(iri1|iri2)+`` / ``*`` / ``?`` in
    a path position: the closure runs over the UNION of the member
    predicates' edge sets (forward single IRIs only in this subset —
    the common taxonomy idiom, e.g. ``(subClassOf|partOf)+``). The
    modifier lives on the enclosing Pattern, like a plain ``p+``."""
    values: tuple


@dataclass(frozen=True)
class SeqSet:
    """Modified path group with sequence legs, e.g. ``(p1/p2)+`` or
    ``((p1/p2)|p3)*``: the closure runs over the UNION of each leg's
    COMPOSED edge relation (the pairs connected by the leg's forward
    predicate chain — intermediates must be IRIs). Forward single-IRI
    members only; the modifier lives on the enclosing Pattern."""
    seqs: tuple  # tuple of tuples of predicate IRI strings


@dataclass(frozen=True)
class BindExpr:
    """One ``BIND(expr AS ?alias)`` in a group."""
    expr: object
    alias: str


@dataclass
class Group:
    patterns: list[Pattern] = field(default_factory=list)
    minus: list["Group"] = field(default_factory=list)
    filters: list[Filter] = field(default_factory=list)
    optionals: list["Group"] = field(default_factory=list)
    unions: list[list["Group"]] = field(default_factory=list)
    # VALUES inline data: (var names, rows of constants)
    values: list[tuple[list[str], list[list[object]]]] = \
        field(default_factory=list)
    exists: list["Group"] = field(default_factory=list)
    not_exists: list["Group"] = field(default_factory=list)
    binds: list[BindExpr] = field(default_factory=list)
    # nested { SELECT ... } subqueries — evaluated bottom-up, joined
    # with the enclosing group on the PROJECTED variables only (inner
    # non-projected vars never leak: projection scopes them)
    subqueries: list["Query"] = field(default_factory=list)
    # UNION-alternative projection: sequence legs of a path
    # alternation ((p1/p2)|p3) chain fresh intermediate variables
    # that differ between legs — project each leg down to the path's
    # endpoint variables before the union aligns column sets
    # (duplicates kept: sequence paths are bag-semantics)
    project: tuple[str, ...] | None = None


@dataclass(frozen=True)
class Agg:
    func: str                # 'count'|'min'|'max'|'sum'|'avg'
    #                          |'sample'|'group_concat'
    var: str | None          # None == COUNT(*)
    alias: str
    sep: str | None = None   # GROUP_CONCAT(...; SEPARATOR="x")
    hidden: bool = False     # synthesized for a HAVING constraint —
    #                          computed but dropped from the output
    distinct: bool = False   # COUNT(DISTINCT ?v)


@dataclass
class Query:
    form: str                # 'select' | 'construct' | 'insert'
    distinct: bool
    select_vars: list[str]
    template: list[Pattern]
    where: Group
    prefixes: dict[str, str]
    # SPARQL 1.1 aggregate extension (beyond the reference's 1.0 file)
    aggs: list[Agg] = field(default_factory=list)
    group_by: list[str] = field(default_factory=list)
    order_by: list[tuple[str, bool]] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    # HAVING constraints: (agg alias, op, numeric constant) — applied
    # to the aggregated (group-key-sized) result
    having: list[tuple[str, str, float]] = field(default_factory=list)
    # DESCRIBE resource terms (Iri constants and/or Vars)
    describe_terms: list[object] = field(default_factory=list)
    # combined DELETE {t} INSERT {t} WHERE {g} (form 'modify'):
    # ``template`` holds the deletion template, this the insertion one
    insert_template: list[Pattern] = field(default_factory=list)
    # graph-management updates: LOAD source IRI (form 'load');
    # SILENT flag for LOAD/CLEAR/DROP (errors become no-ops)
    update_iri: str | None = None
    silent: bool = False


class SparqlError(ValueError):
    pass


# ------------------------------------------------------------ lexer

_TOKEN_RE = re.compile(r"""
    (?P<iri><[^<>\s]*>)
  | (?P<string>"(?:[^"\\]|\\.)*"
      (?:@[A-Za-z]+(?:-[A-Za-z0-9]+)*
        |\^\^<[^<>\s]*>
        |\^\^[A-Za-z_][A-Za-z0-9_.\-]*:[A-Za-z0-9_.\-]*)?)
  | (?P<comment>\#[^\n]*)
  | (?P<var>\?[A-Za-z_][A-Za-z0-9_]*)
  | (?P<pname>[A-Za-z_][A-Za-z0-9_.\-]*:[A-Za-z0-9_.\-]*|:[A-Za-z0-9_.\-]+)
  | (?P<kw>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<num>-?[0-9]+(?:\.[0-9]+)?)
  | (?P<punct>!=|<=|>=|\|\||&&|=|<|>|\{|\}|\(|\)|\[|\]|\.|;|,|\*|\+|\-|\^|/|\||\?|!)
  | (?P<ws>\s+)
""", re.X)


def _tokenize(text: str) -> list[str]:
    toks, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if m is None:
            raise SparqlError(f"lexer: unexpected char {text[i]!r} at {i}")
        i = m.end()
        if m.lastgroup not in ("ws", "comment"):
            toks.append(m.group())
    return toks


# ------------------------------------------------------------ parser

_FORMS = {"select", "construct", "insert", "delete", "ask",
          "describe", "load", "clear", "drop"}
_FILTER_FUNCS = {"regex", "strstarts", "strends", "contains"}
_CMP_OPS = {"=", "!=", "<", ">", "<=", ">="}


def _is_kw(tok: str, kw: str) -> bool:
    return tok.lower() == kw and ":" not in tok


_AGG_FNS = ("count", "min", "max", "sum", "avg", "sample",
            "group_concat")

#: BIND expression functions -> (min arity, max arity)
_BIND_FNS = {"str": (1, 1), "concat": (1, 64), "ucase": (1, 1),
             "lcase": (1, 1), "strlen": (1, 1), "substr": (2, 3),
             "replace": (3, 3), "coalesce": (1, 64), "lang": (1, 1),
             "datatype": (1, 1), "strbefore": (2, 2),
             "strafter": (2, 2), "encode_for_uri": (1, 1),
             "strlang": (2, 2), "strdt": (2, 2), "abs": (1, 1),
             "ceil": (1, 1), "floor": (1, 1), "round": (1, 1),
             "year": (1, 1), "month": (1, 1), "day": (1, 1),
             "hours": (1, 1), "minutes": (1, 1), "seconds": (1, 1),
             "md5": (1, 1), "sha1": (1, 1), "sha256": (1, 1),
             "sha384": (1, 1), "sha512": (1, 1),
             "iri": (1, 1), "uri": (1, 1), "tz": (1, 1)}

#: xsd:dateTime lexical shape (date-only literals bind the date
#: fields and leave the time fields unbound; a trailing timezone is
#: ignored — the accessors read the literal's own clock time)
_DT_PAT = (r"^(?P<y>-?\d{4})-(?P<mo>\d{2})-(?P<d>\d{2})"
           r"(?:T(?P<h>\d{2}):(?P<mi>\d{2})"
           r":(?P<se>\d{2}(?:\.\d+)?))?")

_DT_FIELD = {"year": "y", "month": "mo", "day": "d",
             "hours": "h", "minutes": "mi", "seconds": "se"}

_HASH_FNS = ("md5", "sha1", "sha256", "sha384", "sha512")

#: BIND functions whose result is numeric (evaluated through
#: ``_eval_num_expr`` and rendered as a lexical numeric string)
_NUM_FNS = frozenset({"abs", "ceil", "floor", "round"})

#: BIND functions whose result is a PLAIN string — a bare lexical
#: value with no <>/"" term decoration. Their aliases live in the
#: 'str' representation class: comparisons against 'term'/'iri'-class
#: values re-quote them to rendered-term form (lossless), while the
#: SELECT projection keeps the bare value (matching SPARQL results
#: serialization, which strips decoration anyway).
_PLAIN_FNS = frozenset(
    {"str", "concat", "ucase", "lcase", "strlen", "substr", "replace",
     "strbefore", "strafter", "encode_for_uri"}
    | set(_HASH_FNS) | set(_DT_FIELD) | set(_NUM_FNS))

#: the definitely-string-producing subset of ``_PLAIN_FNS`` (excludes
#: the numeric-lexical producers STRLEN / the dateTime accessors /
#: ABS..ROUND, whose ORDERING comparisons must stay numeric)
_STRISH_FNS = frozenset(
    {"str", "concat", "ucase", "lcase", "substr", "replace",
     "strbefore", "strafter", "encode_for_uri"} | set(_HASH_FNS))


def _route_term_cmp(op: str, le, r) -> bool:
    """Whether a FILTER comparison with an expression side should
    compare rendered terms (``term_cmp``) instead of coercing both
    sides through the numeric parse (``num_cmp``, which silently
    eliminates every non-numeric row). ``=``/``!=`` route to term
    identity unless a side is definitely numeric; ordering ops use
    codepoint string comparison only when both sides are definitely
    string-producing."""
    def numericish(e) -> bool:
        return isinstance(e, (Num, Arith)) or (
            isinstance(e, Func) and e.name in _NUM_FNS)

    def strish(e) -> bool:
        return isinstance(e, Lit) or (
            isinstance(e, Func) and e.name in _STRISH_FNS)

    if op in ("=", "!="):
        return (not numericish(le) and not numericish(r)
                and (isinstance(le, (Func, IfExpr))
                     or isinstance(r, (Func, IfExpr))))
    return strish(le) and strish(r)


def _parse_agg_call(p: "_P"
                    ) -> tuple[str, str | None, str | None, bool,
                               object | None]:
    """Parse ``FN ( [DISTINCT] ?var | * | expr [; SEPARATOR="s"] )``
    — the token stream positioned AT the function name — and return
    (fn, var, sep, distinct, expr).  An expression argument
    (``SUM(?a * ?b)``, ``MIN(STRLEN(?t))``) comes back as a parsed
    BIND-expression AST with ``var is None``; the caller desugars it
    into a hidden ``BIND`` appended to the WHERE group and aggregates
    the hidden alias (the spec's per-solution evaluation order).
    SAMPLE is evaluated deterministically (the minimum term — a legal
    choice under the spec's 'any value from the group')."""
    fn = p.next().lower()
    if fn not in _AGG_FNS:
        raise SparqlError(f"unsupported aggregate {fn!r}")
    p.expect("(")
    tok = p.next()
    distinct = False
    if _is_kw(tok, "distinct"):
        # any aggregate accepts DISTINCT (SPARQL 1.1 §18.5.1).
        # COUNT/GROUP_CONCAT deduplicate terms; SUM/AVG deduplicate
        # the numeric VALUES (the SQL SUM(DISTINCT) reading — lexical
        # variants of one number collapse); MIN/MAX/SAMPLE are
        # distinct-invariant, the flag is a no-op there
        distinct = True
        tok = p.next()
        if tok == "*":
            raise SparqlError("COUNT(DISTINCT *) needs a ?var")
    expr = None
    if tok == "*":
        if fn != "count":
            raise SparqlError(f"{fn}(*) is not valid")
        var = None
    elif tok.startswith("?") and p.peek() in (")", ";"):
        var = tok[1:]
    else:
        # expression argument — rewind to its first token and parse
        # the full BIND-expression grammar
        p.i -= 1
        expr = p.bind_expr()
        var = None
    sep = None
    if p.peek() == ";":
        if fn != "group_concat":
            raise SparqlError(f"{fn}() takes no SEPARATOR")
        p.next()
        if not _is_kw(p.next(), "separator"):
            raise SparqlError("expected SEPARATOR after ';'")
        p.expect("=")
        s = p.next()
        if not (s.startswith('"') and s.endswith('"')):
            raise SparqlError("SEPARATOR needs a string constant")
        sep = s[1:-1]
    p.expect(")")
    return fn, var, sep, distinct, expr


class _P:
    def __init__(self, toks: list[str], prefixes: dict[str, str]):
        self.t = toks
        self.i = 0
        self.prefixes = prefixes

    def peek(self) -> str | None:
        return self.t[self.i] if self.i < len(self.t) else None

    def next(self) -> str:
        if self.i >= len(self.t):
            raise SparqlError("unexpected end of query")
        tok = self.t[self.i]
        self.i += 1
        return tok

    def expect(self, lit: str) -> None:
        tok = self.next()
        if tok.lower() != lit.lower():
            raise SparqlError(f"expected {lit!r}, got {tok!r}")

    def term(self):
        tok = self.next()
        if tok.startswith("?"):
            return Var(tok[1:])
        if tok.startswith("<") and tok.endswith(">"):
            return Iri(tok[1:-1])
        if tok.startswith('"'):
            # the lexer keeps any @lang / ^^datatype decoration in the
            # same token; split it off and render the term-form suffix
            m = re.match(r'^("(?:[^"\\]|\\.)*")(.*)$', tok, re.S)
            body, suffix = m.group(1)[1:-1], m.group(2)
            if not suffix:
                return Lit(body)
            if suffix.startswith("@"):
                return Lit(body, suffix)
            dt = suffix[2:]
            if dt.startswith("<") and dt.endswith(">"):
                return Lit(body, f"^^{dt}")
            pfx, local = dt.split(":", 1)
            if pfx not in self.prefixes:
                raise SparqlError(
                    f"undeclared prefix {pfx!r} in {tok!r}")
            return Lit(body, f"^^<{self.prefixes[pfx] + local}>")
        if tok[0].isdigit() or (tok[0] == "-" and len(tok) > 1
                                and tok[1].isdigit()):
            return Num(tok)
        if _is_kw(tok, "a"):
            return Iri(RDF_TYPE)
        if ":" in tok:
            pfx, local = tok.split(":", 1)
            if pfx not in self.prefixes:
                raise SparqlError(f"undeclared prefix {pfx!r} in {tok!r}")
            return Iri(self.prefixes[pfx] + local)
        raise SparqlError(f"cannot parse term {tok!r}")

    def filter_expr(self) -> Filter:
        """FILTER(?v op const) | FILTER(?v [NOT] IN (c, ...)) |
        FILTER [(] [!]BOUND(?v) [)] | FILTER [(] regex/strstarts/
        contains([str(]?v[)], "c") [)] — the subset a KG-store user
        actually writes; boolean combinators stay multi-FILTER
        conjunctions."""
        wrapped = False
        if self.peek() == "(":
            nxt = (self.t[self.i + 1].lower()
                   if self.i + 1 < len(self.t) else "")
            if nxt in _FILTER_FUNCS or nxt in (
                    "bound", "isiri", "isuri", "isliteral",
                    "isnumeric", "isblank", "langmatches",
                    "sameterm", "!"):
                wrapped = True
                self.next()
            else:
                self.next()
                f = self.cmp_expr()
                if self.peek() in ("||", "&&"):
                    # one-level disjunction/conjunction of comparisons
                    # (Kleene combination matches SPARQL's extended
                    # boolean semantics: true||error=true,
                    # false&&error=false); mixing needs parentheses,
                    # which the subset does not nest
                    op = "or" if self.peek() == "||" else "and"
                    subs = [f]
                    while self.peek() in ("||", "&&"):
                        tok2 = self.next()
                        if (tok2 == "||") != (op == "or"):
                            raise SparqlError(
                                "mixing || and && in one FILTER is "
                                "out of the supported subset")
                        subs.append(self.cmp_expr())
                    f = Filter("", op, tuple(subs))
                self.expect(")")
                return f
        tok = self.peek()
        unary = {"bound": "bound", "isiri": "is_iri",
                 "isuri": "is_iri", "isliteral": "is_literal",
                 "isnumeric": "is_numeric", "isblank": "is_blank"}
        neg = tok == "!"
        if neg:
            self.next()
            nxt2 = self.peek()
            if not (nxt2 is not None and ":" not in nxt2
                    and (nxt2.lower() in unary
                         or nxt2.lower() in _FILTER_FUNCS
                         or nxt2.lower() == "sameterm")):
                raise SparqlError(
                    "FILTER '!' supports only !BOUND/!isIRI/"
                    "!isLiteral/!isNumeric/!isBlank/!sameTerm/"
                    "!REGEX/!STRSTARTS/!STRENDS/!CONTAINS(...)")
            tok = self.peek()
        if tok is not None and ":" not in tok and _is_kw(
                tok, "sameterm"):
            # sameTerm(?a, ?b): exact term identity — equivalent to
            # '=' over the canonical string representation
            self.next()
            self.expect("(")
            a = self.term()
            self.expect(",")
            bb = self.term()
            self.expect(")")
            if wrapped:
                self.expect(")")
            if not (isinstance(a, Var) and isinstance(bb, Var)):
                raise SparqlError("sameTerm takes two ?vars")
            return Filter(a.name, "!=" if neg else "=", bb)
        if tok is not None and ":" not in tok and _is_kw(
                tok, "langmatches"):
            # langMatches(LANG(?v), "range"): case-insensitive
            # basic range match ("*" = any tagged literal;
            # "en" matches "en" and "en-US")
            self.next()
            self.expect("(")
            if not _is_kw(self.next(), "lang"):
                raise SparqlError(
                    "langMatches subset takes LANG(?var) first")
            self.expect("(")
            v = self.term()
            self.expect(")")
            self.expect(",")
            rng = self.term()
            self.expect(")")
            if wrapped:
                self.expect(")")
            if not isinstance(v, Var) or not isinstance(rng, Lit):
                raise SparqlError(
                    "langMatches needs LANG(?var) and a string range")
            if neg:
                raise SparqlError("!langMatches is unsupported")
            return Filter(v.name, "lang_matches", rng)
        if tok is not None and ":" not in tok and tok.lower() in unary:
            op = unary[self.next().lower()]
            self.expect("(")
            v = self.term()
            if not isinstance(v, Var):
                raise SparqlError(f"{op}() needs a ?var argument")
            self.expect(")")
            if wrapped:
                self.expect(")")
            return Filter(v.name, ("not_" + op) if neg else op, None)
        if neg and (tok is None or tok.lower() not in _FILTER_FUNCS):
            raise SparqlError("FILTER '!' needs a unary predicate")
        if tok is None or tok.lower() not in _FILTER_FUNCS:
            raise SparqlError(f"cannot parse FILTER at {tok!r}")
        fn = self.next().lower()
        self.expect("(")
        v = self.str_arg()
        self.expect(",")
        pat = self.term()
        if not isinstance(pat, Lit):
            raise SparqlError(f"{fn}() needs a string constant")
        if fn == "regex" and self.peek() == ",":
            # REGEX(str, pattern, flags) — the XPath flags argument.
            # RE2 supports i/s/m as inline (?ims) groups; x (ignore
            # whitespace in the pattern) and q (literal) are out of
            # the subset and raise.
            self.next()
            flags = self.term()
            if not isinstance(flags, Lit) or not set(
                    flags.value) <= set("ism"):
                raise SparqlError(
                    'REGEX flags support "i", "s", "m" only')
            if flags.value:
                pat = Lit(f"(?{flags.value}){pat.value}")
        self.expect(")")
        if wrapped:
            self.expect(")")
        return Filter(v.name, ("not_" + fn) if neg else fn, pat)

    def cmp_expr(self) -> Filter:
        left = self.bind_expr()
        if not isinstance(left, Var):
            # general comparison between numeric expressions, e.g.
            # FILTER(?w + ?c > 100) — both sides coerce through the
            # lexical numeric parse (type errors eliminate the row)
            op = self.next()
            if op not in _CMP_OPS:
                raise SparqlError(f"FILTER op {op!r} unsupported "
                                  f"(subset: {sorted(_CMP_OPS)})")
            right = self.bind_expr()
            if _route_term_cmp(op, left, right):
                return Filter("", "term_cmp", (left, op, right))
            return Filter("", "num_cmp", (left, op, right))
        v = left
        nxt = self.peek()
        if nxt is not None and (_is_kw(nxt, "in") or _is_kw(nxt, "not")):
            neg = _is_kw(nxt, "not")
            self.next()
            if neg and not _is_kw(self.next(), "in"):
                raise SparqlError("FILTER NOT here must be NOT IN")
            self.expect("(")
            consts: list[object] = []
            while True:
                t = self.term()
                if isinstance(t, Var):
                    raise SparqlError("IN list must be constants")
                consts.append(t)
                if self.peek() == ",":
                    self.next()
                    continue
                break
            self.expect(")")
            return Filter(v.name, "not_in" if neg else "in",
                          tuple(consts))
        op = self.next()
        if op not in _CMP_OPS:
            raise SparqlError(f"FILTER op {op!r} unsupported "
                              f"(subset: {sorted(_CMP_OPS)})")
        t = self.bind_expr()
        if not isinstance(t, (Num, Var, Lit, Iri)):
            # ?var op <expression>: string-producing expressions
            # compare by term identity, numeric ones by value
            if _route_term_cmp(op, v, t):
                return Filter("", "term_cmp", (v, op, t))
            return Filter("", "num_cmp", (v, op, t))
        if op not in ("=", "!=") and not isinstance(t, (Num, Var)):
            raise SparqlError(
                "ordering FILTER needs a numeric constant or a ?var")
        return Filter(v.name, op, t)

    def bind_expr(self):
        """BIND expression subset with numeric arithmetic:
        ``additive := mult (('+'|'-') mult)*``;
        ``mult := primary (('*'|'/') primary)*``;
        ``primary := FN(args) | IF(cmp, e, e) | term | '(' additive ')'``
        where FN is one of ``_BIND_FNS``."""
        e = self._mult_expr()
        while self.peek() in ("+", "-"):
            op = self.next()
            e = Arith(op, e, self._mult_expr())
        return e

    def _mult_expr(self):
        e = self._primary_expr()
        while self.peek() in ("*", "/"):
            op = self.next()
            e = Arith(op, e, self._primary_expr())
        return e

    def _primary_expr(self):
        tok = self.peek()
        if tok == "(":
            self.next()
            e = self.bind_expr()
            self.expect(")")
            return e
        if tok is not None and ":" not in tok and _is_kw(tok, "if"):
            self.next()
            self.expect("(")
            cond = self.cmp_expr()
            self.expect(",")
            then = self.bind_expr()
            self.expect(",")
            els = self.bind_expr()
            self.expect(")")
            return IfExpr(cond, then, els)
        if (tok is not None and ":" not in tok
                and tok.lower() in _BIND_FNS):
            name = self.next().lower()
            self.expect("(")
            args = [self.bind_expr()]
            while self.peek() == ",":
                self.next()
                args.append(self.bind_expr())
            self.expect(")")
            lo, hi = _BIND_FNS[name]
            if not lo <= len(args) <= hi:
                raise SparqlError(f"{name.upper()}() takes "
                                  f"{lo}..{hi} arguments")
            if name == "substr" and not all(
                    isinstance(a, Num) for a in args[1:]):
                raise SparqlError("SUBSTR positions must be integers")
            if name == "replace" and not all(
                    isinstance(a, Lit) for a in args[1:]):
                raise SparqlError("REPLACE needs string constants")
            if name in ("strbefore", "strafter") and not isinstance(
                    args[1], Lit):
                raise SparqlError(
                    f"{name.upper()} separator must be a string "
                    "constant")
            if name == "strlang":
                if not (isinstance(args[1], Lit) and re.fullmatch(
                        r"[A-Za-z]+(?:-[A-Za-z0-9]+)*", args[1].value)):
                    raise SparqlError(
                        "STRLANG tag must be a language-tag constant")
            if name == "strdt" and not isinstance(args[1], Iri):
                raise SparqlError("STRDT datatype must be an IRI")
            return Func(name, tuple(args))
        return self.term()

    def bind_clause(self) -> BindExpr:
        """``BIND ( expr AS ?alias )``"""
        self.expect("(")
        e = self.bind_expr()
        if not _is_kw(self.next(), "as"):
            raise SparqlError("BIND needs AS ?alias")
        v = self.term()
        if not isinstance(v, Var):
            raise SparqlError("BIND alias must be a ?var")
        self.expect(")")
        return BindExpr(e, v.name)

    def str_arg(self) -> Var:
        tok = self.peek()
        if tok is not None and _is_kw(tok, "str"):
            self.next()
            self.expect("(")
            v = self.term()
            self.expect(")")
        else:
            v = self.term()
        if not isinstance(v, Var):
            raise SparqlError("filter function needs a ?var argument")
        return v

    def values_block(self) -> tuple[list[str], list[list[object]]]:
        """VALUES ?x { c1 c2 } | VALUES (?x ?y) { (a b) (c d) }"""
        if self.peek() == "(":
            self.next()
            vars_: list[str] = []
            while self.peek() != ")":
                v = self.term()
                if not isinstance(v, Var):
                    raise SparqlError("VALUES header takes ?vars")
                vars_.append(v.name)
            self.next()
        else:
            v = self.term()
            if not isinstance(v, Var):
                raise SparqlError("VALUES header takes ?vars")
            vars_ = [v.name]
        if not vars_:
            raise SparqlError("empty VALUES header")
        self.expect("{")
        rows: list[list[object]] = []
        while self.peek() != "}":
            if self.peek() is None:
                raise SparqlError("unterminated VALUES block")
            if self.peek() == "(":
                self.next()
                row = []
                while self.peek() != ")":
                    row.append(self.const_term())
                self.next()
            else:
                row = [self.const_term()]
            if len(row) != len(vars_):
                raise SparqlError(
                    f"VALUES row width {len(row)} != {len(vars_)} vars")
            rows.append(row)
        self.next()
        return (vars_, rows)

    def const_term(self):
        if self.peek() is not None and _is_kw(self.peek(), "undef"):
            raise SparqlError(
                "VALUES UNDEF is out of the subset (the planner's "
                "inner joins have no unbound-wildcard rows) — split "
                "the VALUES block per defined-variable set instead")
        t = self.term()
        if not isinstance(t, (Iri, Lit)):
            raise SparqlError("VALUES rows take IRI/literal constants")
        return t

    def path_spec(self) -> list[list[tuple[bool, object, object]]]:
        """Property-path subset as alternatives of element sequences:
        ``elt := ['^'] (term ['+'|'*'|'?'] | '(' path ')')`` plus
        negated property sets; ``seq := elt ('/' elt)*``;
        ``path := seq ('|' seq)*``. Parenthesized sub-paths distribute
        at parse time into the flat alternatives-of-sequences form
        ((a|b)/c -> a/c | b/c; ^(a/b) -> ^b/^a); a modifier on a
        parenthesized group ((a|b)+) is out of the subset. A plain
        ``?var`` predicate is the single-element degenerate case."""
        def nps() -> list[list[tuple[bool, object, object]]]:
            """Negated property set — '!' consumed: ``!iri`` /
            ``!^iri`` / ``!(iri1|^iri2|...)`` (§9.1 incl. inverse
            members). Forward members exclude predicates on forward
            edges, inverse members on REVERSED edges; a mixed set is
            the spec's union of the two scans, returned as two
            alternatives that ride the '|' union machinery."""
            fwd: list[str] = []
            invm: list[str] = []
            def member():
                rev = False
                if self.peek() == "^":
                    self.next()
                    rev = True
                t = self.term()
                if not isinstance(t, Iri):
                    raise SparqlError(
                        "negated property sets take constant IRIs")
                (invm if rev else fwd).append(t.value)
            if self.peek() == "(":
                self.next()
                while True:
                    member()
                    if self.peek() == "|":
                        self.next()
                        continue
                    break
                self.expect(")")
            else:
                member()
            if self.peek() in ("+", "*", "?"):
                raise SparqlError(
                    "negated property sets take no path modifier")
            alts: list[list[tuple[bool, object, object]]] = []
            if fwd:
                alts.append([(False, NegSet(tuple(fwd)), None)])
            if invm:
                alts.append([(True, NegSet(tuple(invm)), None)])
            return alts

        def elt() -> tuple[bool, object, object]:
            inv = False
            if self.peek() == "^":
                self.next()
                inv = True
            t = self.term()
            mod = None
            if self.peek() in ("+", "*", "?"):
                mod = self.next()
            if (inv or mod) and not isinstance(t, Iri):
                raise SparqlError(
                    "property-path operators need a constant predicate")
            return (inv, t, mod)

        def invert(spec):
            # ^ distributes: reverse each sequence and flip every
            # element (^!F == !(^F): a flipped NegSet scans reversed
            # edges with the same exclusion set — spec-equal forms)
            out = []
            for seq in spec:
                leg = [(not iv, t, mod)
                       for iv, t, mod in reversed(seq)]
                out.append(leg)
            return out

        def primary() -> list[list[tuple[bool, object, object]]]:
            """One path element as a normalized sub-spec (list of
            alternative sequences) — parens and negated property sets
            may expand to alternatives, everything else is the
            single-element case."""
            if self.peek() == "!":
                self.next()
                return nps()
            inv = False
            if (self.peek() == "^" and self.i + 1 < len(self.t)
                    and self.t[self.i + 1] in ("(", "!")):
                self.next()
                inv = True
            if inv and self.peek() == "!":
                self.next()
                return invert(nps())
            if self.peek() == "(":
                self.next()
                inner = self.path_spec()
                self.expect(")")
                if self.peek() in ("+", "*", "?"):
                    # modified group: closure over the UNION of the
                    # member legs' edge relations — subset: forward
                    # constant-IRI members, no inner modifiers
                    mod = self.next()
                    if any(e[0] or e[2] is not None
                           or not isinstance(e[1], Iri)
                           for seq in inner for e in seq):
                        raise SparqlError(
                            "path modifiers on parenthesized groups "
                            "support forward constant-IRI members "
                            "only ((p1|p2)+, (p1/p2)*)")
                    # ^(G)mod: inverse of a closure == closure with
                    # the endpoints swapped — the inv flag swaps s/o
                    # at emit time, exactly like a plain ``^p+``
                    if all(len(seq) == 1 for seq in inner):
                        preds = tuple(dict.fromkeys(
                            seq[0][1].value for seq in inner))
                        return [[(inv, AltSet(preds), mod)]]
                    seqs = tuple(dict.fromkeys(
                        tuple(e[1].value for e in seq)
                        for seq in inner))
                    return [[(inv, SeqSet(seqs), mod)]]
                return invert(inner) if inv else inner
            return [[elt()]]

        alts: list[list[tuple[bool, object, object]]] = []
        cur = primary()
        while self.peek() in ("/", "|"):
            op = self.next()
            nxt = primary()
            if op == "/":
                cur = [a + b for a in cur for b in nxt]
                if len(cur) > 64:
                    raise SparqlError(
                        "path alternation distribution exceeds 64 "
                        "sequences")
            else:
                alts.extend(cur)
                cur = nxt
        alts.extend(cur)
        return alts

    def _fresh_var(self) -> Var:
        self._fresh = getattr(self, "_fresh", 0) + 1
        return Var(f"_seq{self._fresh}")

    def _emit_seq(self, out: list[Pattern], s, seq, o) -> None:
        """One element sequence: chain with fresh intermediate vars;
        inverse elements swap subject/object at emit time."""
        cur = s
        for i, (inv, t, mod) in enumerate(seq):
            nxt = o if i == len(seq) - 1 else self._fresh_var()
            if inv:
                out.append(Pattern(nxt, t, cur, mod))
            else:
                out.append(Pattern(cur, t, nxt, mod))
            cur = nxt

    def emit_path(self, out: list[Pattern], group: "Group | None",
                  s, seqs, o) -> None:
        if group is None and any(
                isinstance(t, (NegSet, AltSet, SeqSet))
                for seq in seqs for _, t, _ in seq):
            raise SparqlError(
                "negated property sets and modified path groups are "
                "not allowed in a template")
        if len(seqs) == 1:
            self._emit_seq(out, s, seqs[0], o)
            return
        if group is None:
            raise SparqlError(
                "path alternation '|' is not allowed in a template")
        # rewrite to {legA} UNION {legB}. Single-element legs bind
        # exactly the pattern's own variables, so the union var sets
        # line up as-is; sequence legs chain fresh intermediate vars
        # that differ between legs, so each leg carries a projection
        # down to the path's endpoint variables (bag semantics: one
        # solution per route survives the projection)
        if any(isinstance(t, Var) for seq in seqs for _, t, _ in seq):
            raise SparqlError("variable predicates are not allowed "
                              "inside path alternation '|'")
        endpoints = tuple(dict.fromkeys(
            t.name for t in (s, o) if isinstance(t, Var)))
        has_seq = any(len(seq) > 1 for seq in seqs)
        if has_seq and not endpoints:
            raise SparqlError(
                "path alternation with sequence legs needs a variable "
                "endpoint")
        alts = []
        for seq in seqs:
            leg = Group()
            self._emit_seq(leg.patterns, s, seq, o)
            if has_seq:
                leg.project = endpoints
            alts.append(leg)
        group.unions.append(alts)

    def node_term(self, out: list[Pattern],
                  group: "Group | None"):
        """A subject/object NODE: a plain term, or a blank-node
        property list ``[ p o ; ... ]`` — desugared to a fresh
        variable plus its inner patterns (a query blank node is an
        existential variable scoped to the group, spec §4.1.4)."""
        if self.peek() != "[":
            return self.term()
        if group is None:
            raise SparqlError(
                "blank-node property lists are not allowed in a "
                "template (they would mint per-solution blanks)")
        self.next()
        self._bn = getattr(self, "_bn", 0) + 1
        v = Var(f"_bn{self._bn}")
        while self.peek() != "]":
            seqs = self.path_spec()
            while True:
                o = self.node_term(out, group)
                self.emit_path(out, group, v, seqs, o)
                if self.peek() == ",":
                    self.next()
                    continue
                break
            if self.peek() == ";":
                self.next()
                continue
            break
        self.expect("]")
        return v

    def triples_block(self, out: list[Pattern], stop: set[str],
                      group: "Group | None" = None) -> None:
        """subject (path obj (',' obj)*) (';' path obj ...)* '.'?"""
        s = self.node_term(out, group)
        while True:
            seqs = self.path_spec()
            while True:
                o = self.node_term(out, group)
                self.emit_path(out, group, s, seqs, o)
                if self.peek() == ",":
                    self.next()
                    continue
                break
            if self.peek() == ";":
                self.next()
                if self.peek() in stop:   # dangling ';' before '}'
                    break
                continue
            break
        if self.peek() == ".":
            self.next()

    def group(self) -> Group:
        self.expect("{")
        g = Group()
        while True:
            tok = self.peek()
            if tok is None:
                raise SparqlError("unterminated group")
            if tok == "}":
                self.next()
                return g
            if tok == "{":
                nxt2 = (self.t[self.i + 1]
                        if self.i + 1 < len(self.t) else None)
                if nxt2 is not None and _is_kw(nxt2, "select"):
                    # { SELECT ... } subquery
                    self.next()   # {
                    self.next()   # select
                    g.subqueries.append(
                        _parse_select_tail(self, self.prefixes))
                    self.expect("}")
                    if self.peek() == ".":
                        self.next()
                    continue
                sub = self.group()
                if self.peek() is not None and _is_kw(self.peek(),
                                                      "union"):
                    # {A} UNION {B} (UNION {C} ...): one alternatives
                    # list per union chain
                    alts = [sub]
                    while (self.peek() is not None
                           and _is_kw(self.peek(), "union")):
                        self.next()
                        alts.append(self.group())
                    g.unions.append(alts)
                    if self.peek() == ".":
                        self.next()
                    continue
                # plain nested group: flatten
                g.patterns.extend(sub.patterns)
                g.minus.extend(sub.minus)
                g.filters.extend(sub.filters)
                g.optionals.extend(sub.optionals)
                g.unions.extend(sub.unions)
                g.binds.extend(sub.binds)
                g.subqueries.extend(sub.subqueries)
                if self.peek() == ".":
                    self.next()
                continue
            if _is_kw(tok, "minus"):
                self.next()
                g.minus.append(self.group())
                continue
            if _is_kw(tok, "optional"):
                self.next()
                g.optionals.append(self.group())
                continue
            if _is_kw(tok, "filter"):
                self.next()
                nxt = self.peek()
                if nxt is not None and _is_kw(nxt, "not"):
                    self.next()
                    if not _is_kw(self.next(), "exists"):
                        raise SparqlError("FILTER NOT must be NOT EXISTS")
                    g.not_exists.append(self.group())
                    continue
                if nxt is not None and _is_kw(nxt, "exists"):
                    self.next()
                    g.exists.append(self.group())
                    continue
                g.filters.append(self.filter_expr())
                continue
            if _is_kw(tok, "values"):
                self.next()
                g.values.append(self.values_block())
                continue
            if _is_kw(tok, "bind"):
                self.next()
                g.binds.append(self.bind_clause())
                if self.peek() == ".":
                    self.next()
                continue
            self.triples_block(g.patterns, {"}"}, group=g)
        # unreachable

    def template(self) -> list[Pattern]:
        self.expect("{")
        out: list[Pattern] = []
        while self.peek() != "}":
            self.triples_block(out, {"}"})
        self.next()
        return out


def _parse_select_tail(p: "_P", prefixes: dict[str, str]) -> Query:
    """Parse one SELECT query with the stream positioned just AFTER
    the ``SELECT`` keyword — shared by top-level statements and
    ``{ SELECT ... }`` subqueries (the modifier loops stop naturally
    at the enclosing group's ``}``)."""
    distinct = False
    if p.peek() and (_is_kw(p.peek(), "distinct")
                     or _is_kw(p.peek(), "reduced")):
        # REDUCED *permits* duplicate elimination — implementing it
        # as DISTINCT is spec-conformant and deterministic
        p.next()
        distinct = True
    sel: list[str] = []
    aggs: list[Agg] = []
    sexprs: list[BindExpr] = []
    aggbinds: list[BindExpr] = []
    if p.peek() == "*":
        # SELECT *: project every bound variable — the empty select
        # list already means exactly that on the execute path (a
        # subquery still needs an explicit list: projection scopes
        # its inner vars, and * would leak fresh chain vars)
        p.next()
    while p.peek() and (p.peek().startswith("?")
                        or p.peek() == "("):
        if p.peek().startswith("?"):
            sel.append(p.next()[1:])
            continue
        p.expect("(")
        nxt = p.peek()
        if (nxt is not None and ":" not in nxt
                and nxt.lower() in _AGG_FNS):
            fn, var, sep, adist, aexpr = _parse_agg_call(p)
            if not _is_kw(p.next(), "as"):
                raise SparqlError("aggregate needs AS ?alias")
            alias = p.next()
            if not alias.startswith("?"):
                raise SparqlError("aggregate alias must be a ?var")
            if aexpr is not None:
                # aggregate over an expression: desugar to a hidden
                # per-solution BIND appended to the WHERE group
                var = f"_aggexpr{len(aggbinds)}"
                aggbinds.append(BindExpr(aexpr, var))
            aggs.append(Agg(fn, var, alias[1:], sep=sep,
                            distinct=adist))
            p.expect(")")
            continue
        # SELECT expression: (expr AS ?alias) — desugared to a BIND
        # appended to the WHERE group (evaluates per solution, the
        # spec's projection-expression semantics)
        expr = p.bind_expr()
        if not _is_kw(p.next(), "as"):
            raise SparqlError("SELECT expression needs AS ?alias")
        alias = p.next()
        if not alias.startswith("?"):
            raise SparqlError("SELECT expression alias must be a ?var")
        sexprs.append(BindExpr(expr, alias[1:]))
        sel.append(alias[1:])
        p.expect(")")
    p.expect("where")
    where = p.group()
    if sexprs:
        where.binds.extend(sexprs)
    if aggbinds:
        # after the user's BINDs so an agg expression may reference
        # aliases bound in the group
        where.binds.extend(aggbinds)
    group_by: list[str] = []
    order_by: list[tuple[str, bool]] = []
    limit: int | None = None
    if p.peek() and _is_kw(p.peek(), "group"):
        p.next()
        if not _is_kw(p.next(), "by"):
            raise SparqlError("GROUP must be followed by BY")
        while p.peek() and (p.peek().startswith("?")
                            or p.peek() == "("):
            if p.peek().startswith("?"):
                group_by.append(p.next()[1:])
                continue
            # GROUP BY (expr AS ?alias): the key expression desugars
            # to a per-solution BIND — correct for grouping, since
            # BINDs evaluate BEFORE aggregation
            p.expect("(")
            e = p.bind_expr()
            if not _is_kw(p.next(), "as"):
                raise SparqlError(
                    "GROUP BY expressions need AS ?alias "
                    "((expr AS ?k))")
            alias = p.next()
            if not alias.startswith("?"):
                raise SparqlError("GROUP BY alias must be a ?var")
            p.expect(")")
            where.binds.append(BindExpr(e, alias[1:]))
            group_by.append(alias[1:])
    having: list[tuple[str, str, float]] = []
    if p.peek() and _is_kw(p.peek(), "having"):
        p.next()
        if p.peek() != "(":
            raise SparqlError("HAVING needs (constraint)")
        while p.peek() == "(":
            p.expect("(")
            tok = p.next()
            if tok.startswith("?"):
                # constraint over a SELECT aggregate alias
                alias = tok[1:]
                if not any(a.alias == alias for a in aggs):
                    raise SparqlError(
                        f"HAVING ?{alias}: not an aggregate "
                        f"alias")
            else:
                # inline aggregate expression -> synthesize a
                # hidden agg computed alongside the visible ones
                p.i -= 1  # push the fn token back
                fn, var, sep, adist, aexpr = _parse_agg_call(p)
                if aexpr is not None:
                    # HAVING over an expression aggregate — the WHERE
                    # group is already parsed, append directly
                    var = f"_agghav{len(having)}"
                    where.binds.append(BindExpr(aexpr, var))
                alias = f"_having{len(having)}"
                aggs.append(Agg(fn, var, alias, sep=sep,
                                hidden=True, distinct=adist))
            op = p.next()
            if op not in ("=", "!=", "<", ">", "<=", ">="):
                raise SparqlError(
                    f"HAVING op {op!r} unsupported")
            rhs = p.next()
            try:
                val = float(rhs)
            except ValueError:
                raise SparqlError(
                    "HAVING compares against a numeric "
                    f"constant, got {rhs!r}") from None
            having.append((alias, op, val))
            p.expect(")")
    if p.peek() and _is_kw(p.peek(), "order"):
        p.next()
        if not _is_kw(p.next(), "by"):
            raise SparqlError("ORDER must be followed by BY")
        # ORDER BY keys: ?var, [ASC|DESC](?var), or an EXPRESSION —
        # expressions desugar to a hidden per-solution BIND (alias
        # ``_ord{i}``, excluded from SELECT *) and the sort runs on
        # the alias column
        ordbinds: list[BindExpr] = []

        def ord_key(e, desc: bool) -> None:
            if isinstance(e, Var):
                order_by.append((e.name, desc))
                return
            alias = f"_ord{len(ordbinds)}"
            ordbinds.append(BindExpr(e, alias))
            order_by.append((alias, desc))

        def ord_agg(desc: bool) -> None:
            # ORDER BY [DESC](COUNT(?x) ...): synthesize a hidden
            # aggregate computed alongside the visible ones (the
            # HAVING mechanism) and sort on its alias — the top-k-
            # groups idiom
            fn, var, sep, adist, aexpr = _parse_agg_call(p)
            if aexpr is not None:
                var = f"_aggord{len(aggs)}"
                where.binds.append(BindExpr(aexpr, var))
            alias = f"_ordagg{len(aggs)}"
            aggs.append(Agg(fn, var, alias, sep=sep, hidden=True,
                            distinct=adist))
            order_by.append((alias, desc))

        def _is_agg(tok) -> bool:
            return (tok is not None and ":" not in tok
                    and tok.lower() in _AGG_FNS)

        while p.peek() is not None:
            nxt = p.peek()
            if nxt.startswith("?"):
                p.next()
                order_by.append((nxt[1:], False))
                continue
            if _is_kw(nxt, "desc") or _is_kw(nxt, "asc"):
                desc = nxt.lower() == "desc"
                p.next()
                p.expect("(")
                if _is_agg(p.peek()):
                    ord_agg(desc)
                else:
                    ord_key(p.bind_expr(), desc)
                p.expect(")")
                continue
            if _is_agg(nxt):
                ord_agg(False)
                continue
            if ":" not in nxt and (nxt.lower() in _BIND_FNS
                                   or nxt == "("):
                ord_key(p.bind_expr(), False)
                continue
            break
        if ordbinds:
            if aggs or group_by:
                # BINDs evaluate per solution BEFORE aggregation, so
                # an expression key over a grouped result would read
                # pre-aggregation values — reject rather than mis-sort
                raise SparqlError(
                    "ORDER BY expressions with aggregates are out of "
                    "the subset — bind the expression to a SELECT "
                    "alias ((expr AS ?k) ... ORDER BY ?k)")
            where.binds.extend(ordbinds)
    offset: int | None = None
    while p.peek() and (_is_kw(p.peek(), "limit")
                        or _is_kw(p.peek(), "offset")):
        kw = p.next().lower()
        n = p.next()
        if not n.isdigit():
            raise SparqlError(
                f"{kw.upper()} needs an integer, got {n!r}")
        if kw == "limit":
            if limit is not None:
                raise SparqlError("duplicate LIMIT")
            limit = int(n)
        else:
            if offset is not None:
                raise SparqlError("duplicate OFFSET")
            offset = int(n)
    if sexprs and (aggs or group_by):
        raise SparqlError(
            "SELECT expressions cannot mix with aggregates/GROUP BY "
            "in this subset (BIND the expression in the WHERE group "
            "and aggregate the alias)")
    if aggs:
        keys = group_by or sel
        bad = [v for v in sel if v not in keys]
        if bad:
            raise SparqlError(
                f"non-aggregated vars {bad} must appear in "
                f"GROUP BY")
    if having and not aggs:
        raise SparqlError("HAVING needs an aggregate query")
    return Query("select", distinct, sel, [], where,
                 dict(prefixes), aggs=aggs,
                 group_by=group_by, order_by=order_by,
                 limit=limit, offset=offset, having=having)


def parse_sparql(text: str) -> list[Query]:
    """Parse a .sparql FILE (the reference keeps several statements in
    one file separated by comment banners) into a list of queries."""
    toks = _tokenize(text)
    prefixes: dict[str, str] = {}
    queries: list[Query] = []
    p = _P(toks, prefixes)
    while p.peek() is not None:
        tok = p.peek()
        if _is_kw(tok, "prefix"):
            p.next()
            name = p.next()
            if not name.endswith(":"):
                raise SparqlError(f"bad PREFIX name {name!r}")
            iri = p.next()
            if not (iri.startswith("<") and iri.endswith(">")):
                raise SparqlError(f"bad PREFIX iri {iri!r}")
            prefixes[name[:-1]] = iri[1:-1]
            continue
        low = tok.lower()
        if low not in _FORMS:
            raise SparqlError(f"expected a query form, got {tok!r}")
        p.next()
        if low == "select":
            queries.append(_parse_select_tail(p, prefixes))
        elif low == "ask":
            # ASK { ... } | ASK WHERE { ... }
            if p.peek() and _is_kw(p.peek(), "where"):
                p.next()
            queries.append(Query("ask", False, [], [], p.group(),
                                 dict(prefixes)))
        elif low == "describe":
            # DESCRIBE <iri>... | DESCRIBE ?x... WHERE { ... }
            terms: list[object] = []
            while p.peek() is not None and not _is_kw(p.peek(), "where"):
                nxt = p.peek()
                if not (nxt.startswith("?") or nxt.startswith("<")
                        or ":" in nxt):
                    break
                t = p.term()
                if not isinstance(t, (Var, Iri)):
                    raise SparqlError("DESCRIBE takes IRIs or ?vars")
                terms.append(t)
            if not terms:
                raise SparqlError("DESCRIBE needs at least one term")
            if p.peek() is not None and _is_kw(p.peek(), "where"):
                p.next()
                where = p.group()
            else:
                if any(isinstance(t, Var) for t in terms):
                    raise SparqlError("DESCRIBE ?var needs a WHERE group")
                where = Group()
            queries.append(Query("describe", False, [], [], where,
                                 dict(prefixes), describe_terms=terms))
        elif low == "load":
            # LOAD [SILENT] <source-iri> — file:// or plain path; the
            # single-graph subset rejects INTO GRAPH
            silent = False
            if p.peek() is not None and _is_kw(p.peek(), "silent"):
                p.next()
                silent = True
            src = p.term()
            if not isinstance(src, Iri):
                raise SparqlError("LOAD needs a source IRI")
            if p.peek() is not None and _is_kw(p.peek(), "into"):
                raise SparqlError("LOAD INTO GRAPH is out of the "
                                  "subset (single-graph store)")
            queries.append(Query("load", False, [], [], Group(),
                                 dict(prefixes), update_iri=src.value,
                                 silent=silent))
        elif low in ("clear", "drop"):
            # CLEAR/DROP [SILENT] DEFAULT|ALL — equal in a
            # single-graph store; NAMED/GRAPH forms rejected
            silent = False
            if p.peek() is not None and _is_kw(p.peek(), "silent"):
                p.next()
                silent = True
            tgt = p.next()
            if tgt is None or tgt.lower() not in ("default", "all"):
                raise SparqlError(
                    f"{low.upper()} supports DEFAULT or ALL only "
                    "(single-graph store)")
            queries.append(Query("clear", False, [], [], Group(),
                                 dict(prefixes), silent=silent))
        elif low in ("insert", "delete") and p.peek() is not None \
                and _is_kw(p.peek(), "data"):
            # INSERT DATA / DELETE DATA { ground triples } — no WHERE
            p.next()
            tmpl = p.template()
            if any(pat.vars() for pat in tmpl):
                raise SparqlError(f"{low.upper()} DATA must be "
                                  "ground (no variables)")
            queries.append(Query(low, True, [], tmpl, Group(),
                                 dict(prefixes)))
        elif low in ("delete", "construct") and p.peek() is not None \
                and _is_kw(p.peek(), "where"):
            # DELETE WHERE / CONSTRUCT WHERE { patterns } — the
            # pattern group doubles as the template (1.1 shorthand)
            p.next()
            g = p.group()
            if not g.patterns:
                raise SparqlError(f"{low.upper()} WHERE needs "
                                  "triple patterns")
            if any(pat.path for pat in g.patterns):
                raise SparqlError(f"{low.upper()} WHERE template must "
                                  "use plain predicates (no path ops)")
            tmpl = [Pattern(pat.s, pat.p, pat.o) for pat in g.patterns]
            queries.append(Query(low, True, [], tmpl, g,
                                 dict(prefixes)))
        else:
            tmpl = p.template()
            ins = None
            if low == "delete" and p.peek() is not None \
                    and _is_kw(p.peek(), "insert"):
                # combined DELETE {t} INSERT {t} WHERE {g}: one WHERE
                # evaluation feeds both templates (deletes applied
                # first, inserts second, both from the PRE-state
                # bindings — SPARQL 1.1 Update §3.1.3)
                p.next()
                ins = p.template()
            if p.peek() is not None and _is_kw(p.peek(), "using"):
                raise SparqlError(
                    "USING named-graph clauses are out of the subset "
                    "(single-graph store)")
            p.expect("where")
            g = p.group()
            if ins is not None:
                queries.append(Query("modify", True, [], tmpl, g,
                                     dict(prefixes),
                                     insert_template=ins))
            else:
                queries.append(Query(low, True, [], tmpl, g,
                                     dict(prefixes)))
    return queries


# ------------------------------------------------------------ planner

_SCHEMA_PREDS = (RDFS_SUBPROPERTYOF, RDFS_SUBCLASSOF)


def _broadcast_limit() -> int:
    """A minus side at or below this row count broadcasts into the
    anti-join instead of shuffling (0 forces the hash-join path —
    same knob as the canonicalize/dedup stages)."""
    return int(os.environ.get("KGFORGE_BROADCAST_LIMIT", "200000"))


def _batch_guard(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    # coalesce zero-column empty blocks away (they poison Acero joins)
    from .stages.canonicalize import SANITIZE_BATCH
    return ds.map_batches(lambda t: t, batch_format="pyarrow",
                          batch_size=SANITIZE_BATCH)


class _Bind:
    """Current solution bindings: columns = variable names. ``cls``
    remembers each variable's term-position class ('iri' for s/p
    positions, 'term' for o positions — the store renders o).
    ``columns`` is tracked explicitly: an empty Dataset (e.g. a pattern
    over a store partition that does not exist) has NO schema, so the
    plan can never rely on ``Dataset.schema()`` for its column set."""

    def __init__(self, data, cls: dict[str, str],
                 columns: list[str] | None = None):
        self.data = data                     # pa.Table | Dataset
        self.cls = cls
        if columns is None:
            columns = (data.schema.names if isinstance(data, pa.Table)
                       else data.schema().names)
        self.columns = list(columns)

    @property
    def small(self) -> bool:
        return isinstance(self.data, pa.Table)

    def cols(self) -> list[str]:
        return list(self.columns)


def _const_repr(term, pos_cls: str) -> str:
    if isinstance(term, Iri):
        if pos_cls == "str":
            # plain-string columns hold literal values; an IRI
            # constant is never term-equal to one (unmatchable
            # sentinel: '\x00' cannot appear in a parsed IRI)
            return "\x00<no-term>"
        return f"<{term.value}>" if pos_cls == "term" else term.value
    if isinstance(term, Lit):
        return (term.value if pos_cls == "str"
                else f'"{term.value}"{term.tag}')
    if isinstance(term, Num):
        # exact-form term identity (the store renders integer literals
        # with their lexical value) — used by = / != / IN lists
        return term.value if pos_cls == "str" else f'"{term.value}"'
    raise SparqlError(f"not a constant: {term}")


def _values_repr(term, pos_cls: str) -> str:
    """A VALUES constant in the variable's canonical representation:
    raw IRI for 'iri'-class vars, rendered term form otherwise."""
    if isinstance(term, Iri):
        return term.value if pos_cls == "iri" else f"<{term.value}>"
    if isinstance(term, Lit):
        return f'"{term.value}"{term.tag}'
    raise SparqlError(f"not a VALUES constant: {term}")


def _closure_table(store_dir: str, pred: str) -> pa.Table:
    """Non-reflexive transitive closure of one schema predicate as
    (sub, sup) — the RDFS-entailed view of the pattern."""
    clo = transitive_closure(_schema_edges(store_dir, pred))
    subs, sups = [], []
    for a in sorted(clo):
        for b in sorted(clo[a]):
            subs.append(a)
            sups.append(b)
    return pa.table({"sub": pa.array(subs, type=pa.string()),
                     "sup": pa.array(sups, type=pa.string())})


def _pattern_cols(pat: Pattern) -> dict[str, str]:
    """store column -> variable name for the pattern's variables."""
    out = {}
    for col, t in (("s", pat.s), ("p", pat.p), ("o", pat.o)):
        if isinstance(t, Var):
            out[col] = t.name
    return out


def _wrap_iri(arr) -> pa.Array:
    return pc.binary_join_element_wise(
        pa.scalar("<"),
        arr.combine_chunks().cast(pa.string())
        if isinstance(arr, pa.ChunkedArray) else arr.cast(pa.string()),
        pa.scalar(">"), "")


def _eval_schema_pattern(store_dir: str, pat: Pattern,
                         cls: dict[str, str]) -> pa.Table:
    tbl = _closure_table(store_dir, pat.p.value)
    if pat.path in ("*", "?"):
        # the closure view already entails `p` == `p+` here, so both
        # zero-X modifiers only ADD the reflexive pairs: a constant
        # endpoint pairs with itself; with two variables the domain is
        # the closed class/property hierarchy (subset: schema nodes,
        # not every graph term)
        if isinstance(pat.s, Iri):
            dom = [pat.s.value]
        elif isinstance(pat.o, Iri):
            dom = [pat.o.value]
        else:
            dom = sorted(set(tbl["sub"].to_pylist())
                         | set(tbl["sup"].to_pylist()))
        refl = pa.table({"sub": pa.array(dom, pa.string()),
                         "sup": pa.array(dom, pa.string())})
        # distinct: a cyclic hierarchy's closure already holds (x, x)
        tbl = (pa.concat_tables([tbl, refl])
               .group_by(["sub", "sup"]).aggregate([]))
    mask = None
    for col, t in (("sub", pat.s), ("sup", pat.o)):
        if not isinstance(t, Var):
            want = t.value if isinstance(t, Iri) else t.value
            m = pc.equal(tbl[col], want)
            mask = m if mask is None else pc.and_(mask, m)
    if mask is not None:
        tbl = tbl.filter(mask)
    if (isinstance(pat.s, Var) and isinstance(pat.o, Var)
            and pat.s.name == pat.o.name):
        # repeated variable == equality between the positions (the
        # closure is non-reflexive, so this is normally empty)
        tbl = tbl.filter(pc.equal(tbl["sub"], tbl["sup"]))
    names, arrays = [], []
    for col, t in (("sub", pat.s), ("sup", pat.o)):
        if isinstance(t, Var) and t.name not in names:
            arr = tbl[col]
            if cls.get(t.name) == "term":
                arr = _wrap_iri(arr)   # closure stores raw IRIs
            names.append(t.name)
            arrays.append(arr)
    return pa.table(dict(zip(names, arrays)))


def _eval_store_pattern(store_dir: str, pat: Pattern,
                        p_values: list[str] | None,
                        cls: dict[str, str],
                        eq_hints: dict[str, str] | None = None
                        ) -> "ray.data.Dataset":
    """One triple pattern -> Dataset of its variable columns, each in
    the variable's canonical representation (s/p raw IRIs are WRAPPED
    to term form for 'term'-class variables so position-crossing
    chains join correctly — see ``_collect_cls``).
    ``p_values``: when the predicate is a variable already bound to a
    small value set, expand to pruned reads (one partition dir per
    value) instead of a full scan."""
    from .sinks.store_query import query_triples
    s = pat.s.value if isinstance(pat.s, Iri) else None
    o = _const_repr(pat.o, "term") if not isinstance(pat.o, Var) else None
    if eq_hints:
        # group-filter equality pushdown (see _eval_group): the same
        # constraint the filter enforces, applied at the parquet read
        s = s if s is not None else eq_hints.get("s")
        o = o if o is not None else eq_hints.get("o")
    if isinstance(pat.p, Iri):
        ds = query_triples(store_dir, s=s, p=pat.p.value, o=o)
    elif isinstance(pat.p, NegSet):
        ds = query_triples(store_dir, s=s, o=o,
                           p_not=list(pat.p.values))
    elif p_values is not None:
        parts = [query_triples(store_dir, s=s, p=v, o=o)
                 for v in p_values]
        if not parts:
            sch = pa.schema([("s", pa.string()), ("p", pa.string()),
                             ("o", pa.string())])
            ds = ray.data.from_arrow(sch.empty_table())
        else:
            ds = parts[0]
            for e in parts[1:]:
                ds = ds.union(e)
    else:
        ds = query_triples(store_dir, s=s, o=o)
    ren = _pattern_cols(pat)
    wrap = {c for c, v in ren.items()
            if c in ("s", "p") and cls.get(v) == "term"}
    out_vars = list(dict.fromkeys(ren.values()))

    def project(b: pa.Table, _ren=dict(ren), _wrap=frozenset(wrap)
                ) -> pa.Table:
        arrs = {c: (_wrap_iri(b[c]) if c in _wrap
                    else b[c].combine_chunks().cast(pa.string()))
                for c in _ren}
        first: dict[str, str] = {}
        mask = None
        for c, v in _ren.items():
            if v in first:
                # a variable repeated within ONE pattern (e.g.
                # {?x p ?x}, self-loops) is an equality constraint
                # between its positions, compared in the variable's
                # canonical representation
                m = pc.equal(arrs[first[v]], arrs[c])
                mask = m if mask is None else pc.and_(mask, m)
            else:
                first[v] = c
        if mask is not None:
            keep = pc.fill_null(
                mask.combine_chunks() if isinstance(mask, pa.ChunkedArray)
                else mask, False)
            arrs = {c: arrs[c].filter(keep) for c in arrs}
        return pa.table({v: arrs[first[v]] for v in first})

    out = ds.map_batches(project, batch_format="pyarrow")
    if ren:
        # a pattern over a missing partition yields a block-less Dataset
        # with no schema; union a typed empty table so downstream plan
        # steps (cols(), joins) always see the variable columns
        sch = pa.schema([(v, pa.string()) for v in out_vars])
        out = ray.data.from_arrow(sch.empty_table()).union(out)
    return out


def _join_small(a: pa.Table, b: pa.Table, on: list[str]) -> pa.Table:
    if not on:
        raise SparqlError("cartesian product between patterns unsupported")
    return a.join(b, keys=on, join_type="inner")


def _broadcast_join(ds: "ray.data.Dataset", tbl: pa.Table,
                    on: list[str]) -> "ray.data.Dataset":
    def jn(b: pa.Table, _t=tbl, _on=list(on)) -> pa.Table:
        return b.join(_t, keys=_on, join_type="inner")

    return ds.map_batches(jn, batch_format="pyarrow")


def _anti_join(bind: _Bind, minus: _Bind, on: list[str]) -> _Bind:
    """MINUS: drop solutions compatible with any minus solution on the
    shared variables. Size-adaptive: broadcast below the limit, else a
    hash-partitioned left-outer join (same shape as
    store_query.query_minus)."""
    from .stages.canonicalize import default_shuffle_partitions
    if not on:
        return bind
    if minus.small:
        mt = minus.data.select(on)
        import polars as pl
        mt = pl.from_arrow(mt).unique().to_arrow().cast(mt.schema)
        if bind.small:
            marked = mt.append_column(
                "_hit", pa.array([1] * mt.num_rows, type=pa.int8()))
            j = bind.data.join(marked, keys=on, join_type="left outer")
            out = j.filter(pc.is_null(j["_hit"])).drop_columns(["_hit"])
            return _Bind(out, bind.cls)

        def anti(b: pa.Table, _mt=mt, _on=list(on)) -> pa.Table:
            marked = _mt.append_column(
                "_hit", pa.array([1] * _mt.num_rows, type=pa.int8()))
            j = b.join(marked, keys=_on, join_type="left outer")
            return (j.filter(pc.is_null(j["_hit"]))
                    .drop_columns(["_hit"]).select(b.schema.names))

        return _Bind(bind.data.map_batches(anti, batch_format="pyarrow"),
                     bind.cls, bind.cols())
    # big minus side: distinct + hash-partitioned anti-join
    from .stages.dedup import distinct
    mds = _batch_guard(distinct(minus.data, on)).materialize()
    if mds.count() == 0:        # empty minus: nothing to subtract (an
        return bind             # empty Dataset has no schema and would
                                # poison the Acero join below)

    def tag(b: pa.Table) -> pa.Table:
        cols = {f"_m_{c}": b[c] for c in on}
        cols["_hit"] = pa.array([1] * b.num_rows, type=pa.int8())
        return pa.table(cols)

    mds = mds.map_batches(tag, batch_format="pyarrow")
    left = bind.data if not bind.small else ray.data.from_arrow(bind.data)
    left_cols = bind.cols()
    j = _batch_guard(left).join(
        mds, join_type="left_outer",
        num_partitions=default_shuffle_partitions(),
        on=tuple(on), right_on=tuple(f"_m_{c}" for c in on))

    def unmatched(b: pa.Table, _cols=list(left_cols)) -> pa.Table:
        return b.filter(pc.is_null(b["_hit"])).select(_cols)

    return _Bind(_batch_guard(j.map_batches(unmatched,
                                            batch_format="pyarrow")),
                 bind.cls, bind.cols())


def _left_join(bind: _Bind, opt: _Bind, on: list[str]) -> _Bind:
    """OPTIONAL: left-outer join on the shared variables — unmatched
    solutions keep their row with the optional vars null (unbound).
    Size-adaptive like the other joins: arrow join when both sides are
    driver-sized, per-batch broadcast join for a small optional side,
    hash-partitioned Dataset left_outer otherwise."""
    from .stages.canonicalize import default_shuffle_partitions
    if not on:
        raise SparqlError("OPTIONAL must share a variable with the group")
    cls = dict(bind.cls)
    cls.update(opt.cls)
    joined = bind.cols() + [c for c in opt.cols() if c not in bind.cols()]
    if opt.small:
        ot = opt.data.select(on + [c for c in opt.cols() if c not in on])
        if bind.small:
            j = bind.data.join(ot, keys=on, join_type="left outer")
            return _Bind(j.select(joined), cls, joined)

        def jn(b: pa.Table, _t=ot, _on=list(on), _j=list(joined)
               ) -> pa.Table:
            return b.join(_t, keys=_on, join_type="left outer").select(_j)

        return _Bind(bind.data.map_batches(jn, batch_format="pyarrow"),
                     cls, joined)
    # big optional side: hash-partitioned left_outer, keys prefixed so
    # the join output keeps the left copy
    payload = [c for c in opt.cols() if c not in on]

    def tag(b: pa.Table, _on=list(on)) -> pa.Table:
        cols = {f"_o_{c}": b[c] for c in _on}
        for c in payload:
            cols[c] = b[c]
        return pa.table(cols)

    ods = _batch_guard(opt.data.map_batches(tag, batch_format="pyarrow"))
    left = (ray.data.from_arrow(bind.data) if bind.small else bind.data)
    j = _batch_guard(left).join(
        ods, join_type="left_outer",
        num_partitions=default_shuffle_partitions(),
        on=tuple(on), right_on=tuple(f"_o_{c}" for c in on))
    return _Bind(_batch_guard(j.map_batches(
        lambda b, _j=list(joined): b.select(_j),
        batch_format="pyarrow")), cls, joined)


#: STR() of a term-position value: strip <..> / "..."[^^<dt>] down to
#: the lexical form (s/p positions already hold raw IRIs).
_STR_IRI_RE = r"^<(.*)>$"
_STR_LIT_RE = r'^"(.*)"(?:\^\^<[^>]*>|@[A-Za-z][A-Za-z0-9\-]*)?$'
_NUMERIC_RE = r"^-?[0-9]+(?:\.[0-9]+)?$"

_CMP_KERNELS = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less,
                ">": pc.greater, "<=": pc.less_equal,
                ">=": pc.greater_equal}


def _str_form(col, pos_cls: str):
    if pos_cls != "term":
        return col
    a = pc.replace_substring_regex(col, _STR_IRI_RE, r"\1")
    return pc.replace_substring_regex(a, _STR_LIT_RE, r"\1")


def _numeric_form(col, pos_cls: str):
    """Lexical -> float64; non-numeric terms become null, so the
    comparison eliminates them (SPARQL type-error semantics)."""
    s = _str_form(col, pos_cls)
    ok = pc.match_substring_regex(s, _NUMERIC_RE)
    return pc.cast(pc.if_else(ok, s, pa.scalar(None, pa.string())),
                   pa.float64())


def _term_space_col(a, pos_cls: str):
    """Normalize a bound column into rendered-term space so values
    from different representation classes compare by term identity:
    raw IRIs wrap to ``<...>``, plain strings quote to ``"..."``
    (both lossless; nulls stay null)."""
    a = _chunked(a).cast(pa.string())
    if pos_cls == "iri":
        return _wrap_iri(a)
    if pos_cls == "str":
        n = len(a)
        q = pa.array(['"'] * n, pa.string())
        return pc.binary_join_element_wise(q, a, q, "")
    return a


def _expr_repr(e, cls: dict[str, str]) -> str:
    """Representation class of a FILTER/BIND expression's value."""
    if isinstance(e, Var):
        return cls.get(e.name, "iri")
    if isinstance(e, Iri):
        return "iri"
    if isinstance(e, (Num, Arith)):
        return "str"
    if isinstance(e, Func):
        if e.name in ("iri", "uri"):
            return "iri"
        if e.name in _PLAIN_FNS:
            return "str"
    return "term"


def _term_expr(b: pa.Table, e, cls: dict[str, str]):
    """One side of a term-identity FILTER comparison, evaluated into
    rendered-term space."""
    return _term_space_col(_chunked(_eval_bind_expr(b, e, cls)),
                           _expr_repr(e, cls))


def _filter_mask(b: pa.Table, f: Filter, cls: dict[str, str]):
    if f.op in ("or", "and"):
        comb = pc.or_ if f.op == "or" else pc.and_
        m = None
        for sub in f.term:
            sm = _filter_mask(b, sub, cls)
            m = sm if m is None else comb(m, sm)
        return m
    if f.op == "num_cmp":
        le, op, r = f.term
        return _CMP_KERNELS[op](_eval_num_expr(b, le, cls),
                                _eval_num_expr(b, r, cls))
    if f.op == "term_cmp":
        # string-space comparison: both sides normalized to rendered-
        # term form (num_cmp would coerce them to numbers and silently
        # eliminate every non-numeric row)
        le, op, r = f.term
        return _CMP_KERNELS[op](_term_expr(b, le, cls),
                                _term_expr(b, r, cls))
    col = b[f.var]
    pos = cls.get(f.var, "iri")
    if f.op in ("bound", "not_bound"):
        m = pc.is_valid(col)
        return m if f.op == "bound" else pc.invert(m)
    if f.op in ("is_iri", "not_is_iri", "is_literal", "not_is_literal"):
        c = col.combine_chunks().cast(pa.string())
        bound = pc.is_valid(c)
        if pos == "iri":
            # raw-IRI representation: every bound value IS an IRI
            m = bound if "is_iri" in f.op else pc.and_(
                bound, pc.invert(bound))
        elif pos == "str":
            # plain-string representation: every bound value is a
            # literal
            m = (pc.and_(bound, pc.invert(bound))
                 if "is_iri" in f.op else bound)
        else:
            m = pc.starts_with(c, "<" if "is_iri" in f.op else '"')
        if f.op.startswith("not_"):
            # unbound is a type error either way -> row eliminated
            return pc.and_(bound, pc.invert(m))
        return m
    if f.op in ("is_numeric", "not_is_numeric"):
        m = pc.is_valid(_numeric_form(col, pos))
        if f.op == "is_numeric":
            return m
        return pc.and_(pc.is_valid(col), pc.invert(m))
    if f.op in ("is_blank", "not_is_blank"):
        c = col.combine_chunks().cast(pa.string())
        bound = pc.is_valid(c)
        if pos == "str":
            # plain strings are literals, never blank nodes
            m = pc.and_(bound, pc.invert(bound))
        else:
            m = pc.and_(bound, pc.fill_null(pc.starts_with(c, "_:"),
                                            False))
        if f.op == "is_blank":
            return m
        return pc.and_(bound, pc.invert(m))
    if f.op == "lang_matches":
        c = col.combine_chunks().cast(pa.string())
        if pos == "iri":
            # raw-IRI representation carries no language tag
            return pc.and_(pc.is_valid(c), pc.invert(pc.is_valid(c)))
        lit_body = r'"(?:[^"\\]|\\.)*"'
        tag = pc.struct_field(pc.extract_regex(
            c, f'^{lit_body}@(?P<l>[A-Za-z][A-Za-z0-9\\-]*)$'), "l")
        rng = f.term.value.lower()
        if rng == "*":
            m = pc.is_valid(tag)
        else:
            tl = pc.utf8_lower(pc.fill_null(tag, ""))
            m = pc.or_(pc.equal(tl, rng),
                       pc.starts_with(tl, rng + "-"))
        return pc.fill_null(m, False)
    if f.op in ("in", "not_in"):
        if all(isinstance(t, Num) for t in f.term):
            # numeric list: same comparison semantics as ``= n``
            nf = _numeric_form(col, pos)
            m = None
            for t in f.term:
                e = pc.equal(nf, float(t.value))
                m = e if m is None else pc.or_(m, e)
        elif any(isinstance(t, Num) for t in f.term):
            raise SparqlError(
                "IN list must not mix numeric and IRI/string constants")
        else:
            want = pa.array([_const_repr(t, pos) for t in f.term],
                            pa.string())
            m = pc.is_in(col.combine_chunks(), value_set=want)
        if f.op == "in":
            return m
        # NOT IN: an unbound value is a type error -> row eliminated
        # (is_in yields false on null, so bare invert would KEEP it)
        return pc.and_(pc.is_valid(col), pc.invert(m))
    fbase = f.op[4:] if f.op.startswith("not_") else f.op
    if fbase in _FILTER_FUNCS:
        s = _str_form(col, pos)
        if fbase == "regex":
            m = pc.match_substring_regex(s, f.term.value)
        elif fbase == "strstarts":
            m = pc.starts_with(s, f.term.value)
        elif fbase == "strends":
            m = pc.ends_with(s, f.term.value)
        else:
            m = pc.match_substring(s, f.term.value)
        # negation: unbound input is a type error either way (null
        # inverts to null, which the row filter drops)
        return pc.invert(m) if f.op.startswith("not_") else m
    if isinstance(f.term, Var):
        # var-vs-var: ordering ops compare the NUMERIC lexical values
        # (non-numeric -> null -> row eliminated, type-error
        # semantics); = / != compare term identity — when the two
        # variables live in different canonical representations the
        # raw-IRI side is wrapped to term form (lossless)
        rcol = b[f.term.name]
        rpos = cls.get(f.term.name, "iri")
        if f.op in ("=", "!="):
            l, r = col.combine_chunks(), rcol.combine_chunks()
            if pos != rpos:
                l = _term_space_col(l, pos)
                r = _term_space_col(r, rpos)
            return _CMP_KERNELS[f.op](l, r)
        return _CMP_KERNELS[f.op](_numeric_form(col, pos),
                                  _numeric_form(rcol, rpos))
    if isinstance(f.term, Num):
        return _CMP_KERNELS[f.op](_numeric_form(col, pos),
                                  float(f.term.value))
    want = _const_repr(f.term, pos)
    if f.op not in ("=", "!="):
        raise SparqlError("ordering FILTER needs a numeric constant")
    return _CMP_KERNELS[f.op](col, want)


def _expr_vars(expr) -> set[str]:
    """Every variable a BIND expression tree references."""
    if isinstance(expr, Var):
        return {expr.name}
    if isinstance(expr, Arith):
        return _expr_vars(expr.l) | _expr_vars(expr.r)
    if isinstance(expr, IfExpr):
        return (_filter_vars(expr.cond) | _expr_vars(expr.then)
                | _expr_vars(expr.els))
    if isinstance(expr, Func):
        out: set[str] = set()
        for a in expr.args:
            out |= _expr_vars(a)
        return out
    return set()


def _filter_vars(f: Filter) -> set[str]:
    """Every variable a filter references (left side, plus the right
    side when the comparison is var-vs-var; the union over a
    combinator's branches; both expression trees for num_cmp)."""
    if f.op in ("or", "and"):
        out: set[str] = set()
        for sub in f.term:
            out |= _filter_vars(sub)
        return out
    if f.op in ("num_cmp", "term_cmp"):
        le, _, r = f.term
        return _expr_vars(le) | _expr_vars(r)
    out = {f.var}
    if isinstance(f.term, Var):
        out.add(f.term.name)
    return out


def _apply_filters(bind: _Bind, filters: list[Filter]) -> _Bind:
    pend = [f for f in filters
            if _filter_vars(f) <= set(bind.cols())]
    if not pend:
        return bind

    def flt(b: pa.Table, _fs=list(pend), _cls=dict(bind.cls)) -> pa.Table:
        mask = None
        for f_ in _fs:
            m = _filter_mask(b, f_, _cls)
            mask = m if mask is None else pc.and_(mask, m)
        return b.filter(mask)

    if bind.small:
        return _Bind(flt(bind.data), bind.cls, bind.cols())
    return _Bind(bind.data.map_batches(flt, batch_format="pyarrow"),
                 bind.cls, bind.cols())


def _zero_length_pairs(store_dir: str, pat: Pattern
                       ) -> "ray.data.Dataset":
    """Self-pairs for the zero-length path of ``p*`` / ``p?`` in the
    pairs representation (``_s`` raw IRI, ``_o`` term form). A
    constant IRI endpoint pairs with itself (per spec, whether or not
    it occurs in the graph); with two variable endpoints the domain is
    every IRI term in the store (subjects plus IRI objects), ONE
    streamed distinct pass. Subset deviation (documented): literal
    terms contribute no zero-length pair."""
    from .sinks.store_query import query_triples
    from .stages.dedup import distinct
    sch = pa.schema([("_s", pa.string()), ("_o", pa.string())])
    if isinstance(pat.s, Iri) or isinstance(pat.o, Iri):
        v = pat.s.value if isinstance(pat.s, Iri) else pat.o.value
        return ray.data.from_arrow(pa.table({
            "_s": pa.array([v], pa.string()),
            "_o": pa.array([f"<{v}>"], pa.string())}))
    if not (isinstance(pat.s, Var) and isinstance(pat.o, Var)):
        raise SparqlError("zero-length path at a literal endpoint is "
                          "out of the supported subset")

    def nodes(b: pa.Table) -> pa.Table:
        s = b["s"].combine_chunks().cast(pa.string())
        o = b["o"].combine_chunks().cast(pa.string())
        m = pc.and_(pc.starts_with(o, "<"), pc.ends_with(o, ">"))
        raw_o = pc.replace_substring_regex(o.filter(m),
                                           _STR_IRI_RE, r"\1")
        parts = []
        for x in (s, raw_o):
            parts.extend(x.chunks if isinstance(x, pa.ChunkedArray)
                         else [x])
        return pa.table({"_n": (pa.concat_arrays(parts) if parts
                                else pa.array([], pa.string()))})

    nsch = pa.schema([("_n", pa.string())])
    nd = distinct(
        ray.data.from_arrow(nsch.empty_table()).union(
            query_triples(store_dir).map_batches(
                nodes, batch_format="pyarrow")), ["_n"])

    def selfpair(b: pa.Table) -> pa.Table:
        n = b["_n"].combine_chunks().cast(pa.string())
        return pa.table({"_s": n, "_o": _wrap_iri(n)})

    return ray.data.from_arrow(sch.empty_table()).union(
        nd.map_batches(selfpair, batch_format="pyarrow"))


def _eval_path_pattern(store_dir: str, pat: Pattern,
                       cls: dict[str, str]) -> "ray.data.Dataset":
    """``s p{+,*,?} o`` (SPARQL 1.1 property-path modifiers) over ONE
    instance predicate — or a modified alternation group
    ``(p1|p2)+`` (``AltSet``), whose edge set is the union of the
    member predicates' reads: the set of pairs connected by a
    directed path through the edges — length >= 1 for ``+``, >= 0
    for ``*``, 0 or 1 for ``?``.

    Plan: the partition-pruned ``p`` read feeds
    ``ops.graph.transitive_pairs`` (driver BFS when the predicate's
    edge set is ontology-sized, semi-naive bucket-join iteration at
    scale) over the IRI-object edges — literals cannot be path
    INTERMEDIATES — then ONE extension join back onto the raw edge set
    keeps literal ENDPOINTS reachable at depth >= 2. Path solutions are
    a set (the spec does not enumerate paths), so pairs are
    dedup'd."""
    from .ops.graph import transitive_pairs
    from .sinks.store_query import query_triples
    from .stages.dedup import distinct
    if not isinstance(pat.s, Var) and not isinstance(pat.o, Var):
        raise SparqlError("fully-ground property path unsupported "
                          "(subset: at least one variable endpoint)")
    sch_t = pa.schema([("_s", pa.string()), ("_o", pa.string())])

    def _seq_edge_rel(seq: tuple) -> "ray.data.Dataset":
        """The composed edge relation of one forward predicate chain:
        (first subject raw, last object term) pairs — a chain of
        partition-pruned reads joined o->s (intermediates must be
        IRIs; literals cannot be subjects)."""
        cur = None
        for i, pred in enumerate(seq):
            last = i == len(seq) - 1
            ki = "_s" if i == 0 else f"_h{i}"
            ko = "_o" if last else f"_h{i + 1}"

            def mk(b: pa.Table, _ki=ki, _ko=ko, _last=last
                   ) -> pa.Table:
                if not _last:
                    o = b["o"].combine_chunks().cast(pa.string())
                    b = b.filter(pc.and_(pc.starts_with(o, "<"),
                                         pc.ends_with(o, ">")))
                o = b["o"].combine_chunks().cast(pa.string())
                if not _last:
                    o = pc.replace_substring_regex(o, _STR_IRI_RE,
                                                   r"\1")
                return pa.table({
                    _ki: b["s"].combine_chunks().cast(pa.string()),
                    _ko: o})

            sch_i = pa.schema([(ki, pa.string()), (ko, pa.string())])
            nb = _Bind(ray.data.from_arrow(sch_i.empty_table()).union(
                query_triples(store_dir, p=pred).map_batches(
                    mk, batch_format="pyarrow")), {}, [ki, ko])
            cur = nb if cur is None else _join_binds(cur, nb, {})

        def ends(b: pa.Table) -> pa.Table:
            return b.select(["_s", "_o"])

        if cur.small:
            return ray.data.from_arrow(ends(cur.data))
        return cur.data.map_batches(ends, batch_format="pyarrow")

    if isinstance(pat.p, SeqSet):
        # modified sequence group (p1/p2)+ / ((p1/p2)|p3)*: the
        # closure runs over the UNION of the legs' composed relations
        e_t = ray.data.from_arrow(sch_t.empty_table())
        for seq in pat.p.seqs:
            e_t = e_t.union(_seq_edge_rel(seq))
    else:
        if isinstance(pat.p, AltSet):
            # modified alternation group (p1|p2)+: the closure runs
            # over the UNION of the member predicates'
            # partition-pruned reads
            ds = query_triples(store_dir, p=pat.p.values[0])
            for v in pat.p.values[1:]:
                ds = ds.union(query_triples(store_dir, p=v))
        else:
            ds = query_triples(store_dir, p=pat.p.value)

        def et(b: pa.Table) -> pa.Table:  # every edge, term endpoint
            return pa.table({
                "_s": b["s"].combine_chunks().cast(pa.string()),
                "_o": b["o"].combine_chunks().cast(pa.string())})

        e_t = ray.data.from_arrow(sch_t.empty_table()).union(
            ds.map_batches(et, batch_format="pyarrow"))

    def ei(b: pa.Table) -> pa.Table:   # IRI-object edges, raw space
        o = b["_o"].combine_chunks().cast(pa.string())
        m = pc.and_(pc.starts_with(o, "<"), pc.ends_with(o, ">"))
        t = b.filter(m)
        raw = pc.replace_substring_regex(
            t["_o"].combine_chunks().cast(pa.string()),
            _STR_IRI_RE, r"\1")
        return pa.table({"src": t["_s"], "dst": raw})

    mod = pat.path
    if mod == "?":
        base = e_t                     # zero-or-one: length-1 paths
    else:                              # '+' / '*': full closure
        e_i = e_t.map_batches(ei, batch_format="pyarrow")
        clo = transitive_pairs(e_i).materialize()

        def c2(b: pa.Table) -> pa.Table:
            return pa.table({"_ps": b["start"], "_m": b["reach"]})

        clo_m = clo.map_batches(c2, batch_format="pyarrow")
        sch_c = pa.schema([("_ps", pa.string()), ("_m", pa.string())])
        if clo.count() <= _broadcast_limit():
            tbls = [t for t in clo_m.iter_batches(batch_format="pyarrow")
                    if t.num_rows]
            a = _Bind(pa.concat_tables(tbls) if tbls
                      else sch_c.empty_table(), {}, ["_ps", "_m"])
        else:
            a = _Bind(ray.data.from_arrow(sch_c.empty_table())
                      .union(clo_m), {}, ["_ps", "_m"])

        def m2(b: pa.Table) -> pa.Table:
            return pa.table({"_m": b["_s"], "_o": b["_o"]})

        b2 = _Bind(e_t.map_batches(m2, batch_format="pyarrow"), {},
                   ["_m", "_o"])
        j = _join_binds(a, b2, {})    # depth >= 2 pairs (any endpoint)

        def jsel(b: pa.Table) -> pa.Table:
            return pa.table({"_s": b["_ps"], "_o": b["_o"]})

        ext = (ray.data.from_arrow(jsel(j.data)) if j.small
               else j.data.map_batches(jsel, batch_format="pyarrow"))
        base = e_t.union(ext)
    if mod in ("*", "?"):
        base = base.union(_zero_length_pairs(store_dir, pat))
    pairs = distinct(base, ["_s", "_o"])

    wrap_s = isinstance(pat.s, Var) and cls.get(pat.s.name) == "term"
    s_const = pat.s.value if isinstance(pat.s, Iri) else None
    o_const = (_const_repr(pat.o, "term")
               if not isinstance(pat.o, Var) else None)
    names = {}
    if isinstance(pat.s, Var):
        names["_s"] = pat.s.name
    if isinstance(pat.o, Var):
        names["_o"] = pat.o.name

    same_var = (isinstance(pat.s, Var) and isinstance(pat.o, Var)
                and pat.s.name == pat.o.name)

    def finish(b: pa.Table, _n=dict(names), _w=wrap_s, _sc=s_const,
               _oc=o_const, _same=same_var) -> pa.Table:
        if _sc is not None:
            b = b.filter(pc.equal(b["_s"], _sc))
        if _oc is not None:
            b = b.filter(pc.equal(b["_o"], _oc))
        arrs = {}
        for c in _n:
            arr = b[c].combine_chunks()
            if c == "_s" and _w:
                arr = _wrap_iri(arr)
            arrs[c] = arr
        if _same:
            # {?x p+ ?x}: cycles through p — equality between the
            # endpoints in the canonical representation
            keep = pc.fill_null(pc.equal(arrs["_s"], arrs["_o"]), False)
            return pa.table({_n["_s"]: arrs["_s"].filter(keep)})
        return pa.table({v: arrs[c] for c, v in _n.items()})

    sch = pa.schema([(v, pa.string())
                     for v in dict.fromkeys(names.values())])
    return ray.data.from_arrow(sch.empty_table()).union(
        pairs.map_batches(finish, batch_format="pyarrow"))


def _pattern_order(patterns: list[Pattern]) -> list[Pattern]:
    """Schema-closure patterns first (driver-side, they bind predicate
    variables cheaply), then by boundness (more constants first)."""
    def key(p: Pattern):
        is_schema = (isinstance(p.p, Iri) and p.p.value in _SCHEMA_PREDS)
        # a negated property set is selectivity-wise an UNBOUND
        # predicate (near-full scan), not a constant
        bound = sum(0 if isinstance(t, (Var, NegSet)) else 1
                    for t in (p.s, p.p, p.o))
        return (0 if is_schema else 1, -bound)
    return sorted(patterns, key=key)


def _collect_cls(g: Group, cls: dict[str, str] | None = None
                 ) -> dict[str, str]:
    """One canonical representation class per variable across the WHOLE
    query: 'term' (the store's rendered o form) if the var EVER appears
    in the o-position of a non-schema pattern, else 'iri' (raw IRI).
    A var chained from an o-position into an s-position
    (``?x p ?y . ?y q ?z``) must join in ONE representation — the
    s/p-position read WRAPS the raw IRI into term form (lossless, no
    row is dropped), so literal bindings simply fail inner joins and
    stay unbound under OPTIONAL, the SPARQL semantics."""
    if cls is None:
        cls = {}
    for pat in g.patterns:
        is_schema = (isinstance(pat.p, Iri)
                     and pat.p.value in _SCHEMA_PREDS)
        for col, t in (("s", pat.s), ("p", pat.p), ("o", pat.o)):
            if isinstance(t, Var):
                if col == "o" and not is_schema:
                    cls[t.name] = "term"
                else:
                    cls.setdefault(t.name, "iri")
    for vars_, _rows in g.values:
        for v in vars_:
            cls.setdefault(v, "iri")
    for alts in g.unions:
        for a in alts:
            _collect_cls(a, cls)
    for sub in g.minus + g.optionals + g.exists + g.not_exists:
        _collect_cls(sub, cls)
    for be in g.binds:
        if isinstance(be.expr, Var):
            cls[be.alias] = cls.get(be.expr.name, "iri")
        elif isinstance(be.expr, Iri):
            cls[be.alias] = "iri"
        elif (isinstance(be.expr, Func)
                and be.expr.name in ("iri", "uri")):
            # IRI()/URI() constructor: the alias IS an IRI — raw
            # representation, so term-identity comparisons against
            # s/p-position vars align without wrapping
            cls[be.alias] = "iri"
        elif isinstance(be.expr, (Arith, Num)) or (
                isinstance(be.expr, Func)
                and be.expr.name in _PLAIN_FNS):
            # plain-string space: UCASE/CONCAT/STRLEN/arithmetic
            # results are bare lexical values (no <>/"" decoration) —
            # term-identity comparisons re-quote them (see
            # _term_space_col), the projection keeps them bare
            cls[be.alias] = "str"
        else:
            # literal constants and the decorated producers
            # (LANG/DATATYPE/TZ/STRLANG/STRDT/IF/COALESCE) are
            # term-space strings
            cls[be.alias] = "term"
    for sq in g.subqueries:
        # ONE representation per variable across subquery boundaries
        # too — the projected vars join the outer bindings, and the
        # existing position-wrapping keeps inner/outer reads aligned
        _collect_cls(sq.where, cls)
        for a in sq.aggs:
            if a.hidden:
                continue
            if a.func in ("min", "max", "sample"):
                # value-preserving aggregates inherit the source
                # var's representation — unless an outer o-position
                # already forced term (setdefault keeps it; the
                # subquery output is then wrapped iri->term, see
                # _eval_subquery)
                cls.setdefault(a.alias, cls.get(a.var, "iri"))
            else:
                # numeric/concat aggregates surface as term-form
                # literals (quoted lexical value)
                cls[a.alias] = "term"
    return cls


def _chunked(a):
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def _eval_num_expr(b: pa.Table, expr, cls: dict[str, str]):
    """Numeric BIND expression over one batch -> float64 array;
    non-numeric / non-finite values become null (type-error
    semantics: the binding stays unbound)."""
    if isinstance(expr, Num):
        return pa.array([float(expr.value)] * b.num_rows, pa.float64())
    if isinstance(expr, Arith):
        le = _eval_num_expr(b, expr.l, cls)
        r = _eval_num_expr(b, expr.r, cls)
        fn = {"+": pc.add, "-": pc.subtract, "*": pc.multiply,
              "/": pc.divide}[expr.op]
        if expr.op == "/":
            # float division by zero yields ±inf/nan, not a raise —
            # mask to null (SPARQL: a type error, binding dropped)
            r = pc.if_else(pc.equal(r, 0.0),
                           pa.scalar(None, pa.float64()), r)
        out = fn(le, r)
        return pc.if_else(pc.is_finite(out), out,
                          pa.scalar(None, pa.float64()))
    if isinstance(expr, Func) and expr.name in _NUM_FNS:
        x = _eval_num_expr(b, expr.args[0], cls)
        if expr.name == "abs":
            return pc.abs(x)
        if expr.name == "ceil":
            return pc.ceil(x)
        if expr.name == "floor":
            return pc.floor(x)
        # xsd:round = round half toward positive infinity
        # (ROUND(2.5)=3, ROUND(-2.5)=-2)
        return pc.round(x, round_mode="half_up")
    # leaf: coerce the string form through the lexical numeric parse
    s = _eval_bind_expr(b, expr, cls)
    pos = (cls.get(expr.name, "iri") if isinstance(expr, Var)
           else "term")
    return _numeric_form(s, pos)


def _render_num(x) -> pa.Array:
    """float64 -> lexical numeric string: integral values render as
    integers (``12`` not ``12.0``), others as the shortest float
    repr — matching DuckDB's CAST(... AS VARCHAR) on the mirrors."""
    x = _chunked(x)
    tr = pc.trunc(x)
    integral = pc.and_(pc.equal(x, tr),
                       pc.and_(pc.greater(x, float(-2**62)),
                               pc.less(x, float(2**62))))
    as_int = pc.cast(pc.cast(pc.if_else(
        pc.fill_null(integral, False), x, pa.scalar(0.0)),
        pa.int64()), pa.string())
    return pc.if_else(integral, as_int, pc.cast(x, pa.string()))


def _eval_bind_expr(b: pa.Table, expr, cls: dict[str, str]):
    """Vectorized BIND expression over one batch -> a string column of
    ``b.num_rows`` values in the alias's canonical representation."""
    if isinstance(expr, Arith) or (isinstance(expr, Func)
                                   and expr.name in _NUM_FNS):
        return _render_num(_eval_num_expr(b, expr, cls))
    if isinstance(expr, IfExpr):
        missing = _filter_vars(expr.cond) - set(b.column_names)
        if missing:
            raise SparqlError(
                f"IF condition references unbound "
                f"?{sorted(missing)[0]}")
        mask = _chunked(_filter_mask(b, expr.cond, cls))

        def t_form(arg):
            if isinstance(arg, Iri):
                return pa.array([f"<{arg.value}>"] * b.num_rows,
                                pa.string())
            a = _eval_bind_expr(b, arg, cls)
            pos = (cls.get(arg.name, "iri") if isinstance(arg, Var)
                   else "term")
            return _wrap_iri(_chunked(a)) if pos == "iri" else a

        return pc.if_else(mask, t_form(expr.then), t_form(expr.els))
    if isinstance(expr, Var):
        if expr.name not in b.column_names:
            raise SparqlError(f"BIND references unbound ?{expr.name}")
        return b[expr.name].combine_chunks().cast(pa.string())
    if isinstance(expr, (Iri, Lit, Num)):
        if isinstance(expr, Iri):
            val = expr.value          # iri-cls: raw IRI space
        elif isinstance(expr, Lit):
            # term-cls: rendered literal (incl. @lang / ^^dt suffix)
            val = f'"{expr.value}"{expr.tag}'
        else:
            val = expr.value          # numeric lexical form
        return pa.array([val] * b.num_rows, pa.string())
    if expr.name == "str":
        a = _eval_bind_expr(b, expr.args[0], cls)
        pos = (cls.get(expr.args[0].name, "iri")
               if isinstance(expr.args[0], Var) else "term")
        if pos == "iri":
            return a                  # raw IRIs ARE their str form
        return _str_form(a, "term")
    if expr.name == "concat":
        parts = []
        for arg in expr.args:
            a = _eval_bind_expr(b, arg, cls)
            pos = (cls.get(arg.name, "iri")
                   if isinstance(arg, Var) else "term")
            parts.append(a if pos == "iri" else _str_form(a, "term"))
        return pc.binary_join_element_wise(*parts, "")

    def s_form(arg):
        a = _eval_bind_expr(b, arg, cls)
        pos = (cls.get(arg.name, "iri")
               if isinstance(arg, Var) else "term")
        return a if pos == "iri" else _str_form(a, "term")

    if expr.name in ("ucase", "lcase"):
        s = s_form(expr.args[0])
        return (pc.utf8_upper(s) if expr.name == "ucase"
                else pc.utf8_lower(s))
    if expr.name == "strlen":
        # lexical integer (the alias surfaces as a term-space string)
        return pc.cast(pc.utf8_length(s_form(expr.args[0])),
                       pa.string())
    if expr.name == "substr":
        # SPARQL SUBSTR is 1-based over characters (codepoints)
        start = int(expr.args[1].value) - 1
        if len(expr.args) == 3:
            return pc.utf8_slice_codeunits(
                s_form(expr.args[0]), start,
                start + int(expr.args[2].value))
        return pc.utf8_slice_codeunits(s_form(expr.args[0]), start)
    if expr.name == "replace":
        return pc.replace_substring_regex(
            s_form(expr.args[0]), pattern=expr.args[1].value,
            replacement=expr.args[2].value)
    if expr.name in ("lang", "datatype"):
        arg = expr.args[0]
        pos = (cls.get(arg.name, "iri")
               if isinstance(arg, Var) else "term")
        if pos == "iri":
            # raw-IRI variables: LANG("") per spec; DATATYPE of an
            # IRI is a type error -> unbound
            if expr.name == "lang":
                return pa.array(['""'] * b.num_rows, pa.string())
            return pa.nulls(b.num_rows, pa.string())
        if pos == "str":
            # plain strings are simple literals: LANG("") and
            # DATATYPE xsd:string, null-preserving
            a = _chunked(_eval_bind_expr(b, arg, cls))
            fill = ('""' if expr.name == "lang"
                    else "<http://www.w3.org/2001/XMLSchema#string>")
            return pc.if_else(pc.is_valid(a), pa.scalar(fill),
                              pa.scalar(None, pa.string()))
        a = _eval_bind_expr(b, arg, cls)
        a = (a.combine_chunks() if isinstance(a, pa.ChunkedArray)
             else a)
        lit_body = r'"(?:[^"\\]|\\.)*"'
        if expr.name == "lang":
            ext = pc.extract_regex(
                a, f'^{lit_body}@(?P<l>[A-Za-z][A-Za-z0-9\\-]*)$')
            tag = pc.coalesce(pc.struct_field(ext, "l"), pa.scalar(""))
            return pc.binary_join_element_wise(
                pa.array(['"'] * b.num_rows), tag,
                pa.array(['"'] * b.num_rows), "")
        dt = pc.struct_field(pc.extract_regex(
            a, f'^{lit_body}\\^\\^<(?P<d>[^>]*)>$'), "d")
        is_lang = pc.match_substring_regex(
            a, f'^{lit_body}@[A-Za-z][A-Za-z0-9\\-]*$')
        is_plain = pc.match_substring_regex(a, f"^{lit_body}$")
        rdf_ls = ("http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                  "langString")
        xsd_str = "http://www.w3.org/2001/XMLSchema#string"
        out = pc.if_else(
            pc.is_valid(dt),
            pc.binary_join_element_wise(
                pa.array(["<"] * b.num_rows), pc.coalesce(
                    dt, pa.scalar("")),
                pa.array([">"] * b.num_rows), ""),
            pc.if_else(is_lang, pa.scalar(f"<{rdf_ls}>"),
                       pc.if_else(is_plain, pa.scalar(f"<{xsd_str}>"),
                                  pa.scalar(None, pa.string()))))
        return out
    if expr.name in ("strbefore", "strafter"):
        s = _chunked(s_form(expr.args[0]))
        sep = expr.args[1].value
        if sep == "":
            # per spec: STRBEFORE(x, "") = "", STRAFTER(x, "") = x
            if expr.name == "strafter":
                return s
            return pc.if_else(pc.is_valid(s), pa.scalar(""),
                              pa.scalar(None, pa.string()))
        pat = re.escape(sep)
        if expr.name == "strbefore":
            ext = pc.extract_regex(s, f"(?s)^(?P<r>.*?){pat}")
        else:
            ext = pc.extract_regex(s, f"(?s)^.*?{pat}(?P<r>.*)$")
        hit = pc.struct_field(ext, "r")
        # separator absent -> "" (still bound); unbound input -> null
        return pc.if_else(pc.is_valid(s),
                          pc.coalesce(hit, pa.scalar("")),
                          pa.scalar(None, pa.string()))
    if expr.name == "encode_for_uri":
        from urllib.parse import quote
        s = _chunked(s_form(expr.args[0]))
        d = s.dictionary_encode()
        enc = pa.array([None if v is None else quote(v, safe="-._~")
                        for v in d.dictionary.to_pylist()], pa.string())
        return pc.take(enc, d.indices)
    if expr.name in ("strlang", "strdt"):
        lex = _chunked(s_form(expr.args[0]))
        n = b.num_rows
        if expr.name == "strlang":
            tail = f'"@{expr.args[1].value}'
        else:
            tail = f'"^^<{expr.args[1].value}>'
        return pc.binary_join_element_wise(
            pa.array(['"'] * n, pa.string()), lex,
            pa.array([tail] * n, pa.string()), "")
    if expr.name == "coalesce":
        # first BOUND argument, evaluated in TERM space (raw-IRI args
        # wrap to <...> so mixed-representation alternatives align) —
        # the OPTIONAL-default idiom: COALESCE(?maybe, "fallback")
        parts = []
        for arg in expr.args:
            if isinstance(arg, Iri):
                parts.append(pa.array([f"<{arg.value}>"] * b.num_rows,
                                      pa.string()))
                continue
            a = _eval_bind_expr(b, arg, cls)
            pos = (cls.get(arg.name, "iri")
                   if isinstance(arg, Var) else "term")
            parts.append(_wrap_iri(a) if pos == "iri" else a)
        out = parts[0]
        for nxt_part in parts[1:]:
            out = pc.coalesce(out, nxt_part)
        return out
    if expr.name in _DT_FIELD:
        # xsd:dateTime component accessors (spec §17.4.5): extracted
        # from the literal's lexical form — non-dateTime-shaped values
        # (and time fields of date-only literals) yield a type error,
        # i.e. the binding stays unbound
        s = _chunked(s_form(expr.args[0]))
        v = pc.struct_field(pc.extract_regex(s, _DT_PAT),
                            _DT_FIELD[expr.name])
        # a date-only literal matches with EMPTY (not null) time
        # groups — mask them to null (type error -> unbound)
        v = pc.if_else(pc.equal(v, ""), pa.scalar(None, pa.string()),
                       v)
        if expr.name == "seconds":
            # SECONDS returns xsd:decimal — keep any fraction
            return _render_num(pc.cast(v, pa.float64()))
        return pc.cast(pc.cast(v, pa.int64()), pa.string())
    if expr.name in ("iri", "uri"):
        # IRI()/URI() constructor (spec §17.4.2.8): the string form
        # becomes an IRI — the alias lives in raw-IRI representation
        # (see _collect_cls), so no wrapping here. No BASE support:
        # the argument must already be an absolute IRI string.
        return _chunked(s_form(expr.args[0]))
    if expr.name == "tz":
        # TZ (spec §17.4.5.8): the timezone designator of the
        # dateTime's lexical form as a simple literal — "Z",
        # "+05:00", or "" when absent; non-dateTime-shaped values
        # are a type error (unbound)
        s = _chunked(s_form(expr.args[0]))
        shaped = pc.match_substring_regex(s, _DT_PAT)
        z = pc.struct_field(
            pc.extract_regex(s, r"(?P<z>Z|[+-]\d{2}:\d{2})$"), "z")
        z = pc.if_else(shaped, pc.coalesce(z, pa.scalar("")),
                       pa.scalar(None, pa.string()))
        n = b.num_rows
        return pc.binary_join_element_wise(
            pa.array(['"'] * n, pa.string()), z,
            pa.array(['"'] * n, pa.string()), "")
    if expr.name in _HASH_FNS:
        # hex digest of the UTF-8 STR form (spec §17.4.4.x) — hashed
        # once per DISTINCT value via dictionary encoding
        import hashlib
        s = _chunked(s_form(expr.args[0]))
        d = s.dictionary_encode()
        fn = getattr(hashlib, expr.name)
        hx = pa.array([None if v is None
                       else fn(v.encode("utf-8")).hexdigest()
                       for v in d.dictionary.to_pylist()], pa.string())
        return pc.take(hx, d.indices)
    raise SparqlError(f"unsupported BIND function {expr.name!r}")


def _expr_if_vars(expr) -> set[str]:
    """Variables referenced by IF() conditions anywhere in a BIND
    expression tree — validated at plan time so an unbound condition
    var raises a SparqlError, not a mid-task failure."""
    if isinstance(expr, IfExpr):
        return (_filter_vars(expr.cond) | _expr_if_vars(expr.then)
                | _expr_if_vars(expr.els))
    if isinstance(expr, Arith):
        return _expr_if_vars(expr.l) | _expr_if_vars(expr.r)
    if isinstance(expr, Func):
        out: set[str] = set()
        for a in expr.args:
            out |= _expr_if_vars(a)
        return out
    return set()


def _apply_binds(bind: _Bind, binds: list[BindExpr],
                 cls: dict[str, str]) -> _Bind:
    """Append one computed column per BIND (vectorized per batch)."""
    avail = set(bind.cols())
    for be in binds:
        if be.alias in bind.cols():
            raise SparqlError(
                f"BIND alias ?{be.alias} is already bound")
        missing = _expr_if_vars(be.expr) - avail
        if missing:
            raise SparqlError(
                f"IF condition references unbound "
                f"?{sorted(missing)[0]}")
        avail.add(be.alias)

    def add(b: pa.Table, _bs=list(binds), _cls=dict(cls)) -> pa.Table:
        for be in _bs:
            b = b.append_column(
                be.alias, _eval_bind_expr(b, be.expr, _cls))
        return b

    out_cols = bind.cols() + [be.alias for be in binds]
    if bind.small:
        return _Bind(add(bind.data), cls, out_cols)
    return _Bind(bind.data.map_batches(add, batch_format="pyarrow"),
                 cls, out_cols)


def _full_small(b: _Bind) -> pa.Table | None:
    """The binding set's FULL rows driver-side when it is below the
    broadcast limit, else None."""
    if b.small:
        return b.data
    data = _batch_guard(b.data)
    if data.limit(_broadcast_limit() + 1).count() > _broadcast_limit():
        return None
    tbls = [t for t in data.iter_batches(batch_format="pyarrow")
            if t.num_rows]
    return (pa.concat_tables(tbls) if tbls
            else pa.schema([(c, pa.string())
                            for c in b.cols()]).empty_table())


def _cross_tables(a: pa.Table, b: pa.Table) -> pa.Table:
    """Cartesian product of two driver-sized tables."""
    import numpy as np
    n, m = a.num_rows, b.num_rows
    ai = pa.array(np.repeat(np.arange(n, dtype=np.int64), m))
    bi = pa.array(np.tile(np.arange(m, dtype=np.int64), n))
    cols = {c: a[c].combine_chunks().take(ai) for c in a.column_names}
    cols.update({c: b[c].combine_chunks().take(bi)
                 for c in b.column_names})
    return pa.table(cols)


def _join_binds(bind: _Bind, new: _Bind, cls: dict[str, str]) -> _Bind:
    """Inner join two binding sets on their shared variables, with the
    same size-adaptive path choice as pattern chaining. Two sets with
    NO shared variable are a Cartesian product — supported when at
    least one side fits the broadcast limit (the small side ships once
    and multiplies each batch of the other)."""
    on = sorted(set(bind.cols()) & set(new.cols()))
    joined = bind.cols() + [c for c in new.cols()
                            if c not in bind.cols()]
    if not on:
        sm = _full_small(new)
        big = bind
        if sm is None:
            sm, big = _full_small(bind), new
        if sm is None:
            raise SparqlError(
                "Cartesian product of two binding sets both above the "
                "broadcast limit — correlate the groups with a shared "
                "variable")
        if big.small:
            return _Bind(_cross_tables(big.data, sm), cls, joined)
        return _Bind(big.data.map_batches(
            lambda b, _t=sm: _cross_tables(b, _t),
            batch_format="pyarrow"), cls, joined)
    if bind.small and new.small:
        return _Bind(_join_small(bind.data, new.data, on), cls, joined)
    if bind.small:
        return _Bind(_broadcast_join(new.data, bind.data, on), cls,
                     joined)
    if new.small:
        return _Bind(_broadcast_join(bind.data, new.data, on), cls,
                     joined)
    from .stages.canonicalize import default_shuffle_partitions
    return _Bind(
        _batch_guard(_batch_guard(bind.data).join(
            _batch_guard(new.data), join_type="inner",
            num_partitions=default_shuffle_partitions(),
            on=tuple(on))),
        cls, joined)


def _project_bind(b: _Bind, keep: list[str]) -> _Bind:
    """Project a binding set down to ``keep`` columns, duplicates
    retained (bag semantics — used by path-alternation sequence legs,
    where the fresh chain variables must not leak into the union)."""
    keep = [c for c in keep if c in b.cols()]
    if b.small:
        return _Bind(b.data.select(keep), b.cls, list(keep))
    ds = b.data.map_batches(lambda t, _c=list(keep): t.select(_c),
                            batch_format="pyarrow")
    return _Bind(ds, b.cls, list(keep))


def _concat_binds(parts: list[_Bind]) -> _Bind:
    """UNION of binding sets over an identical variable set (bag
    semantics — duplicates kept, like SPARQL UNION)."""
    cols = sorted(parts[0].cols())
    cls: dict[str, str] = {}
    for p in parts:
        cls.update(p.cls)
    if all(p.small for p in parts):
        tbl = pa.concat_tables([p.data.select(cols) for p in parts])
        return _Bind(tbl, cls, list(cols))
    dss = [(p.data if not p.small else ray.data.from_arrow(p.data))
           .map_batches(lambda b, _c=list(cols): b.select(_c),
                        batch_format="pyarrow")
           for p in parts]
    ds = dss[0]
    for other in dss[1:]:
        ds = ds.union(other)
    return _Bind(_batch_guard(ds), cls, list(cols))


def _eval_subquery(store_dir: str, sq: Query,
                   cls: dict[str, str]) -> _Bind:
    """Evaluate one ``{ SELECT ... }`` subquery to a _Bind over its
    PROJECTED variables (projection scopes the inner vars — nothing
    else leaks to the enclosing group). The outer query's
    canonical-representation map is shared, so projected vars join the
    outer bindings directly. Aggregate aliases surface as TERM-form
    literals (quoted lexical value) — numeric FILTERs parse the
    lexical value, so join-on-the-group-max shapes compare
    numerically. DISTINCT / ORDER BY / LIMIT / OFFSET inside the
    subquery apply before the outer join (top-k-per-corpus shapes)."""
    proj = list(sq.select_vars) + [a.alias for a in sq.aggs
                                   if not a.hidden]
    if not proj:
        raise SparqlError("subquery needs an explicit SELECT list")
    ds = execute_sparql(store_dir, sq, cls=cls)
    agg_aliases = [a.alias for a in sq.aggs if not a.hidden]
    # an iri-sourced MIN/MAX/SAMPLE whose alias the OUTER query reads
    # in an o-position (term-cls) gets wrapped <...> — the same
    # lossless iri->term wrap the pattern reads apply
    wrap = [a.alias for a in sq.aggs
            if not a.hidden and a.func in ("min", "max", "sample")
            and cls.get(a.var, "iri") == "iri"
            and cls.get(a.alias) == "term"]
    if agg_aliases:
        def lex(b: pa.Table, _al=list(agg_aliases),
                _wrap=set(wrap)) -> pa.Table:
            for c in _al:
                col = b[c]
                if (pa.types.is_string(col.type)
                        or pa.types.is_large_string(col.type)):
                    if c in _wrap:
                        s = pc.binary_join_element_wise(
                            pa.scalar("<"),
                            col.combine_chunks().cast(pa.string()),
                            pa.scalar(">"), "")
                        b = b.set_column(
                            b.column_names.index(c), c, s)
                    continue
                s = pc.cast(col.combine_chunks(), pa.string())
                s = pc.binary_join_element_wise(
                    pa.scalar('"'), s, pa.scalar('"'), "")
                b = b.set_column(b.column_names.index(c), c, s)
            return b

        ds = ds.map_batches(lex, batch_format="pyarrow")
    return _Bind(ds, cls, proj)


def _eval_group(store_dir: str, g: Group,
                cls: dict[str, str] | None = None) -> _Bind:
    if cls is None:
        cls = _collect_cls(g)
    bind: _Bind | None = None
    for pat in _pattern_order(g.patterns):
        is_schema = (isinstance(pat.p, Iri) and pat.p.value in _SCHEMA_PREDS)
        if is_schema:
            # schema closure is already transitive: `p+` == `p` here
            tbl = _eval_schema_pattern(store_dir, pat, cls)
            new = _Bind(tbl, cls)
        elif pat.path in ("+", "*", "?"):
            new = _Bind(_eval_path_pattern(store_dir, pat, cls), cls,
                        list(dict.fromkeys(_pattern_cols(pat).values())))
        else:
            p_values = None
            if (isinstance(pat.p, Var) and bind is not None and bind.small
                    and pat.p.name in bind.cols()):
                vals = bind.data[pat.p.name]
                p_values = sorted(set(
                    v[1:-1] if v.startswith("<") and v.endswith(">") else v
                    for v in vals.to_pylist() if v is not None))
            # group-level term-identity EQUALITY filters on this
            # pattern's variables push into the read: ?p = <iri>
            # prunes to one partition, ?s/?o = const push as parquet
            # row-group filters. Sound — the filter still applies
            # post-join (idempotent); Num filters stay out (numeric
            # VALUE equality matches multiple lexical forms).
            eqs: dict[str, object] = {}
            for col, t in (("s", pat.s), ("p", pat.p), ("o", pat.o)):
                if not isinstance(t, Var):
                    continue
                for f in g.filters:
                    if (f.op == "=" and f.var == t.name
                            and isinstance(f.term, (Lit, Iri))):
                        eqs[col] = f.term
                        break
            if ("p" in eqs and p_values is None
                    and isinstance(eqs["p"], Iri)):
                p_values = [eqs["p"].value]
            eq_hints = {}
            if "s" in eqs and isinstance(eqs["s"], Iri):
                eq_hints["s"] = eqs["s"].value          # raw IRI space
            if "o" in eqs:
                eq_hints["o"] = _const_repr(eqs["o"], "term")
            new = _Bind(
                _eval_store_pattern(store_dir, pat, p_values, cls,
                                    eq_hints=eq_hints), cls,
                list(dict.fromkeys(_pattern_cols(pat).values())))
        bind = (new if bind is None
                else _join_binds(bind, new, cls))
        bind = _apply_filters(bind, g.filters)
    for sq in g.subqueries:
        sb = _eval_subquery(store_dir, sq, cls)
        bind = sb if bind is None else _join_binds(bind, sb, cls)
        bind = _apply_filters(bind, g.filters)
    for vars_, rows_ in g.values:
        cols = {}
        for i, v in enumerate(vars_):
            cols[v] = pa.array(
                [_values_repr(r[i], cls.get(v, "iri")) for r in rows_],
                pa.string())
        vb = _Bind(pa.table(cols), cls, list(vars_))
        bind = vb if bind is None else _join_binds(bind, vb, cls)
        bind = _apply_filters(bind, g.filters)
    if bind is None and not g.unions:
        raise SparqlError("empty group")
    for alts in g.unions:
        parts = [_apply_filters(_eval_group(store_dir, a, cls), a.filters)
                 for a in alts]
        parts = [_project_bind(p, list(a.project))
                 if a.project is not None else p
                 for p, a in zip(parts, alts)]
        # SPARQL UNION legs may bind DIFFERENT variables: a var
        # missing from one leg is unbound (null) in that leg's
        # solutions. A var bound outside the union, though, would
        # inner-join the padded nulls away (the engine's joins are
        # not compatibility joins) — that shape raises instead of
        # silently dropping rows.
        all_cols = sorted({c for p in parts for c in p.cols()})
        part_miss = {c for p in parts
                     for c in set(all_cols) - set(p.cols())}
        if bind is not None and part_miss & set(bind.cols()):
            v = sorted(part_miss & set(bind.cols()))[0]
            raise SparqlError(
                f"?{v} is bound outside the UNION, so every "
                "alternative must bind it (a leg leaving it unbound "
                "is out of the supported subset)")
        padded = []
        for p in parts:
            miss = [c for c in all_cols if c not in p.cols()]
            if not miss:
                padded.append(p)
                continue

            def pad(b: pa.Table, _m=list(miss)) -> pa.Table:
                for c in _m:
                    b = b.append_column(
                        c, pa.nulls(b.num_rows, pa.string()))
                return b

            padded.append(_Bind(
                pad(p.data) if p.small
                else p.data.map_batches(pad, batch_format="pyarrow"),
                p.cls, list(all_cols)))
        ub = _concat_binds(padded)
        bind = ub if bind is None else _join_binds(bind, ub, cls)
    bind = _apply_filters(bind, g.filters)
    for m in g.minus:
        mb = _eval_group(store_dir, m, cls)
        mb = _apply_filters(mb, m.filters)
        on = sorted(set(bind.cols()) & set(mb.cols()))
        bind = _anti_join(bind, _smallify(mb, on), on)
    for ne in g.not_exists:
        # FILTER NOT EXISTS: with shared vars == anti-join on them;
        # with none, the inner group is an uncorrelated ASK — keep all
        # rows iff it is empty
        nb = _apply_filters(_eval_group(store_dir, ne, cls), ne.filters)
        on = sorted(set(bind.cols()) & set(nb.cols()))
        if on:
            bind = _anti_join(bind, _smallify(nb, on), on)
        elif _nonempty(nb):
            bind = _empty_like(bind)
    for ex in g.exists:
        # FILTER EXISTS: semi-join on shared vars (inner side reduced
        # to its DISTINCT shared-var keys — no row duplication)
        eb = _apply_filters(_eval_group(store_dir, ex, cls), ex.filters)
        on = sorted(set(bind.cols()) & set(eb.cols()))
        if on:
            keys = _distinct_keys(eb, on)
            bind = _join_binds(bind, keys, cls)
        elif not _nonempty(eb):
            bind = _empty_like(bind)
    for opt in g.optionals:
        ob = _apply_filters(_eval_group(store_dir, opt, cls),
                            opt.filters)
        on = sorted(set(bind.cols()) & set(ob.cols()))
        bind = _left_join(bind, ob, on)
    if g.binds:
        # BIND computed columns (evaluated once the pattern/OPTIONAL
        # bindings they reference exist); group filters over the new
        # vars become applicable below
        bind = _apply_binds(bind, g.binds, cls)
        bind = _apply_filters(bind, g.filters)
    if g.optionals:
        # group filters whose var is bound ONLY inside an OPTIONAL
        # become applicable after the left joins; re-apply (idempotent
        # for the already-applied ones). A null (unbound) value makes
        # the comparison a type error -> the row is eliminated, the
        # SPARQL semantics.
        bind = _apply_filters(bind, g.filters)
    dangling = [f for f in g.filters
                if not _filter_vars(f) <= set(bind.cols())]
    if dangling:
        raise SparqlError(
            "FILTER references variable(s) never bound in the group: "
            f"{sorted(set().union(*(_filter_vars(f) - set(bind.cols()) for f in dangling)))}")
    return bind


def _smallify(b: _Bind, on: list[str]) -> _Bind:
    """Pull a Dataset side driver-side (projected to the join columns,
    distinct) when it is below the broadcast limit."""
    if b.small:
        return b
    from .stages.dedup import distinct
    md = distinct(b.data, on)
    if md.count() <= _broadcast_limit():
        empty = pa.table({c: pa.array([], type=pa.string())
                          for c in on})
        return _Bind(pa.concat_tables(
            [t for t in md.iter_batches(batch_format="pyarrow")]
            or [empty]), b.cls, on)
    return b


def _distinct_keys(b: _Bind, on: list[str]) -> _Bind:
    """Project a binding set to its DISTINCT values of `on` (the
    semi-join key side), size-adaptively small."""
    if b.small:
        import polars as pl
        return _Bind(pl.from_arrow(b.data.select(on)).unique()
                     .to_arrow(), b.cls, on)
    from .stages.dedup import distinct
    sm = _smallify(b, on)
    if sm.small:
        return sm
    return _Bind(distinct(b.data, on), b.cls, on)


def _nonempty(b: _Bind) -> bool:
    if b.small:
        return b.data.num_rows > 0
    return _batch_guard(b.data).limit(1).count() > 0


def _empty_like(b: _Bind) -> _Bind:
    sch = pa.schema([(c, pa.string()) for c in b.cols()])
    return _Bind(sch.empty_table(), b.cls, b.cols())


def _render_template(bind: _Bind, template: list[Pattern]
                     ) -> "ray.data.Dataset":
    """CONSTRUCT/INSERT instantiation: bindings -> graph rows (s, p, o
    term form), deduped (a constructed graph is a set)."""
    from .stages.dedup import distinct

    def build(b: pa.Table, _t=template, _cls=dict(bind.cls)) -> pa.Table:
        outs = []
        n = b.num_rows
        for pat in _t:
            cols = {}
            # spec §16.2: an instantiation with an UNBOUND variable, or
            # one that would not be a valid RDF triple (literal in the
            # s/p position), contributes NO triple — the row is
            # dropped for this template pattern only
            ok = None

            def both(m1, m2):
                return m2 if m1 is None else pc.and_(m1, m2)

            for name, t, want in (("s", pat.s, "iri"), ("p", pat.p, "iri"),
                                  ("o", pat.o, "term")):
                if isinstance(t, Var):
                    arr = b[t.name].combine_chunks().cast(pa.string())
                    c = _cls.get(t.name, "iri")
                    ok = both(ok, pc.is_valid(arr))
                    if want == "term":
                        if c == "iri":
                            arr = pc.binary_join_element_wise(
                                pa.scalar("<"), arr, pa.scalar(">"), "")
                        elif c == "str":
                            # plain-string values are simple literals
                            arr = pc.binary_join_element_wise(
                                pa.scalar('"'), arr, pa.scalar('"'), "")
                    else:
                        if c == "term":
                            iri_ok = pc.fill_null(
                                pc.starts_with(arr, "<"), False)
                            if name == "s":
                                iri_ok = pc.or_(iri_ok, pc.fill_null(
                                    pc.starts_with(arr, "_:"), False))
                            ok = both(ok, iri_ok)
                            arr = pc.utf8_trim(arr, characters="<>")
                        elif c == "str":
                            # a plain string is a literal: never a
                            # valid subject/predicate
                            ok = both(ok, pa.array([False] * n,
                                                   pa.bool_()))
                    cols[name] = arr
                else:
                    cols[name] = pa.array([_const_repr(t, want)] * n,
                                          type=pa.string())
            tblp = pa.table(cols)
            if ok is not None:
                tblp = tblp.filter(pc.fill_null(ok, False))
            outs.append(tblp)
        if not outs:
            return pa.schema([("s", pa.string()), ("p", pa.string()),
                              ("o", pa.string())]).empty_table()
        return pa.concat_tables(outs)

    spo = pa.schema([("s", pa.string()), ("p", pa.string()),
                     ("o", pa.string())])
    ds = (ray.data.from_arrow(build(bind.data)) if bind.small
          else ray.data.from_arrow(spo.empty_table()).union(
              bind.data.map_batches(build, batch_format="pyarrow")))
    return distinct(ds, ["s", "p", "o"])


def _eval_describe(store_dir: str, q: Query) -> "ray.data.Dataset":
    """DESCRIBE: the outgoing triples of each matched resource (concise
    'asserted description' — subject-rooted, the common implementation
    choice). Size-adaptive: resource ids at or below
    KGFORGE_BROADCAST_LIMIT resolve driver-side and the store is ONE
    streamed scan with a broadcast membership filter; a larger ?var
    binding set stays distributed and the store is semi-joined on s
    (hash join, same partitioning as query_minus) — both paths return
    the identical triple set (pinned in tests/test_sparql.py)."""
    from .sinks.store_query import query_triples
    from .stages.canonicalize import default_shuffle_partitions
    from .stages.dedup import distinct
    raws = {t.value for t in q.describe_terms if isinstance(t, Iri)}
    var_names = [t.name for t in q.describe_terms if isinstance(t, Var)]
    big: list["ray.data.Dataset"] = []     # (_rs) raw-IRI resource sets
    if var_names:
        bind = _eval_group(store_dir, q.where)
        missing = [v for v in var_names if v not in bind.cols()]
        if missing:
            raise SparqlError(f"DESCRIBE vars not bound: {missing}")
        for v in var_names:
            if bind.small:
                vals = pc.unique(bind.data[v].combine_chunks()).to_pylist()
            else:
                dd = distinct(bind.data, [v])
                if dd.count() > _broadcast_limit():
                    # scale path: keep the resource set distributed and
                    # semi-join the store on s instead of broadcasting
                    def to_raw(b: pa.Table, _v=v) -> pa.Table:
                        col = b[_v].combine_chunks().cast(pa.string())
                        col = col.filter(pc.and_(
                            col.is_valid(),
                            pc.invert(pc.starts_with(col, '"'))))
                        return pa.table({"_rs": pc.replace_substring_regex(
                            col, pattern="^<|>$", replacement="")})
                    big.append(dd.map_batches(
                        to_raw, batch_format="pyarrow"))
                    continue
                vals = [r[v] for r in dd.take_all()]
            for val in vals:
                if val is None:
                    continue
                if val.startswith("<") and val.endswith(">"):
                    raws.add(val[1:-1])
                elif not val.startswith('"'):
                    raws.add(val)        # raw IRI; literals are skipped
    spo = pa.schema([("s", pa.string()), ("p", pa.string()),
                     ("o", pa.string())])

    if big:
        # join fallback: constants + small sides fold into the same
        # distributed resource set; ONE hash semi-join on s
        res = ray.data.from_arrow(pa.table(
            {"_rs": pa.array(sorted(raws), pa.string())}))
        for part in big:
            res = res.union(part)
        res = _batch_guard(distinct(res, ["_rs"]))
        got = _batch_guard(query_triples(store_dir)).join(
            res, join_type="inner",
            num_partitions=default_shuffle_partitions(),
            on=("s",), right_on=("_rs",))
        got = got.map_batches(lambda b: b.select(["s", "p", "o"]),
                              batch_format="pyarrow")
        return ray.data.from_arrow(spo.empty_table()).union(got)

    want = pa.array(sorted(raws), pa.string())

    def keep(b: pa.Table, _w=want) -> pa.Table:
        return b.filter(pc.is_in(b["s"].combine_chunks()
                                 .cast(pa.string()), value_set=_w))

    got = query_triples(store_dir).map_batches(
        keep, batch_format="pyarrow").map_batches(
        lambda b: b.select(["s", "p", "o"]), batch_format="pyarrow")
    return ray.data.from_arrow(spo.empty_table()).union(got)


def execute_sparql(store_dir: str, q: Query,
                   cls: dict[str, str] | None = None
                   ) -> "ray.data.Dataset":
    """Run one parsed query against a ``write_graph_partitioned``
    store. SELECT returns a Dataset with the selected variables as
    columns; CONSTRUCT/INSERT return the derived graph (s, p, o).
    ``cls`` shares an enclosing query's canonical-representation map
    when this runs as a subquery."""
    if q.form == "describe":
        return _eval_describe(store_dir, q)
    bind = _eval_group(store_dir, q.where, cls)
    if q.form == "ask":
        # existence check: stop at the first surviving binding
        n = (bind.data.num_rows if bind.small
             else _batch_guard(bind.data).limit(1).count())
        return ray.data.from_arrow(pa.table({"ask": pa.array(
            [n > 0], pa.bool_())}))
    if q.form in ("construct", "insert", "delete"):
        return _render_template(bind, q.template)
    if q.aggs:
        return _apply_aggregates(bind, q)
    # SELECT * / empty list: every bound variable EXCEPT the planner's
    # internal ones (path-sequence chain vars and desugared aggregate
    # expressions are not in-scope per the spec)
    sel = q.select_vars or sorted(
        c for c in bind.cols()
        if not (c.startswith("_seq") or c.startswith("_aggexpr")
                or c.startswith("_ord") or c.startswith("_bn")))
    # ORDER BY may reference vars outside the projection (including
    # the hidden ``_ord*`` expression keys): carry them through the
    # sort, drop them after — except under DISTINCT, where ordering
    # by an unprojected var is a spec error
    ob = list(dict.fromkeys(v for v, _ in (q.order_by or [])))
    extra = [v for v in ob if v not in sel]
    missing = ([v for v in sel if v not in bind.cols()]
               + [v for v in extra if v not in bind.cols()])
    if missing:
        raise SparqlError(f"selected vars not bound: {missing}")
    if q.distinct and extra:
        raise SparqlError(
            "ORDER BY over a variable outside the DISTINCT "
            "projection is out of the subset")
    keep = sel + extra
    if bind.small:
        ds = ray.data.from_arrow(bind.data.select(keep))
    else:
        sch = pa.schema([(v, pa.string()) for v in keep])
        ds = ray.data.from_arrow(sch.empty_table()).union(
            bind.data.map_batches(
                lambda b, _s=list(keep): b.select(_s),
                batch_format="pyarrow"))
    if q.distinct:
        from .stages.dedup import distinct
        ds = distinct(ds, sel)
    ds = _order_limit(ds, q)
    if extra:
        # same map-after-sort pattern _order_limit itself uses for
        # the derived key columns
        ds = ds.map_batches(
            lambda b, _s=list(sel): b.select(_s),
            batch_format="pyarrow")
    return ds


def _order_limit(ds: "ray.data.Dataset", q: Query) -> "ray.data.Dataset":
    if q.order_by:
        # SPARQL orders numeric literals by VALUE, not lexically
        # ("9" < "10"). Each ORDER BY column is lowered to three
        # derived NON-NULL sort keys — Ray Data's range-partitioned
        # sort CRASHES on null string keys and silently DUPLICATES
        # rows on all-null numeric keys (boundary sampling), so no
        # nullable column ever reaches ds.sort():
        #   __nn: 0 unbound (sorts lowest ascending, per spec)
        #         1 numeric (by value)  2 other bound (lexically)
        #   __k1: the numeric value (0.0 when not numeric)
        #   __k2: the lexical form ("" when unbound)
        # Numeric-vs-string relative placement within bound terms is
        # implementation latitude per spec; this order is total and
        # deterministic.
        cols = list(dict.fromkeys(v for v, _ in q.order_by))

        def add_keys(b: pa.Table, _cols=list(cols)) -> pa.Table:
            one = pa.scalar(1, pa.int8())
            two = pa.scalar(2, pa.int8())
            zero = pa.scalar(0, pa.int8())
            for v in _cols:
                col = b[v].combine_chunks()
                if pa.types.is_string(col.type):
                    num = _numeric_form(col, "term")
                    lex = pc.fill_null(col, "")
                else:
                    num = pc.cast(col, pa.float64())
                    lex = pc.fill_null(pc.cast(col, pa.string()), "")
                nn = pc.if_else(
                    pc.is_valid(col),
                    pc.if_else(pc.is_valid(num), one, two), zero)
                b = b.append_column(f"__nn_{v}", nn)
                b = b.append_column(f"__k1_{v}",
                                    pc.fill_null(num, 0.0))
                b = b.append_column(f"__k2_{v}", lex)
            return b

        keys: list[str] = []
        desc: list[bool] = []
        for v, d in q.order_by:
            keys += [f"__nn_{v}", f"__k1_{v}", f"__k2_{v}"]
            desc += [d, d, d]
        ds = (ds.map_batches(add_keys, batch_format="pyarrow")
              .sort(keys, descending=desc)
              .map_batches(
                  lambda b, _c=list(cols): b.drop_columns(
                      [f"__{k}_{v}" for v in _c
                       for k in ("nn", "k1", "k2")]),
                  batch_format="pyarrow"))
    if q.offset:
        # OFFSET: take the first offset+limit rows of the (ordered)
        # stream, slice driver-side — bounded by the user's own page
        # size, never the result cardinality
        if q.limit is None:
            raise SparqlError(
                "OFFSET without LIMIT is out of the supported subset")
        head = ds.limit(q.offset + q.limit)
        tbls = [t for t in head.iter_batches(batch_format="pyarrow")
                if t.num_rows]
        if tbls:
            tbl = pa.concat_tables(tbls).slice(q.offset, q.limit)
        else:
            tbl = pa.schema([(c, pa.string())
                             for c in ds.columns()]).empty_table()
        return ray.data.from_arrow(tbl)
    if q.limit is not None:
        ds = ds.limit(q.limit)
    return ds


def _apply_aggregates(bind: _Bind, q: Query) -> "ray.data.Dataset":
    """GROUP BY + COUNT/MIN/MAX/SUM/AVG/SAMPLE/GROUP_CONCAT planning.
    Group keys are the GROUP BY vars (or the plain projected vars when
    GROUP BY is implicit); the output projects the SELECT list: plain
    vars first, then visible aggregate aliases — counts as int64,
    SUM/AVG as float64 over the NUMERIC lexical values of the bound
    terms (non-numeric terms contribute nothing, SPARQL type-error
    semantics). COUNT(?v) skips unbound values (OPTIONAL-bound vars
    can be null); COUNT(*) counts every solution. SAMPLE returns the
    MINIMUM term of the group (deterministic, a legal 'any value');
    GROUP_CONCAT joins the group's terms in SORTED order (default
    separator " ") — deterministic under any partitioning.

    HAVING constraints — possibly over hidden synthesized aggregates —
    filter the aggregated (group-key-sized) result before projection.

    Driver-sized bindings aggregate in one polars pass; Dataset-sized
    bindings use Ray's groupby aggregate (group-key-sized output) —
    or, when SAMPLE/GROUP_CONCAT are requested, one vectorized
    ``map_groups`` pass over the key-shuffled groups — then ORDER BY /
    LIMIT run on the (small) aggregated result."""
    import polars as pl
    keys = q.group_by or list(q.select_vars)
    needed = sorted(set(keys) | {a.var for a in q.aggs if a.var})
    avail = set(bind.cols())
    missing = [v for v in needed if v not in avail]
    if missing:
        raise SparqlError(f"aggregate vars not bound: {missing}")
    out_cols = list(q.select_vars) + [a.alias for a in q.aggs
                                      if not a.hidden]
    # hidden aggregates referenced by ORDER BY survive the projection
    # until after the sort, then drop (same pattern as the derived
    # sort keys)
    ord_hidden = [v for v, _ in (q.order_by or [])
                  if any(a.alias == v and a.hidden for a in q.aggs)]
    proj_cols = out_cols + ord_hidden
    num_vars = sorted({a.var for a in q.aggs
                       if a.func in ("sum", "avg")})

    def with_num(b: pa.Table, _nv=list(num_vars), _cls=dict(bind.cls)
                 ) -> pa.Table:
        for v in _nv:
            b = b.append_column(f"__num_{v}", _numeric_form(
                b[v].combine_chunks(), _cls.get(v, "iri")))
        return b

    def alias_type(c: str):
        for a in q.aggs:
            if a.alias == c:
                return (pa.int64() if a.func == "count"
                        else pa.float64() if a.func in ("sum", "avg")
                        else pa.string())
        return pa.string()

    def pl_exprs() -> list:
        exprs = []
        for a in q.aggs:
            if a.func == "count":
                e = (pl.len() if a.var is None
                     else pl.col(a.var).drop_nulls().n_unique()
                     if a.distinct
                     else pl.col(a.var).count()).cast(pl.Int64)
            elif a.func == "min":
                e = pl.col(a.var).min()
            elif a.func == "max":
                e = pl.col(a.var).max()
            elif a.func == "sample":
                # deterministic 'any value': the minimum term
                e = pl.col(a.var).drop_nulls().min()
            elif a.func == "group_concat":
                col = pl.col(a.var).drop_nulls()
                if a.distinct:
                    col = col.unique()
                e = col.sort().str.join(
                    a.sep if a.sep is not None else " ")
            else:
                nc = pl.col(f"__num_{a.var}")
                if a.distinct:    # SUM/AVG(DISTINCT): numeric values
                    nc = nc.drop_nulls().unique()
                # all-null -> null (matches the Dataset path's
                # ignore_nulls aggregation, not polars' sum()==0)
                agg_e = nc.sum() if a.func == "sum" else nc.mean()
                e = (pl.when(nc.is_not_null().any()).then(agg_e)
                     .otherwise(None).cast(pl.Float64))
            exprs.append(e.alias(a.alias))
        return exprs

    def pl_having(agg: "pl.DataFrame") -> "pl.DataFrame":
        for alias, op, val in q.having:
            c = pl.col(alias).cast(pl.Float64)
            cond = {"=": c == val, "!=": c != val, "<": c < val,
                    ">": c > val, "<=": c <= val, ">=": c >= val}[op]
            # null aggregate (e.g. SUM over all-non-numeric) -> drop,
            # SPARQL type-error semantics
            agg = agg.filter(cond.fill_null(False))
        return agg

    if bind.small:
        df = pl.from_arrow(with_num(bind.data) if num_vars
                           else bind.data)
        agg = (df.group_by(keys).agg(pl_exprs()) if keys
               else df.select(pl_exprs()))
        agg = pl_having(agg).select(proj_cols)
        tbl = agg.to_arrow()
        tbl = tbl.cast(pa.schema([(c, alias_type(c))
                                  for c in tbl.column_names]))
        # ordering unified through _order_limit (numeric-aware sort
        # keys for string group vars, native sort for numeric aliases)
        res = _order_limit(ray.data.from_arrow(tbl),
                           Query(q.form, q.distinct, [], [], q.where,
                                 {}, order_by=q.order_by,
                                 limit=q.limit, offset=q.offset))
        if ord_hidden:
            res = res.map_batches(
                lambda b, _s=list(out_cols): b.select(_s),
                batch_format="pyarrow")
        return res

    from ray.data.aggregate import Count, Max, Mean, Min, Sum
    # COUNT(*) probes an arbitrary bound column: bindings are never
    # null (inner-join planner), and bare Count() miscounts on this Ray
    # version when the dataset carries a schema-seed block
    probe = keys[0] if keys else sorted(avail)[0]
    specs = []
    for a in q.aggs:
        if a.func == "count":
            # COUNT(?v) skips unbound (null) values — OPTIONAL-bound
            # vars can be null — while the COUNT(*) probe column is a
            # group key / always-bound var and counts every row; both
            # paths (this and the polars pl.col(v).count() small path)
            # now agree on null handling
            specs.append(Count(a.var or probe,
                               ignore_nulls=a.var is not None,
                               alias_name=a.alias))
        elif a.func == "min":
            specs.append(Min(a.var, alias_name=a.alias))
        elif a.func == "max":
            specs.append(Max(a.var, alias_name=a.alias))
        elif a.func == "sample":
            # deterministic 'any value' == the minimum term
            specs.append(Min(a.var, alias_name=a.alias))
        elif a.func == "sum":
            specs.append(Sum(f"__num_{a.var}", ignore_nulls=True,
                             alias_name=a.alias))
        else:
            specs.append(Mean(f"__num_{a.var}", ignore_nulls=True,
                              alias_name=a.alias))
    data = _batch_guard(bind.data)
    if num_vars:
        data = data.map_batches(with_num, batch_format="pyarrow")
    whole_group = any(a.func == "group_concat" or a.distinct
                      for a in q.aggs)
    if whole_group and keys:
        # GROUP_CONCAT / COUNT(DISTINCT) need the group's full value
        # list in one place: ONE key-shuffle, then one vectorized
        # polars pass per group computes EVERY aggregate (sorted-join
        # for the concat — deterministic under any block layout).
        # Output stays group-key-sized.

        def per_group(g: pa.Table) -> pa.Table:
            return pl.from_arrow(g).group_by(keys).agg(
                pl_exprs()).to_arrow()

        agg_ds = data.groupby(keys).map_groups(
            per_group, batch_format="pyarrow")
    elif whole_group:
        if any(a.func == "group_concat" for a in q.aggs):
            raise SparqlError(
                "GROUP_CONCAT without GROUP BY is out of the "
                "supported subset on large binding sets (the result "
                "row scales with the input)")
        # global COUNT/SUM/AVG(DISTINCT ?v): one bucketed distinct
        # pass per deduplicated column (group-key-free, stays
        # distributed) — COUNT counts the distinct terms, SUM/AVG
        # aggregate the distinct numeric values; MIN/MAX/SAMPLE are
        # distinct-invariant and run in the normal combiner pass with
        # the non-distinct aggregates
        from .stages.dedup import distinct as _ds_distinct
        vals: dict[str, object] = {}
        plain = [(s, a) for s, a in zip(specs, q.aggs)
                 if not a.distinct or a.func in ("min", "max",
                                                 "sample")]
        if plain:
            row = data.aggregate(*[s for s, _ in plain])
            vals.update(row)
        for a in q.aggs:
            if not a.distinct or a.func in ("min", "max", "sample"):
                continue
            col = a.var if a.func == "count" else f"__num_{a.var}"
            proj = data.map_batches(
                lambda b, _v=col: b.select([_v]).filter(
                    pc.is_valid(b[_v])),
                batch_format="pyarrow")
            dvals = _ds_distinct(proj, [col])
            if a.func == "count":
                vals[a.alias] = dvals.count()
            else:
                spec = (Sum(col, ignore_nulls=True,
                            alias_name=a.alias) if a.func == "sum"
                        else Mean(col, ignore_nulls=True,
                                  alias_name=a.alias))
                vals[a.alias] = dvals.aggregate(spec)[a.alias]
        tbl = pa.table({a.alias: pa.array([vals[a.alias]],
                                          alias_type(a.alias))
                        for a in q.aggs})
        agg_ds = ray.data.from_arrow(tbl)
    elif keys:
        agg_ds = data.groupby(keys).aggregate(*specs)
    else:
        row = data.aggregate(*specs)
        tbl = pa.table({a.alias: [row[a.alias]] for a in q.aggs})
        agg_ds = ray.data.from_arrow(tbl)

    types = {c: alias_type(c) for c in proj_cols}

    def finish(b: pa.Table, _out=list(proj_cols), _ty=dict(types),
               _hav=list(q.having)) -> pa.Table:
        for alias, op, val in _hav:
            col = pc.cast(b[alias], pa.float64())
            fn = {"=": pc.equal, "!=": pc.not_equal, "<": pc.less,
                  ">": pc.greater, "<=": pc.less_equal,
                  ">=": pc.greater_equal}[op]
            # null mask entries (null aggregates) drop the row —
            # SPARQL type-error semantics
            b = b.filter(fn(col, pa.scalar(float(val), pa.float64())))
        b = b.select(_out)
        return b.cast(pa.schema([(c, _ty[c]) for c in b.column_names]))

    res = _order_limit(
        agg_ds.map_batches(finish, batch_format="pyarrow"), q)
    if ord_hidden:
        res = res.map_batches(
            lambda b, _s=list(out_cols): b.select(_s),
            batch_format="pyarrow")
    return res


def sparql_insert(store_dir: str, q: Query) -> "ray.data.Dataset":
    """SPARQL-Update INSERT..WHERE applied to the store: derive the
    template graph, anti-join against the already-asserted partitions
    of the derived predicates (graph union is a SET — a re-run inserts
    nothing), append the genuinely new rows to the partitioned layout.
    Returns the derived graph (same rows a CONSTRUCT would yield)."""
    derived = _update_graph(store_dir, q).materialize()
    _apply_insert_graph(store_dir, derived)
    return derived


def _apply_insert_graph(store_dir: str,
                        derived: "ray.data.Dataset") -> None:
    """Append a MATERIALIZED (s, p, o) graph to the store with set
    semantics (anti-join against the already-asserted partitions of
    the derived predicates)."""
    from .sinks.ntriples_sink import write_graph_partitioned
    from .sinks.store_query import query_triples
    preds = set()
    for b in derived.iter_batches(batch_format="pyarrow"):
        preds.update(pc.unique(b["p"].combine_chunks()).to_pylist())
    existing_parts = [query_triples(store_dir, p=pr) for pr in sorted(preds)]
    spo = ["s", "p", "o"]
    new = _Bind(derived, {"s": "iri", "p": "iri", "o": "term"}, spo)
    if existing_parts:
        ex = existing_parts[0]
        for e in existing_parts[1:]:
            ex = ex.union(e)
        new = _anti_join(
            new, _Bind(ex, {"s": "iri", "p": "iri", "o": "term"}, spo),
            spo)
    data = (ray.data.from_arrow(new.data) if new.small else new.data)
    data = data.materialize()
    if data.count() > 0:
        write_graph_partitioned(data, store_dir)


def _update_graph(store_dir: str, q: Query) -> "ray.data.Dataset":
    """The (s, p, o) rows an INSERT/DELETE statement denotes: the
    ground template for INSERT DATA / DELETE DATA, else the
    instantiated template over the WHERE solutions (exactly a
    CONSTRUCT)."""
    g = q.where
    if not (g.patterns or g.unions or g.values or g.subqueries):
        return ray.data.from_arrow(pa.table({
            "s": pa.array([pat.s.value for pat in q.template],
                          pa.string()),
            "p": pa.array([pat.p.value for pat in q.template],
                          pa.string()),
            "o": pa.array([_const_repr(pat.o, "term")
                           for pat in q.template], pa.string()),
        }))
    return execute_sparql(store_dir, q)


def sparql_delete(store_dir: str, q: Query) -> "ray.data.Dataset":
    """SPARQL-Update DELETE applied to the store: derive the deletion
    graph, then rewrite ONLY the partitions of the affected predicates
    — per partition directory an (s, p, o) anti-join against the
    deletion set, written to a sibling temp dir and atomically swapped
    in (a crashed run leaves the old partition intact). Partitions of
    untouched predicates are never read. Idempotent: a re-run deletes
    nothing further. Returns the derived deletion graph."""
    derived = _update_graph(store_dir, q).materialize()
    _apply_delete_graph(store_dir, derived)
    return derived


def _apply_delete_graph(store_dir: str,
                        derived: "ray.data.Dataset") -> None:
    """Remove a MATERIALIZED (s, p, o) graph from the store: per
    affected p_key directory an anti-join rewrite with an atomic
    swap."""
    import glob as _glob
    import shutil
    import uuid

    from .sinks.ntriples_sink import predicate_key

    preds: set[str] = set()
    for b in derived.iter_batches(batch_format="pyarrow"):
        preds.update(pc.unique(b["p"].combine_chunks()).to_pylist())
    spo = ["s", "p", "o"]
    cls3 = {"s": "iri", "p": "iri", "o": "term"}
    dmb = _smallify(_Bind(derived, cls3, spo), spo)
    base = os.path.join(store_dir, "triples_by_predicate")
    # one rewrite per partition DIR (two deleted predicates may share
    # a crc-fallback p_key; the anti-join is on full (s,p,o) so rows
    # of co-located predicates survive untouched)
    pdirs = sorted({os.path.join(base, f"p_key={predicate_key(pr)}")
                    for pr in preds})
    for pdir in pdirs:
        files = sorted(_glob.glob(os.path.join(pdir, "*.parquet")))
        if not files:
            continue
        stored = ray.data.read_parquet(files, columns=spo)
        remaining = _anti_join(_Bind(stored, cls3, spo), dmb, spo)
        tmp = pdir + ".rewrite-" + uuid.uuid4().hex[:8]
        if remaining.small:
            if remaining.data.num_rows:
                import pyarrow.parquet as pq
                os.makedirs(tmp)
                pq.write_table(remaining.data.select(spo),
                               os.path.join(tmp, "part-0.parquet"))
        else:
            data = remaining.data.materialize()
            if data.count():
                data.write_parquet(tmp)
        old = pdir + ".old-" + uuid.uuid4().hex[:8]
        os.rename(pdir, old)
        if os.path.isdir(tmp):
            os.rename(tmp, pdir)
        shutil.rmtree(old)


def _modify_graphs(store_dir: str, q: Query
                   ) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Derive a combined DELETE/INSERT's two graphs from the SAME
    pre-state (both materialized BEFORE any mutation, so the delete
    cannot change what the insert template saw — SPARQL 1.1 Update
    §3.1.3 evaluates WHERE once against the original store)."""
    dq = Query("delete", True, [], q.template, q.where, q.prefixes)
    iq = Query("insert", True, [], q.insert_template, q.where,
               q.prefixes)
    return (_update_graph(store_dir, dq).materialize(),
            _update_graph(store_dir, iq).materialize())


def _tag_action(ds: "ray.data.Dataset", action: str
                ) -> "ray.data.Dataset":
    def tag(b: pa.Table, _a=action) -> pa.Table:
        return b.append_column(
            "action", pa.array([_a] * b.num_rows, pa.string()))
    return ds.map_batches(tag, batch_format="pyarrow")


def sparql_modify(store_dir: str, q: Query) -> "ray.data.Dataset":
    """Combined DELETE {t1} INSERT {t2} WHERE {g} applied to the
    store: both graphs derive from the pre-state bindings, then the
    deletion rewrite runs first and the set-semantics append second
    (a row in both templates ends up present — delete-then-insert,
    per spec). Returns the tagged union of the two derived graphs
    (``action`` = 'delete' | 'insert')."""
    dg, ig = _modify_graphs(store_dir, q)
    _apply_delete_graph(store_dir, dg)
    _apply_insert_graph(store_dir, ig)
    return _tag_action(dg, "delete").union(_tag_action(ig, "insert"))


def _load_graph(q: Query) -> "ray.data.Dataset":
    """The deduplicated (s, p, o) graph a LOAD statement denotes —
    file:// IRIs and plain paths both resolve locally; with SILENT a
    read failure yields the empty graph instead of raising."""
    from .sources.rdfsource import read_rdf_auto
    from .stages.dedup import distinct
    path = q.update_iri
    if path.startswith("file://"):
        path = path[len("file://"):]
    sch = pa.schema([("s", pa.string()), ("p", pa.string()),
                     ("o", pa.string())])
    try:
        return distinct(read_rdf_auto(path), ["s", "p", "o"])
    except Exception:
        if q.silent:
            return ray.data.from_arrow(sch.empty_table())
        raise


def sparql_load(store_dir: str, q: Query) -> "ray.data.Dataset":
    """SPARQL-Update LOAD applied to the store: parse the source
    through the distributed bulk readers, then the same set-semantics
    append INSERT uses (a re-LOAD inserts nothing). Returns the
    loaded graph."""
    derived = _load_graph(q).materialize()
    _apply_insert_graph(store_dir, derived)
    return derived


def sparql_clear(store_dir: str, q: Query) -> "ray.data.Dataset":
    """SPARQL-Update CLEAR DEFAULT / ALL (== DROP in the single-graph
    store): atomically remove every predicate partition, leaving a
    valid empty store. Returns the empty graph."""
    import shutil
    import uuid
    from .sinks.store_query import _STORE_SUB
    base = os.path.join(store_dir, _STORE_SUB)
    if os.path.isdir(base):
        old = base + ".old-" + uuid.uuid4().hex[:8]
        os.rename(base, old)
        os.makedirs(base)
        shutil.rmtree(old)
    sch = pa.schema([("s", pa.string()), ("p", pa.string()),
                     ("o", pa.string())])
    return ray.data.from_arrow(sch.empty_table())


def run_sparql_statement(store_dir: str, q: Query,
                         apply_updates: bool = False
                         ) -> "ray.data.Dataset":
    """Run ONE parsed statement against the store. Update statements
    mutate it only when ``apply_updates`` is set (else they preview:
    the derived graph for INSERT/DELETE/LOAD — like a CONSTRUCT —
    the tagged union of both graphs for a combined DELETE/INSERT,
    the streamed would-be-removed scan for CLEAR)."""
    from .sinks.store_query import query_triples
    if q.form == "insert" and apply_updates:
        return sparql_insert(store_dir, q)
    if q.form == "delete" and apply_updates:
        return sparql_delete(store_dir, q)
    if q.form == "modify" and apply_updates:
        return sparql_modify(store_dir, q)
    if q.form == "modify":
        dg, ig = _modify_graphs(store_dir, q)
        return (_tag_action(dg, "delete")
                .union(_tag_action(ig, "insert")))
    if q.form == "load":
        g = _load_graph(q)
        if apply_updates:
            g = g.materialize()
            _apply_insert_graph(store_dir, g)
        return g
    if q.form == "clear":
        if apply_updates:
            return sparql_clear(store_dir, q)
        return query_triples(store_dir)
    if q.form in ("insert", "delete"):
        return _update_graph(store_dir, q)
    return execute_sparql(store_dir, q)


def run_sparql_file(store_dir: str, text: str,
                    apply_updates: bool = False) -> list["ray.data.Dataset"]:
    """Parse a multi-statement .sparql file and run every statement
    against the store, in order (see ``run_sparql_statement`` for the
    update/preview semantics)."""
    return [run_sparql_statement(store_dir, q, apply_updates)
            for q in parse_sparql(text)]


# ------------------------------------------------- the reference file

#: Verbatim copy of the reference's hand-off artifact
#: (/root/reference/csv2rdf-v4/jena/requests.sparql:1-31) — query DATA,
#: not engine code; tests assert byte-parity with the original when the
#: reference tree is present.
REQUESTS_SPARQL = """\
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
prefix ns1: <https://www.olivier.com/rdf/mipl/>
prefix ns1v1: <https://www.olivier.com/rdf/mipl/v01/>
prefix ns1v2: <https://www.olivier.com/rdf/mipl/v02/>

select ?x ?y ?z where {?x ?y ?z}

#### Inference principle
CONSTRUCT {?x ?r ?y .}
WHERE {?x ?q ?y .
?q rdfs:subPropertyOf ?r }


#### Créer les enregistrements sur un endpoint /update
INSERT { ?x ?r ?y . }
  where {
  { ?x ?q ?y .
  ?q rdfs:subPropertyOf ?r . }
}

#### gestion des versions avec utilisation de la dernière version et de la relation mère uniquement
SELECT distinct ?x ?z
WHERE
{
	?x ns1v2:applicable_to ?z .
	MINUS {
		?x ?r1 ?z .
		?r1 rdfs:subPropertyOf ns1:applicable_to .
		filter(?r1 != ns1v2:applicable_to)
	}
}



"""

_REFERENCE_PATH = "/root/reference/csv2rdf-v4/jena/requests.sparql"


def load_reference_requests() -> str:
    """The reference's own .sparql text: read the file when the
    reference tree is mounted, else the verbatim embedded copy."""
    if os.path.exists(_REFERENCE_PATH):
        with open(_REFERENCE_PATH, encoding="utf-8") as f:
            return f.read()
    return REQUESTS_SPARQL
