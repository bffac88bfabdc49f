"""RuleSet → ANSI/DuckDB SQL compiler — the driver-side oracle generator.

Given a compiled grammar (kgforge/rules.py) and a mapping of grammar
sections to SQL expressions over a relational table, emit one SQL query
whose result is the DISTINCT set of rendered (s, p, o) triple terms —
exactly what the Ray engine's TripleGenerator → dedup → render path
produces. This is a third, independent execution path for the v5
semantics (after the Ray engine and the single-process oracle): the
driver runs it through DuckDB and hash-compares.

All v5 quirks carry over:
- sanitizer char class (csv2rdf-v5.py:171-174) via regexp_replace
- Python slice semantics incl. negative indices and the ``hi == 0``
  empty-result quirk (csv2rdf-v5.py:239-247,271-279) via slice_sql()
- lowercase map probe with pass-through-on-miss via CASE ... ELSE cell
- prefix APPENDS (cell || suffix)
- empty/whitespace-only cells skipped
- schema triples emitted only when the rule fired ≥ once (EXISTS guard)
"""

from __future__ import annotations

from .ntriples import RDF_TYPE, RDFS_LABEL, render_literal
from .rules import (
    ALTER_EXTRACT,
    ALTER_MAP_ALL,
    ALTER_MAP_PART,
    ALTER_NONE,
    ALTER_PREFIX,
    Alteration,
    DefaultCellRule,
    DefaultTypeRule,
    LiteralRule,
    MultiValueRule,
    PKeyRule,
    RuleSet,
    URIRule,
)

# DuckDB/RE2 char class equal to rules.SANITIZE_CHARS; single quotes
# doubled for embedding in a SQL string literal.
_SQL_SANITIZE_CLASS = r"""[ /\\(),"''<>|{}^#$*.`+=%-]"""


def sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def sanitize_sql(expr: str) -> str:
    return f"regexp_replace({expr}, {sql_quote(_SQL_SANITIZE_CLASS)}, '_', 'g')"


def escape_literal_sql(expr: str) -> str:
    """N-Triples literal escaping (ntriples.escape_literal) in SQL.
    chr() keeps backslashes/quotes out of the SQL text entirely."""
    e = expr
    e = f"replace({e}, chr(92), chr(92)||chr(92))"          # backslash
    e = f"replace({e}, chr(34), chr(92)||chr(34))"          # double quote
    e = f"replace({e}, chr(10), chr(92)||'n')"              # LF
    e = f"replace({e}, chr(13), chr(92)||'r')"              # CR
    e = f"replace({e}, chr(9),  chr(92)||'t')"              # TAB
    return e


def nonempty_sql(expr: str) -> str:
    """Python ``cell.strip() != ''`` (csv2rdf-v5.py:486): trim ASCII
    whitespace. (Python strips all unicode whitespace; ASCII covers the
    reference's CSV reality.)"""
    ws = "' '||chr(9)||chr(10)||chr(13)||chr(11)||chr(12)"
    return f"({expr} IS NOT NULL AND trim({expr}, {ws}) <> '')"


def slice_sql(expr: str, lo: int, hi: int) -> str:
    """Python ``x[lo:hi]`` in SQL, incl. negative indices and the v5
    ``hi == 0`` quirk (always ''). Verified against Python in
    tests/test_sqlgen.py with randomized bounds."""
    if hi == 0:
        return "''"
    L = f"length({expr})"
    start0 = (f"greatest({L}+({lo}),0)" if lo < 0 else f"least({lo},{L})")
    stop0 = (f"greatest({L}+({hi}),0)" if hi < 0 else f"least({hi},{L})")
    return (f"substr({expr}, CAST({start0} AS BIGINT)+1, "
            f"CAST(greatest(({stop0})-({start0}),0) AS BIGINT))")


def alteration_sql(alt: Alteration, expr: str) -> str:
    """alter_cell_value (csv2rdf-v5.py:258-282) as a SQL expression.
    Callers only evaluate it on non-empty cells (the parser's skip)."""
    if alt.mode == ALTER_NONE:
        return expr
    if alt.mode == ALTER_MAP_ALL:
        whens = " ".join(
            f"WHEN {sql_quote(k)} THEN {sql_quote(v)}"
            for k, v in alt.maptable.items()
        )
        return f"(CASE lower({expr}) {whens} ELSE {expr} END)"
    if alt.mode == ALTER_MAP_PART:
        probe = f"lower({slice_sql(expr, alt.lo, alt.hi)})"
        whens = " ".join(
            f"WHEN {sql_quote(k)} THEN {sql_quote(v)}"
            for k, v in alt.maptable.items()
        )
        return f"(CASE {probe} {whens} ELSE {expr} END)"
    if alt.mode == ALTER_EXTRACT:
        return slice_sql(expr, alt.lo, alt.hi)
    if alt.mode == ALTER_PREFIX:
        return f"({expr} || {sql_quote(alt.prefix)})"
    raise AssertionError("unreachable")


def _uri_sql(domain: str, expr: str) -> str:
    return f"({sql_quote(domain)} || {sanitize_sql(expr)})"


def _plain_lit_sql(expr: str) -> str:
    return f"(chr(34) || {escape_literal_sql(expr)} || chr(34))"


def _typed_lit_sql(expr: str, dt: str) -> str:
    return f"(chr(34) || {escape_literal_sql(expr)} || chr(34) || '^^<{dt}>')"


def _iri_term(expr: str) -> str:
    return f"('<' || {expr} || '>')"


def ruleset_to_sql(rs: RuleSet, table: str, colmap: dict[str, str],
                   include_schema_triples: bool = True) -> str:
    """Compile ``rs`` over ``table`` into one DISTINCT (s,p,o) query.

    ``colmap``: grammar section name -> SQL expression (VARCHAR) for the
    cell value; must include the pkey section. Engine-side stringification
    of non-VARCHAR columns must match the expressions used here (see
    kgforge/stages/prepare.py).
    """
    pk_expr = colmap[rs.pkey.section]
    pkt = rs.pkey_type
    pkv_uri = _uri_sql(rs.domain, pk_expr)
    null_filter = ""
    if rs.null_values:
        in_list = ", ".join(sql_quote(v) for v in sorted(rs.null_values))
        null_filter = f" AND {{cell}} NOT IN ({in_list})"
    selects: list[str] = []

    def sel(s: str, p: str, o: str, where: str) -> None:
        selects.append(
            f"SELECT {s} AS s, {p} AS p, {o} AS o FROM {table} WHERE {where}"
        )

    def const_row(s: str, p: str, o_term: str, guard_expr: str) -> None:
        if not include_schema_triples:
            return
        selects.append(
            f"SELECT {sql_quote(s)} AS s, {sql_quote(p)} AS p, "
            f"{sql_quote(o_term)} AS o WHERE EXISTS (SELECT 1 FROM {table} "
            f"WHERE {nonempty_sql(guard_expr)}"
            f"{null_filter.format(cell=guard_expr)})"
        )

    for rule in rs.rules.values():
        cell = colmap[rule.section]
        fired = nonempty_sql(cell) + null_filter.format(cell=cell)
        if isinstance(rule, PKeyRule):
            cv = _uri_sql(rs.domain, cell)
            ct = rule.uri(rule.celltype)
            sel(cv, sql_quote(RDFS_LABEL), _plain_lit_sql(cell), fired)
            sel(cv, sql_quote(RDF_TYPE), sql_quote(f"<{ct}>"), fired)
            const_row(ct, RDFS_LABEL, render_literal(rule.celltype), cell)
        elif isinstance(rule, URIRule):
            v = alteration_sql(rule.alteration, cell)
            cv = _uri_sql(rs.domain, v)
            ct = rule.uri(rule.celltype)
            colt = rule.uri(rule.columntype)
            sel(cv, sql_quote(RDFS_LABEL), _plain_lit_sql(v), fired)
            sel(cv, sql_quote(RDF_TYPE), sql_quote(f"<{ct}>"), fired)
            if rule.effective_role == "subject":
                sel(cv, sql_quote(colt), _iri_term(pkv_uri), fired)
            else:
                sel(pkv_uri, sql_quote(colt), _iri_term(cv), fired)
            for s_, p_, kind_, lex_, dt_ in (rule.constant_triples() +
                                             rule.domain_range_triples(pkt)):
                o_term = (f"<{lex_}>" if kind_ == "u"
                          else render_literal(lex_, dt_ or None))
                const_row(s_, p_, o_term, cell)
        elif isinstance(rule, MultiValueRule):
            ct = rule.uri(rule.celltype)
            colt = rule.uri(rule.columntype)
            lex_filter = "tok <> ''"
            if rule.lexicon is not None:
                in_list = ", ".join(sql_quote(t) for t in sorted(rule.lexicon))
                lex_filter += f" AND tok IN ({in_list})"
            tok_src = (
                f"(SELECT {pk_expr} AS _pk, unnest(string_split({cell}, "
                f"{sql_quote(rule.separator)})) AS tok FROM {table} "
                f"WHERE {nonempty_sql(cell)})"
            )
            tv = _uri_sql(rs.domain, "tok")
            pkv2 = _uri_sql(rs.domain, "_pk")
            selects.append(
                f"SELECT {tv} AS s, {sql_quote(RDFS_LABEL)} AS p, "
                f"{_plain_lit_sql('tok')} AS o FROM {tok_src} WHERE {lex_filter}")
            selects.append(
                f"SELECT {tv} AS s, {sql_quote(RDF_TYPE)} AS p, "
                f"{sql_quote(f'<{ct}>')} AS o FROM {tok_src} WHERE {lex_filter}")
            selects.append(
                f"SELECT {pkv2} AS s, {sql_quote(colt)} AS p, "
                f"{_iri_term(tv)} AS o FROM {tok_src} WHERE {lex_filter}")
            fired_guard = (
                f"EXISTS (SELECT 1 FROM {tok_src} WHERE {lex_filter})")
            if include_schema_triples:
                for s_, p_, kind_, lex_, dt_ in (
                    rule.constant_triples() + rule.domain_range_triples(pkt)
                ):
                    o_term = (f"<{lex_}>" if kind_ == "u"
                              else render_literal(lex_, dt_ or None))
                    selects.append(
                        f"SELECT {sql_quote(s_)} AS s, {sql_quote(p_)} AS p, "
                        f"{sql_quote(o_term)} AS o WHERE {fired_guard}")
        elif isinstance(rule, LiteralRule):
            colt = rule.uri(rule.columntype)
            sel(pkv_uri, sql_quote(colt), _typed_lit_sql(cell, rule.celltype),
                fired)
            const_row(colt, RDFS_LABEL, render_literal(rule.columntype), cell)
            for s_, p_, kind_, lex_, dt_ in rule.domain_range_triples(pkt):
                const_row(s_, p_, f"<{lex_}>", cell)
        elif isinstance(rule, DefaultTypeRule):
            cv = _uri_sql(rs.domain, cell)
            sel(cv, sql_quote(RDF_TYPE),
                sql_quote(f"<{rule.uri(rule.celltype)}>"), fired)
        elif isinstance(rule, DefaultCellRule):
            colt = rule.uri(rule.columntype)
            sel(pkv_uri, sql_quote(colt), _plain_lit_sql(cell), fired)
        else:  # pragma: no cover
            raise TypeError(type(rule))

    union = "\nUNION ALL\n".join(selects)
    return f"SELECT DISTINCT s, p, o FROM (\n{union}\n)"


def ontology_requirements_sql(rs: RuleSet, table: str,
                              colmap: dict[str, str]) -> str:
    """SQL mirror of the S7 side output (csv2rdf-v5.py:74-87): distinct
    'Cell type:/Column type: <uri>' lines of the rules that fired."""
    selects = []
    for rule in rs.rules.values():
        cell = colmap[rule.section]
        guard = f"EXISTS (SELECT 1 FROM {table} WHERE {nonempty_sql(cell)})"
        if isinstance(rule, MultiValueRule) and rule.lexicon is not None:
            in_list = ", ".join(sql_quote(t) for t in sorted(rule.lexicon))
            guard = (f"EXISTS (SELECT 1 FROM (SELECT unnest(string_split("
                     f"{cell}, {sql_quote(rule.separator)})) AS tok FROM "
                     f"{table} WHERE {nonempty_sql(cell)}) WHERE tok <> '' "
                     f"AND tok IN ({in_list}))")
        for line in rule.ontology_requirements():
            selects.append(f"SELECT {sql_quote(line)} AS requirement "
                           f"WHERE {guard}")
    union = "\nUNION ALL\n".join(selects)
    return f"SELECT DISTINCT requirement FROM (\n{union}\n)"


def triple_terms_sql(inner_sql: str) -> str:
    """Wrap a raw (s,p,o)-IRI query so s/p stay raw and o is a term —
    convenience for composing with engine output comparisons."""
    return inner_sql
