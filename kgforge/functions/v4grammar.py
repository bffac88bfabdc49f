"""v4 grammar dialect — sanitize-first parser with v3-style type
chains, subject/object standard triples + rdfs:domain/range, the
prepend-prefix, and the NON-INTERACTIVE map fallback including the
``"STRANGE"`` blank-slice sentinel
(/root/reference/csv2rdf-v4/csv2rdf-v4.py).

Faithful v4 semantics, preserved exactly:
- the 15-char v4 sanitizer (v2's 8 chars + ``\\<>|{}^``,
  csv2rdf-v4.py:209-216) runs over EVERY cell and the pkey BEFORE rule
  evaluation (:556-566); empty-skip tests the SANITIZED cell (:559-562)
- grammar keys are cell/celltypes/columntypes; usable cell roles are
  only subject|object — 'predicate' exits the reference (:475-478), a
  compile-time GrammarError here. Unlike v5, an alteration command
  does NOT force the object role (v4 splits the cellgrammar first,
  :340, then tests ``cellgrammar[0]``; v5 compares the full string)
- ``map(all;*l*)`` misses fall back to the (sanitized) cell;
  ``map(i:j;*l*)`` misses fall back to the LOWERED slice, or the
  literal ``"STRANGE"`` when the slice is blank (:359-384) — the
  non-interactive successor of v2's interactive halt
- ``prefix(p)`` PREPENDS (:393-395; v5 later flipped to append)
- ``generate_type_triples`` (:276-294): every entry of a comma chain
  is typed rdfs:Class (cell side) / rdf:Property (column side) with
  RAW (unsanitized) chain URIs, plus subClassOf / subPropertyOf links
- pkey cell -> ``(domain+cell, rdf:type, domain+fp(celltype))`` + the
  class chain (:329-336); ``celltypes = string`` marks the
  pkey-description column emitting ``rdfs:comment`` with the
  SANITIZED cell as literal (:322-327)
- general cells RE-sanitize the altered value at mint time (:405) —
  matters for mapped values that contain reserved characters
- NO rdfs:label triples (that's a v5 addition)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ..ntriples import (KIND_LIT, KIND_URI, RDF_PROPERTY, RDF_TYPE,
                        RDFS_CLASS, RDFS_DOMAIN, RDFS_NS, RDFS_RANGE,
                        RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF)
from ..rules import (ALTER_EXTRACT, ALTER_MAP_ALL, ALTER_MAP_PART,
                     ALTER_NONE, ALTER_PREFIX, Alteration, GrammarError,
                     _read_config, parse_alteration)
from ..sqlgen import _plain_lit_sql, slice_sql, sql_quote
from ..stages.triples import TRIPLE_SCHEMA, _const_col

V4_SANITIZE_CHARS = [" ", "-", "/", "\\", "(", ")", ",", '"', "'",
                     "<", ">", "|", "{", "}", "^"]
_V4_SET = frozenset(V4_SANITIZE_CHARS)
V4_SANITIZE_REGEX = r"""[ /\\(),"'<>|{}^-]"""
_V4_SQL_CLASS = r"""[ /\\(),"'<>|{}^-]"""

RDFS_COMMENT = RDFS_NS + "comment"

STRANGE = "STRANGE"


def v4_format_predicate(s: str) -> str:
    """Scalar format_predicate (csv2rdf-v4.py:209-216)."""
    return "".join("_" if c in _V4_SET else c for c in s)


def v4_sanitize_array(arr: pa.Array) -> pa.Array:
    return pc.replace_substring_regex(arr, pattern=V4_SANITIZE_REGEX,
                                      replacement="_")


def v4_sanitize_sql(expr: str) -> str:
    return f"regexp_replace({expr}, {sql_quote(_V4_SQL_CLASS)}, '_', 'g')"


def v4_apply_alteration(alt: Alteration, arr: pa.Array) -> pa.Array:
    """Vectorized v4 alter (csv2rdf-v4.py:346-400). ``arr`` is already
    parser-sanitized and non-empty (loop-level skip)."""
    if alt.mode == ALTER_NONE:
        return arr
    if alt.mode == ALTER_MAP_ALL:
        probe = pc.utf8_lower(arr)
        enc = pc.dictionary_encode(probe)
        uniq = enc.dictionary.to_pylist()
        hit = pa.array([u is not None and u in alt.maptable
                        for u in uniq]).take(enc.indices)
        mapped = pa.array([alt.maptable.get(u) if u is not None else None
                           for u in uniq], type=pa.string()).take(enc.indices)
        # miss: cell if cell.strip() != '' else STRANGE (:365-369).
        blank = pc.equal(pc.utf8_trim_whitespace(arr), "")
        fallback = pc.if_else(blank, pa.scalar(STRANGE), arr)
        return pc.if_else(hit, mapped, fallback)
    if alt.mode == ALTER_MAP_PART:
        temp = pc.utf8_lower(slice_arr(arr, alt.lo, alt.hi))
        enc = pc.dictionary_encode(temp)
        uniq = enc.dictionary.to_pylist()
        hit = pa.array([u is not None and u in alt.maptable
                        for u in uniq]).take(enc.indices)
        mapped = pa.array([alt.maptable.get(u) if u is not None else None
                           for u in uniq], type=pa.string()).take(enc.indices)
        # miss: temp if temp.strip() != '' else STRANGE (:380-384) —
        # v4 keeps the LOWERED SLICE, not the original cell
        blank = pc.equal(pc.utf8_trim_whitespace(temp), "")
        fallback = pc.if_else(blank, pa.scalar(STRANGE), temp)
        return pc.if_else(hit, mapped, fallback)
    if alt.mode == ALTER_EXTRACT:
        return slice_arr(arr, alt.lo, alt.hi)
    if alt.mode == ALTER_PREFIX:
        # v4 PREPENDS (:393-395)
        return pc.binary_join_element_wise(pa.scalar(alt.prefix), arr, "")
    raise AssertionError("unreachable")


def slice_arr(arr: pa.Array, lo: int, hi: int) -> pa.Array:
    return pc.utf8_slice_codeunits(arr, start=lo, stop=hi)


def v4_alteration_sql(alt: Alteration, expr: str) -> str:
    """v4 alter as a SQL expression (evaluated on non-empty sanitized
    cells only)."""
    if alt.mode == ALTER_NONE:
        return expr
    if alt.mode in (ALTER_MAP_ALL, ALTER_MAP_PART):
        probe = (f"lower({expr})" if alt.mode == ALTER_MAP_ALL
                 else f"lower({slice_sql(expr, alt.lo, alt.hi)})")
        whens = " ".join(f"WHEN {sql_quote(k)} THEN {sql_quote(v)}"
                         for k, v in alt.maptable.items())
        fb_val = expr if alt.mode == ALTER_MAP_ALL else probe
        fallback = (f"(CASE WHEN trim({fb_val}) <> '' THEN {fb_val} "
                    f"ELSE {sql_quote(STRANGE)} END)")
        return f"(CASE {probe} {whens} ELSE {fallback} END)"
    if alt.mode == ALTER_EXTRACT:
        return slice_sql(expr, alt.lo, alt.hi)
    if alt.mode == ALTER_PREFIX:
        return f"({sql_quote(alt.prefix)} || {expr})"
    raise AssertionError("unreachable")


@dataclass
class V4Column:
    section: str
    kind: str                  # 'pkey' | 'descr' | 'general'
    role: str = ""             # subject | object
    celltypes: tuple[str, ...] = ()
    columntypes: tuple[str, ...] = ()
    alteration: Alteration = field(default_factory=Alteration)

    @property
    def source_column(self) -> str:
        if len(self.section) >= 2 and self.section[-2] == "$":
            return self.section.split("$")[0]
        return self.section


@dataclass
class V4Grammar:
    domain: str
    columns: dict[str, V4Column]
    lists: dict[str, dict[str, str]]
    pkey_section: str
    pkeytype: str


def compile_v4_grammar(text_or_path: str, domain: str) -> V4Grammar:
    config = _read_config(text_or_path)
    lists = {s: dict(config[s]) for s in config.sections()
             if s.startswith("*") and s.endswith("*")}
    cols: dict[str, V4Column] = {}
    pkey_section = pkeytype = None
    for s in config.sections():
        if s.startswith("*"):
            continue
        o = dict(config[s])
        if o["cell"] == "ignore":
            continue
        if o["cell"] == "pkey":
            cols[s] = V4Column(s, "pkey", celltypes=tuple(
                o["celltypes"].split(",")))
            pkey_section = s
            pkeytype = o["celltypes"].split(",")[0]
            continue
        if o["celltypes"] == "string":
            cols[s] = V4Column(s, "descr")
            continue
        role = o["cell"].split(",")[0]
        if role == "predicate":
            # the reference hard-exits ONLY on 'predicate'
            # (csv2rdf-v4.py:432-434); any other unknown role falls
            # through its if/elif silently AFTER step 1 typed the cell
            # (:411-412) — modelled here as a type-only column
            raise GrammarError(
                "v4 cell role 'predicate' unsupported — the reference "
                "exits on it (csv2rdf-v4.py:432-434)")
        cols[s] = V4Column(s, "general", role,
                           tuple(o["celltypes"].split(",")),
                           tuple(o.get("columntypes", "").split(",")),
                           alteration=parse_alteration(o["cell"], lists))
    if pkey_section is None:
        raise GrammarError("v4 grammar: no pkey section")
    return V4Grammar(domain, cols, lists, pkey_section, pkeytype)


def _chain_triples(lst: tuple[str, ...], domain: str,
                   is_class: bool) -> list[tuple]:
    """generate_type_triples (csv2rdf-v4.py:276-294): RAW chain URIs."""
    meta = RDFS_CLASS if is_class else RDF_PROPERTY
    sub = RDFS_SUBCLASSOF if is_class else RDFS_SUBPROPERTYOF
    out = [(domain + t, RDF_TYPE, KIND_URI, meta, "") for t in lst]
    out.extend((domain + a, sub, KIND_URI, domain + b, "")
               for a, b in zip(lst, lst[1:]))
    return out


class V4TripleGenerator:
    """Batch fn: the v4 semantic parser, vectorized. Cells and pkey are
    sanitized FIRST (:556-566), then rules run; altered values are
    re-sanitized at mint time (:405)."""

    def __init__(self, grammar: V4Grammar):
        self.g = grammar

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.g
        dom = g.domain
        f = v4_format_predicate
        pk_col = g.columns[g.pkey_section].source_column
        pk = v4_sanitize_array(
            batch[pk_col].combine_chunks().cast(pa.string()))
        pkt_uri = dom + f(g.pkeytype)
        out = [[], [], [], [], []]

        def emit(s, p, k, l, d):
            for lst, v in zip(out, (s, p, k, l, d)):
                lst.append(v)

        def emit_consts(triples, anyfired):
            if not triples or not anyfired:
                return
            for i in range(5):
                out[i].append(pa.array([t[i] for t in triples],
                                       type=pa.string()))

        for col in g.columns.values():
            cells = v4_sanitize_array(
                batch[col.source_column].combine_chunks().cast(pa.string()))
            mask = pc.fill_null(pc.and_kleene(
                pc.not_equal(cells, ""), pc.is_valid(cells)), False)
            n = pc.sum(mask).as_py() or 0
            if n == 0:
                continue
            cell = cells.filter(mask)
            pkv = pk.filter(mask)
            if col.kind == "pkey":
                s = pc.binary_join_element_wise(pa.scalar(dom), cell, "")
                emit(s, _const_col(RDF_TYPE, n), _const_col(KIND_URI, n),
                     _const_col(dom + f(col.celltypes[0]), n),
                     _const_col("", n))
                emit_consts(_chain_triples(col.celltypes, dom, True), True)
            elif col.kind == "descr":
                s = pc.binary_join_element_wise(pa.scalar(dom), pkv, "")
                emit(s, _const_col(RDFS_COMMENT, n), _const_col(KIND_LIT, n),
                     cell, _const_col("", n))
            else:
                v = v4_apply_alteration(col.alteration, cell)
                rdfcell = pc.binary_join_element_wise(
                    pa.scalar(dom), v4_sanitize_array(v), "")
                ct_uri = dom + f(col.celltypes[0])
                pku = pc.binary_join_element_wise(pa.scalar(dom), pkv, "")
                # 1. type the cell (:411)
                emit(rdfcell, _const_col(RDF_TYPE, n),
                     _const_col(KIND_URI, n), _const_col(ct_uri, n),
                     _const_col("", n))
                if col.role not in ("subject", "object"):
                    # unknown non-predicate role: the reference's
                    # if/elif (:417-434) matches nothing, so only the
                    # step-1 typing triple is emitted
                    continue
                colt_uri = dom + f(col.columntypes[0])
                # 2. standard triple + domain/range (:417-428)
                if col.role == "subject":
                    emit(rdfcell, _const_col(colt_uri, n),
                         _const_col(KIND_URI, n), pku, _const_col("", n))
                    dr = [(colt_uri, RDFS_DOMAIN, KIND_URI, ct_uri, ""),
                          (colt_uri, RDFS_RANGE, KIND_URI, pkt_uri, "")]
                else:
                    emit(pku, _const_col(colt_uri, n),
                         _const_col(KIND_URI, n), rdfcell,
                         _const_col("", n))
                    dr = [(colt_uri, RDFS_DOMAIN, KIND_URI, pkt_uri, ""),
                          (colt_uri, RDFS_RANGE, KIND_URI, ct_uri, "")]
                emit_consts(dr, True)
                emit_consts(_chain_triples(col.celltypes, dom, True), True)
                emit_consts(_chain_triples(col.columntypes, dom, False),
                            True)
        if not out[0]:
            return TRIPLE_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [pa.concat_arrays([a.cast(pa.string()) for a in arrs])
             for arrs in out],
            schema=TRIPLE_SCHEMA)


def v4_to_sql(g: V4Grammar, table: str,
              col_exprs: dict[str, str]) -> str:
    """DuckDB mirror. ``col_exprs``: section -> raw VARCHAR expression."""
    dom = g.domain
    f = v4_format_predicate
    san = v4_sanitize_sql
    pk = san(col_exprs[g.pkey_section])
    pkt_uri = dom + f(g.pkeytype)
    sels = []

    def const(s, p, o_term, guard):
        sels.append(f"SELECT {sql_quote(s)} AS s, {sql_quote(p)} AS p, "
                    f"{sql_quote(o_term)} AS o WHERE EXISTS "
                    f"(SELECT 1 FROM {table} WHERE {guard})")

    def chain_consts(lst, is_class, guard):
        for s_, p_, k_, l_, d_ in _chain_triples(lst, dom, is_class):
            const(s_, p_, f"<{l_}>", guard)

    for col in g.columns.values():
        cell_raw = col_exprs[col.section]
        cell = san(cell_raw)
        fired = f"({cell_raw} IS NOT NULL AND {cell} <> '')"
        if col.kind == "pkey":
            sels.append(f"SELECT ({sql_quote(dom)} || {cell}) AS s, "
                        f"{sql_quote(RDF_TYPE)} AS p, "
                        f"{sql_quote('<' + dom + f(col.celltypes[0]) + '>')}"
                        f" AS o FROM {table} WHERE {fired}")
            chain_consts(col.celltypes, True, fired)
        elif col.kind == "descr":
            sels.append(f"SELECT ({sql_quote(dom)} || {pk}) AS s, "
                        f"{sql_quote(RDFS_COMMENT)} AS p, "
                        f"{_plain_lit_sql(cell)} AS o FROM {table} "
                        f"WHERE {fired}")
        else:
            v = v4_alteration_sql(col.alteration, cell)
            rdfcell = f"({sql_quote(dom)} || {san(v)})"
            ct = dom + f(col.celltypes[0])
            pku = f"({sql_quote(dom)} || {pk})"
            sels.append(f"SELECT {rdfcell} AS s, {sql_quote(RDF_TYPE)} AS p,"
                        f" {sql_quote('<' + ct + '>')} AS o "
                        f"FROM {table} WHERE {fired}")
            if col.role not in ("subject", "object"):
                continue   # unknown role: type-only (see generator)
            colt = dom + f(col.columntypes[0])
            if col.role == "subject":
                sels.append(f"SELECT {rdfcell} AS s, {sql_quote(colt)} AS p,"
                            f" ('<' || {pku} || '>') AS o "
                            f"FROM {table} WHERE {fired}")
                const(colt, RDFS_DOMAIN, f"<{ct}>", fired)
                const(colt, RDFS_RANGE, f"<{pkt_uri}>", fired)
            else:
                sels.append(f"SELECT {pku} AS s, {sql_quote(colt)} AS p, "
                            f"('<' || {rdfcell} || '>') AS o "
                            f"FROM {table} WHERE {fired}")
                const(colt, RDFS_DOMAIN, f"<{pkt_uri}>", fired)
                const(colt, RDFS_RANGE, f"<{ct}>", fired)
            chain_consts(col.celltypes, True, fired)
            chain_consts(col.columntypes, False, fired)
    union = "\nUNION ALL\n".join(sels)
    return f"SELECT DISTINCT s, p, o FROM (\n{union}\n)"
