"""v2 grammar dialect — sanitize-first parser, role permutations,
rdf:type chains (/root/reference/csv2rdf-v2/csv2rdf-v2.py).

Differences from v5, preserved exactly:
- the 8-char v2 sanitizer [' ','-','/','(',')',',','"',"'"] runs over
  EVERY cell and the pkey BEFORE rule evaluation (:509-515) — v5
  passes raw values and sanitizes only at mint time
- empty-skip tests the SANITIZED cell == '' (so whitespace-only cells
  are NOT skipped — they become '_'-runs) (:510-514)
- grammar keys are cell/celltypes/column/columntypes; celltypes ==
  'string' marks the pkey-description column which emits
  ``(pkey, rdfs:comment, "cell")`` with the SANITIZED cell as the
  literal (:359-363)
- of the 6 cell×column role permutations only three execute in the
  reference — subject/predicate, object/predicate, predicate/subject;
  the other three call ``store.add`` with 3 positional args and crash
  with TypeError (:301-310, :389-400). We raise GrammarError at compile
  time for those (crash parity, moved to config time).
- comma-separated celltypes/columntypes become rdf:type chains with the
  special terms RDFS:RESOURCE / RDF:PROPERTY / RDFS:COMMENT and RAW
  (unsanitized) chain URIs (:209-231)
- map() misses interactively halt the reference (:327-343); we raise —
  the non-interactive equivalent (v4/v5's pass-through came later)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ..ntriples import (KIND_LIT, KIND_URI, RDF_NS, RDF_TYPE, RDFS_NS)
from ..rules import (Alteration, GrammarError, _read_config,
                     parse_alteration)
from ..sqlgen import _plain_lit_sql, alteration_sql, sql_quote
from ..stages.triples import (TRIPLE_SCHEMA, _const_col, apply_alteration)

V2_SANITIZE_CHARS = [" ", "-", "/", "(", ")", ",", '"', "'"]
_V2_SET = frozenset(V2_SANITIZE_CHARS)
V2_SANITIZE_REGEX = r"""[ /(),"'-]"""

_SPECIAL = {"RDFS:RESOURCE": RDFS_NS + "Resource",
            "RDF:PROPERTY": RDF_NS + "Property",
            "RDFS:COMMENT": RDFS_NS + "comment"}

RDFS_COMMENT = RDFS_NS + "comment"

_WORKING = {("subject", "predicate"), ("object", "predicate"),
            ("predicate", "subject")}


def v2_format_predicate(s: str) -> str:
    return "".join("_" if c in _V2_SET else c for c in s)


def v2_sanitize_array(arr: pa.Array) -> pa.Array:
    return pc.replace_substring_regex(arr, pattern=V2_SANITIZE_REGEX,
                                      replacement="_")


def _chain_target(t: str, domain: str) -> str:
    return _SPECIAL.get(t.upper(), domain + t)  # raw — no sanitizer


@dataclass
class V2Column:
    section: str
    kind: str                  # 'pkey' | 'descr' | 'general'
    cellrole: str = ""         # full 'cell' value (role[,command])
    colrole: str = ""
    celltypes: tuple[str, ...] = ()
    columntypes: tuple[str, ...] = ()
    alteration: Alteration = field(default_factory=Alteration)

    @property
    def source_column(self) -> str:
        if len(self.section) >= 2 and self.section[-2] == "$":
            return self.section.split("$")[0]
        return self.section


@dataclass
class V2Grammar:
    domain: str
    columns: dict[str, V2Column]
    lists: dict[str, dict[str, str]]
    pkey_section: str


def compile_v2_grammar(text_or_path: str, domain: str) -> V2Grammar:
    config = _read_config(text_or_path)
    lists = {s: dict(config[s]) for s in config.sections()
             if s.startswith("*") and s.endswith("*")}
    cols: dict[str, V2Column] = {}
    pkey_section = None
    for s in config.sections():
        if s.startswith("*"):
            continue
        o = dict(config[s])
        if o["cell"] == "ignore":
            continue
        if o["cell"] == "pkey":
            cols[s] = V2Column(s, "pkey", celltypes=tuple(
                o["celltypes"].split(",")))
            pkey_section = s
            continue
        if o["celltypes"] == "string":
            cols[s] = V2Column(s, "descr")
            continue
        cellrole = o["cell"]
        colrole = o["column"].split(",")[0]
        role = cellrole.split(",")[0]
        if (role, colrole) not in _WORKING:
            raise GrammarError(
                f"v2 permutation ({role},{colrole}) crashes in the "
                "reference (store.add with 3 args) — unsupported")
        cols[s] = V2Column(
            s, "general", cellrole, colrole,
            tuple(o["celltypes"].split(",")),
            tuple(o["columntypes"].split(",")),
            alteration=parse_alteration(cellrole, lists))
    if pkey_section is None:
        raise GrammarError("v2 grammar: no pkey section")
    return V2Grammar(domain, cols, lists, pkey_section)


def _chain_triples(lst: tuple[str, ...], domain: str) -> list[tuple]:
    out = []
    for a, b in zip(lst, lst[1:]):
        out.append((domain + a, RDF_TYPE, KIND_URI,
                    _chain_target(b, domain), ""))
    return out


class V2TripleGenerator:
    """Batch fn: the v2 semantic parser, vectorized. Cells and pkey are
    sanitized FIRST (parser behavior), then rules run."""

    def __init__(self, grammar: V2Grammar):
        self.g = grammar
        self._alter_strict = True

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.g
        dom = g.domain
        f = v2_format_predicate
        pk_col = g.columns[g.pkey_section].source_column
        pk = v2_sanitize_array(
            batch[pk_col].combine_chunks().cast(pa.string()))
        out = [[], [], [], [], []]

        def emit(s, p, k, l, d):
            for lst, v in zip(out, (s, p, k, l, d)):
                lst.append(v)

        def emit_consts(triples, anyfired):
            if not triples or not anyfired:
                return
            emit(pa.array([t[0] for t in triples], type=pa.string()),
                 pa.array([t[1] for t in triples], type=pa.string()),
                 pa.array([t[2] for t in triples], type=pa.string()),
                 pa.array([t[3] for t in triples], type=pa.string()),
                 pa.array([t[4] for t in triples], type=pa.string()))

        for col in g.columns.values():
            cells = v2_sanitize_array(
                batch[col.source_column].combine_chunks().cast(pa.string()))
            mask = pc.fill_null(pc.and_kleene(
                pc.not_equal(cells, ""), pc.is_valid(cells)), False)
            n = pc.sum(mask).as_py() or 0
            if n == 0:
                continue
            cell = cells.filter(mask)
            pkv = pk.filter(mask)
            if col.kind == "pkey":
                mytype = col.celltypes[0]
                # cell already sanitized; format again (idempotent — :297)
                s = pc.binary_join_element_wise(pa.scalar(dom), cell, "")
                emit(s, _const_col(RDF_TYPE, n), _const_col(KIND_URI, n),
                     _const_col(dom + f(mytype), n), _const_col("", n))
                emit_consts(_chain_triples(col.celltypes, dom), True)
            elif col.kind == "descr":
                s = pc.binary_join_element_wise(pa.scalar(dom), pkv, "")
                emit(s, _const_col(RDFS_COMMENT, n), _const_col(KIND_LIT, n),
                     cell, _const_col("", n))
            else:
                has_cmd = len(col.cellrole.split(",")) != 1
                if has_cmd:
                    v = self._apply_alter_strict(col, cell)
                    typed = pc.binary_join_element_wise(
                        pa.scalar(dom), v2_sanitize_array(v), "")
                else:
                    v = cell
                    # simple case types the RAW cell (:383-386 vs :374-377
                    # — here cell is parser-sanitized already)
                    typed = pc.binary_join_element_wise(pa.scalar(dom), v, "")
                emit(typed, _const_col(RDF_TYPE, n), _const_col(KIND_URI, n),
                     _const_col(dom + col.celltypes[0] if not has_cmd
                                else dom + f(col.celltypes[0]), n),
                     _const_col("", n))
                cv = pc.binary_join_element_wise(
                    pa.scalar(dom), v2_sanitize_array(v), "")
                pku = pc.binary_join_element_wise(pa.scalar(dom), pkv, "")
                colt = dom + f(col.columntypes[0])
                role = col.cellrole.split(",")[0]
                if (role, col.colrole) == ("subject", "predicate"):
                    emit(cv, _const_col(colt, n), _const_col(KIND_URI, n),
                         pku, _const_col("", n))
                elif (role, col.colrole) == ("object", "predicate"):
                    emit(pku, _const_col(colt, n), _const_col(KIND_URI, n),
                         cv, _const_col("", n))
                else:  # predicate/subject
                    emit(_const_col(colt, n), cv, _const_col(KIND_URI, n),
                         pku, _const_col("", n))
                emit_consts(_chain_triples(col.celltypes, dom), True)
                emit_consts(_chain_triples(col.columntypes, dom), True)
        if not out[0]:
            return TRIPLE_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [pa.concat_arrays([a.cast(pa.string()) for a in arrs])
             for arrs in out],
            schema=TRIPLE_SCHEMA)

    def _apply_alter_strict(self, col: V2Column, cell: pa.Array) -> pa.Array:
        """v2 alteration semantics: map misses HALT the reference (we
        raise); prefix PREPENDS (args + cell, csv2rdf-v2.py:349 — v5
        later flipped it to append)."""
        alt = col.alteration
        from ..rules import ALTER_MAP_ALL, ALTER_MAP_PART, ALTER_PREFIX
        if alt.mode in (ALTER_MAP_ALL, ALTER_MAP_PART):
            probe = cell if alt.mode == ALTER_MAP_ALL else \
                pc.utf8_slice_codeunits(cell, start=alt.lo, stop=alt.hi)
            probe = pc.utf8_lower(probe)
            missing = [p for p in set(probe.to_pylist())
                       if p not in alt.maptable]
            if missing:
                raise GrammarError(
                    f"v2 map miss (reference would halt): {missing[:5]}")
        if alt.mode == ALTER_PREFIX:
            return pc.binary_join_element_wise(pa.scalar(alt.prefix), cell, "")
        return apply_alteration(alt, cell)


def v2_to_sql(g: V2Grammar, table: str,
              col_exprs: dict[str, str]) -> str:
    """DuckDB mirror. ``col_exprs``: section -> raw VARCHAR expression."""
    dom = g.domain
    f = v2_format_predicate

    def san(e: str) -> str:
        cls = """[ /(),"''-]"""
        return f"regexp_replace({e}, {sql_quote(cls)}, '_', 'g')"

    pk_raw = col_exprs[g.pkey_section]
    pk = san(pk_raw)
    sels = []

    def const(s, p, o_term, guard):
        sels.append(f"SELECT {sql_quote(s)} AS s, {sql_quote(p)} AS p, "
                    f"{sql_quote(o_term)} AS o WHERE EXISTS "
                    f"(SELECT 1 FROM {table} WHERE {guard})")

    for col in g.columns.values():
        cell_raw = col_exprs[col.section]
        cell = san(cell_raw)
        fired = f"({cell_raw} IS NOT NULL AND {cell} <> '')"
        if col.kind == "pkey":
            sels.append(f"SELECT ({sql_quote(dom)} || {cell}) AS s, "
                        f"{sql_quote(RDF_TYPE)} AS p, "
                        f"{sql_quote('<' + dom + f(col.celltypes[0]) + '>')} AS o "
                        f"FROM {table} WHERE {fired}")
            for s_, p_, k_, l_, d_ in _chain_triples(col.celltypes, dom):
                const(s_, p_, f"<{l_}>", fired)
        elif col.kind == "descr":
            sels.append(f"SELECT ({sql_quote(dom)} || {pk}) AS s, "
                        f"{sql_quote(RDFS_COMMENT)} AS p, "
                        f"{_plain_lit_sql(cell)} AS o FROM {table} "
                        f"WHERE {fired}")
        else:
            has_cmd = len(col.cellrole.split(",")) != 1
            from ..rules import ALTER_PREFIX
            if has_cmd and col.alteration.mode == ALTER_PREFIX:
                # v2 prefix PREPENDS (csv2rdf-v2.py:349)
                v = f"({sql_quote(col.alteration.prefix)} || {cell})"
            elif has_cmd:
                v = alteration_sql(col.alteration, cell)
            else:
                v = cell
            typed_s = f"({sql_quote(dom)} || {san(v) if has_cmd else v})"
            type_o = (dom + f(col.celltypes[0])) if has_cmd else \
                (dom + col.celltypes[0])
            sels.append(f"SELECT {typed_s} AS s, {sql_quote(RDF_TYPE)} AS p, "
                        f"{sql_quote('<' + type_o + '>')} AS o "
                        f"FROM {table} WHERE {fired}")
            cv = f"({sql_quote(dom)} || {san(v)})"
            pku = f"({sql_quote(dom)} || {pk})"
            colt = sql_quote(dom + f(col.columntypes[0]))
            role = col.cellrole.split(",")[0]
            if (role, col.colrole) == ("subject", "predicate"):
                sel = f"SELECT {cv} AS s, {colt} AS p, ('<' || {pku} || '>') AS o"
            elif (role, col.colrole) == ("object", "predicate"):
                sel = f"SELECT {pku} AS s, {colt} AS p, ('<' || {cv} || '>') AS o"
            else:
                sel = f"SELECT {colt} AS s, {cv} AS p, ('<' || {pku} || '>') AS o"
            sels.append(sel + f" FROM {table} WHERE {fired}")
            for lst in (col.celltypes, col.columntypes):
                for s_, p_, k_, l_, d_ in _chain_triples(lst, dom):
                    const(s_, p_, f"<{l_}>", fired)
    union = "\nUNION ALL\n".join(sels)
    return f"SELECT DISTINCT s, p, o FROM (\n{union}\n)"
