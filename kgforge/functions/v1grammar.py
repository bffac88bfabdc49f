"""v1 legacy semantic grammar — the oldest mapping dialect, complete.

The reference's first-generation grammar is a 2-column CSV
(/root/reference/csv2rdf/tests/semantics.csv), bound to data columns BY
POSITION (grammar row i ↔ data column i, csv2rdf/csv2rdf.py:186-235):

    colname,ignore
    colname,subject1|<type>
    colname,subject2|<type>|S or R[|predicate_name]
    colname,literal

v1 quirks preserved exactly (csv2rdf/csv2rdf.py:135-268):
- every minted URI interposes the literal 'A_' (:231,:234,:248,:252,:258)
- cell VALUES are never sanitized (URIRef(domain+'A_'+raw))
- the predicate name for subject2 defaults to format_predicate(colname)
  with v1's 2-char sanitizer [' ', '-'] (:79-87,:172-176); an explicit
  4th field is used RAW
- literal predicates use the RAW column name (:248)
- FORGET values ['NONE','-',''] skipped for non-subject1 columns (:241)
- subject2 cells are split on ' ' — one entity + type triple per token,
  direction S: (subj, pred, tok), R: (tok, pred, subj) (:255-268)
- multiple subject1 rows: LAST one wins (:198 re-assigns)

Engine = vectorized batch fn; SQL mirror for the DuckDB gate.
"""

from __future__ import annotations

import csv
import io
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

from ..ntriples import KIND_LIT, KIND_URI, RDF_TYPE
from ..sqlgen import _plain_lit_sql, sql_quote
from ..stages.triples import TRIPLE_SCHEMA, _const_col

FORGET = ["NONE", "-", ""]


def v1_format_predicate(pred: str) -> str:
    return "".join("_" if c in (" ", "-") else c for c in pred)


@dataclass
class V1Spec:
    kind: str                 # 'subject1' | 'subject2' | 'literal'
    cname: str
    stype: str = ""
    direction: str = "S"
    name: str = ""

    @property
    def pred_name(self) -> str:
        return self.name if self.name else v1_format_predicate(self.cname)


@dataclass
class V1Grammar:
    domain: str
    subject1: tuple[int, V1Spec]
    columns: dict[int, V1Spec] = field(default_factory=dict)

    def uri(self, value: str) -> str:
        return self.domain + "A_" + value  # raw — no sanitizer (v1)


def compile_v1_grammar(text_or_path: str, domain: str,
                       delimiter: str = ",") -> V1Grammar:
    """Parse the 2-column grammar CSV (csv2rdf/csv2rdf.py:180-218)."""
    if os.path.isfile(text_or_path):
        fh = open(text_or_path, encoding="utf-8", errors="ignore")
    else:
        fh = io.StringIO(text_or_path)
    subj1 = None
    cols: dict[int, V1Spec] = {}
    for i, row in enumerate(csv.reader(fh, delimiter=delimiter)):
        if len(row) != 2:
            raise ValueError(f"Row #{i+1} does not have 2 fields: {row}")
        cname, value = row
        if value == "ignore":
            continue
        parts = value.split("|")
        if parts[0] == "subject1":
            if len(parts) != 2:
                raise ValueError(f"bad subject1: {value}")
            subj1 = (i, V1Spec("subject1", cname, parts[1]))
        elif parts[0] == "subject2":
            if len(parts) == 3:
                cols[i] = V1Spec("subject2", cname, parts[1], parts[2])
            elif len(parts) == 4:
                cols[i] = V1Spec("subject2", cname, parts[1], parts[2], parts[3])
            else:
                raise ValueError(f"bad subject2: {value}")
        elif parts[0] == "literal":
            cols[i] = V1Spec("literal", cname)
        else:
            raise ValueError(f"grammar line not recognized: {value}")
    if subj1 is None:
        raise ValueError("no subject1 in v1 grammar")
    return V1Grammar(domain=domain, subject1=subj1, columns=cols)


class V1TripleGenerator:
    """Batch fn: positional columns -> v1 triples (vectorized)."""

    def __init__(self, grammar: V1Grammar):
        self.g = grammar

    def __call__(self, batch: pa.Table) -> pa.Table:
        g = self.g
        cols = batch.columns
        s1_idx, s1 = g.subject1
        subj_vals = cols[s1_idx].combine_chunks().cast(pa.string())
        subj = pc.binary_join_element_wise(
            pa.scalar(g.domain + "A_"), subj_vals, "")
        n = len(subj)
        out_s, out_p, out_k, out_l, out_d = [], [], [], [], []

        def emit(s, p, k, l, d):
            out_s.append(s); out_p.append(p); out_k.append(k)
            out_l.append(l); out_d.append(d)

        # subject1: (A_subj, rdf:type, A_type) — NOT FORGET-filtered (:233)
        emit(subj, _const_col(RDF_TYPE, n), _const_col(KIND_URI, n),
             _const_col(g.uri(s1.stype), n), _const_col("", n))

        forget = pa.array(FORGET, type=pa.string())
        for idx, spec in g.columns.items():
            vals = cols[idx].combine_chunks().cast(pa.string())
            keep = pc.invert(pc.is_in(vals, value_set=forget))
            keep = pc.fill_null(pc.and_kleene(keep, pc.is_valid(vals)), False)
            m = pc.sum(keep).as_py() or 0
            if m == 0:
                continue
            v = vals.filter(keep)
            s_f = subj.filter(keep)
            if spec.kind == "literal":
                emit(s_f, _const_col(g.domain + "A_" + spec.cname, m),
                     _const_col(KIND_LIT, m), v, _const_col("", m))
            else:  # subject2: space-split tokens
                split = pc.split_pattern(v, pattern=" ")
                toks = split.flatten()
                parents = pc.list_parent_indices(split)
                t = len(toks)
                if t == 0:
                    continue
                tok_uri = pc.binary_join_element_wise(
                    pa.scalar(g.domain + "A_"), toks, "")
                s_tok = s_f.take(parents)
                pred = g.domain + "A_" + spec.pred_name
                emit(tok_uri, _const_col(RDF_TYPE, t), _const_col(KIND_URI, t),
                     _const_col(g.uri(spec.stype), t), _const_col("", t))
                if spec.direction == "S":
                    emit(s_tok, _const_col(pred, t), _const_col(KIND_URI, t),
                         tok_uri, _const_col("", t))
                else:
                    emit(tok_uri, _const_col(pred, t), _const_col(KIND_URI, t),
                         s_tok, _const_col("", t))
        if not out_s:
            return TRIPLE_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [pa.concat_arrays([a.cast(pa.string()) for a in arrs])
             for arrs in (out_s, out_p, out_k, out_l, out_d)],
            schema=TRIPLE_SCHEMA)


def v1_to_sql(g: V1Grammar, table: str, col_exprs: list[str]) -> str:
    """DuckDB mirror; ``col_exprs[i]`` = VARCHAR expression for data
    column i (positional, like the binding)."""
    s1_idx, s1 = g.subject1
    subj = f"({sql_quote(g.domain + 'A_')} || {col_exprs[s1_idx]})"
    forget = ", ".join(sql_quote(x) for x in FORGET)
    sels = [
        f"SELECT {subj} AS s, {sql_quote(RDF_TYPE)} AS p, "
        f"{sql_quote('<' + g.uri(s1.stype) + '>')} AS o FROM {table}"
    ]
    for idx, spec in g.columns.items():
        cell = col_exprs[idx]
        fired = f"({cell} IS NOT NULL AND {cell} NOT IN ({forget}))"
        if spec.kind == "literal":
            sels.append(
                f"SELECT {subj} AS s, "
                f"{sql_quote(g.domain + 'A_' + spec.cname)} AS p, "
                f"{_plain_lit_sql(cell)} AS o FROM {table} WHERE {fired}")
        else:
            src = (f"(SELECT {subj} AS _s, unnest(string_split({cell}, ' ')) "
                   f"AS tok FROM {table} WHERE {fired})")
            tok_uri = f"({sql_quote(g.domain + 'A_')} || tok)"
            pred = sql_quote(g.domain + "A_" + spec.pred_name)
            sels.append(
                f"SELECT {tok_uri} AS s, {sql_quote(RDF_TYPE)} AS p, "
                f"{sql_quote('<' + g.uri(spec.stype) + '>')} AS o FROM {src}")
            if spec.direction == "S":
                sels.append(f"SELECT _s AS s, {pred} AS p, "
                            f"('<' || {tok_uri} || '>') AS o FROM {src}")
            else:
                sels.append(f"SELECT {tok_uri} AS s, {pred} AS p, "
                            f"('<' || _s || '>') AS o FROM {src}")
    union = "\nUNION ALL\n".join(sels)
    return f"SELECT DISTINCT s, p, o FROM (\n{union}\n)"
