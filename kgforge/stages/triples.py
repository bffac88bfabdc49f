"""Row→triples expansion as a vectorized ``map_batches`` stage.

The engine's core transform (reference analogue: semantic_parser's
per-row dispatch + per-class generate_triples,
/root/reference/csv2rdf-v5/csv2rdf-v5.py:480-493, 199-341) re-expressed
as one Arrow-native flat-map: a batch of N input rows becomes a batch of
~N×rules output triples. Everything is pyarrow.compute kernels — no
Python loop over rows (dict lookups run over the batch's *unique* values
via dictionary encoding).

Schema of the emitted triple batches (all utf8):

    s      subject IRI (no angle brackets)
    p      predicate IRI
    o_kind 'u' (IRI) | 'l' (literal)
    o_lex  object IRI or literal lexical form
    o_dt   literal datatype IRI, '' for IRIs and plain literals

Schema-level triples (type/predicate labels, rdfs:domain/range) are
constant per rule; the reference re-adds them per row and dedups via
rdflib set semantics (csv2rdf-v5.py:300-318). We emit them ONCE PER
BATCH, and only when the rule fired for ≥1 row of the batch — the
post-dedup set is identical, and the hottest skew keys never reach the
shuffle at full cardinality.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..ntriples import KIND_LIT, KIND_URI
from ..rules import (
    ALTER_CUSTOM,
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
    SANITIZE_REGEX,
    URIRule,
)

TRIPLE_SCHEMA = pa.schema(
    [
        ("s", pa.string()),
        ("p", pa.string()),
        ("o_kind", pa.string()),
        ("o_lex", pa.string()),
        ("o_dt", pa.string()),
    ]
)


def sanitize_array(arr: pa.Array) -> pa.Array:
    """Vectorized ``format_URI`` (csv2rdf-v5.py:168-178): the 23 reserved
    chars → '_'. RE2 char class checked char-for-char against
    ``rules.format_uri`` in tests/test_triples.py."""
    return pc.replace_substring_regex(arr, pattern=SANITIZE_REGEX, replacement="_")


def _concat(prefix: str, arr: pa.Array) -> pa.Array:
    return pc.binary_join_element_wise(pa.scalar(prefix), arr, "")


def mint_uris(domain: str, arr: pa.Array) -> pa.Array:
    return _concat(domain, sanitize_array(arr))


def _map_via_dictionary(arr: pa.Array, table: dict[str, str]) -> pa.Array:
    """MAP_ALL/MAP_PART probe: lowercase + dict lookup with
    pass-through-on-miss (csv2rdf-v5.py:264-276). The lookup runs over
    the dictionary-encoded uniques, not per row."""
    enc = pc.dictionary_encode(arr)
    # ChunkedArray from map_batches is combined upstream; enc is a
    # DictionaryArray here.
    uniques = enc.dictionary.to_pylist()
    mapped = pa.array(
        [table.get(u.lower(), u) if u is not None else None for u in uniques],
        type=pa.string(),
    )
    return mapped.take(enc.indices)


def apply_alteration(alt: Alteration, arr: pa.Array) -> pa.Array:
    """Vectorized alter_cell_value (csv2rdf-v5.py:258-282). Callers have
    already filtered empty cells (the parser skips them before alteration,
    csv2rdf-v5.py:486-487), so the empty-early-return branch is moot."""
    if alt.mode == ALTER_NONE:
        return arr
    if alt.mode == ALTER_MAP_ALL:
        return _map_via_dictionary(arr, alt.maptable)
    if alt.mode == ALTER_MAP_PART:
        probe = pc.utf8_lower(pc.utf8_slice_codeunits(arr, start=alt.lo, stop=alt.hi))
        enc = pc.dictionary_encode(probe)
        uniq = enc.dictionary.to_pylist()
        hit = pa.array([u is not None and u in alt.maptable for u in uniq]).take(enc.indices)
        mapped = pa.array(
            [alt.maptable.get(u) if u is not None else None for u in uniq],
            type=pa.string(),
        ).take(enc.indices)
        return pc.if_else(hit, mapped, arr)
    if alt.mode == ALTER_EXTRACT:
        return pc.utf8_slice_codeunits(arr, start=alt.lo, stop=alt.hi)
    if alt.mode == ALTER_PREFIX:
        return pc.binary_join_element_wise(arr, pa.scalar(alt.prefix), "")
    if alt.mode == ALTER_CUSTOM:
        if alt.vector_fn is not None:
            return alt.vector_fn(arr)
        # per-UNIQUE scalar application — a registered command without a
        # vectorized fn still never loops over the row axis
        enc = pc.dictionary_encode(arr)
        out = pa.array(
            [alt.scalar_fn(u) if u is not None else None
             for u in enc.dictionary.to_pylist()], type=pa.string())
        return out.take(enc.indices)
    raise AssertionError("unreachable")


def _const_col(value: str, n: int) -> pa.Array:
    """Length-n utf8 column holding one repeated value, without building
    a Python list: zero-index take from a 1-element dictionary."""
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([value], type=pa.string())
    ).cast(pa.string())


@dataclass
class _Emit:
    s: pa.Array | None = None  # None → use const
    p: str | None = None
    o_lex: pa.Array | None = None
    o_kind: str = KIND_URI
    o_dt: str = ""


class TripleGenerator:
    """Callable for ``ds.map_batches(TripleGenerator(ruleset), ...)``.

    Stateless w.r.t. data (the RuleSet is tiny config, shipped by closure
    capture — the idiomatic broadcast for small sides); usable as a plain
    function on a ``pyarrow.Table`` in unit tests without Ray.
    """

    def __init__(self, ruleset: RuleSet, emit_schema_triples: bool = True):
        self.ruleset = ruleset
        self.emit_schema_triples = emit_schema_triples
        self._bound: dict[str, str] | None = None

    def _bind(self, schema: pa.Schema) -> dict[str, str]:
        if self._bound is None:
            self._bound = self.ruleset.bind(schema.names)
        return self._bound

    def __call__(self, batch: pa.Table) -> pa.Table:
        rs = self.ruleset
        bound = self._bind(batch.schema)
        pk_col = bound[rs.pkey.section]
        pk_raw_all = batch[pk_col].combine_chunks()
        if not isinstance(pk_raw_all, pa.StringArray):
            pk_raw_all = pk_raw_all.cast(pa.string())
        pkt = rs.pkey_type

        out_s: list[pa.Array] = []
        out_p: list[pa.Array] = []
        out_kind: list[pa.Array] = []
        out_lex: list[pa.Array] = []
        out_dt: list[pa.Array] = []

        def emit(s_arr, p_arr, kind_arr, lex_arr, dt_arr):
            out_s.append(s_arr)
            out_p.append(p_arr)
            out_kind.append(kind_arr)
            out_lex.append(lex_arr)
            out_dt.append(dt_arr)

        def emit_const_rows(triples):
            if not triples:
                return
            emit(
                pa.array([t[0] for t in triples], type=pa.string()),
                pa.array([t[1] for t in triples], type=pa.string()),
                pa.array([t[2] for t in triples], type=pa.string()),
                pa.array([t[3] for t in triples], type=pa.string()),
                pa.array([t[4] for t in triples], type=pa.string()),
            )

        for rule in rs.rules.values():
            cells = batch[bound[rule.section]].combine_chunks()
            if not isinstance(cells, pa.StringArray):
                cells = cells.cast(pa.string())
            # empty-cell skip (csv2rdf-v5.py:486-487); nulls count as empty
            mask = pc.not_equal(pc.utf8_trim_whitespace(cells), "")
            mask = pc.and_kleene(mask, pc.is_valid(cells))
            mask = pc.fill_null(mask, False)
            if rs.null_values:
                # v1 FORGET-value filter (M5, csv2rdf/csv2rdf.py:241-243)
                mask = pc.and_(mask, pc.invert(pc.is_in(
                    cells, value_set=pa.array(sorted(rs.null_values),
                                              type=pa.string()))))
            n = pc.sum(mask).as_py() or 0
            if n == 0:
                continue  # rule never fired in this batch → no schema triples
            cell = cells.filter(mask)
            pk = pk_raw_all.filter(mask)

            if isinstance(rule, PKeyRule):
                cv = mint_uris(rule.domain, cell)
                ct = rule.uri(rule.celltype)
                # <cv> rdfs:label "cell"
                emit(cv, _const_col("http://www.w3.org/2000/01/rdf-schema#label", n),
                     _const_col(KIND_LIT, n), cell, _const_col("", n))
                # <cv> rdf:type <ct>
                emit(cv, _const_col("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", n),
                     _const_col(KIND_URI, n), _const_col(ct, n), _const_col("", n))
            elif isinstance(rule, URIRule):
                v = apply_alteration(rule.alteration, cell)
                cv = mint_uris(rule.domain, v)
                ct = rule.uri(rule.celltype)
                colt = rule.uri(rule.columntype)
                pkv = mint_uris(rule.domain, pk)
                emit(cv, _const_col("http://www.w3.org/2000/01/rdf-schema#label", n),
                     _const_col(KIND_LIT, n), v, _const_col("", n))
                emit(cv, _const_col("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", n),
                     _const_col(KIND_URI, n), _const_col(ct, n), _const_col("", n))
                if rule.effective_role == "subject":
                    emit(cv, _const_col(colt, n), _const_col(KIND_URI, n), pkv,
                         _const_col("", n))
                else:
                    emit(pkv, _const_col(colt, n), _const_col(KIND_URI, n), cv,
                         _const_col("", n))
            elif isinstance(rule, MultiValueRule):
                # vectorized token explosion: split → flatten with parent
                # indices → lexicon membership filter
                if rule.splitter_fn is not None:
                    # custom splitter: evaluate per unique cell, then
                    # broadcast the list array back over the rows
                    enc = pc.dictionary_encode(cell)
                    per_uniq = pa.array(
                        [rule.splitter_fn(u) if u is not None else []
                         for u in enc.dictionary.to_pylist()],
                        type=pa.list_(pa.string()))
                    split = per_uniq.take(enc.indices)
                else:
                    split = pc.split_pattern(cell, pattern=rule.separator)
                flat = split.flatten()
                parents = pc.list_parent_indices(split)
                tok_mask = pc.not_equal(flat, "")
                if rule.lexicon is not None:
                    tok_mask = pc.and_(
                        tok_mask,
                        pc.is_in(flat, value_set=pa.array(sorted(rule.lexicon),
                                                          type=pa.string())),
                    )
                toks = flat.filter(tok_mask)
                m = len(toks)
                if m == 0:
                    continue  # no surviving token → rule did not fire
                pk_tok = pk.take(parents.filter(tok_mask))
                tv = mint_uris(rule.domain, toks)
                ct = rule.uri(rule.celltype)
                colt = rule.uri(rule.columntype)
                pkv = mint_uris(rule.domain, pk_tok)
                emit(tv, _const_col("http://www.w3.org/2000/01/rdf-schema#label", m),
                     _const_col(KIND_LIT, m), toks, _const_col("", m))
                emit(tv, _const_col("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", m),
                     _const_col(KIND_URI, m), _const_col(ct, m), _const_col("", m))
                emit(pkv, _const_col(colt, m), _const_col(KIND_URI, m), tv,
                     _const_col("", m))
            elif isinstance(rule, LiteralRule):
                colt = rule.uri(rule.columntype)
                pkv = mint_uris(rule.domain, pk)
                emit(pkv, _const_col(colt, n), _const_col(KIND_LIT, n), cell,
                     _const_col(rule.celltype, n))
            elif isinstance(rule, DefaultTypeRule):
                cv = mint_uris(rule.domain, cell)
                emit(cv, _const_col("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", n),
                     _const_col(KIND_URI, n),
                     _const_col(rule.uri(rule.celltype), n), _const_col("", n))
            elif isinstance(rule, DefaultCellRule):
                pkv = mint_uris(rule.domain, pk)
                emit(pkv, _const_col(rule.uri(rule.columntype), n),
                     _const_col(KIND_LIT, n), cell, _const_col("", n))
            else:  # pragma: no cover
                raise TypeError(f"unknown rule type {type(rule)}")

            if self.emit_schema_triples:
                consts = list(rule.constant_triples())
                if isinstance(rule, (URIRule, LiteralRule, MultiValueRule)):
                    consts.extend(rule.domain_range_triples(pkt))
                emit_const_rows(consts)

        if not out_s:
            return TRIPLE_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [
                pa.concat_arrays([a.cast(pa.string()) for a in out_s]),
                pa.concat_arrays([a.cast(pa.string()) for a in out_p]),
                pa.concat_arrays([a.cast(pa.string()) for a in out_kind]),
                pa.concat_arrays([a.cast(pa.string()) for a in out_lex]),
                pa.concat_arrays([a.cast(pa.string()) for a in out_dt]),
            ],
            schema=TRIPLE_SCHEMA,
        )


class OntologyRequirements:
    """Side output S7 (csv2rdf-v5.py:74-87): per batch, the distinct
    'Cell type:/Column type: <uri>' strings of the rules that fired.
    Compose with ``ds.map_batches(OntologyRequirements(rs))`` then a
    distinct aggregate + sort (the reference's global DEFINE list is
    insertion-ordered; post-distinct the *set* is equal)."""

    def __init__(self, ruleset: RuleSet):
        self.ruleset = ruleset
        self._bound: dict[str, str] | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        rs = self.ruleset
        if self._bound is None:
            self._bound = rs.bind(batch.schema.names)
        lines: list[str] = []
        seen: set[str] = set()
        for rule in rs.rules.values():
            cells = batch[self._bound[rule.section]].combine_chunks()
            if not isinstance(cells, pa.StringArray):
                cells = cells.cast(pa.string())
            mask = pc.fill_null(
                pc.and_kleene(pc.not_equal(pc.utf8_trim_whitespace(cells), ""),
                              pc.is_valid(cells)), False)
            if (pc.sum(mask).as_py() or 0) == 0:
                continue
            for line in rule.ontology_requirements():
                if line not in seen:
                    seen.add(line)
                    lines.append(line)
        return pa.table({"requirement": pa.array(lines, type=pa.string())})


def render_object_terms(batch: pa.Table) -> pa.Table:
    """Add column ``o`` = rendered N-Triples object term. Vectorized
    mirror of kgforge.ntriples.render_object: escape backslash, quote,
    LF, CR, TAB; wrap in quotes; append ^^<dt> when typed."""
    lex = batch["o_lex"].combine_chunks().cast(pa.string())
    esc = lex
    for raw, rep in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                     ("\r", "\\r"), ("\t", "\\t")):
        esc = pc.replace_substring(esc, pattern=raw, replacement=rep)
    quoted = pc.binary_join_element_wise(pa.scalar('"'), esc, pa.scalar('"'), "")
    dt = batch["o_dt"].combine_chunks().cast(pa.string())
    typed = pc.binary_join_element_wise(quoted, pa.scalar("^^<"), dt, pa.scalar(">"), "")
    lit_term = pc.if_else(pc.not_equal(dt, ""), typed, quoted)
    uri_term = pc.binary_join_element_wise(pa.scalar("<"), lex, pa.scalar(">"), "")
    is_uri = pc.equal(batch["o_kind"].combine_chunks().cast(pa.string()), KIND_URI)
    o = pc.if_else(is_uri, uri_term, lit_term)
    return batch.append_column("o", o)


def triples_to_terms(batch: pa.Table) -> pa.Table:
    """(s,p,o_kind,o_lex,o_dt) → (s,p,o) with o rendered — the engine's
    canonical 3-column comparable form."""
    return render_object_terms(batch).select(["s", "p", "o"])


DATE_PREDICATE = "date_created"


def date_stamp_triples(triples: "ray.data.Dataset", domain: str,
                       today: str) -> "ray.data.Dataset":
    """Opt-in v5/v4 ``date_stamp`` provenance
    (csv2rdf-v5/csv2rdf-v5.py:64-70; v4 csv2rdf-v4.py:269-273). The
    feature is DISABLED at every reference call site, so parity output
    correctly omits it — this flag completes the surface. ``today`` is
    an ISO date string from RUN metadata (options file / manifest),
    never Date.now inside a task: deterministic and resume-safe.

    Reference quirk preserved: the object is
    ``URIRef(Literal(TODAY, XSD.date))`` — rdflib stringifies the
    literal, so the "date" lands as a (relative) URI whose text is the
    date, not as a typed literal. The intended (commented-out) call
    sites stamp every minted cell/pkey URI — exactly the subjects of
    the emitted rdf:type triples, which is how they are derived here
    (per-batch distinct; the global dedup downstream removes the
    rest)."""
    import ray.data  # noqa: F401  (type only)

    from ..ntriples import RDF_TYPE

    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.equal(batch["p"], RDF_TYPE),
                       pc.starts_with(batch["s"], domain))
        subs = pc.unique(batch["s"].filter(mask))
        n = len(subs)
        stamped = pa.table({
            "s": subs,
            "p": _const_col(domain + DATE_PREDICATE, n),
            "o_kind": _const_col(KIND_URI, n),
            "o_lex": _const_col(today, n),
            "o_dt": _const_col("", n),
        })
        return pa.concat_tables([batch.select(TRIPLE_SCHEMA.names)
                                 .cast(TRIPLE_SCHEMA), stamped])

    return triples.map_batches(fn, batch_format="pyarrow")
