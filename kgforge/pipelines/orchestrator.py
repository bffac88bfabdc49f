"""Multi-source run orchestration — the reference's main() / orchestrator.

Mirrors the two multi-source modes:
- v2..v5: one store (output dir) per active source
  (csv2rdf-v5/csv2rdf-v5.py:556-568)
- v1: all sources accumulated into ONE shared store
  (csv2rdf/csv2rdf.py:275-290) = Dataset.union before dedup (A4)

Each source: compile its grammar, read its CSV, generate triples, dedup,
write sorted N-Triples + Parquet + the global ontology-requirements side
output (S7: ONE file across all sources, like the reference's DEFINE
list, csv2rdf-v5.py:570-571).
"""

from __future__ import annotations

import os

import ray.data

from ..rules import SourceConfig, compile_grammar, read_options
from ..sinks.ntriples_sink import write_graph, write_requirements
from ..sources.csvsource import read_csv_source
from ..stages.dedup import dedup_triples, distinct
from ..stages.triples import OntologyRequirements, TripleGenerator


def source_triples(source: SourceConfig,
                   base_dir: str = ".") -> tuple["ray.data.Dataset",
                                                 "ray.data.Dataset"]:
    """One source -> (columnar triples pre-dedup, requirements).

    Dual-mode routing like v2/v4 main() (csv2rdf-v4/csv2rdf-v4.py:
    671-677): a source WITHOUT a semantics file goes through the
    grammar-less default parser (M13) — every column a plain literal
    off the pkey, which is the FIRST CSV column (documented deviation
    from the reference's order-dependent line-number subjects)."""
    file_path = source.file
    if not os.path.isabs(file_path):
        file_path = os.path.join(base_dir, file_path)
    ordinal_col = "_line" if (not source.semantics and source.ordinal) \
        else None
    ds = read_csv_source(file_path, source.delimiter,
                         ordinal_col=ordinal_col,
                         ordinal_prefix=source.prefix)
    if source.semantics:
        grammar_path = source.semantics
        if not os.path.isabs(grammar_path):
            grammar_path = os.path.join(base_dir, grammar_path)
        rs = compile_grammar(grammar_path, source.domain)
    elif ordinal_col:
        # opt-in conformance mode (`ordinal = True`): the reference's
        # line-number subjects (csv2rdf/csv2rdf.py:116) — every original
        # column becomes a plain-literal cell rule, subject = domain +
        # prefix + line number
        from ..rules import default_ruleset
        cols = [c for c in ds.schema().names if c != ordinal_col]
        rs = default_ruleset(source.domain, cols + [ordinal_col],
                             ordinal_col, pkey_type=source.type_)
    else:
        from ..rules import default_ruleset
        cols = ds.schema().names
        rs = default_ruleset(source.domain, cols, cols[0],
                             pkey_type=source.name)
    triples = ds.map_batches(TripleGenerator(rs), batch_format="pyarrow")
    reqs = ds.map_batches(OntologyRequirements(rs), batch_format="pyarrow")
    return triples, reqs


def run_sources(options_path: str, out_dir: str,
                union_stores: bool = False,
                turtle: bool = False,
                formats: tuple[str, ...] | None = None) -> list[str]:
    """Run every active source of an options file.

    union_stores=False → one graph dir per source (v5 semantics);
    union_stores=True  → single unioned graph (v1 orchestrator, A4);
    turtle=True        → additionally emit prefixed Turtle shards
                         (graph.ttl/) — the reference's user-visible
                         artifact format (csv2rdf-v5.py:158-163);
    formats=(...)      → instead of the nt/ttl flags, write every named
                         format from the sink registry
                         (kgforge.sinks.register_sink_format — the
                         reference's "add more output formats" TODO,
                         csv2rdf-v5.py:148).
    Returns the list of written graph dirs."""
    base_dir = os.path.dirname(os.path.abspath(options_path))
    sources = read_options(options_path)
    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []
    all_reqs: "ray.data.Dataset | None" = None
    union: "ray.data.Dataset | None" = None

    def _write(triples: "ray.data.Dataset", dest: str, domain: str) -> None:
        deduped = dedup_triples(triples)
        if formats is not None:
            from ..sinks import sink_format
            writers = [sink_format(f) for f in formats]
            if len(writers) > 1:
                deduped = deduped.materialize()  # feeds every sink
            for w in writers:
                w(deduped, dest, domain)
            return
        if turtle:
            deduped = deduped.materialize()  # feeds both sinks
            from ..sinks.turtle_sink import write_graph_turtle
            write_graph_turtle(deduped, dest, domain)
        write_graph(deduped, dest)

    for src in sources:
        triples, reqs = source_triples(src, base_dir)
        if src.date_stamp:
            # opt-in provenance stamping (disabled in the reference;
            # see stages/triples.date_stamp_triples)
            from ..stages.triples import date_stamp_triples
            triples = date_stamp_triples(triples, src.domain,
                                         src.date_stamp)
        all_reqs = reqs if all_reqs is None else all_reqs.union(reqs)
        if union_stores:
            union = triples if union is None else union.union(triples)
        else:
            dest = os.path.join(out_dir, src.name)
            _write(triples, dest, src.domain)
            written.append(dest)
    if union_stores and union is not None:
        dest = os.path.join(out_dir, "union")
        _write(union, dest, sources[0].domain if sources else None)
        written.append(dest)
    if all_reqs is not None:
        write_requirements(distinct(all_reqs, ["requirement"]),
                           os.path.join(out_dir, "to-define-in-ontology.txt"))
    return written
