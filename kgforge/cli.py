"""CLI — the reference's command-line surface on the Ray engine.

    python -m kgforge.cli -c CONFIG.ini [-o OUT_DIR] [--union]
    python -m kgforge.cli --sparql QUERIES.sparql --store STORE_DIR
                          [-o OUT_DIR]
    python -m kgforge.cli --query 'SELECT ...' --store STORE_DIR
    python -m kgforge.cli --load FILES_OR_DIRS... --store STORE_DIR

CONFIG.ini is a reference-style options file (per-source file / domain /
delimiter / semantics / active — csv2rdf-v5/csv2rdf-v5.py:109-141); each
active source is converted to a sorted N-Triples graph + Parquet mirror,
plus the shared to-define-in-ontology.txt side output. ``--union``
reproduces v1's single-shared-store orchestrator.

``--sparql`` runs a .sparql FILE (the reference's requests.sparql
format: several statements separated by comment banners; subset: BGP,
FILTER !=, MINUS, OPTIONAL, UNION, COUNT/MIN/MAX + GROUP BY/ORDER BY/
LIMIT, CONSTRUCT, INSERT) against a ``write_graph_partitioned`` store
and writes one CSV per statement under OUT_DIR — STREAMED via chunked
``iter_batches`` (a big SELECT over a 100 TB store never materializes
driver-side). ``--results-format csv|tsv|json`` switches the output to
the W3C SPARQL 1.1 results serializations (sinks/results.py) — the
formats a Fuseki-endpoint client already parses.

``--load`` bulk-ingests pre-existing Turtle/N-Triples (the reference's
artifact formats) plus JSON-LD and RDF/XML into a
``write_graph_partitioned`` store with the distributed readers in
sources/rdfsource.py (format by extension: .ttl .nt .jsonld .rdf).

This entry point OWNS the Ray session (library code never does).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def write_result_csv(ds, path: str) -> int:
    """Stream one statement's result Dataset to a single CSV file —
    chunked ``iter_batches`` (constant driver memory, the object store
    backpressures the producer), NEVER a full ``to_pandas`` collect.
    Returns the row count (tallied during the same pass)."""
    import pyarrow as pa
    import pyarrow.csv as pacsv
    rows = 0
    writer = None
    try:
        for b in ds.iter_batches(batch_format="pyarrow"):
            if isinstance(b, pa.RecordBatch):
                b = pa.Table.from_batches([b])
            if writer is None:
                writer = pacsv.CSVWriter(path, b.schema)
            writer.write_table(b)
            rows += b.num_rows
        if writer is None:  # empty result: still emit a header-only file
            schema = ds.schema(fetch_if_missing=True)
            names = schema.names if schema is not None else []
            t = pa.schema([(n, pa.string()) for n in names]).empty_table()
            pacsv.write_csv(t, path)
    finally:
        if writer is not None:
            writer.close()
    return rows


def _run_sparql(args) -> int:
    from .sparql import parse_sparql, run_sparql_statement
    if args.query:
        text = args.query
    else:
        with open(args.sparql) as f:
            text = f.read()
    queries = parse_sparql(text)
    os.makedirs(args.out, exist_ok=True)
    for i, q in enumerate(queries, 1):
        # updates mutate only under --apply-updates; otherwise they
        # preview the rows the statement would add/remove
        ds = run_sparql_statement(args.store, q, args.apply_updates)
        if args.results_format:
            from .sinks.results import write_sparql_results
            ext = args.results_format
            path = os.path.join(args.out, f"statement{i}_{q.form}.{ext}")
            n = write_sparql_results(ds, path, ext)
        else:
            path = os.path.join(args.out, f"statement{i}_{q.form}.csv")
            n = write_result_csv(ds, path)
        print(f"statement {i} ({q.form}): {n} rows -> {path}")
    return 0


def _run_load(args) -> int:
    from .sources.rdfsource import load_rdf_store
    load_rdf_store(args.load, args.store)
    print(f"loaded {len(args.load)} source(s) -> {args.store}")
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="kgforge", description="CSV/Parquet -> RDF on Ray Data")
    ap.add_argument("-c", "--conf",
                    help="options .ini file (reference format)")
    ap.add_argument("-o", "--out", default="kgforge-out",
                    help="output directory")
    ap.add_argument("--union", action="store_true",
                    help="accumulate all sources into one store (v1 mode)")
    ap.add_argument("--turtle", action="store_true",
                    help="also emit prefixed Turtle shards (graph.ttl/), "
                         "the reference's artifact format")
    ap.add_argument("--format", dest="formats", nargs="+", metavar="FMT",
                    help="write these sink-registry formats instead of "
                         "the default nt (e.g. --format nt ttl jsonld "
                         "rdfxml)")
    ap.add_argument("--sparql",
                    help=".sparql query file to run against --store")
    ap.add_argument("--query",
                    help="inline SPARQL text to run against --store "
                         "(alternative to --sparql FILE)")
    ap.add_argument("--store",
                    help="predicate-partitioned store dir "
                         "(for --sparql/--query/--load)")
    ap.add_argument("--results-format",
                    choices=("csv", "tsv", "json", "xml", "nt"),
                    help="write SELECT/ASK results in a W3C SPARQL 1.1 "
                         "results format (csv = plain values, tsv = "
                         "SPARQL term syntax, json = results+json, "
                         "xml = results+xml; nt = N-Triples for "
                         "CONSTRUCT/DESCRIBE graphs); default keeps "
                         "the engine's raw-term CSV")
    ap.add_argument("--apply-updates", action="store_true",
                    help="let INSERT/DELETE statements mutate --store "
                         "(default: preview the derived graph only)")
    ap.add_argument("--load", nargs="+", metavar="RDF",
                    help="bulk-load .ttl/.nt/.jsonld/.rdf files or "
                         "directories into --store (distributed "
                         "readers)")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)
    if args.sparql and args.query:
        ap.error("--sparql and --query are mutually exclusive")
    if args.load and (args.sparql or args.query or args.conf):
        ap.error("--load runs alone (with --store)")
    if args.load and not args.store:
        ap.error("--load needs --store")
    if (args.sparql or args.query) and not args.store:
        ap.error("--sparql/--query need --store")
    if args.store and not (args.sparql or args.query or args.load):
        ap.error("--store needs --sparql/--query or --load")
    if not (args.sparql or args.query or args.load) and not args.conf:
        ap.error("either -c/--conf, --load + --store, or "
                 "--sparql/--query + --store is required")

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    t0 = time.time()
    if args.sparql or args.query or args.load:
        rc = _run_load(args) if args.load else _run_sparql(args)
        print(f"done in {time.time() - t0:.1f}s")
        if owns_session:
            ray.shutdown()
        return rc

    from .pipelines.orchestrator import run_sources
    written = run_sources(args.conf, args.out, union_stores=args.union,
                          turtle=args.turtle,
                          formats=tuple(args.formats) if args.formats
                          else None)
    for w in written:
        print(f"wrote {w}")
    print(f"done in {time.time() - t0:.1f}s")
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
