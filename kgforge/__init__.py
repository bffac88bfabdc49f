"""kgforge — a Ray-Data-native knowledge-graph construction engine.

Brand-new implementation (not a port) of the query/data-processing
capabilities of orey/csv2rdf (reference snapshot read-only at
/root/reference), generalized from per-CSV-row conversion to web-scale
Parquet pages. See SURVEY.md for the blueprint.

Layout:
    rules.py      declarative column→RDF mapping rules (v5-exact)
    ntriples.py   shared N-Triples term renderer
    oracle.py     single-process reference oracle (test ground truth)
    stages/       Ray Data map_batches/groupby stages (triples, dedup,
                  canonicalize, linker, extract)
    sources/      readers (parquet pages, csv catalogs, options files)
    sinks/        N-Triples + parquet writers, ontology side output
    pipelines/    end-to-end composed pipelines (webkg flagship)
    ops/          general large-scale data ops (dedup family, text
                  analysis, ANN, relational)
    state/        manifest / lineage / resume bookkeeping

No module in this package calls ray.init()/ray.shutdown(); sessions are
owned by bench.py, CLIs and the test fixture.
"""

__version__ = "0.1.0"
