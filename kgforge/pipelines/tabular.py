"""Grammar-driven KG construction over relational Parquet tables.

The direct modern analogue of the reference's CSV conversion
(csv2rdf-v5/csv2rdf-v5.py:556-568 main loop): declare an ini grammar per
table, run read_parquet → stringify → TripleGenerator → dedup. The
grammars below are ini TEXT (exercising the configparser path exactly
like the reference's option files) over the driver's TPC-H-ish tables;
every v5 construct appears at least once across them (map/extract/
prefix alterations, literal datatyping, the subject role, multi-
treatment sections, ignore).

Each pipeline has a generated DuckDB oracle via kgforge.sqlgen — the
engine and the oracle share ONE grammar + ONE per-column
stringification spec, so names/values match by construction.
"""

from __future__ import annotations

import ray.data

from ..sources.readers import read_table

from ..rules import RuleSet, compile_grammar
from ..sqlgen import ontology_requirements_sql, ruleset_to_sql
from ..stages.dedup import dedup_triples
from ..stages.prepare import DATE, FLOAT, INT, STRING, ColumnSpec, stringify
from ..stages.triples import OntologyRequirements, TripleGenerator, triples_to_terms
from ..stages.dedup import distinct

KG_DOMAIN = "https://kgforge.example.org/tpch/"

REGION_GRAMMAR = """
[r_name]
cellrole = pkey
celltype = region

[r_regionkey]
cellrole = object
celltype = integer
columntype = region_key
"""

NATION_GRAMMAR = """
[n_name]
cellrole = pkey
celltype = nation

[n_regionkey]
cellrole = object,map(all;*regions*)
celltype = region
columntype = located_in

[n_nationkey]
cellrole = object
celltype = integer
columntype = nation_key

[*regions*]
0 = AFRICA
1 = AMERICA
2 = ASIA
3 = EUROPE
4 = MIDDLE EAST
"""

CUSTOMER_GRAMMAR = """
[c_name]
cellrole = pkey
celltype = customer

[c_mktsegment]
cellrole = object
celltype = market_segment
columntype = in_segment

[c_nationkey]
# v5 prefix quirk: APPENDS → '<key>nk_'
cellrole = object,prefix(nk_)
celltype = nation_ref
columntype = nation_key_ref

[c_acctbal]
cellrole = object
celltype = float
columntype = account_balance

[c_custkey]
cellrole = object
celltype = integer
columntype = customer_key
"""

PART_GRAMMAR = """
[p_name]
cellrole = pkey
celltype = part

[p_brand$1]
cellrole = object
celltype = brand
columntype = branded_as

[p_brand$2]
# extract the brand number (Python slice semantics)
cellrole = object,extract(-2:)
celltype = brand_code
columntype = brand_code_of

[p_type]
cellrole = subject
celltype = part_type
columntype = type_of

[p_size]
cellrole = object
celltype = integer
columntype = part_size

[p_retailprice]
cellrole = object
celltype = float
columntype = retail_price

[p_partkey]
cellrole = ignore
"""

LINEITEM_GRAMMAR = """
[l_orderkey]
cellrole = pkey
celltype = order_line_set

[l_returnflag]
cellrole = object,map(all;*flags*)
celltype = return_flag
columntype = returned_as

[l_linestatus]
cellrole = object
celltype = line_status
columntype = line_status_of

[l_shipdate]
cellrole = object
celltype = date
columntype = shipped_on

[l_quantity]
cellrole = object
celltype = float
columntype = quantity_of

[l_extendedprice]
cellrole = object
celltype = float
columntype = extended_price

[*flags*]
A = Accepted
N = None
R = Returned
"""

SUPPLIER_GRAMMAR = """
[s_name]
cellrole = pkey
celltype = supplier

[s_nationkey]
cellrole = object,map(all;*ncode*)
celltype = nation
columntype = based_in

[s_acctbal]
cellrole = object
celltype = float
columntype = account_balance

[*ncode*]
0 = Nation Zero
1 = Nation One
2 = Nation Two
3 = Nation Three
4 = Nation Four
"""

# table -> (grammar text, {column: spec}) — spec drives BOTH the engine
# stringify stage and the SQL oracle's column expressions
TABLE_KG = {
    "region": (REGION_GRAMMAR,
               {"r_name": STRING, "r_regionkey": INT}),
    "lineitem": (LINEITEM_GRAMMAR,
                 {"l_orderkey": INT, "l_returnflag": STRING,
                  "l_linestatus": STRING, "l_shipdate": DATE,
                  "l_quantity": FLOAT(2), "l_extendedprice": FLOAT(2)}),
    "nation": (NATION_GRAMMAR,
               {"n_name": STRING, "n_regionkey": INT, "n_nationkey": INT}),
    "customer": (CUSTOMER_GRAMMAR,
                 {"c_name": STRING, "c_mktsegment": STRING,
                  "c_nationkey": INT, "c_acctbal": FLOAT(2), "c_custkey": INT}),
    "part": (PART_GRAMMAR,
             {"p_name": STRING, "p_brand": STRING, "p_type": STRING,
              "p_size": INT, "p_retailprice": FLOAT(2), "p_partkey": INT}),
    "supplier": (SUPPLIER_GRAMMAR,
                 {"s_name": STRING, "s_nationkey": INT, "s_acctbal": FLOAT(2)}),
}


def table_ruleset(table: str, domain: str = KG_DOMAIN) -> RuleSet:
    grammar, _ = TABLE_KG[table]
    return compile_grammar(grammar, domain)


def _colmap(rs: RuleSet, specs: dict[str, ColumnSpec]) -> dict[str, str]:
    return {sec: specs[rule.source_column].sql_expr(rule.source_column)
            for sec, rule in rs.rules.items()}


def table_kg_triples(sf_dir: str, table: str,
                     domain: str = KG_DOMAIN) -> "ray.data.Dataset":
    """read_parquet(table) → stringify → deduped COLUMNAR triples
    (TRIPLE_SCHEMA) — the pre-rendering form the graph sinks consume."""
    grammar, specs = TABLE_KG[table]
    rs = compile_grammar(grammar, domain)
    needed = sorted({r.source_column for r in rs.rules.values()})
    ds = read_table(sf_dir, table, columns=needed)
    ds = ds.map_batches(stringify({c: specs[c] for c in needed}),
                        batch_format="pyarrow")
    ds = ds.map_batches(TripleGenerator(rs), batch_format="pyarrow")
    return dedup_triples(ds)


def table_kg_terms(sf_dir: str, table: str,
                   domain: str = KG_DOMAIN) -> "ray.data.Dataset":
    """read_parquet(table) → stringify → triples → dedup → (s,p,o)."""
    return table_kg_triples(sf_dir, table, domain).map_batches(
        triples_to_terms, batch_format="pyarrow")


def table_kg_sql(table: str, domain: str = KG_DOMAIN) -> str:
    grammar, specs = TABLE_KG[table]
    rs = compile_grammar(grammar, domain)
    return ruleset_to_sql(rs, table, _colmap(rs, specs))


def table_requirements(sf_dir: str, table: str,
                       domain: str = KG_DOMAIN) -> "ray.data.Dataset":
    """S7 ontology-requirements side output: distinct requirement lines."""
    grammar, specs = TABLE_KG[table]
    rs = compile_grammar(grammar, domain)
    needed = sorted({r.source_column for r in rs.rules.values()})
    ds = read_table(sf_dir, table, columns=needed)
    ds = ds.map_batches(stringify({c: specs[c] for c in needed}),
                        batch_format="pyarrow")
    ds = ds.map_batches(OntologyRequirements(rs), batch_format="pyarrow")
    return distinct(ds, ["requirement"])


def table_requirements_sql(table: str, domain: str = KG_DOMAIN) -> str:
    grammar, specs = TABLE_KG[table]
    rs = compile_grammar(grammar, domain)
    return ontology_requirements_sql(rs, table, _colmap(rs, specs))


def union_kg_terms(sf_dir: str, tables: tuple[str, ...] = ("nation", "supplier"),
                   domain: str = KG_DOMAIN) -> "ray.data.Dataset":
    """A4 multi-source union (v1 orchestrator semantics,
    csv2rdf/csv2rdf.py:275-290): several sources accumulate into ONE
    deduped store."""
    from ..stages.dedup import dedup_triples as _dedup
    from ..stages.triples import TripleGenerator as _TG
    union = None
    for t in tables:
        grammar, specs = TABLE_KG[t]
        rs = compile_grammar(grammar, domain)
        needed = sorted({r.source_column for r in rs.rules.values()})
        ds = read_table(sf_dir, t, columns=needed)
        ds = ds.map_batches(stringify({c: specs[c] for c in needed}),
                            batch_format="pyarrow")
        ds = ds.map_batches(_TG(rs), batch_format="pyarrow")
        union = ds if union is None else union.union(ds)
    return _dedup(union).map_batches(triples_to_terms, batch_format="pyarrow")


def rdf_ingest_roundtrip(sf_dir: str, table: str = "nation",
                         fmt: str = "ttl") -> "ray.data.Dataset":
    """Bulk-RDF-loader gate: emit the table's KG as Turtle/N-Triples
    shards, then re-read them with the DISTRIBUTED reader
    (sources/rdfsource.py) — the returned term set must equal the
    direct pipeline's, so the existing ``table_kg_sql`` oracle applies
    verbatim. Exercises writer → real files on disk → parser."""
    import os
    import shutil

    tmp = os.path.join("/tmp/kgforge_ingest",
                       os.path.basename(os.path.normpath(sf_dir)),
                       f"{table}_{fmt}")
    shutil.rmtree(tmp, ignore_errors=True)
    tri = table_kg_triples(sf_dir, table)
    if fmt == "ttl":
        from ..sinks.turtle_sink import write_graph_turtle
        from ..sources.rdfsource import read_turtle
        write_graph_turtle(tri, tmp, domain=KG_DOMAIN)
        return read_turtle(os.path.join(tmp, "graph.ttl"))
    if fmt == "rdfxml":
        from ..sinks.rdfxml_sink import write_graph_rdfxml
        from ..sources.rdfsource import read_rdfxml
        write_graph_rdfxml(tri, tmp, domain=KG_DOMAIN)
        return read_rdfxml(os.path.join(tmp, "graph.rdf"))
    from ..sinks.ntriples_sink import write_graph
    from ..sources.rdfsource import read_ntriples
    write_graph(tri, tmp)
    return read_ntriples(os.path.join(tmp, "graph.nt"))


def union_kg_sql(tables: tuple[str, ...] = ("nation", "supplier"),
                 domain: str = KG_DOMAIN) -> str:
    parts = [f"({table_kg_sql(t, domain)})" for t in tables]
    return ("SELECT DISTINCT s, p, o FROM (\n" +
            "\nUNION ALL\n".join(parts) + "\n)")


# ---------------------------------------------------- default mode (M13)
from ..rules import default_ruleset
from ..stages.prepare import TIMESTAMP

EVENTS_SPECS = {"event_id": INT, "ts": TIMESTAMP, "user_id": INT,
                "event_type": STRING, "value": FLOAT(2), "props": STRING}
EVENTS_NULLS = frozenset({"NONE", "-"})


def _events_default_ruleset(domain: str = KG_DOMAIN) -> RuleSet:
    return default_ruleset(domain, list(EVENTS_SPECS), "event_id",
                           pkey_type="event", null_values=EVENTS_NULLS)


def default_kg_events(sf_dir: str, domain: str = KG_DOMAIN
                      ) -> "ray.data.Dataset":
    """Grammar-less conversion (M13, csv2rdf/csv2rdf.py:90-132) of the
    events table + the v1 FORGET null-value filter (M5)."""
    rs = _events_default_ruleset(domain)
    ds = read_table(sf_dir, "events", columns=list(EVENTS_SPECS))
    ds = ds.map_batches(stringify(EVENTS_SPECS), batch_format="pyarrow")
    ds = ds.map_batches(TripleGenerator(rs), batch_format="pyarrow")
    return dedup_triples(ds).map_batches(triples_to_terms,
                                         batch_format="pyarrow")


def default_kg_events_sql(domain: str = KG_DOMAIN) -> str:
    rs = _events_default_ruleset(domain)
    colmap = {sec: EVENTS_SPECS[r.source_column].sql_expr(r.source_column)
              for sec, r in rs.rules.items()}
    return ruleset_to_sql(rs, "events", colmap)


# ------------------------------------------------ v1 legacy grammar mode
V1_ORDERS_GRAMMAR = """o_orderkey,subject1|order
o_custkey,subject2|customer|S|ordered_by
o_orderstatus,literal
o_totalprice,literal
o_orderdate,ignore
o_orderpriority,subject2|priority|R
"""

V1_ORDERS_COLS = ["o_orderkey", "o_custkey", "o_orderstatus",
                  "o_totalprice", "o_orderdate", "o_orderpriority"]
V1_ORDERS_SPECS = {"o_orderkey": INT, "o_custkey": INT,
                   "o_orderstatus": STRING, "o_totalprice": FLOAT(2),
                   "o_orderdate": TIMESTAMP, "o_orderpriority": STRING}


def v1_kg_orders(sf_dir: str, domain: str = KG_DOMAIN) -> "ray.data.Dataset":
    """v1 legacy semantic grammar (csv2rdf/csv2rdf.py:135-268) over the
    orders table: positional binding, 'A_' URI interposition, unsanitized
    values, FORGET filter, space-split subject2 cells, S/R directions."""
    from ..functions.v1grammar import V1TripleGenerator, compile_v1_grammar
    g = compile_v1_grammar(V1_ORDERS_GRAMMAR, domain)
    ds = read_table(sf_dir, "orders", columns=V1_ORDERS_COLS)
    ds = ds.map_batches(stringify(V1_ORDERS_SPECS), batch_format="pyarrow")
    ds = ds.map_batches(V1TripleGenerator(g), batch_format="pyarrow")
    return dedup_triples(ds).map_batches(triples_to_terms,
                                         batch_format="pyarrow")


def v1_kg_orders_sql(domain: str = KG_DOMAIN) -> str:
    from ..functions.v1grammar import compile_v1_grammar, v1_to_sql
    g = compile_v1_grammar(V1_ORDERS_GRAMMAR, domain)
    exprs = [V1_ORDERS_SPECS[c].sql_expr(c) for c in V1_ORDERS_COLS]
    return v1_to_sql(g, "orders", exprs)


# ------------------------------------------------------ v2 dialect mode
V2_CUSTOMER_GRAMMAR = """
[c_name]
cell = pkey
celltypes = customer,legal_entity,RDFS:RESOURCE

[c_mktsegment]
cell = subject
column = predicate
celltypes = segment,concept
columntypes = in_segment,relation,RDF:PROPERTY

[c_nationkey]
cell = object,prefix(nk_)
column = predicate
celltypes = nation_ref
columntypes = nation_key_ref

[c_acctbal]
cell = object
celltypes = string
column = predicate
columntypes = unused

[c_custkey]
cell = ignore
"""

V2_CUSTOMER_SPECS = {"c_name": STRING, "c_mktsegment": STRING,
                     "c_nationkey": INT, "c_acctbal": FLOAT(2)}


def v2_kg_customer(sf_dir: str, domain: str = KG_DOMAIN
                   ) -> "ray.data.Dataset":
    """v2 dialect (csv2rdf-v2/csv2rdf-v2.py): sanitize-first cells,
    role permutations, rdf:type chains with RDFS:RESOURCE/RDF:PROPERTY,
    pkey-description comments."""
    from ..functions.v2grammar import V2TripleGenerator, compile_v2_grammar
    g = compile_v2_grammar(V2_CUSTOMER_GRAMMAR, domain)
    ds = read_table(sf_dir, "customer", columns=list(V2_CUSTOMER_SPECS))
    ds = ds.map_batches(stringify(V2_CUSTOMER_SPECS), batch_format="pyarrow")
    ds = ds.map_batches(V2TripleGenerator(g), batch_format="pyarrow")
    return dedup_triples(ds).map_batches(triples_to_terms,
                                         batch_format="pyarrow")


def v2_kg_customer_sql(domain: str = KG_DOMAIN) -> str:
    from ..functions.v2grammar import compile_v2_grammar, v2_to_sql
    g = compile_v2_grammar(V2_CUSTOMER_GRAMMAR, domain)
    exprs = {sec: V2_CUSTOMER_SPECS[c.source_column].sql_expr(c.source_column)
             for sec, c in g.columns.items()}
    return v2_to_sql(g, "customer", exprs)


# ------------------------------------------------------ v4 dialect mode
V4_PART_GRAMMAR = """
[p_name]
cell = pkey
celltypes = part,item_class

[p_brand]
cell = subject,map(all;*brands*)
celltypes = brand,naming_scheme
columntypes = branded_as,labelling

[p_type]
# slice [5:8] is BLANK for the 5-char types (SMALL/LARGE/PROMO) ->
# exercises the v4 "STRANGE" sentinel; MEDIUM -> miss 'm' (lowered
# slice fallback); ECONOMY/STANDARD -> map hits
cell = object,map(5:8;*tcodes*)
celltypes = type_code,concept
columntypes = typed_as,relation

[p_size]
cell = object,prefix(sz_)
celltypes = size_class
columntypes = sized,relation

[p_retailprice]
cell = object
celltypes = string

[*brands*]
brand#13 = acme
brand#5 = zenith

[*tcodes*]
my = economy_band
ard = standard_band
"""

V4_PART_SPECS = {"p_name": STRING, "p_brand": STRING, "p_type": STRING,
                 "p_size": INT, "p_retailprice": FLOAT(2)}


def v4_kg_part(sf_dir: str, domain: str = KG_DOMAIN) -> "ray.data.Dataset":
    """v4 dialect (csv2rdf-v4/csv2rdf-v4.py): sanitize-first cells,
    v3-style type chains, rdfs:domain/range, prepend-prefix, and the
    non-interactive map fallback with the "STRANGE" blank-slice
    sentinel."""
    from ..functions.v4grammar import V4TripleGenerator, compile_v4_grammar
    g = compile_v4_grammar(V4_PART_GRAMMAR, domain)
    ds = read_table(sf_dir, "part", columns=sorted(V4_PART_SPECS))
    ds = ds.map_batches(stringify(V4_PART_SPECS), batch_format="pyarrow")
    ds = ds.map_batches(V4TripleGenerator(g), batch_format="pyarrow")
    return dedup_triples(ds).map_batches(triples_to_terms,
                                         batch_format="pyarrow")


def v4_kg_part_sql(domain: str = KG_DOMAIN) -> str:
    from ..functions.v4grammar import compile_v4_grammar, v4_to_sql
    g = compile_v4_grammar(V4_PART_GRAMMAR, domain)
    exprs = {sec: V4_PART_SPECS[c.source_column].sql_expr(c.source_column)
             for sec, c in g.columns.items()}
    return v4_to_sql(g, "part", exprs)


def _v4_part_store(sf_dir: str) -> str:
    """Idempotent predicate-partitioned store of the v4 part graph
    under /tmp, keyed on the source file content (size+mtime) so a
    regenerated table invalidates the cache."""
    import glob
    import hashlib
    import os
    src = sorted(glob.glob(os.path.join(sf_dir, "part*.parquet")))
    stamp = ";".join(f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p):.6f}"
                     for p in src)
    key = hashlib.md5(f"v4store:{os.path.abspath(sf_dir)}:{stamp}"
                      .encode()).hexdigest()[:12]
    store = f"/tmp/kgforge_v4store_{key}"
    marker = os.path.join(store, "_SUCCESS")
    if os.path.exists(marker):
        return store
    import shutil
    # a dir without its _SUCCESS marker is a crashed build — a rebuild
    # into it would APPEND a second copy of every partition (Ray's
    # write_parquet never cleans), so build in a tmp dir and rename
    shutil.rmtree(store, ignore_errors=True)
    tmp = store + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    from ..sinks.ntriples_sink import write_graph_partitioned
    os.makedirs(tmp, exist_ok=True)
    write_graph_partitioned(v4_kg_part(sf_dir), tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    os.replace(tmp, store)
    return store


def v4_entailed_types(sf_dir: str) -> "ray.data.Dataset":
    """RDFS-entailed (s, type_uri) pairs for the v4 part graph —
    answered FROM the predicate-partitioned store via partition-pruned
    triple-pattern reads (S9 + the Jena inference hand-off,
    csv2rdf-v4/jena/requests.sparql:22-31, re-expressed Ray-native)."""
    from ..stages.entailment import entailed_types
    return entailed_types(_v4_part_store(sf_dir))


def v4_entailed_types_sql(domain: str = KG_DOMAIN) -> str:
    from ..stages.entailment import entailed_types_oracle_sql
    return entailed_types_oracle_sql(v4_kg_part_sql(domain))


def v4_entailed_facts(sf_dir: str) -> "ray.data.Dataset":
    """The reference's CONSTRUCT inference
    (csv2rdf-v4/jena/requests.sparql:10-13) over the v4 part graph:
    facts derived through the rdfs:subPropertyOf closure, answered from
    the partitioned store with pruned reads."""
    from ..stages.entailment import entailed_facts
    return entailed_facts(_v4_part_store(sf_dir))


def v4_entailed_facts_sql(domain: str = KG_DOMAIN) -> str:
    from ..stages.entailment import entailed_facts_oracle_sql
    return entailed_facts_oracle_sql(v4_kg_part_sql(domain))


# -------------------------------------------------- v3 type-chain mode
PART_V3_GRAMMAR = """
[p_name]
cellrole = pkey
celltype = part

[p_type]
cellrole = object
celltype = part_type,classification,concept
columntype = type_of,relates_to

[p_brand]
cellrole = object
celltype = brand,naming_scheme
columntype = branded_as,labelling
"""


def v3_chain_kg_part(sf_dir: str, domain: str = KG_DOMAIN
                     ) -> "ray.data.Dataset":
    """v3 subClassOf/subPropertyOf chain mode
    (csv2rdf-v3/csv2rdf-v3.py:263-281) over the part table."""
    rs = compile_grammar(PART_V3_GRAMMAR, domain, type_chains=True)
    ds = read_table(sf_dir, "part", columns=["p_name", "p_type", "p_brand"])
    ds = ds.map_batches(TripleGenerator(rs), batch_format="pyarrow")
    return dedup_triples(ds).map_batches(triples_to_terms,
                                         batch_format="pyarrow")


def v3_chain_kg_part_sql(domain: str = KG_DOMAIN) -> str:
    rs = compile_grammar(PART_V3_GRAMMAR, domain, type_chains=True)
    colmap = {sec: f'"{r.source_column}"' for sec, r in rs.rules.items()}
    return ruleset_to_sql(rs, "part", colmap)


def kg_conformance(sf_dir: str) -> "ray.data.Dataset":
    """Gate: ontology conformance report over the v4 part store — per
    declared (predicate, domain|range, class) constraint, instance
    triples checked and endpoints lacking the declared class among
    their asserted+subClassOf types (stages/conformance.py). The v4
    grammar mints a type for every entity it mints, so this store is
    CONFORMANT — six constraint rows with checked>0, violations 0;
    violation detection is pinned by the planted store in
    tests/test_conformance.py."""
    from ..stages.conformance import conformance_report
    return conformance_report(_v4_part_store(sf_dir))


def kg_conformance_sql() -> str:
    from ..ntriples import RDF_TYPE
    from ..stages.entailment import (RDFS_DOMAIN, RDFS_RANGE,
                                     RDFS_SUBCLASSOF)
    v4 = v4_kg_part_sql()
    return f"""
WITH RECURSIVE v4 AS ({v4}),
clo(c, a) AS (
  SELECT s, trim(o, '<>') FROM v4 WHERE p = '{RDFS_SUBCLASSOF}'
  UNION
  SELECT clo.c, trim(v.o, '<>') FROM clo
  JOIN v4 v ON v.s = clo.a AND v.p = '{RDFS_SUBCLASSOF}'
),
etypes AS (
  SELECT s AS e, trim(o, '<>') AS c FROM v4 WHERE p = '{RDF_TYPE}'
  UNION
  SELECT t.s, clo.a FROM v4 t
  JOIN clo ON clo.c = trim(t.o, '<>') WHERE t.p = '{RDF_TYPE}'
),
decl AS (
  SELECT s AS pred, 'domain' AS kind, trim(o, '<>') AS cls
  FROM v4 WHERE p = '{RDFS_DOMAIN}'
  UNION ALL
  SELECT s, 'range', trim(o, '<>') FROM v4 WHERE p = '{RDFS_RANGE}'
),
ck AS (
  SELECT d.pred, d.kind, d.cls,
         CASE WHEN d.kind = 'domain' THEN i.s
              WHEN i.o IS NOT NULL AND starts_with(i.o, '<')
                THEN trim(i.o, '<>')
              ELSE NULL END AS endpoint
  FROM decl d LEFT JOIN v4 i ON i.p = d.pred
)
SELECT pred, kind, cls,
       CAST(count(endpoint) AS BIGINT) AS checked,
       CAST(coalesce(sum(CASE WHEN endpoint IS NOT NULL AND NOT EXISTS
         (SELECT 1 FROM etypes
          WHERE etypes.e = ck.endpoint AND etypes.c = ck.cls)
         THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations
FROM ck GROUP BY 1, 2, 3
"""
