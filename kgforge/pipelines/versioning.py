"""Versioned-property store + the reference's .sparql text as gates.

The reference ships a literal query file
(/root/reference/csv2rdf-v4/jena/requests.sparql:1-31) and a versioning
test graph (jena/test-version.ttl:1-28: ``ns1v1:applicable_to`` /
``ns1v2:applicable_to`` both ``rdfs:subPropertyOf ns1:applicable_to``,
instance pairs per version).  This module scales that ttl's SHAPE to
the testdata ``part`` table deterministically and runs the reference's
own query text through the SPARQL front-end (kgforge/sparql.py) as
driver gates:

- statement 1 (``select ?x ?y ?z``)      -> full-store scan, v4 store;
- statement 2 (CONSTRUCT inference)      -> must hash-match the
  programmatic ``entailed_facts`` plan (kg_entailed_facts_part gate);
- statement 3 (INSERT .. WHERE)          -> same derivation (executed
  as CONSTRUCT in the gate; ``sparql_insert`` mutation is covered by
  tests/test_sparql.py);
- statement 4 (versioning SELECT+MINUS)  -> over the versioned store.

Versioned fixture (deterministic in the part table, SQL-mirrorable):
every part ``k`` has a v1 pair ``(part{k}, sz{p_size})``; v2 carries
the v1 pair for even ``k`` and adds ``(part{k}, sz{(p_size*7)%50+1})``
for every ``k``.  The versioning query therefore returns the v2 pairs
NOT also asserted at v1 — "latest version only", as the reference's
comment says.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..ntriples import RDF_TYPE
from ..sparql import load_reference_requests, parse_sparql
from ..stages.entailment import RDFS_SUBPROPERTYOF

#: the reference's own namespaces (jena/test-version.ttl:1-3) — the
#: query text binds these prefixes, so the fixture mints under them
NS1 = "https://www.olivier.com/rdf/mipl/"
NS1V1 = NS1 + "v01/"
NS1V2 = NS1 + "v02/"
RDF_PROPERTY = "http://www.w3.org/1999/02/22-rdf-syntax-ns#Property"


def versioned_triples(sf_dir: str) -> "ray.data.Dataset":
    """Term-form (s, p, o) rows of the scaled test-version graph."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_size"])

    def build(b: pa.Table) -> pa.Table:
        import numpy as np
        k = b["p_partkey"].combine_chunks().cast(pa.string())
        keys = (b["p_partkey"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        size = (b["p_size"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        s = pc.binary_join_element_wise(pa.scalar(NS1 + "part"), k, "")
        z1 = pc.binary_join_element_wise(
            pa.scalar("<" + NS1 + "sz"),
            pa.array(size.astype(str)), pa.scalar(">"), "")
        alt = (size * 7) % 50 + 1
        z2 = pc.binary_join_element_wise(
            pa.scalar("<" + NS1 + "sz"),
            pa.array(alt.astype(str)), pa.scalar(">"), "")
        even = pa.array(keys % 2 == 0)

        def block(subj, pred, obj):
            return pa.table({
                "s": subj,
                "p": pa.array([pred] * len(subj), type=pa.string()),
                "o": obj})

        parts = [
            block(s, NS1V1 + "applicable_to", z1),              # v1: all
            block(s.filter(even), NS1V2 + "applicable_to",
                  z1.filter(even)),                             # carried
            block(s, NS1V2 + "applicable_to", z2),              # v2 new
        ]
        return pa.concat_tables(parts)

    inst = ds.map_batches(build, batch_format="pyarrow")
    schema_rows = pa.table({
        "s": pa.array([NS1V1 + "applicable_to", NS1V2 + "applicable_to",
                       NS1V1 + "applicable_to", NS1V2 + "applicable_to",
                       NS1 + "applicable_to"], type=pa.string()),
        "p": pa.array([RDFS_SUBPROPERTYOF, RDFS_SUBPROPERTYOF,
                       RDF_TYPE, RDF_TYPE, RDF_TYPE], type=pa.string()),
        "o": pa.array([f"<{NS1}applicable_to>", f"<{NS1}applicable_to>",
                       f"<{RDF_PROPERTY}>", f"<{RDF_PROPERTY}>",
                       f"<{RDF_PROPERTY}>"], type=pa.string()),
    })
    return inst.union(ray.data.from_arrow(schema_rows))


def versioned_store(sf_dir: str) -> str:
    """Idempotent predicate-partitioned store of the versioned graph
    under /tmp (content-keyed cache, atomic build)."""
    import glob
    import hashlib
    import os
    import shutil
    src = sorted(glob.glob(os.path.join(sf_dir, "part*.parquet")))
    stamp = ";".join(f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p):.6f}"
                     for p in src)
    key = hashlib.md5(f"verstore:{os.path.abspath(sf_dir)}:{stamp}"
                      .encode()).hexdigest()[:12]
    store = f"/tmp/kgforge_verstore_{key}"
    marker = os.path.join(store, "_SUCCESS")
    if os.path.exists(marker):
        return store
    shutil.rmtree(store, ignore_errors=True)
    tmp = store + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    from ..sinks.ntriples_sink import write_graph_partitioned
    os.makedirs(tmp, exist_ok=True)
    write_graph_partitioned(versioned_triples(sf_dir), tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    os.replace(tmp, store)
    return store


# ------------------------------------------------------------ gates

def _statements():
    return parse_sparql(load_reference_requests())


def sparql_select_store(sf_dir: str) -> "ray.data.Dataset":
    """requests.sparql statement 1 (``select ?x ?y ?z``) parsed from
    the reference's own text, run over the v4 part store."""
    from ..sparql import execute_sparql
    from .tabular import _v4_part_store
    q = _statements()[0]
    assert q.form == "select" and not q.distinct
    return execute_sparql(_v4_part_store(sf_dir), q)


def sparql_select_store_sql() -> str:
    from .tabular import v4_kg_part_sql
    return (f"SELECT s AS x, p AS y, o AS z FROM ({v4_kg_part_sql()})")


def sparql_construct_facts(sf_dir: str) -> "ray.data.Dataset":
    """Statement 2 (the CONSTRUCT inference principle) parsed from the
    reference text — the planner must land on the same partition-pruned
    closure plan as the programmatic ``entailed_facts``."""
    from ..sparql import execute_sparql
    from .tabular import _v4_part_store
    q = _statements()[1]
    assert q.form == "construct"
    return execute_sparql(_v4_part_store(sf_dir), q)


def sparql_insert_facts(sf_dir: str) -> "ray.data.Dataset":
    """Statement 3 (INSERT .. WHERE): the gate runs the read-only
    derivation (identical rows to the CONSTRUCT); the store-mutating
    path (``sparql_insert``) is exercised in tests on a scratch
    store."""
    from ..sparql import execute_sparql
    from .tabular import _v4_part_store
    q = _statements()[2]
    assert q.form == "insert"
    return execute_sparql(_v4_part_store(sf_dir), q)


def sparql_facts_sql() -> str:
    from .tabular import v4_entailed_facts_sql
    return v4_entailed_facts_sql()


def sparql_versioning_minus(sf_dir: str) -> "ray.data.Dataset":
    """Statement 4 (versioning MINUS) from the reference text, over the
    scaled test-version store: DISTINCT v2 pairs not reachable through
    any OTHER subproperty of the mother relation."""
    from ..sparql import execute_sparql
    q = _statements()[3]
    assert q.form == "select" and q.distinct
    return execute_sparql(versioned_store(sf_dir), q)


def sparql_versioning_minus_sql() -> str:
    part_s = f"'{NS1}part' || CAST(p_partkey AS VARCHAR)"
    z1 = f"'<{NS1}sz' || CAST(p_size AS VARCHAR) || '>'"
    z2 = f"'<{NS1}sz' || CAST((p_size * 7) % 50 + 1 AS VARCHAR) || '>'"
    return f"""
WITH v1 AS (SELECT {part_s} AS x, {z1} AS z FROM part),
v2 AS (
  SELECT {part_s} AS x, {z1} AS z FROM part WHERE p_partkey % 2 = 0
  UNION ALL
  SELECT {part_s} AS x, {z2} AS z FROM part
)
SELECT DISTINCT x, z FROM v2
EXCEPT
SELECT x, z FROM v1
"""


AGG_QUERY_TEXT = """
SELECT ?y (COUNT(*) AS ?n) WHERE { ?x ?y ?z }
GROUP BY ?y ORDER BY DESC(?n) ?y LIMIT 5
"""


def sparql_groupby_count(sf_dir: str) -> "ray.data.Dataset":
    """SPARQL 1.1 aggregate extension gate: predicate histogram of the
    v4 part store — GROUP BY + COUNT + ORDER BY DESC + LIMIT parsed
    from query text and planned onto the partitioned store."""
    from ..sparql import execute_sparql, parse_sparql
    from .tabular import _v4_part_store
    q = parse_sparql(AGG_QUERY_TEXT)[0]
    assert q.aggs and q.group_by == ["y"] and q.limit == 5
    return execute_sparql(_v4_part_store(sf_dir), q)


def sparql_groupby_count_sql() -> str:
    from .tabular import v4_kg_part_sql
    return (f"SELECT p AS y, CAST(count(*) AS BIGINT) AS n "
            f"FROM ({v4_kg_part_sql()}) "
            f"GROUP BY p ORDER BY n DESC, y ASC LIMIT 5")


FILTER_NUM_QUERY = """
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
SELECT ?x ?c WHERE {
  ?x rdfs:comment ?c .
  FILTER(?c >= 905) FILTER(?c < 915)
}
"""

FILTER_STR_QUERY = """
PREFIX tpch: <https://kgforge.example.org/tpch/>
SELECT ?x ?b WHERE {
  ?x tpch:branded_as ?b .
  FILTER strstarts(str(?b), "https://kgforge.example.org/tpch/s")
  FILTER regex(str(?b), "_(anvil|gear)$")
}
"""


def sparql_filter_numeric(sf_dir: str) -> "ray.data.Dataset":
    """FILTER extension gate: numeric range comparison on a literal's
    LEXICAL value (``"906.20"`` matches ``>= 905``) — non-numeric
    terms are eliminated (SPARQL type-error semantics), evaluated as
    Arrow cast + compare kernels inside the partition-pruned read."""
    from ..sparql import execute_sparql, parse_sparql
    from .tabular import _v4_part_store
    q = parse_sparql(FILTER_NUM_QUERY)[0]
    assert [f.op for f in q.where.filters] == [">=", "<"]
    return execute_sparql(_v4_part_store(sf_dir), q)


def sparql_filter_numeric_sql() -> str:
    from .tabular import v4_kg_part_sql
    num = "TRY_CAST(trim(o, '\"') AS DOUBLE)"
    return (f"SELECT s AS x, o AS c FROM ({v4_kg_part_sql()}) "
            f"WHERE p = 'http://www.w3.org/2000/01/rdf-schema#comment' "
            f"AND {num} >= 905 AND {num} < 915")


def sparql_filter_strfuncs(sf_dir: str) -> "ray.data.Dataset":
    """FILTER extension gate: strstarts + regex over STR(?v) (term
    decoration stripped), RE2 on both sides of the oracle compare."""
    from ..sparql import execute_sparql, parse_sparql
    from .tabular import _v4_part_store
    q = parse_sparql(FILTER_STR_QUERY)[0]
    assert [f.op for f in q.where.filters] == ["strstarts", "regex"]
    return execute_sparql(_v4_part_store(sf_dir), q)


NSC = "https://kgforge.example.org/cat/"
N_CATS = 120   # cat2..cat121, parent = cat(k//2), root = cat1


def category_triples(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic category-taxonomy fixture: a binary-tree hierarchy
    ``cat_k subCategoryOf cat_{k//2}`` (k in 2..121) plus, per part i:
    one ``part_i typed_in cat_{(i % 120) + 2}`` instance triple
    (multi-hop ancestor chains for the property-path gates), INTEGER
    literal measures ``weight = (i*31) % 97`` and ``cap = (i*17) % 89``
    (integer-valued doubles sum exactly in any order, so SUM/AVG gates
    hash-match the SQL oracle bit-for-bit), and a sparse ``bonus``
    triple for i % 3 == 0 (COUNT-over-OPTIONAL null semantics)."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "part", columns=["p_partkey"])

    def build(b: pa.Table) -> pa.Table:
        keys = (b["p_partkey"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        s = pa.array([f"{NSC}part{k}" for k in keys], pa.string())
        o = pa.array([f"<{NSC}cat{(k % N_CATS) + 2}>" for k in keys],
                     pa.string())
        n = len(keys)

        def lit(vals):
            return pa.array([f'"{v}"' for v in vals], pa.string())

        def pred(name):
            return pa.array([NSC + name] * n, pa.string())

        parts = [
            pa.table({"s": s, "p": pred("typed_in"), "o": o}),
            pa.table({"s": s, "p": pred("weight"),
                      "o": lit((keys * 31) % 97)}),
            pa.table({"s": s, "p": pred("cap"),
                      "o": lit((keys * 17) % 89)}),
        ]
        m = keys % 3 == 0
        if m.any():
            sb = pa.array([f"{NSC}part{k}" for k in keys[m]], pa.string())
            parts.append(pa.table({
                "s": sb,
                "p": pa.array([NSC + "bonus"] * len(keys[m]), pa.string()),
                "o": lit((keys[m] * 7) % 13)}))
        return pa.concat_tables(parts)

    inst = ds.map_batches(build, batch_format="pyarrow")
    ks = list(range(2, N_CATS + 2))
    tree = pa.table({
        "s": pa.array([f"{NSC}cat{k}" for k in ks], pa.string()),
        "p": pa.array([NSC + "subCategoryOf"] * len(ks), pa.string()),
        "o": pa.array([f"<{NSC}cat{k // 2}>" for k in ks], pa.string()),
    })
    return inst.union(ray.data.from_arrow(tree))


def category_store(sf_dir: str) -> str:
    """Idempotent predicate-partitioned store of the category fixture
    (content-keyed /tmp cache, atomic build)."""
    import glob
    import hashlib
    import os
    import shutil
    src = sorted(glob.glob(os.path.join(sf_dir, "part*.parquet")))
    stamp = ";".join(f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p):.6f}"
                     for p in src)
    # "catstore2": fixture v2 (weight/cap/bonus measures) — a new key
    # prefix invalidates cached v1 stores
    key = hashlib.md5(f"catstore2:{os.path.abspath(sf_dir)}:{stamp}"
                      .encode()).hexdigest()[:12]
    store = f"/tmp/kgforge_catstore_{key}"
    marker = os.path.join(store, "_SUCCESS")
    if os.path.exists(marker):
        return store
    shutil.rmtree(store, ignore_errors=True)
    tmp = store + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    from ..sinks.ntriples_sink import write_graph_partitioned
    os.makedirs(tmp, exist_ok=True)
    write_graph_partitioned(category_triples(sf_dir), tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    os.replace(tmp, store)
    return store


PATH_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT DISTINCT ?p ?a WHERE {
  ?p c:typed_in ?c .
  ?c c:subCategoryOf+ ?a
}
"""


def sparql_path_ancestors(sf_dir: str) -> "ray.data.Dataset":
    """SPARQL 1.1 property-path gate: every (part, category-ancestor)
    pair through the Kleene-plus of an INSTANCE predicate — the parsed
    ``subCategoryOf+`` plans onto ops.graph.transitive_pairs, and the
    ?c chain crosses from an o-position into the path's s-position
    (exercising the canonical-representation join fix)."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(PATH_QUERY_TEXT)[0]
    assert q.where.patterns[1].path == "+"
    return execute_sparql(category_store(sf_dir), q)


def sparql_path_ancestors_sql() -> str:
    return f"""
WITH RECURSIVE
inst AS (SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
                CAST(p_partkey % {N_CATS} + 2 AS BIGINT) AS ck FROM part),
walk(node, anc) AS (
  SELECT CAST(range AS BIGINT), CAST(range // 2 AS BIGINT)
  FROM range(2, {N_CATS + 2})
  UNION ALL
  SELECT w.node, w.anc // 2 FROM walk w WHERE w.anc >= 2
),
pairs AS (SELECT DISTINCT node, anc FROM walk)
SELECT DISTINCT inst.p AS p,
       '<{NSC}cat' || CAST(pairs.anc AS VARCHAR) || '>' AS a
FROM inst JOIN pairs ON pairs.node = inst.ck
"""


def sparql_filter_strfuncs_sql() -> str:
    from .tabular import v4_kg_part_sql
    iri = "trim(o, '<>')"
    return (f"SELECT s AS x, o AS b FROM ({v4_kg_part_sql()}) "
            f"WHERE p = 'https://kgforge.example.org/tpch/branded_as' "
            f"AND starts_with({iri}, 'https://kgforge.example.org/tpch/s') "
            f"AND regexp_matches({iri}, '_(anvil|gear)$')")


VALUES_QUERY_TEXT = """
PREFIX tpch: <https://kgforge.example.org/tpch/>
SELECT ?x ?b WHERE {
  VALUES ?b { tpch:small_anvil tpch:red_gear }
  ?x tpch:branded_as ?b
}
"""


def sparql_values_brands(sf_dir: str) -> "ray.data.Dataset":
    """SPARQL VALUES gate: inline data joined into the group — the
    constants are rendered in the variable's canonical representation
    (?b is o-position class, so term form) and the join is the same
    size-adaptive machinery as pattern chaining."""
    from ..sparql import execute_sparql, parse_sparql
    from .tabular import _v4_part_store
    q = parse_sparql(VALUES_QUERY_TEXT)[0]
    assert q.where.values and q.where.values[0][0] == ["b"]
    return execute_sparql(_v4_part_store(sf_dir), q)


def sparql_values_brands_sql() -> str:
    from .tabular import v4_kg_part_sql
    tp = "https://kgforge.example.org/tpch/"
    return (f"SELECT s AS x, o AS b FROM ({v4_kg_part_sql()}) "
            f"WHERE p = '{tp}branded_as' AND o IN "
            f"('<{tp}small_anvil>', '<{tp}red_gear>')")


DESCRIBE_QUERY_TEXT = """
PREFIX tpch: <https://kgforge.example.org/tpch/>
DESCRIBE ?b WHERE {
  ?x tpch:branded_as ?b .
  FILTER strstarts(str(?b), "https://kgforge.example.org/tpch/c")
}
"""


def sparql_describe_brands(sf_dir: str) -> "ray.data.Dataset":
    """DESCRIBE gate: the outgoing triples of every 'c…' brand entity
    matched by the WHERE group — resources resolve driver-side
    (bounded), then ONE streamed store scan with a broadcast membership
    filter."""
    from ..sparql import execute_sparql, parse_sparql
    from .tabular import _v4_part_store
    q = parse_sparql(DESCRIBE_QUERY_TEXT)[0]
    assert q.form == "describe"
    return execute_sparql(_v4_part_store(sf_dir), q)


def sparql_describe_brands_sql() -> str:
    from .tabular import v4_kg_part_sql
    v4 = v4_kg_part_sql()
    tp = "https://kgforge.example.org/tpch/"
    return f"""
SELECT s, p, o FROM ({v4})
WHERE s IN (
  SELECT DISTINCT trim(o, '<>') FROM ({v4})
  WHERE p = '{tp}branded_as'
    AND starts_with(trim(o, '<>'), '{tp}c'))
"""


SEQ_PATH_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT DISTINCT ?p ?a WHERE { ?p c:typed_in/c:subCategoryOf+ ?a }
"""


def sparql_seq_path(sf_dir: str) -> "ray.data.Dataset":
    """Sequence property path gate: ``typed_in/subCategoryOf+`` — the
    parse-time rewrite chains a fresh intermediate variable into the
    same plan as the explicit two-pattern query, so the result must
    hash-match the sparql_path_ancestors oracle exactly."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(SEQ_PATH_QUERY_TEXT)[0]
    assert len(q.where.patterns) == 2     # rewritten into a chain
    assert q.where.patterns[1].path == "+"
    return execute_sparql(category_store(sf_dir), q)


INV_ALT_QUERY_TEXT = """
PREFIX tpch: <https://kgforge.example.org/tpch/>
SELECT ?part ?thing WHERE { ?thing ^tpch:sized|^tpch:typed_as ?part }
"""


def sparql_inv_alt_path(sf_dir: str) -> "ray.data.Dataset":
    """Inverse + alternation path gate: ``^sized|^typed_as`` — each
    alternative swaps subject/object at parse time and the alternation
    becomes the planner's UNION."""
    from ..sparql import execute_sparql, parse_sparql
    from .tabular import _v4_part_store
    q = parse_sparql(INV_ALT_QUERY_TEXT)[0]
    assert len(q.where.unions) == 1 and len(q.where.unions[0]) == 2
    return execute_sparql(_v4_part_store(sf_dir), q)


def sparql_inv_alt_path_sql() -> str:
    from .tabular import v4_kg_part_sql
    tp = "https://kgforge.example.org/tpch/"
    return (f"SELECT s AS part, o AS thing FROM ({v4_kg_part_sql()}) "
            f"WHERE p IN ('{tp}sized', '{tp}typed_as')")


GROUP_CLOSURE_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?a WHERE {
  ?p (c:typed_in|c:subCategoryOf)+ ?a .
  FILTER strstarts(STR(?p), "https://kgforge.example.org/cat/part")
}
"""


def sparql_group_closure(sf_dir: str) -> "ray.data.Dataset":
    """Modified path-group gate: ``(typed_in|subCategoryOf)+`` — the
    transitive closure over the UNION of two predicates' edge sets
    (AltSet), partition-pruned reads per member. Filtered to part
    subjects: every part paired with its category and all taxonomy
    ancestors down to the root."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(GROUP_CLOSURE_QUERY_TEXT)[0]
    assert q.where.patterns[0].path == "+"
    return execute_sparql(category_store(sf_dir), q)


def sparql_group_closure_sql() -> str:
    return f"""
WITH RECURSIVE
inst AS (SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
                CAST(p_partkey % {N_CATS} + 2 AS BIGINT) AS a
         FROM part),
walk(p, a) AS (
  SELECT p, a FROM inst
  UNION ALL
  SELECT p, a // 2 FROM walk WHERE a >= 2
)
SELECT DISTINCT p, '<{NSC}cat' || CAST(a AS VARCHAR) || '>' AS a
FROM walk
"""


SUM_DISTINCT_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?c (SUM(DISTINCT ?v) AS ?sv) (AVG(DISTINCT ?v) AS ?av)
       (SUM(?v) AS ?s) WHERE {
  ?p c:typed_in ?c .
  ?p c:bonus ?v
}
GROUP BY ?c
"""


def sparql_sum_distinct(sf_dir: str) -> "ray.data.Dataset":
    """SUM/AVG(DISTINCT) gate over the fixture's PLANTED within-group
    duplicates (parts k and k+1560 share category AND bonus value), so
    SUM(DISTINCT ?v) genuinely differs from SUM(?v) in the colliding
    groups. DISTINCT deduplicates the numeric VALUES — the SQL
    SUM(DISTINCT) reading; integer-valued doubles sum exactly in any
    order, so the hash matches bit-for-bit."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(SUM_DISTINCT_QUERY_TEXT)[0]
    assert [a.distinct for a in q.aggs] == [True, True, False]
    return execute_sparql(category_store(sf_dir), q)


def sparql_sum_distinct_sql() -> str:
    return f"""
SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR)
           || '>' AS c,
       CAST(SUM(DISTINCT (p_partkey * 7) % 13) AS DOUBLE) AS sv,
       CAST(AVG(DISTINCT (p_partkey * 7) % 13) AS DOUBLE) AS av,
       CAST(SUM((p_partkey * 7) % 13) AS DOUBLE) AS s
FROM part WHERE p_partkey % 3 = 0
GROUP BY 1
"""


GROUP_PATH_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?a WHERE {
  ?p c:typed_in/(c:subCategoryOf|c:subCategoryOf/c:subCategoryOf) ?a
}
"""


def sparql_group_path(sf_dir: str) -> "ray.data.Dataset":
    """Parenthesized path-group gate: a (b|b/b) distributes at parse
    time into two SEQUENCE union legs — every part's category parent
    plus its grandparent where one exists. Each leg chains fresh
    intermediate variables and carries a projection down to the path
    endpoints (?p, ?a) before the union aligns column sets; bag
    semantics, so the grandparent rows do not collapse into the
    parent rows."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(GROUP_PATH_QUERY_TEXT)[0]
    assert len(q.where.unions) == 1 and len(q.where.unions[0]) == 2
    assert all(leg.project == ("p", "a") for leg in q.where.unions[0])
    return execute_sparql(category_store(sf_dir), q)


def sparql_group_path_sql() -> str:
    return f"""
WITH inst AS (SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
                     CAST(p_partkey % {N_CATS} + 2 AS BIGINT) AS ck
              FROM part)
SELECT p, '<{NSC}cat' || CAST(ck // 2 AS VARCHAR) || '>' AS a FROM inst
UNION ALL
SELECT p, '<{NSC}cat' || CAST(ck // 4 AS VARCHAR) || '>' AS a
FROM inst WHERE ck >= 4
"""


NOT_EXISTS_QUERY_TEXT = """
PREFIX tpch: <https://kgforge.example.org/tpch/>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
SELECT ?b ?c WHERE {
  ?b rdfs:comment ?c .
  FILTER NOT EXISTS {
    ?x tpch:branded_as ?b .
    FILTER strstarts(str(?x), "https://kgforge.example.org/tpch/acme")
  }
}
"""


def sparql_not_exists(sf_dir: str) -> "ray.data.Dataset":
    """FILTER NOT EXISTS gate: brand entities with a comment that are
    never branded by an 'acme…'-style subject (non-empty at every test SF) — correlated on ?b, which
    also crosses positions (outer s, inner o), so the canonical term
    representation carries through the anti-join."""
    from ..sparql import execute_sparql, parse_sparql
    from .tabular import _v4_part_store
    q = parse_sparql(NOT_EXISTS_QUERY_TEXT)[0]
    assert q.where.not_exists and q.where.not_exists[0].filters
    return execute_sparql(_v4_part_store(sf_dir), q)


def sparql_not_exists_sql() -> str:
    from .tabular import v4_kg_part_sql
    v4 = v4_kg_part_sql()
    tp = "https://kgforge.example.org/tpch/"
    return f"""
SELECT '<' || s || '>' AS b, o AS c FROM ({v4})
WHERE p = 'http://www.w3.org/2000/01/rdf-schema#comment'
  AND s NOT IN (
    SELECT trim(o, '<>') FROM ({v4})
    WHERE p = '{tp}branded_as' AND starts_with(s, '{tp}acme'))
"""


ASK_PRESENT = """
PREFIX tpch: <https://kgforge.example.org/tpch/>
ASK { ?x tpch:branded_as ?b }
"""
ASK_ABSENT = """
PREFIX tpch: <https://kgforge.example.org/tpch/>
ASK WHERE { ?x tpch:branded_as "no such brand" }
"""


def sparql_ask_pair(sf_dir: str) -> "ray.data.Dataset":
    """ASK form gate: one satisfiable and one unsatisfiable existence
    check over the v4 store (the unsatisfiable one binds a literal
    object that never occurs) — the plan stops at the first surviving
    binding (limit-1), never scanning the whole partition."""
    import pandas as pd

    from ..sparql import execute_sparql, parse_sparql
    from .tabular import _v4_part_store
    store = _v4_part_store(sf_dir)
    out = []
    for which, text in (("absent", ASK_ABSENT), ("present", ASK_PRESENT)):
        q = parse_sparql(text)[0]
        assert q.form == "ask"
        got = execute_sparql(store, q).to_pandas()
        out.append({"which": which, "ask": bool(got["ask"][0])})
    return pd.DataFrame(out)


def sparql_ask_pair_sql() -> str:
    from .tabular import v4_kg_part_sql
    v4 = v4_kg_part_sql()
    pred = "https://kgforge.example.org/tpch/branded_as"
    return f"""
SELECT 'absent' AS which,
       EXISTS(SELECT 1 FROM ({v4})
              WHERE p = '{pred}' AND o = '"no such brand"') AS ask
UNION ALL
SELECT 'present',
       EXISTS(SELECT 1 FROM ({v4}) WHERE p = '{pred}')
"""


# --------------------------------------- round-5 SPARQL feature gates

STAR_PATH_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT DISTINCT ?p ?a WHERE { ?p c:typed_in/c:subCategoryOf* ?a }
"""


def sparql_star_path(sf_dir: str) -> "ray.data.Dataset":
    """Zero-or-more property path gate: ``typed_in/subCategoryOf*`` —
    vs the ``+`` ancestors gate every part ALSO pairs with its direct
    category (the zero-length path), planned as the Kleene-plus
    closure unioned with the store's reflexive IRI node domain."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(STAR_PATH_QUERY)[0]
    assert q.where.patterns[1].path == "*"
    return execute_sparql(category_store(sf_dir), q)


def sparql_star_path_sql() -> str:
    return f"""
WITH RECURSIVE
inst AS (SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
                CAST(p_partkey % {N_CATS} + 2 AS BIGINT) AS ck FROM part),
walk(node, anc) AS (
  SELECT CAST(range AS BIGINT), CAST(range // 2 AS BIGINT)
  FROM range(2, {N_CATS + 2})
  UNION ALL
  SELECT w.node, w.anc // 2 FROM walk w WHERE w.anc >= 2
),
pairs AS (
  SELECT DISTINCT node, anc FROM walk
  UNION
  SELECT CAST(range AS BIGINT), CAST(range AS BIGINT)
  FROM range(2, {N_CATS + 2})
)
SELECT DISTINCT inst.p AS p,
       '<{NSC}cat' || CAST(pairs.anc AS VARCHAR) || '>' AS a
FROM inst JOIN pairs ON pairs.node = inst.ck
"""


DISTINCT_TYPES_QUERY = """
PREFIX tpch: <https://kgforge.example.org/tpch/>
SELECT DISTINCT ?t WHERE { ?x tpch:typed_as ?t }
"""


def sparql_distinct_types(sf_dir: str) -> "ray.data.Dataset":
    """SELECT DISTINCT gate: the distinct type-code objects of the v4
    part store — the projection feeds the two-phase bucket distinct."""
    from ..sparql import execute_sparql, parse_sparql
    from .tabular import _v4_part_store
    q = parse_sparql(DISTINCT_TYPES_QUERY)[0]
    assert q.distinct
    return execute_sparql(_v4_part_store(sf_dir), q)


def sparql_distinct_types_sql() -> str:
    from .tabular import v4_kg_part_sql
    return (f"SELECT DISTINCT o AS t FROM ({v4_kg_part_sql()}) "
            f"WHERE p = 'https://kgforge.example.org/tpch/typed_as'")


SUM_AVG_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?c (SUM(?w) AS ?total) (AVG(?w) AS ?mean) (COUNT(?w) AS ?n)
WHERE { ?p c:typed_in ?c . ?p c:weight ?w }
GROUP BY ?c
"""


def sparql_sum_avg(sf_dir: str) -> "ray.data.Dataset":
    """SUM/AVG aggregate gate over integer-valued literals (exact in
    float64 regardless of combine order, so the grouped sums
    hash-match DuckDB bit-for-bit); COUNT rides along as int64."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(SUM_AVG_QUERY)[0]
    assert sorted(a.func for a in q.aggs) == ["avg", "count", "sum"]
    return execute_sparql(category_store(sf_dir), q)


def sparql_sum_avg_sql() -> str:
    w = "CAST((p_partkey * 31) % 97 AS DOUBLE)"
    return f"""
SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>' AS c,
       SUM({w}) AS total, AVG({w}) AS mean,
       CAST(COUNT(*) AS BIGINT) AS n
FROM part GROUP BY 1
"""


OFFSET_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?c WHERE { ?p c:typed_in ?c }
ORDER BY ?p ?c LIMIT 25 OFFSET 50
"""


def sparql_offset_page(sf_dir: str) -> "ray.data.Dataset":
    """OFFSET paging gate: page 3 of the ordered typed_in pairs — the
    plan takes offset+limit rows off the sorted stream and slices
    driver-side (bounded by the page, never the result size)."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(OFFSET_QUERY)[0]
    assert q.limit == 25 and q.offset == 50
    return execute_sparql(category_store(sf_dir), q)


def sparql_offset_page_sql() -> str:
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>' AS c
FROM part ORDER BY p, c LIMIT 25 OFFSET 50
"""


BIND_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?tag WHERE {
  ?p c:typed_in ?c .
  BIND(CONCAT(STR(?p), "@", STR(?c)) AS ?tag)
}
"""


def sparql_bind_concat(sf_dir: str) -> "ray.data.Dataset":
    """BIND gate: a computed column from CONCAT/STR over both
    canonical representations (?p raw IRI, ?c term form — STR strips
    the decoration), appended vectorized per batch."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(BIND_QUERY)[0]
    assert q.where.binds and q.where.binds[0].alias == "tag"
    return execute_sparql(category_store(sf_dir), q)


def sparql_bind_concat_sql() -> str:
    p = f"'{NSC}part' || CAST(p_partkey AS VARCHAR)"
    c = f"'{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR)"
    return f"SELECT {p} AS p, {p} || '@' || {c} AS tag FROM part"


VARVAR_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?w ?m WHERE {
  ?p c:weight ?w . ?p c:cap ?m . FILTER(?w > ?m)
}
"""


def sparql_filter_varvar(sf_dir: str) -> "ray.data.Dataset":
    """FILTER var-vs-var gate: an ordering comparison between two
    bound literals' NUMERIC lexical values, evaluated as Arrow
    kernels after the subject-correlated join."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(VARVAR_QUERY)[0]
    f = q.where.filters[0]
    assert f.op == ">" and type(f.term).__name__ == "Var"
    return execute_sparql(category_store(sf_dir), q)


def sparql_filter_varvar_sql() -> str:
    w = "(p_partkey * 31) % 97"
    m = "(p_partkey * 17) % 89"
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"' || CAST({w} AS VARCHAR) || '"' AS w,
       '"' || CAST({m} AS VARCHAR) || '"' AS m
FROM part WHERE {w} > {m}
"""


OPT_COUNT_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?c (COUNT(?b) AS ?n) (COUNT(*) AS ?total) WHERE {
  ?p c:typed_in ?c .
  OPTIONAL { ?p c:bonus ?b }
} GROUP BY ?c
"""


def sparql_count_optional(sf_dir: str) -> "ray.data.Dataset":
    """COUNT-over-OPTIONAL gate: ``bonus`` exists only for every third
    part, so COUNT(?b) must skip the unbound (null) left-join rows
    while COUNT(*) counts every solution — pinning the
    ignore-nulls semantics on the Dataset aggregate path."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(OPT_COUNT_QUERY)[0]
    assert q.where.optionals and len(q.aggs) == 2
    return execute_sparql(category_store(sf_dir), q)


def sparql_count_optional_sql() -> str:
    return f"""
SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>' AS c,
       CAST(COUNT(CASE WHEN p_partkey % 3 = 0 THEN 1 END) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS total
FROM part GROUP BY 1
"""


GROUP_CONCAT_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?c (GROUP_CONCAT(?p; SEPARATOR=",") AS ?members)
       (SAMPLE(?p) AS ?first)
WHERE { ?p c:typed_in ?c }
GROUP BY ?c
"""


def sparql_group_concat(sf_dir: str) -> "ray.data.Dataset":
    """GROUP_CONCAT/SAMPLE aggregate gate: per category, the
    comma-joined SORTED member IRIs (deterministic under any block
    layout — the engine sorts inside the group before joining) and the
    deterministic SAMPLE (minimum term). Mirrored by DuckDB
    ``string_agg(... ORDER BY ...)`` / ``min``."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(GROUP_CONCAT_QUERY)[0]
    assert [a.func for a in q.aggs] == ["group_concat", "sample"]
    assert q.aggs[0].sep == ","
    return execute_sparql(category_store(sf_dir), q)


def sparql_group_concat_sql() -> str:
    part_iri = f"'{NSC}part' || CAST(p_partkey AS VARCHAR)"
    return f"""
SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>' AS c,
       string_agg({part_iri}, ',' ORDER BY {part_iri}) AS members,
       MIN({part_iri}) AS first
FROM part GROUP BY 1
"""


HAVING_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?c (COUNT(?p) AS ?n) (SUM(?w) AS ?total)
WHERE { ?p c:typed_in ?c . ?p c:weight ?w }
GROUP BY ?c
HAVING (AVG(?w) > 48)
"""


def sparql_having(sf_dir: str) -> "ray.data.Dataset":
    """HAVING gate over a HIDDEN synthesized aggregate: the constraint
    AVG(?w) > 48 is not in the SELECT list, so the planner computes it
    alongside the visible aggregates and drops it after the filter.
    Integer-valued weights make the float64 averages bit-identical to
    DuckDB's at any combine order, so the strict > splits groups
    identically at every scale."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(HAVING_QUERY)[0]
    assert q.having and q.aggs[-1].hidden
    return execute_sparql(category_store(sf_dir), q)


def sparql_having_sql() -> str:
    w = "CAST((p_partkey * 31) % 97 AS DOUBLE)"
    return f"""
SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>' AS c,
       CAST(COUNT(*) AS BIGINT) AS n, SUM({w}) AS total
FROM part GROUP BY 1 HAVING AVG({w}) > 48
"""


SUBQUERY_MAX_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?c ?m ?w WHERE {
  { SELECT ?c (MAX(?q) AS ?m) WHERE { ?q c:typed_in ?c } GROUP BY ?c }
  ?m c:weight ?w .
}
"""


def sparql_subquery_max(sf_dir: str) -> "ray.data.Dataset":
    """{ SELECT ... } subquery gate: the classic attribute-of-the-
    group-max shape — an inner GROUP BY computes each category's
    maximum member IRI (codepoint order, the SPARQL semantics for
    plain terms), and the OUTER pattern reads that member's weight,
    exercising an aggregate alias flowing into an s-position join."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(SUBQUERY_MAX_QUERY)[0]
    assert len(q.where.subqueries) == 1
    assert q.where.subqueries[0].aggs[0].func == "max"
    return execute_sparql(category_store(sf_dir), q)


def sparql_subquery_max_sql() -> str:
    part_iri = f"'{NSC}part' || CAST(p_partkey AS VARCHAR)"
    return f"""
WITH mx AS (
  SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>' AS c,
         MAX({part_iri}) AS m
  FROM part GROUP BY 1
)
SELECT mx.c AS c, mx.m AS m,
       '"' || CAST((p.p_partkey * 31) % 97 AS VARCHAR) || '"' AS w
FROM mx JOIN part p ON {part_iri.replace("p_partkey", "p.p_partkey")} = mx.m
"""


FILTER_IN_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?c WHERE {
  ?p c:typed_in ?c .
  FILTER(?c IN (c:cat5, c:cat17, c:cat99))
}
"""


def sparql_filter_in(sf_dir: str) -> "ray.data.Dataset":
    """FILTER IN gate: membership against an inline constant list,
    one vectorized ``is_in`` over the o-position term column."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(FILTER_IN_QUERY)[0]
    assert q.where.filters[0].op == "in"
    return execute_sparql(category_store(sf_dir), q)


def sparql_filter_in_sql() -> str:
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>' AS c
FROM part WHERE p_partkey % {N_CATS} + 2 IN (5, 17, 99)
"""


NOT_BOUND_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?w WHERE {
  ?p c:weight ?w .
  OPTIONAL { ?p c:bonus ?b }
  FILTER(!BOUND(?b))
  FILTER(?w NOT IN (5, 11))
}
"""


def sparql_not_bound(sf_dir: str) -> "ray.data.Dataset":
    """!BOUND gate: the SPARQL-1.0 left-join-negation idiom (keep
    rows whose OPTIONAL never matched — parts without a ``bonus``)
    plus a numeric NOT IN over the surviving weights. The !BOUND
    filter must apply AFTER the left join (it references a var bound
    only inside the OPTIONAL)."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(NOT_BOUND_QUERY)[0]
    ops = {f.op for f in q.where.filters}
    assert ops == {"not_bound", "not_in"}
    return execute_sparql(category_store(sf_dir), q)


def sparql_not_bound_sql() -> str:
    w = "(p_partkey * 31) % 97"
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"' || CAST({w} AS VARCHAR) || '"' AS w
FROM part WHERE p_partkey % 3 <> 0 AND {w} NOT IN (5, 11)
"""


BIND_STR_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?u ?l ?n ?tail ?mark WHERE {
  ?p c:typed_in ?c .
  BIND(UCASE(STR(?c)) AS ?u)
  BIND(LCASE(?u) AS ?l)
  BIND(STRLEN(STR(?p)) AS ?n)
  BIND(SUBSTR(STR(?p), 33) AS ?tail)
  BIND(REPLACE(STR(?p), "part", "p-") AS ?mark)
}
"""


def sparql_bind_strfuncs(sf_dir: str) -> "ray.data.Dataset":
    """BIND string-function gate: UCASE/LCASE/STRLEN/SUBSTR/REPLACE
    computed per batch as Arrow kernels, including an alias consumed
    by a later BIND in the same group (?u -> ?l). SUBSTR start 33 is
    1-based: the fixture namespace is 32 chars, so ?tail is the bare
    local name."""
    from ..sparql import execute_sparql, parse_sparql
    assert len(NSC) == 32
    q = parse_sparql(BIND_STR_QUERY)[0]
    assert [b.alias for b in q.where.binds] == \
        ["u", "l", "n", "tail", "mark"]
    return execute_sparql(category_store(sf_dir), q)


def sparql_bind_strfuncs_sql() -> str:
    p = f"'{NSC}part' || CAST(p_partkey AS VARCHAR)"
    c = f"'{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR)"
    return f"""
SELECT {p} AS p,
       UPPER({c}) AS u,
       LOWER(UPPER({c})) AS l,
       CAST(LENGTH({p}) AS VARCHAR) AS n,
       SUBSTR({p}, 33) AS tail,
       REPLACE({p}, 'part', 'p-') AS mark
FROM part
"""


DELETE_BONUS_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
DELETE { ?p c:bonus ?b } WHERE {
  ?p c:bonus ?b .
  FILTER(?b IN ("0", "5"))
}
"""

REMAINING_BONUS_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?b WHERE { ?p c:bonus ?b }
"""


def deleted_category_store(sf_dir: str) -> str:
    """Idempotent copy of the category store with the DELETE applied
    (content-keyed /tmp cache, atomic build — same discipline as the
    other store fixtures)."""
    import glob
    import hashlib
    import os
    import shutil
    src = sorted(glob.glob(os.path.join(sf_dir, "part*.parquet")))
    stamp = ";".join(f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p):.6f}"
                     for p in src)
    key = hashlib.md5(f"delstore1:{os.path.abspath(sf_dir)}:{stamp}"
                      .encode()).hexdigest()[:12]
    store = f"/tmp/kgforge_delstore_{key}"
    marker = os.path.join(store, "_SUCCESS")
    if os.path.exists(marker):
        return store
    from ..sparql import parse_sparql, sparql_delete
    shutil.rmtree(store, ignore_errors=True)
    tmp = store + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(category_store(sf_dir), tmp)
    sparql_delete(tmp, parse_sparql(DELETE_BONUS_QUERY)[0])
    os.replace(tmp, store)
    return store


MODIFY_TIER_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
DELETE { ?p c:bonus ?b }
INSERT { ?p c:tier "high" }
WHERE { ?p c:bonus ?b . FILTER(?b >= 10) }
"""

TIER_READBACK_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?v WHERE { { ?p c:bonus ?v } UNION { ?p c:tier ?v } }
"""


def modified_category_store(sf_dir: str) -> str:
    """Idempotent copy of the category store with the combined
    DELETE/INSERT applied (content-keyed /tmp cache, atomic build)."""
    import glob
    import hashlib
    import os
    import shutil
    src = sorted(glob.glob(os.path.join(sf_dir, "part*.parquet")))
    stamp = ";".join(f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p):.6f}"
                     for p in src)
    key = hashlib.md5(f"modstore1:{os.path.abspath(sf_dir)}:{stamp}"
                      .encode()).hexdigest()[:12]
    store = f"/tmp/kgforge_modstore_{key}"
    marker = os.path.join(store, "_SUCCESS")
    if os.path.exists(marker):
        return store
    from ..sparql import parse_sparql, sparql_modify
    shutil.rmtree(store, ignore_errors=True)
    tmp = store + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.copytree(category_store(sf_dir), tmp)
    sparql_modify(tmp, parse_sparql(MODIFY_TIER_QUERY)[0])
    os.replace(tmp, store)
    return store


def sparql_modify_tier(sf_dir: str) -> "ray.data.Dataset":
    """Combined DELETE/INSERT WHERE gate (SPARQL 1.1 Update §3.1.3):
    one WHERE evaluation feeds both templates — bonus triples with
    value >= 10 are replaced by a ``tier "high"`` assertion in a
    single atomic statement. Readback unions the surviving bonus rows
    with the inserted tier rows; the oracle mirrors both legs over
    the fixture formula."""
    from ..sparql import execute_sparql, parse_sparql
    store = modified_category_store(sf_dir)
    q = parse_sparql(TIER_READBACK_QUERY)[0]
    return execute_sparql(store, q)


def sparql_modify_tier_sql() -> str:
    b = "(p_partkey * 7) % 13"
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"' || CAST({b} AS VARCHAR) || '"' AS v
FROM part WHERE p_partkey % 3 = 0 AND {b} < 10
UNION ALL
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"high"' AS v
FROM part WHERE p_partkey % 3 = 0 AND {b} >= 10
"""


def sparql_delete_bonus(sf_dir: str) -> "ray.data.Dataset":
    """SPARQL-Update DELETE gate: remove the bonus triples whose value
    is "0" or "5" (partition-local anti-join rewrite of ONE p_key
    directory), then read back what survived. The oracle mirrors the
    deletion as a NOT IN predicate over the fixture formula."""
    from ..sparql import execute_sparql, parse_sparql
    store = deleted_category_store(sf_dir)
    q = parse_sparql(REMAINING_BONUS_QUERY)[0]
    return execute_sparql(store, q)


def sparql_delete_bonus_sql() -> str:
    b = "(p_partkey * 7) % 13"
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"' || CAST({b} AS VARCHAR) || '"' AS b
FROM part WHERE p_partkey % 3 = 0 AND {b} NOT IN (0, 5)
"""


COUNT_DISTINCT_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?c (COUNT(DISTINCT ?b) AS ?nb) (COUNT(?b) AS ?n) WHERE {
  ?p c:typed_in ?c .
  OPTIONAL { ?p c:bonus ?b }
} GROUP BY ?c
"""


def sparql_count_distinct(sf_dir: str) -> "ray.data.Dataset":
    """COUNT(DISTINCT) gate: the bonus formula (k*7)%13 repeats
    within a category, so the distinct count diverges from the plain
    count — and the OPTIONAL leaves most rows unbound, pinning the
    skip-nulls semantics on the grouped map_groups path."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(COUNT_DISTINCT_QUERY)[0]
    assert q.aggs[0].distinct and not q.aggs[1].distinct
    return execute_sparql(category_store(sf_dir), q)


def sparql_count_distinct_sql() -> str:
    b = "CASE WHEN p_partkey % 3 = 0 THEN (p_partkey * 7) % 13 END"
    return f"""
SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>' AS c,
       CAST(COUNT(DISTINCT {b}) AS BIGINT) AS nb,
       CAST(COUNT({b}) AS BIGINT) AS n
FROM part GROUP BY 1
"""


COUNT_DISTINCT_GLOBAL_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT (COUNT(DISTINCT ?c) AS ?nc) (COUNT(*) AS ?total)
WHERE { ?p c:typed_in ?c }
"""


def sparql_count_distinct_global(sf_dir: str) -> "ray.data.Dataset":
    """Global (group-key-free) COUNT(DISTINCT): one bucketed distinct
    pass over the counted column — never a driver-side value set."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(COUNT_DISTINCT_GLOBAL_QUERY)[0]
    return execute_sparql(category_store(sf_dir), q)


def sparql_count_distinct_global_sql() -> str:
    return f"""
SELECT CAST(COUNT(DISTINCT p_partkey % {N_CATS}) AS BIGINT) AS nc,
       CAST(COUNT(*) AS BIGINT) AS total
FROM part
"""


XSD_INTEGER_IRI = "http://www.w3.org/2001/XMLSchema#integer"
RDF_LANGSTRING = ("http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                  "langString")
XSD_STRING_IRI = "http://www.w3.org/2001/XMLSchema#string"


def labeled_triples(sf_dir: str) -> "ray.data.Dataset":
    """Mixed-form literal fixture: per part k one ``label`` triple
    whose rendering cycles on k%5 — "name{k}"@fr (0), "name{k}"@en
    (1, 2), plain "name{k}" (3), "{k}"^^xsd:integer (4) — the shapes
    external Turtle brings in, exercising LANG/DATATYPE/STR."""
    from ..sources.readers import read_table

    ds = read_table(sf_dir, "part", columns=["p_partkey"])

    def build(b: pa.Table) -> pa.Table:
        keys = (b["p_partkey"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        s = pa.array([f"{NSC}part{k}" for k in keys], pa.string())

        def render(k: int) -> str:
            m = k % 5
            if m == 0:
                return f'"name{k}"@fr'
            if m in (1, 2):
                return f'"name{k}"@en'
            if m == 3:
                return f'"name{k}"'
            return f'"{k}"^^<{XSD_INTEGER_IRI}>'

        return pa.table({
            "s": s,
            "p": pa.array([NSC + "label"] * len(keys), pa.string()),
            "o": pa.array([render(int(k)) for k in keys], pa.string()),
        })

    return ds.map_batches(build, batch_format="pyarrow")


def labeled_store(sf_dir: str) -> str:
    """Idempotent store of the mixed-literal fixture (content-keyed
    /tmp cache, atomic build)."""
    import glob
    import hashlib
    import os
    import shutil
    src = sorted(glob.glob(os.path.join(sf_dir, "part*.parquet")))
    stamp = ";".join(f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p):.6f}"
                     for p in src)
    key = hashlib.md5(f"lblstore1:{os.path.abspath(sf_dir)}:{stamp}"
                      .encode()).hexdigest()[:12]
    store = f"/tmp/kgforge_lblstore_{key}"
    marker = os.path.join(store, "_SUCCESS")
    if os.path.exists(marker):
        return store
    shutil.rmtree(store, ignore_errors=True)
    tmp = store + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    from ..sinks.ntriples_sink import write_graph_partitioned
    os.makedirs(tmp, exist_ok=True)
    write_graph_partitioned(labeled_triples(sf_dir), tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    os.replace(tmp, store)
    return store


LANG_FILTER_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?lab WHERE {
  ?p c:label ?lab .
  BIND(LANG(?lab) AS ?lg)
  FILTER(?lg = "fr")
}
"""


def sparql_lang_filter(sf_dir: str) -> "ray.data.Dataset":
    """LANG gate: langtag extraction composed with FILTER through the
    BIND alias — keep only the French labels."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(LANG_FILTER_QUERY)[0]
    return execute_sparql(labeled_store(sf_dir), q)


def sparql_lang_filter_sql() -> str:
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"name' || CAST(p_partkey AS VARCHAR) || '"@fr' AS lab
FROM part WHERE p_partkey % 5 = 0
"""


DATATYPE_HIST_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?d (COUNT(*) AS ?n) WHERE {
  ?p c:label ?lab .
  BIND(DATATYPE(?lab) AS ?d)
} GROUP BY ?d
"""


def sparql_datatype_histogram(sf_dir: str) -> "ray.data.Dataset":
    """DATATYPE gate: grouped histogram over the derived datatype —
    rdf:langString for @-tagged labels, xsd:string for plain ones,
    the declared IRI for typed ones."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(DATATYPE_HIST_QUERY)[0]
    return execute_sparql(labeled_store(sf_dir), q)


def sparql_datatype_histogram_sql() -> str:
    return f"""
SELECT CASE
         WHEN p_partkey % 5 <= 2 THEN '<{RDF_LANGSTRING}>'
         WHEN p_partkey % 5 = 3 THEN '<{XSD_STRING_IRI}>'
         ELSE '<{XSD_INTEGER_IRI}>'
       END AS d,
       CAST(COUNT(*) AS BIGINT) AS n
FROM part GROUP BY 1
"""


FILTER_OR_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?w WHERE {
  ?p c:weight ?w .
  FILTER(?w < 10 || ?w > 90)
}
"""


def sparql_filter_or(sf_dir: str) -> "ray.data.Dataset":
    """|| gate: one FILTER keeps the tails of the weight range."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(FILTER_OR_QUERY)[0]
    assert q.where.filters[0].op == "or"
    return execute_sparql(category_store(sf_dir), q)


def sparql_filter_or_sql() -> str:
    w = "(p_partkey * 31) % 97"
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"' || CAST({w} AS VARCHAR) || '"' AS w
FROM part WHERE {w} < 10 OR {w} > 90
"""


COALESCE_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?v WHERE {
  ?p c:weight ?w .
  OPTIONAL { ?p c:bonus ?b }
  BIND(COALESCE(?b, "none") AS ?v)
}
"""


def sparql_coalesce_default(sf_dir: str) -> "ray.data.Dataset":
    """COALESCE gate: the OPTIONAL-default idiom over the sparse
    bonus predicate."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(COALESCE_QUERY)[0]
    return execute_sparql(category_store(sf_dir), q)


def sparql_coalesce_default_sql() -> str:
    b = "(p_partkey * 7) % 13"
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       CASE WHEN p_partkey % 3 = 0
            THEN '"' || CAST({b} AS VARCHAR) || '"'
            ELSE '"none"' END AS v
FROM part
"""


def _version_pairs(sf_dir: str, version: int) -> "ray.data.Dataset":
    """(x, z) instance pairs of one version of the scaled fixture —
    x raw IRI, z term form, same shapes as the MINUS gate."""
    from ..sources.readers import read_table
    ds = read_table(sf_dir, "part", columns=["p_partkey", "p_size"])

    def build(b: pa.Table, v=version) -> pa.Table:
        k = b["p_partkey"].combine_chunks().cast(pa.string())
        keys = (b["p_partkey"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        size = (b["p_size"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        x = pc.binary_join_element_wise(pa.scalar(NS1 + "part"), k, "")
        z1 = pa.array([f"<{NS1}sz{s}>" for s in size], pa.string())
        if v == 1:
            return pa.table({"x": x, "z": z1})
        z2 = pa.array([f"<{NS1}sz{(s * 7) % 50 + 1}>" for s in size],
                      pa.string())
        even = pa.array(keys % 2 == 0)
        t1 = pa.table({"x": x, "z": z1}).filter(even)
        return pa.concat_tables([t1, pa.table({"x": x, "z": z2})])

    return ds.map_batches(build, batch_format="pyarrow")


def kg_snapshot_delta(sf_dir: str) -> "ray.data.Dataset":
    """Gate: bidirectional graph diff v1 -> v2 of the versioned fixture
    (generalizes the reference's one-directional versioning MINUS into
    the incremental-maintenance primitive)."""
    from ..ops.graph import graph_delta
    return graph_delta(_version_pairs(sf_dir, 1), _version_pairs(sf_dir, 2),
                       ["x", "z"])


def kg_snapshot_delta_sql() -> str:
    part_s = f"'{NS1}part' || CAST(p_partkey AS VARCHAR)"
    z1 = f"'<{NS1}sz' || CAST(p_size AS VARCHAR) || '>'"
    z2 = f"'<{NS1}sz' || CAST((p_size * 7) % 50 + 1 AS VARCHAR) || '>'"
    return f"""
WITH v1 AS (SELECT DISTINCT {part_s} AS x, {z1} AS z FROM part),
v2 AS (
  SELECT DISTINCT x, z FROM (
    SELECT {part_s} AS x, {z1} AS z FROM part WHERE p_partkey % 2 = 0
    UNION ALL
    SELECT {part_s} AS x, {z2} AS z FROM part
  )
)
SELECT x, z, 'added' AS change FROM (SELECT x, z FROM v2 EXCEPT SELECT x, z FROM v1)
UNION ALL
SELECT x, z, 'removed' AS change FROM (SELECT x, z FROM v1 EXCEPT SELECT x, z FROM v2)
"""


ASOF_DATE = "1995-06-30"


def kg_as_of_status(sf_dir: str, as_of: str = ASOF_DATE
                    ) -> "ray.data.Dataset":
    """Temporal-KG point-in-time query: each customer's latest asserted
    status triple VALID AT `as_of` — assertions are (customer, status)
    facts valid from their order date; the winner per subject is the
    max (valid_from, o_orderkey) at or before the cut. Runs as the
    grouped-top-1 primitive (per-batch combiner, ONE subject-bucket
    shuffle); term-form output."""
    import numpy as np
    import pyarrow.compute as pc2
    from ..ops.relational import grouped_topk_rows
    from ..sources.readers import read_table
    orders = read_table(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_orderstatus",
                 "o_orderdate"])

    def prep(b: pa.Table) -> pa.Table:
        d = b["o_orderdate"].combine_chunks()
        ds32 = d.cast(pa.date32()).cast(pa.int32()).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keys = (b["o_orderkey"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        import datetime
        keep = pc2.less_equal(
            d.cast(pa.date32()),
            pa.scalar(datetime.date.fromisoformat(as_of), pa.date32()))
        t = pa.table({
            "o_custkey": b["o_custkey"].combine_chunks().cast(pa.int64()),
            "o_orderstatus": b["o_orderstatus"].combine_chunks()
            .cast(pa.string()),
            "valid_from": d.cast(pa.date32()).cast(pa.string()),
            "pack": pa.array(ds32 * (1 << 32) + keys, pa.int64())})
        return t.filter(keep)

    top = grouped_topk_rows(
        orders.map_batches(prep, batch_format="pyarrow"),
        "o_custkey", "pack", 1)

    def term_form(b: pa.Table) -> pa.Table:
        c = b["o_custkey"].combine_chunks().cast(pa.string())
        s = pa.compute.binary_join_element_wise(
            pa.scalar(NS1 + "customer"), c, "")
        o = b["o_orderstatus"].combine_chunks().cast(pa.string())
        return pa.table({
            "s": s,
            "p": pa.array([NS1 + "last_status"] * b.num_rows,
                          pa.string()),
            "o": o,
            "valid_from": b["valid_from"].combine_chunks()
            .cast(pa.string())})

    return top.map_batches(term_form, batch_format="pyarrow")


def kg_as_of_status_sql(as_of: str = ASOF_DATE) -> str:
    return f"""
SELECT '{NS1}customer' || CAST(o_custkey AS VARCHAR) AS s,
       '{NS1}last_status' AS p,
       o_orderstatus AS o,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS valid_from
FROM (
  SELECT o_custkey, o_orderstatus, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC)
             AS rn
  FROM orders WHERE o_orderdate <= DATE '{as_of}'
) WHERE rn = 1
"""


OPTIONAL_QUERY_TEXT = f"""
PREFIX ns1v1: <{NS1V1}>
PREFIX ns1v2: <{NS1V2}>
SELECT ?x ?a ?w WHERE {{
  ?x ns1v1:applicable_to ?a .
  OPTIONAL {{ ?x ns1v2:applicable_to ?a . ?x ns1v1:applicable_to ?w }}
}}
"""


def sparql_optional_v2(sf_dir: str) -> "ray.data.Dataset":
    """OPTIONAL (left-join) gate over the versioned store: each v1
    assertion plus a witness variable bound only when the SAME (x, a)
    pair is still asserted at v2 — null (rendered '' — engine
    fill_null == oracle COALESCE) for the pairs v2 dropped. Odd part
    keys are uncarried by fixture construction, so the unbound path is
    exercised on every scale (checked in tests)."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(OPTIONAL_QUERY_TEXT)[0]
    assert q.where.optionals, "query must carry an OPTIONAL group"
    out = execute_sparql(versioned_store(sf_dir), q)

    def fill(b: pa.Table) -> pa.Table:
        t = b["w"].combine_chunks().cast(pa.string())
        return b.set_column(b.schema.get_field_index("w"), "w",
                            pc.fill_null(t, ""))

    return out.map_batches(fill, batch_format="pyarrow")


def sparql_optional_v2_sql() -> str:
    part_s = f"'{NS1}part' || CAST(p_partkey AS VARCHAR)"
    z1 = f"'<{NS1}sz' || CAST(p_size AS VARCHAR) || '>'"
    z2 = f"'<{NS1}sz' || CAST((p_size * 7) % 50 + 1 AS VARCHAR) || '>'"
    return f"""
WITH v1 AS (SELECT {part_s} AS x, {z1} AS a FROM part),
v2 AS (
  SELECT {part_s} AS x, {z1} AS a FROM part WHERE p_partkey % 2 = 0
  UNION ALL
  SELECT {part_s} AS x, {z2} AS a FROM part
),
opt AS (
  SELECT v2.x, v2.a, v1b.a AS w
  FROM v2 JOIN v1 v1b ON v1b.x = v2.x
)
SELECT m.x, m.a, COALESCE(o.w, '') AS w
FROM v1 m LEFT JOIN opt o ON o.x = m.x AND o.a = m.a
"""


UNION_QUERY_TEXT = f"""
PREFIX ns1v1: <{NS1V1}>
PREFIX ns1v2: <{NS1V2}>
SELECT ?x ?a WHERE {{
  {{ ?x ns1v1:applicable_to ?a }} UNION {{ ?x ns1v2:applicable_to ?a }}
}}
"""


def sparql_union_versions(sf_dir: str) -> "ray.data.Dataset":
    """UNION gate: all assertions across BOTH property versions — bag
    semantics (carried pairs appear twice, once per arm), matching
    SPARQL UNION and the SQL UNION ALL mirror."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(UNION_QUERY_TEXT)[0]
    assert q.where.unions and len(q.where.unions[0]) == 2
    return execute_sparql(versioned_store(sf_dir), q)


def sparql_union_versions_sql() -> str:
    part_s = f"'{NS1}part' || CAST(p_partkey AS VARCHAR)"
    z1 = f"'<{NS1}sz' || CAST(p_size AS VARCHAR) || '>'"
    z2 = f"'<{NS1}sz' || CAST((p_size * 7) % 50 + 1 AS VARCHAR) || '>'"
    return f"""
SELECT {part_s} AS x, {z1} AS a FROM part
UNION ALL
SELECT {part_s} AS x, {z1} AS a FROM part WHERE p_partkey % 2 = 0
UNION ALL
SELECT {part_s} AS x, {z2} AS a FROM part
"""


# ------------------------------------------------- session-3 builtins

IF_TIERS_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?t (COUNT(*) AS ?n) WHERE {
  ?p c:weight ?w .
  BIND(IF(?w < 50, "light", "heavy") AS ?t)
} GROUP BY ?t
"""


def sparql_if_tiers(sf_dir: str) -> "ray.data.Dataset":
    """IF() gate: conditional BIND feeding a grouped count."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(IF_TIERS_QUERY)[0]
    return execute_sparql(category_store(sf_dir), q)


def sparql_if_tiers_sql() -> str:
    w = "(p_partkey * 31) % 97"
    return f"""
SELECT CASE WHEN {w} < 50 THEN '"light"' ELSE '"heavy"' END AS t,
       CAST(COUNT(*) AS BIGINT) AS n
FROM part GROUP BY 1
"""


ARITH_ROUND_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?a ?f ?r WHERE {
  ?p c:weight ?w . FILTER(?w >= 90)
  BIND(ABS(?w - 50) AS ?a)
  BIND(FLOOR(?w / 7) AS ?f)
  BIND(ROUND(?w / 7) AS ?r)
}
"""


def sparql_arith_round(sf_dir: str) -> "ray.data.Dataset":
    """Numeric-BIND gate: arithmetic with ABS/FLOOR/ROUND (integral
    results render as bare integer lexicals). w/7 never lands on an
    exact .5, so DuckDB's half-away-from-zero ROUND agrees with the
    engine's xsd half-up on this domain; the divergent negative-half
    edge is pinned in tests/test_sparql_builtins.py instead."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(ARITH_ROUND_QUERY)[0]
    return execute_sparql(category_store(sf_dir), q)


def sparql_arith_round_sql() -> str:
    w = "(p_partkey * 31) % 97"
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       CAST(CAST(ABS({w} - 50) AS BIGINT) AS VARCHAR) AS a,
       CAST(CAST(FLOOR({w} / 7.0) AS BIGINT) AS VARCHAR) AS f,
       CAST(CAST(ROUND({w} / 7.0) AS BIGINT) AS VARCHAR) AS r
FROM part WHERE {w} >= 90
"""


STRBEFORE_AFTER_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?b ?a WHERE {
  ?p c:label ?lab .
  BIND(STRBEFORE(STR(?lab), "ame") AS ?b)
  BIND(STRAFTER(STR(?lab), "name") AS ?a)
}
"""


def sparql_strbefore_after(sf_dir: str) -> "ray.data.Dataset":
    """STRBEFORE/STRAFTER gate over the mixed-literal fixture: the
    integer-typed labels (k%5==4) have no separator -> '' per spec."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(STRBEFORE_AFTER_QUERY)[0]
    return execute_sparql(labeled_store(sf_dir), q)


def sparql_strbefore_after_sql() -> str:
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       CASE WHEN p_partkey % 5 <= 3 THEN 'n' ELSE '' END AS b,
       CASE WHEN p_partkey % 5 <= 3
            THEN CAST(p_partkey AS VARCHAR) ELSE '' END AS a
FROM part
"""


ISNUMERIC_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?lab WHERE {
  ?p c:label ?lab .
  FILTER(isNumeric(?lab))
}
"""


def sparql_isnumeric(sf_dir: str) -> "ray.data.Dataset":
    """isNumeric gate: only the xsd:integer-typed labels (their
    lexical form parses numerically) survive."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(ISNUMERIC_QUERY)[0]
    return execute_sparql(labeled_store(sf_dir), q)


def sparql_isnumeric_sql() -> str:
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"' || CAST(p_partkey AS VARCHAR) || '"^^<{XSD_INTEGER_IRI}>'
         AS lab
FROM part WHERE p_partkey % 5 = 4
"""


LANGMATCHES_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p WHERE {
  ?p c:label ?lab .
  FILTER(langMatches(LANG(?lab), "EN"))
}
"""


def sparql_langmatches(sf_dir: str) -> "ray.data.Dataset":
    """langMatches gate: case-insensitive basic range match keeps the
    @en labels (k%5 in 1,2) and drops @fr / plain / typed ones."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(LANGMATCHES_QUERY)[0]
    return execute_sparql(labeled_store(sf_dir), q)


def sparql_langmatches_sql() -> str:
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p
FROM part WHERE p_partkey % 5 IN (1, 2)
"""


NEGATED_PATH_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?s ?o WHERE {
  ?s !(c:typed_in|c:subCategoryOf|c:bonus) ?o
}
"""


def sparql_negated_path(sf_dir: str) -> "ray.data.Dataset":
    """Negated-property-set gate: everything EXCEPT three of the five
    predicates -> exactly the weight and cap measure triples."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(NEGATED_PATH_QUERY)[0]
    return execute_sparql(category_store(sf_dir), q)


def sparql_negated_path_sql() -> str:
    part_s = f"'{NSC}part' || CAST(p_partkey AS VARCHAR)"
    return f"""
SELECT {part_s} AS s,
       '"' || CAST((p_partkey * 31) % 97 AS VARCHAR) || '"' AS o
FROM part
UNION ALL
SELECT {part_s} AS s,
       '"' || CAST((p_partkey * 17) % 89 AS VARCHAR) || '"' AS o
FROM part
"""


INV_NEGATED_PATH_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?x ?y WHERE {
  ?x !(c:subCategoryOf|^c:weight|^c:cap|^c:bonus|^c:subCategoryOf) ?y
}
"""


def sparql_inv_negated_path(sf_dir: str) -> "ray.data.Dataset":
    """Negated property set with INVERSE members (§9.1 full NPS): the
    forward leg excludes subCategoryOf only (typed_in + the three
    measures survive), the inverse leg excludes everything except
    typed_in (reversed typed_in edges survive). Exercises the two-scan
    union rewrite and the representation crossing it forces (?x binds
    raw subjects on the forward leg and o-terms on the inverse one, so
    both legs surface in ?x's canonical term form)."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(INV_NEGATED_PATH_QUERY)[0]
    assert len(q.where.unions) == 1 and len(q.where.unions[0]) == 2
    return execute_sparql(category_store(sf_dir), q)


def sparql_inv_negated_path_sql() -> str:
    part_s = f"'<{NSC}part' || CAST(p_partkey AS VARCHAR) || '>'"
    cat_o = (f"'<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 "
             f"AS VARCHAR) || '>'")
    return f"""
SELECT {part_s} AS x, {cat_o} AS y FROM part
UNION ALL
SELECT {part_s} AS x,
       '"' || CAST((p_partkey * 31) % 97 AS VARCHAR) || '"' AS y
FROM part
UNION ALL
SELECT {part_s} AS x,
       '"' || CAST((p_partkey * 17) % 89 AS VARCHAR) || '"' AS y
FROM part
UNION ALL
SELECT {part_s} AS x,
       '"' || CAST((p_partkey * 7) % 13 AS VARCHAR) || '"' AS y
FROM part WHERE p_partkey % 3 = 0
UNION ALL
SELECT {cat_o} AS x, {part_s} AS y FROM part
"""


SAMETERM_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?w WHERE {
  ?p c:weight ?w .
  ?p c:cap ?c .
  FILTER(sameTerm(?w, ?c))
}
"""


def sparql_sameterm(sf_dir: str) -> "ray.data.Dataset":
    """sameTerm gate: parts whose weight and cap literals are the
    IDENTICAL term (equal lexical integers)."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(SAMETERM_QUERY)[0]
    return execute_sparql(category_store(sf_dir), q)


def sparql_sameterm_sql() -> str:
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"' || CAST((p_partkey * 31) % 97 AS VARCHAR) || '"' AS w
FROM part WHERE (p_partkey * 31) % 97 = (p_partkey * 17) % 89
"""


ORDER_NUMERIC_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?w WHERE {
  ?p c:weight ?w .
} ORDER BY DESC(?w) ?p LIMIT 50
"""


def sparql_order_numeric(sf_dir: str) -> "ray.data.Dataset":
    """Numeric ORDER BY gate: weights are integer literals — SPARQL
    orders them by VALUE ("9" < "10"), so the top-50 page differs
    from a lexical sort; ?p ascending breaks weight ties, making the
    page deterministic."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(ORDER_NUMERIC_QUERY)[0]
    assert q.order_by == [("w", True), ("p", False)]
    return execute_sparql(category_store(sf_dir), q)


def sparql_order_numeric_sql() -> str:
    w = "(p_partkey * 31) % 97"
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"' || CAST({w} AS VARCHAR) || '"' AS w
FROM part
ORDER BY {w} DESC, '{NSC}part' || CAST(p_partkey AS VARCHAR) ASC
LIMIT 50
"""


SUM_EXPR_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?cat (SUM(?wc) AS ?total) (COUNT(*) AS ?n) WHERE {
  ?p c:typed_in ?cat .
  ?p c:weight ?w .
  ?p c:cap ?c .
  BIND(?w * ?c AS ?wc)
} GROUP BY ?cat
"""


def sparql_sum_expr(sf_dir: str) -> "ray.data.Dataset":
    """Aggregate-over-expression gate: SUM of a BIND-computed product
    (the SPARQL idiom for SUM(?w * ?c)) grouped by category — the
    computed alias flows from the BIND stage into the aggregate plan.
    Products are integers < 97*89, so float64 sums are bit-exact
    under any combine order."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(SUM_EXPR_QUERY)[0]
    return execute_sparql(category_store(sf_dir), q)


def sparql_sum_expr_sql() -> str:
    wc = ("CAST((p_partkey * 31) % 97 AS DOUBLE) * "
          "CAST((p_partkey * 17) % 89 AS DOUBLE)")
    return f"""
SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>'
         AS cat,
       SUM({wc}) AS total,
       CAST(COUNT(*) AS BIGINT) AS n
FROM part GROUP BY 1
"""


AGG_INLINE_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?cat (SUM(?w * ?c) AS ?total) (AVG(?w + ?c) AS ?mean) WHERE {
  ?p c:typed_in ?cat .
  ?p c:weight ?w .
  ?p c:cap ?c .
} GROUP BY ?cat
"""


def sparql_agg_inline(sf_dir: str) -> "ray.data.Dataset":
    """Inline aggregate-expression gate (spec §18.4 evaluation order):
    ``SUM(?w * ?c)`` / ``AVG(?w + ?c)`` with no explicit BIND — the
    parser desugars each argument into a hidden per-solution BIND
    appended to the WHERE group and aggregates the hidden alias.
    Same bit-exactness argument as sparql_sum_expr (integer-valued
    products < 97*89 sum exactly in float64)."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(AGG_INLINE_QUERY)[0]
    assert {a.var for a in q.aggs} == {"_aggexpr0", "_aggexpr1"}
    assert len(q.where.binds) == 2
    return execute_sparql(category_store(sf_dir), q)


def sparql_agg_inline_sql() -> str:
    w = "CAST((p_partkey * 31) % 97 AS DOUBLE)"
    c = "CAST((p_partkey * 17) % 89 AS DOUBLE)"
    return f"""
SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>'
         AS cat,
       SUM({w} * {c}) AS total,
       AVG({w} + {c}) AS mean
FROM part GROUP BY 1
"""


NSD = "https://kgforge.example.org/ord/"


def date_triples(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic dateTime fixture over the orders table: per order
    k one ``ord_k placed "<o_orderdate>T<hh>:<mm>:<ss>"`` literal with
    the time-of-day derived from the key (hh = k%24, mm = (k*7)%60,
    ss = (k*13)%60 — every accessor field varies) plus one plain
    ``ref "O<k>"`` literal for the hash-function gates."""
    import pyarrow.compute as pc

    from ..sources.readers import read_table
    ds = read_table(sf_dir, "orders",
                    columns=["o_orderkey", "o_orderdate"])

    def build(b: pa.Table) -> pa.Table:
        keys = (b["o_orderkey"].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        dates = pc.strftime(
            b["o_orderdate"].combine_chunks().cast(pa.timestamp("s")),
            format="%Y-%m-%d").to_pylist()
        n = len(keys)
        s = pa.array([f"{NSD}ord{k}" for k in keys], pa.string())
        placed = pa.array(
            [f'"{d}T{k % 24:02d}:{(k * 7) % 60:02d}'
             f':{(k * 13) % 60:02d}"'
             for k, d in zip(keys, dates)], pa.string())
        ref = pa.array([f'"O{k}"' for k in keys], pa.string())
        return pa.concat_tables([
            pa.table({"s": s,
                      "p": pa.array([NSD + "placed"] * n, pa.string()),
                      "o": placed}),
            pa.table({"s": s,
                      "p": pa.array([NSD + "ref"] * n, pa.string()),
                      "o": ref}),
        ])

    return ds.map_batches(build, batch_format="pyarrow")


def date_store(sf_dir: str) -> str:
    """Idempotent predicate-partitioned store of the dateTime fixture
    (content-keyed /tmp cache, atomic build)."""
    import glob
    import hashlib
    import os
    import shutil
    src = sorted(glob.glob(os.path.join(sf_dir, "orders*.parquet")))
    stamp = ";".join(f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p):.6f}"
                     for p in src)
    key = hashlib.md5(f"datestore1:{os.path.abspath(sf_dir)}:{stamp}"
                      .encode()).hexdigest()[:12]
    store = f"/tmp/kgforge_datestore_{key}"
    marker = os.path.join(store, "_SUCCESS")
    if os.path.exists(marker):
        return store
    shutil.rmtree(store, ignore_errors=True)
    tmp = store + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    from ..sinks.ntriples_sink import write_graph_partitioned
    os.makedirs(tmp, exist_ok=True)
    write_graph_partitioned(date_triples(sf_dir), tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    os.replace(tmp, store)
    return store


DATETIME_QUERY = """
PREFIX d: <https://kgforge.example.org/ord/>
SELECT ?y ?m (COUNT(*) AS ?n) (SUM(HOURS(?t)) AS ?sh) WHERE {
  ?o d:placed ?t .
  BIND(YEAR(?t) AS ?y)
  BIND(MONTH(?t) AS ?m)
  FILTER(DAY(?t) <= 15)
} GROUP BY ?y ?m
"""


def sparql_datetime_parts(sf_dir: str) -> "ray.data.Dataset":
    """xsd:dateTime accessor gate: YEAR/MONTH group keys, a DAY
    filter, and an inline SUM over HOURS — all six accessors are
    regex-extracted from the literal's lexical form per batch (the
    spec reads the literal's own clock time; no calendar library)."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(DATETIME_QUERY)[0]
    return execute_sparql(date_store(sf_dir), q)


def sparql_datetime_parts_sql() -> str:
    return """
SELECT CAST(year(o_orderdate) AS VARCHAR) AS y,
       CAST(month(o_orderdate) AS VARCHAR) AS m,
       CAST(COUNT(*) AS BIGINT) AS n,
       SUM(CAST(o_orderkey % 24 AS DOUBLE)) AS sh
FROM orders WHERE day(o_orderdate) <= 15
GROUP BY 1, 2
"""


HASH_QUERY = """
PREFIX d: <https://kgforge.example.org/ord/>
SELECT ?o ?h5 ?h256 WHERE {
  ?o d:ref ?r .
  BIND(MD5(?r) AS ?h5)
  BIND(SHA256(?r) AS ?h256)
}
"""


def sparql_hash_funcs(sf_dir: str) -> "ray.data.Dataset":
    """MD5/SHA256 BIND gate: hex digests of the UTF-8 STR form,
    computed once per distinct value via dictionary encoding (SHA1/
    384/512 share the code path and are pinned in pytest — DuckDB
    only mirrors md5/sha256)."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(HASH_QUERY)[0]
    return execute_sparql(date_store(sf_dir), q)


def sparql_hash_funcs_sql() -> str:
    return f"""
SELECT '{NSD}ord' || CAST(o_orderkey AS VARCHAR) AS o,
       md5('O' || CAST(o_orderkey AS VARCHAR)) AS h5,
       sha256('O' || CAST(o_orderkey AS VARCHAR)) AS h256
FROM orders
"""


STRENDS_QUERY = """
PREFIX d: <https://kgforge.example.org/ord/>
SELECT ?o WHERE {
  ?o d:ref ?r .
  FILTER(STRENDS(STR(?r), "5"))
}
"""


def sparql_strends_filter(sf_dir: str) -> "ray.data.Dataset":
    """STRENDS FILTER gate: suffix match on the STR form (orders
    whose key's decimal rendering ends in 5)."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(STRENDS_QUERY)[0]
    return execute_sparql(date_store(sf_dir), q)


def sparql_strends_filter_sql() -> str:
    return f"""
SELECT '{NSD}ord' || CAST(o_orderkey AS VARCHAR) AS o
FROM orders WHERE CAST(o_orderkey AS VARCHAR) LIKE '%5'
"""


IRI_MINT_QUERY = """
PREFIX d: <https://kgforge.example.org/ord/>
SELECT ?o ?u WHERE {
  ?o d:ref ?r .
  BIND(IRI(CONCAT("https://kgforge.example.org/ref/", ?r)) AS ?u)
}
"""


def sparql_iri_mint(sf_dir: str) -> "ray.data.Dataset":
    """IRI()/URI() constructor gate: mint a new IRI from CONCAT over
    a literal's STR form — the KG-construction idiom. The alias
    surfaces in raw-IRI representation (no angle brackets), mirrored
    by plain string concatenation in SQL."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(IRI_MINT_QUERY)[0]
    return execute_sparql(date_store(sf_dir), q)


def sparql_iri_mint_sql() -> str:
    return f"""
SELECT '{NSD}ord' || CAST(o_orderkey AS VARCHAR) AS o,
       'https://kgforge.example.org/ref/O'
           || CAST(o_orderkey AS VARCHAR) AS u
FROM orders
"""


GROUP_CONCAT_DISTINCT_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?cat (GROUP_CONCAT(DISTINCT ?b; SEPARATOR=",") AS ?bs)
       (COUNT(?b) AS ?n) WHERE {
  ?p c:typed_in ?cat .
  ?p c:bonus ?b .
} GROUP BY ?cat
"""


def sparql_group_concat_distinct(sf_dir: str) -> "ray.data.Dataset":
    """GROUP_CONCAT(DISTINCT) gate: bonus values repeat within a
    category once the part range spans 1560 keys (k and k+1560 share
    cat AND bonus), so at sf>=0.01 the distinct pass is load-bearing;
    COUNT(?b) keeps the pre-distinct cardinality visible."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(GROUP_CONCAT_DISTINCT_QUERY)[0]
    assert q.aggs[0].distinct
    return execute_sparql(category_store(sf_dir), q)


def sparql_group_concat_distinct_sql() -> str:
    b = "'\"' || CAST((p_partkey * 7) % 13 AS VARCHAR) || '\"'"
    return f"""
SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>'
         AS cat,
       string_agg(DISTINCT {b}, ',' ORDER BY {b}) AS bs,
       CAST(COUNT(*) AS BIGINT) AS n
FROM part WHERE p_partkey % 3 = 0
GROUP BY 1
"""


SELECT_EXPR_QUERY = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p (?w + ?c AS ?t) (IF(?w > ?c, "w", "c") AS ?hi) WHERE {
  ?p c:weight ?w .
  ?p c:cap ?c .
  FILTER(?w >= 80)
}
"""


def sparql_select_expr(sf_dir: str) -> "ray.data.Dataset":
    """SELECT-expression gate: projection expressions (arithmetic and
    IF over two bound vars) evaluate per solution — the 1.1 shorthand
    for a trailing BIND."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(SELECT_EXPR_QUERY)[0]
    return execute_sparql(category_store(sf_dir), q)


def sparql_select_expr_sql() -> str:
    w = "(p_partkey * 31) % 97"
    c = "(p_partkey * 17) % 89"
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       CAST({w} + {c} AS VARCHAR) AS t,
       CASE WHEN {w} > {c} THEN '"w"' ELSE '"c"' END AS hi
FROM part WHERE {w} >= 80
"""


SEQGROUP_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT DISTINCT ?p ?a WHERE {
  ?p c:typed_in ?c .
  ?c (c:subCategoryOf/c:subCategoryOf)+ ?a
}
"""


def sparql_seqgroup_path(sf_dir: str) -> "ray.data.Dataset":
    """Modified sequence-group path gate: ``(sub/sub)+`` — the closure
    runs over the COMPOSED two-hop edge relation (kgforge.sparql
    SeqSet: one o->s join per hop, then ops.graph.transitive_pairs),
    i.e. ancestors at even depths only."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(SEQGROUP_QUERY_TEXT)[0]
    assert q.where.patterns[1].path == "+"
    return execute_sparql(category_store(sf_dir), q)


def sparql_seqgroup_path_sql() -> str:
    return f"""
WITH RECURSIVE
inst AS (SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
                CAST(p_partkey % {N_CATS} + 2 AS BIGINT) AS ck FROM part),
walk2(node, anc) AS (
  -- composed 2-hop edge (n, n//4): needs the intermediate n//2 to
  -- have an outgoing edge, i.e. n >= 4
  SELECT CAST(range AS BIGINT), CAST(range // 4 AS BIGINT)
  FROM range(4, {N_CATS + 2})
  UNION ALL
  SELECT w.node, w.anc // 4 FROM walk2 w WHERE w.anc >= 4
),
pairs AS (SELECT DISTINCT node, anc FROM walk2)
SELECT DISTINCT inst.p AS p,
       '<{NSC}cat' || CAST(pairs.anc AS VARCHAR) || '>' AS a
FROM inst JOIN pairs ON pairs.node = inst.ck
"""


UCASE_EQ_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?w WHERE {
  ?p c:typed_in ?cat . ?p c:weight ?w .
  FILTER(UCASE(STR(?cat)) =
         UCASE(CONCAT("https://kgforge.example.org/cat/cat", "5")))
}
"""


def sparql_ucase_concat_eq(sf_dir: str) -> "ray.data.Dataset":
    """Term-identity FILTER over string-function sides: both sides of
    the ``=`` are string-producing expressions, so the comparison runs
    in rendered-term space (``term_cmp``) — the numeric-coercion path
    would silently eliminate every row."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(UCASE_EQ_QUERY_TEXT)[0]
    assert q.where.filters[0].op == "term_cmp"
    return execute_sparql(category_store(sf_dir), q)


def sparql_ucase_concat_eq_sql() -> str:
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"' || CAST((p_partkey * 31) % 97 AS VARCHAR) || '"' AS w
FROM part WHERE (p_partkey % {N_CATS} + 2) = 5
"""


IRI_EQ_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?cat ?w WHERE {
  ?p c:typed_in ?cat . ?p c:weight ?w .
  FILTER(?p = IRI(CONCAT("https://kgforge.example.org/cat/part", "7")))
}
"""


def sparql_iri_constructor_eq(sf_dir: str) -> "ray.data.Dataset":
    """IRI()/URI() constructor in a FILTER: the constructed side lives
    in raw-IRI space and must align with the s-position variable's
    representation class (both sides wrap to rendered-term form)."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(IRI_EQ_QUERY_TEXT)[0]
    assert q.where.filters[0].op == "term_cmp"
    return execute_sparql(category_store(sf_dir), q)


def sparql_iri_constructor_eq_sql() -> str:
    return f"""
SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>'
         AS cat,
       '"' || CAST((p_partkey * 31) % 97 AS VARCHAR) || '"' AS w
FROM part WHERE p_partkey = 7
"""


UNION_DISJOINT_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?w ?b WHERE {
  { ?p c:weight ?w } UNION { ?p c:bonus ?b }
}
"""


def sparql_union_disjoint(sf_dir: str) -> "ray.data.Dataset":
    """UNION legs binding DIFFERENT variables: a var missing from one
    leg is unbound (null) in that leg's solutions — each part pads the
    union's full column set before the bag concat."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(UNION_DISJOINT_QUERY_TEXT)[0]
    return execute_sparql(category_store(sf_dir), q)


def sparql_union_disjoint_sql() -> str:
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"' || CAST((p_partkey * 31) % 97 AS VARCHAR) || '"' AS w,
       CAST(NULL AS VARCHAR) AS b
FROM part
UNION ALL
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR),
       CAST(NULL AS VARCHAR),
       '"' || CAST((p_partkey * 7) % 13 AS VARCHAR) || '"'
FROM part WHERE p_partkey % 3 = 0
"""


GROUPBY_EXPR_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?tier (COUNT(?p) AS ?n) WHERE {
  ?p c:weight ?w
} GROUP BY (IF(?w > 48, "high", "low") AS ?tier)
"""


def sparql_groupby_expr(sf_dir: str) -> "ray.data.Dataset":
    """GROUP BY expression gate: the key expression desugars to a
    per-solution BIND (pre-aggregation, the spec's evaluation order)
    and the groupby runs on the alias column."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(GROUPBY_EXPR_QUERY_TEXT)[0]
    assert q.group_by == ["tier"]
    return execute_sparql(category_store(sf_dir), q)


def sparql_groupby_expr_sql() -> str:
    return f"""
SELECT CASE WHEN (p_partkey * 31) % 97 > 48
            THEN '"high"' ELSE '"low"' END AS tier,
       COUNT(*) AS n
FROM part GROUP BY 1
"""


TOPK_GROUPS_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?cat (COUNT(?p) AS ?n) WHERE {
  ?p c:typed_in ?cat
} GROUP BY ?cat ORDER BY DESC(COUNT(?p)) ?cat LIMIT 5
"""


def sparql_topk_groups(sf_dir: str) -> "ray.data.Dataset":
    """ORDER BY over an aggregate (hidden synthesized agg): the five
    densest categories — deterministic tie-break on the key."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(TOPK_GROUPS_QUERY_TEXT)[0]
    assert any(a.hidden for a in q.aggs)
    return execute_sparql(category_store(sf_dir), q)


def sparql_topk_groups_sql() -> str:
    return f"""
SELECT '<{NSC}cat' || CAST(p_partkey % {N_CATS} + 2 AS VARCHAR) || '>'
         AS cat,
       COUNT(*) AS n
FROM part GROUP BY 1 ORDER BY n DESC, cat LIMIT 5
"""


BNODE_LIST_QUERY_TEXT = """
PREFIX c: <https://kgforge.example.org/cat/>
SELECT ?p ?w WHERE {
  ?p c:typed_in [ c:subCategoryOf ?anc ] .
  ?p c:weight ?w .
  FILTER(?anc = <https://kgforge.example.org/cat/cat1>)
}
"""


def sparql_bnode_list(sf_dir: str) -> "ray.data.Dataset":
    """Blank-node property list gate: the [ ... ] object desugars to
    a fresh existential variable joining typed_in to the taxonomy —
    parts whose category's PARENT is the root."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(BNODE_LIST_QUERY_TEXT)[0]
    assert len(q.where.patterns) == 3    # desugared inner pattern
    return execute_sparql(category_store(sf_dir), q)


def sparql_bnode_list_sql() -> str:
    # cats with parent cat1: k // 2 == 1 -> k in {2, 3}
    return f"""
SELECT '{NSC}part' || CAST(p_partkey AS VARCHAR) AS p,
       '"' || CAST((p_partkey * 31) % 97 AS VARCHAR) || '"' AS w
FROM part WHERE (p_partkey % {N_CATS} + 2) IN (2, 3)
"""
