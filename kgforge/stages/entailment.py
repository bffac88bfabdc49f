"""RDFS entailment over the produced graph — the inference half of the
reference's Jena hand-off (/root/reference/csv2rdf-v4/jena/
requests.sparql:22-31 runs rdfs:subClassOf-closure queries against the
published store).

Semantics (stratified, deterministic — mirrored 1:1 by the DuckDB
recursive-CTE oracle in ``entailed_types_oracle_sql``):

- ``sco+`` / ``spo+``: transitive closures of rdfs:subClassOf /
  rdfs:subPropertyOf (schema triples — ontology-sized, i.e. tiny
  relative to the instance data).
- types0 = base rdf:type facts
  ∪ {(s, C): (s,p,o) ∈ base, C ∈ dom(q), q ∈ {p} ∪ spo+(p)}
  ∪ {(o, C): (s,p,<o>) ∈ base, C ∈ rng(q), q ∈ {p} ∪ spo+(p)}
- entailed = types0 ∪ {(s, D): (s, C) ∈ types0, D ∈ sco+(C)}

Scale shape: the SCHEMA partitions (subClassOf, subPropertyOf, domain,
range) are read driver-side (small by construction); the instance work
reads ONLY the rdf:type partition plus the partitions of properties
that actually carry a domain/range (partition-pruned scan), and the
closure dictionaries ship once via the task closure — no join, no
shuffle except the final distinct.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..ntriples import RDF_TYPE, RDFS_NS

RDFS_SUBCLASSOF = RDFS_NS + "subClassOf"
RDFS_SUBPROPERTYOF = RDFS_NS + "subPropertyOf"
RDFS_DOMAIN = RDFS_NS + "domain"
RDFS_RANGE = RDFS_NS + "range"


def transitive_closure(edges: list[tuple[str, str]]
                       ) -> dict[str, set[str]]:
    """a -> all reachable b (BFS per node; ontology-sized input)."""
    direct: dict[str, set[str]] = {}
    for a, b in edges:
        direct.setdefault(a, set()).add(b)
    out: dict[str, set[str]] = {}
    for start in direct:
        seen: set[str] = set()
        stack = list(direct[start])
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(direct.get(n, ()))
        out[start] = seen
    return out


def _term_iri(term: str) -> str | None:
    return term[1:-1] if term.startswith("<") and term.endswith(">") else None


def _schema_edges(store_dir: str, pred: str) -> list[tuple[str, str]]:
    """(s, o_iri) pairs of one schema predicate, read from its pruned
    partition driver-side."""
    from ..sinks.store_query import query_triples
    out = []
    for b in query_triples(store_dir, p=pred).iter_batches(
            batch_format="pyarrow"):
        for s_, o_ in zip(b["s"].to_pylist(), b["o"].to_pylist()):
            iri = _term_iri(o_)
            if iri is not None:
                out.append((s_, iri))
    return out


def entailed_types(store_dir: str) -> "ray.data.Dataset":
    """DISTINCT (s, type_uri) under RDFS entailment, answered from the
    predicate-partitioned store with partition-pruned reads."""
    from ..sinks.store_query import query_triples
    from .canonicalize import SANITIZE_BATCH
    from .dedup import distinct

    sco = transitive_closure(_schema_edges(store_dir, RDFS_SUBCLASSOF))
    spo = transitive_closure(_schema_edges(store_dir, RDFS_SUBPROPERTYOF))
    dom: dict[str, set[str]] = {}
    for prop, c in _schema_edges(store_dir, RDFS_DOMAIN):
        dom.setdefault(prop, set()).add(c)
    rng: dict[str, set[str]] = {}
    for prop, c in _schema_edges(store_dir, RDFS_RANGE):
        rng.setdefault(prop, set()).add(c)

    # effective domain/range per BASE predicate: its own plus its
    # superproperties' (the spo-derived-facts rule, folded)
    def effective(table: dict[str, set[str]]) -> dict[str, set[str]]:
        eff: dict[str, set[str]] = {}
        props = set(table) | set(spo)
        for p_ in props:
            cs = set(table.get(p_, ()))
            for q in spo.get(p_, ()):
                cs |= table.get(q, set())
            if cs:
                eff[p_] = cs
        return eff

    eff_dom, eff_rng = effective(dom), effective(rng)

    from .triples import _const_col

    def _pairs_table(parts: list[tuple[pa.Array, str]]) -> pa.Table:
        if not parts:
            return pa.table({"s": pa.array([], type=pa.string()),
                             "type_uri": pa.array([], type=pa.string())})
        s_out = pa.concat_arrays(
            [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
             for a, _ in parts])
        t_out = pa.concat_arrays(
            [_const_col(c, len(a)) for a, c in parts])
        return pa.table({"s": s_out, "type_uri": t_out})

    def sco_expand(s_arr: pa.Array, t_arr: pa.Array) -> pa.Table:
        """(s, t) plus (s, sup) for every sup in sco+(t) — vectorized
        per UNIQUE type (ontology-sized loop, Arrow filter inner)."""
        base = pa.table({"s": s_arr, "type_uri": t_arr})
        enc = pc.dictionary_encode(t_arr)
        extra: list[tuple[pa.Array, str]] = []
        for ui, u in enumerate(enc.dictionary.to_pylist()):
            sups = sco.get(u)
            if not sups:
                continue
            sel = s_arr.filter(pc.equal(enc.indices, ui))
            extra.extend((sel, sup) for sup in sorted(sups))
        if not extra:
            return base
        return pa.concat_tables([base, _pairs_table(extra)])

    def base_types(batch: pa.Table) -> pa.Table:
        o = batch["o"].combine_chunks().cast(pa.string())
        is_uri = pc.starts_with(o, "<")
        s_arr = batch["s"].combine_chunks().cast(pa.string()).filter(is_uri)
        t_arr = pc.utf8_trim(o.filter(is_uri), characters="<>")
        return sco_expand(s_arr, t_arr)

    parts = [query_triples(store_dir, p=RDF_TYPE)
             .map_batches(base_types, batch_format="pyarrow",
                          batch_size=SANITIZE_BATCH)]

    fact_preds = sorted(set(eff_dom) | set(eff_rng))

    def derive_types(batch: pa.Table) -> pa.Table:
        """domain/range derivation, vectorized per UNIQUE predicate."""
        p_arr = batch["p"].combine_chunks().cast(pa.string())
        s_arr = batch["s"].combine_chunks().cast(pa.string())
        o_arr = batch["o"].combine_chunks().cast(pa.string())
        enc = pc.dictionary_encode(p_arr)
        pairs: list[tuple[pa.Array, str]] = []
        for ui, u in enumerate(enc.dictionary.to_pylist()):
            mask = pc.equal(enc.indices, ui)
            if u in eff_dom:
                sel = s_arr.filter(mask)
                pairs.extend((sel, c) for c in sorted(eff_dom[u]))
            if u in eff_rng:
                selo = o_arr.filter(mask)
                is_uri = pc.starts_with(selo, "<")
                iri = pc.utf8_trim(selo.filter(is_uri), characters="<>")
                pairs.extend((iri, c) for c in sorted(eff_rng[u]))
        t = _pairs_table(pairs)
        return sco_expand(t["s"].combine_chunks(),
                          t["type_uri"].combine_chunks())

    for fp in fact_preds:
        parts.append(query_triples(store_dir, p=fp)
                     .map_batches(derive_types, batch_format="pyarrow",
                                  batch_size=SANITIZE_BATCH))
    ds = parts[0]
    for extra in parts[1:]:
        ds = ds.union(extra)
    return distinct(ds, ["s", "type_uri"])


def entailed_types_oracle_sql(base_sql: str) -> str:
    """DuckDB recursive-CTE mirror of ``entailed_types`` over the SAME
    base graph SQL (term-form s,p,o). Column names match the engine:
    (s, type_uri)."""
    return f"""
WITH RECURSIVE
base AS ({base_sql}),
sco_e AS (SELECT s AS sub, trim(o, '<>') AS sup FROM base
          WHERE p = '{RDFS_SUBCLASSOF}'),
sco(sub, sup) AS (SELECT sub, sup FROM sco_e
                  UNION
                  SELECT a.sub, e.sup FROM sco a
                  JOIN sco_e e ON a.sup = e.sub),
spo_e AS (SELECT s AS sub, trim(o, '<>') AS sup FROM base
          WHERE p = '{RDFS_SUBPROPERTYOF}'),
spo(sub, sup) AS (SELECT sub, sup FROM spo_e
                  UNION
                  SELECT a.sub, e.sup FROM spo a
                  JOIN spo_e e ON a.sup = e.sub),
dom AS (SELECT s AS prop, trim(o, '<>') AS c FROM base
        WHERE p = '{RDFS_DOMAIN}'),
rng AS (SELECT s AS prop, trim(o, '<>') AS c FROM base
        WHERE p = '{RDFS_RANGE}'),
types0 AS (
  SELECT s, trim(o, '<>') AS t FROM base
  WHERE p = '{RDF_TYPE}' AND o LIKE '<%'
  UNION SELECT f.s, d.c FROM base f JOIN dom d ON d.prop = f.p
  UNION SELECT f.s, d.c FROM base f JOIN spo q ON f.p = q.sub
        JOIN dom d ON d.prop = q.sup
  UNION SELECT trim(f.o, '<>'), r.c FROM base f
        JOIN rng r ON r.prop = f.p WHERE f.o LIKE '<%'
  UNION SELECT trim(f.o, '<>'), r.c FROM base f
        JOIN spo q ON f.p = q.sub JOIN rng r ON r.prop = q.sup
        WHERE f.o LIKE '<%'
),
types AS (SELECT s, t FROM types0
          UNION
          SELECT t0.s, c.sup AS t FROM types0 t0 JOIN sco c
          ON t0.t = c.sub)
SELECT DISTINCT s, t AS type_uri FROM types
"""


def entailed_facts(store_dir: str) -> "ray.data.Dataset":
    """The reference's CONSTRUCT-inference
    (csv2rdf-v4/jena/requests.sparql:10-13): DISTINCT derived facts
    ``(s, r, o)`` for every base fact ``(s, q, o)`` with
    ``q rdfs:subPropertyOf+ r``. Partition-pruned: only the (tiny)
    subPropertyOf partition and the partitions of properties that HAVE
    superproperties are read; the closure ships in the task closure."""
    from ..sinks.store_query import query_triples
    from .canonicalize import SANITIZE_BATCH
    from .dedup import distinct

    spo = transitive_closure(_schema_edges(store_dir, RDFS_SUBPROPERTYOF))
    schema = pa.schema([("s", pa.string()), ("p", pa.string()),
                        ("o", pa.string())])
    parts = []
    for prop in sorted(spo):
        sups = sorted(spo[prop])

        def derive(batch: pa.Table, _sups=tuple(sups)) -> pa.Table:
            tbls = [pa.table({"s": batch["s"],
                              "p": pa.array([r] * batch.num_rows,
                                            type=pa.string()),
                              "o": batch["o"]}) for r in _sups]
            return pa.concat_tables(tbls) if tbls else schema.empty_table()

        parts.append(query_triples(store_dir, p=prop)
                     .map_batches(derive, batch_format="pyarrow",
                                  batch_size=SANITIZE_BATCH))
    if not parts:
        return ray.data.from_arrow(schema.empty_table())
    ds = parts[0]
    for extra in parts[1:]:
        ds = ds.union(extra)
    return distinct(ds, ["s", "p", "o"])


def entailed_facts_oracle_sql(base_sql: str) -> str:
    """DuckDB recursive mirror of ``entailed_facts``."""
    return f"""
WITH RECURSIVE
base AS ({base_sql}),
spo_e AS (SELECT s AS sub, trim(o, '<>') AS sup FROM base
          WHERE p = '{RDFS_SUBPROPERTYOF}'),
spo(sub, sup) AS (SELECT sub, sup FROM spo_e
                  UNION
                  SELECT a.sub, e.sup FROM spo a
                  JOIN spo_e e ON a.sup = e.sub)
SELECT DISTINCT b.s, q.sup AS p, b.o
FROM base b JOIN spo q ON b.p = q.sub
"""
