"""Ontology conformance report: domain/range validation over the KG.

csv2rdf mints ``rdfs:domain`` / ``rdfs:range`` declarations alongside
the instance data (csv2rdf-v4 grammar section roles; see
stages/entailment.py for the inference reading of the same triples).
This module is the VALIDATION reading — the KG-quality op a web-scale
construction pipeline runs before publishing: for every declared
(predicate, domain|range, class) constraint, how many instance triples
were checked and how many endpoints LACK the declared class among
their asserted-or-subClassOf-derived types.

Semantics note (deliberate, documented): under full RDFS entailment a
domain "violation" cannot exist — rdfs2/rdfs3 would INFER the missing
type (that reading lives in stages/entailment.entailed_types). Here
types are the ASSERTED ``rdf:type`` assertions closed ONLY under
``rdfs:subClassOf`` — the SHACL-style integrity view: a violation
means the pipeline emitted a triple whose endpoint was never typed
compatibly, i.e. a mapping bug or a dirty source row.

Scale shape:

* schema (domain/range declarations + the subClassOf closure) is
  ontology-sized and stays driver-side, same as the planner's schema
  patterns;
* instance reads are PARTITION-PRUNED — only the declared predicates'
  ``p_key=`` dirs are scanned, plus the ``rdf:type`` partition;
* the entity→types table is corpus-sized: below
  ``KGFORGE_GRAPH_BROADCAST_LIMIT`` rows it broadcasts once via
  ``ray.put`` (per-class sorted id arrays, per-batch ``np.isin``);
  above it (or ``force_join``) each constraint becomes ONE
  tagged-union hash(endpoint)-bucket merge — no driver loop over rows,
  and constraint count is ontology-sized so the loop over constraints
  is bounded;
* per-batch combiners emit one (pred, kind, cls, checked, violations)
  partial per block; a tiny groupby-sum finishes.

Range checks apply to IRI objects only (a literal's conformance is a
datatype question, not a class membership one); literal-object triples
of a range-declared predicate are not counted as checked.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .entailment import (RDFS_DOMAIN, RDFS_RANGE, RDFS_SUBCLASSOF,
                         _schema_edges, transitive_closure)

_OUT = pa.schema([("pred", pa.string()), ("kind", pa.string()),
                  ("cls", pa.string()), ("checked", pa.int64()),
                  ("violations", pa.int64())])


def _limit() -> int:
    return int(os.environ.get("KGFORGE_GRAPH_BROADCAST_LIMIT", 1_000_000))


def _asserted_types(store_dir: str) -> "ray.data.Dataset":
    """(e, c) pairs: asserted rdf:type closed under subClassOf — the
    closure ships once as an ontology-sized (c, sup) table and each
    batch expands via ONE vectorized polars join (no per-row loop:
    the type partition is corpus-sized at scale)."""
    import polars as pl

    from ..ntriples import RDF_TYPE
    from ..sinks.store_query import query_triples
    clo = transitive_closure(_schema_edges(store_dir, RDFS_SUBCLASSOF))
    clo_tbl = pl.DataFrame({
        "c": [c for c, sups in sorted(clo.items()) for _ in sups],
        "sup": [s for _, sups in sorted(clo.items())
                for s in sorted(sups)],
    }, schema={"c": pl.Utf8, "sup": pl.Utf8})
    clo_ref = ray.put(clo_tbl)

    def expand(b: pa.Table) -> pa.Table:
        ctab = ray.get(clo_ref)
        o = b["o"].combine_chunks().cast(pa.string())
        raw = pc.replace_substring_regex(o, r"^<(.*)>$", r"\1")
        base = pl.from_arrow(pa.table(
            {"e": b["s"].combine_chunks().cast(pa.string()), "c": raw}))
        derived = (base.join(ctab, on="c", how="inner")
                   .select([pl.col("e"), pl.col("sup").alias("c")]))
        return pl.concat([base, derived]).to_arrow().cast(
            pa.schema([("e", pa.string()), ("c", pa.string())]))

    sch = pa.schema([("e", pa.string()), ("c", pa.string())])
    ds = query_triples(store_dir, p=RDF_TYPE).map_batches(
        expand, batch_format="pyarrow")
    from ..stages.dedup import distinct
    return distinct(ray.data.from_arrow(sch.empty_table()).union(ds),
                    ["e", "c"])


def _declarations(store_dir: str) -> list[tuple[str, str, str]]:
    decls = []
    for kind, pred_iri in (("domain", RDFS_DOMAIN), ("range", RDFS_RANGE)):
        for prop, cls in sorted(_schema_edges(store_dir, pred_iri)):
            decls.append((prop, kind, cls))
    return decls


def _endpoints(store_dir: str, pred: str, kind: str) -> "ray.data.Dataset":
    """The checked endpoint column of one constraint: subjects for
    domain, stripped IRI objects for range (literals skipped)."""
    from ..sinks.store_query import query_triples

    def pick(b: pa.Table, _k=kind) -> pa.Table:
        if _k == "domain":
            return pa.table({"endpoint": b["s"].combine_chunks()
                             .cast(pa.string())})
        o = b["o"].combine_chunks().cast(pa.string())
        m = pc.and_(pc.starts_with(o, "<"), pc.ends_with(o, ">"))
        kept = o.filter(m)
        raw = pc.replace_substring_regex(kept, r"^<(.*)>$", r"\1")
        return pa.table({"endpoint": raw})

    sch = pa.schema([("endpoint", pa.string())])
    return ray.data.from_arrow(sch.empty_table()).union(
        query_triples(store_dir, p=pred).map_batches(
            pick, batch_format="pyarrow"))


def conformance_report(store_dir: str, num_buckets: int | None = None,
                       force_join: bool = False) -> "ray.data.Dataset":
    """One row per declared constraint:
    (pred, kind in {domain, range}, cls, checked, violations)."""
    import polars as pl
    from ..stages.dedup import default_num_buckets
    if num_buckets is None:
        num_buckets = default_num_buckets()
    decls = _declarations(store_dir)
    if not decls:
        return ray.data.from_arrow(_OUT.empty_table())
    etypes = _asserted_types(store_dir).materialize()

    rows = []
    small = not force_join and etypes.count() <= _limit()
    if small:
        # per-class sorted entity arrays, broadcast once (vectorized
        # partition — one C-level groupby, no per-row driver loop)
        tbls = [t for t in etypes.iter_batches(batch_format="pyarrow")
                if t.num_rows]
        all_t = (pl.from_arrow(pa.concat_tables(tbls)) if tbls
                 else pl.DataFrame({"e": [], "c": []},
                                   schema={"e": pl.Utf8, "c": pl.Utf8}))
        byc_ref = ray.put({
            key[0]: np.sort(part["e"].to_numpy().astype(object))
            for key, part in all_t.partition_by(
                "c", as_dict=True).items()})

    for pred, kind, cls in decls:
        eps = _endpoints(store_dir, pred, kind)
        if small:
            def partial(b: pa.Table, _c=cls) -> pa.Table:
                ok_ids = ray.get(byc_ref).get(_c)
                e = b["endpoint"].to_numpy(zero_copy_only=False)
                bad = (len(e) if ok_ids is None
                       else int((~np.isin(e, ok_ids)).sum()))
                return pa.table({"checked": pa.array([len(e)], pa.int64()),
                                 "violations": pa.array([bad], pa.int64())})

            parts = eps.map_batches(partial, batch_format="pyarrow")
            checked = viol = 0
            for t in parts.iter_batches(batch_format="pyarrow"):
                if t.num_rows:
                    checked += int(pc.sum(t["checked"]).as_py() or 0)
                    viol += int(pc.sum(t["violations"]).as_py() or 0)
        else:
            # ONE tagged-union hash(endpoint) bucket merge per
            # constraint: endpoints carry multiplicity, the class's
            # member set is distinct
            members = etypes.filter(
                lambda r, _c=cls: r["c"] == _c)

            def tag_ep(b: pa.Table) -> pa.Table:
                df = pl.from_arrow(b)
                return df.with_columns(
                    pl.lit(0, pl.Int8).alias("_t"),
                    (pl.col("endpoint").hash(seed=0) % num_buckets)
                    .cast(pl.Int32).alias("_gb")).to_arrow()

            def tag_mem(b: pa.Table) -> pa.Table:
                df = pl.from_arrow(pa.table(
                    {"endpoint": b["e"].combine_chunks()
                     .cast(pa.string())})).unique()
                return df.with_columns(
                    pl.lit(1, pl.Int8).alias("_t"),
                    (pl.col("endpoint").hash(seed=0) % num_buckets)
                    .cast(pl.Int32).alias("_gb")).to_arrow()

            def count(group: pa.Table) -> pa.Table:
                df = pl.from_arrow(group)
                eps_ = df.filter(pl.col("_t") == 0).select("endpoint")
                mem = (df.filter(pl.col("_t") == 1)
                       .select("endpoint").unique())
                n = eps_.height
                ok = eps_.join(mem, on="endpoint", how="semi").height
                return pa.table({
                    "checked": pa.array([n], pa.int64()),
                    "violations": pa.array([n - ok], pa.int64())})

            parts = (eps.map_batches(tag_ep, batch_format="pyarrow")
                     .union(members.map_batches(tag_mem,
                                                batch_format="pyarrow"))
                     .groupby("_gb").map_groups(count,
                                                batch_format="pyarrow"))
            checked = viol = 0
            for t in parts.iter_batches(batch_format="pyarrow"):
                if t.num_rows:
                    checked += int(pc.sum(t["checked"]).as_py() or 0)
                    viol += int(pc.sum(t["violations"]).as_py() or 0)
        rows.append((pred, kind, cls, checked, viol))

    return ray.data.from_arrow(pa.table({
        "pred": pa.array([r[0] for r in rows], pa.string()),
        "kind": pa.array([r[1] for r in rows], pa.string()),
        "cls": pa.array([r[2] for r in rows], pa.string()),
        "checked": pa.array([r[3] for r in rows], pa.int64()),
        "violations": pa.array([r[4] for r in rows], pa.int64()),
    }).cast(_OUT))
