"""Triple-pattern queries over the predicate-partitioned Parquet store.

The reference's end-use is SPARQL-with-inference on Fuseki
(/root/reference/csv2rdf-v4/jena/requests.sparql:1-31, assembler
jena/test-conf.ttl:1-34). The Ray-native equivalent: ``(s?, p?, o?)``
patterns over the ``write_graph_partitioned`` layout
(sinks/ntriples_sink.py) — a BOUND predicate reads ONLY its
``p_key=...`` partition directory (at 100 TB that is the difference
between scanning the graph and scanning one predicate's slice), and
bound s/o become parquet row filters pushed into the read, so only
matching row groups are decoded. Entailment lives in
kgforge/stages/entailment.py.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .ntriples_sink import predicate_key

_STORE_SUB = "triples_by_predicate"


def _partition_paths(store_dir: str, p: str | None) -> list[str]:
    base = os.path.join(store_dir, _STORE_SUB)
    if p is None:
        return sorted(glob.glob(os.path.join(base, "p_key=*", "*.parquet")))
    return sorted(glob.glob(os.path.join(
        base, f"p_key={predicate_key(p)}", "*.parquet")))


def store_predicates(store_dir: str) -> list[str]:
    """Distinct predicate IRIs in the store, read from partition
    CONTENTS (one tiny column scan per partition dir; p_key alone is
    not authoritative because of crc fallback keys)."""
    import pyarrow.parquet as pq
    preds: set[str] = set()
    base = os.path.join(store_dir, _STORE_SUB)
    for d in sorted(glob.glob(os.path.join(base, "p_key=*"))):
        for f in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            preds.update(pq.read_table(f, columns=["p"])["p"].to_pylist())
    return sorted(preds)


def query_triples(store_dir: str, s: str | None = None,
                  p: str | None = None, o: str | None = None,
                  p_not: list[str] | None = None
                  ) -> "ray.data.Dataset":
    """``(s?, p?, o?)`` pattern match -> Dataset of (s, p, o) term rows.

    - ``p`` bound: partition-pruned read of one ``p_key=`` dir, with an
      in-read equality filter (crc-collision tolerance).
    - ``s`` / ``o`` bound: pushed as parquet filters (row-group pruning)
      via the read's filter expression.
    - ``p_not``: negated property set — full partition list, with
      ``p != v`` pushed as a parquet filter; single-predicate
      partitions prune at row-group stats (min==max==p), so excluded
      partitions cost one footer read, not a scan.
    - nothing bound: full store scan (still a streaming Dataset).
    ``o`` matches the rendered TERM (``<iri>`` or ``"literal"``)."""
    paths = _partition_paths(store_dir, p)
    schema = pa.schema([("s", pa.string()), ("p", pa.string()),
                        ("o", pa.string())])
    if not paths:
        return ray.data.from_arrow(schema.empty_table())
    import pyarrow.dataset as pads
    expr = None
    for col, val in (("s", s), ("p", p), ("o", o)):
        if val is not None:
            e = pads.field(col) == val
            expr = e if expr is None else (expr & e)
    for val in (p_not or []):
        e = pads.field("p") != val
        expr = e if expr is None else (expr & e)
    kwargs = {"columns": ["s", "p", "o"]}
    if expr is not None:
        kwargs["filter"] = expr
    return ray.data.read_parquet(paths, **kwargs)


def query_triples_sql(store_dir: str, s: str | None = None,
                      p: str | None = None, o: str | None = None) -> str:
    """DuckDB mirror of the same pattern over the same store files —
    used by tests to check the pruned answer against a full scan."""
    from ..sqlgen import sql_quote
    base = os.path.join(store_dir, _STORE_SUB)
    conds = ["TRUE"]
    for col, val in (("s", s), ("p", p), ("o", o)):
        if val is not None:
            conds.append(f"{col} = {sql_quote(val)}")
    return (f"SELECT s, p, o FROM read_parquet('{base}/*/*.parquet') "
            f"WHERE {' AND '.join(conds)}")


def query_minus(store_dir: str, p: str,
                exclude_props: list[str]) -> "ray.data.Dataset":
    """The reference's versioning MINUS pattern
    (csv2rdf-v4/jena/requests.sparql:22-31): DISTINCT (s, o) pairs
    linked via ``p`` EXCEPT pairs also linked by any of
    ``exclude_props`` (e.g. the other subProperties of ``p``'s parent
    — "use only the latest version of the relation").

    Both sides are partition-pruned bound-predicate reads; the
    exclusion is a hash-partitioned LEFT OUTER anti-join on (s, o) —
    no driver-side set at any exclusion mass."""
    from ..stages.canonicalize import (SANITIZE_BATCH,
                                       default_shuffle_partitions)
    from ..stages.dedup import distinct
    keep = distinct(query_triples(store_dir, p=p), ["s", "o"])
    # explicit batch_size coalesces the distinct's EMPTY zero-column
    # blocks away before the join (they poison Acero key resolution)
    keep = keep.map_batches(lambda t: t, batch_format="pyarrow",
                            batch_size=SANITIZE_BATCH)
    excl_parts = [query_triples(store_dir, p=q) for q in exclude_props]
    if not excl_parts:
        return keep
    excl = excl_parts[0]
    for e in excl_parts[1:]:
        excl = excl.union(e)

    def tag(b: pa.Table) -> pa.Table:
        import numpy as np
        return pa.table({"_es": b["s"], "_eo": b["o"],
                         "_hit": pa.array(np.ones(b.num_rows, np.int8))})

    excl = distinct(excl, ["s", "o"]).map_batches(
        tag, batch_format="pyarrow", batch_size=SANITIZE_BATCH)
    if excl.count() == 0:
        return keep
    j = keep.join(excl, join_type="left_outer",
                  num_partitions=default_shuffle_partitions(),
                  on=("s", "o"), right_on=("_es", "_eo"))

    def unmatched(b: pa.Table) -> pa.Table:
        keep_mask = pc.is_null(b["_hit"])
        return b.filter(keep_mask).select(["s", "o"])

    return j.map_batches(unmatched, batch_format="pyarrow",
                         batch_size=SANITIZE_BATCH)
