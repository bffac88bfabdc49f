"""Stateful entity-linking stage — the engine's actor-pool exemplar.

Reference analogue: the mapping-list broadcast lookup (T1/M6,
csv2rdf-v5/csv2rdf-v5.py:264-276) — a tiny dict captured by closure. At
web scale the alias table is big enough that re-shipping it per task
hurts, so this is a callable CLASS for
``ds.map_batches(EntityLinker, fn_constructor_kwargs=..., concurrency=N)``:
the table is fetched/built ONCE per actor in ``__init__`` (from a
``ray.put`` broadcast ref or a parquet path) and reused across batches.

Semantics mirror the reference's map-miss behavior: unknown mentions
pass through unchanged (csv2rdf-v5.py:267-269).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray


def broadcast_aliases(alias: dict[str, str]) -> "ray.ObjectRef":
    """ray.put once on the driver; every actor reads the same copy from
    the object store instead of re-shipping per task."""
    return ray.put(alias)


class EntityLinker:
    """mention column -> canonical column, alias table loaded per actor."""

    def __init__(self, alias_source, input_col: str, output_col: str):
        """alias_source: dict, ray.ObjectRef of a dict, or parquet path
        of an (alias, canonical) table."""
        if isinstance(alias_source, dict):
            self.alias = alias_source
        elif isinstance(alias_source, str):
            t = pq.read_table(alias_source)
            self.alias = dict(zip(t["alias"].to_pylist(),
                                  t["canonical"].to_pylist()))
        else:  # ObjectRef (broadcast)
            self.alias = ray.get(alias_source)
        self.input_col = input_col
        self.output_col = output_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch[self.input_col].combine_chunks().cast(pa.string())
        # lookup over dictionary uniques, not rows
        enc = pc.dictionary_encode(arr)
        uniq = enc.dictionary.to_pylist()
        mapped = pa.array(
            [self.alias.get(u, u) if u is not None else None for u in uniq],
            type=pa.string(),
        ).take(enc.indices)
        return batch.append_column(self.output_col, mapped)
