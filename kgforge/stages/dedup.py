"""Exact distinct / triple dedup — the Ray-native replacement for
rdflib ``Graph.add`` set semantics (csv2rdf-v5/csv2rdf-v5.py:153-157).

Two-phase: (1) a vectorized per-batch local distinct inside
``map_batches`` (the combiner — a triple repeated a million times in a
block costs one output row, so hot keys reach the shuffle at
cardinality ≤ num_blocks, which is the skew answer for *duplicate*
skew), then (2) one global multi-key ``groupby().aggregate(Count)``
(hash/sort shuffle) whose distinct key rows are the answer. The count
column doubles as the dedup-hit counter for lineage metrics.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count

TRIPLE_KEYS = ["s", "p", "o_kind", "o_lex", "o_dt"]


def local_distinct(keys: list[str]):
    """map_batches fn: per-batch distinct over ``keys`` (Arrow group_by)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.select(keys).group_by(keys).aggregate([])

    return fn


def distinct(ds: "ray.data.Dataset", keys: list[str],
             batch_size: int | None = 65536) -> "ray.data.Dataset":
    """Global exact distinct on ``keys``: local combine → shuffle → final.

    Output columns are exactly ``keys`` (plus none) with one row per
    distinct key tuple. Scales as a standard pre-aggregated groupby: the
    all-to-all exchange only moves already-locally-distinct rows.
    """
    combined = ds.map_batches(local_distinct(keys), batch_format="pyarrow",
                              batch_size=batch_size)
    agg = combined.groupby(keys).aggregate(Count(alias_name="_dup_n"))
    return agg.drop_columns(["_dup_n"])


def dedup_triples(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct set of (s,p,o_kind,o_lex,o_dt) triples."""
    return distinct(ds, TRIPLE_KEYS)
