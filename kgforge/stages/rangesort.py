"""Deterministic global sort — a range-partitioned replacement for
``Dataset.sort`` on string keys.

Measured on the merged webkg graph (4.08M triples, 16 CPUs):
``terms.sort(["s","p","o"])`` = ~25 s wall with either Ray shuffle
strategy, while this pipeline runs in ~6 s and produces row-identical
output (tests/test_rangesort.py): Ray 2.49's sort spends its wall in
the tuple-string-key sample/merge machinery, whereas here the shuffle
is keyed by ONE int32 and all string comparisons happen in vectorized
numpy / polars kernels.

Shape:
1. deterministic per-batch quantile sample of ``keys[0]`` -> driver
   boundaries (tiny; depends only on batch contents, so identical
   reruns produce identical file boundaries — the resume contract);
2. vectorized bucket assignment: numpy ``searchsorted`` over a
   fixed-width U-dtype view. Truncation-safe: every boundary's length
   bounds the dtype width, and ``side='right'`` sends rows whose
   truncation EQUALS a boundary to the right — exactly where the full
   string (equal, or greater by being a longer extension) belongs.
   UTF-32 code-point comparison == UTF-8 byte order == Arrow/polars
   string order, so all layers agree;
3. ``groupby(_bucket).map_groups`` (int-keyed shuffle, ~num_buckets
   Python group callbacks) with a per-bucket polars multi-column sort.

Rows with equal ``keys[0]`` always share a bucket, so bucket order +
in-bucket (full-key) order = global order. Keys must be non-null
strings (triple terms always are).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def range_sorted(ds: "ray.data.Dataset", keys: list[str],
                 num_buckets: int | None = None,
                 samples_per_batch: int = 32) -> "ray.data.Dataset":
    if num_buckets is None:
        from .dedup import default_num_buckets
        num_buckets = default_num_buckets()
    key0 = keys[0]

    def sample(b: pa.Table) -> pa.Table:
        s = b[key0].combine_chunks().cast(pa.string())
        arr = np.sort(s.to_numpy(zero_copy_only=False))
        step = max(1, len(arr) // samples_per_batch)
        return pa.table({"q": pa.array(arr[::step], type=pa.string())})

    qs: list[str] = []
    for b in (ds.map_batches(sample, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        qs.extend(b["q"].to_pylist())
    qs.sort()
    if len(qs) < 2:
        return ds.sort(keys)      # trivial input: Ray's sort is fine
    bnds = [qs[i * len(qs) // num_buckets] for i in range(1, num_buckets)]
    maxw = max(1, max(len(x) for x in bnds))
    bnds_arr = np.array(bnds, dtype=f"U{maxw}")

    def assign(b: pa.Table) -> pa.Table:
        s = b[key0].combine_chunks().cast(pa.string())
        sn = s.to_numpy(zero_copy_only=False).astype(f"U{maxw}")
        bk = np.searchsorted(bnds_arr, sn, side="right").astype(np.int32)
        return b.append_column("_bucket", pa.array(bk))

    def bucket_sort(g: pa.Table) -> pa.Table:
        import polars as pl
        cols = [c for c in g.schema.names if c != "_bucket"]
        target = pa.schema([g.schema.field(c) for c in cols])
        return (pl.from_arrow(g.select(cols)).sort(keys)
                .to_arrow().cast(target))

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(bucket_sort, batch_format="pyarrow"))
