"""Distributed global row numbering and deterministic corpus shuffle.

Training pipelines need a *global training order*: every document gets a
dense 0-based position in a pseudo-random but fully deterministic
permutation (content-keyed — identical at any parallelism, resumable),
plus a shard assignment for the writer. Ray Data has no row_number()
primitive; this composes one from the repo's standard pieces:

1. Sort key = Knuth multiplicative hash of doc_id (uint64 wrap, mod
   2^32 — the exact arithmetic dataset_split/ops/text.py:233 already
   mirrors in HUGEINT SQL), tie-broken by doc_id.
2. Range-partition by EQUAL-WIDTH hash buckets (bucket = kh * B >> 32).
   The hash is uniform, so buckets are balanced without a sampling pass,
   and bucket order == key order by construction — no boundary sketch
   needed (contrast stages/rangesort.py, which must sample because raw
   triple keys are arbitrary strings).
3. COUNT PASS: per-batch bincount combiner over the bucket ids → B
   integers on the driver → prefix sums = each bucket's global offset.
   This is the classic distributed row-number prefix pass; the exchange
   is B ints per block, corpus-size-independent.
4. RANK PASS: one bucket shuffle; each bucket sorts locally (C-level
   polars) and adds its offset. No global sort, no driver materialize.

The count pass re-reads only the key column (column-pruned read + a
32-bit hash per row) rather than materializing the hashed corpus — at
100 TB recomputing a multiply is cheaper than pinning the dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..sources.readers import read_table

KNUTH_MULT = 2654435761  # same constant as ops/text.SPLIT_MULT
_MOD = np.uint64(1 << 32)


def _khash(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash, uint64-wrap mod 2^32 (exact HUGEINT
    mirror in SQL for any doc_id >= 0 — see ops/text.dataset_split)."""
    return (ids.astype(np.uint64) * np.uint64(KNUTH_MULT)) % _MOD


def global_row_number(ds: "ray.data.Dataset", key: str,
                      num_buckets: int | None = None
                      ) -> "ray.data.Dataset":
    """Assign (key, pos): dense 0-based global row numbers ordered by
    (knuth_hash(key), key). `key` must be a non-negative integer column
    with distinct values (it is the tie-breaker)."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    nb = np.uint64(num_buckets)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = (batch[key].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        kh = _khash(ids)
        bucket = ((kh * nb) >> np.uint64(32)).astype(np.int32)
        return pa.table({key: pa.array(ids, type=pa.int64()),
                         "_kh": pa.array(kh.astype(np.int64),
                                         type=pa.int64()),
                         "_bucket": pa.array(bucket, type=pa.int32())})

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    # ---- count pass: B-int combiner per block, tiny driver reduce
    def bucket_counts(batch: pa.Table) -> pa.Table:
        b = batch["_bucket"].combine_chunks().to_numpy(
            zero_copy_only=False)
        c = np.bincount(b, minlength=num_buckets)
        return pa.table({"_bucket": pa.array(
            np.arange(num_buckets, dtype=np.int32), type=pa.int32()),
            "n": pa.array(c.astype(np.int64), type=pa.int64())})

    parts = (keyed_ds.map_batches(bucket_counts, batch_format="pyarrow")
             .groupby("_bucket").sum("n").to_pandas())  # B rows
    counts = np.zeros(num_buckets, dtype=np.int64)
    counts[parts["_bucket"].to_numpy()] = parts["sum(n)"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))

    # ---- rank pass: one bucket shuffle, local sort + offset
    def per_bucket(group: pa.Table) -> pa.Table:
        import polars as pl
        df = (pl.from_arrow(group.select([key, "_kh", "_bucket"]))
              .sort(["_kh", key]))
        b = int(df["_bucket"][0])
        pos = np.arange(len(df), dtype=np.int64) + offsets[b]
        return pa.table({key: df[key].to_arrow().cast(pa.int64()),
                         "pos": pa.array(pos, type=pa.int64())})

    return (keyed_ds.groupby("_bucket")
            .map_groups(per_bucket, batch_format="pyarrow"))


def corpus_shuffle(sf_dir: str, n_shards: int = 8) -> "ray.data.Dataset":
    """Gate: deterministic training-order assignment for the documents
    corpus. Output (doc_id, pos, shard) — pos is the dense position in
    the content-keyed permutation, shard a round-robin writer bucket."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    ranked = global_row_number(ds, key="doc_id")

    def finish(batch: pa.Table) -> pa.Table:
        pos = (batch["pos"].combine_chunks()
               .to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": batch["doc_id"], "pos": batch["pos"],
                         "shard": pa.array(pos % n_shards,
                                           type=pa.int64())})

    return ranked.map_batches(finish, batch_format="pyarrow")


def corpus_shuffle_sql(n_shards: int = 8) -> str:
    kh = f"((CAST(doc_id AS HUGEINT) * {KNUTH_MULT}) % 4294967296)"
    return f"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY {kh}, doc_id) - 1 AS BIGINT) AS pos,
       CAST((row_number() OVER (ORDER BY {kh}, doc_id) - 1) % {n_shards}
            AS BIGINT) AS shard
FROM documents
"""


def global_prefix_sum(ds: "ray.data.Dataset", key: str, value: str,
                      num_buckets: int | None = None
                      ) -> "ray.data.Dataset":
    """Exclusive running total of `value` in (knuth_hash(key), key)
    order: emits (key, pos, offset) where offset = sum of `value` over
    all rows strictly before this one in the global permutation.

    Same two-pass shape as global_row_number — the count pass just
    sums values per bucket instead of counting rows (the exchange is
    still B ints per block) — because a distributed prefix sum IS a
    prefix count with weights."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    nb = np.uint64(num_buckets)

    def keyed(batch: pa.Table) -> pa.Table:
        ids = (batch[key].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        vals = (batch[value].combine_chunks().cast(pa.int64())
                .to_numpy(zero_copy_only=False))
        kh = _khash(ids)
        bucket = ((kh * nb) >> np.uint64(32)).astype(np.int32)
        return pa.table({key: pa.array(ids, type=pa.int64()),
                         "_v": pa.array(vals, type=pa.int64()),
                         "_kh": pa.array(kh.astype(np.int64),
                                         type=pa.int64()),
                         "_bucket": pa.array(bucket, type=pa.int32())})

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")

    def bucket_sums(batch: pa.Table) -> pa.Table:
        b = batch["_bucket"].combine_chunks().to_numpy(
            zero_copy_only=False)
        v = batch["_v"].combine_chunks().to_numpy(zero_copy_only=False)
        # int64 scatter-add, not bincount(weights=float64): block sums
        # stay integer-exact at any magnitude
        s = np.zeros(num_buckets, dtype=np.int64)
        np.add.at(s, b, v)
        c = np.bincount(b, minlength=num_buckets).astype(np.int64)
        return pa.table({"_bucket": pa.array(
            np.arange(num_buckets, dtype=np.int32), type=pa.int32()),
            "s": pa.array(s, type=pa.int64()),
            "n": pa.array(c, type=pa.int64())})

    parts = (keyed_ds.map_batches(bucket_sums, batch_format="pyarrow")
             .groupby("_bucket").sum(["s", "n"]).to_pandas())
    sums = np.zeros(num_buckets, dtype=np.int64)
    cnts = np.zeros(num_buckets, dtype=np.int64)
    sums[parts["_bucket"].to_numpy()] = parts["sum(s)"].to_numpy()
    cnts[parts["_bucket"].to_numpy()] = parts["sum(n)"].to_numpy()
    val_offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    pos_offsets = np.concatenate(([0], np.cumsum(cnts)[:-1]))

    def per_bucket(group: pa.Table) -> pa.Table:
        import polars as pl
        df = (pl.from_arrow(group.select([key, "_v", "_kh", "_bucket"]))
              .sort(["_kh", key]))
        b = int(df["_bucket"][0])
        v = df["_v"].to_numpy()
        excl = np.concatenate(([0], np.cumsum(v)[:-1])) + val_offsets[b]
        pos = np.arange(len(df), dtype=np.int64) + pos_offsets[b]
        return pa.table({key: df[key].to_arrow().cast(pa.int64()),
                         "pos": pa.array(pos, type=pa.int64()),
                         "offset": pa.array(excl.astype(np.int64),
                                            type=pa.int64())})

    return (keyed_ds.groupby("_bucket")
            .map_groups(per_bucket, batch_format="pyarrow"))


def token_budget_shards(sf_dir: str, budget: int = 4096
                        ) -> "ray.data.Dataset":
    """Gate: pack the shuffled corpus into fixed-token-budget training
    shards. Docs are taken in the deterministic permutation order
    (corpus_shuffle); a doc's shard is the budget window its starting
    token offset falls in (a straddling doc belongs to the shard it
    starts in — the greedy packing every sequential writer uses).
    Output (doc_id, pos, tok_offset, shard); token count = whitespace
    tokens (ops/text.TOKEN_RE semantics via split-on-space length)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def with_tokens(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        out = df.select(
            pl.col("doc_id"),
            pl.col("text").str.split(" ").list.len()
            .cast(pl.Int64).alias("n_tok"))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_tok", pa.int64())]))

    counted = ds.map_batches(with_tokens, batch_format="pyarrow")
    pref = global_prefix_sum(counted, key="doc_id", value="n_tok")

    def finish(batch: pa.Table) -> pa.Table:
        off = (batch["offset"].combine_chunks()
               .to_numpy(zero_copy_only=False))
        return pa.table({"doc_id": batch["doc_id"], "pos": batch["pos"],
                         "tok_offset": batch["offset"],
                         "shard": pa.array(off // budget,
                                           type=pa.int64())})

    return pref.map_batches(finish, batch_format="pyarrow")


def token_budget_shards_sql(budget: int = 4096) -> str:
    kh = f"((CAST(doc_id AS HUGEINT) * {KNUTH_MULT}) % 4294967296)"
    return f"""
WITH counted AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), pref AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY {kh}, doc_id) - 1 AS BIGINT)
             AS pos,
         CAST(coalesce(sum(n_tok) OVER (
             ORDER BY {kh}, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS tok_offset
  FROM counted
)
SELECT doc_id, pos, tok_offset,
       CAST(tok_offset // {budget} AS BIGINT) AS shard
FROM pref
"""


def global_sorted_rank(ds: "ray.data.Dataset", col: str,
                       num_buckets: int | None = None
                       ) -> "ray.data.Dataset":
    """Distributed DICTIONARY ENCODING: (value, id) with dense 0-based
    ids in LEXICOGRAPHIC order of the DISTINCT string values of
    ``col`` — the tensorization primitive (term → contiguous id) of a
    KG-embedding or vocabulary pipeline, mirrored in SQL by
    ``row_number() OVER (ORDER BY value) - 1``.

    Same two-pass shape as ``global_row_number`` but with RANGE buckets
    over strings: content-keyed boundaries (rangesort KMV sketch —
    block-layout-independent), per-block bincount combiners → driver
    prefix sums (B ints), then ONE range shuffle with a C-level local
    sort + offset per bucket. No global sort, no driver value list."""
    import polars as pl

    import ray as _ray

    from ..stages.dedup import default_num_buckets, distinct
    from ..stages.rangesort import content_boundaries
    if num_buckets is None:
        num_buckets = default_num_buckets()
    vals = distinct(ds, [col]).materialize()
    bnds = content_boundaries(vals, col, num_buckets)
    nb = len(bnds) + 1
    bnd_arr = np.array(bnds, dtype=object)
    out_schema = pa.schema([(col, pa.string()), ("id", pa.int64())])

    def bucketed(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        bk = (np.searchsorted(bnd_arr, v, side="right").astype(np.int32)
              if bnd_arr.size else np.zeros(len(v), np.int32))
        return pa.table({col: b[col].combine_chunks().cast(pa.string()),
                         "_bucket": pa.array(bk, pa.int32())})

    keyed = vals.map_batches(bucketed,
                             batch_format="pyarrow").materialize()

    def counts(b: pa.Table) -> pa.Table:
        c = np.bincount(b["_bucket"].to_numpy(zero_copy_only=False),
                        minlength=nb)
        return pa.table({"b": pa.array(np.arange(nb), pa.int64()),
                         "n": pa.array(c.astype(np.int64), pa.int64())})

    tot = np.zeros(nb, np.int64)
    for t in keyed.map_batches(counts, batch_format="pyarrow") \
                  .iter_batches(batch_format="pyarrow"):
        if t.num_rows:
            np.add.at(tot, t["b"].to_numpy(zero_copy_only=False),
                      t["n"].to_numpy(zero_copy_only=False))
    offsets = np.concatenate([[0], np.cumsum(tot)[:-1]]).astype(np.int64)
    off_ref = _ray.put(offsets)

    def rank_bucket(g: pa.Table) -> pa.Table:
        off = _ray.get(off_ref)
        df = pl.from_arrow(g.select([col, "_bucket"])).sort(col)
        bk = int(df["_bucket"][0])
        ids = np.arange(df.height, dtype=np.int64) + off[bk]
        return pa.table({col: df[col].to_arrow().cast(pa.string()),
                         "id": pa.array(ids, pa.int64())})

    from . import ensure_schema
    return ensure_schema(
        keyed.groupby("_bucket").map_groups(rank_bucket,
                                            batch_format="pyarrow"),
        out_schema)
