"""Exact distinct / triple dedup — the Ray-native replacement for
rdflib ``Graph.add`` set semantics (csv2rdf-v5/csv2rdf-v5.py:153-157).

Three phases, all vectorized:

1. **Local combine** — per-batch Arrow ``Table.group_by`` distinct
   inside ``map_batches`` (C++): a triple repeated a million times in a
   block reaches the shuffle once, which is the whole answer to
   *duplicate-key* skew.
2. **Bucket** — a deterministic vectorized row hash
   (``hash_pandas_object``) mod NUM_BUCKETS becomes the shuffle key, so
   the exchange moves rows keyed by ONE small int, and downstream group
   count is NUM_BUCKETS, not the row-key cardinality. (Ray's
   sort-aggregate iterates groups in Python — keying the shuffle by the
   full tuple would put the per-distinct-row loop on the critical path;
   bucketing keeps Python off the hot path entirely.)
3. **Per-bucket distinct** — ``groupby("_bucket").map_groups`` with an
   Arrow group_by distinct per bucket (again C++).

Buckets are hash-balanced; NUM_BUCKETS bounds reduce parallelism and
should track cluster width (default 64).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

TRIPLE_KEYS = ["s", "p", "o_kind", "o_lex", "o_dt"]
NUM_BUCKETS = 64


def default_num_buckets() -> int:
    """max(64, 2 × cluster CPUs): 64 bounds per-task scheduling cost at
    single-node bench scale (identical behavior at ≤32 CPUs), while a
    real cluster's reduce parallelism tracks its width instead of being
    capped at 64 tasks. Env override: KGFORGE_NUM_BUCKETS."""
    import os
    env = os.environ.get("KGFORGE_NUM_BUCKETS")
    if env:
        return int(env)
    try:
        import ray
        cpus = (int(ray.cluster_resources().get("CPU", 32))
                if ray.is_initialized() else 32)
    except Exception:
        cpus = 32
    return max(NUM_BUCKETS, 2 * cpus)


def _arrow_distinct(batch: pa.Table, keys: list[str]) -> pa.Table:
    return batch.select(keys).group_by(keys).aggregate([])


def local_distinct(keys: list[str]):
    """map_batches fn: per-batch distinct over ``keys`` (Arrow group_by)."""

    def fn(batch: pa.Table) -> pa.Table:
        return _arrow_distinct(batch, keys)

    return fn


def distinct(ds: "ray.data.Dataset", keys: list[str],
             num_buckets: int | None = None) -> "ray.data.Dataset":
    """Global exact distinct on ``keys``; output columns = ``keys``.

    ``num_buckets`` bounds reduce-side parallelism. It should track the
    DATA volume, not the session: each reduce task carries fixed
    scheduling cost (~100ms-class), so at single-node bench scale a
    small count wins, while a cluster run wants ≈ total cores. Default:
    ``default_num_buckets()`` (max(64, 2×cluster CPUs); env
    KGFORGE_NUM_BUCKETS)."""
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def combine_and_bucket(batch: pa.Table) -> pa.Table:
        # polars: vectorized native unique + hash_rows — ~6x the
        # pandas-hash + arrow-group_by path (no Python string boxing);
        # seed=0 makes the row hash deterministic across processes,
        # maintain_order keeps output blocks byte-stable for resume
        import polars as pl
        u = pl.from_arrow(batch.select(keys)).unique(subset=keys,
                                                     keep="first",
                                                     maintain_order=True)
        b = ((u.hash_rows(seed=0) % num_buckets).cast(pl.Int32)
             .rename("_bucket"))
        target = pa.schema([batch.schema.field(k) for k in keys] +
                           [pa.field("_bucket", pa.int32())])
        return u.with_columns(b).to_arrow().cast(target)

    def bucket_distinct(group: pa.Table) -> pa.Table:
        import polars as pl
        target = pa.schema([group.schema.field(k) for k in keys])
        return (pl.from_arrow(group.select(keys))
                .unique(subset=keys, keep="first", maintain_order=True)
                .to_arrow().cast(target))

    combined = ds.map_batches(combine_and_bucket, batch_format="pyarrow")
    return combined.groupby("_bucket").map_groups(bucket_distinct,
                                                 batch_format="pyarrow")


def distinct_prefilter(ds: "ray.data.Dataset", keys: list[str],
                       num_buckets: int | None = None
                       ) -> "ray.data.Dataset":
    """Global distinct that exchanges 8-BYTE ROW HASHES instead of full
    rows — for the low-duplicate regime (a webkg triple stream after
    local combining is >99.9% globally unique, yet the plain path
    sorts the full ~100 B/row payload all-to-all just to drop the
    remainder).

    1. local distinct per block + deterministic 64-bit row hash,
       materialized once (blocks stay put — no exchange).
    2. hashes only (tiny) shuffle to find globally-duplicated values.
    3. rows whose hash is NOT duplicated are globally unique — emitted
       straight from the local blocks, NO shuffle; only the (tiny)
       hash-duplicated remainder shuffles for an exact per-bucket
       distinct. A 64-bit collision between distinct rows merely sends
       both rows down the exact path — never wrong, just unlucky.

    Size-adaptive: if the duplicated-hash set exceeds
    KGFORGE_BROADCAST_LIMIT (high-dup corpora — Common Crawl exact-dup
    mass), it falls back to the streaming sort path over the already
    locally-combined rows, which is then the right tool.

    When it pays: on a MULTI-NODE cluster, where the exchange crosses
    the network and 8 B/row vs ~100 B/row is the bill. Measured on ONE
    node (4M triples, 16 CPUs) it is net-neutral-to-slightly-worse: the
    object-store 'shuffle' is shared-memory there, and the extra
    materialize barrier eats the savings — hence opt-in
    (KGFORGE_DISTINCT_PREFILTER=1 for the webkg flagship)."""
    import os

    import numpy as np

    if num_buckets is None:
        num_buckets = default_num_buckets()

    def local_hash(batch: pa.Table) -> pa.Table:
        import polars as pl
        u = pl.from_arrow(batch.select(keys)).unique(subset=keys,
                                                     keep="first",
                                                     maintain_order=True)
        h = u.hash_rows(seed=0).reinterpret(signed=True).rename("_h")
        target = pa.schema([batch.schema.field(k) for k in keys] +
                           [pa.field("_h", pa.int64())])
        return u.with_columns(h).to_arrow().cast(target)

    local = ds.map_batches(local_hash, batch_format="pyarrow").materialize()

    def proj(batch: pa.Table) -> pa.Table:
        h = batch["_h"].combine_chunks()
        hv = h.to_numpy(zero_copy_only=False)
        b = ((hv & 0x7FFFFFFF) % num_buckets).astype(np.int32)
        return pa.table({"_h": h, "_bucket": pa.array(b)})

    def dup_hashes(group: pa.Table) -> pa.Table:
        agg = group.group_by(["_h"]).aggregate([("_h", "count")])
        return (agg.filter(pc.greater(agg["_h_count"], 1))
                .select(["_h"]))

    dup_h: list[int] = []
    for b in (local.map_batches(proj, batch_format="pyarrow")
              .groupby("_bucket")
              .map_groups(dup_hashes, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        if "_h" in b.schema.names:
            dup_h.extend(b["_h"].to_pylist())
    limit = int(os.environ.get("KGFORGE_BROADCAST_LIMIT", 100_000))
    if len(dup_h) > limit:
        # high-dup corpus: stream the already-combined rows through the
        # sort path instead (rows are locally distinct, so the exchange
        # carries no local redundancy)
        return distinct(local.drop_columns(["_h"]), keys, num_buckets)
    dup_arr = np.sort(np.array(dup_h, dtype=np.int64))

    def split(keep_dup: bool):
        def fn(batch: pa.Table) -> pa.Table:
            h = batch["_h"].to_numpy(zero_copy_only=False)
            isdup = np.zeros(len(h), dtype=bool)
            if len(dup_arr):
                idx = np.searchsorted(dup_arr, h)
                idx[idx == len(dup_arr)] = 0
                isdup = dup_arr[idx] == h
            mask = isdup if keep_dup else ~isdup
            return batch.filter(pa.array(mask)).drop_columns(["_h"])
        return fn

    unique_part = local.map_batches(split(False), batch_format="pyarrow")
    if not len(dup_arr):
        return unique_part
    dup_part = distinct(local.map_batches(split(True),
                                          batch_format="pyarrow"),
                        keys, num_buckets)
    return unique_part.union(dup_part)


def dedup_triples(ds: "ray.data.Dataset",
                  domain: str | None = None,
                  prefilter: bool = False) -> "ray.data.Dataset":
    """Distinct set of (s,p,o_kind,o_lex,o_dt) triples.

    When ``domain`` is given, the domain prefix is stripped from the IRI
    positions (s — always an IRI — and o_lex only where o_kind='u') on
    the map side and re-added after the distinct — a pure transport
    optimization (~40% fewer bytes through the all-to-all exchange,
    which is the pipeline's scaling limiter). '\x01' marks stripped
    values; LITERAL lexical forms are never touched, so crawled text
    that happens to start with '\x01' or with the domain string cannot
    be corrupted (an IRI can never start with '\x01' — schemes are
    alphabetic). Semantics unchanged (verified by the same oracle
    comparisons).

    ``prefilter=True`` routes through ``distinct_prefilter`` (hash-only
    exchange; right for low-dup post-combine streams like webkg)."""
    d = distinct_prefilter if prefilter else distinct
    if not domain:
        return d(ds, TRIPLE_KEYS)
    strip, unstrip = domain_strip_transforms(domain)
    stripped = ds.map_batches(strip, batch_format="pyarrow")
    return d(stripped, TRIPLE_KEYS).map_batches(
        unstrip, batch_format="pyarrow")


def domain_strip_transforms(domain: str):
    """(strip, unstrip) batch fns for the domain-prefix transport
    optimization described in :func:`dedup_triples` — factored out so
    measurement tooling (``exchange_payload_report``) can weigh the
    exact stream the distinct exchange actually moves."""
    import pyarrow.compute as pc

    n = len(domain)

    def _iri_mask(batch: pa.Table, col: str):
        if col == "s":
            return None                      # subjects are always IRIs
        return pc.equal(batch["o_kind"].combine_chunks().cast(pa.string()),
                        "u")

    def strip(batch: pa.Table) -> pa.Table:
        for col in ("s", "o_lex"):
            arr = batch[col].combine_chunks().cast(pa.string())
            pref = pc.equal(pc.utf8_slice_codeunits(arr, 0, n), domain)
            iri = _iri_mask(batch, col)
            if iri is not None:
                pref = pc.and_(pref, iri)
            stripped = pc.binary_join_element_wise(
                pa.scalar("\x01"), pc.utf8_slice_codeunits(arr, n, 2**30), "")
            out = pc.if_else(pref, stripped, arr)
            batch = batch.set_column(batch.schema.get_field_index(col),
                                     col, out)
        return batch

    def unstrip(batch: pa.Table) -> pa.Table:
        for col in ("s", "o_lex"):
            arr = batch[col].combine_chunks().cast(pa.string())
            pref = pc.equal(pc.utf8_slice_codeunits(arr, 0, 1), "\x01")
            iri = _iri_mask(batch, col)
            if iri is not None:
                pref = pc.and_(pref, iri)
            restored = pc.binary_join_element_wise(
                pa.scalar(domain), pc.utf8_slice_codeunits(arr, 1, 2**30), "")
            out = pc.if_else(pref, restored, arr)
            batch = batch.set_column(batch.schema.get_field_index(col),
                                     col, out)
        return batch

    return strip, unstrip


def exchange_payload_report(ds: "ray.data.Dataset", keys: list[str],
                            num_buckets: int | None = None) -> dict:
    """Measurement companion to :func:`distinct_prefilter`: the byte
    volumes each global-distinct path pushes through the all-to-all
    exchange on THIS stream. On one node the object-store 'exchange' is
    shared memory, so the prefilter's payload reduction doesn't show up
    in wall time — this report is the number behind the multi-node
    claim, where exchange bytes cross the network.

    - ``plain_exchange_mib``: Arrow payload of the locally-combined key
      columns — what ``distinct``'s sort shuffle moves.
    - ``prefilter_exchange_mib``: 8 B/row of hashes plus the payload of
      rows whose hash is globally duplicated (the only full rows the
      prefilter shuffles).
    """
    import numpy as np
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def local_hash(batch: pa.Table) -> pa.Table:
        import polars as pl
        u = pl.from_arrow(batch.select(keys)).unique(subset=keys,
                                                     keep="first",
                                                     maintain_order=True)
        h = u.hash_rows(seed=0).reinterpret(signed=True).rename("_h")
        target = pa.schema([batch.schema.field(k) for k in keys] +
                           [pa.field("_h", pa.int64())])
        return u.with_columns(h).to_arrow().cast(target)

    local = ds.map_batches(local_hash, batch_format="pyarrow").materialize()

    def summarize(keep: np.ndarray | None = None):
        def fn(batch: pa.Table) -> pa.Table:
            sel = batch
            if keep is not None and len(keep):
                h = batch["_h"].to_numpy(zero_copy_only=False)
                idx = np.searchsorted(keep, h)
                idx[idx == len(keep)] = 0
                sel = batch.filter(pa.array(keep[idx] == h))
            sel = sel.select(keys).combine_chunks()
            return pa.table({
                "rows": pa.array([sel.num_rows], type=pa.int64()),
                "nbytes": pa.array([sel.nbytes], type=pa.int64())})
        return fn

    def totals(summary_ds) -> tuple[int, int]:
        rows = nbytes = 0
        for b in summary_ds.iter_batches(batch_format="pyarrow"):
            rows += sum(b["rows"].to_pylist())
            nbytes += sum(b["nbytes"].to_pylist())
        return rows, nbytes

    rows, payload = totals(local.map_batches(summarize(),
                                             batch_format="pyarrow"))

    # duplicated-hash detection — same shape as prefilter stage 2
    def proj(batch: pa.Table) -> pa.Table:
        h = batch["_h"].combine_chunks()
        hv = h.to_numpy(zero_copy_only=False)
        b = ((hv & 0x7FFFFFFF) % num_buckets).astype(np.int32)
        return pa.table({"_h": h, "_bucket": pa.array(b)})

    def dup_hashes(group: pa.Table) -> pa.Table:
        agg = group.group_by(["_h"]).aggregate([("_h", "count")])
        return (agg.filter(pc.greater(agg["_h_count"], 1))
                .select(["_h"]))

    dup_h: list[int] = []
    for b in (local.map_batches(proj, batch_format="pyarrow")
              .groupby("_bucket")
              .map_groups(dup_hashes, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        if "_h" in b.schema.names:
            dup_h.extend(b["_h"].to_pylist())
    dup_arr = np.sort(np.array(dup_h, dtype=np.int64))
    dup_rows, dup_payload = (0, 0) if not len(dup_arr) else totals(
        local.map_batches(summarize(dup_arr), batch_format="pyarrow"))

    hash_bytes = rows * 8
    pre = hash_bytes + dup_payload
    return {
        "rows_local_distinct": rows,
        "dup_hash_rows": dup_rows,
        "plain_exchange_mib": round(payload / 2**20, 2),
        "prefilter_hash_mib": round(hash_bytes / 2**20, 2),
        "prefilter_dup_payload_mib": round(dup_payload / 2**20, 2),
        "prefilter_exchange_mib": round(pre / 2**20, 2),
        "exchange_savings_pct": round(100 * (1 - pre / payload), 1)
        if payload else 0.0,
    }
