"""Bloom-prefiltered incremental ingest: which incoming docs are NEW
vs an already-ingested prior corpus.

The result is EXACT — the bloom filter is a prefilter, never the
verdict. Incoming docs whose k probe bits are not all set are
*definitely* new (bloom has no false negatives) and skip the shuffle
entirely; only the bloom-positive residue (true dups + the ~2^-k
false-positive sliver of genuinely-new docs) pays the exact
hash-partitioned anti-join against the prior corpus. At a steady-state
crawl where most incoming docs are new, the prefilter removes almost
the whole probe side from the exchange; when most are dups, the
anti-join side is what shrinks. Either way the expensive path only
sees the small side.

Distribution shape (nothing unbounded on the driver):

* BUILD — prior texts hash per-unique (md5, same oracle-matching
  digest the exact-dedup op uses) into k = 7 double-hashed bit
  positions (Kirsch–Mitzenmacher: pos_i = h1 + i*h2 mod m); positions
  shuffle ONCE bucketed by high bits into ``n_parts`` sub-bitmap
  builders; each emits one m/8/n_parts-byte chunk; the driver
  concatenates n_parts binary rows (total m/8 bytes) and ``ray.put``s
  the bitmap once.
* PROBE — a map_batches stage reads the bitmap from the object store
  (zero-copy per node) and tests all k bits vectorized in numpy.
* The bitmap is sized at ``bits_per_key`` × prior cardinality, capped
  by KGFORGE_BLOOM_MAX_BITS (default 2^33 = 1 GiB of bits). Above the
  cap the op degrades to the plain exact anti-join (logged) — at that
  scale a real deployment shards the bloom per hash-range partition,
  which is exactly what the sub-bitmap build already produces; only
  the broadcast step assumes it fits one object.

The sandbox derives prior/incoming deterministically from documents
(prior = doc_id % 4 != 0, incoming = the rest), which the oracle
mirrors as a NOT IN subquery.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..sources.readers import read_table

BLOOM_K = 7
BLOOM_BITS_PER_KEY = 16
BLOOM_MAX_BITS = int(os.environ.get("KGFORGE_BLOOM_MAX_BITS", 1 << 33))
_PRIOR_MOD = 4  # doc_id % 4 != 0 -> prior corpus


def _digest_halves(texts: list[str | None]) -> tuple[np.ndarray, np.ndarray]:
    """md5 per value -> (h1, h2) uint64 halves; h2 forced odd so the
    double-hash probe sequence cycles through all of a power-of-two m."""
    h1 = np.empty(len(texts), dtype=np.uint64)
    h2 = np.empty(len(texts), dtype=np.uint64)
    for i, v in enumerate(texts):
        d = hashlib.md5((v or "").encode()).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little") | 1
    return h1, h2


def _positions(h1: np.ndarray, h2: np.ndarray, m: int) -> np.ndarray:
    """k probe positions per key, shape (len, k) — uint64 wraparound is
    the intended mod-2^64 arithmetic, then mod power-of-two m."""
    i = np.arange(BLOOM_K, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(m - 1)


class _Md5Hex:
    """(doc_id, text) -> (doc_id, h) with md5 hex per UNIQUE text."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            batch["text"].combine_chunks().cast(pa.string()))
        uniq = pa.array([hashlib.md5((v or "").encode()).hexdigest()
                         for v in enc.dictionary.to_pylist()],
                        type=pa.string())
        return pa.table({"doc_id": batch["doc_id"],
                         "h": uniq.take(enc.indices)})


def _build_bitmap(prior: "ray.data.Dataset", m: int,
                  n_parts: int = 32) -> bytes:
    """Distributed OR-fold: positions bucket-shuffle into n_parts
    sub-bitmaps; driver sees n_parts rows of m/8/n_parts bytes."""
    part_bits = m // n_parts  # m is a power of two, n_parts divides it
    shift = int(part_bits).bit_length() - 1

    def to_positions(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            batch["text"].combine_chunks().cast(pa.string()))
        h1, h2 = _digest_halves(enc.dictionary.to_pylist())
        pos = np.unique(_positions(h1, h2, m).ravel())
        return pa.table({
            "pos": pa.array(pos.astype(np.int64)),
            "_bucket": pa.array((pos >> np.uint64(shift)).astype(np.int32)),
        })

    def to_chunk(group: pa.Table) -> pa.Table:
        bucket = group["_bucket"][0].as_py()
        local = (group["pos"].combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.uint64)
            - np.uint64(bucket) * np.uint64(part_bits))
        arr = np.zeros(part_bits // 8, dtype=np.uint8)
        np.bitwise_or.at(arr, (local >> np.uint64(3)).astype(np.int64),
                         np.left_shift(np.uint8(1),
                                       (local & np.uint64(7)).astype(np.uint8)))
        return pa.table({"bucket": pa.array([bucket], pa.int32()),
                         "bits": pa.array([arr.tobytes()], pa.binary())})

    rows = (prior.map_batches(to_positions, batch_format="pyarrow")
            .groupby("_bucket").map_groups(to_chunk, batch_format="pyarrow")
            .take_all())
    bitmap = bytearray(m // 8)
    for r in rows:
        b = r["bucket"]
        bitmap[b * (part_bits // 8):(b + 1) * (part_bits // 8)] = r["bits"]
    return bytes(bitmap)


class _BloomProbe:
    """Actor-pool probe: bitmap fetched ONCE per actor in __init__
    (zero-copy plasma read per node), k bit tests vectorized."""

    def __init__(self, bitmap_ref, m: int):
        raw = (ray.get(bitmap_ref)
               if isinstance(bitmap_ref, ray.ObjectRef) else bitmap_ref)
        self.bits = np.frombuffer(raw, dtype=np.uint8)
        self.m = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            batch["text"].combine_chunks().cast(pa.string()))
        texts = enc.dictionary.to_pylist()
        h1, h2 = _digest_halves(texts)
        pos = _positions(h1, h2, self.m)
        hit = (self.bits[(pos >> np.uint64(3)).astype(np.int64)]
               >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        maybe_uniq = hit.all(axis=1)
        maybe = pa.array(maybe_uniq).take(enc.indices)
        hexes = pa.array([hashlib.md5((v or "").encode()).hexdigest()
                          for v in texts], type=pa.string()).take(enc.indices)
        return pa.table({"doc_id": batch["doc_id"], "h": hexes,
                         "_maybe": maybe})


def incremental_new_docs(sf_dir: str,
                         bits_per_key: int = BLOOM_BITS_PER_KEY,
                         max_bits: int | None = None
                         ) -> "ray.data.Dataset":
    """(doc_id, h) of incoming docs whose text is NOT in the prior
    corpus. Exact (bloom prefilter + anti-join confirm on the
    bloom-positive residue only)."""
    from .relational import hash_anti_join

    cols = ["doc_id", "text"]
    base = read_table(sf_dir, "documents", columns=cols)

    def keep_prior(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().cast(pa.int64())
        return b.filter(pc.not_equal(pc.bit_wise_and(
            ids, pa.scalar(_PRIOR_MOD - 1, pa.int64())), 0))

    def keep_incoming(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().cast(pa.int64())
        return b.filter(pc.equal(pc.bit_wise_and(
            ids, pa.scalar(_PRIOR_MOD - 1, pa.int64())), 0))

    prior = base.map_batches(keep_prior, batch_format="pyarrow")
    incoming = base.map_batches(keep_incoming, batch_format="pyarrow")

    n_prior = prior.count()
    want_bits = max(1 << 10, 1 << int(n_prior * bits_per_key - 1)
                    .bit_length()) if n_prior else 1 << 10
    prior_hashes = prior.map_batches(_Md5Hex(), batch_format="pyarrow")

    cap = BLOOM_MAX_BITS if max_bits is None else max_bits
    if want_bits > cap:
        # documented degradation: shard-the-bloom territory; exact
        # anti-join is the always-correct fallback
        print(f"[kgforge.bloom] prior={n_prior} needs {want_bits} bits "
              f"> cap {cap}; using plain anti-join")
        probe = incoming.map_batches(_Md5Hex(), batch_format="pyarrow")
        return hash_anti_join(probe, prior_hashes, "h", "h")

    m = want_bits
    bitmap_ref = ray.put(_build_bitmap(prior, m))
    probed = incoming.map_batches(
        _BloomProbe, fn_constructor_args=(bitmap_ref, m),
        batch_format="pyarrow", concurrency=(1, 8))

    def definite(b: pa.Table) -> pa.Table:
        return b.filter(pc.invert(b["_maybe"].combine_chunks())) \
            .drop_columns(["_maybe"])

    def candidates(b: pa.Table) -> pa.Table:
        return b.filter(b["_maybe"].combine_chunks()) \
            .drop_columns(["_maybe"])

    definite_new = probed.map_batches(definite, batch_format="pyarrow")
    confirmed_new = hash_anti_join(
        probed.map_batches(candidates, batch_format="pyarrow"),
        prior_hashes, "h", "h")
    return definite_new.union(confirmed_new)


def incremental_new_docs_sql() -> str:
    return f"""
SELECT doc_id, md5(text) AS h FROM documents
WHERE doc_id % {_PRIOR_MOD} = 0
  AND md5(text) NOT IN (SELECT md5(text) FROM documents
                        WHERE doc_id % {_PRIOR_MOD} != 0)
"""
