"""Document-level deduplication family: exact, MinHash+LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Scale shapes (all shuffle-aware):
- exact: hash column per batch (combiner) → groupby(hash) aggregate —
  one shuffle over pre-hashed rows, skew-free (key is a hash).
- MinHash+LSH: per-batch vectorized shingle→minhash→bands → explode to
  (band, band_hash, doc) rows → groupby(band, band_hash) → candidate
  pairs per bucket → exact-Jaccard verify per pair. The only all-to-all
  is over (band, hash) rows; buckets are tiny by construction.
- SimHash: 64-bit signature per doc, 4×16-bit band blocking for
  Hamming ≤ 3 candidates, verify by popcount.
- embedding cosine: see ops/ann.py.

Determinism: fixed hash constants (crc32 / splitmix-style mixing), no
process-salted hash(), no randomness → identical output at any
parallelism (resume/scaling requirement).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Min

# ------------------------------------------------------------------ exact
class Md5Key:
    def __init__(self, col: str):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch[self.col].to_pylist()
        h = pa.array([hashlib.md5(v.encode()).hexdigest() for v in vals],
                     type=pa.string())
        return batch.append_column("h", h)


def exact_dedup(sf_dir: str, col: str = "text") -> "ray.data.Dataset":
    """One row per distinct text: (h, doc_id=min, n_dups). Matches
    rdflib-set semantics generalized to documents (first-writer-wins
    replaced by deterministic min-key-wins)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", col])
    return (ds.map_batches(Md5Key(col), batch_format="pyarrow")
            .groupby("h")
            .aggregate(Min("doc_id", alias_name="doc_id"),
                       Count(alias_name="n_dups")))


EXACT_DEDUP_SQL = """
SELECT md5(text) AS h, CAST(min(doc_id) AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM documents GROUP BY md5(text)
"""


# -------------------------------------------------------------- MinHash/LSH
_MERSENNE = (1 << 61) - 1


def _perm_params(n_perm: int) -> tuple[np.ndarray, np.ndarray]:
    # deterministic "random" odd multipliers/offsets via splitmix64-style
    # mixing of the permutation index (no RNG state, resume-safe)
    idx = np.arange(1, n_perm + 1, dtype=np.uint64)
    z = (idx * np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    a = ((z ^ (z >> np.uint64(31))) % np.uint64(_MERSENNE - 1)) + np.uint64(1)
    z2 = ((idx + np.uint64(7919)) * np.uint64(0xD6E8FEB86659FD93))
    z2 = (z2 ^ (z2 >> np.uint64(29))) * np.uint64(0xFF51AFD7ED558CCD)
    b = (z2 ^ (z2 >> np.uint64(32))) % np.uint64(_MERSENNE)
    return a.astype(np.uint64), b.astype(np.uint64)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    import zlib
    toks = [t for t in text.split(" ") if t]
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array([zlib.crc32(g.encode()) for g in grams],
                              dtype=np.uint64))


class MinHashBands:
    """doc -> (band, band_hash, doc_id) rows. n_perm minhashes from one
    crc32 shingle-hash set via (a*x+b) mod p universal hashing; bands of
    r rows concatenated+hashed."""

    def __init__(self, n_perm: int = 64, bands: int = 16, k: int = 3):
        assert n_perm % bands == 0
        self.n_perm, self.bands, self.k = n_perm, bands, k
        self.r = n_perm // bands
        self.a, self.b = _perm_params(n_perm)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        # (n_perm, n_shingles) without materializing when large: chunked
        vals = (np.multiply.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, bhashes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            sig = self.signature(text)
            for bi in range(self.bands):
                chunk = sig[bi * self.r:(bi + 1) * self.r]
                h = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                doc_ids.append(doc_id)
                bands.append(bi)
                bhashes.append(h)
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "band": pa.array(bands, type=pa.int32()),
            "band_hash": pa.array(bhashes, type=pa.string()),
        })


def _bucket_pairs(batch) -> pa.Table:
    """map_groups fn: all doc pairs inside one (band, band_hash) bucket."""
    ids = sorted(batch["doc_id"].to_pylist())
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.table({"a": pa.array(a, type=pa.int64()),
                     "b": pa.array(b, type=pa.int64())})


def minhash_candidates(sf_dir: str, n_perm: int = 64, bands: int = 16,
                       k: int = 3) -> "ray.data.Dataset":
    """Distinct candidate pairs from LSH band buckets."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    bands_ds = ds.map_batches(MinHashBands(n_perm, bands, k),
                              batch_format="pyarrow")
    pairs = bands_ds.groupby(["band", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow")
    from ..stages.dedup import distinct
    return distinct(pairs, ["a", "b"])


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(_shingle_hashes(text_a, k)), set(_shingle_hashes(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup(sf_dir: str, threshold: float = 0.7, n_perm: int = 64,
                  bands: int = 16, k: int = 3) -> "ray.data.Dataset":
    """Verified near-dup pairs (a, b, jaccard_pct:int). The verify stage
    fetches pair texts via a broadcast id→text map built from the SAME
    dataset — valid while near-dup candidate mass ≪ corpus; at larger
    dup mass swap in a hash-partitioned join keyed on doc_id."""
    import ray
    cands = minhash_candidates(sf_dir, n_perm, bands, k)
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    # candidate ids only (small) -> broadcast text lookup
    need: set[int] = set()
    for b in cands.iter_batches(batch_format="pyarrow"):
        need.update(b["a"].to_pylist())
        need.update(b["b"].to_pylist())
    need_ref = ray.put(need)

    def keep_needed(batch: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        mask = pa.array([i in wanted for i in batch["doc_id"].to_pylist()])
        return batch.filter(mask)

    texts = {}
    for b in docs.map_batches(keep_needed,
                              batch_format="pyarrow").iter_batches(
                                  batch_format="pyarrow"):
        texts.update(zip(b["doc_id"].to_pylist(), b["text"].to_pylist()))
    text_ref = ray.put(texts)

    def verify(batch: pa.Table) -> pa.Table:
        t = ray.get(text_ref)
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        out_a, out_b, out_j = [], [], []
        for x, y in zip(a, b):
            j = ngram_jaccard(t[x], t[y], k)
            if j >= threshold:
                out_a.append(x)
                out_b.append(y)
                out_j.append(int(round(j * 100)))
        return pa.table({"a": pa.array(out_a, type=pa.int64()),
                         "b": pa.array(out_b, type=pa.int64()),
                         "jaccard_pct": pa.array(out_j, type=pa.int64())})

    return cands.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------- SimHash
class SimHash:
    """64-bit simhash over crc32 token hashes; emits (doc_id, simhash,
    band16_0..3) for Hamming-≤3 blocking."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib
        ids = batch["doc_id"].to_pylist()
        sims = np.zeros(len(ids), dtype=np.uint64)
        for i, text in enumerate(batch["text"].to_pylist()):
            toks = [t for t in text.split(" ") if t]
            if not toks:
                continue
            hs = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64)
            hs = (hs << np.uint64(32)) | np.array(
                [zlib.crc32((t + "#").encode()) for t in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) &
                    np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            sims[i] = np.packbits((v > 0)[::-1]).view(">u8")[0]
        out = {"doc_id": batch["doc_id"],
               "simhash": pa.array(sims.astype(np.int64), type=pa.int64())}
        for b in range(4):
            out[f"band{b}"] = pa.array(
                ((sims >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64),
                type=pa.int64())
        return pa.table(out)


def simhash_signatures(sf_dir: str) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(SimHash(), batch_format="pyarrow")


def simhash_dedup(sf_dir: str, max_hamming: int = 3) -> "ray.data.Dataset":
    """Near-dup pairs by simhash: band-blocked candidates (pigeonhole: a
    ≤3-bit-different pair shares ≥1 of 4 16-bit bands) verified by
    popcount."""
    sigs = simhash_signatures(sf_dir)

    def pairs_from_bucket(batch) -> pa.Table:
        rows = sorted(zip(batch["doc_id"].to_pylist(),
                          batch["simhash"].to_pylist()))
        a, b, d = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                x = (rows[i][1] ^ rows[j][1]) & 0xFFFFFFFFFFFFFFFF
                ham = bin(x).count("1")
                if ham <= max_hamming:
                    a.append(rows[i][0])
                    b.append(rows[j][0])
                    d.append(ham)
        return pa.table({"a": pa.array(a, type=pa.int64()),
                         "b": pa.array(b, type=pa.int64()),
                         "hamming": pa.array(d, type=pa.int64())})

    parts = []
    for band in range(4):
        parts.append(
            sigs.groupby(f"band{band}").map_groups(pairs_from_bucket,
                                                   batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    from ..stages.dedup import distinct
    return distinct(out, ["a", "b", "hamming"])
