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

from ..sources.readers import read_table
from ray.data.aggregate import Count, Min

# ------------------------------------------------------------------ exact
class Md5Key:
    """md5 per UNIQUE value (dictionary-encoded): duplicate-heavy
    corpora hash each distinct text once per batch, not once per row.
    (md5 itself matches the DuckDB oracle and has no vectorized kernel.)"""

    def __init__(self, col: str):
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(
            batch[self.col].combine_chunks().cast(pa.string()))
        uniq = pa.array([hashlib.md5(v.encode()).hexdigest()
                         if v is not None else None
                         for v in enc.dictionary.to_pylist()],
                        type=pa.string())
        return batch.append_column("h", uniq.take(enc.indices))


def exact_dedup(sf_dir: str, col: str = "text") -> "ray.data.Dataset":
    """One row per distinct text: (h, doc_id=min, n_dups). Matches
    rdflib-set semantics generalized to documents (first-writer-wins
    replaced by deterministic min-key-wins)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", col])
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


_MIX = [np.uint64(0x9E3779B97F4A7C15), np.uint64(0xBF58476D1CE4E5B9),
        np.uint64(0x94D049BB133111EB), np.uint64(0xD6E8FEB86659FD93)]


def _crc_per_token(tokens: pa.Array) -> np.ndarray:
    """crc32 of each token, computed once per UNIQUE token (corpus
    vocabularies are small relative to token count)."""
    import zlib
    enc = pc.dictionary_encode(tokens)
    uniq = np.array([zlib.crc32(t.encode()) if t is not None else 0
                     for t in enc.dictionary.to_pylist()], dtype=np.uint64)
    return uniq[enc.indices.to_numpy(zero_copy_only=False)]


def _mix_kgram(th: np.ndarray, k: int) -> np.ndarray:
    """Rolling k-gram hash over a flat token-hash array: deterministic
    multiply-xor mix of k consecutive hashes (wrapping uint64 semantics
    — not a universal hash, but stable, seedless, resume-safe)."""
    if len(th) < k:
        return np.zeros(0, dtype=np.uint64)
    g = th[: len(th) - k + 1] * _MIX[0]
    for j in range(1, k):
        g = (g ^ th[j : len(th) - k + 1 + j]) * _MIX[j % len(_MIX)]
    return g


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Gram-hash set of one doc (shared by signature and Jaccard verify)."""
    import zlib
    toks = [t for t in text.split(" ") if t]
    th = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64)
    if 0 < len(th) < k:
        th = np.pad(th, (0, k - len(th)))  # short doc: single padded gram
    return np.unique(_mix_kgram(th, k))


class MinHashBands:
    """doc -> (band, band_hash, doc_id) rows, fully vectorized over the
    batch: per-unique-token crc32 → flat rolling k-gram mix with
    doc-boundary masking → (a*x+b) mod p minhash via
    ``np.minimum.reduceat`` over doc slices → arithmetic band combine.
    No per-doc Python loop."""

    def __init__(self, n_perm: int = 64, bands: int = 16, k: int = 3):
        assert n_perm % bands == 0
        self.n_perm, self.bands, self.k = n_perm, bands, k
        self.r = n_perm // bands
        self.a, self.b = _perm_params(n_perm)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.n_perm, dtype=np.uint64)
        vals = (np.multiply.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def _signatures_batch(self, texts: pa.Array) -> np.ndarray:
        split = pc.split_pattern(texts, pattern=" ")
        flat = split.flatten()
        nonempty = pc.not_equal(flat, "")
        flat = flat.filter(nonempty)
        parents = pc.list_parent_indices(split).filter(nonempty)
        th = _crc_per_token(flat)
        par = parents.to_numpy(zero_copy_only=False)
        n_docs = len(texts)
        counts = np.bincount(par, minlength=n_docs)
        ends = np.cumsum(counts)
        starts = ends - counts
        k = self.k
        grams = _mix_kgram(th, k) if len(th) >= k else np.zeros(0, np.uint64)
        # valid gram start positions: those not crossing a doc boundary
        pos = np.arange(len(grams))
        gram_doc = par[pos] if len(grams) else np.zeros(0, np.int64)
        valid = (pos + k - 1 < ends[gram_doc]) if len(grams) else np.zeros(0, bool)
        grams, gram_doc = grams[valid], gram_doc[valid]
        sigs = np.full((n_docs, self.n_perm), np.uint64(0), dtype=np.uint64)
        if len(grams):
            # reduceat needs contiguous doc runs — grams are already in
            # doc order because tokens are. Reduceat ONLY over docs that
            # have grams: a start index == len(grams) (trailing gramless
            # docs) would otherwise split off the previous doc's final
            # gram and truncate its signature.
            g_counts = np.bincount(gram_doc, minlength=n_docs)
            have = g_counts > 0
            rs = (np.cumsum(g_counts) - g_counts)[have]
            vals = (self.a[:, None] * grams[None, :] + self.b[:, None]) % _MERSENNE
            sigs[have] = np.minimum.reduceat(vals, rs, axis=1).T
        # short docs (< k tokens) fall back to the padded-gram scalar path
        short = counts < k
        if short.any():
            txts = texts.to_pylist()
            for i in np.flatnonzero(short):
                sigs[i] = self.signature(txts[i])
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].combine_chunks().cast(pa.string())
        n = len(texts)
        sigs = self._signatures_batch(texts)
        # arithmetic band combine (vectorized md5 replacement)
        resh = sigs.reshape(n, self.bands, self.r)
        bh = resh[:, :, 0] * _MIX[0]
        for j in range(1, self.r):
            bh = (bh ^ resh[:, :, j]) * _MIX[j % len(_MIX)]
        doc_ids = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), self.bands)
        band_idx = np.tile(np.arange(self.bands, dtype=np.int32), n)
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "band": pa.array(band_idx, type=pa.int32()),
            "band_hash": pa.array(bh.reshape(-1).astype(np.int64),
                                  type=pa.int64()),
        })


def pair_run_cap() -> int:
    """Per-run all-pairs bound for LSH buckets. A degenerate band bucket
    (boilerplate pages, near-empty docs — tens of thousands sharing one
    band hash) would emit m(m-1)/2 pairs; runs longer than this cap
    degrade to STAR edges (min-id -> each other member, m-1 edges),
    which preserves connected-component structure for the clustering
    consumers while bounding output at O(m). Env override:
    KGFORGE_PAIR_RUN_CAP (0 = unlimited)."""
    import os
    return int(os.environ.get("KGFORGE_PAIR_RUN_CAP", 1024))


def dup_key_pairs(ds: "ray.data.Dataset", key_cols: list[str],
                  id_col: str, num_buckets: int = 64,
                  star_only: bool = False) -> "ray.data.Dataset":
    """(a, b) id pairs sharing identical ``key_cols`` values; runs
    longer than ``pair_run_cap()`` emit star edges with a logged
    truncation instead of the quadratic all-pairs set. With
    ``star_only`` every run emits ONLY its star edges (min-id -> each
    other member) — the group-map representation, O(run) by design.

    High-cardinality keys never become Ray groups (the sort-aggregate
    iterates groups in Python): rows shuffle by ``hash(key) %
    num_buckets`` and each bucket finds its duplicate-key runs with one
    numpy lexsort — Python touches only the duplicated runs, and pair
    emission is vectorized per run."""
    def bucketize(batch: pa.Table) -> pa.Table:
        import polars as pl
        sel = batch.select(key_cols + [id_col])
        h = pl.from_arrow(sel.select(key_cols)).hash_rows(seed=0)
        bucket = (h % num_buckets).cast(pl.Int32).to_numpy()
        return sel.append_column("_bucket", pa.array(bucket))

    cap = pair_run_cap()   # driver-time read: workers may predate the env

    def bucket_pairs(group: pa.Table) -> pa.Table:
        df = group.select(key_cols + [id_col]).to_pandas()
        df = df.sort_values(key_cols + [id_col], kind="mergesort")
        keys = df[key_cols].astype(str).agg("\x00".join, axis=1).values
        ids = df[id_col].values
        # run boundaries over sorted keys
        change = np.empty(len(keys), dtype=bool)
        if len(keys):
            change[0] = True
            change[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(keys))
        a_parts, b_parts = [], []
        capped_runs = suppressed = 0
        for s, e in zip(starts, ends):
            m = e - s
            if m <= 1:
                continue
            run = ids[s:e]
            if star_only:
                a_parts.append(np.broadcast_to(run[0], m - 1))
                b_parts.append(run[1:])
            elif cap and m > cap:
                # star edges: run-min -> every other member
                capped_runs += 1
                suppressed += m * (m - 1) // 2 - (m - 1)
                a_parts.append(np.broadcast_to(run[0], m - 1))
                b_parts.append(run[1:])
            else:
                iu, ju = np.triu_indices(m, k=1)
                a_parts.append(run[iu])
                b_parts.append(run[ju])
        if capped_runs:
            import sys

            from ..state import counters
            print(f"[kgforge] dup_key_pairs: {capped_runs} run(s) over "
                  f"cap={cap} degraded to star edges "
                  f"({suppressed} all-pairs edges suppressed; connectivity "
                  f"preserved)", file=sys.stderr)
            counters.inc("dedup.pair_runs_star_capped", capped_runs)
            counters.inc("dedup.pair_edges_suppressed", suppressed)
        a_out = np.concatenate(a_parts) if a_parts else np.zeros(0, np.int64)
        b_out = np.concatenate(b_parts) if b_parts else np.zeros(0, np.int64)
        return pa.table({"a": pa.array(a_out.astype(np.int64),
                                       type=pa.int64()),
                         "b": pa.array(b_out.astype(np.int64),
                                       type=pa.int64())})

    return (ds.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(bucket_pairs, batch_format="pyarrow"))


def minhash_candidates(docs: "ray.data.Dataset", n_perm: int = 64,
                       bands: int = 16, k: int = 3) -> "ray.data.Dataset":
    """Distinct candidate pairs from LSH band buckets over a
    (doc_id, text) dataset."""
    bands_ds = docs.map_batches(MinHashBands(n_perm, bands, k),
                                batch_format="pyarrow")
    pairs = dup_key_pairs(bands_ds, ["band", "band_hash"], "doc_id")
    from ..stages.dedup import distinct
    return distinct(pairs, ["a", "b"])


def exact_group_members(docs: "ray.data.Dataset", col: str = "text"
                        ) -> "ray.data.Dataset":
    """(a=rep, b=member) star edges per exact-duplicate text group
    (rep = min doc_id; one row per NON-rep member). Linear in the dup
    mass — the group-map representation, never all-pairs. Texts are
    dropped before the shuffle; only (md5, doc_id) rows move."""
    keyed = (docs.map_batches(Md5Key(col), batch_format="pyarrow")
             .select_columns(["h", "doc_id"]))
    return dup_key_pairs(keyed, ["h"], "doc_id", star_only=True)


def _without_members(docs: "ray.data.Dataset", gm: "ray.data.Dataset",
                     n_members: int) -> "ray.data.Dataset":
    """Docs minus exact-dup members (reps stay). Size-adaptive: bounded
    broadcast id-set below the row limit, else a hash-partitioned
    left-outer anti-join — nothing unbounded on the driver."""
    from ..stages.canonicalize import (SANITIZE_BATCH, broadcast_row_limit,
                                       default_shuffle_partitions)
    if n_members <= broadcast_row_limit():
        member_ids: set[int] = set()
        for b in gm.iter_batches(batch_format="pyarrow"):
            member_ids.update(b["b"].to_pylist())
        arr = pa.array(sorted(member_ids), type=pa.int64())
        return docs.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t["doc_id"],
                                                  value_set=arr))),
            batch_format="pyarrow")
    mem = gm.map_batches(
        lambda t: pa.table({"_member": t["b"],
                            "_dupflag": pa.array(
                                np.ones(t.num_rows, np.int8))}),
        batch_format="pyarrow", batch_size=SANITIZE_BATCH)
    j = docs.join(mem, join_type="left_outer",
                  num_partitions=default_shuffle_partitions(),
                  on=("doc_id",), right_on=("_member",))

    def keep_unmatched(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t["_dupflag"]))
        return t.drop_columns([c for c in ("_dupflag", "_member")
                               if c in t.schema.names])

    return j.map_batches(keep_unmatched, batch_format="pyarrow",
                         batch_size=SANITIZE_BATCH)


def _expand_exact_groups(verified: "ray.data.Dataset",
                         gm: "ray.data.Dataset", n_members: int
                         ) -> "ray.data.Dataset":
    """Map verified REP-level near-dup pairs back to member-level pairs.

    Identical texts have identical signatures and Jaccard, so the
    expansion is EXACT: within-group pairs carry jaccard_pct=100 and a
    cross pair (x, y) inherits its rep pair's jaccard. Runs/products
    over ``pair_run_cap()`` degrade to the star/rep representation with
    a logged truncation (connectivity preserved for the clustering
    consumers). Beyond KGFORGE_GROUP_BROADCAST_LIMIT members (own knob,
    deliberately independent of KGFORGE_BROADCAST_LIMIT so join-forcing
    tests keep exact expansion) the star representation is used
    outright — at that dup mass the all-pairs list is itself quadratic
    and the clusters path is the right consumer."""
    import os
    import sys

    import ray

    from ..state import counters
    cap = pair_run_cap()
    limit = int(os.environ.get("KGFORGE_GROUP_BROADCAST_LIMIT", 100_000))
    if n_members > limit:
        print(f"[kgforge] minhash exact-dup mass ({n_members} members) "
              f"exceeds the broadcast limit: emitting star within-group "
              f"edges + rep-level near-dup pairs (connectivity-exact, "
              f"pair-list truncated)", file=sys.stderr)
        counters.inc("minhash.group_broadcast_exceeded", 1)
        counters.inc("minhash.group_members_star_only", n_members)
        within_star = gm.map_batches(
            lambda t: pa.table({
                "a": t["a"], "b": t["b"],
                "jaccard_pct": pa.array(
                    np.full(t.num_rows, 100, np.int64))}),
            batch_format="pyarrow")
        return verified.union(within_star)

    groups: dict[int, list[int]] = {}
    for b in gm.iter_batches(batch_format="pyarrow"):
        for r, mbr in zip(b["a"].to_pylist(), b["b"].to_pylist()):
            groups.setdefault(r, []).append(mbr)
    wa, wb = [], []
    capped = 0
    for r, members in groups.items():
        ids = sorted([r] + members)
        m = len(ids)
        if cap and m > cap:
            capped += 1
            wa.extend(ids[0] for _ in range(m - 1))
            wb.extend(ids[1:])
        else:
            iu, ju = np.triu_indices(m, k=1)
            arr = np.asarray(ids, dtype=np.int64)
            wa.extend(arr[iu].tolist())
            wb.extend(arr[ju].tolist())
    if capped:
        print(f"[kgforge] minhash: {capped} exact-dup group(s) over "
              f"cap={cap} emitted as star edges", file=sys.stderr)
        counters.inc("minhash.exact_groups_star_capped", capped)
    within = ray.data.from_arrow(pa.table({
        "a": pa.array(wa, type=pa.int64()),
        "b": pa.array(wb, type=pa.int64()),
        "jaccard_pct": pa.array(np.full(len(wa), 100, np.int64),
                                type=pa.int64())}))
    ref = ray.put(groups)

    def expand(batch: pa.Table) -> pa.Table:
        g = ray.get(ref)
        a_out, b_out, j_out = [], [], []
        trunc = 0
        for a, b_, jv in zip(batch["a"].to_pylist(),
                             batch["b"].to_pylist(),
                             batch["jaccard_pct"].to_pylist()):
            A = [a] + g.get(a, [])
            B = [b_] + g.get(b_, [])
            if cap and len(A) * len(B) > cap:
                trunc += 1
                a_out.append(a)
                b_out.append(b_)
                j_out.append(jv)
                continue
            for x in A:
                for y in B:
                    lo, hi = (x, y) if x < y else (y, x)
                    a_out.append(lo)
                    b_out.append(hi)
                    j_out.append(jv)
        if trunc:
            from ..state import counters as _counters
            print(f"[kgforge] minhash: {trunc} cross-group expansion(s) "
                  f"over cap={cap} kept as rep pairs", file=sys.stderr)
            _counters.inc("minhash.cross_expansions_rep_capped", trunc)
        return pa.table({"a": pa.array(a_out, type=pa.int64()),
                         "b": pa.array(b_out, type=pa.int64()),
                         "jaccard_pct": pa.array(j_out, type=pa.int64())})

    return verified.map_batches(expand, batch_format="pyarrow").union(within)


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = set(_shingle_hashes(text_a, k)), set(_shingle_hashes(text_b, k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _shingle_sets_batch(texts: pa.Array, k: int) -> list[np.ndarray]:
    """UNIQUE k-gram hash set per text, vectorized over the batch (same
    flat crc→rolling-mix machinery as MinHashBands; docs shorter than k
    tokens fall back to the scalar padded-gram spec)."""
    split = pc.split_pattern(texts, pattern=" ")
    flat = split.flatten()
    nonempty = pc.not_equal(flat, "")
    flat = flat.filter(nonempty)
    parents = pc.list_parent_indices(split).filter(nonempty)
    th = _crc_per_token(flat)
    par = parents.to_numpy(zero_copy_only=False)
    n = len(texts)
    counts = np.bincount(par, minlength=n)
    ends = np.cumsum(counts)
    starts = ends - counts
    grams = _mix_kgram(th, k) if len(th) >= k else np.zeros(0, np.uint64)
    pos = np.arange(len(grams))
    gram_doc = par[pos] if len(grams) else np.zeros(0, np.int64)
    valid = (pos + k - 1 < ends[gram_doc]) if len(grams) else np.zeros(0, bool)
    grams, gram_doc = grams[valid], gram_doc[valid]
    g_counts = np.bincount(gram_doc, minlength=n)
    g_ends = np.cumsum(g_counts)
    g_starts = g_ends - g_counts
    out: list[np.ndarray] = []
    txts = None
    for i in range(n):
        if 0 < counts[i] < k:            # short doc: padded-gram fallback
            if txts is None:
                txts = texts.to_pylist()
            out.append(_shingle_hashes(txts[i], k))
        else:
            out.append(np.unique(grams[g_starts[i]:g_ends[i]]))
    return out


def payload_broadcast_limit() -> int:
    """Adaptive-verify threshold for FAT payloads (document texts):
    candidate-pair counts at or below this ship the needed texts once
    via ray.put (hard-bounded: ≤ 2 × limit texts, a few hundred MB);
    above it the verify runs as hash-partitioned joins. Env override:
    KGFORGE_TEXT_BROADCAST_LIMIT (0 forces the join path)."""
    import os
    return int(os.environ.get("KGFORGE_TEXT_BROADCAST_LIMIT", 100_000))


def _pairwise_jaccard_verify(a, b, texts_a, texts_b, threshold: float,
                             k: int) -> pa.Table:
    """Shared verify kernel: id + text arrays -> verified
    (a, b, jaccard_pct) rows."""
    sets_a = _shingle_sets_batch(texts_a, k)
    sets_b = _shingle_sets_batch(texts_b, k)
    out_a, out_b, out_j = [], [], []
    for i in range(len(a)):
        sa, sb = sets_a[i], sets_b[i]
        if not len(sa) and not len(sb):
            j = 1.0
        else:
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out_a.append(a[i])
            out_b.append(b[i])
            out_j.append(int(round(j * 100)))
    return pa.table({"a": pa.array(out_a, type=pa.int64()),
                     "b": pa.array(out_b, type=pa.int64()),
                     "jaccard_pct": pa.array(out_j, type=pa.int64())})


def minhash_dedup(sf_dir: str, threshold: float = 0.7, n_perm: int = 64,
                  bands: int = 16, k: int = 3) -> "ray.data.Dataset":
    """Verified near-dup pairs (a, b, jaccard_pct:int).

    EXACT-DEDUP PRE-PASS: identical texts are precisely the degenerate
    LSH bucket mass (a 10k-identical-doc cluster would share every band
    bucket and emit ~5e8 pairs per band). Each exact group collapses to
    its min-id rep before banding; verified rep pairs are expanded back
    to member pairs afterwards (exact — identical texts have identical
    signatures and Jaccard), with star-edge degradation over
    ``pair_run_cap()``.

    The verify stage is size-adaptive on the EXACT candidate-pair count
    (already computed): at or below ``payload_broadcast_limit()`` the
    needed texts are fetched with one vectorized is_in semi-filter and
    shipped once via ray.put — hard-bounded, no shuffle; above it — at
    100 TB Common Crawl near-dup mass is double-digit percent of the
    corpus — TWO hash-partitioned joins of the pairs against the
    documents table (a-side, then b-side) fetch the texts with nothing
    unbounded ever reaching the driver."""
    from ..stages.canonicalize import (SANITIZE_BATCH,
                                       default_shuffle_partitions,
                                       drop_empty_blocks)
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    gm = drop_empty_blocks(exact_group_members(docs).materialize(),
                           pair_schema)
    n_members = gm.count()
    banded_docs = _without_members(docs, gm, n_members) if n_members \
        else docs
    cands = drop_empty_blocks(
        minhash_candidates(banded_docs, n_perm, bands, k).materialize(),
        pair_schema)
    n_c = cands.count()

    def _finish(verified: "ray.data.Dataset") -> "ray.data.Dataset":
        if n_members == 0:
            return verified
        return _expand_exact_groups(verified, gm, n_members)

    if n_c == 0:
        return _finish(ray.data.from_arrow(pa.table(
            {"a": pa.array([], type=pa.int64()),
             "b": pa.array([], type=pa.int64()),
             "jaccard_pct": pa.array([], type=pa.int64())})))

    if n_c <= payload_broadcast_limit():
        need: set[int] = set()
        for b in cands.iter_batches(batch_format="pyarrow"):
            need.update(b["a"].to_pylist())
            need.update(b["b"].to_pylist())
        need_arr = pa.array(sorted(need), type=pa.int64())
        texts: dict[int, str] = {}
        for b in docs.map_batches(
                lambda t: t.filter(pc.is_in(t["doc_id"],
                                            value_set=need_arr)),
                batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"):
            texts.update(zip(b["doc_id"].to_pylist(), b["text"].to_pylist()))
        ref = ray.put(texts)

        def verify_bc(batch: pa.Table) -> pa.Table:
            t = ray.get(ref)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            return _pairwise_jaccard_verify(
                a, b,
                pa.array([t[x] for x in a], type=pa.string()),
                pa.array([t[x] for x in b], type=pa.string()),
                threshold, k)

        return _finish(cands.map_batches(verify_bc,
                                         batch_format="pyarrow"))

    nparts = default_shuffle_partitions()
    j1 = cands.join(docs, join_type="inner", num_partitions=nparts,
                    on=("a",), right_on=("doc_id",))
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            ["text_a" if c == "text" else c for c in t.schema.names]),
        batch_format="pyarrow", batch_size=SANITIZE_BATCH)
    j2 = j1.join(docs, join_type="inner", num_partitions=nparts,
                 on=("b",), right_on=("doc_id",))

    def verify(batch: pa.Table) -> pa.Table:
        return _pairwise_jaccard_verify(
            batch["a"].to_numpy(zero_copy_only=False),
            batch["b"].to_numpy(zero_copy_only=False),
            batch["text_a"].combine_chunks().cast(pa.string()),
            batch["text"].combine_chunks().cast(pa.string()),
            threshold, k)

    return _finish(j2.map_batches(verify, batch_format="pyarrow",
                                  batch_size=SANITIZE_BATCH))


# ----------------------------------------------------- near-dup clusters
def _zpad(col: pa.Array) -> pa.Array:
    """int64 ids -> fixed-width strings, so the connected-components
    LEXICOGRAPHIC min-label == numeric min."""
    import pyarrow.compute as pc_
    return pc_.utf8_lpad(col.cast(pa.string()), 20, "0")


def neardup_cluster_labels(sf_dir: str, threshold: float = 0.7,
                           n_perm: int = 64, bands: int = 16, k: int = 3
                           ) -> "ray.data.Dataset":
    """Distributed cluster labels over the verified MinHash near-dup
    graph: (node, canon) for every document that appears in a near-dup
    pair, canon = numeric-min member of its connected component
    (transitive closure via stages/canonicalize.connected_components —
    label propagation to convergence, no driver union-find). This is
    the scale path; ``neardup_clusters`` below is the small driver-side
    table the correctness gate consumes."""
    pairs = minhash_dedup(sf_dir, threshold, n_perm, bands, k)

    def to_edges(b: pa.Table) -> pa.Table:
        return pa.table({"a": _zpad(b["a"].combine_chunks()),
                         "b": _zpad(b["b"].combine_chunks())})

    from ..stages.canonicalize import connected_components
    return connected_components(pairs.map_batches(to_edges,
                                                  batch_format="pyarrow"))


def neardup_labels(sf_dir: str, threshold: float = 0.7, n_perm: int = 64,
                   bands: int = 16, k: int = 3) -> "ray.data.Dataset":
    """Gate-shaped view of the SCALE path: ``neardup_cluster_labels``
    (distributed CC label propagation — no driver union-find) with the
    zero-padded string labels cast back to int64 (doc_id, canon_id).
    Exists so the correctness gate exercises the Dataset path, not just
    the driver-table ``neardup_clusters`` variant."""
    from ..stages.canonicalize import SANITIZE_BATCH
    labels = neardup_cluster_labels(sf_dir, threshold, n_perm, bands, k)

    def to_int(b: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(b["node"], pa.int64()),
            "canon_id": pc.cast(b["canon"], pa.int64())})

    return labels.map_batches(to_int, batch_format="pyarrow",
                              batch_size=SANITIZE_BATCH)


def neardup_clusters(sf_dir: str, threshold: float = 0.7, n_perm: int = 64,
                     bands: int = 16, k: int = 3) -> pa.Table:
    """(doc_id, canon_id, cluster_size) per clustered document, as a
    driver-side Arrow table (near-dup cluster membership is tiny at
    testdata scale and must survive empty — Ray's to_pandas drops the
    schema of empty datasets; at production dup mass, consume
    ``neardup_cluster_labels`` as a Dataset instead)."""
    schema = pa.schema([("doc_id", pa.int64()), ("canon_id", pa.int64()),
                       ("cluster_size", pa.int64())])
    pairs_tbls = [t for t in
                  minhash_dedup(sf_dir, threshold, n_perm, bands, k)
                  .iter_batches(batch_format="pyarrow") if t.num_columns]
    n_pairs = sum(t.num_rows for t in pairs_tbls)
    if n_pairs == 0:
        return schema.empty_table()
    pairs = pa.concat_tables(pairs_tbls)
    from ..stages.canonicalize import connected_components
    labels = connected_components(ray.data.from_arrow(pa.table({
        "a": _zpad(pairs["a"].combine_chunks()),
        "b": _zpad(pairs["b"].combine_chunks())})))
    rows = []
    for b in labels.iter_batches(batch_format="pyarrow"):
        rows.extend(zip((int(x) for x in b["node"].to_pylist()),
                        (int(x) for x in b["canon"].to_pylist())))
    sizes: dict[int, int] = {}
    for _, c in rows:
        sizes[c] = sizes.get(c, 0) + 1
    rows.sort()
    return pa.table({
        "doc_id": pa.array([d for d, _ in rows], type=pa.int64()),
        "canon_id": pa.array([c for _, c in rows], type=pa.int64()),
        "cluster_size": pa.array([sizes[c] for _, c in rows],
                                 type=pa.int64()),
    })


# ---------------------------------------------------------------- SimHash
def _crc2_per_token(tokens: pa.Array) -> np.ndarray:
    """64-bit token hash = crc32(t) << 32 | crc32(t + '#'), computed once
    per UNIQUE token."""
    import zlib
    enc = pc.dictionary_encode(tokens)
    uniq_toks = enc.dictionary.to_pylist()
    hi = np.array([zlib.crc32(t.encode()) if t is not None else 0
                   for t in uniq_toks], dtype=np.uint64)
    lo = np.array([zlib.crc32((t + "#").encode()) if t is not None else 0
                   for t in uniq_toks], dtype=np.uint64)
    uniq = (hi << np.uint64(32)) | lo
    return uniq[enc.indices.to_numpy(zero_copy_only=False)]


class SimHash:
    """64-bit simhash over crc32 token hashes; emits (doc_id, simhash,
    band16_0..3) for Hamming-≤3 blocking. Fully vectorized over the
    batch: per-unique-token hashing, one (tokens × 64) bit unpack, and a
    per-doc ``np.add.reduceat`` — no per-doc Python loop."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].combine_chunks().cast(pa.string())
        n = len(texts)
        split = pc.split_pattern(texts, pattern=" ")
        flat = split.flatten()
        nonempty = pc.not_equal(flat, "")
        flat = flat.filter(nonempty)
        par = (pc.list_parent_indices(split).filter(nonempty)
               .to_numpy(zero_copy_only=False))
        sims = np.zeros(n, dtype=np.uint64)
        if len(flat):
            hs = _crc2_per_token(flat)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) &
                    np.uint64(1)).astype(np.int64)
            contrib = 2 * bits - 1                      # (tokens, 64)
            counts = np.bincount(par, minlength=n)
            have = counts > 0
            # reduceat only over docs WITH tokens — a start == len(hs)
            # (trailing tokenless docs) would steal the previous doc's
            # final token from its segment
            rs = (np.cumsum(counts) - counts)[have]
            v = np.add.reduceat(contrib, rs, axis=0)  # (n_have, 64)
            packed = np.packbits((v > 0)[:, ::-1], axis=1).view(">u8").ravel()
            sims[have] = packed.astype(np.uint64)
        out = {"doc_id": batch["doc_id"],
               "simhash": pa.array(sims.astype(np.int64), type=pa.int64())}
        for b in range(4):
            out[f"band{b}"] = pa.array(
                ((sims >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64),
                type=pa.int64())
        return pa.table(out)


def simhash_signatures(sf_dir: str) -> "ray.data.Dataset":
    from ..stages.canonicalize import SANITIZE_BATCH
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # batch_size: empty read blocks skip the map fn and would otherwise
    # reach the verify joins with the raw (doc_id, text) schema
    return ds.map_batches(SimHash(), batch_format="pyarrow",
                          batch_size=SANITIZE_BATCH)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR bit-twiddling over uint64)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = ((x & np.uint64(0x3333333333333333)) +
         ((x >> np.uint64(2)) & np.uint64(0x3333333333333333)))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def simhash_dedup(sf_dir: str, max_hamming: int = 3) -> "ray.data.Dataset":
    """Near-dup pairs by simhash: band-blocked candidates (pigeonhole: a
    ≤3-bit-different pair shares ≥1 of 4 16-bit bands) verified by
    popcount.

    Verification is size-adaptive on the EXACT candidate count: small
    sets fetch the needed 8-byte signatures via a hard-bounded broadcast
    dict; large ones run TWO hash-partitioned joins of the pairs against
    the signature table (a-side then b-side) — nothing unbounded on the
    driver at any dup mass."""
    from ..stages.canonicalize import (SANITIZE_BATCH, broadcast_row_limit,
                                       default_shuffle_partitions)
    # signatures feed candidate generation AND both verify joins —
    # materialize once (24B/doc in the distributed object store)
    sigs = simhash_signatures(sf_dir).materialize()

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), 4)
        band_idx = np.tile(np.arange(4, dtype=np.int64), n)
        vals = np.stack([batch[f"band{b}"].to_numpy(zero_copy_only=False)
                         for b in range(4)], axis=1).reshape(-1)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "band_idx": pa.array(band_idx, type=pa.int64()),
                         "band_val": pa.array(vals, type=pa.int64())})

    cands = dup_key_pairs(sigs.map_batches(explode, batch_format="pyarrow"),
                          ["band_idx", "band_val"], "doc_id")
    from ..stages.canonicalize import drop_empty_blocks
    from ..stages.dedup import distinct
    cands = drop_empty_blocks(
        distinct(cands, ["a", "b"]).materialize(),
        pa.schema([("a", pa.int64()), ("b", pa.int64())]))
    n_c = cands.count()
    if n_c == 0:
        return ray.data.from_arrow(pa.table(
            {"a": pa.array([], type=pa.int64()),
             "b": pa.array([], type=pa.int64()),
             "hamming": pa.array([], type=pa.int64())}))

    sig_cols = sigs.select_columns(["doc_id", "simhash"])

    if n_c <= broadcast_row_limit():
        need: set[int] = set()
        for b in cands.iter_batches(batch_format="pyarrow"):
            need.update(b["a"].to_pylist())
            need.update(b["b"].to_pylist())
        need_arr = pa.array(sorted(need), type=pa.int64())
        sig_map: dict[int, int] = {}
        for b in sig_cols.map_batches(
                lambda t: t.filter(pc.is_in(t["doc_id"],
                                            value_set=need_arr)),
                batch_format="pyarrow").iter_batches(
                    batch_format="pyarrow"):
            sig_map.update(zip(b["doc_id"].to_pylist(),
                               b["simhash"].to_pylist()))
        ref = ray.put(sig_map)

        def verify_bc(batch: pa.Table) -> pa.Table:
            m = ray.get(ref)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            xa = np.array([m[x] for x in a], dtype=np.int64).view(np.uint64)
            xb = np.array([m[x] for x in b], dtype=np.int64).view(np.uint64)
            ham = _popcount64(xa ^ xb)
            keep = ham <= max_hamming
            return pa.table({"a": pa.array(a[keep], type=pa.int64()),
                             "b": pa.array(b[keep], type=pa.int64()),
                             "hamming": pa.array(ham[keep], type=pa.int64())})

        return cands.map_batches(verify_bc, batch_format="pyarrow")

    nparts = default_shuffle_partitions()
    j1 = cands.join(sig_cols, join_type="inner", num_partitions=nparts,
                    on=("a",), right_on=("doc_id",))
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            ["sim_a" if c == "simhash" else c for c in t.schema.names]),
        batch_format="pyarrow", batch_size=SANITIZE_BATCH)
    j2 = j1.join(sig_cols, join_type="inner", num_partitions=nparts,
                 on=("b",), right_on=("doc_id",))

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        xa = batch["sim_a"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        xb = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        ham = _popcount64(xa ^ xb)
        keep = ham <= max_hamming
        return pa.table({"a": pa.array(a[keep], type=pa.int64()),
                         "b": pa.array(b[keep], type=pa.int64()),
                         "hamming": pa.array(ham[keep], type=pa.int64())})

    return j2.map_batches(verify, batch_format="pyarrow",
                          batch_size=SANITIZE_BATCH)


# ---------------------------------------------------------------------------
# Near-dup survivor selection (which copy to KEEP)
# ---------------------------------------------------------------------------

KNUTH_32 = 2654435761  # Knuth multiplicative hash, shared with the oracle


def neardup_survivors(sf_dir: str, threshold: float = 0.7,
                      n_perm: int = 64, bands: int = 16, k: int = 3,
                      num_buckets: int | None = None) -> "ray.data.Dataset":
    """Per-document keep/drop decision after near-dup clustering: every
    unclustered doc survives; within each cluster exactly ONE member
    survives — the one with the smallest deterministic fetch priority
    ``p = (doc_id * KNUTH_32) % 2^32`` (a stand-in for crawl fetch
    order; non-monotone in doc_id so the choice isn't vacuously
    "min id"), ties broken by doc_id. Output (doc_id, canon_id, keep)
    for the WHOLE corpus, canon_id = doc_id for unclustered docs.

    Scale shape: the corpus crosses the wire as ids only
    (columns=["doc_id"]); cluster labels and per-cluster winners are
    dup-mass- and cluster-count-sized. Three bucket exchanges total:
    winner argmin (groupby canon), winner->member attach (hash canon),
    corpus fill (hash doc_id). int64 bound: doc_id < 2^62/KNUTH_32
    ≈ 1.7e9 keeps p exact in BIGINT — same domain as the DuckDB mirror.
    """
    import polars as pl
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("canon_id", pa.int64()),
                            ("keep", pa.int64())])
    labels = neardup_labels(sf_dir, threshold, n_perm, bands, k)

    def with_key(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        p = (ids * KNUTH_32) % (1 << 32)
        return pa.table({
            "canon_id": b["canon_id"].combine_chunks(),
            "k": pa.array(p * (1 << 31) + ids, pa.int64())})

    winners = (labels.map_batches(with_key, batch_format="pyarrow")
               .groupby("canon_id").aggregate(Min("k", alias_name="mk")))

    def tag_label(b: pa.Table) -> pa.Table:
        key = b["canon_id"].to_numpy(zero_copy_only=False)
        t = b.select(["doc_id", "canon_id"])
        t = t.append_column("keep_doc", pa.nulls(b.num_rows, pa.int64()))
        return t.append_column("_cb", pa.array(
            (key % num_buckets).astype(np.int32)))

    def tag_winner(b: pa.Table) -> pa.Table:
        key = b["canon_id"].to_numpy(zero_copy_only=False)
        mk = b["mk"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "doc_id": pa.nulls(b.num_rows, pa.int64()),
            "canon_id": b["canon_id"].combine_chunks().cast(pa.int64()),
            "keep_doc": pa.array(mk % (1 << 31), pa.int64())})
        return t.append_column("_cb", pa.array(
            (key % num_buckets).astype(np.int32)))

    def attach_winner(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.drop_columns(["_cb"]))
        mem = df.filter(pl.col("keep_doc").is_null()).select(
            ["doc_id", "canon_id"])
        win = df.filter(pl.col("keep_doc").is_not_null()).select(
            ["canon_id", "keep_doc"])
        j = mem.join(win, on="canon_id", how="inner")
        return (j.with_columns(
                    (pl.col("doc_id") == pl.col("keep_doc"))
                    .cast(pl.Int64).alias("keep"))
                .select(["doc_id", "canon_id", "keep"])
                .to_arrow().cast(out_schema))

    clustered = (labels.map_batches(tag_label, batch_format="pyarrow")
                 .union(winners.map_batches(tag_winner,
                                            batch_format="pyarrow"))
                 .groupby("_cb").map_groups(attach_winner,
                                            batch_format="pyarrow"))

    def tag_corpus(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "doc_id": b["doc_id"].combine_chunks().cast(pa.int64()),
            "canon_id": pa.nulls(b.num_rows, pa.int64()),
            "keep": pa.nulls(b.num_rows, pa.int64()),
            "_is_doc": pa.array(np.ones(b.num_rows, dtype=bool))})
        return t.append_column("_db", pa.array(
            (ids % num_buckets).astype(np.int32)))

    def tag_clustered(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        t = b.select(["doc_id", "canon_id", "keep"])
        t = t.append_column(
            "_is_doc", pa.array(np.zeros(b.num_rows, dtype=bool)))
        return t.append_column("_db", pa.array(
            (ids % num_buckets).astype(np.int32)))

    def fill(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.drop_columns(["_db"]))
        docs = df.filter(pl.col("_is_doc")).select("doc_id")
        lab = df.filter(~pl.col("_is_doc")).select(
            ["doc_id", "canon_id", "keep"])
        j = docs.join(lab, on="doc_id", how="left")
        return (j.with_columns(
                    pl.coalesce("canon_id", "doc_id").alias("canon_id"),
                    pl.col("keep").fill_null(1))
                .to_arrow().cast(out_schema))

    corpus = read_table(sf_dir, "documents", columns=["doc_id"])
    from . import ensure_schema
    return ensure_schema(
        corpus.map_batches(tag_corpus, batch_format="pyarrow")
        .union(clustered.map_batches(tag_clustered,
                                     batch_format="pyarrow"))
        .groupby("_db").map_groups(fill, batch_format="pyarrow"),
        out_schema)
