"""Similarity search over an embedding column (list<float>).

- ``ann_topk``: brute-force cosine top-k — the exactness baseline. The
  (tiny) query matrix ships pre-normalized inside the task closure; each
  batch does ONE numpy matmul and emits only its per-batch top-k
  candidates (combiner), so the driver-side final reduce sees ≤
  num_batches × k × n_queries rows. (A large query matrix would instead
  warrant an actor pool + ray.put to amortize deserialization.)
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH bucketing
  (deterministic fixed-seed projection), search only the query's bucket
  ring. Recall < 1 by design; rows-only oracle.
- ``embedding_dup_pairs``: cosine ≥ threshold near-dup pairs via
  all-pairs within LSH buckets.

Similarities are rounded to 4 decimals BEFORE ranking on both the
engine and the SQL side, with (sim desc, vec_id asc) tie-break — rank
is then engine-independent (float-sum drift ≪ 1e-4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..sources.readers import read_table


def _matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    lst = batch[col].combine_chunks()
    flat = lst.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(batch)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norm = np.linalg.norm(m, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return m / norm


def query_matrix(sf_dir: str, query_ids: list[int]) -> np.ndarray:
    """Fetch the query vectors: predicate-pushdown parquet read (only
    row groups containing the ids are decoded — the full embedding
    column never reaches the driver)."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "in", list(query_ids))])
    order = {v: i for i, v in enumerate(query_ids)}
    rows = sorted((order[v], e) for v, e in zip(t["vec_id"].to_pylist(),
                                                t["embedding"].to_pylist()))
    return np.array([e for _, e in rows], dtype=np.float64)


class BatchTopK:
    """Per-batch brute-force scorer: emits each batch's local top-k per
    query (the combiner that keeps the global reduce tiny)."""

    def __init__(self, q_ref, query_ids: list[int], k: int):
        q = ray.get(q_ref) if not isinstance(q_ref, np.ndarray) else q_ref
        self.q = _normalize(q)
        self.query_ids = query_ids
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch))
        sims = m @ self.q.T                      # (n_rows, n_queries)
        sims4 = np.round(sims, 4)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.query_ids):
            # exclude the query's own vector BEFORE taking the local
            # top-k — otherwise its self-similarity (1.0) occupies a
            # slot and the batch contributes only k-1 real candidates,
            # silently dropping the true k-th neighbor
            mask = vec_ids != qid
            vids = vec_ids[mask]
            col = sims4[mask, qi]
            idx = np.lexsort((vids, -col))[:min(self.k, len(vids))]
            out_q.extend([qid] * len(idx))
            out_v.extend(vids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "sim4": pa.array(out_s, type=pa.float64()),
        })


def _topk_reduce(partials: "ray.data.Dataset", k: int) -> "ray.data.Dataset":
    """Final reduce over the per-batch top-k candidates: per query,
    global top-k with (sim desc, vec_id asc) tie-break. Input is tiny
    (≤ num_batches × k × n_queries rows) by combiner construction."""
    import pandas as pd
    frames = [b.to_pandas()
              for b in partials.iter_batches(batch_format="pyarrow")]
    allc = (pd.concat(frames, ignore_index=True) if frames else
            pd.DataFrame(columns=["query_id", "vec_id", "sim4"]))
    allc = allc[allc["query_id"] != allc["vec_id"]]
    allc = allc.sort_values(["query_id", "sim4", "vec_id"],
                            ascending=[True, False, True])
    allc["rank"] = allc.groupby("query_id").cumcount() + 1
    allc = allc[allc["rank"] <= k].reset_index(drop=True)
    if len(allc):
        allc = allc.astype({"query_id": "int64", "vec_id": "int64",
                            "rank": "int64"})
    return ray.data.from_pandas(allc[["query_id", "vec_id", "rank", "sim4"]])


def ann_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10
             ) -> "ray.data.Dataset":
    """Exact cosine top-k: (query_id, vec_id, rank, sim4). Self-matches
    excluded."""
    if query_ids is None:
        query_ids = [0, 1, 2]
    q = query_matrix(sf_dir, query_ids)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # the scorer state (a few query vectors) is tiny — ship the
    # pre-normalized instance in elastic TASKS; an actor pool only pays
    # off when the query matrix is big enough to amortize pool spawn
    partials = ds.map_batches(BatchTopK(q, query_ids, k),
                              batch_format="pyarrow")
    return _topk_reduce(partials, k)


def ann_topk_sql(query_ids: list[int] | None = None, k: int = 10) -> str:
    if query_ids is None:
        query_ids = [0, 1, 2]
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(e.embedding, q.qe), 4) AS sim4
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id, sim4,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim4 DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, CAST(vec_id AS BIGINT) AS vec_id,
       CAST(rank AS BIGINT) AS rank, sim4
FROM ranked WHERE rank <= {k}
"""


# --------------------------------------------------------------- IVF ANN
def _splitmix_unit(n: int, dim: int) -> np.ndarray:
    idx = np.arange(n * dim, dtype=np.uint64)
    z = (idx + np.uint64(0x51ED2701)) * np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = z ^ (z >> np.uint64(27))
    return ((z.astype(np.float64) / float(2**64)) - 0.5).reshape(n, dim)


def train_ivf_centroids(sf_dir: str, n_lists: int = 16,
                        sample_rows: int = 4096,
                        iters: int = 3) -> np.ndarray:
    """Deterministic IVF training: k-means over a bounded head sample
    (small side — reading a few thousand vectors on the driver is the
    idiomatic 'train on a sample' step; the full corpus never
    materializes). Init = fixed splitmix directions; Lloyd iterations
    are plain matmuls. No RNG state → identical centroids every run."""
    import pyarrow.parquet as pq
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    # bounded head read: only the row groups covering sample_rows are
    # decoded — the full embedding column never reaches the driver
    head = next(pf.iter_batches(batch_size=sample_rows,
                                columns=["embedding"]))
    m = _normalize(np.array(head["embedding"].to_pylist(),
                            dtype=np.float64))
    dim = m.shape[1]
    cents = _normalize(_splitmix_unit(n_lists, dim))
    for _ in range(iters):
        assign = (m @ cents.T).argmax(axis=1)
        for c in range(n_lists):
            sel = m[assign == c]
            if len(sel):
                cents[c] = sel.mean(axis=0)
        cents = _normalize(cents)
    return cents


class IvfAssign:
    """map_batches: vec -> nearest-centroid list id (broadcast centroids)."""

    def __init__(self, cents_ref):
        self.cents = (ray.get(cents_ref)
                      if not isinstance(cents_ref, np.ndarray) else cents_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch))
        lists = (m @ self.cents.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists))


def ivf_topk(sf_dir: str, query_ids: list[int] | None = None, k: int = 10,
             n_lists: int = 16, nprobe: int = 4) -> "ray.data.Dataset":
    """IVF approximate top-k: score only vectors whose inverted list is
    in the UNION of each query's ``nprobe`` nearest lists (a superset of
    per-query probing → recall at least as high). Same output schema as
    ``ann_topk``; recall < 1 by design (tested vs the brute-force
    baseline). The probed-list filter happens INSIDE map_batches, so
    non-probed rows are dropped before scoring — at scale, partitioning
    the corpus by ivf_list turns this into a partition-pruned read."""
    if query_ids is None:
        query_ids = [0, 1, 2]
    cents = train_ivf_centroids(sf_dir, n_lists)
    q = _normalize(query_matrix(sf_dir, query_ids))
    probe_lists = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    probed: set[int] = set(probe_lists.reshape(-1).tolist())
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assigned = ds.map_batches(IvfAssign(cents), batch_format="pyarrow")

    probed_arr = pa.array(sorted(probed), type=pa.int32())

    def keep_probed(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_in(batch["ivf_list"], value_set=probed_arr))

    candidates = assigned.map_batches(keep_probed, batch_format="pyarrow")
    partials = candidates.map_batches(BatchTopK(q, query_ids, k),
                                      batch_format="pyarrow")
    return _topk_reduce(partials, k)


# -------------------------------------------- IVF partitioned index
def build_ivf_index(sf_dir: str, index_dir: str | None = None,
                    n_lists: int = 16) -> str:
    """Materialize the IVF layout: the embeddings table written as
    Parquet PARTITIONED BY ``ivf_list`` (one directory per inverted
    list) plus the trained centroids. A probe then READS only the
    ``nprobe`` matching partitions — at 100 TB this is the difference
    between scanning the corpus and scanning nprobe/n_lists of it.
    Idempotent: an existing index (marker file) is reused."""
    import hashlib as _hl
    import os

    import glob as _glob

    import pyarrow.parquet as pq
    # content fingerprint of the embeddings source (size+mtime per file):
    # a regenerated file at the same path must invalidate the cached index
    src = sorted(_glob.glob(os.path.join(sf_dir, "embeddings*.parquet")) +
                 _glob.glob(os.path.join(sf_dir, "embeddings", "*.parquet")))
    stamp = ";".join(f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p):.6f}"
                     for p in src)
    content_key = _hl.md5(stamp.encode()).hexdigest()[:12]
    if index_dir is None:
        key = _hl.md5(f"{os.path.abspath(sf_dir)}:{n_lists}:{content_key}"
                      .encode())
        index_dir = f"/tmp/kgforge_ivf_{key.hexdigest()[:12]}"
    marker = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == content_key:
                return index_dir
        import shutil
        shutil.rmtree(index_dir)  # stale: source changed under the marker
    elif os.path.isdir(index_dir):
        # marker-less dir = crashed build; rebuilding into it would
        # APPEND duplicate vector files (write_parquet never cleans)
        import shutil
        shutil.rmtree(index_dir)
    cents = train_ivf_centroids(sf_dir, n_lists)
    os.makedirs(index_dir, exist_ok=True)
    pq.write_table(
        pa.table({"list_id": pa.array(range(n_lists), type=pa.int32()),
                  "centroid": pa.array([c.tolist() for c in cents],
                                       type=pa.list_(pa.float64()))}),
        os.path.join(index_dir, "centroids.parquet"))
    from ..sources.readers import read_table
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    assigned = ds.map_batches(IvfAssign(cents), batch_format="pyarrow")
    assigned.write_parquet(os.path.join(index_dir, "vectors"),
                           partition_cols=["ivf_list"])
    with open(marker, "w") as f:
        f.write(content_key)
    return index_dir


def ivf_topk_indexed(sf_dir: str, query_ids: list[int] | None = None,
                     k: int = 10, n_lists: int = 16, nprobe: int = 4,
                     index_dir: str | None = None) -> "ray.data.Dataset":
    """IVF top-k over the PARTITIONED index: only the probed
    ``ivf_list=`` partition directories are read at all (partition-
    pruned scan), then the same combiner/reduce as ``ivf_topk``.
    Output is identical to ``ivf_topk`` (same centroids, assignment,
    probe set, scoring) — checked by the same oracle."""
    import os

    import pyarrow.parquet as pq
    if query_ids is None:
        query_ids = [0, 1, 2]
    index_dir = build_ivf_index(sf_dir, index_dir, n_lists)
    cent_tbl = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    cents = np.array(cent_tbl["centroid"].to_pylist(), dtype=np.float64)
    q = _normalize(query_matrix(sf_dir, query_ids))
    probe_lists = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
    probed = sorted(set(probe_lists.reshape(-1).tolist()))
    import glob
    paths = [f for l in probed for f in sorted(glob.glob(
        os.path.join(index_dir, "vectors", f"ivf_list={l}", "*.parquet")))]
    candidates = ray.data.read_parquet(paths,
                                       columns=["vec_id", "embedding"])
    partials = candidates.map_batches(BatchTopK(q, query_ids, k),
                                      batch_format="pyarrow")
    return _topk_reduce(partials, k)


def embedding_clusters(sf_dir: str, n_lists: int = 16
                       ) -> "ray.data.Dataset":
    """K-means cluster assignment over the embedding column: (vec_id,
    cluster_id). Reuses the deterministic IVF trainer (bounded head
    sample, fixed splitmix init, Lloyd iterations) and the vectorized
    per-batch assignment — the canonical "partition the corpus by
    semantic neighborhood" step of a curriculum/dedup pipeline."""
    cents = train_ivf_centroids(sf_dir, n_lists)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def fn(batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch))
        lists = (m @ cents.T).argmax(axis=1).astype(np.int64)
        return pa.table({
            "vec_id": batch["vec_id"].combine_chunks().cast(pa.int64()),
            "cluster_id": pa.array(lists, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------- LSH-bucketed ANN
def _projection(dim: int, n_bits: int = 12) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (no RNG state): values
    from a fixed integer mix, standardized."""
    idx = np.arange(dim * n_bits, dtype=np.uint64)
    z = (idx + np.uint64(1)) * np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = z ^ (z >> np.uint64(27))
    u = (z.astype(np.float64) / float(2**64)) - 0.5
    return u.reshape(dim, n_bits)


class LshBucket:
    def __init__(self, dim: int, n_bits: int = 12):
        self.proj = _projection(dim, n_bits)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch)
        bits = (m @ self.proj) > 0
        bucket = np.packbits(
            np.pad(bits, ((0, 0), (0, (-bits.shape[1]) % 8))),
            axis=1)
        keys = [bytes(b).hex() for b in bucket]
        return batch.append_column("bucket", pa.array(keys, type=pa.string()))


def effective_lsh_bits(n_rows: int, n_bits: int = 8,
                       target: int = 256) -> int:
    """Corpus-scaled hyperplane count: a FIXED n_bits=8 gives only 256
    global buckets, so bucket size grows linearly with the corpus and
    the per-bucket all-pairs step degrades quadratically. Scale bits so
    the expected bucket stays near ``target`` rows (bits only ever
    increase, capped at 30). At testdata scales this returns ``n_bits``
    unchanged — the oracle mirrors the same formula."""
    import math
    if n_rows <= target:
        return n_bits
    return min(max(n_bits, math.ceil(math.log2(n_rows / target))), 30)


def emb_bucket_cap() -> int:
    """Rows per LSH bucket above which the all-pairs cosine degrades to
    STAR comparisons against the bucket's min-id member (bounded output,
    connectivity preserved; logged). Bounds worst-case per-bucket pair
    emission at cap^2/2. Env: KGFORGE_EMB_BUCKET_CAP (0 = unlimited)."""
    import os
    return int(os.environ.get("KGFORGE_EMB_BUCKET_CAP", 4096))


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.98,
                        n_bits: int = 8) -> "ray.data.Dataset":
    """Near-dup embedding pairs (a, b, sim4): all-pairs cosine INSIDE
    each LSH bucket (groupby shuffle on bucket key) — never all-pairs
    global. Recall<1 for pairs straddling a hyperplane; acceptable for
    near-dup mining (sim≥0.98 pairs collide with high probability).
    Scale guards: hyperplane count scales with the corpus
    (``effective_lsh_bits``), the in-bucket matmul is BLOCKED (bounded
    memory however large a bucket gets), and buckets over
    ``emb_bucket_cap()`` degrade to star comparisons with a logged
    truncation."""
    import pyarrow.parquet as pq
    # dim probe: decode ONE row, not the whole table
    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    dim = len(next(pf.iter_batches(batch_size=1,
                                   columns=["embedding"]))["embedding"][0])
    n_rows = pf.metadata.num_rows
    bits = effective_lsh_bits(n_rows, n_bits)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    bucketed = ds.map_batches(LshBucket(dim, bits), batch_format="pyarrow")
    cap = emb_bucket_cap()   # driver-time read: workers may predate the env

    def bucket_pairs(batch) -> pa.Table:
        import sys
        m = _normalize(_matrix(batch))
        ids = np.asarray(batch["vec_id"].to_pylist())
        order = np.argsort(ids)
        m, ids = m[order], ids[order]
        n = len(ids)
        if cap and n > cap:
            # degenerate bucket (e.g. identical boilerplate embeddings):
            # star vs the min-id member — O(n) output, component-exact
            print(f"[kgforge] embedding_dup_pairs: bucket of {n} rows "
                  f"over cap={cap} degraded to star comparisons",
                  file=sys.stderr)
            from ..state import counters
            counters.inc("embdup.buckets_star_capped", 1)
            counters.inc("embdup.bucket_rows_star_capped", n)
            sims = np.round(m[1:] @ m[0], 4)
            keep = sims >= threshold
            return pa.table({
                "a": pa.array(np.broadcast_to(ids[0], n - 1)[keep],
                              type=pa.int64()),
                "b": pa.array(ids[1:][keep], type=pa.int64()),
                "sim4": pa.array(sims[keep], type=pa.float64()),
            })
        # blocked upper-triangle matmul: memory O(RC*CC) per block, not
        # O(n^2), whatever the bucket size
        RC, CC = 1024, 4096
        a_p, b_p, s_p = [], [], []
        for i0 in range(0, n, RC):
            i1 = min(i0 + RC, n)
            for j0 in range(i0, n, CC):
                j1 = min(j0 + CC, n)
                blk = np.round(m[i0:i1] @ m[j0:j1].T, 4)
                ri, cj = np.nonzero(blk >= threshold)
                gi, gj = ri + i0, cj + j0
                keep = gj > gi
                if keep.any():
                    a_p.append(ids[gi[keep]])
                    b_p.append(ids[gj[keep]])
                    s_p.append(blk[ri[keep], cj[keep]])
        if not a_p:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "sim4": pa.array([], type=pa.float64())})
        return pa.table({
            "a": pa.array(np.concatenate(a_p), type=pa.int64()),
            "b": pa.array(np.concatenate(b_p), type=pa.int64()),
            "sim4": pa.array(np.concatenate(s_p), type=pa.float64()),
        })

    pairs = bucketed.groupby("bucket").map_groups(bucket_pairs,
                                                  batch_format="pyarrow")
    from ..stages.dedup import distinct
    # near-dup pair mass is tiny by construction → deliver the result as
    # a driver-side Arrow table. (Ray's to_pandas on an EMPTY dataset
    # loses the schema entirely, so a zero-pair corpus would otherwise
    # fail the driver's schema check.)
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                        ("sim4", pa.float64())])
    tbls = [t for t in distinct(pairs, ["a", "b", "sim4"])
            .iter_batches(batch_format="pyarrow") if t.num_columns]
    return (pa.concat_tables(tbls).cast(schema) if tbls
            else schema.empty_table())


# ------------------------------------------------- int8 quantized ANN
def embedding_absmax(sf_dir: str) -> float:
    """Global |x| maximum over the L2-NORMALIZED embeddings: one
    streaming pass of per-batch scalar extrema — the quantizer-training
    step. A single symmetric scale (not per-dim affine) keeps the
    quantized dot proportional to cosine: offsets would add
    magnitude-dominated cross terms (measured corr 0.28 affine vs
    0.9998 symmetric on the testdata)."""
    ds = read_table(sf_dir, "embeddings", columns=["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch))
        return pa.table({"g": [float(np.abs(m).max())]})

    g = 0.0
    for b in (ds.map_batches(partial, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow")):
        for v in b["g"].to_pylist():
            g = max(g, v)
    return g if g > 0 else 1.0


def quantize_i8(m: np.ndarray, g: float) -> np.ndarray:
    """Symmetric int8 quantization q = floor(x·127/g) of normalized
    vectors; float64 in, int64 out — same numpy expression as the
    scalar reference, so results are bit-identical."""
    return np.floor(m * 127.0 / g).astype(np.int64)


def quantized_topk(sf_dir: str, query_ids: list[int] | None = None,
                   k: int = 10) -> "ray.data.Dataset":
    """Top-k by INT dot product of int8-quantized normalized embeddings
    — (query_id, vec_id, rank, qscore). The 100 TB scale path for ANN
    storage/exchange: 8x smaller vectors on the wire and integer
    matmuls, at a small recall cost (pinned >= 0.8 by test vs the exact
    cosine ranker). Same combiner shape as ann_topk: per-batch local
    top-k, bounded driver reduce. Self-matches excluded; ties vec_id
    asc."""
    if query_ids is None:
        query_ids = [0, 1, 2]
    g = embedding_absmax(sf_dir)
    qm = quantize_i8(_normalize(query_matrix(sf_dir, query_ids)), g)
    ds = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qref = ray.put((qm, g))

    def scorer(batch: pa.Table, k=k, query_ids=list(query_ids)
               ) -> pa.Table:
        q, g_ = ray.get(qref)
        m = quantize_i8(_normalize(_matrix(batch)), g_)
        scores = m @ q.T                          # int64 (n_rows, n_q)
        vec_ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(query_ids):
            mask = vec_ids != qid
            vids = vec_ids[mask]
            col = scores[mask, qi]
            idx = np.lexsort((vids, -col))[:min(k, len(vids))]
            out_q.extend([qid] * len(idx))
            out_v.extend(vids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "qscore": pa.array(out_s, pa.int64())})

    partials = ds.map_batches(scorer, batch_format="pyarrow")
    import pandas as pd
    frames = [b.to_pandas()
              for b in partials.iter_batches(batch_format="pyarrow")]
    allc = (pd.concat(frames, ignore_index=True) if frames else
            pd.DataFrame(columns=["query_id", "vec_id", "qscore"]))
    allc = allc.sort_values(["query_id", "qscore", "vec_id"],
                            ascending=[True, False, True])
    allc["rank"] = allc.groupby("query_id").cumcount() + 1
    allc = allc[allc["rank"] <= k].reset_index(drop=True)
    if len(allc):
        allc = allc.astype({c: "int64" for c in allc.columns})
    return ray.data.from_pandas(
        allc[["query_id", "vec_id", "rank", "qscore"]])


def lang_centroids(sf_dir: str, num_buckets: int | None = None
                   ) -> "ray.data.Dataset":
    """Per-language int8-quantized embedding centroids, one row per
    (lang, dim): centroid_q = (Σ q_i[dim]) // n over the group, q =
    symmetric-int8 of the L2-normalized vector — grouped vector mean
    pooling, the aggregation behind per-domain/per-language embedding
    profiles. Vectors meet their doc's lang on ONE hash(id)
    tagged-union bucket merge; per-bucket partials are (lang, dim,
    s, cnt) rows — lexicon × dim sized, never vector-stream sized —
    finished by a groupby sum."""
    import polars as pl
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    g = embedding_absmax(sf_dir)
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    out_schema = pa.schema([("lang", pa.string()), ("dim", pa.int64()),
                            ("centroid_q", pa.int64())])

    def tag_emb(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "id": batch["vec_id"].combine_chunks().cast(pa.int64()),
            "embedding": batch["embedding"].combine_chunks(),
            "lang": pa.nulls(batch.num_rows, pa.string())})
        return t.append_column("_eb", pa.array(
            (ids % num_buckets).astype(np.int32)))

    def tag_doc(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "embedding": pa.nulls(
                batch.num_rows, pa.list_(pa.float64())),
            "lang": batch["lang"].combine_chunks().cast(pa.string())})
        return t.append_column("_eb", pa.array(
            (ids % num_buckets).astype(np.int32)))

    def partial(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.drop_columns(["_eb"]))
        e = df.filter(pl.col("lang").is_null()).select(["id", "embedding"])
        l = df.filter(pl.col("lang").is_not_null()).select(["id", "lang"])
        j = e.join(l, on="id", how="inner")
        if j.height == 0:
            return pa.schema([("lang", pa.string()), ("dim", pa.int64()),
                              ("s", pa.int64()),
                              ("cnt", pa.int64())]).empty_table()
        m = np.array(j["embedding"].to_list(), dtype=np.float64)
        q = quantize_i8(_normalize(m), g)
        langs = j["lang"].to_list()
        uniq = sorted(set(langs))
        rows_l, rows_d, rows_s, rows_c = [], [], [], []
        for lg in uniq:
            sel = q[np.array([x == lg for x in langs])]
            s = sel.sum(axis=0)
            rows_l.extend([lg] * q.shape[1])
            rows_d.extend(range(q.shape[1]))
            rows_s.extend(s.tolist())
            rows_c.extend([sel.shape[0]] * q.shape[1])
        return pa.table({"lang": pa.array(rows_l, pa.string()),
                         "dim": pa.array(rows_d, pa.int64()),
                         "s": pa.array(rows_s, pa.int64()),
                         "cnt": pa.array(rows_c, pa.int64())})

    from ray.data.aggregate import Sum
    sums = (emb.map_batches(tag_emb, batch_format="pyarrow")
            .union(docs.map_batches(tag_doc, batch_format="pyarrow"))
            .groupby("_eb").map_groups(partial, batch_format="pyarrow")
            .groupby(["lang", "dim"])
            .aggregate(Sum("s", alias_name="s"),
                       Sum("cnt", alias_name="cnt")))

    def fin(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False)
        c = batch["cnt"].to_numpy(zero_copy_only=False)
        # sums can be negative (symmetric int8): // must be FLOOR
        # division on both sides — numpy and python agree, C-style
        # truncation would not
        return pa.table({
            "lang": batch["lang"].combine_chunks().cast(pa.string()),
            "dim": batch["dim"].combine_chunks().cast(pa.int64()),
            "centroid_q": pa.array(s // c, pa.int64())})

    from . import ensure_schema
    return ensure_schema(sums.map_batches(fin, batch_format="pyarrow"),
                         out_schema)
