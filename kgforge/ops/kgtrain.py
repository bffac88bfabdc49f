"""KG-embedding training-data preparation over the constructed graph.

A knowledge graph is not just queried — at web scale it is TRAINING
DATA for link-prediction / KG-embedding models (TransE-style margin
ranking). This module turns the link graph into model-ready triplets:

``link_negative_samples`` emits one row per (positive edge, k):
``(h, t_pos, t_neg, k)`` where ``t_neg`` is a DETERMINISTIC corrupted
tail — the candidate pool is the distinct tail set, indexed by a
Knuth-style multiplicative hash of (h, t_pos, k) (all arithmetic mod
2^32, so a DuckDB HUGEINT mirror is bit-exact — same convention as
ops/text.dataset_split) — FILTERED: candidates that collide with a
true edge are dropped, not retried (the standard "filtered" negative
sampling; per-head output count therefore varies, which the oracle
reproduces exactly).

Scale shape:

* positives are the globally-distinct edge set (one pair-keyed bucket
  shuffle via linkgraph.distinct-style per-batch combiners);
* candidate generation is a pure map over positive-edge blocks — no
  shuffle, no RNG state (hash-of-content, parallelism-independent);
* the tail pool broadcasts once via ``ray.put`` below
  KGFORGE_GRAPH_BROADCAST_LIMIT (a sorted int64 array, vectorized
  fancy-indexing per batch); above it (or ``force_join``) the pool
  ships as an (idx, t) Dataset and candidates join on idx%B buckets;
* the true-edge filter is vectorized ``np.isin`` on packed (h,t)
  int64 keys against the broadcast positive set below the limit, else
  ONE tagged-union hash(h,t_neg) bucket anti-merge.

Both paths are pinned equal in tests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

M1 = 2654435761          # Knuth multiplicative constant (2^32 golden)
M2 = 2246822519          # xxhash PRIME32_2
M3 = 3266489917          # xxhash PRIME32_3
_MOD = 1 << 32

_OUT = pa.schema([("h", pa.int64()), ("t_pos", pa.int64()),
                  ("t_neg", pa.int64()), ("k", pa.int64())])


def _limit() -> int:
    return int(os.environ.get("KGFORGE_GRAPH_BROADCAST_LIMIT", 1_000_000))


def _pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(h, t) -> one int64 key (both ids < 2^31 in this graph family;
    guarded)."""
    assert a.size == 0 or (a.max() < (1 << 31) and b.max() < (1 << 31))
    return (a.astype(np.int64) << np.int64(31)) | b.astype(np.int64)


def negative_samples(edges: "ray.data.Dataset", k: int = 2,
                     force_join: bool = False) -> "ray.data.Dataset":
    """Filtered deterministic negative sampling over a directed
    (src:int64, dst:int64) edge Dataset. Returns
    (h, t_pos, t_neg, k) margin-ranking triplets."""
    import polars as pl
    from ..stages.dedup import default_num_buckets
    num_buckets = default_num_buckets()

    def dedup_batch(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["src", "dst"])).unique()
        return df.with_columns(
            (pl.col("src").hash(seed=0) % num_buckets)
            .cast(pl.Int32).alias("_gb")).to_arrow()

    def dedup_bucket(g: pa.Table) -> pa.Table:
        return (pl.from_arrow(g.select(["src", "dst"])).unique()
                .to_arrow().cast(pa.schema([("src", pa.int64()),
                                            ("dst", pa.int64())])))

    pos = (edges.map_batches(dedup_batch, batch_format="pyarrow")
           .groupby("_gb").map_groups(dedup_bucket,
                                      batch_format="pyarrow")
           ).materialize()

    # tail pool: sorted distinct dst (defines the hash->tail indexing
    # the oracle reproduces with row_number() OVER (ORDER BY dst))
    def tails(b: pa.Table) -> pa.Table:
        return pa.table({"t": pa.array(
            np.unique(b["dst"].to_numpy(zero_copy_only=False)),
            pa.int64())})

    pool_parts = [t["t"].to_numpy(zero_copy_only=False)
                  for t in pos.map_batches(tails, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow") if t.num_rows]
    pool = (np.unique(np.concatenate(pool_parts)) if pool_parts
            else np.array([], dtype=np.int64))
    n_pool = int(pool.size)
    if n_pool == 0:
        return ray.data.from_arrow(_OUT.empty_table())

    small = not force_join and (pos.count() + n_pool) <= _limit()
    pool_ref = ray.put(pool)

    if small:
        pos_keys = np.sort(np.concatenate(
            [_pack(t["src"].to_numpy(zero_copy_only=False),
                   t["dst"].to_numpy(zero_copy_only=False))
             for t in pos.iter_batches(batch_format="pyarrow")
             if t.num_rows]))
        keys_ref = ray.put(pos_keys)

        def gen(b: pa.Table, _k=k) -> pa.Table:
            pl_ = ray.get(pool_ref)
            keys = ray.get(keys_ref)
            h = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
            t = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
            hs, ts, ns, ks = [], [], [], []
            for kk in range(_k):
                idx = ((h * np.uint64(M1) + t * np.uint64(M2)
                        + np.uint64(kk) * np.uint64(M3))
                       % np.uint64(_MOD)) % np.uint64(len(pl_))
                neg = pl_[idx.astype(np.int64)]
                ok = ~np.isin(_pack(h.astype(np.int64), neg), keys)
                hs.append(h.astype(np.int64)[ok])
                ts.append(t.astype(np.int64)[ok])
                ns.append(neg[ok])
                ks.append(np.full(int(ok.sum()), kk, np.int64))
            return pa.table({
                "h": pa.array(np.concatenate(hs), pa.int64()),
                "t_pos": pa.array(np.concatenate(ts), pa.int64()),
                "t_neg": pa.array(np.concatenate(ns), pa.int64()),
                "k": pa.array(np.concatenate(ks), pa.int64())})

        from . import ensure_schema
        return ensure_schema(
            pos.map_batches(gen, batch_format="pyarrow"), _OUT)

    # ---- scale path: candidates with idx, pool join, edge anti-merge
    def cand(b: pa.Table, _k=k) -> pa.Table:
        h = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        t = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        hs, ts, ix, ks = [], [], [], []
        for kk in range(_k):
            idx = ((h * np.uint64(M1) + t * np.uint64(M2)
                    + np.uint64(kk) * np.uint64(M3))
                   % np.uint64(_MOD)) % np.uint64(n_pool)
            hs.append(h.astype(np.int64))
            ts.append(t.astype(np.int64))
            ix.append(idx.astype(np.int64))
            ks.append(np.full(len(h), kk, np.int64))
        return pa.table({
            "h": pa.array(np.concatenate(hs), pa.int64()),
            "t_pos": pa.array(np.concatenate(ts), pa.int64()),
            "_idx": pa.array(np.concatenate(ix), pa.int64()),
            "k": pa.array(np.concatenate(ks), pa.int64())})

    def attach_pool(b: pa.Table) -> pa.Table:
        # pool is index-addressable: resolve _idx locally against the
        # shared array (zero-copy plasma read — not a shuffle)
        pl_ = ray.get(pool_ref)
        idx = b["_idx"].to_numpy(zero_copy_only=False)
        return pa.table({
            "h": b["h"], "t_pos": b["t_pos"],
            "t_neg": pa.array(pl_[idx], pa.int64()), "k": b["k"]})

    cands = pos.map_batches(cand, batch_format="pyarrow").map_batches(
        attach_pool, batch_format="pyarrow")

    def tag_cand(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return df.with_columns(
            pl.lit(0, pl.Int8).alias("_t"),
            ((pl.col("h").hash(seed=0) + pl.col("t_neg").hash(seed=1))
             % num_buckets).cast(pl.Int32).alias("_gb")).to_arrow()

    def tag_pos(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["src", "dst"])).rename(
            {"src": "h", "dst": "t_neg"})
        return df.with_columns(
            pl.lit(None, pl.Int64).alias("t_pos"),
            pl.lit(None, pl.Int64).alias("k"),
            pl.lit(1, pl.Int8).alias("_t"),
            ((pl.col("h").hash(seed=0) + pl.col("t_neg").hash(seed=1))
             % num_buckets).cast(pl.Int32).alias("_gb")
        ).select(["h", "t_pos", "t_neg", "k", "_t", "_gb"]).to_arrow()

    def anti(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        true_e = (df.filter(pl.col("_t") == 1)
                  .select(["h", "t_neg"]).unique())
        keep = (df.filter(pl.col("_t") == 0)
                .select(["h", "t_pos", "t_neg", "k"])
                .join(true_e, on=["h", "t_neg"], how="anti"))
        return keep.to_arrow().cast(_OUT)

    from . import ensure_schema
    return ensure_schema(
        cands.map_batches(tag_cand, batch_format="pyarrow")
        .union(pos.map_batches(tag_pos, batch_format="pyarrow"))
        .groupby("_gb").map_groups(anti, batch_format="pyarrow"), _OUT)


def kg_negative_samples(sf_dir: str, k: int = 2,
                        force_join: bool = False) -> "ray.data.Dataset":
    """Gate: filtered deterministic negative samples over the synthetic
    link graph — (h, t_pos, t_neg, k) margin-ranking triplets."""
    from .linkgraph import build_links
    return negative_samples(build_links(sf_dir), k=k,
                            force_join=force_join)


def kg_negative_samples_sql(k: int = 2) -> str:
    from .linkgraph import _links_sql
    return f"""
WITH {_links_sql()},
pos AS (SELECT DISTINCT src, dst FROM links),
pool AS (SELECT t, row_number() OVER (ORDER BY t) - 1 AS idx
         FROM (SELECT DISTINCT dst AS t FROM links)),
np AS (SELECT count(*) AS c FROM pool),
cand AS (
  SELECT p.src AS h, p.dst AS t_pos, ks.k,
         CAST(((CAST(p.src AS HUGEINT) * {M1}
                + CAST(p.dst AS HUGEINT) * {M2}
                + CAST(ks.k AS HUGEINT) * {M3}) % {_MOD})
              % (SELECT c FROM np) AS BIGINT) AS idx
  FROM pos p CROSS JOIN (SELECT range AS k FROM range(0, {k})) ks)
SELECT CAST(c.h AS BIGINT) AS h, CAST(c.t_pos AS BIGINT) AS t_pos,
       CAST(pool.t AS BIGINT) AS t_neg, CAST(c.k AS BIGINT) AS k
FROM cand c JOIN pool ON pool.idx = c.idx
WHERE NOT EXISTS (SELECT 1 FROM pos
                  WHERE pos.src = c.h AND pos.dst = pool.t)
"""


_WALK = pa.schema([("start", pa.int64()), ("w", pa.int64()),
                   ("step", pa.int64()), ("node", pa.int64())])


def random_walks(edges: "ray.data.Dataset", length: int = 3,
                 walks_per_node: int = 2, force_join: bool = False
                 ) -> "ray.data.Dataset":
    """DeepWalk-style walk corpus, fully DETERMINISTIC: from every node
    with out-edges, ``walks_per_node`` truncated walks of ``length``
    steps; the next hop from node v at step s of walk w is
    ``neighbors(v)[hash(v, w, s) % deg(v)]`` with the sorted-neighbor
    ranking and the same mod-2^32 multiplicative hash as
    ``negative_samples`` — no RNG state, parallelism-independent, and a
    DuckDB recursive-CTE mirror is bit-exact. Dead ends truncate the
    walk (standard DeepWalk behavior).

    Output rows: (start, w, step, node) with step 0 = the start node.

    Scale shape: adjacency broadcasts once as CSR arrays (sorted node
    keys, offsets, flat neighbor list) below
    KGFORGE_GRAPH_BROADCAST_LIMIT edges — each step is then a pure
    vectorized map over the frontier (searchsorted + gather, no
    shuffle). Above it (or ``force_join``) the ranked adjacency ships
    as a Dataset and each step is ONE tagged-union hash(node) bucket
    join. L steps = L bounded rounds over a frontier that never
    exceeds |starts|·W rows."""
    import polars as pl
    from ..stages.dedup import default_num_buckets
    num_buckets = default_num_buckets()

    def dedup_batch(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b.select(["src", "dst"])).unique()
        return df.with_columns(
            (pl.col("src").hash(seed=0) % num_buckets)
            .cast(pl.Int32).alias("_gb")).to_arrow()

    def rank_bucket(g: pa.Table) -> pa.Table:
        # a src's edges land in ONE bucket, so the per-src sorted rank
        # computed here is the GLOBAL neighbor rank
        df = (pl.from_arrow(g.select(["src", "dst"])).unique()
              .sort(["src", "dst"]))
        df = df.with_columns(
            (pl.col("dst").cum_count().over("src") - 1).alias("r"),
            pl.col("dst").count().over("src").alias("deg"))
        return df.to_arrow().cast(pa.schema([
            ("src", pa.int64()), ("dst", pa.int64()),
            ("r", pa.int64()), ("deg", pa.int64())]))

    adj = (edges.map_batches(dedup_batch, batch_format="pyarrow")
           .groupby("_gb").map_groups(rank_bucket,
                                      batch_format="pyarrow")
           ).materialize()

    def starts_fn(b: pa.Table) -> pa.Table:
        return pa.table({"s": pa.array(
            np.unique(b["src"].to_numpy(zero_copy_only=False)),
            pa.int64())})

    s_parts = [t["s"].to_numpy(zero_copy_only=False)
               for t in adj.map_batches(starts_fn, batch_format="pyarrow")
               .iter_batches(batch_format="pyarrow") if t.num_rows]
    starts = (np.unique(np.concatenate(s_parts)) if s_parts
              else np.array([], dtype=np.int64))
    if starts.size == 0:
        return ray.data.from_arrow(_WALK.empty_table())

    step0 = pa.table({
        "start": pa.array(np.repeat(starts, walks_per_node), pa.int64()),
        "w": pa.array(np.tile(np.arange(walks_per_node, dtype=np.int64),
                              starts.size), pa.int64()),
        "step": pa.array(np.zeros(starts.size * walks_per_node,
                                  np.int64), pa.int64()),
        "node": pa.array(np.repeat(starts, walks_per_node), pa.int64()),
    })
    frontier = ray.data.from_arrow(step0)
    acc = [frontier]

    small = not force_join and adj.count() <= _limit()
    if small:
        tbls = [t for t in adj.iter_batches(batch_format="pyarrow")
                if t.num_rows]
        flat = pa.concat_tables(tbls).sort_by([("src", "ascending"),
                                               ("r", "ascending")])
        keys_all = flat["src"].to_numpy(zero_copy_only=False)
        neigh = flat["dst"].to_numpy(zero_copy_only=False)
        keys, first = np.unique(keys_all, return_index=True)
        offsets = np.append(first, len(keys_all))
        csr_ref = ray.put((keys, offsets.astype(np.int64), neigh))

    for s in range(length):
        if small:
            def hop(b: pa.Table, _s=s) -> pa.Table:
                keys_, off_, fl_ = ray.get(csr_ref)
                cur = b["node"].to_numpy(zero_copy_only=False)
                st = b["start"].to_numpy(zero_copy_only=False)
                w = b["w"].to_numpy(zero_copy_only=False)
                pos_ = np.searchsorted(keys_, cur)
                ok = pos_ < len(keys_)
                pos_c = np.minimum(pos_, len(keys_) - 1)
                ok &= keys_[pos_c] == cur
                cur, st, w, pos_c = cur[ok], st[ok], w[ok], pos_c[ok]
                deg = off_[pos_c + 1] - off_[pos_c]
                r = ((cur.astype(np.uint64) * np.uint64(M1)
                      + w.astype(np.uint64) * np.uint64(M2)
                      + np.uint64(_s) * np.uint64(M3))
                     % np.uint64(_MOD)) % deg.astype(np.uint64)
                nxt = fl_[off_[pos_c] + r.astype(np.int64)]
                return pa.table({
                    "start": pa.array(st, pa.int64()),
                    "w": pa.array(w, pa.int64()),
                    "step": pa.array(np.full(len(st), _s + 1, np.int64),
                                     pa.int64()),
                    "node": pa.array(nxt, pa.int64())})

            frontier = frontier.map_batches(
                hop, batch_format="pyarrow").materialize()
        else:
            def tag_front(b: pa.Table) -> pa.Table:
                df = pl.from_arrow(b)
                return df.with_columns(
                    pl.lit(None, pl.Int64).alias("dst"),
                    pl.lit(None, pl.Int64).alias("r"),
                    pl.lit(None, pl.Int64).alias("deg"),
                    pl.lit(0, pl.Int8).alias("_t"),
                    (pl.col("node").hash(seed=0) % num_buckets)
                    .cast(pl.Int32).alias("_gb")).select(
                    ["start", "w", "step", "node", "dst", "r", "deg",
                     "_t", "_gb"]).to_arrow()

            def tag_adj(b: pa.Table) -> pa.Table:
                df = pl.from_arrow(b)
                return df.with_columns(
                    pl.lit(None, pl.Int64).alias("start"),
                    pl.lit(None, pl.Int64).alias("w"),
                    pl.lit(None, pl.Int64).alias("step"),
                    pl.col("src").alias("node"),
                    pl.lit(1, pl.Int8).alias("_t"),
                    (pl.col("src").hash(seed=0) % num_buckets)
                    .cast(pl.Int32).alias("_gb")).select(
                    ["start", "w", "step", "node", "dst", "r", "deg",
                     "_t", "_gb"]).to_arrow()

            def hop_join(group: pa.Table, _s=s) -> pa.Table:
                df = pl.from_arrow(group)
                fr = df.filter(pl.col("_t") == 0).select(
                    ["start", "w", "node"])
                ad = df.filter(pl.col("_t") == 1).select(
                    ["node", "dst", "r", "deg"])
                dg = ad.select(["node", "deg"]).unique()
                j = fr.join(dg, on="node", how="inner")
                j = j.with_columns(
                    (((pl.col("node").cast(pl.UInt64) * M1
                       + pl.col("w").cast(pl.UInt64) * M2
                       + _s * M3) % _MOD)
                     % pl.col("deg").cast(pl.UInt64))
                    .cast(pl.Int64).alias("r"))
                out = (j.join(ad, on=["node", "r"], how="inner")
                       .select([pl.col("start"), pl.col("w"),
                                pl.lit(_s + 1, pl.Int64).alias("step"),
                                pl.col("dst").alias("node")]))
                return out.to_arrow().cast(_WALK)

            frontier = (frontier.map_batches(tag_front,
                                             batch_format="pyarrow")
                        .union(adj.map_batches(tag_adj,
                                               batch_format="pyarrow"))
                        .groupby("_gb").map_groups(
                            hop_join, batch_format="pyarrow")
                        ).materialize()
        if frontier.count() == 0:
            break
        acc.append(frontier)

    out = acc[0]
    for a in acc[1:]:
        out = out.union(a)
    from . import ensure_schema
    return ensure_schema(out, _WALK)


def kg_random_walks(sf_dir: str, length: int = 3, walks_per_node: int = 2,
                    force_join: bool = False) -> "ray.data.Dataset":
    """Gate: deterministic DeepWalk corpus over the synthetic link
    graph — (start, w, step, node) rows, step 0 = start."""
    from .linkgraph import build_links
    return random_walks(build_links(sf_dir), length=length,
                        walks_per_node=walks_per_node,
                        force_join=force_join)


def kg_random_walks_sql(length: int = 3, walks_per_node: int = 2) -> str:
    from .linkgraph import _links_sql
    return f"""
WITH RECURSIVE {_links_sql()},
adj AS (SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS r,
               count(*) OVER (PARTITION BY src) AS deg
        FROM (SELECT DISTINCT src, dst FROM links)),
starts AS (SELECT DISTINCT src AS s FROM links),
walk(start, w, step, node) AS (
  SELECT s, CAST(ws.range AS BIGINT), CAST(0 AS BIGINT), s
  FROM starts CROSS JOIN range(0, {walks_per_node}) ws
  UNION ALL
  SELECT wk.start, wk.w, wk.step + 1, a.dst
  FROM walk wk
  JOIN adj a ON a.src = wk.node
   AND a.r = CAST(((CAST(wk.node AS HUGEINT) * {M1}
                    + CAST(wk.w AS HUGEINT) * {M2}
                    + CAST(wk.step AS HUGEINT) * {M3}) % {_MOD})
                  % a.deg AS BIGINT)
  WHERE wk.step < {length}
)
SELECT CAST(start AS BIGINT) AS start, CAST(w AS BIGINT) AS w,
       CAST(step AS BIGINT) AS step, CAST(node AS BIGINT) AS node
FROM walk
"""


_PAIRS = pa.schema([("center", pa.int64()), ("context", pa.int64()),
                    ("dist", pa.int64())])


def skipgram_pairs(walks: "ray.data.Dataset", window: int = 2
                   ) -> "ray.data.Dataset":
    """(center, context, dist) skip-gram pairs from a walk corpus —
    the word2vec-style consumer of ``random_walks``: every ordered pair
    of nodes within ``window`` steps of each other on the SAME walk
    (dist = context_step - center_step, never 0).

    Shape: walks of one (start, w) are tiny (≤ length+1 rows), so the
    pairing is ONE hash(start, w) bucket shuffle and a per-bucket
    polars self-join on the walk key with the |step diff| ≤ window
    filter — the corpus-sized output streams out of the buckets; no
    per-walk Python."""
    import polars as pl
    from ..stages.dedup import default_num_buckets
    num_buckets = default_num_buckets()

    def tag(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b)
        return df.with_columns(
            ((pl.col("start").hash(seed=0) + pl.col("w").hash(seed=1))
             % num_buckets).cast(pl.Int32).alias("_gb")).to_arrow()

    def pair(group: pa.Table, _w=window) -> pa.Table:
        df = pl.from_arrow(group).select(["start", "w", "step", "node"])
        j = df.join(df, on=["start", "w"], suffix="_c")
        j = j.filter((pl.col("step") != pl.col("step_c"))
                     & ((pl.col("step_c") - pl.col("step")).abs() <= _w))
        out = j.select([
            pl.col("node").alias("center"),
            pl.col("node_c").alias("context"),
            (pl.col("step_c") - pl.col("step")).alias("dist")])
        return out.to_arrow().cast(_PAIRS)

    from . import ensure_schema
    return ensure_schema(
        walks.map_batches(tag, batch_format="pyarrow")
        .groupby("_gb").map_groups(pair, batch_format="pyarrow"), _PAIRS)


def kg_skipgram_pairs(sf_dir: str, window: int = 2) -> "ray.data.Dataset":
    """Gate: the full DeepWalk front half — deterministic walks over
    the link graph, then windowed skip-gram pairs."""
    return skipgram_pairs(kg_random_walks(sf_dir), window=window)


def kg_skipgram_pairs_sql(length: int = 3, walks_per_node: int = 2,
                          window: int = 2) -> str:
    walks = kg_random_walks_sql(length, walks_per_node)
    return f"""
WITH wk AS ({walks})
SELECT a.node AS center, b.node AS context,
       CAST(b.step - a.step AS BIGINT) AS dist
FROM wk a JOIN wk b
  ON a.start = b.start AND a.w = b.w AND a.step != b.step
 AND abs(b.step - a.step) <= {window}
"""


_IDMAP = pa.schema([("term", pa.string()), ("kind", pa.string()),
                    ("id", pa.int64())])
_ENC = pa.schema([("h_id", pa.int64()), ("r_id", pa.int64()),
                  ("t_id", pa.int64())])


def kg_id_maps(sf_dir: str) -> "ray.data.Dataset":
    """Gate: dense id maps for the v4 part store — the tensorization
    dictionaries of a KG-embedding pipeline: entities = distinct
    subjects ∪ objects (object terms kept in term form — literals get
    ids too, TransE-style training treats them as opaque symbols),
    relations = distinct predicates; ids dense 0-based in
    lexicographic order per kind (ops/rank.global_sorted_rank —
    distributed dictionary encoding, no driver value list)."""
    from ..pipelines.tabular import _v4_part_store
    from ..sinks.store_query import query_triples
    from .rank import global_sorted_rank
    store = _v4_part_store(sf_dir)
    trips = query_triples(store)

    def ents(b: pa.Table) -> pa.Table:
        s = b["s"].combine_chunks().cast(pa.string())
        o = b["o"].combine_chunks().cast(pa.string())
        return pa.table({"term": pa.concat_arrays([s, o])})

    def rels(b: pa.Table) -> pa.Table:
        return pa.table({"term": b["p"].combine_chunks()
                         .cast(pa.string())})

    emap = global_sorted_rank(
        trips.map_batches(ents, batch_format="pyarrow"), "term")
    rmap = global_sorted_rank(
        trips.map_batches(rels, batch_format="pyarrow"), "term")

    def tag(kind: str):
        def fn(b: pa.Table) -> pa.Table:
            return pa.table({
                "term": b["term"],
                "kind": pa.array([kind] * b.num_rows, pa.string()),
                "id": b["id"]})
        return fn

    from . import ensure_schema
    return ensure_schema(
        emap.map_batches(tag("entity"), batch_format="pyarrow")
        .union(rmap.map_batches(tag("relation"), batch_format="pyarrow")),
        _IDMAP)


def kg_id_maps_sql() -> str:
    from ..pipelines.tabular import v4_kg_part_sql
    v4 = v4_kg_part_sql()
    return f"""
WITH v4 AS ({v4}),
ents AS (SELECT DISTINCT t FROM (
  SELECT s AS t FROM v4 UNION SELECT o FROM v4)),
rels AS (SELECT DISTINCT p AS t FROM v4)
SELECT t AS term, 'entity' AS kind,
       CAST(row_number() OVER (ORDER BY t) - 1 AS BIGINT) AS id
FROM ents
UNION ALL
SELECT t, 'relation',
       CAST(row_number() OVER (ORDER BY t) - 1 AS BIGINT) FROM rels
"""


def kg_triples_encoded(sf_dir: str, force_join: bool = False
                       ) -> "ray.data.Dataset":
    """Gate: the v4 store as integer triplets (h_id, r_id, t_id) —
    model-ready tensor rows. The id maps attach via broadcast sorted
    arrays + searchsorted below KGFORGE_GRAPH_BROADCAST_LIMIT entries
    (the relation map is always ontology-sized; the entity map is
    node-sized); above it (or ``force_join``) each column attaches
    with ONE tagged-union hash(term) bucket merge."""
    import polars as pl
    from ..pipelines.tabular import _v4_part_store
    from ..sinks.store_query import query_triples
    from ..stages.dedup import default_num_buckets
    num_buckets = default_num_buckets()
    store = _v4_part_store(sf_dir)
    trips = query_triples(store)
    maps = kg_id_maps(sf_dir).materialize()

    def side(kind: str) -> "ray.data.Dataset":
        return maps.filter(lambda r, _k=kind: r["kind"] == _k)

    small = not force_join and maps.count() <= _limit()
    if small:
        def arrs(kind: str):
            parts = [t for t in side(kind)
                     .iter_batches(batch_format="pyarrow") if t.num_rows]
            tb = pa.concat_tables(parts).sort_by("term")
            return (tb["term"].to_numpy(zero_copy_only=False),
                    tb["id"].to_numpy(zero_copy_only=False))

        e_ref = ray.put(arrs("entity"))
        r_ref = ray.put(arrs("relation"))

        def enc(b: pa.Table) -> pa.Table:
            ek, ev = ray.get(e_ref)
            rk, rv = ray.get(r_ref)

            def look(col, k, v):
                x = col.to_numpy(zero_copy_only=False)
                return v[np.searchsorted(k, x)]

            return pa.table({
                "h_id": pa.array(look(b["s"], ek, ev), pa.int64()),
                "r_id": pa.array(look(b["p"], rk, rv), pa.int64()),
                "t_id": pa.array(look(b["o"], ek, ev), pa.int64())})

        from . import ensure_schema
        return ensure_schema(
            trips.map_batches(enc, batch_format="pyarrow"), _ENC)

    # scale path: one bucket merge per column, row identity carried by
    # a deterministic row key (s,p,o are unique in a store)
    cur = trips.map_batches(
        lambda b: pa.table({"s": b["s"].combine_chunks().cast(pa.string()),
                            "p": b["p"].combine_chunks().cast(pa.string()),
                            "o": b["o"].combine_chunks().cast(pa.string())}),
        batch_format="pyarrow")
    for col, kind, out in (("s", "entity", "h_id"),
                           ("p", "relation", "r_id"),
                           ("o", "entity", "t_id")):
        def tag_rows(b: pa.Table, _c=col) -> pa.Table:
            df = pl.from_arrow(b)
            return df.with_columns(
                pl.lit(None, pl.Int64).alias("_id"),
                pl.lit(0, pl.Int8).alias("_t"),
                (pl.col(_c).hash(seed=0) % num_buckets)
                .cast(pl.Int32).alias("_gb")).to_arrow()

        def tag_map(b: pa.Table, _c=col) -> pa.Table:
            df = (pl.from_arrow(b.select(["term", "id"]))
                  .rename({"term": _c, "id": "_id"}))
            cols = {c: pl.lit(None, pl.Utf8).alias(c)
                    for c in ("s", "p", "o") if c != _c}
            prev = {c: pl.lit(None, pl.Int64).alias(c)
                    for c in ("h_id", "r_id", "t_id")}
            df = df.with_columns(list(cols.values()) + list(prev.values())
                                 + [pl.lit(1, pl.Int8).alias("_t"),
                                    (pl.col(_c).hash(seed=0) % num_buckets)
                                    .cast(pl.Int32).alias("_gb")])
            return df.to_arrow()

        def merge(g: pa.Table, _c=col, _o=out) -> pa.Table:
            df = pl.from_arrow(g)
            rows = df.filter(pl.col("_t") == 0).drop(["_id", "_t", "_gb"])
            mp = (df.filter(pl.col("_t") == 1)
                  .select([_c, "_id"]).unique())
            j = rows.join(mp, on=_c, how="inner")
            return (j.with_columns(pl.col("_id").alias(_o))
                    .drop("_id").to_arrow())

        # align schemas: ensure id columns exist on the row side
        def seed_ids(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b)
            for c in ("h_id", "r_id", "t_id"):
                if c not in df.columns:
                    df = df.with_columns(pl.lit(None, pl.Int64).alias(c))
            return df.to_arrow()

        cur = (cur.map_batches(seed_ids, batch_format="pyarrow")
               .map_batches(tag_rows, batch_format="pyarrow")
               .union(maps.filter(lambda r, _k=kind: r["kind"] == _k)
                      .map_batches(tag_map, batch_format="pyarrow"))
               .groupby("_gb").map_groups(merge, batch_format="pyarrow")
               ).materialize()

    def fin(b: pa.Table) -> pa.Table:
        return b.select(["h_id", "r_id", "t_id"])

    from . import ensure_schema
    return ensure_schema(cur.map_batches(fin, batch_format="pyarrow"),
                         _ENC)


def kg_triples_encoded_sql() -> str:
    from ..pipelines.tabular import v4_kg_part_sql
    v4 = v4_kg_part_sql()
    return f"""
WITH v4 AS ({v4}),
emap AS (SELECT t, row_number() OVER (ORDER BY t) - 1 AS id FROM (
  SELECT DISTINCT t FROM (SELECT s AS t FROM v4 UNION SELECT o FROM v4))),
rmap AS (SELECT t, row_number() OVER (ORDER BY t) - 1 AS id FROM (
  SELECT DISTINCT p AS t FROM v4))
SELECT CAST(e1.id AS BIGINT) AS h_id, CAST(r.id AS BIGINT) AS r_id,
       CAST(e2.id AS BIGINT) AS t_id
FROM v4 JOIN emap e1 ON e1.t = v4.s
JOIN rmap r ON r.t = v4.p
JOIN emap e2 ON e2.t = v4.o
"""
