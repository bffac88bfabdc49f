"""Exact set-similarity self-join (Jaccard >= tau over token sets) with
prefix filtering — the AllPairs/PPJoin family (Bayardo et al. 2007;
Xiao et al. 2008), the published way to make an exact similarity join
scale without comparing every pair.

Threshold is a RATIONAL tau_num/tau_den and every comparison is integer
arithmetic (``c·(den+num) >= num·(|A|+|B|)`` ⇔ ``c/(|A|+|B|−c) >= τ``),
so engine and SQL oracle agree bit-for-bit — no float boundary.

Pipeline (each stage a combiner or ONE bucket shuffle):

1. DF pass — token document frequencies (per-batch distinct combiner →
   lexicon-sized aggregate). The global token ORDER (df asc, token asc)
   broadcasts as a rank dict: rarest-first ordering is what makes
   prefixes selective.
2. Docsets — each doc's distinct tokens as a SORTED int32 rank array.
3. Prefix postings — only the first ``p = s − ceil(τ·s) + 1`` ranks per
   doc are posted (the prefix-filter theorem: any pair at or above τ
   must collide inside both prefixes under one global order).
4. Candidates — one hash(rank) bucket shuffle; per token group all
   (a<b) pairs passing the SIZE filter ``τ·|a| <= |b| <= |a|/τ``;
   distinct pairs via one pair-bucket shuffle.
5. Verify — two tagged-union bucket joins attach both rank arrays to
   each candidate pair, then polars ``list.set_intersection`` counts
   |A∩B| at C speed. Always distributed (no driver table); a broadcast
   fast path for small docsets would be a pure optimization.

Skew note: a frequent token inside many prefixes makes a quadratic
group — the published mitigations (positional filter, suffix filter)
tighten it further; this implementation carries the size filter only
and documents the group-volume assumption, which holds when the
ordering is rarest-first and vocabularies are web-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..sources.readers import read_table

TAU_NUM, TAU_DEN = 3, 5


def _token_ranks(sf_dir: str) -> dict[str, int]:
    """Global token order: df ascending, token ascending. Lexicon-sized
    driver table (the same bounded shape as the vocab/top-k ops)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        text = batch["text"].combine_chunks().cast(pa.string())
        ids = batch["doc_id"].combine_chunks()
        split = pc.split_pattern(text, pattern=" ")
        flat = split.flatten()
        parents = pc.list_parent_indices(split)
        mask = pc.greater(pc.utf8_length(flat), 0)
        pairs = pl.from_arrow(pa.table({
            "t": flat.filter(mask),
            "doc_id": ids.take(parents.filter(mask))})).unique()
        return pairs.group_by("t").len().rename({"len": "df"}) \
            .with_columns(pl.col("df").cast(pl.Int64)).to_arrow()

    from ray.data.aggregate import Sum
    rows = (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("t").aggregate(Sum("df", alias_name="df")).take_all())
    rows.sort(key=lambda r: (r["df"], r["t"]))
    return {r["t"]: i for i, r in enumerate(rows)}


def _docsets_fn(ranks_ref):
    """(doc_id, text) -> (doc_id, toks: sorted rank list, size).
    Task-based map (the ranks dict rides the closure as an ObjectRef —
    one plasma read per task, no actor-pool startup cost)."""

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl
        ranks = (ray.get(ranks_ref)
                 if not isinstance(ranks_ref, dict) else ranks_ref)
        text = batch["text"].combine_chunks().cast(pa.string())
        ids = batch["doc_id"].combine_chunks()
        split = pc.split_pattern(text, pattern=" ")
        flat = split.flatten()
        parents = pc.list_parent_indices(split)
        mask = pc.greater(pc.utf8_length(flat), 0)
        df = pl.from_arrow(pa.table({
            "doc_id": ids.take(parents.filter(mask)),
            "t": flat.filter(mask)})).unique()
        rk = pl.Series("r", [ranks[t] for t in df["t"]],
                       dtype=pl.Int32)
        out = (df.with_columns(rk).group_by("doc_id")
               .agg(pl.col("r").sort().alias("toks"))
               .with_columns(pl.col("toks").list.len().cast(pl.Int64)
                             .alias("size")))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("toks", pa.list_(pa.int32())),
            ("size", pa.int64())]))

    return fn


def _prefix_len(sizes: np.ndarray, tau_num: int, tau_den: int
                ) -> np.ndarray:
    return sizes - (tau_num * sizes + tau_den - 1) // tau_den + 1


def jaccard_pairs(sf_dir: str, tau_num: int = TAU_NUM,
                  tau_den: int = TAU_DEN,
                  num_buckets: int | None = None) -> "ray.data.Dataset":
    """All doc pairs (a<b) with token-set Jaccard >= tau_num/tau_den.
    Output (a_id, b_id, n_common, size_a, size_b) — exact, integer."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()

    ranks_ref = ray.put(_token_ranks(sf_dir))
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    # materialized ONCE: the docset index feeds postings AND both verify
    # joins — it is the PPJoin intermediate (distinct int ranks per doc,
    # far smaller than the corpus) and re-deriving it three times would
    # re-tokenize the corpus three times
    docsets = docs.map_batches(_docsets_fn(ranks_ref),
                               batch_format="pyarrow").materialize()

    def postings(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)
        sizes = df["size"].to_numpy()
        plen = _prefix_len(sizes.astype(np.int64), tau_num, tau_den)
        out = (df.with_columns(pl.Series("p", plen))
               .with_columns(pl.col("toks").list.head(pl.col("p"))
                             .alias("pref"))
               .select(["doc_id", "size", "pref"]).explode("pref")
               .rename({"pref": "r"}))
        bucket = (out["r"].cast(pl.Int64) % num_buckets).cast(pl.Int32)
        return out.with_columns(bucket.alias("_bucket")).to_arrow() \
            .cast(pa.schema([("doc_id", pa.int64()), ("size", pa.int64()),
                             ("r", pa.int32()), ("_bucket", pa.int32())]))

    def group_pairs(group: pa.Table) -> pa.Table:
        import polars as pl
        df = (pl.from_arrow(group.drop_columns(["_bucket"]))
              .unique().sort(["r", "doc_id"]))
        outs = []
        for _, g in df.group_by("r", maintain_order=True):
            ids = g["doc_id"].to_numpy()
            szs = g["size"].to_numpy()
            m = len(ids)
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, 1)
            sa, sb = szs[ii], szs[jj]
            keep = ((tau_num * np.maximum(sa, sb))
                    <= (tau_den * np.minimum(sa, sb)))
            if not keep.any():
                continue
            outs.append(pa.table({
                "a_id": pa.array(ids[ii][keep], pa.int64()),
                "b_id": pa.array(ids[jj][keep], pa.int64())}))
        if not outs:
            return pa.table({"a_id": pa.array([], pa.int64()),
                             "b_id": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    cands = (docsets.map_batches(postings, batch_format="pyarrow")
             .groupby("_bucket").map_groups(group_pairs,
                                            batch_format="pyarrow"))

    # distinct pairs: one pair-bucket shuffle
    def pair_bucket(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch).unique()
        b = (((df["a_id"] % (1 << 31)) * 31 + (df["b_id"] % (1 << 31)))
             % num_buckets).cast(pl.Int32)
        return df.with_columns(b.alias("_bucket")).to_arrow()

    def pair_distinct(group: pa.Table) -> pa.Table:
        import polars as pl
        return pl.from_arrow(group.drop_columns(["_bucket"])).unique() \
            .to_arrow().cast(pa.schema([("a_id", pa.int64()),
                                        ("b_id", pa.int64())]))

    pairs = (cands.map_batches(pair_bucket, batch_format="pyarrow")
             .groupby("_bucket").map_groups(pair_distinct,
                                            batch_format="pyarrow"))

    # verify: attach both rank arrays via tagged-union bucket joins
    # (schemas passed explicitly — Dataset.schema() would execute the
    # whole upstream pipeline once per call just to infer them)
    s0 = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])
    s1 = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()),
                    ("toks_a", pa.list_(pa.int32()))])
    pairs = _attach(pairs, docsets, "a_id", "toks_a", num_buckets, s0)
    pairs = _attach(pairs, docsets, "b_id", "toks_b", num_buckets, s1)

    def exact(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)
        df = df.with_columns(
            pl.col("toks_a").list.set_intersection(pl.col("toks_b"))
            .list.len().cast(pl.Int64).alias("n_common"),
            pl.col("toks_a").list.len().cast(pl.Int64).alias("size_a"),
            pl.col("toks_b").list.len().cast(pl.Int64).alias("size_b"))
        df = df.filter(pl.col("n_common") * (tau_den + tau_num)
                       >= tau_num * (pl.col("size_a") + pl.col("size_b")))
        return df.select(["a_id", "b_id", "n_common", "size_a",
                          "size_b"]).to_arrow()

    from . import ensure_schema
    return ensure_schema(
        pairs.map_batches(exact, batch_format="pyarrow"),
        pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()),
                   ("n_common", pa.int64()), ("size_a", pa.int64()),
                   ("size_b", pa.int64())]))


def _attach(pairs: "ray.data.Dataset", docsets: "ray.data.Dataset",
            id_col: str, out_col: str, num_buckets: int,
            pschema: pa.Schema) -> "ray.data.Dataset":
    """Inner-join ``pairs`` with docsets' rank arrays on ``id_col`` via
    ONE tagged-union bucket shuffle (docsets side is one row per doc —
    already distinct)."""
    pcols = pschema.names
    union_schema = pa.schema(
        [(f"_p_{c}", pschema.field(c).type) for c in pcols] +
        [("_k", pa.int64()), ("_toks", pa.list_(pa.int32())),
         ("_side", pa.int8()), ("_bucket", pa.int32())])

    def tag_pairs(batch: pa.Table) -> pa.Table:
        k = batch[id_col].combine_chunks().cast(pa.int64())
        kb = (k.to_numpy(zero_copy_only=False) % num_buckets) \
            .astype(np.int32)
        arrays = [batch[c].combine_chunks() for c in pcols]
        arrays += [k, pa.nulls(len(k), pa.list_(pa.int32())),
                   pa.array([0] * len(k), pa.int8()), pa.array(kb)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def tag_docs(batch: pa.Table) -> pa.Table:
        k = batch["doc_id"].combine_chunks().cast(pa.int64())
        kb = (k.to_numpy(zero_copy_only=False) % num_buckets) \
            .astype(np.int32)
        arrays = [pa.nulls(len(k), pschema.field(c).type)
                  for c in pcols]
        arrays += [k, batch["toks"].combine_chunks(),
                   pa.array([1] * len(k), pa.int8()), pa.array(kb)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    out_schema = pa.schema([(c, pschema.field(c).type)
                            for c in pcols] +
                           [(out_col, pa.list_(pa.int32()))])

    def bucket_join(group: pa.Table) -> pa.Table:
        import polars as pl
        side = group["_side"].combine_chunks()
        left = group.filter(pc.equal(side, 0))
        right = group.filter(pc.equal(side, 1)).select(["_k", "_toks"])
        lp = pl.from_arrow(left.select([f"_p_{c}" for c in pcols] +
                                       ["_k"]))
        rp = pl.from_arrow(right)
        j = lp.join(rp, on="_k", how="inner").drop("_k")
        j = j.rename({f"_p_{c}": c for c in pcols}) \
             .rename({"_toks": out_col})
        return j.to_arrow().cast(out_schema)

    from ..stages.canonicalize import SANITIZE_BATCH
    tagged = (pairs.map_batches(tag_pairs, batch_format="pyarrow",
                                batch_size=SANITIZE_BATCH)
              .union(docsets.map_batches(tag_docs, batch_format="pyarrow",
                                         batch_size=SANITIZE_BATCH)))
    return (tagged.groupby("_bucket")
            .map_groups(bucket_join, batch_format="pyarrow"))


def jaccard_pairs_sql(tau_num: int = TAU_NUM,
                      tau_den: int = TAU_DEN) -> str:
    return f"""
WITH raw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
tok AS (SELECT DISTINCT doc_id, t FROM raw WHERE len(t) > 0),
sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, CAST(c AS BIGINT) AS n_common,
       CAST(sa.n AS BIGINT) AS size_a, CAST(sb.n AS BIGINT) AS size_b
FROM inter
JOIN sizes sa ON sa.doc_id = a_id
JOIN sizes sb ON sb.doc_id = b_id
WHERE c * ({tau_den} + {tau_num}) >= {tau_num} * (sa.n + sb.n)
"""


# --------------------------------------- incremental near-dup screening
PRIOR_MOD = 4  # doc_id % 4 != 0 -> prior corpus (same split as ops/bloom)


def jaccard_new_vs_prior(sf_dir: str, tau_num: int = TAU_NUM,
                         tau_den: int = TAU_DEN,
                         num_buckets: int | None = None
                         ) -> "ray.data.Dataset":
    """Incremental NEAR-dup screening: which incoming docs are >= τ
    Jaccard-similar to some prior-corpus doc. Completes the incremental
    ingest family (ops/bloom = exact dups, this = near dups), exactly
    and with the same prefix-filter machinery as ``jaccard_pairs`` —
    the only change is that candidate generation pairs ACROSS sides
    only (new × prior inside each token group), so the quadratic term
    is new-batch-sized × group-overlap, not corpus².
    Output (new_id, prior_id, n_common, size_new, size_prior)."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()

    ranks_ref = ray.put(_token_ranks(sf_dir))
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    docsets = docs.map_batches(_docsets_fn(ranks_ref),
                               batch_format="pyarrow").materialize()

    def postings(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)
        sizes = df["size"].to_numpy()
        plen = _prefix_len(sizes.astype(np.int64), tau_num, tau_den)
        out = (df.with_columns(pl.Series("p", plen))
               .with_columns(pl.col("toks").list.head(pl.col("p"))
                             .alias("pref"))
               .select(["doc_id", "size", "pref"]).explode("pref")
               .rename({"pref": "r"})
               .with_columns((pl.col("doc_id") % PRIOR_MOD == 0)
                             .alias("is_new")))
        bucket = (out["r"].cast(pl.Int64) % num_buckets).cast(pl.Int32)
        return out.with_columns(bucket.alias("_bucket")).to_arrow() \
            .cast(pa.schema([("doc_id", pa.int64()), ("size", pa.int64()),
                             ("r", pa.int32()), ("is_new", pa.bool_()),
                             ("_bucket", pa.int32())]))

    def group_pairs(group: pa.Table) -> pa.Table:
        import polars as pl
        df = (pl.from_arrow(group.drop_columns(["_bucket"]))
              .unique().sort(["r", "doc_id"]))
        outs = []
        for _, g in df.group_by("r", maintain_order=True):
            new = g.filter(pl.col("is_new"))
            old = g.filter(~pl.col("is_new"))
            if not len(new) or not len(old):
                continue
            n_ids = np.repeat(new["doc_id"].to_numpy(), len(old))
            n_sz = np.repeat(new["size"].to_numpy(), len(old))
            o_ids = np.tile(old["doc_id"].to_numpy(), len(new))
            o_sz = np.tile(old["size"].to_numpy(), len(new))
            keep = ((tau_num * np.maximum(n_sz, o_sz))
                    <= (tau_den * np.minimum(n_sz, o_sz)))
            if not keep.any():
                continue
            outs.append(pa.table({
                "new_id": pa.array(n_ids[keep], pa.int64()),
                "prior_id": pa.array(o_ids[keep], pa.int64())}))
        if not outs:
            return pa.table({"new_id": pa.array([], pa.int64()),
                             "prior_id": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    cands = (docsets.map_batches(postings, batch_format="pyarrow")
             .groupby("_bucket").map_groups(group_pairs,
                                            batch_format="pyarrow"))

    def pair_bucket(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch).unique()
        b = (((df["new_id"] % (1 << 31)) * 31 + (df["prior_id"] % (1 << 31)))
             % num_buckets).cast(pl.Int32)
        return df.with_columns(b.alias("_bucket")).to_arrow()

    def pair_distinct(group: pa.Table) -> pa.Table:
        import polars as pl
        return pl.from_arrow(group.drop_columns(["_bucket"])).unique() \
            .to_arrow().cast(pa.schema([("new_id", pa.int64()),
                                        ("prior_id", pa.int64())]))

    pairs = (cands.map_batches(pair_bucket, batch_format="pyarrow")
             .groupby("_bucket").map_groups(pair_distinct,
                                            batch_format="pyarrow"))

    s0 = pa.schema([("new_id", pa.int64()), ("prior_id", pa.int64())])
    s1 = pa.schema([("new_id", pa.int64()), ("prior_id", pa.int64()),
                    ("toks_a", pa.list_(pa.int32()))])
    pairs = _attach(pairs, docsets, "new_id", "toks_a", num_buckets, s0)
    pairs = _attach(pairs, docsets, "prior_id", "toks_b", num_buckets, s1)

    def exact(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)
        df = df.with_columns(
            pl.col("toks_a").list.set_intersection(pl.col("toks_b"))
            .list.len().cast(pl.Int64).alias("n_common"),
            pl.col("toks_a").list.len().cast(pl.Int64).alias("size_new"),
            pl.col("toks_b").list.len().cast(pl.Int64).alias("size_prior"))
        df = df.filter(pl.col("n_common") * (tau_den + tau_num)
                       >= tau_num * (pl.col("size_new")
                                     + pl.col("size_prior")))
        return df.select(["new_id", "prior_id", "n_common", "size_new",
                          "size_prior"]).to_arrow()

    from . import ensure_schema
    return ensure_schema(
        pairs.map_batches(exact, batch_format="pyarrow"),
        pa.schema([("new_id", pa.int64()), ("prior_id", pa.int64()),
                   ("n_common", pa.int64()), ("size_new", pa.int64()),
                   ("size_prior", pa.int64())]))


def jaccard_new_vs_prior_sql(tau_num: int = TAU_NUM,
                             tau_den: int = TAU_DEN) -> str:
    return f"""
WITH raw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
tok AS (SELECT DISTINCT doc_id, t FROM raw WHERE len(t) > 0),
sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
inter AS (
  SELECT a.doc_id AS new_id, b.doc_id AS prior_id, count(*) AS c
  FROM tok a JOIN tok b ON a.t = b.t
  WHERE a.doc_id % {PRIOR_MOD} = 0 AND b.doc_id % {PRIOR_MOD} != 0
  GROUP BY 1, 2
)
SELECT new_id, prior_id, CAST(c AS BIGINT) AS n_common,
       CAST(sa.n AS BIGINT) AS size_new, CAST(sb.n AS BIGINT) AS size_prior
FROM inter
JOIN sizes sa ON sa.doc_id = new_id
JOIN sizes sb ON sb.doc_id = prior_id
WHERE c * ({tau_den} + {tau_num}) >= {tau_num} * (sa.n + sb.n)
"""
