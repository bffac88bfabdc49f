"""Mergeable sketches for per-key cardinality and frequency at corpus
scale — the approximate counterparts to the exact paths.

Two operators, both designed around the same constraint: at 10^12
documents you cannot afford (and usually do not need) an exact shuffle
of the raw key/value stream.

* **KMV distinct count** (`kmv_distinct_count`): per-key K-Minimum-
  Values sketch. Each block contributes at most ``k`` 64-bit hashes per
  key (its k smallest), so the shuffle moves ``O(keys × k)`` rows no
  matter how many raw rows exist — compare `ops/skew.salted_distinct_
  count`, which moves every distinct pair and is the exact tool when
  exactness is the requirement. Estimator (integer-exact, so the
  independent scalar reference reproduces it bit-for-bit):
  ``n < k  -> n`` (sketch is the whole value set, estimate EXACT),
  else ``((k-1) << 64) // (kth_smallest_hash + 1)``. Standard error
  ~ 1/sqrt(k-2).
* **Heavy hitters** (`heavy_hitters`): PROVABLY EXACT top-k frequent
  values in two passes with bounded memory, for when the value
  cardinality itself is too large to groupby (every distinct URL /
  token / entity at web scale). Pass 1 keeps each block's top-``m``
  exact counts and records the truncation bound ``c_(m+1)``
  (≤ block_rows/(m+1)); any value dropped from EVERY block has true
  count ≤ Σ per-block bounds (``global_err``). Pass 2 broadcasts the
  candidate union and exact-counts ONLY candidates (a ``O(candidates)``
  pre-agg shuffle). The returned top-k is certified exact iff the kth
  exact count ≥ global_err; a failed certificate increments a lineage
  counter (`state/counters.py`) and raises unless ``best_effort``.

Hash spec (shared published constants with kgforge/scalar_ref.py, like
every sketch in this repo): ``h(int v) = splitmix64(uint64(v))``;
``h(str v) = splitmix64(crc32(utf8(v)))``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.dedup import default_num_buckets

MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def splitmix64(v: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (wrapping)."""
    z = (v + np.uint64(0x9E3779B97F4A7C15)) & MASK64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & MASK64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & MASK64
    return (z ^ (z >> np.uint64(31))) & MASK64


def _value_hashes(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Spec hash of a value column: ints pass through as uint64,
    strings go through crc32 — then splitmix64. Per-UNIQUE crc for
    strings (dictionary encode) keeps the Python loop off the row
    axis."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_integer(arr.type):
        base = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
        return splitmix64(base.astype(np.uint64))
    enc = arr.cast(pa.string()).dictionary_encode()
    uniq = np.array([zlib.crc32(t.encode()) for t in
                     enc.dictionary.to_pylist()], dtype=np.uint64)
    idx = np.asarray(enc.indices.to_numpy(zero_copy_only=False))
    return splitmix64(uniq[idx])


def kmv_estimate(sorted_unique_hashes: np.ndarray, k: int) -> int:
    """Integer-exact KMV estimator over a key's merged sketch."""
    n = len(sorted_unique_hashes)
    if n < k:
        return int(n)
    kth = int(sorted_unique_hashes[k - 1])
    return ((k - 1) << 64) // (kth + 1)


def kmv_distinct_count(ds: "ray.data.Dataset", key: str, value: str,
                       k: int = 256, num_buckets: int | None = None,
                       out_col: str = "distinct_est"
                       ) -> "ray.data.Dataset":
    """Approximate ``COUNT(DISTINCT value) GROUP BY key`` via per-key
    KMV sketches: output ``(key, out_col:int64)``. Exchange volume is
    ≤ k rows per key per block — independent of the raw row count."""
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def batch_sketch(batch: pa.Table) -> pa.Table:
        import polars as pl
        h = _value_hashes(batch[value])
        df = pl.DataFrame({
            "k": pl.from_arrow(
                batch[key].combine_chunks().cast(pa.string())),
            "h": h,
        })
        # per-key k smallest distinct hashes (C++ group_by + sort)
        sk = (df.group_by("k")
              .agg(pl.col("h").unique().sort().head(k))
              .explode("h"))
        bucket = ((sk.select("k").hash_rows(seed=0) % num_buckets)
                  .cast(pl.Int32).rename("_bucket"))
        target = pa.schema([pa.field("k", pa.string()),
                            pa.field("h", pa.uint64()),
                            pa.field("_bucket", pa.int32())])
        return sk.with_columns(bucket).to_arrow().cast(target)

    def per_bucket(group: pa.Table) -> pa.Table:
        import polars as pl
        merged = (pl.from_arrow(group.select(["k", "h"]))
                  .group_by("k")
                  .agg(pl.col("h").unique().sort().head(k)))
        keys = merged["k"].to_list()
        # O(1) Python per UNIQUE key (exact big-int division, matching
        # the scalar reference bit-for-bit); the row axis stays in C++
        ests = [kmv_estimate(np.asarray(hs, dtype=np.uint64), k)
                for hs in merged["h"].to_list()]
        return pa.table({key: pa.array(keys, type=pa.string()),
                         out_col: pa.array(ests, type=pa.int64())})

    return (ds.map_batches(batch_sketch, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pyarrow"))


# -------------------------------------------------- gate: approx doc-freq
def entity_doc_frequency_kmv(sf_dir: str, k: int = 64
                             ) -> "ray.data.Dataset":
    """KMV-estimated per-entity document frequency — the approximate
    sibling of ``ops/skew.entity_doc_frequency`` (same mention stream;
    k=64 keeps the estimator in its approximating regime at every
    testdata scale). Output (mention, doc_freq_est:int64)."""
    from ..pipelines.webkg import LEXICON

    value_set = pa.array(sorted(LEXICON), type=pa.string())

    def mention_doc_pairs(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks().cast(pa.string())
        doc_id = batch["doc_id"].combine_chunks().cast(pa.int64())
        split = pc.split_pattern(text, pattern=" ")
        flat = split.flatten()
        parents = pc.list_parent_indices(split)
        mask = pc.is_in(flat, value_set=value_set)
        return pa.table({
            "mention": flat.filter(mask),
            "doc_id": doc_id.take(parents.filter(mask)),
        })

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    pairs = ds.map_batches(mention_doc_pairs, batch_format="pyarrow")
    return kmv_distinct_count(pairs, key="mention", value="doc_id",
                              k=k, out_col="doc_freq_est")


# ----------------------------------------------------- heavy hitters
class ExactnessError(RuntimeError):
    """Top-k could not be certified exact from the pass-1 bounds."""


def heavy_hitters(ds: "ray.data.Dataset", col: str, k: int = 10,
                  summary_size: int = 1024, best_effort: bool = False
                  ) -> pa.Table:
    """Provably exact top-``k`` most frequent values of ``col`` in two
    bounded-memory passes (see module docstring). Returns an arrow
    table ``(value, count)`` sorted by (count desc, value asc) — a
    driver-side result by design (k rows).

    ``summary_size`` (m) trades pass-1 memory against certifiability:
    any value with global frequency > total_rows/(m+1) is guaranteed to
    be a candidate."""
    m = summary_size

    def batch_summary(batch: pa.Table) -> pa.Table:
        import polars as pl
        vc = (pl.from_arrow(batch[col].combine_chunks().cast(pa.string()))
              .rename("v").value_counts())
        vc = vc.sort(["count", "v"], descending=[True, False])
        kept = vc.head(m)
        dropped_bound = int(vc["count"][m]) if vc.height > m else 0
        t = kept.to_arrow()
        return pa.table({
            "v": pa.concat_arrays(
                [t["v"].combine_chunks().cast(pa.string()),
                 pa.array([""], type=pa.string())]),
            "cnt": pa.concat_arrays([
                t["count"].combine_chunks().cast(pa.int64()),
                pa.array([dropped_bound], type=pa.int64())]),
            "is_bound": pa.array([False] * len(kept) + [True]),
        })

    def fold(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["v", "is_bound"]).aggregate([("cnt", "sum")])
        return pa.table({"v": g["v"], "cnt": g["cnt_sum"],
                         "is_bound": g["is_bound"]})

    # candidate union + global error bound — both driver-side tables
    # bounded by design: ≤ m+1 rows per block, folded again per output
    # block before collection
    sdf = (ds.map_batches(batch_summary, batch_format="pyarrow")
           .map_batches(fold, batch_format="pyarrow").to_pandas())
    global_err = int(sdf.loc[sdf["is_bound"], "cnt"].sum())
    cand = sorted(sdf.loc[~sdf["is_bound"], "v"].unique())

    # pass 2: exact counts, candidates only (tiny filtered pre-agg)
    cand_ref = ray.put(pa.array(cand, type=pa.string()))

    def exact_partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].combine_chunks().cast(pa.string())
        keep = vals.filter(pc.is_in(vals, value_set=ray.get(cand_ref)))
        g = pa.table({"v": keep}).group_by("v").aggregate(
            [([], "count_all")])
        return pa.table({"v": g["v"],
                         "cnt": g["count_all"].cast(pa.int64()),
                         "is_bound": pa.array([False] * len(g))})

    edf = (ds.map_batches(exact_partial, batch_format="pyarrow")
           .map_batches(fold, batch_format="pyarrow").to_pandas())
    exact_counts = edf.groupby("v")["cnt"].sum()
    pairs = sorted(((v, int(c)) for v, c in exact_counts.items()),
                   key=lambda p: (-p[1], p[0]))[:k]

    kth = pairs[-1][1] if len(pairs) >= k else 0
    if len(pairs) >= k and kth < global_err:
        from ..state import counters
        counters.inc("heavy_hitters.uncertified_topk")
        if not best_effort:
            raise ExactnessError(
                f"kth count {kth} < dropped-mass bound {global_err}; "
                f"raise summary_size (m={m}) or pass best_effort=True")
    return pa.table({
        "value": pa.array([p[0] for p in pairs], type=pa.string()),
        "count": pa.array([p[1] for p in pairs], type=pa.int64()),
    })


def token_heavy_hitters(sf_dir: str, k: int = 10,
                        summary_size: int = 1024) -> pa.Table:
    """Gate: exact top-k tokens over the documents corpus via the
    two-pass bounded-memory path. Output (value, count)."""

    def tokens(batch: pa.Table) -> pa.Table:
        flat = pc.split_pattern(
            batch["text"].combine_chunks().cast(pa.string()),
            pattern=" ").flatten()
        return pa.table({"token": flat.filter(
            pc.greater(pc.utf8_length(flat), 0))})

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])
    tok = ds.map_batches(tokens, batch_format="pyarrow")
    return heavy_hitters(tok, "token", k=k, summary_size=summary_size)


def token_heavy_hitters_sql(k: int = 10) -> str:
    return f"""
SELECT token AS value, CAST(count(*) AS BIGINT) AS count
FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
WHERE len(token) > 0
GROUP BY 1
ORDER BY count DESC, value ASC
LIMIT {k}
"""
