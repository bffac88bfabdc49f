"""Exact distributed grouped quantiles via counting pre-aggregation.

``percentile_disc`` per group is a holistic aggregate: a plain
``groupby(key).map_groups(sort)`` ships every raw row of a group to one
reducer — at corpus scale that is the hot-key trap again. But for the
columns a training-data pipeline actually takes percentiles of
(document lengths, token counts, quality scores on a fixed grid), the
VALUE DOMAIN is discrete and far smaller than the row count. That
makes the exact answer cheap with the right factorization:

1. per-batch combiner: ``group_by (key, value) count`` — at most
   ``|keys| × |distinct values|`` rows leave any block, independent of
   the raw row count;
2. one bucket-hash shuffle keyed by ``hash(key)`` (after combining, a
   hot key contributes ≤ one row per distinct value per block — the
   group itself is histogram-sized, so co-locating a whole key is
   safe);
3. per-bucket vectorized finish (polars): per-key cumulative counts
   over sorted values, then for each requested percentile ``p`` the
   SQL-standard discrete percentile — the smallest value whose
   cumulative count reaches ``p%`` of the group total. The threshold
   test is ``100*cum >= p*n`` in int64, bit-identical to DuckDB's
   ``percentile_disc(p/100)`` with no float boundary flake.

For genuinely unbounded/continuous domains this factorization stops
being exact-and-cheap; the scale path is the mergeable log-bucketed
sketch at the bottom of this module (``hdr_quantiles``) — bounded
relative error traded for a state size that no longer depends on the
value domain at all.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..stages.dedup import default_num_buckets

DEFAULT_PCTS = (25, 50, 90, 99)


def grouped_quantiles(ds: "ray.data.Dataset", key: str, value: str,
                      pcts: tuple[int, ...] = DEFAULT_PCTS,
                      num_buckets: int | None = None
                      ) -> "ray.data.Dataset":
    """Exact per-key discrete percentiles of an integer column.
    Output: ``(key, n:int64, p<P>:int64 per requested percentile)``.
    ``pcts`` are integer percents (e.g. 50 for the median)."""
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        g = (batch.select([key, value])
             .group_by([key, value]).aggregate([([], "count_all")]))
        t = pa.table({key: g[key].cast(pa.string()),
                      "v": g[value].cast(pa.int64()),
                      "cnt": g["count_all"].cast(pa.int64())})
        df = pl.from_arrow(t)
        bucket = ((df.select(key).hash_rows(seed=0) % num_buckets)
                  .cast(pl.Int32).rename("_bucket"))
        return df.with_columns(bucket).to_arrow().cast(
            pa.schema([(key, pa.string()), ("v", pa.int64()),
                       ("cnt", pa.int64()), ("_bucket", pa.int32())]))

    def per_bucket(group: pa.Table) -> pa.Table:
        import polars as pl
        hist = (pl.from_arrow(group.select([key, "v", "cnt"]))
                .group_by([key, "v"]).agg(pl.col("cnt").sum())
                .sort([key, "v"]))
        hist = hist.with_columns(
            cum=pl.col("cnt").cum_sum().over(key),
            n=pl.col("cnt").sum().over(key))
        out = hist.group_by(key).agg(pl.col("n").first()).sort(key)
        for p in pcts:
            q = (hist.filter(pl.col("cum") * 100 >= pl.col("n") * p)
                 .group_by(key).agg(pl.col("v").first().alias(f"p{p}")))
            out = out.join(q, on=key, how="left")
        fields = [(key, pa.string()), ("n", pa.int64())] + [
            (f"p{p}", pa.int64()) for p in pcts]
        return out.to_arrow().cast(pa.schema(fields))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket").map_groups(per_bucket,
                                           batch_format="pyarrow"))


# -------------------------------------------- gate: doc length quantiles
def lang_length_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Gate: per-language document-length percentiles over the
    documents corpus. Output (lang, n, p25, p50, p90, p99)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    return grouped_quantiles(ds, "lang", "n_chars")


def lang_length_quantiles_sql(pcts: tuple[int, ...] = DEFAULT_PCTS) -> str:
    cols = ",\n       ".join(
        f"CAST(percentile_disc({p / 100}) WITHIN GROUP (ORDER BY n_chars)"
        f" AS BIGINT) AS p{p}" for p in pcts)
    return f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       {cols}
FROM documents
GROUP BY lang
"""


# ------------------------------- mergeable log-bucketed quantile sketch
# For genuinely unbounded value domains the counting factorization above
# stops being cheap. This is the approximate counterpart: an
# HdrHistogram-style sketch whose bucket id is derived from the float64
# (exponent, top-b-mantissa-bits) of the value — pure deterministic
# integer/IEEE ops (no log(), whose libm rounding could differ between
# the vectorized engine and an oracle). Relative error of the reported
# quantile is bounded by 2^-b (bucket width / bucket lower bound);
# buckets are O(64 * 2^b) per key no matter the data, counts merge by
# addition, and the exchange is O(keys × occupied buckets).
HDR_BITS = 7   # 2^-7 < 0.8% relative error


def hdr_bucket_ids(v: "np.ndarray", bits: int = HDR_BITS) -> "np.ndarray":
    """Vectorized bucket id for non-negative int64 values: 0 -> 0,
    else ((exp+1200) << bits) | top-`bits` mantissa bits, from
    np.frexp (IEEE, deterministic; the +1200 bias keeps ids positive
    for subnormal-range exponents)."""
    import numpy as np
    x = v.astype(np.float64)
    if (v < 0).any():
        raise ValueError("hdr sketch requires non-negative values")
    m, e = np.frexp(x)          # x = m * 2**e, m in [0.5, 1)
    prefix = ((m - 0.5) * (1 << (bits + 1))).astype(np.int64)
    ids = ((e.astype(np.int64) + 1200) << bits) | prefix
    return np.where(v == 0, 0, ids)


def hdr_bucket_lo(bucket_id: int, bits: int = HDR_BITS) -> float:
    """Lower-bound representative value of a bucket (same arithmetic
    in kgforge/scalar_ref.hdr_quantiles_ref)."""
    if bucket_id == 0:
        return 0.0
    e = (bucket_id >> bits) - 1200
    prefix = bucket_id & ((1 << bits) - 1)
    return (0.5 + prefix / (1 << (bits + 1))) * 2.0 ** e


def hdr_quantiles(ds: "ray.data.Dataset", key: str, value: str,
                  pcts: tuple[int, ...] = DEFAULT_PCTS,
                  bits: int = HDR_BITS,
                  num_buckets: int | None = None) -> "ray.data.Dataset":
    """Approximate per-key percentiles for unbounded non-negative
    integer domains: output ``(key, n:int64, q<P>:float64 per pct)``
    where ``q<P>`` is the lower bound of the bucket containing the
    exact discrete percentile — within 2^-bits relative error of it.
    Same percentile rule as the exact op (100*cum >= p*n)."""
    import numpy as np
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        v = (batch[value].combine_chunks().cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        t = pa.table({key: batch[key].combine_chunks().cast(pa.string()),
                      "b": pa.array(hdr_bucket_ids(v, bits), pa.int64())})
        g = t.group_by([key, "b"]).aggregate([([], "count_all")])
        df = pl.from_arrow(pa.table({
            key: g[key], "b": g["b"],
            "cnt": g["count_all"].cast(pa.int64())}))
        bucket = ((df.select(key).hash_rows(seed=0) % num_buckets)
                  .cast(pl.Int32).rename("_bucket"))
        return df.with_columns(bucket).to_arrow().cast(
            pa.schema([(key, pa.string()), ("b", pa.int64()),
                       ("cnt", pa.int64()), ("_bucket", pa.int32())]))

    def per_bucket(group: pa.Table) -> pa.Table:
        import polars as pl
        hist = (pl.from_arrow(group.select([key, "b", "cnt"]))
                .group_by([key, "b"]).agg(pl.col("cnt").sum())
                .sort([key, "b"]))
        hist = hist.with_columns(
            cum=pl.col("cnt").cum_sum().over(key),
            n=pl.col("cnt").sum().over(key))
        out = hist.group_by(key).agg(pl.col("n").first()).sort(key)
        for p in pcts:
            q = (hist.filter(pl.col("cum") * 100 >= pl.col("n") * p)
                 .group_by(key).agg(pl.col("b").first().alias(f"q{p}")))
            out = out.join(q, on=key, how="left")
        t = out.to_arrow()
        cols = {key: t[key].combine_chunks().cast(pa.string()),
                "n": t["n"].combine_chunks().cast(pa.int64())}
        for p in pcts:
            ids = t[f"q{p}"].combine_chunks().cast(pa.int64()).to_pylist()
            cols[f"q{p}"] = pa.array(
                [hdr_bucket_lo(i, bits) for i in ids], pa.float64())
        return pa.table(cols)

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket").map_groups(per_bucket,
                                           batch_format="pyarrow"))


def lang_length_quantiles_hdr(sf_dir: str) -> "ray.data.Dataset":
    """Gate: the approximate sibling of ``lang_length_quantiles`` —
    same corpus, same percentile rule, log-bucketed sketch. Output
    (lang, n, q25, q50, q90, q99)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    return hdr_quantiles(ds, "lang", "n_chars")


# ------------------------------------- percentile-threshold corpus filter
def percentile_threshold_filter(sf_dir: str, pct: int = 50
                                ) -> "ray.data.Dataset":
    """Keep documents at or above their language's ``pct``-th length
    percentile — the standard quality gate "drop the short tail,
    per-stratum". Composition of existing scale pieces: the exact
    grouped-quantile aggregate produces a LEXICON-sized threshold
    table, which broadcasts into a streaming filter — the corpus is
    scanned twice (once to build thresholds, once to filter) and never
    shuffled. At 100 TB the threshold table is still a few hundred
    rows; only the histogram partials move in pass 1."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "n_chars"])
    th_rows = grouped_quantiles(ds, "lang", "n_chars",
                                pcts=(pct,)).take_all()
    th = {r["lang"]: r[f"p{pct}"] for r in th_rows}
    import ray as _ray
    th_ref = _ray.put(th)

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])

    def keep(batch: pa.Table) -> pa.Table:
        import numpy as np
        import ray as _ray_
        t = (_ray_.get(th_ref) if not isinstance(th_ref, dict) else th_ref)
        lang = batch["lang"].combine_chunks()
        enc = lang.dictionary_encode()
        lut = np.array([t.get(v, 0) for v in enc.dictionary.to_pylist()],
                       dtype=np.int64)
        thr = lut[enc.indices.to_numpy(zero_copy_only=False)]
        n = (batch["n_chars"].combine_chunks().cast(pa.int64())
             .to_numpy(zero_copy_only=False))
        return batch.filter(pa.array(n >= thr))

    return docs.map_batches(keep, batch_format="pyarrow")


def percentile_threshold_filter_sql(pct: int = 50) -> str:
    return f"""
WITH th AS (
  SELECT lang, percentile_disc({pct / 100}) WITHIN GROUP
         (ORDER BY n_chars) AS thr
  FROM documents GROUP BY lang
)
SELECT doc_id, d.lang, n_chars
FROM documents d JOIN th ON d.lang = th.lang
WHERE n_chars >= thr
"""
