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
being exact-and-cheap; the scale path there is a mergeable quantile
sketch (KLL/GK) traded against an error bound — out of scope here
because every gated use has a discrete domain. The module docstring of
``ops/sketch.py`` covers the approximate-sketch design rules this repo
follows when that trade is taken.
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
