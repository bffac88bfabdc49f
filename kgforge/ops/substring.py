"""Substring-level (cross-document) duplicated n-gram coverage.

Document-level dedup (ops/dedup.py) removes whole near-identical pages;
training corpora additionally carry *substring* duplication — boilerplate
passages repeated across otherwise-distinct documents (Lee et al.,
"Deduplicating Training Data Makes Language Models Better", ACL 2022,
which dedups at the 50-token-substring level). This module measures that:
for every document, the number of word n-gram positions whose n-gram also
occurs in at least one OTHER document. A downstream filter can drop or
trim documents whose duplicated-gram fraction exceeds a threshold.

Scale design (the part that matters at 100 TB):
- Gram construction is one vectorized polars pass per batch (explode +
  window shift + concat_str — no Python loop over rows or tokens).
- The per-batch combiner collapses (doc, gram) repeats BEFORE the wire:
  what shuffles is one row per distinct gram per doc per block, bucketed
  by hash(gram) — the same histogram-sized-exchange discipline as
  grouped_topk_counts (ops/relational.py:743).
- ONE gram-keyed bucket shuffle decides cross-doc duplication (a gram's
  rows all land in one bucket); the per-bucket kernel is a C-level
  polars groupby. Hot grams ("click here to subscribe" at web scale)
  are safe: their exchange mass is one row per doc per block, and the
  bucket kernel is a sum, not a pairwise expansion.
- The doc-level rollup is a second (doc-keyed) exchange of one row per
  doc per bucket — corpus-sized, not gram-sized.
- Docs with fewer than n tokens never produce grams; the final
  left-outer join against the (doc_id, n_grams) side restores them with
  zero counts so the output covers every document.

Reference tie-in: the reference has no substring notion (its unit is the
CSV cell, csv2rdf-v5/csv2rdf-v5.py:486-491); this is one of the mandated
beyond-reference training-data operators.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..sources.readers import read_table

DEFAULT_N = 5

_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()),
                         ("n_dup_grams", pa.int64())])


def _gram_partials(n: int, num_buckets: int):
    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        toks = (df.with_columns(pl.col("text").str.split(" ").alias("w0"))
                .drop("text").explode("w0"))
        shifted = [pl.col("w0").shift(-k).over("doc_id").alias(f"w{k}")
                   for k in range(1, n)]
        grams = (toks.with_columns(shifted)
                 .drop_nulls()
                 .select(
                     pl.col("doc_id"),
                     pl.concat_str([pl.col(f"w{k}") for k in range(n)],
                                   separator=" ").alias("gram")))
        gd = grams.group_by(["doc_id", "gram"]).len().rename({"len": "cnt"})
        bucket = ((gd.select("gram").hash_rows(seed=0) % num_buckets)
                  .cast(pl.Int32).rename("_bucket"))
        out = gd.with_columns(bucket)
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("gram", pa.string()),
            ("cnt", pa.int64()), ("_bucket", pa.int32())]))
    return fn


def _per_bucket_dup(group: pa.Table) -> pa.Table:
    """Within one gram bucket: keep rows of grams seen in >= 2 docs,
    pre-summed per doc (one output row per doc per bucket)."""
    import polars as pl
    df = pl.from_arrow(group.select(["doc_id", "gram", "cnt"]))
    # combiner partials from different blocks of the SAME doc merge here
    df = df.group_by(["doc_id", "gram"]).agg(pl.col("cnt").sum())
    dup = (df.with_columns(
               pl.col("doc_id").n_unique().over("gram").alias("ndocs"))
           .filter(pl.col("ndocs") >= 2)
           .group_by("doc_id").agg(pl.col("cnt").sum().alias("n_dup")))
    return dup.to_arrow().cast(pa.schema([
        ("doc_id", pa.int64()), ("n_dup", pa.int64())]))


def dup_gram_coverage(sf_dir: str, n: int = DEFAULT_N,
                      num_buckets: int | None = None
                      ) -> "ray.data.Dataset":
    """Per-document cross-doc duplicated n-gram coverage.

    Output: (doc_id, n_grams, n_dup_grams) — n_grams is the number of
    word n-gram positions in the doc (max(tokens-n+1, 0)); n_dup_grams
    is how many of those positions hold a gram that occurs in >= 2
    distinct documents. All integers (stable value hashes)."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    from ..stages.canonicalize import SANITIZE_BATCH

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    dup_per_doc = (docs
                   .map_batches(_gram_partials(n, num_buckets),
                                batch_format="pyarrow")
                   .groupby("_bucket")
                   .map_groups(_per_bucket_dup, batch_format="pyarrow")
                   .groupby("doc_id").sum("n_dup"))

    def totals(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        out = df.select(
            pl.col("doc_id"),
            (pl.col("text").str.split(" ").list.len()
             .cast(pl.Int64) - (n - 1)).clip(0).alias("n_grams"))
        return (out.with_columns(pl.lit(0, pl.Int64).alias("n_dup_grams"))
                .to_arrow().cast(_OUT_SCHEMA))

    def dup_rows(batch: pa.Table) -> pa.Table:
        zeros = pa.array([0] * batch.num_rows, type=pa.int64())
        return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                         "n_grams": zeros,
                         "n_dup_grams": batch["sum(n_dup)"]
                         .cast(pa.int64())})

    # Tagged union instead of a left-outer join: both streams share one
    # schema, so a corpus with zero duplicated grams (empty dup side)
    # degrades cleanly, and the combine is ONE doc-keyed aggregate.
    tot = docs.map_batches(totals, batch_format="pyarrow",
                           batch_size=SANITIZE_BATCH)
    dup = dup_per_doc.map_batches(dup_rows, batch_format="pyarrow",
                                  batch_size=SANITIZE_BATCH)
    agg = (tot.union(dup).groupby("doc_id")
           .sum(["n_grams", "n_dup_grams"]))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_grams": batch["sum(n_grams)"].cast(pa.int64()),
            "n_dup_grams": batch["sum(n_dup_grams)"].cast(pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=SANITIZE_BATCH)


def dup_gram_coverage_sql(n: int = DEFAULT_N) -> str:
    """DuckDB mirror: same word grams via list slicing (1-based,
    inclusive), same >=2-distinct-docs rule."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id,
         array_to_string(t[CAST(i AS BIGINT):CAST(i + {n - 1} AS BIGINT)],
                         ' ') AS gram
  FROM toks, UNNEST(range(1, len(t) - {n - 2})) AS r(i)
  WHERE len(t) >= {n}
), gd AS (
  SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY 1, 2
), dupdoc AS (
  SELECT doc_id, SUM(cnt) AS n_dup FROM gd
  WHERE gram IN (SELECT gram FROM gd GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(greatest(len(string_split(d.text, ' ')) - {n - 1}, 0) AS BIGINT)
           AS n_grams,
       CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_grams
FROM documents d LEFT JOIN dupdoc USING (doc_id)
"""
