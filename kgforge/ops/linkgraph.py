"""Web link-graph construction over the corpus: per-page degree stats
and reciprocal-link detection.

The sandbox has no real hyperlinks, so the link table is synthesized
with seedless arithmetic the oracle mirrors in SQL (each doc links to
``(7·id+1) mod N`` and ``(13·id+5) mod N`` — a multigraph, self-loops
allowed in degrees, excluded from reciprocity). The OPERATORS are the
generic web-graph ones:

* ``link_degree_stats`` — out/in degree per node via the tagged-union
  combiner: each link contributes (src,1,0) and (dst,0,1); per-batch
  pre-aggregation collapses the wire to node-cardinality partials, one
  groupby(node) sum finishes. Same associative algebra in the SQL
  mirror, so hot pages (high in-degree) never concentrate rows: the
  combiner adds them up before the exchange.
* ``reciprocal_links`` — unordered-pair grouping: distinct directed
  edges per batch (combiner), ONE hash(lo,hi) bucket shuffle, then a
  per-bucket global-distinct + count==2. The unordered key is the
  standard trick to co-locate both directions of an edge in one
  shuffle instead of a self-join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..sources.readers import read_table

LINK_MULTS = ((7, 1), (13, 5))


def build_links(sf_dir: str) -> "ray.data.Dataset":
    """(src, dst) directed multigraph from the deterministic formula."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    n = ds.count()

    def links(batch: pa.Table) -> pa.Table:
        ids = (batch["doc_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        src = np.concatenate([ids for _ in LINK_MULTS])
        dst = np.concatenate([(ids * m + c) % n for m, c in LINK_MULTS])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return ds.map_batches(links, batch_format="pyarrow")


def _links_sql() -> str:
    arms = [(f"SELECT doc_id AS src, (doc_id * {m} + {c}) % c_n AS dst "
             f"FROM documents, n") for m, c in LINK_MULTS]
    return ("n AS (SELECT count(*) AS c_n FROM documents),\n"
            "links AS (" + "\nUNION ALL\n".join(arms) + ")")


def link_degree_stats(sf_dir: str) -> "ray.data.Dataset":
    links = build_links(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)
        tagged = pl.concat([
            df.select(pl.col("src").alias("doc_id"),
                      pl.lit(1, pl.Int64).alias("o"),
                      pl.lit(0, pl.Int64).alias("i")),
            df.select(pl.col("dst").alias("doc_id"),
                      pl.lit(0, pl.Int64).alias("o"),
                      pl.lit(1, pl.Int64).alias("i")),
        ])
        return tagged.group_by("doc_id").agg(
            pl.col("o").sum(), pl.col("i").sum()).to_arrow()

    from ray.data.aggregate import Sum
    agg = (links.map_batches(partial, batch_format="pyarrow")
           .groupby("doc_id")
           .aggregate(Sum("o", alias_name="out_degree"),
                      Sum("i", alias_name="in_degree")))

    def cast(batch: pa.Table) -> pa.Table:
        return batch.cast(pa.schema([
            ("doc_id", pa.int64()), ("out_degree", pa.int64()),
            ("in_degree", pa.int64())]))

    return agg.map_batches(cast, batch_format="pyarrow")


def link_degree_stats_sql() -> str:
    return f"""
WITH {_links_sql()},
nodes AS (
  SELECT src AS doc_id, 1 AS o, 0 AS i FROM links
  UNION ALL
  SELECT dst, 0, 1 FROM links
)
SELECT doc_id, CAST(sum(o) AS BIGINT) AS out_degree,
       CAST(sum(i) AS BIGINT) AS in_degree
FROM nodes GROUP BY doc_id
"""


def reciprocal_links(sf_dir: str, num_buckets: int | None = None
                     ) -> "ray.data.Dataset":
    """(a, b) with a < b where both a→b and b→a exist (self-loops and
    parallel edges ignored)."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    links = build_links(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch).filter(pl.col("src") != pl.col("dst"))
        e = df.unique()
        e = e.with_columns(
            pl.min_horizontal("src", "dst").alias("a"),
            pl.max_horizontal("src", "dst").alias("b"),
            (pl.col("src") < pl.col("dst")).alias("fwd"),
        ).select(["a", "b", "fwd"]).unique()
        # reduce before mixing so the mix never overflows int64
        bucket = (((e["a"] % (1 << 31)) * 31 + (e["b"] % (1 << 31)))
                  % num_buckets).cast(pl.Int32)
        return e.with_columns(bucket.alias("_bucket")).to_arrow()

    def finish(group: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(group.drop_columns(["_bucket"])).unique()
        out = (df.group_by(["a", "b"]).len()
               .filter(pl.col("len") == 2).select(["a", "b"]))
        return out.to_arrow().cast(pa.schema([
            ("a", pa.int64()), ("b", pa.int64())]))

    from . import ensure_schema
    return ensure_schema(
        links.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket").map_groups(finish, batch_format="pyarrow"),
        pa.schema([("a", pa.int64()), ("b", pa.int64())]))


def reciprocal_links_sql() -> str:
    return f"""
WITH {_links_sql()},
e AS (SELECT DISTINCT src, dst FROM links WHERE src != dst),
p AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b, count(*) AS c
  FROM e GROUP BY 1, 2
)
SELECT a, b FROM p WHERE c = 2
"""
