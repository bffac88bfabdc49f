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
# denser variant for triangle counting: the 2-arm formula is
# triangle-free at test scale, so the triangle gate adds ring chords
# i -> i+1 and i -> i+2, which plant (i, i+1, i+2) triangles everywhere
TRI_MULTS = LINK_MULTS + ((1, 1), (1, 2))


def build_links(sf_dir: str, mults=LINK_MULTS) -> "ray.data.Dataset":
    """(src, dst) directed multigraph from the deterministic formula."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    n = ds.count()

    def links(batch: pa.Table) -> pa.Table:
        ids = (batch["doc_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        src = np.concatenate([ids for _ in mults])
        dst = np.concatenate([(ids * m + c) % n for m, c in mults])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return ds.map_batches(links, batch_format="pyarrow")


def _links_sql(mults=LINK_MULTS) -> str:
    arms = [(f"SELECT doc_id AS src, (doc_id * {m} + {c}) % c_n AS dst "
             f"FROM documents, n") for m, c in mults]
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


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation)
# ---------------------------------------------------------------------------

def _pair_bucket_expr(df, num_buckets: int):
    import polars as pl
    return (((pl.col("a") % (1 << 31)) * 31 + (pl.col("b") % (1 << 31)))
            % num_buckets).cast(pl.Int32)


def distinct_edges(links: "ray.data.Dataset", num_buckets: int
                   ) -> "ray.data.Dataset":
    """Globally-distinct undirected simple edges (a, b) with a < b:
    per-batch distinct combiner, ONE hash(a,b) bucket shuffle, per-bucket
    global distinct. Output carries `_bucket` so downstream consumers that
    shuffle on the same pair key reuse the layout."""

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch).filter(pl.col("src") != pl.col("dst"))
        e = df.select(pl.min_horizontal("src", "dst").alias("a"),
                      pl.max_horizontal("src", "dst").alias("b")).unique()
        return e.with_columns(
            _pair_bucket_expr(e, num_buckets).alias("_bucket")).to_arrow()

    def finish(group: pa.Table) -> pa.Table:
        import polars as pl
        return (pl.from_arrow(group).unique().to_arrow()
                .cast(pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                 ("_bucket", pa.int32())])))

    from . import ensure_schema
    return ensure_schema(
        links.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket").map_groups(finish, batch_format="pyarrow"),
        pa.schema([("a", pa.int64()), ("b", pa.int64()),
                   ("_bucket", pa.int32())]))


def _edge_degrees(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(node, deg) over the undirected simple graph — tagged-union
    combiner, node-sized result."""
    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch.select(["a", "b"]))
        tagged = pl.concat([df.select(pl.col("a").alias("node")),
                            df.select(pl.col("b").alias("node"))])
        return (tagged.group_by("node")
                .agg(pl.len().cast(pl.Int64).alias("d")).to_arrow())

    from ray.data.aggregate import Sum
    return (edges.map_batches(partial, batch_format="pyarrow")
            .groupby("node").aggregate(Sum("d", alias_name="deg")))


def _orient_edges(edges: "ray.data.Dataset", deg: "ray.data.Dataset",
                  num_buckets: int, force_join: bool = False
                  ) -> "ray.data.Dataset":
    """Orient each undirected edge from its lower-rank endpoint to the
    higher, rank = (degree, node) lexicographic — the classic orientation
    that bounds every out-neighborhood at O(sqrt(2m)) so wedge
    generation never blows up on hubs.

    Degree attach is size-adaptive: node table ≤
    KGFORGE_GRAPH_BROADCAST_LIMIT → ray.put once + per-batch vectorized
    searchsorted; above it → two tagged-union bucket-hash merges (the
    always-scalable path; `force_join` pins it for tests)."""
    from .graph import _broadcast_limit

    if not force_join and deg.count() <= _broadcast_limit():
        import ray as _ray
        dt = deg.to_pandas()
        order = np.argsort(dt["node"].to_numpy())
        ref = _ray.put((dt["node"].to_numpy()[order],
                        dt["deg"].to_numpy()[order]))

        def orient(batch: pa.Table, ref=ref) -> pa.Table:
            import ray as _ray
            nodes, degs = _ray.get(ref)
            a = batch["a"].to_numpy(zero_copy_only=False)
            b = batch["b"].to_numpy(zero_copy_only=False)
            da = degs[np.searchsorted(nodes, a)]
            db = degs[np.searchsorted(nodes, b)]
            fwd = (da < db) | ((da == db) & (a < b))
            return pa.table({
                "src": pa.array(np.where(fwd, a, b), pa.int64()),
                "nbr": pa.array(np.where(fwd, b, a), pa.int64())})

        return edges.map_batches(orient, batch_format="pyarrow")

    # scalable path: two tagged-union bucket-hash merges; the node-sized
    # degree table ships once per merge, never per batch
    cur = edges.select_columns(["a", "b"])
    carry = ["a", "b"]
    for col, out in (("a", "da"), ("b", "db")):
        cols = list(carry)  # edge payload columns at this step

        def tag_edge(batch: pa.Table, col=col, cols=cols) -> pa.Table:
            key = batch[col].to_numpy(zero_copy_only=False)
            t = batch.select(cols)
            t = t.append_column("node", pa.array(key, pa.int64()))
            t = t.append_column("deg", pa.nulls(batch.num_rows, pa.int64()))
            t = t.append_column("_jb", pa.array(
                (key % num_buckets).astype(np.int32)))
            return t.select(sorted(t.column_names))

        def tag_deg(batch: pa.Table, cols=cols) -> pa.Table:
            t = batch.select(["node", "deg"])
            for c in cols:
                t = t.append_column(c, pa.nulls(batch.num_rows, pa.int64()))
            key = batch["node"].to_numpy(zero_copy_only=False)
            t = t.append_column("_jb", pa.array(
                (key % num_buckets).astype(np.int32)))
            return t.select(sorted(t.column_names))

        def merge(group: pa.Table, out=out, cols=cols) -> pa.Table:
            import polars as pl
            df = pl.from_arrow(group.drop_columns(["_jb"]))
            e = df.filter(pl.col("deg").is_null()).select(cols + ["node"])
            d = (df.filter(pl.col("deg").is_not_null())
                 .select(["node", "deg"]).unique())
            return (e.join(d, on="node", how="inner").drop("node")
                    .rename({"deg": out}).to_arrow())

        cur = (cur.map_batches(tag_edge, batch_format="pyarrow")
               .union(deg.map_batches(tag_deg, batch_format="pyarrow"))
               .groupby("_jb").map_groups(merge, batch_format="pyarrow"))
        carry = cols + [out]

    def orient2(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        da = batch["da"].to_numpy(zero_copy_only=False)
        db = batch["db"].to_numpy(zero_copy_only=False)
        fwd = (da < db) | ((da == db) & (a < b))
        return pa.table({
            "src": pa.array(np.where(fwd, a, b), pa.int64()),
            "nbr": pa.array(np.where(fwd, b, a), pa.int64())})

    return cur.map_batches(orient2, batch_format="pyarrow")


def triangle_node_counts(links: "ray.data.Dataset",
                         num_buckets: int | None = None,
                         force_join: bool = False) -> "ray.data.Dataset":
    """Per-node triangle participation counts over the undirected simple
    graph of `links` — each triangle contributes 1 to each of its three
    vertices. Exact, every triangle enumerated exactly once.

    Plan (all-to-alls: 3 bucket shuffles + 1 node groupby, no joins on
    the corpus):
      1. distinct undirected edges (pair-bucket shuffle);
      2. node degrees (node groupby, node-sized);
      3. orient low-rank -> high-rank (adaptive degree attach);
      4. wedges: ONE hash(src) shuffle, per-bucket fully-vectorized
         within-group pair generation (out-degree <= sqrt(2m) under the
         orientation, so the pair mass is O(m^1.5) worst-case — the
         standard bound);
      5. closure: tagged union of wedges + edges, ONE hash(a,b) shuffle,
         per-bucket polars semi-join, per-bucket (node,1) combiner,
         final groupby(doc_id) sum.
    """
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    out_schema_tri = pa.schema([("doc_id", pa.int64()),
                                ("triangles", pa.int64())])
    edges = distinct_edges(links, num_buckets).materialize()
    if edges.count() == 0:        # all links self-loops (found by fuzz)
        return ray.data.from_arrow(out_schema_tri.empty_table())
    deg = _edge_degrees(edges)
    oriented = _orient_edges(edges, deg, num_buckets, force_join=force_join)

    def wedge_tag(batch: pa.Table) -> pa.Table:
        key = batch["src"].to_numpy(zero_copy_only=False)
        return batch.append_column("_wb", pa.array(
            (key % num_buckets).astype(np.int32)))

    def wedges(group: pa.Table) -> pa.Table:
        src = group["src"].to_numpy(zero_copy_only=False)
        nbr = group["nbr"].to_numpy(zero_copy_only=False)
        order = np.lexsort((nbr, src))
        src, nbr = src[order], nbr[order]
        # within-group position of each row (groups are contiguous)
        new_grp = np.empty(len(src), dtype=bool)
        new_grp[0:1] = True
        new_grp[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(new_grp)
        grp_of = np.cumsum(new_grp) - 1
        pos = np.arange(len(src)) - starts[grp_of]
        # element i pairs with the pos[i] earlier rows of its group
        total = int(pos.sum())
        if total == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "u": pa.array([], pa.int64())})
        right = np.repeat(np.arange(len(src)), pos)
        off = np.cumsum(pos) - pos           # exclusive prefix per element
        left = (np.arange(total) - np.repeat(off, pos)
                + np.repeat(starts[grp_of], pos))
        v, w = nbr[left], nbr[right]
        return pa.table({
            "a": pa.array(np.minimum(v, w), pa.int64()),
            "b": pa.array(np.maximum(v, w), pa.int64()),
            "u": pa.array(src[right], pa.int64())})

    wedge_ds = (oriented.map_batches(wedge_tag, batch_format="pyarrow")
                .groupby("_wb").map_groups(wedges, batch_format="pyarrow"))

    def tag_pairs(batch: pa.Table, is_edge: bool) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)
        if is_edge:
            df = df.select(["a", "b"]).with_columns(
                pl.lit(None, pl.Int64).alias("u"))
        return df.with_columns(
            _pair_bucket_expr(df, num_buckets).alias("_bucket")).to_arrow()

    union = (wedge_ds.map_batches(
                 lambda b: tag_pairs(b, False), batch_format="pyarrow")
             .union(edges.map_batches(
                 lambda b: tag_pairs(b, True), batch_format="pyarrow")))

    def close(group: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(group.drop_columns(["_bucket"]))
        w = df.filter(pl.col("u").is_not_null())
        e = df.filter(pl.col("u").is_null()).select(["a", "b"])
        tri = w.join(e, on=["a", "b"], how="semi")
        if tri.height == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64())})
        nodes = pl.concat([tri.select(pl.col("a").alias("doc_id")),
                           tri.select(pl.col("b").alias("doc_id")),
                           tri.select(pl.col("u").alias("doc_id"))])
        return (nodes.group_by("doc_id")
                .agg(pl.len().cast(pl.Int64).alias("t")).to_arrow())

    from ray.data.aggregate import Sum
    agg = (union.groupby("_bucket").map_groups(close, batch_format="pyarrow")
           .groupby("doc_id").aggregate(Sum("t", alias_name="triangles")))

    from . import ensure_schema
    return ensure_schema(
        agg.map_batches(
            lambda b: b.cast(pa.schema([("doc_id", pa.int64()),
                                        ("triangles", pa.int64())])),
            batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("triangles", pa.int64())]))


def triangle_counts(sf_dir: str) -> "ray.data.Dataset":
    """Gate: per-node triangle counts over the denser 4-arm link graph."""
    return triangle_node_counts(build_links(sf_dir, TRI_MULTS))


def triangle_counts_sql() -> str:
    # node-id orientation (a<b<c) enumerates the same triangle set the
    # engine's degree orientation does — once each
    return f"""
WITH {_links_sql(TRI_MULTS)},
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM links WHERE src != dst),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
nodes AS (
  SELECT x AS doc_id FROM t
  UNION ALL SELECT y FROM t
  UNION ALL SELECT z FROM t
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS triangles
FROM nodes GROUP BY doc_id
"""


def clustering_coefficient(sf_dir: str, num_buckets: int | None = None
                           ) -> "ray.data.Dataset":
    """Per-node local clustering coefficient over the 4-arm graph, in
    exact integer permille: coeff = 2000·triangles // (deg·(deg-1)) for
    deg ≥ 2, else 0. Reuses the triangle plan; degrees and triangle
    counts meet on ONE hash(node) tagged-union bucket merge (triangle
    side is sparse — nodes without triangles fill 0)."""
    import polars as pl
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    links = build_links(sf_dir, TRI_MULTS)
    edges = distinct_edges(links, num_buckets)
    deg = _edge_degrees(edges)
    tri = triangle_node_counts(build_links(sf_dir, TRI_MULTS),
                               num_buckets=num_buckets)
    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("deg", pa.int64()),
        ("triangles", pa.int64()), ("coeff_permille", pa.int64())])

    def tag_deg(batch: pa.Table) -> pa.Table:
        ids = batch["node"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "doc_id": batch["node"].combine_chunks().cast(pa.int64()),
            "deg": batch["deg"].combine_chunks().cast(pa.int64()),
            "tri": pa.nulls(batch.num_rows, pa.int64())})
        return t.append_column("_nb", pa.array(
            (ids % num_buckets).astype(np.int32)))

    def tag_tri(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "deg": pa.nulls(batch.num_rows, pa.int64()),
            "tri": batch["triangles"].combine_chunks().cast(pa.int64())})
        return t.append_column("_nb", pa.array(
            (ids % num_buckets).astype(np.int32)))

    def finish(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.drop_columns(["_nb"]))
        d = df.filter(pl.col("deg").is_not_null()).select(
            ["doc_id", "deg"])
        t = df.filter(pl.col("tri").is_not_null()).select(
            ["doc_id", "tri"])
        j = (d.join(t, on="doc_id", how="left")
             .with_columns(pl.col("tri").fill_null(0).alias("triangles")))
        j = j.with_columns(
            pl.when(pl.col("deg") >= 2)
            .then((2000 * pl.col("triangles"))
                  // (pl.col("deg") * (pl.col("deg") - 1)))
            .otherwise(0).alias("coeff_permille"))
        return (j.select(["doc_id", "deg", "triangles", "coeff_permille"])
                .to_arrow().cast(out_schema))

    from . import ensure_schema
    return ensure_schema(
        deg.map_batches(tag_deg, batch_format="pyarrow")
        .union(tri.map_batches(tag_tri, batch_format="pyarrow"))
        .groupby("_nb").map_groups(finish, batch_format="pyarrow"),
        out_schema)


def clustering_coefficient_sql() -> str:
    return f"""
WITH {_links_sql(TRI_MULTS)},
e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM links WHERE src != dst),
t AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
tri AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS triangles FROM (
    SELECT x AS doc_id FROM t
    UNION ALL SELECT y FROM t
    UNION ALL SELECT z FROM t
  ) GROUP BY doc_id
),
deg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS doc_id FROM e UNION ALL SELECT b FROM e
  ) GROUP BY doc_id
)
SELECT d.doc_id, d.deg,
       CAST(COALESCE(tri.triangles, 0) AS BIGINT) AS triangles,
       CAST(CASE WHEN d.deg >= 2
            THEN (2000 * COALESCE(tri.triangles, 0))
                 // (d.deg * (d.deg - 1))
            ELSE 0 END AS BIGINT) AS coeff_permille
FROM deg d LEFT JOIN tri USING (doc_id)
"""


# ---------------------------------------------------------------------------
# k-core decomposition (iterative distributed peeling)
# ---------------------------------------------------------------------------

# variable-arity arms: arm j fires only when i % mod == 0, giving the
# degree variance a k-core needs (the 4-arm graph is near-regular)
KCORE_ARMS = (((7, 1), 1), ((13, 5), 2), ((3, 11), 4),
              ((11, 17), 8), ((19, 23), 16))


def build_links_variable(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    n = ds.count()

    def links(batch: pa.Table) -> pa.Table:
        ids = (batch["doc_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        srcs, dsts = [], []
        for (m, c), mod in KCORE_ARMS:
            sel = ids[ids % mod == 0]
            srcs.append(sel)
            dsts.append((sel * m + c) % n)
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return ds.map_batches(links, batch_format="pyarrow")


def kcore_nodes(sf_dir: str, k: int = 3, num_buckets: int | None = None,
                force_join: bool = False, max_rounds: int = 64
                ) -> "ray.data.Dataset":
    """Nodes of the k-core of the variable-arity link graph, with their
    final in-core degree: iterative distributed peeling — each round
    recomputes degrees (node groupby of per-batch combiners) and drops
    nodes with deg < k until a fixpoint.

    The per-round edge filter is size-adaptive on the DROP set (the
    small side by construction after round 1): ≤ broadcast limit →
    ray.put'd sorted id array + vectorized per-batch isin; above it (or
    force_join) → two tagged-union bucket anti-merges. Edges are
    re-materialized each round so the lineage stays O(1), and the loop
    is bounded by max_rounds (peeling converges in ≤ |V| rounds; 64 is
    far past any real corpus's core number)."""
    import polars as pl
    from .graph import _broadcast_limit
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    edges = distinct_edges(build_links_variable(sf_dir), num_buckets) \
        .select_columns(["a", "b"]).materialize()
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("core_deg", pa.int64())])

    import pyarrow.compute as pc

    for _ in range(max_rounds):
        deg = _edge_degrees(edges)
        drop = deg.map_batches(
            lambda b: b.filter(pc.less(b["deg"], k)),
            batch_format="pyarrow")
        n_drop = drop.count()
        if n_drop == 0:
            final = deg.map_batches(
                lambda b: pa.table({
                    "doc_id": b["node"].combine_chunks().cast(pa.int64()),
                    "core_deg": b["deg"].combine_chunks().cast(pa.int64()),
                }), batch_format="pyarrow")
            from . import ensure_schema
            return ensure_schema(final, out_schema)
        if not force_join and n_drop <= _broadcast_limit():
            import ray as _ray
            ids = np.sort(np.concatenate(
                [t["node"].to_numpy(zero_copy_only=False)
                 for t in drop.iter_batches(batch_format="pyarrow")
                 if t.num_rows] or [np.array([], dtype=np.int64)]))
            ref = _ray.put(ids)

            def keep(batch: pa.Table, ref=ref) -> pa.Table:
                import ray as _ray
                dropped = _ray.get(ref)
                a = batch["a"].to_numpy(zero_copy_only=False)
                b = batch["b"].to_numpy(zero_copy_only=False)
                ok = (~np.isin(a, dropped)) & (~np.isin(b, dropped))
                return batch.filter(pa.array(ok))

            edges = edges.map_batches(
                keep, batch_format="pyarrow").materialize()
        else:
            # scalable path: anti-merge on each endpoint in turn
            cur = edges
            for col in ("a", "b"):
                def tag_edge(batch: pa.Table, col=col) -> pa.Table:
                    key = batch[col].to_numpy(zero_copy_only=False)
                    t = batch.select(["a", "b"])
                    t = t.append_column(
                        "_drop", pa.nulls(batch.num_rows, pa.int64()))
                    return t.append_column("_ab", pa.array(
                        (key % num_buckets).astype(np.int32)))

                def tag_drop(batch: pa.Table) -> pa.Table:
                    key = batch["node"].to_numpy(zero_copy_only=False)
                    t = pa.table({
                        "a": pa.nulls(batch.num_rows, pa.int64()),
                        "b": pa.nulls(batch.num_rows, pa.int64()),
                        "_drop": batch["node"].combine_chunks()
                        .cast(pa.int64())})
                    return t.append_column("_ab", pa.array(
                        (key % num_buckets).astype(np.int32)))

                def anti(group: pa.Table, col=col) -> pa.Table:
                    df = pl.from_arrow(group.drop_columns(["_ab"]))
                    e = df.filter(pl.col("_drop").is_null()).select(
                        ["a", "b"])
                    d = df.filter(pl.col("_drop").is_not_null()).select(
                        pl.col("_drop").alias(col)).unique()
                    return (e.join(d, on=col, how="anti").to_arrow()
                            .cast(pa.schema([("a", pa.int64()),
                                             ("b", pa.int64())])))

                from . import ensure_schema
                cur = ensure_schema(
                    cur.map_batches(tag_edge, batch_format="pyarrow")
                    .union(drop.map_batches(tag_drop,
                                            batch_format="pyarrow"))
                    .groupby("_ab").map_groups(anti,
                                               batch_format="pyarrow"),
                    pa.schema([("a", pa.int64()), ("b", pa.int64())]))
            edges = cur.materialize()
        if edges.count() == 0:
            return ray.data.from_arrow(out_schema.empty_table())
    raise RuntimeError(f"k-core peeling did not converge in "
                       f"{max_rounds} rounds")
