"""Iterative graph analytics over the constructed knowledge graph.

The north-star KG pipeline does not stop at materializing triples: a
web-scale corpus wants link analysis over the extracted entity graph
(authority ranking for entity disambiguation priors, crawl
prioritization, graph-quality telemetry). This module implements
**PageRank** as K rounds of Ray Data joins + algebraic aggregates —
and, like every numeric operator in this repo that must be gate-hashed
against an independent oracle, it runs in **pure int64 arithmetic**:

    rank_0(n)    = SCALE
    rank_t+1(u)  = BASE + (DAMP * sum_{v->u} (rank_t(v) // deg(v))) // DEN

with ``SCALE = 10**9``, ``DAMP/DEN = 85/100``, ``BASE = (DEN-DAMP) *
SCALE // DEN``. Integer sums are associative/commutative regardless of
execution order, so the distributed result is bit-identical to the
scalar reference and to a DuckDB mirror (K iterations unrolled as
chained CTEs with ``//`` integer division) — no float summation-order
flake. Overflow bound: a node's incoming sum is < total mass
≈ nodes × SCALE, safe in int64 up to ~9×10^9 nodes at SCALE=10^9.

Scale design (the part the sandbox can only exercise at toy size but
the shapes are the 100 TB ones):

* The edge table is built ONCE (globally-distinct symmetric edges via
  a (src,dst)-hash bucket shuffle — skew-free because the bucket key
  includes dst) and materialized; every iteration re-reads it from the
  object store instead of re-deriving it from the corpus.
* Per-iteration state (the rank table) is **node-sized, never
  corpus-sized**; it is materialized between rounds so iteration t+1
  does not re-execute the whole lazy prefix.
* Attaching ``rank(src)`` to edges is the skewed step: a hot entity
  (mentioned by a double-digit share of all pages) owns a huge edge
  list, and a plain hash join ships all of it to one partition. Two
  adaptive paths, same contract as ``stages/canonicalize``:
  - node count ≤ ``KGFORGE_GRAPH_BROADCAST_LIMIT`` → the contrib map
    is a ``ray.put`` broadcast dict read zero-copy by every map task
    (one corpus-stream pass, no shuffle at all);
  - above the limit → **salted replicated join** (the north-rule
    move): the node-sized rank table is replicated ``SALT`` ways,
    edges deterministically pick ``salt = hash(dst) % SALT``, and the
    join key becomes ``(src, salt)`` — a hot key's edge list spreads
    over up to SALT partitions at the cost of SALT× the *small* side.
* The per-dst incoming sum is algebraic: per-batch pyarrow pre-agg
  (one row per dst per block) before a bucket-hash reduce — the same
  combiner-first shape as ``ops/relational.pricing_summary``.

Reference scope note: the csv2rdf reference has no graph analytics;
this is a beyond-reference operator mandated by the large-scale
training-data-pipeline brief (SURVEY §2 "beyond" block).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.dedup import default_num_buckets

SCALE = 10**9
DAMP, DEN = 85, 100
BASE = (DEN - DAMP) * SCALE // DEN   # 150_000_000
DEFAULT_SALT = 64


def _broadcast_limit() -> int:
    return int(os.environ.get("KGFORGE_GRAPH_BROADCAST_LIMIT", 1_000_000))


# ------------------------------------------------------- edge building
def symmetric_edges(pairs: "ray.data.Dataset", left: str, right: str,
                    num_buckets: int | None = None) -> "ray.data.Dataset":
    """Globally-distinct undirected edges from a (left, right) pair
    stream: output ``(src, dst)`` strings with BOTH directions present
    exactly once. Nodes are namespaced (``d:<left>`` / ``e:<right>``)
    so the two id spaces cannot collide. Dedup shuffles by
    ``hash(src,dst) % B`` — pair-keyed, so a hot entity's pairs spread
    over all buckets."""
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def to_pairs(batch: pa.Table) -> pa.Table:
        import polars as pl
        l = pc.binary_join_element_wise(
            pa.scalar("d:"), batch[left].combine_chunks().cast(pa.string()),
            "")
        r = pc.binary_join_element_wise(
            pa.scalar("e:"), batch[right].combine_chunks().cast(pa.string()),
            "")
        df = pl.from_arrow(pa.table({"a": l, "b": r})).unique(
            subset=["a", "b"], keep="first", maintain_order=True)
        bucket = ((df.hash_rows(seed=0) % num_buckets)
                  .cast(pl.Int32).rename("_bucket"))
        return df.with_columns(bucket).to_arrow().cast(
            pa.schema([("a", pa.string()), ("b", pa.string()),
                       ("_bucket", pa.int32())]))

    def per_bucket(group: pa.Table) -> pa.Table:
        import polars as pl
        u = (pl.from_arrow(group.select(["a", "b"]))
             .unique(subset=["a", "b"], keep="first").sort(["a", "b"]))
        fwd = u.to_arrow()
        return pa.table({
            "src": pa.concat_arrays([fwd["a"].combine_chunks(),
                                     fwd["b"].combine_chunks()]),
            "dst": pa.concat_arrays([fwd["b"].combine_chunks(),
                                     fwd["a"].combine_chunks()]),
        })

    return (pairs.map_batches(to_pairs, batch_format="pyarrow")
            .groupby("_bucket").map_groups(per_bucket,
                                           batch_format="pyarrow"))


def _bucket_sum(ds: "ray.data.Dataset", key: str, val: str,
                num_buckets: int, out: str) -> "ray.data.Dataset":
    """Skew-free exact ``SUM(val) GROUP BY key`` for high-cardinality
    string keys: per-batch pyarrow pre-agg (combiner) → bucket-hash
    shuffle → per-bucket polars sum. Output (key, out:int64)."""

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        g = batch.group_by(key).aggregate([(val, "sum")])
        t = pa.table({key: g[key],
                      val: g[f"{val}_sum"].cast(pa.int64())})
        df = pl.from_arrow(t)
        bucket = ((df.select(key).hash_rows(seed=0) % num_buckets)
                  .cast(pl.Int32).rename("_bucket"))
        return df.with_columns(bucket).to_arrow().cast(
            pa.schema([(key, pa.string()), (val, pa.int64()),
                       ("_bucket", pa.int32())]))

    def reduce(group: pa.Table) -> pa.Table:
        g = group.group_by(key).aggregate([(val, "sum")])
        return pa.table({key: g[key],
                         out: g[f"{val}_sum"].cast(pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket").map_groups(reduce, batch_format="pyarrow"))


# ----------------------------------------------------------- pagerank
def _ones(batch: pa.Table) -> pa.Table:
    return pa.table({"src": batch["src"],
                     "one": pa.array([1] * batch.num_rows, pa.int64())})


def pagerank(edges: "ray.data.Dataset", iterations: int = 3,
             salt: int = DEFAULT_SALT,
             num_buckets: int | None = None,
             seed_prefix: str | None = None) -> "ray.data.Dataset":
    """Integer-exact damped PageRank over a symmetric ``(src, dst)``
    edge Dataset (every node therefore has deg ≥ 1 and at least one
    in-edge). Returns ``(node:string, pr:int64)`` for every node.

    Path choice per the module docstring: broadcast contrib map below
    KGFORGE_GRAPH_BROADCAST_LIMIT nodes, salted replicated join above.

    ``seed_prefix`` switches to PERSONALIZED PageRank: only nodes whose
    string id starts with the prefix receive the teleport mass (init
    SCALE on seeds / 0 elsewhere; per-round base term seeds-only) —
    topic-sensitive ranking with the same integer-exact arithmetic."""
    if num_buckets is None:
        num_buckets = default_num_buckets()
    edges = edges.materialize()
    deg = _bucket_sum(edges.map_batches(_ones, batch_format="pyarrow"),
                      "src", "one", num_buckets, "deg").materialize()
    n_nodes = deg.count()

    if n_nodes <= _broadcast_limit():
        return _pagerank_broadcast(edges, deg, iterations, num_buckets,
                                   seed_prefix)
    return _pagerank_salted(edges, deg, iterations, salt, num_buckets,
                            seed_prefix)


def _finish_rank(sums: "ray.data.Dataset", seed_prefix: str | None = None
                 ) -> "ray.data.Dataset":
    def fin(batch: pa.Table) -> pa.Table:
        s = batch["insum"].combine_chunks().cast(pa.int64())
        damp = pc.divide(pc.multiply(pa.scalar(DAMP, pa.int64()), s),
                         pa.scalar(DEN, pa.int64()))
        if seed_prefix is None:
            base = pa.scalar(BASE, pa.int64())
        else:
            base = pc.if_else(
                pc.starts_with(batch["dst"].combine_chunks()
                               .cast(pa.string()), seed_prefix),
                pa.scalar(BASE, pa.int64()), pa.scalar(0, pa.int64()))
        return pa.table({"node": batch["dst"], "pr": pc.add(base, damp)})
    return sums.map_batches(fin, batch_format="pyarrow")


def _seed_ranks(nodes: pa.Array, seed_prefix: str | None) -> pa.Array:
    if seed_prefix is None:
        return pa.array([SCALE] * len(nodes), pa.int64())
    return pc.if_else(
        pc.starts_with(nodes.cast(pa.string()), seed_prefix),
        pa.scalar(SCALE, pa.int64()), pa.scalar(0, pa.int64()))


def _pagerank_broadcast(edges, deg, iterations, num_buckets,
                        seed_prefix=None):
    """Contrib table as a ray.put broadcast (node array + aligned
    contrib array, looked up with vectorized ``pc.index_in``): per
    iteration ONE streaming pass over edges + an algebraic bucket sum;
    driver state is node-sized and bounded by the broadcast limit."""
    deg_tbl = pa.concat_tables(
        b for b in deg.iter_batches(batch_size=None, batch_format="pyarrow"))
    nodes = deg_tbl["src"].combine_chunks()
    degs = deg_tbl["deg"].combine_chunks().cast(pa.int64())
    ranks = _seed_ranks(nodes, seed_prefix)

    out = None
    for _ in range(iterations):
        contribs = pc.divide(ranks, degs)
        ref = ray.put((nodes, contribs))

        def partial(batch: pa.Table, ref=ref) -> pa.Table:
            node_arr, carr = ray.get(ref)
            idx = pc.index_in(batch["src"].combine_chunks(),
                              value_set=node_arr)
            return pa.table({"dst": batch["dst"],
                             "c": pc.take(carr, idx)})

        sums = _bucket_sum(
            edges.map_batches(partial, batch_format="pyarrow"),
            "dst", "c", num_buckets, "insum")
        out = _finish_rank(sums, seed_prefix).materialize()
        rt = pa.concat_tables(
            b for b in out.iter_batches(batch_size=None,
                                        batch_format="pyarrow"))
        # realign the new ranks to the fixed node order
        pos = pc.index_in(nodes, value_set=rt["node"].combine_chunks())
        ranks = pc.take(rt["pr"].combine_chunks().cast(pa.int64()), pos)
    return out


def _pagerank_salted(edges, deg, iterations, salt, num_buckets,
                     seed_prefix=None):
    """Salted replicated join: the node-sized (node, rank//deg) table
    is replicated ``salt`` ways; each edge deterministically picks
    ``_salt = hash(dst) % salt`` so a hot src's edge list joins against
    ``salt`` different partitions. Join is on (src, _salt)."""
    import polars as pl

    from ..stages.canonicalize import (SANITIZE_BATCH,
                                       default_shuffle_partitions)

    def edge_salt(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["src", "dst"]))
        s = ((df.select("dst").hash_rows(seed=7) % salt)
             .cast(pl.Int32).rename("_salt"))
        return df.with_columns(s).to_arrow().cast(
            pa.schema([("src", pa.string()), ("dst", pa.string()),
                       ("_salt", pa.int32())]))

    # batch_size coalesces away empty blocks before every join input —
    # an empty block skips the map fn and reaches the join with its
    # upstream schema (see ops/relational.top_revenue_orders)
    salted_edges = edges.map_batches(
        edge_salt, batch_format="pyarrow",
        batch_size=SANITIZE_BATCH).materialize()
    nparts = default_shuffle_partitions()

    # rank state starts as (node, pr=SCALE) derived from deg
    state = deg.map_batches(
        lambda b: pa.table({
            "node": b["src"],
            "deg": b["deg"].cast(pa.int64()),
            "pr": _seed_ranks(b["src"].combine_chunks(), seed_prefix)}),
        batch_format="pyarrow").materialize()

    out = None
    for _ in range(iterations):
        def replicate(batch: pa.Table) -> pa.Table:
            c = pc.divide(batch["pr"].combine_chunks(),
                          batch["deg"].combine_chunks())
            parts = []
            for sv in range(salt):
                parts.append(pa.table({
                    "jnode": batch["node"].combine_chunks(),
                    "_jsalt": pa.array([sv] * batch.num_rows, pa.int32()),
                    "c": c}))
            return pa.concat_tables(parts)

        contrib = state.map_batches(replicate, batch_format="pyarrow",
                                    batch_size=SANITIZE_BATCH)
        joined = salted_edges.join(
            contrib, join_type="inner", num_partitions=nparts,
            on=("src", "_salt"), right_on=("jnode", "_jsalt"))
        sums = _bucket_sum(joined.select_columns(["dst", "c"]),
                           "dst", "c", num_buckets, "insum")
        ranks = _finish_rank(sums, seed_prefix).map_batches(
            lambda b: b, batch_format="pyarrow", batch_size=SANITIZE_BATCH)
        # attach deg for the next round: node-sized ⋈ node-sized
        state = ranks.join(
            state.select_columns(["node", "deg"]).map_batches(
                lambda b: pa.table({"dnode": b["node"], "deg": b["deg"]}),
                batch_format="pyarrow", batch_size=SANITIZE_BATCH),
            join_type="inner", num_partitions=nparts,
            on=("node",), right_on=("dnode",)).materialize()
        out = state.select_columns(["node", "pr"])
    return out


# ------------------------------------------------- gate: entity pagerank
def mention_pairs_ds(sf_dir: str) -> "ray.data.Dataset":
    """Distinct-per-batch (mention, doc_id) pairs of gazetteer entities
    over the documents corpus (same extraction as ops/skew)."""
    from ..pipelines.webkg import LEXICON
    value_set = pa.array(sorted(LEXICON), type=pa.string())

    def pairs(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks().cast(pa.string())
        doc_id = batch["doc_id"].combine_chunks().cast(pa.int64())
        split = pc.split_pattern(text, pattern=" ")
        flat = split.flatten()
        parents = pc.list_parent_indices(split)
        mask = pc.is_in(flat, value_set=value_set)
        t = pa.table({"doc_id": doc_id.take(parents.filter(mask)),
                      "mention": flat.filter(mask)})
        return t.group_by(["doc_id", "mention"]).aggregate([])

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(pairs, batch_format="pyarrow")


def entity_pagerank(sf_dir: str, iterations: int = 3
                    ) -> "ray.data.Dataset":
    """Gate: PageRank over the bipartite doc↔entity mention graph
    (symmetric edges, so docs rank by how entity-dense they are and
    entities by how broadly they are mentioned). Output
    ``(node:string, pr:int64)`` — integer-exact, hash-comparable."""
    edges = symmetric_edges(mention_pairs_ds(sf_dir), "doc_id", "mention")
    return pagerank(edges, iterations=iterations)


def entity_pagerank_sql(iterations: int = 3) -> str:
    """DuckDB mirror: K iterations unrolled as chained CTEs, same
    integer arithmetic (``//`` floor division; positive operands)."""
    from ..pipelines.webkg import LEXICON
    from ..sqlgen import sql_quote

    in_list = ", ".join(sql_quote(t) for t in sorted(LEXICON))
    ctes = [f"""pairs AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
    FROM documents)
  WHERE token IN ({in_list})),
edges AS (
  SELECT 'd:' || CAST(doc_id AS VARCHAR) AS src, 'e:' || token AS dst
  FROM pairs
  UNION ALL
  SELECT 'e:' || token, 'd:' || CAST(doc_id AS VARCHAR) FROM pairs),
deg AS (SELECT src AS n, CAST(COUNT(*) AS BIGINT) AS d
        FROM edges GROUP BY 1),
r0 AS (SELECT n, CAST({SCALE} AS BIGINT) AS r FROM deg)"""]
    for t in range(1, iterations + 1):
        ctes.append(f"""r{t} AS (
  SELECT e.dst AS n,
         CAST({BASE} AS BIGINT) +
         (CAST({DAMP} AS BIGINT) * SUM(r{t-1}.r // deg.d))
           // CAST({DEN} AS BIGINT) AS r
  FROM edges e
  JOIN deg ON deg.n = e.src
  JOIN r{t-1} ON r{t-1}.n = e.src
  GROUP BY e.dst)""")
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT n AS node, CAST(r AS BIGINT) AS pr FROM r{iterations}")


# ----------------------------------------- entity co-occurrence counts
def cooccurrence_counts(pairs: "ray.data.Dataset", doc_col: str,
                        ent_col: str) -> "ray.data.Dataset":
    """Per entity-pair document co-occurrence counts — the integer
    core of PMI/association mining over the KG. Input: one row per
    (doc, entity) fact, each doc's facts wholly inside one batch (true
    for per-row extraction: a doc is one corpus row). Per batch, the
    pair expansion is a C-level polars self-join on the doc key
    (filtered to a < b so each unordered pair appears once) followed by
    a count pre-agg; the final groupby sums partials over a pair-space
    bounded by lexicon², not the corpus. Output (a, b, n_docs)."""
    from ray.data.aggregate import Sum

    def expand(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(pa.table({
            "d": batch[doc_col].combine_chunks(),
            "m": batch[ent_col].combine_chunks().cast(pa.string())}))
        j = (df.join(df, on="d", suffix="_r")
             .filter(pl.col("m") < pl.col("m_r"))
             .group_by(["m", "m_r"]).len(name="n")
             .rename({"m": "a", "m_r": "b"}))
        return j.to_arrow().cast(pa.schema([
            ("a", pa.string()), ("b", pa.string()), ("n", pa.int64())]))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"a": batch["a"], "b": batch["b"],
                         "n_docs": batch["n"].combine_chunks()
                         .cast(pa.int64())})

    return (pairs.map_batches(expand, batch_format="pyarrow")
            .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n"))
            .map_batches(finish, batch_format="pyarrow"))


def entity_cooccurrence(sf_dir: str) -> "ray.data.Dataset":
    """Gate: document co-occurrence counts for every gazetteer entity
    pair. Output (a, b, n_docs), a < b."""
    return cooccurrence_counts(mention_pairs_ds(sf_dir), "doc_id",
                               "mention")


def entity_cooccurrence_sql() -> str:
    from ..pipelines.webkg import LEXICON
    from ..sqlgen import sql_quote

    in_list = ", ".join(sql_quote(t) for t in sorted(LEXICON))
    return f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
    FROM documents)
  WHERE token IN ({in_list})
)
SELECT p1.token AS a, p2.token AS b,
       CAST(count(*) AS BIGINT) AS n_docs
FROM pairs p1
JOIN pairs p2 ON p1.doc_id = p2.doc_id AND p1.token < p2.token
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Graph snapshot delta (incremental KG maintenance)
# ---------------------------------------------------------------------------

def graph_delta(old: "ray.data.Dataset", new: "ray.data.Dataset",
                cols: list[str], num_buckets: int | None = None
                ) -> "ray.data.Dataset":
    """Bidirectional set diff between two graph snapshots: rows of
    `new` not in `old` come back with change='added', rows of `old` not
    in `new` with change='removed' (both sides treated as SETS —
    duplicates collapse). The primitive behind incremental KG
    maintenance: publish only the delta, not the re-materialized graph.

    Shape: per-batch distinct combiner on each side, ONE
    hash_rows-bucket shuffle of the tagged union, per-bucket polars
    anti-joins both ways. Wire mass = distinct rows of both snapshots;
    nothing driver-side."""
    import polars as pl
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    out_schema = pa.schema([(c, pa.string()) for c in cols]
                           + [("change", pa.string())])

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            df = pl.from_arrow(batch.select(cols)).unique()
            h = df.select(pl.col(c).cast(pl.Utf8) for c in cols) \
                  .hash_rows(seed=0)
            return (df.with_columns(
                        pl.lit(side).alias("_side"),
                        (h % num_buckets).cast(pl.Int32).alias("_gb"))
                    .to_arrow())
        return fn

    def diff(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.drop_columns(["_gb"]))
        o = df.filter(pl.col("_side") == "o").select(cols).unique()
        n = df.filter(pl.col("_side") == "n").select(cols).unique()
        added = n.join(o, on=cols, how="anti").with_columns(
            pl.lit("added").alias("change"))
        removed = o.join(n, on=cols, how="anti").with_columns(
            pl.lit("removed").alias("change"))
        return pl.concat([added, removed]).to_arrow().cast(out_schema)

    from . import ensure_schema
    return ensure_schema(
        old.map_batches(tag("o"), batch_format="pyarrow")
        .union(new.map_batches(tag("n"), batch_format="pyarrow"))
        .groupby("_gb").map_groups(diff, batch_format="pyarrow"),
        out_schema)


def entity_ppr(sf_dir: str, iterations: int = 3) -> "ray.data.Dataset":
    """Gate: PERSONALIZED PageRank seeded at the entity nodes of the
    doc↔entity mention graph — topic-sensitive ranking: teleport mass
    goes only to 'e:' nodes, so docs rank purely by their proximity to
    the entity set."""
    edges = symmetric_edges(mention_pairs_ds(sf_dir), "doc_id", "mention")
    return pagerank(edges, iterations=iterations, seed_prefix="e:")


def entity_ppr_sql(iterations: int = 3) -> str:
    """Mirror of entity_pagerank_sql with seed-conditional init and
    base term (same unrolled integer CTEs)."""
    from ..pipelines.webkg import LEXICON
    from ..sqlgen import sql_quote

    in_list = ", ".join(sql_quote(t) for t in sorted(LEXICON))
    ctes = [f"""pairs AS (
  SELECT DISTINCT doc_id, token FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
    FROM documents)
  WHERE token IN ({in_list})),
edges AS (
  SELECT 'd:' || CAST(doc_id AS VARCHAR) AS src, 'e:' || token AS dst
  FROM pairs
  UNION ALL
  SELECT 'e:' || token, 'd:' || CAST(doc_id AS VARCHAR) FROM pairs),
deg AS (SELECT src AS n, CAST(COUNT(*) AS BIGINT) AS d
        FROM edges GROUP BY 1),
r0 AS (SELECT n, CAST(CASE WHEN n LIKE 'e:%' THEN {SCALE} ELSE 0 END
                      AS BIGINT) AS r FROM deg)"""]
    for t in range(1, iterations + 1):
        ctes.append(f"""r{t} AS (
  SELECT e.dst AS n,
         CAST(CASE WHEN e.dst LIKE 'e:%' THEN {BASE} ELSE 0 END
              AS BIGINT) +
         (CAST({DAMP} AS BIGINT) * SUM(r{t-1}.r // deg.d))
           // CAST({DEN} AS BIGINT) AS r
  FROM edges e
  JOIN deg ON deg.n = e.src
  JOIN r{t-1} ON r{t-1}.n = e.src
  GROUP BY e.dst)""")
    return ("WITH " + ",\n".join(ctes) +
            f"\nSELECT n AS node, CAST(r AS BIGINT) AS pr FROM r{iterations}")


# --------------------------------------------------- k-hop reachability

def khop_reachable(edges: "ray.data.Dataset", seeds: "ray.data.Dataset",
                   k: int, num_buckets: int | None = None,
                   force_join: bool = False) -> "ray.data.Dataset":
    """BFS min-depth over a directed edge Dataset: every node within
    ``k`` hops of the seed set, with its distance (seeds at depth 0).
    The crawl-frontier primitive (and SPARQL ``p+`` bounded property
    paths): generalizes csv2rdf's schema-only transitive closure
    (stages/entailment.transitive_closure, driver-sized) to
    INSTANCE-scale graphs.

    Semi-naive expansion — each round joins only the NEWLY discovered
    frontier against the edges, so total join work is O(edges reachable
    within k), not O(k · edges):

    * broadcast path (frontier+visited ≤ KGFORGE_GRAPH_BROADCAST_LIMIT):
      frontier ships once per round via ``ray.put``; per-batch
      vectorized ``np.isin`` against the edge blocks; the edge Dataset
      streams, never materializes driver-side.
    * scale path (``force_join`` or the visited set outgrows the
      limit — the switch is one-way, mid-run): frontier/visited stay
      Datasets; each round is TWO tagged-union bucket shuffles — (1)
      hash(src) co-locates frontier with edge sources to emit candidate
      dsts, (2) hash(node) anti-joins candidates against visited. Hot
      pages (high out-degree) cost per-bucket vectorized work, never a
      driver loop.

    Returns (node:int64, depth:int64), node set exact, depth = BFS
    minimum. Both paths are pinned equal in tests."""
    import numpy as np
    import polars as pl
    import ray as _ray
    if num_buckets is None:
        num_buckets = default_num_buckets()
    out_schema = pa.schema([("node", pa.int64()), ("depth", pa.int64())])
    edges = edges.materialize()
    limit = _broadcast_limit()

    def _np_of(ds: "ray.data.Dataset", col: str) -> np.ndarray:
        parts = [t[col].to_numpy(zero_copy_only=False)
                 for t in ds.iter_batches(batch_format="pyarrow")
                 if t.num_rows]
        return (np.unique(np.concatenate(parts).astype(np.int64))
                if parts else np.array([], dtype=np.int64))

    # ---- state: either driver numpy (broadcast) or Datasets (scale)
    small = not force_join
    if small:
        frontier_np = _np_of(seeds, seeds.schema().names[0])
        if frontier_np.size > limit:
            small = False
        else:
            visited_np = frontier_np
            levels = [(frontier_np, 0)]
    if not small:
        def as_nodes(b: pa.Table, _c=seeds.schema().names[0]) -> pa.Table:
            return pa.table({"node": b[_c].combine_chunks()
                             .cast(pa.int64())})
        frontier_ds = seeds.map_batches(
            as_nodes, batch_format="pyarrow").materialize()
        visited_ds = frontier_ds.map_batches(
            lambda b: b.append_column(
                "depth", pa.array([0] * b.num_rows, pa.int64())),
            batch_format="pyarrow").materialize()

    def _to_ds(levels_) -> "ray.data.Dataset":
        tbl = pa.concat_tables([
            pa.table({"node": pa.array(ns, pa.int64()),
                      "depth": pa.array([d] * len(ns), pa.int64())})
            for ns, d in levels_])
        return ray.data.from_arrow(tbl.cast(out_schema))

    for depth in range(1, k + 1):
        if small:
            ref = _ray.put(frontier_np)

            def expand(batch: pa.Table, ref=ref) -> pa.Table:
                cur = _ray.get(ref)
                src = batch["src"].to_numpy(zero_copy_only=False)
                dst = batch["dst"].to_numpy(zero_copy_only=False)
                return pa.table({"node": pa.array(
                    np.unique(dst[np.isin(src, cur)]), pa.int64())})

            cand = _np_of(
                edges.map_batches(expand, batch_format="pyarrow"), "node")
            new = cand[~np.isin(cand, visited_np)]
            if visited_np.size + new.size > limit:
                # one-way switch: ship the driver state into Datasets
                # and continue this round on the scale path
                small = False
                visited_ds = _to_ds(levels).materialize()
                frontier_ds = ray.data.from_arrow(pa.table(
                    {"node": pa.array(frontier_np, pa.int64())}))
            else:
                if new.size == 0:
                    break
                levels.append((new, depth))
                visited_np = np.union1d(visited_np, new)
                frontier_np = new
                continue

        # ---- scale path round: (1) frontier ⋈ edges on src -> cand
        def tag_frontier(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b).unique()
            return (df.rename({"node": "src"})
                    .with_columns(pl.lit(None, pl.Int64).alias("dst"),
                                  pl.lit(0, pl.Int8).alias("_t"),
                                  (pl.col("src").hash(seed=0)
                                   % num_buckets).cast(pl.Int32)
                                  .alias("_gb")).to_arrow())

        def tag_edges(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b.select(["src", "dst"])).unique()
            return (df.with_columns(pl.lit(1, pl.Int8).alias("_t"),
                                    (pl.col("src").hash(seed=0)
                                     % num_buckets).cast(pl.Int32)
                                    .alias("_gb")).to_arrow())

        def emit_dsts(group: pa.Table) -> pa.Table:
            df = pl.from_arrow(group)
            cur = df.filter(pl.col("_t") == 0).select("src").unique()
            hit = (df.filter(pl.col("_t") == 1)
                   .join(cur, on="src", how="semi"))
            return (hit.select(pl.col("dst").alias("node")).unique()
                    .to_arrow().cast(pa.schema([("node", pa.int64())])))

        cand = (frontier_ds.map_batches(tag_frontier,
                                        batch_format="pyarrow")
                .union(edges.map_batches(tag_edges,
                                         batch_format="pyarrow"))
                .groupby("_gb").map_groups(emit_dsts,
                                           batch_format="pyarrow"))

        # ---- (2) cand anti visited, keyed on node
        def tag_node(t_val: int):
            def fn(b: pa.Table) -> pa.Table:
                df = pl.from_arrow(pa.table(
                    {"node": b["node"].combine_chunks().cast(pa.int64())}
                )).unique()
                return df.with_columns(
                    pl.lit(t_val, pl.Int8).alias("_t"),
                    (pl.col("node").hash(seed=0) % num_buckets)
                    .cast(pl.Int32).alias("_gb")).to_arrow()
            return fn

        def anti(group: pa.Table, _d=depth) -> pa.Table:
            df = pl.from_arrow(group)
            seen = df.filter(pl.col("_t") == 1).select("node")
            fresh = (df.filter(pl.col("_t") == 0).select("node").unique()
                     .join(seen, on="node", how="anti"))
            return (fresh.with_columns(pl.lit(_d, pl.Int64).alias("depth"))
                    .to_arrow().cast(out_schema))

        new_ds = (cand.map_batches(tag_node(0), batch_format="pyarrow")
                  .union(visited_ds.map_batches(tag_node(1),
                                                batch_format="pyarrow"))
                  .groupby("_gb").map_groups(anti, batch_format="pyarrow")
                  ).materialize()
        if new_ds.count() == 0:
            break
        visited_ds = visited_ds.union(new_ds).materialize()
        frontier_ds = new_ds.select_columns(["node"]).materialize()

    from . import ensure_schema
    if small:
        return ensure_schema(_to_ds(levels), out_schema)
    return ensure_schema(visited_ds, out_schema)


def crawl_frontier(sf_dir: str, k: int = 3, seed_mod: int = 97,
                   force_join: bool = False) -> "ray.data.Dataset":
    """Gate: crawl-frontier expansion — every page within ``k`` link
    hops of the seed pages (doc_id % seed_mod == 0) over the synthetic
    link graph, with its BFS depth."""
    from ..sources.readers import read_table
    from .linkgraph import build_links
    links = build_links(sf_dir)
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def pick(b: pa.Table) -> pa.Table:
        ids = (b["doc_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(ids[ids % seed_mod == 0],
                                          pa.int64())})

    seeds = docs.map_batches(pick, batch_format="pyarrow")
    return khop_reachable(links, seeds, k, force_join=force_join)


def crawl_frontier_sql(k: int = 3, seed_mod: int = 97) -> str:
    from .linkgraph import _links_sql
    return f"""
WITH RECURSIVE {_links_sql()},
seeds AS (SELECT CAST(doc_id AS BIGINT) AS node FROM documents
          WHERE doc_id % {seed_mod} = 0),
walk(node, depth) AS (
  SELECT node, 0 FROM seeds
  UNION ALL
  SELECT CAST(l.dst AS BIGINT), w.depth + 1
  FROM walk w JOIN links l ON l.src = w.node
  WHERE w.depth < {k}
)
SELECT node, CAST(min(depth) AS BIGINT) AS depth FROM walk GROUP BY node
"""


def transitive_pairs(edges: "ray.data.Dataset", src: str = "src",
                     dst: str = "dst", num_buckets: int | None = None,
                     force_join: bool = False, max_rounds: int = 64
                     ) -> "ray.data.Dataset":
    """All (start, reach) pairs of the TRANSITIVE CLOSURE (path length
    >= 1) of a directed STRING-node edge Dataset — the engine behind
    SPARQL ``p+`` property paths over instance-scale predicates
    (kgforge/sparql.py), generalizing the driver-sized schema closure
    (stages/entailment.transitive_closure) the same way khop_reachable
    generalizes seed-set BFS.

    * broadcast path (distinct edges ≤ KGFORGE_GRAPH_BROADCAST_LIMIT —
      the common case: ontologies/taxonomies are tiny next to the
      corpus): one driver BFS per source over the edge dict.
    * scale path (``force_join`` or more edges): semi-naive iteration —
      each round extends only the NEWLY found pairs by one edge hop
      (hash(reach)-bucket join), then anti-joins against the closure
      (hash(pair)-bucket), so total join work is O(|closure|), cycles
      saturate instead of looping, and rounds = longest simple path.

    Both paths are pinned equal in tests (including cycles, where a
    node reaches itself through the loop)."""
    import polars as pl
    if num_buckets is None:
        num_buckets = default_num_buckets()
    out_schema = pa.schema([("start", pa.string()),
                            ("reach", pa.string())])

    def norm(b: pa.Table) -> pa.Table:
        df = (pl.from_arrow(b.select([src, dst]))
              .rename({src: "start", dst: "reach"}).unique())
        return df.to_arrow().cast(out_schema)

    e = edges.map_batches(norm, batch_format="pyarrow").materialize()

    if not force_join and e.count() <= _broadcast_limit():
        from ..stages.entailment import transitive_closure
        tbls = [t for t in e.iter_batches(batch_format="pyarrow")
                if t.num_rows]
        rows = (pa.concat_tables(tbls) if tbls
                else out_schema.empty_table())
        clo = transitive_closure(list(zip(rows["start"].to_pylist(),
                                          rows["reach"].to_pylist())))
        starts, reaches = [], []
        for a in sorted(clo):
            for b_ in sorted(clo[a]):
                starts.append(a)
                reaches.append(b_)
        return ray.data.from_arrow(pa.table({
            "start": pa.array(starts, pa.string()),
            "reach": pa.array(reaches, pa.string())}))

    # ---- scale path: semi-naive closure over Datasets
    def _pair_distinct(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        from ..stages.dedup import distinct
        return distinct(ds, ["start", "reach"])

    closure = _pair_distinct(e).materialize()
    frontier = closure

    # one schema for both union legs: (_key = join node, start, nxt)
    hop_schema = pa.schema([("_key", pa.string()), ("start", pa.string()),
                            ("nxt", pa.string()), ("_t", pa.int8()),
                            ("_gb", pa.int32())])

    def tag_frontier(b: pa.Table) -> pa.Table:
        # a found pair (start, reach) extends AT its reach node
        df = pl.from_arrow(b).unique()
        return (df.select(pl.col("reach").alias("_key"), pl.col("start"),
                          pl.lit(None, pl.Utf8).alias("nxt"),
                          pl.lit(0, pl.Int8).alias("_t"),
                          (pl.col("reach").hash(seed=0) % num_buckets)
                          .cast(pl.Int32).alias("_gb"))
                .to_arrow().cast(hop_schema))

    def tag_edges(b: pa.Table) -> pa.Table:
        # an edge (start, reach) is consumed AT its start node
        df = pl.from_arrow(b).unique()
        return (df.select(pl.col("start").alias("_key"),
                          pl.lit(None, pl.Utf8).alias("start"),
                          pl.col("reach").alias("nxt"),
                          pl.lit(1, pl.Int8).alias("_t"),
                          (pl.col("start").hash(seed=0) % num_buckets)
                          .cast(pl.Int32).alias("_gb"))
                .to_arrow().cast(hop_schema))

    def extend(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        fr = (df.filter(pl.col("_t") == 0)
              .select(["_key", "start"]).unique())
        ed = (df.filter(pl.col("_t") == 1)
              .select(["_key", "nxt"]).unique())
        out = (fr.join(ed, on="_key", how="inner")
               .select([pl.col("start"),
                        pl.col("nxt").alias("reach")]).unique())
        return out.to_arrow().cast(out_schema)

    def tag_pairs(t_val: int):
        def fn(b: pa.Table) -> pa.Table:
            df = pl.from_arrow(b.select(["start", "reach"])).unique()
            h = df.hash_rows(seed=0)
            return df.with_columns(
                pl.lit(t_val, pl.Int8).alias("_t"),
                pl.Series("_gb", (h % num_buckets)).cast(pl.Int32)
            ).to_arrow()
        return fn

    def anti(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group)
        seen = df.filter(pl.col("_t") == 1).select(["start", "reach"])
        fresh = (df.filter(pl.col("_t") == 0)
                 .select(["start", "reach"]).unique()
                 .join(seen, on=["start", "reach"], how="anti"))
        return fresh.to_arrow().cast(out_schema)

    for _ in range(max_rounds):
        cand = (frontier.map_batches(tag_frontier, batch_format="pyarrow")
                .union(e.map_batches(tag_edges, batch_format="pyarrow"))
                .groupby("_gb").map_groups(extend, batch_format="pyarrow"))
        new = (cand.map_batches(tag_pairs(0), batch_format="pyarrow")
               .union(closure.map_batches(tag_pairs(1),
                                          batch_format="pyarrow"))
               .groupby("_gb").map_groups(anti, batch_format="pyarrow")
               ).materialize()
        if new.count() == 0:
            break
        closure = closure.union(new).materialize()
        frontier = new

    from . import ensure_schema
    return ensure_schema(closure, out_schema)


# ------------------------------------------------- label propagation

_LP = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def label_propagation(edges: "ray.data.Dataset", rounds: int = 3,
                      num_buckets: int | None = None,
                      force_join: bool = False) -> "ray.data.Dataset":
    """SYNCHRONOUS label-propagation communities over an UNDIRECTED
    int64 graph (pass directed edges; both directions are unioned
    here): label_0(v) = v; each round every node takes the most
    frequent label among its neighbors' previous labels, ties broken
    by the SMALLEST label — fully deterministic, so a fixed-round
    unrolled SQL mirror is bit-exact (the classic async/random-order
    LPA is irreproducible by construction; K synchronous rounds is the
    form a distributed engine and an oracle can agree on).

    Per round: attach prev labels to edge destinations (broadcast dict
    below KGFORGE_GRAPH_BROADCAST_LIMIT nodes, else ONE tagged-union
    hash(dst) bucket merge), per-batch (src, label) count combiners,
    ONE hash(src) bucket shuffle of histogram-sized partials, per-
    bucket vectorized argmax. Label state is node-sized and
    materialized between rounds — same iteration discipline as
    pagerank."""
    import numpy as np
    import polars as pl
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def sym(b: pa.Table) -> pa.Table:
        s = b["src"].combine_chunks().cast(pa.int64())
        d = b["dst"].combine_chunks().cast(pa.int64())
        return pa.table({"src": pa.concat_arrays([s, d]),
                         "dst": pa.concat_arrays([d, s])})

    def dedup_batch(b: pa.Table) -> pa.Table:
        df = pl.from_arrow(b).unique()
        return df.with_columns(
            (pl.col("src").hash(seed=0) % num_buckets)
            .cast(pl.Int32).alias("_gb")).to_arrow()

    def dedup_bucket(g: pa.Table) -> pa.Table:
        return (pl.from_arrow(g.select(["src", "dst"])).unique()
                .to_arrow().cast(pa.schema([("src", pa.int64()),
                                            ("dst", pa.int64())])))

    und = (edges.map_batches(sym, batch_format="pyarrow")
           .map_batches(dedup_batch, batch_format="pyarrow")
           .groupby("_gb").map_groups(dedup_bucket,
                                      batch_format="pyarrow")
           ).materialize()

    def init_labels(b: pa.Table) -> pa.Table:
        n = np.unique(b["src"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(n, pa.int64()),
                         "label": pa.array(n, pa.int64())})

    from ..stages.dedup import distinct
    # label_0 = node, so pair-distinct == node-distinct
    labels = distinct(und.map_batches(init_labels,
                                      batch_format="pyarrow"),
                      ["node", "label"]).materialize()
    n_nodes = labels.count()
    small = not force_join and n_nodes <= _broadcast_limit()

    def vote_partial(b: pa.Table) -> pa.Table:
        # b: (src, label) neighbor-label rows -> per-batch counts
        df = (pl.from_arrow(b).group_by(["src", "label"])
              .agg(pl.len().alias("c")))
        return df.with_columns(
            (pl.col("src").hash(seed=0) % num_buckets)
            .cast(pl.Int32).alias("_gb")).to_arrow()

    def vote_reduce(g: pa.Table) -> pa.Table:
        df = (pl.from_arrow(g).group_by(["src", "label"])
              .agg(pl.col("c").sum()))
        top = (df.sort(["src", "c", "label"],
                       descending=[False, True, False])
               .group_by("src", maintain_order=True).first())
        return (top.select([pl.col("src").alias("node"),
                            pl.col("label")])
                .to_arrow().cast(_LP))

    for _ in range(rounds):
        if small:
            lmap = {}
            for t in labels.iter_batches(batch_format="pyarrow"):
                lt = pl.from_arrow(t)
                lmap.update(zip(lt["node"].to_list(),
                                lt["label"].to_list()))
            keys = np.array(sorted(lmap), dtype=np.int64)
            vals = np.array([lmap[k] for k in sorted(lmap)],
                            dtype=np.int64)
            ref = ray.put((keys, vals))

            def attach(b: pa.Table) -> pa.Table:
                k_, v_ = ray.get(ref)
                dst = b["dst"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(k_, dst)
                return pa.table({
                    "src": b["src"],
                    "label": pa.array(v_[pos], pa.int64())})

            nbr = und.map_batches(attach, batch_format="pyarrow")
        else:
            def tag_e(b: pa.Table) -> pa.Table:
                df = pl.from_arrow(b)
                return df.with_columns(
                    pl.lit(None, pl.Int64).alias("label"),
                    pl.lit(0, pl.Int8).alias("_t"),
                    (pl.col("dst").hash(seed=0) % num_buckets)
                    .cast(pl.Int32).alias("_gb")).select(
                    ["src", "dst", "label", "_t", "_gb"]).to_arrow()

            def tag_l(b: pa.Table) -> pa.Table:
                df = pl.from_arrow(b).rename({"node": "dst"})
                return df.with_columns(
                    pl.lit(None, pl.Int64).alias("src"),
                    pl.lit(1, pl.Int8).alias("_t"),
                    (pl.col("dst").hash(seed=0) % num_buckets)
                    .cast(pl.Int32).alias("_gb")).select(
                    ["src", "dst", "label", "_t", "_gb"]).to_arrow()

            def join_lbl(g: pa.Table) -> pa.Table:
                df = pl.from_arrow(g)
                e = df.filter(pl.col("_t") == 0).select(["src", "dst"])
                l_ = df.filter(pl.col("_t") == 1).select(
                    ["dst", "label"])
                return (e.join(l_, on="dst", how="inner")
                        .select(["src", "label"]).to_arrow()
                        .cast(pa.schema([("src", pa.int64()),
                                         ("label", pa.int64())])))

            nbr = (und.map_batches(tag_e, batch_format="pyarrow")
                   .union(labels.map_batches(tag_l,
                                             batch_format="pyarrow"))
                   .groupby("_gb").map_groups(join_lbl,
                                              batch_format="pyarrow"))

        labels = (nbr.map_batches(vote_partial, batch_format="pyarrow")
                  .groupby("_gb").map_groups(vote_reduce,
                                             batch_format="pyarrow")
                  ).materialize()

    from . import ensure_schema
    return ensure_schema(labels, _LP)


def link_communities(sf_dir: str, rounds: int = 3,
                     force_join: bool = False) -> "ray.data.Dataset":
    """Gate: K-round synchronous LPA over the (symmetrized) synthetic
    link graph — (node, label) community assignment."""
    from .linkgraph import build_links
    return label_propagation(build_links(sf_dir), rounds=rounds,
                             force_join=force_join)


def link_communities_sql(rounds: int = 3) -> str:
    from .linkgraph import _links_sql
    ctes = [f"""{_links_sql()},
und AS (SELECT DISTINCT src, dst FROM (
  SELECT src, dst FROM links UNION ALL SELECT dst, src FROM links)),
l0 AS (SELECT DISTINCT src AS node, src AS l FROM und)"""]
    for t in range(1, rounds + 1):
        ctes.append(f"""c{t} AS (
  SELECT e.src AS node, l{t-1}.l AS lbl, count(*) AS c
  FROM und e JOIN l{t-1} ON l{t-1}.node = e.dst GROUP BY 1, 2),
l{t} AS (
  SELECT node, lbl AS l FROM (
    SELECT node, lbl, row_number() OVER (
      PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn FROM c{t})
  WHERE rn = 1)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT CAST(node AS BIGINT) AS node, "
              f"CAST(l AS BIGINT) AS label FROM l{rounds}")


# ------------------------------------------------------------- HITS

_HITS = pa.schema([("node", pa.int64()), ("hub", pa.int64()),
                   ("auth", pa.int64())])


def hits(edges: "ray.data.Dataset", rounds: int = 2,
         num_buckets: int | None = None) -> "ray.data.Dataset":
    """Integer-exact HITS (hubs & authorities) over a directed int64
    edge Dataset — the other classic link-analysis ranking next to
    PageRank, and like it gate-hashable only because the arithmetic is
    pure int64: each round

        auth_t(v) = SUM over u->v of hub_{t-1}(u)
        hub_t(u)  = SUM over u->v of auth_t(v)

    each followed by max-normalization ``x * SCALE // max(x)`` — the
    integer division every engine and the unrolled-CTE DuckDB mirror
    compute identically (float L2 normalization would flake on
    summation order). hub_0 = SCALE for every node.

    Scale shape: per half-round ONE value attach onto the distinct
    edge set (broadcast sorted-array searchsorted below
    KGFORGE_GRAPH_BROADCAST_LIMIT nodes — the state is node-sized —
    same contract as pagerank's contrib map) + per-batch (key, sum)
    combiners + ONE hash(key) bucket shuffle of histogram partials;
    the normalizing max is a driver-side scalar over the node-sized
    state. Nodes with hub or auth 0 keep 0 (no incoming/outgoing)."""
    import numpy as np
    import polars as pl
    if num_buckets is None:
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

    e = (edges.map_batches(dedup_batch, batch_format="pyarrow")
         .groupby("_gb").map_groups(dedup_bucket,
                                    batch_format="pyarrow")
         ).materialize()

    def node_arr(col: str) -> np.ndarray:
        parts = [t[col].to_numpy(zero_copy_only=False)
                 for t in e.iter_batches(batch_format="pyarrow")
                 if t.num_rows]
        return (np.concatenate(parts) if parts
                else np.array([], dtype=np.int64))

    nodes = np.unique(np.concatenate([node_arr("src"), node_arr("dst")]))
    if nodes.size == 0:
        return ray.data.from_arrow(_HITS.empty_table())
    if nodes.size > _broadcast_limit():
        raise ValueError(
            "hits(): node state exceeds KGFORGE_GRAPH_BROADCAST_LIMIT; "
            "use the salted-join pattern of pagerank for larger graphs")

    def _propagate(state: np.ndarray, from_col: str, to_col: str
                   ) -> np.ndarray:
        """SUM state(from) grouped by to — one streamed pass over the
        edge set with per-batch combiners, reduced driver-side onto the
        node-sized vector."""
        ref = ray.put(state)

        def partial(b: pa.Table, _f=from_col, _t=to_col) -> pa.Table:
            st = ray.get(ref)
            f = b[_f].to_numpy(zero_copy_only=False)
            t = b[_t].to_numpy(zero_copy_only=False)
            vals = st[np.searchsorted(nodes, f)]
            keys, inv = np.unique(t, return_inverse=True)
            sums = np.zeros(keys.size, dtype=np.int64)
            np.add.at(sums, inv, vals)
            return pa.table({"k": pa.array(keys, pa.int64()),
                             "v": pa.array(sums, pa.int64())})

        out = np.zeros(nodes.size, dtype=np.int64)
        for t in e.map_batches(partial, batch_format="pyarrow") \
                  .iter_batches(batch_format="pyarrow"):
            if t.num_rows:
                pos = np.searchsorted(nodes,
                                      t["k"].to_numpy(zero_copy_only=False))
                np.add.at(out, pos,
                          t["v"].to_numpy(zero_copy_only=False))
        return out

    def norm(x: np.ndarray) -> np.ndarray:
        m = int(x.max()) if x.size else 0
        if m <= 0:
            return x
        # unbounded Python ints: the int64 product x*SCALE wraps once
        # x >= 2^63/SCALE (an in-degree of 10 after a SCALE-normalized
        # round), silently diverging from the HUGEINT oracle. The node
        # state is driver-sized (broadcast-limit-bounded), so the
        # Python loop is cheap and exact.
        return np.array([int(v) * SCALE // m for v in x.tolist()],
                        dtype=np.int64)

    hub = np.full(nodes.size, SCALE, dtype=np.int64)
    auth = np.zeros(nodes.size, dtype=np.int64)
    for _ in range(rounds):
        auth = norm(_propagate(hub, "src", "dst"))
        hub = norm(_propagate(auth, "dst", "src"))

    return ray.data.from_arrow(pa.table({
        "node": pa.array(nodes, pa.int64()),
        "hub": pa.array(hub, pa.int64()),
        "auth": pa.array(auth, pa.int64())}).cast(_HITS))


def link_hits(sf_dir: str, rounds: int = 2) -> "ray.data.Dataset":
    """Gate: integer-exact HITS over the synthetic link graph."""
    from .linkgraph import build_links
    return hits(build_links(sf_dir), rounds=rounds)


def link_hits_sql(rounds: int = 2) -> str:
    from .linkgraph import _links_sql
    ctes = [f"""{_links_sql()},
e AS (SELECT DISTINCT src, dst FROM links),
nd AS (SELECT DISTINCT x AS node FROM (
  SELECT src AS x FROM e UNION SELECT dst FROM e)),
h0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS v FROM nd)"""]
    for t in range(1, rounds + 1):
        ctes.append(f"""ar{t} AS (
  SELECT nd.node, COALESCE(s.v, 0) AS v FROM nd LEFT JOIN (
    SELECT e.dst AS node, SUM(h{t-1}.v) AS v
    FROM e JOIN h{t-1} ON h{t-1}.node = e.src GROUP BY 1) s
  USING (node)),
a{t} AS (
  SELECT node, CASE WHEN (SELECT MAX(v) FROM ar{t}) > 0
    THEN CAST(v AS HUGEINT) * {SCALE} // (SELECT MAX(v) FROM ar{t})
    ELSE v END AS v FROM ar{t}),
hr{t} AS (
  SELECT nd.node, COALESCE(s.v, 0) AS v FROM nd LEFT JOIN (
    SELECT e.src AS node, SUM(a{t}.v) AS v
    FROM e JOIN a{t} ON a{t}.node = e.dst GROUP BY 1) s
  USING (node)),
h{t} AS (
  SELECT node, CASE WHEN (SELECT MAX(v) FROM hr{t}) > 0
    THEN CAST(v AS HUGEINT) * {SCALE} // (SELECT MAX(v) FROM hr{t})
    ELSE v END AS v FROM hr{t})""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT CAST(nd.node AS BIGINT) AS node,
       CAST(h{rounds}.v AS BIGINT) AS hub,
       CAST(a{rounds}.v AS BIGINT) AS auth
FROM nd JOIN h{rounds} USING (node) JOIN a{rounds} USING (node)""")
