"""Salted two-phase groupby-aggregate — explicit hot-key skew handling.

The north-star pipeline aggregates per ENTITY, and web-scale entity
distributions are Zipfian: one entity (a boilerplate footer link, a
ubiquitous brand) can appear on a double-digit percentage of all pages.
A plain ``groupby(entity)`` ships every one of those rows to ONE
reducer — the job's wall-clock becomes that single task no matter how
wide the cluster is.

Two regimes, two answers (both used in this repo):

* **Algebraic aggregates** (sum/count/min/max/mean) are already
  skew-free here via per-batch combiners before a tiny final groupby
  (``ops/relational.pricing_summary``, ``tumbling_counts``): after
  combining, at most one row per key per block reaches the shuffle.
  No salt needed — the combiner IS the phase-1.
* **Holistic aggregates** — the canonical one being
  ``COUNT(DISTINCT value)`` (per-entity document frequency) — cannot
  be combined into one row per key per block: the duplicate state is
  the value set itself. This module implements them with an explicit
  **salted two-phase shuffle**: phase 1 groups by
  ``(key, salt)`` where ``salt = hash(value) % S``, so a hot key's
  value set is split across up to ``S`` independent reducers; phase 2
  groups the ≤ S per-cell partials by ``key`` (tiny by construction).

The decomposition is EXACT, not approximate: salt is a deterministic
function of the value, so the distinct values of a key are partitioned
disjointly across cells — every distinct ``(key, value)`` pair is
counted exactly once, and ``sum(per-cell distinct counts) ==
COUNT(DISTINCT value)``.

Shuffle mechanics follow ``stages/dedup.py``: the exchange is keyed by
ONE small int ``_bucket = hash(key, salt) % B`` (Ray's sort-aggregate
iterates groups in Python — bucketing keeps group count at B, not
key-cardinality), and each bucket's work is a vectorized polars
unique + group_by.len (C++). A hot key's pairs therefore land in up to
``min(S, B)`` different reduce tasks instead of one.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..stages.dedup import default_num_buckets

# Salt fan-out per key. Bounds phase-2 input at S rows per key; 64
# matches default reduce width so one maximally-hot key can occupy
# every reducer. Env override for wider clusters.
DEFAULT_SALT_BUCKETS = 64


def _pair_cells(batch: pa.Table, key: str, value: str,
                salt_buckets: int, num_buckets: int) -> pa.Table:
    """Phase-0 map: per-batch distinct (key, value) pairs + shuffle
    bucket ``hash(key, hash(value) % S) % B``. Deterministic (polars
    hash_rows, fixed seeds) so the same pair always reaches the same
    bucket — cross-block duplicates meet again and dedup exactly."""
    import polars as pl

    u = pl.from_arrow(batch.select([key, value])).unique(
        subset=[key, value], keep="first", maintain_order=True)
    salt = ((u.select(pl.col(value)).hash_rows(seed=17) % salt_buckets)
            .cast(pl.UInt32).rename("_salt"))
    u = u.with_columns(salt)
    bucket = ((u.select([key, "_salt"]).hash_rows(seed=0) % num_buckets)
              .cast(pl.Int32).rename("_bucket"))
    target = pa.schema([batch.schema.field(key), batch.schema.field(value),
                        pa.field("_bucket", pa.int32())])
    return u.drop("_salt").with_columns(bucket).to_arrow().cast(target)


def salted_distinct_count(ds: "ray.data.Dataset", key: str, value: str,
                          salt_buckets: int = DEFAULT_SALT_BUCKETS,
                          num_buckets: int | None = None,
                          out_col: str = "distinct_count"
                          ) -> "ray.data.Dataset":
    """Exact ``COUNT(DISTINCT value) GROUP BY key`` that survives hot
    keys: output columns ``(key, out_col:int64)``.

    Phase 1 shuffles distinct ``(key, value)`` pairs keyed by
    ``hash(key, hash(value) % salt_buckets) % num_buckets`` — a hot
    key's pairs spread over up to ``min(salt_buckets, num_buckets)``
    reduce tasks, each of which dedups its disjoint value slice and
    emits one partial count per key. Phase 2 sums the ≤ salt_buckets
    partials per key (per-batch combiner + a tiny final groupby)."""
    if num_buckets is None:
        num_buckets = default_num_buckets()

    def bucketize(batch: pa.Table) -> pa.Table:
        return _pair_cells(batch, key, value, salt_buckets, num_buckets)

    def per_bucket(group: pa.Table) -> pa.Table:
        # buckets partition the distinct pair space disjointly, so a
        # plain per-bucket unique + per-key row count is an exact
        # partial of the global distinct count
        import polars as pl
        cnt = (pl.from_arrow(group.select([key, value]))
               .unique(subset=[key, value], keep="first")
               .group_by(key).len(name="_partial"))
        target = pa.schema([group.schema.field(key),
                            pa.field("_partial", pa.int64())])
        return cnt.to_arrow().cast(target)

    def combine(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = batch.group_by(key).aggregate([("_partial", "sum")])
        return pa.table({key: t[key],
                         "_partial": pc.cast(t["_partial_sum"], pa.int64())})

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            key: batch[key],
            out_col: pc.cast(batch[out_col], pa.int64()),
        })

    partials = (ds.map_batches(bucketize, batch_format="pyarrow")
                .groupby("_bucket")
                .map_groups(per_bucket, batch_format="pyarrow"))
    return (partials.map_batches(combine, batch_format="pyarrow")
            .groupby(key)
            .aggregate(Sum("_partial", alias_name=out_col))
            .map_batches(finish, batch_format="pyarrow"))


# ------------------------------------------------- gate: entity doc-freq
def entity_doc_frequency(sf_dir: str,
                         salt_buckets: int = DEFAULT_SALT_BUCKETS
                         ) -> "ray.data.Dataset":
    """Per-entity document frequency over the documents corpus: for
    each gazetteer entity, the number of DISTINCT documents mentioning
    it — the textbook hot-key aggregate (a handful of entities, each
    present in most of the corpus; a naive groupby(mention) would put
    the whole corpus through ~10 reducers at any cluster size).

    Output: (mention:string, doc_freq:int64)."""
    import pyarrow.compute as pc

    from ..pipelines.webkg import LEXICON

    value_set = pa.array(sorted(LEXICON), type=pa.string())

    def mention_doc_pairs(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks().cast(pa.string())
        doc_id = batch["doc_id"].combine_chunks().cast(pa.int64())
        split = pc.split_pattern(text, pattern=" ")
        flat = split.flatten()
        parents = pc.list_parent_indices(split)
        mask = pc.is_in(flat, value_set=value_set)
        t = pa.table({
            "mention": flat.filter(mask),
            "doc_id": doc_id.take(parents.filter(mask)),
        })
        # combiner: 40 mentions of an entity in one doc are one
        # (mention, doc) fact — collapse before the shuffle
        return t.group_by(["mention", "doc_id"]).aggregate([])

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    pairs = ds.map_batches(mention_doc_pairs, batch_format="pyarrow")
    return salted_distinct_count(pairs, key="mention", value="doc_id",
                                 salt_buckets=salt_buckets,
                                 out_col="doc_freq")


def entity_doc_frequency_sql() -> str:
    from ..pipelines.webkg import LEXICON
    from ..sqlgen import sql_quote

    in_list = ", ".join(sql_quote(t) for t in sorted(LEXICON))
    return f"""
SELECT token AS mention,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
      FROM documents)
WHERE token IN ({in_list})
GROUP BY 1
"""
