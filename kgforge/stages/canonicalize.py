"""Subject canonicalization: owl:sameAs merge + deterministic skolem IRIs.

Not present in the reference (blank nodes deliberately avoided,
csv2rdf/README.md:43) — mandated by the north-star extension (A5 in
SURVEY.md §2.6). Design:

1. ``connected_components(edges)`` — distributed min-label propagation:
   each round is one hash-join + groupby-min shuffle keyed on node;
   converges in O(graph diameter) rounds (near-dup/sameAs clusters are
   shallow, so 2-4 rounds in practice). No driver-side union-find: the
   edge set never materializes on one machine. Skew note: a giant
   component's rows hash-spread across partitions because the KEY is
   the node id, not the component id; the per-round aggregate is Ray's
   native (pre-combined) groupby-min.
2. ``apply_canonical_mapping`` — rewrite s/o IRIs through a
   hash-partitioned join of the triple stream against the (member,
   canon) mapping *Dataset*. No driver-side dict, no broadcast: both
   sides shuffle by key, so the mapping may be any size (at 100 TB
   Common Crawl, exact-dup mass is a double-digit percentage of the
   corpus — a "small side" assumption would be wrong). Canonical =
   lexicographic min member (deterministic, parallelism-independent).
3. ``skolem_iri`` — RFC-style .well-known/genid skolemization with a
   content hash: no randomness, no ordinals (resume/determinism
   requirement).
4. ``sameas_triples`` — emit ``member owl:sameAs canonical`` for every
   non-canonical member.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Min

from ..ntriples import OWL_SAMEAS


# Giving a map stage an explicit batch_size makes Ray's batch bundler
# COALESCE input blocks — which silently drops the zero-column empty
# blocks that sort-aggregates and hash joins emit for empty partitions
# (those poison any later join: pyarrow raises "No match ... for key
# field reference"). Use on any map that sits between a shuffle op and a
# join. Stays fully lazy/streaming, unlike drop_empty_blocks below.
SANITIZE_BATCH = 65536


def drop_empty_blocks(ds: "ray.data.Dataset",
                      schema: pa.Schema | None = None) -> "ray.data.Dataset":
    """Ray's sort-based groupby/aggregate emits zero-column EMPTY blocks
    for empty partitions (schema: nothing — Ray itself warns "new
    schema: ."), and pyarrow's hash join then fails with "No match ...
    for key field reference" on them. Rebuild the dataset from the
    non-empty block REFS (no data copy, no extra shuffle). Triggers
    execution, so call it only on small/materialized aggregate outputs
    that are about to feed a join. ``schema`` is the fallback for an
    entirely-empty input (so downstream joins still see key columns)."""
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(block_ref)
    if not refs:
        if schema is None:
            raise ValueError("drop_empty_blocks: dataset is empty and no "
                             "fallback schema was given")
        return ray.data.from_arrow(schema.empty_table())
    return ray.data.from_arrow_refs(refs)


def default_shuffle_partitions() -> int:
    """Partition count for hash joins/shuffles: tracks cluster width
    (each partition carries fixed scheduling cost, so small sessions
    want few; a 256-node cluster wants ≈ total cores — set
    KGFORGE_JOIN_PARTITIONS there)."""
    import os
    v = os.environ.get("KGFORGE_JOIN_PARTITIONS")
    if v:
        return int(v)
    ncpu = 8
    if ray.is_initialized():
        ncpu = int(ray.cluster_resources().get("CPU", 8))
    return max(2, min(16, ncpu))


def broadcast_row_limit() -> int:
    """Size threshold for the adaptive small-side strategy (the Spark
    broadcast-hash-join analogue): a side whose EXACT row count (already
    computed, never guessed) is at or below this limit ships once via
    ray.put and is applied as a per-batch map — no shuffle, no actor
    pool. Above it, the operator switches to a hash-partitioned Dataset
    join. The broadcast side is therefore HARD-BOUNDED: ~2M rows of
    (string, string) pairs ≈ low hundreds of MB in the object store.
    Env override: KGFORGE_BROADCAST_LIMIT (0 forces the join path)."""
    import os
    return int(os.environ.get("KGFORGE_BROADCAST_LIMIT", 2_000_000))


def skolem_iri(domain: str, content: str) -> str:
    h = hashlib.sha256(content.encode("utf-8")).hexdigest()[:20]
    return f"{domain}.well-known/genid/{h}"


def connected_components(edges: "ray.data.Dataset", max_rounds: int = 16
                         ) -> "ray.data.Dataset":
    """edges: columns (a, b) string — undirected. Returns (node, canon)
    for every node that appears in an edge; canon = min node id of its
    component (lexicographic).

    Each round: label(n) <- min(label(n), min over neighbors' labels);
    implemented as symmetric edge expansion + groupby(node).min(label).
    Converged when the label multiset stops changing (checked with a
    cheap global hash aggregate). If the fingerprint is still moving
    after ``max_rounds`` (component diameter > max_rounds, e.g. a long
    chain of pairwise near-dups), raises rather than silently splitting
    one component into several canonical IDs."""

    def symmetrize(batch: pa.Table) -> pa.Table:
        a, b = batch["a"].combine_chunks(), batch["b"].combine_chunks()
        return pa.table({
            "node": pa.concat_arrays([a.cast(pa.string()), b.cast(pa.string())]),
            "nbr": pa.concat_arrays([b.cast(pa.string()), a.cast(pa.string())]),
        })

    # (node, nbr) edge ends, reused every round; one row per edge end —
    # proportional to the EDGE set, not the corpus — materialized ONCE so
    # neither the initial labels nor the per-round join re-runs the prefix
    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    # initial label: min(self, min neighbor)
    def with_self(batch: pa.Table) -> pa.Table:
        n, l = batch["node"].combine_chunks(), batch["nbr"].combine_chunks()
        return pa.table({
            "node": pa.concat_arrays([n, n]),
            "label": pa.concat_arrays([l, n]),
        })

    labels = (sym.map_batches(with_self, batch_format="pyarrow")
              .groupby("node").aggregate(Min("label", alias_name="label")))

    converged = False
    fp_prev = None
    for _ in range(max_rounds):
        labels = labels.materialize()
        if fp_prev is None:
            fp_prev = _label_fingerprint(labels)
        joined = _join_labels(sym, labels)
        new_labels = (joined.union(labels)
                      .groupby("node").aggregate(Min("label", alias_name="label")))
        new_labels = new_labels.materialize()
        fp_new = _label_fingerprint(new_labels)
        labels = new_labels
        if fp_new == fp_prev:
            converged = True
            break
        fp_prev = fp_new
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(component diameter exceeds the round cap); raise max_rounds")
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "canon"]),
        batch_format="pyarrow", batch_size=SANITIZE_BATCH)


def _join_labels(sym: "ray.data.Dataset", labels: "ray.data.Dataset"
                 ) -> "ray.data.Dataset":
    """(node, nbr) ⋈ (node=nbr, label) -> (node, label), as a
    hash-partitioned Dataset join: both sides shuffle by the neighbor
    key, so the label table may be any size (no broadcast, no driver
    collect). Every ``nbr`` appears in ``labels`` by construction
    (labels were initialized from the same symmetric edge set), so an
    inner join is lossless."""
    lab = labels.map_batches(
        lambda t: t.rename_columns(["_lnode", "label"]),
        batch_format="pyarrow", batch_size=SANITIZE_BATCH)
    j = sym.join(lab, join_type="inner",
                 num_partitions=default_shuffle_partitions(),
                 on=("nbr",), right_on=("_lnode",))
    return j.select_columns(["node", "label"])


def _label_fingerprint(labels: "ray.data.Dataset") -> int:
    """Order-independent fingerprint of (node,label) pairs: sum of row
    hashes — one tiny aggregate, no driver materialization of rows."""
    def h(batch: pa.Table) -> pa.Table:
        import zlib
        # crc32: deterministic across worker processes (built-in hash()
        # is salted per process and would defeat convergence detection)
        vals = [zlib.crc32(f"{n}\x00{l}".encode()) for n, l in
                zip(batch["node"].to_pylist(), batch["label"].to_pylist())]
        return pa.table({"h": pa.array([sum(vals)], type=pa.int64())})
    return labels.map_batches(h, batch_format="pyarrow").sum("h")


def skolem_canonical_mapping(labels: "ray.data.Dataset", domain: str,
                             num_buckets: int = 64) -> "ray.data.Dataset":
    """Alternative canonical policy: every member of a ≥2-member
    component maps to a deterministic SKOLEM IRI derived from the
    component's full sorted membership (RFC 7.2-style
    .well-known/genid). Unlike min-member canonicalization, no member is
    privileged — the blank-node-free equivalent of merging into a fresh
    node. Deterministic across runs and parallelism (content-hash, no
    RNG, no ordinals). Returns a (member, canon) Dataset; components
    shuffle by a hash bucket of their canon label so Python only ever
    touches ``num_buckets`` groups, each holding whole components."""
    def bucketize(batch: pa.Table) -> pa.Table:
        import polars as pl
        h = pl.from_arrow(batch.select(["canon"])).hash_rows(seed=0)
        return batch.append_column(
            "_bucket", pa.array((h % num_buckets).cast(pl.Int32).to_numpy()))

    def per_bucket(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(["canon", "node"], kind="mergesort")
        members, skolems = [], []
        for _, nodes in df.groupby("canon", sort=False)["node"]:
            if len(nodes) < 2:
                continue
            sk = skolem_iri(domain, "\x00".join(nodes))
            members.extend(nodes)
            skolems.extend([sk] * len(nodes))
        return pa.table({"member": pa.array(members, type=pa.string()),
                         "canon": pa.array(skolems, type=pa.string())})

    return (labels.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_bucket").map_groups(per_bucket, batch_format="pyarrow"))


def canonical_mapping_from_components(labels: "ray.data.Dataset"
                                      ) -> "ray.data.Dataset":
    """(node, canon) -> (member, canon) Dataset restricted to nodes whose
    canon differs (the only rows a rewrite join needs). Stays
    distributed end to end — no driver collect."""
    def fn(batch: pa.Table) -> pa.Table:
        node = batch["node"].combine_chunks().cast(pa.string())
        canon = batch["canon"].combine_chunks().cast(pa.string())
        mask = pc.invert(pc.equal(node, canon))
        return pa.table({"member": node.filter(mask),
                         "canon": canon.filter(mask)})
    return labels.map_batches(fn, batch_format="pyarrow")


# sentinel join key for rows whose object is not an IRI: minted IRIs are
# never empty, so "" can never collide with a mapping member
_NON_URI_KEY = ""


def apply_canonical_mapping(triples: "ray.data.Dataset",
                            mapping: "ray.data.Dataset",
                            num_partitions: int | None = None
                            ) -> "ray.data.Dataset":
    """Rewrite s and URI-objects through a (member, canon) mapping
    *Dataset*. Size-adaptive (the exact mapping row count is known —
    ``mapping`` must be materialized):

    - count ≤ ``broadcast_row_limit()``: the mapping ships once via
      ray.put and is applied as a dictionary-encoded per-batch remap —
      one streaming pass over the triples, no shuffle (the broadcast-
      hash-join small-side fast path, hard-bounded by the threshold).
    - larger (Common Crawl exact-dup mass is tens of percent of the
      corpus): two hash-partitioned left-outer joins, one per IRI
      position — both sides shuffle by key, correct at ANY mapping size.

    Literal objects are never rewritten on either path (o_kind guard /
    sentinel join key), even if their lexical form equals a member IRI.
    An empty mapping short-circuits."""
    n = mapping.count()
    if n == 0:
        return triples
    if n <= broadcast_row_limit():
        return _apply_mapping_broadcast(triples, mapping)
    nparts = num_partitions or default_shuffle_partitions()

    j1 = triples.join(mapping, join_type="left_outer",
                      num_partitions=nparts, on=("s",), right_on=("member",))

    def fix_s(batch: pa.Table) -> pa.Table:
        s = pc.coalesce(batch["canon"], batch["s"])
        okey = pc.if_else(
            pc.equal(batch["o_kind"].combine_chunks().cast(pa.string()), "u"),
            batch["o_lex"].combine_chunks().cast(pa.string()),
            pa.scalar(_NON_URI_KEY))
        batch = batch.drop_columns(["canon"])
        batch = batch.set_column(batch.schema.get_field_index("s"), "s", s)
        return batch.append_column("_okey", okey)

    j2 = (j1.map_batches(fix_s, batch_format="pyarrow",
                         batch_size=SANITIZE_BATCH)
          .join(mapping, join_type="left_outer", num_partitions=nparts,
                on=("_okey",), right_on=("member",)))

    def fix_o(batch: pa.Table) -> pa.Table:
        o_lex = pc.coalesce(batch["canon"], batch["o_lex"])
        batch = batch.drop_columns(["canon", "_okey"])
        return batch.set_column(
            batch.schema.get_field_index("o_lex"), "o_lex", o_lex)

    return j2.map_batches(fix_o, batch_format="pyarrow",
                          batch_size=SANITIZE_BATCH)


def _apply_mapping_broadcast(triples: "ray.data.Dataset",
                             mapping: "ray.data.Dataset"
                             ) -> "ray.data.Dataset":
    """Small-side fast path: mapping (count-bounded by
    broadcast_row_limit) → dict shipped once via ray.put, applied over
    dictionary-encoded uniques per batch."""
    m: dict[str, str] = {}
    for b in mapping.iter_batches(batch_format="pyarrow"):
        m.update(zip(b["member"].to_pylist(), b["canon"].to_pylist()))
    ref = ray.put(m)

    def rewrite(batch: pa.Table) -> pa.Table:
        mm = ray.get(ref)

        def remap(col, guard=None):
            arr = col.combine_chunks().cast(pa.string())
            enc = pc.dictionary_encode(arr)
            uniq = enc.dictionary.to_pylist()
            mapped = pa.array(
                [mm.get(u, u) if u is not None else None for u in uniq],
                type=pa.string()).take(enc.indices)
            if guard is not None:
                return pc.if_else(guard, mapped, arr)
            return mapped

        is_uri = pc.equal(batch["o_kind"].combine_chunks().cast(pa.string()),
                          "u")
        batch = batch.set_column(
            batch.schema.get_field_index("s"), "s", remap(batch["s"]))
        return batch.set_column(
            batch.schema.get_field_index("o_lex"), "o_lex",
            remap(batch["o_lex"], guard=is_uri))

    return triples.map_batches(rewrite, batch_format="pyarrow")


def sameas_from_mapping(mapping: "ray.data.Dataset") -> "ray.data.Dataset":
    """(member, canon) mapping Dataset -> member owl:sameAs canon triples."""
    def fn(batch: pa.Table) -> pa.Table:
        member = batch["member"].combine_chunks().cast(pa.string())
        canon = batch["canon"].combine_chunks().cast(pa.string())
        n = len(member)
        from .triples import TRIPLE_SCHEMA, _const_col
        return pa.Table.from_arrays(
            [member, _const_col(OWL_SAMEAS, n), _const_col("u", n),
             canon, _const_col("", n)], schema=TRIPLE_SCHEMA)
    return mapping.map_batches(fn, batch_format="pyarrow")


def sameas_triples(labels: "ray.data.Dataset") -> "ray.data.Dataset":
    """member owl:sameAs canon, for non-canonical members."""
    def fn(batch: pa.Table) -> pa.Table:
        node = batch["node"].combine_chunks().cast(pa.string())
        canon = batch["canon"].combine_chunks().cast(pa.string())
        mask = pc.invert(pc.equal(node, canon))
        node, canon = node.filter(mask), canon.filter(mask)
        n = len(node)
        from .triples import _const_col
        return pa.table({
            "s": node,
            "p": _const_col(OWL_SAMEAS, n),
            "o_kind": _const_col("u", n),
            "o_lex": canon,
            "o_dt": _const_col("", n),
        })
    return labels.map_batches(fn, batch_format="pyarrow")
