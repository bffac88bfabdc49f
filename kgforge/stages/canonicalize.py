"""Subject canonicalization: owl:sameAs merge + deterministic skolem IRIs.

Not present in the reference (blank nodes deliberately avoided,
csv2rdf/README.md:43) — mandated by the north-star extension (A5 in
SURVEY.md §2.6). Design:

1. ``connected_components(edges)`` — distributed min-label propagation:
   each round is one groupby-min shuffle keyed on node; converges in
   O(graph diameter) rounds (near-dup/sameAs clusters are shallow, so
   2-4 rounds in practice). No driver-side union-find: the edge set
   never materializes on one machine. Skew note: a giant component's
   rows hash-spread across partitions because the KEY is the node id,
   not the component id; the per-round aggregate is Ray's native
   (pre-combined) groupby-min.
2. ``apply_canonical_map`` — rewrite s/o IRIs through the (small)
   node→canonical map, broadcast via ray.put and applied per batch over
   dictionary uniques. Canonical = lexicographic min member
   (deterministic, parallelism-independent).
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


def skolem_iri(domain: str, content: str) -> str:
    h = hashlib.sha256(content.encode("utf-8")).hexdigest()[:20]
    return f"{domain}.well-known/genid/{h}"


def connected_components(edges: "ray.data.Dataset", max_rounds: int = 8
                         ) -> "ray.data.Dataset":
    """edges: columns (a, b) string — undirected. Returns (node, canon)
    for every node that appears in an edge; canon = min node id of its
    component (lexicographic).

    Each round: label(n) <- min(label(n), min over neighbors' labels);
    implemented as symmetric edge expansion + groupby(node).min(label).
    Converged when the label multiset stops changing (checked with a
    cheap global hash aggregate)."""

    def symmetrize(batch: pa.Table) -> pa.Table:
        a, b = batch["a"].combine_chunks(), batch["b"].combine_chunks()
        return pa.table({
            "node": pa.concat_arrays([a.cast(pa.string()), b.cast(pa.string())]),
            "label": pa.concat_arrays([b.cast(pa.string()), a.cast(pa.string())]),
        })

    sym = edges.map_batches(symmetrize, batch_format="pyarrow")
    # initial label: min(self, min neighbor)
    def with_self(batch: pa.Table) -> pa.Table:
        n, l = batch["node"].combine_chunks(), batch["label"].combine_chunks()
        return pa.table({
            "node": pa.concat_arrays([n, n]),
            "label": pa.concat_arrays([l, n]),
        })

    labels = (sym.map_batches(with_self, batch_format="pyarrow")
              .groupby("node").aggregate(Min("label", alias_name="label")))
    # edge list as (node -> neighbor) both directions, reused every round
    sym = sym.materialize()  # small relative to corpus: one row per edge end

    for _ in range(max_rounds):
        labels = labels.materialize()
        # propagate: neighbor labels join via broadcast of labels? No —
        # shuffle join on node: rename + concat, then min per node.
        lab_by_node = labels  # (node, label)
        # join sym (node, neighbor=label col) with labels of the *neighbor*:
        # reuse Ray's hash join when available; portable path = rename +
        # groupby-union trick:
        joined = _join_labels(sym, lab_by_node)
        new_labels = (joined.union(lab_by_node)
                      .groupby("node").aggregate(Min("label", alias_name="label")))
        new_labels = new_labels.materialize()
        if _label_fingerprint(new_labels) == _label_fingerprint(labels):
            labels = new_labels
            break
        labels = new_labels
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "canon"]), batch_format="pyarrow")


def _join_labels(sym: "ray.data.Dataset", labels: "ray.data.Dataset"
                 ) -> "ray.data.Dataset":
    """(node, neighbor) ⋈ (neighbor, label) -> (node, label).

    Partitioning assumption (documented per SURVEY §2 custom-operator
    rule): the label table covers only nodes that appear in sameAs/dup
    EDGES — bounded by duplicate mass, orders of magnitude smaller than
    the corpus — so the idiomatic Ray Data move is a ray.put broadcast +
    per-batch dict lookup, not an all-to-all shuffle join. (A
    hash-partitioned Dataset.join drop-in would replace this if dup mass
    ever approached corpus scale.)"""
    sym_renamed = sym.map_batches(
        lambda t: t.rename_columns(["node", "nbr"]), batch_format="pyarrow")
    lab_map = {}
    for b in labels.iter_batches(batch_format="pyarrow"):
        lab_map.update(zip(b["node"].to_pylist(), b["label"].to_pylist()))
    ref = ray.put(lab_map)

    def lookup(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        nbr = batch["nbr"].to_pylist()
        lab = [m.get(x, x) for x in nbr]
        return pa.table({"node": batch["node"],
                         "label": pa.array(lab, type=pa.string())})

    return sym_renamed.map_batches(lookup, batch_format="pyarrow")


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


def skolem_canonical_map(labels: "ray.data.Dataset", domain: str
                         ) -> dict[str, str]:
    """Alternative canonical policy: every member of a component maps to
    a deterministic SKOLEM IRI derived from the component's full sorted
    membership (RFC 7.2-style .well-known/genid). Unlike min-member
    canonicalization, no member is privileged — the blank-node-free
    equivalent of merging into a fresh node. Deterministic across runs
    and parallelism (content-hash, no RNG, no ordinals)."""
    members: dict[str, list[str]] = {}
    for b in labels.iter_batches(batch_format="pyarrow"):
        for n, c in zip(b["node"].to_pylist(), b["canon"].to_pylist()):
            members.setdefault(c, []).append(n)
    mapping: dict[str, str] = {}
    for canon, nodes in members.items():
        if len(nodes) < 2:
            continue
        skolem = skolem_iri(domain, "\x00".join(sorted(nodes)))
        for n in nodes:
            mapping[n] = skolem
    return mapping


def canonical_map_from_components(labels: "ray.data.Dataset") -> dict[str, str]:
    """Collect node→canon for nodes whose canon differs (the only ones a
    rewrite needs) — small: bounded by total duplicate mass."""
    out = {}
    for b in labels.iter_batches(batch_format="pyarrow"):
        for n, c in zip(b["node"].to_pylist(), b["canon"].to_pylist()):
            if n != c:
                out[n] = c
    return out


def apply_canonical_map(triples: "ray.data.Dataset", mapping: dict[str, str]
                        ) -> "ray.data.Dataset":
    """Rewrite s and URI-objects through the broadcast canonical map."""
    if not mapping:
        return triples
    ref = ray.put(mapping)

    def rewrite(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)

        def remap(col: pa.ChunkedArray, guard: pa.Array | None = None):
            arr = col.combine_chunks().cast(pa.string())
            enc = pc.dictionary_encode(arr)
            uniq = enc.dictionary.to_pylist()
            mapped = pa.array(
                [m.get(u, u) if u is not None else None for u in uniq],
                type=pa.string()).take(enc.indices)
            if guard is not None:
                return pc.if_else(guard, mapped, arr)
            return mapped

        is_uri = pc.equal(batch["o_kind"].combine_chunks().cast(pa.string()), "u")
        batch = batch.set_column(
            batch.schema.get_field_index("s"), "s", remap(batch["s"]))
        batch = batch.set_column(
            batch.schema.get_field_index("o_lex"), "o_lex",
            remap(batch["o_lex"], guard=is_uri))
        return batch

    return triples.map_batches(rewrite, batch_format="pyarrow")


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
