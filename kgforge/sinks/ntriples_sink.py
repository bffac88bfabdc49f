"""Graph materialization sinks — sorted N-Triples shards + Parquet mirror.

Reference analogues: the Turtle writer (S5, csv2rdf-v5.py:158-163) and
the 20k-triple chunked writer (S6, csv2rdf-v3.py:124-166). Ray-native
replacement: a deterministic global ``sort(["s","p","o"])`` (range
shuffle) followed by one output file per block — block size plays the
role of the v3 ``MAX = 20000`` constant, but is byte-bounded and chosen
by the streaming executor, and files are named by block index so the
shard set is deterministic and resumable.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.datasource import BlockBasedFileDatasink, FilenameProvider

from ..stages.triples import triples_to_terms


class _SortableNames(FilenameProvider):
    """Deterministic, lexicographically-ordered shard names — the
    default provider prefixes a per-run UUID, which breaks
    concatenation order for a globally sorted graph (and breaks
    byte-identical resume output)."""

    def __init__(self, suffix: str = "nt"):
        self.suffix = suffix

    def get_filename_for_block(self, block, write_uuid, task_index,
                               block_index) -> str:
        return f"part-{task_index:06d}-{block_index:06d}.{self.suffix}"


class NTriplesDatasink(BlockBasedFileDatasink):
    """One ``.nt`` file per (sorted) block."""

    def __init__(self, path: str, **kwargs):
        kwargs.setdefault("filename_provider", _SortableNames())
        super().__init__(path, file_format="nt", **kwargs)

    def write_block_to_file(self, block, file) -> None:
        t = block.to_arrow() if hasattr(block, "to_arrow") else block
        s = t["s"].to_pylist()
        p = t["p"].to_pylist()
        o = t["o"].to_pylist()
        out = "".join(f"<{si}> <{pi}> {oi} .\n" for si, pi, oi in zip(s, p, o))
        file.write(out.encode("utf-8"))


def write_graph(triples: "ray.data.Dataset", out_dir: str,
                sort: bool = True) -> None:
    """Columnar triples -> ``out_dir/graph.nt/`` (sorted N-Triples
    shards) + ``out_dir/triples.parquet/`` (queryable mirror)."""
    terms = triples.map_batches(triples_to_terms, batch_format="pyarrow")
    if sort:
        # range-partitioned sort (stages/rangesort.py): ~4.5x
        # Dataset.sort on the merged graph; needs a materialized input
        # (two passes: boundary sample + bucketed sort)
        from ..stages.rangesort import range_sorted
        terms = range_sorted(terms.materialize(), ["s", "p", "o"])
    # write_parquet consumes the dataset; the .nt sink needs its own
    # pass — reuse one materialized sorted result to avoid recomputing
    terms = terms.materialize()
    terms.write_datasink(NTriplesDatasink(f"{out_dir}/graph.nt"))
    terms.write_parquet(f"{out_dir}/triples.parquet")


_LOCAL_RE = None


def predicate_key(iri: str) -> str:
    """Partition key for a predicate IRI: its local name when
    filesystem-safe, else a crc32 of the full IRI. Shared by the writer
    and the triple-pattern reader (sinks/store_query.py) so a bound-p
    query computes the directory to prune to."""
    global _LOCAL_RE
    if _LOCAL_RE is None:
        import re
        _LOCAL_RE = re.compile(r"[A-Za-z0-9_\-]{1,64}\Z")
    import zlib
    local = iri.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    if _LOCAL_RE.match(local):
        return local
    return "h" + format(zlib.crc32(iri.encode()), "08x")


def write_graph_partitioned(triples: "ray.data.Dataset",
                            out_dir: str) -> None:
    """Predicate-partitioned Parquet store — the Ray-native answer to
    the reference's SPARQL/Jena hand-off (S9): triple-pattern queries
    with a bound predicate (the overwhelmingly common case) read ONE
    ``p_key=...`` partition directory instead of scanning the graph;
    any SQL engine (DuckDB here) queries it directly.

    ``p_key`` is collision-tolerant: the full ``p`` column is still
    inside every file, so a reader filters the partition it pruned
    to."""
    import pyarrow.compute as pc

    def add_key(batch: pa.Table) -> pa.Table:
        p = batch["p"].combine_chunks().cast(pa.string())
        enc = pc.dictionary_encode(p)
        uniq = [predicate_key(u) if u is not None else None
                for u in enc.dictionary.to_pylist()]
        keys = pa.array(uniq, type=pa.string()).take(enc.indices)
        return batch.append_column("p_key", keys)

    (triples.map_batches(add_key, batch_format="pyarrow")
     .write_parquet(f"{out_dir}/triples_by_predicate",
                    partition_cols=["p_key"]))


def read_graph_lines(out_dir: str) -> list[str]:
    """Read back the sorted N-Triples lines (small graphs / tests)."""
    import glob
    lines: list[str] = []
    for f in sorted(glob.glob(f"{out_dir}/graph.nt/*")):
        with open(f, encoding="utf-8") as fh:
            lines.extend(fh.read().splitlines())
    return lines


def write_requirements(reqs: "ray.data.Dataset", path: str) -> None:
    """S7 side output: sorted distinct requirement lines to ONE file
    (it is small by construction)."""
    rows = sorted(r["requirement"] for r in reqs.take_all())
    with open(path, "w", encoding="utf-8", newline="\n") as f:
        for r in rows:
            f.write(r + "\n")
