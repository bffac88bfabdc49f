"""Checkpoint manifest: partition-addressed outputs, per-partition
lineage + counters, exact resume.

North-rule requirement (BASELINE.json): "resumable from checkpoint with
per-partition lineage + metrics". Layout:

    out_dir/
      manifest.jsonl           one record per COMPLETED partition
      part-00000/triples.parquet/   (atomic: written to part-00000.tmp/,
      part-00001/...                 fsync'd, renamed)

A partition is the unit of resume: deterministic slice of the input
(hash-bucket of the pkey — NEVER ordinal row position, which would
change with parallelism). Rerunning skips partitions already in the
manifest WHOSE INPUT IS UNCHANGED — each record carries an
``input_stamp`` (size+mtime fingerprint of the partition's input
shards), so a re-crawl that rewrites one shard re-extracts exactly
that partition and the incremental merge (stages/mergestore.py) then
rebuilds exactly that run: the whole refresh is O(delta) end-to-end.
A crash mid-partition leaves only a ``.tmp`` dir that the rerun
overwrites. Counters (rows_in, triples_out, wall_s) double as the
lineage/metrics stream (reference analogue: run.log, S8
csv2rdf-v5/tools.py:7-19).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field


@dataclass
class Manifest:
    path: str
    records: dict[int, dict] = field(default_factory=dict)

    @classmethod
    def load(cls, out_dir: str) -> "Manifest":
        path = os.path.join(out_dir, "manifest.jsonl")
        m = cls(path=path)
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    if rec.get("status") == "done":
                        m.records[rec["partition"]] = rec
        return m

    def completed(self) -> set[int]:
        return set(self.records)

    def record(self, rec: dict) -> None:
        self.records[rec["partition"]] = rec
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())


def partitioned_kg_run(sf_dir: str, out_dir: str, num_partitions: int = 4,
                       domain: str | None = None,
                       fail_after: int | None = None) -> Manifest:
    """Resumable flagship run; each partition runs the full pipeline
    and lands atomically under ``part-{i:05d}/``.

    Partitioning unit: for a SHARDED corpus (documents.parquet is a
    directory of files — what any real crawl looks like), partition i
    reads ONLY its shard subset ``files[i::num_partitions]`` — input
    pruning, so a P-partition run reads the corpus once total, not P
    times. For a single-file input, falls back to a ``doc_id %
    num_partitions`` content filter (deterministic, never row position
    — but a full scan per partition, fine only at test scale). Re-runs
    skip a completed partition only while its input shards are
    byte-stable (``input_stamp``); a re-crawl that rewrites shard i
    re-extracts exactly partition i, and paired with the incremental
    merge that makes a corpus refresh O(delta) end to end. The
    manifest records sf_dir + num_partitions and refuses layout
    mismatches.

    ``fail_after`` (tests only): raise after N partitions to simulate a
    crash; a subsequent call with the same args resumes exactly.

    Final output across partitions is a disjoint union keyed by the
    page subject; a global post-dedup is NOT needed for row-level
    triples (partitions are subject-disjoint) — schema-level triples
    can repeat across partitions and are deduped at read/merge time
    (``merged_triples``)."""
    import glob

    from ..pipelines.webkg import (DOMAIN, build_prepared_pages,
                                   webkg_triples_from_pages)

    domain = domain or DOMAIN
    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest.load(out_dir)
    # resume safety: a manifest recorded for a different input dir or
    # partition count describes an INCOMPATIBLE partition layout —
    # resuming against it would silently duplicate and drop documents
    for rec in manifest.records.values():
        if (rec.get("sf_dir") != sf_dir
                or rec.get("num_partitions") != num_partitions):
            raise ValueError(
                f"manifest at {out_dir} was written for "
                f"sf_dir={rec.get('sf_dir')!r}, "
                f"num_partitions={rec.get('num_partitions')}; current run "
                f"asks for sf_dir={sf_dir!r}, num_partitions="
                f"{num_partitions}. Use a fresh out_dir (or matching "
                "arguments) — mixing layouts corrupts the output.")
    doc_path = os.path.join(sf_dir, "documents.parquet")
    shards = (sorted(glob.glob(os.path.join(doc_path, "*.parquet")))
              if os.path.isdir(doc_path) else None)

    def input_stamp(p: int) -> str:
        import hashlib
        files = shards[p::num_partitions] if shards else [doc_path]
        return hashlib.md5(";".join(
            f"{os.path.basename(f)}:{os.path.getsize(f)}"
            f":{os.path.getmtime(f):.6f}" for f in files).encode()
        ).hexdigest()

    ran = 0
    for p in range(num_partitions):
        stamp = input_stamp(p)
        rec = manifest.records.get(p)
        # skip only if done AND the input is byte-stable; a record
        # without a stamp (older manifest) keeps legacy skip semantics
        if rec is not None and rec.get("input_stamp", stamp) == stamp:
            continue
        if fail_after is not None and ran >= fail_after:
            raise RuntimeError(f"simulated crash before partition {p}")
        t0 = time.time()
        if shards:
            subset = shards[p::num_partitions]
            if not subset:
                part = build_prepared_pages(sf_dir).limit(0)
            else:
                part = build_prepared_pages(sf_dir, paths=subset)
        else:
            pages = build_prepared_pages(sf_dir)
            part = pages.map_batches(
                lambda t, _p=p: t.filter(_mod_mask(t["doc_id"],
                                                   num_partitions, _p)),
                batch_format="pyarrow")
        rows_in = part.count()
        # canonicalize=False inside a partition: exact-dup merge is a
        # GLOBAL property — pages in different partitions can share
        # text. The global canonicalization pass belongs after the merge
        # (merged_triples), where all partitions are visible.
        triples = webkg_triples_from_pages(part, domain, canonicalize=False)
        tmp = os.path.join(out_dir, f"part-{p:05d}.tmp")
        final = os.path.join(out_dir, f"part-{p:05d}")
        shutil.rmtree(tmp, ignore_errors=True)
        triples = triples.materialize()
        triples_out = triples.count()
        triples.write_parquet(os.path.join(tmp, "triples.parquet"))
        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
        manifest.record({
            "partition": p,
            "status": "done",
            "rows_in": rows_in,
            "triples_out": triples_out,
            "wall_s": round(time.time() - t0, 3),
            "sf_dir": sf_dir,
            "num_partitions": num_partitions,
            "input_stamp": stamp,
        })
        ran += 1
    return manifest


def _mod_mask(col, num_partitions: int, p: int):
    """doc_id % num_partitions == p as an Arrow mask (deterministic
    partitioner: content key, never row position)."""
    import pyarrow as pa
    import pyarrow.compute as pc_
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    arr = arr.cast(pa.int64())
    import numpy as np
    vals = arr.to_numpy(zero_copy_only=False)
    return pa.array(vals % num_partitions == p)


def merged_triples(out_dir: str, domain: str | None = None):
    """Read all completed partitions back as one deduped Dataset.
    ``domain`` enables the dedup exchange's prefix-strip transport
    optimization (see stages.dedup.dedup_triples)."""
    import glob

    import ray.data

    from ..stages.dedup import dedup_triples

    paths = sorted(glob.glob(os.path.join(out_dir, "part-*[0-9]",
                                          "triples.parquet", "*.parquet")))
    ds = ray.data.read_parquet(paths)
    return dedup_triples(ds, domain=domain)
