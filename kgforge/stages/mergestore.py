"""Incremental sorted-run merge for the partitioned KG runner.

The full-merge path (``scripts/run_webkg_job.py`` round 3) re-read and
re-sorted the ENTIRE graph whenever anything changed — a one-partition
delta at 100 TB would re-shuffle 400M triples to refresh a handful of
output shards. This module replaces it with the LSM-style shape every
production table format uses:

1. **Sorted runs, one per input partition** (``merged/runs/run-XXXXX/``):
   the partition's triples in canonical term form, deduped, split into
   range buckets by a FROZEN boundary set and sorted within each
   bucket. A run is fingerprinted by its partition's parquet file
   stamps; an unchanged partition's run is never rebuilt — rebuilding
   runs is O(changed partitions).
2. **Frozen content-keyed boundaries** (``merged/boundaries.json``):
   computed once from the subject column via
   ``rangesort.content_boundaries`` (KMV distinct-key sketch — depends
   only on the distinct subject set, not sharding or duplicate
   multiplicity across partitions) and reused by every later
   merge, so a delta can never invalidate unrelated buckets by moving
   range edges.
3. **Bucket merges, one per range** (``merged/graph.nt/bucket-*.nt``,
   plus ``merged/triples.parquet/bucket-*.parquet`` when the optional
   parquet mirror is enabled): bucket ``b`` merges
   the ``b``-slices of all runs (each already sorted and tiny), with a
   per-bucket fingerprint over the runs' CONTENT hashes. A bucket
   whose inputs are content-identical is skipped without reading a
   byte — a delta touching k buckets re-merges exactly k buckets.

Duplicate elimination is globally exact without a global exchange:
identical triples share a subject, therefore a range bucket, so the
per-bucket sort+unique IS the global distinct. Bucket order + in-bucket
(s,p,o) order = global (s,p,o) order, so ``cat graph.nt/bucket-*.nt``
is the same sorted stream the full path produced.

Everything is atomic (tmp dir / tmp file + rename) and content-keyed,
so a crashed merge resumes cleanly and a no-op re-run touches only the
marker files.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from .rangesort import boundary_array, bucket_assign, content_boundaries

_SPO = ["s", "p", "o"]
_FORMAT = "mergestore-v1"


def _spo_schema() -> pa.Schema:
    return pa.schema([(c, pa.string()) for c in _SPO])


def _partitions(out_dir: str) -> list[tuple[str, str]]:
    """(partition name, triples.parquet dir) for completed partitions."""
    out = []
    for d in sorted(glob.glob(os.path.join(out_dir, "part-*[0-9]"))):
        tp = os.path.join(d, "triples.parquet")
        if os.path.isdir(tp):
            out.append((os.path.basename(d), tp))
    return out


def _file_stamp(files: list[str], rel_to: str) -> list:
    return [(os.path.relpath(f, rel_to), os.path.getsize(f),
             round(os.path.getmtime(f), 6)) for f in sorted(files)]


def _md5(obj) -> str:
    return hashlib.md5(json.dumps(obj, sort_keys=True).encode()).hexdigest()


def _canon(df):
    """polars frame -> canonical sorted distinct (s,p,o) frame."""
    return (df.sort(_SPO)
            .unique(subset=_SPO, keep="first", maintain_order=True))


def load_or_create_boundaries(out_dir: str,
                              num_buckets: int | None = None) -> list[str]:
    """The frozen range-boundary set for this merge store. First call
    samples the subject column of every completed partition
    (column-pruned read, content-keyed); later calls load the frozen
    file — a partition delta never moves range edges."""
    path = os.path.join(out_dir, "merged", "boundaries.json")
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            return json.load(f)["boundaries"]
    if num_buckets is None:
        from .dedup import default_num_buckets
        num_buckets = default_num_buckets()
    files = []
    for _, tp in _partitions(out_dir):
        files.extend(sorted(glob.glob(os.path.join(tp, "*.parquet"))))
    if files:
        ds = ray.data.read_parquet(files, columns=["s"])
        bnds = content_boundaries(ds, "s", num_buckets)
    else:
        bnds = []
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"format": _FORMAT, "num_buckets": num_buckets,
                   "boundaries": bnds}, f)
    os.replace(tmp, path)
    return bnds


def _build_runs(runs_root: str, to_build: list[tuple[str, str, str]],
                bnds: list[str]) -> dict[str, dict]:
    """Rebuild MANY sorted runs in ONE Ray pipeline. Per-partition
    pipelines pay the fixed DAG/shuffle spin-up once per partition
    (measured: 8 × ~7 s at 320k docs), and chaining ``Dataset.union``
    instead builds a left-deep DAG Ray executes branch-by-branch
    (measured 63 s for the same work). So: ONE ``read_parquet`` over
    every changed partition's files with ``include_paths=True``, a
    vectorized path→run lookup, and a single int-keyed bucket shuffle
    (key = run_idx × n_buckets + bucket) whose groups write each
    (run, bucket) sorted slice directly — 8.5 s for the same input.
    Work still scales with the CHANGED partitions only.

    ``to_build``: (run_name, partition parquet dir, fingerprint).
    Returns {run_name: marker dict}; each run dir is built in a .tmp
    and atomically renamed, so a crash mid-build never leaves a
    half-run with a valid marker."""
    bnds_arr = boundary_array(bnds) if bnds else np.array([], dtype="U1")
    n_buckets = len(bnds) + 1
    target = _spo_schema()

    from .triples import triples_to_terms

    tmps: dict[int, str] = {}
    markers: dict[str, dict] = {}
    all_files: list[str] = []
    file2run: dict[str, int] = {}
    for idx, (run_name, parquet_dir, fp) in enumerate(to_build):
        tmp = os.path.join(runs_root, run_name) + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        tmps[idx] = tmp
        markers[run_name] = {"format": _FORMAT, "fingerprint": fp,
                             "buckets": {}}
        files = sorted(glob.glob(os.path.join(parquet_dir, "*.parquet")))
        file2run.update({f: idx for f in files})
        all_files.extend(files)

    if all_files:

        def to_bucketed_terms(b: pa.Table) -> pa.Table:
            import polars as pl
            # vectorized path -> run index (batches can span files)
            upaths, inv = np.unique(
                np.asarray(b["path"].to_pylist()), return_inverse=True)
            lut = np.array([file2run[p] for p in upaths], dtype=np.int32)
            t = triples_to_terms(b.drop_columns(["path"]))
            t = t.append_column("_run", pa.array(lut[inv]))
            # per-batch combiner: drop local duplicates before the
            # bucket exchange (canonical distinct happens per bucket);
            # _run in the key — a triple present in two partitions
            # must stay in BOTH runs
            t = (pl.from_arrow(t)
                 .unique(subset=_SPO + ["_run"], keep="first",
                         maintain_order=True).to_arrow())
            run = t["_run"].combine_chunks().cast(pa.int32())
            t = bucket_assign(t.select(_SPO).cast(target), "s",
                              bnds_arr, col="_key")
            key = pc.add(t["_key"].combine_chunks(),
                         pc.multiply(run, pa.scalar(n_buckets,
                                                    pa.int32())))
            return t.set_column(t.schema.get_field_index("_key"),
                                "_key", key)

        ds = (ray.data.read_parquet(all_files, include_paths=True)
              .map_batches(to_bucketed_terms, batch_format="pyarrow"))

        def write_bucket(g: pa.Table) -> pa.Table:
            import polars as pl
            key = g["_key"][0].as_py()
            run_idx, bucket = divmod(key, n_buckets)
            df = _canon(pl.from_arrow(g.select(_SPO)))
            tbl = df.to_arrow().cast(target)
            pq.write_table(tbl, os.path.join(
                tmps[run_idx], f"bucket-{bucket:06d}.parquet"))
            digest = hashlib.md5(df.write_csv().encode()).hexdigest()
            return pa.table({
                "run_idx": pa.array([run_idx], type=pa.int32()),
                "bucket": pa.array([bucket], type=pa.int32()),
                "rows": pa.array([tbl.num_rows], type=pa.int64()),
                "md5": pa.array([digest], type=pa.string())})

        stats = (ds.groupby("_key")
                 .map_groups(write_bucket, batch_format="pyarrow"))
        for b in stats.iter_batches(batch_format="pyarrow"):
            for ri, bk, rows, digest in zip(b["run_idx"].to_pylist(),
                                            b["bucket"].to_pylist(),
                                            b["rows"].to_pylist(),
                                            b["md5"].to_pylist()):
                run_name = to_build[ri][0]
                markers[run_name]["buckets"][str(bk)] = {
                    "rows": rows, "md5": digest}

    for idx, (run_name, _, _) in enumerate(to_build):
        tmp = tmps[idx]
        with open(os.path.join(tmp, "run.json"), "w",
                  encoding="utf-8") as f:
            json.dump(markers[run_name], f)
        run_dir = os.path.join(runs_root, run_name)
        shutil.rmtree(run_dir, ignore_errors=True)
        os.replace(tmp, run_dir)
    return markers


def _load_run_marker(run_dir: str) -> dict | None:
    path = os.path.join(run_dir, "run.json")
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        m = json.load(f)
    return m if m.get("format") == _FORMAT else None


def _merge_bucket(row: dict) -> dict:
    """Merge one range bucket: concat the runs' sorted slices, canonical
    sort+unique, write .nt shard (+ optional parquet mirror)
    atomically."""
    import polars as pl
    import pyarrow.compute as pc
    bucket, paths = row["bucket"], list(row["paths"])
    tbl = pa.concat_tables([pq.read_table(p) for p in paths])
    df = _canon(pl.from_arrow(tbl))
    out = df.to_arrow().cast(_spo_schema())
    nt_path = os.path.join(row["nt_dir"], f"bucket-{bucket:06d}.nt")
    lines = pc.binary_join_element_wise(
        "<", out["s"].combine_chunks(), "> <", out["p"].combine_chunks(),
        "> ", out["o"].combine_chunks(), " .\n", "")
    body = "".join(lines.to_pylist())
    tmp = nt_path + ".tmp"
    with open(tmp, "w", encoding="utf-8", newline="") as f:
        f.write(body)
    os.replace(tmp, nt_path)
    if row.get("pq_dir"):
        pq_path = os.path.join(row["pq_dir"],
                               f"bucket-{bucket:06d}.parquet")
        tmp = pq_path + ".tmp"
        pq.write_table(out, tmp)
        os.replace(tmp, pq_path)
    return {"bucket": bucket, "rows": out.num_rows, "fp": row["fp"]}


def incremental_merge(out_dir: str,
                      num_buckets: int | None = None,
                      parquet_mirror: bool = False) -> dict:
    """Merge the runner's completed partitions into the sorted deduped
    graph at ``out_dir/merged`` incrementally. Work scales with the
    DELTA: unchanged partitions reuse their sorted runs (file-stamp
    fingerprint), unchanged range buckets keep their output shards
    (content fingerprint over the runs' bucket hashes). Returns merge
    stats (runs rebuilt/reused, buckets merged/skipped, triples_out).

    ``parquet_mirror=True`` additionally writes each merged bucket as
    ``merged/triples.parquet/bucket-*.parquet`` (a queryable columnar
    copy of the graph) — off by default since it doubles the merge's
    write volume and the runner's contract is the .nt graph."""
    merged = os.path.join(out_dir, "merged")
    runs_root = os.path.join(merged, "runs")
    nt_dir = os.path.join(merged, "graph.nt")
    pq_dir = os.path.join(merged, "triples.parquet")
    dirs = [runs_root, nt_dir] + ([pq_dir] if parquet_mirror else [])
    for d in dirs:
        os.makedirs(d, exist_ok=True)

    bnds = load_or_create_boundaries(out_dir, num_buckets)
    bnds_key = _md5(bnds)

    # ---- stage 1: sorted runs (O(changed partitions), one pipeline)
    stats = {"runs_rebuilt": 0, "runs_reused": 0}
    markers: dict[str, dict] = {}
    wanted_runs = set()
    to_build: list[tuple[str, str, str]] = []
    for part, tp in _partitions(out_dir):
        run_name = part.replace("part-", "run-")
        wanted_runs.add(run_name)
        run_dir = os.path.join(runs_root, run_name)
        files = sorted(glob.glob(os.path.join(tp, "*.parquet")))
        fp = _md5({"files": _file_stamp(files, out_dir),
                   "boundaries": bnds_key, "format": _FORMAT})
        m = _load_run_marker(run_dir)
        if m is not None and m["fingerprint"] == fp:
            stats["runs_reused"] += 1
            markers[run_name] = m
        else:
            to_build.append((run_name, tp, fp))
    if to_build:
        markers.update(_build_runs(runs_root, to_build, bnds))
        stats["runs_rebuilt"] = len(to_build)
    # drop runs whose partition vanished
    for d in glob.glob(os.path.join(runs_root, "run-*")):
        if os.path.basename(d).split(".")[0] not in wanted_runs:
            shutil.rmtree(d, ignore_errors=True)

    # ---- stage 2: bucket merges (O(changed buckets))
    per_bucket: dict[int, list[tuple[str, str]]] = {}
    for run_name in sorted(markers):
        for bk, info in markers[run_name]["buckets"].items():
            per_bucket.setdefault(int(bk), []).append((run_name,
                                                       info["md5"]))
    meta_path = os.path.join(merged, "buckets.json")
    old_meta = {}
    if os.path.exists(meta_path):
        with open(meta_path, encoding="utf-8") as f:
            old_meta = json.load(f)

    todo, new_meta = [], {}
    for bk in sorted(per_bucket):
        fp = _md5(per_bucket[bk])
        nt = os.path.join(nt_dir, f"bucket-{bk:06d}.nt")
        pqf = os.path.join(pq_dir, f"bucket-{bk:06d}.parquet")
        prev = old_meta.get(str(bk))
        if (prev and prev["fp"] == fp and os.path.exists(nt)
                and (not parquet_mirror or os.path.exists(pqf))):
            new_meta[str(bk)] = prev
            continue
        todo.append({
            "bucket": bk, "fp": fp, "nt_dir": nt_dir,
            "pq_dir": pq_dir if parquet_mirror else "",
            "paths": [os.path.join(runs_root, rn, f"bucket-{bk:06d}.parquet")
                      for rn, _ in per_bucket[bk]]})
    if todo:
        # one Ray task per changed bucket (this is a task LIST — a few
        # hundred coordination rows — not a per-record hot path).
        # override_num_blocks: from_items defaults to a handful of
        # blocks, which would run the bucket merges nearly serially
        for r in (ray.data.from_items(todo,
                                      override_num_blocks=len(todo))
                  .map(_merge_bucket).iter_rows()):
            new_meta[str(r["bucket"])] = {"fp": r["fp"], "rows": r["rows"]}

    # stale shards: buckets that no longer exist, or files from an old
    # full-merge layout (part-*.nt) — remove so cat(graph.nt/*) is
    # exactly the current graph
    keep_nt = {f"bucket-{bk:06d}.nt" for bk in per_bucket}
    keep_pq = {f"bucket-{bk:06d}.parquet" for bk in per_bucket}
    for f in glob.glob(os.path.join(nt_dir, "*")):
        if os.path.basename(f) not in keep_nt:
            os.remove(f)
    if parquet_mirror:
        for f in glob.glob(os.path.join(pq_dir, "*")):
            if os.path.basename(f) not in keep_pq:
                os.remove(f)
    else:
        shutil.rmtree(pq_dir, ignore_errors=True)

    tmp = meta_path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(new_meta, f)
    os.replace(tmp, meta_path)
    stats["buckets_merged"] = len(todo)
    stats["buckets_skipped"] = len(per_bucket) - len(todo)
    stats["triples_out"] = sum(v["rows"] for v in new_meta.values())
    return stats
