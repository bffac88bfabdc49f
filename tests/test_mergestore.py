"""Incremental sorted-run merge (stages/mergestore.py): output parity
with the full merge path, no-op resume, O(delta) one-partition deltas,
frozen boundaries, and byte-identical shards across partition layouts."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
NB = 8


def _nt_lines(merged_dir):
    out = []
    for f in sorted(glob.glob(os.path.join(merged_dir, "graph.nt", "*"))):
        with open(f, encoding="utf-8") as fh:
            out.extend(fh.read().splitlines())
    return out


def _full_merge_lines(out, tmp_path, tag):
    from kgforge.pipelines.webkg import DOMAIN
    from kgforge.sinks.ntriples_sink import read_graph_lines, write_graph
    from kgforge.state.manifest import merged_triples
    dest = str(tmp_path / f"full-{tag}")
    write_graph(merged_triples(out, domain=DOMAIN), dest)
    return read_graph_lines(dest)


def test_incremental_merge_scenario(ray_session, tmp_path):
    from kgforge.stages.mergestore import incremental_merge
    from kgforge.state.manifest import partitioned_kg_run

    out = str(tmp_path / "job")
    partitioned_kg_run(SF, out, num_partitions=3)

    # ---- initial merge equals the full-sort path, line for line
    # (parquet_mirror on: this test also covers the columnar copy)
    s1 = incremental_merge(out, num_buckets=NB, parquet_mirror=True)
    assert s1["runs_rebuilt"] == 3 and s1["buckets_merged"] > 0
    inc = _nt_lines(os.path.join(out, "merged"))
    assert inc == _full_merge_lines(out, tmp_path, "initial")
    assert s1["triples_out"] == len(inc)
    mirror = sorted(glob.glob(os.path.join(
        out, "merged", "triples.parquet", "*.parquet")))
    assert sum(pq.read_metadata(f).num_rows for f in mirror) == len(inc)

    # ---- unchanged re-run is a marker-only no-op
    s2 = incremental_merge(out, num_buckets=NB, parquet_mirror=True)
    assert s2["runs_rebuilt"] == 0 and s2["buckets_merged"] == 0
    assert s2["runs_reused"] == 3
    assert s2["buckets_skipped"] == s1["buckets_merged"] + s1["buckets_skipped"]
    assert _nt_lines(os.path.join(out, "merged")) == inc

    # ---- one-partition delta: edit ONE row of ONE partition
    bounds_before = open(os.path.join(out, "merged", "boundaries.json"),
                         encoding="utf-8").read()
    part_files = sorted(glob.glob(os.path.join(
        out, "part-00001", "triples.parquet", "*.parquet")))
    tbl = pq.read_table(part_files[0])
    lex = tbl["o_lex"].to_pylist()
    kind = tbl["o_kind"].to_pylist()
    edit = next(i for i, k in enumerate(kind) if k == "l")
    lex[edit] = "mergestore delta literal"
    tbl = tbl.set_column(tbl.schema.get_field_index("o_lex"), "o_lex",
                         pa.array(lex, type=tbl.schema.field("o_lex").type))
    pq.write_table(tbl, part_files[0])

    s3 = incremental_merge(out, num_buckets=NB, parquet_mirror=True)
    total_buckets = s3["buckets_merged"] + s3["buckets_skipped"]
    # O(delta): only the edited partition's run rebuilds, and only the
    # bucket(s) holding the edited subject re-merge
    assert s3["runs_rebuilt"] == 1 and s3["runs_reused"] == 2
    assert 1 <= s3["buckets_merged"] <= 2
    assert s3["buckets_skipped"] >= total_buckets - 2
    # boundaries are frozen — a delta never moves range edges
    assert open(os.path.join(out, "merged", "boundaries.json"),
                encoding="utf-8").read() == bounds_before
    # and the result still equals a from-scratch full merge
    got = _nt_lines(os.path.join(out, "merged"))
    assert got == _full_merge_lines(out, tmp_path, "delta")
    assert any("mergestore delta literal" in ln for ln in got)


def test_shards_byte_identical_across_partition_layouts(ray_session,
                                                        tmp_path):
    """The same corpus run with DIFFERENT partition counts must produce
    byte-identical merged shards: content-keyed boundaries + canonical
    per-bucket content make the output independent of layout."""
    from kgforge.stages.mergestore import incremental_merge
    from kgforge.state.manifest import partitioned_kg_run

    outs = []
    for nparts in (2, 5):
        out = str(tmp_path / f"job-{nparts}")
        partitioned_kg_run(SF, out, num_partitions=nparts)
        incremental_merge(out, num_buckets=NB)
        outs.append(out)
    a = sorted(glob.glob(os.path.join(outs[0], "merged", "graph.nt", "*")))
    b = sorted(glob.glob(os.path.join(outs[1], "merged", "graph.nt", "*")))
    assert [os.path.basename(f) for f in a] == [os.path.basename(f)
                                                for f in b]
    assert len(a) > 1
    for fa, fb in zip(a, b):
        assert open(fa, "rb").read() == open(fb, "rb").read(), fa


def test_empty_store_merge(ray_session, tmp_path):
    from kgforge.stages.mergestore import incremental_merge
    out = str(tmp_path / "empty")
    os.makedirs(out)
    s = incremental_merge(out, num_buckets=NB)
    assert s["triples_out"] == 0 and s["buckets_merged"] == 0
