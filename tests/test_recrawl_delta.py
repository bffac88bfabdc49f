"""End-to-end re-crawl delta: rewriting ONE input shard re-extracts
exactly that partition (manifest input_stamp) and re-merges only its
run — the O(delta) corpus-refresh path the north rule's resumability
clause is about."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SRC = "/root/testdata/sf0.001/documents.parquet"
NB = 8
NPART = 3


def _nt_lines(merged_dir):
    out = []
    for f in sorted(glob.glob(os.path.join(merged_dir, "graph.nt", "*"))):
        with open(f, encoding="utf-8") as fh:
            out.extend(fh.read().splitlines())
    return out


@pytest.fixture()
def sharded_input(tmp_path):
    """documents.parquet as a DIRECTORY of 3 shards (what a real crawl
    delivery looks like), split by doc_id stripe."""
    tbl = pq.read_table(SRC)
    ddir = tmp_path / "in" / "documents.parquet"
    os.makedirs(ddir)
    n = tbl.num_rows
    for i in range(3):
        pq.write_table(tbl.slice(i * n // 3, (i + 1) * n // 3 - i * n // 3),
                       ddir / f"shard-{i}.parquet")
    return str(tmp_path / "in")


def test_recrawl_delta_o_delta(ray_session, sharded_input, tmp_path):
    from kgforge.stages.mergestore import incremental_merge
    from kgforge.state.manifest import Manifest, partitioned_kg_run

    out = str(tmp_path / "job")
    partitioned_kg_run(sharded_input, out, num_partitions=NPART)
    s1 = incremental_merge(out, num_buckets=NB)
    assert s1["runs_rebuilt"] == NPART
    before = _nt_lines(os.path.join(out, "merged"))

    # unchanged re-run: nothing re-extracts, merge is a no-op
    m = partitioned_kg_run(sharded_input, out, num_partitions=NPART)
    stamps1 = {p: r["input_stamp"] for p, r in m.records.items()}
    mtimes = {p: os.path.getmtime(os.path.join(out, f"part-{p:05d}"))
              for p in range(NPART)}
    m2 = partitioned_kg_run(sharded_input, out, num_partitions=NPART)
    assert {p: r["input_stamp"] for p, r in m2.records.items()} == stamps1
    for p in range(NPART):
        assert os.path.getmtime(
            os.path.join(out, f"part-{p:05d}")) == mtimes[p]
    s2 = incremental_merge(out, num_buckets=NB)
    assert s2["runs_rebuilt"] == 0 and s2["buckets_merged"] == 0

    # ---- re-crawl: ONE shard's content changes (one doc's text)
    shard = os.path.join(sharded_input, "documents.parquet",
                         "shard-1.parquet")
    tbl = pq.read_table(shard)
    texts = tbl["text"].to_pylist()
    texts[0] = "recrawl changed this document body"
    tbl = tbl.set_column(tbl.schema.get_field_index("text"), "text",
                         pa.array(texts, type=pa.string()))
    pq.write_table(tbl, shard)

    m3 = partitioned_kg_run(sharded_input, out, num_partitions=NPART)
    # exactly the edited shard's partition re-extracted
    changed = [p for p in range(NPART)
               if m3.records[p]["input_stamp"] != stamps1[p]]
    assert changed == [1]
    for p in range(NPART):
        rewritten = os.path.getmtime(
            os.path.join(out, f"part-{p:05d}")) != mtimes[p]
        assert rewritten == (p == 1)

    s3 = incremental_merge(out, num_buckets=NB)
    assert s3["runs_rebuilt"] == 1 and s3["runs_reused"] == NPART - 1
    assert s3["buckets_merged"] >= 1
    assert s3["buckets_skipped"] > 0

    after = _nt_lines(os.path.join(out, "merged"))
    assert after != before  # the changed doc's derived triples moved

    # the delta-merged graph equals a from-scratch run on the new input
    fresh = str(tmp_path / "fresh")
    partitioned_kg_run(sharded_input, fresh, num_partitions=NPART)
    incremental_merge(fresh, num_buckets=NB)
    assert _nt_lines(os.path.join(fresh, "merged")) == after


def test_manifest_resume_still_exact(ray_session, sharded_input, tmp_path):
    """Crash/resume semantics unchanged by the input_stamp addition."""
    from kgforge.state.manifest import partitioned_kg_run

    out = str(tmp_path / "job")
    with pytest.raises(RuntimeError, match="simulated crash"):
        partitioned_kg_run(sharded_input, out, num_partitions=NPART,
                           fail_after=1)
    m = partitioned_kg_run(sharded_input, out, num_partitions=NPART)
    assert set(m.records) == set(range(NPART))
    assert all("input_stamp" in r for r in m.records.values())
