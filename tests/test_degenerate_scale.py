"""Degenerate-mass bounds (VERDICT r2 item 1): a planted cluster of
10k IDENTICAL documents/embeddings — the Common-Crawl boilerplate case
— must finish in bounded time/memory instead of emitting ~5e7 pairs
per LSH bucket. The exact-dedup pre-pass collapses identical texts to
one rep before banding; capped runs degrade to star edges (min-id ->
member), which keeps every member connected to its component."""

import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

N_DUP = 10_000
DISTINCT = ["alpha beta gamma delta epsilon zeta",
            "one two three four five six seven",
            "lorem ipsum dolor sit amet consectetur"]


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("planted")
    texts = ["the same boilerplate page text repeated everywhere"] * N_DUP \
        + DISTINCT
    ids = list(range(len(texts)))
    pq.write_table(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                             "text": pa.array(texts, type=pa.string())}),
                   str(d / "documents.parquet"))
    dim = 8
    vec = np.arange(1, dim + 1, dtype=np.float64)
    embs = [vec.tolist()] * N_DUP + \
        [(vec + i + 1).tolist() for i in range(len(DISTINCT))]
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array(embs, type=pa.list_(pa.float64()))}),
        str(d / "embeddings.parquet"))
    return str(d)


def test_minhash_planted_identical_cluster_bounded(ray_session, planted_dir):
    from kgforge.ops.dedup import minhash_dedup
    from kgforge.state import counters
    counters.reset()
    t0 = time.monotonic()
    out = minhash_dedup(planted_dir).to_pandas()
    elapsed = time.monotonic() - t0
    assert elapsed < 120, f"degenerate cluster took {elapsed:.0f}s"
    # star representation: every member connected to the min-id rep,
    # NOT the quadratic ~5e7 all-pairs set
    assert len(out) < 5 * N_DUP
    in_cluster = out[(out.a < N_DUP) & (out.b < N_DUP)]
    members = set(in_cluster["a"]) | set(in_cluster["b"])
    assert members == set(range(N_DUP))
    assert (in_cluster["jaccard_pct"] == 100).all()
    # the degradation is visible in lineage counters, not just stderr
    assert counters.snapshot().get("minhash.exact_groups_star_capped",
                                   0) >= 1


def test_simhash_planted_identical_cluster_bounded(ray_session, planted_dir):
    from kgforge.ops.dedup import simhash_dedup
    t0 = time.monotonic()
    out = simhash_dedup(planted_dir).to_pandas()
    elapsed = time.monotonic() - t0
    assert elapsed < 120, f"degenerate cluster took {elapsed:.0f}s"
    assert len(out) < 5 * N_DUP
    in_cluster = out[(out.a < N_DUP) & (out.b < N_DUP)]
    members = set(in_cluster["a"]) | set(in_cluster["b"])
    assert members == set(range(N_DUP))
    assert (in_cluster["hamming"] == 0).all()


def test_embedding_planted_identical_bucket_bounded(ray_session,
                                                    planted_dir):
    from kgforge.ops.ann import embedding_dup_pairs
    from kgforge.state import counters
    counters.reset()
    t0 = time.monotonic()
    out = embedding_dup_pairs(planted_dir, threshold=0.98).to_pandas()
    elapsed = time.monotonic() - t0
    assert elapsed < 120, f"degenerate bucket took {elapsed:.0f}s"
    assert len(out) < 5 * N_DUP
    in_cluster = out[(out.a < N_DUP) & (out.b < N_DUP)]
    members = set(in_cluster["a"]) | set(in_cluster["b"])
    assert members == set(range(N_DUP))
    assert (in_cluster["sim4"] >= 0.98).all()
    snap = counters.snapshot()
    assert snap.get("embdup.buckets_star_capped", 0) >= 1
    assert snap.get("embdup.bucket_rows_star_capped", 0) >= N_DUP


def test_pair_run_cap_star_fallback(ray_session):
    """dup_key_pairs over-cap runs emit exactly the star edge set."""
    import ray

    from kgforge.ops.dedup import dup_key_pairs
    n = 50
    tbl = pa.table({"key": pa.array(["k"] * n + ["solo"]),
                    "doc_id": pa.array(list(range(n + 1)),
                                       type=pa.int64())})
    ds = ray.data.from_arrow(tbl)
    import os

    from kgforge.state import counters
    counters.reset()
    os.environ["KGFORGE_PAIR_RUN_CAP"] = "10"
    try:
        out = dup_key_pairs(ds, ["key"], "doc_id").to_pandas()
    finally:
        del os.environ["KGFORGE_PAIR_RUN_CAP"]
    pairs = set(zip(out["a"], out["b"]))
    assert pairs == {(0, i) for i in range(1, n)}
    snap = counters.snapshot()
    assert snap.get("dedup.pair_runs_star_capped", 0) == 1
    # exactly the all-pairs edges the star fallback suppressed
    assert snap.get("dedup.pair_edges_suppressed", 0) == \
        n * (n - 1) // 2 - (n - 1)
    # under the cap: full all-pairs set
    out2 = dup_key_pairs(ds, ["key"], "doc_id").to_pandas()
    assert len(out2) == n * (n - 1) // 2


def test_distinct_prefilter_matches_plain(ray_session):
    """Hash-prefilter distinct == sort-path distinct, incl. cross-block
    duplicates, the zero-dup shortcut, and the forced fallback."""
    import os

    import ray

    from kgforge.stages.dedup import distinct, distinct_prefilter
    # period lcm(300, 6) = 300 -> 300 distinct pairs, each duplicated
    # ~7x across the 8 blocks
    rows = [(f"s{i % 300}", f"p{i % 6}") for i in range(2000)]
    tbl = pa.table({"a": pa.array([r[0] for r in rows]),
                    "b": pa.array([r[1] for r in rows])})
    ds = ray.data.from_arrow(tbl).repartition(8)
    want = sorted(map(tuple, distinct(ds, ["a", "b"]).to_pandas()
                      .itertuples(index=False)))
    got = sorted(map(tuple, distinct_prefilter(ds, ["a", "b"]).to_pandas()
                     .itertuples(index=False)))
    assert got == want and len(want) == 300
    # forced fallback (dup-hash set over the limit -> sort path)
    os.environ["KGFORGE_BROADCAST_LIMIT"] = "0"
    try:
        got_fb = sorted(map(tuple, distinct_prefilter(ds, ["a", "b"])
                            .to_pandas().itertuples(index=False)))
    finally:
        del os.environ["KGFORGE_BROADCAST_LIMIT"]
    assert got_fb == want
    # all-unique input: no dup hashes, no shuffle at all
    uniq = pa.table({"a": pa.array([f"u{i}" for i in range(500)]),
                     "b": pa.array(["x"] * 500)})
    ds2 = ray.data.from_arrow(uniq).repartition(4)
    got2 = distinct_prefilter(ds2, ["a", "b"]).to_pandas()
    assert len(got2) == 500


def test_exchange_payload_report(ray_session):
    """The payload-bytes comparison behind the prefilter's multi-node
    claim: on a low-dup stream the hash-only exchange must be a small
    fraction of the full-row exchange, and the dup accounting must
    match the known duplicate structure."""
    import ray

    from kgforge.stages.dedup import exchange_payload_report
    # 8 blocks; 300 distinct pairs duplicated ~7x ACROSS blocks, plus
    # 2000 globally-unique wide rows that never re-shuffle
    rows = [(f"s{i % 300}", f"p{i % 6}") for i in range(2000)]
    rows += [(f"uniq-{i}-" + "x" * 64, f"q{i}") for i in range(2000)]
    tbl = pa.table({"a": pa.array([r[0] for r in rows]),
                    "b": pa.array([r[1] for r in rows])})
    ds = ray.data.from_arrow(tbl).repartition(8)
    rep = exchange_payload_report(ds, ["a", "b"], num_buckets=16)
    # local distinct: 300 dup keys survive once per block they touch
    # (> 300, < 2400) + 2000 unique rows
    assert 2300 <= rep["rows_local_distinct"] <= 4400
    # every duplicated row is detected; no unique row is
    assert 600 <= rep["dup_hash_rows"] <= 2400
    assert rep["prefilter_exchange_mib"] < rep["plain_exchange_mib"]
    assert rep["exchange_savings_pct"] > 40
