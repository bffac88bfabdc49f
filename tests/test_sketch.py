"""Mergeable sketches (ops/sketch.py): KMV distinct-count vs the
independent scalar reference and vs exact, two-pass heavy hitters vs
DuckDB + the exactness certificate."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    return con


def test_splitmix64_vectorized_matches_scalar():
    from kgforge.ops.sketch import splitmix64
    from kgforge.scalar_ref import _splitmix64_scalar

    vals = np.array([0, 1, 7919, 2**31, 2**63 - 1, 2**64 - 1],
                    dtype=np.uint64)
    got = splitmix64(vals)
    want = [_splitmix64_scalar(int(v)) for v in vals]
    assert got.tolist() == want


def test_kmv_exact_below_k(ray_session):
    """With fewer than k distinct values the sketch IS the value set —
    the estimate must be exactly the distinct count."""
    import ray
    from kgforge.ops.sketch import kmv_distinct_count

    t = pa.table({"k": pa.array(["a"] * 300 + ["b"] * 60),
                  "v": pa.array([i % 30 for i in range(300)] +
                                [i % 7 for i in range(60)],
                                type=pa.int64())})
    ds = ray.data.from_arrow(t).repartition(5)
    out = kmv_distinct_count(ds, "k", "v", k=256, out_col="n")
    got = {r["k"]: r["n"] for r in out.take_all()}
    assert got == {"a": 30, "b": 7}


def test_kmv_estimate_accuracy(ray_session):
    """k=64 over hundreds of distinct values: deterministic estimate,
    bounded relative error (std err ~ 1/sqrt(k-2) ~ 12.7%)."""
    import ray
    from kgforge.ops.sketch import kmv_distinct_count

    n = 2000
    t = pa.table({"k": pa.array(["hot"] * n),
                  "v": pa.array([(i * 13) % 977 for i in range(n)],
                                type=pa.int64())})
    ds = ray.data.from_arrow(t).repartition(4)
    out = kmv_distinct_count(ds, "k", "v", k=64, out_col="n")
    est = out.take_all()[0]["n"]
    assert abs(est - 977) / 977 < 0.35, est


def test_kmv_gate_matches_scalar_reference(ray_session):
    from kgforge.ops.sketch import entity_doc_frequency_kmv
    from kgforge.scalar_ref import kmv_doc_frequency_oracle_sql

    con = _con()
    df = entity_doc_frequency_kmv(SF).to_pandas()
    odf = con.sql(kmv_doc_frequency_oracle_sql()).df()
    got = dict(zip(df["mention"], df["doc_freq_est"].astype(int)))
    want = dict(zip(odf["mention"], odf["doc_freq_est"].astype(int)))
    assert got == want


def test_heavy_hitters_vs_sql(ray_session):
    from kgforge.ops.sketch import (token_heavy_hitters,
                                    token_heavy_hitters_sql)

    con = _con()
    hh = token_heavy_hitters(SF)
    odf = con.sql(token_heavy_hitters_sql()).df()
    got = list(zip(hh["value"].to_pylist(), hh["count"].to_pylist()))
    want = list(zip(odf["value"], odf["count"].astype(int)))
    assert got == want


def test_heavy_hitters_certificate(ray_session):
    """A summary too small to certify must raise (and count the event);
    best_effort returns the uncertified result instead."""
    import ray
    from kgforge.ops.sketch import ExactnessError, heavy_hitters
    from kgforge.state import counters

    # 400 distinct near-uniform values per block: m=2 keeps 2, drops a
    # large bound per block -> kth count < global_err
    vals = [f"v{i % 400:03d}" for i in range(4000)]
    ds = ray.data.from_arrow(pa.table({"c": vals})).repartition(8)
    with pytest.raises(ExactnessError):
        heavy_hitters(ds, "c", k=5, summary_size=2)
    snap = counters.snapshot()
    assert snap.get("heavy_hitters.uncertified_topk", 0) >= 1

    t = heavy_hitters(ds, "c", k=5, summary_size=2, best_effort=True)
    assert len(t) == 5  # returns, just uncertified


def test_heavy_hitters_exact_with_planted_skew(ray_session):
    """Zipf-ish stream with two dominant values: the two-pass result is
    exactly the true top-k (compare to a plain Python count)."""
    import collections

    import ray
    from kgforge.ops.sketch import heavy_hitters

    vals = (["alpha"] * 3000 + ["beta"] * 1500 +
            [f"tail{i % 97:02d}" for i in range(2500)])
    # deterministic interleave so blocks are mixed
    order = sorted(range(len(vals)), key=lambda i: (i * 7919) % 7000)
    vals = [vals[i] for i in order]
    ds = ray.data.from_arrow(pa.table({"c": vals})).repartition(7)
    t = heavy_hitters(ds, "c", k=4, summary_size=64)
    got = list(zip(t["value"].to_pylist(), t["count"].to_pylist()))
    cnt = collections.Counter(vals)
    want = sorted(cnt.items(), key=lambda p: (-p[1], p[0]))[:4]
    assert got == want
