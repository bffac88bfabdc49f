"""Salted two-phase groupby-aggregate (ops/skew.py): exactness vs a
naive single-process reference, hot-key spread across reduce buckets,
cross-block duplicate-pair semantics, and the doc-frequency gate vs
DuckDB."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _skewed_pairs(n_hot=5000, n_cold_keys=20, rows_per_cold=40,
                  hot_distinct=1200):
    """Deterministic (key, value) pairs: one hot key owning ~86% of the
    rows, with value repeats (so local/global dedup both matter)."""
    keys, vals = [], []
    for i in range(n_hot):
        keys.append("hot")
        vals.append(int((i * 7919) % hot_distinct))  # repeats: 5000 draws
    for k in range(n_cold_keys):
        for i in range(rows_per_cold):
            keys.append(f"cold{k:02d}")
            vals.append(int((i * 31 + k) % 25))
    return pa.table({"k": pa.array(keys, type=pa.string()),
                     "v": pa.array(vals, type=pa.int64())})


def _naive_distinct_count(t: pa.Table) -> dict[str, int]:
    df = t.to_pandas()
    return df.groupby("k")["v"].nunique().to_dict()


@pytest.mark.parametrize("salt_buckets", [1, 4, 64])
def test_salted_distinct_count_matches_naive(ray_session, salt_buckets):
    import ray
    from kgforge.ops.skew import salted_distinct_count

    t = _skewed_pairs()
    ds = ray.data.from_arrow(t).repartition(6)
    out = salted_distinct_count(ds, "k", "v", salt_buckets=salt_buckets,
                                num_buckets=8, out_col="n")
    got = {r["k"]: r["n"] for r in out.take_all()}
    assert got == _naive_distinct_count(t)
    # exact distinct count of the hot key: 5000 draws of (i*7919) % 1200
    # with gcd(7919,1200)=1 cover all 1200 residues
    assert got["hot"] == 1200


def test_hot_key_spreads_across_buckets():
    """The whole point of the salt: one hot key's pairs must NOT land in
    a single reduce bucket. Check the phase-0 bucket assignment directly
    (no Ray needed)."""
    from kgforge.ops.skew import _pair_cells

    t = _skewed_pairs()
    cells = _pair_cells(t, "k", "v", salt_buckets=64, num_buckets=64)
    hot = cells.filter(pa.compute.equal(cells["k"], "hot"))
    buckets = np.unique(hot["_bucket"].to_numpy())
    # 64 salt cells over 64 buckets: the hot key should occupy a large
    # fraction of all reducers (coupon-collector over 1200 values)
    assert len(buckets) >= 32, len(buckets)

    # sanity: with salt_buckets=1 the hot key degenerates to ONE bucket
    # (that is what a plain groupby(key) does — the failure mode)
    cells1 = _pair_cells(t, "k", "v", salt_buckets=1, num_buckets=64)
    hot1 = cells1.filter(pa.compute.equal(cells1["k"], "hot"))
    assert len(np.unique(hot1["_bucket"].to_numpy())) == 1


def test_same_pair_same_bucket_across_blocks():
    """Determinism invariant the exactness proof rests on: a (key,
    value) pair hashes to the same bucket no matter which block it
    arrives in."""
    from kgforge.ops.skew import _pair_cells

    t = _skewed_pairs()
    a = _pair_cells(t.slice(0, 3000), "k", "v", 64, 64)
    b = _pair_cells(t.slice(1000), "k", "v", 64, 64)

    def as_map(c):
        return {(k, v): bk for k, v, bk in
                zip(c["k"].to_pylist(), c["v"].to_pylist(),
                    c["_bucket"].to_pylist())}
    ma, mb = as_map(a), as_map(b)
    shared = set(ma) & set(mb)
    assert shared  # overlapping slices share pairs
    assert all(ma[p] == mb[p] for p in shared)


def test_cross_block_duplicate_pairs_counted_once(ray_session):
    import ray
    from kgforge.ops.skew import salted_distinct_count

    # the SAME 30 (key, value) pairs replicated into 12 blocks
    base = pa.table({"k": pa.array(["a"] * 20 + ["b"] * 10),
                     "v": pa.array(list(range(20)) + list(range(10)),
                                   type=pa.int64())})
    reps = pa.concat_tables([base] * 12)
    ds = ray.data.from_arrow(reps).repartition(12)
    out = salted_distinct_count(ds, "k", "v", salt_buckets=8,
                                num_buckets=8, out_col="n")
    got = {r["k"]: r["n"] for r in out.take_all()}
    assert got == {"a": 20, "b": 10}


def test_entity_doc_frequency_vs_duckdb(ray_session):
    from kgforge.ops.skew import entity_doc_frequency, entity_doc_frequency_sql

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    df = entity_doc_frequency(SF).to_pandas()
    odf = con.sql(entity_doc_frequency_sql()).df()
    got = dict(zip(df["mention"], df["doc_freq"].astype(int)))
    want = dict(zip(odf["mention"], odf["doc_freq"].astype(int)))
    assert got == want
    # the synthetic corpus really is hot: every lexicon entity appears
    # in a large share of all documents (this is the skew being tested)
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert max(want.values()) > 0.5 * n_docs
