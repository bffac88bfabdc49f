"""Differential fuzz for the session-2 operators: random small inputs
through BOTH the Ray op and a DuckDB query of the same semantics.
Mirrors the dialect-fuzz strategy (tests/test_fuzz_dialects.py): the
hypothesis examples are deterministic (derandomize) so CI is stable."""

import duckdb
import pyarrow as pa
from hypothesis import given, settings, strategies as st

KEYS = st.sampled_from(["a", "b", "c", "hot"])
SETTINGS = dict(max_examples=12, deadline=None, derandomize=True,
                database=None)


def _ray():
    import ray
    return ray


@settings(**SETTINGS)
@given(st.lists(st.tuples(KEYS, st.integers(0, 300)), min_size=1,
                max_size=120))
def test_fuzz_grouped_quantiles(ray_session, rows):
    import ray
    from kgforge.ops.quantile import grouped_quantiles

    t = pa.table({"k": [r[0] for r in rows],
                  "v": pa.array([r[1] for r in rows], pa.int64())})
    con = duckdb.connect()
    con.register("t", t)
    want = sorted(map(tuple, con.execute("""
        SELECT k, CAST(COUNT(*) AS BIGINT),
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT),
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY v) AS BIGINT)
        FROM t GROUP BY k""").fetchall()))
    ds = ray.data.from_arrow(t).repartition(3)
    got = sorted((r["k"], r["n"], r["p50"], r["p90"]) for r in
                 grouped_quantiles(ds, "k", "v", pcts=(50, 90))
                 .take_all())
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 20), min_size=1, max_size=60),
       st.lists(st.integers(0, 20), max_size=30))
def test_fuzz_anti_join(ray_session, lk, rk):
    import ray
    from kgforge.ops.relational import hash_anti_join

    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "i": pa.array(range(len(lk)), pa.int64())})
    right = pa.table({"rk": pa.array(rk, pa.int64())})
    want = sorted((k, i) for i, k in enumerate(lk) if k not in set(rk))
    got = sorted((r["k"], r["i"]) for r in hash_anti_join(
        ray.data.from_arrow(left).repartition(2),
        ray.data.from_arrow(right).repartition(2), "k", "rk").take_all())
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.tuples(KEYS, st.sampled_from("uvwxyz")),
                min_size=1, max_size=100),
       st.integers(1, 4))
def test_fuzz_grouped_topk(ray_session, rows, k):
    import ray
    from kgforge.ops.relational import grouped_topk_counts

    t = pa.table({"g": [r[0] for r in rows],
                  "v": [r[1] for r in rows]})
    con = duckdb.connect()
    con.register("t", t)
    want = sorted(map(tuple, con.execute(f"""
        WITH c AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
                   FROM t GROUP BY g, v)
        SELECT g, v, cnt, CAST(rk AS BIGINT) FROM
          (SELECT *, row_number() OVER
             (PARTITION BY g ORDER BY cnt DESC, v ASC) AS rk FROM c)
        WHERE rk <= {k}""").fetchall()))
    got = sorted((r["g"], r["v"], r["cnt"], r["rank"]) for r in
                 grouped_topk_counts(
                     ray.data.from_arrow(t).repartition(3), "g", "v", k)
                 .take_all())
    assert got == want


@settings(**SETTINGS)
@given(st.lists(st.integers(0, 2**53), min_size=1, max_size=80))
def test_fuzz_hdr_buckets(vals):
    """Bucket ids: vectorized == scalar-ref spec; lower bound invariant
    lo <= v < lo*(1+2^-6)."""
    import math

    import numpy as np
    from kgforge.ops.quantile import hdr_bucket_ids, hdr_bucket_lo

    arr = np.array(vals, dtype=np.int64)
    ids = hdr_bucket_ids(arr).tolist()
    for v, b in zip(vals, ids):
        if v == 0:
            assert b == 0
            continue
        m, e = math.frexp(float(v))
        assert b == ((e + 1200) << 7) | int((m - 0.5) * (1 << 8))
        lo = hdr_bucket_lo(b)
        assert lo <= v <= lo * (1 + 2 ** -6)
