"""KG-embedding training-data ops (ops/kgtrain.py): deterministic
filtered negative sampling — planted collisions, pool indexing,
broadcast==scale equality, oracle parity."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _edges(pairs):
    import ray.data
    return ray.data.from_arrow(pa.table({
        "src": pa.array([p[0] for p in pairs], pa.int64()),
        "dst": pa.array([p[1] for p in pairs], pa.int64())}))


def _rows(ds):
    return sorted(map(tuple, ds.to_pandas().itertuples(index=False)))


def test_negative_samples_deterministic_and_filtered(ray_session):
    from kgforge.ops.kgtrain import M1, M2, M3, _MOD, negative_samples
    pairs = [(0, 1), (0, 2), (1, 2)]
    got = _rows(negative_samples(_edges(pairs), k=2))
    # reproduce by hand: pool = sorted distinct dst = [1, 2]
    pool = np.array([1, 2], dtype=np.int64)
    want = []
    for h, t in pairs:
        for k in range(2):
            idx = ((h * M1 + t * M2 + k * M3) % _MOD) % len(pool)
            neg = int(pool[idx])
            if (h, neg) not in pairs:        # filtered, no retry
                want.append((h, t, neg, k))
    assert got == sorted(want)
    assert len(got) > 0
    # determinism: identical on re-run
    assert got == _rows(negative_samples(_edges(pairs), k=2))


def test_negative_samples_paths_equal(ray_session):
    from kgforge.ops.kgtrain import negative_samples
    pairs = [(i, (i * 3 + 1) % 7) for i in range(7)] + [(2, 5), (6, 1)]
    base = _rows(negative_samples(_edges(pairs), k=3))
    fj = _rows(negative_samples(_edges(pairs), k=3, force_join=True))
    assert fj == base and len(base) > 0


def test_gate_parity(ray_session):
    import hashlib

    from kgforge.ops.kgtrain import (kg_negative_samples,
                                     kg_negative_samples_sql)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = kg_negative_samples(SF).to_pandas()
    odf = con.sql(kg_negative_samples_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)
    # the filter really fired: fewer rows than raw candidates
    assert len(df) < 2 * 2 * 500 + 1


# --------------------------------------------------------- random walks

def test_random_walks_hand_case(ray_session):
    from kgforge.ops.kgtrain import M1, M2, M3, _MOD, random_walks
    # 0 -> {1, 2}; 1 -> {2}; 2 has no out-edges (dead end truncates)
    got = _rows(random_walks(_edges([(0, 1), (0, 2), (1, 2)]),
                             length=3, walks_per_node=1))
    # hand-walk: neighbors sorted; r = hash(node, w=0, step) % deg
    def nxt(node, step, neigh):
        return neigh[((node * M1 + 0 * M2 + step * M3) % _MOD)
                     % len(neigh)]
    n0 = nxt(0, 0, [1, 2])
    want = [(0, 0, 0, 0), (1, 0, 0, 1), (1, 0, 1, 2)]
    want.append((0, 0, 1, n0))
    if n0 == 1:
        want.append((0, 0, 2, 2))
    assert got == sorted(want)


def test_random_walks_paths_equal_and_deterministic(ray_session):
    from kgforge.ops.kgtrain import random_walks
    pairs = [(i, (i * 5 + 2) % 9) for i in range(9)] + [(3, 7), (8, 0)]
    base = _rows(random_walks(_edges(pairs), length=4, walks_per_node=2))
    assert base == _rows(random_walks(_edges(pairs), length=4,
                                      walks_per_node=2))
    assert base == _rows(random_walks(_edges(pairs), length=4,
                                      walks_per_node=2, force_join=True))
    # every walk starts at its start node
    assert all(r[3] == r[0] for r in base if r[2] == 0)


def test_random_walks_gate_parity(ray_session):
    import hashlib

    from kgforge.ops.kgtrain import kg_random_walks, kg_random_walks_sql
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = kg_random_walks(SF).to_pandas()
    odf = con.sql(kg_random_walks_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)


# ------------------------------------------------------ skip-gram pairs

def test_skipgram_pairs_hand_case(ray_session):
    import ray.data
    from kgforge.ops.kgtrain import skipgram_pairs
    walk = pa.table({
        "start": pa.array([9, 9, 9, 9], pa.int64()),
        "w": pa.array([0, 0, 0, 0], pa.int64()),
        "step": pa.array([0, 1, 2, 3], pa.int64()),
        "node": pa.array([10, 11, 12, 13], pa.int64()),
    })
    got = _rows(skipgram_pairs(ray.data.from_arrow(walk), window=1))
    assert got == sorted([
        (10, 11, 1), (11, 10, -1), (11, 12, 1), (12, 11, -1),
        (12, 13, 1), (13, 12, -1)])
    # window=2 adds the dist-2 pairs, never dist 0
    got2 = _rows(skipgram_pairs(ray.data.from_arrow(walk), window=2))
    assert len(got2) == len(got) + 4
    assert all(d != 0 for _, _, d in got2)


def test_skipgram_gate_parity(ray_session):
    import hashlib

    from kgforge.ops.kgtrain import (kg_skipgram_pairs,
                                     kg_skipgram_pairs_sql)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    df = kg_skipgram_pairs(SF).to_pandas()
    odf = con.sql(kg_skipgram_pairs_sql()).df()
    assert len(df) == len(odf) > 0
    assert norm(df) == norm(odf)


# ------------------------------------------------------- tensorization

def test_global_sorted_rank_dense_and_layout_independent(ray_session):
    import ray.data
    from kgforge.ops.rank import global_sorted_rank
    words = [f"w{i:03d}" for i in range(257)] * 3
    for parts in (1, 7):
        ds = ray.data.from_arrow(pa.table({"t": words})).repartition(parts)
        df = (global_sorted_rank(ds, "t").to_pandas()
              .sort_values("id").reset_index(drop=True))
        assert df["t"].tolist() == sorted(set(words))
        assert df["id"].tolist() == list(range(257))


def test_id_maps_and_encoding_gate_parity(ray_session):
    import hashlib

    from kgforge.ops.kgtrain import (kg_id_maps, kg_id_maps_sql,
                                     kg_triples_encoded,
                                     kg_triples_encoded_sql)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{SF}/part.parquet')")

    def norm(df):
        cols = sorted(df.columns)
        df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
        return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

    maps = kg_id_maps(SF).to_pandas()
    assert norm(maps) == norm(con.sql(kg_id_maps_sql()).df())
    # ids dense per kind
    for kind, grp in maps.groupby("kind"):
        assert sorted(grp["id"]) == list(range(len(grp)))
    enc = kg_triples_encoded(SF).to_pandas()
    oenc = con.sql(kg_triples_encoded_sql()).df()
    assert len(enc) == len(oenc) > 0
    assert norm(enc) == norm(oenc)
    fj = kg_triples_encoded(SF, force_join=True).to_pandas()
    assert norm(fj) == norm(oenc)
