"""Exact Jaccard set-similarity join (ops/setjoin.py): oracle parity,
planted known pairs, threshold boundary, prefix-length arithmetic."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from kgforge.ops import setjoin

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def _oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')")
    return con.sql(sql).df()


def test_prefix_len_arithmetic():
    s = np.array([1, 5, 10, 31], dtype=np.int64)
    # p = s - ceil(0.6 s) + 1
    assert setjoin._prefix_len(s, 3, 5).tolist() == [1, 3, 5, 13]


def test_jaccard_planted(ray_session, tmp_path):
    docs = [
        (0, "a b c d e"),          # J(0,1)=4/6=0.667 >= 0.6
        (1, "a b c d x"),
        (2, "a b c q r"),          # J(0,2)=3/7=0.43 < 0.6
        (3, "p q r s t u v w"),    # J with others tiny
        (4, "a b c d e"),          # identical to 0 -> J=1
        (5, "m n"),                # J(5,6)=1/3 < 0.6
        (6, "m o"),
    ]
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    df = setjoin.jaccard_pairs(str(tmp_path)).to_pandas()
    got = {(r.a_id, r.b_id) for r in df.itertuples()}
    assert got == {(0, 1), (0, 4), (1, 4)}
    odf = _oracle(setjoin.jaccard_pairs_sql(), str(tmp_path))
    assert _norm(df) == _norm(odf)


def test_jaccard_threshold_boundary(ray_session, tmp_path):
    # J = 3/5 exactly: |A|=4, |B|=4, common=3 -> 3/5 == tau (kept)
    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b c d", "a b c z"]),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    df = setjoin.jaccard_pairs(str(tmp_path)).to_pandas()
    assert len(df) == 1 and df.iloc[0]["n_common"] == 3


def test_jaccard_parity_corpus(ray_session):
    df = setjoin.jaccard_pairs(SF).to_pandas()
    odf = _oracle(setjoin.jaccard_pairs_sql(), SF)
    assert len(df) == len(odf) > 0
    assert _norm(df) == _norm(odf)


def test_jaccard_new_vs_prior_parity(ray_session):
    df = setjoin.jaccard_new_vs_prior(SF).to_pandas()
    odf = _oracle(setjoin.jaccard_new_vs_prior_sql(), SF)
    assert len(df) == len(odf) > 0
    assert _norm(df) == _norm(odf)
    # cross-side only: new ids are doc_id%4==0, priors are not
    assert (df["new_id"] % 4 == 0).all()
    assert (df["prior_id"] % 4 != 0).all()


def test_jaccard_new_vs_prior_planted(ray_session, tmp_path):
    docs = [
        (1, "a b c d e"),       # prior
        (4, "a b c d x"),       # new, J=4/6 vs doc 1 -> kept
        (8, "p q r s t"),       # new, no similar prior
        (3, "p q r s t"),       # prior identical to 8 -> J=1 kept
    ]
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    df = setjoin.jaccard_new_vs_prior(str(tmp_path)).to_pandas()
    got = {(r.new_id, r.prior_id) for r in df.itertuples()}
    assert got == {(4, 1), (8, 3)}
