"""Bloom-prefiltered incremental ingest (ops/bloom.py) and the rolling
RANGE-window count (ops/relational.rolling_user_counts): oracle parity
at sf0.001, planted cross-corpus duplicates (the anti-join confirm
path), and the over-cap anti-join fallback."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kgforge.ops import bloom, relational

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def _oracle(sql: str, sf_dir: str, table: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW {table} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{table}.parquet')")
    return con.sql(sql).df()


def test_incremental_new_docs_parity(ray_session):
    df = bloom.incremental_new_docs(SF).to_pandas()
    odf = _oracle(bloom.incremental_new_docs_sql(), SF, "documents")
    assert len(df) == len(odf) > 0
    assert _norm(df) == _norm(odf)


@pytest.fixture()
def planted_dir(tmp_path):
    """documents where half the incoming (doc_id%4==0) docs duplicate a
    prior doc's text — exercises the bloom-positive -> anti-join-drop
    path, not just false positives."""
    n = 200
    ids = np.arange(n, dtype=np.int64)
    texts = [f"unique text body number {i}" for i in ids]
    for i in range(0, n, 8):        # doc_id%8==0: dup of prior doc i+1
        texts[i] = texts[i + 1]
    tbl = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    pq.write_table(tbl, tmp_path / "documents.parquet")
    return str(tmp_path)


def test_incremental_planted_dups(ray_session, planted_dir):
    df = bloom.incremental_new_docs(planted_dir).to_pandas()
    odf = _oracle(bloom.incremental_new_docs_sql(), planted_dir,
                  "documents")
    # dups (doc_id%8==0) must be dropped, the rest of incoming kept
    assert set(df["doc_id"]) == {i for i in range(0, 200, 4) if i % 8 != 0}
    assert _norm(df) == _norm(odf)


def test_incremental_fallback_matches_bloom_path(ray_session, planted_dir):
    fast = bloom.incremental_new_docs(planted_dir).to_pandas()
    slow = bloom.incremental_new_docs(planted_dir,
                                      max_bits=1 << 10).to_pandas()
    assert _norm(fast) == _norm(slow)


@pytest.mark.parametrize("window_s", [3600, 60])
def test_rolling_user_counts_parity(ray_session, window_s):
    df = relational.rolling_user_counts(SF, window_s=window_s).to_pandas()
    odf = _oracle(relational.rolling_user_counts_sql(window_s), SF,
                  "events")
    assert len(df) == len(odf) == df["event_id"].nunique()
    assert _norm(df) == _norm(odf)


def test_rolling_counts_tie_semantics(ray_session, tmp_path):
    """Equal timestamps: RANGE CURRENT ROW counts ALL peers for every
    peer row (searchsorted-right semantics, not pandas rolling)."""
    ts = pa.array([0, 0, 0, 10_000_000_000], type=pa.timestamp("us"))
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "ts": ts,
        "user_id": pa.array([7, 7, 7, 7], type=pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    df = (relational.rolling_user_counts(str(tmp_path), window_s=60)
          .to_pandas().sort_values("event_id"))
    assert df["n_in_window"].tolist() == [3, 3, 3, 1]
