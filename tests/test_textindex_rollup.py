"""Inverted text index (ops/textindex.py) and GROUPING SETS rollup
(ops/relational.corpus_rollup): oracle parity, partition pruning,
index staleness/crash handling."""

import glob
import hashlib
import os

import duckdb
import pandas as pd
import pytest

from kgforge.ops import relational, textindex

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    return con.sql(sql).df()


def test_text_search_parity(ray_session):
    df = textindex.text_search(SF).to_pandas()
    odf = _oracle(textindex.text_search_sql())
    assert len(df) == len(odf) > 0
    assert _norm(df) == _norm(odf)


def test_text_search_other_terms(ray_session):
    terms = ("customer", "window")
    df = textindex.search_all_terms(SF, terms).to_pandas()
    odf = _oracle(textindex.text_search_sql(terms))
    assert _norm(df) == _norm(odf)


def test_index_partition_pruning(ray_session):
    """A single-term search must touch only that term's bucket dir."""
    idx = textindex.build_text_index(SF)
    dirs = glob.glob(os.path.join(idx, "postings", "tok_bucket=*"))
    assert len(dirs) > 1     # layout actually partitioned
    b = textindex._token_bucket(["spark"], textindex.N_TOKEN_BUCKETS)[0]
    assert os.path.isdir(os.path.join(idx, "postings", f"tok_bucket={b}"))


def test_index_rebuild_on_crash_marker(ray_session, tmp_path):
    """A marker-less index dir (crashed build) is removed, not appended
    to — a rebuild gives the same answer, not doubled postings."""
    idx = str(tmp_path / "idx")
    df1 = textindex.search_all_terms(SF, index_dir=idx).to_pandas()
    os.remove(os.path.join(idx, "_SUCCESS"))   # simulate crash
    df2 = textindex.search_all_terms(SF, index_dir=idx).to_pandas()
    assert _norm(df1) == _norm(df2)
    assert os.path.exists(os.path.join(idx, "_SUCCESS"))


def test_corpus_rollup_parity(ray_session):
    df = relational.corpus_rollup(SF).to_pandas()
    odf = _oracle(relational.CORPUS_ROLLUP_SQL)
    assert _norm(df) == _norm(odf)
    # internal consistency: grand total == sum of per-lang rows
    grand = df[(df.lang == "ALL") & (df.source == "ALL")]
    per_lang = df[(df.lang != "ALL") & (df.source == "ALL")]
    assert grand["n_docs"].iloc[0] == per_lang["n_docs"].sum()
    assert grand["total_chars"].iloc[0] == per_lang["total_chars"].sum()


def test_percentile_threshold_filter_parity(ray_session):
    from kgforge.ops import quantile
    for pct in (50, 90):
        df = quantile.percentile_threshold_filter(SF, pct).to_pandas()
        odf = _oracle(quantile.percentile_threshold_filter_sql(pct))
        assert len(df) == len(odf) > 0
        assert _norm(df) == _norm(odf)


def test_text_search_ranked_parity(ray_session):
    df = textindex.text_search_ranked(SF).to_pandas()
    odf = _oracle(textindex.text_search_ranked_sql())
    assert len(df) == len(odf) == 20
    assert _norm(df) == _norm(odf)


def test_bm25_parity_default_and_alt_terms(ray_session):
    for terms in (textindex.DEFAULT_TERMS, ("the", "vector")):
        df = textindex.bm25_search(SF, terms=terms).to_pandas()
        odf = _oracle(textindex.bm25_search_sql(terms=terms))
        assert len(df) == len(odf) > 0
        assert _norm(df) == _norm(odf)


def test_bm25_rare_term_outranks_common(ray_session):
    """idf' shape check on a planted corpus: with equal tf and equal dl,
    a doc matching only the RARE term must outrank a doc matching only
    the COMMON term."""
    import ray.data
    import pathlib
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile
    docs = [{"doc_id": 0, "text": "rare pad pad pad"},
            {"doc_id": 1, "text": "common pad pad pad"}]
    # 'common' appears in many other docs, 'rare' nowhere else
    docs += [{"doc_id": 2 + i, "text": "common filler word here"}
             for i in range(8)]
    d = tempfile.mkdtemp()
    pq.write_table(pa.Table.from_pylist(docs),
                   str(pathlib.Path(d) / "documents.parquet"))
    out = textindex.bm25_search(d, terms=("rare", "common"),
                                k=10).to_pandas()
    s = dict(zip(out.doc_id, out.score))
    assert s[0] > s[1]


def test_bm25_tf_index_freshness(ray_session, tmp_path):
    """Marker-less tf-index dir is rebuilt, not appended to."""
    import os
    idx = str(tmp_path / "tfidx")
    df1 = textindex.bm25_search(SF, index_dir=idx).to_pandas()
    os.remove(os.path.join(idx, "_SUCCESS"))
    df2 = textindex.bm25_search(SF, index_dir=idx).to_pandas()
    assert _norm(df1) == _norm(df2)
