"""Differential fuzz for the session-4 operators: random small inputs
through BOTH the Ray op and its oracle (DuckDB mirror or scalar
reference). Same discipline as test_fuzz_session3: deterministic
examples, small counts — each example runs a full Ray pipeline."""

import hashlib
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

PIPE_SETTINGS = dict(max_examples=5, deadline=None, derandomize=True,
                     database=None)


def _norm(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    df = df[cols].astype(str).sort_values(cols).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def _same(df: pd.DataFrame, odf: pd.DataFrame) -> bool:
    if len(df) == 0 and len(odf) == 0:
        return True
    return _norm(df) == _norm(odf)


def _docs_dir(tmp, ids, texts, langs=None):
    d = tmp / hashlib.md5(repr((tuple(ids), tuple(texts)))
                          .encode()).hexdigest()[:10]
    os.makedirs(d, exist_ok=True)
    n = [len(t) for t in texts]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs or ["l%d" % (i % 3) for i in ids]),
        "source": pa.array(["s%d" % (i % 3) for i in ids]),
        "n_chars": pa.array(n, pa.int64()),
    }), d / "documents.parquet")
    return str(d)


def _con(d):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    return con


TOKENS = st.sampled_from(list("abcdef") + ["the", "utm_x"])
DOC = st.lists(TOKENS, min_size=0, max_size=60).map(" ".join)


@settings(**PIPE_SETTINGS)
@given(st.lists(DOC, min_size=1, max_size=10))
def test_fuzz_passage_chunks(ray_session, tmp_path_factory, texts):
    from kgforge.ops import text as T
    d = _docs_dir(tmp_path_factory.mktemp("pc"),
                  list(range(len(texts))), texts)
    df = T.passage_chunks(d, window=7, stride=4).to_pandas()
    con = _con(d)
    odf = con.sql(T.passage_chunks_sql(window=7, stride=4)).df()
    assert _same(df, odf)


@settings(**PIPE_SETTINGS)
@given(st.lists(DOC, min_size=1, max_size=10))
def test_fuzz_bigram_lm_both_paths(ray_session, tmp_path_factory, texts):
    from kgforge.ops import text as T
    d = _docs_dir(tmp_path_factory.mktemp("lm"),
                  list(range(len(texts))), texts)
    con = _con(d)
    odf = con.sql(T.bigram_lm_scores_sql()).df()
    assert _same(T.bigram_lm_scores(d).to_pandas(), odf)
    assert _same(T.bigram_lm_scores(d, force_join=True).to_pandas(), odf)


@settings(**PIPE_SETTINGS)
@given(st.integers(min_value=1, max_value=40))
def test_fuzz_url_canonical_dedup(ray_session, tmp_path_factory, n):
    from kgforge.ops import crawl as C
    d = _docs_dir(tmp_path_factory.mktemp("url"),
                  list(range(n)), ["x"] * n)
    df = C.url_canonical_dedup(d).to_pandas()
    con = _con(d)
    odf = con.sql(C.url_canonical_dedup_sql()).df()
    assert _same(df, odf)


@settings(**PIPE_SETTINGS)
@given(st.integers(min_value=1, max_value=30))
def test_fuzz_triangles_and_kcore(ray_session, tmp_path_factory, n):
    from kgforge import scalar_ref as SR
    from kgforge.ops import linkgraph as lg
    d = _docs_dir(tmp_path_factory.mktemp("tri"),
                  list(range(n)), ["x"] * n)
    con = _con(d)
    assert _same(lg.triangle_counts(d).to_pandas(),
                 con.sql(lg.triangle_counts_sql()).df())
    ref = SR.kcore_ref(list(range(n)), 3)
    eng = lg.kcore_nodes(d, k=3).to_pandas()
    if len(eng) == 0:
        assert ref == []          # empty core: columns drop, rows agree
    else:
        eng = eng.sort_values("doc_id").reset_index(drop=True)
        assert list(map(tuple, eng.itertuples(index=False))) == ref


@settings(**PIPE_SETTINGS)
@given(st.lists(st.sampled_from(["F", "O", "P"]),
                min_size=1, max_size=30),
       st.integers(min_value=1, max_value=5))
def test_fuzz_majority_vote(ray_session, tmp_path_factory, statuses,
                            n_cust):
    from kgforge.ops import relational as R
    tmp = tmp_path_factory.mktemp("mv")
    d = tmp / hashlib.md5(repr((tuple(statuses), n_cust))
                          .encode()).hexdigest()[:10]
    os.makedirs(d, exist_ok=True)
    rows = pa.table({
        "o_orderkey": pa.array(range(len(statuses)), pa.int64()),
        "o_custkey": pa.array([i % n_cust for i in
                               range(len(statuses))], pa.int64()),
        "o_orderstatus": pa.array(statuses),
    })
    pq.write_table(rows, str(d) + "/orders.parquet")
    df = R.customer_status_vote(str(d)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{d}/orders.parquet')")
    odf = con.sql(R.CUSTOMER_STATUS_VOTE_SQL).df()
    assert _same(df, odf)


@settings(**PIPE_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 20), st.integers(1, 9)),
                min_size=1, max_size=25))
def test_fuzz_graph_delta(ray_session, tmp_path_factory, parts):
    from kgforge.pipelines import versioning as V
    tmp = tmp_path_factory.mktemp("gd")
    d = tmp / hashlib.md5(repr(tuple(parts)).encode()).hexdigest()[:10]
    os.makedirs(d, exist_ok=True)
    # unique part keys (fixture assumes pk uniqueness)
    seen, rows = set(), []
    for k, sz in parts:
        if k not in seen:
            seen.add(k)
            rows.append((k, sz))
    pq.write_table(pa.table({
        "p_partkey": pa.array([k for k, _ in rows], pa.int64()),
        "p_size": pa.array([s for _, s in rows], pa.int64()),
    }), str(d) + "/part.parquet")
    df = V.kg_snapshot_delta(str(d)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM "
            f"read_parquet('{d}/part.parquet')")
    odf = con.sql(V.kg_snapshot_delta_sql()).df()
    assert _same(df, odf)


@settings(**PIPE_SETTINGS)
@given(st.lists(DOC, min_size=1, max_size=8))
def test_fuzz_bm25(ray_session, tmp_path_factory, texts):
    from kgforge.ops import textindex as TI
    d = _docs_dir(tmp_path_factory.mktemp("bm"),
                  list(range(len(texts))), texts)
    terms = ("a", "the", "f")
    df = TI.bm25_search(d, terms=terms, k=10).to_pandas()
    con = _con(d)
    odf = con.sql(TI.bm25_search_sql(terms=terms, k=10)).df()
    assert _same(df, odf)


@settings(**PIPE_SETTINGS)
@given(st.lists(DOC, min_size=1, max_size=10))
def test_fuzz_top_docs_per_lang(ray_session, tmp_path_factory, texts):
    from kgforge.ops import relational as R
    d = _docs_dir(tmp_path_factory.mktemp("td"),
                  list(range(len(texts))), texts)
    df = R.top_docs_per_lang(d, k=2).to_pandas()
    con = _con(d)
    odf = con.sql(R.top_docs_per_lang_sql(k=2)).df()
    assert _same(df, odf)


@settings(**PIPE_SETTINGS)
@given(st.integers(min_value=2, max_value=12),
       st.integers(min_value=2, max_value=6))
def test_fuzz_quantized_topk_and_centroids(ray_session, tmp_path_factory,
                                           n, dim):
    import numpy as np
    from kgforge import scalar_ref as SR
    from kgforge.ops import ann as A
    tmp = tmp_path_factory.mktemp("qt")
    d = tmp / hashlib.md5(repr((n, dim)).encode()).hexdigest()[:10]
    os.makedirs(d, exist_ok=True)
    # deterministic pseudo-random embeddings incl. a zero vector
    M = np.array([[((i * 31 + j * 17) % 13) - 6.0 for j in range(dim)]
                  for i in range(n)])
    M[n - 1] = 0.0
    ids = np.arange(n)
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(M.tolist(),
                              pa.list_(pa.float64()))}),
        str(d) + "/embeddings.parquet")
    langs = ["l%d" % (i % 2) for i in ids]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["x"] * n), "lang": pa.array(langs),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array([1] * n, pa.int64())}),
        str(d) + "/documents.parquet")
    qids = [0, 1]
    eng = A.quantized_topk(str(d), query_ids=qids, k=5).to_pandas()
    ref = SR.quantized_topk_ref(ids, M, qids, 5)
    assert sorted(map(tuple, eng.itertuples(index=False))) == sorted(ref)
    engc = A.lang_centroids(str(d)).to_pandas()
    refc = SR.lang_centroids_ref(ids, M, dict(zip(ids.tolist(), langs)))
    assert sorted(map(tuple, engc.itertuples(index=False))) == sorted(refc)


@settings(**PIPE_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 6),
                          st.sampled_from(["F", "O", "P"]),
                          st.integers(0, 700)),
                min_size=1, max_size=25))
def test_fuzz_kg_as_of(ray_session, tmp_path_factory, orders):
    import datetime
    from kgforge.pipelines import versioning as V
    tmp = tmp_path_factory.mktemp("ao")
    d = tmp / hashlib.md5(repr(tuple(orders)).encode()).hexdigest()[:10]
    os.makedirs(d, exist_ok=True)
    base = datetime.datetime(1995, 1, 1)
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(len(orders)), pa.int64()),
        "o_custkey": pa.array([c for c, _, _ in orders], pa.int64()),
        "o_orderstatus": pa.array([s for _, s, _ in orders]),
        "o_orderdate": pa.array(
            [base + datetime.timedelta(days=dd) for _, _, dd in orders],
            pa.timestamp("us")),
    }), str(d) + "/orders.parquet")
    df = V.kg_as_of_status(str(d)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM "
            f"read_parquet('{d}/orders.parquet')")
    odf = con.sql(V.kg_as_of_status_sql()).df()
    assert _same(df, odf)
