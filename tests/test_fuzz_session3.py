"""Differential fuzz for the session-3 operators: random small inputs
through BOTH the Ray op and DuckDB. Deterministic examples
(derandomize), small example counts — each example runs a full Ray
pipeline over a tmp parquet dir."""

import hashlib

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
    # Ray's to_pandas drops columns entirely on 0-row results, so an
    # empty engine frame can't be csv-compared against the oracle's
    # empty-but-typed frame — both-empty IS equality
    if len(df) == 0 and len(odf) == 0:
        return True
    return _norm(df) == _norm(odf)


def _docs_dir(tmp, ids, texts, sources=None):
    import os
    d = tmp / hashlib.md5(repr((ids, texts)).encode()).hexdigest()[:10]
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts),
        "source": pa.array(sources or ["s%d" % (i % 3) for i in ids]),
    }), d / "documents.parquet")
    return str(d)


TOKENS = st.sampled_from(list("abcdef"))
DOC = st.lists(TOKENS, min_size=1, max_size=8).map(" ".join)


@settings(**PIPE_SETTINGS)
@given(st.lists(DOC, min_size=2, max_size=14, unique=False))
def test_fuzz_jaccard_pairs(ray_session, tmp_path_factory, texts):
    from kgforge.ops import setjoin
    d = _docs_dir(tmp_path_factory.mktemp("jac"),
                  list(range(len(texts))), texts)
    df = setjoin.jaccard_pairs(d).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    odf = con.sql(setjoin.jaccard_pairs_sql()).df()
    assert _same(df, odf)


@settings(**PIPE_SETTINGS)
@given(st.lists(st.tuples(st.integers(1, 3), st.integers(0, 40),
                          st.sampled_from(["view", "click", "purchase",
                                           "error"])),
                min_size=1, max_size=30))
def test_fuzz_funnel_and_rolling(ray_session, tmp_path_factory, rows):
    from kgforge.ops import relational
    tmp = tmp_path_factory.mktemp("ev")
    d = tmp / hashlib.md5(repr(rows).encode()).hexdigest()[:10]
    import os
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows],
                       pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    }), d / "events.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')")

    f = relational.conversion_funnel(str(d)).to_pandas()
    of = con.sql(relational.conversion_funnel_sql()).df()
    assert _same(f, of)

    r = relational.rolling_user_counts(str(d), window_s=10).to_pandas()
    orr = con.sql(relational.rolling_user_counts_sql(10)).df()
    assert _same(r, orr)


@settings(**PIPE_SETTINGS)
@given(st.lists(st.integers(0, 60), min_size=1, max_size=20,
                unique=True),
       st.data())
def test_fuzz_crawl_latest(ray_session, tmp_path_factory, ids, data):
    """Non-dense, shuffled doc_ids through the snapshot synthesis."""
    from kgforge.ops import crawl
    texts = [data.draw(DOC) for _ in ids]
    d = _docs_dir(tmp_path_factory.mktemp("crawl"), ids, texts)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    df = crawl.latest_snapshot_per_url(d).to_pandas()
    odf = con.sql(crawl.latest_snapshot_per_url_sql()).df()
    assert _same(df, odf)
    df2 = crawl.crawl_change_summary(d).to_pandas()
    odf2 = con.sql(crawl.crawl_change_summary_sql()).df()
    assert _same(df2, odf2)
