"""Crawl-snapshot operators (ops/crawl.py): semantics on tiny synthetic
batches + engine-vs-DuckDB parity at sf0.001 + bucket-layout
independence of the per-url arg-max merge."""

import hashlib

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from kgforge.ops import crawl

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


def test_snapshot_builder_semantics():
    batch = pa.table({
        "doc_id": pa.array([0, 1, 3], type=pa.int64()),
        "text": pa.array(["alpha", "beta", "gamma"]),
        "source": pa.array(["s0", "s1", "s0"]),
    })
    out = crawl.SnapshotBuilder()(batch)
    rows = {(r["url"], r["warc_ts"].timestamp()): r["content_hash"]
            for r in out.to_pylist()}
    # doc 0 and doc 3 recrawled (one extra row each); doc 1 not
    assert out.num_rows == 5
    base0 = [h for (u, _), h in rows.items() if u.endswith("/doc/0")]
    assert len(base0) == 2
    # doc 0 % 6 == 0 -> content changed on recrawl
    assert hashlib.md5(b"alpha").hexdigest() in base0
    assert hashlib.md5(b"alpha [rev2]").hexdigest() in base0
    # doc 3 recrawled but unchanged -> same hash twice
    h3 = [h for (u, _), h in rows.items() if u.endswith("/doc/3")]
    assert h3 == [hashlib.md5(b"gamma").hexdigest()] * 2


def test_latest_snapshot_parity(ray_session):
    df = crawl.latest_snapshot_per_url(SF).to_pandas()
    odf = _oracle(crawl.latest_snapshot_per_url_sql())
    assert len(df) == len(odf)
    assert sorted(df.columns) == sorted(odf.columns)
    assert _norm(df) == _norm(odf)


def test_change_summary_parity(ray_session):
    df = crawl.crawl_change_summary(SF).to_pandas()
    odf = _oracle(crawl.crawl_change_summary_sql())
    assert _norm(df) == _norm(odf)
    # sanity on the synthesis: every source has recrawls and changes
    assert (df["n_recrawled"] > 0).all()
    # doc_id % 6 == 0 only lands on even sources (source = doc_id % 20)
    assert df["n_changed"].sum() > 0
    assert (df["n_changed"] <= df["n_recrawled"]).all()


def test_url_host_stats_parity(ray_session):
    df = crawl.url_host_stats(SF).to_pandas()
    odf = _oracle(crawl.URL_HOST_STATS_SQL)
    assert _norm(df) == _norm(odf)


@pytest.mark.parametrize("buckets", [3, 17])
def test_latest_snapshot_bucket_independence(ray_session, buckets):
    a = crawl.latest_snapshot_per_url(SF, num_buckets=buckets).to_pandas()
    b = crawl.latest_snapshot_per_url(SF, num_buckets=64).to_pandas()
    assert _norm(a) == _norm(b)


def test_url_canonicalizer_rules():
    """Unit rules: case, www, fragment, trailing slash, utm filter,
    param sort, bare-host path."""
    import pyarrow as pa
    from kgforge.ops.crawl import canonicalize_url_column
    t = pa.table({"url": pa.array([
        "HTTPS://WWW.Site.Org/A/",
        "https://site.org/a#frag",
        "https://site.org/a?utm_source=x&b=2&a=1",
        "https://site.org",
        "http://www.site.org/?utm_a=1",
    ])})
    assert canonicalize_url_column(t).to_pylist() == [
        "https://site.org/A",          # case: host only, path preserved
        "https://site.org/a",
        "https://site.org/a?a=1&b=2",
        "https://site.org/",
        "http://site.org/",
    ]


def test_url_canonical_dedup_parity(ray_session):
    df = crawl.url_canonical_dedup(SF).to_pandas()
    odf = _oracle(crawl.url_canonical_dedup_sql())
    assert _norm(df) == _norm(odf)
    # planted collisions: (4j, 4j+1) pairs merge -> 125 of 500 dropped
    assert len(df) == 500 and df["keep"].sum() == 375
    g = df.groupby("canon_url")["keep"]
    assert (g.sum() == 1).all()        # exactly one keeper per canon
