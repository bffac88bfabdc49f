"""Crawl-snapshot operators over the Common-Crawl-style pages table.

Real web corpora contain MANY snapshots of the same url (re-crawls);
the first thing every training-data pipeline does is pick one snapshot
per url and measure churn. The sandbox's pages table is synthesized
1:1 from documents (sources/pages.py), so this module derives a
deterministic multi-snapshot view — every third doc gets a re-crawl 30
days later, every sixth doc's re-crawl has changed content — with the
same seedless arithmetic the oracle mirrors in SQL. The operators are
the generic ones:

* ``latest_snapshot_per_url`` — arg-max-by-timestamp per url. The
  scale shape is a per-batch combiner (one polars group_by per batch
  collapses same-url snapshots BEFORE the wire) followed by ONE
  hash(url) bucket shuffle of per-url partials; the merge re-runs the
  same arg-min/arg-max algebra, which is associative, so block layout
  never changes the answer. No global sort, nothing on the driver.
* ``crawl_change_summary`` — per-source churn counters (how many urls
  were re-crawled, how many actually changed). Same partials, second
  tiny groupby over the source key.

Snapshot timestamps are unique per url by construction (base ts vs
base+30d), so the arg-max is deterministic; the tie-break rule is
inherited from DuckDB ``arg_max`` only in the no-tie regime, which the
synthesis guarantees.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.pages import EPOCH_US, TS_STEP_S
from ..sources.readers import read_table

RECRAWL_DELAY_S = 30 * 86400
REV2_SUFFIX = " [rev2]"


def _md5_arr(arr: pa.Array) -> pa.Array:
    """md5 per UNIQUE value (dictionary-encoded) — same discipline as
    ops/dedup.Md5Key: duplicate-heavy columns hash each distinct value
    once per batch. md5 matches the DuckDB oracle exactly."""
    enc = pc.dictionary_encode(arr)
    uniq = pa.array(
        [hashlib.md5(v.encode()).hexdigest() if v is not None else None
         for v in enc.dictionary.to_pylist()], type=pa.string())
    return uniq.take(enc.indices)


class SnapshotBuilder:
    """map_batches fn: documents rows -> crawl-snapshot rows
    (url, warc_ts, content_hash, doc_id, source). Vectorized: url and
    timestamps via Arrow/numpy kernels; md5 per unique text."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        id_str = batch["doc_id"].combine_chunks().cast(pa.string())
        src = batch["source"].combine_chunks().cast(pa.string())
        text = batch["text"].combine_chunks().cast(pa.string())
        url = pc.binary_join_element_wise(
            pa.scalar("https://"), src, pa.scalar(".example.org/doc/"),
            id_str, "").cast(pa.string())
        ts0 = EPOCH_US + ids * (TS_STEP_S * 1_000_000)
        h0 = _md5_arr(text)
        base = pa.table({
            "url": url,
            "warc_ts": pa.array(ts0, type=pa.timestamp("us")),
            "content_hash": h0,
            "doc_id": batch["doc_id"],
            "source": src,
        })
        remask = pa.array(ids % 3 == 0)
        if pc.any(remask).as_py():
            rb = base.filter(remask)
            rtext = text.filter(remask)
            rids = ids[ids % 3 == 0]
            changed = pa.array(rids % 6 == 0)
            rtext = pc.if_else(
                changed,
                pc.binary_join_element_wise(rtext, pa.scalar(REV2_SUFFIX),
                                            ""),
                rtext)
            recrawl = pa.table({
                "url": rb["url"],
                "warc_ts": pa.array(
                    ts0[ids % 3 == 0] + RECRAWL_DELAY_S * 1_000_000,
                    type=pa.timestamp("us")),
                "content_hash": _md5_arr(rtext.cast(pa.string())),
                "doc_id": rb["doc_id"],
                "source": rb["source"],
            })
            return pa.concat_tables([base, recrawl])
        return base


def build_snapshots(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "text", "source"])
    return ds.map_batches(SnapshotBuilder(), batch_format="pyarrow")


SNAPSHOTS_SQL = f"""
  SELECT 'https://' || source || '.example.org/doc/' || doc_id AS url,
         TIMESTAMP '2024-01-01 00:00:00'
           + (doc_id * {TS_STEP_S}) * INTERVAL 1 SECOND AS warc_ts,
         md5(text) AS content_hash, doc_id, source
  FROM documents
  UNION ALL
  SELECT 'https://' || source || '.example.org/doc/' || doc_id,
         TIMESTAMP '2024-01-01 00:00:00'
           + (doc_id * {TS_STEP_S} + {RECRAWL_DELAY_S}) * INTERVAL 1 SECOND,
         md5(CASE WHEN doc_id % 6 = 0 THEN text || '{REV2_SUFFIX}'
                  ELSE text END),
         doc_id, source
  FROM documents WHERE doc_id % 3 = 0
"""


# ------------------------------------------------------------------ core
_PARTIAL_SCHEMA = pa.schema([
    ("url", pa.string()), ("source", pa.string()), ("n", pa.int64()),
    ("min_ts", pa.int64()), ("h_first", pa.string()),
    ("max_ts", pa.int64()), ("h_last", pa.string()),
    ("_bucket", pa.int32()),
])


def _per_url_partials(snapshots: "ray.data.Dataset",
                      num_buckets: int) -> "ray.data.Dataset":
    """Per-url (count, arg-min/arg-max hash by ts) — combiner inside
    each batch, merged after ONE hash(url) bucket shuffle. The partial
    algebra is associative: merging partials with the same sort-by-ts
    first/last rule gives the global first/last because timestamps are
    totally ordered per url."""

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(pa.table({
            "url": batch["url"].combine_chunks(),
            "source": batch["source"].combine_chunks(),
            "ts": batch["warc_ts"].combine_chunks().cast(pa.int64()),
            "h": batch["content_hash"].combine_chunks(),
        }))
        agg = df.group_by("url").agg(
            pl.col("source").first().alias("source"),
            pl.len().cast(pl.Int64).alias("n"),
            pl.col("ts").min().alias("min_ts"),
            pl.col("h").sort_by("ts").first().alias("h_first"),
            pl.col("ts").max().alias("max_ts"),
            pl.col("h").sort_by("ts").last().alias("h_last"),
        )
        bucket = (agg.select(pl.col("url")).hash_rows(seed=0)
                  % num_buckets).cast(pl.Int32)
        return agg.with_columns(bucket.alias("_bucket")) \
            .to_arrow().cast(_PARTIAL_SCHEMA)

    def merge(group: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(group.drop_columns(["_bucket"]))
        out = df.group_by("url").agg(
            pl.col("source").first().alias("source"),
            pl.col("n").sum().alias("n"),
            pl.col("min_ts").min().alias("g_min"),
            pl.col("h_first").sort_by("min_ts").first().alias("h_first"),
            pl.col("max_ts").max().alias("g_max"),
            pl.col("h_last").sort_by("max_ts").last().alias("h_last"),
        ).rename({"g_min": "min_ts", "g_max": "max_ts"})
        return out.to_arrow().cast(_PARTIAL_SCHEMA.remove(7))

    return (snapshots.map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket").map_groups(merge, batch_format="pyarrow"))


def latest_snapshot_per_url(sf_dir: str, num_buckets: int | None = None
                            ) -> "ray.data.Dataset":
    """One row per url: snapshot count + timestamp and content hash of
    the NEWEST snapshot (the row a training pipeline keeps)."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    merged = _per_url_partials(build_snapshots(sf_dir), num_buckets)

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "n_snapshots": batch["n"],
            "latest_ts": batch["max_ts"].combine_chunks()
                .cast(pa.timestamp("us")),
            "latest_hash": batch["h_last"],
        })

    return merged.map_batches(finish, batch_format="pyarrow")


def latest_snapshot_per_url_sql() -> str:
    return f"""
WITH snapshots AS ({SNAPSHOTS_SQL})
SELECT url, CAST(count(*) AS BIGINT) AS n_snapshots,
       max(warc_ts) AS latest_ts,
       arg_max(content_hash, warc_ts) AS latest_hash
FROM snapshots GROUP BY url
"""


def crawl_change_summary(sf_dir: str, num_buckets: int | None = None
                         ) -> "ray.data.Dataset":
    """Per-source churn: urls total / re-crawled / content-changed.
    Consumes the same per-url partials as latest_snapshot_per_url,
    pre-aggregates per bucket (so the final exchange is
    sources × buckets rows), then one tiny groupby(source) sum."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    merged = _per_url_partials(build_snapshots(sf_dir), num_buckets)

    def per_source_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)
        out = df.group_by("source").agg(
            pl.len().cast(pl.Int64).alias("n_urls"),
            (pl.col("n") >= 2).sum().cast(pl.Int64).alias("n_recrawled"),
            (pl.col("h_first") != pl.col("h_last")).sum().cast(pl.Int64)
            .alias("n_changed"),
        )
        return out.to_arrow()

    from ray.data.aggregate import Sum
    return (merged.map_batches(per_source_partial, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("n_urls", alias_name="n_urls"),
                       Sum("n_recrawled", alias_name="n_recrawled"),
                       Sum("n_changed", alias_name="n_changed")))


def crawl_change_summary_sql() -> str:
    return f"""
WITH snapshots AS ({SNAPSHOTS_SQL}),
per_url AS (
  SELECT url, min(source) AS source, count(*) AS n,
         arg_min(content_hash, warc_ts) AS h0,
         arg_max(content_hash, warc_ts) AS h1
  FROM snapshots GROUP BY url
)
SELECT source, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_recrawled,
       CAST(sum(CASE WHEN h0 <> h1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_changed
FROM per_url GROUP BY source
"""


# ------------------------------------------------------------- host stats
def url_host_stats(sf_dir: str, num_buckets: int | None = None
                   ) -> "ray.data.Dataset":
    """Per-host corpus stats from the url column: doc count, total
    chars, distinct languages. Host is parsed with an Arrow regex
    kernel (no Python URL parsing per row). Distinct-language counting
    is the standard two-level combiner: per-batch (host, lang) partial
    counts collapse the wire to lexicon-sized partials, one hash(host)
    bucket shuffle, then per-bucket merge + rollup."""
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    ds = read_table(sf_dir, "documents",
                    columns=["doc_id", "lang", "source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        id_str = batch["doc_id"].combine_chunks().cast(pa.string())
        src = batch["source"].combine_chunks().cast(pa.string())
        url = pc.binary_join_element_wise(
            pa.scalar("https://"), src, pa.scalar(".example.org/doc/"),
            id_str, "").cast(pa.string())
        host = pc.struct_field(
            pc.extract_regex(url, pattern="^https://(?P<host>[^/]+)/"),
            "host").cast(pa.string())
        df = pl.from_arrow(pa.table({
            "host": host,
            "lang": batch["lang"].combine_chunks(),
            "n_chars": batch["n_chars"].combine_chunks(),
        }))
        agg = df.group_by(["host", "lang"]).agg(
            pl.len().cast(pl.Int64).alias("n"),
            pl.col("n_chars").sum().alias("chars"))
        bucket = (agg.select(pl.col("host")).hash_rows(seed=0)
                  % num_buckets).cast(pl.Int32)
        return agg.with_columns(bucket.alias("_bucket")).to_arrow()

    def merge(group: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(group.drop_columns(["_bucket"]))
        per_pair = df.group_by(["host", "lang"]).agg(
            pl.col("n").sum(), pl.col("chars").sum())
        out = per_pair.group_by("host").agg(
            pl.col("n").sum().alias("n_docs"),
            pl.col("chars").sum().alias("total_chars"),
            pl.len().cast(pl.Int64).alias("n_langs"))
        return out.to_arrow().cast(pa.schema([
            ("host", pa.string()), ("n_docs", pa.int64()),
            ("total_chars", pa.int64()), ("n_langs", pa.int64())]))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_bucket").map_groups(merge, batch_format="pyarrow"))


URL_HOST_STATS_SQL = """
WITH urls AS (
  SELECT 'https://' || source || '.example.org/doc/' || doc_id AS url,
         lang, n_chars
  FROM documents
)
SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM urls GROUP BY host
"""


# ---------------------------------------------------------------------------
# URL canonicalization + canonical-URL dedup
# ---------------------------------------------------------------------------

# deterministic messy-URL synthesis: two docs share a base path
# (doc_id // 2) and each gets one of four mess variants, so canonical
# collisions are planted by construction
_MESSY_VARIANTS = 4


def build_messy_urls(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, url) with deterministic crawl mess: uppercase hosts,
    www. prefixes, trailing slashes, unsorted + tracking query params,
    fragments. Base path is doc_id // 2, so consecutive id pairs
    canonicalize to the SAME url."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def mk(batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch)
        # host AND path derive from doc_id // 2, so the id pair
        # (2k, 2k+1) collides after canonicalization
        base = (pl.col("doc_id") // 2).cast(pl.Utf8)
        site = ((pl.col("doc_id") // 2) % 7).cast(pl.Utf8)
        v = pl.col("doc_id") % _MESSY_VARIANTS
        url = (
            pl.when(v == 0)
            .then("https://WWW.site" + site
                  + ".example.org/doc/" + base + "/")
            .when(v == 1)
            .then("https://site" + site
                  + ".example.org/doc/" + base
                  + "?utm_source=feed")
            .when(v == 2)
            .then("https://site" + site
                  + ".example.org/doc/" + base + "#section-2")
            .otherwise("https://site" + site
                       + ".example.org/doc/" + base
                       + "?b=2&a=1&utm_x=1")
        )
        return (df.select("doc_id", url.alias("url")).to_arrow()
                .cast(pa.schema([("doc_id", pa.int64()),
                                 ("url", pa.string())])))

    return docs.map_batches(mk, batch_format="pyarrow")


MESSY_URLS_SQL = """
SELECT doc_id,
  CASE doc_id % 4
    WHEN 0 THEN 'https://WWW.site' || CAST((doc_id // 2) % 7 AS VARCHAR)
                || '.example.org/doc/'
                || CAST(doc_id // 2 AS VARCHAR) || '/'
    WHEN 1 THEN 'https://site' || CAST((doc_id // 2) % 7 AS VARCHAR)
                || '.example.org/doc/'
                || CAST(doc_id // 2 AS VARCHAR)
                || '?utm_source=feed'
    WHEN 2 THEN 'https://site' || CAST((doc_id // 2) % 7 AS VARCHAR)
                || '.example.org/doc/'
                || CAST(doc_id // 2 AS VARCHAR) || '#section-2'
    ELSE 'https://site' || CAST((doc_id // 2) % 7 AS VARCHAR)
         || '.example.org/doc/'
         || CAST(doc_id // 2 AS VARCHAR) || '?b=2&a=1&utm_x=1'
  END AS url
FROM documents
"""


def canonicalize_url_column(batch: pa.Table, col: str = "url"
                            ) -> pa.Array:
    """Vectorized URL canonicalizer (the reusable operator): lowercase
    scheme+host, strip one leading 'www.', drop the fragment, strip a
    trailing path slash (keeping a bare '/'), drop utm_* tracking
    params, sort the remaining query params. Polars list kernels do the
    per-row param work — no Python loop over rows."""
    import polars as pl
    urls = batch[col].combine_chunks().cast(pa.string())
    parts = pc.extract_regex(
        urls, r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
              r"(?P<host>[^/?#]*)(?P<path>[^?#]*)"
              r"(?P<q>\?[^#]*)?(?P<frag>#.*)?$")
    df = pl.from_arrow(pa.table({
        "scheme": pc.struct_field(parts, "scheme"),
        "host": pc.struct_field(parts, "host"),
        "path": pc.struct_field(parts, "path"),
        "q": pc.struct_field(parts, "q"),
    }))
    host = (pl.col("host").str.to_lowercase()
            .str.replace(r"^www\.", ""))
    path = (pl.col("path")
            .str.replace(r"/$", "")
            .replace("", "/"))
    # '?a=1&b=2' -> ['a=1','b=2'] minus utm_*, sorted, rejoined
    params = (pl.col("q").str.strip_prefix("?")
              .str.split("&")
              .list.eval(pl.element()
                         .filter(~pl.element().str.starts_with("utm_")
                                 & (pl.element() != "")))
              .list.sort())
    query = (pl.when(params.list.len() > 0)
             .then("?" + params.list.join("&"))
             .otherwise(pl.lit("")))
    out = df.select(
        (pl.col("scheme").str.to_lowercase() + "://" + host + path
         + query.fill_null("")).alias("canon"))
    arr = out["canon"].to_arrow()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr.cast(pa.string())


def url_canonical_dedup(sf_dir: str, num_buckets: int | None = None
                        ) -> "ray.data.Dataset":
    """(doc_id, canon_url, keep): canonicalize every messy URL, then
    exact-dedup by canonical form keeping the smallest doc_id. Per-batch
    (canon, min_id) combiner -> ONE hash(canon)-bucket min -> broadcast-
    free fill: the winner table returns on the SAME bucket key, so
    membership is decided in-bucket."""
    import polars as pl
    if num_buckets is None:
        from ..stages.dedup import default_num_buckets
        num_buckets = default_num_buckets()
    urls = build_messy_urls(sf_dir)
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("canon_url", pa.string()),
                            ("keep", pa.int64())])

    def canon(batch: pa.Table) -> pa.Table:
        c = canonicalize_url_column(batch)
        t = pa.table({
            "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "canon_url": c})
        return t.append_column("_cb", _md5_arr_mod(c, num_buckets))

    def per_bucket(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.drop_columns(["_cb"]))
        win = df.group_by("canon_url").agg(
            pl.col("doc_id").min().alias("keep_doc"))
        j = df.join(win, on="canon_url", how="inner")
        return (j.with_columns(
                    (pl.col("doc_id") == pl.col("keep_doc"))
                    .cast(pl.Int64).alias("keep"))
                .select(["doc_id", "canon_url", "keep"])
                .to_arrow().cast(out_schema))

    from . import ensure_schema
    return ensure_schema(
        urls.map_batches(canon, batch_format="pyarrow")
        .groupby("_cb").map_groups(per_bucket, batch_format="pyarrow"),
        out_schema)


def _md5_arr_mod(arr: pa.Array, num_buckets: int) -> pa.Array:
    enc = pc.dictionary_encode(arr)
    uniq = [int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "little")
            % num_buckets
            for u in enc.dictionary.to_pylist()]
    return pa.array(uniq, pa.int32()).take(enc.indices)


def url_canonical_dedup_sql() -> str:
    """DuckDB mirror of the canonicalizer: same regex split, same
    lowercase / www / fragment / trailing-slash / utm / sort rules via
    list kernels, then min-doc_id per canonical."""
    return f"""
WITH messy AS ({MESSY_URLS_SQL}),
parts AS (
  SELECT doc_id,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
             AS scheme,
         lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
             AS rawhost,
         regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
         regexp_extract(url, '\\?([^#]*)', 1) AS rawq
  FROM messy
),
canon AS (
  SELECT doc_id,
     scheme || '://' || regexp_replace(rawhost, '^www\\.', '')
     || (CASE WHEN regexp_replace(rawpath, '/$', '') = '' THEN '/'
              ELSE regexp_replace(rawpath, '/$', '') END)
     || (CASE WHEN len(list_sort(list_filter(string_split(rawq, '&'),
                  x -> NOT starts_with(x, 'utm_') AND x != ''))) > 0
          THEN '?' || array_to_string(list_sort(list_filter(
                  string_split(rawq, '&'),
                  x -> NOT starts_with(x, 'utm_') AND x != '')), '&')
          ELSE '' END) AS canon_url
  FROM parts
)
SELECT doc_id, canon_url,
       CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY canon_url)
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM canon
"""
