"""On-disk inverted text index, partitioned by token hash — the text
twin of the IVF vector index (ops/ann.py build_ivf_index).

BUILD writes the tokenized corpus as Parquet PARTITIONED BY
``tok_bucket = md5(token) % n_buckets`` (md5 so bucket placement is
stable across library versions — the index outlives the process that
built it). Per-batch distinct (token, doc_id) pairs are the combiner;
global duplicates across blocks are tolerated in the layout and
collapsed by the query's count-distinct, so the build needs NO global
shuffle at all — it is a single streaming pass over the corpus.

SEARCH (conjunctive / AND-of-terms) reads ONLY the partition
directories the query terms hash into — at 100 TB the scan is
``len(terms)/n_buckets`` of the index, not the corpus — filters to the
exact terms, and keeps doc_ids whose distinct matched-term count
equals the term count. The count-distinct is a per-batch (doc, token)
combiner followed by one hash(doc_id) groupby of pair partials.

Index freshness follows the IVF discipline exactly: a content
fingerprint (per-file size+mtime) is stored in the _SUCCESS marker; a
stale marker or a marker-less (crashed-build) directory is removed
before rebuilding so re-runs never append duplicate files.
"""

from __future__ import annotations

import glob
import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.readers import read_table

N_TOKEN_BUCKETS = 16
DEFAULT_TERMS = ("spark", "vector", "dup")


def _token_bucket(tokens: list[str], n_buckets: int) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
         % n_buckets for t in tokens], dtype=np.int32)


class _Tokenize:
    """(doc_id, text) -> distinct (token, doc_id, tok_bucket) pairs.
    Arrow split kernel + list_parent_indices; per-batch distinct via
    polars; md5 bucket computed per UNIQUE token (tiny lexicons hash
    once, not once per posting)."""

    def __init__(self, n_buckets: int):
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        text = batch["text"].combine_chunks().cast(pa.string())
        ids = batch["doc_id"].combine_chunks()
        split = pc.split_pattern(text, pattern=" ")
        flat = split.flatten()
        parents = pc.list_parent_indices(split)
        mask = pc.greater(pc.utf8_length(flat), 0)
        pairs = pl.from_arrow(pa.table({
            "token": flat.filter(mask),
            "doc_id": ids.take(parents.filter(mask)),
        })).unique()
        enc = pc.dictionary_encode(pairs["token"].to_arrow())
        tb = pa.array(_token_bucket(enc.dictionary.to_pylist(),
                                    self.n_buckets)).take(enc.indices)
        return pa.table({
            "token": pairs["token"].to_arrow(),
            "doc_id": pairs["doc_id"].to_arrow().cast(pa.int64()),
            "tok_bucket": tb.cast(pa.int32()),
        })


def build_text_index(sf_dir: str, index_dir: str | None = None,
                     n_buckets: int = N_TOKEN_BUCKETS) -> str:
    src = sorted(glob.glob(os.path.join(sf_dir, "documents*.parquet")) +
                 glob.glob(os.path.join(sf_dir, "documents", "*.parquet")))
    stamp = ";".join(f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p):.6f}"
                     for p in src)
    content_key = hashlib.md5(stamp.encode()).hexdigest()[:12]
    if index_dir is None:
        key = hashlib.md5(
            f"{os.path.abspath(sf_dir)}:{n_buckets}:{content_key}".encode())
        index_dir = f"/tmp/kgforge_txtidx_{key.hexdigest()[:12]}"
    marker = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == content_key:
                return index_dir
        shutil.rmtree(index_dir)       # stale: source changed
    elif os.path.isdir(index_dir):
        shutil.rmtree(index_dir)       # crashed build: never append
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    postings = ds.map_batches(_Tokenize(n_buckets), batch_format="pyarrow")
    postings.write_parquet(os.path.join(index_dir, "postings"),
                           partition_cols=["tok_bucket"])
    with open(marker, "w") as f:
        f.write(content_key)
    return index_dir


def search_all_terms(sf_dir: str, terms: tuple[str, ...] = DEFAULT_TERMS,
                     n_buckets: int = N_TOKEN_BUCKETS,
                     index_dir: str | None = None) -> "ray.data.Dataset":
    """doc_ids containing ALL query terms (whitespace tokens), answered
    from the partition-pruned inverted index."""
    terms = tuple(dict.fromkeys(terms))   # dedupe, keep order
    index_dir = build_text_index(sf_dir, index_dir, n_buckets)
    buckets = sorted(set(_token_bucket(list(terms), n_buckets).tolist()))
    paths = [f for b in buckets for f in sorted(glob.glob(os.path.join(
        index_dir, "postings", f"tok_bucket={b}", "*.parquet")))]
    if not paths:   # no query term's bucket exists in the corpus
        return ray.data.from_arrow(
            pa.schema([("doc_id", pa.int64())]).empty_table())
    postings = ray.data.read_parquet(paths, columns=["token", "doc_id"])
    term_set = pa.array(list(terms), type=pa.string())
    n_terms = len(terms)

    from ..stages.dedup import default_num_buckets
    num_buckets = default_num_buckets()

    def match_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        hit = batch.filter(pc.is_in(batch["token"].combine_chunks(),
                                    value_set=term_set))
        pairs = pl.from_arrow(hit).unique()
        ids = pairs["doc_id"].cast(pl.Int64)
        return pairs.with_columns(
            (ids % num_buckets).cast(pl.Int32).alias("_bucket")) \
            .to_arrow().cast(pa.schema([
                ("token", pa.string()), ("doc_id", pa.int64()),
                ("_bucket", pa.int32())]))

    def finish(group: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(group.drop_columns(["_bucket"]))
        agg = df.unique().group_by("doc_id").len()
        out = agg.filter(pl.col("len") == n_terms).select("doc_id")
        return out.to_arrow().cast(pa.schema([("doc_id", pa.int64())]))

    # one doc-bucket shuffle of term-filtered pairs (≤ n_terms rows per
    # matching doc cross the wire), then a C-level per-bucket rollup
    from . import ensure_schema
    return ensure_schema(
        postings.map_batches(match_partial, batch_format="pyarrow")
        .groupby("_bucket").map_groups(finish, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64())]))


def text_search(sf_dir: str) -> "ray.data.Dataset":
    return search_all_terms(sf_dir)


def text_search_sql(terms: tuple[str, ...] = DEFAULT_TERMS) -> str:
    lst = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
SELECT doc_id FROM documents
WHERE list_has_all(string_split(text, ' '), [{lst}])
"""


def text_search_ranked(sf_dir: str,
                       terms: tuple[str, ...] = DEFAULT_TERMS,
                       k: int = 20, n_buckets: int = N_TOKEN_BUCKETS,
                       index_dir: str | None = None) -> "ray.data.Dataset":
    """Disjunctive (OR) search with match-count ranking: top-k docs by
    number of DISTINCT query terms present (ties: doc_id asc). Same
    partition-pruned read as the conjunctive path; ranking adds a
    per-bucket top-k combiner + one bounded reduce — never a global
    sort. All-integer scores, so the SQL mirror is exact."""
    terms = tuple(dict.fromkeys(terms))
    index_dir = build_text_index(sf_dir, index_dir, n_buckets)
    buckets = sorted(set(_token_bucket(list(terms), n_buckets).tolist()))
    paths = [f for b in buckets for f in sorted(glob.glob(os.path.join(
        index_dir, "postings", f"tok_bucket={b}", "*.parquet")))]
    if not paths:
        return ray.data.from_arrow(pa.schema([
            ("doc_id", pa.int64()),
            ("n_matched", pa.int64())]).empty_table())
    postings = ray.data.read_parquet(paths, columns=["token", "doc_id"])
    term_set = pa.array(list(terms), type=pa.string())

    from ..stages.dedup import default_num_buckets
    num_buckets = default_num_buckets()

    def match_partial(batch: pa.Table) -> pa.Table:
        import polars as pl
        hit = batch.filter(pc.is_in(batch["token"].combine_chunks(),
                                    value_set=term_set))
        pairs = pl.from_arrow(hit).unique()
        ids = pairs["doc_id"].cast(pl.Int64)
        return pairs.with_columns(
            (ids % num_buckets).cast(pl.Int32).alias("_bucket")) \
            .to_arrow().cast(pa.schema([
                ("token", pa.string()), ("doc_id", pa.int64()),
                ("_bucket", pa.int32())]))

    def bucket_topk(group: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(group.drop_columns(["_bucket"])).unique()
        agg = (df.group_by("doc_id").len()
               .rename({"len": "n_matched"})
               .with_columns(pl.col("n_matched").cast(pl.Int64))
               .sort(["n_matched", "doc_id"], descending=[True, False])
               .head(k))
        return agg.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_matched", pa.int64())]))

    partials = (postings.map_batches(match_partial, batch_format="pyarrow")
                .groupby("_bucket").map_groups(bucket_topk,
                                               batch_format="pyarrow"))

    def reduce_topk(batch: pa.Table) -> pa.Table:
        import polars as pl
        return (pl.from_arrow(batch)
                .sort(["n_matched", "doc_id"], descending=[True, False])
                .head(k).to_arrow())

    # bounded reduce: <= k rows per bucket reach the single final block
    from . import ensure_schema
    partials = ensure_schema(partials, pa.schema([
        ("doc_id", pa.int64()), ("n_matched", pa.int64())]))
    return partials.repartition(1).map_batches(reduce_topk,
                                               batch_size=None,
                                               batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BM25-style ranked retrieval (exact integer arithmetic)
# ---------------------------------------------------------------------------

BM25_SCALE = 1000  # fixed-point scale for integer scores


class _TokenizeTf:
    """(doc_id, text) -> (token, doc_id, tf, tok_bucket). Exact per-doc
    term frequencies in ONE streaming pass: a document's text lives in a
    single row, so a per-batch (token, doc) count is already the global
    tf — the tf index build, like the boolean one, needs no shuffle."""

    def __init__(self, n_buckets: int):
        self.n_buckets = n_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        text = batch["text"].combine_chunks().cast(pa.string())
        ids = batch["doc_id"].combine_chunks()
        split = pc.split_pattern(text, pattern=" ")
        flat = split.flatten()
        parents = pc.list_parent_indices(split)
        mask = pc.greater(pc.utf8_length(flat), 0)
        pairs = pl.from_arrow(pa.table({
            "token": flat.filter(mask),
            "doc_id": ids.take(parents.filter(mask)),
        })).group_by(["token", "doc_id"]).len().rename({"len": "tf"})
        enc = pc.dictionary_encode(pairs["token"].to_arrow())
        tb = pa.array(_token_bucket(enc.dictionary.to_pylist(),
                                    self.n_buckets)).take(enc.indices)
        return pa.table({
            "token": pairs["token"].to_arrow(),
            "doc_id": pairs["doc_id"].to_arrow().cast(pa.int64()),
            "tf": pairs["tf"].to_arrow().cast(pa.int64()),
            "tok_bucket": tb.cast(pa.int32()),
        })


def _doclen(batch: pa.Table) -> pa.Table:
    split = pc.split_pattern(
        batch["text"].combine_chunks().cast(pa.string()), pattern=" ")
    flat = split.flatten()
    parents = pc.list_parent_indices(split)
    keep = parents.filter(pc.greater(pc.utf8_length(flat), 0))
    counts = pc.value_counts(keep)
    dl = np.zeros(batch.num_rows, dtype=np.int64)
    dl[counts.field("values").to_numpy(zero_copy_only=False)] = \
        counts.field("counts").to_numpy(zero_copy_only=False)
    return pa.table({
        "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
        "dl": pa.array(dl, pa.int64())})


def build_text_index_tf(sf_dir: str, index_dir: str | None = None,
                        n_buckets: int = N_TOKEN_BUCKETS) -> str:
    """Like build_text_index, plus per-posting term frequency and a
    side `doclen/` table (doc_id, dl) — everything BM25 needs. Same
    content-fingerprint freshness discipline."""
    src = sorted(glob.glob(os.path.join(sf_dir, "documents*.parquet")) +
                 glob.glob(os.path.join(sf_dir, "documents", "*.parquet")))
    stamp = ";".join(f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p):.6f}"
                     for p in src)
    content_key = "tf1:" + hashlib.md5(stamp.encode()).hexdigest()[:12]
    if index_dir is None:
        key = hashlib.md5(
            f"{os.path.abspath(sf_dir)}:tf:{n_buckets}:{content_key}"
            .encode())
        index_dir = f"/tmp/kgforge_txtidx_{key.hexdigest()[:12]}"
    marker = os.path.join(index_dir, "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == content_key:
                return index_dir
        shutil.rmtree(index_dir)
    elif os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    ds.map_batches(_TokenizeTf(n_buckets), batch_format="pyarrow") \
        .write_parquet(os.path.join(index_dir, "postings"),
                       partition_cols=["tok_bucket"])
    read_table(sf_dir, "documents", columns=["doc_id", "text"]) \
        .map_batches(_doclen, batch_format="pyarrow") \
        .write_parquet(os.path.join(index_dir, "doclen"))
    with open(marker, "w") as f:
        f.write(content_key)
    return index_dir


def bm25_score_expr(tf, dl, df, n_docs: int, total_len: int):
    """Integer BM25 contribution of one (term, doc) posting. k1=1.2,
    b=0.75 folded into one rational expression (see bm25_search); all
    numpy int64 (object ints in the oracle). Floor division LAST so the
    engine and the SQL mirror round identically."""
    num = BM25_SCALE * 44 * total_len * tf * (2 * n_docs - 2 * df + 1)
    den = (20 * total_len * tf + 6 * total_len + 18 * dl * n_docs) \
        * (2 * df + 1)
    return num // den


def bm25_search(sf_dir: str, terms: tuple[str, ...] = DEFAULT_TERMS,
                k: int = 20, n_buckets: int = N_TOKEN_BUCKETS,
                index_dir: str | None = None) -> "ray.data.Dataset":
    """Top-k OR-of-terms retrieval ranked by an exact-integer BM25.

    The classic BM25 (k1=1.2, b=0.75) has two float hazards — ln() in
    the idf and the avgdl division — that make cross-engine hash
    equality impossible. Both are replaced by exact rationals with the
    SAME monotone shape: idf' = (N - df + 1/2)/(df + 1/2) (the argument
    of BM25+'s log — order-preserving in df), and dl/avgdl = dl·N/L with
    L = Σdl kept as an integer pair. With k1 = 6/5, b = 3/4:

        tf_part = 44·L·tf / (20·L·tf + 6·L + 18·dl·N)
        score  += SCALE · tf_part · (2N - 2df + 1) / (2df + 1)

    evaluated in one integer floor division, summed over matched terms.
    int64 bound: SCALE·44·L·tf·(2N+1) must stay < 2^63 — fine to ~10^5
    docs at SCALE=1000; the oracle mirrors with HUGEINT so an overflow
    would show as a gate mismatch, not silent corruption.

    Plan: partition-pruned postings read (only the terms' tok_bucket=
    dirs); df per term via a tiny driver collect (≤ n_terms rows);
    ONE hash(doc_id) bucket shuffle of the tagged union of term hits and
    doc lengths; per bucket: C-level join + vectorized scoring + top-k
    combiner; bounded final reduce. N and L are streaming aggregates
    over the doclen table."""
    import polars as pl
    terms = tuple(dict.fromkeys(terms))
    index_dir = build_text_index_tf(sf_dir, index_dir, n_buckets)
    out_schema = pa.schema([("doc_id", pa.int64()), ("score", pa.int64())])
    buckets = sorted(set(_token_bucket(list(terms), n_buckets).tolist()))
    paths = [f for b in buckets for f in sorted(glob.glob(os.path.join(
        index_dir, "postings", f"tok_bucket={b}", "*.parquet")))]
    doclen = ray.data.read_parquet(os.path.join(index_dir, "doclen"))
    if not paths:
        return ray.data.from_arrow(out_schema.empty_table())
    term_set = pa.array(list(terms), type=pa.string())

    def hits_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["token"].combine_chunks(),
                                     value_set=term_set))

    hits = ray.data.read_parquet(paths, columns=["token", "doc_id", "tf"]) \
        .map_batches(hits_only, batch_format="pyarrow")

    # corpus stats: two streaming scalar aggregates + a tiny df table
    from ray.data.aggregate import Count, Sum
    stats = doclen.aggregate(Count(), Sum("dl", alias_name="L"))
    n_docs, total_len = int(stats["count()"]), int(stats["L"])
    df_rows = (hits.groupby("token").count().take_all())
    df_map = {r["token"]: int(r["count()"]) for r in df_rows}
    if not df_map:
        return ray.data.from_arrow(out_schema.empty_table())

    from ..stages.dedup import default_num_buckets
    num_buckets = default_num_buckets()

    def tag_hit(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.select(["doc_id", "token", "tf"])
        t = t.append_column("dl", pa.nulls(batch.num_rows, pa.int64()))
        return t.append_column("_bucket", pa.array(
            (ids % num_buckets).astype(np.int32)))

    def tag_dl(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.select(["doc_id"])
        t = t.append_column("token", pa.nulls(batch.num_rows, pa.string()))
        t = t.append_column("tf", pa.nulls(batch.num_rows, pa.int64()))
        t = t.append_column("dl", batch["dl"].combine_chunks())
        return t.append_column("_bucket", pa.array(
            (ids % num_buckets).astype(np.int32)))

    def bucket_score(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.drop_columns(["_bucket"]))
        h = df.filter(pl.col("dl").is_null()).select(
            ["doc_id", "token", "tf"])
        if h.height == 0:
            return out_schema.empty_table()
        d = df.filter(pl.col("dl").is_not_null()).select(["doc_id", "dl"])
        j = h.join(d, on="doc_id", how="inner")
        dfv = (j.select(pl.col("token").replace_strict(
                   df_map, return_dtype=pl.Int64))
               ["token"].to_numpy())
        score = bm25_score_expr(
            j["tf"].to_numpy(), j["dl"].to_numpy(), dfv,
            n_docs, total_len)
        scored = (j.select("doc_id")
                  .with_columns(pl.Series("score", score,
                                          dtype=pl.Int64))
                  .group_by("doc_id").agg(pl.col("score").sum())
                  .sort(["score", "doc_id"], descending=[True, False])
                  .head(k))
        return scored.to_arrow().cast(out_schema)

    partials = (hits.map_batches(tag_hit, batch_format="pyarrow")
                .union(doclen.map_batches(tag_dl, batch_format="pyarrow"))
                .groupby("_bucket").map_groups(bucket_score,
                                               batch_format="pyarrow"))

    def reduce_topk(batch: pa.Table) -> pa.Table:
        return (pl.from_arrow(batch)
                .sort(["score", "doc_id"], descending=[True, False])
                .head(k).to_arrow().cast(out_schema))

    from . import ensure_schema
    partials = ensure_schema(partials, out_schema)
    return partials.repartition(1).map_batches(
        reduce_topk, batch_size=None, batch_format="pyarrow")


def bm25_search_sql(terms: tuple[str, ...] = DEFAULT_TERMS,
                    k: int = 20) -> str:
    """DuckDB mirror: same integer formula over HUGEINT (so the int64
    bound documented on bm25_search is oracle-checked, not assumed)."""
    terms = tuple(dict.fromkeys(terms))
    lst = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, t.tok AS token
  FROM documents,
       unnest(string_split(text, ' ')) AS t(tok)
  WHERE len(t.tok) > 0
),
-- dl comes from the documents ROWS, not the exploded tokens: an
-- all-empty doc still counts toward N with dl = 0 (engine semantics)
dl AS (SELECT doc_id,
              CAST(len(list_filter(string_split(text, ' '),
                                   x -> len(x) > 0)) AS HUGEINT) AS dl
       FROM documents),
corp AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                CAST(sum(dl) AS HUGEINT) AS l FROM dl),
tf AS (SELECT doc_id, token, CAST(count(*) AS HUGEINT) AS tf
       FROM toks WHERE token IN ({lst}) GROUP BY doc_id, token),
dfreq AS (SELECT token, CAST(count(*) AS HUGEINT) AS df
          FROM tf GROUP BY token),
contrib AS (
  SELECT tf.doc_id,
         ({BM25_SCALE} * 44 * corp.l * tf.tf
            * (2*corp.n - 2*dfreq.df + 1))
         // ((20*corp.l*tf.tf + 6*corp.l + 18*dl.dl*corp.n)
             * (2*dfreq.df + 1)) AS s
  FROM tf
  JOIN dfreq USING (token)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN corp
)
SELECT doc_id, CAST(sum(s) AS BIGINT) AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def text_search_ranked_sql(terms: tuple[str, ...] = DEFAULT_TERMS,
                           k: int = 20) -> str:
    terms = tuple(dict.fromkeys(terms))
    lst = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH scored AS (
  SELECT doc_id,
         CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                                 [{lst}])) AS BIGINT) AS n_matched
  FROM documents
)
SELECT doc_id, n_matched FROM scored WHERE n_matched > 0
ORDER BY n_matched DESC, doc_id ASC LIMIT {k}
"""
