"""Text-analysis operators over a documents table — language ID, quality
signals, token counting, fingerprinting.

Engine side is pyarrow RE2 kernels (count_substring_regex etc.); the SQL
oracles use DuckDB's RE2 with the SAME patterns, so counts match by
construction. All emitted measures are integers (float-free → stable
value hashes across engines).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.readers import read_table

# RE2-safe, shared with the SQL oracles verbatim
TOKEN_RE = "[^ ]+"                       # whitespace tokens (corpus uses single spaces)
BPE_ISH_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"   # crude BPE-ish word/number/punct split
STOPWORD_RE = "\\b(the|a|and|of|to)\\b"
UPPER_RE = "[A-Z]"
DIGIT_RE = "[0-9]"
PUNCT_RE = "[^A-Za-z0-9 ]"

# tiny marker lexicons per language for the n-gram-free heuristic;
# scoring = marker hit count, argmax with fixed tie order (en first)
LANG_MARKERS = {
    "en": "\\b(the|and|of|a)\\b",
    "de": "\\b(der|die|und|das)\\b",
    "fr": "\\b(le|la|et|les)\\b",
    "es": "\\b(el|los|y|una)\\b",
}
LANG_ORDER = ["en", "de", "fr", "es"]


def _count(arr: pa.Array, pattern: str) -> pa.Array:
    return pc.count_substring_regex(arr, pattern=pattern)


class TextStats:
    """doc_id + integer quality/counting signals, one row per doc."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks().cast(pa.string())
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars_measured": pc.utf8_length(text).cast(pa.int64()),
            "n_tokens": _count(text, TOKEN_RE).cast(pa.int64()),
            "n_bpe_tokens": _count(text, BPE_ISH_RE).cast(pa.int64()),
            "n_stopwords": _count(text, STOPWORD_RE).cast(pa.int64()),
            "n_digits": _count(text, DIGIT_RE).cast(pa.int64()),
            "n_punct": _count(text, PUNCT_RE).cast(pa.int64()),
        })


TEXT_STATS_SQL = f"""
SELECT doc_id,
       length(text) AS n_chars_measured,
       CAST(length(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT) AS n_tokens,
       CAST(length(regexp_extract_all(text, '{BPE_ISH_RE}')) AS BIGINT) AS n_bpe_tokens,
       CAST(length(regexp_extract_all(text, '{STOPWORD_RE}')) AS BIGINT) AS n_stopwords,
       CAST(length(regexp_extract_all(text, '{DIGIT_RE}')) AS BIGINT) AS n_digits,
       CAST(length(regexp_extract_all(text, '{PUNCT_RE}')) AS BIGINT) AS n_punct
FROM documents
"""


def text_stats(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(TextStats(), batch_format="pyarrow")


def quality_filter(sf_dir: str, min_tokens: int = 5,
                   max_tokens: int = 1_000_000, min_stop_bp: int = 100,
                   max_punct_bp: int = 3000) -> "ray.data.Dataset":
    """Training-data quality gate: keep documents whose token count is
    in [min_tokens, max_tokens], stopword ratio ≥ min_stop_bp basis
    points, punctuation ratio ≤ max_punct_bp basis points of tokens.
    Ratio tests use pure integer cross-multiplication (no floats), so
    engine and SQL agree exactly. Streams: stats + filter fuse into the
    read — rejected rows never leave the worker."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    stats = TextStats()

    def fn(batch: pa.Table) -> pa.Table:
        t = stats(batch)
        n_tok = t["n_tokens"]
        keep = pc.and_(
            pc.and_(pc.greater_equal(n_tok, min_tokens),
                    pc.less_equal(n_tok, max_tokens)),
            pc.and_(
                pc.greater_equal(
                    pc.multiply(t["n_stopwords"], pa.scalar(10000)),
                    pc.multiply(n_tok, pa.scalar(min_stop_bp))),
                pc.less_equal(
                    pc.multiply(t["n_punct"], pa.scalar(10000)),
                    pc.multiply(n_tok, pa.scalar(max_punct_bp)))))
        return t.select(["doc_id", "n_tokens", "n_stopwords",
                         "n_punct"]).filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow")


def quality_filter_sql(min_tokens: int = 5, max_tokens: int = 1_000_000,
                       min_stop_bp: int = 100,
                       max_punct_bp: int = 3000) -> str:
    return f"""
SELECT doc_id, n_tokens, n_stopwords, n_punct FROM ({TEXT_STATS_SQL})
WHERE n_tokens BETWEEN {min_tokens} AND {max_tokens}
  AND n_stopwords * 10000 >= n_tokens * {min_stop_bp}
  AND n_punct * 10000 <= n_tokens * {max_punct_bp}
"""


def vocab_topk(sf_dir: str, k: int = 50) -> "ray.data.Dataset":
    """Corpus vocabulary head: top-k whitespace tokens by frequency
    (rank, token, n) — the first step of any tokenizer-training or
    stopword-mining pass. Per-batch Arrow group_by counts (combiner)
    → one small groupby over the VOCABULARY (not the token stream) →
    per-batch top-k + tiny driver reduce. Ties break (n desc, token
    asc) on both engine and SQL sides."""
    from ray.data.aggregate import Sum

    from .relational import topk_rows
    ds = read_table(sf_dir, "documents", columns=["text"])

    def partial(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks().cast(pa.string())
        split = pc.split_pattern(text, pattern=" ")
        flat = split.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        t = pa.table({"token": flat})
        return t.group_by(["token"]).aggregate([("token", "count")])

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("token")
           .aggregate(Sum("token_count", alias_name="n")))

    def clean(batch: pa.Table) -> pa.Table:
        return pa.table({"token": batch["token"],
                         "n": batch["n"].cast(pa.int64())})

    top = topk_rows(agg.map_batches(clean, batch_format="pyarrow"),
                    k, ["n", "token"], [False, True])
    import numpy as np
    import ray.data as rd
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return rd.from_pandas(top[["rank", "token", "n"]])


def vocab_topk_sql(k: int = 50) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM toks
  WHERE token <> '' GROUP BY token
)
SELECT CAST(row_number() OVER (ORDER BY n DESC, token ASC) AS BIGINT)
           AS rank, token, n
FROM counts ORDER BY n DESC, token ASC LIMIT {k}
"""


def token_id_stats(sf_dir: str, vocab_k: int = 100) -> "ray.data.Dataset":
    """Tokenize-to-ids dry run: map every token to its vocabulary rank
    (top-``vocab_k`` by frequency; out-of-vocabulary → 0) and emit the
    per-doc accounting a tokenizer pipeline needs — (doc_id, n_tokens,
    n_oov, ids_sum). The vocabulary is the classic SMALL side: built
    once (itself a distributed count), shipped via ray.put, applied as
    a dictionary-unique lookup per batch. ids_sum is a checksum of the
    full id sequence, so the oracle catches any mis-mapped token."""
    import ray
    vocab_df = vocab_topk(sf_dir, vocab_k).to_pandas()
    ref = ray.put(dict(zip(vocab_df["token"], vocab_df["rank"])))
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        v = ray.get(ref)
        text = batch["text"].combine_chunks().cast(pa.string())
        split = pc.split_pattern(text, pattern=" ")
        flat = split.flatten()
        nonempty = pc.not_equal(flat, "")
        flat = flat.filter(nonempty)
        par = (pc.list_parent_indices(split).filter(nonempty)
               .to_numpy(zero_copy_only=False))
        enc = pc.dictionary_encode(flat)
        uniq_ids = np.array([v.get(t, 0) for t in
                             enc.dictionary.to_pylist()], dtype=np.int64)
        ids = uniq_ids[enc.indices.to_numpy(zero_copy_only=False)]
        n = len(text)
        n_tokens = np.bincount(par, minlength=n)
        oov = np.bincount(par, weights=(ids == 0).astype(np.float64),
                          minlength=n).astype(np.int64)
        sums = np.bincount(par, weights=ids.astype(np.float64),
                           minlength=n).astype(np.int64)
        have = n_tokens > 0               # docs with no tokens drop out
        doc_ids = (batch["doc_id"].combine_chunks().cast(pa.int64())
                   .to_numpy(zero_copy_only=False))
        return pa.table({
            "doc_id": pa.array(doc_ids[have], type=pa.int64()),
            "n_tokens": pa.array(n_tokens[have], type=pa.int64()),
            "n_oov": pa.array(oov[have], type=pa.int64()),
            "ids_sum": pa.array(sums[have], type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def token_id_stats_sql(vocab_k: int = 100) -> str:
    return f"""
WITH vocab AS ({vocab_topk_sql(vocab_k)}),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (WHERE v.rank IS NULL) AS BIGINT) AS n_oov,
       CAST(sum(COALESCE(v.rank, 0)) AS BIGINT) AS ids_sum
FROM toks t LEFT JOIN vocab v ON t.token = v.token
WHERE t.token <> ''
GROUP BY t.doc_id
"""


SPLIT_MULT = 2654435761        # Knuth multiplicative hash constant


def dataset_split(sf_dir: str, val_pct: int = 5, test_pct: int = 5
                  ) -> "ray.data.Dataset":
    """Deterministic train/val/test assignment: bucket = Knuth
    multiplicative hash of doc_id mod 100 — content-keyed (never row
    position), identical at any parallelism, reproducible in plain SQL.
    Emits (doc_id, bucket, split)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = (batch["doc_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        # uint64: the multiply wraps mod 2^64, which is well-defined and
        # (since 2^32 | 2^64) leaves the mod-2^32 bucket equal to the
        # EXACT product's — so the HUGEINT SQL mirror matches even past
        # doc_id ~3.46e9 where an int64 multiply would overflow.
        # Requires doc_id >= 0.
        bucket = ((ids.astype(np.uint64) * np.uint64(SPLIT_MULT))
                  % np.uint64(1 << 32) % np.uint64(100)).astype(np.int64)
        split = np.where(bucket < test_pct, "test",
                         np.where(bucket < test_pct + val_pct, "val",
                                  "train"))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "bucket": pa.array(bucket, type=pa.int64()),
            "split": pa.array(split.tolist(), type=pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def dataset_split_sql(val_pct: int = 5, test_pct: int = 5) -> str:
    # HUGEINT: exact product, mod 2^32 — equals the engine's uint64-wrap
    # bucket for any doc_id >= 0 (see dataset_split)
    b = f"((CAST(doc_id AS HUGEINT) * {SPLIT_MULT}) % 4294967296) % 100"
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST({b} AS BIGINT) AS bucket,
       CASE WHEN {b} < {test_pct} THEN 'test'
            WHEN {b} < {test_pct + val_pct} THEN 'val'
            ELSE 'train' END AS split
FROM documents
"""


class LangId:
    """Marker-lexicon language ID; deterministic argmax (ties → LANG_ORDER).
    Emits predicted lang + per-lang scores (integers)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks().cast(pa.string())
        scores = {l: _count(text, p).cast(pa.int64())
                  for l, p in LANG_MARKERS.items()}
        n = len(text)
        best = np.full(n, "und", dtype=object)
        best_score = np.zeros(n, dtype=np.int64)
        for lang in LANG_ORDER:  # fixed order → deterministic tie-break
            s = scores[lang].to_numpy(zero_copy_only=False)
            win = s > best_score
            best[win] = lang
            best_score[win] = s[win]
        out = {"doc_id": batch["doc_id"],
               "pred_lang": pa.array(best.tolist(), type=pa.string())}
        for lang in LANG_ORDER:
            out[f"score_{lang}"] = scores[lang]
        return pa.table(out)


def _langid_sql() -> str:
    score = {l: f"CAST(length(regexp_extract_all(text, '{p}')) AS BIGINT)"
             for l, p in LANG_MARKERS.items()}
    # argmax with fixed priority order: strictly-greater beats earlier langs
    cases = []
    for i, lang in enumerate(LANG_ORDER):
        conds = [f"{score[lang]} > 0"]
        for j, other in enumerate(LANG_ORDER):
            if j < i:
                conds.append(f"{score[lang]} > {score[other]}")
            elif j > i:
                conds.append(f"{score[lang]} >= {score[other]}")
        cases.append("WHEN " + " AND ".join(conds) + f" THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    cols = ", ".join(f"{score[l]} AS score_{l}" for l in LANG_ORDER)
    return f"SELECT doc_id, {case_sql} AS pred_lang, {cols} FROM documents"


LANG_ID_SQL = _langid_sql()


def lang_id(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(LangId(), batch_format="pyarrow")


def lang_token_summary(sf_dir: str) -> "ray.data.Dataset":
    """Grouped rollup: docs + token mass per (lang, source)."""
    from ray.data.aggregate import Count, Sum
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])

    def pre(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks().cast(pa.string())
        return pa.table({
            "lang": batch["lang"], "source": batch["source"],
            "n_tokens": _count(text, TOKEN_RE).cast(pa.int64()),
        })

    return (ds.map_batches(pre, batch_format="pyarrow")
            .groupby(["lang", "source"])
            .aggregate(Count(alias_name="n_docs"),
                       Sum("n_tokens", alias_name="total_tokens")))


LANG_TOKEN_SUMMARY_SQL = f"""
SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(regexp_extract_all(text, '{TOKEN_RE}'))) AS BIGINT)
           AS total_tokens
FROM documents GROUP BY lang, source
"""


class Winnowing:
    """Document fingerprinting: winnowing over rolling k-gram hashes
    (Schleimer et al., SIGMOD 2003 — public algorithm). Emits one row
    per selected fingerprint (doc_id, pos, fp).

    Gram hash = the shared per-unique-token crc32 → multiply-xor rolling
    mix (ops/dedup._mix_kgram — same spec as MinHash shingles), so the
    whole batch vectorizes: flat token hashing, boundary-masked gram
    stream, one global ``sliding_window_view`` argmin with windows that
    cross a doc boundary masked out, and a reduceat-min path for docs
    with fewer grams than the window. No per-doc Python loop. Checked
    against an independent scalar reference (kgforge/scalar_ref.py)."""

    def __init__(self, k: int = 5, window: int = 4):
        self.k = k
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_
        from .dedup import _crc_per_token, _mix_kgram
        texts = batch["text"].combine_chunks().cast(pa.string())
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = len(texts)
        k, w = self.k, self.window
        split = pc_.split_pattern(texts, pattern=" ")
        flat = split.flatten()
        nonempty = pc_.not_equal(flat, "")
        flat = flat.filter(nonempty)
        par = (pc_.list_parent_indices(split).filter(nonempty)
               .to_numpy(zero_copy_only=False))
        counts = np.bincount(par, minlength=n)
        ends = np.cumsum(counts)
        th = _crc_per_token(flat)
        grams = _mix_kgram(th, k) if len(th) >= k else np.zeros(0, np.uint64)
        pos = np.arange(len(grams))
        gram_doc = par[pos] if len(grams) else np.zeros(0, np.int64)
        valid = (pos + k - 1 < ends[gram_doc]) if len(grams) else \
            np.zeros(0, bool)
        grams, gram_doc = grams[valid], gram_doc[valid]
        if not len(grams):
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "pos": pa.array([], type=pa.int64()),
                             "fp": pa.array([], type=pa.int64())})
        g_counts = np.bincount(gram_doc, minlength=n)
        g_ends = np.cumsum(g_counts)
        g_starts = g_ends - g_counts
        sel_parts = []
        # long docs (>= w grams): winnowing windows fully inside one doc
        if len(grams) >= w:
            wpos = np.arange(len(grams) - w + 1)
            ok = gram_doc[wpos] == gram_doc[wpos + w - 1]
            if ok.any():
                sw = np.lib.stride_tricks.sliding_window_view(grams, w)[ok]
                sel_parts.append(np.argmin(sw, axis=1) + wpos[ok])
        # short docs (1..w-1 grams): single first-min fingerprint
        short = (g_counts > 0) & (g_counts < w)
        if short.any():
            # reduceat only over docs WITH grams — a start == len(grams)
            # (gramless docs at the tail) would truncate the previous
            # doc's min segment
            have_g = g_counts > 0
            mins = np.zeros(n, dtype=grams.dtype)
            mins[have_g] = np.minimum.reduceat(grams, g_starts[have_g])
            is_min = grams == mins[gram_doc]
            short_pos = np.flatnonzero(is_min & short[gram_doc])
            # first min per doc: positions are doc-ordered, keep firsts
            _, first = np.unique(gram_doc[short_pos], return_index=True)
            sel_parts.append(short_pos[first])
        sel = np.unique(np.concatenate(sel_parts)) if sel_parts else \
            np.zeros(0, np.int64)
        d = gram_doc[sel]
        return pa.table({
            "doc_id": pa.array(ids[d], type=pa.int64()),
            "pos": pa.array(sel - g_starts[d], type=pa.int64()),
            "fp": pa.array(grams[sel].view(np.int64), type=pa.int64()),
        })


def fingerprints(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(Winnowing(), batch_format="pyarrow")


class FingerprintSummary:
    """Per-doc rollup of the winnowing stream: (doc_id, n_fp, fp_xor,
    fp_min, fp_max, pos_sum). Composes Winnowing INSIDE the same batch
    fn, so one document's fingerprint rows can never be split across
    blocks; the rollup is reduceat over doc runs (fp_xor catches any
    single-value error, which makes this checkable against the scalar
    reference in kgforge/scalar_ref.py)."""

    def __init__(self, k: int = 5, window: int = 4):
        self.win = Winnowing(k, window)

    def __call__(self, batch: pa.Table) -> pa.Table:
        fp = self.win(batch)
        d = fp["doc_id"].to_numpy(zero_copy_only=False)
        if not len(d):
            return pa.table({c: pa.array([], type=pa.int64())
                             for c in ("doc_id", "n_fp", "fp_xor", "fp_min",
                                       "fp_max", "pos_sum")})
        vals = fp["fp"].to_numpy(zero_copy_only=False)
        poss = fp["pos"].to_numpy(zero_copy_only=False)
        change = np.empty(len(d), dtype=bool)
        change[0] = True
        change[1:] = d[1:] != d[:-1]
        starts = np.flatnonzero(change)
        return pa.table({
            "doc_id": pa.array(d[starts], type=pa.int64()),
            "n_fp": pa.array(np.diff(np.append(starts, len(d))),
                             type=pa.int64()),
            "fp_xor": pa.array(np.bitwise_xor.reduceat(vals, starts),
                               type=pa.int64()),
            "fp_min": pa.array(np.minimum.reduceat(vals, starts),
                               type=pa.int64()),
            "fp_max": pa.array(np.maximum.reduceat(vals, starts),
                               type=pa.int64()),
            "pos_sum": pa.array(np.add.reduceat(poss, starts),
                                type=pa.int64()),
        })


def fingerprint_summary(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(FingerprintSummary(), batch_format="pyarrow")


# --------------------------------------------------- stratified sampling
def stratified_sample(sf_dir: str, k: int = 20) -> "ray.data.Dataset":
    """Deterministic stratified sampling: per ``lang`` stratum, the k
    docs with the smallest Knuth multiplicative hash of doc_id
    (tie-break doc_id) — content-keyed, NO RNG, identical at any
    parallelism (resume/rerun-stable training splits). Per-batch top-k
    combiner: each batch forwards at most k × strata rows, the global
    reduce is tiny — never a global sort."""
    import pandas as pd
    ds = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = (batch["doc_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        h = ((ids.astype(np.uint64) * np.uint64(SPLIT_MULT))
             % np.uint64(1 << 32)).astype(np.int64)
        df = pd.DataFrame({"lang": batch["lang"].to_pandas(),
                           "doc_id": ids, "h": h})
        top = (df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
               .groupby("lang", sort=False).head(k))
        return pa.Table.from_pandas(top, preserve_index=False)

    def combine(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        top = (df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
               .groupby("lang", sort=False).head(k))
        return pa.Table.from_pandas(top, preserve_index=False)

    # tree combine: coalesce many per-block partials per task (big
    # batch_size) so the driver reduce sees ≤ k × strata × (a few)
    # rows even at 100k-block corpora, not k × strata × num_blocks
    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .map_batches(combine, batch_format="pyarrow",
                          batch_size=65536))
    frames = [b.to_pandas()
              for b in parts.iter_batches(batch_format="pyarrow")]
    out = (pd.concat(frames, ignore_index=True)
           .sort_values(["lang", "h", "doc_id"], kind="mergesort")
           .groupby("lang", sort=False).head(k)
           .sort_values(["lang", "h", "doc_id"], kind="mergesort")
           .reset_index(drop=True))
    import ray.data
    return ray.data.from_arrow(pa.table({
        "lang": pa.array(out["lang"], type=pa.string()),
        "doc_id": pa.array(out["doc_id"], type=pa.int64()),
        "h": pa.array(out["h"], type=pa.int64())}))


def stratified_sample_sql(k: int = 20) -> str:
    h = f"((CAST(doc_id AS HUGEINT) * {SPLIT_MULT}) % 4294967296)"
    return f"""
SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST({h} AS BIGINT) AS h
FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang ORDER BY {h}, doc_id) AS rn
  FROM documents
) WHERE rn <= {k}
"""


# -------------------------------------------- benchmark decontamination
BENCH_MOD = 97


def contamination_check(sf_dir: str, k: int = 8, bench_mod: int = BENCH_MOD
                        ) -> "ray.data.Dataset":
    """Benchmark decontamination screen — the training-data op that
    keeps eval sets out of the corpus. Documents with
    ``doc_id % bench_mod == 0`` stand in for the benchmark set; every
    OTHER document reports its unique-k-gram overlap against the
    benchmark gram set: (doc_id, n_grams, n_hits, contam_pct).

    Scale shape: the benchmark slice is tiny by construction — its ids
    come from one doc_id column scan and its texts from a
    predicate-pushdown read; the gram set broadcasts ONCE in the task
    closure as a sorted int64 array, and each batch's membership test
    is a vectorized searchsorted against it. The corpus side streams —
    nothing global, no shuffle."""
    import pyarrow.parquet as pq

    from .dedup import _shingle_sets_batch
    ids_col = pq.read_table(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"])["doc_id"].to_pylist()
    bench_ids = [i for i in ids_col if i % bench_mod == 0]
    bench_tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        filters=[("doc_id", "in", bench_ids)])
    bench_sets = _shingle_sets_batch(
        bench_tbl["text"].combine_chunks().cast(pa.string()), k)
    bench = (np.unique(np.concatenate(bench_sets)) if bench_sets
             else np.zeros(0, np.uint64))

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def screen(batch: pa.Table) -> pa.Table:
        ids = (batch["doc_id"].combine_chunks().cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        keep = (ids % bench_mod) != 0
        sub = batch.filter(pa.array(keep))
        sids = ids[keep]
        sets = _shingle_sets_batch(
            sub["text"].combine_chunks().cast(pa.string()), k)
        n_grams, n_hits, pct = [], [], []
        for s in sets:
            n = len(s)
            if n and len(bench):
                idx = np.searchsorted(bench, s)
                idx[idx == len(bench)] = 0
                hits = int((bench[idx] == s).sum())
            else:
                hits = 0
            n_grams.append(n)
            n_hits.append(hits)
            pct.append(int(round(100 * hits / n)) if n else 0)
        return pa.table({
            "doc_id": pa.array(sids, type=pa.int64()),
            "n_grams": pa.array(n_grams, type=pa.int64()),
            "n_hits": pa.array(n_hits, type=pa.int64()),
            "contam_pct": pa.array(pct, type=pa.int64()),
        })

    return ds.map_batches(screen, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Repetition quality signals (Gopher-style, Rae et al. 2021 §A1.1 — public)
# ---------------------------------------------------------------------------

class RepetitionStats:
    """Per-doc repetition signals a training-data quality gate thresholds
    on: total/unique word counts and the mass of the most frequent word
    and word 2-gram. All integers (fractions are downstream division);
    one vectorized polars pass per batch — explode + window shift, no
    Python loop over rows or tokens."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        words = (df.with_columns(pl.col("text").str.split(" ").alias("w"))
                 .drop("text").explode("w"))
        wc = words.group_by(["doc_id", "w"]).len()
        w_agg = wc.group_by("doc_id").agg(
            pl.col("len").sum().alias("n_words"),
            pl.len().alias("n_unique_words"),
            pl.col("len").max().alias("top_word_count"))
        g2 = (words.with_columns(
                  pl.col("w").shift(-1).over("doc_id").alias("w1"))
              .drop_nulls()
              .select(pl.col("doc_id"),
                      pl.concat_str([pl.col("w"), pl.col("w1")],
                                    separator=" ").alias("g")))
        g_agg = (g2.group_by(["doc_id", "g"]).len()
                 .group_by("doc_id")
                 .agg(pl.col("len").max().alias("top_gram2_count")))
        out = (w_agg.join(g_agg, on="doc_id", how="left")
               .with_columns(pl.col("top_gram2_count").fill_null(0)))
        return out.to_arrow().cast(pa.schema([
            ("doc_id", pa.int64()), ("n_words", pa.int64()),
            ("n_unique_words", pa.int64()), ("top_word_count", pa.int64()),
            ("top_gram2_count", pa.int64())]))


def repetition_stats(sf_dir: str) -> "ray.data.Dataset":
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(RepetitionStats(), batch_format="pyarrow")


REPETITION_STATS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), words AS (
  SELECT doc_id, unnest(t) AS w FROM toks
), wc AS (
  SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2
), w_agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_unique_words,
         CAST(max(c) AS BIGINT) AS top_word_count
  FROM wc GROUP BY doc_id
), g2 AS (
  SELECT doc_id,
         array_to_string(t[CAST(i AS BIGINT):CAST(i + 1 AS BIGINT)], ' ') AS g
  FROM toks, UNNEST(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
), g_agg AS (
  SELECT doc_id, CAST(max(c) AS BIGINT) AS top_gram2_count
  FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2)
  GROUP BY doc_id
)
SELECT w_agg.doc_id, n_words, n_unique_words, top_word_count,
       CAST(coalesce(top_gram2_count, 0) AS BIGINT) AS top_gram2_count
FROM w_agg LEFT JOIN g_agg USING (doc_id)
"""


# ---------------------------------------------------------------------------
# PII / identifier redaction (vectorized RE2 scrub)
# ---------------------------------------------------------------------------

# RE2-safe, shared verbatim with the DuckDB oracle. Long digit runs are
# account/ID-shaped; the email pattern is the standard conservative form.
PII_PATTERNS = (
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("[0-9]{6,}", "[ID]"),
)


def pii_scrub(sf_dir: str, table: str = "customer",
              key: str = "c_custkey", column: str = "c_name"
              ) -> "ray.data.Dataset":
    """Redact identifier-shaped substrings from a string column.
    Emits (key, scrubbed value, n_redactions). Pure streaming
    map_batches over RE2 kernels — patterns are module constants, no
    per-batch compile; the same patterns (in the same order — scrubs
    compose) back the SQL mirror, so outputs match byte-for-byte."""
    ds = read_table(sf_dir, table, columns=[key, column])

    def scrub(batch: pa.Table) -> pa.Table:
        val = batch[column].combine_chunks().cast(pa.string())
        total = np.zeros(len(val), dtype=np.int64)
        out = val
        for pat, repl in PII_PATTERNS:
            total += pc.count_substring_regex(out, pattern=pat) \
                .cast(pa.int64()).to_numpy(zero_copy_only=False)
            out = pc.replace_substring_regex(out, pattern=pat,
                                             replacement=repl)
        return pa.table({
            key: batch[key],
            f"{column}_scrubbed": out,
            "n_redactions": pa.array(total, type=pa.int64()),
        })

    return ds.map_batches(scrub, batch_format="pyarrow")


def pii_scrub_sql(table: str = "customer", key: str = "c_custkey",
                  column: str = "c_name") -> str:
    # The engine scrubs sequentially, so pattern i counts matches in the
    # text AFTER patterns < i were replaced — the nested exprs mirror that.
    exprs = [column]
    for pat, repl in PII_PATTERNS:
        pat_sql = pat.replace("'", "''")
        exprs.append(
            f"regexp_replace({exprs[-1]}, '{pat_sql}', '{repl}', 'g')")
    expr = exprs[-1]
    count_terms = []
    for (pat, _), src in zip(PII_PATTERNS, exprs):
        pat_sql = pat.replace("'", "''")
        count_terms.append(f"length(regexp_extract_all({src}, '{pat_sql}'))")
    n_red = " + ".join(count_terms)
    return f"""
SELECT {key}, {expr} AS {column}_scrubbed,
       CAST({n_red} AS BIGINT) AS n_redactions
FROM {table}
"""


# ---------------------------------------------------------------------------
# Bigram language-model quality score (exact integer arithmetic)
# ---------------------------------------------------------------------------

LM_SCALE = 1_000_000


def _w1_bucket(col: "pa.ChunkedArray | pa.Array", num_buckets: int
               ) -> pa.Array:
    """md5-per-UNIQUE-token bucket (version- and process-stable — same
    discipline as the inverted index's tok_bucket), broadcast back over
    the column via dictionary indices."""
    import hashlib as _h
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    enc = pc.dictionary_encode(arr)
    uniq = [int.from_bytes(_h.md5(t.encode()).digest()[:8], "little")
            % num_buckets for t in enc.dictionary.to_pylist()]
    return pa.array(uniq, pa.int32()).take(enc.indices)


def _doc_bigrams(batch: pa.Table) -> pa.Table:
    """(doc_id, w1, w2) one row per bigram OCCURRENCE — raw whitespace
    split (same token rule as the dup-gram mirror: no empty filtering),
    fully vectorized via adjacent flat tokens with equal parents."""
    text = batch["text"].combine_chunks().cast(pa.string())
    ids = batch["doc_id"].combine_chunks().cast(pa.int64())
    split = pc.split_pattern(text, pattern=" ")
    flat = split.flatten()
    parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    if len(parents) < 2:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string())})
    adj = parents[:-1] == parents[1:]
    idx = np.flatnonzero(adj)
    return pa.table({
        "doc_id": ids.take(pa.array(parents[idx])),
        "w1": flat.take(pa.array(idx)),
        "w2": flat.take(pa.array(idx + 1))})


def _lm_model(sf_dir: str) -> "ray.data.Dataset":
    """(w1, w2, t) with t = LM_SCALE * c(w1,w2) // c(w1), where c(w1) is
    w1's count as LEFT context (= sum of its bigram counts — derived
    from the bigram table itself, no second corpus pass). Per-batch
    count combiners before both groupbys."""
    import polars as pl
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(batch: pa.Table) -> pa.Table:
        return (pl.from_arrow(_doc_bigrams(batch))
                .group_by(["w1", "w2"])
                .agg(pl.len().cast(pl.Int64).alias("m")).to_arrow())

    from ray.data.aggregate import Sum
    c12 = (docs.map_batches(partial, batch_format="pyarrow")
           .groupby(["w1", "w2"]).aggregate(Sum("m", alias_name="c12")))

    # attach c1: ONE hash(w1) bucket pass — c1 is the in-bucket sum, so
    # no separate table or join is needed at all
    from ..stages.dedup import default_num_buckets
    num_buckets = default_num_buckets()

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_wb", _w1_bucket(batch["w1"], num_buckets))

    def per_bucket(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.drop_columns(["_wb"]))
        c1 = df.group_by("w1").agg(pl.col("c12").sum().alias("c1"))
        j = df.join(c1, on="w1", how="inner")
        return (j.with_columns(
                    ((LM_SCALE * pl.col("c12")) // pl.col("c1"))
                    .alias("t"))
                .select(["w1", "w2", "t"]).to_arrow()
                .cast(pa.schema([("w1", pa.string()),
                                 ("w2", pa.string()),
                                 ("t", pa.int64())])))

    from . import ensure_schema
    return ensure_schema(
        c12.map_batches(tag, batch_format="pyarrow")
        .groupby("_wb").map_groups(per_bucket, batch_format="pyarrow"),
        pa.schema([("w1", pa.string()), ("w2", pa.string()),
                   ("t", pa.int64())]))


def bigram_lm_scores(sf_dir: str, force_join: bool = False
                     ) -> "ray.data.Dataset":
    """Per-document LM quality score: the mean scaled conditional bigram
    probability, all in exact integers —

        lm_score(d) = ( Σ_occurrences LM_SCALE·c(w1,w2)//c(w1) ) // n_bigrams

    (a log-free perplexity stand-in: high = predictable/boilerplate,
    low = high-surprise text; -1 for docs with < 2 tokens). The model is
    trained on the corpus itself in one pass.

    Fast path (model ≤ KGFORGE_TEXT_BROADCAST_LIMIT rows): the model
    ships once via ray.put and scoring is a SINGLE zero-shuffle pass —
    a doc's text lives in one row, so its per-doc aggregate is exact
    within the batch (C-level polars join per batch).
    Scale path (force_join or big model): doc-bigram occurrences join
    the model on ONE hash(w1) bucket exchange (c1 and c12 are both
    w1-local, so one key co-locates everything), per-doc partials
    return on a hash(doc_id) groupby, and an ids-only corpus pass
    fills the -1 docs."""
    import polars as pl
    from .dedup import payload_broadcast_limit as _text_broadcast_limit
    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("lm_score", pa.int64())])
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    model = _lm_model(sf_dir)

    model_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                              ("t", pa.int64())])
    if not force_join and model.count() <= _text_broadcast_limit():
        import ray as _ray
        parts = [t.cast(model_schema) for t in
                 model.iter_batches(batch_format="pyarrow") if t.num_rows]
        mt = (pa.concat_tables(parts) if parts
              else model_schema.empty_table())
        ref = _ray.put(mt)

        def score(batch: pa.Table, ref=ref) -> pa.Table:
            import ray as _ray
            m = pl.from_arrow(_ray.get(ref))
            big = pl.from_arrow(_doc_bigrams(batch))
            ids = batch["doc_id"].combine_chunks().cast(pa.int64())
            if big.height == 0:
                return pa.table({
                    "doc_id": ids,
                    "lm_score": pa.array([-1] * batch.num_rows,
                                         pa.int64())})
            j = big.join(m, on=["w1", "w2"], how="inner")
            agg = (j.group_by("doc_id")
                   .agg((pl.col("t").sum() // pl.len()).alias("lm_score")))
            full = (pl.DataFrame({"doc_id": ids.to_numpy(
                        zero_copy_only=False)})
                    .join(agg, on="doc_id", how="left")
                    .with_columns(pl.col("lm_score").fill_null(-1)))
            return full.to_arrow().cast(out_schema)

        return docs.map_batches(score, batch_format="pyarrow")

    # ---- scale path ----
    from ..stages.dedup import default_num_buckets
    num_buckets = default_num_buckets()

    def tag_big(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(_doc_bigrams(batch))
        # per-(doc,bigram) multiplicity combiner before the wire
        t = (df.group_by(["doc_id", "w1", "w2"])
             .agg(pl.len().cast(pl.Int64).alias("m"))
             .with_columns(pl.lit(None, pl.Int64).alias("t"))
             .select(["doc_id", "w1", "w2", "m", "t"]).to_arrow())
        return t.append_column("_wb", _w1_bucket(t["w1"], num_buckets))

    def tag_model(batch: pa.Table) -> pa.Table:
        t = (pl.from_arrow(batch)
             .with_columns(pl.lit(None, pl.Int64).alias("doc_id"),
                           pl.lit(None, pl.Int64).alias("m"))
             .select(["doc_id", "w1", "w2", "m", "t"]).to_arrow())
        return t.append_column("_wb", _w1_bucket(t["w1"], num_buckets))

    def join_terms(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.drop_columns(["_wb"]))
        big = df.filter(pl.col("t").is_null()).select(
            ["doc_id", "w1", "w2", "m"])
        m = df.filter(pl.col("t").is_not_null()).select(["w1", "w2", "t"])
        j = big.join(m, on=["w1", "w2"], how="inner")
        # per-doc partials within the bucket
        return (j.group_by("doc_id")
                .agg((pl.col("t") * pl.col("m")).sum().alias("s"),
                     pl.col("m").sum().alias("nb"))
                .to_arrow().cast(pa.schema([
                    ("doc_id", pa.int64()), ("s", pa.int64()),
                    ("nb", pa.int64())])))

    from ray.data.aggregate import Sum
    partials = (docs.map_batches(tag_big, batch_format="pyarrow")
                .union(model.map_batches(tag_model,
                                         batch_format="pyarrow"))
                .groupby("_wb").map_groups(join_terms,
                                           batch_format="pyarrow")
                .groupby("doc_id")
                .aggregate(Sum("s", alias_name="s"),
                           Sum("nb", alias_name="nb")))

    def tag_scored(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        s = batch["s"].to_numpy(zero_copy_only=False)
        nb = batch["nb"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "lm_score": pa.array(s // nb, pa.int64()),
            "_db": pa.array((ids % num_buckets).astype(np.int32))})

    def tag_ids(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].combine_chunks().cast(pa.int64())
        npids = ids.to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": ids,
            "lm_score": pa.nulls(batch.num_rows, pa.int64()),
            "_db": pa.array((npids % num_buckets).astype(np.int32))})

    def fill(group: pa.Table) -> pa.Table:
        df = pl.from_arrow(group.drop_columns(["_db"]))
        base = df.filter(pl.col("lm_score").is_null()).select("doc_id")
        got = df.filter(pl.col("lm_score").is_not_null())
        return (base.join(got, on="doc_id", how="left")
                .with_columns(pl.col("lm_score").fill_null(-1))
                .to_arrow().cast(out_schema))

    ids_only = read_table(sf_dir, "documents", columns=["doc_id"])
    from ..ops import ensure_schema
    return ensure_schema(
        partials.map_batches(tag_scored, batch_format="pyarrow")
        .union(ids_only.map_batches(tag_ids, batch_format="pyarrow"))
        .groupby("_db").map_groups(fill, batch_format="pyarrow"),
        out_schema)


def bigram_lm_scores_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), big AS (
  SELECT doc_id, t[CAST(i AS BIGINT)] AS w1,
         t[CAST(i + 1 AS BIGINT)] AS w2
  FROM toks, UNNEST(range(1, len(t))) AS r(i)
  WHERE len(t) >= 2
), c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2
), c1 AS (
  SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1
), terms AS (
  SELECT w1, w2, ({LM_SCALE} * c12) // c1 AS t
  FROM c12 JOIN c1 USING (w1)
), contrib AS (
  SELECT doc_id, sum(t) AS s, count(*) AS nb
  FROM big JOIN terms USING (w1, w2) GROUP BY doc_id
)
SELECT d.doc_id, CAST(COALESCE(s // nb, -1) AS BIGINT) AS lm_score
FROM documents d LEFT JOIN contrib USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Passage chunking (fixed window + stride)
# ---------------------------------------------------------------------------

CHUNK_W = 50      # window, tokens
CHUNK_S = 30      # stride, tokens (overlap = W - S)


def passage_chunks(sf_dir: str, window: int = CHUNK_W,
                   stride: int = CHUNK_S) -> "ray.data.Dataset":
    """Overlapping fixed-size passages per document — the chunking step
    of a RAG / context-window pipeline. Raw whitespace tokens (the
    repo's dup-gram rule); chunk i covers tokens [i·stride, i·stride +
    window); the last chunk may be short; every doc emits ≥ 1 chunk.
    Pure per-batch map (polars int_ranges explode + per-row list.slice)
    — no shuffle, the corpus streams."""
    import polars as pl
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
        ("n_toks", pa.int64()), ("chunk_text", pa.string())])

    def chunk(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select(["doc_id", "text"]))
        df = df.with_columns(pl.col("text").str.split(" ").alias("t"))
        df = df.with_columns(pl.col("t").list.len().cast(pl.Int64)
                             .alias("n"))
        df = df.with_columns(
            pl.when(pl.col("n") <= window).then(1)
            .otherwise((pl.col("n") - window + stride - 1) // stride + 1)
            .cast(pl.Int64).alias("n_chunks"))
        df = (df.with_columns(
                  pl.int_ranges(0, pl.col("n_chunks")).alias("chunk_idx"))
              .explode("chunk_idx"))
        sl = pl.col("t").list.slice(pl.col("chunk_idx") * stride, window)
        df = df.with_columns(
            sl.list.len().cast(pl.Int64).alias("n_toks"),
            sl.list.join(" ").alias("chunk_text"),
            pl.col("chunk_idx").cast(pl.Int64))
        return (df.select(["doc_id", "chunk_idx", "n_toks", "chunk_text"])
                .to_arrow().cast(out_schema))

    return docs.map_batches(chunk, batch_format="pyarrow")


def passage_chunks_sql(window: int = CHUNK_W,
                       stride: int = CHUNK_S) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents
), spans AS (
  SELECT doc_id, t, n,
         CASE WHEN n <= {window} THEN 1
              ELSE (n - {window} + {stride} - 1) // {stride} + 1
         END AS n_chunks
  FROM toks
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       CAST(least(n - i * {stride}, {window}) AS BIGINT) AS n_toks,
       array_to_string(
         t[CAST(i * {stride} + 1 AS BIGINT)
           :CAST(least(i * {stride} + {window}, n) AS BIGINT)],
         ' ') AS chunk_text
FROM spans, UNNEST(range(0, n_chunks)) AS r(i)
"""


# ---------------------------------------------------------------------------
# Compression-ratio quality signal
# ---------------------------------------------------------------------------

ZLIB_LEVEL = 6


def compression_ratio(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, raw_len, comp_len, ratio_permille) — zlib(level 6)
    compressed size over the utf-8 text; highly repetitive/boilerplate
    text compresses far below ~600‰, near-random text sits near 1000‰.
    The classic cheap quality signal (used by Gopher/FineWeb-style
    pipelines). zlib has no Arrow kernel, so the per-doc C call is the
    batch loop — same justified shape as the md5 key in exact_dedup;
    everything else streams. Oracle: the independent scalar reference
    runs the SAME stdlib zlib (deterministic for fixed level/library)."""
    import zlib
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"].combine_chunks().cast(pa.string())
        raw = [t.encode() for t in texts.to_pylist()]
        comp = np.array([len(zlib.compress(b, ZLIB_LEVEL)) for b in raw],
                        dtype=np.int64)
        rl = np.array([len(b) for b in raw], dtype=np.int64)
        return pa.table({
            "doc_id": batch["doc_id"].combine_chunks().cast(pa.int64()),
            "raw_len": pa.array(rl, pa.int64()),
            "comp_len": pa.array(comp, pa.int64()),
            "ratio_permille": pa.array(
                1000 * comp // np.maximum(rl, 1), pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow")
