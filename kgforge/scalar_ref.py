"""Independent scalar reference implementations of the sketch-family
operators — MinHash+LSH near-dup, SimHash near-dup, winnowing
fingerprints, IVF ANN, LSH-bucketed embedding dups — plus SQL codegen
that embeds their expected outputs as VALUES tables.

Why this exists: the driver's correctness gate runs ``oracle_sql()``
strings through DuckDB over the parquet views, and sketch operators are
not SQL-expressible (crc32 / 64-bit wrapping multiply-mix have no DuckDB
kernels). Their oracle is therefore an INDEPENDENT per-document scalar
implementation — plain Python loops over plain ints, no flat-stream
vectorization, no reduceat, no lexsort — evaluated over the same input
tables and embedded as a VALUES literal. The embedded table carries one
copy per known testdata scale, selected at SQL run time by a content key
(`count(*) || ':' || sum(n_chars)` over ``documents``), so one SQL
string is correct at any of the driver's scales.

The scalar code shares only the published CONSTANTS of each sketch spec
with the engine (mix constants, Mersenne prime, band/permutation
counts); every mechanism the engine vectorizes is re-derived here the
slow, obvious way. That is exactly where engine bugs would diverge.

Engine counterparts: kgforge/ops/dedup.py (MinHashBands/SimHash),
kgforge/ops/text.py (Winnowing), kgforge/ops/ann.py (ivf/lsh).
"""

from __future__ import annotations

import functools
import glob
import os
import zlib

import numpy as np

MASK64 = (1 << 64) - 1
MERSENNE = (1 << 61) - 1
MIX = [0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
       0x94D049BB133111EB, 0xD6E8FEB86659FD93]


def _crc(s: str) -> int:
    return zlib.crc32(s.encode())


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _gram_hashes(tokens: list[str], k: int) -> list[int]:
    """Rolling k-gram multiply-xor mix over token crc32s (the shared
    published spec), scalar edition."""
    th = [_crc(t) for t in tokens]
    out = []
    for i in range(len(th) - k + 1):
        g = (th[i] * MIX[0]) & MASK64
        for j in range(1, k):
            g = ((g ^ th[i + j]) * MIX[j % 4]) & MASK64
        out.append(g)
    return out


def _tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def _shingle_set(text: str, k: int) -> set[int]:
    toks = _tokens(text)
    if not toks:
        return set()
    if len(toks) < k:
        # short-doc spec: crc list zero-padded to k -> one gram
        th = [_crc(t) for t in toks] + [0] * (k - len(toks))
        g = (th[0] * MIX[0]) & MASK64
        for j in range(1, k):
            g = ((g ^ th[j]) * MIX[j % 4]) & MASK64
        return {g}
    return set(_gram_hashes(toks, k))


# ------------------------------------------------------------- MinHash
def _perm_params(n_perm: int) -> tuple[list[int], list[int]]:
    a, b = [], []
    for idx in range(1, n_perm + 1):
        z = (idx * 0x9E3779B97F4A7C15) & MASK64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
        a.append(((z ^ (z >> 31)) % (MERSENNE - 1)) + 1)
        z2 = ((idx + 7919) * 0xD6E8FEB86659FD93) & MASK64
        z2 = ((z2 ^ (z2 >> 29)) * 0xFF51AFD7ED558CCD) & MASK64
        b.append((z2 ^ (z2 >> 32)) % MERSENNE)
    return a, b


def minhash_pairs_ref(docs: list[tuple[int, str]], threshold: float = 0.7,
                      n_perm: int = 64, bands: int = 16, k: int = 3
                      ) -> list[tuple[int, int, int]]:
    """(a, b, jaccard_pct) — the full LSH pipeline, scalar."""
    a_par, b_par = _perm_params(n_perm)
    r = n_perm // bands
    shingles: dict[int, set[int]] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in docs:
        sh = _shingle_set(text, k)
        shingles[doc_id] = sh
        if sh:
            sig = [min(((((a_par[i] * x) & MASK64) + b_par[i]) & MASK64)
                       % MERSENNE for x in sh)
                   for i in range(n_perm)]
        else:
            sig = [0] * n_perm
        for bi in range(bands):
            seg = sig[bi * r:(bi + 1) * r]
            bh = (seg[0] * MIX[0]) & MASK64
            for j in range(1, r):
                bh = ((bh ^ seg[j]) * MIX[j % 4]) & MASK64
            buckets.setdefault((bi, bh), []).append(doc_id)
    cands: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    out = []
    for x, y in sorted(cands):
        sa, sb = shingles[x], shingles[y]
        if not sa and not sb:
            jac = 1.0
        else:
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
        if jac >= threshold:
            out.append((x, y, int(round(jac * 100))))
    return out


def neardup_clusters_ref(docs: list[tuple[int, str]],
                         threshold: float = 0.7, n_perm: int = 64,
                         bands: int = 16, k: int = 3
                         ) -> list[tuple[int, int, int]]:
    """(doc_id, canon_id, cluster_size): union-find over the verified
    near-dup pairs; canonical = numeric min member."""
    pairs = minhash_pairs_ref(docs, threshold, n_perm, bands, k)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, _ in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    members: dict[int, list[int]] = {}
    for x in parent:
        members.setdefault(find(x), []).append(x)
    out = []
    for canon, nodes in members.items():
        for n in nodes:
            out.append((n, canon, len(nodes)))
    return sorted(out)


# ------------------------------------------------------------- SimHash
def _simhash(text: str) -> int:
    v = [0] * 64
    for t in _tokens(text):
        h = ((_crc(t) << 32) | _crc(t + "#")) & MASK64
        for j in range(64):
            v[j] += 1 if (h >> j) & 1 else -1
    return sum((1 << j) for j in range(64) if v[j] > 0)


def simhash_pairs_ref(docs: list[tuple[int, str]], max_hamming: int = 3
                      ) -> list[tuple[int, int, int]]:
    sigs = {doc_id: _simhash(text) for doc_id, text in docs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, sig in sigs.items():
        for b in range(4):
            buckets.setdefault((b, (sig >> (16 * b)) & 0xFFFF),
                               []).append(doc_id)
    cands: set[tuple[int, int]] = set()
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cands.add((ids[i], ids[j]))
    out = []
    for x, y in sorted(cands):
        ham = bin(sigs[x] ^ sigs[y]).count("1")
        if ham <= max_hamming:
            out.append((x, y, ham))
    return out


# ----------------------------------------------------------- Winnowing
def winnow_doc(text: str, k: int = 5, window: int = 4
               ) -> list[tuple[int, int]]:
    """[(pos, fp_signed)] winnowing selection for one document (no
    short-doc padding: docs with fewer than k tokens yield nothing)."""
    toks = _tokens(text)
    if len(toks) < k:
        return []
    grams = _gram_hashes(toks, k)
    if len(grams) < window:
        m = min(grams)
        sel = {grams.index(m)}
    else:
        sel = set()
        for i in range(len(grams) - window + 1):
            win = grams[i:i + window]
            m = min(win)
            sel.add(i + win.index(m))
    return [(p, _signed64(grams[p])) for p in sorted(sel)]


def fingerprint_summary_ref(docs: list[tuple[int, str]], k: int = 5,
                            window: int = 4
                            ) -> list[tuple[int, int, int, int, int, int]]:
    """(doc_id, n_fp, fp_xor, fp_min, fp_max, pos_sum) per doc with ≥1
    fingerprint."""
    out = []
    for doc_id, text in docs:
        fps = winnow_doc(text, k, window)
        if not fps:
            continue
        vals = [f for _, f in fps]
        x = 0
        for f in vals:
            x ^= f
        out.append((doc_id, len(fps), x, min(vals), max(vals),
                    sum(p for p, _ in fps)))
    return out


# ------------------------------------------------------------- IVF ANN
def _splitmix_unit_ref(n: int, dim: int, offset: int = 0x51ED2701,
                       start: int = 0) -> np.ndarray:
    vals = []
    for idx in range(start, start + n * dim):
        z = ((idx + offset) * 0x9E3779B97F4A7C15) & MASK64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
        z = z ^ (z >> 27)
        vals.append((z / float(2 ** 64)) - 0.5)
    return np.array(vals, dtype=np.float64).reshape(n, dim)


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ivf_topk_ref(ids: np.ndarray, M: np.ndarray, query_ids: list[int],
                 k: int = 10, n_lists: int = 16, nprobe: int = 4,
                 sample_rows: int = 4096, iters: int = 3
                 ) -> list[tuple[int, int, int, float]]:
    """(query_id, vec_id, rank, sim4) — IVF probe + exact scoring."""
    m = _norm_rows(M[:sample_rows].astype(np.float64))
    cents = _norm_rows(_splitmix_unit_ref(n_lists, M.shape[1]))
    for _ in range(iters):
        assign = (m @ cents.T).argmax(axis=1)
        for c in range(n_lists):
            sel = m[assign == c]
            if len(sel):
                cents[c] = sel.mean(axis=0)
        cents = _norm_rows(cents)
    Mn = _norm_rows(M.astype(np.float64))
    assign_all = (Mn @ cents.T).argmax(axis=1)
    pos = {v: i for i, v in enumerate(ids.tolist())}
    q = np.stack([Mn[pos[qid]] for qid in query_ids])
    probe = set(np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]
                .reshape(-1).tolist())
    keep = np.isin(assign_all, sorted(probe))
    cand_ids, cand_m = ids[keep], Mn[keep]
    sims = np.round(cand_m @ q.T, 4)
    out = []
    for qi, qid in enumerate(query_ids):
        rows = [(int(v), float(s)) for v, s in zip(cand_ids, sims[:, qi])
                if int(v) != qid]
        rows.sort(key=lambda t: (-t[1], t[0]))
        for rank, (v, s) in enumerate(rows[:k], 1):
            out.append((qid, v, rank, s))
    return out


def embedding_clusters_ref(ids: np.ndarray, M: np.ndarray,
                           n_lists: int = 16, sample_rows: int = 4096,
                           iters: int = 3) -> list[tuple[int, int]]:
    """(vec_id, cluster_id): same k-means spec as ivf_topk_ref's
    training, assignment only."""
    m = _norm_rows(M[:sample_rows].astype(np.float64))
    cents = _norm_rows(_splitmix_unit_ref(n_lists, M.shape[1]))
    for _ in range(iters):
        assign = (m @ cents.T).argmax(axis=1)
        for c in range(n_lists):
            sel = m[assign == c]
            if len(sel):
                cents[c] = sel.mean(axis=0)
        cents = _norm_rows(cents)
    Mn = _norm_rows(M.astype(np.float64))
    lists = (Mn @ cents.T).argmax(axis=1)
    return sorted((int(v), int(c)) for v, c in zip(ids, lists))


# ------------------------------------------- LSH embedding dup pairs
def embedding_dup_pairs_ref(ids: np.ndarray, M: np.ndarray,
                            threshold: float = 0.45, n_bits: int = 8
                            ) -> list[tuple[int, int, float]]:
    dim = M.shape[1]
    proj = _splitmix_unit_ref(1, dim * n_bits, offset=1).reshape(dim, n_bits)
    bits = (M.astype(np.float64) @ proj) > 0
    pad = np.pad(bits, ((0, 0), (0, (-n_bits) % 8)))
    keys = [bytes(np.packbits(row)).hex() for row in pad]
    buckets: dict[str, list[int]] = {}
    for i, kk in enumerate(keys):
        buckets.setdefault(kk, []).append(i)
    Mn = _norm_rows(M.astype(np.float64))
    out = set()
    for rows in buckets.values():
        order = sorted(rows, key=lambda i: ids[i])
        for i in range(len(order)):
            for j in range(i + 1, len(order)):
                a, b = order[i], order[j]
                s = round(float(Mn[a] @ Mn[b]), 4)
                if s >= threshold:
                    out.add((int(ids[a]), int(ids[b]), s))
    return sorted(out)


# ------------------------------------------------- contamination screen
def contamination_ref(docs: list[tuple[int, str]], k: int = 8,
                      bench_mod: int = 97) -> list[tuple[int, int, int, int]]:
    """Scalar mirror of ops.text.contamination_check: benchmark grams =
    union of k-gram sets of docs with doc_id % bench_mod == 0; every
    other doc reports (doc_id, n_grams, n_hits, contam_pct)."""
    bench: set[int] = set()
    for doc_id, text in docs:
        if doc_id % bench_mod == 0:
            bench |= _shingle_set(text, k)
    out = []
    for doc_id, text in docs:
        if doc_id % bench_mod == 0:
            continue
        s = _shingle_set(text, k)
        n, hits = len(s), len(s & bench)
        out.append((doc_id, n, hits,
                    int(round(100 * hits / n)) if n else 0))
    return sorted(out)


# ------------------------------------------------ KMV distinct sketch
def _splitmix64_scalar(v: int) -> int:
    """Scalar splitmix64 finalizer (the published spec shared with
    ops/sketch.splitmix64)."""
    z = (v + 0x9E3779B97F4A7C15) & MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & MASK64
    return (z ^ (z >> 31)) & MASK64


def kmv_doc_frequency_ref(docs: list[tuple[int, str]],
                          lexicon: tuple[str, ...], k: int = 64
                          ) -> list[tuple[str, int]]:
    """Scalar mirror of ops.sketch.entity_doc_frequency_kmv: per
    gazetteer entity, the KMV estimate of COUNT(DISTINCT doc_id) —
    plain set/sort loops, integer-exact estimator."""
    lex = set(lexicon)
    doc_sets: dict[str, set[int]] = {m: set() for m in lex}
    for doc_id, text in docs:
        for tok in text.split(" "):
            if tok in lex:
                doc_sets[tok].add(doc_id)
    out = []
    for mention in sorted(lex):
        hs = sorted(_splitmix64_scalar(d) for d in doc_sets[mention])
        if not hs:
            continue
        if len(hs) < k:
            est = len(hs)
        else:
            est = ((k - 1) << 64) // (hs[k - 1] + 1)
        out.append((mention, est))
    return out


# --------------------------------------------------------- SQL codegen
_TESTDATA_GLOB = "/root/testdata/sf*"


@functools.lru_cache(maxsize=None)
def _sf_dirs() -> tuple[str, ...]:
    return tuple(sorted(
        d for d in glob.glob(_TESTDATA_GLOB)
        if os.path.exists(os.path.join(d, "documents.parquet"))))


@functools.lru_cache(maxsize=None)
def _doc_key(sf_dir: str) -> str:
    """Content key identifying the scale: count ':' sum(n_chars) —
    matches the SQL selector `count(*) || ':' || sum(n_chars)`."""
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    import pyarrow.compute as pc
    return f"{t.num_rows}:{pc.sum(t['n_chars']).as_py()}"


@functools.lru_cache(maxsize=None)
def _docs(sf_dir: str) -> tuple[tuple[int, str], ...]:
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    return tuple(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


@functools.lru_cache(maxsize=None)
def _emb(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, M


def _lit(v) -> str:
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def values_oracle_sql(rows_by_key: dict[str, list[tuple]],
                      cols: list[str], types: list[str]) -> str:
    """Embed per-scale expected rows as a VALUES table selected by the
    documents content key. Raises if no scale produced any rows (an
    all-empty oracle would vacuously pass)."""
    named = ", ".join(f"CAST({c} AS {t}) AS {c}"
                      for c, t in zip(cols, types))
    sel = "(SELECT count(*)::VARCHAR || ':' || sum(n_chars)::VARCHAR " \
          "FROM documents)"
    rows = []
    for key, rs in rows_by_key.items():
        for r in rs:
            rows.append("(" + ", ".join([_lit(v) for v in r] +
                                        [f"'{key}'"]) + ")")
    if not rows:
        raise ValueError("no expected rows at any known scale")
    vals = ", ".join(rows)
    colnames = ", ".join(cols)
    return (f"SELECT {named} FROM (VALUES {vals}) "
            f"v({colnames}, _key) WHERE _key = {sel}")


@functools.lru_cache(maxsize=None)
def minhash_oracle_sql(threshold: float = 0.7) -> str:
    rows = {_doc_key(d): minhash_pairs_ref(list(_docs(d)), threshold)
            for d in _sf_dirs()}
    return values_oracle_sql(rows, ["a", "b", "jaccard_pct"],
                             ["BIGINT", "BIGINT", "BIGINT"])


@functools.lru_cache(maxsize=None)
def neardup_clusters_oracle_sql(threshold: float = 0.7) -> str:
    rows = {_doc_key(d): neardup_clusters_ref(list(_docs(d)), threshold)
            for d in _sf_dirs()}
    return values_oracle_sql(rows, ["doc_id", "canon_id", "cluster_size"],
                             ["BIGINT", "BIGINT", "BIGINT"])


@functools.lru_cache(maxsize=None)
def neardup_labels_oracle_sql(threshold: float = 0.7) -> str:
    """(doc_id, canon_id) labels — the distributed-CC scale path's gate
    (same union-find reference as neardup_clusters, without the size)."""
    rows = {_doc_key(d): [(a, b) for a, b, _ in
                          neardup_clusters_ref(list(_docs(d)), threshold)]
            for d in _sf_dirs()}
    return values_oracle_sql(rows, ["doc_id", "canon_id"],
                             ["BIGINT", "BIGINT"])


@functools.lru_cache(maxsize=None)
def simhash_oracle_sql(max_hamming: int = 3) -> str:
    rows = {_doc_key(d): simhash_pairs_ref(list(_docs(d)), max_hamming)
            for d in _sf_dirs()}
    return values_oracle_sql(rows, ["a", "b", "hamming"],
                             ["BIGINT", "BIGINT", "BIGINT"])


@functools.lru_cache(maxsize=None)
def fingerprint_oracle_sql() -> str:
    rows = {_doc_key(d): fingerprint_summary_ref(list(_docs(d)))
            for d in _sf_dirs()}
    return values_oracle_sql(
        rows, ["doc_id", "n_fp", "fp_xor", "fp_min", "fp_max", "pos_sum"],
        ["BIGINT"] * 6)


@functools.lru_cache(maxsize=None)
def contamination_oracle_sql(k: int = 8, bench_mod: int = 97) -> str:
    rows = {_doc_key(d): contamination_ref(list(_docs(d)), k, bench_mod)
            for d in _sf_dirs()}
    return values_oracle_sql(rows,
                             ["doc_id", "n_grams", "n_hits", "contam_pct"],
                             ["BIGINT"] * 4)


@functools.lru_cache(maxsize=None)
def fingerprint_full_oracle_sql() -> str:
    """FULL per-position winnowing stream (doc_id, pos, fp) as a VALUES
    oracle — upgrades the last rows-only gate query to hash-checked.
    ~120k embedded rows across the three scales (a few MB of SQL,
    parsed once and lru-cached)."""
    rows = {}
    for d in _sf_dirs():
        out = []
        for doc_id, text in _docs(d):
            out.extend((doc_id, p, fp) for p, fp in winnow_doc(text))
        rows[_doc_key(d)] = out
    return values_oracle_sql(rows, ["doc_id", "pos", "fp"],
                             ["BIGINT", "BIGINT", "BIGINT"])


@functools.lru_cache(maxsize=None)
def ivf_oracle_sql(k: int = 10, n_lists: int = 16, nprobe: int = 4) -> str:
    rows = {}
    for d in _sf_dirs():
        ids, M = _emb(d)
        rows[_doc_key(d)] = ivf_topk_ref(ids, M, [0, 1, 2], k, n_lists,
                                         nprobe)
    return values_oracle_sql(rows, ["query_id", "vec_id", "rank", "sim4"],
                             ["BIGINT", "BIGINT", "BIGINT", "DOUBLE"])


@functools.lru_cache(maxsize=None)
def embedding_clusters_oracle_sql(n_lists: int = 16) -> str:
    rows = {}
    for d in _sf_dirs():
        ids, M = _emb(d)
        rows[_doc_key(d)] = embedding_clusters_ref(ids, M, n_lists)
    return values_oracle_sql(rows, ["vec_id", "cluster_id"],
                             ["BIGINT", "BIGINT"])


@functools.lru_cache(maxsize=None)
def embedding_dup_oracle_sql(threshold: float = 0.45,
                             n_bits: int = 8) -> str:
    from .ops.ann import effective_lsh_bits
    rows = {}
    for d in _sf_dirs():
        ids, M = _emb(d)
        # mirror the engine's corpus-scaled hyperplane count (identity
        # at testdata scales)
        rows[_doc_key(d)] = embedding_dup_pairs_ref(
            ids, M, threshold, effective_lsh_bits(len(ids), n_bits))
    return values_oracle_sql(rows, ["a", "b", "sim4"],
                             ["BIGINT", "BIGINT", "DOUBLE"])


@functools.lru_cache(maxsize=None)
def kmv_doc_frequency_oracle_sql(k: int = 64) -> str:
    from .pipelines.webkg import LEXICON
    rows = {_doc_key(d): kmv_doc_frequency_ref(list(_docs(d)), LEXICON, k)
            for d in _sf_dirs()}
    return values_oracle_sql(rows, ["mention", "doc_freq_est"],
                             ["VARCHAR", "BIGINT"])


# ------------------------------------------- HDR quantile sketch mirror
def hdr_quantiles_ref(pairs: list[tuple[str, int]],
                      pcts: tuple[int, ...] = (25, 50, 90, 99),
                      bits: int = 7) -> list[tuple]:
    """Scalar mirror of ops.quantile.hdr_quantiles: per key, the
    log-bucketed approximate percentiles — plain dict/loop code, same
    frexp bucket spec and the integer percentile rule."""
    import math

    def bucket_id(v: int) -> int:
        if v == 0:
            return 0
        m, e = math.frexp(float(v))
        prefix = int((m - 0.5) * (1 << (bits + 1)))
        return ((e + 1200) << bits) | prefix

    def bucket_lo(b: int) -> float:
        if b == 0:
            return 0.0
        e = (b >> bits) - 1200
        prefix = b & ((1 << bits) - 1)
        return (0.5 + prefix / (1 << (bits + 1))) * 2.0 ** e

    hists: dict[str, dict[int, int]] = {}
    for k, v in pairs:
        hists.setdefault(k, {})[bucket_id(v)] = \
            hists.setdefault(k, {}).get(bucket_id(v), 0) + 1
    out = []
    for k in sorted(hists):
        h = hists[k]
        n = sum(h.values())
        row: list = [k, n]
        for p in pcts:
            cum = 0
            for b in sorted(h):
                cum += h[b]
                if 100 * cum >= p * n:
                    row.append(bucket_lo(b))
                    break
        out.append(tuple(row))
    return out


@functools.lru_cache(maxsize=None)
def _doc_lang_lengths(sf_dir: str) -> tuple[tuple[str, int], ...]:
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["lang", "n_chars"])
    return tuple(zip(t["lang"].to_pylist(), t["n_chars"].to_pylist()))


@functools.lru_cache(maxsize=None)
def hdr_quantiles_oracle_sql(pcts: tuple[int, ...] = (25, 50, 90, 99),
                             bits: int = 7) -> str:
    rows = {_doc_key(d): hdr_quantiles_ref(list(_doc_lang_lengths(d)),
                                           pcts, bits)
            for d in _sf_dirs()}
    cols = ["lang", "n"] + [f"q{p}" for p in pcts]
    types = ["VARCHAR", "BIGINT"] + ["DOUBLE"] * len(pcts)
    return values_oracle_sql(rows, cols, types)


@functools.lru_cache(maxsize=None)
def neardup_survivors_oracle_sql(threshold: float = 0.7) -> str:
    """Survivor selection mirror: the labels reference (union-find) as a
    VALUES CTE, then the SAME Knuth fetch-priority argmin in live SQL —
    min over the packed key p*2^31 + doc_id, winner = key % 2^31."""
    labels = neardup_labels_oracle_sql(threshold)
    return f"""
WITH labels AS ({labels}),
pri AS (SELECT doc_id, canon_id,
               (doc_id * 2654435761) % 4294967296 AS p FROM labels),
win AS (SELECT canon_id,
               CAST(min(p * 2147483648 + doc_id) % 2147483648 AS BIGINT)
               AS keep_doc
        FROM pri GROUP BY canon_id)
SELECT d.doc_id,
       CAST(COALESCE(l.canon_id, d.doc_id) AS BIGINT) AS canon_id,
       CAST(CASE WHEN l.doc_id IS NULL OR d.doc_id = w.keep_doc
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM documents d
LEFT JOIN labels l ON l.doc_id = d.doc_id
LEFT JOIN win w ON w.canon_id = l.canon_id
"""


def kcore_ref(ids: list[int], k: int = 3) -> list[tuple[int, int]]:
    """Independent k-core peeling (plain sets/dicts) over the
    variable-arity link formula — arm (m,c) applies to i iff
    i % mod == 0; undirected simple graph, self-loops dropped."""
    arms = (((7, 1), 1), ((13, 5), 2), ((3, 11), 4),
            ((11, 17), 8), ((19, 23), 16))
    n = len(ids)
    edges = set()
    for i in ids:
        for (m, c), mod in arms:
            if i % mod == 0:
                d = (i * m + c) % n
                if d != i:
                    edges.add((min(i, d), max(i, d)))
    while True:
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        drop = {v for v, d in deg.items() if d < k}
        if not drop:
            return sorted(deg.items())
        edges = {(a, b) for a, b in edges
                 if a not in drop and b not in drop}
        if not edges:
            return []


@functools.lru_cache(maxsize=None)
def kcore_oracle_sql(k: int = 3) -> str:
    rows = {_doc_key(d): kcore_ref([i for i, _ in _docs(d)], k)
            for d in _sf_dirs()}
    return values_oracle_sql(rows, ["doc_id", "core_deg"],
                             ["BIGINT", "BIGINT"])


def compression_ratio_ref(docs: list[tuple[int, str]]
                          ) -> list[tuple[int, int, int, int]]:
    """Independent zlib-ratio reference (same stdlib zlib, level 6)."""
    import zlib
    out = []
    for doc_id, text in docs:
        b = (text or "").encode()
        c = len(zlib.compress(b, 6))
        out.append((doc_id, len(b), c, 1000 * c // max(len(b), 1)))
    return sorted(out)


@functools.lru_cache(maxsize=None)
def compression_ratio_oracle_sql() -> str:
    rows = {_doc_key(d): compression_ratio_ref(list(_docs(d)))
            for d in _sf_dirs()}
    return values_oracle_sql(
        rows, ["doc_id", "raw_len", "comp_len", "ratio_permille"],
        ["BIGINT"] * 4)


def quantized_topk_ref(ids: "np.ndarray", M: "np.ndarray",
                       query_ids: list[int], k: int
                       ) -> list[tuple[int, int, int, int]]:
    """Independent symmetric-int8 quantized dot-product top-k (plain
    numpy, same quantizer expression as the engine by specification)."""
    nrm = np.linalg.norm(M, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    Mn = M / nrm
    g = float(np.abs(Mn).max()) or 1.0
    q = np.floor(Mn * 127.0 / g).astype(np.int64)
    pos = {int(v): i for i, v in enumerate(ids)}
    out = []
    for qid in query_ids:
        scores = q @ q[pos[qid]]
        order = sorted((int(-scores[i]), int(v))
                       for i, v in enumerate(ids) if int(v) != qid)
        for rank, (neg, v) in enumerate(order[:k], 1):
            out.append((qid, v, rank, -neg))
    return out


@functools.lru_cache(maxsize=None)
def quantized_topk_oracle_sql(k: int = 10) -> str:
    rows = {}
    for d in _sf_dirs():
        ids, M = _emb(d)
        rows[_doc_key(d)] = quantized_topk_ref(ids, M, [0, 1, 2], k)
    return values_oracle_sql(rows, ["query_id", "vec_id", "rank",
                                    "qscore"], ["BIGINT"] * 4)


def lang_centroids_ref(ids: "np.ndarray", M: "np.ndarray",
                       langs_by_id: dict[int, str]
                       ) -> list[tuple[str, int, int]]:
    """Independent grouped int8 centroid reference (python dicts)."""
    nrm = np.linalg.norm(M, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    Mn = M / nrm
    g = float(np.abs(Mn).max()) or 1.0
    q = np.floor(Mn * 127.0 / g).astype(np.int64)
    groups: dict[str, list[int]] = {}
    for i, v in enumerate(ids):
        groups.setdefault(langs_by_id[int(v)], []).append(i)
    out = []
    for lang in sorted(groups):
        sel = q[groups[lang]]
        s = sel.sum(axis=0)
        for d in range(q.shape[1]):
            out.append((lang, d, int(s[d]) // len(groups[lang])))
    return out


@functools.lru_cache(maxsize=None)
def lang_centroids_oracle_sql() -> str:
    import pyarrow.parquet as pq
    rows = {}
    for d in _sf_dirs():
        ids, M = _emb(d)
        t = pq.read_table(f"{d}/documents.parquet",
                          columns=["doc_id", "lang"])
        langs = dict(zip((int(x) for x in t["doc_id"].to_pylist()),
                         t["lang"].to_pylist()))
        rows[_doc_key(d)] = lang_centroids_ref(ids, M, langs)
    return values_oracle_sql(rows, ["lang", "dim", "centroid_q"],
                             ["VARCHAR", "BIGINT", "BIGINT"])
