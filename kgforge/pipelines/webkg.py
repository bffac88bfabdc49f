"""Flagship pipeline: web pages → knowledge graph (the north-star shape).

    build_pages (Parquet read, streaming)
      → HtmlTextExtractor           Arrow RE2 kernels
      → stringify                   deterministic typed→string
      → CombinedEmit                ONE pass emits the tagged union of
                                    grammar triples + mention pairs +
                                    text-hash rows; only this small
                                    derived table materializes (the
                                    html+text corpus never does)
      ├ 't' grammar triples
      ├ 'm' mention pairs → EntityLinker (actor pool, broadcast alias
        table) → MentionTripleMint
      └ 'h' text hashes → bucket-hash dup-group aggregate →
        size-adaptive (member, canon) mapping (bounded broadcast or
        hash-partitioned join) → rewrite joins/remap + owl:sameAs
      → dedup_triples               two-phase distinct shuffle
      → sort / render               deterministic materialization

Nothing unbounded ever reaches the driver: the mapping is a Dataset,
applied via canonicalize.apply_canonical_mapping (broadcast only when
its exact count is under a hard threshold). The DuckDB oracle for the
whole pipeline is ``webkg_oracle_sql`` — generated from the same
grammar plus a hand-written mention/canonicalization SQL mirror.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..ntriples import OWL_SAMEAS, RDF_TYPE, RDFS_LABEL, render_literal
from ..rules import (
    LiteralRule,
    PKeyRule,
    RuleSet,
    URIRule,
    format_uri,
    parse_alteration,
)
from ..sqlgen import (
    _iri_term,
    _plain_lit_sql,
    _uri_sql,
    ruleset_to_sql,
    sql_quote,
)
from ..sources.pages import build_pages
from ..stages.dedup import dedup_triples
from ..stages.extract import HtmlTextExtractor
from ..stages.linker import EntityLinker
from ..stages.prepare import INT, stringify
from ..stages.triples import TripleGenerator, _const_col, triples_to_terms

DOMAIN = "https://kgforge.example.org/kg/"

# deterministic gazetteer + alias table over the synthetic corpus's
# vocabulary (documents.text word salad) — the linker's small side
LEXICON = ("customer", "spark", "table", "window", "vector", "stream",
           "hash", "merge", "join", "query")
ALIASES = {
    "spark": "apache_spark",
    "hash": "hash_function",
    "vector": "vector_value",
}
LANGS = {"en": "English", "de": "German", "fr": "French",
         "es": "Spanish", "zh": "Chinese"}


def page_ruleset(domain: str = DOMAIN) -> RuleSet:
    """The web-KG grammar: same rule algebra as the reference's ini
    grammars, constructed programmatically over the pages columns."""
    lists = {"*langs*": dict(LANGS)}
    rules = {}
    pkey = PKeyRule(domain, "url", "pkey", "web_page", "")
    rules["url"] = pkey
    rules["lang"] = URIRule(
        domain, "lang", "object,map(all;*langs*)", "language", "in_language",
        alteration=parse_alteration("object,map(all;*langs*)", lists))
    rules["source"] = URIRule(domain, "source", "object", "web_source",
                              "from_source")
    rules["n_chars"] = LiteralRule(
        domain, "n_chars",
        "object", "http://www.w3.org/2001/XMLSchema#integer", "char_count")
    return RuleSet(domain=domain, rules=rules, lists=lists, pkey=pkey)


# ---------------------------------------------------------------- mentions
class MentionPairs:
    """text -> (url, mention) pairs: vectorized split + gazetteer filter."""

    def __init__(self, lexicon=LEXICON):
        self.value_set = pa.array(sorted(lexicon), type=pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks().cast(pa.string())
        url = batch["url"].combine_chunks().cast(pa.string())
        split = pc.split_pattern(text, pattern=" ")
        flat = split.flatten()
        parents = pc.list_parent_indices(split)
        mask = pc.is_in(flat, value_set=self.value_set)
        t = pa.table({
            "url": url.take(parents.filter(mask)),
            "mention": flat.filter(mask),
        })
        # combiner: a token mentioned 40× in one page is one (url,
        # mention) fact — collapse repeats BEFORE the linker/mint fan
        # them out ×3 into the dedup exchange (Arrow group_by, C++)
        return t.group_by(["url", "mention"]).aggregate([])


class MentionTripleMint:
    """(url, canonical mention) -> URIRule-object-pattern triples."""

    def __init__(self, domain: str = DOMAIN, celltype: str = "entity",
                 columntype: str = "mentions", pkey_type: str = "web_page"):
        self.domain = domain
        self.celltype = celltype
        self.columntype = columntype
        self.pkey_type = pkey_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.triples import mint_uris
        # combiner: aliasing can merge mentions (spark→apache_spark
        # while apache_spark also appears raw) — distinct again on the
        # canonical form so the ×3 mint fan-out stays minimal
        batch = (batch.select(["url", "canonical"])
                 .group_by(["url", "canonical"]).aggregate([]))
        n = batch.num_rows
        if n == 0:
            from ..stages.triples import TRIPLE_SCHEMA
            return TRIPLE_SCHEMA.empty_table()
        ent = batch["canonical"].combine_chunks().cast(pa.string())
        url = batch["url"].combine_chunks().cast(pa.string())
        tv = mint_uris(self.domain, ent)
        pkv = mint_uris(self.domain, url)
        ct = self.domain + format_uri(self.celltype)
        colt = self.domain + format_uri(self.columntype)
        pktu = self.domain + format_uri(self.pkey_type)
        s = [tv, tv, pkv]
        p = [_const_col(RDFS_LABEL, n), _const_col(RDF_TYPE, n),
             _const_col(colt, n)]
        kind = [_const_col("l", n), _const_col("u", n), _const_col("u", n)]
        lex = [ent, _const_col(ct, n), tv]
        dt = [_const_col("", n)] * 3
        # schema triples once per batch (rule fired)
        consts = [
            (ct, RDFS_LABEL, "l", self.celltype, ""),
            (colt, RDFS_LABEL, "l", self.columntype, ""),
            (colt, "http://www.w3.org/2000/01/rdf-schema#domain", "u", pktu, ""),
            (colt, "http://www.w3.org/2000/01/rdf-schema#range", "u", ct, ""),
        ]
        s.append(pa.array([c[0] for c in consts], type=pa.string()))
        p.append(pa.array([c[1] for c in consts], type=pa.string()))
        kind.append(pa.array([c[2] for c in consts], type=pa.string()))
        lex.append(pa.array([c[3] for c in consts], type=pa.string()))
        dt.append(pa.array([c[4] for c in consts], type=pa.string()))
        from ..stages.triples import TRIPLE_SCHEMA
        return pa.Table.from_arrays(
            [pa.concat_arrays([a.cast(pa.string()) for a in s]),
             pa.concat_arrays([a.cast(pa.string()) for a in p]),
             pa.concat_arrays([a.cast(pa.string()) for a in kind]),
             pa.concat_arrays([a.cast(pa.string()) for a in lex]),
             pa.concat_arrays([a.cast(pa.string()) for a in dt])],
            schema=TRIPLE_SCHEMA)


# ------------------------------------------------------- canonicalization
class _TextHashUri:
    def __init__(self, domain: str):
        self.domain = domain

    def __call__(self, batch: pa.Table) -> pa.Table:
        # vectorized deterministic 64-bit text hash (internal grouping
        # key only — the SQL mirror partitions by the text itself, so
        # the hash function is free to choose; polars hash_rows with a
        # fixed seed is process-stable and boxes no Python strings)
        import polars as pl
        from ..stages.triples import mint_uris
        text = batch["text"].combine_chunks().cast(pa.string())
        url = batch["url"].combine_chunks().cast(pa.string())
        h = (pl.from_arrow(pa.table({"t": text})).hash_rows(seed=0)
             .reinterpret(signed=True).to_numpy())
        return pa.table({"h": pa.array(h, type=pa.int64()),
                         "uri": mint_uris(self.domain, url)})


def exact_dup_mapping(hashed: "ray.data.Dataset",
                      num_partitions: int | None = None
                      ) -> "ray.data.Dataset":
    """(h, uri) page hashes -> (member, canon) mapping *Dataset*: pages
    sharing identical extracted text merge into one entity, canonical =
    lexicographic min page-URI per text group.

    ONE hash-partitioned shuffle: rows bucket by ``h % NUM_BUCKETS``
    (every row of a text group lands in the same bucket), and each
    bucket finds its duplicate groups AND their members in a single
    Arrow pass (group_by min/count + an in-bucket C++ join) — no second
    pass over the pages, no driver collection, correct at any dup mass
    (Common Crawl exact-dup mass is tens of percent of the corpus).
    Python touches only NUM_BUCKETS groups (Ray's sort-aggregate
    iterates groups in Python, so the raw hash must never be the
    groupby key)."""
    from ..stages.dedup import default_num_buckets
    nb = default_num_buckets()

    def bucketize(batch: pa.Table) -> pa.Table:
        import numpy as np
        hv = batch["h"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_bucket", pa.array((hv % nb).astype(np.int32)))

    mapping_schema = pa.schema([("member", pa.string()),
                                ("canon", pa.string())])

    def bucket_members(group: pa.Table) -> pa.Table:
        t = group.select(["h", "uri"])
        agg = t.group_by(["h"]).aggregate([("uri", "min"), ("h", "count")])
        dup = agg.filter(pc.greater(agg["h_count"], 1)).select(
            ["h", "uri_min"])
        if dup.num_rows == 0:
            return mapping_schema.empty_table()
        j = t.join(dup, keys="h")                # in-bucket Acero join
        uri = j["uri"].combine_chunks().cast(pa.string())
        canon = j["uri_min"].combine_chunks().cast(pa.string())
        mask = pc.invert(pc.equal(uri, canon))
        return pa.table({"member": uri.filter(mask),
                         "canon": canon.filter(mask)})

    return (hashed.map_batches(bucketize, batch_format="pyarrow")
            .groupby("_bucket").map_groups(bucket_members,
                                           batch_format="pyarrow"))


def exact_dup_mapping_adaptive(hashed: "ray.data.Dataset"
                               ) -> "ray.data.Dataset":
    """Size-adaptive wrapper: below KGFORGE_DUPMAP_DRIVER_LIMIT rows
    the (member, canon) mapping is computed DRIVER-side in one polars
    pass, eliminating a whole distributed execution (shuffle +
    materialize barrier, the dominant FIXED term of the canonicalize
    step at gate/bench input sizes — see BASELINE.md fixed-cost
    breakdown). Above the limit: the hash-partitioned
    ``exact_dup_mapping`` shuffle, correct at any dup mass (100 TB
    path). Both paths emit the identical mapping set (pinned in
    tests/test_extensions.py).

    The default limit is 50k rows, deliberately small: the driver pull
    plus the single-block mapping it returns are a SERIAL term — at
    1.28M rows it measured ~20-25 s added to every parallelism level
    (×256 scaling efficiency collapsed 0.81 -> 0.50 before this bound
    was tightened), while the distributed shuffle it replaces costs
    only ~1 s. The driver path must only ever win where that 1 s
    dominates, i.e. corpora of a few thousand pages.

    Returns a MATERIALIZED Dataset either way (the mapping fans out to
    three consumers)."""
    import os as _os

    limit = int(_os.environ.get("KGFORGE_DUPMAP_DRIVER_LIMIT", "50000"))
    parts: list[pa.Table] = []
    n = 0
    if limit > 0:
        for b in hashed.iter_batches(batch_format="pyarrow"):
            parts.append(b)
            n += b.num_rows
            if n > limit:
                break
    if limit <= 0 or n > limit:
        return exact_dup_mapping(hashed).materialize()
    import polars as pl
    mapping_schema = pa.schema([("member", pa.string()),
                                ("canon", pa.string())])
    if n == 0:
        return ray.data.from_arrow(mapping_schema.empty_table())
    t = pl.from_arrow(pa.concat_tables(parts))
    agg = t.group_by("h").agg(pl.col("uri").min().alias("canon"),
                              pl.len().alias("_n"))
    dup = agg.filter(pl.col("_n") > 1).select(["h", "canon"])
    j = (t.join(dup, on="h", how="inner")
         .filter(pl.col("uri") != pl.col("canon")))
    out = pa.table({"member": j["uri"].to_arrow().cast(pa.string()),
                    "canon": j["canon"].to_arrow().cast(pa.string())})
    return ray.data.from_arrow(out.cast(mapping_schema))


# -------------------------------------------------------------- pipeline
def build_prepared_pages(sf_dir: str,
                         extractor_concurrency: int = 2,
                         paths: list[str] | None = None
                         ) -> "ray.data.Dataset":
    """pages + extracted text + stringified metadata (the input half of
    the flagship). ``paths`` restricts to a shard-file subset — the
    partitioned runner's read pruning."""
    pages = build_pages(sf_dir, paths=paths)
    # extractor state is just compiled regexes — shipped pre-compiled in
    # the pickled instance, so elastic stateless TASKS beat an actor
    # pool here (no pool-spawn latency, no reserved CPUs); the linker
    # below is the true actor-pool stage (it holds a loaded table)
    pages = pages.map_batches(HtmlTextExtractor(), batch_format="pyarrow")
    return pages.map_batches(stringify({"doc_id": INT, "n_chars": INT}),
                             batch_format="pyarrow")


# tagged union of the three derived streams one pages pass produces:
#   tag 't': a grammar triple        (s, p, o_kind, o_lex, o_dt)
#   tag 'm': a mention pair          (s=page url, p=mention token)
#   tag 'h': a text-hash row         (s=page URI, h=64-bit text hash)
COMBINED_SCHEMA = pa.schema([
    ("tag", pa.string()), ("s", pa.string()), ("p", pa.string()),
    ("o_kind", pa.string()), ("o_lex", pa.string()), ("o_dt", pa.string()),
    ("h", pa.int64()),
])


class CombinedEmit:
    """ONE pass over prepared pages emitting all three derived streams
    as a tagged union (COMBINED_SCHEMA). The full pages corpus
    (html+text) is consumed exactly once and never materialized; only
    this far smaller derived table fans out to the three downstream
    consumers (grammar triples, mention linking, dup detection) — the
    peak object-store footprint is bounded by derived-data size, not the
    corpus."""

    def __init__(self, ruleset: RuleSet, domain: str, lexicon=LEXICON):
        self.gen = TripleGenerator(ruleset)
        self.pairs = MentionPairs(lexicon)
        self.hasher = _TextHashUri(domain)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.gen(batch)
        m = self.pairs(batch)
        h = self.hasher(batch)
        nt, nm, nh = t.num_rows, m.num_rows, h.num_rows

        def cat(parts):
            return pa.concat_arrays([p.combine_chunks() if
                                     isinstance(p, pa.ChunkedArray) else p
                                     for p in parts])

        snull = lambda n: pa.nulls(n, pa.string())
        tag = cat([_const_col("t", nt), _const_col("m", nm),
                   _const_col("h", nh)])
        s = cat([t["s"], m["url"], h["uri"]])
        p = cat([t["p"], m["mention"], snull(nh)])
        o_kind = cat([t["o_kind"], snull(nm + nh)])
        o_lex = cat([t["o_lex"], snull(nm + nh)])
        o_dt = cat([t["o_dt"], snull(nm + nh)])
        hcol = cat([pa.nulls(nt + nm, pa.int64()), h["h"]])
        return pa.Table.from_arrays([tag, s, p, o_kind, o_lex, o_dt, hcol],
                                    schema=COMBINED_SCHEMA)


def _tagged(combined: "ray.data.Dataset", tag: str, cols: list[str],
            names: list[str]) -> "ray.data.Dataset":
    """Select one tagged stream back out of the combined table."""
    def fn(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["tag"], tag)).select(cols)
        return t.rename_columns(names)
    return combined.map_batches(fn, batch_format="pyarrow")


def webkg_triples_from_pages(pages: "ray.data.Dataset",
                             domain: str = DOMAIN,
                             canonicalize: bool = True,
                             linker_concurrency: tuple[int, int] | int | None
                             = None,
                             dedup: bool = True) -> "ray.data.Dataset":
    """The transform half: prepared pages -> deduped triples.

    The pages stream feeds THREE consumers (grammar triples, mention
    path, dup-detection). Ray re-executes a lazy prefix per consumer, so
    a naive fan-out would run extraction 3× — and materializing the full
    pages corpus instead would put html+text in the object store. The
    ``CombinedEmit`` pass resolves both: one streaming pass over pages
    emits the tagged union of the three small derived streams, and only
    THAT is materialized for fan-out."""
    rs = page_ruleset(domain)
    combined = pages.map_batches(CombinedEmit(rs, domain),
                                 batch_format="pyarrow").materialize()

    if linker_concurrency is None:
        # ONE scan of combined produces the whole triple stream: the
        # tag-'t' grammar triples pass through and the tag-'m' mention
        # rows run link+mint in the SAME batch fn — the alias table
        # here is a tiny broadcast dict, so the linker ships as a
        # prebuilt task closure. Measured at 320k docs / 16 CPUs: the
        # previous shape (separate tag scans + an actor-pool linker
        # breaking map fusion + a union) cost ~2.5 s in pool spawn and
        # serialized stage spans, plus a redundant 430 MB scan. An
        # actor pool stays the right shape when the alias source is a
        # LOADED TABLE (EntityLinker's parquet-path mode): pass
        # linker_concurrency explicitly to get the pool path.
        from ..stages.triples import TRIPLE_SCHEMA
        linker = EntityLinker(dict(ALIASES), "mention", "canonical")
        mint = MentionTripleMint(domain)
        tcols = list(TRIPLE_SCHEMA.names)

        def triples_from_tags(b: pa.Table) -> pa.Table:
            t = (b.filter(pc.equal(b["tag"], "t")).select(tcols)
                 .cast(TRIPLE_SCHEMA))
            m = b.filter(pc.equal(b["tag"], "m"))
            mm = pa.table({"url": m["s"].combine_chunks(),
                           "mention": m["p"].combine_chunks()})
            return pa.concat_tables([t, mint(linker(mm))])

        triples = combined.map_batches(triples_from_tags,
                                       batch_format="pyarrow")
    else:
        base = _tagged(combined, "t",
                       ["s", "p", "o_kind", "o_lex", "o_dt"],
                       ["s", "p", "o_kind", "o_lex", "o_dt"])
        tagged_m = _tagged(combined, "m", ["s", "p"], ["url", "mention"])
        alias_ref = ray.put(dict(ALIASES))
        linked = tagged_m.map_batches(
            EntityLinker, batch_format="pyarrow",
            fn_constructor_kwargs={"alias_source": alias_ref,
                                   "input_col": "mention",
                                   "output_col": "canonical"},
            concurrency=linker_concurrency, num_cpus=0.5)
        mentions = linked.map_batches(MentionTripleMint(domain),
                                      batch_format="pyarrow")
        triples = base.union(mentions)

    if canonicalize:
        from ..stages.canonicalize import (apply_canonical_mapping,
                                           drop_empty_blocks,
                                           sameas_from_mapping)
        hashed = _tagged(combined, "h", ["h", "s"], ["h", "uri"])
        # the mapping feeds three consumers (two rewrite joins + sameAs
        # emission) — materialize it once; it is (member, canon) pairs
        # over duplicate pages only, distributed in the object store
        mapping = drop_empty_blocks(
            exact_dup_mapping_adaptive(hashed),
            pa.schema([("member", pa.string()), ("canon", pa.string())]))
        if mapping.count() > 0:   # no dup pages -> skip both rewrites
            triples = apply_canonical_mapping(triples, mapping)
            triples = triples.union(sameas_from_mapping(mapping))
    if not dedup:
        # pre-distinct stream (exchange-payload measurement hook)
        return triples
    # stages.dedup.distinct_prefilter (exchange row HASHES, shuffle only
    # the duplicated remainder) is the multi-node path for this final
    # distinct — on one node the exchange is shared-memory, so the
    # payload reduction measured net-neutral here; flip via env
    prefilter = os.environ.get("KGFORGE_DISTINCT_PREFILTER") == "1"
    return dedup_triples(triples, domain=domain, prefilter=prefilter)


def webkg_triples(sf_dir: str, domain: str = DOMAIN,
                  canonicalize: bool = True,
                  linker_concurrency: tuple[int, int] | int | None = None
                  ) -> "ray.data.Dataset":
    """Full flagship: returns the deduped triple Dataset (columnar)."""
    pages = build_prepared_pages(sf_dir)
    return webkg_triples_from_pages(pages, domain, canonicalize,
                                    linker_concurrency)


def webkg_terms(sf_dir: str, domain: str = DOMAIN, **kw) -> "ray.data.Dataset":
    """(s, p, o) rendered-term form of the flagship output."""
    return webkg_triples(sf_dir, domain, **kw).map_batches(
        triples_to_terms, batch_format="pyarrow")


# ---------------------------------------------------------- URL analysis
def host_doc_stats(sf_dir: str) -> "ray.data.Dataset":
    """Per-host rollup over the pages table: host extracted from the
    url column with an Arrow RE2 kernel (named group), then a
    pre-aggregated groupby — the shape of any per-domain web-corpus
    accounting job (crawl budgeting, robots audits, dedup-by-site)."""
    from ray.data.aggregate import Sum
    pages = build_pages(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        url = batch["url"].combine_chunks().cast(pa.string())
        host = pc.struct_field(
            pc.extract_regex(url, pattern=r"^https?://(?P<host>[^/]+)/"),
            "host")
        t = pa.table({"host": host,
                      "n_chars": batch["n_chars"].combine_chunks()
                      .cast(pa.int64())})
        return t.group_by(["host"]).aggregate([("host", "count"),
                                               ("n_chars", "sum")])

    agg = (pages.map_batches(partial, batch_format="pyarrow")
           .groupby("host")
           .aggregate(Sum("host_count", alias_name="n_docs"),
                      Sum("n_chars_sum", alias_name="total_chars")))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "host": batch["host"],
            "n_docs": batch["n_docs"].cast(pa.int64()),
            "total_chars": batch["total_chars"].cast(pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# pages derive deterministically from documents (sources/pages.py), so
# the SQL mirror rebuilds the same url and extracts the same host
HOST_DOC_STATS_SQL = """
SELECT regexp_extract('https://' || source || '.example.org/doc/'
                      || CAST(doc_id AS VARCHAR),
                      '^https?://([^/]+)/', 1) AS host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
"""


# ------------------------------------------------------------ SQL oracle
def webkg_oracle_sql(domain: str = DOMAIN, docs: str = "documents") -> str:
    """DuckDB mirror of the full flagship over the ``documents`` view.

    The pages table is a deterministic function of documents (see
    sources/pages.py) and text extraction inverts it byte-for-byte, so
    the oracle works directly on documents: url/lang/source/n_chars per
    the grammar, mention triples via string_split + gazetteer + alias
    CASE, canonicalization via min(url-URI) over identical-text groups.
    """
    rs = page_ruleset(domain)
    # canonical page URI: min over identical-text partition, of the minted URI
    url_expr = f"('https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR))"
    uri_expr = _uri_sql(domain, url_expr)
    base = (f"(SELECT *, {url_expr} AS _url, "
            f"MIN({uri_expr}) OVER (PARTITION BY text) AS _canon_uri, "
            f"{uri_expr} AS _self_uri FROM {docs})")
    # the grammar runs over the canonicalized subject: url cell value is
    # only used sanitized-at-mint (pkey raw quirk doesn't bite: url label
    # literal keeps the RAW member url... but canonicalization REWRITES
    # the minted subject IRI, not the label; mirror by emitting labels
    # from the raw url and rewriting only IRI positions.
    colmap = {"url": "_url", "lang": "lang", "source": "source",
              "n_chars": "CAST(n_chars AS VARCHAR)"}
    base_sql = ruleset_to_sql(rs, base, colmap)
    # rewrite IRI occurrences of non-canonical page URIs — one
    # independent LEFT JOIN per position (s, o), so a triple carrying
    # members in BOTH positions rewrites both without row duplication
    rewritten = (
        f"WITH _m AS (SELECT DISTINCT _self_uri AS member, _canon_uri AS canon "
        f"FROM {base} WHERE _self_uri <> _canon_uri) "
        "SELECT COALESCE(ms.canon, t.s) AS s, t.p, "
        "CASE WHEN mo.member IS NOT NULL THEN '<'||mo.canon||'>' ELSE t.o END AS o "
        f"FROM ({base_sql}) t "
        "LEFT JOIN _m ms ON t.s = ms.member "
        "LEFT JOIN _m mo ON t.o = '<'||mo.member||'>'"
    )
    # mention triples (aliased) + owl:sameAs pairs
    in_list = ", ".join(sql_quote(t) for t in sorted(LEXICON))
    whens = " ".join(f"WHEN {sql_quote(k)} THEN {sql_quote(v)}"
                     for k, v in sorted(ALIASES.items()))
    canon_tok = f"(CASE tok {whens} ELSE tok END)"
    tok_src = (f"(SELECT _canon_uri AS pkuri, "
               f"unnest(string_split(text, ' ')) AS tok FROM {base})")
    tv = _uri_sql(domain, canon_tok)
    ct = domain + format_uri("entity")
    colt = domain + format_uri("mentions")
    pktu = domain + format_uri("web_page")
    mention_sql = f"""
SELECT {tv} AS s, {sql_quote(RDFS_LABEL)} AS p, {_plain_lit_sql(canon_tok)} AS o
FROM {tok_src} WHERE tok IN ({in_list})
UNION ALL
SELECT {tv} AS s, {sql_quote(RDF_TYPE)} AS p, {sql_quote(f'<{ct}>')} AS o
FROM {tok_src} WHERE tok IN ({in_list})
UNION ALL
SELECT pkuri AS s, {sql_quote(colt)} AS p, {_iri_term(tv)} AS o
FROM {tok_src} WHERE tok IN ({in_list})
UNION ALL
SELECT {sql_quote(ct)} AS s, {sql_quote(RDFS_LABEL)} AS p, {sql_quote(render_literal("entity"))} AS o WHERE EXISTS (SELECT 1 FROM {tok_src} WHERE tok IN ({in_list}))
UNION ALL
SELECT {sql_quote(colt)} AS s, {sql_quote(RDFS_LABEL)} AS p, {sql_quote(render_literal("mentions"))} AS o WHERE EXISTS (SELECT 1 FROM {tok_src} WHERE tok IN ({in_list}))
UNION ALL
SELECT {sql_quote(colt)} AS s, {sql_quote("http://www.w3.org/2000/01/rdf-schema#domain")} AS p, {sql_quote(f'<{pktu}>')} AS o WHERE EXISTS (SELECT 1 FROM {tok_src} WHERE tok IN ({in_list}))
UNION ALL
SELECT {sql_quote(colt)} AS s, {sql_quote("http://www.w3.org/2000/01/rdf-schema#range")} AS p, {sql_quote(f'<{ct}>')} AS o WHERE EXISTS (SELECT 1 FROM {tok_src} WHERE tok IN ({in_list}))
"""
    sameas_sql = (
        f"SELECT member AS s, {sql_quote(OWL_SAMEAS)} AS p, "
        f"'<'||canon||'>' AS o FROM (SELECT DISTINCT _self_uri AS member, "
        f"_canon_uri AS canon FROM {base} WHERE _self_uri <> _canon_uri)"
    )
    return (f"SELECT DISTINCT s, p, o FROM (\n({rewritten})\nUNION ALL\n"
            f"{mention_sql}\nUNION ALL\n{sameas_sql}\n)")


def webkg_store(sf_dir: str) -> str:
    """Idempotent predicate-partitioned store of the FLAGSHIP web-KG
    output (webkg_terms) under /tmp — content-keyed on the documents
    table, atomic build. Ties the two flagship surfaces together:
    pages → KG construction → SPARQL over the constructed store."""
    import glob
    import hashlib
    import os
    import shutil
    src = sorted(glob.glob(os.path.join(sf_dir, "documents*.parquet")))
    stamp = ";".join(f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p):.6f}"
                     for p in src)
    key = hashlib.md5(f"webkgstore:{os.path.abspath(sf_dir)}:{stamp}"
                      .encode()).hexdigest()[:12]
    store = f"/tmp/kgforge_webkgstore_{key}"
    marker = os.path.join(store, "_SUCCESS")
    if os.path.exists(marker):
        return store
    shutil.rmtree(store, ignore_errors=True)
    tmp = store + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    from ..sinks.ntriples_sink import write_graph_partitioned
    os.makedirs(tmp, exist_ok=True)
    write_graph_partitioned(webkg_terms(sf_dir), tmp)
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    os.replace(tmp, store)
    return store


WEBKG_SPARQL_TEXT = """
SELECT ?p (COUNT(*) AS ?n) WHERE { ?x ?p ?y }
GROUP BY ?p ORDER BY DESC(?n) ?p
"""


def sparql_webkg_predicates(sf_dir: str) -> "ray.data.Dataset":
    """Gate: the END-TO-END story in one query — synthesize web pages,
    construct the KG (webkg_terms), publish it as a partitioned store,
    and answer a SPARQL aggregate (predicate histogram) over it. The
    oracle recomputes the same histogram from the independent SQL
    derivation of the flagship pipeline."""
    from ..sparql import execute_sparql, parse_sparql
    q = parse_sparql(WEBKG_SPARQL_TEXT)[0]
    assert q.aggs and q.group_by == ["p"]
    return execute_sparql(webkg_store(sf_dir), q)


def sparql_webkg_predicates_sql() -> str:
    return (f"SELECT p, CAST(count(*) AS BIGINT) AS n "
            f"FROM ({webkg_oracle_sql()}) "
            f"GROUP BY p ORDER BY n DESC, p ASC")
