"""Web-KG pipeline tests: extraction invariant, linker, canonicalize,
flagship-vs-DuckDB parity at sf0.001."""

import duckdb
import pyarrow as pa
import pytest

from kgforge.sources.pages import wrap_html, PageBuilder
from kgforge.stages.extract import HtmlTextExtractor, extract_text

SF = "/root/testdata/sf0.001"


def test_extract_inverts_wrap():
    cases = [
        ("plain words here", 1),
        ("a & b < c > d && &amp; mixed", 2),
        ("unicode é日本語 text", 3),
        ("with  double  spaces", 97),   # bad-byte page
        ("", 5),
    ]
    for text, doc_id in cases:
        assert extract_text(wrap_html(text, doc_id)) == text, (text, doc_id)


def test_extractor_batch_matches_scalar():
    texts = [f"doc body {i} & <tag-ish> text" for i in range(300)]
    html = [wrap_html(t, i) for i, t in enumerate(texts)]
    batch = pa.table({"html": pa.array(html, type=pa.binary())})
    out = HtmlTextExtractor()(batch)
    assert out["text"].to_pylist() == [extract_text(h) for h in html]
    assert out["text"].to_pylist() == texts


def test_page_builder_deterministic_and_invariant(ray_session):
    import ray.data as rd
    docs = rd.read_parquet(f"{SF}/documents.parquet").limit(200)
    pages = docs.map_batches(PageBuilder(), batch_format="pyarrow")
    pages = pages.map_batches(HtmlTextExtractor, batch_format="pyarrow",
                              concurrency=2, num_cpus=0.5)
    df = pages.to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = rd.read_parquet(f"{SF}/documents.parquet").limit(200).to_pandas()
    orig = orig.sort_values("doc_id").reset_index(drop=True)
    # north-rule invariant: byte-identical extracted text per url
    assert (df["text"] == orig["text"]).all()
    assert df["url"].is_unique


def test_entity_linker_miss_passthrough(ray_session):
    import ray
    from kgforge.stages.linker import EntityLinker
    ref = ray.put({"spark": "apache_spark"})
    lk = EntityLinker(ref, "mention", "canonical")
    out = lk(pa.table({"mention": ["spark", "unknown", "spark"]}))
    assert out["canonical"].to_pylist() == ["apache_spark", "unknown",
                                            "apache_spark"]


def _mapping_dict(mapping_ds):
    df = mapping_ds.to_pandas()
    return dict(zip(df["member"], df["canon"]))


def test_connected_components_chain(ray_session):
    import ray.data as rd
    from kgforge.stages.canonicalize import (
        canonical_mapping_from_components, connected_components)
    # chain a-b-c-d plus isolated pair x-y: canon = min member
    edges = rd.from_items([
        {"a": "b", "b": "c"}, {"a": "a", "b": "b"}, {"a": "c", "b": "d"},
        {"a": "y", "b": "x"},
    ])
    labels = connected_components(edges)
    m = _mapping_dict(canonical_mapping_from_components(labels))
    assert m == {"b": "a", "c": "a", "d": "a", "y": "x"}


def test_apply_canonical_mapping(ray_session):
    import ray.data as rd
    from kgforge.stages.canonicalize import apply_canonical_mapping
    t = rd.from_items([
        {"s": "B", "p": "pred", "o_kind": "u", "o_lex": "C", "o_dt": ""},
        {"s": "A", "p": "lab", "o_kind": "l", "o_lex": "B", "o_dt": ""},
    ])
    mapping = rd.from_items([{"member": "B", "canon": "A"},
                             {"member": "C", "canon": "A"}])
    out = apply_canonical_mapping(t, mapping).to_pandas()
    out = out.sort_values(["s", "p"]).reset_index(drop=True)
    # URI positions rewritten; literal o untouched even though its
    # lexical form ("B") equals a member IRI
    assert out.loc[1, "s"] == "A" and out.loc[1, "o_lex"] == "A"
    assert out.loc[0, "s"] == "A" and out.loc[0, "o_lex"] == "B"


def test_apply_canonical_mapping_empty(ray_session):
    import ray.data as rd
    import pyarrow as pa_
    from kgforge.stages.canonicalize import apply_canonical_mapping
    t = rd.from_items([
        {"s": "B", "p": "pred", "o_kind": "u", "o_lex": "C", "o_dt": ""}])
    empty = rd.from_arrow(pa_.table(
        {"member": pa_.array([], type=pa_.string()),
         "canon": pa_.array([], type=pa_.string())}))
    out = apply_canonical_mapping(t, empty).to_pandas()
    assert out.loc[0, "s"] == "B" and out.loc[0, "o_lex"] == "C"


def test_skolem_deterministic():
    from kgforge.stages.canonicalize import skolem_iri
    a = skolem_iri("https://d/", "node-content-1")
    assert a == skolem_iri("https://d/", "node-content-1")
    assert a != skolem_iri("https://d/", "node-content-2")
    assert a.startswith("https://d/.well-known/genid/")


def test_skolem_canonical_mapping(ray_session):
    import ray.data as rd
    from kgforge.stages.canonicalize import (connected_components,
                                             skolem_canonical_mapping)
    edges = rd.from_items([{"a": "x", "b": "y"}, {"a": "y", "b": "z"}])
    labels = connected_components(edges)
    m = _mapping_dict(skolem_canonical_mapping(labels, "https://d/"))
    assert set(m) == {"x", "y", "z"}
    # all members of the component share ONE skolem IRI
    assert len(set(m.values())) == 1
    sk = next(iter(m.values()))
    assert sk.startswith("https://d/.well-known/genid/")
    # deterministic across recomputation
    m2 = _mapping_dict(skolem_canonical_mapping(
        connected_components(edges), "https://d/"))
    assert m == m2


def test_flagship_parallelism_independent(ray_session):
    """North-rule determinism: the flagship's triple SET is identical
    under different block structures (content-keyed everything — no
    ordinals, no process-salted hashes, batch-local combiners only
    reduce duplicates the global dedup removes anyway)."""
    from ray.data import DataContext

    from kgforge.pipelines.webkg import webkg_terms
    ctx = DataContext.get_current()
    old = ctx.read_op_min_num_blocks
    outs = []
    try:
        for nblocks in (2, 23):
            ctx.read_op_min_num_blocks = nblocks
            df = webkg_terms(SF).to_pandas()
            outs.append(sorted(map(tuple, df[["s", "p", "o"]]
                                   .itertuples(index=False))))
    finally:
        ctx.read_op_min_num_blocks = old
    assert outs[0] == outs[1]
    assert len(outs[0]) > 0


@pytest.mark.slow
def test_flagship_matches_duckdb_oracle(ray_session):
    from kgforge.pipelines.webkg import webkg_oracle_sql, webkg_terms
    df = webkg_terms(SF).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
    odf = con.sql(webkg_oracle_sql()).df()
    got = set(map(tuple, df[["s", "p", "o"]].itertuples(index=False)))
    want = set(map(tuple, odf[["s", "p", "o"]].itertuples(index=False)))
    assert got == want and len(df) == len(odf)


def test_tabular_kg_matches_sql(ray_session):
    from kgforge.pipelines.tabular import table_kg_sql, table_kg_terms
    df = table_kg_terms(SF, "nation").to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW nation AS SELECT * FROM "
            f"read_parquet('{SF}/nation.parquet')")
    odf = con.sql(table_kg_sql("nation")).df()
    got = set(map(tuple, df[["s", "p", "o"]].itertuples(index=False)))
    want = set(map(tuple, odf[["s", "p", "o"]].itertuples(index=False)))
    assert got == want


@pytest.mark.parametrize("broadcast_limit", [None, "0"])
def test_flagship_canonicalizes_duplicate_pages(ray_session, tmp_path,
                                                monkeypatch,
                                                broadcast_limit):
    """Planted duplicate texts: subjects merge to the min page-URI and
    owl:sameAs triples are emitted. Parametrized over the size-adaptive
    canonicalization strategy: default (broadcast fast path) and
    limit=0 (forced hash-join path) must agree."""
    if broadcast_limit is not None:
        monkeypatch.setenv("KGFORGE_BROADCAST_LIMIT", broadcast_limit)
    import pandas as pd
    from kgforge.pipelines.webkg import webkg_triples
    from kgforge.stages.triples import triples_to_terms
    df = pd.DataFrame({
        "doc_id": [3, 1, 2],
        "text": ["same words here", "same words here", "other text"],
        "lang": ["en", "en", "de"],
        "source": ["s1", "s2", "s3"],
        "n_chars": [15, 15, 10],
    })
    df.to_parquet(tmp_path / "documents.parquet")
    out = webkg_triples(str(tmp_path)).map_batches(
        triples_to_terms, batch_format="pyarrow").to_pandas()
    triples = set(map(tuple, out[["s", "p", "o"]].itertuples(index=False)))
    sameas = {(s, o) for s, p, o in triples if p.endswith("sameAs")}
    # doc 1 (s2) and doc 3 (s1) share text; canonical = min minted URI
    assert len(sameas) == 1
    member, canon = next(iter(sameas))
    assert canon[1:-1] < member  # canonical is the lexicographic min
    # the non-canonical page URI no longer appears as a subject of facts
    assert not any(s == member and "in_language" in p
                   for s, p, o in triples)


def test_dup_mapping_driver_path_equals_distributed(ray_session,
                                                    monkeypatch):
    """exact_dup_mapping_adaptive: the driver-side polars fast path
    (default at sub-cluster scale) and the hash-partitioned distributed
    path (KGFORGE_DUPMAP_DRIVER_LIMIT=0 forces it) emit the identical
    (member, canon) set, and the flagship output is identical through
    both."""
    from kgforge.pipelines.webkg import webkg_terms

    a = webkg_terms(SF).to_pandas()
    monkeypatch.setenv("KGFORGE_DUPMAP_DRIVER_LIMIT", "0")
    b = webkg_terms(SF).to_pandas()
    ta = set(map(tuple, a[["s", "p", "o"]].itertuples(index=False)))
    tb = set(map(tuple, b[["s", "p", "o"]].itertuples(index=False)))
    assert ta == tb and len(ta) > 0


def test_dup_mapping_adaptive_planted(ray_session, tmp_path, monkeypatch):
    """Planted duplicates through BOTH adaptive paths: identical
    mapping rows (member -> lexicographic-min canon)."""
    import pandas as pd
    from kgforge.pipelines.webkg import (build_prepared_pages,
                                         exact_dup_mapping_adaptive,
                                         page_ruleset, CombinedEmit,
                                         DOMAIN, _tagged)

    df = pd.DataFrame({
        "doc_id": [3, 1, 2, 4],
        "text": ["same words here", "same words here", "other text",
                 "same words here"],
        "lang": ["en", "en", "de", "en"],
        "source": ["s1", "s2", "s3", "s4"],
        "n_chars": [15, 15, 10, 15],
    })
    df.to_parquet(tmp_path / "documents.parquet")
    rs = page_ruleset(DOMAIN)
    combined = build_prepared_pages(str(tmp_path)).map_batches(
        CombinedEmit(rs, DOMAIN), batch_format="pyarrow").materialize()
    hashed = _tagged(combined, "h", ["h", "s"], ["h", "uri"])
    drv = sorted(map(tuple, exact_dup_mapping_adaptive(hashed)
                     .to_pandas().itertuples(index=False)))
    monkeypatch.setenv("KGFORGE_DUPMAP_DRIVER_LIMIT", "0")
    dist = sorted(map(tuple, exact_dup_mapping_adaptive(hashed)
                      .to_pandas().itertuples(index=False)))
    assert drv == dist
    assert len(drv) == 2            # docs {1,3,4} merge -> 2 members
    canons = {c for _, c in drv}
    assert len(canons) == 1
    assert all(c < m for m, c in drv)


def test_linker_pool_path_equals_fused_path(ray_session):
    """The actor-pool linker branch (explicit linker_concurrency) and
    the default task-fused branch must produce the same triples."""
    from kgforge.pipelines.webkg import webkg_terms
    a = webkg_terms(SF).to_pandas()
    b = webkg_terms(SF, linker_concurrency=(1, 2)).to_pandas()
    ta = set(map(tuple, a[["s", "p", "o"]].itertuples(index=False)))
    tb = set(map(tuple, b[["s", "p", "o"]].itertuples(index=False)))
    assert ta == tb and len(ta) > 0
