"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in kgforge/) calls ray.init()/ray.shutdown().

Each ``queries()`` entry is an implemented operator/pipeline from
SURVEY.md §2; ``oracle_sql()`` holds the equivalent DuckDB SQL over the
pre-registered views (region nation customer supplier part orders
lineitem events documents embeddings). Column names match between the
two by construction (shared grammar + shared stringification specs).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def _tune_context() -> None:
    """Idempotent Ray Data tuning for whatever session the driver owns
    (no ray.init here). Knobs + measured rationale: kgforge/tuning.py."""
    from kgforge.tuning import tune_data_context

    tune_data_context()


def entry() -> Any:
    """Flagship: web-pages → KG pipeline on sf0.001 (build pages from
    documents deterministically, extract text, grammar+mention triples,
    actor-pool entity linking, canonicalize, dedup)."""
    _tune_context()
    from kgforge.pipelines.webkg import webkg_terms

    return webkg_terms("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    _tune_context()
    from kgforge.ops import ann, dedup, multimodal, relational, text
    from kgforge.pipelines import tabular, webkg

    q: dict[str, Callable[[str], Any]] = {}

    # --- flagship web-KG pipeline (S2,M1,M2,M4,M12,A1,A5 + extensions)
    q["webkg_triples"] = lambda sf: webkg.webkg_terms(sf)
    # per-host web-corpus accounting (URL parse + pre-agg rollup)
    q["host_doc_stats"] = webkg.host_doc_stats
    # end-to-end: pages -> KG -> partitioned store -> SPARQL aggregate
    q["sparql_webkg_predicates"] = webkg.sparql_webkg_predicates

    # --- grammar-driven table KG (S4,M1-M10,M12,A1)
    for t in ("region", "nation", "customer", "part", "supplier",
              "lineitem"):
        q[f"kg_{t}"] = (lambda sf, _t=t: tabular.table_kg_terms(sf, _t))

    # --- ontology-requirements side output (S7,A2)
    q["kg_requirements_part"] = lambda sf: tabular.table_requirements(sf, "part")
    # --- multi-source union store (A4, v1 orchestrator semantics)
    q["kg_union_nation_supplier"] = tabular.union_kg_terms
    # --- bulk RDF ingestion: emitted graph -> distributed reader ->
    #     identical term set (sources/rdfsource.py)
    q["rdf_ingest_turtle"] = (
        lambda sf: tabular.rdf_ingest_roundtrip(sf, "nation", "ttl"))
    q["rdf_ingest_ntriples"] = (
        lambda sf: tabular.rdf_ingest_roundtrip(sf, "region", "nt"))
    q["rdf_ingest_rdfxml"] = (
        lambda sf: tabular.rdf_ingest_roundtrip(sf, "supplier",
                                                "rdfxml"))

    # --- grammar-less default mode (M13) + null-value filter (M5)
    q["kg_default_events"] = tabular.default_kg_events
    # --- v3 subClassOf/subPropertyOf chain mode (§2.4 v3 extras)
    q["kg_part_v3chains"] = tabular.v3_chain_kg_part
    # --- v1 legacy semantic grammar (§2.4 v1 extras, M11 space-split)
    q["kg_orders_v1"] = tabular.v1_kg_orders
    # --- v2 dialect (role permutations, rdf:type chains, descr comments)
    q["kg_customer_v2"] = tabular.v2_kg_customer
    # --- v4 dialect (STRANGE map fallback, prepend-prefix, type chains)
    q["kg_part_v4"] = tabular.v4_kg_part
    # --- RDFS entailment over the predicate-partitioned store (S9 +
    # Jena-inference hand-off, partition-pruned triple-pattern reads)
    q["kg_rdfs_types_part"] = tabular.v4_entailed_types
    # CONSTRUCT inference (facts via subPropertyOf closure)
    q["kg_entailed_facts_part"] = tabular.v4_entailed_facts
    # ontology conformance report (domain/range validation view)
    q["kg_conformance"] = tabular.kg_conformance

    # --- SPARQL text front-end: the reference's OWN query file
    # (csv2rdf-v4/jena/requests.sparql) parsed and planned onto the
    # partition-pruned store reads (kgforge/sparql.py)
    from kgforge.pipelines import versioning
    q["sparql_select_store"] = versioning.sparql_select_store
    q["sparql_construct_facts"] = versioning.sparql_construct_facts
    q["sparql_insert_facts"] = versioning.sparql_insert_facts
    q["sparql_versioning_minus"] = versioning.sparql_versioning_minus
    # SPARQL 1.1 aggregate extension: GROUP BY + COUNT + ORDER + LIMIT
    q["sparql_groupby_count"] = versioning.sparql_groupby_count
    # bidirectional graph snapshot diff (incremental KG maintenance)
    q["kg_snapshot_delta"] = versioning.kg_snapshot_delta
    # temporal-KG point-in-time query (latest valid assertion per subj)
    q["kg_as_of_status"] = versioning.kg_as_of_status
    # SPARQL OPTIONAL (left join): half the rows unbound by fixture
    q["sparql_optional_v2"] = versioning.sparql_optional_v2
    q["sparql_union_versions"] = versioning.sparql_union_versions
    # SPARQL FILTER expression subset (numeric compare, regex/strstarts)
    q["sparql_filter_numeric"] = versioning.sparql_filter_numeric
    q["sparql_filter_strfuncs"] = versioning.sparql_filter_strfuncs
    # SPARQL 1.1 Kleene-plus property path over an instance predicate
    q["sparql_path_ancestors"] = versioning.sparql_path_ancestors
    # ASK existence form (limit-1 short circuit)
    q["sparql_ask_pair"] = versioning.sparql_ask_pair
    # VALUES inline-data join
    q["sparql_values_brands"] = versioning.sparql_values_brands
    # DESCRIBE (subject-rooted resource description)
    q["sparql_describe_brands"] = versioning.sparql_describe_brands
    # FILTER [NOT] EXISTS (correlated anti/semi join)
    q["sparql_not_exists"] = versioning.sparql_not_exists
    # property-path syntax: sequence (/), inverse (^), alternation (|)
    q["sparql_seq_path"] = versioning.sparql_seq_path
    q["sparql_inv_alt_path"] = versioning.sparql_inv_alt_path
    q["sparql_group_path"] = versioning.sparql_group_path
    q["sparql_group_closure"] = versioning.sparql_group_closure
    q["sparql_sum_distinct"] = versioning.sparql_sum_distinct
    q["sparql_modify_tier"] = versioning.sparql_modify_tier
    q["sparql_inv_negated_path"] = versioning.sparql_inv_negated_path
    # sequence legs inside a modified path group: (p1/p2)+
    q["sparql_seqgroup_path"] = versioning.sparql_seqgroup_path
    # term-identity FILTER comparisons over string-fn expressions
    q["sparql_ucase_concat_eq"] = versioning.sparql_ucase_concat_eq
    q["sparql_iri_constructor_eq"] = versioning.sparql_iri_constructor_eq
    # UNION legs binding different variables (null padding)
    q["sparql_union_disjoint"] = versioning.sparql_union_disjoint
    # GROUP BY (expr AS ?alias) — per-solution BIND desugar
    q["sparql_groupby_expr"] = versioning.sparql_groupby_expr
    # ORDER BY over an aggregate (hidden synthesized agg, top-k groups)
    q["sparql_topk_groups"] = versioning.sparql_topk_groups
    # blank-node property list desugar
    q["sparql_bnode_list"] = versioning.sparql_bnode_list
    # zero-or-more property path (Kleene-plus closure + reflexive
    # node-domain pairs)
    q["sparql_star_path"] = versioning.sparql_star_path
    # SELECT DISTINCT solution modifier
    q["sparql_distinct_types"] = versioning.sparql_distinct_types
    # SUM/AVG aggregates over numeric literal objects
    q["sparql_sum_avg"] = versioning.sparql_sum_avg
    # OFFSET paging over the ordered stream
    q["sparql_offset_page"] = versioning.sparql_offset_page
    # BIND computed column (CONCAT/STR expression subset)
    q["sparql_bind_concat"] = versioning.sparql_bind_concat
    # FILTER comparing two variables (numeric ordering semantics)
    q["sparql_filter_varvar"] = versioning.sparql_filter_varvar
    # COUNT(?v) vs COUNT(*) null semantics under OPTIONAL
    q["sparql_count_optional"] = versioning.sparql_count_optional
    # GROUP_CONCAT (sorted, deterministic) + SAMPLE (min term)
    q["sparql_group_concat"] = versioning.sparql_group_concat
    # HAVING over a hidden synthesized aggregate (AVG not selected)
    q["sparql_having"] = versioning.sparql_having
    # { SELECT ... } subquery: attribute of the per-group maximum
    q["sparql_subquery_max"] = versioning.sparql_subquery_max
    # FILTER ?v IN (constant list)
    q["sparql_filter_in"] = versioning.sparql_filter_in
    # !BOUND left-join negation + numeric NOT IN
    q["sparql_not_bound"] = versioning.sparql_not_bound
    # BIND UCASE/LCASE/STRLEN/SUBSTR/REPLACE kernels
    q["sparql_bind_strfuncs"] = versioning.sparql_bind_strfuncs
    # SPARQL-Update DELETE: partition-local anti-join rewrite
    q["sparql_delete_bonus"] = versioning.sparql_delete_bonus
    # COUNT(DISTINCT ?v): grouped map_groups + global distinct-pass
    q["sparql_count_distinct"] = versioning.sparql_count_distinct
    q["sparql_count_distinct_global"] = \
        versioning.sparql_count_distinct_global
    # LANG/DATATYPE over mixed-form literals; || filter; COALESCE
    q["sparql_lang_filter"] = versioning.sparql_lang_filter
    q["sparql_datatype_histogram"] = \
        versioning.sparql_datatype_histogram
    q["sparql_filter_or"] = versioning.sparql_filter_or
    q["sparql_coalesce_default"] = versioning.sparql_coalesce_default
    # numeric arithmetic / IF / string builtins / term predicates /
    # negated property sets (round-5 session-3)
    q["sparql_if_tiers"] = versioning.sparql_if_tiers
    q["sparql_arith_round"] = versioning.sparql_arith_round
    q["sparql_strbefore_after"] = versioning.sparql_strbefore_after
    q["sparql_isnumeric"] = versioning.sparql_isnumeric
    q["sparql_langmatches"] = versioning.sparql_langmatches
    q["sparql_negated_path"] = versioning.sparql_negated_path
    q["sparql_sameterm"] = versioning.sparql_sameterm
    q["sparql_order_numeric"] = versioning.sparql_order_numeric
    q["sparql_sum_expr"] = versioning.sparql_sum_expr
    q["sparql_agg_inline"] = versioning.sparql_agg_inline
    q["sparql_datetime_parts"] = versioning.sparql_datetime_parts
    q["sparql_hash_funcs"] = versioning.sparql_hash_funcs
    q["sparql_strends_filter"] = versioning.sparql_strends_filter
    q["sparql_iri_mint"] = versioning.sparql_iri_mint
    q["sparql_group_concat_distinct"] = \
        versioning.sparql_group_concat_distinct
    q["sparql_select_expr"] = versioning.sparql_select_expr

    # --- text analysis (langid, quality, token counting, fingerprints)
    q["text_stats"] = text.text_stats
    q["lang_id"] = text.lang_id
    q["lang_token_summary"] = text.lang_token_summary
    q["quality_filter"] = text.quality_filter
    q["vocab_topk"] = text.vocab_topk
    q["token_id_stats"] = text.token_id_stats
    q["dataset_split"] = text.dataset_split
    # deterministic per-stratum sampling (content-keyed, no RNG)
    q["stratified_sample"] = text.stratified_sample
    # benchmark decontamination screen (broadcast gram set, streamed corpus)
    q["contamination_check"] = text.contamination_check
    # per-doc winnowing rollup (checked against the independent scalar
    # reference via an embedded expected table — see kgforge/scalar_ref.py)
    q["doc_fingerprints"] = text.fingerprint_summary
    q["doc_fingerprints_full"] = text.fingerprints  # full stream, VALUES oracle

    # --- dedup family
    q["dedup_exact"] = dedup.exact_dedup
    q["neardup_labels"] = (
        lambda sf: dedup.neardup_labels(sf, threshold=0.7))
    # whole-corpus keep/drop decision: one survivor per near-dup
    # cluster by deterministic fetch priority; corpus ships ids only
    q["neardup_survivors"] = (
        lambda sf: dedup.neardup_survivors(sf, threshold=0.7))
    q["dedup_minhash"] = dedup.minhash_dedup
    q["dedup_simhash"] = dedup.simhash_dedup
    # transitive closure over the verified near-dup graph (distributed
    # connected components; numeric-min canonical per cluster)
    q["neardup_clusters"] = dedup.neardup_clusters

    # --- similarity search
    q["ann_topk"] = ann.ann_topk
    q["ann_ivf_topk"] = ann.ivf_topk
    # symmetric-int8 quantized ANN (8x smaller wire, integer matmul)
    q["ann_quantized_topk"] = ann.quantized_topk
    # grouped vector mean pooling: per-language int8 centroids
    q["lang_centroids"] = ann.lang_centroids
    # same probe over the PARTITION-PRUNED on-disk IVF layout (reads
    # only the probed ivf_list= dirs); output identical to ann_ivf_topk
    q["ann_ivf_indexed"] = ann.ivf_topk_indexed
    # rows-only; synthetic embeddings have max pairwise cosine ~0.51, so
    # the production-style 0.98 threshold would (correctly) return zero
    # rows — 0.45 keeps the machinery observable; semantics pinned by
    # the planted-pair test
    q["embedding_dup_pairs"] = (
        lambda sf: ann.embedding_dup_pairs(sf, threshold=0.45))
    # k-means corpus partitioning (deterministic IVF trainer, assignment)
    q["embedding_clusters"] = ann.embedding_clusters

    # --- relational (pre-agg groupby, broadcast join, session windows)
    q["pricing_summary"] = relational.pricing_summary
    q["top_revenue_orders"] = relational.top_revenue_orders
    q["sessionize"] = relational.sessionize
    q["tumbling_counts"] = relational.tumbling_counts
    q["hopping_counts"] = relational.hopping_counts
    q["event_type_counts"] = relational.event_type_counts
    # as-of join (point-in-time feature attach; composed from bucket
    # shuffle + vectorized merge_asof — Ray Data has no primitive)
    q["asof_last_purchase"] = relational.asof_last_purchase
    # salted two-phase groupby-aggregate: exact per-entity distinct-doc
    # counts where every key is hot (north-rule skew handling made
    # explicit — a hot key's value set spreads over salt cells instead
    # of one reducer; kgforge/ops/skew.py)
    from kgforge.ops import skew
    q["entity_doc_frequency"] = skew.entity_doc_frequency
    # mergeable sketches: KMV per-key distinct estimate (exchange is
    # <= k hashes per key per block, corpus-size-independent) and
    # two-pass provably-exact heavy hitters (bounded-memory candidates
    # + exact-count-candidates-only second pass)
    from kgforge.ops import sketch
    q["entity_doc_frequency_kmv"] = sketch.entity_doc_frequency_kmv
    q["token_heavy_hitters"] = sketch.token_heavy_hitters
    # iterative graph analytics over the constructed KG: integer-exact
    # damped PageRank (K join+aggregate rounds; salted replicated join
    # above the broadcast limit) and exact grouped percentiles via
    # counting pre-agg (holistic aggregate without the hot-key trap)
    from kgforge.ops import graph, quantile
    q["entity_pagerank"] = graph.entity_pagerank
    # personalized PageRank seeded at entity nodes (topic-sensitive)
    q["entity_ppr"] = graph.entity_ppr
    q["entity_cooccurrence"] = graph.entity_cooccurrence
    # k-hop BFS reachability (crawl-frontier expansion, min depth)
    q["crawl_frontier"] = graph.crawl_frontier
    # synchronous label-propagation communities (K rounds, unrolled CTE)
    q["link_communities"] = graph.link_communities
    # integer-exact HITS (hubs & authorities)
    q["link_hits"] = graph.link_hits
    # KG-embedding training data: filtered deterministic negatives
    from kgforge.ops import kgtrain
    q["kg_negative_samples"] = kgtrain.kg_negative_samples
    q["kg_random_walks"] = kgtrain.kg_random_walks
    q["kg_skipgram_pairs"] = kgtrain.kg_skipgram_pairs
    # tensorization: dense id maps + integer-encoded triples
    q["kg_id_maps"] = kgtrain.kg_id_maps
    q["kg_triples_encoded"] = kgtrain.kg_triples_encoded
    q["lang_length_quantiles"] = quantile.lang_length_quantiles
    q["lang_length_quantiles_hdr"] = quantile.lang_length_quantiles_hdr
    # non-equi join family Ray Data lacks: broadcast+searchsorted range
    # join and a bucket-hash NOT EXISTS anti-join (tagged union, probe
    # side reduced to distinct keys per block)
    q["order_price_tiers"] = relational.order_price_tiers
    q["customers_without_big_orders"] = relational.customers_without_big_orders
    # per-row LAG window (time since previous event per user) and
    # per-key top-k frequent values (histogram-sized shuffle)
    q["event_time_deltas"] = relational.event_time_deltas
    q["top_tokens_per_lang"] = relational.top_tokens_per_lang
    # grouped top-k ROWS (per-batch combiner caps wire at k/group/block)
    q["top_docs_per_lang"] = relational.top_docs_per_lang
    # majority-vote truth discovery over conflicting assertions
    q["customer_status_vote"] = relational.customer_status_vote

    # --- substring-level cross-doc duplication (Lee et al. 2022-style
    # duplicated n-gram coverage: ONE gram-keyed bucket shuffle of
    # per-(doc,gram) combiner partials; kgforge/ops/substring.py)
    from kgforge.ops import substring
    q["dup_gram_coverage"] = substring.dup_gram_coverage
    # Gopher-style repetition quality signals (top word / 2-gram mass)
    q["repetition_stats"] = text.repetition_stats
    # vectorized RE2 identifier/PII redaction with redaction counts
    q["pii_scrub"] = text.pii_scrub
    # corpus-trained integer bigram LM score (log-free perplexity
    # stand-in); broadcast fast path + one-key w1 join scale path
    q["bigram_lm_scores"] = text.bigram_lm_scores
    # RAG-style overlapping passage chunking (pure map, streams)
    q["passage_chunks"] = text.passage_chunks
    # zlib compression-ratio quality signal (scalar-ref zlib oracle)
    q["compression_ratio"] = text.compression_ratio
    # deterministic training-order assignment: distributed row_number
    # (equal-width hash range partition + count-pass prefix offsets)
    from kgforge.ops import rank
    q["corpus_shuffle"] = rank.corpus_shuffle
    # fixed-token-budget shard packing in permutation order (distributed
    # exclusive prefix sum — two-pass, B-int exchange per block)
    q["token_budget_shards"] = rank.token_budget_shards

    # --- crawl-snapshot family (multi-snapshot view of the pages table:
    # arg-max-by-ts per url, per-source churn, per-host rollups —
    # per-batch combiners + ONE hash(url|host) bucket shuffle each)
    from kgforge.ops import crawl
    q["latest_snapshot_per_url"] = crawl.latest_snapshot_per_url
    q["crawl_change_summary"] = crawl.crawl_change_summary
    q["url_host_stats"] = crawl.url_host_stats
    # vectorized URL canonicalizer (www/fragment/utm/sort rules) +
    # canonical-URL exact dedup in one hash(canon) bucket pass
    q["url_canonical_dedup"] = crawl.url_canonical_dedup
    # rolling time-window count per user (SQL RANGE window; ONE user
    # bucket shuffle + composite-key searchsorted, no per-user loop)
    q["rolling_user_counts"] = relational.rolling_user_counts
    # incremental ingest vs prior corpus: EXACT new-doc set via bloom
    # prefilter (distributed OR-fold build, ray.put broadcast) +
    # anti-join confirm of only the bloom-positive residue
    from kgforge.ops import bloom
    q["incremental_new_docs"] = bloom.incremental_new_docs
    # on-disk inverted text index partitioned by md5(token) bucket;
    # conjunctive search reads ONLY the terms' partitions (text twin of
    # the IVF index). GROUPING SETS rollup derives the coarse levels
    # from lexicon²-sized cells — corpus scanned once.
    from kgforge.ops import textindex
    q["text_search"] = textindex.text_search
    q["corpus_rollup"] = relational.corpus_rollup
    # web link graph: tagged-union degree combiner; reciprocal edges
    # via ONE unordered-pair bucket shuffle (no self-join)
    from kgforge.ops import linkgraph
    q["link_degree_stats"] = linkgraph.link_degree_stats
    q["reciprocal_links"] = linkgraph.reciprocal_links
    # per-node triangle counts: degree-ordered orientation bounds wedge
    # fan-out at sqrt(2m); 3 bucket shuffles, no corpus joins
    q["triangle_counts"] = linkgraph.triangle_counts
    q["clustering_coefficient"] = linkgraph.clustering_coefficient
    # iterative distributed k-core peeling (adaptive drop-set filter)
    q["kcore_nodes"] = lambda sf: linkgraph.kcore_nodes(sf, k=3)
    # EXACT Jaccard set-similarity self-join (AllPairs/PPJoin prefix
    # filter; rational threshold, integer verify) and the per-stratum
    # percentile quality gate (lexicon-sized threshold broadcast)
    from kgforge.ops import setjoin
    q["jaccard_pairs"] = setjoin.jaccard_pairs
    q["docs_above_median"] = quantile.percentile_threshold_filter
    # incremental NEAR-dup screen (new batch × prior corpus, cross-side
    # prefix-filter pairs only) and OR-search with match-count ranking
    # (per-bucket top-k combiner + bounded reduce)
    q["jaccard_new_vs_prior"] = setjoin.jaccard_new_vs_prior
    q["text_search_ranked"] = textindex.text_search_ranked
    # BM25 over the tf index: exact integer rational scoring (log-free
    # idf', HUGEINT-mirrored oracle), one doc-bucket shuffle
    q["bm25_search"] = textindex.bm25_search
    # strict sequential funnel (first-occurrence chaining per user) and
    # the LEFT-JOIN aggregate with fill-zero (tagged-union bucket merge)
    q["conversion_funnel"] = relational.conversion_funnel
    q["customer_order_counts"] = relational.customer_order_counts

    # --- multimodal plumbing (actor-pool featurizer over binary column;
    # checked against a DuckDB sha256 mirror of the fake featurizer)
    q["media_feature_stats"] = multimodal.media_feature_stats
    # video-shaped flat-map: payload -> sampled frame rows -> rollup
    q["frame_sample_stats"] = multimodal.frame_sample_stats
    # REAL codec round trip: stdlib wave RIFF encode -> actor-pool
    # wave decode -> integer-exact clip stats
    q["media_audio_stats"] = multimodal.media_audio_stats

    return q


def oracle_sql() -> dict[str, str]:
    from kgforge.ops import ann, dedup, relational, text
    from kgforge.pipelines import tabular, webkg

    o: dict[str, str] = {}
    o["webkg_triples"] = webkg.webkg_oracle_sql()
    o["sparql_webkg_predicates"] = webkg.sparql_webkg_predicates_sql()
    o["host_doc_stats"] = webkg.HOST_DOC_STATS_SQL
    for t in ("region", "nation", "customer", "part", "supplier",
              "lineitem"):
        o[f"kg_{t}"] = tabular.table_kg_sql(t)
    o["kg_requirements_part"] = tabular.table_requirements_sql("part")
    o["kg_union_nation_supplier"] = tabular.union_kg_sql()
    o["rdf_ingest_turtle"] = tabular.table_kg_sql("nation")
    o["rdf_ingest_ntriples"] = tabular.table_kg_sql("region")
    o["rdf_ingest_rdfxml"] = tabular.table_kg_sql("supplier")
    o["kg_default_events"] = tabular.default_kg_events_sql()
    o["kg_part_v3chains"] = tabular.v3_chain_kg_part_sql()
    o["kg_orders_v1"] = tabular.v1_kg_orders_sql()
    o["kg_customer_v2"] = tabular.v2_kg_customer_sql()
    o["kg_part_v4"] = tabular.v4_kg_part_sql()
    o["kg_rdfs_types_part"] = tabular.v4_entailed_types_sql()
    o["kg_conformance"] = tabular.kg_conformance_sql()
    o["kg_entailed_facts_part"] = tabular.v4_entailed_facts_sql()
    from kgforge.pipelines import versioning
    o["sparql_select_store"] = versioning.sparql_select_store_sql()
    o["sparql_construct_facts"] = versioning.sparql_facts_sql()
    o["sparql_insert_facts"] = versioning.sparql_facts_sql()
    o["sparql_versioning_minus"] = versioning.sparql_versioning_minus_sql()
    o["sparql_groupby_count"] = versioning.sparql_groupby_count_sql()
    o["kg_snapshot_delta"] = versioning.kg_snapshot_delta_sql()
    o["kg_as_of_status"] = versioning.kg_as_of_status_sql()
    o["sparql_optional_v2"] = versioning.sparql_optional_v2_sql()
    o["sparql_union_versions"] = versioning.sparql_union_versions_sql()
    o["sparql_filter_numeric"] = versioning.sparql_filter_numeric_sql()
    o["sparql_filter_strfuncs"] = versioning.sparql_filter_strfuncs_sql()
    o["sparql_path_ancestors"] = versioning.sparql_path_ancestors_sql()
    o["sparql_ask_pair"] = versioning.sparql_ask_pair_sql()
    o["sparql_values_brands"] = versioning.sparql_values_brands_sql()
    o["sparql_describe_brands"] = versioning.sparql_describe_brands_sql()
    o["sparql_not_exists"] = versioning.sparql_not_exists_sql()
    o["sparql_seq_path"] = versioning.sparql_path_ancestors_sql()
    o["sparql_inv_alt_path"] = versioning.sparql_inv_alt_path_sql()
    o["sparql_group_path"] = versioning.sparql_group_path_sql()
    o["sparql_group_closure"] = versioning.sparql_group_closure_sql()
    o["sparql_sum_distinct"] = versioning.sparql_sum_distinct_sql()
    o["sparql_modify_tier"] = versioning.sparql_modify_tier_sql()
    o["sparql_inv_negated_path"] = versioning.sparql_inv_negated_path_sql()
    o["sparql_seqgroup_path"] = versioning.sparql_seqgroup_path_sql()
    o["sparql_ucase_concat_eq"] = versioning.sparql_ucase_concat_eq_sql()
    o["sparql_iri_constructor_eq"] = (
        versioning.sparql_iri_constructor_eq_sql())
    o["sparql_union_disjoint"] = versioning.sparql_union_disjoint_sql()
    o["sparql_groupby_expr"] = versioning.sparql_groupby_expr_sql()
    o["sparql_topk_groups"] = versioning.sparql_topk_groups_sql()
    o["sparql_bnode_list"] = versioning.sparql_bnode_list_sql()
    o["sparql_star_path"] = versioning.sparql_star_path_sql()
    o["sparql_distinct_types"] = versioning.sparql_distinct_types_sql()
    o["sparql_sum_avg"] = versioning.sparql_sum_avg_sql()
    o["sparql_offset_page"] = versioning.sparql_offset_page_sql()
    o["sparql_bind_concat"] = versioning.sparql_bind_concat_sql()
    o["sparql_filter_varvar"] = versioning.sparql_filter_varvar_sql()
    o["sparql_count_optional"] = versioning.sparql_count_optional_sql()
    o["sparql_group_concat"] = versioning.sparql_group_concat_sql()
    o["sparql_having"] = versioning.sparql_having_sql()
    o["sparql_subquery_max"] = versioning.sparql_subquery_max_sql()
    o["sparql_filter_in"] = versioning.sparql_filter_in_sql()
    o["sparql_not_bound"] = versioning.sparql_not_bound_sql()
    o["sparql_bind_strfuncs"] = versioning.sparql_bind_strfuncs_sql()
    o["sparql_delete_bonus"] = versioning.sparql_delete_bonus_sql()
    o["sparql_count_distinct"] = versioning.sparql_count_distinct_sql()
    o["sparql_count_distinct_global"] = \
        versioning.sparql_count_distinct_global_sql()
    o["sparql_lang_filter"] = versioning.sparql_lang_filter_sql()
    o["sparql_datatype_histogram"] = \
        versioning.sparql_datatype_histogram_sql()
    o["sparql_filter_or"] = versioning.sparql_filter_or_sql()
    o["sparql_coalesce_default"] = \
        versioning.sparql_coalesce_default_sql()
    o["sparql_if_tiers"] = versioning.sparql_if_tiers_sql()
    o["sparql_arith_round"] = versioning.sparql_arith_round_sql()
    o["sparql_strbefore_after"] = \
        versioning.sparql_strbefore_after_sql()
    o["sparql_isnumeric"] = versioning.sparql_isnumeric_sql()
    o["sparql_langmatches"] = versioning.sparql_langmatches_sql()
    o["sparql_negated_path"] = versioning.sparql_negated_path_sql()
    o["sparql_sameterm"] = versioning.sparql_sameterm_sql()
    o["sparql_order_numeric"] = versioning.sparql_order_numeric_sql()
    o["sparql_sum_expr"] = versioning.sparql_sum_expr_sql()
    o["sparql_agg_inline"] = versioning.sparql_agg_inline_sql()
    o["sparql_datetime_parts"] = versioning.sparql_datetime_parts_sql()
    o["sparql_hash_funcs"] = versioning.sparql_hash_funcs_sql()
    o["sparql_strends_filter"] = versioning.sparql_strends_filter_sql()
    o["sparql_iri_mint"] = versioning.sparql_iri_mint_sql()
    o["sparql_group_concat_distinct"] = \
        versioning.sparql_group_concat_distinct_sql()
    o["sparql_select_expr"] = versioning.sparql_select_expr_sql()
    o["text_stats"] = text.TEXT_STATS_SQL
    o["lang_id"] = text.LANG_ID_SQL
    o["lang_token_summary"] = text.LANG_TOKEN_SUMMARY_SQL
    o["quality_filter"] = text.quality_filter_sql()
    o["vocab_topk"] = text.vocab_topk_sql()
    o["token_id_stats"] = text.token_id_stats_sql()
    o["dataset_split"] = text.dataset_split_sql()
    o["stratified_sample"] = text.stratified_sample_sql()
    o["dedup_exact"] = dedup.EXACT_DEDUP_SQL
    o["ann_topk"] = ann.ann_topk_sql()
    o["pricing_summary"] = relational.PRICING_SUMMARY_SQL
    o["top_revenue_orders"] = relational.top_revenue_orders_sql()
    o["sessionize"] = relational.SESSIONIZE_SQL
    o["tumbling_counts"] = relational.TUMBLING_COUNTS_SQL
    o["hopping_counts"] = relational.hopping_counts_sql()
    o["event_type_counts"] = relational.EVENT_TYPE_COUNTS_SQL
    o["asof_last_purchase"] = relational.asof_last_purchase_sql()
    from kgforge.ops import graph, quantile, skew, sketch
    o["entity_doc_frequency"] = skew.entity_doc_frequency_sql()
    o["token_heavy_hitters"] = sketch.token_heavy_hitters_sql()
    # PageRank is iterative but K is fixed — the mirror unrolls the
    # iterations as chained CTEs in the same int64 arithmetic
    o["entity_pagerank"] = graph.entity_pagerank_sql()
    o["entity_ppr"] = graph.entity_ppr_sql()
    o["entity_cooccurrence"] = graph.entity_cooccurrence_sql()
    o["crawl_frontier"] = graph.crawl_frontier_sql()
    o["link_communities"] = graph.link_communities_sql()
    o["link_hits"] = graph.link_hits_sql()
    from kgforge.ops import kgtrain as _kgtrain
    o["kg_negative_samples"] = _kgtrain.kg_negative_samples_sql()
    o["kg_random_walks"] = _kgtrain.kg_random_walks_sql()
    o["kg_skipgram_pairs"] = _kgtrain.kg_skipgram_pairs_sql()
    o["kg_id_maps"] = _kgtrain.kg_id_maps_sql()
    o["kg_triples_encoded"] = _kgtrain.kg_triples_encoded_sql()
    o["lang_length_quantiles"] = quantile.lang_length_quantiles_sql()
    o["order_price_tiers"] = relational.order_price_tiers_sql()
    o["customers_without_big_orders"] = (
        relational.CUSTOMERS_WITHOUT_BIG_ORDERS_SQL)
    o["event_time_deltas"] = relational.EVENT_TIME_DELTAS_SQL
    o["top_tokens_per_lang"] = relational.top_tokens_per_lang_sql()
    o["top_docs_per_lang"] = relational.top_docs_per_lang_sql()
    o["customer_status_vote"] = relational.CUSTOMER_STATUS_VOTE_SQL
    from kgforge.ops import rank, substring
    o["dup_gram_coverage"] = substring.dup_gram_coverage_sql()
    o["repetition_stats"] = text.REPETITION_STATS_SQL
    o["pii_scrub"] = text.pii_scrub_sql()
    o["bigram_lm_scores"] = text.bigram_lm_scores_sql()
    o["passage_chunks"] = text.passage_chunks_sql()
    o["corpus_shuffle"] = rank.corpus_shuffle_sql()
    o["token_budget_shards"] = rank.token_budget_shards_sql()
    from kgforge.ops import crawl
    o["latest_snapshot_per_url"] = crawl.latest_snapshot_per_url_sql()
    o["crawl_change_summary"] = crawl.crawl_change_summary_sql()
    o["url_host_stats"] = crawl.URL_HOST_STATS_SQL
    o["url_canonical_dedup"] = crawl.url_canonical_dedup_sql()
    o["rolling_user_counts"] = relational.rolling_user_counts_sql()
    from kgforge.ops import bloom, textindex
    o["incremental_new_docs"] = bloom.incremental_new_docs_sql()
    o["text_search"] = textindex.text_search_sql()
    o["corpus_rollup"] = relational.CORPUS_ROLLUP_SQL
    from kgforge.ops import linkgraph
    o["link_degree_stats"] = linkgraph.link_degree_stats_sql()
    o["reciprocal_links"] = linkgraph.reciprocal_links_sql()
    o["triangle_counts"] = linkgraph.triangle_counts_sql()
    o["clustering_coefficient"] = linkgraph.clustering_coefficient_sql()
    from kgforge import scalar_ref as _SRK
    o["kcore_nodes"] = _SRK.kcore_oracle_sql(3)
    from kgforge.ops import quantile as _q
    from kgforge.ops import setjoin
    o["jaccard_pairs"] = setjoin.jaccard_pairs_sql()
    o["docs_above_median"] = _q.percentile_threshold_filter_sql()
    o["jaccard_new_vs_prior"] = setjoin.jaccard_new_vs_prior_sql()
    o["text_search_ranked"] = textindex.text_search_ranked_sql()
    o["bm25_search"] = textindex.bm25_search_sql()
    o["conversion_funnel"] = relational.conversion_funnel_sql()
    o["customer_order_counts"] = relational.CUSTOMER_ORDER_COUNTS_SQL
    # sha256-based featurizer has an exact DuckDB mirror
    from kgforge.ops.multimodal import (FRAME_SAMPLE_STATS_SQL,
                                        MEDIA_AUDIO_STATS_SQL,
                                        MEDIA_FEATURE_STATS_SQL)
    o["media_feature_stats"] = MEDIA_FEATURE_STATS_SQL
    o["frame_sample_stats"] = FRAME_SAMPLE_STATS_SQL
    o["media_audio_stats"] = MEDIA_AUDIO_STATS_SQL
    # sketch/LSH ops are not SQL-expressible (crc32 / 64-bit mixing) —
    # their oracle is an INDEPENDENT scalar reference implementation
    # whose expected output is embedded as a VALUES table keyed by the
    # input's content key (kgforge/scalar_ref.py)
    from kgforge import scalar_ref as SR
    o["contamination_check"] = SR.contamination_oracle_sql()
    o["compression_ratio"] = SR.compression_ratio_oracle_sql()
    o["doc_fingerprints"] = SR.fingerprint_oracle_sql()
    o["neardup_labels"] = SR.neardup_labels_oracle_sql()
    o["neardup_survivors"] = SR.neardup_survivors_oracle_sql()
    o["dedup_minhash"] = SR.minhash_oracle_sql()
    o["dedup_simhash"] = SR.simhash_oracle_sql()
    o["neardup_clusters"] = SR.neardup_clusters_oracle_sql()
    o["ann_ivf_topk"] = SR.ivf_oracle_sql()
    o["ann_quantized_topk"] = SR.quantized_topk_oracle_sql()
    o["lang_centroids"] = SR.lang_centroids_oracle_sql()
    o["ann_ivf_indexed"] = SR.ivf_oracle_sql()
    o["embedding_dup_pairs"] = SR.embedding_dup_oracle_sql()
    o["embedding_clusters"] = SR.embedding_clusters_oracle_sql()
    # full per-position stream: VALUES oracle from the scalar reference
    o["doc_fingerprints_full"] = SR.fingerprint_full_oracle_sql()
    o["entity_doc_frequency_kmv"] = SR.kmv_doc_frequency_oracle_sql()
    # frexp bucket mapping is not SQL-expressible — scalar-ref mirror
    o["lang_length_quantiles_hdr"] = SR.hdr_quantiles_oracle_sql()
    return o
