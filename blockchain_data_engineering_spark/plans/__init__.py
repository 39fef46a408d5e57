"""Query registry backing ``__spark_entry__.py``.

Importing this package registers every implemented query, then splits
the registry into the driver-gate set (``QUERIES``, exactly 50 — the
round-1 gate recorded rows for registry slots 0-49 only) and the
pytest-parity-only set (``EXTRA_QUERIES``). Near-duplicate variants of
gate queries are demoted, never deleted: every demoted query keeps its
DuckDB oracle and is hash-checked by tests/test_oracle_parity.py.

Gate ordering: queries with NO green row in CORRECTNESS_r01.json come
first, so even a row-capped gate reaches them this round.
"""

from blockchain_data_engineering_spark.plans.registry import (  # noqa: F401
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES,
    QUERIES,
    finalize_gate,
    query,
)

# Import for side effect: populates the registry.
from blockchain_data_engineering_spark.plans import core_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import domain_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import analytics_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import graph_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import text_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import dedup_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import similarity_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import streaming_queries  # noqa: F401,E402
from blockchain_data_engineering_spark.plans import multimodal_queries  # noqa: F401,E402

# The 50 gate queries. Section 0: new this round (first so a
# row-capped gate reaches them). Section 1: unverified in round 1
# (registry slots 50-65 then). Section 2: green in round 1.
# Demoted near-duplicates (see EXTRA_QUERIES): explode_normalize,
# netflow_supplier_part (superseded by netflow_decimal),
# vol_rollup_by_block / _all_time (subsumed by vol_rollup_hierarchy),
# transfer_edges_cross (domain_transfers_edges), scalar_slot_to_timestamp
# (scalar_functions family), decimal_quantity_sum (netflow_decimal),
# agg_count_distinct, pivot_qty_by_flag, events_value_quantiles,
# graph_degrees (pagerank pre-join), graph_connected_components
# (graph_cc_pointer_jump), text_fingerprint (text_winnowing_fingerprints),
# dedup_simhash / dedup_simhash_hamming (dedup_simhash_multiblock),
# sim_ivf_ann (sim_ivf_ann_nprobe2), sim_lsh_ann (single-table form —
# superseded in the gate by sim_lsh_ann_multitable, the high-recall
# production shape; see tests/test_similarity_recall.py),
# stream_sliding_window (stream_tumbling_window),
# domain_netflow_tx (same netflow pipeline as netflow_decimal, long
# types — the decimal path is the stronger gate witness),
# pipeline_corpus_filter (pure composition of text_lang_id +
# text_quality + text_token_count + dedup_exact, each gate-covered),
# text_top_bigrams (explode+groupBy count, plan-subsumed by
# text_token_count and the BM25 posting aggregates),
# agg_any_value (r1-green; the any_value collapse also runs inside the
# domain rollups), sample_train_val_split (r1-green; the md5-threshold
# split mechanism is the seed/sampling primitive in sample_stratified
# and the pack/kmeans orderings), dedup_keep_last (r1-green; keep-one
# window rank — same plan family as topk_per_group, semantics
# gate-witnessed by stream_dedup_first_touch), topk_per_group
# (r1-green, plan-asserted TakeOrderedAndProject in test_plans; the
# per-group window-rank pattern closes every gate ANN query),
# events_spine_zero_fill + events_share_by_day (r1-green; flagship_volume_stack
# runs the same zero_fill_spine operator and ratio-to-report window in-plan).
#
# Round-3 rotation: thirteen r1-GREEN queries (official rows recorded
# in CORRECTNESS_r01: dim_enrich_volumes, topk_semi_join, events_cma,
# scalar_functions, sql_api_revenue, asof_join_clicks_purchases,
# set_ops_units, domain_value_map_roundtrip, graph_neighborhood,
# text_token_count, text_lang_id, text_winnowing_fingerprints,
# dedup_exact) moved to the parity-only set so the thirteen operators
# that have NEVER had an official gate row — k-means training, trained
# IVF, triangle counting, batch sessionization, chunking,
# decontamination, mix reweighting, stratified sampling, length
# bucketing, HLL cardinality, vocab coverage, label propagation, span
# removal — each get one this round. Every rotated-out query keeps its
# DuckDB oracle and pytest parity coverage.
# Late round-2 additions: five brand-new operators (trained quality
# classifier, CMS heavy hitters, k-core peeling, JL random projection,
# histogram-sketch quantiles) take the gate slots of five r1-GREEN
# queries (applyinpandas_demean, range_join_click_attribution,
# text_quality, text_bm25_search, vol_rollup_hierarchy — each keeps
# its official CORRECTNESS_r01 row and its pytest parity coverage;
# the rollup family stays gate-witnessed through
# flagship_volume_stack), so every query ever registered holds an
# official gate row from round 1 or round 2.
# Final round-2 additions: six more new operators (temperature mixing,
# snapshot diff, incremental ingest dedup, funnel conversion, cohort
# retention, token-weighted sampling) displace six more r1-GREEN
# queries (pricing_summary, domain_block_normalize,
# graph_cc_pointer_jump, domain_utxo_resolution, domain_volumes_priced,
# domain_transfers_edges) — all keep r1 rows + pytest parity; the
# invariant holds: every registered query has an official gate row
# from r1 or r2.
GATE_ORDER = [
    # -- new this round --
    "text_quality_classifier",
    "text_cms_heavy_hitters",
    "graph_kcore",
    "emb_random_projection",
    "events_histogram_quantiles",
    "dedup_duplicated_spans",
    "text_gopher_repetition",
    "text_dsir_weights",
    "text_bpe_pair_counts",
    "text_lm_perplexity",
    "sim_pq_ann",
    "sim_semantic_dedup",
    "text_pii_scrub",
    "sample_pack_sequences",
    "dedup_span_removal",
    "graph_label_propagation",
    "agg_hll_distinct",
    "text_vocab_coverage",
    # -- never officially verified (added in round 2) --
    "emb_kmeans_centroids",
    "sim_ivf_ann_trained",
    "graph_triangle_count",
    "events_sessionize",
    "text_chunk_windows",
    "text_decontaminate_overlap",
    "sample_mix_reweight",
    "sample_stratified",
    "pack_length_buckets",
    # -- unverified in round 1 --
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_simhash_multiblock",
    "pipeline_corpus_dedup",
    "sim_cosine_topk",
    "sim_lsh_ann_multitable",
    "sim_ivf_ann_nprobe2",
    "stream_tumbling_window",
    "stream_session_window",
    "stream_dedup_first_touch",
    "multimodal_binary_metadata",
    "multimodal_feature_extract",
    "multimodal_frame_sample",
    "netflow_decimal",
    # -- new this session: temperature mixing, snapshot diff,
    #    incremental ingest dedup --
    "sample_temperature_mix",
    "corpus_snapshot_diff",
    "dedup_incremental_batch",
    "events_funnel",
    "events_retention",
    "sample_token_weighted",
    # -- green in round 1 (core representatives; pricing_summary and
    #    domain_block_normalize keep their r1 rows + pytest parity
    #    from EXTRA_QUERIES) --
    "flagship_volume_stack",
    "graph_pagerank",
    "dedup_minhash_lsh",
]

assert len(GATE_ORDER) == 50, len(GATE_ORDER)
finalize_gate(GATE_ORDER)
