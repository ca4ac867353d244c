"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``keywords4cv_spark``; this module only
re-exports the registry (keywords4cv_spark/driver_queries.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over the sf0.001 documents corpus."""
    from keywords4cv_spark.driver_queries import q_bm25_topk

    return q_bm25_topk(spark, "/root/testdata/sf0.001")


# Gate-priority ordering: the driver's correctness gate has checked a
# 50-query prefix of this registry per round, while the registry holds
# more entries than that. Entries are therefore ordered: (1) queries
# that have never had a driver correctness row or whose last row is a
# round old, (2) queries whose semantics/plans changed THIS round (an
# old green row no longer certifies them), (3) everything else, still
# green from the most recent gate. The dict is the full registry either
# way — only the iteration order changes.
#
# ROUND-5 NOTE: 39 registry entries fall beyond the r4 gate window (the
# driver checks the first 50 of this 89-entry registry); all 39 are
# r3-certified (green in CORRECTNESS_r03), so in round 5 they are two
# rounds stale and form the ENTIRE r5 rotation debt — rotate them to the
# FRONT of this list (39 + r5 additions ≤ 50) and demote the
# r4-certified block. The 39, in current registry order:
# bm25_recrawl_topk bm25_recrawl_purged_topk curated_corpus
# snippet_windows map_whitelist dup_components bm25_page2_topk
# term_dictionary doc_stats doc_lengths top_terms bigram_counts
# keyword_summary fuzzy_resolve fuzzy_match_scores
# abbrev_expanded_counts whitelist_hits pricing_summary
# customer_revenue top_orders_per_customer stream_sessions_closed
# simhash64 simhash_near_dups host_quality_rollup repetition_scores
# bm25f_topk context_validated_semantic boolean_and_query
# boolean_or_not_query phrase_query sanitize_docs categorize_terms
# label_centroids returns_cube priority_rollup segment_pivot
# phrase_query_indexed proximity_query phrase_query_compacted
_GATE_PRIORITY = [
    # last driver-checked in r2 (rotated out of the r3 window) — the
    # entire r4 rotation debt per VERDICT r3 "What's missing #1"
    "byte_histogram",
    "context_validated_terms",
    "cosine_topk",
    "customers_without_big_orders",
    "dedup_exact",
    "doc_fingerprints",
    "events_props_stats",
    "events_sessionized",
    "events_tumbling",
    "extract_text_md5",
    "extraction_metrics",
    "jaccard_verified_pairs",
    "keyword_sections",
    "lang_id",
    "lsh_candidate_pairs",
    "minhash_band_minima",
    "multimodal_meta",
    "part_supplier_volume",
    "quality_scores",
    "reference_scored_terms",
    "running_user_totals",
    "section_stats",
    "sentence_stats",
    "simhash16",
    "supplier_balance_rollup",
    "surviving_bigrams",
    "synonym_expanded_counts",
    "token_stats",
    # new in round 4
    "bm25_synonym_topk",
    "contaminated_docs",
    "curated_corpus_clean",
    "snippet_windows_recrawl",
    "phrase_query_recrawl",
    "unigram_logprob_scores",
    "term_suggest",
    "bm25_filtered_topk",
    "bm25_prf_topk",
    "pmi_bigrams",
    "bm25_stream_indexed_topk",
    # changed in round 4 (rewritten pruning / new init rule / oracle fix)
    "prefix_query",
    "ann_ivf_topk",
    "assign_to_centroids",
    "ann_lsh_buckets",
    "lsh_near_dup_pairs",
    "canonical_clusters",
    "stream_dedup_counts",
    # r3-certified block (still green from the most recent gate)
    "bm25_wand_topk",
    "bm25_topk",
    "bm25_incremental_topk",
    "bm25_compacted_topk",
    "bm25_recrawl_topk",
    "bm25_recrawl_purged_topk",
    "curated_corpus",
    "snippet_windows",
    "map_whitelist",
    "dup_components",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from keywords4cv_spark.driver_queries import QUERIES

    ordered = {n: QUERIES[n] for n in _GATE_PRIORITY if n in QUERIES}
    ordered.update((n, f) for n, f in QUERIES.items() if n not in ordered)
    return ordered


def oracle_sql() -> dict[str, str]:
    from keywords4cv_spark.driver_queries import ORACLES, ensure_oracle_fixtures

    # oracles must be runnable in any order relative to the Spark
    # queries — materialize the parquet fixtures they read up front
    ensure_oracle_fixtures()

    ordered = {n: ORACLES[n] for n in _GATE_PRIORITY if n in ORACLES}
    ordered.update((n, s) for n, s in ORACLES.items() if n not in ordered)
    return ordered
