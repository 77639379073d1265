"""Query-catalog registry.

Every capability the engine claims (SURVEY.md §2 inventory + north-star
extensions) is a named ``CatalogQuery``: a Spark function
``(spark, sf_dir) -> DataFrame`` paired, where SQL-expressible, with a
DuckDB oracle SQL string computing the same result on the same parquet
tables. The driver (and tests/test_catalog_oracle.py) run both sides and
compare row counts, schemas, and order-insensitive value hashes.

Cross-engine determinism rules used throughout the catalog:

* every computed/aggregate column is aliased identically on both sides;
* every floating-point output is ``round``-ed to a fixed scale on BOTH
  sides (double arithmetic is order-dependent across engines);
* every LIMIT query orders by a TOTAL order (explicit unique tie-breaker),
  computed over already-rounded values;
* integer aggregates are cast to BIGINT on the DuckDB side (DuckDB widens
  sum(BIGINT) to HUGEINT) and Spark's INT-returning functions (year, length,
  ...) are cast to match;
* timestamps compare under UTC (session.py pins spark.sql.session.timeZone).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["CatalogQuery", "register", "all_queries", "get_query", "ts"]

QueryFn = Callable[[SparkSession, str], DataFrame]

# Module import order (registration order) is the catalog's BASE order;
# _SAMPLE_PRIORITY below floats a per-round window to the front because
# the external driver samples a ~50-query prefix each round. Every query
# is identical under any order (flat registry); scripts/driver_sim.py
# always verifies all of them.
_QUERY_MODULES = (
    "data_algorithms_with_pyspark_spark.plans.events",
    "data_algorithms_with_pyspark_spark.plans.extensions",
    "data_algorithms_with_pyspark_spark.plans.stats",
    "data_algorithms_with_pyspark_spark.plans.pipelines",
    "data_algorithms_with_pyspark_spark.plans.functions_surface",
    "data_algorithms_with_pyspark_spark.plans.tpch",
    "data_algorithms_with_pyspark_spark.plans.tpch_extended",
    "data_algorithms_with_pyspark_spark.plans.reference_algorithms",
    "data_algorithms_with_pyspark_spark.plans.curation",
    "data_algorithms_with_pyspark_spark.plans.streaming_parity",
    "data_algorithms_with_pyspark_spark.plans.maintenance",
    "data_algorithms_with_pyspark_spark.plans.suite",
)

# Queries floated to the FRONT of the catalog iteration order, ahead of
# module registration order. The external driver samples a ~50-query
# prefix each round; this list rotates per round so cumulative driver
# attestation covers every catalog query (scripts/driver_sim.py always
# verifies all of them regardless of order).
_SAMPLE_PRIORITY = (
    # Round 9 rotation (VERDICT r8 #1). Ordering rule (unchanged):
    # new-this-round queries first, then the stalest re-attestation
    # blocks. Staleness from CORRECTNESS_r0{1..8} (scripts/staleness.py):
    # after r8's fully-fresh window, 10 queries are r3-only-green and 48
    # are r4-only-green. This window = 26 new + 10 r3 + 48 r4 = 84; the
    # ~50 cut attests every never-attested row plus the r3 block and the
    # head of the alphabetical r4 block — the r4 tail leads r10 together
    # with the r5-stale block (never-attested > stale, so the round's
    # new rows always outrank re-attestation).
    #
    # New in r9: the unigram-LM (SentencePiece-style) tokenizer trainer
    # pair, the at-least-once -> exactly-once streaming dedup parity row,
    # the append-mode (watermarked, bounded-state) twins of the
    # tumbling-hourly and sliding-window streaming parity rows, the
    # trained-IVF coarse-quantizer recall audit, the fully-trained
    # residual IVFADC (FAISS IVF16,PQ8 shape), the WordPiece trainer +
    # greedy-segmentation pair (completing the subword trio), the
    # MinHash-LSH recall/precision audit, the co-located bucketed
    # fact-fact join, and the SQ8 (symmetric-int8 absmax) ANN tier —
    # int8-dot MIPS top-k + recall audit, the 4x-compression midpoint
    # between raw f32 and PQ's 64x codes.
    # ... and the FASTA RECORD source via Spark 4's Python DataSource
    # API (Arrow-batched, per-file partitions — sources/pyds.py).
    "sq8_ann_topk",
    "sq8_recall_report",
    "fasta_pyds_record_stats",
    "corpus_mixture_temperature_weights",
    "orders_orc_roundtrip_digest",
    "streaming_pyds_source_parity",
    "sql_parameterized_top_customers",
    "orders_observed_pass_metrics",
    "simhash_guarded_near_dups",
    "srp_guarded_cosine_near_dups",
    "simhash_shingle_near_dups",
    "orders_xml_roundtrip_digest",
    "part_collation_distinct_audit",
    "corpus_neyman_sample_allocation",
    "distinct_users_sketch_comparison",
    "events_session_window_builtin",
    "part_type_listagg",
    "nation_top_customer_lateral",
    "wordpiece_learned_merges",
    "wordpiece_greedy_segmentation",
    "minhash_lsh_recall_report",
    "bucketed_orders_lineitem_join",
    "orders_schema_evolution_read",
    "tokenizer_compression_comparison",
    "ivf_nprobe_recall_curve",
    "events_variant_props_rollup",
    "orders_priority_year_pivot",
    "unigram_lm_vocab",
    "unigram_lm_segmentation",
    "unigram_corpus_compression",
    "unigram_persisted_tokenizer_encode",
    "streaming_dedup_parity",
    "streaming_append_hourly_parity",
    "streaming_append_sliding_parity",
    "ivf_trained_recall_report",
    "ivf_pq_residual_ann_topk",
    # r3-only-green block (10).
    "multimodal_video_stats",
    "near_dup_clusters",
    "orders_date_functions",
    "orders_quality_report",
    "orders_salted_join_agg",
    "part_string_functions",
    "rerank_topk",
    "simhash_near_dup_candidates",
    "term_posting_lists",
    "training_shard_packing",
    # r4-only-green block (48), alphabetical (deterministic tail for
    # the r10 cut).
    "audio_fingerprint_dedup_groups",
    "avg_quantity_by_returnflag",
    "bm25_search_topk",
    "cms_join_size_estimate",
    "concurrent_session_pairs",
    "customer_balance_ranks",
    "customer_k_anonymity_audit",
    "customer_rfm_segments",
    "customer_scd2_history",
    "doc_quality_classifier",
    "doc_quality_classifier_eval",
    "documents_cdc_chunk_dedup",
    "documents_replica_digest",
    "documents_weighted_sample",
    "dp_event_type_release",
    "embedding_cluster_top_terms",
    "embedding_gram_covariance",
    "embedding_pca_projection",
    "event_type_transition_matrix",
    "event_value_sampled_quantiles",
    "events_inter_arrival_stats",
    "events_rolling_hour_avg",
    "events_value_drift_psi",
    "events_value_holt_forecast",
    "events_value_robust_outliers",
    "graph_cc_star_contraction",
    "graph_label_propagation",
    "image_perceptual_dedup_groups",
    "incremental_hourly_agg_merge",
    "incremental_near_dup_candidates",
    "incremental_near_dup_persisted_index",
    "ivf_pq_ann_topk",
    "ivf_pq_recall_report",
    "language_id_confusion",
    "lineitem_zorder_extents",
    "near_dup_keep_best",
    "orders_column_profile",
    "orders_key_skew_report",
    "orders_snapshot_diff",
    "portable_hll_distinct_users",
    "pq_ann_topk",
    "pq_recall_report",
    "prefix_jaccard_near_dups",
    "q11_important_stock",
    "q20_promotable_suppliers",
    "q2_min_cost_supplier",
    "term_bigram_pmi",
    "user_journey_path_ngrams",
    # NOTE r10 rotation: whatever the ~50 cut drops from the r4 tail
    # above leads r10, followed by the r5-only-green block (recompute
    # from CORRECTNESS_r0{1..9} union via scripts/staleness.py).
)

_REGISTRY: dict[str, "CatalogQuery"] = {}
_LOADED = False


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None -> driver does a rows-only check
    description: str = ""
    bench: bool = False  # include in bench.py's headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    bench: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog query {name!r}")
        _REGISTRY[name] = CatalogQuery(name, fn, oracle, description, bench, tags)
        return fn

    return deco


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _LOADED = True


def all_queries() -> dict[str, CatalogQuery]:
    _load()
    ordered = {
        name: _REGISTRY[name] for name in _SAMPLE_PRIORITY if name in _REGISTRY
    }
    ordered.update(_REGISTRY)
    return ordered


def get_query(name: str) -> CatalogQuery:
    _load()
    return _REGISTRY[name]


def ts(literal: str):
    """Timestamp literal column (e.g. ts('1997-01-01'))."""
    return F.to_timestamp(F.lit(literal))


def cents_sum(expr):
    """Money sum that is bit-identical across engines and run orders.

    ``round(sum(double), 2)`` is unsafe for differential testing: the sum's
    last ulps depend on accumulation order (parallel aggregation), and
    Spark's HALF_UP-on-binary ``round`` can disagree with other engines at
    exact decimal halves. Quantizing each term to integer cents first
    (floor(x*100+0.5) — IEEE-exact in every engine) makes the aggregation
    an exact integer sum: associative, commutative, order-independent.
    SQL twin: CENTS_SUM_SQL.
    """
    return (F.sum(F.floor(expr * 100 + F.lit(0.5)).cast("long")) / 100.0)


def cents_sum_sql(expr_sql: str) -> str:
    """DuckDB twin of ``cents_sum`` (CAST keeps BIGINT out of HUGEINT)."""
    return (
        f"CAST(sum(CAST(floor(({expr_sql}) * 100 + 0.5) AS BIGINT)) AS BIGINT)"
        " / 100.0"
    )
