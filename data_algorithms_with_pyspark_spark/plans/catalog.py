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

# Registration order is ALSO the external driver's sampling order (it
# checks a prefix of the catalog each round). Round 1 attested the
# tpch/tpch_extended/reference_algorithms families green; this round leads
# with the families that sample has never covered — events (red in round 1
# from the session-conf bug, now fixed) and the north-star extension/stats/
# pipeline/function queries — so cumulative driver attestation spans the
# whole catalog. Every query is identical under any order (catalog is a
# flat registry); scripts/driver_sim.py always verifies all of them.
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
)

# Queries floated to the FRONT of the catalog iteration order, ahead of
# module registration order. The external driver samples a ~50-query
# prefix each round; this list rotates per round so cumulative driver
# attestation covers every catalog query (scripts/driver_sim.py always
# verifies all of them regardless of order).
_SAMPLE_PRIORITY = (
    # Round 5 rotation (VERDICT r4 #3). Ordering rule (unchanged): queries
    # whose code changed this round or that the driver has NEVER attested
    # come first; then the stalest re-attestation block (r1-only-green);
    # r2-only-green queries are r6's block. After r4 the union of driver
    # attestation was 178/181 with the whole r1 tail 3 rounds stale —
    # this window holds the 6 new r5 queries, the 2 fixed reds, the 1
    # never-sampled rows-only query, and ALL 39 r1-only queries (48
    # entries before the r2-drain tail), so a clean round brings the
    # union to 187/187 minus whatever the ~50 cut drops from the tail.
    #
    # Slots 1-2: the round-4 driver reds, fixed this round (oracle
    # CAST for orders_cdc_replay; fp_seq serialized to a string key for
    # video_fingerprint_dedup_groups) — tests/test_driver_canon_lint.py
    # now mechanically forbids both failure classes catalog-wide.
    "orders_cdc_replay",
    "video_fingerprint_dedup_groups",
    # New in r5.
    "q21_waiting_suppliers",
    "doc_length_quantile_approx_audit",
    "corpus_train_ready_pipeline",
    "term_heavy_hitters",
    "part_name_typo_pairs",
    "sql_recursive_referral_chain",
    "session_funnel_report_pipeline",
    "source_term_heavy_hitters",
    "event_value_quantile_approx_audit",
    "corpus_dataset_card",
    "orders_bloom_prefilter_join",
    # Never driver-sampled (rows-only HLL built-in; its exact twin
    # exact_distinct_users and full-value-oracle portable twin
    # portable_hll_distinct_users are both already driver-green).
    "approx_distinct_users_hll",
    # r1-only-attested stale block, graph family first (VERDICT r4 #3
    # names it explicitly) ...
    "graph_degrees",
    "graph_bidirectional_edges",
    "graph_two_hop_paths",
    "graph_triangles",
    "graph_connected_components",
    "graph_pagerank",
    "graph_shortest_paths",
    # ... the full TPC-H r1 block ...
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_nation_profit",
    "q10_returned_items",
    "q12_priority_by_linestatus",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_variety",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_bracket_revenue",
    "q22_idle_rich_customers",
    # ... the r1 reporting/ETL tail (the six VERDICT r4 #3 names, then
    # the ten deferred-from-r4 reporting queries; avg_quantity_by_
    # returnflag left out — it re-attested green in r4).
    "customer_balance_etl",
    "nation_customer_supplier_setops",
    "orders_by_year_month",
    "returnflag_linestatus_pivot",
    "sql_nation_supplier_analytics",
    "top_orders_per_priority",
    "active_nation_keys",
    "char_count",
    "customers_without_orders",
    "lineitem_cube",
    "lineitem_rollup",
    "part_name_words",
    "sum_quantity_by_linestatus",
    "top_customers_by_balance",
    "word_count",
    # The ~50-query sample window has ~7 slots left after the full
    # r1-stale block — start draining the r2-only block (alphabetical
    # head) so r6's window shrinks.
    "ann_cosine_topk",
    "ann_knn_join_bruteforce",
    "bpe_pair_counts",
    "clicks_last_purchase_asof",
    "customer_feature_engineering",
    "dedup_exact_groups",
    "doc_fingerprints",
    # NOTE r6 rotation: with the above green, every remaining catalog
    # query is r2-attested or newer. r6's window should hold the rest of
    # the r2-only-green block (38 queries after the 7 drained above —
    # compute the list from CORRECTNESS_r0{1..5} union as r5 did), then
    # start on r3-only, keeping only r6-changed/new queries ahead.
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
