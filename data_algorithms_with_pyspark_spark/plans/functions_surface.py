"""Scalar / higher-order / map function surface queries.

SURVEY.md §2.9 records the reference's entire scalar-function vocabulary
(col, arithmetic, contains, split, cast, round, explode — e.g.
/root/reference/src/chapter_05/.../physical_partitioning.py:54-57 does
date math by string `split`). This module widens that surface to the
function families a production engine needs — date/time, string,
higher-order array (Catalyst ``HigherOrderFunction`` — JVM-side, no
Python), and MapType round-trips — each cross-checked against a DuckDB
oracle. All expressions are pure codegen projections: one scan, one
hash aggregate, no UDFs.

Semantics notes (verified against DuckDB 1.x):
  * Spark ``dayofweek`` is 1=Sunday..7=Saturday; DuckDB ``dayofweek`` is
    0=Sunday..6=Saturday — oracles add 1.
  * Spark ``add_months`` and DuckDB ``+ INTERVAL n MONTH`` both clamp to
    month end (Jan 31 + 3 months → Apr 30).
  * Fold order of ``F.aggregate`` matches DuckDB ``list_sum`` on the same
    list; cross-row float aggregates are rounded before compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.dedup import floor_round
from data_algorithms_with_pyspark_spark.plans.catalog import (
    cents_sum,
    cents_sum_sql,
    register,
)
from data_algorithms_with_pyspark_spark.sources.readers import load_table


@register(
    "orders_date_functions",
    tags=("functions", "dates"),
    description="Date/time function surface: date_trunc quarter, dayofweek, "
    "last_day, add_months (clamped), datediff — grouped per quarter x "
    "weekday (engine standardizes real date functions over the reference's "
    "string-split idiom, SURVEY §1.3/§2.9)",
    oracle="""
        SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
               CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
               count(*) AS n_orders,
               floor(avg(date_diff('day', o_orderdate, DATE '1998-12-31')) * 10000 + 0.5) / 10000
                   AS avg_age_days,
               {sum_price} AS sum_price,
               max(last_day(o_orderdate)) AS max_month_end,
               min(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE)) AS min_due_date
        FROM orders
        GROUP BY quarter_start, dow
    """.format(sum_price=cents_sum_sql("o_totalprice")),
)
def orders_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan + one hash aggregate; every date function is evaluated in
    the map-side projection, so the shuffle carries only (quarter, dow)
    groups — ~200 rows regardless of input scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
            F.dayofweek("o_orderdate").alias("dow"),
            F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate")).alias(
                "age_days"
            ),
            F.last_day("o_orderdate").alias("month_end"),
            F.add_months("o_orderdate", 3).alias("due_date"),
            "o_totalprice",
        )
        .groupBy("quarter_start", "dow")
        .agg(
            F.count("*").alias("n_orders"),
            floor_round(F.avg("age_days"), 4).alias("avg_age_days"),
            cents_sum(F.col("o_totalprice")).alias("sum_price"),
            F.max("month_end").alias("max_month_end"),
            F.min("due_date").alias("min_due_date"),
        )
    )


@register(
    "part_string_functions",
    tags=("functions", "strings"),
    description="String function surface: regexp_extract, split+size, lpad, "
    "levenshtein, instr, upper, concat_ws — per-row projection over part",
    oracle="""
        SELECT p_partkey,
               upper(p_type) AS type_upper,
               regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
               CAST(len(string_split(p_name, ' ')) AS INT) AS n_words,
               lpad(p_brand, 12, '#') AS brand_padded,
               CAST(levenshtein(p_brand, p_type) AS INT) AS brand_type_dist,
               CAST(instr(p_type, ' ') AS INT) AS first_space,
               concat_ws('|', p_brand, CAST(p_size AS VARCHAR)) AS brand_size
        FROM part
    """,
)
def part_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure narrow projection — no shuffle at all; at cluster scale this is
    a map-only stage whose cost is the parquet scan."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_type").alias("type_upper"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.lpad("p_brand", 12, "#").alias("brand_padded"),
        F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
        F.instr(F.col("p_type"), " ").alias("first_space"),
        F.concat_ws("|", "p_brand", F.col("p_size").cast("string")).alias("brand_size"),
    )


@register(
    "embedding_vector_stats",
    tags=("functions", "similarity", "higher-order"),
    description="Higher-order array functions (aggregate / filter / "
    "element_at) over array<float> embeddings — per-label L2-norm and "
    "sign statistics, all JVM-side (functions/vectors.py)",
    oracle="""
        WITH v AS (
            SELECT label,
                   sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
                       AS l2,
                   len(list_filter(embedding, x -> x > 0)) AS n_pos,
                   embedding[1]::DOUBLE AS dim0
            FROM embeddings
        )
        SELECT label,
               count(*) AS n_vectors,
               floor(avg(l2) * 1000000 + 0.5) / 1000000 AS avg_l2_norm,
               floor(min(l2) * 1000000 + 0.5) / 1000000 AS min_l2_norm,
               CAST(sum(n_pos) AS BIGINT) AS total_pos_dims,
               floor(avg(dim0) * 1000000 + 0.5) / 1000000 AS avg_dim0
        FROM v
        GROUP BY label
    """,
)
def embedding_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-vector math (fold, filter, element_at) runs in the map-side
    projection via Catalyst HigherOrderFunctions; the shuffle carries one
    partial-aggregate row per label per partition."""
    from data_algorithms_with_pyspark_spark.functions.vectors import (
        l2_norm,
        to_double_array,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vec = to_double_array("embedding")
    per_vec = emb.select(
        "label",
        l2_norm(vec).alias("l2"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_pos"),
        F.element_at(vec, 1).alias("dim0"),
    )
    return per_vec.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        floor_round(F.avg("l2"), 6).alias("avg_l2_norm"),
        floor_round(F.min("l2"), 6).alias("min_l2_norm"),
        F.sum("n_pos").cast("long").alias("total_pos_dims"),
        floor_round(F.avg("dim0"), 6).alias("avg_dim0"),
    )


@register(
    "brand_type_map_roundtrip",
    tags=("functions", "map-type"),
    description="MapType round-trip: per-brand type->count map built "
    "with map_from_entries, inspected with size(map_keys), flattened back "
    "with explode — the oracle checks the flattened relation",
    oracle="""
        SELECT p_brand, p_type, count(*) AS n,
               CAST(count(*) OVER (PARTITION BY p_brand) AS INT) AS n_types
        FROM part
        GROUP BY p_brand, p_type
    """,
)
def brand_type_map_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two hash aggregates on progressively coarser keys (brand,container
    -> brand); the map is built from already-aggregated rows, so MapType
    construction cost is proportional to group count, not input rows."""
    part = load_table(spark, sf_dir, "part")
    counts = part.groupBy("p_brand", "p_type").agg(F.count("*").alias("n"))
    maps = counts.groupBy("p_brand").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("p_type", "n")))
        ).alias("m")
    )
    return maps.select(
        "p_brand",
        F.size(F.map_keys(F.col("m"))).alias("n_types"),
        F.explode("m").alias("p_type", "n"),
    ).select("p_brand", "p_type", "n", "n_types")


_CHAIN_SEEDS = 5
_CHAIN_MAX_DEPTH = 12

# ONE SQL text for both engines: the Spark side runs this string verbatim
# over a temp view, the DuckDB oracle runs it over its registered view —
# cross-engine agreement of the recursive-CTE semantics is tested on the
# identical query text, not a re-expression.
_CHAIN_SQL = f"""
        WITH RECURSIVE walk(seed, node, depth) AS (
            SELECT c_custkey, c_custkey, CAST(0 AS BIGINT)
            FROM customer WHERE c_custkey < {_CHAIN_SEEDS}
            UNION ALL
            SELECT w.seed, (w.node * 7 + 3) % (SELECT count(*) FROM customer),
                   w.depth + 1
            FROM walk w WHERE w.depth < {_CHAIN_MAX_DEPTH}
        )
        SELECT seed, CAST(count(DISTINCT node) AS BIGINT) AS n_distinct_nodes,
               max(depth) AS max_depth
        FROM walk GROUP BY seed
"""


@register(
    "sql_recursive_referral_chain",
    tags=("sql", "recursive-cte", "iterative"),
    description=f"Spark 4 WITH RECURSIVE surface: walk the deterministic "
    f"referral successor function cust -> (cust*7+3) mod |customers| from "
    f"{_CHAIN_SEEDS} seeds for up to {_CHAIN_MAX_DEPTH} hops and report "
    "distinct nodes visited + walk length per seed — the declarative SQL "
    "twin of the operators/iterative.py driver-loop algorithms; the oracle "
    "is the IDENTICAL query text run by DuckDB",
    oracle=_CHAIN_SQL,
)
def sql_recursive_referral_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE as shipped in Spark 4 (UNION ALL form — Spark rejects
    recursive UNION DISTINCT, so bounded recursion needs either a depth
    guard or an out-degree-1 step; this walk has both). The successor is a
    pure modular function of the previous node, so each recursion step is
    a narrow projection of the prior iteration's frontier — Spark executes
    the same loop operators/iterative.py drives by hand, but declared in
    SQL, and the DuckDB oracle runs the IDENTICAL text (_CHAIN_SQL).
    Frontier size is |seeds| rows at every depth: UNION ALL recursion
    cannot blow up on a functional graph, cycles are cut by the depth
    bound, and the rho-shaped revisits collapse in the count(DISTINCT)
    roll-up. The per-seed output is |seeds| rows at any scale."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_CHAIN_SQL)


@register(
    "sql_parameterized_top_customers",
    tags=("functions", "sql", "api"),
    description="Named-parameter SQL binding (spark.sql(query, args=...)): "
    "balance threshold and top-k bound as :minbal / :k parameter markers "
    "instead of string interpolation — the injection-safe templated-query "
    "surface; per-nation top-k by balance, integer-cent balances",
    oracle="""
        SELECT nation_name, c_custkey, bal_cents, rn FROM (
            SELECT n.n_name AS nation_name, c.c_custkey,
                   CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
                       AS bal_cents,
                   CAST(row_number() OVER (
                       PARTITION BY n.n_name
                       ORDER BY floor(c.c_acctbal * 100 + 0.5) DESC,
                                c.c_custkey
                   ) AS BIGINT) AS rn
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            WHERE c.c_acctbal > 1000.0
        ) WHERE rn <= 3
    """,
)
def sql_parameterized_top_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The templated-query API surface: the SAME analytic SQL text runs
    for any (minbal, k) via named parameter markers — Catalyst binds
    them as literals at analysis time (so constant folding and filter
    pushdown see real constants; plan-identical to inlined literals),
    and the text is never string-concatenated (the injection-safe shape
    a query service uses). Per-nation top-k plans as one WindowGroupLimit
    — rank state never materializes beyond k per nation."""
    for t in ("customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"pq_{t}")
    return spark.sql(
        """
        SELECT nation_name, c_custkey, bal_cents, rn FROM (
            SELECT n.n_name AS nation_name, c.c_custkey,
                   CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
                       AS bal_cents,
                   CAST(row_number() OVER (
                       PARTITION BY n.n_name
                       ORDER BY floor(c.c_acctbal * 100 + 0.5) DESC,
                                c.c_custkey
                   ) AS BIGINT) AS rn
            FROM pq_customer c
            JOIN pq_nation n ON c.c_nationkey = n.n_nationkey
            WHERE c.c_acctbal > :minbal
        ) WHERE rn <= :k
        """,
        args={"minbal": 1000.0, "k": 3},
    )


@register(
    "orders_observed_pass_metrics",
    tags=("functions", "api", "quality"),
    description="Observation API (SPARK-34806): QC metrics — row count, "
    "integer-cent revenue, key extents, null count — collected DURING a "
    "real write pass via df.observe, zero extra scans; the returned "
    "one-row report is the observation payload, oracled against a direct "
    "aggregate",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT) AS total_cents,
               CAST(min(o_orderkey) AS BIGINT) AS min_key,
               CAST(max(o_orderkey) AS BIGINT) AS max_key,
               CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
                   AS n_null_custkey
        FROM orders
    """,
)
def orders_observed_pass_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB operational pattern this attests: dataset-card metrics
    ride along on the SAME pass that does the real work (here a parquet
    write of the full table) instead of paying a second full scan —
    ``df.observe`` attaches the aggregates to the scan as accumulator-
    backed expressions, and the driver reads the payload after the
    action. All observed metrics are exact-integer (order-free cents,
    extents, counts), so the report is deterministic under any
    partitioning. The one-row report IS the observation dict."""
    import shutil

    from pyspark.sql import Observation

    from data_algorithms_with_pyspark_spark.scratch import scratch_dir

    orders = load_table(spark, sf_dir, "orders")
    obs = Observation("orders_pass")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("total_cents"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias(
            "n_null_custkey"
        ),
    )
    out = scratch_dir("obs", sf_dir)
    observed.write.mode("overwrite").parquet(out)  # the real pass
    m = obs.get
    # The write is eager and the result below is driver-side — the
    # scratch parquet is dead the moment the observation payload is
    # read, so reclaim it now rather than at process exit.
    shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["total_cents"],
                m["min_key"],
                m["max_key"],
                m["n_null_custkey"],
            )
        ],
        "n_rows long, total_cents long, min_key long, max_key long, "
        "n_null_custkey long",
    )


@register(
    "part_collation_distinct_audit",
    tags=("functions", "strings", "api"),
    description="Spark 4 string COLLATION surface: per-brand distinct part "
    "names under binary vs UTF8_LCASE collation over a deterministically "
    "case-perturbed name column (even part keys uppercased) — the "
    "case-insensitive-semantics-without-rewrites feature, value-checked "
    "against lower()-normalized counts",
    oracle="""
        WITH mixed AS (
            SELECT p_brand,
                   CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                        ELSE p_name END AS m
            FROM part
        )
        SELECT p_brand,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(DISTINCT m) AS BIGINT) AS n_distinct_binary,
               CAST(count(DISTINCT lower(m)) AS BIGINT) AS n_distinct_lcase
        FROM mixed GROUP BY p_brand
    """,
)
def part_collation_distinct_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Collated comparison is evaluated INSIDE the aggregate — no data
    rewrite, no lower() projection materialized. The audit pins
    UTF8_LCASE distinct == lower()-normalized distinct on a name column
    with planted case divergence (even keys uppercased), while binary
    distinct counts the case variants separately.

    Cost honesty (lint-allowlisted): grouping on a NON-BINARY collated
    key cannot hash-aggregate (collated equality is not binary equality,
    so UnsafeRow hashing is unsound) — Spark plans the distinct-expand
    as SortAggregate by design. This row's own output demonstrates the
    100 TB rewrite: lower()-normalized distinct (hash-aggregable) is
    numerically identical, so normalize hot columns and reserve
    collations for correctness-critical comparison sites."""
    part = load_table(spark, sf_dir, "part")
    mixed = part.select(
        "p_brand",
        F.when(
            F.col("p_partkey") % 2 == 0, F.upper(F.col("p_name"))
        )
        .otherwise(F.col("p_name"))
        .alias("m"),
    )
    return mixed.groupBy("p_brand").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct(F.col("m")).alias("n_distinct_binary"),
        F.count_distinct(F.collate(F.col("m"), "UTF8_LCASE")).alias(
            "n_distinct_lcase"
        ),
    )


@register(
    "part_type_listagg",
    tags=("functions", "sql", "api"),
    description="SQL:2016 LISTAGG (Spark 4, SPARK-42746): per-brand sorted "
    "distinct type roster as one delimited string — DISTINCT + "
    "WITHIN GROUP (ORDER BY) makes the text deterministic under any "
    "partitioning; plus the distinct count as the cheap cross-check",
    oracle="""
        SELECT p_brand,
               CAST(count(DISTINCT p_type) AS BIGINT) AS n_types,
               string_agg(DISTINCT p_type, ','
                          ORDER BY p_type) AS types
        FROM part GROUP BY p_brand
    """,
)
def part_type_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg only enters the catalog in its DETERMINISTIC form —
    DISTINCT dedups, WITHIN GROUP (ORDER BY) pins element order — since
    an unordered listagg is run-order-dependent (the same reason
    collect_list never appears in catalog output schemas). The rendered
    roster is bounded by the type vocabulary, not the row count,
    so the aggregation buffer stays small at any scale."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("la_part")
    # listagg(DISTINCT x) WITHIN GROUP hits a ClassCastException in the
    # plain (non-AQE) session on Spark 4.1 (AttributeReference vs
    # SortOrder in the distinct-agg rewrite), so dedup happens in a
    # subquery and listagg itself stays non-DISTINCT — identical result
    return spark.sql(
        """
        SELECT p_brand,
               count(p_type) AS n_types,
               listagg(p_type, ',') WITHIN GROUP (ORDER BY p_type) AS types
        FROM (SELECT DISTINCT p_brand, p_type FROM la_part)
        GROUP BY p_brand
        """
    )


@register(
    "nation_top_customer_lateral",
    tags=("functions", "sql", "api"),
    description="Correlated LATERAL subquery (Spark 4 SQL surface): per "
    "nation, the top customer by integer-cent balance (ties by key) via "
    "LATERAL ... ORDER BY ... LIMIT 1 — the per-row-subquery form of the "
    "top-k-per-group pattern the window rows already attest",
    oracle="""
        SELECT n.n_name AS nation_name, t.c_custkey, t.bal_cents
        FROM nation n, LATERAL (
            SELECT c.c_custkey,
                   CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
                       AS bal_cents
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY floor(c.c_acctbal * 100 + 0.5) DESC, c.c_custkey
            LIMIT 1
        ) t
    """,
)
def nation_top_customer_lateral(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Catalyst decorrelates the LATERAL LIMIT-1 subquery into a
    window/aggregate over one join — the declared per-row subquery never
    executes per row (25 nations x a customer scan would be the naive
    plan); semantically identical SQL runs on both engines. Nations
    with no customers are dropped (LATERAL inner join), matching the
    oracle."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("lt_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "lt_customer"
    )
    return spark.sql(
        """
        SELECT n.n_name AS nation_name, t.c_custkey, t.bal_cents
        FROM lt_nation n, LATERAL (
            SELECT c.c_custkey,
                   CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)
                       AS bal_cents
            FROM lt_customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY floor(c.c_acctbal * 100 + 0.5) DESC, c.c_custkey
            LIMIT 1
        ) t
        """
    )
