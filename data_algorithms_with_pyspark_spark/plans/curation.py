"""Corpus-quality rules and scale-pattern queries (round-2 additions).

Two themes, both north-star extensions beyond the reference's surface:

* **Training-corpus quality**: Gopher-style rule filtering (Rae et al.
  2021 appendix A1.1), within-document n-gram repetition profiling
  (C4/Gopher duplicate-n-gram signals), and int8 embedding-quantization
  error audit — the checks a 100 TB text+embedding pipeline runs before
  and after compression/dedup.
* **Scale patterns as first-class queries**: the salting skew-mitigation
  join proved equal to its plain-join oracle, and the hourly→daily
  hierarchical rollup (the hypertable "continuous aggregate" shape —
  daily reads the much smaller hourly aggregate, not raw events).

Cross-engine determinism policy: every keep/drop decision and every
aggregated measure here is computed in INTEGER space (cross-multiplied
rule comparisons, basis-point ratios, fixed-point micro/1e12 sums) so
the DuckDB oracle matches bit-for-bit regardless of accumulation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.functions.vectors import (
    int8_quant_sse_fp,
    to_double_array,
)
from data_algorithms_with_pyspark_spark.operators.sampling import (
    rational_hash_sample_predicate,
)
from data_algorithms_with_pyspark_spark.operators.sketches import kmv_distinct
from data_algorithms_with_pyspark_spark.operators.skew import salted_join
from data_algorithms_with_pyspark_spark.operators.text import (
    gopher_rules,
    repetition_scores,
)
from data_algorithms_with_pyspark_spark.plans.catalog import (
    cents_sum,
    cents_sum_sql,
    register,
)
from data_algorithms_with_pyspark_spark.plans.extensions import _TOKENS
from data_algorithms_with_pyspark_spark.plans.lsh_oracles import (
    incremental_minhash_sql,
)
from data_algorithms_with_pyspark_spark.sources.readers import load_table

_STOPS_SQL = "['the', 'and', 'of', 'to', 'a', 'in', 'is', 'that']"


@register(
    "doc_gopher_quality_rules",
    bench=True,
    tags=("text", "quality", "pipeline"),
    description="Gopher-rule document filter: per-rule 0/1 flags (word "
    "count, mean word length, stopword presence, distinct-word ratio) + "
    "combined keep verdict, all integer-space comparisons",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS t FROM documents
        ),
        feats AS (
            SELECT doc_id,
                   CAST(len(t) AS BIGINT) AS n,
                   CAST(list_aggregate(
                       list_transform(t, w -> CAST(len(w) AS BIGINT)), 'sum')
                       AS BIGINT) AS sum_len,
                   CAST(len(list_distinct(t)) AS BIGINT) AS n_uniq,
                   CAST(len(list_intersect(t, {_STOPS_SQL})) AS BIGINT)
                       AS stop_hits
            FROM toks
        )
        SELECT doc_id,
               n AS n_words,
               CAST(n BETWEEN 25 AND 10000 AS INT) AS words_ok,
               CAST(10 * sum_len BETWEEN 40 * n AND 100 * n AS INT)
                   AS mean_wlen_ok,
               CAST(stop_hits >= 2 AS INT) AS stopword_ok,
               CAST(100 * n_uniq >= 45 * n AS INT) AS uniq_words_ok,
               CAST((n BETWEEN 25 AND 10000)
                    AND (10 * sum_len BETWEEN 40 * n AND 100 * n)
                    AND stop_hits >= 2
                    AND 100 * n_uniq >= 45 * n AS INT) AS keep
        FROM feats
    """,
)
def doc_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_rules(load_table(spark, sf_dir, "documents"))


@register(
    "doc_repetition_scores",
    tags=("text", "quality", "dedup"),
    description="Within-doc repetition profile: unique word/bigram/trigram "
    "ratios in basis points (C4/Gopher duplicate-n-gram signals)",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_TOKENS} AS t FROM documents
        ),
        g AS (
            SELECT doc_id, t,
                   list_transform(range(1, len(t)),
                       i -> t[i] || ' ' || t[i+1]) AS b2,
                   list_transform(range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS b3
            FROM toks
        )
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_words,
               CASE WHEN len(t) = 0 THEN NULL ELSE CAST(floor(
                   len(list_distinct(t)) * 10000.0 / len(t) + 0.5) AS BIGINT)
               END AS uniq_word_bp,
               CAST(len(b2) AS BIGINT) AS n_bigrams,
               CASE WHEN len(b2) = 0 THEN NULL ELSE CAST(floor(
                   len(list_distinct(b2)) * 10000.0 / len(b2) + 0.5) AS BIGINT)
               END AS uniq_bigram_bp,
               CAST(len(b3) AS BIGINT) AS n_trigrams,
               CASE WHEN len(b3) = 0 THEN NULL ELSE CAST(floor(
                   len(list_distinct(b3)) * 10000.0 / len(b3) + 0.5) AS BIGINT)
               END AS uniq_trigram_bp
        FROM g
    """,
)
def doc_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_scores(load_table(spark, sf_dir, "documents"))


@register(
    "embedding_int8_quant_error",
    tags=("similarity", "quality", "functions"),
    description="Int8 absmax-quantization audit: per-label vector count, "
    "exact fixed-point (1e-12) total reconstruction SSE, and mean SSE per "
    "vector — the compression-loss check before shipping quantized "
    "embeddings",
    oracle="""
        WITH v AS (
            SELECT label, embedding::DOUBLE[] AS vec FROM embeddings
        ),
        s AS (
            SELECT label, vec,
                   list_max(list_transform(vec, x -> abs(x))) / 127.0 AS scale
            FROM v
        ),
        e AS (
            SELECT label, scale,
                   list_transform(vec, x -> x
                       - greatest(-127.0, least(127.0, floor(x / scale + 0.5)))
                         * scale) AS err
            FROM s
        ),
        per AS (
            SELECT label,
                   CASE WHEN scale = 0 THEN CAST(0 AS BIGINT)
                        ELSE CAST(list_aggregate(list_transform(err,
                            x -> CAST(floor(x * x * 1e12 + 0.5) AS BIGINT)),
                            'sum') AS BIGINT)
                   END AS sse_fp
            FROM e
        )
        SELECT label,
               CAST(count(*) AS BIGINT) AS n_vectors,
               CAST(sum(sse_fp) AS BIGINT) AS total_err_fp,
               CAST(sum(sse_fp) AS BIGINT) / count(*) AS avg_sse_fp
        FROM per
        GROUP BY label
        ORDER BY label
    """,
)
def embedding_int8_quant_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One projection computes each vector's exact fixed-point SSE inside
    codegen (functions/vectors.int8_quant_sse_fp), then a single hash
    aggregate on the low-cardinality label key — integer sums end to end,
    so the per-label totals are order-independent. At 100 TB: map-side
    partial aggregation reduces each partition to n_labels rows before the
    one tiny shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    per = emb.select(
        "label",
        int8_quant_sse_fp(to_double_array("embedding")).alias("sse_fp"),
    )
    return (
        per.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum("sse_fp").alias("total_err_fp"),
        )
        .select(
            "label",
            "n_vectors",
            "total_err_fp",
            (F.col("total_err_fp") / F.col("n_vectors")).alias("avg_sse_fp"),
        )
        .orderBy("label")
    )


@register(
    "orders_salted_join_agg",
    tags=("join", "skew", "scale"),
    description="Market-segment order rollup through the salted join "
    "(operators/skew.salted_join, 8 salts) — result proven identical to "
    "the plain-join oracle; the explicit mitigation for hot keys AQE "
    "can't split",
    oracle=f"""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_orders,
               {cents_sum_sql("o_totalprice")} AS total_price
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
)
def orders_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting replicates the dimension once per salt and scatters fact
    rows by a whole-row hash, so a hot customer key spreads over 8 shuffle
    partitions instead of one straggler. Join-key equality still holds on
    exactly one salt per matched pair, which is what the plain-join oracle
    certifies. The aggregate beneath is unchanged: partial+final hash
    aggregate on the 5-value segment key.

    The fact side is projected to the two referenced columns BEFORE the
    salted join: the salt hashes every column of its input, so an
    unprojected left side would force the scan to read the full row width
    (ReadSchema showed all 6 order columns) just to feed the hash — the
    one column-pruning barrier salting introduces, and the caller-side
    projection is the fix."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    return (
        salted_join(orders, cust, on="o_custkey", n_salts=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            cents_sum(F.col("o_totalprice")).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "events_hourly_daily_rollup",
    bench=True,
    tags=("events", "timeseries", "rollup", "scale"),
    description="Hierarchical continuous-aggregate shape: hourly event "
    "rollup re-aggregated to daily (counts, fixed-point value sums, "
    "active-hour counts) — daily reads the small hourly aggregate, never "
    "the raw events",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT))
                       AS BIGINT) AS value_fp
            FROM events
            GROUP BY 1, 2
        )
        SELECT CAST(hour AS DATE) AS day, event_type,
               CAST(sum(n_events) AS BIGINT) AS n_events,
               CAST(sum(value_fp) AS BIGINT) / 1e6 AS value_sum,
               CAST(count(*) AS BIGINT) AS n_active_hours
        FROM hourly
        GROUP BY 1, 2
        ORDER BY day, event_type
    """,
)
def events_hourly_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TimescaleDB/Druid rollup cascade in two hash aggregates: the
    raw scan reduces to (hour, type) — at 100 TB that's the only pass over
    events, with map-side partials — and the daily layer aggregates the
    ~24x smaller hourly relation. Value sums are micro-quantized to exact
    integers at the leaf so both rollup levels are order-independent and
    re-aggregable (the continuous-aggregate contract: daily derived from
    stored hourly equals daily from raw)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
        ).alias("value_fp"),
    )
    return (
        hourly.groupBy(F.to_date("hour").alias("day"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            (F.sum("value_fp") / F.lit(1e6)).alias("value_sum"),
            F.count("*").alias("n_active_hours"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "corpus_weighted_mixture_sample",
    tags=("sampling", "pipeline", "scale"),
    description="Deterministic weighted corpus mixing: even-numbered "
    "sources downsampled to 1/2 via the all-integer rational hash "
    "predicate; per-source (n_docs, n_kept) audit report",
    oracle="""
        WITH rated AS (
            SELECT doc_id, source,
                   CASE WHEN CAST(regexp_extract(source, '([0-9]+)$', 1)
                             AS BIGINT) % 2 = 0
                        THEN 1 ELSE 2 END AS num,
                   2 AS den
            FROM documents
        ),
        kept AS (
            SELECT source
            FROM rated
            WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                      ::BIGINT * den
                  < num * 16777216
        )
        SELECT r.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
        FROM rated r
        LEFT JOIN (
            SELECT source, count(*) AS n_kept FROM kept GROUP BY source
        ) k USING (source)
        GROUP BY r.source, k.n_kept
        ORDER BY r.source
    """,
)
def corpus_weighted_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing primitive for training-corpus assembly: each source
    gets a RATIONAL sampling rate (here: even-numbered sources 1/2, odd
    1/1) and rows are accepted by the integer hash predicate
    (operators/sampling.rational_hash_sample_predicate) — the same rows on
    every run, any cluster size, any partitioning, any engine. The audit
    output is the per-source before/after row count a mixing run reports.
    Plan: one scan computes the rate columns and the verdict inline (the
    rate here derives from the source name; a target-proportion table
    would broadcast-join instead), one hash aggregate for the report."""
    docs = load_table(spark, sf_dir, "documents")
    num = F.when(
        F.regexp_extract("source", r"([0-9]+)$", 1).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(2)).cast("long")
    den = F.lit(2).cast("long")
    rated = docs.select(
        "doc_id",
        "source",
        rational_hash_sample_predicate("doc_id", num, den).alias("kept"),
    )
    return (
        rated.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
        )
        .orderBy("source")
    )


@register(
    "corpus_vocabulary_coverage",
    tags=("text", "pipeline", "functions"),
    description="Tokenizer-prep vocabulary report: terms by corpus "
    "frequency with rank and cumulative coverage (basis points of all "
    "token occurrences)",
    oracle=f"""
        WITH toks AS (
            SELECT unnest({_TOKENS}) AS term FROM documents
        ),
        freq AS (
            SELECT term, CAST(count(*) AS BIGINT) AS n FROM toks
            GROUP BY term
        ),
        ranked AS (
            SELECT term, n,
                   CAST(row_number() OVER
                       (ORDER BY n DESC, term ASC) AS BIGINT) AS rank,
                   CAST(sum(n) OVER (ORDER BY n DESC, term ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_n,
                   CAST(sum(n) OVER () AS BIGINT) AS total_n
            FROM freq
        )
        SELECT term, n, rank,
               CAST(floor(cum_n * 10000.0 / total_n + 0.5) AS BIGINT)
                   AS coverage_bp
        FROM ranked
        ORDER BY rank
    """,
)
def corpus_vocabulary_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The coverage curve a tokenizer-training run reads off first: terms
    in frequency order with the cumulative share of all token occurrences
    each prefix of the vocabulary covers. Two hash aggregates (explode ->
    term counts), then the rank + running total come from
    ``ordering.global_ranked_prefix_sum`` — range-exchange + per-partition
    offsets — NOT a single-partition Window: a web-crawl vocabulary
    (every typo, URL, hex blob is a "term") is corpus-scaled, and the
    naive ``sum(n).over(Window.orderBy(...))`` funnels it through one
    task. Counts are integers, so the split accumulation is exact and the
    oracle unchanged; the grand total is driver-known and attached as a
    literal (replacing a second full-relation window)."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import (
        words,
    )
    from data_algorithms_with_pyspark_spark.operators.ordering import (
        global_ranked_prefix_sum,
    )

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    ranked = global_ranked_prefix_sum(
        freq,
        [F.col("n").desc(), F.col("term").asc()],
        "n",
        rank_col="rank",
        cum_col="cum_n",
        total_col="total_n",
    )
    return (
        ranked.select(
            "term",
            "n",
            "rank",
            F.floor(F.col("cum_n") * 10000.0 / F.col("total_n") + F.lit(0.5))
            .cast("long")
            .alias("coverage_bp"),
        )
        .orderBy("rank")
    )


_KMV_K = 64


@register(
    "kmv_distinct_users",
    tags=("sketch", "events", "scale"),
    description=f"KMV (k={_KMV_K} minimum md5 values) distinct-user sketch "
    "per event type, WITH exact count alongside — the deterministic-hash "
    "sketch whose estimates a foreign engine reproduces bit-for-bit "
    "(unlike HLL, which is rows-only-checkable)",
    oracle=f"""
        WITH hashes AS (
            SELECT DISTINCT event_type,
                   ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 6))
                       ::BIGINT AS h
            FROM events
        ),
        ranked AS (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h)
                       AS rn
            FROM hashes
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_distinct,
               coalesce(
                   floor({_KMV_K - 1} * 16777216.0
                         / max(CASE WHEN rn = {_KMV_K} THEN h END)
                         * 100 + 0.5) / 100,
                   CAST(count(*) AS DOUBLE)) AS kmv_estimate
        FROM ranked
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmv_distinct(
        load_table(spark, sf_dir, "events"), "event_type", "user_id", k=_KMV_K
    ).orderBy("event_type")


_EWMA_ALPHA = 0.3
_EWMA_BETA = 1.0 - _EWMA_ALPHA  # NOT 0.7 in f64; repr-shared with the oracle


@register(
    "events_value_ewma",
    bench=True,
    tags=("events", "timeseries", "pandas-udf"),
    description=f"Per-user EWMA (alpha={_EWMA_ALPHA}) of event values — the "
    "one genuinely recursive operator, Arrow applyInPandas fold vs a "
    "recursive-CTE oracle replaying the identical (mul, mul, add) step",
    oracle=f"""
        WITH RECURSIVE ev AS (
            SELECT user_id, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        r AS (
            SELECT user_id, ts, value, rn, value AS y FROM ev WHERE rn = 1
            UNION ALL
            SELECT e.user_id, e.ts, e.value, e.rn,
                   {_EWMA_ALPHA!r} * e.value + {_EWMA_BETA!r} * r.y
            FROM ev e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1
        )
        SELECT user_id, ts, value,
               floor(y * 1e6 + 0.5) / 1e6 AS ewma
        FROM r
    """,
)
def events_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's policy-sanctioned Pandas-UDF tier in the catalog: the
    EWMA recurrence has no bounded-error window form, so it runs as one
    shuffle on user_id + an Arrow-batched fold per user
    (operators/timeseries.grouped_ewma). The oracle replays the exact
    float op sequence via recursive CTE, so even this non-SQL-shaped
    operator carries a full value check. event_id is selected only as the
    within-user tie-breaker and dropped from the output."""
    from data_algorithms_with_pyspark_spark.operators.timeseries import (
        grouped_ewma,
    )

    ev = load_table(spark, sf_dir, "events")
    return grouped_ewma(
        ev, "user_id", ["ts", "event_id"], "value", alpha=_EWMA_ALPHA
    ).drop("event_id")


_SEMDEDUP_THRESHOLD = 0.5
_SEMDEDUP_CLUSTERS = 16


@register(
    "embedding_semdedup_prune",
    bench=True,
    tags=("dedup", "similarity", "embeddings"),
    description=f"SemDeDup-style semantic dedup (arXiv:2303.09540): nearest-"
    f"centroid clustering ({_SEMDEDUP_CLUSTERS} lists) then within-cluster "
    f"cosine>={_SEMDEDUP_THRESHOLD} pruning — pairwise cost bounded by "
    "cluster sizes, never corpus^2 (operators/dedup.py:semdedup_prune)",
    oracle=f"""
        WITH v AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
        ),
        cent AS MATERIALIZED (
            SELECT vec_id AS cid, vec AS cvec FROM v
            WHERE vec_id < {_SEMDEDUP_CLUSTERS}
        ),
        assign AS MATERIALIZED (
            SELECT vec_id, cid FROM (
                SELECT v.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY CAST(floor((list_cosine_similarity(
                                        v.vec, c.cvec) + 1.0) * 1e15 + 0.5)
                                        AS BIGINT) DESC,
                                    c.cid
                       ) AS rn
                FROM v CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        cl AS MATERIALIZED (
            SELECT v.vec_id, a.cid, v.vec FROM v JOIN assign a USING (vec_id)
        ),
        drops AS (
            SELECT DISTINCT b.vec_id
            FROM cl a JOIN cl b ON a.cid = b.cid AND a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.vec, b.vec), 6)
                  >= {_SEMDEDUP_THRESHOLD}
        )
        SELECT cl.vec_id, cl.cid,
               cl.vec_id NOT IN (SELECT vec_id FROM drops) AS is_kept
        FROM cl
        ORDER BY cl.vec_id
    """,
)
def embedding_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for embedding-space dedup: where embedding_cosine_near_dups
    (the all-pairs baseline) is quadratic in the corpus, this is quadratic
    only within coarse clusters — the SemDeDup trick that makes semantic
    dedup feasible on web-scale corpora. Full per-vector value oracle
    (assignment + verdict), since every step is deterministic."""
    from data_algorithms_with_pyspark_spark.operators.dedup import semdedup_prune

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_prune(
        emb, _SEMDEDUP_THRESHOLD, n_clusters=_SEMDEDUP_CLUSTERS
    ).orderBy("vec_id")


@register(
    "doc_char_lm_scores",
    bench=True,
    tags=("text", "quality"),
    description="Per-doc cross-entropy under a corpus-trained character-"
    "bigram LM — the KenLM-perplexity quality-filter shape (CCNet, Wenzek "
    "et al. 2020) with integer micro-nat quantization for cross-engine "
    "bit-equality (operators/text.py:char_bigram_lm_scores)",
    oracle="""
        WITH g AS MATERIALIZED (
            SELECT doc_id,
                   unnest(list_transform(range(1, length(text)),
                                         i -> substr(text, i, 2))) AS bg
            FROM documents WHERE length(text) >= 2
        ),
        c AS MATERIALIZED (
            SELECT bg, CAST(count(*) AS BIGINT) AS n_bg FROM g GROUP BY bg
        ),
        t AS (SELECT CAST(sum(n_bg) AS BIGINT) AS n_total FROM c)
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               round(-CAST(sum(CAST(floor(
                          ln(CAST(c.n_bg AS DOUBLE) / t.n_total) * 1e6 + 0.5
                      ) AS BIGINT)) AS BIGINT)
                     / (count(*) * 1e6), 6) AS xent
        FROM g JOIN c USING (bg), t
        GROUP BY g.doc_id
    """,
)
def doc_char_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_algorithms_with_pyspark_spark.operators.text import (
        char_bigram_lm_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    return char_bigram_lm_scores(docs)


@register(
    "doc_length_quantile_filter",
    tags=("quality", "curation"),
    description="Quantile-band length filter: per-source kept/dropped counts "
    "against the global exact p10/p90 of n_chars — the percentile-threshold "
    "curation step (exact percentile here for oracle parity; "
    "approx_percentile is the drop-in at 100 TB, documented)",
    oracle="""
        WITH q AS (
            SELECT floor(quantile_cont(n_chars, 0.1) * 10000 + 0.5) / 10000 AS p10,
                   floor(quantile_cont(n_chars, 0.9) * 10000 + 0.5) / 10000 AS p90
            FROM documents
        )
        SELECT source, p10, p90,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_chars BETWEEN p10 AND p90
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        FROM documents, q
        GROUP BY source, p10, p90
        ORDER BY source
    """,
)
def doc_length_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, both the linear-interpolation definition) computed
    in one tiny global aggregate, broadcast back over the corpus, per-source
    keep counts in one shuffle. At 100 TB swap ``F.percentile`` for
    ``F.approx_percentile`` (t-digest, mergeable, no global sort) — the
    plan shape is identical; exact is used here so the DuckDB oracle can
    reproduce the thresholds to the bit."""
    from data_algorithms_with_pyspark_spark.operators.text import floor_round4

    docs = load_table(spark, sf_dir, "documents")
    # floor-grid rounding, not round(): an interpolated percentile can land
    # on an exact *.xxxx5 shortest repr where the engines' round() diverge
    # (the event_value_percentiles sf1 catch, round 8)
    q = docs.agg(
        floor_round4(F.percentile("n_chars", F.lit(0.1))).alias("p10"),
        floor_round4(F.percentile("n_chars", F.lit(0.9))).alias("p90"),
    )
    kept = F.when(
        F.col("n_chars").between(F.col("p10"), F.col("p90")), 1
    ).otherwise(0)
    return (
        docs.crossJoin(F.broadcast(q))
        .groupBy("source", "p10", "p90")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(kept).cast("long").alias("n_kept"),
        )
        .orderBy("source")
    )


# percentile_approx rank-error budget: Spark's Greenwald-Khanna summary
# guarantees rank error <= 1/accuracy; the audit allows 10x slack in
# per-mille units so the booleans are partition-order-independent facts.
_APPROX_PCT_ACCURACY = 10_000
_APPROX_PCT_TOL_PERMILLE = 1  # 0.001 rank tolerance (guarantee is 0.0001)


@register(
    "doc_length_quantile_approx_audit",
    tags=("quality", "curation", "sketch"),
    description="The documented 100 TB drop-in for the exact-percentile "
    "threshold step, ATTESTED: percentile_approx (Greenwald-Khanna, "
    f"accuracy={_APPROX_PCT_ACCURACY}) computes p10/p90 of n_chars and the "
    "query outputs exact integer rank-error audits of the sketch's answers "
    "— deterministic booleans (any value the guarantee permits passes), so "
    "the oracle is exact even though the sketch value itself may vary with "
    "partition order",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               TRUE AS p10_rank_ok,
               TRUE AS p90_rank_ok
        FROM documents
    """,
)
def doc_length_quantile_approx_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Attests the approx-percentile scale path next to its exact twin
    (doc_length_quantile_filter): ``percentile_approx`` is mergeable and
    never globally sorts — each task feeds a Greenwald-Khanna summary,
    partials merge associatively, and the rank-error guarantee
    (<= 1/accuracy) holds under ANY merge order. Because the returned
    VALUE may differ across partitionings (any value within the rank
    band is a correct answer), the query outputs not the value but the
    exact tie-robust rank audit: v is a valid eps-approximate
    q-quantile iff count(x < v) <= N*(q+eps) and count(x <= v) >=
    N*(q-eps). Both counts ride the same single corpus scan that
    computed the sketch thresholds (broadcast back as a 1-row relation),
    and the comparisons are integer per-mille arithmetic — no float
    rounding to diverge. The oracle pins the booleans TRUE: a sketch
    regression (or a wrong merge) flips a boolean and hash-fails."""
    docs = load_table(spark, sf_dir, "documents").select("n_chars")
    q = docs.agg(
        F.percentile_approx(
            "n_chars", [0.1, 0.9], _APPROX_PCT_ACCURACY
        ).alias("pa")
    ).select(
        F.col("pa")[0].alias("p10a"), F.col("pa")[1].alias("p90a")
    )
    tol = _APPROX_PCT_TOL_PERMILLE
    audit = (
        docs.crossJoin(F.broadcast(q))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("n_chars") < F.col("p10a"), 1).otherwise(0))
            .cast("long")
            .alias("below10"),
            F.sum(F.when(F.col("n_chars") <= F.col("p10a"), 1).otherwise(0))
            .cast("long")
            .alias("at10"),
            F.sum(F.when(F.col("n_chars") < F.col("p90a"), 1).otherwise(0))
            .cast("long")
            .alias("below90"),
            F.sum(F.when(F.col("n_chars") <= F.col("p90a"), 1).otherwise(0))
            .cast("long")
            .alias("at90"),
        )
    )
    n = F.col("n_docs")
    return audit.select(
        n.alias("n_docs"),
        (
            (F.col("below10") * 1000 <= n * (100 + tol))
            & (F.col("at10") * 1000 >= n * (100 - tol))
        ).alias("p10_rank_ok"),
        (
            (F.col("below90") * 1000 <= n * (900 + tol))
            & (F.col("at90") * 1000 >= n * (900 - tol))
        ).alias("p90_rank_ok"),
    )


_BOILER_N = 5
_BOILER_MIN_DOCS = 3


@register(
    "doc_boilerplate_ngrams",
    bench=True,
    tags=("text", "quality", "dedup"),
    description=f"Cross-document boilerplate: fraction of each doc's distinct "
    f"word {_BOILER_N}-grams recurring in >= {_BOILER_MIN_DOCS} docs — the "
    "corpus-level template/chrome signal within-doc repetition can't see "
    "(operators/text.py:boilerplate_ngram_coverage)",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        g AS MATERIALIZED (
            SELECT doc_id, unnest(list_distinct(list_transform(
                       range(1, len(t) - {_BOILER_N} + 2),
                       i -> array_to_string(
                                list_slice(t, i, i + {_BOILER_N} - 1), ' ')
                   ))) AS ng
            FROM toks WHERE len(t) >= {_BOILER_N}
        ),
        f AS (SELECT ng FROM g GROUP BY ng
              HAVING count(*) >= {_BOILER_MIN_DOCS})
        SELECT g.doc_id,
               CAST(count(*) AS BIGINT) AS n_ngrams,
               CAST(count(f.ng) AS BIGINT) AS n_boiler,
               floor(CAST(count(f.ng) AS DOUBLE) / count(*) * 10000 + 0.5)
                   / 10000 AS boiler_ratio
        FROM g LEFT JOIN f USING (ng)
        GROUP BY g.doc_id
    """,
)
def doc_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_algorithms_with_pyspark_spark.operators.text import (
        boilerplate_ngram_coverage,
    )

    docs = load_table(spark, sf_dir, "documents")
    return boilerplate_ngram_coverage(
        docs, n=_BOILER_N, min_docs=_BOILER_MIN_DOCS
    )


_CHUNK_TOKENS = 16
_CHUNK_STRIDE = 12


@register(
    "doc_sequence_chunks",
    bench=True,
    tags=("packing", "text"),
    description=f"Tokenize-and-chunk into {_CHUNK_TOKENS}-token windows, "
    f"stride {_CHUNK_STRIDE} — documents to model-ready overlapping training "
    "sequences, zero shuffles (operators/packing.py:sequence_chunks)",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, {_TOKENS} AS t FROM documents
            WHERE len({_TOKENS}) > 0
        ),
        s AS (
            SELECT doc_id, t,
                   unnest(range(1, len(t) + 1, {_CHUNK_STRIDE})) AS start
            FROM d
        )
        SELECT doc_id,
               CAST((start - 1) // {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
               CAST(len(list_slice(t, start, start + {_CHUNK_TOKENS} - 1))
                    AS BIGINT) AS n_chunk_tokens,
               array_to_string(list_slice(t, start, start + {_CHUNK_TOKENS} - 1),
                               ' ') AS chunk_text
        FROM s
    """,
)
def doc_sequence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_algorithms_with_pyspark_spark.operators.packing import (
        sequence_chunks,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sequence_chunks(
        docs, chunk_tokens=_CHUNK_TOKENS, stride=_CHUNK_STRIDE
    )


_NORMALIZED_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "incremental_dedup_new_docs",
    bench=True,
    tags=("dedup", "curation", "incremental"),
    description="Cross-snapshot incremental dedup: the daily-ingest shape — "
    "new batch (docs hashed into the 1/8 'arriving' slice) anti-joined on "
    "content fingerprint against the already-ingested history (the other "
    "7/8), then per-source admit/reject counts",
    oracle=f"""
        WITH fp AS (
            SELECT doc_id, source, md5({_NORMALIZED_SQL}) AS fingerprint,
                   doc_id % 8 = 0 AS is_new
            FROM documents
        ),
        hist AS (SELECT DISTINCT fingerprint FROM fp WHERE NOT is_new)
        SELECT f.source,
               CAST(count(*) AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN h.fingerprint IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_admitted
        FROM fp f LEFT JOIN hist h USING (fingerprint)
        WHERE f.is_new
        GROUP BY f.source
        ORDER BY f.source
    """,
)
def incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production ingestion dedups each incoming batch against the corpus
    it already holds — never re-clustering history. The anti-join on the
    md5 content fingerprint is one equi-join keyed by hash (at 100 TB the
    history side is a bucketed fingerprint index; the batch, being a day's
    crawl, is orders of magnitude smaller and streams past it). The
    new/history split here is a deterministic stand-in — plain
    ``doc_id % 8`` picks the 'arriving' slice, chosen over a hash because
    it is engine-identical, so the oracle replays the exact same split."""
    from data_algorithms_with_pyspark_spark.operators.text import fingerprint

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.join(fingerprint(docs), on="doc_id").select(
        "doc_id", "source", "fingerprint", (F.col("doc_id") % 8 == 0).alias("is_new")
    )
    hist = fp.where(~F.col("is_new")).select("fingerprint").distinct()
    new = fp.where(F.col("is_new"))
    admitted = new.join(hist, on="fingerprint", how="left_anti")
    return (
        new.groupBy("source")
        .agg(F.count("*").alias("n_new"))
        .join(
            admitted.groupBy("source").agg(F.count("*").alias("n_admitted")),
            on="source",
            how="left",
        )
        .select(
            "source",
            "n_new",
            F.coalesce("n_admitted", F.lit(0)).cast("long").alias("n_admitted"),
        )
        .orderBy("source")
    )


@register(
    "doc_pii_scrub_report",
    tags=("text", "quality", "curation"),
    description="PII detect-and-redact audit: per-source totals of email/"
    "phone/SSN/IPv4 hits plus docs-changed count — patterns restricted to "
    "the Java-regex/RE2 common subset so the redaction is oracle-checkable "
    "(operators/text.py:pii_scrub)",
    oracle=r"""
        WITH scrub AS (
            SELECT source,
                   len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS n_email,
                   len(regexp_extract_all(text,
                       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
                   len(regexp_extract_all(text,
                       '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS n_phone,
                   len(regexp_extract_all(text,
                       '\b\d{3}-\d{2}-\d{4}\b')) AS n_ssn
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_email) AS BIGINT) AS total_email,
               CAST(sum(n_ipv4) AS BIGINT) AS total_ipv4,
               CAST(sum(n_phone) AS BIGINT) AS total_phone,
               CAST(sum(n_ssn) AS BIGINT) AS total_ssn,
               CAST(sum(CASE WHEN n_email + n_ipv4 + n_phone + n_ssn > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_redacted
        FROM scrub
        GROUP BY source
        ORDER BY source
    """,
)
def doc_pii_scrub_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus is PII-free by construction, so every total is
    zero — which is exactly what the differential check verifies: both
    regex engines agree on every document (the planted-PII semantics are
    unit-tested in tests/test_curation_rules.py). One projection + one
    tiny per-source aggregate; the redaction itself never shuffles."""
    from data_algorithms_with_pyspark_spark.operators.text import pii_scrub

    docs = load_table(spark, sf_dir, "documents")
    scrubbed = docs.select("doc_id", "source").join(
        pii_scrub(docs), on="doc_id"
    )
    changed = (
        F.col("n_email") + F.col("n_ipv4") + F.col("n_phone") + F.col("n_ssn")
        > 0
    )
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_email").cast("long").alias("total_email"),
            F.sum("n_ipv4").cast("long").alias("total_ipv4"),
            F.sum("n_phone").cast("long").alias("total_phone"),
            F.sum("n_ssn").cast("long").alias("total_ssn"),
            F.sum(F.when(changed, 1).otherwise(0))
            .cast("long")
            .alias("n_docs_redacted"),
        )
        .orderBy("source")
    )


@register(
    "doc_repeated_segment_dedup",
    tags=("text", "dedup", "curation"),
    description="RefinedWeb-style repeated-segment removal: 5-token "
    "segments occurring in >=2 distinct docs are boilerplate and removed "
    "from every doc; docs rebuilt from kept segments in order "
    "(operators/dedup.py:repeated_segment_dedup). Full redacted-text "
    "value oracle.",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        base AS (
            SELECT doc_id, t, CAST(floor(len(t) / 5) AS BIGINT) AS nf
            FROM toks
        ),
        segs AS (
            SELECT doc_id, i - 1 AS segno,
                   array_to_string(t[(i-1)*5+1:i*5], ' ') AS seg,
                   false AS is_tail
            FROM base, LATERAL unnest(generate_series(1, nf)) AS u(i)
            UNION ALL
            SELECT doc_id, nf, array_to_string(t[nf*5+1:len(t)], ' '), true
            FROM base WHERE len(t) % 5 > 0
        ),
        freq AS (
            SELECT seg FROM segs WHERE NOT is_tail
            GROUP BY seg HAVING count(DISTINCT doc_id) >= 2
        ),
        marked AS (
            SELECT s.doc_id, s.segno, s.seg, s.is_tail,
                   (f.seg IS NOT NULL AND NOT s.is_tail) AS rm
            FROM segs s LEFT JOIN freq f USING (seg)
        )
        SELECT d.doc_id,
               CAST(coalesce(sum(CASE WHEN NOT m.is_tail THEN 1 END), 0)
                    AS BIGINT) AS n_segments,
               CAST(coalesce(sum(CASE WHEN m.rm THEN 1 END), 0)
                    AS BIGINT) AS n_removed,
               coalesce(string_agg(CASE WHEN NOT m.rm THEN m.seg END,
                                   ' ' ORDER BY m.segno), '') AS redacted
        FROM documents d LEFT JOIN marked m ON d.doc_id = m.doc_id
        GROUP BY d.doc_id
    """,
)
def doc_repeated_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level dedup adapted to 5-token segments (the corpus has no
    newlines); the tail (len % 5 tokens) is kept verbatim and never
    counted as boilerplate. The redacted text itself is oracle-compared,
    so both engines must agree on every byte of every rebuilt document —
    the strongest differential check in the dedup family."""
    from data_algorithms_with_pyspark_spark.operators.dedup import (
        repeated_segment_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    return repeated_segment_dedup(docs, k=5, min_docs=2)


@register(
    "term_posting_lists",
    tags=("text", "index"),
    description="Inverted-index build: per-term document frequency, total "
    "term frequency, and the first 20 postings (sorted doc ids) as a CSV "
    "string — the IR/search primitive over the corpus",
    oracle=f"""
        WITH tf AS (
            SELECT doc_id, unnest({_TOKENS}) AS term FROM documents
        )
        SELECT term,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
               CAST(count(*) AS BIGINT) AS tf,
               array_to_string(list_sort(list(DISTINCT doc_id))[1:20], ',')
                   AS postings_head
        FROM tf
        GROUP BY term
    """,
)
def term_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One explode + one hash aggregate on term — the classic inverted-
    index shuffle. Postings are capped at the first 20 sorted doc ids and
    serialized to CSV so the oracle comparison is string-typed (array
    hashing differs between engines' client layers). At 100 TB the
    full posting list per term does NOT belong in one row — this head
    plus df/tf is the manifest shape; the full index would be written
    sorted by (term, doc_id) via a range-clustered writer instead."""
    docs = load_table(spark, sf_dir, "documents")
    from data_algorithms_with_pyspark_spark.functions.text_functions import (
        words,
    )

    terms = docs.select("doc_id", F.explode(words("text")).alias("term"))
    return terms.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"),
        F.count("*").alias("tf"),
        F.array_join(
            F.slice(F.array_sort(F.collect_set("doc_id")), 1, 20), ","
        ).alias("postings_head"),
    )


# --- trained k-means (Lloyd's) with an unrolled value oracle ----------------

_KMEANS_K = 8
_KMEANS_ITERS = 2
_KMEANS_DIM = 64


def _kmeans_oracle() -> str:
    """Unroll exactly _KMEANS_ITERS Lloyd's iterations in DuckDB SQL with
    the SAME quantization the Spark operator applies (round to
    CENTROID_QUANT dp on init and on every recomputed mean), then emit the
    final per-vector assignment. Chained CTEs, no recursion — the
    iteration count is a shared literal, so both engines run the identical
    computation."""
    from data_algorithms_with_pyspark_spark.operators.clustering import (
        CENTROID_QUANT,
    )

    q = CENTROID_QUANT
    k, dim = _KMEANS_K, _KMEANS_DIM

    def assign(name: str, cents: str) -> str:
        # ordering key quantized to the SAME 1e15 grid the Spark packed
        # argmax uses (floor(x+0.5) == Spark's HALF_UP round for the
        # always-positive cos+1): two centroids within ~5e-16 of cosine
        # must tie in BOTH engines, else one flipped assignment diverges
        # every later Lloyd iteration
        return f"""
        {name} AS MATERIALIZED (
            SELECT vec_id, cid FROM (
                SELECT v.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY CAST(floor((list_cosine_similarity(
                                        v.vec, c.cvec) + 1.0) * 1e15 + 0.5)
                                        AS BIGINT) DESC,
                                    c.cid
                       ) AS rn
                FROM v CROSS JOIN {cents} c
            ) WHERE rn = 1
        )"""

    def recompute(name: str, assign_t: str, prev: str) -> str:
        return f"""
        {name} AS MATERIALIZED (
            SELECT p.cid, COALESCE(g.cvec, p.cvec) AS cvec
            FROM {prev} p LEFT JOIN (
                SELECT cid, list(m ORDER BY i) AS cvec FROM (
                    SELECT a.cid, d.i, round(avg(v.vec[d.i]), {q}) AS m
                    FROM v JOIN {assign_t} a USING (vec_id)
                    CROSS JOIN dims d
                    GROUP BY a.cid, d.i
                ) GROUP BY cid
            ) g USING (cid)
        )"""

    return f"""
        WITH v AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
        ),
        dims AS (SELECT unnest(range(1, {dim + 1})) AS i),
        c0 AS MATERIALIZED (
            SELECT vec_id::INT AS cid,
                   list_transform(vec, x -> round(x, {q})) AS cvec
            FROM v WHERE vec_id < {k}
        ),{assign("a1", "c0")},{recompute("c1", "a1", "c0")},
        {assign("a2", "c1")},{recompute("c2", "a2", "c1")},
        {assign("a3", "c2")}
        SELECT vec_id, cid FROM a3 ORDER BY vec_id
    """


@register(
    "embedding_kmeans_assign",
    bench=True,
    tags=("similarity", "clustering", "iterative"),
    description=f"Trained k-means (Lloyd's, k={_KMEANS_K}, "
    f"{_KMEANS_ITERS} iterations) over the embeddings corpus with a fully "
    "unrolled DuckDB value oracle — centroids quantized to a shared grid "
    "each round so both engines run the identical computation "
    "(operators/clustering.py)",
    oracle=_kmeans_oracle(),
)
def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The centroid TRAINER the IVF/SemDeDup operators anticipate: Lloyd's
    with broadcast-out/aggregate-back data motion (corpus never shuffles;
    driver state = k*dim doubles). tol=0 pins the iteration count to the
    oracle's unroll; a positive tol only stops early when an iteration is
    an exact no-op, which the unrolled SQL is invariant to."""
    from data_algorithms_with_pyspark_spark.operators.clustering import (
        assign_to_centroids,
        kmeans_train,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", to_double_array("embedding").alias("vec"))
    centroids = kmeans_train(
        vecs, _KMEANS_K, max_iter=_KMEANS_ITERS, tol=0.0, vec_col="vec"
    )
    return assign_to_centroids(vecs, centroids, _KMEANS_K).orderBy("vec_id")


# --- scale-safe global numbering and fixed-size group sampling -------------


@register(
    "documents_global_row_index",
    bench=True,
    tags=("ordering", "scale-pattern"),
    description="Contiguous 0-based global row numbers under a total order "
    "(source, doc_id) WITHOUT a single-partition window — range exchange + "
    "per-partition offsets + mono-id local index "
    "(operators/ordering.py:global_row_index)",
    oracle="""
        SELECT doc_id, source,
               ROW_NUMBER() OVER (ORDER BY source, doc_id) - 1 AS row_idx
        FROM documents
    """,
)
def documents_global_row_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-sample-id assignment every packing/sharding step needs.
    The naive row_number() over a global Window funnels the corpus through
    ONE task; this plan's only corpus-wide motion is the range exchange —
    counts collect one row per partition and the local index rides the
    monotonically_increasing_id low bits, all JVM-side."""
    from data_algorithms_with_pyspark_spark.operators.ordering import (
        global_row_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return global_row_index(docs, ["source", "doc_id"])


_GROUP_SAMPLE_K = 25


@register(
    "documents_per_source_sample",
    tags=("sampling", "scale-pattern"),
    description=f"Deterministic fixed-size per-group sample: exactly "
    f"min({_GROUP_SAMPLE_K}, |group|) docs per source by md5 rank — the "
    "reproducible reservoir replacement; rank filter plans as "
    "WindowGroupLimit (operators/sampling.py:group_hash_topk)",
    oracle=f"""
        SELECT doc_id, source, n_chars FROM (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= {_GROUP_SAMPLE_K}
    """,
)
def documents_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap-every-source-at-k corpus mixing. Unlike rate-based sampling
    (documents_hash_sample) the output size is exact per group; unlike
    df.sample it is identical on every run/cluster/engine."""
    from data_algorithms_with_pyspark_spark.operators.sampling import (
        group_hash_topk,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return group_hash_topk(docs, "source", "doc_id", _GROUP_SAMPLE_K)


@register(
    "incremental_near_dup_candidates",
    bench=True,
    tags=("dedup", "incremental", "lsh"),
    description="Cross-snapshot NEAR-dup: the daily increment's MinHash "
    "bands equi-join the history's banded index only — history x history "
    "pairs never form (md5-derived hashes -> full value oracle)",
    oracle=incremental_minhash_sql(min_jaccard=0.3, modulus=8),
)
def incremental_near_dup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where incremental_dedup_new_docs anti-joins EXACT fingerprints,
    this catches near-misses: signatures for the whole corpus computed in
    one shingle pass (persisted — the sketch, not the corpus), split into
    increment (doc_id % 8 == 0) and history, then banded-join across the
    split only. At 100 TB the history bands are a stored index; the join
    cost tracks the increment size, not the corpus."""
    from data_algorithms_with_pyspark_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(
        docs, num_perm=64, shingle_n=3, hash_fn="md5"
    ).persist()
    new_sigs = sigs.where(F.col("doc_id") % 8 == 0)
    hist_sigs = sigs.where(F.col("doc_id") % 8 != 0)
    return incremental_minhash_candidates(
        new_sigs, hist_sigs, bands=16, min_jaccard=0.3, hash_fn="md5"
    )


@register(
    "incremental_near_dup_persisted_index",
    bench=True,
    tags=("dedup", "incremental", "lsh", "bucketed"),
    description="Incremental near-dup against a PERSISTED band index: the "
    "history's (doc_id, band, band_hash) rows are written once as a table "
    "bucketed on band_hash, so the daily join re-bands only the increment "
    "and the history side scans with NO Exchange — the production shape "
    "incremental_near_dup_candidates's docstring promises",
    oracle=incremental_minhash_sql(min_jaccard=0.3, modulus=8),
)
def incremental_near_dup_persisted_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Same result as incremental_near_dup_candidates (identical oracle),
    different physical plan: BOTH history artifacts — the band index AND
    the signatures — are bucketed tables written once per corpus
    snapshot (pay-once shuffle at write time), built here only if this
    session has not built them for this sf_dir yet. A daily run then
    shingles and min-hashes the INCREMENT ONLY (r3 profiling showed
    history signature computation dominating the banded join it was
    meant to save — VERDICT r3 #3); the banded equi-join exchanges the
    increment side only, and the persisted history signatures join back
    (bucketed on doc_id: no history-side exchange there either) solely
    to estimate Jaccard on surviving pairs."""
    import hashlib

    from data_algorithms_with_pyspark_spark.operators.dedup import (
        incremental_minhash_candidates,
        minhash_bands,
        minhash_signatures,
    )
    from data_algorithms_with_pyspark_spark.sources.writers import (
        write_bucketed_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    # index names keyed by sf_dir: tests drive several SFs through ONE
    # session, and a stale index for another corpus must never be reused
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    sig_tbl = f"hist_sig_idx_{key}"
    idx = f"hist_band_idx_{key}"
    if not spark.catalog.tableExists(sig_tbl):
        hist_sigs_fresh = minhash_signatures(
            docs.where(F.col("doc_id") % 8 != 0),
            num_perm=64,
            shingle_n=3,
            hash_fn="md5",
        )
        # repartition on the bucket key first: without it every write task
        # emits a file per bucket (tasks x buckets tiny files); with it
        # each of the 16 tasks owns exactly one bucket's rows
        write_bucketed_table(
            hist_sigs_fresh.repartition(16, F.col("doc_id")),
            sig_tbl,
            bucket_cols=("doc_id",),
            num_buckets=16,
            sort_cols=("doc_id",),
        )
    hist_sigs = spark.table(sig_tbl)
    if not spark.catalog.tableExists(idx):
        write_bucketed_table(
            minhash_bands(hist_sigs, 16, hash_fn="md5").repartition(
                16, F.col("band_hash")
            ),
            idx,
            bucket_cols=("band_hash",),
            num_buckets=16,
            sort_cols=("band_hash",),
        )
    # persisted: the increment signatures feed BOTH the banding and the
    # Jaccard join-back — without this the 1/8 increment is shingled and
    # min-hashed twice per run (the history side never recomputes at all)
    new_sigs = minhash_signatures(
        docs.where(F.col("doc_id") % 8 == 0),
        num_perm=64,
        shingle_n=3,
        hash_fn="md5",
    ).persist()
    return incremental_minhash_candidates(
        new_sigs,
        hist_sigs,
        bands=16,
        min_jaccard=0.3,
        hash_fn="md5",
        hist_bands=spark.table(idx),
    )


# --- tokenizer-training prep, leakage-safe split, count-min sketch ----------


@register(
    "bpe_pair_counts",
    tags=("text", "tokenizer"),
    description="BPE training round-1: adjacent symbol-pair counts weighted "
    "by word frequency — pairs enumerate over DISTINCT words only (the "
    "classic count-words-first optimization), so pair-explosion cost tracks "
    "vocabulary size, not corpus size",
    oracle=f"""
        WITH w AS (SELECT unnest({_TOKENS}) AS term FROM documents),
        wc AS (SELECT term, count(*) AS n FROM w GROUP BY term),
        p AS (
            SELECT unnest(list_transform(range(1, length(term)),
                                         i -> substr(term, i, 2))) AS pair,
                   n
            FROM wc WHERE length(term) >= 2
        )
        SELECT pair, CAST(sum(n) AS BIGINT) AS pair_count
        FROM p GROUP BY pair
        ORDER BY pair_count DESC, pair LIMIT 50
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner loop of byte-pair-encoding vocabulary training. Corpus
    tokens hash-aggregate to (word, freq) FIRST; character pairs then
    explode over the distinct vocabulary weighted by freq — at 100 TB the
    second aggregate's input is |vocab| * avg_word_len rows, orders of
    magnitude below corpus token count. Word of length 1 contributes no
    pair (sequence() would count DOWN without the guard)."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .where(F.length("term") >= 2)
    )
    pairs = wc.select(
        "n",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("term") - 1),
                lambda i: F.col("term").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(50)
    )


def _bpe_oracle_cte(n_merges: int) -> str:
    """Shared WITH-chain replaying ``operators/bpe.bpe_train`` in DuckDB.

    Words are wrapped one symbol at a time ('cat' -> '|c||a||t|'), so a
    merge of (a, b) is the non-overlapping left-to-right string
    replacement of '|a||b|' by '|ab|' — ``replace()``'s exact semantics,
    and exactly the greedy fold the Spark side runs (each symbol carries
    its own delimiters, so adjacent merges never share a separator).
    One (p, b, w) stage triple per merge round; b{{k}} is the round's
    winning pair under the identical (count DESC, pair ASC) total order.
    Every CTE is MATERIALIZED: w{{k}} references b{{k}} three times, and
    with default CTE inlining the chain re-expands ~3^k copies of the
    whole replay (observed: minutes instead of seconds at sf0.01).
    """
    stages = [
        f"""w0 AS MATERIALIZED (
            SELECT term, n, regexp_replace(term, '(.)', '|\\1|', 'g') AS s
            FROM (
                SELECT term, CAST(count(*) AS BIGINT) AS n
                FROM (SELECT unnest({_TOKENS}) AS term FROM documents)
                GROUP BY term
            ) WHERE regexp_matches(term, '^[a-z]+$')
        )"""
    ]
    for k in range(1, n_merges + 1):
        prev = k - 1
        stages.append(
            f"""p{k} AS MATERIALIZED (
            SELECT pr, CAST(sum(n) AS BIGINT) AS cnt
            FROM (
                SELECT n, unnest(list_transform(
                           range(1, len(l)),
                           i -> l[i] || ' ' || l[i + 1])) AS pr
                FROM (SELECT n, string_split(
                                 substr(s, 2, length(s) - 2), '||') AS l
                      FROM w{prev})
            ) GROUP BY pr
        ),
        b{k} AS MATERIALIZED (
            SELECT pr, cnt FROM p{k} ORDER BY cnt DESC, pr LIMIT 1
        ),
        w{k} AS MATERIALIZED (
            SELECT term, n,
                   replace(s,
                           '|' || split_part((SELECT pr FROM b{k}), ' ', 1)
                               || '||'
                               || split_part((SELECT pr FROM b{k}), ' ', 2)
                               || '|',
                           '|' || replace((SELECT pr FROM b{k}), ' ', '')
                               || '|') AS s
            FROM w{prev}
        )"""
        )
    return "WITH " + ",\n".join(stages)


_BPE_MERGES = 6


def _bpe_merges_sql(n_merges: int) -> str:
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS merge_idx, pr AS pair, "
        f"cnt AS pair_count FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return f"{_bpe_oracle_cte(n_merges)}\n{rows}"


def _bpe_segmentation_sql(n_merges: int, top_n: int) -> str:
    return f"""{_bpe_oracle_cte(n_merges)}
        SELECT term, n,
               CAST(len(string_split(substr(s, 2, length(s) - 2), '||'))
                    AS INT) AS n_tokens,
               array_to_string(
                   string_split(substr(s, 2, length(s) - 2), '||'),
                   ' ') AS tokens
        FROM w{n_merges}
        ORDER BY n DESC, term LIMIT {top_n}
    """


@register(
    "bpe_learned_merges",
    bench=True,
    tags=("text", "tokenizer", "iterative"),
    description=f"Full BPE vocabulary training, {_BPE_MERGES} merge rounds "
    "(operators/bpe.py): corpus collapses once to (word, freq); each round "
    "is a vocab-sized pair count + one-row argmax to the driver + a greedy "
    "Catalyst fold rewrite; the oracle replays every round via "
    "non-overlapping string replacement",
    oracle=_bpe_merges_sql(_BPE_MERGES),
)
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenizer-training artifact itself: the learned merge table, in
    order. Driver state is n_merges rows — what BPE training exists to
    produce; the corpus-scale work happened once in the word count."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.bpe import (
        bpe_train,
        char_vocab,
    )

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    merges, _ = bpe_train(char_vocab(wc), n_merges=_BPE_MERGES)
    return spark.createDataFrame(
        [(k, f"{left} {right}", cnt) for k, left, right, cnt in merges],
        schema="merge_idx int, pair string, pair_count bigint",
    )


@register(
    "bpe_vocab_segmentation",
    tags=("text", "tokenizer", "iterative"),
    description="Segmentations produced by the trained BPE tokenizer: the "
    f"{_BPE_MERGES}-merge vocabulary's top-50 words by frequency with their "
    "merged symbol sequences — train + apply, value-verified end to end",
    oracle=_bpe_segmentation_sql(_BPE_MERGES, top_n=50),
)
def bpe_vocab_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the trained tokenizer DOES to words: train the same
    6-merge BPE, keep the vocabulary with all merges applied, and report
    the 50 most frequent words' symbol sequences. (term, n) is a total
    order — term is unique — so the LIMIT is deterministic."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.bpe import (
        bpe_train,
        char_vocab,
    )

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    _, vocab = bpe_train(char_vocab(wc), n_merges=_BPE_MERGES)
    return (
        vocab.orderBy(F.col("n").desc(), "term")
        .limit(50)
        .select(
            "term",
            "n",
            F.size("syms").alias("n_tokens"),
            F.concat_ws(" ", "syms").alias("tokens"),
        )
    )


_UNIGRAM_ITERS = 2
_UNIGRAM_TOP_MULTI = 40
_UNIGRAM_WORD_MAX = 12  # operators/unigram.WORD_MAX_LEN — DP unroll bound
_UNIGRAM_PIECE_MAX = 4  # operators/unigram.PIECE_MAX_LEN


def _unigram_dp_sql(tag: str, cost_cte: str) -> str:
    """One unrolled Viterbi DP block over the u0 word vocabulary under the
    ``cost_cte`` piece-cost table — the SQL replay of
    ``operators/unigram.viterbi_expr``. Stage i holds the best
    (cost, seg) struct for every word prefix of length i; the
    row_number() tie order (cost, seg byte order) is the identical total
    order the Spark fold's struct ``least`` minimizes. MATERIALIZED for
    the same reason as the BPE replay: each stage is referenced by the
    next two, and default inlining re-expands the chain exponentially."""
    stages = [
        f"""a{tag}0 AS MATERIALIZED (
            SELECT term, n, 0 AS i, CAST(0 AS BIGINT) AS cost, '' AS seg
            FROM u0
        )"""
    ]
    for i in range(1, _UNIGRAM_WORD_MAX + 1):
        stages.append(
            f"""x{tag}{i} AS MATERIALIZED (
            SELECT term, n, cost, seg FROM (
                SELECT term, n, cost, seg,
                       row_number() OVER (
                           PARTITION BY term ORDER BY cost, seg) AS rn
                FROM (
                    SELECT d.term, d.n, d.cost + v.cost AS cost,
                           CASE WHEN d.i = 0 THEN v.piece
                                ELSE d.seg || ' ' || v.piece END AS seg
                    FROM a{tag}{i - 1} d
                    JOIN {cost_cte} v
                      ON {i} - d.i BETWEEN 1 AND {_UNIGRAM_PIECE_MAX}
                     AND v.piece = substr(d.term, d.i + 1, {i} - d.i)
                    WHERE length(d.term) >= {i}
                )
            ) WHERE rn = 1
        ),
        a{tag}{i} AS MATERIALIZED (
            SELECT term, n, i, cost, seg FROM a{tag}{i - 1}
            UNION ALL
            SELECT term, n, {i} AS i, cost, seg FROM x{tag}{i}
        )"""
        )
    stages.append(
        f"""seg{tag} AS MATERIALIZED (
            SELECT term, n, cost, seg FROM a{tag}{_UNIGRAM_WORD_MAX}
            WHERE i = length(term)
        )"""
    )
    return ",\n".join(stages)


def _unigram_oracle_cte(iters: int) -> str:
    """Shared WITH-chain replaying ``operators/unigram.unigram_train``:
    word vocabulary -> substring candidate seeding (all single chars +
    top-K multi-char by count DESC, piece ASC) -> ``iters`` hard-EM
    rounds, each an unrolled Viterbi DP + usage re-count with Laplace
    add-1 smoothing + prune of unused multi-char pieces. Costs are
    integer micro-nats floor(1e6 * ln(T/c)) with T converted to DOUBLE
    before the division, exactly as the Python trainer computes them."""
    stages = [
        f"""u0 AS MATERIALIZED (
            SELECT term, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest({_TOKENS}) AS term FROM documents)
            WHERE regexp_matches(term, '^[a-z]+$')
              AND length(term) <= {_UNIGRAM_WORD_MAX}
            GROUP BY term
        ),
        s0 AS MATERIALIZED (
            SELECT piece, CAST(sum(n) AS BIGINT) AS cnt
            FROM (
                SELECT u.n, substr(u.term, st.st, pl.pl) AS piece
                FROM u0 u
                JOIN (SELECT unnest(range(1, {_UNIGRAM_WORD_MAX + 1}))
                          AS st) st
                  ON st.st <= length(u.term)
                JOIN (SELECT unnest(range(1, {_UNIGRAM_PIECE_MAX + 1}))
                          AS pl) pl
                  ON st.st + pl.pl <= length(u.term) + 1
            ) GROUP BY piece
        ),
        v0 AS MATERIALIZED (
            SELECT piece, cnt FROM s0 WHERE length(piece) = 1
            UNION ALL
            SELECT piece, cnt FROM (
                SELECT piece, cnt FROM s0 WHERE length(piece) > 1
                ORDER BY cnt DESC, piece LIMIT {_UNIGRAM_TOP_MULTI}
            )
        ),
        c0 AS MATERIALIZED (
            SELECT piece, cnt,
                   CAST(floor(1000000.0 * ln(
                       CAST((SELECT sum(cnt) FROM v0) AS DOUBLE) / cnt))
                       AS BIGINT) AS cost
            FROM v0
        )"""
    ]
    for it in range(1, iters + 1):
        stages.append(_unigram_dp_sql(f"e{it}_", f"c{it - 1}"))
        stages.append(
            f"""k{it} AS MATERIALIZED (
            SELECT piece, CAST(sum(n) AS BIGINT) AS used
            FROM (SELECT n, unnest(string_split(seg, ' ')) AS piece
                  FROM sege{it}_)
            GROUP BY piece
        ),
        v{it} AS MATERIALIZED (
            SELECT c.piece, coalesce(k.used, 0) + 1 AS cnt
            FROM c{it - 1} c LEFT JOIN k{it} k ON c.piece = k.piece
            WHERE length(c.piece) = 1 OR coalesce(k.used, 0) > 0
        ),
        c{it} AS MATERIALIZED (
            SELECT piece, CAST(cnt AS BIGINT) AS cnt,
                   CAST(floor(1000000.0 * ln(
                       CAST((SELECT sum(cnt) FROM v{it}) AS DOUBLE) / cnt))
                       AS BIGINT) AS cost
            FROM v{it}
        )"""
        )
    return "WITH " + ",\n".join(stages)


def _unigram_vocab_sql(iters: int) -> str:
    return f"""{_unigram_oracle_cte(iters)}
        SELECT piece, cnt, cost AS cost_micro FROM c{iters}
        ORDER BY cost, piece
    """


def _unigram_segmentation_sql(iters: int, top_n: int) -> str:
    return f"""{_unigram_oracle_cte(iters)},
        {_unigram_dp_sql("f_", f"c{iters}")}
        SELECT term, n,
               CAST(len(string_split(seg, ' ')) AS INT) AS n_pieces,
               cost AS cost_micro, seg AS pieces
        FROM segf_ ORDER BY n DESC, term LIMIT {top_n}
    """


@register(
    "unigram_lm_vocab",
    bench=True,
    tags=("text", "tokenizer", "iterative"),
    description=f"Unigram-LM (SentencePiece-style) tokenizer training, "
    f"{_UNIGRAM_ITERS} hard-EM rounds (operators/unigram.py): substring "
    "candidate seeding + per-round Viterbi segmentation (Catalyst fold) "
    "with integer micro-nat costs, usage re-count, add-1 smoothing, and "
    "pruning of unused pieces; the oracle replays every round with an "
    "unrolled DP",
    oracle=_unigram_vocab_sql(_UNIGRAM_ITERS),
)
def unigram_lm_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained artifact itself: the final piece inventory with the
    smoothed counts and micro-nat costs of the last re-estimation.
    Driver state is the inventory (|chars| + surviving multi-char
    pieces); the corpus-scale work happened once in the word count."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.unigram import (
        unigram_train,
        word_vocab,
    )

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    pieces = unigram_train(
        word_vocab(wc), iters=_UNIGRAM_ITERS, top_multi=_UNIGRAM_TOP_MULTI
    )
    return spark.createDataFrame(
        [(p, c, cost) for p, c, cost in pieces],
        schema="piece string, cnt bigint, cost_micro bigint",
    ).orderBy("cost_micro", "piece")


@register(
    "unigram_lm_segmentation",
    tags=("text", "tokenizer", "iterative"),
    description="Segmentations produced by the trained unigram-LM "
    f"tokenizer: the {_UNIGRAM_ITERS}-round inventory applied to the "
    "word vocabulary via min-cost Viterbi decoding — train + apply, "
    "value-verified end to end down to every piece boundary and the "
    "exact integer path cost",
    oracle=_unigram_segmentation_sql(_UNIGRAM_ITERS, top_n=50),
)
def unigram_lm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the trained tokenizer DOES to words: train the same
    unigram LM, Viterbi-decode the 50 most frequent words under the
    final costs, and report piece counts, path costs, and the pieces
    themselves. (n DESC, term) is a total order — term is unique — so
    the LIMIT is deterministic."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.unigram import (
        unigram_segment,
        unigram_train,
        word_vocab,
    )

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    vocab = word_vocab(wc)
    pieces = unigram_train(
        vocab, iters=_UNIGRAM_ITERS, top_multi=_UNIGRAM_TOP_MULTI
    )
    seg = unigram_segment(vocab, pieces)
    return (
        seg.orderBy(F.col("n").desc(), "term")
        .limit(50)
        .select(
            "term",
            "n",
            F.size(F.split(F.col("v.seg"), " ")).alias("n_pieces"),
            F.col("v.cost").alias("cost_micro"),
            F.col("v.seg").alias("pieces"),
        )
    )


@register(
    "unigram_corpus_compression",
    tags=("text", "tokenizer", "iterative"),
    description="The tokenizer-evaluation metric a training pipeline "
    "actually tracks: per-source corpus compression under the trained "
    "unigram LM — covered/uncovered word counts, total pieces, and the "
    "pieces-per-word / chars-per-piece ratios (floor-grid 6dp); the "
    "vocab-sized segmentation table broadcast-joins the corpus tokens",
    oracle=f"""{_unigram_oracle_cte(_UNIGRAM_ITERS)},
        {_unigram_dp_sql("f_", f"c{_UNIGRAM_ITERS}")},
        pieces_per_term AS MATERIALIZED (
            SELECT term,
                   CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_pieces
            FROM segf_
        ),
        tok AS (
            SELECT source, unnest({_TOKENS}) AS term FROM documents
        )
        SELECT source,
               CAST(count(p.term) AS BIGINT) AS n_words,
               CAST(count(*) - count(p.term) AS BIGINT) AS n_uncovered,
               CAST(coalesce(sum(p.n_pieces), 0) AS BIGINT) AS n_pieces,
               floor(CAST(coalesce(sum(p.n_pieces), 0) AS DOUBLE)
                     / count(p.term) * 1000000.0 + 0.5) / 1000000.0
                   AS pieces_per_word,
               floor(CAST(coalesce(sum(CASE WHEN p.term IS NOT NULL
                                   THEN length(t.term) END), 0) AS DOUBLE)
                     / coalesce(sum(p.n_pieces), 0) * 1000000.0 + 0.5)
                   / 1000000.0 AS chars_per_piece
        FROM tok t LEFT JOIN pieces_per_term p ON t.term = p.term
        GROUP BY source ORDER BY source
    """,
)
def unigram_corpus_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the unigram LM, then measure what it buys on the corpus:
    words are decoded via the vocab-sized segmentation table (every
    distinct word decoded ONCE, then broadcast to the corpus-scale token
    stream — at 100 TB the corpus is ~10^13 tokens but the decode table
    is vocab-sized, so the per-token work is one broadcast-hash probe).
    Words the trainer excluded (non-[a-z], overlong) count as uncovered.
    Ratio columns are rational means -> floor-grid 6dp on both sides."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.dedup import floor_round
    from data_algorithms_with_pyspark_spark.operators.unigram import (
        unigram_segment,
        unigram_train,
        word_vocab,
    )

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(words("text")).alias("term")
    )
    wc = tok.groupBy("term").agg(F.count("*").alias("n"))
    vocab = word_vocab(wc)
    pieces = unigram_train(
        vocab, iters=_UNIGRAM_ITERS, top_multi=_UNIGRAM_TOP_MULTI
    )
    per_term = unigram_segment(vocab, pieces).select(
        "term",
        F.size(F.split(F.col("v.seg"), " ")).cast("long").alias("n_pieces"),
    )
    joined = tok.join(F.broadcast(per_term), "term", "left")
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.col("n_pieces")).alias("n_words"),
            (F.count("*") - F.count(F.col("n_pieces"))).alias("n_uncovered"),
            F.coalesce(F.sum("n_pieces"), F.lit(0)).alias("n_pieces"),
            floor_round(
                F.coalesce(F.sum("n_pieces"), F.lit(0)).cast("double")
                / F.count(F.col("n_pieces")),
                6,
            ).alias("pieces_per_word"),
            floor_round(
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("n_pieces").isNotNull(), F.length("term")
                        )
                    ),
                    F.lit(0),
                ).cast("double")
                / F.coalesce(F.sum("n_pieces"), F.lit(0)),
                6,
            ).alias("chars_per_piece"),
        )
        .orderBy("source")
    )


@register(
    "unigram_persisted_tokenizer_encode",
    tags=("text", "tokenizer", "incremental"),
    description="Day-2 tokenizer reuse: the trained unigram-LM inventory "
    "is PERSISTED as a table (train cost paid at most once per corpus "
    "fingerprint) and a new-arrivals slice (doc_id % 10 = 0) is encoded "
    "from the persisted artifact without retraining — per-doc covered/"
    "uncovered word and piece counts; oracle replays train + apply",
    oracle=f"""{_unigram_oracle_cte(_UNIGRAM_ITERS)},
        {_unigram_dp_sql("f_", f"c{_UNIGRAM_ITERS}")},
        ppt AS MATERIALIZED (
            SELECT term,
                   CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_pieces
            FROM segf_
        ),
        tok2 AS (
            SELECT doc_id, unnest({_TOKENS}) AS term
            FROM documents WHERE doc_id % 10 = 0
        )
        SELECT doc_id,
               CAST(count(p.term) AS BIGINT) AS n_words,
               CAST(count(*) - count(p.term) AS BIGINT) AS n_uncovered,
               CAST(coalesce(sum(p.n_pieces), 0) AS BIGINT) AS n_pieces
        FROM tok2 t LEFT JOIN ppt p ON t.term = p.term
        GROUP BY doc_id ORDER BY doc_id
    """,
)
def unigram_persisted_tokenizer_encode(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The day-2 production shape of the tokenizer lane (the same
    pay-once pattern as ivf_pq_ann_persisted_index): training runs at
    most once per (session, corpus fingerprint) and lands the piece
    inventory in a table; the encode path READS the artifact (a bounded
    collect — the inventory IS the artifact), Viterbi-decodes only the
    slice's distinct words, and broadcast-probes the slice's token
    stream. At 100 TB day-2 encode therefore never touches the training
    corpus. Slice words the trainer's filters exclude count as
    uncovered, exactly as in unigram_corpus_compression."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.unigram import (
        unigram_segment,
        unigram_train,
        word_vocab,
    )
    from data_algorithms_with_pyspark_spark.sources.readers import (
        table_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents")
    tbl = f"unigram_vocab_{table_fingerprint(sf_dir, 'documents')}"
    if not spark.catalog.tableExists(tbl):
        wc = (
            docs.select(F.explode(words("text")).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("n"))
        )
        trained = unigram_train(
            word_vocab(wc),
            iters=_UNIGRAM_ITERS,
            top_multi=_UNIGRAM_TOP_MULTI,
        )
        from data_algorithms_with_pyspark_spark.sources.writers import (
            _clear_orphaned_location,
        )

        # A fresh process has an empty in-memory catalog but the prior
        # process's warehouse directory may survive — overwrite + orphan
        # clearing, the same contract as write_partitioned_table.
        _clear_orphaned_location(spark, tbl)
        spark.createDataFrame(
            [(p, c, cost) for p, c, cost in trained],
            schema="piece string, cnt bigint, cost_micro bigint",
        ).coalesce(1).write.mode("overwrite").saveAsTable(tbl)
    pieces = [
        (r["piece"], int(r["cnt"]), int(r["cost_micro"]))
        for r in spark.table(tbl).collect()
    ]
    tok = docs.where(F.col("doc_id") % 10 == 0).select(
        "doc_id", F.explode(words("text")).alias("term")
    )
    day2_words = word_vocab(
        tok.groupBy("term").agg(F.count("*").alias("n"))
    )
    per_term = unigram_segment(day2_words, pieces).select(
        "term",
        F.size(F.split(F.col("v.seg"), " ")).cast("long").alias("n_pieces"),
    )
    joined = tok.join(F.broadcast(per_term), "term", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.col("n_pieces")).alias("n_words"),
            (F.count("*") - F.count(F.col("n_pieces"))).alias("n_uncovered"),
            F.coalesce(F.sum("n_pieces"), F.lit(0)).alias("n_pieces"),
        )
        .orderBy("doc_id")
    )


_WORDPIECE_MERGES = 6
_WORDPIECE_WORD_MAX = 12  # operators/unigram.WORD_MAX_LEN — greedy unroll bound
_WORDPIECE_SCORE_SCALE = 1_000_000_000_000  # operators/wordpiece.SCORE_SCALE


def _wp_merged_sql(pr: str) -> str:
    """Merged-token expression for a 'left right' pair string: left
    concatenated with the right symbol stripped of its ``##`` prefix —
    the identical rule ``wordpiece_train`` applies in Python."""
    right = f"split_part({pr}, ' ', 2)"
    return (
        f"split_part({pr}, ' ', 1) || "
        f"(CASE WHEN starts_with({right}, '##') THEN substr({right}, 3) "
        f"ELSE {right} END)"
    )


def _wordpiece_oracle_cte(n_merges: int) -> str:
    """Shared WITH-chain replaying ``operators/wordpiece.wordpiece_train``
    in DuckDB: words wrapped one ##-marked symbol at a time ('cat' ->
    '|c||##a||##t|'), one (pair-count, symbol-count, best, rewrite) stage
    quadruple per merge round. The round winner maximizes the integer-
    grid likelihood score floor(CAST(p AS DOUBLE) / CAST(l*r AS DOUBLE)
    * 1e12) with ties on the pair string ascending — the identical IEEE
    cast/divide/multiply sequence the Spark trainer evaluates. Every CTE
    is MATERIALIZED for the same inlining-blowup reason as the BPE
    replay (w{k} references b{k} several times)."""
    stages = [
        f"""wpu AS MATERIALIZED (
            SELECT term, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest({_TOKENS}) AS term FROM documents)
            WHERE regexp_matches(term, '^[a-z]+$')
              AND length(term) <= {_WORDPIECE_WORD_MAX}
            GROUP BY term
        ),
        wp0 AS MATERIALIZED (
            SELECT term, n,
                   '|' || array_to_string(
                       list_transform(
                           range(1, length(term) + 1),
                           i -> CASE WHEN i = 1 THEN substr(term, i, 1)
                                ELSE '##' || substr(term, i, 1) END),
                       '||') || '|' AS s
            FROM wpu
        )"""
    ]
    for k in range(1, n_merges + 1):
        prev = k - 1
        stages.append(
            f"""wl{k} AS MATERIALIZED (
            SELECT n, string_split(substr(s, 2, length(s) - 2), '||') AS l
            FROM wp{prev}
        ),
        pp{k} AS MATERIALIZED (
            SELECT pr, CAST(sum(n) AS BIGINT) AS cnt
            FROM (
                SELECT n, unnest(list_transform(
                           range(1, len(l)),
                           i -> l[i] || ' ' || l[i + 1])) AS pr
                FROM wl{k}
            ) GROUP BY pr
        ),
        yy{k} AS MATERIALIZED (
            SELECT sym, CAST(sum(n) AS BIGINT) AS sc
            FROM (SELECT n, unnest(l) AS sym FROM wl{k})
            GROUP BY sym
        ),
        b{k} AS MATERIALIZED (
            SELECT pr, cnt, score_q FROM (
                SELECT p.pr, p.cnt,
                       CAST(floor(CAST(p.cnt AS DOUBLE)
                                  / CAST(l.sc * r.sc AS DOUBLE)
                                  * {_WORDPIECE_SCORE_SCALE}.0)
                            AS BIGINT) AS score_q
                FROM pp{k} p
                JOIN yy{k} l ON l.sym = split_part(p.pr, ' ', 1)
                JOIN yy{k} r ON r.sym = split_part(p.pr, ' ', 2)
            ) ORDER BY score_q DESC, pr LIMIT 1
        ),
        wp{k} AS MATERIALIZED (
            SELECT term, n,
                   replace(s,
                           '|' || split_part((SELECT pr FROM b{k}), ' ', 1)
                               || '||'
                               || split_part((SELECT pr FROM b{k}), ' ', 2)
                               || '|',
                           '|' || {_wp_merged_sql(f"(SELECT pr FROM b{k})")}
                               || '|') AS s
            FROM wp{prev}
        )"""
        )
    return "WITH " + ",\n".join(stages)


def _wordpiece_merges_sql(n_merges: int) -> str:
    rows = "\nUNION ALL ".join(
        f"SELECT CAST({k} AS INT) AS merge_idx, pr AS pair, "
        f"cnt AS pair_count, score_q FROM b{k}"
        for k in range(1, n_merges + 1)
    )
    return f"{_wordpiece_oracle_cte(n_merges)}\n{rows}"


def _wordpiece_greedy_stages(n_merges: int) -> str:
    """The apply-time vocabulary (initial alphabet UNION the merged
    tokens — real WordPiece's vocab shape) + one unrolled greedy
    longest-match-first stage per character position: each stage
    advances every unfinished word by the LONGEST vocabulary piece
    matching at its cursor (row_number over piece length DESC — maximal
    munch), finished words pass through. The replay of
    ``operators/wordpiece.greedy_segment_expr``; appended to
    ``_wordpiece_oracle_cte``'s chain (terminal relation:
    g{_WORDPIECE_WORD_MAX}, finished rows have pos = length+1)."""
    max_pl = n_merges + 1  # a token built by k merges spans <= k+1 chars
    merged_rows = "\nUNION ".join(
        f"SELECT {_wp_merged_sql(f'(SELECT pr FROM b{k})')} AS piece"
        for k in range(1, n_merges + 1)
    )
    stages = [
        f"""wpv AS MATERIALIZED (
            SELECT DISTINCT sym AS piece
            FROM (SELECT unnest(string_split(substr(s, 2, length(s) - 2),
                                             '||')) AS sym FROM wp0)
            UNION
            {merged_rows}
        ),
        g0 AS MATERIALIZED (
            SELECT term, n, 1 AS pos, '' AS seg FROM wpu
        )"""
    ]
    piece_case = (
        "CASE WHEN g.pos = 1 THEN substr(g.term, g.pos, pl.pl) "
        "ELSE '##' || substr(g.term, g.pos, pl.pl) END"
    )
    for i in range(1, _WORDPIECE_WORD_MAX + 1):
        stages.append(
            f"""gm{i} AS MATERIALIZED (
            SELECT term, n, pos + pl AS pos,
                   CASE WHEN seg = '' THEN piece
                        ELSE seg || ' ' || piece END AS seg
            FROM (
                SELECT g.term, g.n, g.pos, g.seg, pl.pl,
                       {piece_case} AS piece,
                       row_number() OVER (
                           PARTITION BY g.term ORDER BY pl.pl DESC) AS rn
                FROM g{i - 1} g
                JOIN (SELECT unnest(range(1, {max_pl + 1})) AS pl) pl
                  ON g.pos + pl.pl - 1 <= length(g.term)
                JOIN wpv v ON v.piece = {piece_case}
                WHERE g.pos <= length(g.term)
            ) WHERE rn = 1
        ),
        g{i} AS MATERIALIZED (
            SELECT term, n, pos, seg FROM g{i - 1} WHERE pos > length(term)
            UNION ALL
            SELECT term, n, pos, seg FROM gm{i}
        )"""
        )
    return ",".join(stages)


def _wordpiece_greedy_sql(n_merges: int, top_n: int) -> str:
    return f"""{_wordpiece_oracle_cte(n_merges)},
        {_wordpiece_greedy_stages(n_merges)}
        SELECT term, n,
               CAST(len(string_split(seg, ' ')) AS INT) AS n_pieces,
               seg AS pieces
        FROM g{_WORDPIECE_WORD_MAX}
        WHERE pos = length(term) + 1
        ORDER BY n DESC, term LIMIT {top_n}
    """


@register(
    "wordpiece_learned_merges",
    bench=True,
    tags=("text", "tokenizer", "iterative"),
    description=f"WordPiece (BERT-tokenizer) vocabulary training, "
    f"{_WORDPIECE_MERGES} merge rounds (operators/wordpiece.py): each "
    "round merges the adjacent ##-marked symbol pair maximizing the "
    "likelihood score count(lr)/(count(l)*count(r)) on an integer 1e12 "
    "grid — two vocab-sized aggregates + a one-row argmax per round; "
    "the oracle replays every round via non-overlapping string "
    "replacement, completing the classical subword trio (BPE, unigram, "
    "WordPiece)",
    oracle=_wordpiece_merges_sql(_WORDPIECE_MERGES),
)
def wordpiece_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WordPiece training artifact: the learned merge table in order,
    with each round's winning pair count and quantized likelihood score.
    Driver state is n_merges rows; the corpus-scale work happened once
    in the word count."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.wordpiece import (
        wordpiece_train,
        wordpiece_vocab,
    )

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    merges, _ = wordpiece_train(
        wordpiece_vocab(wc), n_merges=_WORDPIECE_MERGES
    )
    return spark.createDataFrame(
        [(k, f"{l} {r}", cnt, sq) for k, l, r, cnt, sq in merges],
        schema="merge_idx int, pair string, pair_count bigint, score_q bigint",
    )


@register(
    "wordpiece_greedy_segmentation",
    tags=("text", "tokenizer", "iterative"),
    description="Greedy longest-match-first (maximal munch) WordPiece "
    f"segmentation under the {_WORDPIECE_MERGES}-merge trained vocabulary "
    "— the BERT apply semantics, NOT merge replay: the top-50 words by "
    "frequency with their ##-marked piece sequences; the oracle replays "
    "training AND the greedy matcher one unrolled stage per character",
    oracle=_wordpiece_greedy_sql(_WORDPIECE_MERGES, top_n=50),
)
def wordpiece_greedy_segmentation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """What the trained WordPiece tokenizer DOES to words: train the
    same 6-merge vocabulary, then segment the word vocabulary with the
    greedy longest-match fold (alphabet + merged tokens — the apply-time
    inventory differs from BPE's in that segmentation consults the VOCAB,
    not the merge order). (n DESC, term) is a total order — term is
    unique — so the LIMIT is deterministic."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.wordpiece import (
        wordpiece_segment,
        wordpiece_train,
        wordpiece_vocab,
        wordpiece_vocab_pieces,
    )

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    vocab = wordpiece_vocab(wc)
    merges, _ = wordpiece_train(vocab, n_merges=_WORDPIECE_MERGES)
    pieces = wordpiece_vocab_pieces(vocab, merges)
    # localCheckpoint = a plan barrier, not just lineage hygiene: the
    # filter + two field projections below would each re-inline the
    # greedy fold (projection collapse), tripling a deliberately large
    # expression's one-time planning/codegen cost (see
    # greedy_segment_expr's expression-size note).
    seg = wordpiece_segment(
        vocab.select("term", "n"), pieces
    ).localCheckpoint()
    return (
        seg.where(F.col("v").isNotNull())
        .orderBy(F.col("n").desc(), "term")
        .limit(50)
        .select(
            "term",
            "n",
            F.col("v.n_pieces").alias("n_pieces"),
            F.col("v.seg").alias("pieces"),
        )
    )


@register(
    "tokenizer_compression_comparison",
    tags=("text", "tokenizer", "iterative", "quality"),
    description="The three trained subword tokenizers (BPE merges, "
    "unigram-LM Viterbi, WordPiece greedy) measured on ONE axis — "
    "pieces-per-word over the shared <=12-char clean-word vocabulary, "
    "frequency-weighted — the compression metric a tokenizer-selection "
    "pipeline actually compares; the oracle replays ALL THREE trainings "
    "and applies as independently-scoped nested WITH chains",
    oracle=f"""
        WITH bpe_m AS MATERIALIZED (
            {_bpe_oracle_cte(_BPE_MERGES)}
            SELECT CAST(count(*) AS BIGINT) AS n_word_types,
                   CAST(sum(n) AS BIGINT) AS total_words,
                   CAST(sum(n * len(string_split(
                       substr(s, 2, length(s) - 2), '||'))) AS BIGINT)
                       AS total_pieces
            FROM w{_BPE_MERGES} WHERE length(term) <= {_WORDPIECE_WORD_MAX}
        ),
        uni_m AS MATERIALIZED (
            {_unigram_oracle_cte(_UNIGRAM_ITERS)},
            {_unigram_dp_sql("f_", f"c{_UNIGRAM_ITERS}")}
            SELECT CAST(count(*) AS BIGINT) AS n_word_types,
                   CAST(sum(n) AS BIGINT) AS total_words,
                   CAST(sum(n * len(string_split(seg, ' '))) AS BIGINT)
                       AS total_pieces
            FROM segf_
        ),
        wp_m AS MATERIALIZED (
            {_wordpiece_oracle_cte(_WORDPIECE_MERGES)},
            {_wordpiece_greedy_stages(_WORDPIECE_MERGES)}
            SELECT CAST(count(*) AS BIGINT) AS n_word_types,
                   CAST(sum(n) AS BIGINT) AS total_words,
                   CAST(sum(n * len(string_split(seg, ' '))) AS BIGINT)
                       AS total_pieces
            FROM g{_WORDPIECE_WORD_MAX} WHERE pos = length(term) + 1
        )
        SELECT tokenizer, n_word_types, total_words, total_pieces,
               floor(CAST(total_pieces AS DOUBLE) / total_words * 10000
                     + 0.5) / 10000 AS pieces_per_word
        FROM (
            SELECT 'bpe' AS tokenizer, * FROM bpe_m
            UNION ALL SELECT 'unigram', * FROM uni_m
            UNION ALL SELECT 'wordpiece', * FROM wp_m
        ) ORDER BY tokenizer
    """,
)
def tokenizer_compression_comparison(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train all three tokenizers on the same corpus word count and
    report each one's frequency-weighted pieces-per-word over the SAME
    word population (clean [a-z]+ types <= 12 chars — the bound the DP
    replays share). n_word_types must agree across the three rows by
    construction, which makes the comparison honest: same data, same
    budgetary footing (6 BPE merges, 6 WordPiece merges, 40-candidate
    2-round unigram), different algorithms. BPE deliberately trains on
    the UNBOUNDED word set (its standalone row's contract) and is
    measured on the shared subset."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.bpe import (
        bpe_train,
        char_vocab,
    )
    from data_algorithms_with_pyspark_spark.operators.unigram import (
        unigram_segment,
        unigram_train,
        word_vocab,
    )
    from data_algorithms_with_pyspark_spark.operators.wordpiece import (
        wordpiece_segment,
        wordpiece_train,
        wordpiece_vocab,
        wordpiece_vocab_pieces,
    )

    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(words("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    ).localCheckpoint()

    def metrics(df: DataFrame, n_pieces: F.Column, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("tokenizer"),
            F.count("*").cast("long").alias("n_word_types"),
            F.sum("n").cast("long").alias("total_words"),
            F.sum(F.col("n") * n_pieces).cast("long").alias("total_pieces"),
        )

    _, bseg = bpe_train(char_vocab(wc), n_merges=_BPE_MERGES)
    bpe_m = metrics(
        bseg.where(F.length("term") <= _WORDPIECE_WORD_MAX),
        F.size("syms"),
        "bpe",
    )

    uvocab = word_vocab(wc)
    upieces = unigram_train(
        uvocab, iters=_UNIGRAM_ITERS, top_multi=_UNIGRAM_TOP_MULTI
    )
    uni_m = metrics(
        unigram_segment(uvocab, upieces),
        F.size(F.split(F.col("v.seg"), " ")),
        "unigram",
    )

    wvocab = wordpiece_vocab(wc)
    wmerges, _ = wordpiece_train(wvocab, n_merges=_WORDPIECE_MERGES)
    wp_m = metrics(
        wordpiece_segment(
            wvocab.select("term", "n"),
            wordpiece_vocab_pieces(wvocab, wmerges),
        ),
        F.col("v.n_pieces"),
        "wordpiece",
    )

    from data_algorithms_with_pyspark_spark.operators.dedup import floor_round

    return (
        bpe_m.unionAll(uni_m)
        .unionAll(wp_m)
        .select(
            "tokenizer",
            "n_word_types",
            "total_words",
            "total_pieces",
            floor_round(
                F.col("total_pieces").cast("double") / F.col("total_words"),
                4,
            ).alias("pieces_per_word"),
        )
        .orderBy("tokenizer")
    )


_SPLIT_TEST_NUM = 1
_SPLIT_TEST_DEN = 5  # test fraction = 1/5


@register(
    "documents_leakage_safe_split",
    tags=("sampling", "curation"),
    description="Leakage-safe train/test split keyed on the CONTENT "
    "fingerprint (exact duplicates always land on the same side) with a "
    "per-source audit that no fingerprint spans both splits",
    oracle=f"""
        WITH fp AS (
            SELECT source, md5({_NORMALIZED_SQL}) AS fingerprint,
                   ('0x' || substring(md5({_NORMALIZED_SQL}), 1, 6))::BIGINT
                       * {_SPLIT_TEST_DEN} < {16**6} * {_SPLIT_TEST_NUM}
                       AS is_test
            FROM documents
        ),
        per_fp AS (
            SELECT source, fingerprint,
                   count(*) AS n,
                   count(DISTINCT is_test) AS n_sides,
                   max(CASE WHEN is_test THEN 1 ELSE 0 END) = 1 AS any_test
            FROM fp GROUP BY source, fingerprint
        )
        SELECT source,
               CAST(sum(CASE WHEN NOT any_test THEN n ELSE 0 END) AS BIGINT)
                   AS n_train,
               CAST(sum(CASE WHEN any_test THEN n ELSE 0 END) AS BIGINT)
                   AS n_test,
               CAST(sum(CASE WHEN n_sides > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_leaked_fingerprints
        FROM per_fp GROUP BY source ORDER BY source
    """,
)
def documents_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Splitting by row hash leaks: two copies of a document can land in
    train AND test, inflating eval. Keying the split on the content
    fingerprint makes co-location structural; the query also AUDITS it
    (n_leaked_fingerprints, per-fingerprint count of sides seen — 0 by
    construction, and the oracle proves both engines agree). The split
    predicate is the all-integer rational-rate draw (1/5 test) on the
    fingerprint's first 6 md5 hex digits."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import (
        normalize_text,
    )

    docs = load_table(spark, sf_dir, "documents")
    fingerprint = F.md5(normalize_text("text"))
    u = F.conv(F.substring(fingerprint, 1, 6), 16, 10).cast("long")
    is_test = u * F.lit(_SPLIT_TEST_DEN) < F.lit(16**6 * _SPLIT_TEST_NUM)
    fp = docs.select(
        "source",
        fingerprint.alias("fingerprint"),
        is_test.alias("is_test"),
    )
    per_fp = fp.groupBy("source", "fingerprint").agg(
        F.count("*").alias("n"),
        F.countDistinct("is_test").alias("n_sides"),
        F.max(F.col("is_test").cast("int")).alias("any_test"),
    )
    return (
        per_fp.groupBy("source")
        .agg(
            F.sum(F.when(F.col("any_test") == 0, F.col("n")).otherwise(0)).alias(
                "n_train"
            ),
            F.sum(F.when(F.col("any_test") == 1, F.col("n")).otherwise(0)).alias(
                "n_test"
            ),
            F.sum((F.col("n_sides") > 1).cast("long")).alias(
                "n_leaked_fingerprints"
            ),
        )
        .orderBy("source")
    )


_CMS_ROWS = 4
_CMS_WIDTH = 256


@register(
    "term_count_min_sketch",
    bench=True,
    tags=("sketch", "text"),
    description=f"Count-min sketch ({_CMS_ROWS}x{_CMS_WIDTH} md5-hashed "
    "cells) over corpus terms, read back for the top-30 true terms — "
    "bounded-space frequency estimation with the one-sided-error "
    "guarantee (estimate >= truth), FULL value oracle via md5 buckets",
    oracle=f"""
        WITH t AS (SELECT unnest({_TOKENS}) AS term FROM documents),
        truec AS (SELECT term, count(*) AS true_count FROM t GROUP BY term),
        rows_ AS (SELECT unnest(range(0, {_CMS_ROWS})) AS r),
        cells AS (
            SELECT r, ('0x' || substring(md5(CAST(r AS VARCHAR) || ':' ||
                                             term), 1, 6))::BIGINT
                          % {_CMS_WIDTH} AS bucket,
                   count(*) AS c
            FROM t CROSS JOIN rows_
            GROUP BY 1, 2
        ),
        est AS (
            SELECT tc.term, min(c.c) AS cms_estimate
            FROM truec tc CROSS JOIN rows_ r
            JOIN cells c ON c.r = r.r
                AND c.bucket = ('0x' || substring(
                        md5(CAST(r.r AS VARCHAR) || ':' || tc.term),
                        1, 6))::BIGINT % {_CMS_WIDTH}
            GROUP BY tc.term
        )
        SELECT tc.term, CAST(tc.true_count AS BIGINT) AS true_count,
               CAST(e.cms_estimate AS BIGINT) AS cms_estimate
        FROM truec tc JOIN est e USING (term)
        ORDER BY true_count DESC, term LIMIT 30
    """,
)
def term_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-space counting move: the sketch is ROWSxWIDTH cells no
    matter the corpus (each partition pre-combines to at most that many
    rows before the shuffle — the groupBy carries ~1k rows per partition
    at ANY scale). The read-back joins the tiny cell table back broadcast.
    Estimate >= truth always (collisions only ADD); the oracle recomputes
    the identical md5 bucketing."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words

    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(words("text")).alias("term"))

    def bucket(r: int, col) -> F.Column:
        h = F.md5(F.concat(F.lit(f"{r}:"), col))
        return F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % _CMS_WIDTH

    # COUNT-THEN-SKETCH (round 11): the sketch cells derive from the
    # vocabulary counts — sum(true_count) over terms hashing to a cell is
    # exactly count(*) over term OCCURRENCES in that cell, so the corpus
    # tokenizes ONCE (the truec aggregate, needed for the output anyway)
    # and the ROWS md5 hashes evaluate per DISTINCT TERM instead of per
    # occurrence (guide §2.3 "aggregate before you shuffle": at 100 TB
    # that is |vocab| * ROWS hashes instead of ~10^13 * ROWS). truec is
    # vocab-sized — persisting it is the standard sketch-not-corpus move;
    # the old shape re-ran the corpus tokenize for each of the two
    # aggregates.
    truec = (
        terms.groupBy("term").agg(F.count("*").alias("true_count")).persist()
    )

    def with_cells(df: DataFrame) -> DataFrame:
        return df.select(
            *df.columns,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).cast("long").alias("r"),
                            bucket(r, F.col("term")).alias("bucket"),
                        )
                        for r in range(_CMS_ROWS)
                    ]
                )
            ).alias("cell"),
        ).select(*df.columns, "cell.r", "cell.bucket")

    cells = (
        with_cells(truec)
        .groupBy("r", "bucket")
        .agg(F.sum("true_count").alias("c"))
    )
    lookups = with_cells(truec)
    est = (
        lookups.join(F.broadcast(cells), on=["r", "bucket"])
        .groupBy("term", "true_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.orderBy(F.col("true_count").desc(), "term").limit(30)


# --- batch k-NN join --------------------------------------------------------

_KNN_QUERIES = 8
_KNN_K = 3


@register(
    "ann_knn_join_bruteforce",
    bench=True,
    tags=("similarity", "knn"),
    description=f"Batch exact k-NN join: top-{_KNN_K} cosine neighbors for "
    f"each of {_KNN_QUERIES} query vectors — broadcast query batch, corpus "
    "streams once, rank<=k plans as WindowGroupLimit (partial mode caps "
    "each task at k rows per query BEFORE the shuffle)",
    oracle=f"""
        WITH v AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
        ),
        q AS (SELECT vec_id AS q_id, vec AS q_vec FROM v
              WHERE vec_id < {_KNN_QUERIES}),
        c AS (SELECT vec_id AS n_id, vec AS n_vec FROM v
              WHERE vec_id >= {_KNN_QUERIES}),
        scored AS (
            SELECT q.q_id, c.n_id,
                   round(list_cosine_similarity(c.n_vec, q.q_vec), 6)
                       AS cosine
            FROM c CROSS JOIN q
        )
        SELECT q_id, n_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
            SELECT q_id, n_id, cosine,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY cosine DESC, n_id
                   ) AS rank
            FROM scored
        ) WHERE rank <= {_KNN_K}
    """,
)
def ann_knn_join_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retrieval building block: a BATCH of query embeddings against
    the corpus (cosine_topk answers one query; real pipelines score
    thousands per pass). Query batch = the {_KNN_QUERIES} lowest vec_ids,
    corpus = the rest; exact scoring, so a full DuckDB value oracle. The
    banded-SRP variant (knn_join_srp) is the same API at candidate-pruned
    cost for corpus-scale query batches."""
    from data_algorithms_with_pyspark_spark.operators.similarity import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _KNN_QUERIES)
    corpus = emb.where(F.col("vec_id") >= _KNN_QUERIES)
    out = knn_join(queries, corpus, k=_KNN_K)
    return out.withColumn("rank", F.col("rank").cast("long"))


@register(
    "embedding_hard_negatives",
    tags=("similarity", "knn", "training"),
    description=f"Hard-negative mining: top-{_KNN_K} most-similar OTHER-"
    f"label vectors for each of {_KNN_QUERIES} anchors — the contrastive-"
    "training negatives pass; same broadcast/WindowGroupLimit shape as the "
    "k-NN join with the label-mismatch predicate applied before ranking "
    "(operators/similarity.py:hard_negatives)",
    oracle=f"""
        WITH v AS MATERIALIZED (
            SELECT vec_id, label, embedding::DOUBLE[] AS vec FROM embeddings
        ),
        a AS (SELECT vec_id AS q_id, label AS q_label, vec AS q_vec
              FROM v WHERE vec_id < {_KNN_QUERIES}),
        c AS (SELECT vec_id AS n_id, label AS n_label, vec AS n_vec
              FROM v WHERE vec_id >= {_KNN_QUERIES}),
        scored AS (
            SELECT a.q_id, a.q_label, c.n_id, c.n_label,
                   round(list_cosine_similarity(c.n_vec, a.q_vec), 6)
                       AS cosine
            FROM c CROSS JOIN a
            WHERE c.n_label <> a.q_label
        )
        SELECT q_id, q_label, n_id, n_label, cosine,
               CAST(rank AS BIGINT) AS rank FROM (
            SELECT q_id, q_label, n_id, n_label, cosine,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY cosine DESC, n_id
                   ) AS rank
            FROM scored
        ) WHERE rank <= {_KNN_K}
    """,
)
def embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mining the negatives that move a contrastive loss: nearest
    neighbors under a DIFFERENT label. Anchors = the {_KNN_QUERIES}
    lowest vec_ids, corpus = the rest (disjoint slices of one table, so
    the shared-namespace id contract holds trivially)."""
    from data_algorithms_with_pyspark_spark.operators.similarity import (
        hard_negatives,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = hard_negatives(
        emb.where(F.col("vec_id") < _KNN_QUERIES),
        emb.where(F.col("vec_id") >= _KNN_QUERIES),
        k=_KNN_K,
    )
    return out.withColumn("rank", F.col("rank").cast("long"))


_RERANK_CAND = 20
_RERANK_K = 5


@register(
    "rerank_topk",
    bench=True,
    tags=("similarity", "retrieval", "pandas-udf"),
    description=f"Two-stage retrieval: exact top-{_RERANK_CAND} cosine "
    f"candidates per query, reranked to top-{_RERANK_K} by the Arrow-batched "
    "sigmoid-dot pair scorer (operators/similarity.rerank_topk) — the "
    "cross-encoder batch shape with a real deterministic scorer and a full "
    "SQL oracle",
    oracle=f"""
        WITH v AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
        ),
        q AS (SELECT vec_id AS q_id, vec AS q_vec FROM v
              WHERE vec_id < {_KNN_QUERIES}),
        c AS (SELECT vec_id AS n_id, vec AS n_vec FROM v
              WHERE vec_id >= {_KNN_QUERIES}),
        scored AS (
            SELECT q.q_id, c.n_id,
                   round(list_cosine_similarity(c.n_vec, q.q_vec), 6)
                       AS cosine,
                   list_inner_product(c.n_vec, q.q_vec) AS dot
            FROM c CROSS JOIN q
        ),
        cand AS (
            SELECT q_id, n_id, dot FROM (
                SELECT q_id, n_id, dot,
                       row_number() OVER (
                           PARTITION BY q_id ORDER BY cosine DESC, n_id
                       ) AS rn
                FROM scored
            ) WHERE rn <= {_RERANK_CAND}
        ),
        resc AS (
            SELECT q_id, n_id,
                   round(1.0 / (1.0 + exp(-dot)), 6) AS score
            FROM cand
        )
        SELECT q_id, n_id, score, CAST(rank AS BIGINT) AS rank FROM (
            SELECT q_id, n_id, score,
                   row_number() OVER (
                       PARTITION BY q_id ORDER BY score DESC, n_id
                   ) AS rank
            FROM resc
        ) WHERE rank <= {_RERANK_K}
    """,
)
def rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate generation (exact batch k-NN, broadcast query batch +
    WindowGroupLimit) feeds the Arrow-batched pair scorer over surviving
    pairs only — the production two-stage retrieval shape; swap the
    default sigmoid-dot scorer for a model-backed callable and the plan
    is unchanged. Scoring cost tracks |queries| x cand_k, never
    |queries| x corpus."""
    from data_algorithms_with_pyspark_spark.operators.similarity import (
        knn_join,
        rerank_topk as rerank_op,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _KNN_QUERIES)
    corpus = emb.where(F.col("vec_id") >= _KNN_QUERIES)
    cand = knn_join(queries, corpus, k=_RERANK_CAND).select("q_id", "n_id")
    out = rerank_op(cand, queries, corpus, k=_RERANK_K)
    return out.withColumn("rank", F.col("rank").cast("long"))


# --- fuzzy (similarity) join ------------------------------------------------

_FUZZY_THRESHOLD = 0.4
_FUZZY_N = 3
_FUZZY_SHINGLES_SQL = (
    "list_distinct(list_transform("
    "range(1, greatest(length(lower(p_name)) - 2, 1) + 1), "
    "i -> substr(lower(p_name), i, 3)))"
)


@register(
    "part_name_similarity_join",
    bench=True,
    tags=("join", "fuzzy", "dedup"),
    description=f"Entity-resolution fuzzy join: char-trigram Jaccard >= "
    f"{_FUZZY_THRESHOLD} matches between the DISTINCT part names of two "
    "catalog halves via shingle posting-list candidates (complete for any "
    "threshold > 0 — a qualifying pair shares at least one shingle), "
    "exact-Jaccard verify (operators/fuzzy.py:similarity_join)",
    oracle=f"""
        WITH l AS MATERIALIZED (
            SELECT p_name AS lname, {_FUZZY_SHINGLES_SQL} AS lsh
            FROM (SELECT DISTINCT p_name FROM part WHERE p_partkey % 2 = 0)
        ),
        r AS MATERIALIZED (
            SELECT p_name AS rname, {_FUZZY_SHINGLES_SQL} AS rsh
            FROM (SELECT DISTINCT p_name FROM part WHERE p_partkey % 2 = 1)
        )
        SELECT lname AS name_l, rname AS name_r, jaccard FROM (
            SELECT lname, rname,
                   floor(CAST(len(list_intersect(lsh, rsh)) AS DOUBLE)
                         / len(list_distinct(list_concat(lsh, rsh)))
                         * 10000 + 0.5) / 10000
                       AS jaccard
            FROM l CROSS JOIN r
        ) WHERE jaccard >= {_FUZZY_THRESHOLD}
    """,
)
def part_name_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Match near-identical part names across two catalog halves WITHOUT
    a cross join: dedupe each side to its distinct names first (the
    entity-resolution vocabulary is orders of magnitude below row count —
    here 64 names over 2000 parts), then shingle postings equi-join for
    candidates and set-Jaccard verify. The oracle IS the cross join — at
    sf0.01 DuckDB brute-forces what the Spark plan must reproduce through
    the posting-list path, proving candidate completeness, not just
    plausibility. max_shingle_df (the hot-posting cap) stays off here so
    equivalence is exact; at corpus scale it bounds candidate blowup at a
    documented recall trade."""
    from data_algorithms_with_pyspark_spark.operators.fuzzy import (
        similarity_join,
    )

    part = load_table(spark, sf_dir, "part")
    left = (
        part.where(F.col("p_partkey") % 2 == 0)
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    right = (
        part.where(F.col("p_partkey") % 2 == 1)
        .select(F.col("p_name").alias("name"))
        .distinct()
    )
    return similarity_join(
        left,
        right,
        "name",
        "name",
        "name",
        "name",
        _FUZZY_THRESHOLD,
        shingle_n=_FUZZY_N,
    )


# --- vocabulary encode (apply-tokenizer-at-scale) ---------------------------

_ENCODE_VOCAB_K = 500
_ENCODE_HEAD = 20


@register(
    "documents_vocab_encode",
    bench=True,
    tags=("text", "tokenizer"),
    description=f"Apply a trained vocabulary at scale: rank the top "
    f"{_ENCODE_VOCAB_K} terms into ids, broadcast the vocab, encode every "
    f"document to its id sequence (first {_ENCODE_HEAD} ids as CSV, OOV "
    "= -1) with per-doc OOV counts — the encode pass of every training "
    "pipeline",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        w AS (SELECT doc_id, unnest(t) AS term,
                     unnest(range(1, len(t) + 1)) AS pos
              FROM toks),
        vocab AS (
            SELECT term, row_number() OVER (ORDER BY n DESC, term) - 1 AS id
            FROM (SELECT term, count(*) AS n FROM w GROUP BY term)
            ORDER BY n DESC, term LIMIT {_ENCODE_VOCAB_K}
        ),
        enc AS (
            SELECT w.doc_id, w.pos, COALESCE(v.id, -1) AS tok_id
            FROM w LEFT JOIN vocab v USING (term)
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN tok_id = -1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov,
               array_to_string(
                   list_transform(
                       list_sort(list(ROW(pos, tok_id)))[1:{_ENCODE_HEAD}],
                       r -> CAST(r[2] AS VARCHAR)),
                   ',') AS ids_head
        FROM enc GROUP BY doc_id
    """,
)
def documents_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode = posexplode tokens -> broadcast the ranked vocabulary ->
    one hash aggregate back to a per-doc row. The vocab (id = frequency
    rank) broadcasts at any corpus size (it is top-K by construction);
    the corpus shuffles ONCE, keyed by doc_id, carrying (pos, id) ints.
    The id sequence head is CSV so the cross-engine hash is string-typed
    (same convention as term_posting_lists)."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import (
        words,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words("text").alias("t"))
    w = toks.select(
        "doc_id", F.posexplode("t").alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    from pyspark.sql.window import Window

    # id ranking runs on the top-K relation (TakeOrderedAndProject output,
    # <= _ENCODE_VOCAB_K rows at ANY corpus size), so the single-partition
    # window here is constant-bounded — see tests/test_plan_lint.py.
    # NOTE: this is the source of the driver-log
    # "WARN WindowExec: No Partition Defined for Window operation" for
    # this query — expected and bounded (the window's input is the
    # LIMIT-ed vocab, never the corpus); not a scale defect.
    vocab = (
        w.groupBy("term")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(_ENCODE_VOCAB_K)
        .select(
            "term",
            (
                F.row_number().over(Window.orderBy(F.col("n").desc(), "term"))
                - 1
            )
            .cast("long")
            .alias("id"),
        )
    )
    enc = w.join(F.broadcast(vocab), on="term", how="left").select(
        "doc_id", "pos", F.coalesce("id", F.lit(-1)).alias("tok_id")
    )
    return enc.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum((F.col("tok_id") == -1).cast("long")).alias("n_oov"),
        F.array_join(
            F.transform(
                F.slice(
                    F.array_sort(F.collect_list(F.struct("pos", "tok_id"))),
                    1,
                    _ENCODE_HEAD,
                ),
                lambda s: s["tok_id"].cast("string"),
            ),
            ",",
        ).alias("ids_head"),
    )


_DUPSPAN_W = 8  # window tokens; shared literal with the oracle SQL below


@register(
    "doc_duplicated_spans",
    bench=True,
    tags=("dedup", "curation", "text"),
    description="Exact-substring duplication profile (Lee et al. 2022 "
    "arXiv:2107.06499 shape): every overlapping 8-token window hashed "
    "corpus-wide, windows occurring 2+ times merged into maximal per-doc "
    "spans; per-doc duplicated-token coverage and ratio",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        base AS (
            SELECT doc_id,
                   CAST(len(t) AS BIGINT) AS n_tokens,
                   CAST(greatest(len(t) - {_DUPSPAN_W} + 1, 0) AS BIGINT)
                       AS n_windows,
                   t
            FROM toks
        ),
        occ AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   md5(array_to_string(
                       list_slice(t, i + 1, i + {_DUPSPAN_W}), ' ')) AS h
            FROM (SELECT doc_id, t, unnest(range(n_windows)) AS i
                  FROM base WHERE n_windows > 0)
        ),
        dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
        docc AS (SELECT o.doc_id, o.pos FROM occ o JOIN dup USING (h)),
        sp AS (
            SELECT doc_id, pos,
                   CASE WHEN lag(pos) OVER w IS NULL
                          OR pos - lag(pos) OVER w >= {_DUPSPAN_W}
                        THEN 1 ELSE 0 END AS new_span
            FROM docc WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        isl AS (
            SELECT doc_id, pos,
                   sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos)
                       AS span_id
            FROM sp
        ),
        spans AS (
            SELECT doc_id, span_id, min(pos) AS lo, max(pos) AS hi,
                   count(*) AS n_win
            FROM isl GROUP BY doc_id, span_id
        ),
        agg AS (
            SELECT doc_id,
                   CAST(sum(n_win) AS BIGINT) AS n_dup_windows,
                   CAST(count(*) AS BIGINT) AS n_spans,
                   CAST(sum(hi - lo + {_DUPSPAN_W}) AS BIGINT)
                       AS covered_tokens
            FROM spans GROUP BY doc_id
        )
        SELECT b.doc_id, b.n_tokens, b.n_windows,
               CAST(COALESCE(a.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
               CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
               CAST(COALESCE(a.covered_tokens, 0) AS BIGINT)
                   AS covered_tokens,
               floor(CASE WHEN b.n_tokens > 0
                          THEN CAST(COALESCE(a.covered_tokens, 0) AS DOUBLE)
                               / b.n_tokens
                          ELSE 0.0 END * 10000 + 0.5) / 10000 AS dup_ratio
        FROM base b LEFT JOIN agg a USING (doc_id)
        ORDER BY b.doc_id
    """,
)
def doc_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring dedup profile over ``documents`` —
    ``operators.dedup.duplicated_window_spans`` (window hash index +
    count aggregate + semi join + gaps-and-islands interval merge; no
    all-pairs stage anywhere). The curation decision this feeds: drop or
    trim documents whose ``dup_ratio`` exceeds a policy threshold."""
    from data_algorithms_with_pyspark_spark.operators.dedup import (
        duplicated_window_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    return duplicated_window_spans(docs, window=_DUPSPAN_W).orderBy("doc_id")


_BLOOM_M = 4096
_BLOOM_K = 3


def _bloom_pos_sql(expr: str) -> str:
    """DuckDB twin of operators/sketches.bloom_positions (k 32-bit md5 lanes)."""
    lanes = ", ".join(
        f"('0x' || substring(md5({expr}), {1 + 8 * i}, 8))::BIGINT % {_BLOOM_M}"
        for i in range(_BLOOM_K)
    )
    return f"[{lanes}]"


@register(
    "bloom_term_membership",
    bench=True,
    tags=("sketch", "curation"),
    description="Bloom-filter membership audit: filter built over the "
    "benchmark slice's distinct word bigrams (md5-lane bit positions), "
    "probed by the FULL corpus bigram vocabulary; per-bigram "
    "maybe-present verdict vs exact truth exposes the false-positive "
    "rate at the (1-e^(-kn/m))^k theory point",
    oracle=f"""
        WITH toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        w AS (
            SELECT doc_id, unnest(list_transform(
                range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS term
            FROM toks
        ),
        bench_terms AS (
            SELECT DISTINCT term FROM w WHERE doc_id % 10 = 0
        ),
        bloom AS (
            SELECT DISTINCT pos FROM (
                SELECT unnest({_bloom_pos_sql('term')}) AS pos
                FROM bench_terms
            )
        ),
        vocab AS (
            SELECT term, CAST(count(*) AS BIGINT) AS freq
            FROM w GROUP BY term
        ),
        probe AS (
            SELECT term, unnest({_bloom_pos_sql('term')}) AS pos
            FROM vocab
        ),
        hits AS (
            SELECT p.term, count(b.pos) AS nhit
            FROM probe p LEFT JOIN bloom b USING (pos)
            GROUP BY p.term
        )
        SELECT v.term, v.freq,
               (h.nhit = {_BLOOM_K}) AS in_bloom,
               (b.term IS NOT NULL) AS in_benchmark
        FROM vocab v
        JOIN hits h USING (term)
        LEFT JOIN bench_terms b USING (term)
        ORDER BY v.freq DESC, v.term
    """,
)
def bloom_term_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter as a relational sketch (``operators/sketches.py``):
    built once over the benchmark slice's bigrams (``doc_id % 10 = 0``
    stand-in), probed by the corpus's full bigram vocabulary. The
    positions table is <= m rows, so AQE broadcasts the membership join
    — at 100 TB the probe side streams, the filter never shuffles, and
    the exact-truth column (computable here, impossible at real scale)
    audits the FP rate the sketch theory predicts (~10% at the
    n=862, m=4096, k=3 operating point of the test corpus)."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import (
        word_ngrams,
        words,
    )
    from data_algorithms_with_pyspark_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words("text").alias("_t"))
    grams = toks.select(
        "doc_id", F.explode(word_ngrams(F.col("_t"), 2)).alias("term")
    )
    # ONE vocabulary aggregate carries BOTH outputs the query needs per
    # term — the corpus frequency AND whether any occurrence sits in the
    # benchmark slice (max of the slice indicator == the old DISTINCT +
    # left-join truth). The historical shape aggregated the exploded
    # corpus twice (bench distinct + vocab counts — different subtrees,
    # no exchange reuse, so the corpus tokenized twice) and re-attached
    # membership with a third join. Persisted: vocab-sized (the
    # sketch-not-corpus move); feeds the filter build, the probe, and the
    # final projection.
    base = (
        grams.groupBy("term")
        .agg(
            F.count("*").alias("freq"),
            F.max((F.col("doc_id") % 10 == 0).cast("int")).alias("_bm"),
        )
        .persist()
    )
    bench = base.where(F.col("_bm") == 1).select("term")
    bloom = bloom_build(bench, "term", m=_BLOOM_M, k=_BLOOM_K)
    probed = bloom_probe(
        base.select("term", "freq"), "term", bloom, m=_BLOOM_M, k=_BLOOM_K
    )
    return (
        base.join(probed.select("term", "in_bloom"), on="term")
        .select(
            "term",
            "freq",
            "in_bloom",
            (F.col("_bm") == 1).alias("in_benchmark"),
        )
        .orderBy(F.col("freq").desc(), "term")
    )


_LR_DIMS = 32
_LR_ITERS = 3
_LR_MIN_TOKENS = 40  # label rule: y = 1 iff the doc has >= this many tokens


def _lr_train_ctes(train_where: str) -> list:
    """Shared CTE chain for the logistic-regression oracles: features/
    labels over ALL documents, gradient-descent replay restricted to
    ``train_where`` docs (the oracle RETRAINS — kmeans/BPE discipline)."""
    d1 = _LR_DIMS + 1
    ctes = [
        f"toks AS (SELECT doc_id, {_TOKENS} AS t FROM documents)",
        "base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens, t"
        " FROM toks)",
        f"""y AS (
            SELECT doc_id,
                   CAST(CASE WHEN n_tokens >= {_LR_MIN_TOKENS}
                             THEN 1000000 ELSE 0 END AS BIGINT) AS y_micro
            FROM base
        )""",
        f"""tf AS (
            SELECT doc_id,
                   ('0x' || substring(md5(tok), 1, 8))::BIGINT % {_LR_DIMS}
                       AS j,
                   CAST(count(*) AS BIGINT) AS x
            FROM (SELECT doc_id, unnest(t) AS tok FROM toks)
            GROUP BY doc_id, j
        )""",
        f"""feats AS (
            SELECT * FROM tf
            UNION ALL
            SELECT doc_id, CAST({_LR_DIMS} AS BIGINT) AS j,
                   CAST(1 AS BIGINT) AS x
            FROM base
        )""",
        f"trainf AS (SELECT * FROM feats WHERE {train_where})",
        f"nn AS (SELECT count(*) AS n FROM base WHERE {train_where})",
        f"w0 AS (SELECT j, CAST(0 AS BIGINT) AS w FROM range({d1}) r(j))",
    ]
    for i in range(1, _LR_ITERS + 1):
        p = i - 1
        ctes.append(
            f"""z{i} AS (
            SELECT f.doc_id, sum(w.w * f.x) AS z
            FROM trainf f JOIN w{p} w USING (j) GROUP BY f.doc_id
        )"""
        )
        ctes.append(
            f"""s{i} AS (
            SELECT z.doc_id,
                   CAST(floor(1000000.0 / (1.0 + exp(-(z.z / 1000000.0)))
                              + 0.5) AS BIGINT) AS s,
                   y.y_micro
            FROM z{i} z JOIN y USING (doc_id)
        )"""
        )
        ctes.append(
            f"""g{i} AS (
            SELECT f.j, sum((s.s - s.y_micro) * f.x) AS g
            FROM trainf f JOIN s{i} s USING (doc_id) GROUP BY f.j
        )"""
        )
        ctes.append(
            f"""w{i} AS (
            SELECT w.j,
                   CAST(w.w - floor((1 * COALESCE(g.g, 0)) / (2.0 * nn.n)
                                    + 0.5) AS BIGINT) AS w
            FROM w{p} w LEFT JOIN g{i} g USING (j) CROSS JOIN nn
        )"""
        )
    return ctes


def _lr_final_score_ctes(t: int) -> str:
    return f"""zf AS (
            SELECT f.doc_id, sum(w.w * f.x) AS z
            FROM feats f JOIN w{t} w USING (j) GROUP BY f.doc_id
        ),
        sf AS (
            SELECT doc_id,
                   CAST(floor(1000000.0 / (1.0 + exp(-(z / 1000000.0)))
                              + 0.5) AS BIGINT) AS s_micro
            FROM zf
        )"""


def _lr_oracle_sql() -> str:
    """Unrolled-CTE replay of the FULL logistic-regression training loop
    (operators/ml.py), trained on every document."""
    ctes = _lr_train_ctes("TRUE")
    return f"""
        WITH {','.join(ctes)},
        {_lr_final_score_ctes(_LR_ITERS)}
        SELECT b.doc_id, b.n_tokens,
               CAST(y.y_micro / 1000000 AS BIGINT) AS label,
               s.s_micro,
               (s.s_micro >= 500000) AS pred
        FROM base b
        JOIN y USING (doc_id)
        JOIN sf s USING (doc_id)
        ORDER BY b.doc_id
    """


def _lr_eval_oracle_sql() -> str:
    """Same retraining replay, restricted to the 7/8 train split, then a
    confusion-matrix report over the held-out 1/8."""
    ctes = _lr_train_ctes("doc_id % 8 <> 0")
    return f"""
        WITH {','.join(ctes)},
        {_lr_final_score_ctes(_LR_ITERS)}
        SELECT (SELECT CAST(n AS BIGINT) FROM nn) AS n_train,
               CAST(count(*) AS BIGINT) AS n_eval,
               CAST(sum(CASE WHEN s.s_micro >= 500000 AND y.y_micro = 1000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS tp,
               CAST(sum(CASE WHEN s.s_micro >= 500000 AND y.y_micro = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS fp,
               CAST(sum(CASE WHEN s.s_micro < 500000 AND y.y_micro = 1000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS fn,
               CAST(sum(CASE WHEN s.s_micro < 500000 AND y.y_micro = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS tn
        FROM sf s
        JOIN y USING (doc_id)
        WHERE doc_id % 8 = 0
    """


@register(
    "doc_quality_classifier",
    bench=True,
    tags=("ml", "curation", "iterative"),
    description="Trains a hashed-feature logistic-regression quality "
    "classifier (fasttext-filter shape) by full-batch gradient descent — "
    "model on the driver, data distributed, integer micro-unit "
    "quantization — and scores every document; oracle RETRAINS via an "
    "unrolled CTE chain",
    oracle=_lr_oracle_sql(),
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CCNet/GPT-3 quality-filter loop on Spark: hashed bag-of-words
    features (md5 lane % dims + bias), label = deterministic length rule
    (a stand-in for human/LM labels, chosen so the oracle can replay it),
    3 gradient-descent iterations via ``ml.logistic_regression_train``
    (per iteration: one score aggregate, one (dims+1)-row gradient
    aggregate to the driver — the corpus never collects), then one final
    scoring pass. Output: per-doc label, micro-unit sigmoid score, and
    the >= 0.5 prediction."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.ml import (
        hashed_token_features,
        logistic_regression_train,
        packed_logistic_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words("text").alias("_t"))
    base = toks.select(
        "doc_id", F.size("_t").cast("long").alias("n_tokens"), "_t"
    )
    labels = base.select(
        "doc_id",
        (
            (F.col("n_tokens") >= _LR_MIN_TOKENS).cast("long")
            * F.lit(1_000_000)
        ).alias("y_micro"),
    )
    # feats feeds ONE consumer (the trainer's packed build) — no persist;
    # final scoring reuses the trainer's persisted packed relation
    # (packed_out), which drops the old plan's full feature recompute +
    # per-id re-aggregation + labels join from the returned query
    # (guide §2.4: one pass, one shuffle, already paid during training).
    feats = hashed_token_features(toks, _LR_DIMS)
    labels = labels.persist()  # count + packed-build join
    packed_reg: list = []
    try:
        w = logistic_regression_train(
            feats, labels, dims=_LR_DIMS, iters=_LR_ITERS, packed_out=packed_reg
        )
        scored = packed_logistic_scores(packed_reg[0], w)
    finally:
        # must not leak if training raises (ADVICE r11); the returned
        # plan reads only the packed relation, not labels
        labels.unpersist()
    return (
        base.drop("_t")
        .join(scored, on="doc_id")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("y_micro") / F.lit(1_000_000)).cast("long").alias("label"),
            "s_micro",
            (F.col("s_micro") >= F.lit(500_000)).alias("pred"),
        )
        .orderBy("doc_id")
    )


@register(
    "incremental_hourly_agg_merge",
    bench=True,
    tags=("events", "rollup", "incremental", "scale"),
    description="Incremental view maintenance: stored hourly aggregate "
    "(7/8 history) merged with the new batch's partial aggregate (1/8 "
    "increment) via mergeable sums/counts/maxes — the oracle proves "
    "merged == full recompute without the history ever being rescanned",
    oracle="""
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
                   AS value_fp,
               CAST(max(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
                   AS max_fp
        FROM events
        GROUP BY 1, 2
        ORDER BY hour, event_type
    """,
)
def incremental_hourly_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The continuous-aggregate REFRESH (the other half of
    ``events_hourly_daily_rollup``'s story): history's hourly aggregate is
    stored; when a batch arrives, only the batch is aggregated and the two
    partials merge with ``operators.merge.merge_partial_aggs``. The
    deterministic ``event_id % 8`` split stands in for the batch boundary
    so the DuckDB oracle — a FULL recompute over all events — proves the
    incremental path bit-identical: the IVM correctness property itself
    is the test. Measures are chosen mergeable: count, exact fixed-point
    sum, max."""
    from data_algorithms_with_pyspark_spark.operators.merge import (
        merge_partial_aggs,
    )

    ev = load_table(spark, sf_dir, "events")
    leaf = ev.select(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
        F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("fp"),
        (F.col("event_id") % 8 == 0).alias("_is_new"),
    )

    def hourly(df: DataFrame) -> DataFrame:
        return df.groupBy("hour", "event_type").agg(
            F.count("*").alias("n_events"),
            F.sum("fp").alias("value_fp"),
            F.max("fp").alias("max_fp"),
        )

    stored = hourly(leaf.where(~F.col("_is_new")))
    delta = hourly(leaf.where(F.col("_is_new")))
    merged = merge_partial_aggs(
        stored,
        delta,
        keys=["hour", "event_type"],
        sum_cols=["n_events", "value_fp"],
        max_cols=["max_fp"],
    )
    return merged.orderBy("hour", "event_type")


@register(
    "doc_quality_classifier_eval",
    tags=("ml", "curation", "iterative"),
    description="Held-out evaluation of the quality classifier: train on "
    "the 7/8 split, score the unseen 1/8, report the confusion matrix "
    "(tp/fp/fn/tn) — the oracle retrains on the same split and must "
    "reproduce every count",
    oracle=_lr_eval_oracle_sql(),
)
def doc_quality_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train/test discipline the production quality filter needs:
    ``doc_id % 8`` holds out an eval slice (deterministic so the oracle
    replays it), training sees only the rest, and the report is the
    held-out confusion matrix — generalization measured on documents the
    gradient never touched. Same engine pieces as
    ``doc_quality_classifier``; only the feats/labels feeding the train
    loop are filtered.

    Honest-eval note: at this corpus + 3 full-batch iterations the model
    is still in the majority-class regime (all-positive predictions —
    non-negative count features cannot cross the 0.5 boundary until the
    bias descends, which full-batch GD does slowly), and the confusion
    matrix REPORTS that — which is exactly the failure an eval harness
    exists to surface before a filter ships. The learner itself is
    proven on separable data in tests/test_ml.py (every positive
    outscores every negative after 8 iterations)."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.ml import (
        hashed_token_features,
        logistic_regression_train,
        logistic_scores,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", words("text").alias("_t"))
    labels = toks.select(
        "doc_id",
        (
            (F.size("_t") >= _LR_MIN_TOKENS).cast("long") * F.lit(1_000_000)
        ).alias("y_micro"),
    )
    is_eval = F.col("doc_id") % 8 == 0
    feats = hashed_token_features(toks, _LR_DIMS).persist()
    labels = labels.persist()  # joined once per iteration + final report
    try:
        w = logistic_regression_train(
            feats.where(~is_eval),
            labels.where(~is_eval),
            dims=_LR_DIMS,
            iters=_LR_ITERS,
        )
        # score ONLY the held-out slice — the report filters to is_eval
        # anyway, and per-doc scoring commutes with the filter, so this
        # drops 7/8 of the scoring aggregate for identical counts
        scored = logistic_scores(feats.where(is_eval), w)
    finally:
        feats.unpersist()
        labels.unpersist()
    n_train = labels.where(~is_eval).count()
    pred = F.col("s_micro") >= 500_000
    truth = F.col("y_micro") == 1_000_000
    return (
        scored.join(labels, on="doc_id")
        .where(is_eval)
        .agg(
            F.lit(n_train).cast("long").alias("n_train"),
            F.count("*").alias("n_eval"),
            F.sum((pred & truth).cast("long")).alias("tp"),
            F.sum((pred & ~truth).cast("long")).alias("fp"),
            F.sum((~pred & truth).cast("long")).alias("fn"),
            F.sum((~pred & ~truth).cast("long")).alias("tn"),
        )
    )


_WSAMPLE_K = 50


@register(
    "documents_weighted_sample",
    tags=("sampling", "curation"),
    description=f"Weighted sample without replacement (Efraimidis-"
    f"Spirakis exponential keys, md5-derived draws): {_WSAMPLE_K} docs "
    "selected with probability proportional to token count, "
    "reproducible on any engine/cluster",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
            FROM documents
        ),
        keyed AS (
            SELECT doc_id, n_tokens,
                   -- greatest(..., -4e6) replays the operator's
                   -- _ES_KEY_CLAMP (no-op here: integer weights >= 1)
                   CAST(floor(
                       greatest(
                           ln((('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                                  1, 6))::BIGINT + 1)
                              / 16777216.0)
                           / n_tokens, -4e6)
                       * 1e12 + 0.5) AS BIGINT) AS es_key_q
            FROM t WHERE n_tokens > 0
        )
        SELECT doc_id, n_tokens, es_key_q,
               CAST(row_number() OVER (ORDER BY es_key_q DESC, doc_id)
                    AS BIGINT) AS sample_rank
        FROM keyed
        ORDER BY es_key_q DESC, doc_id
        LIMIT {_WSAMPLE_K}
    """,
)
def documents_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted eval-set selection: pick documents with
    probability proportional to length, without replacement, and
    deterministically (A-ES keys over md5 draws) — unlike ``df.sample``,
    the same set comes back on any run, partitioning, or engine. One
    TakeOrdered over the corpus; the post-limit ranking window touches k
    rows only (``operators/sampling.py``)."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.operators.sampling import (
        weighted_sample_without_replacement,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", F.size(words("text")).cast("long").alias("n_tokens")
    )
    return weighted_sample_without_replacement(
        base, key_col="doc_id", weight_col="n_tokens", k=_WSAMPLE_K
    ).orderBy("sample_rank")


_LABEL_TOP_TERMS = 5


@register(
    "embedding_cluster_top_terms",
    tags=("similarity", "text", "clustering"),
    description=f"Cluster labeling: embeddings grouped by nearest "
    "coarse centroid, each cluster described by its documents' top-"
    f"{_LABEL_TOP_TERMS} terms — the embeddings->documents cross-modal "
    "join every corpus-exploration UI runs",
    oracle=f"""
        WITH v AS MATERIALIZED (
            SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
        ),
        cent AS (SELECT vec_id AS cid, vec AS cvec FROM v WHERE vec_id < 16),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT v.vec_id, c.cid,
                       row_number() OVER (
                           PARTITION BY v.vec_id
                           ORDER BY CAST(floor((list_cosine_similarity(
                                        v.vec, c.cvec) + 1.0) * 1e15 + 0.5)
                                        AS BIGINT) DESC,
                                    c.cid
                       ) AS rn
                FROM v CROSS JOIN cent c
            ) WHERE rn = 1
        ),
        toks AS (
            SELECT d.doc_id, a.cid, unnest({_TOKENS}) AS term
            FROM documents d JOIN assign a ON d.doc_id = a.vec_id
        ),
        counts AS (
            SELECT cid, term, CAST(count(*) AS BIGINT) AS n
            FROM toks GROUP BY cid, term
        )
        SELECT cid, term, n,
               CAST(rnk AS BIGINT) AS term_rank
        FROM (
            SELECT cid, term, n,
                   row_number() OVER (PARTITION BY cid
                                      ORDER BY n DESC, term) AS rnk
            FROM counts
        )
        WHERE rnk <= {_LABEL_TOP_TERMS}
        ORDER BY cid, term_rank
    """,
)
def embedding_cluster_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What each embedding cluster is ABOUT: vectors group under their
    nearest coarse centroid (``similarity.ivf_assign`` — broadcast
    product, corpus never shuffles), the paired documents (shared id
    space) contribute their tokens, and a per-cluster WindowGroupLimit
    keeps the top terms. The cross-modal join is one hash join on the
    id; term counting is the word-count shuffle keyed (cid, term). At
    100 TB this is the corpus-exploration summary: output is
    k * top_terms rows regardless of corpus size."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import words
    from data_algorithms_with_pyspark_spark.functions.vectors import (
        to_double_array,
    )
    from data_algorithms_with_pyspark_spark.operators.similarity import (
        ivf_assign,
    )
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    vecs = emb.select("vec_id", to_double_array("embedding").alias("vec"))
    assign = ivf_assign(vecs, 16)
    toks = (
        docs.join(assign, on=docs["doc_id"] == assign["vec_id"])
        .select("cid", F.explode(words("text")).alias("term"))
    )
    counts = toks.groupBy("cid", "term").agg(F.count("*").alias("n"))
    w = Window.partitionBy("cid").orderBy(F.col("n").desc(), "term")
    return (
        counts.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .where(F.col("term_rank") <= _LABEL_TOP_TERMS)
        .select("cid", "term", "n", "term_rank")
        .orderBy("cid", "term_rank")
    )


_HOLT_ALPHA = 0.3
_HOLT_AC = 1.0 - _HOLT_ALPHA
_HOLT_BETA = 0.2
_HOLT_BC = 1.0 - _HOLT_BETA


@register(
    "events_value_holt_forecast",
    tags=("events", "timeseries", "pandas-udf"),
    description=f"Per-user Holt linear smoothing (alpha={_HOLT_ALPHA}, "
    f"beta={_HOLT_BETA}): level + trend + one-step forecast — the "
    "capacity-projection recursion one notch above EWMA; Arrow fold vs a "
    "recursive-CTE oracle replaying the identical op sequence "
    "(operators/timeseries.py:grouped_holt)",
    oracle=f"""
        WITH RECURSIVE ev AS (
            SELECT user_id, ts, value,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        r AS (
            SELECT user_id, ts, value, rn,
                   value AS l, CAST(0.0 AS DOUBLE) AS b
            FROM ev WHERE rn = 1
            UNION ALL
            SELECT e.user_id, e.ts, e.value, e.rn,
                   {_HOLT_ALPHA!r} * e.value + {_HOLT_AC!r} * (r.l + r.b),
                   {_HOLT_BETA!r} * (({_HOLT_ALPHA!r} * e.value
                                      + {_HOLT_AC!r} * (r.l + r.b)) - r.l)
                   + {_HOLT_BC!r} * r.b
            FROM ev e JOIN r ON e.user_id = r.user_id AND e.rn = r.rn + 1
        )
        SELECT user_id, ts, value,
               floor(l * 1e6 + 0.5) / 1e6 AS level,
               floor(b * 1e6 + 0.5) / 1e6 AS trend,
               floor((l + b) * 1e6 + 0.5) / 1e6 AS forecast
        FROM r
    """,
)
def events_value_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second resident of the sanctioned recursive Pandas-UDF tier (the
    EWMA rationale, plans/curation.py:events_value_ewma): the coupled
    level/trend recurrence has no window form, so it runs as one shuffle
    on user_id + a contiguous-run fold streaming Arrow batches. The
    oracle replays the exact (add, mul, mul, add, sub, mul, mul, add)
    step via recursive CTE — l_new appears twice in the b update on both
    engines, so the duplicated expression folds identically. event_id is
    the within-user tie-breaker, dropped from the output."""
    from data_algorithms_with_pyspark_spark.operators.timeseries import (
        grouped_holt,
    )

    ev = load_table(spark, sf_dir, "events")
    return grouped_holt(
        ev,
        "user_id",
        ["ts", "event_id"],
        "value",
        alpha=_HOLT_ALPHA,
        beta=_HOLT_BETA,
    ).drop("event_id")


@register(
    "cms_join_size_estimate",
    tags=("sketch", "optimizer"),
    description=f"Join-cardinality estimation from two count-min sketches "
    f"({_CMS_ROWS}x{_CMS_WIDTH}): |events JOIN orders ON user=cust| "
    "estimated as the min-over-rows sketch inner product vs the exact "
    "size — the query-optimizer primitive that prices a join WITHOUT "
    "executing it; one-sided error (estimate >= truth) by construction",
    oracle=f"""
        WITH rows_ AS (SELECT unnest(range(0, {_CMS_ROWS})) AS r),
        ea AS (
            SELECT r, ('0x' || substring(md5(CAST(r AS VARCHAR) || ':' ||
                           CAST(user_id AS VARCHAR)), 1, 6))::BIGINT
                          % {_CMS_WIDTH} AS bucket,
                   count(*) AS c
            FROM events CROSS JOIN rows_ GROUP BY 1, 2
        ),
        ob AS (
            SELECT r, ('0x' || substring(md5(CAST(r AS VARCHAR) || ':' ||
                           CAST(o_custkey AS VARCHAR)), 1, 6))::BIGINT
                          % {_CMS_WIDTH} AS bucket,
                   count(*) AS c
            FROM orders CROSS JOIN rows_ GROUP BY 1, 2
        ),
        dot AS (
            SELECT ea.r, CAST(sum(ea.c * ob.c) AS BIGINT) AS d
            FROM ea JOIN ob ON ea.r = ob.r AND ea.bucket = ob.bucket
            GROUP BY ea.r
        ),
        est AS (SELECT CAST(min(d) AS BIGINT) AS cms_estimate FROM dot),
        truth AS (
            SELECT CAST(sum(e.n * o.n) AS BIGINT) AS true_join_size
            FROM (SELECT user_id, count(*) AS n FROM events GROUP BY 1) e
            JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1) o
              ON e.user_id = o.o_custkey
        )
        SELECT truth.true_join_size, est.cms_estimate,
               est.cms_estimate - truth.true_join_size AS overestimate
        FROM truth, est
    """,
)
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price a join before running it: sketch each side's key-frequency
    vector into ROWSxWIDTH cells (each side's shuffle carries at most
    that many rows per partition, regardless of table size), estimate
    |A JOIN B| as min over rows of the bucket-wise inner product, and
    compare against the exact size (computed from per-key counts — the
    join itself is never materialized). Collisions only ADD mass, so the
    estimate upper-bounds the truth; the overestimate column shows the
    256-bucket accuracy at this key cardinality. All-integer, exact
    oracle."""
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    def bucket(r: int, col) -> F.Column:
        h = F.md5(F.concat(F.lit(f"{r}:"), col.cast("string")))
        return F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % _CMS_WIDTH

    def cells(df, key):
        return (
            df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(r).cast("long").alias("r"),
                                bucket(r, F.col(key)).alias("bucket"),
                            )
                            for r in range(_CMS_ROWS)
                        ]
                    )
                ).alias("cell")
            )
            .select("cell.r", "cell.bucket")
            .groupBy("r", "bucket")
            .agg(F.count("*").alias("c"))
        )

    ea = cells(events, "user_id")
    ob = cells(orders, "o_custkey")
    dot = (
        ea.join(
            ob.withColumnRenamed("c", "c2"), on=["r", "bucket"]
        )
        .groupBy("r")
        .agg(F.sum(F.col("c") * F.col("c2")).alias("d"))
    )
    est = dot.agg(F.min("d").alias("cms_estimate"))
    e_counts = events.groupBy("user_id").agg(F.count("*").alias("n"))
    o_counts = orders.groupBy("o_custkey").agg(F.count("*").alias("n2"))
    truth = (
        e_counts.join(
            o_counts, e_counts["user_id"] == o_counts["o_custkey"]
        )
        .agg(F.sum(F.col("n") * F.col("n2")).alias("true_join_size"))
    )
    return truth.crossJoin(est).select(
        "true_join_size",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("true_join_size")).alias(
            "overestimate"
        ),
    )


_EXPLODE_FACTOR = 10  # flag a self-join whose output exceeds 10x the input


@register(
    "events_selfjoin_explosion_audit",
    tags=("sketch", "optimizer"),
    description=f"Join-planning GUARD wired from the CMS estimator "
    f"(VERDICT r5 #7a): |events SELF-JOIN on user_id| priced from one "
    f"{_CMS_ROWS}x{_CMS_WIDTH} sketch's self inner product BEFORE "
    "running it, flagged would_explode when the estimate exceeds "
    f"{_EXPLODE_FACTOR}x the input — the pre-flight check that stops a "
    "quadratic per-key blowup from ever being submitted; the exact size "
    "(from per-key counts, the join itself never materializes) rides "
    "along to show the decision was right",
    oracle=f"""
        WITH rows_ AS (SELECT unnest(range(0, {_CMS_ROWS})) AS r),
        c AS (
            SELECT r, ('0x' || substring(md5(CAST(r AS VARCHAR) || ':' ||
                           CAST(user_id AS VARCHAR)), 1, 6))::BIGINT
                          % {_CMS_WIDTH} AS bucket,
                   count(*) AS n
            FROM events CROSS JOIN rows_ GROUP BY 1, 2
        ),
        dot AS (
            SELECT r, CAST(sum(n * n) AS BIGINT) AS d FROM c GROUP BY r
        ),
        est AS (SELECT CAST(min(d) AS BIGINT) AS cms_estimate FROM dot),
        truth AS (
            SELECT CAST(sum(n * n) AS BIGINT) AS true_join_size,
                   CAST(sum(n) AS BIGINT) AS input_rows
            FROM (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
        )
        SELECT truth.input_rows, truth.true_join_size, est.cms_estimate,
               est.cms_estimate > {_EXPLODE_FACTOR} * truth.input_rows
                   AS would_explode,
               truth.true_join_size > {_EXPLODE_FACTOR} * truth.input_rows
                   AS does_explode
        FROM truth, est
    """,
)
def events_selfjoin_explosion_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The optimizer-primitive USE case for the CMS join estimator: a
    self-join on a hot key is the classic accidental O(sum n_k^2)
    explosion, and the sketch prices it from ONE pass over the input
    (the self inner product needs only one sketch). would_explode is
    the planner's decision (estimate vs a 10x-input budget);
    does_explode recomputes it from the exact size — CMS overestimates
    only (one-sided error), so would_explode=false PROVES safe-to-run,
    while a true explosion can never sneak under the guard. All-integer
    and exactly replayed by the oracle."""
    events = load_table(spark, sf_dir, "events")

    def bucket(r: int, col) -> F.Column:
        h = F.md5(F.concat(F.lit(f"{r}:"), col.cast("string")))
        return F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % _CMS_WIDTH

    cells = (
        events.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).cast("long").alias("r"),
                            bucket(r, F.col("user_id")).alias("bucket"),
                        )
                        for r in range(_CMS_ROWS)
                    ]
                )
            ).alias("cell")
        )
        .select("cell.r", "cell.bucket")
        .groupBy("r", "bucket")
        .agg(F.count("*").alias("n"))
    )
    est = (
        cells.groupBy("r")
        .agg(F.sum(F.col("n") * F.col("n")).alias("d"))
        .agg(F.min("d").alias("cms_estimate"))
    )
    truth = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .agg(
            F.sum(F.col("n") * F.col("n")).alias("true_join_size"),
            F.sum("n").alias("input_rows"),
        )
    )
    return truth.crossJoin(est).select(
        "input_rows",
        "true_join_size",
        "cms_estimate",
        (
            F.col("cms_estimate")
            > F.lit(_EXPLODE_FACTOR) * F.col("input_rows")
        ).alias("would_explode"),
        (
            F.col("true_join_size")
            > F.lit(_EXPLODE_FACTOR) * F.col("input_rows")
        ).alias("does_explode"),
    )


_HH_K = 150  # certify every term above 1/150 of the token stream


@register(
    "term_heavy_hitters",
    tags=("sketch", "text"),
    description=f"Certified heavy hitters (Misra-Gries two-pass, k={_HH_K}): "
    "every term whose frequency strictly exceeds 1/k of the token stream, "
    "with EXACT counts — pass 1 builds bounded per-partition MG summaries "
    "(union is a guaranteed candidate superset under any partitioning), "
    "pass 2 exact-counts ONLY the broadcast candidates; the full vocabulary "
    "is never shuffled (operators/sketches.py:certified_heavy_hitters)",
    oracle=f"""
        WITH t AS (SELECT unnest({_TOKENS}) AS term FROM documents),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM t)
        SELECT term, CAST(count(*) AS BIGINT) AS n_occurrences
        FROM t, tot
        GROUP BY term, tot.n_total
        HAVING count(*) * {_HH_K} > tot.n_total
    """,
)
def term_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "top keys in 100 TB" shape done scale-correctly: an exact
    groupBy would shuffle the whole vocabulary to find a handful of
    frequent terms; here the Misra-Gries sketch pass (k counters per
    partition, mapInPandas folding Arrow batches, value_counts-vectorized
    updates) proposes <= partitions*k candidates, and only those are
    exactly counted (broadcast join, candidate-keyed partial aggregate).
    The output is the deterministic exact answer — the MG superset
    guarantee (absent => count <= N/(k+1) < N/k) makes the sketch's
    partition-dependence invisible — so the oracle is one exact HAVING
    clause. Complements the CMS (estimates a GIVEN key's count; this
    FINDS the keys)."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import (
        words,
    )
    from data_algorithms_with_pyspark_spark.operators.sketches import (
        certified_heavy_hitters,
    )

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(words("text")).alias("term"))
    return certified_heavy_hitters(tokens, "term", _HH_K)


@register(
    "part_name_typo_pairs",
    tags=("join", "fuzzy", "dedup"),
    description="Edit-distance-1 typo join over the distinct part-name "
    "vocabulary via SymSpell deletion neighborhoods: explode len+1 "
    "one-char-deletion variants, equi-join on the variant (COMPLETE for "
    "d=1 by the pigeonhole argument), exact levenshtein verify on "
    "candidates only — no cross join anywhere "
    "(operators/fuzzy.py:edit_distance_one_pairs); the oracle IS the "
    "brute-force cross join, proving candidate completeness",
    oracle="""
        WITH n AS (SELECT DISTINCT p_name FROM part)
        SELECT a.p_name AS name_a, b.p_name AS name_b
        FROM n a JOIN n b ON a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 1
    """,
)
def part_name_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bounded-edit-distance companion to the trigram-Jaccard fuzzy
    join (part_name_similarity_join): Jaccard catches token-level
    rewording, ed<=1 catches TYPOS — the dedup rule record-linkage
    actually ships. Scale shape: everything downstream of the distinct()
    runs on the vocabulary (names, then len+1 deletion variants per
    name); the variant equi-join's key space is ~total characters, and
    the exact levenshtein runs only on proposed candidates. The DuckDB
    oracle brute-forces the quadratic truth at test SFs, so a missing
    candidate (a completeness bug in the neighborhood scheme) is a
    row-count mismatch, not a silent recall loss."""
    from data_algorithms_with_pyspark_spark.operators.fuzzy import (
        edit_distance_one_pairs,
    )

    part = load_table(spark, sf_dir, "part")
    return edit_distance_one_pairs(part, "p_name")


_HH_GROUP_K = 40  # per-source threshold: 1/40 of that source's tokens


@register(
    "source_term_heavy_hitters",
    tags=("sketch", "text"),
    description=f"PER-GROUP certified heavy hitters (grouped Misra-Gries "
    f"two-pass, k={_HH_GROUP_K}): every term above 1/k of ITS SOURCE's "
    "token stream with exact counts — per-(partition, group) bounded "
    "summaries, guaranteed per-group candidate superset, exact counts on "
    "broadcast candidates only; per-group key universes never shuffle "
    "(operators/sketches.py:certified_heavy_hitters_grouped)",
    oracle=f"""
        WITH t AS (
            SELECT source, unnest({_TOKENS}) AS term FROM documents
        ),
        tot AS (
            SELECT source, CAST(count(*) AS BIGINT) AS n_total
            FROM t GROUP BY source
        )
        SELECT t.source, t.term,
               CAST(count(*) AS BIGINT) AS n_occurrences
        FROM t JOIN tot USING (source)
        GROUP BY t.source, t.term, tot.n_total
        HAVING count(*) * {_HH_GROUP_K} > tot.n_total
    """,
)
def source_term_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-domain/per-language form of term_heavy_hitters — "which
    terms dominate EACH source" — with the same two-pass determinism
    argument applied group-wise: the grouped MG summaries are a
    guaranteed per-group candidate superset under any partitioning, the
    exact second pass kills the partition-dependence, and the per-group
    threshold (count * k > that group's total) makes the output the
    deterministic exact answer a one-clause per-group HAVING oracle
    checks. Group totals ride a |groups|-row broadcast."""
    from data_algorithms_with_pyspark_spark.functions.text_functions import (
        words,
    )
    from data_algorithms_with_pyspark_spark.operators.sketches import (
        certified_heavy_hitters_grouped,
    )

    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "source", F.explode(words("text")).alias("term")
    )
    return certified_heavy_hitters_grouped(tokens, "source", "term", _HH_GROUP_K)


_CARD_SPLIT_NUM = 1  # 1/5 test, the leakage-safe content-hash rate
_CARD_SPLIT_DEN = 5

# The quality-score SQL twin lives in plans/pipelines.py (loaded before
# this module; no import cycle — pipelines does not import curation).
from data_algorithms_with_pyspark_spark.plans.pipelines import (  # noqa: E402
    _quality_score_sql as _quality_score_sql_shared,
)


@register(
    "corpus_dataset_card",
    tags=("pipeline", "quality", "reporting"),
    description="Dataset card manifest — the release artifact an LLM-data "
    "drop ships: global corpus stats (docs, distinct content hashes, "
    "tokens, chars, mean quality on the 1e4 grid, leakage-safe test-split "
    "size) + per-lang and per-source doc counts, as one long-form "
    "(section, metric, value) relation; ONE feature projection feeds "
    "three small aggregates, everything integer-exact",
    oracle=f"""
        WITH featured AS (
            SELECT lang, source,
                   CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(floor(({_quality_score_sql_shared()}) * 10000 + 0.5)
                        AS BIGINT) AS q_e4,
                   md5({_NORMALIZED_SQL}) AS content_hash,
                   CASE WHEN ('0x' || substring(md5({_NORMALIZED_SQL}), 1, 6))
                             ::BIGINT * {_CARD_SPLIT_DEN}
                             < {16**6} * {_CARD_SPLIT_NUM}
                        THEN 1 ELSE 0 END AS is_test
            FROM documents
        )
        SELECT 'global' AS section, metric, value FROM (
            SELECT unnest(['n_docs', 'n_distinct_hashes', 'total_tokens',
                           'total_chars', 'mean_quality_e4',
                           'n_test_docs']) AS metric,
                   unnest([CAST(count(*) AS BIGINT),
                           CAST(count(DISTINCT content_hash) AS BIGINT),
                           CAST(sum(n_tokens) AS BIGINT),
                           CAST(sum(n_chars) AS BIGINT),
                           CAST(sum(q_e4) // count(*) AS BIGINT),
                           CAST(sum(is_test) AS BIGINT)]) AS value
            FROM featured
        )
        UNION ALL
        SELECT 'lang', lang, CAST(count(*) AS BIGINT)
        FROM featured GROUP BY lang
        UNION ALL
        SELECT 'source', source, CAST(count(*) AS BIGINT)
        FROM featured GROUP BY source
    """,
)
def corpus_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One long-form manifest a data release attaches: corpus size,
    exact-dup rate inputs (distinct content hashes), token/char volume,
    mean quality (1e4 grid, integer division — engine-exact), the
    leakage-safe test-split size (same content-hash rational-rate draw
    as documents_leakage_safe_split), and per-lang / per-source doc
    counts. ONE projection computes every per-doc feature; it is
    persisted and feeds one global aggregate (partial-combined 1-row),
    one per-lang and one per-source hash aggregate — all three outputs
    are |distinct-values|-sized, unioned into the (section, metric,
    value) long form every card renderer consumes."""
    from data_algorithms_with_pyspark_spark.operators.text import (
        curation_features,
    )

    docs = load_table(spark, sf_dir, "documents")
    u = F.conv(F.substring("content_hash", 1, 6), 16, 10).cast("long")
    featured = curation_features(
        docs,
        keep_cols=("lang", "source"),
        features=("n_tokens", "n_chars", "quality_score", "content_hash"),
    ).select(
        "lang",
        "source",
        "n_tokens",
        "n_chars",
        # 1e4 grid — the repo's established quality quantization; 1e6 is
        # finer than the double expression's cross-engine agreement (one
        # flipped floor per ~1e5 docs bit the sf0.1 check)
        F.floor(F.col("quality_score") * 10_000 + F.lit(0.5))
        .cast("long")
        .alias("q_e4"),
        "content_hash",
        F.when(
            u * F.lit(_CARD_SPLIT_DEN) < F.lit(16**6 * _CARD_SPLIT_NUM), 1
        )
        .otherwise(0)
        .alias("is_test"),
    ).persist()
    g = featured.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("content_hash").alias("n_distinct_hashes"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("q_e4").cast("long").alias("_sum_q"),
        F.sum("is_test").cast("long").alias("n_test_docs"),
    ).withColumn(
        # exact integer floor division — (sum/count).cast("long") rounds
        # the DOUBLE quotient first and can differ by one micro-unit
        # from the oracle's BIGINT // (bit at sf0.1)
        "mean_quality_e4",
        F.expr("_sum_q DIV n_docs"),
    )
    metrics = [
        "n_docs",
        "n_distinct_hashes",
        "total_tokens",
        "total_chars",
        "mean_quality_e4",
        "n_test_docs",
    ]
    global_rows = g.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("metric"), F.col(m).alias("value")
                    )
                    for m in metrics
                ]
            )
        ).alias("kv")
    ).select(
        F.lit("global").alias("section"),
        F.col("kv.metric").alias("metric"),
        F.col("kv.value").alias("value"),
    )
    lang_rows = featured.groupBy("lang").agg(
        F.count("*").alias("value")
    ).select(
        F.lit("lang").alias("section"),
        F.col("lang").alias("metric"),
        "value",
    )
    source_rows = featured.groupBy("source").agg(
        F.count("*").alias("value")
    ).select(
        F.lit("source").alias("section"),
        F.col("source").alias("metric"),
        "value",
    )
    return global_rows.unionByName(lang_rows).unionByName(source_rows)


_BJOIN_M = 65536
_BJOIN_K = 3
_BJOIN_NATIONS = (3, 8, 13, 18, 23)  # the Q21 nation group, ~1/5 of customers


def _bjoin_pos_sql(expr: str) -> str:
    """DuckDB twin of bloom_positions at the join pre-filter's m."""
    lanes = ", ".join(
        f"('0x' || substring(md5({expr}), {1 + 8 * i}, 8))::BIGINT % {_BJOIN_M}"
        for i in range(_BJOIN_K)
    )
    return f"[{lanes}]"


@register(
    "orders_bloom_prefilter_join",
    tags=("sketch", "join", "relational"),
    description=f"Bloom-prefiltered fact/dim join audit (m={_BJOIN_M}, "
    f"k={_BJOIN_K}): build the filter over a selective customer subset's "
    "keys, probe every distinct orders key BEFORE the join, and report the "
    "key- and row-level pass/true/false-positive counts plus the "
    "must-be-zero false-negative count — the sketch-semi-join that prunes "
    "a 100 TB fact scan down to near-matching rows before any shuffle",
    oracle=f"""
        WITH dim AS (
            SELECT c_custkey FROM customer
            WHERE c_nationkey % 25 IN {_BJOIN_NATIONS!r}
        ),
        bloom AS (
            SELECT DISTINCT pos FROM (
                SELECT unnest({_bjoin_pos_sql('CAST(c_custkey AS VARCHAR)')})
                    AS pos
                FROM dim
            )
        ),
        okeys AS (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY o_custkey
        ),
        probe AS (
            SELECT o_custkey,
                   unnest({_bjoin_pos_sql('CAST(o_custkey AS VARCHAR)')})
                       AS pos
            FROM okeys
        ),
        verdict AS (
            SELECT p.o_custkey, (count(b.pos) = {_BJOIN_K}) AS in_bloom
            FROM probe p LEFT JOIN bloom b USING (pos)
            GROUP BY p.o_custkey
        ),
        keyed AS (
            SELECT k.o_custkey, k.n_orders, v.in_bloom,
                   (d.c_custkey IS NOT NULL) AS in_dim
            FROM okeys k
            JOIN verdict v USING (o_custkey)
            LEFT JOIN dim d ON k.o_custkey = d.c_custkey
        )
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(CASE WHEN in_bloom THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_keys_pass,
               CAST(sum(CASE WHEN in_dim THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_keys_true,
               CAST(sum(CASE WHEN in_bloom AND NOT in_dim THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_keys_false_pos,
               CAST(sum(CASE WHEN in_dim AND NOT in_bloom THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_false_negatives,
               CAST(sum(n_orders) AS BIGINT) AS n_orders,
               CAST(sum(CASE WHEN in_bloom THEN n_orders ELSE 0 END)
                   AS BIGINT) AS n_orders_pass,
               CAST(sum(CASE WHEN in_dim THEN n_orders ELSE 0 END) AS BIGINT)
                   AS n_orders_true
        FROM keyed
    """,
)
def orders_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-semi-join a 100 TB fact/dim join wants when the dim is
    selective but too big to broadcast whole: build the md5-lane Bloom
    over the dim's join keys (<= m rows however large the dim), probe
    the fact's DISTINCT keys against it (one equi-join against the
    broadcastable positions table), and only bloom-passing rows proceed
    to the exact join — the manual form of the
    spark.sql.optimizer.runtime.bloomFilter rewrite session.py enables,
    made auditable: the report quantifies key- and row-level pruning,
    the false-positive overshoot the exact join must still discard, and
    the FALSE-NEGATIVE count, which the no-false-negative Bloom property
    guarantees is zero (the oracle recomputes it — a broken hash lane
    would surface here, not as silently missing join rows). All counts
    integer-exact; fact rows aggregate per key FIRST, so the audit's
    joins are key-sized."""
    from data_algorithms_with_pyspark_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = customer.where(
        (F.col("c_nationkey") % 25).isin(*_BJOIN_NATIONS)
    ).select("c_custkey")
    bloom = bloom_build(dim, "c_custkey", m=_BJOIN_M, k=_BJOIN_K)
    okeys = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    verdict = bloom_probe(okeys, "o_custkey", bloom, m=_BJOIN_M, k=_BJOIN_K)
    keyed = (
        okeys.join(verdict, "o_custkey")
        .join(
            F.broadcast(dim.withColumn("_in_dim", F.lit(1))),
            okeys.o_custkey == dim.c_custkey,
            "left",
        )
        .select(
            "n_orders",
            "in_bloom",
            F.col("_in_dim").isNotNull().alias("in_dim"),
        )
    )
    b = F.col("in_bloom")
    d = F.col("in_dim")
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("long")  # noqa: E731
    return keyed.agg(
        F.count("*").alias("n_keys"),
        one(b).alias("n_keys_pass"),
        one(d).alias("n_keys_true"),
        one(b & ~d).alias("n_keys_false_pos"),
        one(d & ~b).alias("n_false_negatives"),
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.sum(F.when(b, F.col("n_orders")).otherwise(0))
        .cast("long")
        .alias("n_orders_pass"),
        F.sum(F.when(d, F.col("n_orders")).otherwise(0))
        .cast("long")
        .alias("n_orders_true"),
    )
