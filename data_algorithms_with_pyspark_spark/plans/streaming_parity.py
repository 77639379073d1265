"""Driver-attestable Structured Streaming parity queries.

Every query here drives a REAL ``StreamingQuery`` to completion inside the
catalog's ``(spark, sf_dir) -> DataFrame`` contract: the events parquet is
replayed through a file-source stream (``readStream``, explicit schema,
``maxFilesPerTrigger=1`` so the run spans several micro-batches), the
streaming aggregation runs under ``trigger(availableNow=True)`` into a
memory sink, and the function returns the sink's content formatted for the
cross-engine compare. The DuckDB oracle replays the same semantics as pure
batch SQL — so a green driver row attests the streaming engine itself
(micro-batch planning, watermarking, windowed state), not just the batch
twin (VERDICT r5 "What's missing" #1).

Scale notes: these are the same bounded-state plans ``streaming/events.py``
documents — tumbling/session window state is keyed by (window, group) and
closed by the watermark; the memory sink here stands in for the production
kafka/parquet sink and holds only the AGGREGATED output (hours x types,
sessions x users), never raw events.

Reference parity: the reference has no streaming surface at all
(SURVEY.md §2.11 — extension); semantics mirror the batch queries
``plans/events.py:events_hourly_windows`` / ``events_sessionization``.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.scratch import scratch_mkdtemp
from data_algorithms_with_pyspark_spark.plans.catalog import register
from data_algorithms_with_pyspark_spark.sources.readers import load_table

__all__ = [
    "streaming_hourly_windows_parity",
    "streaming_session_windows_parity",
    "streaming_sliding_windows_parity",
    "streaming_cdc_sink_parity",
    "streaming_stream_join_parity",
    "streaming_stateful_totals_parity",
    "streaming_append_sessions_parity",
    "streaming_append_hourly_parity",
    "streaming_append_sliding_parity",
    "streaming_restart_recovery_parity",
    "streaming_pyds_source_parity",
]

# One stream-source dir per (process, sf_dir): the events parquet rewritten
# with a session-time TIMESTAMP ts (the raw testdata may carry nanos, which
# the streaming file source rejects) and split into several files so
# maxFilesPerTrigger=1 yields a genuinely multi-batch run.
#
# ALL of these source caches key on sf_dir plus a (size, mtime_ns)
# fingerprint of events.parquet (sources/readers.table_fingerprint), never
# the bare path: events regenerated in place within one process must
# rebuild the derived files, not replay stale ones (ADVICE r8, closed as
# a class for _SRC/_ORDERED_SRC/_FLUSHED_SRC here and plans/maintenance).
_SRC_CACHE: dict[str, str] = {}
_SINK_SEQ = itertools.count()

# Per-prefix state-store telemetry from the MOST RECENT terminated
# StreamingQuery: {"max_state_rows": N, "max_state_bytes": B,
# "n_batches": K}, maxed over the run's progress events. Observability
# only — no query semantics read it; the sf10 scale panel
# (scripts/sf10_panel_r11.py) uses it to put "state is bounded by the
# watermark" on the record as a measured number instead of a design
# claim (VERDICT r10 #5).
STATE_METRICS: dict[str, dict[str, int]] = {}


def _record_state_metrics(prefix: str, q) -> None:
    rows = 0
    bytes_ = 0
    dropped = 0
    batches = 0
    for p in q.recentProgress:
        batches += 1
        for op in p.stateOperators or ():
            rows = max(rows, int(op.numRowsTotal or 0))
            bytes_ = max(bytes_, int(op.memoryUsedBytes or 0))
            dropped += int(op.numRowsDroppedByWatermark or 0)
    STATE_METRICS[prefix] = {
        "max_state_rows": rows,
        "max_state_bytes": bytes_,
        "rows_dropped_by_watermark": dropped,
        "n_batches": batches,
    }


def _events_src_key(sf_dir: str) -> str:
    from data_algorithms_with_pyspark_spark.sources.readers import (
        table_fingerprint,
    )

    return f"{sf_dir}|{table_fingerprint(sf_dir, 'events')}"


def _events_stream_source(spark: SparkSession, sf_dir: str) -> str:
    key = _events_src_key(sf_dir)
    path = _SRC_CACHE.get(key)
    if path is not None and os.path.isdir(path):
        return path
    out = scratch_mkdtemp(prefix="events_stream_src_")
    # 4 files -> 4 availableNow micro-batches at maxFilesPerTrigger=1:
    # the aggregation state must survive and merge across batches for the
    # parity to hold, which is exactly what this query attests.
    load_table(spark, sf_dir, "events").repartition(4).write.mode(
        "overwrite"
    ).parquet(out)
    _SRC_CACHE[key] = out
    return out


def _run_complete(stream_df: DataFrame, prefix: str) -> str:
    """Run a streaming aggregation over all available input (availableNow)
    into a uniquely-named memory sink in COMPLETE mode; return the sink's
    table name once the query has terminated."""
    name = f"{prefix}_{next(_SINK_SEQ)}"
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _record_state_metrics(prefix, q)
    return name


# Time-ORDERED stream source (separate cache): files hold disjoint
# ascending ts ranges and carry strictly increasing mtimes, so the file
# source replays the month in order — the arrival pattern under which a
# watermark never drops in-time data (stream-stream joins REQUIRE
# watermarks; the random-split source above would lose late batches).
_ORDERED_SRC_CACHE: dict[str, str] = {}


def _events_stream_source_ordered(spark: SparkSession, sf_dir: str) -> str:
    key = _events_src_key(sf_dir)
    path = _ORDERED_SRC_CACHE.get(key)
    if path is not None and os.path.isdir(path):
        return path
    out = scratch_mkdtemp(prefix="events_stream_ordered_")
    load_table(spark, sf_dir, "events").repartitionByRange(
        4, F.col("ts")
    ).write.mode("overwrite").parquet(out)
    # part-0000i name order == ts-range order; bump mtimes to match so
    # the source's (modTime, path) ordering is unambiguous
    import time as _time

    now = _time.time()
    for i, name in enumerate(sorted(os.listdir(out))):
        if name.startswith("part-"):
            os.utime(os.path.join(out, name), (now + i, now + i))
    _ORDERED_SRC_CACHE[key] = out
    return out


def _run_update(stream_df: DataFrame, prefix: str) -> str:
    """availableNow run into an update-mode memory sink (appends each
    batch's updated rows); returns the sink table name."""
    name = f"{prefix}_{next(_SINK_SEQ)}"
    q = (
        stream_df.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _record_state_metrics(prefix, q)
    return name


def _run_append(stream_df: DataFrame, prefix: str) -> str:
    """availableNow run into an append-mode memory sink; returns the
    sink table name after termination."""
    name = f"{prefix}_{next(_SINK_SEQ)}"
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _record_state_metrics(prefix, q)
    return name


@register(
    "streaming_hourly_windows_parity",
    tags=("streaming", "window", "events"),
    description="REAL StreamingQuery: tumbling 1-hour event-time windows "
    "per event type with a 2h watermark, driven over a 4-file parquet "
    "stream (availableNow, maxFilesPerTrigger=1) into a memory sink — the "
    "oracle replays the result as batch SQL, attesting multi-batch "
    "windowed-state merging end-to-end",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               CAST(sum(CAST(floor((value) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def streaming_hourly_windows_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of events_hourly_windows executed AS A STREAM.

    KEPT DELIBERATELY as the replay-order fixture (VERDICT r8 #6): the
    RANDOM-split source + complete mode attest window-state merging under
    arbitrary batch arrival order, which the watermarked append twin
    (``streaming_append_hourly_parity`` — the bounded-state production
    shape) cannot, since its ts-ordered source never delivers
    out-of-order batches. Complete mode holds the result table in driver
    memory — a test-fixture shape only, never the 100 TB configuration.

    The aggregation keeps integer-cent partial sums inside the streaming
    state (order-independent across micro-batches — catalog.cents_sum's
    rule applies doubly here, where accumulation order varies with file
    arrival); the /100.0 money formatting happens on the sink table.
    Tumbling windows come from ``F.window`` (epoch-aligned), which agrees
    with date_trunc('hour') in any whole-hour-offset session timezone.
    """
    from data_algorithms_with_pyspark_spark.schemas import TABLE_SCHEMAS

    src = _events_stream_source(spark, sf_dir)
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_cents"
            ),
        )
    )
    sink = _run_complete(agg, "hourly_parity")
    return spark.table(sink).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        (F.col("sum_cents") / 100.0).alias("sum_value"),
    )


@register(
    "streaming_session_windows_parity",
    tags=("streaming", "window", "events"),
    description="REAL StreamingQuery: native session_window (30 min gap) "
    "sessionization per user over the multi-batch parquet stream, memory "
    "sink in complete mode; per-user session/event counts replayed by a "
    "batch gaps-and-islands oracle with the session_window boundary rule "
    "(gap >= 30 min closes the session)",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(sum(is_new) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM marked
        GROUP BY user_id
    """,
)
def streaming_session_windows_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Native ``session_window`` run as a real stream, reduced to per-user
    (n_sessions, n_events).

    Boundary semantics differ from the batch ``sessionize`` query ON
    PURPOSE: session_window merges two events iff their [t, t+gap)
    windows OVERLAP, so a gap of exactly 30 minutes starts a NEW session
    (>= in the oracle), whereas events_sessionization's lag rule uses
    strict >. Both are valid gap conventions; the oracle here replays the
    native operator's.
    """
    from data_algorithms_with_pyspark_spark.schemas import TABLE_SCHEMAS

    src = _events_stream_source(spark, sf_dir)
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # No watermark: the 4 source files are a random row split, so any
    # watermark advanced by batch 1 would DROP most of batches 2-4 as
    # late (observed: ~half the events lost and sessions failing to
    # merge). Complete mode keeps all session state, which is exactly
    # the replay-out-of-order semantics this parity check needs; the
    # watermarked/bounded-state variant is covered by
    # streaming/events.py:streaming_session_windows + its test.
    sessions = stream.groupBy(
        F.session_window("ts", "30 minutes").alias("w"), "user_id"
    ).agg(F.count("*").alias("n_events"))
    sink = _run_complete(sessions, "sessions_parity")
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )


@register(
    "streaming_sliding_windows_parity",
    tags=("streaming", "window", "events"),
    description="REAL StreamingQuery: SLIDING 1h/30min event-time windows "
    "per event type (each event in exactly 2 epoch-aligned windows, 2 "
    "open window states per group closed as batches advance) over the "
    "4-file multi-batch stream into a complete-mode memory sink; the "
    "oracle replays the window expansion as batch SQL",
    oracle="""
        WITH w AS (
            SELECT make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800
                                        - 1800 * i) AS BIGINT) * 1000000)
                       AS window_start,
                   event_type, value
            FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) offsets
        )
        SELECT window_start, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(floor((value) * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   / 100.0 AS sum_value
        FROM w
        GROUP BY window_start, event_type
    """,
)
def streaming_sliding_windows_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Streaming twin of events_sliding_windows executed AS A STREAM —
    the overlapping-window state exercise (two live windows per
    (window, type) group instead of tumbling's one). Same integer-cent
    in-state aggregation and watermark as the hourly parity query.
    KEPT as the replay-order fixture next to the bounded-state append
    twin ``streaming_append_sliding_parity`` — see
    streaming_hourly_windows_parity's docstring for the rationale."""
    from data_algorithms_with_pyspark_spark.schemas import TABLE_SCHEMAS

    src = _events_stream_source(spark, sf_dir)
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_cents"
            ),
        )
    )
    sink = _run_complete(agg, "sliding_parity")
    return spark.table(sink).select(
        F.col("w.start").alias("window_start"),
        "event_type",
        "n_events",
        (F.col("sum_cents") / 100.0).alias("sum_value"),
    )


@register(
    "streaming_stream_join_parity",
    tags=("streaming", "join", "events"),
    description="REAL stream-STREAM inner join (clicks x purchases, "
    "1h event-time range condition, 2h watermarks bounding both sides' "
    "state) over the time-ordered 4-file stream, append-mode memory "
    "sink — the oracle replays the interval join as one batch SQL "
    "self-join",
    oracle="""
        SELECT p.user_id,
               p.event_id AS purchase_id,
               c.event_id AS click_id,
               p.ts AS purchase_ts,
               c.ts AS click_ts,
               CAST(floor(p.value * 100 + 0.5) AS BIGINT) AS purchase_cents
        FROM events p
        JOIN events c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts
         AND c.ts >= p.ts - INTERVAL 1 HOUR
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
)
def streaming_stream_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """streaming/events.py:streaming_click_purchase_join driven to
    completion: two independent file-source streams over the SAME
    time-ordered directory (clicks filter, purchases filter), joined
    with the event-time range condition. Inner stream-stream joins emit
    matches in the micro-batch where both sides have arrived; with
    in-order arrival the 2h watermark (eviction horizon, > the 1h join
    horizon + one batch of slack) never evicts a click that a later
    purchase still needs — so the append sink accumulates EXACTLY the
    batch interval join, which the oracle replays. This is the state-
    bounding contract of production stream-stream joins, attested
    cross-engine."""
    from data_algorithms_with_pyspark_spark.schemas import TABLE_SCHEMAS
    from data_algorithms_with_pyspark_spark.streaming.events import (
        streaming_click_purchase_join,
    )

    src = _events_stream_source_ordered(spark, sf_dir)

    def read():
        return (
            spark.readStream.schema(TABLE_SCHEMAS["events"])
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    clicks = read().where(F.col("event_type") == "click")
    purchases = read().where(F.col("event_type") == "purchase")
    joined = streaming_click_purchase_join(
        clicks, purchases, horizon="1 hour", watermark="2 hours"
    )
    sink = _run_append(joined, "ss_join_parity")
    return spark.table(sink).select(
        "user_id",
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        F.floor(F.col("purchase_value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("purchase_cents"),
    )


@register(
    "streaming_stateful_totals_parity",
    tags=("streaming", "stateful", "events"),
    description="REAL applyInPandasWithState StreamingQuery: per-user "
    "running (count, integer-cent total) state updated across the 4 "
    "micro-batches, update-mode memory sink; the FINAL state per user "
    "(max event count row) must equal the batch per-user aggregate the "
    "oracle computes — attests the custom-stateful-operator path "
    "(Arrow-batched state updates) end-to-end",
    oracle="""
        SELECT user_id,
               count(*) AS n_events,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   / 100.0 AS total_value
        FROM events
        GROUP BY user_id
    """,
)
def streaming_stateful_totals_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """streaming/events.py:streaming_user_running_totals driven to
    completion. The update-mode sink holds one row per (user, batch
    that touched the user); n_events is strictly increasing per user,
    so max(struct(n_events, total_value)) picks the final state
    deterministically. The state's integer-cent lane makes the totals
    independent of how the random file split batches each user's rows —
    the same order-independence rule the windowed parities rely on,
    here inside CUSTOM state."""
    from data_algorithms_with_pyspark_spark.schemas import TABLE_SCHEMAS
    from data_algorithms_with_pyspark_spark.streaming.events import (
        streaming_user_running_totals,
    )

    src = _events_stream_source(spark, sf_dir)
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    totals = streaming_user_running_totals(stream)
    sink = _run_update(totals, "stateful_totals_parity")
    # final state = the max-n_events row per user; rank-1 window filter
    # plans as WindowGroupLimit (a max(struct(...)) aggregate would carry
    # a struct buffer and fall back to SortAggregate — the ivf_assign
    # lesson, enforced by the plan lint)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        spark.table(sink)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


@register(
    "streaming_cdc_sink_parity",
    tags=("streaming", "merge", "cdc"),
    description="REAL StreamingQuery through the foreachBatch CDC merge "
    "sink (streaming/events.py:stream_cdc_sink): the orders_cdc_replay "
    "changelog split into three seq-ordered micro-batch files, applied "
    "batch-by-batch onto the parquet snapshot with checkpointed "
    "exactly-once replay — the final serving table matches the batch "
    "MERGE oracle exactly",
    oracle="""
        WITH base AS (
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
            FROM orders
        ),
        target AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
        changelog AS (
            SELECT o_orderkey, o_custkey, o_orderstatus, price_cents,
                   'I' AS op, CAST(1 AS BIGINT) AS seq
            FROM base WHERE o_orderkey % 7 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, price_cents + 100,
                   'U', CAST(1 AS BIGINT)
            FROM base WHERE o_orderkey % 5 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, price_cents + 250,
                   'U', CAST(2 AS BIGINT)
            FROM base WHERE o_orderkey % 5 = 0
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, price_cents,
                   'D', CAST(3 AS BIGINT)
            FROM base WHERE o_orderkey % 11 = 0
        ),
        latest AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY o_orderkey ORDER BY seq DESC
                ) AS rn FROM changelog
            ) WHERE rn = 1
        ),
        merged AS (
            SELECT t.* FROM target t
            WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM latest)
            UNION ALL
            SELECT o_orderkey, o_custkey, o_orderstatus, price_cents
            FROM latest WHERE op <> 'D'
        )
        SELECT o_orderstatus,
               count(*) AS n_orders,
               CAST(sum(price_cents) AS BIGINT) AS total_cents
        FROM merged GROUP BY o_orderstatus
    """,
)
def streaming_cdc_sink_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders_cdc_replay executed AS A STREAM: the same derived I/U/D
    changelog, but arriving as three micro-batches (one file per seq
    epoch, written sequentially so the file source's (mtime, path) order
    replays them in seq order) through ``stream_cdc_sink`` — a real
    ``foreachBatch`` StreamingQuery with a checkpoint, upserting each
    batch into the parquet serving table. Because batch i carries
    exactly the seq-i images, "later batches win by application order"
    coincides with the batch MERGE's "highest seq wins": the final table
    — and therefore the per-status report — is bit-identical to
    orders_cdc_replay's (same oracle). Fresh target/checkpoint/source
    dirs per invocation keep the replay self-contained.

    Within batch 1, keys in both the I and U seq-1 images (%35) are an
    intra-batch tie the window breaks arbitrarily — immaterial, since
    batch 2's seq-2 update overwrites every %5 key."""
    import glob
    import shutil

    from data_algorithms_with_pyspark_spark.streaming.events import (
        stream_cdc_sink,
    )

    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_cents"),
    )
    key = F.col("o_orderkey")

    def image(where, price, op, seq):
        return base.where(where).select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            price.cast("long").alias("price_cents"),
            F.lit(op).alias("op"),
            F.lit(seq).cast("long").alias("seq"),
        )

    price = F.col("price_cents")
    batches = [
        image(key % 7 == 0, price, "I", 1).unionByName(
            image(key % 5 == 0, price + 100, "U", 1)
        ),
        image(key % 5 == 0, price + 250, "U", 2),
        image(key % 11 == 0, price, "D", 3),
    ]
    root = scratch_mkdtemp(prefix="cdc_stream_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    for i, b in enumerate(batches, 1):
        staging = os.path.join(root, f"stage_{i}")
        b.coalesce(1).write.mode("overwrite").parquet(staging)
        part = glob.glob(os.path.join(staging, "part-*.parquet"))[0]
        # sequential writes -> strictly later mtimes AND ascending names:
        # the file source's (timestamp, path) order replays seq order
        shutil.move(part, os.path.join(src, f"{i:02d}.parquet"))
    target_path = os.path.join(root, "target")
    base.where(key % 7 != 0).write.parquet(target_path)
    changelog_stream = (
        spark.readStream.schema(
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "price_cents long, op string, seq long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    stream_cdc_sink(
        changelog_stream,
        target_path,
        keys=["o_orderkey"],
        checkpoint_dir=os.path.join(root, "ckpt"),
    )
    return (
        spark.read.parquet(target_path)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("price_cents").alias("total_cents"),
        )
    )


# --- round 8: watermarked append-mode + restart recovery ---------------------
#
# Both queries below run in APPEND mode with a real watermark — the
# production state shape (state bounded by the watermark, emitted once,
# then evicted), unlike the complete-mode rows above whose state holds
# every window for the life of the query. Append emission needs the
# watermark to PASS a window/session end before the row leaves the state
# store, and the watermark only advances between micro-batches — so after
# the last real file the trailing windows would sit unemitted forever.
# The source builder therefore appends TWO single-row sentinel "flush"
# files far beyond max(ts): flush-1's batch closes everything real
# (watermark has passed max real ts once flush-1 is seen... at flush-2's
# batch), flush-2's batch closes flush-1's own window; both sentinel rows
# are filtered out of the result. Two files make the drain independent of
# whether the engine schedules a trailing no-data batch.

_FLUSH_USER = -1


def _write_ts_split_files(
    spark: SparkSession, sf_dir: str, dest: str, n_files: int = 4
) -> int:
    """Write the events table as ``n_files`` ts-range part files plus two
    sentinel flush files into ``dest``, named/mtimed in ts order for the
    file source. Returns the number of REAL (non-flush) files."""
    import glob
    import shutil
    import time as _time

    events = load_table(spark, sf_dir, "events")
    staging = scratch_mkdtemp(prefix="events_split_stage_")
    events.repartitionByRange(n_files, F.col("ts")).write.mode(
        "overwrite"
    ).parquet(staging)
    parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
    max_ts = events.agg(F.max("ts").alias("m")).collect()[0]["m"]
    flush_stage = scratch_mkdtemp(prefix="events_flush_stage_")
    from datetime import timedelta

    from data_algorithms_with_pyspark_spark.schemas import TABLE_SCHEMAS

    for j in (1, 2):
        row = [
            (
                -j,
                max_ts + timedelta(days=30 * j),
                _FLUSH_USER,
                "__flush__",
                0.0,
                None,
            )
        ]
        spark.createDataFrame(row, TABLE_SCHEMAS["events"]).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(flush_stage, str(j)))
        parts.append(
            glob.glob(os.path.join(flush_stage, str(j), "part-*.parquet"))[0]
        )
    now = _time.time()
    os.makedirs(dest, exist_ok=True)
    for i, p in enumerate(parts):
        tgt = os.path.join(dest, f"{i:05d}.parquet")
        shutil.copy(p, tgt)
        os.utime(tgt, (now + i, now + i))
    shutil.rmtree(staging)
    shutil.rmtree(flush_stage)
    return len(parts) - 2


_FLUSHED_SRC_CACHE: dict[str, str] = {}


def _events_stream_source_flushed(spark: SparkSession, sf_dir: str) -> str:
    key = _events_src_key(sf_dir)
    path = _FLUSHED_SRC_CACHE.get(key)
    if path is not None and os.path.isdir(path):
        return path
    out = scratch_mkdtemp(prefix="events_stream_flushed_")
    _write_ts_split_files(spark, sf_dir, out)
    _FLUSHED_SRC_CACHE[key] = out
    return out


@register(
    "streaming_append_sessions_parity",
    tags=("streaming", "window", "events", "watermark"),
    description="REAL StreamingQuery in APPEND mode: watermarked "
    "session_window (30 min gap) sessionization over the ts-ordered "
    "multi-batch stream — state is bounded by the watermark and every "
    "session emits exactly once when closed; sentinel flush batches drain "
    "tail; oracle replays the session-boundary rule as batch SQL",
    oracle="""
        WITH marked AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                        THEN 1 ELSE 0 END AS is_new
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(sum(is_new) AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM marked
        GROUP BY user_id
    """,
)
def streaming_append_sessions_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The PRODUCTION shape of streaming sessionization (VERDICT r7 #6):
    append output mode + a real 30-minute watermark, so the state store
    holds only OPEN sessions — each closes and emits exactly once as the
    watermark passes its end, then its state is evicted. (The
    complete-mode row streaming_session_windows_parity attests the same
    operator with unbounded replay state; this row attests the bounded
    production configuration.)

    The ts-ordered source makes the watermark safe: file i+1's rows are
    all >= file i's max, so nothing is ever late; two sentinel flush
    batches push the watermark past every real session end, draining the
    tail (filtered out below). Session boundary convention matches the
    native operator: a gap of exactly the 30-min window starts a new
    session (>= in the oracle)."""
    from data_algorithms_with_pyspark_spark.schemas import TABLE_SCHEMAS

    src = _events_stream_source_flushed(spark, sf_dir)
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    sink = _run_append(sessions, "append_sessions_parity")
    return (
        spark.table(sink)
        .where(F.col("user_id") != _FLUSH_USER)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
        )
    )


@register(
    "streaming_append_hourly_parity",
    tags=("streaming", "window", "events", "watermark"),
    description="REAL StreamingQuery in APPEND mode: tumbling 1-hour "
    "event-time windows per event type with a 2h watermark over the "
    "ts-ordered multi-batch stream — each window emits exactly once when "
    "the watermark passes its end and its state is evicted (the bounded-"
    "state production shape of streaming_hourly_windows_parity, whose "
    "complete-mode sink holds the whole result table in driver memory); "
    "sentinel flush batches drain the tail; batch-SQL oracle",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               CAST(sum(CAST(floor((value) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def streaming_append_hourly_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Append twin of the tumbling-hourly parity row (VERDICT r8 #6): the
    state store holds only OPEN windows — closed (window, event_type)
    groups emit once and are evicted, so state is bounded by the
    watermark lag, never by the result size. The ts-ordered flushed
    source makes the watermark safe (file i+1's rows all >= file i's
    max, nothing late); the two sentinel flush batches push the
    watermark past every real window end so the tail drains (their own
    rows are filtered from the sink). Same integer-cent in-state sums
    as the complete-mode twin (order-independent across micro-batches).
    """
    from data_algorithms_with_pyspark_spark.schemas import TABLE_SCHEMAS

    src = _events_stream_source_flushed(spark, sf_dir)
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_cents"
            ),
        )
    )
    sink = _run_append(agg, "append_hourly_parity")
    return (
        spark.table(sink)
        .where(F.col("event_type") != "__flush__")
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            (F.col("sum_cents") / 100.0).alias("sum_value"),
        )
    )


@register(
    "streaming_append_sliding_parity",
    tags=("streaming", "window", "events", "watermark"),
    description="REAL StreamingQuery in APPEND mode: SLIDING 1h/30min "
    "event-time windows per event type (each event in exactly 2 epoch-"
    "aligned windows) with a 2h watermark over the ts-ordered stream — "
    "every window emits exactly once at watermark passage, overlapping "
    "open windows are the only state (bounded production shape of "
    "streaming_sliding_windows_parity); sentinel flush batches drain the "
    "tail; the oracle replays the window expansion as batch SQL",
    oracle="""
        WITH w AS (
            SELECT make_timestamp(CAST((floor(epoch(ts) / 1800) * 1800
                                        - 1800 * i) AS BIGINT) * 1000000)
                       AS window_start,
                   event_type, value
            FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) offsets
        )
        SELECT window_start, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(floor((value) * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   / 100.0 AS sum_value
        FROM w
        GROUP BY window_start, event_type
    """,
)
def streaming_append_sliding_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Append twin of the sliding-window parity row (VERDICT r8 #6):
    overlapping windows mean up to ~2 h/30 min + watermark-lag of open
    window states per event type at any moment — still O(watermark), not
    O(result) as in the complete-mode twin. Emission is exactly-once per
    (window, event_type); flush sentinel rows close every real window
    and are filtered from the sink."""
    from data_algorithms_with_pyspark_spark.schemas import TABLE_SCHEMAS

    src = _events_stream_source_flushed(spark, sf_dir)
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
                "sum_cents"
            ),
        )
    )
    sink = _run_append(agg, "append_sliding_parity")
    return (
        spark.table(sink)
        .where(F.col("event_type") != "__flush__")
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            (F.col("sum_cents") / 100.0).alias("sum_value"),
        )
    )


_REDELIVERED_SRC_CACHE: dict[str, str] = {}


def _events_stream_source_redelivered(spark: SparkSession, sf_dir: str) -> str:
    """An AT-LEAST-ONCE delivery of the events stream: the ts-ordered
    split layout with every real part file redelivered once — file i's
    byte-identical copy arrives as the immediately-next micro-batch, the
    way an at-least-once bus re-sends an unacked batch. Flush sentinels
    stay single. Fingerprint-keyed cache like the other source builders."""
    import shutil

    key = _events_src_key(sf_dir)
    path = _REDELIVERED_SRC_CACHE.get(key)
    if path is not None and os.path.isdir(path):
        return path
    staging = scratch_mkdtemp(prefix="events_redeliver_stage_")
    n_real = _write_ts_split_files(spark, sf_dir, staging)
    out = scratch_mkdtemp(prefix="events_stream_redelivered_")
    import glob
    import time as _time

    parts = sorted(glob.glob(os.path.join(staging, "*.parquet")))
    now = _time.time()
    seq = 0
    for i, p in enumerate(parts):
        copies = 2 if i < n_real else 1
        for _ in range(copies):
            tgt = os.path.join(out, f"{seq:05d}.parquet")
            shutil.copy(p, tgt)
            os.utime(tgt, (now + seq, now + seq))
            seq += 1
    shutil.rmtree(staging)
    _REDELIVERED_SRC_CACHE[key] = out
    return out


@register(
    "streaming_dedup_parity",
    tags=("streaming", "dedup", "events", "watermark"),
    description="REAL StreamingQuery: dropDuplicatesWithinWatermark over "
    "an AT-LEAST-ONCE source (every micro-batch redelivered once, 2x rows "
    "ingested) repairs the stream to exactly-once — per-type counts, "
    "distinct users, and integer-cent value sums match the original "
    "events table, proving every redelivered row was dropped; dedup state "
    "is bounded by the 2h watermark",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS value_cents
        FROM events GROUP BY event_type
    """,
)
def streaming_dedup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-least-once -> exactly-once repair, attested end to end: the
    source redelivers every real file once (2x rows in), and
    ``streaming/events.streaming_dedup_within_watermark`` admits each
    event_id exactly once. The guarantee is batching-independent: a
    duplicate either finds its key still in the state store (watermark
    <= ts + 2h) and is dropped as a duplicate, or its key was evicted —
    which requires watermark > ts + 2h > ts — making the duplicate LATE
    and dropped by the watermark filter. Either path drops it, so the
    admitted set equals the original table no matter how files land in
    micro-batches. State is evicted as the watermark passes ts + 2h
    (bounded by stream rate x horizon, the production shape); admitted
    rows emit in their own batch, so no tail drain is needed — the flush
    sentinels just exercise end-of-stream eviction."""
    from data_algorithms_with_pyspark_spark.schemas import TABLE_SCHEMAS
    from data_algorithms_with_pyspark_spark.streaming.events import (
        streaming_dedup_within_watermark,
    )

    src = _events_stream_source_redelivered(spark, sf_dir)
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = streaming_dedup_within_watermark(stream, watermark="2 hours")
    # Unlike the windowed parity rows (whose sinks hold small aggregates),
    # this stream emits RAW admitted rows — a memory sink would hold the
    # whole table in driver heap (observed OOM at sf1). A parquet file
    # sink is the shape you'd run at scale: executor-side writes, driver
    # holds only the commit log.
    root = scratch_mkdtemp(prefix="dedup_parity_sink_")
    sink_dir = os.path.join(root, "out")
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(sink_dir)
        .where(F.col("user_id") != _FLUSH_USER)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
            .alias("value_cents"),
        )
    )


@register(
    "streaming_restart_recovery_parity",
    tags=("streaming", "window", "events", "watermark", "checkpoint"),
    description="REAL stop/restart attestation: a watermarked tumbling-"
    "window aggregation runs as TWO StreamingQueries over ONE checkpoint "
    "— query 1 processes half the files and terminates, the rest (plus "
    "flush sentinels) arrive, query 2 recovers offsets AND window state "
    "from the checkpoint and finishes into the same parquet sink; the "
    "final table matches the batch oracle exactly-once across the restart",
    oracle="""
        SELECT date_trunc('hour', ts) AS window_start,
               event_type,
               count(*) AS n_events,
               CAST(sum(CAST(floor((value) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
)
def streaming_restart_recovery_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exactly-once across a restart — the remaining untested streaming
    property (VERDICT r7 #7). The execution path includes a REAL stop and
    restart: run 1 sees only the first two ts-range files, aggregates
    hourly windows into checkpointed state, emits the watermark-closed
    prefix to the parquet sink, and TERMINATES. The remaining files (and
    the flush sentinels) then arrive; run 2 is a brand-new StreamingQuery
    on the SAME checkpoint + sink: it must recover the source offsets
    (not re-read files 1-2), the sink commit log (not re-emit run 1's
    windows), and the live window state (hours straddling the file-2/3
    boundary have partial counts only in the recovered state store).
    A duplicated, dropped, or re-emitted row anywhere breaks the batch
    oracle compare.

    Fresh source/checkpoint/sink dirs per invocation keep the restart
    self-contained and deterministic (no timing races: run 1 terminates
    via availableNow over the files present at start)."""
    import glob
    import shutil

    from data_algorithms_with_pyspark_spark.schemas import TABLE_SCHEMAS

    root = scratch_mkdtemp(prefix="restart_parity_")
    all_files = os.path.join(root, "all")
    n_real = _write_ts_split_files(spark, sf_dir, all_files)
    src = os.path.join(root, "src")
    os.makedirs(src)
    sink = os.path.join(root, "sink")
    ckpt = os.path.join(root, "ckpt")
    staged = sorted(glob.glob(os.path.join(all_files, "*.parquet")))
    half = max(1, n_real // 2)

    def _arrive(paths):
        for p in paths:
            shutil.copy(p, os.path.join(src, os.path.basename(p)))
            st = os.stat(p)
            os.utime(
                os.path.join(src, os.path.basename(p)),
                (st.st_atime, st.st_mtime),
            )

    def _run_once():
        stream = (
            spark.readStream.schema(TABLE_SCHEMAS["events"])
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ).alias("sum_cents"),
            )
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _record_state_metrics(f"restart_recovery_run{next(run_seq)}", q)

    run_seq = itertools.count(1)
    _arrive(staged[:half])
    _run_once()  # run 1: prefix only, then a real stop
    _arrive(staged[half:])
    _run_once()  # run 2: recovers offsets + state from the checkpoint
    return (
        spark.read.parquet(sink)
        .where(F.col("event_type") != "__flush__")
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            (F.col("sum_cents") / 100.0).alias("sum_value"),
        )
    )


@register(
    "streaming_pyds_source_parity",
    tags=("streaming", "pyds", "source"),
    description="REAL StreamingQuery fed by a CUSTOM Python streaming "
    "source (DataSourceStreamReader, sources/pyds.py): driver-side "
    "offset/admission control replays the 4 parquet chunks one per "
    "trigger while each admitted chunk is read ON EXECUTORS as Arrow "
    "batches; per-type aggregate state merges across the micro-batches "
    "and the oracle replays the result as batch SQL",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(floor(value * 10000 + 0.5) AS BIGINT))
                   AS BIGINT) AS value_units_4dp,
               CAST(min(user_id) AS BIGINT) AS min_user,
               CAST(max(user_id) AS BIGINT) AS max_user,
               CAST(sum(user_id) AS BIGINT) AS sum_user
        FROM events
        GROUP BY event_type
    """,
)
def streaming_pyds_source_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The custom-connector STREAMING half (the batch half is the FASTA
    pair): ``events_replay`` is a partition-planned
    ``DataSourceStreamReader`` — offsets ({"chunk": k}) and one-chunk-
    per-trigger admission control run on the driver, chunk reads run on
    executors as Arrow batches, exactly the division of labor the
    built-in file source has — NOT the driver-reading Simple variant.
    The query is deliberately timezone-free (no ts column crosses the
    source boundary) so the parity isolates the source + multi-batch
    aggregation-state path. Complete-mode memory sink = the replay-order
    fixture shape (bounded: one row per event type), like the other
    complete-mode parity fixtures. Termination is deterministic: poll
    ``lastProgress`` until the committed endOffset reaches the chunk
    count (progress is only reported for COMPLETED batches), then stop."""
    import json
    import time

    from data_algorithms_with_pyspark_spark.sources.pyds import (
        register_events_replay_source,
    )

    src = _events_stream_source(spark, sf_dir)
    n_chunks = sum(1 for f in os.listdir(src) if f.startswith("part-"))
    register_events_replay_source(spark)
    stream = (
        spark.readStream.format("events_replay")
        .option("path", src)
        .option("step", "1")
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
        ).alias("value_units_4dp"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
        F.sum("user_id").alias("sum_user"),
    )
    name = f"pyds_replay_{next(_SINK_SEQ)}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 180
        while True:
            p = q.lastProgress
            if p is not None:
                eo = p["sources"][0]["endOffset"]
                if isinstance(eo, str):
                    # the engine reports the python source's offset dict
                    # as a string; depending on version it is JSON or a
                    # python-dict repr — accept both
                    try:
                        eo = json.loads(eo)
                    except json.JSONDecodeError:
                        import ast as _ast

                        eo = _ast.literal_eval(eo)
                if int(eo["chunk"]) >= n_chunks:
                    break
            if time.time() > deadline:
                raise TimeoutError(
                    "events_replay stream did not drain its chunks"
                )
            time.sleep(0.1)
    finally:
        q.stop()
    q.awaitTermination(30)
    return spark.table(name).select(
        "event_type",
        "n_events",
        "value_units_4dp",
        "min_user",
        "max_user",
        "sum_user",
    )
