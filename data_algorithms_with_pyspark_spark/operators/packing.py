"""Training-data assembly operators (north-star extension; no reference
counterpart — /root/reference is a teaching repo with no LLM-pipeline
surface, so these follow the standard large-corpus recipes).

``pack_by_token_budget`` — greedy sequence packing: assign documents to
fixed-token-budget shards. The cumulative sum runs per partition-key
group (``partition_cols``), never globally: a global ordered prefix-sum
would serialize onto one task, while per-group packing is one shuffle on
the group key and scales with the number of groups. Callers control
parallelism by adding a deterministic bucket column (e.g. ``doc_id % 8``)
to ``partition_cols`` — at 100 TB you pick enough buckets that each
group's token stream fits a single task comfortably.

``contamination_matches`` — benchmark-contamination check: documents
sharing any word n-gram shingle with a benchmark corpus. Both sides
explode to (shingle, id) pairs and meet in an equi-join on the shingle —
at scale the benchmark side is tiny, so Catalyst broadcasts it and the
corpus side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_algorithms_with_pyspark_spark.functions.text_functions import words
from data_algorithms_with_pyspark_spark.operators.dedup import token_shingles

__all__ = [
    "pack_by_token_budget",
    "contamination_matches",
    "shard_summary",
    "sequence_chunks",
]


def pack_by_token_budget(
    docs: DataFrame,
    token_col: str,
    budget: int,
    partition_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Append ``shard_id``: greedy packing of ``token_col`` into shards of
    at most ``budget`` tokens per (``partition_cols``) group, filling in
    ``order_col`` order.

    ``shard_id = floor(exclusive_prefix_sum / budget)``: a document joins
    the shard its first token falls in, so a shard may overflow by (at
    most) its final document, and a document larger than ``budget``
    advances the cursor past the next shard indices (gaps are fine — ids
    only need to be distinct and ordered). One window shuffle;
    deterministic for a unique ``order_col``.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return docs.withColumn(
        "shard_id", F.floor((cum - F.col(token_col)) / F.lit(budget))
    )


def contamination_matches(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
) -> DataFrame:
    """(id, n_hits) for corpus docs sharing >= 1 distinct word
    ``shingle_n``-gram with any benchmark doc.

    Benchmark shingles are deduplicated then broadcast (the benchmark set
    is small by construction); the corpus side explodes its distinct
    shingles and hash-joins without shuffling the documents themselves.
    """
    bench_shingles = (
        benchmark.select(words(text_col).alias("_w"))
        .select(F.explode(token_shingles(F.col("_w"), shingle_n)).alias("shingle"))
        .distinct()
    )
    corpus_shingles = corpus.select(
        F.col(id_col), words(text_col).alias("_w")
    ).select(
        F.col(id_col),
        F.explode(token_shingles(F.col("_w"), shingle_n)).alias("shingle"),
    )
    return (
        corpus_shingles.join(F.broadcast(bench_shingles), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_hits"))
    )


def shard_summary(
    packed: DataFrame, token_col: str, partition_cols: list[str], id_col: str
) -> DataFrame:
    """Per-shard roll-up of a ``pack_by_token_budget`` result: doc count,
    token total, id range — the manifest a training job reads."""
    return packed.groupBy(*partition_cols, "shard_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(token_col).cast("long").alias("total_tokens"),
        F.min(id_col).alias("first_doc"),
        F.max(id_col).alias("last_doc"),
    )


def sequence_chunks(
    docs: DataFrame,
    chunk_tokens: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document's token stream into overlapping fixed-size
    training windows — the tokenize-and-chunk step that turns documents
    into model-ready sequences (stride < chunk_tokens keeps context across
    boundaries, the standard pretraining windowing).

    Pure Catalyst: tokenize once, ``sequence(1, n, stride)`` generates the
    window starts, ``slice`` takes each window, one ``explode`` emits the
    chunks — all inside whole-stage codegen, zero shuffles, embarrassingly
    parallel over documents (the 100 TB shape: no coordination between
    docs at all). The final window may be shorter than ``chunk_tokens``;
    windows are emitted while ``start <= n_tokens`` so every token is
    covered and no empty chunk appears.

    Output: ``(id_col, chunk_idx, n_chunk_tokens, chunk_text)``.
    """
    if not 0 < stride <= chunk_tokens:
        raise ValueError("need 0 < stride <= chunk_tokens")
    from data_algorithms_with_pyspark_spark.functions.text_functions import words

    toks = words(text_col)
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(F.col("_toks")), F.lit(1)), F.lit(stride)
    )
    chunk = F.slice(F.col("_toks"), F.col("_start"), chunk_tokens)
    return (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .where(F.size("_toks") > 0)
        .select(F.col(id_col), F.col("_toks"), F.explode(starts).alias("_start"))
        .select(
            F.col(id_col),
            ((F.col("_start") - 1) / stride).cast("long").alias("chunk_idx"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )
