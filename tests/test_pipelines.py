"""End-to-end pipeline tests: planted near-duplicates must cluster, the
curation pass must keep exactly the filtered+deduped set, sampling must be
deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.dedup import (
    minhash_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from data_algorithms_with_pyspark_spark.operators.iterative import (
    connected_components,
)
from data_algorithms_with_pyspark_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
)


def _docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest to find food and water every day"
    )
    near = base.replace("lazy", "sleepy")  # one-word edit: near-dup of base
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, near),  # near dup of 1/2
        (4, "completely different text about spark query engines and "
            "distributed columnar execution at massive scale for analytics"),
        (5, "yet another unrelated document mentioning neither foxes nor "
            "dogs but only numbers one two three four five six seven"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_near_dup_pipeline_clusters_planted_dups(spark):
    docs = _docs(spark)
    sigs = minhash_signatures(docs, num_perm=64, shingle_n=3)
    cands = minhash_candidate_pairs(sigs, bands=16, min_jaccard=0.1)
    verified = ngram_jaccard_pairs(docs, 0.2, shingle_n=3, candidates=cands)
    edges = verified.select(
        F.col("id_1").alias("src"), F.col("id_2").alias("dst")
    )
    comp = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    # 1, 2, 3 must share one cluster; 4 and 5 must not appear in any pair.
    assert comp.get(1) == comp.get(2) == comp.get(3)
    assert 4 not in comp and 5 not in comp


def test_hash_sample_deterministic_and_consistent(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    s1 = sorted(r["k"] for r in hash_sample(df, "k", 4).collect())
    s2 = sorted(
        r["k"] for r in hash_sample(df.repartition(7), "k", 4).collect()
    )
    assert s1 == s2  # partition-layout independent
    assert 0.15 < len(s1) / 1000 < 0.35  # ~4/16 = 25%
    # monotone: a wider rate strictly contains a narrower one
    s8 = set(r["k"] for r in hash_sample(df, "k", 8).collect())
    assert set(s1) <= s8


def test_stratified_sample_respects_fractions(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(2000)], ["id", "s"]
    )
    out = stratified_sample(df, "s", {"a": 0.1, "b": 0.5}, seed=7)
    counts = {r["s"]: r["n"] for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert 50 <= counts.get("a", 0) <= 160
    assert 380 <= counts.get("b", 0) <= 620


def test_near_dup_keep_best_picks_max_quality_per_cluster(spark):
    """Independent invariant (not the oracle replay): exactly one kept doc
    per near-dup cluster, and its quality equals the cluster's max
    (ties broken toward the smaller doc_id)."""
    from pyspark.sql import functions as F

    from data_algorithms_with_pyspark_spark.operators.text import (
        quality_score_expr,
    )
    from data_algorithms_with_pyspark_spark.plans.pipelines import (
        near_dup_clusters,
        near_dup_keep_best,
    )
    from data_algorithms_with_pyspark_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    kept = near_dup_keep_best(spark, SF_SMOKE)
    clusters = near_dup_clusters(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id",
        F.floor(quality_score_expr("text") * 10000 + F.lit(0.5))
        .cast("long")
        .alias("quality_q"),
    )
    # one kept row per cluster, covering every cluster
    kept_rows = kept.collect()
    cluster_ids = {r["cluster_id"] for r in clusters.collect()}
    assert {r["cluster_id"] for r in kept_rows} == cluster_ids
    assert len(kept_rows) == len(cluster_ids)
    # kept quality == max quality in the cluster; ties -> min doc_id
    best = {
        r["cluster_id"]: (r["max_q"], r["min_id"])
        for r in clusters.join(docs, "doc_id")
        .groupBy("cluster_id")
        .agg(F.max("quality_q").alias("max_q"), F.min("doc_id").alias("min_id"))
        .collect()
    }
    qual = {r["doc_id"]: r["quality_q"] for r in docs.collect()}
    for r in kept_rows:
        max_q, _ = best[r["cluster_id"]]
        assert r["quality_q"] == max_q
        # the kept doc is the smallest doc_id among those at max quality
        tied = [
            c["doc_id"]
            for c in clusters.collect()
            if c["cluster_id"] == r["cluster_id"]
            and qual[c["doc_id"]] == max_q
        ]
        assert r["kept_doc_id"] == min(tied)


def test_mixture_temperature_weights_semantics(spark):
    """Higher temperature flattens the mixture toward uniform: the
    max/min weight ratio must shrink monotonically with T; weights sum
    to ~1e6 ppm per temperature; T=1 weight is proportional to token
    mass; epoch multiplier > 1000 exactly for upsampled sources."""
    from tests.conftest import SF_SMOKE

    from data_algorithms_with_pyspark_spark.plans.pipelines import (
        corpus_mixture_temperature_weights,
    )

    rows = corpus_mixture_temperature_weights(spark, SF_SMOKE).collect()
    by_t = {}
    for r in rows:
        by_t.setdefault(r["temperature"], []).append(r)
    assert set(by_t) == {1, 2, 4}
    spreads = {}
    for t, rs in by_t.items():
        ws = [r["weight_ppm"] for r in rs]
        assert abs(sum(ws) - 1_000_000) <= len(ws)  # rounding slack
        spreads[t] = max(ws) / min(ws)
        total_tokens = sum(r["n_tokens"] for r in rs)
        for r in rs:
            if t == 1:
                expect = r["n_tokens"] / total_tokens * 1e6
                assert abs(r["weight_ppm"] - expect) <= 2
            # upsampled (weight above proportional share) <=> epochs>1000
            prop = r["n_tokens"] / total_tokens
            w = r["weight_ppm"] / 1e6
            if w > prop * 1.001:
                assert r["epochs_milli"] > 1000
            if w < prop * 0.999:
                assert r["epochs_milli"] < 1000
    assert spreads[1] >= spreads[2] >= spreads[4] >= 1.0
