"""Known-answer tests for the feature-engineering operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_algorithms_with_pyspark_spark.operators.features import (
    bucketize,
    minmax_scale,
    one_hot,
    standardize,
    train_test_split,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, 0.0, "a"), (2, 5.0, "b"), (3, 10.0, "c")], ["id", "x", "cat"]
    )


def test_minmax_scale_known_answer(spark):
    got = {r["id"]: r["x_scaled"] for r in minmax_scale(_df(spark), ["x"]).collect()}
    assert got == {1: 0.0, 2: 0.5, 3: 1.0}


def test_minmax_scale_constant_column(spark):
    const = _df(spark).selectExpr("id", "CAST(7.0 AS DOUBLE) AS x", "cat")
    got = {r["id"]: r["x_scaled"] for r in minmax_scale(const, ["x"]).collect()}
    assert set(got.values()) == {0.0}


def test_standardize_known_answer(spark):
    out = {r["id"]: r["x_z"] for r in standardize(_df(spark), ["x"]).collect()}
    assert abs(out[2]) < 1e-12
    assert math.isclose(out[3], 1.0, rel_tol=1e-9)  # (10-5)/5
    assert math.isclose(out[1], -1.0, rel_tol=1e-9)


def test_bucketize_bounds_and_validation(spark):
    out = {
        r["id"]: r["x_bucket"]
        for r in bucketize(_df(spark), "x", [0.0, 5.0, 10.0]).collect()
    }
    # [0,5) -> 0; [5,10) -> 1; 10 is outside [0,10) -> NULL
    assert out == {1: 0, 2: 1, 3: None}
    with pytest.raises(ValueError, match="ascending"):
        bucketize(_df(spark), "x", [5.0, 0.0])


def test_one_hot_explicit_vocabulary(spark):
    rows = one_hot(_df(spark), "cat", ["a", "b"]).collect()
    got = {r["id"]: (r["cat_a"], r["cat_b"]) for r in rows}
    assert got == {1: (1, 0), 2: (0, 1), 3: (0, 0)}  # 'c' unseen -> zeros


def test_train_test_split_partitions_all_rows(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    train, test = train_test_split(df, "k", test_sixteenths=4)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 1000
    assert 150 < n_test < 350  # ~25%
    # deterministic: same split on recompute
    assert test.count() == n_test
    overlap = train.join(test, "k").count()
    assert overlap == 0


def test_scale_features_fused_matches_composed(spark):
    from data_algorithms_with_pyspark_spark.operators.features import scale_features

    fused = scale_features(_df(spark), ["x"])
    composed = minmax_scale(standardize(_df(spark), ["x"]), ["x"])
    f = {r["id"]: (r["x_z"], r["x_scaled"]) for r in fused.collect()}
    c = {r["id"]: (r["x_z"], r["x_scaled"]) for r in composed.collect()}
    assert f == c
    # fused = ONE stats broadcast join; composed pays one per stats pass
    # (plan string may repeat under AQE: count the final-plan section only)
    def _joins(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.split("== Initial Plan ==")[0].count("BroadcastNestedLoopJoin")

    assert _joins(fused) == 1
    assert _joins(composed) > 1


# --- SQL function registry ---------------------------------------------------


def test_sql_registered_functions_match_dataframe_forms(spark):
    """SQL scalar functions inline the same expression trees the DataFrame
    operators use — results must be identical; the Arrow scorer must plan
    ArrowEvalPython (vectorized), never BatchEvalPython."""
    from pyspark.sql import functions as F

    from data_algorithms_with_pyspark_spark.functions.sql_registry import (
        register_sql_functions,
    )
    from data_algorithms_with_pyspark_spark.functions.text_functions import (
        normalize_text,
        words,
    )
    from data_algorithms_with_pyspark_spark.functions.vectors import (
        cosine_similarity,
        l2_norm,
    )

    register_sql_functions(spark)
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 2.0], [2.0, 4.0, 4.0], "  Hello   World  "),
            (2, [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], "a  B\tc"),
        ],
        "id long, a array<double>, b array<double>, txt string",
    )
    df.createOrReplaceTempView("sqlreg_t")
    got = spark.sql(
        "SELECT id, cosine_sim(a, b) AS cs, l2norm(a) AS n, "
        "tokenize(txt) AS toks, norm_text(txt) AS nt "
        "FROM sqlreg_t ORDER BY id"
    ).collect()
    exp = (
        df.select(
            "id",
            cosine_similarity(F.col("a"), F.col("b")).alias("cs"),
            l2_norm(F.col("a")).alias("n"),
            words("txt").alias("toks"),
            normalize_text("txt").alias("nt"),
        )
        .orderBy("id")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in exp]

    scored = spark.sql(
        "SELECT id, batch_sigmoid_dot(a, b) AS s FROM sqlreg_t"
    )
    scored.collect()
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_chunk_text_udtf_matches_sequence_chunks(spark):
    """The SQL table function must agree with the DataFrame operator on
    windows, positions, and the kept trailing partial chunk — including
    the LATERAL-join form SQL users write."""
    from data_algorithms_with_pyspark_spark.functions.sql_registry import (
        register_sql_functions,
    )

    register_sql_functions(spark)
    rows = spark.sql(
        "SELECT * FROM chunk_text('a b c d e f g', 3, 1)"
    ).collect()
    got = [(r["chunk"], r["start_tok"], r["n_toks"]) for r in rows]
    assert got == [
        ("a b c", 0, 3),
        ("c d e", 2, 3),
        ("e f g", 4, 3),
        ("g", 6, 1),
    ]

    docs = spark.createDataFrame(
        [(1, "one two three four five"), (2, "x")], ["doc_id", "text"]
    )
    docs.createOrReplaceTempView("udtf_docs")
    lateral = spark.sql(
        """SELECT d.doc_id, c.chunk, c.start_tok
           FROM udtf_docs d, LATERAL chunk_text(d.text, 2, 0) c
           ORDER BY d.doc_id, c.start_tok"""
    ).collect()
    assert [(r["doc_id"], r["chunk"]) for r in lateral] == [
        (1, "one two"),
        (1, "three four"),
        (1, "five"),
        (2, "x"),
    ]


def test_variant_ingestion_path_over_events_props(spark):
    """Spark 4 VARIANT surface: the semi-structured ingestion path for
    open-schema JSON columns — parse once to VARIANT, typed extraction
    via variant_get, runtime schema discovery via schema_of_variant, and
    try_variant_get's NULL (not error) on type mismatch. Matches the
    get_json_object result the events_props_extraction query computes."""
    from data_algorithms_with_pyspark_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    events = load_table(spark, SF_SMOKE, "events").where(
        F.col("props").isNotNull()
    )
    v = events.select(
        "event_id", F.parse_json("props").alias("v"), "props"
    )
    out = v.select(
        "event_id",
        F.variant_get("v", "$.k", "bigint").alias("k_typed"),
        F.get_json_object("props", "$.k").cast("long").alias("k_str"),
        F.schema_of_variant("v").alias("sch"),
        F.try_variant_get("v", "$.k", "array<int>").alias("bad_cast"),
    )
    rows = out.collect()
    assert rows, "no props rows at smoke SF"
    for r in rows:
        assert r["k_typed"] == r["k_str"]
        assert r["sch"] == "OBJECT<k: BIGINT>"
        assert r["bad_cast"] is None  # try_ returns NULL, never throws


def test_engine_verify_self_service(spark):
    """Engine.verify runs the same cross-engine gate the driver applies:
    oracle queries report match=True, the HLL query reports rows-only,
    and unknown names raise."""
    from data_algorithms_with_pyspark_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    eng = Engine(spark, SF_SMOKE)
    assert eng.verify("q6_forecast_revenue") == {
        "query": "q6_forecast_revenue",
        "mode": "oracle",
        "match": True,
    }
    hll = eng.verify("approx_distinct_users_hll")
    assert hll["mode"] == "rows_only" and hll["rows"] > 0
    with pytest.raises(KeyError):
        eng.verify("no_such_query")


def test_engine_verify_all_subset(spark):
    """Engine.verify_all is the driver_sim gate as a one-liner: a green
    subset lands in passed, the HLL sketch in rows_only, and a failure
    is collected per query (not raised) unless fail_fast."""
    from data_algorithms_with_pyspark_spark.engine import Engine
    from tests.conftest import SF_SMOKE

    eng = Engine(spark, SF_SMOKE)
    rep = eng.verify_all(
        ["q6_forecast_revenue", "word_count", "approx_distinct_users_hll"]
    )
    assert rep["passed"] == ["q6_forecast_revenue", "word_count"]
    assert rep["rows_only"] == ["approx_distinct_users_hll"]
    assert rep["failed"] == {}
    bad = eng.verify_all(["no_such_query"])
    assert list(bad["failed"]) == ["no_such_query"]
    with pytest.raises(KeyError):
        eng.verify_all(["no_such_query"], fail_fast=True)
