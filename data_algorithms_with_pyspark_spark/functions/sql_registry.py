"""SQL-callable function registry (SURVEY §2.12 surface for SQL users).

The engine's rule is: hot paths stay Catalyst expressions; Python exists
only behind Arrow. For users living in ``spark.sql`` that rule still
holds — the names registered here are

* **SQL scalar functions** (``CREATE FUNCTION ... RETURN <expr>``):
  declarative bodies the analyzer inlines into the calling query — the
  SAME expression trees the DataFrame operators use, zero Python at run
  time: ``cosine_sim``, ``l2norm``, ``tokenize``, ``norm_text``.
* **one Arrow-batched pandas UDF** (the sanctioned Python escape hatch,
  never row-at-a-time): ``batch_sigmoid_dot`` — the cross-encoder-stub
  scorer, so SQL pipelines can call the same rerank scorer as
  ``operators.similarity.rerank_topk``.
* **Python UDTFs** (Spark 4 table functions, usable in FROM / LATERAL):
  ``chunk_text(text, size, overlap)`` — the SQL face of
  ``operators.packing.sequence_chunks``. Row-granular Python, so the
  standing rule applies: fine for exploratory SQL, not for the 100 TB
  hot path (the DataFrame operator is the vectorized form).

    register_sql_functions(spark)
    spark.sql("SELECT cosine_sim(a.vec, b.vec) FROM ...")
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf

__all__ = ["register_sql_functions"]

_SQL_FUNCTIONS = (
    """
    CREATE OR REPLACE TEMPORARY FUNCTION l2norm(a ARRAY<DOUBLE>)
    RETURNS DOUBLE
    RETURN sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x))
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION cosine_sim(
        a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
    RETURNS DOUBLE
    RETURN CASE
        WHEN sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x))
             * sqrt(aggregate(b, 0D, (acc, x) -> acc + x * x)) = 0D THEN 0D
        ELSE aggregate(zip_with(a, b, (x, y) -> x * y), 0D,
                       (acc, x) -> acc + x)
             / (sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x))
                * sqrt(aggregate(b, 0D, (acc, x) -> acc + x * x)))
    END
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION tokenize(t STRING)
    RETURNS ARRAY<STRING>
    RETURN filter(split(trim(lower(t)), '\\\\s+'), w -> length(w) > 0)
    """,
    """
    CREATE OR REPLACE TEMPORARY FUNCTION norm_text(t STRING)
    RETURNS STRING
    RETURN trim(regexp_replace(lower(t), '\\\\s+', ' '))
    """,
)


def register_sql_functions(spark: SparkSession) -> None:
    """Idempotent registration of the engine's SQL function surface."""
    for ddl in _SQL_FUNCTIONS:
        spark.sql(ddl)

    @pandas_udf("double")
    def _batch_sigmoid_dot(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        x = np.stack(a.to_numpy()).astype(np.float64, copy=False)
        y = np.stack(b.to_numpy()).astype(np.float64, copy=False)
        return pd.Series(1.0 / (1.0 + np.exp(-np.einsum("ij,ij->i", x, y))))

    spark.udf.register("batch_sigmoid_dot", _batch_sigmoid_dot)

    @udtf(returnType="chunk: string, start_tok: int, n_toks: int")
    class _ChunkText:
        """Overlapping token-window chunker (sequence_chunks semantics):
        whitespace tokens, windows of ``size`` advancing ``size -
        overlap`` tokens; the trailing partial window is kept."""

        def eval(self, text: str, size: int, overlap: int = 0):
            if text is None or size is None or size < 1:
                return
            if overlap is None or not 0 <= overlap < size:
                raise ValueError("need 0 <= overlap < size")
            toks = [w for w in (text or "").lower().split() if w]
            step = size - overlap
            # starts advance by the stride while start < n_tokens — the
            # same windowing contract as packing.sequence_chunks (the
            # trailing partial window is kept; empty docs emit nothing)
            for start in range(0, len(toks), step):
                window = toks[start : start + size]
                yield " ".join(window), start, len(window)

    spark.udtf.register("chunk_text", _ChunkText)
