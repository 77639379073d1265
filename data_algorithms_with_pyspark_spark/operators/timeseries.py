"""Recursive time-series operators — the sanctioned Arrow-UDF tier.

Engine policy (SURVEY.md §2.12): built-in Catalyst expressions first, and
almost everything in this repo is. EWMA is the honest exception: the
recurrence ``y_t = alpha*x_t + (1-alpha)*y_{t-1}`` is not expressible as a
window aggregate without the exploding ``(1-alpha)^-t`` rescaling trick
(which overflows f64 after ~750 steps, so it is not a 100 TB answer).
This is exactly the case the Pandas-UDF tier exists for:
``applyInPandas`` over the group key — one Arrow batch per group, the
recurrence folded over a numpy array inside it.

Scale shape: one shuffle on the group key (the same exchange a window
over the key would need); each group's series must fit in one worker's
Arrow batch, which holds for per-user event histories (the group is the
USER, never the corpus). Deterministic: the recurrence is a fixed
sequential fold per group, independent of partitioning.

Why not ``pandas.Series.ewm``: its C kernel computes the recurrence in a
normalized weighted form whose float rounding is NOT the textbook
``alpha*x + beta*y`` op sequence, so an external engine replaying the
textbook recurrence (e.g. a recursive-CTE oracle) can disagree in the
last ulp. The explicit fold below performs exactly (mul, mul, add) per
step with ``beta`` computed ONCE — any IEEE-754 engine folding the same
literals reproduces every output bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["grouped_ewma"]


def grouped_ewma(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Exponentially-weighted moving average of ``value_col`` per group,
    ordered by ``order_cols`` (include a unique tie-breaker — determinism
    requires a total order within the group). Output: the selected
    columns plus ``ewma`` (double, rounded 6).

    ``y_0 = x_0; y_t = alpha*x_t + beta*y_{t-1}`` with ``beta = 1-alpha``
    evaluated once in f64 (note ``1-0.3 != 0.7`` in binary — reusing the
    same beta everywhere is what keeps oracles bit-equal).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    beta = 1.0 - alpha

    import numpy as np  # worker-side dependencies
    import pandas as pd

    out_cols = [group_col, *order_cols, value_col]

    def _ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype="float64")
        y = np.empty_like(x)
        if len(x):
            acc = x[0]
            y[0] = acc
            for i in range(1, len(x)):
                acc = alpha * x[i] + beta * acc
                y[i] = acc
        out = pdf[out_cols].copy()
        # floor(x*1e6+0.5)/1e6, not np.round: banker's rounding vs SQL
        # round() diverges on exact halves — repo-wide rounding policy
        out["ewma"] = np.floor(y * 1e6 + 0.5) / 1e6
        return out

    sample = df.select(*out_cols)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sample.schema.fields
    )
    return sample.groupBy(group_col).applyInPandas(
        _ewma, schema=f"{ddl}, ewma double"
    )
