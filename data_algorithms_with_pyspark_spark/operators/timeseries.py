"""Recursive time-series operators — the sanctioned Arrow-UDF tier.

Engine policy (SURVEY.md §2.12): built-in Catalyst expressions first, and
almost everything in this repo is. EWMA is the honest exception: the
recurrence ``y_t = alpha*x_t + (1-alpha)*y_{t-1}`` is not expressible as a
window aggregate without the exploding ``(1-alpha)^-t`` rescaling trick
(which overflows f64 after ~750 steps, so it is not a 100 TB answer).
This is exactly the case the Pandas-UDF tier exists for.

Execution shape: ``repartition(group)`` + ``sortWithinPartitions`` +
``mapInPandas`` — NOT ``groupBy().applyInPandas``. Both need the same
single shuffle on the group key, but applyInPandas pays one Python
round-trip PER GROUP (~2-3 ms each; measured 3-5 s of pure overhead for
1 500 user groups at sf0.1, dwarfing the actual fold), while mapInPandas
streams whole Arrow batches through one generator per partition and
carries the fold state across batch boundaries. Group runs are
contiguous within a sorted partition, so a plain row loop restarts the
recurrence at each key change.

Scale shape: one shuffle on the group key (the same exchange a window
over the key would need); partitions stream batch-by-batch, so nothing
requires a group — let alone a partition — to fit in memory at once.
Deterministic: the recurrence is a fixed sequential fold per group,
independent of partitioning.

Why not ``pandas.Series.ewm``: its C kernel computes the recurrence in a
normalized weighted form whose float rounding is NOT the textbook
``alpha*x + beta*y`` op sequence (it divides by ``alpha+beta``, which is
not exactly 1.0 in f64), so an external engine replaying the textbook
recurrence (e.g. a recursive-CTE oracle) can disagree in the last ulp.
The explicit fold below performs exactly (mul, mul, add) per step with
``beta`` computed ONCE — any IEEE-754 engine folding the same literals
reproduces every output bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["grouped_ewma", "grouped_holt"]


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

    out_cols = [group_col, *order_cols, value_col]

    def _fold(batches):
        import numpy as np  # worker-side dependencies

        cur_key, acc = object(), 0.0  # sentinel never equals a real key
        for pdf in batches:
            x = pdf[value_col].to_numpy(dtype="float64")
            keys = pdf[group_col].to_numpy()
            y = np.empty_like(x)
            for i in range(len(x)):
                if keys[i] != cur_key:
                    cur_key = keys[i]
                    acc = x[i]
                else:
                    acc = alpha * x[i] + beta * acc
                y[i] = acc
            out = pdf[out_cols].copy()
            # floor(x*1e6+0.5)/1e6, not np.round: banker's rounding vs SQL
            # round() diverges on exact halves — repo-wide rounding policy
            out["ewma"] = np.floor(y * 1e6 + 0.5) / 1e6
            yield out

    sample = df.select(*out_cols)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sample.schema.fields
    )
    partitioned = sample.repartition(group_col).sortWithinPartitions(
        group_col, *order_cols
    )
    return partitioned.mapInPandas(_fold, schema=f"{ddl}, ewma double")


def grouped_holt(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.2,
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing per group — the
    level+trend forecaster one notch above EWMA, the classic capacity /
    volume projection: ``forecast`` is the one-step-ahead prediction
    ``level + trend`` after observing each point.

    Recurrence (textbook form, evaluated in EXACTLY this op order so a
    recursive-CTE oracle replays every output bit)::

        l_0 = x_0,  b_0 = 0
        prev = l_{t-1} + b_{t-1}
        l_t  = alpha * x_t + ac * prev          (ac = 1 - alpha, ONCE)
        b_t  = beta * (l_t - l_{t-1}) + bc * b_{t-1}   (bc = 1 - beta)

    Same execution shape and rationale as ``grouped_ewma`` (see module
    docstring): one shuffle on the group key, contiguous group runs in
    sorted partitions, one Python fold per partition carrying (l, b)
    across Arrow batches. Output adds ``level``, ``trend``, ``forecast``
    (floor-quantized to 1e-6).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if not 0.0 < beta <= 1.0:
        raise ValueError("beta must be in (0, 1]")
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    ac, bc = 1.0 - alpha, 1.0 - beta

    out_cols = [group_col, *order_cols, value_col]

    def _fold(batches):
        import numpy as np

        cur_key, lv, tr = object(), 0.0, 0.0
        for pdf in batches:
            x = pdf[value_col].to_numpy(dtype="float64")
            keys = pdf[group_col].to_numpy()
            lvs = np.empty_like(x)
            trs = np.empty_like(x)
            for i in range(len(x)):
                if keys[i] != cur_key:
                    cur_key, lv, tr = keys[i], x[i], 0.0
                else:
                    prev = lv + tr
                    new_lv = alpha * x[i] + ac * prev
                    tr = beta * (new_lv - lv) + bc * tr
                    lv = new_lv
                lvs[i] = lv
                trs[i] = tr
            out = pdf[out_cols].copy()
            q = lambda a: np.floor(a * 1e6 + 0.5) / 1e6  # noqa: E731
            out["level"] = q(lvs)
            out["trend"] = q(trs)
            out["forecast"] = q(lvs + trs)
            yield out

    sample = df.select(*out_cols)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sample.schema.fields
    )
    partitioned = sample.repartition(group_col).sortWithinPartitions(
        group_col, *order_cols
    )
    return partitioned.mapInPandas(
        _fold, schema=f"{ddl}, level double, trend double, forecast double"
    )
