"""Window-function operators (SURVEY.md §2e, W1-W2 + ranking/top-k).

One window spec per (partition, order) pair is reused across all lag /
rolling expressions, so Spark sorts each partition ONCE regardless of
how many features are derived — the reference re-declares the spec but
Catalyst already merges them; the real win here is emitting a single
projection instead of its per-feature withColumn loop
(reference src/feature_engineering.py:178-222).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .projection import with_columns


def lag_features(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str] | str,
    value_col: str,
    lags: list[int] = (1, 7, 30),
) -> DataFrame:
    """Per-partition ordered ``lag(value, k)`` features (W1).

    Output ``{value_col}_lag_{k}`` — reference src/feature_engineering.py:178-196.
    Pass several order_cols (e.g. a timestamp plus a unique id) to make
    the ordering total — lag under a non-total order is nondeterministic.
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return with_columns(
        df, {f"{value_col}_lag_{k}": F.lag(value_col, k).over(w) for k in lags}
    )


def rolling_features(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str] | str,
    value_col: str,
    windows: list[int] = (7, 30),
) -> DataFrame:
    """Rolling mean/sum over ROWS frames ``[-w, 0]`` (W2).

    ROWS (physical offsets), not RANGE — matching reference
    src/feature_engineering.py:198-222 which uses ``rowsBetween(-w, 0)``;
    we keep its exact frame (w preceding + current = w+1 rows).
    Output ``{value_col}_rolling_{mean|sum}_{w}``.
    """
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    exprs = {}
    for wsize in windows:
        frame = (
            Window.partitionBy(*partition_cols)
            .orderBy(*order_cols)
            .rowsBetween(-wsize, 0)
        )
        exprs[f"{value_col}_rolling_mean_{wsize}"] = F.avg(value_col).over(frame)
        exprs[f"{value_col}_rolling_sum_{wsize}"] = F.sum(value_col).over(frame)
    return with_columns(df, exprs)


def rolling_time_features(
    df: DataFrame,
    partition_cols: list[str],
    time_col: str,
    value_col: str,
    window_seconds: int = 3600,
) -> DataFrame:
    """Event-time rolling sum/count over a RANGE frame: all rows within
    the trailing ``window_seconds`` of each row's timestamp (not a fixed
    row count — W2's ROWS twin for irregular event spacing).

    The frame is RANGE BETWEEN w PRECEDING AND CURRENT ROW over epoch
    seconds; rows sharing a timestamp all see the same frame, so the
    result is deterministic without a tiebreaker column.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(time_col).cast("long"))
        .rangeBetween(-window_seconds, 0)
    )
    return with_columns(
        df,
        {
            f"{value_col}_tsum_{window_seconds}s": F.sum(value_col).over(w),
            f"{value_col}_tcount_{window_seconds}s": F.count(value_col).over(w),
        },
    )


def top_k_per_group(
    df: DataFrame,
    partition_cols: list[str],
    order_exprs: list,
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number (deterministic when the
    order_exprs form a total order — include a unique tiebreaker)."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_exprs)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def gap_fill_resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    step: str = "1 hour",
    method: str = "ffill",
) -> DataFrame:
    """Gap-filled forward-fill resampling — the time-series
    regularization every feature pipeline over event data needs: per
    key, an evenly-spaced grid from ``date_trunc(step_unit, min(ts))``
    to the truncated max, carrying the LAST observed value at or
    before each grid instant (NULL before the first observation).
    Returns (key, grid_ts timestamp, value_ff).

    Method: grid points (null value) union the raw events into one
    per-key stream; a single ``last(value, ignorenulls=True)`` running
    window ordered by (ts, events-before-grid-at-ties, id) fills
    forward; grid rows are kept. ONE shuffle on the key, one sort —
    no as-of join, no per-grid-point probe. The tiebreak means an
    observation exactly ON a grid instant is included in it.

    ``method="linear"`` interpolates instead: each grid instant gets
    ``v_prev + (v_next − v_prev) · (t − t_prev)/(t_next − t_prev)``
    between its neighbouring observations (microsecond-exact time
    ratio), the last observation's value after it, and NULL before the
    first — the same single union-stream sort, with a second
    (current-row → following) frame over the SAME window ordering, so
    Spark still sorts each key once. Both neighbour picks and the one
    IEEE mul-add are order-independent, keeping the result
    engine-exact without quantization.

    Scale: grid size is span/step per key — bound the step to the
    analysis resolution. The union stream is events + grid rows; both
    scan-shaped, no driver involvement.
    """
    step_unit = step.split()[-1]
    bounds = df.groupBy(key_col).agg(
        F.date_trunc(step_unit, F.min(ts_col)).alias("__lo"),
        F.date_trunc(step_unit, F.max(ts_col)).alias("__hi"),
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.expr(f"sequence(__lo, __hi, interval {step})")
        ).alias("__ots"),
        F.lit(None).cast("double").alias("__v"),
        F.lit(-1).cast("long").alias("__tie"),
        F.lit(0).alias("__is_evt"),
    )
    evts = df.select(
        key_col,
        F.col(ts_col).alias("__ots"),
        F.col(value_col).cast("double").alias("__v"),
        F.col(id_col).cast("long").alias("__tie"),
        F.lit(1).alias("__is_evt"),
    )
    if method not in ("ffill", "linear"):
        raise ValueError(f"unknown method {method!r}")
    base_w = Window.partitionBy(key_col).orderBy(
        F.col("__ots").asc(), F.col("__is_evt").desc(), F.col("__tie").asc()
    )
    back = base_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u = evts.unionByName(grid)
    if method == "ffill":
        return (
            u.withColumn("__ff", F.last("__v", ignorenulls=True).over(back))
            .filter(F.col("__is_evt") == 0)
            .select(
                F.col(key_col),
                F.col("__ots").alias("grid_ts"),
                F.col("__ff").alias("value_ff"),
            )
        )
    fwd = base_w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    # Neighbour values + their microsecond instants; the event-before-
    # grid tiebreak makes an on-grid observation its own "previous"
    # neighbour (ratio 0 — exact value carried). The instant is
    # materialized as a plain column and all four neighbour picks go
    # in ONE select: chained withColumns left an intermediate
    # projection between Window operators, defeating CollapseWindow —
    # 6 stacked Window ops, 2.3s warm at sf0.1; this shape fuses to
    # one Window pass per frame over a single sort (~0.5s).
    usec = F.when(F.col("__is_evt") == 1, F.unix_micros(F.col("__ots")))
    tagged = u.withColumn("__ut", usec).select(
        "*",
        F.last("__v", ignorenulls=True).over(back).alias("__pv"),
        F.last("__ut", ignorenulls=True).over(back).alias("__pt"),
        F.first("__v", ignorenulls=True).over(fwd).alias("__nv"),
        F.first("__ut", ignorenulls=True).over(fwd).alias("__nt"),
    )
    gt = F.unix_micros(F.col("__ots"))
    frac = (gt - F.col("__pt")).cast("double") / (
        F.col("__nt") - F.col("__pt")
    ).cast("double")
    interp = (
        F.when(F.col("__pv").isNull(), F.lit(None).cast("double"))
        .when(F.col("__nv").isNull(), F.col("__pv"))
        .when(F.col("__nt") == F.col("__pt"), F.col("__pv"))
        .otherwise(F.col("__pv") + (F.col("__nv") - F.col("__pv")) * frac)
    )
    return (
        tagged.filter(F.col("__is_evt") == 0)
        .select(
            F.col(key_col),
            F.col("__ots").alias("grid_ts"),
            interp.alias("value_ff"),
        )
    )
