"""Join operators (SURVEY.md §2c, J1-J3 + the standard kinds).

Scale rules baked in:
 - The aggregate side of an enrich-join (group stats / freq / target
   encodings) is tiny relative to the fact table → always broadcast it;
   a shuffle join there is pure waste (reference does the naive join at
   src/feature_engineering.py:56,232,247).
 - Dimension joins take an explicit ``F.broadcast`` hint; AQE still
   owns the fallback when the "dimension" turns out big.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """Equi-join with the (small) right side broadcast."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def join_back(
    df: DataFrame, agg_df: DataFrame, on: list[str], broadcast_agg: bool = True
) -> DataFrame:
    """Left-join an aggregate back onto its source rows (J1-J3).

    Reference pattern (src/feature_engineering.py:56): per-group stats /
    counts / target means re-attached to every row. The aggregate has at
    most one row per group key — broadcast it.
    """
    right = F.broadcast(agg_df) if broadcast_agg else agg_df
    return df.join(right, on=on, how="left")


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` with a match in ``right`` (EXISTS)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """Rows of ``left`` without a match in ``right`` (NOT EXISTS)."""
    return left.join(right, on=on, how="left_anti")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    partition_cols: list[str],
    time_col: str,
    right_value_cols: list[str],
    tolerance_seconds: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row at-or-before
    its timestamp within the same partition keys (extension operator —
    Spark has no built-in as-of join).

    Implemented as a composition of built-ins (no UDF): union both
    sides tagged with a side marker, then a window ``last(..., ignorenulls)``
    ordered by (time, side) per partition key carries the most recent
    right-side values forward onto left rows. One shuffle on the
    partition keys — the same cost as a sort-merge join, skew-safe via AQE.

    ``tiebreak_col`` names a right-side column (typically a unique id)
    that deterministically resolves two right rows sharing
    (partition, timestamp): the row with the LARGEST tiebreak value
    wins. Without it, ties are resolved by partition order — stable for
    one plan but not across partitionings/engines, so any oracle-checked
    or repeatable pipeline should pass one.
    """
    lcols = left.columns
    tb_type = right.schema[tiebreak_col].dataType if tiebreak_col else None
    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_value_cols],
        *([F.lit(None).cast(tb_type).alias("__tb")] if tiebreak_col else []),
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in right.columns else F.lit(None).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        *([F.col(tiebreak_col).alias("__tb")] if tiebreak_col else []),
    )
    from pyspark.sql import Window

    order = [F.col(time_col).asc(), F.col("__side").asc()]
    if tiebreak_col:
        # Right rows at the same timestamp sort ascending by tiebreak,
        # so last() picks the max; left rows (side 1, null __tb) still
        # sort after every same-timestamp right row via __side.
        order.append(F.col("__tb").asc_nulls_first())
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        *lcols,
        F.col("__side"),
        F.col(time_col).alias("__t"),
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(c + "_asof")
            for c in right_value_cols
        ],
        F.last(F.when(F.col("__side") == 0, F.col(time_col)), ignorenulls=True)
        .over(w)
        .alias("__rt"),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        within = (
            F.col("__t").cast("long") - F.col("__rt").cast("long")
        ) <= tolerance_seconds
        out = out.select(
            *lcols,
            *[
                F.when(within, F.col(c + "_asof")).alias(c + "_asof")
                for c in right_value_cols
            ],
        )
    else:
        out = out.select(*lcols, *[F.col(c + "_asof") for c in right_value_cols])
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join by key salting.

    A hot key (one customer with 1% of a 100 TB fact table) lands its
    entire partition on one reducer under a plain shuffle join. Salting
    splits every left key into ``salt`` sub-keys at random and replicates
    each right row across all ``salt`` sub-keys, so a hot key's rows
    spread over ``salt`` reducers. Cost: right side × salt — use for
    fact⋈medium-dim joins where the dim is too big to broadcast but
    ``salt × |right|`` still shuffles cheaply. (AQE skew-join handles
    post-hoc splitting; salting is the a-priori version that also works
    for aggregations and non-AQE engines.)
    """
    lsalted = left.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    rsalted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = lsalted.join(rsalted, on=[*on, "__salt"], how=how)
    return out.drop("__salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    equi_keys: list[str] | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Point-in-interval range join.

    Without help, Catalyst plans point-in-range predicates as
    BroadcastNestedLoopJoin (O(n·m)). When ``bucket_width`` is given we
    bucketize both sides and turn it into an equi-join on the bucket id
    (intervals are exploded across the buckets they overlap via
    ``sequence``) — the standard scale trick, one shuffle, no NLJ.
    """
    cond = (F.col(left_point) >= F.col(right_lo)) & (
        F.col(left_point) <= F.col(right_hi)
    )
    if equi_keys:
        for k in equi_keys:
            cond = cond & (left[k] == right[k])
    if bucket_width is None:
        return left.join(right, cond, "inner")

    lb = left.withColumn("__bucket", (F.col(left_point) / bucket_width).cast("long"))
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(right_lo) / bucket_width).cast("long"),
                (F.col(right_hi) / bucket_width).cast("long"),
            )
        ),
    )
    on = ["__bucket"] + (equi_keys or [])
    return lb.join(rb, on=on, how="inner").filter(cond).drop("__bucket")
