"""Exact-value tests for the scalar / exact-agg / vector function layer."""

from __future__ import annotations

import math
import statistics

from pyspark.sql import functions as F

from big_data_ml_pipeline_spark.functions import (
    davg,
    dstddev_samp,
    dsum,
    epoch_day_of_month,
    epoch_day_of_week,
    epoch_hour,
    epoch_is_weekend,
    json_get,
    null_safe_div,
)
from big_data_ml_pipeline_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    to_double_array,
)


def test_null_safe_div(spark):
    df = spark.createDataFrame(
        [(10.0, 2.0), (10.0, 0.0), (None, 2.0), (10.0, None)], ["n", "d"]
    )
    got = [r[0] for r in df.select(null_safe_div(F.col("n"), F.col("d"))).collect()]
    # reference semantics (src/feature_engineering.py:60-74): 0 on zero
    # denominator; null denominator also falls to the otherwise branch.
    assert got == [5.0, 0.0, None, 0.0]


def test_epoch_time_features(spark):
    df = spark.createDataFrame(
        [
            ("1970-01-01 06:30:00",),  # epoch day 0 = Thursday
            ("1970-01-03 00:00:00",),  # Saturday midnight, epoch dow 2
            ("1970-01-06 00:00:00",),  # Tuesday midnight, epoch dow 5
        ],
        ["s"],
    ).select(F.col("s").cast("timestamp").alias("ts"))
    got = df.select(
        epoch_hour(F.col("ts")).alias("h"),
        epoch_day_of_week(F.col("ts")).alias("dow"),
        epoch_day_of_month(F.col("ts")).alias("dom"),
        epoch_is_weekend(F.col("ts")).alias("we"),
    ).collect()
    assert got[0]["h"] == 6.5
    # dow/dom are FRACTIONAL (reference bug, reproduced): 06:30 on epoch
    # day 0 → 6.5/24 of a day past Thursday-origin 0
    assert math.isclose(got[0]["dow"], 6.5 / 24)
    assert math.isclose(got[0]["dom"], 1 + 6.5 / 24)
    assert got[1]["dow"] == 2.0  # integral at exact midnight
    # the reference's weekend flag fires on exact-midnight epoch-dow 5/6
    # (Tue/Wed!) — faithful reproduction of its bug
    assert [r["we"] for r in got] == [0, 0, 1]


def test_exact_decimal_aggregates(spark):
    vals = [1.01, 2.02, 3.03, 4.04, 5.05]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = df.select(
        dsum(F.col("x")).alias("s"),
        davg(F.col("x")).alias("a"),
        dstddev_samp(F.col("x")).alias("sd"),
    ).first()
    assert got["s"] == round(sum(vals), 2) == 15.15
    # same float-division order as the oracle SQL: (Σcents/100)/n
    assert got["a"] == 15.15 / 5
    assert math.isclose(got["sd"], statistics.stdev(vals), rel_tol=1e-12)


def test_dsum_is_partitioning_invariant(spark):
    vals = [(float(f"{i}.{i % 100:02d}"),) for i in range(1, 1001)]
    one = spark.createDataFrame(vals, ["x"]).coalesce(1)
    many = spark.createDataFrame(vals, ["x"]).repartition(13)
    s1 = one.select(dsum(F.col("x")).alias("s")).first()["s"]
    s2 = many.select(dsum(F.col("x")).alias("s")).first()["s"]
    assert s1 == s2  # bit-identical, not approx


def test_json_get(spark):
    df = spark.createDataFrame([('{"k": 5, "tag": "a"}',), ("{}",), (None,)], ["props"])
    got = df.select(
        json_get(F.col("props"), "k").cast("int").alias("k"),
        json_get(F.col("props"), "tag").alias("tag"),
    ).collect()
    assert [(r["k"], r["tag"]) for r in got] == [(5, "a"), (None, None), (None, None)]


def test_vector_math(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0], [2.0, 4.0, 4.0])], ["a", "b"])
    got = df.select(
        dot(F.col("a"), F.col("b")).alias("dot"),
        l2_norm(F.col("a")).alias("na"),
        cosine_similarity(F.col("a"), F.col("b")).alias("cos_parallel"),
        cosine_similarity(F.col("a"), F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0))).alias(
            "cos_zero"
        ),
    ).first()
    assert got["dot"] == 18.0
    assert got["na"] == 3.0
    assert math.isclose(got["cos_parallel"], 1.0, rel_tol=1e-12)
    assert got["cos_zero"] == 0.0  # guarded: zero norm → 0, not NaN


def test_to_double_array_widens_floats(spark):
    from pyspark.sql.types import ArrayType, DoubleType, FloatType, StructField, StructType

    schema = StructType([StructField("v", ArrayType(FloatType()))])
    df = spark.createDataFrame([([1.5, 2.5],)], schema)
    out = df.select(to_double_array(F.col("v")).alias("v"))
    assert isinstance(out.schema["v"].dataType.elementType, DoubleType)
    assert out.first()["v"] == [1.5, 2.5]


def test_nested_double_lit_bit_exact(spark):
    """nested_double_lit == F.lit element-for-element on nested tables
    AND on the repr round-trip edge cases (subnormal min, max double,
    negative zero, exponent forms) — the guard for the one-parsed-
    expression literal path every IVF/PQ kit now builds through."""
    import random

    from pyspark.sql import functions as F

    from big_data_ml_pipeline_spark.functions.vector import (
        nested_double_lit,
    )

    rng = random.Random(11)
    nested = [
        [[rng.gauss(0, 1) for _ in range(5)] for _ in range(3)]
        for _ in range(4)
    ]
    edge = [
        5e-324, -5e-324, 1.7976931348623157e+308,
        -1.7976931348623157e+308, -0.0, 0.1, -3.5e+16, 1e-17,
        123456789.123456789, 2.0,
    ]
    df = spark.range(1)
    row = df.select(
        nested_double_lit(nested).alias("n"),
        nested_double_lit(edge).alias("e"),
        F.lit(edge[0]).alias("lit0"),
    ).collect()[0]
    got_flat = [x for a in row["n"] for b in a for x in b]
    want_flat = [float(x) for a in nested for b in a for x in b]
    assert got_flat == want_flat
    import struct

    for g, w in zip(row["e"], edge):
        # bit-pattern compare — value == misses -0.0 vs 0.0
        assert struct.pack("d", g) == struct.pack("d", float(w)), (g, w)
    # non-finite refuses instead of silently embedding a parse error
    import math

    import pytest as _pytest

    with _pytest.raises(ValueError, match="non-finite"):
        nested_double_lit([1.0, math.inf])
    with _pytest.raises(ValueError, match="non-finite"):
        nested_double_lit([[math.nan]])

    # ≥64 flat elements switches double_sql to the from_json rendering
    # (one expression node instead of an N-node CreateArray tree); pin
    # THAT branch bit-exactly too, including the subnormal/−0.0/
    # max-double edges — json.dumps→Jackson parse must round-trip
    # every bit pattern the array() branch does.
    from big_data_ml_pipeline_spark.functions.vector import double_sql

    big = edge + [rng.gauss(0, 1) for _ in range(64 - len(edge))]
    assert len(big) == 64
    rendered = double_sql(big)
    assert rendered.startswith("from_json("), rendered
    nested_big = [big[i : i + 16] for i in range(0, 64, 16)]
    assert double_sql(nested_big).startswith("from_json(")
    row2 = df.select(
        nested_double_lit(big).alias("flat"),
        nested_double_lit(nested_big).alias("nested"),
    ).collect()[0]
    for g, w in zip(row2["flat"], big):
        assert struct.pack("d", g) == struct.pack("d", float(w)), (g, w)
    got_nested = [x for a in row2["nested"] for x in a]
    for g, w in zip(got_nested, big):
        assert struct.pack("d", g) == struct.pack("d", float(w)), (g, w)
