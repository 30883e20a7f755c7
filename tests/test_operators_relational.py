"""Exact-value tests for projection / aggregate / join / window / setop
operators (SURVEY.md §2b-§2f)."""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from big_data_ml_pipeline_spark.operators import (
    aggregates as agg_ops,
)
from big_data_ml_pipeline_spark.operators import joins as join_ops
from big_data_ml_pipeline_spark.operators import projection as proj_ops
from big_data_ml_pipeline_spark.operators import setops as set_ops
from big_data_ml_pipeline_spark.operators import windows as win_ops


# ---------------------------------------------------------------------------
# Projection (P1-P10)
# ---------------------------------------------------------------------------

def test_with_columns_single_projection(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    out = proj_ops.with_columns(df, {"c": F.col("a") + F.col("b"), "a": F.col("a") * 10})
    assert out.columns == ["b", "c", "a"]  # replaced cols move, none duplicated
    assert out.first()["c"] == 3 and out.first()["a"] == 10


def test_ratio_features_zero_denominator(spark):
    df = spark.createDataFrame([(10.0, 0.0, 2.0)], ["x", "zero", "two"])
    out = proj_ops.ratio_features(df, ["x"], ["zero", "two"]).first()
    assert out["x_to_zero_ratio"] == 0.0  # reference: 0, not null
    assert out["x_to_two_ratio"] == 5.0


def test_interaction_features_all_pairs(spark):
    df = spark.createDataFrame([(2.0, 3.0, 5.0)], ["a", "b", "c"])
    out = proj_ops.interaction_features(df, ["a", "b", "c"]).first()
    assert (out["a_x_b"], out["a_x_c"], out["b_x_c"]) == (6.0, 10.0, 15.0)


def test_time_features_native(spark):
    df = spark.createDataFrame([(datetime(2024, 3, 2, 15, 30),)], ["ts"])  # Saturday
    out = proj_ops.time_features_native(df, "ts").first()
    assert out["hour"] == 15
    assert out["day_of_week"] == 7  # Spark: 1=Sunday..7=Saturday
    assert out["day_of_month"] == 2
    assert out["is_weekend"] == 1


# ---------------------------------------------------------------------------
# Aggregates (A1-A5)
# ---------------------------------------------------------------------------

def test_grouped_stats_values(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], ["g", "v"]
    )
    out = {r["g"]: r for r in agg_ops.grouped_stats(df, ["g"], ["v"]).collect()}
    assert out["a"]["v_mean"] == 2.0
    assert math.isclose(out["a"]["v_std"], math.sqrt(2.0), rel_tol=1e-12)  # sample
    assert out["a"]["v_min"] == 1.0 and out["a"]["v_max"] == 3.0
    assert out["a"]["v_count"] == 2
    assert out["b"]["v_std"] is None  # stddev_samp of 1 row


def test_freq_and_target_encodings(spark):
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 10.0)], ["cat", "y"]
    )
    freq = {r["cat"]: r["cat_freq"] for r in agg_ops.freq_counts(df, "cat").collect()}
    assert freq == {"A": 3, "B": 1}  # reference test asserts freq("A")==3
    tm = {r["cat"]: r["cat_target_mean"] for r in agg_ops.target_means(df, "cat", "y").collect()}
    assert tm == {"A": 2.0, "B": 10.0}


def test_global_stats_one_row(spark):
    df = spark.createDataFrame([(1.0, 10.0), (3.0, 30.0)], ["x", "y"])
    out = agg_ops.global_stats(df, ["x", "y"])
    row = out.first()
    assert len(out.columns) == 4 and out.count() == 1
    assert row["x_mean"] == 2.0 and row["y_mean"] == 20.0
    # one naming convention module-wide: {col}_std, not {col}_stddev
    assert set(out.columns) == {"x_mean", "x_std", "y_mean", "y_std"}


def test_rollup_and_cube_shapes(spark):
    df = spark.createDataFrame(
        [("x", "p", 1), ("x", "q", 1), ("y", "p", 1)], ["a", "b", "n"]
    )
    rollup = agg_ops.grouping_rollup(df, ["a", "b"], [F.count("*").alias("c")])
    # 3 leaf groups + 2 per-a subtotals + 1 grand total
    assert rollup.count() == 6
    cube = agg_ops.grouping_cube(df, ["a", "b"], [F.count("*").alias("c")])
    # rollup rows + 2 per-b-only subtotals
    assert cube.count() == 8
    grand = [r for r in rollup.collect() if r["a"] is None and r["b"] is None]
    assert grand[0]["c"] == 3


def test_approx_distinct_close(spark):
    df = spark.createDataFrame([(i % 50,) for i in range(1000)], ["k"])
    got = agg_ops.approx_distinct(df, "k", rsd=0.02).first()["k_approx_distinct"]
    assert abs(got - 50) <= 3


def test_approx_count_distinct_accuracy(spark):
    """The 5%-sketch-accuracy property q37 used to hash-compare, now
    pinned per engine (ADVICE r1: a bit derived from two independent
    sketches can flip even when both are within tolerance)."""
    import duckdb
    from pyspark.sql import functions as F

    path = "/root/testdata/sf0.01/events.parquet"
    ev = spark.read.parquet(path)
    row = ev.select(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"]

    d_exact, d_approx = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id), approx_count_distinct(user_id) "
        f"FROM read_parquet('{path}')"
    ).fetchone()
    assert abs(d_approx - d_exact) <= 0.05 * d_exact


# ---------------------------------------------------------------------------
# Joins (J1-J3, semi/anti, as-of, range)
# ---------------------------------------------------------------------------

def test_join_back_preserves_rows(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 3.0)], ["g", "v"])
    stats = df.groupBy("g").agg(F.avg("v").alias("v_mean"))
    out = join_ops.join_back(df, stats, ["g"])
    assert out.count() == 3
    got = {(r["g"], r["v"]): r["v_mean"] for r in out.collect()}
    assert got[("a", 1.0)] == 1.5 and got[("b", 3.0)] == 3.0


def test_semi_and_anti_join(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(2, "x"), (2, "y")], ["k", "junk"])
    semi = join_ops.semi_join(left, right, left["k"] == right["k"])
    anti = join_ops.anti_join(left, right, left["k"] == right["k"])
    assert semi.columns == ["k"]  # no right columns, no duplicates
    assert [r["k"] for r in semi.collect()] == [2]
    assert sorted(r["k"] for r in anti.collect()) == [1, 3]


def _ts(s):
    return datetime.fromisoformat(s)


def test_as_of_join_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00"), "e1"),
         (1, _ts("2024-01-01 05:00"), "e2"),
         (1, _ts("2024-01-01 10:00"), "e3"),
         (2, _ts("2024-01-01 05:00"), "e4")],
        ["uid", "ts", "eid"],
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 03:00"), 7.0), (1, _ts("2024-01-01 08:00"), 9.0)],
        ["uid", "ts", "px"],
    )
    out = join_ops.as_of_join(left, right, ["uid"], "ts", ["px"])
    got = {r["eid"]: r["px_asof"] for r in out.collect()}
    assert got == {"e1": None, "e2": 7.0, "e3": 9.0, "e4": None}


def test_as_of_join_ties_prefer_right_then_tolerance(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 03:00"), "e1")], ["uid", "ts", "eid"])
    right = spark.createDataFrame([(1, _ts("2024-01-01 03:00"), 5.0)], ["uid", "ts", "px"])
    # equal timestamps: right sorts first (at-or-before includes equality)
    out = join_ops.as_of_join(left, right, ["uid"], "ts", ["px"])
    assert out.first()["px_asof"] == 5.0
    # a 1h-old right row is dropped under a 30-min tolerance
    right2 = spark.createDataFrame([(1, _ts("2024-01-01 02:00"), 5.0)], ["uid", "ts", "px"])
    out2 = join_ops.as_of_join(left, right2, ["uid"], "ts", ["px"], tolerance_seconds=1800)
    assert out2.first()["px_asof"] is None
    out3 = join_ops.as_of_join(left, right2, ["uid"], "ts", ["px"], tolerance_seconds=3600)
    assert out3.first()["px_asof"] == 5.0


def test_range_join_bucketed_matches_plain(spark):
    left = spark.createDataFrame([(float(i),) for i in range(0, 100, 7)], ["p"])
    right = spark.createDataFrame(
        [("lo", 0.0, 30.0), ("mid", 25.0, 60.0), ("hi", 55.0, 99.0)], ["tier", "lo", "hi"]
    )
    plain = join_ops.range_join(left, right, "p", "lo", "hi")
    bucketed = join_ops.range_join(left, right, "p", "lo", "hi", bucket_width=10)
    key = lambda r: (r["p"], r["tier"])
    assert sorted(map(key, plain.collect())) == sorted(map(key, bucketed.collect()))
    assert plain.count() > 0


# ---------------------------------------------------------------------------
# Windows (W1-W2, ranking)
# ---------------------------------------------------------------------------

def test_lag_features_exact(spark):
    df = spark.createDataFrame(
        [("u", i, float(10 * i)) for i in range(1, 5)], ["uid", "t", "v"]
    )
    out = win_ops.lag_features(df, ["uid"], ["t"], "v", [1, 2])
    got = {r["t"]: (r["v_lag_1"], r["v_lag_2"]) for r in out.collect()}
    assert got == {1: (None, None), 2: (10.0, None), 3: (20.0, 10.0), 4: (30.0, 20.0)}


def test_rolling_features_exact(spark):
    df = spark.createDataFrame(
        [("u", i, float(i)) for i in range(1, 6)], ["uid", "t", "v"]
    )
    out = win_ops.rolling_features(df, ["uid"], ["t"], "v", [2])
    got = {r["t"]: (r["v_rolling_sum_2"], r["v_rolling_mean_2"]) for r in out.collect()}
    # frame = 2 preceding + current (reference rowsBetween(-w, 0))
    assert got[1] == (1.0, 1.0)
    assert got[2] == (3.0, 1.5)
    assert got[3] == (6.0, 2.0)
    assert got[5] == (12.0, 4.0)


def test_rolling_time_features_range_frame(spark):
    # events at t=0s, 30s, 3600s, 4000s, 8000s; 1h trailing window
    ts = [0, 30, 3600, 4000, 8000]
    df = spark.createDataFrame(
        [("u", datetime.fromtimestamp(t), 1.0) for t in ts], ["uid", "ts", "v"]
    )
    out = win_ops.rolling_time_features(df, ["uid"], "ts", "v", 3600)
    got = {int(r["ts"].timestamp()): r["v_tcount_3600s"] for r in out.collect()}
    # t=3600 still includes t=0 (RANGE is inclusive); t=4000 drops t=0,30
    assert got == {0: 1, 30: 2, 3600: 3, 4000: 2, 8000: 1}


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", i, float(i % 5)) for i in range(10)], ["g", "id", "v"]
    )
    out = win_ops.top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], 3)
    got = [(r["id"], r["v"], r["rn"]) for r in out.orderBy("rn").collect()]
    assert got == [(4, 4.0, 1), (9, 4.0, 2), (3, 3.0, 3)]


# ---------------------------------------------------------------------------
# Set ops / sampling / top-k
# ---------------------------------------------------------------------------

def test_set_operations(spark):
    a = spark.createDataFrame([(1,), (2,), (2,)], ["k"])
    b = spark.createDataFrame([(2,), (3,)], ["k"])
    assert set_ops.union_all(a, b).count() == 5
    assert sorted(r["k"] for r in set_ops.distinct_union(a, b).collect()) == [1, 2, 3]
    assert sorted(r["k"] for r in set_ops.intersect(a, b).collect()) == [2]
    # exceptAll keeps multiplicity: {1,2,2} minus {2,3} = {1,2}
    assert sorted(r["k"] for r in set_ops.except_all(a, b).collect()) == [1, 2]


def test_hash_split_partition_invariant(spark):
    """hash_split membership is a pure function of the key: identical
    under any repartitioning (randomSplit is not — that's the point)."""
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    train1, test1 = set_ops.hash_split(df, ["k"])
    train2, test2 = set_ops.hash_split(df.repartition(13), ["k"])
    a = sorted(r["k"] for r in train1.collect())
    b = sorted(r["k"] for r in train2.collect())
    assert a == b
    assert train1.count() + test1.count() == 1000
    # roughly 80/20
    assert 700 < len(a) < 900


def test_random_split_seeded_partition(spark):
    df = spark.range(1000)
    tr1, te1 = set_ops.random_split(df, [0.8, 0.2], seed=42)
    tr2, te2 = set_ops.random_split(df, [0.8, 0.2], seed=42)
    assert tr1.count() + te1.count() == 1000
    assert tr1.count() == tr2.count()  # seeded → reproducible
    assert set_ops.intersect(tr1, te1).count() == 0  # disjoint


def test_global_top_k(spark):
    df = spark.createDataFrame([(i, float(-i)) for i in range(100)], ["id", "v"])
    out = set_ops.top_k(df, [F.col("v").desc(), F.col("id")], 3)
    assert [r["id"] for r in out.collect()] == [0, 1, 2]


def test_top_k_plan_is_take_ordered(spark):
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("v"))
    plan = set_ops.top_k(df, [F.col("v").desc()], 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no full sort at any scale


def test_grouped_percentiles_exact(spark):
    from big_data_ml_pipeline_spark.operators import aggregates as agg_ops

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 11)] + [("b", 5.0)],
        ["g", "value"],
    )
    out = {
        r["g"]: (r["p50"], r["p90"], r["p99"])
        for r in agg_ops.grouped_percentiles(df, ["g"], "value").collect()
    }
    # interpolated: rank = p*(n-1) over sorted values 1..10
    assert out["a"] == (5.5, pytest.approx(9.1), pytest.approx(9.91))
    assert out["b"] == (5.0, 5.0, 5.0)


def test_stratified_sample_rebalances(spark):
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, cls string")
    out = set_ops.stratified_sample(df, "cls", {"big": 0.1, "small": 1.0})
    got = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert got["small"] == 100           # fraction 1.0 keeps everything
    assert 40 <= got["big"] <= 160       # ~90 expected, Bernoulli spread


def test_deterministic_class_cap_partition_invariant(spark):
    rows = [(i, f"c{i % 3}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, cls string")
    a = set_ops.deterministic_class_cap(df, "cls", ["id"], 20)
    b = set_ops.deterministic_class_cap(df.repartition(11), "cls", ["id"], 20)
    ka = sorted((r["cls"], r["id"]) for r in a.collect())
    kb = sorted((r["cls"], r["id"]) for r in b.collect())
    assert ka == kb
    from collections import Counter
    assert Counter(c for c, _ in ka) == {"c0": 20, "c1": 20, "c2": 20}


def test_pivot_agg_no_discovery_job_and_values(spark):
    df = spark.createDataFrame(
        [("x", "a", 1), ("x", "b", 2), ("y", "a", 3)], "g string, p string, v long"
    )
    sc = spark.sparkContext

    def run_in_group(name, fn):
        sc.setJobGroup(name, name)
        try:
            return fn(), len(sc.statusTracker().getJobIdsForGroup(name))
        finally:
            sc.setJobGroup(None, None)

    out, jobs_explicit = run_in_group(
        "pivot-explicit",
        lambda: {r["g"]: (r["a"], r["b"]) for r in
                 agg_ops.pivot_agg(df, ["g"], "p", ["a", "b"], F.sum("v")).collect()},
    )
    _, jobs_discovery = run_in_group(
        "pivot-discovery",
        lambda: df.groupBy("g").pivot("p").agg(F.sum("v")).collect(),
    )
    assert out == {"x": (1, 2), "y": (3, None)}
    # explicit values skip the distinct() discovery pass entirely
    assert jobs_explicit < jobs_discovery


def test_unpivot_is_expand_not_union(spark):
    df = spark.createDataFrame([(1, 10.0, 20.0)], "k long, a double, b double")
    out = agg_ops.unpivot(df, ["k"], ["a", "b"])
    rows = sorted((r["variable"], r["value"]) for r in out.collect())
    assert rows == [("a", 10.0), ("b", 20.0)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan and "Union" not in plan


def test_weighted_class_sample_deterministic_and_biased(spark):
    """E-S weighted sampling: membership invariant under repartitioning,
    and across many disjoint salts the high-weight stratum must win
    selection far more often than the low-weight one (10x weights)."""
    rows = [(i, "c", 10.0 if i < 100 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, cls string, w double")

    a = set_ops.weighted_class_sample(df, "cls", ["id"], "w", 20)
    b = set_ops.weighted_class_sample(df.repartition(13), "cls", ["id"], "w", 20)
    ids_a = sorted(r["id"] for r in a.collect())
    assert ids_a == sorted(r["id"] for r in b.collect())
    assert len(ids_a) == 20

    heavy = 0
    for s in range(8):  # disjoint pseudo-random draws via the salt
        sel = set_ops.weighted_class_sample(df, "cls", ["id"], "w", 20, salt=f"s{s}")
        heavy += sum(1 for r in sel.collect() if r["id"] < 100)
    # 10x weight → expected ~86% of picks from the heavy stratum;
    # 8 draws x 20 picks = 160, mean ~138, require a wide-margin majority.
    assert heavy > 110, heavy


def test_weighted_class_sample_zero_weight_never_wins(spark):
    rows = [(i, "c", 0.0 if i < 5 else 1.0) for i in range(10)]
    df = spark.createDataFrame(rows, "id long, cls string, w double")
    sel = sorted(r["id"] for r in set_ops.weighted_class_sample(df, "cls", ["id"], "w", 5).collect())
    assert sel == [5, 6, 7, 8, 9]


def test_proportional_mix_exact_ratios_and_partition_invariance(spark):
    # Groups a:100, b:70, c:40 rows; weights 3:2:1 → scale =
    # min(33, 35, 40) = 33 → keep exactly 99/66/33. Group d is not in
    # the mixture and must vanish.
    rows = (
        [(i, "a") for i in range(100)]
        + [(1000 + i, "b") for i in range(70)]
        + [(2000 + i, "c") for i in range(40)]
        + [(3000 + i, "d") for i in range(25)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = {"a": 3, "b": 2, "c": 1}
    a = sorted(
        (r["source"], r["doc_id"])
        for r in set_ops.proportional_mix(df, w, key_cols=["doc_id"]).collect()
    )
    b = sorted(
        (r["source"], r["doc_id"])
        for r in set_ops.proportional_mix(
            df.repartition(9), w, key_cols=["doc_id"]
        ).collect()
    )
    assert a == b
    from collections import Counter

    assert Counter(s for s, _ in a) == {"a": 99, "b": 66, "c": 33}


def test_proportional_mix_infeasible_group_zeroes_the_mix(spark):
    # A group smaller than its weight forces scale 0 — the mixture is
    # unsatisfiable and the result is empty, never a skewed ratio.
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, source string"
    )
    out = set_ops.proportional_mix(df, {"a": 1, "b": 4}, key_cols=["doc_id"])
    assert out.count() == 0


def test_gap_fill_resample_hand_computed(spark):
    """Forward-fill semantics on a hand-built series: grid spans the
    truncated observation range, values carry forward between events,
    an event exactly ON a grid instant is included in it, and the
    grid before the first event is NULL."""
    from datetime import datetime

    from big_data_ml_pipeline_spark.operators.windows import gap_fill_resample

    rows = [
        (1, datetime(2024, 1, 1, 0, 30), 10.0, 100),
        (1, datetime(2024, 1, 1, 2, 0), 20.0, 101),   # exactly on grid
        (1, datetime(2024, 1, 1, 4, 45), 30.0, 102),
        (2, datetime(2024, 1, 1, 1, 15), 5.0, 200),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    out = {
        (r["user_id"], r["grid_ts"].hour): r["value_ff"]
        for r in gap_fill_resample(
            df, "user_id", "ts", "value", "event_id", step="1 hour"
        ).collect()
    }
    assert out == {
        (1, 0): None,    # grid 00:00 precedes the first event (00:30)
        (1, 1): 10.0,
        (1, 2): 20.0,    # on-grid event included at its own instant
        (1, 3): 20.0,
        (1, 4): 20.0,    # 04:45 event is after the 04:00 grid point
        (2, 1): None,
    }


def test_gap_fill_linear_interpolation_hand_computed(spark):
    """method='linear': interior grid points interpolate between their
    neighbouring observations by the exact time ratio, an on-grid
    event is its own neighbour (exact value), the tail forward-fills
    the last observation, and the head is NULL."""
    from datetime import datetime

    import pytest as _pytest

    from big_data_ml_pipeline_spark.operators.windows import gap_fill_resample

    rows = [
        (1, datetime(2024, 1, 1, 0, 30), 10.0, 100),
        (1, datetime(2024, 1, 1, 2, 0), 20.0, 101),
        (1, datetime(2024, 1, 1, 4, 45), 30.0, 102),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double, event_id long"
    )
    out = {
        r["grid_ts"].hour: r["value_ff"]
        for r in gap_fill_resample(
            df, "user_id", "ts", "value", "event_id",
            step="1 hour", method="linear",
        ).collect()
    }
    assert out[0] is None
    assert out[1] == _pytest.approx(10 + 10 * 30 / 90)       # 13.333…
    assert out[2] == 20.0                                     # on-grid
    assert out[3] == _pytest.approx(20 + 10 * 60 / 165)      # 23.636…
    assert out[4] == _pytest.approx(20 + 10 * 120 / 165)     # 27.272…
    with _pytest.raises(ValueError, match="method"):
        gap_fill_resample(df, "user_id", "ts", "value", "event_id",
                          method="cubic")


def test_component_split_never_straddles_groups(spark):
    """component_split (q161, VERDICT r9 item 3): every duplicate
    GROUP lands wholly on one side — no edge of the component label
    table may straddle train/test. On the same corpus the row-keyed
    hash_split DOES straddle at least one group (the leakage this
    operator exists to close), singletons split exactly as hash_split
    would, and the two sides partition the input."""
    from big_data_ml_pipeline_spark.operators import dedup as dedup_ops

    # 60 singletons + 20 groups of 3 linked by explicit edges
    rows = [(i, f"solo {i}") for i in range(60)]
    edges = []
    for g in range(20):
        base = 1000 + g * 10
        rows += [(base + j, f"group {g} member {j}") for j in range(3)]
        edges += [(base, base + 1), (base + 1, base + 2)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    labels = dedup_ops.connected_components(
        spark.createDataFrame(edges, ["id_a", "id_b"])
    )

    train, test = set_ops.component_split(df, labels, id_col="doc_id")
    tr = {r["doc_id"] for r in train.collect()}
    te = {r["doc_id"] for r in test.collect()}
    assert tr | te == {r["doc_id"] for r in df.collect()}
    assert not (tr & te)
    assert train.columns == df.columns  # helper columns dropped
    straddled = [
        (a, b) for a, b in edges if (a in tr) != (b in tr)
    ]
    assert straddled == []

    # the row-keyed split strands at least one of these groups — the
    # leakage mode this operator closes.
    htrain, _ = set_ops.hash_split(df, ["doc_id"])
    h_tr = {r["doc_id"] for r in htrain.collect()}
    assert any((a in h_tr) != (b in h_tr) for a, b in edges)

    # singletons (no label row) bucket on their own id == hash_split
    solo_ids = set(range(60))
    assert {i for i in solo_ids if i in tr} == {
        i for i in solo_ids if i in h_tr
    }

    # group_col surfaces the resolved label; members share it
    g_train, g_test = set_ops.component_split(
        df, labels, id_col="doc_id", group_col="grp"
    )
    grp = {
        r["doc_id"]: r["grp"]
        for r in g_train.unionByName(g_test).collect()
    }
    for a, b in edges:
        assert grp[a] == grp[b]
    for i in solo_ids:
        assert grp[i] == i


def test_component_split_rejects_unresolved_labels(spark):
    """A versioned label table (multiple rows per id) silently
    multiplies corpus rows through the split join and can land one
    document on BOTH sides — component_split must fail loudly on
    conflicting labels and tolerate harmless exact-duplicate rows."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], ["doc_id", "text"]
    )
    conflicted = spark.createDataFrame(
        [(1, 1), (1, 2), (3, 3)], ["id", "comp"]
    )
    with _pytest.raises(ValueError, match="RESOLVED"):
        set_ops.component_split(df, conflicted, id_col="doc_id")
    # exact-duplicate rows (benign retry appends) are folded, not fatal
    dup_rows = spark.createDataFrame(
        [(1, 1), (1, 1), (2, 1)], ["id", "comp"]
    )
    train, test = set_ops.component_split(df, dup_rows, id_col="doc_id")
    got = sorted(
        r["doc_id"] for r in train.unionByName(test).collect()
    )
    assert got == list(range(10))  # no row multiplied, none lost
