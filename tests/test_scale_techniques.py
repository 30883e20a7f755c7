"""Tests for the explicit scale levers: skew salting and bucketed
shuffle-free joins (SURVEY.md §7 100 TB design rules)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_ml_pipeline_spark.operators.joins import salted_join
from big_data_ml_pipeline_spark.sources.writers import write_bucketed_table


def test_salted_join_matches_plain_join(spark):
    # skewed left: one hot key with 900 rows, 10 cold keys
    left = spark.createDataFrame(
        [(0 if i < 900 else i % 10 + 1, i) for i in range(1000)], ["k", "v"]
    )
    right = spark.createDataFrame([(k, f"r{k}") for k in range(11)], ["k", "name"])
    plain = left.join(right, on=["k"], how="inner")
    salted = salted_join(left, right, ["k"], salt=4)
    assert salted.count() == plain.count() == 1000
    a = sorted((r["k"], r["v"], r["name"]) for r in plain.collect())
    b = sorted((r["k"], r["v"], r["name"]) for r in salted.collect())
    assert a == b


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    right = spark.createDataFrame([(1, "x")], ["k", "w"])
    out = salted_join(left, right, ["k"], salt=3, how="left")
    got = {r["k"]: r["w"] for r in out.collect()}
    assert got == {1: "x", 2: None}


def test_partitioned_write_prunes_partitions_on_read(spark, tmp_path):
    """Hive-style partitionBy layout + a filter on the partition column
    must prune at planning time (PartitionFilters), never scan-and-drop
    — the difference between reading 1 day and 100 TB."""
    from big_data_ml_pipeline_spark.sources.writers import write_data

    df = spark.range(300).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("day"),
    )
    path = str(tmp_path / "parts")
    write_data(df, path, partition_by=["day"])
    got = spark.read.parquet(path).filter(F.col("day") == 1)
    assert got.count() == 100
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    # the pruned scan must not list a PushedFilter on the data columns —
    # the partition filter is resolved against directory names alone
    assert "(day#" in plan.split("PartitionFilters: ")[1].split("]")[0]


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key removes the Exchange — the
    recurring fact-fact join at 100 TB pre-pays its shuffle at write
    time."""
    # managed tables land in the session's spark-warehouse; DROP TABLE
    # in the finally removes the files.
    n_buckets = 4
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed_table(a, "t_a", ["k"], n_buckets, sort_cols=["k"])
    write_bucketed_table(b, "t_b", ["k"], n_buckets, sort_cols=["k"])
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path (tiny test tables would broadcast);
        # at real scale both sides are too big to broadcast anyway
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta, tb = spark.table("t_a"), spark.table("t_b")
        joined = ta.join(tb, on="k")
        assert joined.count() == 1000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # no shuffle: bucket layout satisfies the join
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS t_a")
        spark.sql("DROP TABLE IF EXISTS t_b")


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime half of the skew story (the operator-level guards live in
    test_skew_guards.py): flood one join key so 99% of rows hash to a
    single shuffle partition, and assert AQE's OptimizeSkewedJoin
    actually splits it — the final adaptive plan must show
    SortMergeJoin(skew=true) reading from 'AQEShuffleRead skewed'.
    Thresholds are lowered so toy data crosses them; results must be
    unchanged by the split."""
    from pyspark.sql import functions as F

    confs = {
        # The suite session runs AQE-off (conftest — unit-scale wall
        # clock); this test asserts AQE behavior, so pin it on locally.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",   # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 99, 7).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        rows = j.collect()  # executes THIS plan (count() would plan its own)
        # 198k left rows flood k=7 (matches right); the 1% non-flood
        # keys are 99,199,… — all ≥ 50, so they never match.
        assert len(rows) == 198_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_deterministic_shard_stable_across_partitioning(spark):
    from big_data_ml_pipeline_spark.operators import setops as set_ops

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id"
    )
    a = set_ops.deterministic_shard(df, ["doc_id"], n_shards=8).collect()
    b = set_ops.deterministic_shard(
        df.repartition(11), ["doc_id"], n_shards=8
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # Every shard's positions are contiguous 1..n and every doc appears once.
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert sum(len(v) for v in by_shard.values()) == len({r["doc_id"] for r in a}) == len(a)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # The hash spreads: no shard is empty, none holds >40% of the corpus.
    sizes = [len(v) for v in by_shard.values()]
    assert len(sizes) == 8 and max(sizes) < 0.4 * len(a)


def test_write_training_shards_orders_rows_in_files(spark, tmp_path):
    from big_data_ml_pipeline_spark.sources.writers import write_training_shards

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "source"
    )
    path = str(tmp_path / "shards")
    write_training_shards(df, path, key_cols=["doc_id"], n_shards=4)
    import os

    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    total = 0
    for d in dirs:
        rows = spark.read.parquet(f"{path}/{d}").collect()
        poss = [r["pos"] for r in rows]
        assert poss == sorted(poss) == list(range(1, len(rows) + 1))
        total += len(rows)
    assert total == df.count()


def test_temperature_mix_report_quotas(spark):
    """alpha=1 reproduces natural proportions; alpha=0 flattens to the
    uniform mixture; quotas never exceed group sizes and their sum
    stays within |groups| of the budget (integer flooring)."""
    from big_data_ml_pipeline_spark.operators.setops import temperature_mix_report

    rows = [(i, "big") for i in range(90)] + [(i + 90, "small") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    nat = {r["source"]: r for r in temperature_mix_report(df, alpha=1.0, budget=50).collect()}
    assert abs(nat["big"]["q"] - 0.9) < 1e-9 and nat["big"]["quota"] == 45
    flat = {r["source"]: r for r in temperature_mix_report(df, alpha=0.0, budget=50).collect()}
    assert abs(flat["big"]["q"] - 0.5) < 1e-9
    assert flat["small"]["quota"] == 10  # capped at group size
    mid = {r["source"]: r for r in temperature_mix_report(df, alpha=0.3, budget=50).collect()}
    assert 0.5 < mid["big"]["q"] < 0.9  # tempering sits between the extremes
    for r in mid.values():
        assert r["quota"] <= r["n_docs"]


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime row-level filtering (Spark's bloom-filter join
    optimization) — the lever that keeps a selective dim⋈fact join
    from shuffling the whole fact side at 100 TB: with the feature on,
    a bloom filter built from the filtered creation side is pushed
    into the probe side's scan filter (might_contain BELOW the join),
    and the join result is identical to the feature-off run. Local
    parquet is tiny, so the application-side size threshold (10 GB
    default) is lowered to let the injection fire — on a real fact
    table the defaults fire on their own."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    prev["spark.sql.optimizer.runtime.bloomFilter.enabled"] = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled"
    )

    def run(bloom: bool):
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        part = spark.read.parquet(
            "/root/testdata/sf0.001/part.parquet"
        ).filter(F.col("p_brand") == "Brand#13")
        j = li.join(part, li.l_partkey == part.p_partkey).select(
            "l_orderkey", "l_partkey", "p_brand"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", str(bloom).lower()
        )
        rows = sorted(map(tuple, j.collect()))
        return rows, j._jdf.queryExecution().executedPlan().toString()

    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        with_bloom, plan_on = run(True)
        without, plan_off = run(False)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert "might_contain" in plan_on
    assert "might_contain" not in plan_off
    assert with_bloom == without and len(with_bloom) > 0
