"""SparkSession factory.

Mirrors the reference's session config (reference src/ml_pipeline.py:40-55:
AQE on, AQE coalesce on, Kryo) and adds what the reference declared but
never wired (config/pipeline_config.yaml:129-133: broadcast threshold,
shuffle partitions) plus Arrow for pandas interchange and a pinned UTC
session timezone so timestamp semantics are engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: AQE toggle. Production/bench/driver default: ON (guide §2 — runtime
#: coalescing + skew-join splitting are load-bearing at scale). The
#: test suite sets SPARK_GRAFT_AQE=false (tests/conftest.py): at unit
#: fixture sizes AQE's per-stage re-planning + per-stage codegen units
#: dominate wall clock (measured r18 on the pq-ingest test shape:
#: 184 s → 53 s for two tiny ingests with AQE off; results identical —
#: AQE changes physical scheduling, never semantics). Tests that
#: assert AQE behavior (the skew-join split) flip it back on locally
#: via spark.conf.set — it is a runtime-settable SQL conf.
_AQE = os.environ.get("SPARK_GRAFT_AQE", "true")

#: Runtime-settable confs applied to *any* session (including one handed
#: to us by a test harness) before running engine queries.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": _AQE,
    "spark.sql.adaptive.coalescePartitions.enabled": _AQE,
    "spark.sql.adaptive.skewJoin.enabled": _AQE,
    # Spark 4 rejects parquet TIMESTAMP(NANOS) outright; read it as a
    # nanos-since-epoch BIGINT (the events.ts column) — the catalog
    # normalizes it back to a microsecond TimestampType.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Classic (non-ANSI) evaluation semantics: lenient casts, null on
    # malformed input — matches the reference (Spark 3.5) behavior.
    "spark.sql.ansi.enabled": "false",
}

#: Confs that must be set at session-build time.
BUILD_CONFS: dict[str, str] = {
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # 10 MB broadcast threshold, as declared (never wired) by the
    # reference at config/pipeline_config.yaml:133.
    "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
    # Guide §5 / §9: size the JVM heap to the machine instead of
    # Spark's 1 GiB default — a local[N] JVM is driver AND all
    # executors in one heap, and 32 concurrent tasks over 1 GiB spend
    # the run in GC (measured r18: the bench tail degraded 4-8× as
    # listener/plan state accumulated; an 8g heap removed it). On a
    # real cluster spark-submit's --driver-memory wins (a running JVM
    # ignores this), so the env knob only governs self-built local
    # sessions.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Cap UI/listener retention: a long bench run otherwise retains
    # every execution's formatted plan string (ours run to thousands
    # of lines) in heap. Observability-only — the per-query REST pulls
    # in tools/profile_queries.py read far fewer than these caps.
    "spark.sql.ui.retainedExecutions": "100",
    "spark.ui.retainedJobs": "300",
    "spark.ui.retainedStages": "500",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Pin runtime confs on an externally-provided session.

    Engine entry points call this so correctness (UTC timestamps, AQE)
    does not depend on who built the session.
    """
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable at runtime on this build — keep going;
            # queries are written to degrade safely.
            pass
    return spark


def get_session(
    app_name: str = "big-data-ml-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset so the
    same code path serves tests, bench and a real cluster (where the
    master comes from spark-submit and this arg stays None).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    for k, v in BUILD_CONFS.items():
        builder = builder.config(k, v)
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return apply_runtime_confs(spark)
