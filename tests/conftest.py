"""Shared pytest fixtures — session-scoped local SparkSession in the
reference's test style (tests/test_pipeline.py:17-27 uses local[2] with
2 shuffle partitions; we use local[4]/4 on the bigger box)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Unit fixtures are tiny: AQE's per-stage re-planning (and the extra
# per-stage codegen units it forces) dominated the r17/r18 suite wall
# clock (driver budget overrun — VERDICT r17 item 2). AQE is a runtime
# physical-scheduling feature with identical results; tests that assert
# AQE behavior re-enable it locally (test_scale_techniques). Must be
# set BEFORE the session module import reads it.
os.environ.setdefault("SPARK_GRAFT_AQE", "false")

from big_data_ml_pipeline_spark.session import get_session

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_confs={"spark.ui.enabled": "false", "spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


def rows(df, *order_cols):
    """Collect to a list of tuples, sorted for deterministic compares."""
    out = [tuple(r) for r in df.collect()]
    return sorted(out, key=lambda t: tuple((v is None, v) for v in t))
