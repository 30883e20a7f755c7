"""Custom stateful streaming operators (applyInPandasWithState).

Built-in windowed aggregations cover time-bucketed state; these cover
the genuinely custom cases — per-key accumulators that live across
micro-batches with explicit state schemas and timeouts. Arrow moves the
per-group batches, the state store persists the accumulator between
triggers (SURVEY.md §2i extension; the reference has no streaming at
all).
"""

from __future__ import annotations

import sys
from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pandas imported lazily inside tasks
    import pandas as pd

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _register_by_value() -> None:
    # The driver harness imports this repo by file path; executors have
    # no such module on PYTHONPATH, so the stateful closure must pickle
    # by value (same pattern as operators/multimodal.py).
    try:
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Per-user running (count, sum) accumulator across micro-batches.

    State = one (n, total) row per user in the state store; each trigger
    folds its Arrow batches into the accumulator and emits the updated
    totals (output mode 'update'). The watermark bounds state for keys
    that go quiet — with a TTL policy this is the standard shape for
    per-entity online features at serving time.
    """
    _register_by_value()

    def update(
        key: Any, pdfs: Iterator["pd.DataFrame"], state: GroupState
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            RUNNING_TOTALS_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
