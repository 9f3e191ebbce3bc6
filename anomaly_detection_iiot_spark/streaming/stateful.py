"""Custom stateful streaming operator: online first-crossing detection
(SURVEY §2.9 / §7.4 "per-round state via applyInPandasWithState is the
most intricate streaming piece").

Batch W8 computes ``min(idx) WHERE v > thr`` per key over the whole
series; online, the crossing must fire AS the stream runs — a
GroupState per key remembers whether the alarm already fired, so each
key emits EXACTLY ONE row (its first observed crossing) over the
stream's lifetime, regardless of how many batches keep exceeding the
threshold afterwards.

Semantics note (documented, not hidden): "first" is first in ARRIVAL
order, batch by batch; rows inside one batch are sorted by event time,
but a late row arriving after the alarm fired cannot retract it. That
is the honest streaming analogue of the reference's argmax-over-array
(calculations.py:88-92) — retraction would need a watermark-delayed
emit.

State per key is one boolean — at 100 TB the state store stays tiny no
matter the throughput; partitioning follows groupBy(keys).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType([StructField("fired", LongType())])

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_anomaly_ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def first_crossing_stream(
    events: DataFrame,
    threshold: float,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One output row per key: the first arriving event whose value
    exceeds ``threshold``."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        fired = state.get[0] == 1 if state.exists else False
        hit = None
        # A group's micro-batch may arrive as MULTIPLE Arrow chunks with
        # no cross-chunk ordering; scan them all and keep the min-ts
        # crossing so a later chunk holding an earlier event still wins
        # within the batch (across batches, arrival order stands).
        for pdf in pdfs:
            if fired and hit is None:
                continue
            over = pdf[pdf[value_col] > threshold]
            if len(over):
                first = over.sort_values(ts_col).iloc[0]
                if hit is None or first[ts_col] < hit[1]:
                    hit = (int(key[0]), first[ts_col], float(first[value_col]))
                fired = True
        state.update((1 if fired else 0,))
        if hit is not None:
            yield pd.DataFrame(
                {
                    "user_id": [hit[0]],
                    "first_anomaly_ts": [hit[1]],
                    "value": [hit[2]],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
