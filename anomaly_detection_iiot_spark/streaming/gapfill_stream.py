"""Streaming twins of the W17/W18 grid queries: gap-fill (LOCF) and
time-weighted linear interpolation over a live sensor feed.

Sensor feeds are the reference's native arrival mode (SURVEY §2.9 —
the rig writes one file per snapshot and the pipeline tails the
directory; src/utils/files.py collects them incrementally). The batch
builders in queries/timeseries.py (w17_gap_fill / w18_interpolate)
assume the whole series is present; online, two things need state:

1. **Hourly means must be finalized** before a slot can be filled — a
   slot's mean is only correct once the watermark passes its window
   end (late rows inside the watermark still belong to it).
2. **The carried observation crosses micro-batch boundaries** — a gap
   spanning batches must be filled from the LAST finalized slot of a
   PREVIOUS batch. Interpolation additionally needs the *next*
   observation, so a gap can only be emitted when the slot that closes
   it finalizes — never eagerly.

Spark refuses ``applyInPandasWithState`` *after* a streaming
aggregation ("applyInPandasWithState in append mode is not supported
after aggregation"), so the windowed mean cannot be a separate
upstream stage. Instead ONE stateful operator does both jobs, keyed by
user: its GroupState holds the open (not-yet-finalized) hourly buckets
as parallel (slot, sum, count) arrays plus the last emitted
(slot, value) pair. Each invocation merges the batch into the buckets,
finalizes every bucket whose window end has fallen behind
``getCurrentWatermarkMs()`` (emitting fill rows for any interior gap),
and arms an **event-time timeout** at the earliest still-open window
end — so a slot finalizes on the no-data micro-batch that advances the
watermark even if that key never receives another row.

Late-data contract (same as Spark's own windowed agg): a row whose
slot is already finalized is dropped (the slot was emitted without
it); a late row inside the watermark merges into its open bucket.

Scale: state per key is O(open buckets) = O(watermark horizon /
1 hour) + one (timestamp, double) pair — independent of throughput;
the single shuffle is the groupBy(user_id) hash partition. At 100 TB/
day with 1M sensors the state store holds ~1M tiny rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

HOUR_US = 3_600 * 1_000_000
HOUR_MS = 3_600 * 1_000

STATE_SCHEMA = StructType(
    [
        StructField("slots_us", ArrayType(LongType())),
        StructField("sums", ArrayType(DoubleType())),
        StructField("counts", ArrayType(LongType())),
        StructField("last_slot_us", LongType()),
        StructField("last_value", DoubleType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("slot", TimestampType()),
        StructField("value_filled", DoubleType()),
        StructField("was_gap", BooleanType()),
    ]
)


def gap_fill_stream(
    events: DataFrame,
    mode: str = "locf",
    watermark: str = "2 hours",
) -> DataFrame:
    """Finalized hourly grid per user over a raw event stream.

    mode='locf'   → W17 semantics (carry last observation forward)
    mode='interp' → W18 semantics (time-weighted linear blend)

    Emits every grid slot exactly once per key: observed slots with
    was_gap=false, filled slots with was_gap=true. The grid starts at
    a key's first observed hour (same contract as the batch grid's
    min(slot)); it extends as observations finalize."""
    if mode not in ("locf", "interp"):
        raise ValueError(f"mode must be locf|interp, got {mode!r}")
    interp = mode == "interp"

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            slots, sums, counts, last_us, last_v = state.get
            buckets = {
                s: (sm, c) for s, sm, c in zip(slots, sums, counts)
            }
        else:
            buckets, last_us, last_v = {}, None, None
        uid = int(key[0])
        wm_us = state.getCurrentWatermarkMs() * 1_000

        if not state.hasTimedOut:
            for pdf in pdfs:
                slot_us = (
                    pdf["ts"].astype("int64") // 1_000 // HOUR_US
                ) * HOUR_US
                for s, v in zip(slot_us, pdf["value"]):
                    s = int(s)
                    if last_us is not None and s <= last_us:
                        continue  # slot already finalized and emitted
                    if s + HOUR_US <= wm_us:
                        # Spark does NOT pre-filter late rows for
                        # arbitrary stateful ops (unlike its windowed
                        # agg) — enforce the same contract by hand: a
                        # row whose window end is behind the watermark
                        # is too late; its slot finalizes this batch
                        # without it
                        continue
                    sm, c = buckets.get(s, (0.0, 0))
                    buckets[s] = (sm + float(v), c + 1)

        # finalize every bucket whose window end <= watermark
        ready = sorted(s for s in buckets if s + HOUR_US <= wm_us)
        out_slot, out_val, out_gap = [], [], []
        for s in ready:
            sm, c = buckets.pop(s)
            v = sm / c
            if last_us is not None:
                span = s - last_us
                g = last_us + HOUR_US
                while g < s:
                    if interp:
                        fill = last_v + (v - last_v) * ((g - last_us) / span)
                    else:
                        fill = last_v
                    out_slot.append(g)
                    out_val.append(fill)
                    out_gap.append(True)
                    g += HOUR_US
            out_slot.append(s)
            out_val.append(v)
            out_gap.append(False)
            last_us, last_v = s, v

        state.update(
            (
                sorted(buckets),
                [buckets[s][0] for s in sorted(buckets)],
                [buckets[s][1] for s in sorted(buckets)],
                last_us,
                last_v,
            )
        )
        if buckets:
            # wake up when the earliest open window can finalize (its
            # end is > watermark by construction — all ripe buckets
            # were just popped — so the timestamp is legal)
            state.setTimeoutTimestamp(min(buckets) // 1_000 + HOUR_MS)
        if out_slot:
            yield pd.DataFrame(
                {
                    "user_id": uid,
                    "slot": pd.to_datetime(out_slot, unit="us"),
                    "value_filled": out_val,
                    "was_gap": out_gap,
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
