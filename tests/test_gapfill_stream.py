"""Streaming gap-fill / interpolation twins (streaming/gapfill_stream.py)
must equal the batch W17/W18 grid queries across micro-batch
boundaries, with LOCF state carried between batches and late data
honored inside the watermark / dropped beyond it."""

from __future__ import annotations

import os
import time
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from anomaly_detection_iiot_spark.streaming.gapfill_stream import (
    gap_fill_stream,
)

_SCHEMA = "ts timestamp, user_id bigint, value double"
_T0 = datetime(2024, 3, 1, 0, 0, 0)
# far-future sentinel user: pushes the watermark past every real
# window during the availableNow drain, excluded from comparisons
_SENTINEL = 999


def _mk(hours, user, value):
    return {"ts": _T0 + timedelta(hours=hours), "user_id": user,
            "value": float(value)}


def _write_chunks(tmp_path, chunks) -> str:
    out = str(tmp_path / "sensor_stream")
    os.makedirs(out)
    now = time.time()
    for i, rows in enumerate(chunks):
        p = os.path.join(out, f"chunk_{i}.parquet")
        pd.DataFrame(rows).to_parquet(
            p, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(p, (now - 60 + i, now - 60 + i))
    return out


def _drain(sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _batch_expected(spark, src, mode):
    """Batch W17/W18 semantics over the same files, restricted to the
    slots the stream can have finalized (everything before the
    sentinel, i.e. all real data)."""
    ev = (
        spark.read.schema(_SCHEMA).parquet(src)
        .filter(F.col("user_id") != _SENTINEL)
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("slot")
    ).agg(F.avg("value").alias("v"))
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("slot").alias("lo"), F.max("slot").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("slot"),
        )
    )
    j = grid.join(hourly, ["user_id", "slot"], "left")
    back = (
        Window.partitionBy("user_id").orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    if mode == "locf":
        filled = F.last("v", ignorenulls=True).over(back)
    else:
        fwd = (
            Window.partitionBy("user_id").orderBy("slot")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        obs_slot = F.when(F.col("v").isNotNull(), F.col("slot"))
        prev_v = F.last("v", ignorenulls=True).over(back)
        prev_t = F.last(obs_slot, ignorenulls=True).over(back)
        next_v = F.first("v", ignorenulls=True).over(fwd)
        next_t = F.first(obs_slot, ignorenulls=True).over(fwd)
        frac = (
            (F.unix_timestamp("slot") - F.unix_timestamp(prev_t))
            / (F.unix_timestamp(next_t) - F.unix_timestamp(prev_t))
        )
        filled = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
            prev_v + (next_v - prev_v) * frac
        )
    return (
        j.select("user_id", "slot", filled.alias("value_filled"),
                 F.col("v").isNull().alias("was_gap"))
        .toPandas().sort_values(["user_id", "slot"])
        .reset_index(drop=True)
    )


# A gap that SPANS micro-batch boundaries: user 7 observes hour 0 in
# chunk 0 and next observes hour 4 in chunk 2 — the three filled slots
# must come out of carried state, not a single-batch window. User 8's
# late row (chunk 2, event-time hour 1.5, watermark still behind it)
# must land in its hourly window before that slot finalizes.
_CHUNKS = [
    [
        _mk(0.0, 7, 10.0),
        _mk(0.25, 7, 14.0),        # same slot, second sample -> mean
        _mk(0.5, 8, 100.0),
        _mk(1.5, 8, 110.0),
    ],
    [
        _mk(4.0, _SENTINEL, 0.0),  # watermark -> hour 2: finalizes 0..1
        _mk(1.6, 8, 130.0),        # LATE but inside the 2h watermark
    ],
    [
        _mk(4.0, 7, 30.0),         # closes user 7's 4-hour gap
        _mk(3.5, 8, 160.0),
    ],
    [
        _mk(12.0, _SENTINEL, 0.0),  # flush: finalize everything real
    ],
]


def _run_stream(spark, src, mode, name):
    stream = gap_fill_stream(
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        mode=mode,
    )
    _drain(stream, name)
    return (
        spark.table(name)
        .filter(F.col("user_id") != _SENTINEL)
        .toPandas().sort_values(["user_id", "slot"])
        .reset_index(drop=True)
    )


def _assert_frames_equal(got, exp):
    assert len(got) == len(exp), (len(got), len(exp))
    pd.testing.assert_series_equal(got["user_id"], exp["user_id"])
    pd.testing.assert_series_equal(got["slot"], exp["slot"])
    pd.testing.assert_series_equal(got["was_gap"], exp["was_gap"])
    np.testing.assert_allclose(
        got["value_filled"].to_numpy(),
        exp["value_filled"].to_numpy(), rtol=1e-9,
    )


def test_locf_stream_equals_batch_across_boundaries(spark, tmp_path):
    src = _write_chunks(tmp_path, _CHUNKS)
    got = _run_stream(spark, src, "locf", "gapfill_locf")
    exp = _batch_expected(spark, src, "locf")
    _assert_frames_equal(got, exp)
    # the cross-batch gap really was filled from carried state
    u7 = got[got.user_id == 7]
    assert list(u7.was_gap) == [False, True, True, True, False]
    assert np.allclose(u7.value_filled.iloc[1:4], 12.0)  # mean(10, 14)
    # the late-but-in-watermark row landed in its hourly mean
    u8 = got[(got.user_id == 8) & (got.slot == _T0 + timedelta(hours=1))]
    assert np.allclose(u8.value_filled.iloc[0], 120.0)  # mean(110, 130)


def test_interp_stream_equals_batch(spark, tmp_path):
    src = _write_chunks(tmp_path, _CHUNKS)
    got = _run_stream(spark, src, "interp", "gapfill_interp")
    exp = _batch_expected(spark, src, "interp")
    _assert_frames_equal(got, exp)
    # time-weighted blend across the batch-boundary gap: 12 -> 30 over
    # 4 hours = 16.5, 21.0, 25.5
    u7 = got[got.user_id == 7]
    np.testing.assert_allclose(
        u7.value_filled.to_numpy(), [12.0, 16.5, 21.0, 25.5, 30.0]
    )


def test_gapfill_drops_beyond_watermark(spark, tmp_path):
    # a row later than watermark+window horizon must be dropped by the
    # hourly aggregation (its slot already finalized WITHOUT it)
    chunks = [
        [_mk(0.0, 7, 10.0), _mk(1.0, 7, 20.0)],
        [_mk(8.0, _SENTINEL, 0.0)],   # watermark -> hour 6
        [_mk(9.0, _SENTINEL, 0.0),    # advance again: eviction ran
         _mk(0.9, 7, 999.0)],         # far beyond watermark -> dropped
        [_mk(14.0, _SENTINEL, 0.0)],
    ]
    src = _write_chunks(tmp_path, chunks)
    got = _run_stream(spark, src, "locf", "gapfill_late_drop")
    u7 = got[got.user_id == 7]
    # slot 0 finalized from the on-time row alone; the 999 never lands
    assert np.allclose(
        u7.value_filled.to_numpy(), [10.0, 20.0]
    ), u7.value_filled.tolist()
