"""applyInPandasWithState first-crossing: exactly one alarm per key
across micro-batches; quiet keys stay silent; state survives batches."""

from __future__ import annotations

import pandas as pd
import pytest

from anomaly_detection_iiot_spark.streaming.stateful import (
    first_crossing_stream,
)


@pytest.fixture()
def event_batches(spark, tmp_path):
    """Two parquet files processed as separate micro-batches
    (maxFilesPerTrigger=1). Key 1 crosses in batch 0 AND batch 1 (must
    alarm once, from batch 0); key 2 crosses only in batch 1; key 3
    never crosses."""
    base = pd.Timestamp("2024-01-01 00:00:00")
    b0 = pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(seconds=s) for s in (0, 1, 2)],
            "user_id": [1, 1, 3],
            "value": [0.5, 9.0, 0.2],
        }
    )
    b1 = pd.DataFrame(
        {
            "ts": [base + pd.Timedelta(seconds=s) for s in (10, 11, 12)],
            "user_id": [1, 2, 3],
            "value": [99.0, 7.5, 0.3],
        }
    )
    src = tmp_path / "events"
    src.mkdir()
    for i, b in enumerate([b0, b1]):
        spark.createDataFrame(b).coalesce(1).write.parquet(
            str(src / f"batch{i}")
        )
    return str(src)


def test_single_alarm_per_key(spark, event_batches, tmp_path):
    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(event_batches + "/*")
    )
    alarms = first_crossing_stream(stream, threshold=1.0)
    q = (
        alarms.writeStream.format("memory")
        .queryName("alarms")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.first_anomaly_ts, r.value)
        for r in spark.table("alarms").collect()
    }
    # key 3 never alarms; keys 1 and 2 alarm exactly once
    assert set(got) == {1, 2}
    assert got[1][1] == 9.0   # batch-0 crossing wins, batch-1 ignored
    assert got[2][1] == 7.5
    assert got[1][0] == pd.Timestamp("2024-01-01 00:00:01")
