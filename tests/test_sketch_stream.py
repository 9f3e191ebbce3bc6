"""Streaming sketch-rollup maintenance (streaming/sketch_stream.py):
the at-rest per-minute HLL rollup built by the watermarked stream must
answer trailing-window distinct questions with EXACTLY the estimates
the batch windowed-sketch path gives over the same events — HLL
register merge is max(), so micro-batch boundaries and arrival order
cannot change the finalized sketches."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from anomaly_detection_iiot_spark.queries.base import t
from anomaly_detection_iiot_spark.streaming import sketch_stream

SF_DIR = "/root/testdata/sf0.001"


def test_sliding_sketch_stream_matches_batch(spark, tmp_path):
    ev = t(spark, SF_DIR, "events").select("ts", "event_type", "user_id")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]

    # three interleaved slices (each minute's rows span micro-batches,
    # so finalized sketches must merge across batches), plus a far-
    # future flush row that advances the watermark past every real
    # minute at end-of-stream
    indir = str(tmp_path / "in")
    for i in range(3):
        ev.filter(F.col("user_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(indir)
    flush = spark.createDataFrame(
        [(max_ts, "view", -1)], "ts timestamp, event_type string, user_id long"
    ).select(
        (F.col("ts") + F.expr("INTERVAL 41 DAYS")).alias("ts"),
        "event_type",
        "user_id",
    )
    flush.coalesce(1).write.mode("append").parquet(indir)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    # 40-day watermark (wider than the 26-day event span): nothing in the
    # interleaved slices is ever late, and the +41d flush row still closes every real minute
    q = sketch_stream.ingest_minute_sketches(
        stream,
        rollup_path=str(tmp_path / "rollup"),
        checkpoint=str(tmp_path / "ckpt"),
        watermark="40 days",
    )
    q.awaitTermination(120)

    got = {
        (r.event_type, r.minute): r.n_hll
        for r in sketch_stream.sliding_distinct_serve(
            spark, str(tmp_path / "rollup")
        )
        .filter(F.col("minute") <= F.lit(max_ts))
        .collect()
    }

    # batch twin over the same (real) events
    mins = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute")
    ).agg(F.hll_sketch_agg("user_id", F.lit(sketch_stream.LG_K)).alias("sk"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("minute"))
        .rangeBetween(-3540, 0)
    )
    want = {
        (r.event_type, r.minute): r.n_hll
        for r in mins.select(
            "event_type",
            "minute",
            F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias(
                "n_hll"
            ),
        ).collect()
    }
    assert got == want and len(got) > 100
