"""Resource-usage source/sink (SURVEY §2.1 S10).

Reference semantics (`/root/reference/src/util/logger.py:49-69`): a
side thread samples the training process's CPU%% and RSS once a second
and appends ``<iso_ts>,<cpu>,<mem_mb>`` lines to a text file;
``logger.py:72-97`` parses the file back and aggregates. The redesign
has three Spark-native layers:

1. **Sampling** — stdlib ``/proc`` reads (psutil is absent from the
   container). ``sample_executor_resources`` runs the sampler INSIDE
   executor tasks via ``mapInPandas`` so each row describes the worker
   process that produced it; on a cluster this shards across
   executors, on ``local[N]`` every row reports the one JVM (the
   Python worker forks still give distinct pids).
2. **Sink + scan round-trip** — ``log_resource_usage`` appends the
   reference's exact CSV line shape; ``read_resource_log`` scans it
   back with an explicit schema (no inference, like the S5 reader).
3. **Cluster-grade metrics table** — ``task_metrics_from_event_log``
   parses Spark's own event log (the serialized SparkListener bus)
   into a per-task metrics DataFrame: run time, GC time, shuffle
   read/write bytes, peak memory. This is the "SparkListener-based
   metrics table" analogue: instead of registering a live listener
   through py4j callbacks (driver-bound, fragile), the engine reads
   the durable log Spark already writes — declarative, replayable,
   and joinable like any other table. ``tools/scale_probe.py`` uses it
   to measure per-stage shuffle bytes for the dedup family.
"""

from __future__ import annotations

import os
import time
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CLK_TCK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100
_PAGE = os.sysconf("SC_PAGE_SIZE") if hasattr(os, "sysconf") else 4096


def _proc_sample() -> dict:
    """One /proc/self snapshot: cumulative CPU jiffies + RSS MiB.

    stdlib-only stand-in for ``psutil.Process().cpu_percent`` /
    ``memory_info().rss`` (logger.py:62-66); fields 14/15 of
    ``/proc/self/stat`` are utime/stime, field 2 of
    ``/proc/self/statm`` is resident pages.
    """
    with open("/proc/self/stat") as fh:
        parts = fh.read().rsplit(")", 1)[1].split()
    utime, stime = int(parts[11]), int(parts[12])
    with open("/proc/self/statm") as fh:
        rss_pages = int(fh.read().split()[1])
    return {
        "pid": os.getpid(),
        "cpu_jiffies": utime + stime,
        "rss_mb": rss_pages * _PAGE / (1024 * 1024),
    }


_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("slot", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("pid", T.LongType()),
        T.StructField("cpu_jiffies", T.LongType()),
        T.StructField("rss_mb", T.DoubleType()),
        T.StructField("sampled_at", T.DoubleType()),
    ]
)


def sample_executor_resources(spark: SparkSession, n_slots: int = 8) -> DataFrame:
    """One resource row per executor slot: the distributed analogue of
    the reference's single-process sampler. ``repartition(n_slots)``
    pins exactly one task per row so the sample describes the worker
    that ran it."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import socket

        for pdf in batches:
            if pdf.empty:
                continue
            s = _proc_sample()  # one /proc read per partition
            yield pd.DataFrame(
                {
                    "slot": pdf["id"].astype("int64"),
                    "host": socket.gethostname(),
                    "pid": s["pid"],
                    "cpu_jiffies": s["cpu_jiffies"],
                    "rss_mb": s["rss_mb"],
                    "sampled_at": time.time(),
                }
            )

    # round-robin repartition (no column) balances exactly, unlike a
    # hash repartition of n ids into n partitions (collisions leave
    # slots empty); emitting per input row keeps the row count == n
    # even if two ids do share a partition.
    return (
        spark.range(n_slots)
        .repartition(n_slots)
        .mapInPandas(_sample, _SAMPLE_SCHEMA)
    )


def log_resource_usage(
    path: str, interval_s: float = 1.0, n_samples: int = 5
) -> int:
    """Driver-side sampler appending the reference's exact line shape
    ``<iso_ts>,<cpu_pct>,<rss_mb>`` (logger.py:68). CPU%% is the jiffy
    delta across ``interval_s``, like ``psutil.cpu_percent(interval)``.
    Returns the number of lines written."""
    prev = _proc_sample()
    written = 0
    with open(path, "a") as fh:
        for _ in range(n_samples):
            time.sleep(interval_s)
            cur = _proc_sample()
            cpu_pct = (
                100.0 * (cur["cpu_jiffies"] - prev["cpu_jiffies"]) / _CLK_TCK / interval_s
            )
            fh.write(f"{datetime.now().isoformat()},{cpu_pct:.1f},{cur['rss_mb']:.1f}\n")
            written += 1
            prev = cur
    return written


_LOG_SCHEMA = T.StructType(
    [
        T.StructField("sampled_at", T.TimestampType()),
        T.StructField("cpu_pct", T.DoubleType()),
        T.StructField("rss_mb", T.DoubleType()),
    ]
)


def read_resource_log(spark: SparkSession, path: str) -> DataFrame:
    """S10 scan side: explicit schema, no inference (the reference
    reader at logger.py:72-97 splits the same three fields)."""
    return spark.read.schema(_LOG_SCHEMA).csv(path)


# --- event-log metrics table --------------------------------------------------

# Spark writes compact JSON ('"Event":"..."'), but any JSON writer may
# put a space after the colon — match on the value alone, which only
# ever appears as the Event discriminator.
_TASK_END = '"SparkListenerTaskEnd"'


_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("Stage ID", T.LongType()),
        T.StructField(
            "Task Info",
            T.StructType(
                [
                    T.StructField("Task ID", T.LongType()),
                    T.StructField("Executor ID", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "Task Metrics",
            T.StructType(
                [
                    T.StructField("Executor Run Time", T.LongType()),
                    T.StructField("JVM GC Time", T.LongType()),
                    T.StructField("Peak Execution Memory", T.LongType()),
                    T.StructField(
                        "Input Metrics",
                        T.StructType([T.StructField("Bytes Read", T.LongType())]),
                    ),
                    T.StructField(
                        "Output Metrics",
                        T.StructType([T.StructField("Bytes Written", T.LongType())]),
                    ),
                    T.StructField(
                        "Shuffle Read Metrics",
                        T.StructType(
                            [
                                T.StructField("Remote Bytes Read", T.LongType()),
                                T.StructField("Local Bytes Read", T.LongType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "Shuffle Write Metrics",
                        T.StructType(
                            [T.StructField("Shuffle Bytes Written", T.LongType())]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def task_metrics_from_event_log(spark: SparkSession, log_path: str) -> DataFrame:
    """Per-task metrics from a Spark event log (JSON-lines).

    Declarative parse: scan as text, keep ``SparkListenerTaskEnd``
    events, then ``from_json`` with a PARTIAL explicit schema — one
    parse per line, field names with spaces handled, extra fields
    ignored, and none of the huge merged schema ``spark.read.json``
    would infer over heterogeneous event types.
    """
    parsed = (
        spark.read.text(log_path)
        .filter(F.col("value").contains(_TASK_END))
        .select(F.from_json("value", _EVENT_SCHEMA).alias("e"))
    )
    m = "e.`Task Metrics`"
    return parsed.select(
        F.col("e.`Stage ID`").alias("stage_id"),
        F.col("e.`Task Info`.`Task ID`").alias("task_id"),
        F.col("e.`Task Info`.`Executor ID`").alias("executor_id"),
        F.col(f"{m}.`Executor Run Time`").alias("run_time_ms"),
        F.col(f"{m}.`JVM GC Time`").alias("gc_time_ms"),
        F.col(f"{m}.`Peak Execution Memory`").alias("peak_memory_bytes"),
        F.col(f"{m}.`Input Metrics`.`Bytes Read`").alias("input_bytes"),
        F.col(f"{m}.`Output Metrics`.`Bytes Written`").alias("output_bytes"),
        (
            F.col(f"{m}.`Shuffle Read Metrics`.`Remote Bytes Read`")
            + F.col(f"{m}.`Shuffle Read Metrics`.`Local Bytes Read`")
        ).alias("shuffle_read_bytes"),
        F.col(f"{m}.`Shuffle Write Metrics`.`Shuffle Bytes Written`").alias(
            "shuffle_write_bytes"
        ),
    )


_STAGE_COMPLETED = '"SparkListenerStageCompleted"'

_STAGE_SCHEMA = T.StructType(
    [
        T.StructField(
            "Stage Info",
            T.StructType(
                [
                    T.StructField("Stage ID", T.LongType()),
                    T.StructField("Stage Name", T.StringType()),
                ]
            ),
        )
    ]
)


def stage_names_from_event_log(
    spark: SparkSession, log_path: str
) -> DataFrame:
    """(stage_id, stage_name) from StageCompleted events — the label
    that lets per-stage executor time (VERDICT r11 item 3: name
    d12_containment's dominating stage) be attributed to an operator
    in the plan instead of an opaque stage id. Same partial-schema
    from_json parse as task_metrics_from_event_log."""
    return (
        spark.read.text(log_path)
        .filter(F.col("value").contains(_STAGE_COMPLETED))
        .select(F.from_json("value", _STAGE_SCHEMA).alias("e"))
        .select(
            F.col("e.`Stage Info`.`Stage ID`").alias("stage_id"),
            F.col("e.`Stage Info`.`Stage Name`").alias("stage_name"),
        )
        .dropDuplicates(["stage_id"])
    )


def stage_metrics_summary(task_metrics: DataFrame) -> DataFrame:
    """Roll tasks up to stages — the table the scale probe reports."""
    return (
        task_metrics.groupBy("stage_id")
        .agg(
            F.count(F.lit(1)).alias("n_tasks"),
            F.sum("run_time_ms").alias("run_time_ms"),
            F.sum("shuffle_read_bytes").alias("shuffle_read_bytes"),
            F.sum("shuffle_write_bytes").alias("shuffle_write_bytes"),
            F.sum("input_bytes").alias("input_bytes"),
            F.max("peak_memory_bytes").alias("max_task_peak_memory"),
        )
        .orderBy("stage_id")
    )
