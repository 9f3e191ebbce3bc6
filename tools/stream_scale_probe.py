"""Streaming scale probe: bearing_stream + curation_stream at 1x/10x/100x
arrival (VERDICT r7 task 6 / r8 task 4).

The batch families have measured scaling curves (tools/scale_probe.py);
this closes the gap for the two streaming heavies. Two claims are
turned into numbers, per pipeline:

1. **State is watermark-bounded, not stream-length-bounded.** Run the
   same pipeline over a 1x / 10x / 100x LONGER stream at a fixed
   files-per-trigger (so per-batch event-time span is constant) and
   read ``stateOperators[*].numRowsTotal`` from the query's own
   progress events. If state tracked stream length, max rows would grow
   with the scale factor; watermark eviction keeps it flat.
2. **Per-batch wall is flat over the stream** (no state accumulation
   slowdown) **and sublinear in arrival rate.** The rate probe fixes
   the batch COUNT and scales files-per-trigger 10x/100x: per-batch
   wall should grow far slower than rows-per-batch (fixed micro-batch
   overhead dominates; per-row cost falls).

Event-time clocks are synthetic and deterministic: bearing file names
ARE the event time (10 s apart, 6 files per 1-minute window, amplitude
bursting 2 windows on / 3 off so session episodes open AND close);
curation chunks carry an explicit ``crawl_ts`` advancing 1 minute per
chunk against a 2-minute dedup watermark, with a 20 % duplicate rate
re-delivering chunk-0 content so the dedup state does real work.

Usage:
    python tools/stream_scale_probe.py [--scales 1,10,100] [--out README-rows]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import tempfile
import time
import uuid


# --- corpus generators -------------------------------------------------------

_BEARING_T0 = time.mktime((2004, 2, 12, 10, 0, 0, 0, 0, -1))


def make_bearing_dir(root: str, n_files: int, rows_per_file: int = 64) -> str:
    """Snapshot dir: 4-channel TSV files named with event times 10 s
    apart (6 per 1-minute window). Amplitude bursts 2 windows on / 3
    off (vs threshold 50), so episodes both open and close. mtimes
    ascend so the file source drains in event order."""
    out = os.path.join(root, f"bearing_{n_files}")
    os.makedirs(out, exist_ok=True)
    for i in range(n_files):
        ts = _BEARING_T0 + 10 * i
        name = time.strftime("%Y.%m.%d.%H.%M.%S", time.localtime(ts))
        amp = 80.0 if (i // 6) % 5 < 2 else 0.1
        line = "\t".join([f"{amp:.1f}"] * 4) + "\n"
        p = os.path.join(out, name)
        with open(p, "w") as fh:
            fh.write(line * rows_per_file)
        os.utime(p, (ts, ts))
    return out


def make_curation_dir(root: str, n_chunks: int, docs_per_chunk: int = 200) -> str:
    """Parquet chunks with an explicit crawl_ts advancing 1 minute per
    chunk; 20 % of each chunk re-delivers chunk-0 content (exact dups
    for the hash-dedup state), the rest is unique keeper-grade text."""
    import pandas as pd

    out = os.path.join(root, f"curation_{n_chunks}")
    os.makedirs(out, exist_ok=True)
    base = "the cat sat on the mat and the dog is in the house of cards"
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    for c in range(n_chunks):
        ids, texts = [], []
        for d in range(docs_per_chunk):
            doc_id = c * docs_per_chunk + d
            ids.append(doc_id)
            if d % 5 == 0 and c > 0:  # 20% re-delivery of chunk-0 content
                texts.append(f"{base} number {d}")
            else:
                texts.append(f"{base} number {doc_id}")
        pdf = pd.DataFrame(
            {
                "doc_id": pd.array(ids, dtype="int64"),
                "lang": "en",
                "text": texts,
                "crawl_ts": t0 + pd.Timedelta(minutes=c),
            }
        )
        p = os.path.join(out, f"chunk_{c:05d}.parquet")
        # micros, not pandas' default nanos: Spark reads TIMESTAMP(NANOS)
        # only behind a legacy flag
        pdf.to_parquet(p, coerce_timestamps="us", allow_truncated_timestamps=True)
        mt = time.time() - 3600 + c
        os.utime(p, (mt, mt))
    return out


# --- probe runners -----------------------------------------------------------

def _drain(stream_df, name: str):
    """availableNow drain to a memory sink; returns the progress list
    (one dict per non-empty micro-batch)."""
    ckpt = tempfile.mkdtemp(prefix=f"{name}_ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        progress = [
            p if isinstance(p, dict) else json.loads(p.json)
            for p in q.recentProgress
        ]
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return [p for p in progress if p.get("numInputRows", 0) > 0]


def _summarize(progress: list[dict], wall: float, scale: int) -> dict:
    batch_ms = [p["durationMs"]["triggerExecution"] for p in progress]
    state_rows = [
        sum(op["numRowsTotal"] for op in p.get("stateOperators", []))
        for p in progress
    ]
    return {
        "scale": scale,
        "wall_sec": round(wall, 2),
        "batches": len(progress),
        "rows_in": int(sum(p["numInputRows"] for p in progress)),
        "batch_ms_median": round(statistics.median(batch_ms)),
        "batch_ms_max": max(batch_ms),
        "state_rows_max": max(state_rows) if state_rows else 0,
        "state_rows_final": state_rows[-1] if state_rows else 0,
    }


def probe_bearing_length(spark, root: str, scale: int,
                         files_per_trigger: int = 20) -> dict:
    """Duration scaling: stream is `scale`x longer, per-batch span fixed."""
    from anomaly_detection_iiot_spark.streaming import bearing_stream

    src = make_bearing_dir(root, 100 * scale)
    episodes = bearing_stream.snapshot_anomaly_episodes_stream(
        spark, src, n_cols=4, threshold=50.0,
        max_files_per_trigger=files_per_trigger,
    )
    t0 = time.time()
    progress = _drain(episodes, f"probe_bearing_len_{scale}_{uuid.uuid4().hex[:6]}")
    return _summarize(progress, time.time() - t0, scale)


def probe_bearing_rate(spark, root: str, scale: int, batches: int = 5) -> dict:
    """Rate scaling: fixed batch count, `scale`x files per batch."""
    from anomaly_detection_iiot_spark.streaming import bearing_stream

    fpt = 20 * scale
    src = make_bearing_dir(root, batches * fpt)
    episodes = bearing_stream.snapshot_anomaly_episodes_stream(
        spark, src, n_cols=4, threshold=50.0, max_files_per_trigger=fpt,
    )
    t0 = time.time()
    progress = _drain(episodes, f"probe_bearing_rate_{scale}_{uuid.uuid4().hex[:6]}")
    return _summarize(progress, time.time() - t0, scale)


def probe_curation_length(spark, root: str, scale: int) -> dict:
    """Duration scaling: `scale`x more chunks (1 chunk = 1 batch = 1
    event-minute) against a fixed 2-minute dedup watermark."""
    from anomaly_detection_iiot_spark.streaming import curation_stream

    src = make_curation_dir(root, 5 * scale)
    sdf = curation_stream.curated_document_stream(
        spark.readStream.schema(
            "doc_id bigint, lang string, text string, crawl_ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        dedup_watermark="2 minutes",
        ingest_ts_col="crawl_ts",
    )
    t0 = time.time()
    progress = _drain(sdf, f"probe_curation_{scale}_{uuid.uuid4().hex[:6]}")
    return _summarize(progress, time.time() - t0, scale)


def make_cusum_dir(root: str, n_chunks: int, n_keys: int = 50,
                   rows_per_key_chunk: int = 20) -> str:
    """Parquet chunks for the CUSUM monitor: n_keys user series, each
    chunk advancing every key's series by rows_per_key_chunk samples
    (deterministic sinusoid + a mean shift on half the keys midway, so
    alarms actually fire). mtimes ascend for in-order drain."""
    import math

    import pandas as pd

    out = os.path.join(root, f"cusum_{n_chunks}")
    os.makedirs(out, exist_ok=True)
    t0 = time.mktime((2024, 3, 1, 0, 0, 0, 0, 0, -1))
    now = time.time()
    for c in range(n_chunks):
        rows = []
        for u in range(n_keys):
            for j in range(rows_per_key_chunk):
                i = c * rows_per_key_chunk + j
                shift = 9.0 if (u % 2 == 0 and i >= n_chunks * 10) else 0.0
                rows.append(
                    {
                        "ts": pd.Timestamp.fromtimestamp(t0 + 60 * i),
                        "event_id": u * 1_000_000 + i,
                        "user_id": u,
                        "value": math.sin(0.7 * i + u) + shift,
                    }
                )
        p = os.path.join(out, f"chunk_{c:04d}.parquet")
        pd.DataFrame(rows).to_parquet(
            p, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(p, (now - 600 + c, now - 600 + c))
    return out


def probe_cusum_length(spark, root: str, scale: int) -> dict:
    """Duration scaling for the online CUSUM monitor: `scale`x more
    chunks over a FIXED key set — state must stay at |keys| rows (one
    scalar recurrence row per key) no matter the stream length."""
    from anomaly_detection_iiot_spark.streaming import cusum_stream

    src = make_cusum_dir(root, 5 * scale)
    sdf = cusum_stream.cusum_alarm_stream(
        spark.readStream.schema(
            "ts timestamp, event_id bigint, user_id bigint, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        base_k=30,
    )
    t0 = time.time()
    progress = _drain(sdf, f"probe_cusum_{scale}_{uuid.uuid4().hex[:6]}")
    return _summarize(progress, time.time() - t0, scale)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,100")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from anomaly_detection_iiot_spark.session import get_spark

    spark = get_spark(
        "stream-scale-probe",
        # keep every micro-batch's progress event: the default retention
        # (100) would silently truncate the 100x runs' ~500 batches to
        # their tail — still the steady state, but rows_in would under-
        # count and "max over the stream" would really be "max over the
        # last 100 batches"
        extra_conf={"spark.sql.streaming.numRecentProgressUpdates": "1000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # streaming state partitions are frozen at query start and never
    # AQE-coalesced: size to key cardinality, not core count (the
    # measured 8-vs-32-partition note in streaming/bearing_stream.py)
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    root = tempfile.mkdtemp(prefix="stream_scale_probe_")
    try:
        results = {
            "bearing_length": [],
            "bearing_rate": [],
            "curation_length": [],
            "cusum_length": [],
        }
        for s in scales:
            results["bearing_length"].append(probe_bearing_length(spark, root, s))
            print("bearing_length", json.dumps(results["bearing_length"][-1]))
        for s in scales:
            results["bearing_rate"].append(probe_bearing_rate(spark, root, s))
            print("bearing_rate", json.dumps(results["bearing_rate"][-1]))
        for s in scales:
            results["curation_length"].append(probe_curation_length(spark, root, s))
            print("curation_length", json.dumps(results["curation_length"][-1]))
        for s in scales:
            results["cusum_length"].append(probe_cusum_length(spark, root, s))
            print("cusum_length", json.dumps(results["cusum_length"][-1]))

        print("\n## Streaming scale probe (markdown)\n")
        for fam, rows in results.items():
            print(f"**{fam}**\n")
            print("| scale | wall s | batches | rows in | batch ms (med/max) "
                  "| state rows (max/final) |")
            print("|---|---|---|---|---|---|")
            for r in rows:
                print(
                    f"| {r['scale']}x | {r['wall_sec']} | {r['batches']} "
                    f"| {r['rows_in']} | {r['batch_ms_median']}/{r['batch_ms_max']} "
                    f"| {r['state_rows_max']}/{r['state_rows_final']} |"
                )
            print()
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
