"""Online CUSUM drift monitor — the streaming twin of the batch w22
query (queries/extras.py::w22_cusum), giving the monitoring family its
stateful-streaming counterpart.

Per-key state machine via ``applyInPandasWithState``:

- **baseline phase**: buffer the first ``base_k`` arrivals (bounded —
  the buffer can never exceed base_k doubles per key); once full, fix
  ``mu = round(mean, 6)`` and ``sigma = round(std_samp, 6)`` (the a19
  quantization rule, identical to the batch query), then REPLAY the
  buffered values through the recurrence so baseline rows can alarm
  exactly as they do in batch.
- **monitor phase**: per sample ``P += x − mu − 0.5·sigma``;
  ``minP = min(minP, P)``; alarm when
  ``round(P − min(0, minP), 6) > 4·sigma``. Pure scalar state
  (mu, sigma, P, minP, i) — fixed bytes per key at any throughput, the
  same boundedness story as the first-crossing operator.

Every alarm row is emitted append-mode as (user_id, i, s) the moment
its micro-batch processes it — an operations dashboard sees drift as
it happens instead of at job end.

Order contract (shared with every w-family batch query): the
recurrence is arrival-ordered; rows inside one micro-batch are sorted
by (ts, event_id) before folding, so a stream fed in event order
reproduces the batch fold bit-for-bit (the running-window sum in batch
accumulates in the same left-to-right order — both sides round the
decision statistic to 6 before comparing). Keys that never reach
``base_k`` samples stay in the baseline phase and emit nothing: on an
unbounded stream every live key eventually graduates; finite-corpus
tails are a batch concern (the batch twin handles them by baselining
on whatever is available).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("buf", ArrayType(DoubleType())),
        StructField("mu", DoubleType()),
        StructField("sigma", DoubleType()),
        StructField("p", DoubleType()),
        StructField("minp", DoubleType()),
        StructField("i", LongType()),
    ]
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("i", LongType()),
        StructField("s", DoubleType()),
    ]
)


def cusum_alarm_stream(
    events: DataFrame,
    base_k: int = 30,
    slack: float = 0.5,
    h_sigmas: float = 4.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Append-mode stream of CUSUM alarms (user_id, i, s): one row per
    sample whose decision statistic exceeds ``h_sigmas``·sigma."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            buf, mu, sigma, p, minp, i = state.get
            buf = list(buf) if buf is not None else None
        else:
            buf, mu, sigma, p, minp, i = [], None, None, 0.0, 0.0, 0
        rows = []

        def fold(x: float) -> None:
            nonlocal p, minp, i
            i += 1
            p += x - mu - slack * sigma
            minp = min(minp, p)
            s = round(p - min(0.0, minp), 6)
            if s > h_sigmas * sigma:
                rows.append((int(key[0]), i, s))

        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks).sort_values([ts_col, id_col])
            for x in batch[value_col].astype(float):
                if mu is None:
                    buf.append(float(x))
                    if len(buf) == base_k:
                        n = float(base_k)
                        mean = sum(buf) / n
                        var = sum((v - mean) ** 2 for v in buf) / (n - 1)
                        mu = round(mean, 6)
                        sigma = round(math.sqrt(var), 6)
                        for v in buf:  # replay: baseline rows can alarm
                            fold(v)
                        buf = None
                else:
                    fold(float(x))
        state.update((buf, mu, sigma, p, minp, i))
        if rows:
            yield pd.DataFrame(rows, columns=["user_id", "i", "s"])

    return (
        events.select(key_col, ts_col, id_col, value_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
