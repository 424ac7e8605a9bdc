"""Custom stateful streaming operator: per-key gap sessionization via
`applyInPandasWithState` (the Arrow-batched arbitrary-state surface —
the task's "custom stateful operators" path, used where watermarked windowed
aggregation can't express the semantics: a session's extent depends on the
DATA's gaps, not on fixed window boundaries).

Crawl-domain reading: key = host (politeness / crawl-rate analytics), a
session = a burst of fetches separated by more than `gap_minutes` of quiet.

Semantics (exact, and replayable in plain SQL — see `sessionize_batch` and
the `streaming_sessions` driver oracle):
  a session is a maximal run of same-key events where consecutive event
  times differ by <= gap; emitted rows are (key, session_start, session_end,
  n_events, value_sum).

Distributed shape: the stream shuffles once on the key (the groupBy), each
task runs the vectorized pandas transition function over whole Arrow
batches — no per-row Python — and per-key state is (n, first_us, last_us,
vsum), CONSTANT-size regardless of session length, so 10^9 keys cost ~40
bytes each in the state store.  Closed sessions flush through
EventTimeTimeout when the watermark passes session_end + gap.

Exactness contract: per-key event times must not arrive older than an
already-CLOSED session (standard watermark sessionization semantics —
within-watermark late rows merge correctly into the open session; rows later
than that would start a spurious new session).  The availableNow file-replay
used by tests and the driver query is event-time-ordered, so the streaming
result is bit-identical to the batch twin there.

Reference anchor: the reference engine has no streaming surface at all
(algorithms run on immutable in-memory snapshots, core/.../huge/HugeGraph.java);
this module plus streaming/ingest.py IS the Spark-first replacement for its
load-then-compute lifecycle.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

_US_PER_MIN = 60_000_000


def _out_schema(key_col: str) -> str:
    return (
        f"{key_col} long, session_start timestamp, session_end timestamp,"
        " n_events long, value_sum double"
    )


_STATE_SCHEMA = "n long, first_us long, last_us long, vsum double"


def _session_fn(gap_us: int, ts_col: str, value_col: str | None, key_col: str):
    """Build the (key, batches, state) -> sessions transition function."""

    def fn(
        key: Tuple[Any], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def rows_df(rows):
            return pd.DataFrame(
                {
                    key_col: pd.Series([r[0] for r in rows], dtype="int64"),
                    "session_start": pd.to_datetime(
                        [r[1] for r in rows], unit="us"
                    ),
                    "session_end": pd.to_datetime([r[2] for r in rows], unit="us"),
                    "n_events": pd.Series([r[3] for r in rows], dtype="int64"),
                    "value_sum": pd.Series([r[4] for r in rows], dtype="float64"),
                }
            )

        k = int(key[0])
        if state.hasTimedOut:
            n, first_us, last_us, vsum = state.get
            state.remove()
            yield rows_df([(k, first_us, last_us, n, vsum)])
            return

        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(ts_col)
        ts = (pdf[ts_col].astype("int64") // 1000).to_numpy()  # ns -> us
        vals = (
            pdf[value_col].astype("float64").to_numpy()
            if value_col
            else None
        )

        closed = []
        if state.exists:
            n0, first0, last0, v0 = state.get
        else:
            n0 = 0

        # vectorized gap segmentation of the sorted batch
        import numpy as np

        brk = np.zeros(len(ts), dtype=bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap_us
        seg = brk.cumsum()
        out_n, out_first, out_last, out_v = [], [], [], []
        for s in range(int(seg[-1]) + 1):
            m = seg == s
            out_n.append(int(m.sum()))
            out_first.append(int(ts[m].min()))
            out_last.append(int(ts[m].max()))
            out_v.append(float(vals[m].sum()) if vals is not None else 0.0)

        i0 = 0
        if n0:
            if out_first[0] - last0 <= gap_us:
                # batch's first segment continues the open session
                out_n[0] += n0
                out_first[0] = min(out_first[0], first0)
                out_last[0] = max(out_last[0], last0)
                out_v[0] += v0
            else:
                closed.append((k, first0, last0, n0, v0))

        # every segment but the last is closed by construction
        for j in range(len(out_n) - 1):
            closed.append((k, out_first[j], out_last[j], out_n[j], out_v[j]))
        j = len(out_n) - 1
        state.update((out_n[j], out_first[j], out_last[j], out_v[j]))
        # flush when the watermark passes the open session's gap horizon
        state.setTimeoutTimestamp((out_last[j] + gap_us) // 1000)  # us -> ms

        if closed:
            yield rows_df(closed)

    return fn


def sessionize_stream(
    stream: DataFrame,
    gap_minutes: float = 30.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming gap sessionization: one shuffle on the key, Arrow-batched
    stateful transition, EventTimeTimeout flushing."""
    gap_us = int(gap_minutes * _US_PER_MIN)
    fn = _session_fn(gap_us, ts_col, value_col, key_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=_out_schema(key_col),
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    df: DataFrame,
    gap_minutes: float = 30.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Exact batch twin (gaps-and-islands: lag -> break flag -> running sum
    -> group).  The streaming operator must agree bit-for-bit on ordered
    replays; also the shape of the driver query's DuckDB oracle."""
    from pyspark.sql import Window

    gap_us = int(gap_minutes * _US_PER_MIN)
    w = Window.partitionBy(key_col).orderBy(ts_col)
    us = (F.col(ts_col).cast("double") * 1_000_000).cast("long")
    val = F.col(value_col) if value_col else F.lit(0.0)
    segmented = (
        df.select(F.col(key_col), F.col(ts_col), us.alias("_us"), val.alias("_v"))
        .withColumn("_prev", F.lag("_us").over(w))
        .withColumn(
            "_brk",
            F.when(
                F.col("_prev").isNull()
                | ((F.col("_us") - F.col("_prev")) <= gap_us),
                F.lit(0),
            ).otherwise(F.lit(1)),
        )
        .withColumn("_sid", F.sum("_brk").over(w))
    )
    return segmented.groupBy(key_col, "_sid").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("_v").alias("value_sum"),
    ).drop("_sid")
