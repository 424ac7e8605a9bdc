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

Exactness contract (standard watermark sessionization semantics): rows
within the watermark merge EXACTLY — the open state is treated as an
interval and linearly re-merged with the batch's gap segments, so a late
segment can bridge sessions on either side of it; rows older than the
watermark are dropped explicitly (Spark does not filter late input for
arbitrary stateful ops the way it does for aggregations).  Sessions already
flushed by a timeout are final — that is the watermark's contract, not a
caveat of this operator.  The availableNow file-replay used by tests and
the driver query is event-time-ordered, so the streaming result there is
bit-identical to the batch twin.

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
        # Spark does NOT filter sub-watermark rows for arbitrary stateful
        # ops (unlike aggregations) — drop them here, or a too-late row
        # could resurrect/corrupt an already-closed session
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us > 0 and len(ts) and ts[0] < wm_us:
            keep = ts >= wm_us
            ts = ts[keep]
            if vals is not None:
                vals = vals[keep]
        if len(ts) == 0 and not state.exists:
            return
        # NOTE: every invocation clears a previously-set timeout, so even
        # the rows-all-late case must fall through to re-arm (or close) the
        # open session below — returning early would leak the state forever.

        # O(N) gap segmentation of the sorted batch (reduceat over break
        # boundaries — no per-segment rescans)
        import numpy as np

        if len(ts):
            brk = np.empty(len(ts), dtype=bool)
            brk[0] = True
            brk[1:] = (ts[1:] - ts[:-1]) > gap_us
            starts = np.flatnonzero(brk)
            ends = np.append(starts[1:], len(ts)) - 1
            seg_v = (
                np.add.reduceat(vals, starts)
                if vals is not None
                else np.zeros(len(starts))
            )
            # (start_us, end_us, n, vsum) per maximal batch-local session
            segs = [
                (int(ts[s]), int(ts[e]), int(e - s + 1), float(v))
                for s, e, v in zip(starts, ends, seg_v)
            ]
        else:
            segs = []

        # within-watermark late rows: the open state is ITSELF an interval —
        # insert it into the sorted segment list and linearly merge
        # intervals whose gap is <= gap_us (a late segment can chain the
        # state to segments on either side; merged end = max of ends, so a
        # late segment inside the state's span folds in correctly)
        if state.exists:
            n0, first0, last0, v0 = state.get
            import bisect

            pos = bisect.bisect_left([s[0] for s in segs], first0)
            segs.insert(pos, (first0, last0, n0, v0))
            merged = [segs[0]]
            for s in segs[1:]:
                c = merged[-1]
                if s[0] - c[1] <= gap_us:
                    merged[-1] = (
                        c[0], max(c[1], s[1]), c[2] + s[2], c[3] + s[3]
                    )
                else:
                    merged.append(s)
            segs = merged

        closed = [(k, s[0], s[1], s[2], s[3]) for s in segs[:-1]]
        first_o, last_o, n_o, v_o = segs[-1]

        # flush when the watermark passes the open session's gap horizon;
        # if the watermark is ALREADY past it (late rows arrived in the same
        # batch that advanced it), close now — setTimeoutTimestamp rejects
        # sub-watermark values with a query-killing error
        horizon_ms = (last_o + gap_us) // 1000
        if horizon_ms <= state.getCurrentWatermarkMs():
            closed.append((k, first_o, last_o, n_o, v_o))
            state.remove()
        else:
            state.update((n_o, first_o, last_o, v_o))
            state.setTimeoutTimestamp(horizon_ms)

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
    # exact integer epoch-us (a double round-trip is off by ±1 us for
    # modern epochs — enough to flip an exact-gap boundary)
    us = F.unix_micros(F.col(ts_col))
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
