"""Streaming as-of enrichment: join a stream of events to the most
recent row of a STATIC (slowly-changing) dimension snapshot at-or-before
each event's timestamp.

Because the right side is static, every micro-batch can be enriched
independently — the batch ``asof_join`` runs inside ``foreachBatch``
with zero stream state (no watermark, no state store), and restart
safety is the sink's concern exactly as in streaming/pipeline.py. This
is the common production shape (prices, exchange rates, dimension
versions land daily; events stream continuously).

``asof_join_stream`` is the TRUE stream-stream as-of (latest-before):
both sides stream, per-key state buffers rows watermark-bounded in
``applyInPandasWithState``, and a left row is emitted exactly once —
when the watermark passes its timestamp, i.e. when no earlier-or-equal
right row can still arrive.

``interval_join_stream`` is the all-matches-in-range stream-stream
join, which Spark CAN express natively (watermarked inner join with a
time-range condition).
"""

from __future__ import annotations

import json
import math
from bisect import bisect_right
from typing import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ocr_spark.operators.temporal import asof_join


def asof_enrich_writer(
    stream: DataFrame,
    static_right: DataFrame,
    sink: Callable[[DataFrame, int], None],
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
):
    """``writeStream`` writer enriching each micro-batch via the batch
    as-of join and handing the result to ``sink(df, batch_id)``. The
    static side's plan is reused across batches — persist it (or let it
    broadcast, it is dimension-sized) before passing it in."""

    def _enrich(batch_df: DataFrame, batch_id: int) -> None:
        out = asof_join(
            batch_df,
            static_right,
            on=on,
            left_ts=left_ts,
            right_ts=right_ts,
            right_cols=right_cols,
            direction=direction,
            tolerance=tolerance,
        )
        sink(out, batch_id)

    return stream.writeStream.foreachBatch(_enrich)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    before_sec: int = 0,
    after_sec: int = 600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """TRUE stream-stream interval join (native Structured Streaming,
    append mode): pairs with equal keys whose right timestamp falls in
    [left_ts − before_sec, left_ts + after_sec] — the click-attribution
    / impression-conversion shape where BOTH sides stream.

    Both inputs get event-time watermarks AND the join carries the
    explicit time-range condition — together that is what lets Spark
    BOUND the join state: a buffered row is evicted once the other
    side's watermark passes its reachable range, so state is
    O(rate × (watermark + range)), never O(stream). Inner join in
    append mode emits each match as soon as both rows have arrived
    (no flush latency); the right side's timestamp column comes back
    suffixed ``_r`` when the names collide.

    This is the streaming twin of ``operators/temporal.interval_join``'s
    point-in-range case; the stream-stream AS-OF (latest-before, not
    all-in-range) is ``asof_join_stream`` below."""
    keys = [on] if isinstance(on, str) else list(on)
    lts, rts = left_ts, right_ts if right_ts != left_ts else f"{right_ts}_r"
    if rts != right_ts:
        right = right.withColumnRenamed(right_ts, rts)
    # rename non-key, non-ts collisions too (suffix _r)
    for c in right.columns:
        if c in left.columns and c not in keys and c != rts:
            right = right.withColumnRenamed(c, f"{c}_r")
    l = left.withWatermark(lts, watermark)
    r = right.withWatermark(rts, watermark)
    cond = None
    for k in keys:
        e = l[k] == r[k]
        cond = e if cond is None else (cond & e)
    cond = (
        cond
        & (r[rts] >= l[lts] - F.expr(f"INTERVAL {int(before_sec)} SECONDS"))
        & (r[rts] <= l[lts] + F.expr(f"INTERVAL {int(after_sec)} SECONDS"))
    )
    return l.join(r, cond, "inner").drop(*[r[k] for k in keys])


def _json_safe(v):
    """Scalar → JSON-storable form (timestamps as epoch-ns ints)."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, pd.Timestamp):
        return int(v.value)
    if pd.isna(v):
        return None
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    return v


def asof_join_stream(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    watermark: str = "10 minutes",
    tolerance: float | None = None,
    matched_ts: str = "matched_ts",
) -> DataFrame:
    """TRUE stream-stream as-of join (latest-before): each left row is
    paired with the most recent right row at-or-before its timestamp —
    with BOTH sides streaming.  The semantics of the batch
    ``operators/temporal.asof_join`` (backward direction, left-outer,
    exact-ts matches included, ``tolerance`` nulling) running
    incrementally.

    Spark has no native stream-stream as-of (the native interval join
    above emits ALL matches in a range; latest-before needs an argmax
    over the buffered right side), so this is the custom-stateful-
    operator shape: tag both sides, union, watermark the shared
    event-time column, and run ``applyInPandasWithState`` per key.

    Emission contract (append mode): a left row is FINAL — no
    earlier-or-equal right row can still arrive — exactly when the
    watermark passes its timestamp, so each left row is emitted once,
    in the first micro-batch whose watermark ≥ its ts (event-time
    timeouts flush keys that stop receiving data).  Rows later than the
    watermark on arrival are dropped, standard watermark semantics.
    State per key is the rows inside the watermark horizon plus ONE
    right row (the current latest-before candidate), i.e.
    O(rate × watermark), never O(stream).  Right-side ties on (key, ts)
    break deterministically by the JSON-serialized payload; pre-
    aggregate the right side to one row per (key, ts) for specific tie
    semantics (same guidance as the batch operator).

    Supported column types: numeric / string / boolean / timestamp
    (buffered rows travel through the state store as JSON).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    right_cols = list(right_cols)
    rmap = {c: (f"{c}_r" if c in left.columns else c) for c in right_cols}
    lpay = [c for c in left.columns if c not in keys and c != left_ts]

    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rtypes = {f.name: f.dataType for f in right.schema.fields}

    lu = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lpay],
        *[F.lit(None).cast(rtypes[c]).alias(rmap[c]) for c in right_cols],
    )
    ru = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lpay],
        *[F.col(c).alias(rmap[c]) for c in right_cols],
    )
    uni = lu.unionByName(ru).withWatermark("__ts", watermark)

    out_fields = (
        [T.StructField(k, ltypes[k], True) for k in keys]
        + [T.StructField(left_ts, ltypes[left_ts], True)]
        + [T.StructField(c, ltypes[c], True) for c in lpay]
        + [T.StructField(matched_ts, rtypes[right_ts], True)]
        + [T.StructField(rmap[c], rtypes[c], True) for c in right_cols]
    )
    out_schema = T.StructType(out_fields)
    out_names = [f.name for f in out_fields]
    ts_out = {
        f.name
        for f in out_fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
    }
    tol_ns = None if tolerance is None else int(float(tolerance) * 1e9)
    rvals = [rmap[c] for c in right_cols]

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            lbuf_j, rbuf_j = state.get
            lbuf, rbuf = json.loads(lbuf_j), json.loads(rbuf_j)
        else:
            lbuf, rbuf = [], []
        wm_ms = state.getCurrentWatermarkMs()
        wm_ns = wm_ms * 1_000_000

        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_ns_col = pdf["__ts"].astype("int64")
            for i in range(len(pdf)):
                t = int(ts_ns_col.iloc[i])
                if t <= wm_ns:  # late beyond watermark: dropped
                    continue
                row = pdf.iloc[i]
                if int(row["__side"]) == 1:
                    lbuf.append([t, [_json_safe(row[c]) for c in lpay]])
                else:
                    rbuf.append([t, [_json_safe(row[c]) for c in rvals]])

        # flush: lefts at-or-before the watermark are final
        emit = sorted(
            (l for l in lbuf if l[0] <= wm_ns),
            key=lambda e: (e[0], json.dumps(e[1])),
        )
        lbuf = [l for l in lbuf if l[0] > wm_ns]
        out = None
        if emit:
            rs = sorted(rbuf, key=lambda e: (e[0], json.dumps(e[1])))
            rts_list = [e[0] for e in rs]
            data = {c: [] for c in out_names}
            for t, pay in emit:
                idx = bisect_right(rts_list, t) - 1
                m = rs[idx] if idx >= 0 else None
                if m is not None and tol_ns is not None and t - m[0] > tol_ns:
                    m = None
                for kc, kv in zip(keys, key):
                    data[kc].append(_json_safe(kv))
                data[left_ts].append(t)
                for c, v in zip(lpay, pay):
                    data[c].append(v)
                data[matched_ts].append(m[0] if m is not None else None)
                for c, v in zip(rvals, m[1] if m is not None else [None] * len(rvals)):
                    data[c].append(v)
            cols = {}
            for c in out_names:
                if c in ts_out:
                    cols[c] = pd.Series(
                        [pd.Timestamp(v) if v is not None else pd.NaT for v in data[c]],
                        dtype="datetime64[ns]",
                    )
                else:
                    cols[c] = pd.Series(data[c], dtype="object")
            out = pd.DataFrame(cols)

        # evict: keep the single latest-before-watermark right row (the
        # match candidate for any future left) plus everything newer
        past = [e for e in rbuf if e[0] <= wm_ns]
        rbuf = [e for e in rbuf if e[0] > wm_ns]
        if past:
            rbuf.append(max(past, key=lambda e: (e[0], json.dumps(e[1]))))

        if not lbuf and not rbuf:
            state.remove()
        else:
            state.update((json.dumps(lbuf), json.dumps(rbuf)))
            if lbuf:
                state.setTimeoutTimestamp(wm_ms + 1)
        if out is not None:
            yield out

    return uni.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="lbuf string, rbuf string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
