"""Streaming sessionization — a custom stateful operator via
``applyInPandasWithState``.

The batch sessionizer (operators/timeseries.sessionize) needs the whole
history of a key to number its sessions; a stream sees each key's events
in micro-batch slices. This operator keeps exactly the state the
recurrence needs — (last event time, current session ordinal) per key —
so session ids stay continuous across micro-batches and restarts (state
lives in the checkpoint).

Semantics: events within a micro-batch are processed in time order;
across batches arrival order is assumed monotone per key up to the
watermark (genuinely late events are dropped by the watermark before
reaching the operator, the standard Structured Streaming contract).
State is a fixed-size pair per key — memory is O(active keys), never
O(events) — and the watermark bounds how long a dormant key's state
must be retained by the session-gap definition itself.

Scale notes: ``applyInPandasWithState`` shuffles once on the key (same
cost shape as the batch window), state is partitioned with the keys, and
each micro-batch moves only its own Arrow batches through Python.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize_stream(
    events: DataFrame,
    on: Sequence[str],
    time_col: str = "time",
    gap_seconds: float = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stateful streaming counterpart of ``sessionize``: assigns a
    per-key 1-based ``session_id``, starting a new session when the gap
    to the key's previous event exceeds ``gap_seconds`` — continuous
    across micro-batches via keyed state."""
    on = list(on)
    out_schema = T.StructType(
        list(events.schema.fields)
        + [T.StructField("session_id", T.LongType(), False)]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_us", T.LongType(), False),
            T.StructField("session_id", T.LongType(), False),
        ]
    )
    gap_us = int(gap_seconds * 1_000_000)

    def fn(key, pdfs: Iterator, state: GroupState) -> Iterator:
        import pandas as pd

        last_us, sid = state.get if state.exists else (None, 0)
        pdf = pd.concat(list(pdfs))
        pdf = pdf.sort_values(time_col, kind="stable")
        sids = []
        for t in pdf[time_col]:
            t_us = t.value // 1000  # pandas ns → µs
            if last_us is None or t_us - last_us > gap_us:
                sid += 1
            last_us = t_us
            sids.append(sid)
        state.update((int(last_us), int(sid)))
        yield pdf.assign(session_id=sids)

    return (
        events.withWatermark(time_col, watermark)
        .groupBy(*on)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
