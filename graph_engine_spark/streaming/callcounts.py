"""Stateful call-event accumulation — the reference's dynamic-edge
counters as a custom stateful streaming operator.

Reference semantics (graph_core/manager.py:180-215): per (src, dst)
call edge, accumulate ``dynamic_call_count`` and maintain
``first_call_time`` (min) / ``last_call_time`` (max) across events.
The reference drains a queue on a 0.5 s poll; here the same state
machine runs as ``applyInPandasWithState`` over a streaming DataFrame
grouped by (src, dst) — Arrow-batched, one state row per edge,
update-mode output emitting the running totals every micro-batch.

For bounded inputs the plain batch aggregation
(``groupBy(src,dst).agg(count,min,max)`` — queries() key
``call_count_agg``) is the right plan; this operator exists for the
unbounded case where totals must survive across micro-batches and
process restarts (state lives in the streaming checkpoint).

Scale notes: state is hash-partitioned by the group key, so the sizing
knob is distinct edges, not events; timeouts are deliberately NOT set
(the reference never expires counters) but ``GroupStateTimeout`` is the
hook for bounded-state eviction if an upstream key space is unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "src string, dst string, dynamic_call_count long, "
    "first_call_time double, last_call_time double"
)
STATE_SCHEMA = "cnt long, first double, last double"


def _update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    if state.exists:
        cnt, first, last = state.get
    else:
        cnt, first, last = 0, None, None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        cnt += len(pdf)
        lo, hi = float(pdf["ts"].min()), float(pdf["ts"].max())
        first = lo if first is None else min(first, lo)
        last = hi if last is None else max(last, hi)
    state.update((cnt, first, last))
    yield pd.DataFrame(
        [
            {
                "src": key[0],
                "dst": key[1],
                "dynamic_call_count": cnt,
                "first_call_time": first,
                "last_call_time": last,
            }
        ]
    )


def stateful_call_counts(events: DataFrame) -> DataFrame:
    """events(src, dst, ts) stream → running (count, first, last) per
    edge. Use with ``.writeStream.outputMode("update")``."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("src", "dst").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
