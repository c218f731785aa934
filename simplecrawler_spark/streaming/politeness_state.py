"""Streaming per-host politeness — applyInPandasWithState token bucket.

The batch engine grants each host N fetch tokens per wave
(operators/politeness.py). This is the continuous counterpart for a live
fetch feed: a stream of candidate fetches (host, url, ts) flows through a
per-host GroupState holding

    (tokens:double, pending:array<string>)

Each micro-batch a host earns ``rate`` tokens (capped at ``burst`` — the
token-bucket from the north rule), spends one per admitted URL, and
carries unspent credit forward. URLs beyond the budget are NOT dropped:
they wait in the (bounded) ``pending`` buffer inside the state and are
admitted first in later batches — FIFO per host, exactly the queue-head
semantics of the wave engine, enforced continuously.

Scale notes: state is partitioned by host (the stream shuffle key), so a
hot domain's backlog lives in one state row with O(pending_cap) memory;
everything else streams through Arrow batches. Overflow beyond
``pending_cap`` is emitted with admitted=false (visible backpressure,
never silent loss).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType([
    T.StructField("host", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("admitted", T.BooleanType()),
    T.StructField("batch_tokens_left", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("tokens", T.DoubleType()),
    T.StructField("pending", T.ArrayType(T.StringType())),
])


def politeness_gate(candidates: DataFrame, rate: float = 4.0,
                    burst: float = 8.0, pending_cap: int = 10_000,
                    host_col: str = "host", url_col: str = "url",
                    drain_wakeups: bool = True) -> DataFrame:
    """(host, url, admitted, batch_tokens_left) stream; FIFO per host.

    ``drain_wakeups``: with a continuous trigger (processingTime), a host
    holding backlog re-arms a 1 s processing-time timeout so deferred URLs
    keep draining even when no new candidates arrive. Turn it OFF under
    bounded triggers (availableNow / once): a pending processing-time
    timeout keeps the micro-batch engine cycling after the data is
    exhausted instead of terminating. Liveness caveat when OFF: with
    NoTimeout the gate only runs for hosts PRESENT in a batch, so a host's
    deferred backlog drains only when new candidates for that host arrive —
    callers of bounded triggers must schedule a drain pass themselves
    (a follow-up run over the same checkpoint with drain_wakeups=True, or
    a trickle of wake rows per backlogged host)."""

    def gate(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            tokens, pending = state.get
            pending = list(pending)
        else:
            tokens, pending = burst, []
        tokens = min(burst, tokens + rate)
        incoming = [] if state.hasTimedOut else \
            [u for pdf in pdfs for u in pdf[url_col]]
        queue = pending + incoming          # FIFO: deferred first
        n_admit = min(len(queue), int(tokens))
        admitted, rest = queue[:n_admit], queue[n_admit:]
        tokens -= n_admit
        keep, overflow = rest[:pending_cap], rest[pending_cap:]
        state.update((float(tokens), keep))
        if keep and drain_wakeups:
            # backlog left: wake this host next interval even if no new
            # candidates arrive, so deferred URLs keep draining
            state.setTimeoutDuration(1000)
        out = pd.DataFrame({
            host_col: [host] * (len(admitted) + len(overflow)),
            url_col: admitted + overflow,
            "admitted": [True] * len(admitted) + [False] * len(overflow),
            "batch_tokens_left": [float(tokens)] * (len(admitted)
                                                    + len(overflow)),
        })
        if len(out):
            yield out

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if drain_wakeups
               else GroupStateTimeout.NoTimeout)
    return (candidates.groupBy(host_col)
            .applyInPandasWithState(gate, OUTPUT_SCHEMA, STATE_SCHEMA,
                                    "append", timeout))
