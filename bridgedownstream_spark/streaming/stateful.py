"""Custom stateful streaming operator: cross-batch record dedup.

The reference gets idempotency from overwrite-by-recordid file writes plus
the dedup-latest reconciliation pass (SURVEY §2.11) — state lives in the
lake layout. Streaming-native, the same guarantee is a **keyed state
store**: ``applyInPandasWithState`` remembers which record keys have been
emitted and drops re-deliveries in any later micro-batch, surviving
restarts through the checkpoint. This is the engine's demonstration of
arbitrary stateful processing (the brief's custom-stateful-operator path);
the reference itself needs nothing fancier than dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["dedup_stream"]


def dedup_stream(
    stream: DataFrame, key_col: str, ttl_ms: int | None = None
) -> DataFrame:
    """Emit only the FIRST row ever seen per ``key_col`` across all
    micro-batches; duplicates — within a batch or re-delivered in later
    batches — are dropped. State per key is one boolean, so the state
    store scales with distinct keys, not traffic.

    ``ttl_ms`` bounds that state for unbounded key spaces: each key's
    entry expires ``ttl_ms`` after it was last refreshed, after which a
    re-delivery would be treated as new. At 100 TB-scale traffic the
    distinct-key set itself outgrows executor state stores eventually;
    a TTL matched to the realistic re-delivery horizon (e.g. the
    upstream queue's retention) keeps the store at
    O(keys-per-horizon) instead of O(keys-ever). ``None`` keeps keys
    forever — correct when the key space is bounded (the reference's
    recordids are)."""
    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # expiry callback: drop the key's entry; nothing to emit
            state.remove()
            return
        if state.exists:
            # drain the iterator (required by the contract), emit nothing,
            # and push the expiry out — a re-delivery proves the key is
            # still live upstream
            for _ in pdfs:
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]]
        state.update((True,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if first is not None:
            yield first

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )
