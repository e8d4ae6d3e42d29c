"""Custom stateful streaming operators via applyInPandasWithState.

The north-star mandate names ``applyInPandasWithState`` as the escape
hatch for operators Structured Streaming lacks natively; the first one a
training-data pipeline needs is CROSS-BATCH exact dedup: keep the first
arrival of each content key, drop every later duplicate — across
micro-batches and across restarts (state lives in the stream checkpoint,
RocksDB-backed per shuffle partition on a real cluster).

Scale design:
  - state is keyed on a 32-char content hash → the shuffle partitions
    the key space exactly like batch ``dedup_exact``'s groupBy;
  - per-key state is a single boolean-sized record ("seen"), so state
    size is O(distinct keys), the minimum any exact cross-batch dedup
    can hold;
  - a processing-time timeout (``ttl_minutes``) optionally expires idle
    keys so unbounded streams keep bounded state (near-dup windows at
    100 TB would combine this with the MinHash bucketing from
    qsvspark.functions.dedup instead of exact hashes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream_exact(
    df: DataFrame,
    key_cols: list[str] | None = None,
    hash_expr=None,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming exact dedup: emit only the FIRST row seen per content
    hash, across micro-batches. ``hash_expr`` defaults to md5 over the
    concatenated ``key_cols`` (default: doc_id).

    The emitted row set equals batch ``dedup_exact`` keep-first
    semantics under arrival order (asserted in tests/test_streaming.py).
    """
    key_cols = key_cols or ["doc_id"]
    h = hash_expr if hash_expr is not None else F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols])
    )
    hashed = df.withColumn("__h", h)
    out_schema = df.schema
    cols = df.columns

    def keep_first(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # idle key expired — forget it (bounded state)
            return
        seen = state.exists
        arrived = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            arrived = True
            if not seen:
                seen = True
                state.update((True,))
                yield pdf.iloc[[0]][cols]
        if arrived and ttl_minutes is not None:
            # refresh the idle clock on every arrival
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )
    return hashed.groupBy("__h").applyInPandasWithState(
        keep_first,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )
