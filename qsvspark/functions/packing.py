"""Sequence packing: turn variable-length documents into fixed-length
training sequences — the core layout step of a pre-tokenized-corpus
pipeline (BASELINE.json north_star: "pre-tokenized training sequences").

Two packers, two contracts:

* ``pack_chunked`` — GPT-style concat-and-chunk. Documents are laid out
  in a deterministic total order, the token stream is cut every
  ``seq_len`` tokens, and each document learns its global token offset
  and the sequence ids it lands in. Every sequence except the last is
  exactly full. Deterministic and SQL-expressible (the driver oracle is
  a DuckDB window cumsum), but a naive Spark translation would be
  ``Window.orderBy()`` with no partition key — a single-task sort that
  dies at scale. We instead compute a DISTRIBUTED PREFIX SUM:

    1. one map-side-combined aggregate for per-bucket token totals
       (buckets are deterministic ranges of the order column, so no
       caching is needed for the two passes to agree),
    2. driver-side exclusive prefix over the tiny bucket-total list,
    3. a ``Window.partitionBy(bucket)`` cumsum — each bucket sorts
       independently in its own task — plus a broadcast join of the
       bucket offsets.

  Shuffle cost: one partial-agg exchange (bucket count rows) + one
  window exchange keyed on bucket. No global sort, no Python, whole
  plan codegen'd. ``tests/test_plans.py`` pins the no-single-partition
  property.

* ``pack_greedy`` — no-split first-fit packing: a document never
  crosses a sequence boundary; a new sequence starts when the current
  one can't fit the next document. Sequential state makes it
  non-SQL-expressible, so it runs PARTITION-LOCALLY: each task packs
  its own shard with a first-fit-decreasing loop over Arrow batches
  (``mapInPandas`` carries packer state across batches of one
  partition). Cross-shard order is irrelevant for training-data layout,
  which is exactly why this parallelizes embarrassingly. Sequence ids
  are globalized as ``pid * 2^40 + local_seq``. Invariants (every doc
  packed once, every sequence ≤ seq_len unless a single oversized doc,
  fill ratio bound) are pinned in ``tests/test_packing.py``.

Reference provenance: qsv-rs has no packer — this is part of the
training-data extension surface (SURVEY.md §2b) the north star asks
for on top of the reference's operator set.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# pid * 2^40 leaves ~10^12 sequences per shard and ~8M shards before a
# signed-64 collision — comfortable at the 10^12-sequence target.
_GREEDY_PID_SHIFT = 40


def _bucket_plan(
    df: DataFrame, order_col: str, n_buckets: Optional[int]
) -> tuple[DataFrame, int]:
    """Attach a deterministic range-bucket id over a numeric order
    column. One cheap min/max aggregate sets the bounds; at a real
    deployment the caller passes ``bucket_col`` derived from partition
    metadata (ingest date/hour) and skips this pass entirely."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    lo, hi = df.select(
        F.min(order_col).cast("long"), F.max(order_col).cast("long")
    ).first()
    if lo is None:  # empty input
        return df.withColumn("_bkt", F.lit(0).cast("long")), 1
    width = max(1, math.ceil((hi - lo + 1) / n_buckets))
    out = df.withColumn(
        "_bkt", ((F.col(order_col).cast("long") - F.lit(lo)) / F.lit(width)).cast("long")
    )
    return out, n_buckets


def pack_chunked(
    df: DataFrame,
    n_tok_col: str,
    order_col: str,
    seq_len: int,
    n_buckets: Optional[int] = None,
    bucket_col: Optional[str] = None,
) -> DataFrame:
    """Concat-and-chunk layout: returns ``df`` plus

    * ``global_offset`` — this document's first token's position in the
      concatenated corpus stream (documents ordered by ``order_col``,
      which must be unique),
    * ``first_seq`` / ``last_seq`` — the fixed-length sequence ids the
      document's tokens land in (``floor(offset / seq_len)``),
    * ``spans_boundary`` — 1 if the document is split across a sequence
      boundary.

    Implemented as a distributed prefix sum (module docstring); the
    only data-sized shuffle is the per-bucket window sort.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    if bucket_col is not None:
        bucketed = df.withColumn("_bkt", F.col(bucket_col).cast("long"))
    else:
        bucketed, _ = _bucket_plan(df, order_col, n_buckets)

    # Pass 1: per-bucket token totals (map-side partial agg -> rows ==
    # bucket count; collect is metadata-sized, never data-sized).
    totals = {
        r["_bkt"]: r["t"]
        for r in bucketed.groupBy("_bkt")
        .agg(F.sum(F.col(n_tok_col).cast("long")).alias("t"))
        .collect()
    }
    # Driver-side exclusive prefix over the sorted bucket ids.
    offsets, acc = {}, 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b] or 0
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(b), int(o)) for b, o in offsets.items()] or [(0, 0)],
            "_bkt long, _bkt_offset long",
        )
    )

    # Pass 2: within-bucket exclusive cumsum. partitionBy(_bkt) keeps
    # every sort task bucket-sized — no single-partition window.
    w = (
        Window.partitionBy("_bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ntok = F.col(n_tok_col).cast("long")
    out = (
        bucketed.join(off_df, "_bkt")
        .withColumn(
            "global_offset",
            F.coalesce(F.sum(ntok).over(w), F.lit(0)) + F.col("_bkt_offset"),
        )
        # `div` is Spark's integral division — exact on the full long
        # range, unlike `/` which round-trips through double (lossy past
        # 2^53 token offsets, i.e. exactly the 10^12-sequence regime).
        .withColumn("first_seq", F.expr(f"global_offset div {seq_len}L"))
        .withColumn(
            "last_seq",
            F.expr(
                f"(global_offset + greatest(cast({n_tok_col} as bigint), 1L) - 1L)"
                f" div {seq_len}L"
            ),
        )
        .withColumn(
            "spans_boundary",
            (F.col("last_seq") > F.col("first_seq")).cast("int"),
        )
        .drop("_bkt", "_bkt_offset")
    )
    return out


def pack_greedy(
    df: DataFrame,
    n_tok_col: str,
    id_col: str,
    seq_len: int,
    num_partitions: Optional[int] = None,
    group_cols: Optional[list[str]] = None,
) -> DataFrame:
    """No-split first-fit packing, partition-local.

    Each task packs its shard independently: docs are taken in shard
    order and appended to the current open sequence, opening a new one
    when the doc doesn't fit. A doc longer than ``seq_len`` gets a
    sequence of its own, flagged ``oversized=1`` (the caller decides to
    truncate or split upstream). Output: ``id_col``, ``n_tok_col``,
    group columns, ``seq_id`` (globalized), ``seq_fill`` (tokens
    already in the sequence before this doc), ``oversized``.

    ``group_cols``: sequences never mix groups — each task keeps one
    open bin PER GROUP VALUE it sees (the routed-sink case: a training
    sequence never spans two sinks). State is O(groups-in-shard).

    Scale shape: zero shuffles beyond the optional repartition; state
    is one open bin per group (Next-Fit: within 2x of optimal bin
    count — fine for training layout where padding waste, not bin
    optimality, is the metric).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    groups = list(group_cols or [])
    src = df.select(id_col, n_tok_col, *groups)
    if num_partitions:
        src = src.repartition(num_partitions, id_col)

    keep_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    )
    schema = f"{keep_fields}, seq_id long, seq_fill long, oversized int"

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas yields all batches of ONE partition to one call,
        # so packer state legally spans the whole shard.
        pid = None
        next_seq = 0  # pid-wide counter -> seq ids unique across groups
        bins: dict = {}  # group key -> [seq_local, fill]
        for pdf in batches:
            if pdf.empty:
                continue
            if pid is None:
                # TaskContext partitionId — unique per shard.
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
            toks = pdf[n_tok_col].astype("int64").to_numpy()
            if groups:
                keys = list(zip(*(pdf[g].to_numpy() for g in groups)))
            else:
                keys = None
            seq_ids = []
            fills = []
            oversized = []
            for i, t in enumerate(toks):
                t = int(t)
                key = keys[i] if keys is not None else ()
                big = t > seq_len
                b = bins.get(key)
                if b is None:
                    b = bins[key] = [next_seq, 0]
                    next_seq += 1
                elif big or b[1] + t > seq_len:
                    b[0] = next_seq
                    b[1] = 0
                    next_seq += 1
                seq_ids.append((pid << _GREEDY_PID_SHIFT) | b[0])
                fills.append(b[1])
                oversized.append(1 if big else 0)
                b[1] += t
                if big:
                    # an oversized doc closes its sequence immediately
                    b[0] = next_seq
                    b[1] = 0
                    next_seq += 1
            out = pdf.copy()
            out["seq_id"] = pd.Series(seq_ids, dtype="int64").to_numpy()
            out["seq_fill"] = pd.Series(fills, dtype="int64").to_numpy()
            out["oversized"] = pd.Series(oversized, dtype="int32").to_numpy()
            yield out

    return src.mapInPandas(pack, schema=schema)


def pack_stats(packed: DataFrame, seq_len: int, n_tok_col: str = "n_tok") -> DataFrame:
    """Per-corpus packing quality: sequence count, mean fill ratio,
    padding waste. One map-side-combined aggregate."""
    per_seq = packed.groupBy("seq_id").agg(
        F.sum(F.col(n_tok_col).cast("long")).alias("seq_tokens"),
        F.count("*").alias("n_docs"),
    )
    return per_seq.agg(
        F.count("*").alias("n_sequences"),
        F.sum("seq_tokens").alias("total_tokens"),
        F.avg(F.col("seq_tokens") / F.lit(seq_len)).alias("mean_fill"),
        F.sum(
            F.greatest(F.lit(seq_len) - F.col("seq_tokens"), F.lit(0))
        ).alias("padding_tokens"),
        F.max("n_docs").alias("max_docs_per_seq"),
    )
