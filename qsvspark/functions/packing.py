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
    # `div` (integral division) keeps bucket boundaries exact over the
    # full long range — float '/' round-trips through double and becomes
    # rounding-dependent past 2^53, the very regime the offset pipeline
    # below is written to survive.
    out = df.withColumn(
        "_bkt",
        F.expr(f"(cast(`{order_col}` as bigint) - {int(lo)}L) div {int(width)}L"),
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
    oversized: str = "own",
) -> DataFrame:
    """No-split first-fit packing, partition-local.

    Each task packs its shard independently: docs are taken in shard
    order and appended to the current open sequence, opening a new one
    when the doc doesn't fit. Output: ``id_col``, ``n_tok_col``, group
    columns, ``seq_id`` (globalized), ``seq_fill`` (tokens already in
    the sequence before this part), ``oversized`` (1 for docs longer
    than ``seq_len``), ``part_start`` / ``part_len`` (the token span of
    this row within its document — (0, n_tok) for unsplit docs, so the
    materializer can slice token arrays uniformly).

    ``oversized`` policy for docs longer than ``seq_len`` (at
    seq_len=2048 a book-length doc otherwise burns whole sequences):
      * ``"own"``      — (default) the doc gets a flagged sequence of
                         its own; one output row, part_len = n_tok.
      * ``"split"``    — the doc is cut at sequence boundaries: its
                         chunks fill the open bin's remainder, then
                         full sequences, and the tail opens a bin later
                         docs join. One output row PER CHUNK; chunks
                         reassemble token-exactly via part_start order.
                         Zero padding waste.
      * ``"truncate"`` — keep only the first ``seq_len`` tokens
                         (part_len = seq_len); the doc then packs like
                         a full-length doc. Lossy, flagged.

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
    if oversized not in ("own", "split", "truncate"):
        raise ValueError(f"unknown oversized policy '{oversized}'")
    policy = oversized
    groups = list(group_cols or [])
    src = df.select(id_col, n_tok_col, *groups)
    if num_partitions:
        src = src.repartition(num_partitions, id_col)

    keep_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    )
    schema = (
        f"{keep_fields}, seq_id long, seq_fill long, oversized int,"
        " part_start long, part_len long"
    )
    max_local = 1 << _GREEDY_PID_SHIFT
    max_pid = 1 << (63 - _GREEDY_PID_SHIFT)

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # mapInPandas yields all batches of ONE partition to one call,
        # so packer state legally spans the whole shard.
        pid = None
        next_seq = 0  # pid-wide counter -> seq ids unique across groups
        bins: dict = {}  # group key -> [seq_local, fill]

        def fresh(key) -> list:
            nonlocal next_seq
            # enforced, not just documented: '|' would silently corrupt
            # ids past these bounds (≥2^40 sequences in one shard or
            # ≥2^23 partitions hit the sign bit)
            if next_seq >= max_local:
                raise ValueError(
                    f"pack_greedy: shard emitted {next_seq} sequences "
                    f"(max {max_local}); repartition the input finer"
                )
            # [seq_local, fill, n_docs] — n_docs distinguishes a truly
            # fresh bin from one holding only zero-token docs (fill 0
            # either way, but an "own" oversized doc must not share)
            b = bins[key] = [next_seq, 0, 0]
            next_seq += 1
            return b

        for pdf in batches:
            if pdf.empty:
                continue
            if pid is None:
                # TaskContext partitionId — unique per shard.
                from pyspark import TaskContext

                pid = TaskContext.get().partitionId()
                if pid >= max_pid:
                    raise ValueError(
                        f"pack_greedy: partition id {pid} exceeds the "
                        f"{max_pid} id-space bound"
                    )
            toks = pdf[n_tok_col].astype("int64").to_numpy()
            if groups:
                keys = list(zip(*(pdf[g].to_numpy() for g in groups)))
            else:
                keys = None
            idx = []  # source row position per output row (1:N for split)
            seq_ids = []
            fills = []
            over = []
            part_starts = []
            part_lens = []

            def emit(i: int, b: list, start: int, length: int, big: bool) -> None:
                idx.append(i)
                seq_ids.append((pid << _GREEDY_PID_SHIFT) | b[0])
                fills.append(b[1])
                over.append(1 if big else 0)
                part_starts.append(start)
                part_lens.append(length)
                b[1] += length
                b[2] += 1

            for i, t in enumerate(toks):
                t = int(t)
                key = keys[i] if keys is not None else ()
                big = t > seq_len
                b = bins.get(key)
                if b is None:
                    b = fresh(key)
                if big and policy == "split":
                    # fill the open bin's remainder, then full sequences;
                    # the tail chunk leaves the bin open for later docs
                    start = 0
                    while start < t:
                        if b[1] >= seq_len:
                            b = fresh(key)
                        take = min(t - start, seq_len - b[1])
                        emit(i, b, start, take, True)
                        start += take
                    continue
                eff = min(t, seq_len) if (big and policy == "truncate") else t
                if big and policy == "own":
                    if b[2] > 0:  # non-empty incl. zero-token occupants
                        b = fresh(key)
                    emit(i, b, 0, eff, True)
                    # an oversized doc closes its sequence immediately
                    b = fresh(key)
                    continue
                if b[1] + eff > seq_len:
                    b = fresh(key)
                emit(i, b, 0, eff, big)
            out = pdf.iloc[idx].reset_index(drop=True)
            out["seq_id"] = pd.Series(seq_ids, dtype="int64").to_numpy()
            out["seq_fill"] = pd.Series(fills, dtype="int64").to_numpy()
            out["oversized"] = pd.Series(over, dtype="int32").to_numpy()
            out["part_start"] = pd.Series(part_starts, dtype="int64").to_numpy()
            out["part_len"] = pd.Series(part_lens, dtype="int64").to_numpy()
            yield out

    return src.mapInPandas(pack, schema=schema)


def pack_stats(packed: DataFrame, seq_len: int, n_tok_col: str = "n_tok") -> DataFrame:
    """Per-corpus packing quality: sequence count, mean fill ratio,
    padding waste. One map-side-combined aggregate. Uses ``part_len``
    (the tokens this row actually contributes) when the layout carries
    it — under the split/truncate policies a row's ``n_tok`` is the
    whole document, not its chunk."""
    contrib = (
        F.col("part_len") if "part_len" in packed.columns else F.col(n_tok_col)
    )
    per_seq = packed.groupBy("seq_id").agg(
        F.sum(contrib.cast("long")).alias("seq_tokens"),
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


# ---------------------------------------------------------------------------
# sequence materialization: layout -> the actual (seq_id, tokens) table
# ---------------------------------------------------------------------------


def _ordered_flatten(parts_struct: F.Column) -> F.Column:
    """Flatten an array<struct<fill:long, toks:array>> in fill order.
    The comparator sorts by the fill offset alone (unique within a
    sequence by construction), so array-valued struct fields never need
    to be comparable."""
    ordered = F.array_sort(
        parts_struct,
        lambda a, b: F.when(a["fill"] < b["fill"], F.lit(-1))
        .when(a["fill"] > b["fill"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    return F.flatten(F.transform(ordered, lambda x: x["toks"]))


def materialize_greedy_sequences(
    layout: DataFrame,
    docs: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    keep_cols: Optional[list[str]] = None,
    pad_id: Optional[int] = None,
) -> DataFrame:
    """Turn a ``pack_greedy`` layout into the physical sequence table —
    the north-star deliverable ("tables of pre-tokenized training
    sequences"), one row per sequence:

      (seq_id, *keep_cols, tokens array, n_docs, n_tokens, pad)

    Each layout row contributes ``slice(tokens, part_start+1,
    part_len)`` of its document (the whole doc for unsplit rows), parts
    are concatenated in ``seq_fill`` order, and ``pad_id`` (when given)
    right-pads every sequence to exactly ``seq_len`` tokens. Sequences
    longer than seq_len can only arise from the ``oversized="own"``
    policy and are emitted unpadded (flagged upstream).

    ``keep_cols`` (e.g. ``["sink"]``) are constant within a sequence by
    group purity and carried via first().

    Scale shape: one shuffle join on ``id_col`` to fetch token arrays,
    one groupBy(seq_id) to assemble — both keyed, skew-free (a sequence
    holds ≤ seq_len tokens), no Python. Everything else is codegen
    (slice / array_sort / flatten / concat).
    """
    keep = list(keep_cols or [])
    lay_cols = [id_col, "seq_id", "seq_fill", "part_start", "part_len", *keep]
    joined = layout.select(*lay_cols).join(
        docs.select(id_col, tokens_col), id_col
    )
    part = F.slice(
        F.col(tokens_col), F.col("part_start").cast("int") + F.lit(1),
        F.col("part_len").cast("int"),
    )
    parts = joined.select(
        "seq_id",
        *keep,
        F.col(id_col),
        F.struct(F.col("seq_fill").alias("fill"), part.alias("toks")).alias("__p"),
    )
    agg = parts.groupBy("seq_id").agg(
        *[F.first(c).alias(c) for c in keep],
        _ordered_flatten(F.collect_list("__p")).alias("__toks"),
        F.count_distinct(F.col(id_col)).alias("n_docs"),
    )
    n_tokens = F.size("__toks").cast("long")
    toks = F.col("__toks")
    if pad_id is not None:
        elem_type = joined.schema[tokens_col].dataType.elementType.simpleString()
        pad_arr = F.array_repeat(
            F.lit(pad_id).cast(elem_type),
            F.greatest(F.lit(seq_len) - F.size("__toks"), F.lit(0)),
        )
        toks = F.concat(toks, pad_arr)
    return agg.select(
        "seq_id",
        *keep,
        toks.alias(tokens_col),
        "n_docs",
        n_tokens.alias("n_tokens"),
        F.greatest(F.lit(seq_len).cast("long") - n_tokens, F.lit(0).cast("long")).alias("pad"),
    )


def materialize_chunked_sequences(
    layout: DataFrame,
    seq_len: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Turn a ``pack_chunked`` layout (which must still carry the token
    arrays) into the physical sequence table: one row per fixed-length
    sequence, documents SPLIT at sequence boundaries exactly as the
    chunked contract dictates. Every sequence except the corpus's last
    holds exactly ``seq_len`` tokens.

      (seq_id, tokens array, n_docs, n_tokens)

    Per doc: explode its sequence span [first_seq..last_seq]; for
    sequence s the doc contributes tokens
    [max(0, s*L - off) .. min(n_tok, (s+1)*L - off)) — a codegen'd
    slice. Then one groupBy(seq_id) assembles parts in global_offset
    order. Same scale shape as the greedy materializer: the explode is
    bounded (a doc spans ceil(n_tok/L)+1 sequences), both shuffles are
    keyed and skew-free."""
    L = int(seq_len)
    spans = layout.withColumn(
        "__seq", F.explode(F.sequence(F.col("first_seq"), F.col("last_seq")))
    )
    start_in_doc = F.greatest(
        F.col("__seq") * F.lit(L) - F.col("global_offset"), F.lit(0).cast("long")
    )
    end_in_doc = F.least(
        F.size(F.col(tokens_col)).cast("long"),
        (F.col("__seq") + 1) * F.lit(L) - F.col("global_offset"),
    )
    part = F.slice(
        F.col(tokens_col),
        start_in_doc.cast("int") + F.lit(1),
        F.greatest(end_in_doc - start_in_doc, F.lit(0).cast("long")).cast("int"),
    )
    parts = spans.select(
        F.col("__seq").alias("seq_id"),
        F.col(id_col),
        F.struct(
            F.col("global_offset").alias("fill"), part.alias("toks")
        ).alias("__p"),
    )
    agg = parts.groupBy("seq_id").agg(
        _ordered_flatten(F.collect_list("__p")).alias(tokens_col),
        F.count_distinct(F.col(id_col)).alias("n_docs"),
    )
    return agg.select(
        "seq_id",
        F.col(tokens_col),
        "n_docs",
        F.size(tokens_col).cast("long").alias("n_tokens"),
    )
