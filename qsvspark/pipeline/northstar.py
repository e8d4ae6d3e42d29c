"""The north-star pipeline: parse → enrich → route → aggregate over an
Iceberg-style table of pre-tokenized training sequences, resumable from
snapshot manifests (BASELINE.json north_rule).

Stage design (all DataFrame-declarative; Catalyst/AQE pick physical plans):

  parse      grok/regex extraction of route fields (shard, seq) from the
             doc_id/source string columns. Two interchangeable engines:
             'pandas' — a vectorized Arrow-batched pandas UDF over the
             doc_id column only (the batched-byte-column form the north
             star mandates; only doc_id crosses the Python boundary, the
             token arrays stay in the JVM), and 'native' —
             regexp_extract, whole-stage codegen, zero Python.
  dedup      (optional, dedup="exact") drop duplicate token sequences,
             keep-first by doc_id: WindowGroupLimit emits one local
             candidate per 128-bit content key map-side before the
             shuffle; increments anti-join against the committed
             dedup_keys chain (16 bytes/row) so cross-increment dedup
             never re-reads committed token data.
  enrich     broadcast hash join against the small source dimension
             (explicit F.broadcast — never a shuffle, never skew-prone).
  quarantine (optional, quarantine=True) dead-letter routing: rows the
             pipeline cannot place (grok miss, unknown source, doc_id /
             source disagreement) are re-sunk to QUARANTINE_SINK with an
             error_reason column instead of silently landing in a null
             partition; aggregates exclude them via a partition-pruned
             filter on the sink column.
  route      single-pass fan-out to per-sink partitions via
             write.partitionBy(sink): every executor writes its slice of
             every sink; no per-sink job loop, no collect. The snapshot
             manifest records per-sink row counts (lineage + metrics).
  aggregate  per-sink groupBy(source, n_tok bucket) → seq count, uniq doc
             count, token sum. Partial aggregation collapses heavy-hitter
             keys map-side; an optional explicit salted two-level variant
             (salt = hash(doc_id) % S) is provided and property-tested to
             produce identical results — this is the skew pattern that
             matters when a groupBy key alone is too hot even for partial
             agg (e.g. high-cardinality agg states at 10^12 rows).

Resume: each stage writes through SnapshotCatalog keyed on an input
fingerprint; a rerun finds committed snapshots and skips the work
(kill-and-restart test in tests/test_pipeline.py).
"""

from __future__ import annotations

import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qsvspark.io.snapshot import SnapshotCatalog
from qsvspark.pipeline.tokens import source_dim

# doc_id grok pattern: "<source>/part-<shard>/doc-<seq>"
DOC_ID_RE = r"^(src\d+)/part-(\d+)/doc-(\d+)$"
_DOC_ID_RE_NAMED = r"^(?P<parsed_source>src\d+)/part-(?P<shard>\d+)/doc-(?P<seq>\d+)$"

_PARSE_SCHEMA = T.StructType(
    [
        T.StructField("parsed_source", T.StringType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("seq", T.LongType()),
    ]
)


@F.pandas_udf(_PARSE_SCHEMA)
def _grok_doc_id(doc_id: pd.Series) -> pd.DataFrame:
    """Vectorized grok over batched byte columns: the regex runs as
    pyarrow.compute.extract_regex (RE2 over Arrow buffers, C++) — NOT
    pandas .str.extract, which on object-dtype Series is a per-row Python
    loop and anti-scales once every core carries a Python worker. Nothing
    here touches Python objects per row; only the (small) doc_id column
    crosses the JVM↔Python boundary."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.array(doc_id, type=pa.string())
    ext = pc.extract_regex(arr, _DOC_ID_RE_NAMED)
    return pd.DataFrame(
        {
            "parsed_source": pc.struct_field(ext, "parsed_source").to_pandas(),
            "shard": pc.cast(pc.struct_field(ext, "shard"), pa.int32()).to_pandas(),
            "seq": pc.cast(pc.struct_field(ext, "seq"), pa.int64()).to_pandas(),
        }
    )


def parse_stage(df: DataFrame, mode: str = "arrow") -> DataFrame:
    """Extract route fields from doc_id. Three interchangeable engines
    (identical results — asserted in tests):

    'arrow'  — mapInArrow: whole batches stream JVM→Python as Arrow
               buffers, the regex runs via pyarrow.compute (RE2), and the
               token arrays cross as columnar list<int32> with no
               per-element object work. This avoids the BatchEvalPython
               row queue, which buffers/serializes every FULL input row
               (~1KB each with tokens) while a scalar-UDF batch round-
               trips — measured 1.5-2x slower on wide rows. Default.
    'pandas' — scalar pandas_udf over ONLY the doc_id column (narrowest
               possible Python boundary; pays the row-queue cost).
    'native' — regexp_extract, whole-stage codegen, zero Python.
    """
    if mode == "arrow":
        import pyarrow as pa
        import pyarrow.compute as pc

        out_schema = T.StructType(
            df.schema.fields
            + [
                T.StructField("parsed_source", T.StringType()),
                T.StructField("shard", T.IntegerType()),
                T.StructField("seq", T.LongType()),
            ]
        )
        extra = [
            pa.field("parsed_source", pa.string()),
            pa.field("shard", pa.int32()),
            pa.field("seq", pa.int64()),
        ]

        def parse_batches(batches):
            for batch in batches:
                ext = pc.extract_regex(batch.column("doc_id"), _DOC_ID_RE_NAMED)
                arrays = list(batch.columns) + [
                    pc.struct_field(ext, "parsed_source"),
                    pc.cast(pc.struct_field(ext, "shard"), pa.int32()),
                    pc.cast(pc.struct_field(ext, "seq"), pa.int64()),
                ]
                yield pa.RecordBatch.from_arrays(
                    arrays, schema=pa.schema(list(batch.schema) + extra)
                )

        return df.mapInArrow(parse_batches, out_schema)
    if mode == "pandas":
        parsed = df.withColumn("__p", _grok_doc_id(F.col("doc_id")))
        return parsed.select(
            "*",
            F.col("__p.parsed_source").alias("parsed_source"),
            F.col("__p.shard").alias("shard"),
            F.col("__p.seq").alias("seq"),
        ).drop("__p")
    if mode == "native":
        d = F.col("doc_id")
        return (
            df.withColumn(
                "parsed_source",
                F.nullif(F.regexp_extract(d, DOC_ID_RE, 1), F.lit("")),
            )
            .withColumn("shard", F.nullif(F.regexp_extract(d, DOC_ID_RE, 2), F.lit("")).cast("int"))
            .withColumn("seq", F.nullif(F.regexp_extract(d, DOC_ID_RE, 3), F.lit("")).cast("long"))
        )
    raise ValueError(f"unknown parse mode '{mode}'")


def enrich_stage(df: DataFrame, dim: DataFrame) -> DataFrame:
    """Broadcast-join the source dimension (sink / category / weight)."""
    return df.join(F.broadcast(dim), on="source", how="left")


def salted_join(
    big: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    how: str = "inner",
    salt_buckets: int = 32,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Skew-resistant shuffle join for a dimension too large to broadcast.

    A plain sort-merge join on a heavy-hitter key sends every row of the
    hot key to ONE reducer — at 10^12 rows with 50% of traffic on one
    source, that reducer IS the job. Salting spreads it: the big side
    gets a deterministic salt in [0, salt_buckets), the dim side is
    exploded once per salt value, and the join runs on (key, salt) —
    the hot key now occupies `salt_buckets` reducers while the dim pays
    only `salt_buckets × |dim|` replication (tiny by precondition).
    Measured on this box: 3.2× over the plain SMJ at 16M rows with a
    50%-hot key (bench `skew` section).

    The salt must be DETERMINISTIC (derived by hashing `salt_from`
    columns, default: all big-side columns): a random salt in a shuffle
    key silently corrupts results when a stage retry recomputes the
    partition (the classic repartition(rand) hazard).

    Only inner/left/left_semi/left_anti joins are supported: under
    right/full joins a dim row with no match would surface once PER SALT
    REPLICA, duplicating output rows.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} (dim-side replicas would "
            f"duplicate unmatched rows under '{how}')"
        )
    on = [on] if isinstance(on, str) else list(on)
    src = salt_from if salt_from else [c for c in big.columns]
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in src]), F.lit(salt_buckets)).cast("int")
    b = big.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    return b.join(d, on + ["__salt"], how).drop("__salt")


def enrich_stage_salted(
    df: DataFrame, dim: DataFrame, salt_buckets: int = 32
) -> DataFrame:
    """enrich_stage for a dimension that outgrew the broadcast threshold:
    same left-join semantics, hot sources spread over salt_buckets
    reducers. The pipeline default stays broadcast (the source dim is
    small by construction); this is the documented fallback when the
    enrichment table itself reaches cluster scale."""
    return salted_join(
        df, dim, "source", how="left", salt_buckets=salt_buckets,
        salt_from=["doc_id"],
    )


QUARANTINE_SINK = "sink_quarantine"


def quarantine_stage(df: DataFrame) -> DataFrame:
    """Dead-letter routing (Logstash DLQ / Kafka Connect
    errors.deadletterqueue semantics): classify rows the pipeline cannot
    place and re-sink them to QUARANTINE_SINK with a machine-readable
    reason, instead of dropping them or letting them land in a null
    partition directory.

    Reasons, first match wins:
      unparseable_doc_id — the grok regex extracted nothing
      source_mismatch    — doc_id parsed but embeds a different source
                           than the row's source column (corrupt join key)
      unknown_source     — the enrich dimension has no row for source

    One codegen'd WHEN chain over columns that already exist at this
    point in the plan: no shuffle, no Python, and rows that are clean
    keep their enriched sink untouched. Because sink is the routed
    table's partition column, the quarantined rows land in their own
    partition directory and every downstream aggregate prunes them with
    a metadata-only filter."""
    reason = (
        F.when(F.col("parsed_source").isNull(), F.lit("unparseable_doc_id"))
        .when(F.col("parsed_source") != F.col("source"), F.lit("source_mismatch"))
        .when(F.col("sink").isNull(), F.lit("unknown_source"))
    )
    return df.withColumn("error_reason", reason).withColumn(
        "sink",
        F.when(reason.isNotNull(), F.lit(QUARANTINE_SINK)).otherwise(F.col("sink")),
    )


def token_ngram_hashes(tokens: F.Column | str, n: int) -> F.Column:
    """A 64-bit hash of every length-n token window, as array<long> —
    the membership unit for token-level decontamination. Pure codegen
    and ELEMENT-WISE: position i's value is the xxhash64 chain
    H(..H(H(t_i), t_{i+1}).., t_{i+n-1}), built by n-1 zip_with passes
    against shifted copies of the token array. Equal windows hash
    equal; distinct windows collide at the usual 2^-64 bound. The
    naive ``transform(sequence, i -> xxhash64(slice(c, i, n)))`` copies
    an n-element array per position — O(n·len) allocations per row,
    measured 20x slower (see functions/text.py:word_ngrams). No
    Python, no explode (callers choose whether to explode or probe in
    place)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    acc = F.transform(c, lambda x: F.xxhash64(x))
    for j in range(1, n):
        shifted = F.slice(c, j + 1, F.greatest(F.size(c) - j, F.lit(0)))
        acc = F.zip_with(acc, shifted, lambda a, x: F.xxhash64(a, x))
    return F.when(F.size(c) < n, F.array().cast("array<long>")).otherwise(
        F.slice(acc, 1, F.size(c) - (n - 1))
    )


def decontaminate_stage(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    max_broadcast_bytes: int | None = None,
) -> DataFrame:
    """Drop token sequences that share any exact token n-gram with a
    held-out benchmark set — the token-level analogue of
    functions/text.py:contamination, for the pipeline's pre-tokenized
    rows (GPT-3 appendix-C style decontamination, n=8 tokens here vs
    13 words there).

    Scale shape: eval benchmarks are fixed-size while the corpus grows,
    so the benchmark's distinct gram-hash set is the BROADCAST side of
    a semi-join against the corpus's exploded gram hashes — the hash
    relation is built once per task and probed per gram (a first cut
    used one collect_set row + per-row ``arrays_overlap``, which
    rebuilds the bench set for EVERY corpus row: O(rows x bench),
    measured 50x slower at 500k bench grams). Matched ids then
    anti-join back on ``id_col``; AQE sizes that join at runtime — the
    matched set is contamination-sized (tiny in any realistic corpus),
    so it resolves to a broadcast anti-join and corpus rows never
    shuffle. No driver collect anywhere.

    The broadcast hint is SIZE-GUARDED: Spark honors an explicit hint
    regardless of size, so an unconditional F.broadcast on an oversized
    benchmark would hit the 8 GB broadcast hard cap / driver OOM. A
    cheap count over the (small-side) gram set estimates the in-memory
    relation (8-byte hashes + per-row overhead); past
    ``max_broadcast_bytes`` (default
    functions/text.py:BENCH_BROADCAST_MAX_BYTES) the hint is dropped
    and the semi-join runs shuffled — slower, never fatal.
    """
    from qsvspark.functions.text import BENCH_BROADCAST_MAX_BYTES, broadcast_if_small

    bench_grams = (
        benchmark.select(F.explode(token_ngram_hashes(tokens_col, n)).alias("__g"))
        .distinct()
    )
    bench_side = broadcast_if_small(
        bench_grams,
        8,  # fixed-width long hashes
        BENCH_BROADCAST_MAX_BYTES if max_broadcast_bytes is None else max_broadcast_bytes,
    )
    matched = (
        df.select(id_col, F.explode(token_ngram_hashes(tokens_col, n)).alias("__g"))
        .join(bench_side, "__g", "left_semi")
        .select(id_col)
        .distinct()
    )
    return df.join(matched, id_col, "left_anti")


def dedup_key(df: DataFrame) -> DataFrame:
    """Append the exact-dedup content key: two INDEPENDENT xxhash64 lanes
    over (n_tok, tokens). 16 bytes stand in for the whole token array as
    the grouping identity; a false merge needs a simultaneous collision in
    both lanes (~2^-128 per pair — at 10^12 rows the expected number of
    collisions is ~1e-15, documented rather than paid for with full-array
    comparisons on every shuffle)."""
    return df.withColumn("__h1", F.xxhash64("n_tok", "tokens")).withColumn(
        "__h2", F.xxhash64(F.lit(0x9E3779B9), "tokens", "n_tok")
    )


def dedup_stage(
    df: DataFrame, against: DataFrame | list[DataFrame] | None = None
) -> DataFrame:
    """Drop exact-duplicate token sequences, keeping the lowest doc_id
    (deterministic keep-first — rerun-stable regardless of partitioning).

    Executes as row_number() over (partition by key order by doc_id)
    filtered to 1: Spark's WindowGroupLimit rule (physical plan shows a
    `WindowGroupLimit` node below the shuffle) makes every map task emit
    only its LOCAL keep-first candidate per key before shuffling — the
    map-side-combine analogue for dedup, so a corpus that is 50%
    duplicates shuffles at most one row per (key × map task), not every
    row. This is the same LLM-training-corpus operation as
    functions/dedup.py:dedup_exact, applied to pre-tokenized sequences
    inside the pipeline instead of documents.

    against: an optional (__h1, __h2) key set of ALREADY-COMMITTED content
    (the dedup_keys snapshot chain) — rows whose key appears there are
    dropped via left_anti join, giving cross-increment dedup without ever
    re-reading committed token data. A LIST of frames anti-joins each
    element in sequence — semantically identical to anti-joining their
    union, but when the elements are bucketed snapshot scans each join
    keeps the committed side shuffle-free (a union would discard the
    scans' reported hash partitioning), so only the increment's own keys
    ever cross an Exchange."""
    from pyspark.sql import Window

    w = Window.partitionBy("__h1", "__h2").orderBy("doc_id")
    out = (
        dedup_key(df)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if against is not None:
        parts = against if isinstance(against, (list, tuple)) else [against]
        for part in parts:
            out = out.join(part, ["__h1", "__h2"], "left_anti")
    return out.drop("__h1", "__h2")


def bucket_expr(n_tok: F.Column | str, width: int = 64) -> F.Column:
    c = F.col(n_tok) if isinstance(n_tok, str) else n_tok
    return ((c / width).cast("int") * width).alias("n_tok_bucket")


def aggregate_stage(df: DataFrame, bucket_width: int = 64) -> DataFrame:
    """Per-sink aggregate: groupBy(sink, source, n_tok_bucket) →
    seq_count / uniq_docs / tok_sum. The count/uniq semantics mirror the
    reference's count (count.rs:19-25) and uniq (uniq.rs:5) quilters
    applied per routed sink."""
    return (
        df.withColumn("n_tok_bucket", bucket_expr("n_tok", bucket_width))
        .groupBy("sink", "source", "n_tok_bucket")
        .agg(
            F.count(F.lit(1)).alias("seq_count"),
            F.count_distinct("doc_id").alias("uniq_docs"),
            F.sum("n_tok").alias("tok_sum"),
        )
    )


def aggregate_stage_salted(
    df: DataFrame, bucket_width: int = 64, salt_buckets: int = 32
) -> DataFrame:
    """Two-level salted variant for heavy-hitter group keys.

    Salt is a pure function of doc_id, so each doc_id lands in exactly one
    salt bucket → per-salt COUNT DISTINCT(doc_id) sums to the exact global
    distinct count (no approximation). Level 1 spreads a hot
    (sink, source, bucket) key over `salt_buckets` reducers; level 2
    combines the (tiny) partials. Equality with aggregate_stage is
    property-tested.
    """
    salted = df.withColumn("n_tok_bucket", bucket_expr("n_tok", bucket_width)).withColumn(
        "__salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    )
    partial = salted.groupBy("sink", "source", "n_tok_bucket", "__salt").agg(
        F.count(F.lit(1)).alias("c"),
        F.count_distinct("doc_id").alias("u"),
        F.sum("n_tok").alias("s"),
    )
    return partial.groupBy("sink", "source", "n_tok_bucket").agg(
        F.sum("c").alias("seq_count"),
        F.sum("u").alias("uniq_docs"),
        F.sum("s").alias("tok_sum"),
    )


class NorthStarPipeline:
    """Resumable parse → enrich → route → aggregate over a tokens table."""

    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        parse_mode: str = "arrow",
        bucket_width: int = 64,
        num_sources: int = 20,
        num_sinks: int = 4,
        salted: bool = False,
        salt_buckets: int = 32,
        route_tasks_per_core: int | None = None,
        codec: str | None = None,
        route_cluster_by: list[str] | None = None,
        dedup: str | None = None,
        dedup_keys_buckets: int | None = None,
        quarantine: bool = False,
    ):
        self.spark = spark
        self.catalog = SnapshotCatalog(warehouse)
        self.parse_mode = parse_mode
        self.bucket_width = bucket_width
        self.num_sources = num_sources
        self.num_sinks = num_sinks
        self.salted = salted
        self.salt_buckets = salt_buckets
        # write-task granularity (× cores) and parquet codec for the
        # routed sink: finer tasks shrink the last-wave straggler tail at
        # the cost of more output files; zstd trades write bandwidth for
        # CPU (which scales with cores — bandwidth does not)
        self.route_tasks_per_core = route_tasks_per_core or int(
            os.environ.get("QSVSPARK_ROUTE_TASKS_PER_CORE", "4")
        )
        self.codec = codec or os.environ.get("QSVSPARK_ROUTE_CODEC", "snappy")
        # sort-order layout for the routed sink (e.g. ["source", "n_tok"]):
        # narrow per-task sort so downstream source/n_tok filters prune
        # parquet row groups via min/max stats instead of scanning
        self.route_cluster_by = route_cluster_by
        # dedup="exact": drop duplicate token sequences (keep-first by
        # doc_id) before routing; across increments, previously-committed
        # content keys live in the dedup_keys snapshot chain
        if dedup not in (None, "exact"):
            raise ValueError(f"unknown dedup mode '{dedup}'")
        self.dedup = dedup
        # quarantine=True: dead-letter rows that fail parse/enrich to
        # QUARANTINE_SINK (with error_reason) instead of dropping them;
        # aggregates exclude the quarantine partition
        self.quarantine = quarantine
        # dedup_keys_buckets > 0: store the committed content-key chain
        # hash-bucketed on (__h1, __h2). The chain is the one table that
        # every future increment joins and that only ever grows (~16 TB at
        # 10^12 rows); bucketed at rest it is NEVER reshuffled — each
        # increment's anti-join shuffles only the delta keys. Sized like
        # shuffle partitions: buckets ≈ chain_bytes / 256 MB at target
        # scale; any positive value shows the plan shape locally.
        self.dedup_keys_buckets = int(
            dedup_keys_buckets
            if dedup_keys_buckets is not None
            else os.environ.get("QSVSPARK_DEDUP_KEYS_BUCKETS", "0")
        )

    def _config_fp(self, input_fingerprint: str, stage: str) -> str:
        return (
            f"{input_fingerprint}|{stage}|parse={self.parse_mode}"
            f"|bw={self.bucket_width}|k={self.num_sources}|s={self.num_sinks}"
            f"|dedup={self.dedup or 'off'}"
            + ("|dlq=1" if self.quarantine else "")
        )

    def _commit_dedup_keys(self, routed_snap: str, route_fp: str) -> None:
        """Append the content keys of ONE committed routed delta to the
        dedup_keys chain. 16 bytes/row — at 10^12 rows the key chain is
        ~100× smaller than the token data it indexes, and increments
        anti-join against it instead of rescanning committed tokens.
        Idempotent (fingerprinted), so a crash between the route commit
        and this commit resumes cleanly."""
        keys_fp = f"{route_fp}|dedup-keys"
        if self.catalog.find_committed("dedup_keys", keys_fp):
            return
        delta = self.catalog.read(
            self.spark, "routed", routed_snap, follow_parents=False
        )
        keys = dedup_key(delta.select("n_tok", "tokens")).select("__h1", "__h2")
        bucketed = self.dedup_keys_buckets > 0
        head = self.catalog.manifest("dedup_keys")
        if head is not None:
            # a chain must keep ONE bucket spec end-to-end (the write layer
            # enforces it); an existing chain's layout wins over the config
            # so toggling the knob mid-warehouse never strands a resume
            bucketed = bool(head.get("bucket_by"))
            if bucketed:
                self.dedup_keys_buckets = head["n_buckets"]
        self.catalog.write(
            keys,
            "dedup_keys",
            input_fingerprint=keys_fp,
            lineage={"stages": ["dedup-keys"], "inputs": [route_fp]},
            parent=self.catalog.current_snapshot("dedup_keys"),
            bucket_by=["__h1", "__h2"] if bucketed else None,
            n_buckets=self.dedup_keys_buckets if bucketed else 0,
        )

    def run(self, tokens: DataFrame, input_fingerprint: str) -> dict:
        """Execute all stages; returns metrics incl. per-stage timings,
        skipped (resumed) stages, and rows/sec throughput."""
        metrics: dict = {"stages": {}, "resumed": []}
        t_start = time.time()
        dim = source_dim(self.spark, self.num_sources, self.num_sinks)

        # parse+enrich are narrow (no shuffle) → fused into the route
        # write; snapshotting them separately would double the I/O. The
        # routed table is the first checkpoint; aggregate is the second.
        routed_fp = self._config_fp(input_fingerprint, "route")
        snap = self.catalog.find_committed("routed", routed_fp)
        if snap:
            metrics["resumed"].append("route")
            routed = self.catalog.read(self.spark, "routed", snap)
            route_manifest = self.catalog.manifest("routed", snap)
        else:
            t0 = time.time()
            parsed = parse_stage(tokens, self.parse_mode)
            obs = None
            if self.dedup:
                from pyspark.sql import Observation

                # pre-dedup row count rides the SAME write action via
                # Observation — no extra job to account for drops
                obs = Observation()
                parsed = parsed.observe(obs, F.count(F.lit(1)).alias("rows"))
                parsed = dedup_stage(parsed)
            enriched = enrich_stage(parsed, dim)
            if self.quarantine:
                enriched = quarantine_stage(enriched)
            # Size write tasks to the cluster, not to the input split
            # count: partitionBy(sink) emits (tasks × sinks) files, so
            # letting 100k input splits each write 4 sink files is the
            # classic small-files anti-pattern — tiny row groups, a
            # commit protocol moving 400k files, and per-task overhead
            # that caps scaling. coalesce (narrow, no shuffle) only ever
            # REDUCES partition count, so when the input has fewer
            # splits than 2×cores it is a no-op.
            target = self.route_tasks_per_core * self.spark.sparkContext.defaultParallelism
            route_manifest = self.catalog.write(
                enriched.coalesce(max(target, 1)),
                "routed",
                input_fingerprint=routed_fp,
                lineage={
                    "stages": (["parse", "dedup"] if self.dedup else ["parse"])
                    + ["enrich", "route"],
                    "parse_mode": self.parse_mode,
                    "inputs": [input_fingerprint],
                },
                partition_by="sink",
                count_by="sink",
                compression=self.codec,
                cluster_by=self.route_cluster_by,
            )
            metrics["stages"]["route"] = round(time.time() - t0, 3)
            if obs is not None:
                metrics["input_rows"] = int(obs.get["rows"])
                metrics["duplicates_dropped"] = (
                    metrics["input_rows"] - route_manifest["row_count"]
                )
            routed = self.catalog.read(self.spark, "routed")
        if self.dedup:
            self._commit_dedup_keys(route_manifest["snapshot"], routed_fp)
        metrics["per_sink_counts"] = route_manifest["partition_counts"]
        metrics["rows"] = route_manifest["row_count"]
        if self.quarantine:
            metrics["quarantined"] = route_manifest["partition_counts"].get(
                QUARANTINE_SINK, 0
            )

        # salt config in the fingerprint: toggling --salted (or the bucket
        # count) must NOT resume from the other mode's committed snapshot
        agg_fp = self._config_fp(
            input_fingerprint,
            f"aggregate|salted={self.salted}|sb={self.salt_buckets if self.salted else 0}",
        )
        snap = self.catalog.find_committed("aggregates", agg_fp)
        if snap:
            metrics["resumed"].append("aggregate")
        else:
            t0 = time.time()
            agg_src = routed
            if self.quarantine:
                # sink is the partition column: this filter is resolved
                # from directory names, the quarantine files are never read
                agg_src = routed.where(F.col("sink") != QUARANTINE_SINK)
            if self.salted:
                aggs = aggregate_stage_salted(agg_src, self.bucket_width, self.salt_buckets)
            else:
                aggs = aggregate_stage(agg_src, self.bucket_width)
            self.catalog.write(
                aggs,
                "aggregates",
                input_fingerprint=agg_fp,
                lineage={"stages": ["aggregate"], "inputs": [routed_fp]},
                count_by="sink",
            )
            metrics["stages"]["aggregate"] = round(time.time() - t0, 3)

        total = time.time() - t_start
        metrics["total_seconds"] = round(total, 3)
        metrics["sequences_per_sec"] = round(metrics["rows"] / total, 1) if total else None
        return metrics

    # -- incremental runs ---------------------------------------------

    def run_increment(
        self,
        tokens: DataFrame,
        increment_fingerprint: str,
        distinct_mode: str = "merge",
    ) -> dict:
        """Process ONE increment of newly-arrived tokens: parse → enrich →
        route the delta and APPEND it to the routed sinks (snapshot chain),
        then maintain the aggregates incrementally.

        This is the steady-state operating mode at 10^12-sequence scale:
        a daily increment routes only its own rows — the committed bulk is
        never re-read — while reads of the routed table resolve the whole
        chain as one multi-path scan.

        distinct_mode:
          - "merge" (default): aggregate the delta only, then re-sum with
            the previous aggregates (the aggregate table is tiny — one row
            per sink × source × bucket). seq_count/tok_sum are exactly
            additive; uniq_docs is exact UNDER THE APPEND-ONLY CONTRACT
            that a doc_id never appears in two increments (the normal
            training-ingest invariant). If increments can re-ship doc_ids,
            use "recompute".
          - "recompute": aggregate over the full routed chain — always
            exact, costs a full scan of the routed columns involved.

        Resumable like run(): each increment's route/aggregate snapshots
        are fingerprinted; re-running a committed increment skips it.
        """
        if distinct_mode not in ("merge", "recompute"):
            raise ValueError(f"unknown distinct_mode '{distinct_mode}'")
        metrics: dict = {"stages": {}, "resumed": [], "increment": increment_fingerprint}
        t_start = time.time()
        dim = source_dim(self.spark, self.num_sources, self.num_sinks)

        inc_fp = self._config_fp(increment_fingerprint, "route-increment")
        snap = self.catalog.find_committed("routed", inc_fp)
        if snap:
            metrics["resumed"].append("route")
            manifest = self.catalog.manifest("routed", snap)
        else:
            t0 = time.time()
            parsed = parse_stage(tokens, self.parse_mode)
            if self.dedup:
                # within-increment keep-first, then drop anything whose
                # content key is already in the committed key chain —
                # cross-increment dedup as one anti-join on 16-byte keys
                prev_keys = None
                keys_snap = self.catalog.current_snapshot("dedup_keys")
                if keys_snap is not None:
                    # per-snapshot frames, not a union: bucketed chain
                    # elements keep their reported hash partitioning so
                    # each anti-join leaves the committed side in place
                    prev_keys = self.catalog.read_parts(
                        self.spark, "dedup_keys", keys_snap
                    )
                parsed = dedup_stage(parsed, against=prev_keys)
            enriched = enrich_stage(parsed, dim)
            if self.quarantine:
                enriched = quarantine_stage(enriched)
            target = self.route_tasks_per_core * self.spark.sparkContext.defaultParallelism
            parent = self.catalog.current_snapshot("routed")
            manifest = self.catalog.write(
                enriched.coalesce(max(target, 1)),
                "routed",
                input_fingerprint=inc_fp,
                lineage={
                    "stages": ["parse", "enrich", "route"],
                    "parse_mode": self.parse_mode,
                    "inputs": [increment_fingerprint],
                    "op": "append-increment",
                },
                partition_by="sink",
                count_by="sink",
                compression=self.codec,
                cluster_by=self.route_cluster_by,
                parent=parent,
            )
            metrics["stages"]["route"] = round(time.time() - t0, 3)
        if self.dedup:
            self._commit_dedup_keys(manifest["snapshot"], inc_fp)
        metrics["delta_rows"] = manifest["row_count"]
        metrics["delta_per_sink_counts"] = manifest["partition_counts"]
        metrics["rows"] = manifest["cumulative_row_count"]
        metrics["per_sink_counts"] = manifest["cumulative_partition_counts"]
        if self.quarantine:
            metrics["quarantined"] = manifest["partition_counts"].get(
                QUARANTINE_SINK, 0
            )

        agg_fp = self._config_fp(
            increment_fingerprint, f"aggregate-increment|mode={distinct_mode}"
        )
        if self.catalog.find_committed("aggregates", agg_fp):
            metrics["resumed"].append("aggregate")
        else:
            t0 = time.time()

            def _clean(df: DataFrame) -> DataFrame:
                if self.quarantine:
                    return df.where(F.col("sink") != QUARANTINE_SINK)
                return df

            if distinct_mode == "recompute":
                aggs = aggregate_stage(_clean(self.routed()), self.bucket_width)
            else:
                delta = self.catalog.read(
                    self.spark, "routed", manifest["snapshot"], follow_parents=False
                )
                delta_agg = aggregate_stage(_clean(delta), self.bucket_width)
                prev_snap = self.catalog.current_snapshot("aggregates")
                if prev_snap is None:
                    aggs = delta_agg
                else:
                    prev = self.catalog.read(self.spark, "aggregates", prev_snap)
                    aggs = (
                        prev.unionByName(delta_agg)
                        .groupBy("sink", "source", "n_tok_bucket")
                        .agg(
                            F.sum("seq_count").alias("seq_count"),
                            F.sum("uniq_docs").alias("uniq_docs"),
                            F.sum("tok_sum").alias("tok_sum"),
                        )
                    )
            self.catalog.write(
                aggs,
                "aggregates",
                input_fingerprint=agg_fp,
                lineage={
                    "stages": ["aggregate"],
                    "inputs": [inc_fp],
                    "op": f"aggregate-increment-{distinct_mode}",
                },
                count_by="sink",
            )
            metrics["stages"]["aggregate"] = round(time.time() - t0, 3)

        total = time.time() - t_start
        metrics["total_seconds"] = round(total, 3)
        metrics["sequences_per_sec"] = (
            round(metrics["delta_rows"] / total, 1) if total else None
        )
        return metrics

    def redrive_quarantine(
        self,
        redrive_fingerprint: str,
        dim: DataFrame | None = None,
    ) -> dict:
        """Re-process the quarantine partition after the cause is fixed
        (e.g. the enrich dimension gained the missing sources): rows that
        now parse and enrich cleanly move to their real sinks; rows that
        are still bad stay quarantined. One atomic commit via the
        catalog's dynamic partition overwrite — the delta holds BOTH the
        redriven rows (real sink partitions, appended) and the still-bad
        rows (the quarantine partition's replacement contents), ancestor
        quarantine files are masked, and no committed clean data is
        rewritten. Aggregates then merge in the newly-clean rows exactly
        like an increment delta (their doc_ids were never aggregated, so
        merge-mode uniq_docs stays exact).

        dim: optionally a corrected enrichment dimension; defaults to the
        pipeline's configured source_dim. Resumable and idempotent like
        every stage (fingerprinted on redrive_fingerprint).
        """
        if not self.quarantine:
            raise ValueError("redrive_quarantine requires quarantine=True")
        dim = dim if dim is not None else source_dim(
            self.spark, self.num_sources, self.num_sinks
        )
        metrics: dict = {"stages": {}, "resumed": []}
        t_start = time.time()

        route_fp = self._config_fp(redrive_fingerprint, "redrive")
        snap = self.catalog.find_committed("routed", route_fp)
        cur = self.catalog.manifest("routed")
        counts = (cur or {}).get("cumulative_partition_counts") or {}
        if snap is None and not counts.get(QUARANTINE_SINK, 0):
            # nothing quarantined: no commit to make
            return {
                "stages": {}, "resumed": [], "redriven": 0,
                "still_quarantined": 0,
                "per_sink_counts": counts,
                "rows": (cur or {}).get("cumulative_row_count", 0),
                "total_seconds": round(time.time() - t_start, 3),
            }
        if snap:
            metrics["resumed"].append("redrive")
            manifest = self.catalog.manifest("routed", snap)
        else:
            t0 = time.time()
            parent = self.catalog.current_snapshot("routed")
            raw = (
                self.catalog.read(self.spark, "routed", parent)
                .where(F.col("sink") == QUARANTINE_SINK)
                .select("doc_id", "tokens", "n_tok", "source")
            )
            reprocessed = quarantine_stage(
                enrich_stage(parse_stage(raw, self.parse_mode), dim)
            )
            target = (
                self.route_tasks_per_core
                * self.spark.sparkContext.defaultParallelism
            )
            manifest = self.catalog.write(
                reprocessed.coalesce(max(target, 1)),
                "routed",
                input_fingerprint=route_fp,
                lineage={
                    "stages": ["parse", "enrich", "route"],
                    "parse_mode": self.parse_mode,
                    "inputs": [redrive_fingerprint],
                    "op": "redrive-quarantine",
                },
                partition_by="sink",
                count_by="sink",
                compression=self.codec,
                cluster_by=self.route_cluster_by,
                parent=parent,
                replace_partitions=[QUARANTINE_SINK],
            )
            metrics["stages"]["redrive"] = round(time.time() - t0, 3)
        delta = dict(manifest["partition_counts"] or {})
        still_bad = delta.pop(QUARANTINE_SINK, 0)
        metrics["redriven"] = sum(delta.values())
        metrics["still_quarantined"] = still_bad
        metrics["per_sink_counts"] = manifest["cumulative_partition_counts"]
        metrics["rows"] = manifest["cumulative_row_count"]

        # merge the newly-clean rows into the aggregates (delta-only scan)
        agg_fp = self._config_fp(redrive_fingerprint, "aggregate-redrive")
        if self.catalog.find_committed("aggregates", agg_fp):
            metrics["resumed"].append("aggregate")
        elif metrics["redriven"]:
            t0 = time.time()
            clean_delta = self.catalog.read(
                self.spark, "routed", manifest["snapshot"], follow_parents=False
            ).where(F.col("sink") != QUARANTINE_SINK)
            delta_agg = aggregate_stage(clean_delta, self.bucket_width)
            prev_snap = self.catalog.current_snapshot("aggregates")
            if prev_snap is None:
                aggs = delta_agg
            else:
                prev = self.catalog.read(self.spark, "aggregates", prev_snap)
                aggs = (
                    prev.unionByName(delta_agg)
                    .groupBy("sink", "source", "n_tok_bucket")
                    .agg(
                        F.sum("seq_count").alias("seq_count"),
                        F.sum("uniq_docs").alias("uniq_docs"),
                        F.sum("tok_sum").alias("tok_sum"),
                    )
                )
            self.catalog.write(
                aggs,
                "aggregates",
                input_fingerprint=agg_fp,
                lineage={
                    "stages": ["aggregate"],
                    "inputs": [route_fp],
                    "op": "aggregate-redrive",
                },
                count_by="sink",
            )
            metrics["stages"]["aggregate"] = round(time.time() - t0, 3)

        metrics["total_seconds"] = round(time.time() - t_start, 3)
        return metrics

    def purge_docs(self, doc_ids: DataFrame, purge_fingerprint: str) -> dict:
        """Takedown / contamination removal: delete every routed row whose
        doc_id is in ``doc_ids`` and subtract exactly those rows from the
        aggregates — WITHOUT rewriting any data file. The routed delete is
        one equality-delete commit (merge-on-read; compaction applies it
        physically later); the aggregate fix-up is a merge of the doomed
        rows' own aggregate, computed from the PRE-DELETE snapshot so a
        crash between the two commits resumes exactly.

        uniq_docs stays exact because an equality delete removes ALL rows
        of a doc_id (count_distinct decrements match count decrements of
        the doomed aggregate). Deleted content's dedup keys stay in the
        dedup_keys chain, so re-shipped copies of taken-down content are
        still dropped — the takedown semantics a training corpus wants.
        """
        metrics: dict = {"stages": {}, "resumed": []}
        t_start = time.time()
        keys = doc_ids.select("doc_id").distinct()

        del_fp = self._config_fp(purge_fingerprint, "purge")
        snap = self.catalog.find_committed("routed", del_fp)
        if snap:
            metrics["resumed"].append("delete")
            manifest = self.catalog.manifest("routed", snap)
        else:
            t0 = time.time()
            manifest = self.catalog.delete_rows(
                self.spark,
                "routed",
                keys,
                on=["doc_id"],
                input_fingerprint=del_fp,
                lineage={"inputs": [purge_fingerprint]},
            )
            metrics["stages"]["delete"] = round(time.time() - t0, 3)
        metrics["deleted"] = manifest["deleted_row_count"]
        metrics["per_sink_counts"] = manifest["cumulative_partition_counts"]
        metrics["rows"] = manifest["cumulative_row_count"]

        agg_fp = self._config_fp(purge_fingerprint, "aggregate-purge")
        if self.catalog.find_committed("aggregates", agg_fp):
            metrics["resumed"].append("aggregate")
        elif metrics["deleted"]:
            t0 = time.time()
            # the doomed rows come from the delete's PARENT snapshot:
            # correct even when resuming after the delete already
            # committed (the current chain no longer shows those rows)
            doomed = self.catalog.read(
                self.spark, "routed", manifest["parent"]
            ).join(F.broadcast(keys), "doc_id", "left_semi")
            if self.quarantine:
                doomed = doomed.where(F.col("sink") != QUARANTINE_SINK)
            doomed_agg = aggregate_stage(doomed, self.bucket_width)
            prev = self.catalog.read(self.spark, "aggregates")
            neg = doomed_agg.select(
                "sink", "source", "n_tok_bucket",
                (-F.col("seq_count")).alias("seq_count"),
                (-F.col("uniq_docs")).alias("uniq_docs"),
                (-F.col("tok_sum")).alias("tok_sum"),
            )
            aggs = (
                prev.unionByName(neg)
                .groupBy("sink", "source", "n_tok_bucket")
                .agg(
                    F.sum("seq_count").alias("seq_count"),
                    F.sum("uniq_docs").alias("uniq_docs"),
                    F.sum("tok_sum").alias("tok_sum"),
                )
                .where(F.col("seq_count") > 0)
            )
            self.catalog.write(
                aggs,
                "aggregates",
                input_fingerprint=agg_fp,
                lineage={
                    "stages": ["aggregate"],
                    "inputs": [del_fp],
                    "op": "aggregate-purge",
                },
                count_by="sink",
            )
            metrics["stages"]["aggregate"] = round(time.time() - t0, 3)

        metrics["total_seconds"] = round(time.time() - t_start, 3)
        return metrics

    # -- maintenance --------------------------------------------------

    def compact_sinks(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        cluster_by: list[str] | None = None,
    ) -> dict | None:
        """Bin-pack the routed sink's small files (Iceberg
        rewrite_data_files); see SnapshotCatalog.compact. Run this after
        N pipeline increments have fragmented the sinks — resume
        fingerprints carry over, so later runs read the compacted copy."""
        return self.catalog.compact(
            self.spark,
            "routed",
            target_file_bytes=target_file_bytes,
            cluster_by=cluster_by if cluster_by is not None else self.route_cluster_by,
        )

    def pack_sinks(
        self,
        seq_len: int = 2048,
        oversized: str = "own",
        materialize: bool = False,
        pad_id: int | None = 0,
    ) -> dict | None:
        """Lay the routed table out as fixed-length training sequences —
        the step that turns routed pre-tokenized documents into the
        corpus's sequence table (the north-star deliverable). Greedy
        no-split packing, partition-local (functions/packing.pack_greedy)
        with ``group_cols=["sink"]``: a sequence never spans two sinks,
        quarantined rows are excluded, and packing parallelizes without
        any shuffle because cross-shard sequence order is irrelevant for
        training layout.

        Writes a ``packed`` layout table (doc_id, n_tok, sink, seq_id,
        seq_fill, oversized, part_start, part_len), partitioned by sink,
        fingerprinted on the routed lineage + seq_len + policy — rerun
        after more increments re-packs only because the routed
        fingerprint chain changed; a crash before commit leaves no
        partial state (snapshot write is atomic-by-rename).

        ``oversized``: policy for docs longer than seq_len — "own"
        (flagged solo sequence), "split" (boundary-cut chunks, zero
        waste), "truncate" (see pack_greedy).

        ``materialize=True`` additionally writes the ``sequences``
        table — one row per sequence with the PHYSICAL token array
        (seq_id, sink, tokens, n_docs, n_tokens, pad), every doc's
        tokens flattened in seq_fill order and right-padded with
        ``pad_id`` to exactly seq_len (pad_id=None skips padding). This
        is the table a training loader consumes; per-row token-array
        equality against the routed docs is pinned in
        tests/test_packing.py.

        Returns {"layout": manifest, "sequences": manifest-or-None}
        merged into the layout manifest dict for backward compatibility,
        or None when everything is already committed (resume)."""
        from qsvspark.functions.packing import (
            materialize_greedy_sequences,
            pack_greedy,
        )

        snap = self.catalog.current_snapshot("routed")
        if snap is None:
            raise ValueError("pack_sinks needs a committed routed table")
        man = self.catalog.manifest("routed", snap) or {}
        routed_fp = man.get("input_fingerprint") or snap
        policy_tag = "" if oversized == "own" else f"|ov={oversized}"
        pack_fp = f"{routed_fp}|pack|seq_len={seq_len}{policy_tag}"
        layout_manifest = None
        if not self.catalog.find_committed("packed", pack_fp):
            src = self.routed()
            if self.quarantine:
                src = src.where(F.col("sink") != QUARANTINE_SINK)
            packed = pack_greedy(
                src, "n_tok", "doc_id", seq_len, group_cols=["sink"],
                oversized=oversized,
            )
            layout_manifest = self.catalog.write(
                packed,
                "packed",
                input_fingerprint=pack_fp,
                lineage={"stages": ["pack"], "inputs": [routed_fp]},
                partition_by="sink",
                count_by="sink",
            )
        if materialize:
            seq_fp = f"{pack_fp}|sequences|pad={pad_id}"
            if not self.catalog.find_committed("sequences", seq_fp):
                docs = self.routed().select("doc_id", "tokens")
                layout = self.catalog.read(self.spark, "packed")
                seqs = materialize_greedy_sequences(
                    layout, docs, seq_len,
                    keep_cols=["sink"], pad_id=pad_id,
                )
                seq_manifest = self.catalog.write(
                    seqs,
                    "sequences",
                    input_fingerprint=seq_fp,
                    lineage={"stages": ["materialize"], "inputs": [pack_fp]},
                    partition_by="sink",
                    count_by="sink",
                )
                layout_manifest = dict(layout_manifest or {})
                layout_manifest["sequences"] = seq_manifest
        return layout_manifest

    # -- results ------------------------------------------------------

    def routed(self) -> DataFrame:
        return self.catalog.read(self.spark, "routed")

    def aggregates(self) -> DataFrame:
        return self.catalog.read(self.spark, "aggregates")
